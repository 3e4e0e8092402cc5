"""Unit tests for the semantics kernel — the SURVEY §2.8 parity traps.

Expected values for row_hash are computed with hashlib exactly the way the
reference does (sorted cols, ''/None → 'NULL', '|' join, sha256), so these
tests ARE the differential check against the reference algorithm.
"""

from __future__ import annotations

import hashlib
from datetime import datetime

from pyspark.sql import Row
from pyspark.sql import functions as F
from pyspark.sql import types as T

from presencia_etl_spark.functions import (
    coerce_double,
    composite_key,
    infer_type_by_name,
    is_date_column,
    normalize_key,
    null_safe_neq,
    parse_access_datetime,
    row_hash,
)


def reference_row_hash(row: dict, columns: list[str]) -> str:
    """The reference's calculate_row_hash semantics (sync_ALL.py:184-191),
    re-derived from its documented behavior for differential testing."""
    values = []
    for col in sorted(columns):
        val = row.get(col, "")
        values.append(str(val) if val else "NULL")
    return hashlib.sha256("|".join(values).encode()).hexdigest()


class TestRowHash:
    def test_matches_reference_semantics(self, spark):
        rows = [
            {"b": "x", "a": "1", "c": ""},       # empty → NULL sentinel
            {"b": "", "a": "", "c": ""},          # all empty
            {"b": "hello|world", "a": "2", "c": "z"},  # separator collision is inherited behavior
        ]
        df = spark.createDataFrame(
            [Row(a=r["a"], b=r["b"], c=r["c"]) for r in rows]
        )
        got = [r["h"] for r in df.select(row_hash(["a", "b", "c"]).alias("h")).collect()]
        want = [reference_row_hash(r, ["a", "b", "c"]) for r in rows]
        assert got == want

    def test_null_and_empty_collide(self, spark):
        # Trap N3: None and '' both render as 'NULL'.
        df = spark.createDataFrame(
            [("x", None), ("x", "")], schema=["a", "b"]
        )
        hashes = [r["h"] for r in df.select(row_hash(["a", "b"]).alias("h")).collect()]
        assert hashes[0] == hashes[1]

    def test_column_order_independent(self, spark):
        df = spark.createDataFrame([("1", "2")], schema=["a", "b"])
        h1 = df.select(row_hash(["a", "b"]).alias("h")).collect()[0]["h"]
        h2 = df.select(row_hash(["b", "a"]).alias("h")).collect()[0]["h"]
        assert h1 == h2

    def test_xxh64_mode_same_rendering_semantics(self, spark):
        """algo='xxh64' keeps the N3 rendering (''/NULL → sentinel,
        sorted columns) — only the digest differs. String-typed so merge
        targets store it like the sha hash."""
        df = spark.createDataFrame([("x", None), ("x", "")], schema=["a", "b"])
        hx = [
            r["h"]
            for r in df.select(row_hash(["a", "b"], algo="xxh64").alias("h")).collect()
        ]
        assert hx[0] == hx[1]
        assert isinstance(hx[0], str)
        h1 = df.select(row_hash(["a", "b"], algo="xxh64").alias("h")).collect()[0]["h"]
        h2 = df.select(row_hash(["b", "a"], algo="xxh64").alias("h")).collect()[0]["h"]
        assert h1 == h2
        import pytest as _pytest

        with _pytest.raises(ValueError, match="algo"):
            df.select(row_hash(["a"], algo="md5"))


class TestNormalizeKey:
    def cases(self):
        # (input, expected) — reference normalize_key_value semantics
        # (sync_INCREMENTAL.py:211-224).
        return [
            ("30", "30"),
            ("30.0", "30"),
            (" 30 ", "30"),
            ("30.5", "30.5"),
            ("030.00", "30"),
            ("1e3", "1000"),
            ("abc", "abc"),
            (" abc ", "abc"),
            ("", ""),
            (None, ""),
            ("nan", "nan"),       # NaN falls through to raw string
            ("inf", "inf"),       # Infinity likewise
            ("-7.0", "-7"),
        ]

    def test_cases(self, spark):
        data = [(c[0],) for c in self.cases()]
        df = spark.createDataFrame(data, schema=T.StructType([T.StructField("k", T.StringType())]))
        got = [r["n"] for r in df.select(normalize_key("k").alias("n")).collect()]
        want = [c[1] for c in self.cases()]
        assert got == want

    def test_composite(self, spark):
        df = spark.createDataFrame([("30.0", " X ")], schema=["a", "b"])
        got = df.select(composite_key(["a", "b"]).alias("k")).collect()[0]["k"]
        assert got == "30|X"

    def test_bigint_fast_path_matches_generic(self, spark):
        """The type-directed bigint path (r13 fast branch + r14 scalar
        huge-tail rendering) must be byte-identical to the generic
        trim/parse/canonicalize chain across the 2^53 lossy boundary,
        the 2^62 integral-render cutoff, and the int64 extremes."""
        import random as _random

        rng = _random.Random(41)
        vals = [
            None, 0, 1, -1, 2**53 - 1, 2**53, -(2**53), 2**53 + 1,
            -(2**53) - 1, 2**62 - 1, 2**62, 2**62 + 1, -(2**62) - 1,
            2**63 - 1, -(2**63),
        ]
        vals += [rng.randrange(-(2**63), 2**63) for _ in range(300)]
        vals += [rng.randrange(-(2**54), 2**54) for _ in range(300)]
        df = spark.createDataFrame([(v,) for v in vals], "k bigint")
        rows = df.select(
            normalize_key("k", "bigint").alias("fast"),
            normalize_key("k").alias("generic"),
        ).collect()
        bad = [(r["fast"], r["generic"]) for r in rows if r["fast"] != r["generic"]]
        assert not bad, bad[:10]


class TestParseAccessDatetime:
    def test_formats_and_failures(self, spark):
        cases = [
            ("01/27/22 00:00:00", datetime(2022, 1, 27)),
            ("01/27/2022 13:45:10", datetime(2022, 1, 27, 13, 45, 10)),
            ("2022-01-27 13:45:10", datetime(2022, 1, 27, 13, 45, 10)),
            ("01/27/22", datetime(2022, 1, 27)),
            ("01/27/2022", datetime(2022, 1, 27)),
            ("garbage", None),
            ("", None),
            (None, None),
        ]
        df = spark.createDataFrame(
            [(c[0],) for c in cases],
            schema=T.StructType([T.StructField("d", T.StringType())]),
        )
        got = [r["p"] for r in df.select(parse_access_datetime("d").alias("p")).collect()]
        assert got == [c[1] for c in cases]

    def test_first_format_wins_two_digit_year(self, spark):
        # '03/04/05 00:00:00' must parse as 2005-03-04 (M/d/yy first), not
        # 2003-04-05 or year 5.
        df = spark.createDataFrame([("03/04/05 00:00:00",)], schema=["d"])
        got = df.select(parse_access_datetime("d").alias("p")).collect()[0]["p"]
        assert got == datetime(2005, 3, 4)


class TestNullSemantics:
    def test_null_safe_neq_keeps_nulls(self, spark):
        # Trap N1: BAJA <> '1' keeps NULL/missing rows.
        df = spark.createDataFrame(
            [("1",), ("0",), (None,)],
            schema=T.StructType([T.StructField("BAJA", T.StringType())]),
        )
        kept = df.filter(null_safe_neq("BAJA", "1")).collect()
        assert sorted([r["BAJA"] for r in kept], key=str) == ["0", None] or len(kept) == 2

    def test_coerce_double(self, spark):
        df = spark.createDataFrame(
            [("1.5",), ("",), ("junk",), (None,)],
            schema=T.StructType([T.StructField("x", T.StringType())]),
        )
        got = [r["v"] for r in df.select(coerce_double("x").alias("v")).collect()]
        assert got == [1.5, 0.0, 0.0, 0.0]


class TestInference:
    def test_priority_and_exceptions(self):
        # Date beats everything: FECLIQUIDA, plus allowlist names.
        assert isinstance(infer_type_by_name("FECLIQUIDA"), T.TimestampType)
        assert isinstance(infer_type_by_name("ALTCOB"), T.TimestampType)
        assert isinstance(infer_type_by_name("F1CSOCIO"), T.TimestampType)
        # Money.
        assert infer_type_by_name("IMPLIQUIDA") == T.DecimalType(15, 4)
        assert infer_type_by_name("ABOLIQUIDA") == T.DecimalType(15, 4)
        assert infer_type_by_name("TOTALX") == T.DecimalType(15, 4)
        # Int-shaped.
        assert isinstance(infer_type_by_name("NUMCOB"), T.IntegerType)
        assert isinstance(infer_type_by_name("ZONLIQUIDA"), T.IntegerType)
        assert isinstance(infer_type_by_name("BAJA"), T.IntegerType)
        # The business-truth exceptions: Text despite id-ish names.
        assert isinstance(infer_type_by_name("NUMSOCIO"), T.StringType)
        assert isinstance(infer_type_by_name("CUPLIQUIDA"), T.StringType)
        assert isinstance(infer_type_by_name("ESTLIQUIDA"), T.StringType)
        # Default.
        assert isinstance(infer_type_by_name("WHATEVER"), T.StringType)

    def test_is_date_column(self):
        assert is_date_column("FECHA_ALTA")
        assert is_date_column("somedate")
        assert not is_date_column("IMPLIQUIDA")


class TestQuarantine:
    def test_cast_with_quarantine_splits(self, spark):
        from presencia_etl_spark.functions.inference import cast_with_quarantine

        df = spark.createDataFrame(
            [
                ("1", "10.5", "01/15/22 00:00:00"),   # clean
                ("2", "", ""),                          # empty → NULL, clean
                ("3", "garbage", "01/15/22 00:00:00"), # bad money value
                ("4", "7", "not-a-date"),              # bad date value
            ],
            schema=["NUMCOB", "IMPX", "FECALTA"],
        )
        good, bad = cast_with_quarantine(df)
        assert {r["NUMCOB"] for r in good.collect()} == {1, 2}
        raw_bad = {r["NUMCOB"] for r in bad.collect()}
        assert raw_bad == {"3", "4"}          # quarantined rows stay raw strings
        assert dict(good.dtypes)["IMPX"] == "decimal(15,4)"


class TestParallelizeScan:
    """parallelize_scan must size the scan from file metadata only (no
    .rdd conversion in the package — grep-pinned by the build rules) and
    widen exactly when a big single-file scan would underuse the session."""

    def test_single_large_file_widens(self, spark, tmp_path):
        from presencia_etl_spark.functions.partitioning import parallelize_scan

        p = str(tmp_path / "one_big")
        # ~1 MB of text in ONE file: a single split, well below local[32].
        spark.range(20_000).select(
            F.col("id").alias("doc_id"),
            F.concat(F.lit("x" * 200), F.col("id").cast("string")).alias("text"),
        ).coalesce(1).write.mode("overwrite").parquet(p)
        df = spark.read.parquet(p)
        out = parallelize_scan(df)
        target = spark.sparkContext.defaultParallelism
        assert out.rdd.getNumPartitions() == target  # test-side probe only

    def test_tiny_file_left_alone(self, spark, tmp_path):
        from presencia_etl_spark.functions.partitioning import parallelize_scan

        p = str(tmp_path / "tiny")
        spark.range(10).coalesce(1).write.mode("overwrite").parquet(p)
        df = spark.read.parquet(p)
        assert parallelize_scan(df) is df

    def test_in_memory_frame_untouched(self, spark):
        from presencia_etl_spark.functions.partitioning import parallelize_scan

        df = spark.range(100).select(F.col("id"))
        assert parallelize_scan(df) is df

    def test_conf_size_parsing(self):
        from presencia_etl_spark.functions.partitioning import _as_bytes

        assert _as_bytes("134217728") == 128 << 20
        assert _as_bytes("128m") == 128 << 20
        assert _as_bytes("4MB") == 4 << 20
        assert _as_bytes("1g") == 1 << 30
        assert _as_bytes("512b") == 512


class TestInListPushdown:
    """functions.pushdown.in_list — the one-round-trip IN filter — must be
    semantically identical to Column.isin for every key type we push."""

    def test_string_keys_with_nasty_escapes(self, spark):
        from presencia_etl_spark.functions.pushdown import in_list

        vals = [
            "plain",
            "O'Brien",
            "back\\slash",
            "both\\'s",
            "semi;colon",
            'double"quote',
            "new\nline",
            "tab\tchar",
            "",
        ]
        df = spark.createDataFrame(
            [(v,) for v in vals] + [("absent",), (None,)], ["k"]
        )
        keys = vals  # every present value except 'absent'/'NULL'
        got = {r["k"] for r in df.filter(in_list("k", keys)).collect()}
        want = {r["k"] for r in df.filter(F.col("k").isin(keys)).collect()}
        assert got == want == set(vals)

    def test_int_keys_and_empty_list(self, spark):
        from presencia_etl_spark.functions.pushdown import in_list

        df = spark.range(100)
        keys = [3, 7, 99, 12345678901234]  # incl. a >32-bit value
        got = {r["id"] for r in df.filter(in_list("id", keys)).collect()}
        assert got == {3, 7, 99}
        assert df.filter(in_list("id", [])).count() == 0

    def test_pushes_into_parquet_scan(self, spark, tmp_path):
        from presencia_etl_spark.functions.pushdown import in_list

        p = str(tmp_path / "t")
        spark.range(1000).coalesce(1).write.parquet(p)
        df = spark.read.parquet(p).filter(in_list("id", [5, 6, 7]))
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "PushedFilters: [In(id, [5,6,7])]" in plan, plan

    def test_escaped_string_literals_mode_stays_correct(self, spark):
        """Under spark.sql.parser.escapedStringLiterals=true (legacy /
        Hive-compat parser: backslashes in literals stay literal), the
        default rendering would produce WRONG predicates for keys bearing
        quotes or backslashes — in_list must detect the conf and fall
        back to Column.isin for those, while quote-free keys keep the
        one-round-trip rendering."""
        from presencia_etl_spark.functions.pushdown import in_list

        vals = ["plain", "O'Brien", "back\\slash", "semi;colon"]
        df = spark.createDataFrame(
            [(v,) for v in vals] + [("absent",), (None,)], ["k"]
        )
        key = "spark.sql.parser.escapedStringLiterals"
        old = spark.conf.get(key, "false")
        try:
            spark.conf.set(key, "true")
            got = {r["k"] for r in df.filter(in_list("k", vals)).collect()}
            assert got == set(vals)
            # Risk-free keys still go through the rendered-SQL fast path
            # and parse correctly in this mode too.
            got2 = {
                r["k"]
                for r in df.filter(in_list("k", ["plain", "semi;colon"])).collect()
            }
            assert got2 == {"plain", "semi;colon"}
        finally:
            spark.conf.set(key, old)

    def test_large_fallback_warns_once(self, spark, monkeypatch):
        """When the per-key isin fallback engages at a size where its
        ~0.5 ms/key py4j tax is macroscopic, a warning (once per process)
        must make the misconfiguration visible — a session-less worker
        thread would otherwise just be silently ~2 s/call slower."""
        import warnings as _warnings

        from presencia_etl_spark.functions import pushdown

        monkeypatch.setattr(pushdown, "_warned_fallback", False)
        monkeypatch.setattr(
            pushdown, "_default_literal_mode_confirmed", lambda: False
        )
        keys = [f"k'{i}" for i in range(pushdown._FALLBACK_WARN_THRESHOLD)]
        with _warnings.catch_warnings(record=True) as rec:
            _warnings.simplefilter("always")
            pushdown.in_list("k", keys)
            pushdown.in_list("k", keys)  # second call: already warned
            small = [f"k'{i}" for i in range(8)]
            monkeypatch.setattr(pushdown, "_warned_fallback", False)
            pushdown.in_list("k", small)  # below threshold: silent
        ours = [w for w in rec if "in_list falling back" in str(w.message)]
        assert len(ours) == 1

    def test_dotted_column_name_same_on_both_branches(self, spark):
        """A top-level column literally named 'a.b' must resolve as that
        column on BOTH branches: the fast path backquotes the name, and
        the isin fallback must too — bare F.col('a.b') would parse the
        dot as struct-field access and filter the wrong thing."""
        from presencia_etl_spark.functions import pushdown

        df = spark.createDataFrame([("O'Brien",), ("plain",)], ["a.b"])
        quoted = ["O'Brien"]  # quote-bearing → eligible for the fallback
        fast = {r[0] for r in df.filter(pushdown.in_list("a.b", quoted)).collect()}
        orig = pushdown._default_literal_mode_confirmed
        pushdown._default_literal_mode_confirmed = lambda: False
        try:
            slow = {
                r[0] for r in df.filter(pushdown.in_list("a.b", quoted)).collect()
            }
        finally:
            pushdown._default_literal_mode_confirmed = orig
        assert fast == slow == {"O'Brien"}

    def test_fast_path_confirmed_from_worker_thread(self, spark):
        """run_per_table workers have no thread-local active session; the
        literal-mode probe must still confirm the process-global default
        via the instantiated session, keeping quote-bearing key lists on
        the one-round-trip fast path instead of per-key isin."""
        import threading

        from presencia_etl_spark.functions.pushdown import (
            _default_literal_mode_confirmed,
        )

        res = {}

        def worker():
            res["confirmed"] = _default_literal_mode_confirmed()

        t = threading.Thread(target=worker)
        t.start()
        t.join(30)
        assert res["confirmed"] is True

    def test_property_string_escaping_matches_isin(self, spark):
        """Property: for arbitrary printable strings, in_list == isin.
        Guards the SQL-literal escaping against parser semantics drift."""
        from hypothesis import given, settings
        from hypothesis import strategies as st

        from presencia_etl_spark.functions.pushdown import in_list

        # One shared frame: per-example Spark jobs would be seconds each.
        alphabet = st.characters(
            whitelist_categories=("L", "N", "P", "S", "Z"),
            whitelist_characters="'\\\"\n\t;`$%_",
        )

        @settings(max_examples=20, deadline=None)
        @given(st.lists(st.text(alphabet, max_size=12), min_size=1, max_size=8))
        def check(vals):
            df = spark.createDataFrame(
                [(v,) for v in vals] + [("__absent__",)], ["k"]
            )
            got = sorted(
                r["k"] for r in df.filter(in_list("k", vals)).collect()
            )
            want = sorted(
                r["k"] for r in df.filter(F.col("k").isin(vals)).collect()
            )
            assert got == want

        check()
