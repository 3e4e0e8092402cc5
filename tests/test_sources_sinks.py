"""Source/sink coverage: CSV all-string reads (S1), DDL schema parsing
(S2/F14), aux catalog DDL (S9), drop sink (S8)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from presencia_etl_spark.sinks.catalog import (
    AUX_TABLES,
    create_aux_tables,
    drop_tables,
    validate_enums,
)
from presencia_etl_spark.sources.readers import read_csv_all_string, table_exists
from presencia_etl_spark.sources.schema_parse import parse_ddl_columns, parse_ddl_schema

SAMPLE_DDL = """
-- ----------------------------------------------------------
-- mdb-schema style dump
-- ----------------------------------------------------------
CREATE TABLE `Socios` (
  `NUMSOCIO` varchar(50),
  `NOMSOCIO` varchar(255) NOT NULL,
  `IMPSOCIO` double,
  `ALTSOCIO` datetime,
  `BAJA` smallint,
  `ACTIVO` boolean,
  `ID` int AUTO_INCREMENT,
  PRIMARY KEY (`ID`)
);

CREATE TABLE `Cobradores` (
  `NUMCOB` int,
  `NOMCOB` text
);
"""


class TestSchemaParse:
    def test_columns_and_types(self):
        cols = parse_ddl_columns(SAMPLE_DDL, "Socios")
        assert list(cols) == [
            "NUMSOCIO", "NOMSOCIO", "IMPSOCIO", "ALTSOCIO", "BAJA", "ACTIVO", "ID",
        ]
        schema = parse_ddl_schema(SAMPLE_DDL, "Socios")
        by_name = {f.name: f.dataType for f in schema.fields}
        assert isinstance(by_name["NUMSOCIO"], T.StringType)
        assert isinstance(by_name["IMPSOCIO"], T.DoubleType)
        assert isinstance(by_name["ALTSOCIO"], T.TimestampType)
        assert isinstance(by_name["BAJA"], T.IntegerType)
        assert isinstance(by_name["ACTIVO"], T.BooleanType)
        assert isinstance(by_name["ID"], T.LongType)  # auto_increment → surrogate

    def test_second_table_and_missing(self):
        cols = parse_ddl_columns(SAMPLE_DDL, "Cobradores")
        assert cols == {"NUMCOB": "int", "NOMCOB": "text"}
        try:
            parse_ddl_columns(SAMPLE_DDL, "Nope")
            raise AssertionError("expected ValueError")
        except ValueError:
            pass


class TestCsvSource:
    def test_all_string_ingest(self, spark, tmp_path):
        p = tmp_path / "t.csv"
        p.write_text("A,FECALTA,IMPX\n1,01/15/22 00:00:00,10.5\n2,,\n")
        df = read_csv_all_string(spark, str(p))
        assert all(t == "string" for _, t in df.dtypes)
        rows = df.orderBy("A").collect()
        assert rows[0]["A"] == "1" and rows[1]["IMPX"] is None


class TestAuxCatalog:
    def test_create_validate_drop(self, spark):
        created = create_aux_tables(spark)
        assert set(created) == set(AUX_TABLES)
        assert table_exists(spark, "MensajesEnviados")

        good = spark.createDataFrame(
            [(1, "t", "m", "enviado", None, None)], AUX_TABLES["MensajesEnviados"]
        )
        bad = spark.createDataFrame(
            [(2, "t", "m", "whatever", None, None)], AUX_TABLES["MensajesEnviados"]
        )
        assert validate_enums(good, "MensajesEnviados").count() == 0
        assert validate_enums(bad, "MensajesEnviados").count() == 1

        drop_tables(spark, list(AUX_TABLES))
        assert not table_exists(spark, "MensajesEnviados")


class TestNanosTimestamps:
    def test_nanos_convert_exact_integer_division(self, spark, tmp_path):
        # Float `/ 1000` has 256 ns ulp at epoch scale — values like these
        # (dense sub-µs residues) drift 1µs off exact ns//1000 under the
        # old float path. The reader must match DuckDB's exact truncation.
        import pyarrow as pa
        import pyarrow.parquet as pq

        from presencia_etl_spark.sources.readers import read_parquet

        base = 1_700_000_000_000_000_000
        nanos = [base + i * 7_777_777_777 + r for i in range(200) for r in (0, 1, 499, 999)]
        table = pa.table({"ts": pa.array(nanos, type=pa.timestamp("ns"))})
        path = str(tmp_path / "ns.parquet")
        pq.write_table(table, path)

        df = read_parquet(spark, path)
        assert dict(df.dtypes)["ts"] == "timestamp"
        got = [
            r["us"]
            for r in df.selectExpr("unix_micros(ts) AS us").orderBy("us").collect()
        ]
        want = sorted(n // 1000 for n in nanos)
        assert got == want

    def test_nanos_convert_pre_epoch_matches_duckdb(self, spark, tmp_path):
        """Pre-epoch (negative) nanos: DuckDB's ns→µs cast truncates toward
        zero (-1500 ns → -1 µs, NOT floor's -2); `DIV 1000` must agree."""
        import duckdb
        import pyarrow as pa
        import pyarrow.parquet as pq

        from presencia_etl_spark.sources.readers import read_parquet

        nanos = [-1500, -1000, -999, -1, 0, 1, 999, 1000, 1500]
        table = pa.table({"ts": pa.array(nanos, type=pa.timestamp("ns"))})
        path = str(tmp_path / "ns_pre_epoch.parquet")
        pq.write_table(table, path)

        got = [
            r["us"]
            for r in read_parquet(spark, path)
            .selectExpr("unix_micros(ts) AS us")
            .orderBy("us")
            .collect()
        ]
        duck = sorted(
            int(v[0])
            for v in duckdb.connect()
            .execute(f"SELECT epoch_us(CAST(ts AS TIMESTAMP)) FROM '{path}'")
            .fetchall()
        )
        assert got == duck
        assert got == sorted(int(n / 1000) for n in nanos)  # trunc, not floor


class TestMdbSource:
    """The mdb-export scan (reference sync_ALL.py:128-137) with an injected
    exporter — the binary isn't in this container, but the full parse path
    (CSV quoting, all-string typing, ''→NULL) is exercised for real."""

    FAKE_EXPORT = (
        "NUMSOCIO,NOMBRE,IMPORTE,OBS\n"
        '0001,"PEREZ, JUAN",123.45,\n'
        '0002,"LOPEZ ""EL TANO"" LUIS",0,"linea\ncon salto"\n'
    )

    def _runner(self, calls):
        def run(cmd):
            calls.append(cmd)
            if cmd[0] == "mdb-export":
                return self.FAKE_EXPORT
            if cmd[0] == "mdb-tables":
                return "Socios\nCuotas\n"
            raise AssertionError(cmd)

        return run

    def test_export_parses_all_string_with_csv_semantics(self, spark):
        from presencia_etl_spark.sources.readers import read_mdb_table

        calls = []
        df = read_mdb_table(spark, "/x/Datos1.mdb", "Socios", runner=self._runner(calls))
        assert calls == [["mdb-export", "/x/Datos1.mdb", "Socios"]]
        assert [f.dataType.simpleString() for f in df.schema.fields] == ["string"] * 4
        rows = {r["NUMSOCIO"]: r for r in df.collect()}
        assert rows["0001"]["NOMBRE"] == "PEREZ, JUAN"  # embedded comma
        assert rows["0002"]["NOMBRE"] == 'LOPEZ "EL TANO" LUIS'  # escaped quotes
        assert rows["0002"]["OBS"] == "linea\ncon salto"  # embedded newline
        assert rows["0001"]["OBS"] is None  # '' → NULL (N2)

    def test_list_tables(self):
        from presencia_etl_spark.sources.readers import mdb_list_tables

        calls = []
        assert mdb_list_tables("/x/Datos1.mdb", runner=self._runner(calls)) == [
            "Socios",
            "Cuotas",
        ]

    def test_missing_binary_raises_clear_error(self, spark):
        from presencia_etl_spark.sources.readers import read_mdb_table

        with pytest.raises(RuntimeError, match="mdb-tools"):
            read_mdb_table(spark, "/x/Datos1.mdb", "Socios")


class TestJsonl:
    def test_roundtrip_and_quarantine(self, spark, tmp_path):
        from pyspark.sql import types as T

        from presencia_etl_spark.sources.readers import (
            jsonl_quarantine,
            read_jsonl,
            write_jsonl,
        )

        src = tmp_path / "corpus"
        src.mkdir()
        (src / "a.jsonl").write_text(
            '{"doc_id": 1, "text": "hello world"}\n'
            '{"doc_id": 2, "text": "second doc"}\n'
            "{broken json line\n"
            '{"doc_id": 3, "text": "third"}\n'
        )
        schema = T.StructType(
            [
                T.StructField("doc_id", T.LongType()),
                T.StructField("text", T.StringType()),
            ]
        )
        df = read_jsonl(spark, str(src), schema=schema)
        clean, bad = jsonl_quarantine(df)
        assert sorted(r["doc_id"] for r in clean.collect()) == [1, 2, 3]
        assert "_corrupt_record" not in clean.columns
        assert bad.count() == 1 and "broken" in bad.collect()[0][0]

        out = str(tmp_path / "out")
        write_jsonl(clean, out, compression=None)
        back = read_jsonl(spark, out, schema=schema)
        assert sorted(r["doc_id"] for r in back.collect()) == [1, 2, 3]

    def test_explicit_schema_skips_inference(self, spark, tmp_path):
        from pyspark.sql import types as T

        from presencia_etl_spark.sources.readers import read_jsonl

        p = tmp_path / "t.jsonl"
        p.write_text('{"a": 1, "b": "x"}\n')
        schema = T.StructType(
            [T.StructField("a", T.LongType()), T.StructField("b", T.StringType())]
        )
        df = read_jsonl(spark, str(p), schema=schema)
        assert [f.name for f in df.schema.fields] == ["a", "b", "_corrupt_record"]


class TestRangeSortedWrite:
    def test_files_own_disjoint_ranges(self, spark, tmp_path):
        import pyarrow.parquet as pq

        from presencia_etl_spark.sinks.writers import write_range_sorted

        df = spark.range(0, 10_000).select(
            (F.col("id") * 37 % 10_000).alias("k"), F.col("id").alias("v")
        )
        path = str(tmp_path / "sorted")
        write_range_sorted(df, path, "k", num_files=4)

        ranges = []
        for f in os.listdir(path):
            if f.endswith(".parquet"):
                md = pq.ParquetFile(os.path.join(path, f)).metadata
                mins, maxs = [], []
                for rg in range(md.num_row_groups):
                    st = md.row_group(rg).column(0).statistics
                    mins.append(st.min)
                    maxs.append(st.max)
                ranges.append((min(mins), max(maxs)))
        assert len(ranges) == 4
        ranges.sort()
        for (lo1, hi1), (lo2, _hi2) in zip(ranges, ranges[1:]):
            assert hi1 <= lo2  # disjoint value ranges → file-level skipping
        # Content survives the reorder.
        back = spark.read.parquet(path)
        assert back.count() == 10_000
        assert back.agg(F.sum("v")).collect()[0][0] == sum(range(10_000))


class TestZorderWrite:
    @staticmethod
    def _file_stats(path, col_names):
        import pyarrow.parquet as pq

        out = []
        for f in sorted(os.listdir(path)):
            if not f.endswith(".parquet"):
                continue
            md = pq.ParquetFile(os.path.join(path, f)).metadata
            schema_names = [md.schema.column(i).name for i in range(md.num_columns)]
            stats = {}
            for c in col_names:
                ci = schema_names.index(c)
                mins, maxs = [], []
                for rg in range(md.num_row_groups):
                    st = md.row_group(rg).column(ci).statistics
                    mins.append(st.min)
                    maxs.append(st.max)
                stats[c] = (min(mins), max(maxs))
            out.append(stats)
        return out

    @staticmethod
    def _overlapping(stats, box):
        n = 0
        for s in stats:
            if all(s[c][0] <= hi and s[c][1] >= lo for c, (lo, hi) in box.items()):
                n += 1
        return n

    def test_box_predicates_skip_files_on_both_columns(self, spark, tmp_path):
        """A 100×100 grid written z-ordered on (x, y): a quarter-plane box
        must overlap only a few files' min/max envelopes, where a plain
        x-sorted layout overlaps EVERY file for any y predicate."""
        from presencia_etl_spark.sinks.zorder import write_zordered

        df = spark.range(0, 10_000).select(
            (F.col("id") % 100).alias("x"),
            (F.col("id") / 100).cast("long").alias("y"),
            F.col("id").alias("v"),
        )
        zpath = str(tmp_path / "z")
        write_zordered(df, zpath, ["x", "y"], num_files=16)

        stats = self._file_stats(zpath, ["x", "y"])
        assert len(stats) == 16
        box = {"x": (0, 24), "y": (0, 24)}  # 1/16 of the plane
        z_hits = self._overlapping(stats, box)
        # The curve keeps the box local: a handful of files, not all 16.
        assert z_hits <= 4, stats

        # Baseline: linear sort on x alone — every file spans all of y,
        # so the same box touches every file whose x range intersects.
        from presencia_etl_spark.sinks.writers import write_range_sorted

        lpath = str(tmp_path / "linear")
        write_range_sorted(df.orderBy("x"), lpath, "x", num_files=16)
        lstats = self._file_stats(lpath, ["x", "y"])
        l_hits = self._overlapping(lstats, {"y": (0, 24)})
        assert l_hits == len(lstats)  # y predicate prunes nothing
        assert z_hits < self._overlapping(stats, {"y": (0, 24)}) or z_hits <= 4

        # Content survives the reorder.
        back = spark.read.parquet(zpath)
        assert back.count() == 10_000
        assert back.agg(F.sum("v")).collect()[0][0] == sum(range(10_000))

    def test_zorder_key_validation(self, spark):
        from presencia_etl_spark.sinks.zorder import zorder_key

        df = spark.range(3).select(F.col("id").alias("a"))
        try:
            zorder_key(df, [])
            assert False, "empty cols must raise"
        except ValueError:
            pass
        try:
            zorder_key(df, ["a"] * 9, bits=8)
            assert False, "bit overflow must raise"
        except ValueError:
            pass

    def test_skewed_column_still_spreads(self, spark, tmp_path):
        """Equi-depth rank buckets: 95% of x mass at one value must not
        collapse the curve — files still carve y into disjoint-ish bands
        (a value-scaled bucketing would put ~all rows in one z range)."""
        from presencia_etl_spark.sinks.zorder import write_zordered

        df = spark.range(0, 10_000).select(
            F.when(F.col("id") % 20 != 0, 7).otherwise(F.col("id") % 100)
            .cast("long").alias("x"),
            (F.col("id") % 500).alias("y"),
            F.col("id").alias("v"),
        )
        path = str(tmp_path / "skew")
        write_zordered(df, path, ["x", "y"], num_files=8)
        stats = self._file_stats(path, ["y"])
        # y stats must differentiate files (not every file spanning the
        # full 0..499 range).
        full_span = sum(1 for s in stats if s["y"][0] == 0 and s["y"][1] == 499)
        assert full_span < len(stats)


class TestCsvUnionAndDrift:
    def test_column_union_across_files(self, spark, tmp_path):
        from presencia_etl_spark.sources.readers import read_csv_union

        p1 = tmp_path / "a.csv"
        p1.write_text("A,B\n1,x\n")
        p2 = tmp_path / "b.csv"
        p2.write_text("A,C\n2,y\n")
        df = read_csv_union(spark, [str(p1), str(p2)])
        assert sorted(df.columns) == ["A", "B", "C"]
        rows = {r["A"]: (r["B"], r["C"]) for r in df.collect()}
        assert rows == {"1": ("x", None), "2": (None, "y")}

    def test_schema_drift_detection(self, spark):
        from presencia_etl_spark.sources.readers import check_schema_drift

        df = spark.createDataFrame([("1", "2")], ["A", "NEWCOL"])
        added, removed = check_schema_drift(df, ["A", "GONE"], fail=False)
        assert added == ["NEWCOL"] and removed == ["GONE"]
        try:
            check_schema_drift(df, ["A", "GONE"], fail=True)
            raise AssertionError("expected ValueError")
        except ValueError as e:
            assert "NEWCOL" in str(e) and "GONE" in str(e)


class TestTimestampEncodings:
    """The driver's testdata changed ns→µs parquet timestamps between rounds
    and silently broke three NTZ-blind code paths (round-4 verdict). Pin that
    all three physical encodings — ns, µs-naive (Spark: NTZ), µs-UTC (Spark:
    LTZ) — read identically and survive the timestamp-arithmetic operators."""

    def _write_encodings(self, tmp_path):
        import pyarrow as pa
        import pyarrow.parquet as pq

        base = 1_700_000_000_000_000  # µs, 2023-11-14T22:13:20Z
        us = [base + i * 37_000_000 for i in range(400)]
        uid = [i % 7 for i in range(400)]
        eid = list(range(400))
        paths = {}
        for name, typ in (
            ("ns", pa.timestamp("ns")),
            ("us_naive", pa.timestamp("us")),
            ("us_utc", pa.timestamp("us", tz="UTC")),
        ):
            vals = [v * 1000 for v in us] if name == "ns" else us
            table = pa.table(
                {
                    "ts": pa.array(vals, type=typ),
                    "user_id": pa.array(uid, type=pa.int64()),
                    "event_id": pa.array(eid, type=pa.int64()),
                }
            )
            p = str(tmp_path / f"ev_{name}.parquet")
            pq.write_table(table, p)
            paths[name] = p
        return paths

    def test_reader_normalizes_all_encodings_to_ltz(self, spark, tmp_path):
        from presencia_etl_spark.sources.readers import read_parquet

        micros = {}
        for name, p in self._write_encodings(tmp_path).items():
            df = read_parquet(spark, p)
            assert dict(df.dtypes)["ts"] == "timestamp", (name, df.dtypes)
            micros[name] = [
                r["us"]
                for r in df.selectExpr("unix_micros(ts) AS us").orderBy("us").collect()
            ]
        assert micros["ns"] == micros["us_naive"] == micros["us_utc"]

    def test_asof_and_range_join_encoding_invariant(self, spark, tmp_path):
        from presencia_etl_spark.operators.joins import asof_join, range_join
        from presencia_etl_spark.sources.readers import read_parquet

        results = {}
        for name, p in self._write_encodings(tmp_path).items():
            df = read_parquet(spark, p)
            left = df.filter(F.col("event_id") % 2 == 0).select("user_id", "ts")
            right = df.filter(F.col("event_id") % 2 == 1).select(
                "user_id", "ts", "event_id"
            )
            a = asof_join(left, right, "user_id", "ts", "ts")
            asof_rows = sorted(
                (r["user_id"], str(r["ts"]), r["event_id_asof"]) for r in a.collect()
            )
            rj = range_join(
                df, df, "user_id", "ts", "ts", 120, right_carry=["event_id"]
            )
            n_pairs = rj.count()
            results[name] = (asof_rows, n_pairs)
        assert results["ns"] == results["us_naive"] == results["us_utc"]
        assert results["ns"][1] > 0

    def test_windowed_counts_accept_ntz_event_time(self, spark, tmp_path):
        # Raw NTZ frame (bypassing read_parquet) must still watermark:
        # windowed_event_counts casts the event-time column itself.
        from presencia_etl_spark.streaming.windows import windowed_event_counts

        p = self._write_encodings(tmp_path)["us_naive"]
        raw = spark.read.parquet(p).withColumn("value", F.lit(1.0)).withColumn(
            "event_type", F.lit("click")
        )
        assert dict(raw.dtypes)["ts"].startswith("timestamp_ntz")
        out = windowed_event_counts(raw, watermark="2 hours")
        assert out.agg(F.sum("cnt")).collect()[0][0] == 400
