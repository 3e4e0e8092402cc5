"""Differential tests: driver-side (pure-Python) expression parity vs
the live Spark expressions — the foundation the zero-job trickle paths
stand on. Every family is compared against what Spark actually computes
in THIS session, so a Spark upgrade that changed a rendering would fail
here instead of silently corrupting maintained state."""

from __future__ import annotations

import datetime
import random
import struct

import pytest
from pyspark.sql import functions as F

from presencia_etl_spark.functions import driver_parity as dp
from presencia_etl_spark.functions.hashing import with_row_hash
from presencia_etl_spark.functions.keys import normalize_key
from presencia_etl_spark.operators import cdc


def _adversarial_strings(rng: random.Random) -> list[str]:
    fixed = [
        "", " ", "  x  ", "a|b", "30", "30.0", "-30.00", "0030", "3.5",
        "-0.0", "0.0", "1e3", "1E-3", "1e+3", ".5", "5.", "+7", "-7.25",
        "1d", "1D", "1f", "2.5F", "0x1p3", "0X1.8p1", "1_0", "1_000.5",
        "Infinity", "-Infinity", "NaN", "inf", "nan", "INFINITY",
        "9007199254740993", "4611686018427387904", "9223372036854775807",
        "18446744073709551616", "1.7976931348623157E308", "4.9E-324",
        "1e400", "-1e400", "0.1", "0.001", "0.0001", "00.100",
        " 42 ", "\t42", "42\n", "x", "Ünïcødé", "null", "NULL", "None",
        "12a", "a12", "1.2.3", "--5", "++5", "1e", "e5", ".", "-", "+",
        # unicode whitespace/digit traps: Java Double.parseDouble trims
        # only chars <= U+0020 and accepts ASCII digits only; Python's
        # strip()/\d/float() are unicode-lenient and used to parse these
        # (→ canonicalized key), diverging from Spark's raw-string key.
        "1\u00a0", "\u00a01", "\u00a042\u00a0", "3\u00a05",
        "\u0663", "\u0663\u0663", "\u0664\u0662", "1\u0663", "12\u06f3",
        "\u0e52\u0e52", "\uff11\uff12\uff13", "1\u200b", "\u200b7",
        "5\u3000", "\u20284\u2029", "\u16804",
        "\x0142", "42\x1f", "\x1c7\x1d", "\x007", "7\x00",
    ]
    alpha = "0123456789.eE+-xXpPdDfF_ aZ|"
    rand = [
        "".join(rng.choice(alpha) for _ in range(rng.randrange(1, 12)))
        for _ in range(300)
    ]
    return fixed + rand


class TestXxhash64Parity:
    def test_string_chains(self, spark):
        rng = random.Random(7)
        strs = ["", "a", "x" * 7, "x" * 8, "x" * 31, "x" * 32, "x" * 33,
                "ünïcødé|123"] + [
            "".join(rng.choice("abcXYZ|0123456789éñ")
                    for _ in range(rng.randrange(0, 100)))
            for _ in range(60)
        ]
        rows = (
            spark.createDataFrame([(s,) for s in strs], "s string")
            .select(
                "s",
                F.xxhash64("s").alias("h1"),
                F.xxhash64("s", "s").alias("h2"),
                F.xxhash64("s", F.lit(1)).alias("h3"),
                F.xxhash64("s", F.lit(7).cast("long")).alias("h4"),
            )
            .collect()
        )
        for r in rows:
            b = r["s"].encode("utf-8")
            assert dp.to_signed64(dp.xxh64(b, 42)) == r["h1"]
            assert dp.to_signed64(dp.xxh64(b, dp.xxh64(b, 42))) == r["h2"]
            assert dp.to_signed64(dp.xxh64_int(1, dp.xxh64(b, 42))) == r["h3"]
            assert dp.to_signed64(dp.xxh64_long(7, dp.xxh64(b, 42))) == r["h4"]

    def test_fold_pair_and_buckets(self, spark):
        rng = random.Random(13)
        pairs = [
            (f"k{i}|{rng.randrange(1000)}", f"{rng.getrandbits(64):x}")
            for i in range(50)
        ] + [("", ""), ("a", "b")]
        df = spark.createDataFrame(pairs, f"{cdc.KEY_COL} string, row_hash string")
        h1, h2 = cdc._fold_exprs("row_hash")
        rows = df.select(
            cdc.KEY_COL,
            "row_hash",
            h1.alias("h1"),
            h2.alias("h2"),
            cdc.micro_bucket().alias("mb"),
            F.pmod(F.xxhash64(F.col(cdc.KEY_COL)), F.lit(64))
            .cast("int")
            .alias("kb"),
        ).collect()
        for r in rows:
            p1, p2 = dp.fold_pair(r[cdc.KEY_COL], r["row_hash"])
            assert (p1, p2) == (r["h1"], r["h2"])
            assert dp.xxhash64_str(r[cdc.KEY_COL]) % 16384 == r["mb"]
            assert dp.pmod_bucket(r[cdc.KEY_COL], 64) == r["kb"]


class TestCastRenderParity:
    def test_double_safe_region_and_jvm_fallback(self, spark):
        rng = random.Random(11)
        vals = [0.0, -0.0, 1.0, 0.001, 0.0001, 9.999e-4, 1e7, 9999999.0,
                1.5, 123456.789, 2.0 / 3.0]
        while len(vals) < 4000:
            b = rng.getrandbits(64)
            d = struct.unpack(">d", struct.pack(">Q", b))[0]
            if d == d and abs(d) != float("inf") and (
                dp._MIN_NORMAL <= abs(d) < dp._TWO53
            ):
                vals.append(d)
            vals.append(rng.uniform(-1e8, 1e8))
            vals.append(round(rng.uniform(-1e5, 1e5), rng.randrange(0, 6)))
        # out-of-region values exercise the JVM fallback
        out = [1e23, 5e-324, 5.7037124590350416e16, 1e308, 2.0**53]
        df = spark.createDataFrame([(v,) for v in vals + out], "d double")
        rows = df.select("d", F.col("d").cast("string").alias("s")).collect()
        jvm = spark._jvm
        for r in rows:
            assert dp.java_double_str(r["d"], jvm=jvm) == r["s"]
        with pytest.raises(dp.UnsupportedValue):
            dp.java_double_str(1e23)  # out of region, no gateway

    def test_timestamp_date_bool_int(self, spark):
        rng = random.Random(5)
        tss = [
            datetime.datetime(1970, 1, 1)
            + datetime.timedelta(microseconds=rng.randrange(0, 4102444800_000_000))
            for _ in range(120)
        ] + [
            datetime.datetime(2024, 1, 2, 3, 4, 5),
            datetime.datetime(2024, 1, 2, 3, 4, 5, 100000),
            datetime.datetime(2024, 1, 2, 3, 4, 5, 123456),
            datetime.datetime(1900, 1, 1),
        ]
        rows = (
            spark.createDataFrame([(t,) for t in tss], "t timestamp")
            .select("t", F.col("t").cast("string").alias("s"))
            .collect()
        )
        for r in rows:
            assert dp.cast_to_string(r["t"], "timestamp") == r["s"]
        dates = [datetime.date(1, 1, 1), datetime.date(2024, 2, 29),
                 datetime.date(9999, 12, 31)]
        rows = (
            spark.createDataFrame([(d,) for d in dates], "d date")
            .select("d", F.col("d").cast("string").alias("s"))
            .collect()
        )
        for r in rows:
            assert dp.cast_to_string(r["d"], "date") == r["s"]
        assert dp.cast_to_string(True, "bool") == "true"
        assert dp.cast_to_string(False, "bool") == "false"
        assert dp.cast_to_string(-7, "int32") == "-7"
        assert dp.cast_to_string(2**62, "int64") == str(2**62)
        assert dp.cast_to_string(None, "string") is None


class TestNormalizeKeyParity:
    def test_string_corpus(self, spark):
        rng = random.Random(3)
        strs = _adversarial_strings(rng)
        rows = (
            spark.createDataFrame([(s,) for s in strs], "s string")
            .select("s", normalize_key("s").alias("n"))
            .collect()
        )
        jvm = spark._jvm
        for r in rows:
            got = dp.normalize_key_value(r["s"], "string", jvm=jvm)
            assert got == r["n"], f"normalize({r['s']!r}): {got!r} != {r['n']!r}"

    def test_typed_keys(self, spark):
        rng = random.Random(9)
        ints = [0, -1, 7, 2**31 - 1, -(2**31), 2**53, 2**62, 2**63 - 1,
                -(2**63)] + [rng.randrange(-10**9, 10**9) for _ in range(50)]
        rows = (
            spark.createDataFrame([(i,) for i in ints], "k long")
            .select("k", normalize_key("k").alias("n"))
            .collect()
        )
        jvm = spark._jvm
        for r in rows:
            assert dp.normalize_key_value(r["k"], "int64", jvm=jvm) == r["n"]
        dates = [datetime.date(2024, 5, 6), datetime.date(1, 1, 1)]
        rows = (
            spark.createDataFrame([(d,) for d in dates], "k date")
            .select("k", normalize_key("k").alias("n"))
            .collect()
        )
        for r in rows:
            assert dp.normalize_key_value(r["k"], "date") == r["n"]
        assert dp.normalize_key_value(None, "string") == ""


class TestRowHashAndCompositeParity:
    def _frame(self, spark, rng):
        rows = []
        for i in range(200):
            rows.append(
                (
                    i,
                    rng.choice([None, "", "x", "a|b", " pad ", f"v{i}",
                                "30.0", "Ünï"]),
                    rng.choice([None, rng.uniform(-1e6, 1e6),
                                float(rng.randrange(-99, 99)), -0.0]),
                    rng.choice([None, True, False]),
                    rng.choice(
                        [None, datetime.date(2024, 1, 1 + i % 28)]
                    ),
                    rng.choice(
                        [
                            None,
                            datetime.datetime(2024, 1, 2, 3, 4, 5)
                            + datetime.timedelta(
                                microseconds=rng.randrange(0, 10**9)
                            ),
                        ]
                    ),
                )
            )
        return spark.createDataFrame(
            rows,
            "k int, s string, d double, b boolean, dt date, ts timestamp",
        )

    def test_row_hash_both_algos(self, spark):
        rng = random.Random(21)
        df = self._frame(spark, rng)
        cols = ["k", "s", "d", "b", "dt", "ts"]
        kinds = {"k": "int32", "s": "string", "d": "double", "b": "bool",
                 "dt": "date", "ts": "timestamp"}
        out = with_row_hash(
            with_row_hash(df, cols), cols, hash_col="h64", algo="xxh64"
        ).collect()
        jvm = spark._jvm
        for r in out:
            row = {c: r[c] for c in cols}
            assert dp.row_hash_value(row, cols, kinds, "sha256", jvm) == r["row_hash"]
            assert dp.row_hash_value(row, cols, kinds, "xxh64", jvm) == r["h64"]

    def test_composite_key(self, spark):
        rng = random.Random(22)
        df = self._frame(spark, rng)
        out = cdc.with_cdc_key(df, ["k", "s", "dt"]).collect()
        jvm = spark._jvm
        for r in out:
            got = dp.composite_key(
                [r["k"], r["s"], r["dt"]], ["int32", "string", "date"], jvm
            )
            assert got == r[cdc.KEY_COL]
