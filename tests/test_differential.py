"""Seeded randomized differential tests: the Spark expressions vs faithful
Python re-implementations of the reference's row-wise semantics
(sync_ALL.py / sync_INCREMENTAL.py behavior, re-derived — not copied).

One DataFrame per property (hundreds of generated cases per run) keeps the
Spark round-trip count low while covering far more of the input space than
the table-driven unit tests.
"""

from __future__ import annotations

import hashlib
import random
import string
from datetime import datetime

from pyspark.sql import types as T

from presencia_etl_spark.functions import normalize_key, parse_access_datetime, row_hash

SEED = 20260813


def ref_normalize_key(value):
    """normalize_key_value semantics (sync_INCREMENTAL.py:211-224)."""
    if value is None:
        return ""
    s = str(value).strip()
    try:
        f = float(s)
        if f == int(f):
            return str(int(f))
        return str(f)
    except (ValueError, OverflowError):
        return s


def ref_row_hash(row: dict, columns) -> str:
    values = []
    for col in sorted(columns):
        val = row.get(col, "")
        values.append(str(val) if val else "NULL")
    return hashlib.sha256("|".join(values).encode()).hexdigest()


def ref_parse_date(value):
    """convert_date_value semantics (sync_ALL.py:167-182 format list)."""
    if not value or value == "":
        return None
    for fmt in (
        "%m/%d/%y %H:%M:%S",
        "%m/%d/%Y %H:%M:%S",
        "%Y-%m-%d %H:%M:%S",
        "%m/%d/%y",
        "%m/%d/%Y",
    ):
        try:
            return datetime.strptime(value, fmt)
        except ValueError:
            continue
    return None


def _random_keys(rng: random.Random, n: int) -> list[str | None]:
    out: list[str | None] = [None, "", " ", "0", "-0", "00.0", "1e2", "nan", "inf", "-inf"]
    while len(out) < n:
        kind = rng.randrange(6)
        if kind == 0:
            out.append(str(rng.randint(-10**9, 10**9)))
        elif kind == 1:
            out.append(f"{rng.uniform(-1e6, 1e6):.{rng.randrange(1, 6)}f}")
        elif kind == 2:
            out.append(" " * rng.randrange(3) + str(rng.randint(0, 999)) + ".0" * rng.randrange(2) + " " * rng.randrange(3))
        elif kind == 3:
            out.append("".join(rng.choices(string.ascii_letters + "  -_.", k=rng.randrange(1, 12))))
        elif kind == 4:
            out.append(str(rng.randint(0, 99)) + "." + "0" * rng.randrange(1, 4))
        else:
            out.append("".join(rng.choices(string.digits + ".", k=rng.randrange(1, 10))))
    return out[:n]


class TestNormalizeKeyDifferential:
    def test_500_random_keys(self, spark):
        rng = random.Random(SEED)
        keys = _random_keys(rng, 500)
        df = spark.createDataFrame(
            [(k,) for k in keys],
            T.StructType([T.StructField("k", T.StringType())]),
        )
        got = [r["n"] for r in df.select(normalize_key("k").alias("n")).collect()]
        mismatches = []
        for k, g in zip(keys, got):
            want = ref_normalize_key(k)
            # Documented deviation: the reference renders non-integral floats
            # via Python repr ('0.10000000000000001' pre-3.1 style never
            # occurs on py3; but '1.20' → '1.2'); Spark renders the same
            # shortest repr. Scientific-notation outputs may differ in case
            # only ('1e+20' vs '1.0E20') — normalize for comparison.
            if g != want and g.lower().replace("+", "") != want.lower().replace("+", ""):
                mismatches.append((k, g, want))
        assert not mismatches, mismatches[:10]


class TestRowHashDifferential:
    def test_300_random_rows(self, spark):
        rng = random.Random(SEED + 1)
        cols = ["Z", "a", "M", "b"]  # unsorted on purpose
        rows = []
        for _ in range(300):
            rows.append(
                tuple(
                    rng.choice(
                        [None, "", "0", "x|y", "ñé", " sp ", str(rng.randint(0, 9999))]
                    )
                    for _ in cols
                )
            )
        schema = T.StructType([T.StructField(c, T.StringType()) for c in cols])
        df = spark.createDataFrame(rows, schema)
        got = [r["h"] for r in df.select(row_hash(cols).alias("h")).collect()]
        for row, g in zip(rows, got):
            want = ref_row_hash(dict(zip(cols, row)), cols)
            assert g == want, (row, g, want)


class TestDateParseDifferential:
    def test_400_random_dates(self, spark):
        rng = random.Random(SEED + 2)
        samples: list[str | None] = [None, "", "garbage", "13/13/13 25:61:61", "2/30/20"]
        for _ in range(400):
            y = rng.randint(1970, 2067)  # two-digit-year pivot zone excluded below
            mo, d = rng.randint(1, 12), rng.randint(1, 28)
            h, mi, s = rng.randint(0, 23), rng.randint(0, 59), rng.randint(0, 59)
            fmt = rng.randrange(5)
            if fmt == 0:
                samples.append(f"{mo:02d}/{d:02d}/{y % 100:02d} {h:02d}:{mi:02d}:{s:02d}")
            elif fmt == 1:
                samples.append(f"{mo:02d}/{d:02d}/{y} {h:02d}:{mi:02d}:{s:02d}")
            elif fmt == 2:
                samples.append(f"{y}-{mo:02d}-{d:02d} {h:02d}:{mi:02d}:{s:02d}")
            elif fmt == 3:
                samples.append(f"{mo:02d}/{d:02d}/{y % 100:02d}")
            else:
                samples.append(f"{mo:02d}/{d:02d}/{y}")
        df = spark.createDataFrame(
            [(v,) for v in samples],
            T.StructType([T.StructField("d", T.StringType())]),
        )
        got = [r["p"] for r in df.select(parse_access_datetime("d").alias("p")).collect()]
        mismatches = []
        for v, g in zip(samples, got):
            want = ref_parse_date(v)
            # Two-digit-year pivot difference (documented N2): Python maps
            # 69-99 → 19xx, Spark 'yy' → 20xx. Reference data is 2006-2025
            # (safe); exclude pivot-zone two-digit years from the assertion.
            if v and len(v.split("/")) == 3:
                yy = v.split("/")[2].split(" ")[0]
                if len(yy) == 2 and int(yy) >= 69:
                    continue
            if g != want:
                mismatches.append((v, g, want))
        assert not mismatches, mismatches[:10]
