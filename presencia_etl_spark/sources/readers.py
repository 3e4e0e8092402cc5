"""Sources (SURVEY §2.1, S1–S4).

The reference's only real source is ``mdb-export`` CSV text parsed into
all-string dicts (S1) plus a regex-parsed ``mdb-schema`` dump (S2). Our
engine reads:

- **CSV all-string** — the direct S1 analog (header row, every column
  StringType, typing deferred to the cast plan exactly like the reference
  types only at the sink);
- **parquet** — the test/bench source; scans get column pruning + predicate
  pushdown from Catalyst for free;
- **JDBC** — the S3 analog; Catalyst pushes projections/predicates into the
  remote SQL, ``partitionColumn/numPartitions`` shard the read across
  executors (the reference read single-threaded).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


def read_csv_all_string(spark: SparkSession, path: str) -> DataFrame:
    """S1: header CSV, every column string, no inference (typing happens in
    the cast plan, mirroring csv.DictReader semantics)."""
    df = spark.read.option("header", True).option("inferSchema", False).csv(path)
    # Ensure all-string even if a schema was cached.
    cols = [c for c in df.columns]
    casted = df.select(*[df[c].cast(T.StringType()).alias(c) for c in cols])
    return casted


def read_parquet(spark: SparkSession, path: str) -> DataFrame:
    """Parquet read tolerant of TIMESTAMP(NANOS) columns.

    Spark rejects parquet nanosecond timestamps outright; with
    ``nanosAsLong`` they surface as long nanos, which we convert to a real
    microsecond timestamp (matching how DuckDB reads the same file). The
    conf is a dynamic SQL conf, so this works under any caller's session.
    """
    try:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    except Exception:
        pass
    df = spark.read.parquet(path)
    ns_cols = _nanos_columns(path)
    from pyspark.sql import functions as F

    for c in ns_cols:
        if c in df.columns and dict(df.dtypes).get(c) == "bigint":
            # Integer division: float `/ 1000` promotes int64 nanos to a
            # double whose ulp at epoch scale (~1.7e18) is 256 ns, so the
            # result can drift 1µs off nondeterministically per value.
            # `DIV` truncates toward zero — which is ALSO what DuckDB's
            # ns→µs cast does for pre-epoch (negative) nanos (verified:
            # -1500 ns → -1 µs, not floor's -2), so the engines agree on
            # both sides of the epoch (regression-tested pre/post-epoch).
            df = df.withColumn(
                c, F.expr(f"timestamp_micros(CAST(`{c}` DIV 1000 AS BIGINT))")
            )
    # Parquet µs timestamps without a timezone flag surface as TIMESTAMP_NTZ,
    # which breaks long-casts (CAST_WITHOUT_SUGGESTION) and streaming
    # watermarks (EVENT_TIME_IS_NOT_ON_TIMESTAMP_TYPE). Normalize to LTZ at
    # the boundary so no operator ever sees NTZ; with the session pinned to
    # UTC (session.py) the cast is value-transparent and matches how DuckDB
    # renders the same file.
    for c, dt in df.dtypes:
        if dt.startswith("timestamp_ntz"):
            df = df.withColumn(c, F.col(c).cast("timestamp"))
    return df


def _nanos_columns(path: str) -> list[str]:
    """Columns stored as TIMESTAMP(NANOS) in the parquet footer."""
    try:
        import pyarrow.dataset as ds
        import pyarrow as pa

        schema = ds.dataset(path, format="parquet").schema
        return [
            f.name
            for f in schema
            if isinstance(f.type, pa.TimestampType) and f.type.unit == "ns"
        ]
    except Exception:
        return []


def read_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one of the driver's testdata tables."""
    return read_parquet(spark, f"{sf_dir}/{name}.parquet")


def read_jdbc(
    spark: SparkSession,
    url: str,
    table: str,
    properties: dict[str, str] | None = None,
    partition_column: str | None = None,
    num_partitions: int = 8,
    lower_bound: int | None = None,
    upper_bound: int | None = None,
) -> DataFrame:
    """S3: JDBC scan; when a numeric partition column is given the read is
    sharded into ``num_partitions`` parallel range queries."""
    reader = spark.read.format("jdbc").option("url", url).option("dbtable", table)
    for k, v in (properties or {}).items():
        reader = reader.option(k, v)
    if partition_column is not None:
        reader = (
            reader.option("partitionColumn", partition_column)
            .option("numPartitions", num_partitions)
            .option("lowerBound", lower_bound if lower_bound is not None else 0)
            .option("upperBound", upper_bound if upper_bound is not None else 1_000_000)
        )
    return reader.load()


def table_exists(spark: SparkSession, name: str) -> bool:
    """S4: table-existence probe (SHOW TABLES LIKE analog)."""
    return spark.catalog.tableExists(name)


def read_csv_union(spark: SparkSession, paths: list[str]) -> DataFrame:
    """Column-union CSV read: the reference's get_all_columns semantics
    (sync_ALL.py:158-165 — the schema is the UNION of keys across rows/
    files; rows missing a column get NULL there). Spark CSV takes one
    file's header for a whole directory, so files with differing headers
    are read separately and unioned by name with missing columns allowed.
    """
    frames = [read_csv_all_string(spark, p) for p in paths]
    out = frames[0]
    for f in frames[1:]:
        out = out.unionByName(f, allowMissingColumns=True)
    return out


def read_mdb_table(
    spark: SparkSession,
    mdb_path: str,
    table: str,
    runner=None,
) -> DataFrame:
    """S1 primary source: an Access table via ``mdb-export`` — the
    reference's actual scan (``sync_ALL.py:128-137``: subprocess mdb-export
    → csv.DictReader all-string rows). Same semantics here: the exported
    CSV is parsed all-string (typing stays in the cast plan, N1).

    ``runner(cmd: list[str]) -> str`` abstracts the subprocess so the
    parsing layer is testable without the binary (this container has no
    mdb-tools and the reference's .mdb is a Git-LFS pointer); the default
    runner shells out and raises a clear error when mdb-tools is missing.
    The export happens driver-side — Access files are single-machine
    artifacts by nature (the reference reads one too); the DataFrame that
    leaves here is distributed like any other all-string source.
    """
    csv_text = (runner or _run_mdb_export)(["mdb-export", mdb_path, table])
    return _csv_text_all_string(spark, csv_text)


def mdb_list_tables(mdb_path: str, runner=None) -> list[str]:
    """``mdb-tables -1`` analog (one name per line)."""
    out = (runner or _run_mdb_export)(["mdb-tables", "-1", mdb_path])
    return [line.strip() for line in out.splitlines() if line.strip()]


def _run_mdb_export(cmd: list[str]) -> str:
    import subprocess

    try:
        return subprocess.run(
            cmd, capture_output=True, text=True, check=True
        ).stdout
    except FileNotFoundError as e:
        raise RuntimeError(
            f"{cmd[0]} not found — install mdb-tools to read Access files, "
            "or pass runner= for a custom exporter"
        ) from e


def _csv_text_all_string(spark: SparkSession, csv_text: str) -> DataFrame:
    """Parse in-memory CSV text with full CSV semantics (quoting, embedded
    commas/newlines — csv.DictReader parity) into an all-string frame."""
    import csv as _csv
    from io import StringIO

    rows = list(_csv.reader(StringIO(csv_text)))
    if not rows:
        return spark.createDataFrame([], T.StructType([]))
    header, data = rows[0], rows[1:]
    schema = T.StructType([T.StructField(c, T.StringType()) for c in header])
    # '' → NULL at the boundary, mirroring read_csv_all_string + N2.
    cleaned = [[v if v != "" else None for v in r] for r in data]
    return spark.createDataFrame(cleaned, schema)


def read_jsonl(
    spark: SparkSession,
    path: str,
    schema=None,
    corrupt_col: str = "_corrupt_record",
) -> DataFrame:
    """Read a JSONL corpus (the standard training-data interchange format).

    PERMISSIVE mode: malformed lines land whole in ``corrupt_col`` instead
    of failing the job — at corpus scale a handful of bad lines must not
    kill a 100 TB read; filter/route them downstream (``jsonl_quarantine``
    splits the frame). With an explicit ``schema`` Spark skips the
    inference pass (one full scan saved — always pass one at scale; the
    corrupt column is appended to it automatically).
    """
    reader = (
        spark.read.option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", corrupt_col)
    )
    if schema is not None:
        if corrupt_col not in [f.name for f in schema.fields]:
            schema = T.StructType(
                list(schema.fields) + [T.StructField(corrupt_col, T.StringType())]
            )
        reader = reader.schema(schema)
    return reader.json(path)


def jsonl_quarantine(
    df: DataFrame, corrupt_col: str = "_corrupt_record"
) -> tuple[DataFrame, DataFrame]:
    """(clean_rows_without_corrupt_col, corrupt_lines) — route bad lines to
    a quarantine sink instead of silently dropping them.

    The parsed frame is cached first: Spark refuses queries that reference
    ONLY the internal corrupt-record column (SPARK-26228 semantics — the
    raw line isn't available post-pushdown otherwise). The cache holds the
    parsed batch once for both output legs; unpersist after writing them.
    """
    if corrupt_col not in df.columns:
        return df, df.limit(0).select(F.lit("").alias(corrupt_col))
    df = df.cache()
    clean = df.filter(F.col(corrupt_col).isNull()).drop(corrupt_col)
    bad = df.filter(F.col(corrupt_col).isNotNull()).select(corrupt_col)
    return clean, bad


def write_jsonl(df: DataFrame, path: str, compression: str | None = "gzip") -> None:
    """Write a JSONL corpus (gzip by default — splittable formats beat it
    at scale, but gzip-JSONL is the lingua franca consumers expect)."""
    w = df.write.mode("overwrite")
    if compression:
        w = w.option("compression", compression)
    w.json(path)


def check_schema_drift(
    df: DataFrame, expected_columns: list[str], fail: bool = True
) -> tuple[list[str], list[str]]:
    """Schema-drift probe: (added, removed) vs the expected column set.

    The reference fails loudly when Access grows a column the target lacks
    ('Unknown column', context/context.md:900-903); parity behavior is this
    check before a sync. ``fail=False`` just reports (the caller can then
    widen the target — the Delta mergeSchema-style fix).
    """
    have = set(df.columns)
    want = set(expected_columns)
    added = sorted(have - want)
    removed = sorted(want - have)
    if fail and (added or removed):
        raise ValueError(f"schema drift: added={added} removed={removed}")
    return added, removed
