"""Data-profiling operator: per-column quality summary.

The training-data curation primitive (and the generalization of the
reference's DESCRIBE-based schema audits, SURVEY §5 item 3): one pass over
the table computes, per column, null count/rate, approximate distinct
count, and min/max rendered as strings. All aggregations ride in a single
``agg()`` — one job, partial-aggregated, no per-column scans.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def profile(
    df: DataFrame,
    columns: list[str] | None = None,
    exact_distinct: bool = False,
    include_min_max: bool = True,
) -> DataFrame:
    """Long-format profile: (column, n_rows, n_null, null_rate,
    n_distinct[, min_value, max_value]).

    ``exact_distinct=False`` uses HLL (approx_count_distinct) — the scale
    default; exact costs one distinct-aggregate per column.

    ``include_min_max=False`` drops the min/max leg entirely. Callers
    that project the min/max columns away cannot rely on Catalyst to
    prune them — the ``stack()`` Generate consumes every aggregate, so
    the optimizer keeps computing string min/max it then discards
    (measured as a whole extra aggregate pass on q11). Manual pruning
    via this flag is the only way the scan stays counts-only.
    """
    cols = columns or df.columns
    # Counting aggregates and the string-rendered min/max run as two
    # SEPARATE one-row aggregates, cross-joined back. Fused, the string
    # min/max buffers (variable-length) disqualify HashAggregate, so the
    # countDistinct rewrite's Expand(×cols) output went through
    # SortAggregate — a full sort of the expanded table on BOTH sides of
    # the exchange (q11 before-plan: 2 sorts over 4×|orders| rows,
    # dominated by the unused-but-unpruned min/max columns). Split, the
    # counts stay in HashAggregate and the keyless min/max aggregate
    # needs no sort at all; the second scan is narrow and columnar.
    cnt_aggs = [F.count(F.lit(1)).alias("_n")]
    mm_aggs = []
    for c in cols:
        col = F.col(c)
        cnt_aggs.append(F.count(F.when(col.isNull(), 1)).alias(f"_null_{c}"))
        if exact_distinct:
            cnt_aggs.append(F.countDistinct(col).alias(f"_dist_{c}"))
        else:
            cnt_aggs.append(F.approx_count_distinct(col, 0.02).alias(f"_dist_{c}"))
        if include_min_max:
            mm_aggs.append(F.min(col).cast("string").alias(f"_min_{c}"))
            mm_aggs.append(F.max(col).cast("string").alias(f"_max_{c}"))
    wide = df.agg(*cnt_aggs)
    if include_min_max:
        wide = wide.crossJoin(df.agg(*mm_aggs))

    value_cols = (
        ["n_null", "n_distinct", "min_value", "max_value"]
        if include_min_max
        else ["n_null", "n_distinct"]
    )
    stack_args = []
    for c in cols:
        stack_args.append(f"'{c}'")
        stack_args.extend([f"_null_{c}", f"_dist_{c}"])
        if include_min_max:
            stack_args.extend([f"_min_{c}", f"_max_{c}"])
    stacked = wide.selectExpr(
        "_n",
        f"stack({len(cols)}, {', '.join(stack_args)}) as "
        f"(column_name, {', '.join(value_cols)})",
    )
    out_cols = [
        "column_name",
        F.col("_n").alias("n_rows"),
        "n_null",
        F.round(F.col("n_null") / F.col("_n"), 4).alias("null_rate"),
        "n_distinct",
    ]
    if include_min_max:
        out_cols += ["min_value", "max_value"]
    return stacked.select(*out_cols)


def stratified_sample(
    df: DataFrame, strata_col: str, fractions: dict, seed: int = 42
) -> DataFrame:
    """Seeded stratified sample (``sampleBy``) — corpus curation by group
    (e.g. downsample dominant languages). Deterministic for a fixed seed
    and partitioning; approximate per-stratum sizes (Bernoulli sampling)."""
    return df.sampleBy(strata_col, fractions, seed)


def stratified_sample_hash(
    df: DataFrame, strata_col: str, id_col: str, fractions: dict, seed: int = 42
) -> DataFrame:
    """Stratified sample by deterministic key hash instead of an RNG.

    A row is kept iff ``md5(id:seed)[:8] as uint32 % 1e6 < frac*1e6`` for
    its stratum — a pure function of (id, seed), so the sample is
    reproducible across engines, partitionings, and re-runs (md5 of the
    decimal-string key is bit-identical in Spark and DuckDB, which makes
    the sample oracle-checkable, unlike ``sampleBy``'s engine-private
    RNG). Appends are stable: an existing row never flips in or out when
    data arrives. Scan-local — no shuffle, no driver participation.

    A NULL id is coalesced to the ``'\\x00null'`` sentinel BEFORE hashing
    (the row_hash NULL discipline) so Spark and a SQL oracle agree: raw
    ``concat_ws`` would silently skip the NULL arg and hash just the seed,
    while SQL ``||`` nulls out — divergent keep/drop decisions."""
    key = F.coalesce(F.col(id_col).cast("string"), F.lit("\x00null"))
    bucket = (
        F.conv(
            F.substring(
                F.md5(F.concat_ws(":", key, F.lit(str(seed)))),
                1,
                8,
            ),
            16,
            10,
        )
        .cast("bigint")
        % 1_000_000
    )
    thresh = None
    for stratum, frac in fractions.items():
        t = F.lit(int(round(frac * 1_000_000)))
        thresh = (
            F.when(F.col(strata_col) == stratum, t)
            if thresh is None
            else thresh.when(F.col(strata_col) == stratum, t)
        )
    thresh = thresh.otherwise(F.lit(0)) if thresh is not None else F.lit(0)
    return df.filter(bucket < thresh)


def hash_split(
    df: DataFrame, id_col: str, fractions: dict[str, float], seed: int = 42
) -> DataFrame:
    """Deterministic train/val/test split by key hash: adds a ``split``
    column. Unlike ``randomSplit`` the assignment depends ONLY on
    (id, seed) — stable under repartitioning, re-runs, and appends (a new
    row lands in the same split forever), which is what leakage-safe
    training splits require. Fractions must sum to ~1."""
    total = sum(fractions.values())
    if abs(total - 1.0) > 1e-6:
        raise ValueError(f"fractions must sum to 1, got {total}")
    # uniform in [0, 1) from the key hash
    u = (F.pmod(F.xxhash64(F.col(id_col), F.lit(seed)), F.lit(1_000_000)) / 1_000_000.0)
    expr = None
    cum = 0.0
    names = list(fractions)
    for name in names[:-1]:
        cum += fractions[name]
        clause = F.when(u < cum, F.lit(name))
        expr = clause if expr is None else expr.when(u < cum, F.lit(name))
    expr = (
        expr.otherwise(F.lit(names[-1]))
        if expr is not None
        else F.lit(names[-1])
    )
    return df.withColumn("split", expr)


def weighted_mix(
    corpora: dict[str, DataFrame],
    weights: dict[str, float],
    seed: int = 42,
    shuffle_key_col: str | None = "_shuffle_key",
    id_cols: dict[str, str] | None = None,
) -> DataFrame:
    """Mix corpora to target proportions — the training-mixture operator
    ("40% web, 40% code, 20% books"). Output size is the largest achievable
    without oversampling any source: N = min_i(n_i / w_i); each source is
    Bernoulli-sampled to its target share and tagged with ``_source``.
    Schemas must be union-compatible (use a common (id, text) projection).
    ``shuffle_key_col`` adds a deterministic hash for the caller to
    sort/range-partition by — a global shuffle of the mixture without a
    driver-side pass. The key hashes the source's id column when one is
    given in ``id_cols``, else the full row content — never a
    partition-layout-dependent id, so the shuffle order is stable across
    runs and repartitionings either way. Counting each source is scalar
    bookkeeping; the sample itself never leaves the executors."""
    missing = set(corpora) ^ set(weights)
    if missing:
        raise ValueError(f"corpora/weights key mismatch: {missing}")
    wsum = sum(weights.values())
    norm = {k: w / wsum for k, w in weights.items()}
    counts = {k: df.count() for k, df in corpora.items()}
    n_out = min(counts[k] / norm[k] for k in corpora if norm[k] > 0)
    parts = []
    for k, df in corpora.items():
        target = n_out * norm[k]
        frac = min(1.0, target / counts[k]) if counts[k] else 0.0
        part = df.sample(fraction=frac, seed=seed).withColumn("_source", F.lit(k))
        if shuffle_key_col:
            # ADVICE r3: monotonically_increasing_id() depends on partition
            # layout — the shuffle key would differ run to run. Hash the
            # declared id column, or the full row content when none is
            # declared; both are functions of the DATA only.
            keys = (
                [F.col(id_cols[k])]
                if id_cols and k in id_cols
                else [F.col(c) for c in df.columns]
            )
            part = part.withColumn(
                shuffle_key_col, F.xxhash64(*keys, F.lit(seed), F.lit(k))
            )
        parts.append(part)
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out
