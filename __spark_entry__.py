"""Driver contract for the spark-graft builder (PySpark target).

``queries()`` — one entry per implemented operator from SURVEY.md §2 plus
the 100 TB training-data extensions (dedup / similarity / text analysis /
streaming windows). Each callable takes (spark, sf_dir) and returns a
DataFrame built with the engine's operators (presencia_etl_spark.*).

``oracle_sql()`` — the DuckDB-equivalent ANSI SQL per query. Computed
columns are aliased identically on both sides; doubles are rounded at a
fixed scale; dates/timestamps are emitted as formatted strings; BIGINT
casts pin DuckDB's HUGEINT sums to int64 so value-hashes match.

Queries without an oracle entry (q28_minhash_lsh, q29_simhash,
q35_multimodal_features, q36_lsh_topk, q42/q43/q46) are genuinely
non-SQL-expressible in DuckDB (engine-specific hash functions /
Arrow-batched stubs / approximate results) and take the rows-only check.

NOTE on numbering: the contract is capped at exactly 50 keys (the driver's
CORRECTNESS snapshot records 50). Round 3 merged five pairs of single-row
aggregate queries (cross-joined, all original columns kept: scan stats,
filters, date predicates, hash+coercion, fingerprint+jaccard) and reused
the freed numbers for the former q51–q55 (vocab, tfidf, profile,
intersect, stratified sample) plus a true Structured-Streaming dedup
query — so numbers are stable but not thematic.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from presencia_etl_spark.functions import (
    coerce_double,
    month_key,
    null_safe_neq,
    parse_access_datetime,
    row_hash,
)
from presencia_etl_spark.functions.partitioning import parallelize_scan
from presencia_etl_spark.operators import cdc, dedup, similarity, text
from presencia_etl_spark.operators.aggregates import (
    date_min_max_distinct,
    duplicate_keys,
    frequency,
    global_sums,
    monthly_rollup,
    table_counts_union,
    topk_by_count,
)
from presencia_etl_spark.operators.filters import (
    Predicate,
    apply_filters,
    date_component_filter,
    semi_filter,
)
from presencia_etl_spark.operators.multimodal import extract_features, synthesize_media
from presencia_etl_spark.plans.reconcile import monthly_reconcile
from presencia_etl_spark.sources.readers import read_table
from presencia_etl_spark.streaming.windows import session_stats, windowed_event_counts


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return read_table(spark, sf_dir, name)


# ---------------------------------------------------------------------------
# SURVEY §2.7 declared queries (Q01–Q20)
# ---------------------------------------------------------------------------

def q01_scan_stats(spark, sf):
    """COUNT(*) + global sums (lineitem) × min/max/distinct dates (orders)
    — three single-row aggregates cross-joined into one contract row
    (merged former q01/q10/q11 to fit the 50-key snapshot cap)."""
    li = _t(spark, sf, "lineitem")
    sums = global_sums(
        li,
        {
            "n": F.count(F.lit(1)),
            # Integer rounding: a 2-dp boundary sits ~5e-3 away while the
            # parallel-vs-sequential double-sum error on a ~1e9 total is
            # ~1e-4 — 0 dp keeps the oracle compare boundary-safe.
            "sum_price": F.round(F.sum("l_extendedprice"), 0),
            "sum_revenue": F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 0
            ),
        },
    )
    dates = date_min_max_distinct(_t(spark, sf, "orders"), "o_orderdate")
    return sums.crossJoin(dates)


def q02_project_filter(spark, sf):
    orders = _t(spark, sf, "orders")
    return apply_filters(orders, [Predicate("o_orderstatus", "eq", "F")]).select(
        "o_orderkey", "o_totalprice"
    )


def q03_filters(spark, sf):
    """NULL-keeping <> (orders) × conjunctive filter (lineitem) — merged
    former q03/q04 single-row counts."""
    orders = _t(spark, sf, "orders")
    li = _t(spark, sf, "lineitem")
    neq = orders.filter(null_safe_neq("o_orderstatus", "F")).agg(
        F.count(F.lit(1)).alias("n_neq")
    )
    conj = apply_filters(
        li,
        [Predicate("l_returnflag", "eq", "R"), Predicate("l_linestatus", "eq", "F")],
    ).agg(F.count(F.lit(1)).alias("n_conj"))
    return neq.crossJoin(conj)


def q04_vocab(spark, sf):
    """Corpus vocabulary: top-20 tokens by document frequency (explode →
    two-level aggregation; tiebreak on token for determinism)."""
    docs = _t(spark, sf, "documents")
    toks = docs.select(
        "doc_id", F.explode(F.array_distinct(F.split("text", r"\s+"))).alias("tok")
    )
    return (
        toks.groupBy("tok")
        .agg(F.count(F.lit(1)).alias("doc_freq"))
        .orderBy(F.desc("doc_freq"), F.asc("tok"))
        .limit(20)
    )


def q05_semi_join(spark, sf):
    cust = _t(spark, sf, "customer")
    orders = _t(spark, sf, "orders")
    return semi_filter(cust, orders, on="c_custkey", key_col="o_custkey").select(
        "c_custkey"
    )


def q06_anti_join(spark, sf):
    cust = _t(spark, sf, "customer")
    orders = _t(spark, sf, "orders")
    return cust.join(
        orders.select(F.col("o_custkey").alias("c_custkey")).distinct(),
        on="c_custkey",
        how="left_anti",
    ).select("c_custkey")


def q07_date_predicates(spark, sf):
    """Date-component predicate count (orders) × multi-format date parse
    roundtrip (events) — merged former q07/q18 single-row results."""
    orders = _t(spark, sf, "orders")
    comp = date_component_filter(orders, "o_orderdate", 1995, 3).agg(
        F.count(F.lit(1)).alias("n_mar1995")
    )
    ev = _t(spark, sf, "events")
    synth = (
        F.when(F.col("event_id") % 3 == 0, F.date_format("ts", "MM/dd/yy HH:mm:ss"))
        .when(F.col("event_id") % 3 == 1, F.date_format("ts", "MM/dd/yyyy HH:mm:ss"))
        .otherwise(F.date_format("ts", "yyyy-MM-dd HH:mm:ss"))
    )
    parsed = parse_access_datetime(synth)
    dates = ev.select(
        parsed.alias("p"), F.date_trunc("second", F.col("ts")).alias("sec")
    ).agg(
        F.count("p").alias("n_parsed"),
        F.sum(F.when(F.col("p") == F.col("sec"), 1).otherwise(0))
        .cast("bigint")
        .alias("n_roundtrip"),
    )
    return comp.crossJoin(dates)


def q08_monthly_rollup(spark, sf):
    orders = _t(spark, sf, "orders")
    return monthly_rollup(
        orders,
        "o_orderdate",
        measures={"sum_total": F.round(F.sum("o_totalprice"), 2)},
    )


def q09_frequency(spark, sf):
    return frequency(_t(spark, sf, "orders"), "o_orderstatus")


def q10_tfidf(spark, sf):
    """TF-IDF top term per document (for doc_id < 10): term frequency ×
    log(N/df), the training-corpus relevance primitive. Window picks the
    argmax with deterministic tiebreak. N comes from a scalar-subquery
    cross join (no eager driver-side count — one plan, one scan)."""
    from pyspark.sql import Window

    docs = _t(spark, sf, "documents")
    n_docs = docs.agg(F.count(F.lit(1)).cast("double").alias("n_docs"))
    tf = (
        docs.select("doc_id", F.explode(F.split("text", r"\s+")).alias("tok"))
        .groupBy("doc_id", "tok")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    # Document frequency = rows per token over per-doc DISTINCT tokens:
    # one explode + one partial-aggregated groupBy. Equivalent to
    # countDistinct(doc_id) over tf (doc_id is unique per doc, so distinct
    # (doc, tok) pairs == docs containing tok) but skips the full-corpus
    # (doc_id, tok) pre-aggregation AND the countDistinct expand+double
    # shuffle; the tf subtree then runs only for the doc_id<10 slice with
    # the filter pushed to the scan.
    df_ = (
        docs.select(
            F.explode(F.array_distinct(F.split("text", r"\s+"))).alias("tok")
        )
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("df"))
    )
    scored = (
        tf.filter(F.col("doc_id") < 10)
        .join(df_, "tok")
        .crossJoin(F.broadcast(n_docs))
        .withColumn(
            "tfidf",
            F.round(F.col("tf") * F.log(F.col("n_docs") / F.col("df")), 6),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("tfidf"), F.asc("tok"))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .select("doc_id", "tok", F.col("tfidf"))
    )


def q11_profile(spark, sf):
    """Per-column quality profile of orders (exact distinct for oracle
    parity; the operator defaults to HLL at scale)."""
    from presencia_etl_spark.operators.profile import profile

    # include_min_max=False: this query projects min/max away, and the
    # stack() Generate blocks Catalyst from pruning their aggregates —
    # the flag is the manual column pruning (same 5 output columns).
    # parallelize_scan (r14): the 4-way Expand + partial hash-agg over
    # 600K expanded rows otherwise runs on the single scan task
    # (one-row-group file); spreading the input halves the query
    # (0.86 -> 0.55 s A/B) and no-ops on already-parallel scans.
    return profile(
        parallelize_scan(_t(spark, sf, "orders")),
        ["o_orderkey", "o_orderstatus", "o_totalprice"],
        exact_distinct=True,
        include_min_max=False,
    ).select("column_name", "n_rows", "n_null", "null_rate", "n_distinct")


def q12_topk_days(spark, sf):
    orders = _t(spark, sf, "orders")
    return topk_by_count(orders, F.date_format("o_orderdate", "yyyy-MM-dd"), 5)


def q13_duplicate_keys(spark, sf):
    orders = _t(spark, sf, "orders")
    return (
        duplicate_keys(orders, ["o_custkey"])
        .orderBy(F.desc("cnt"), F.asc("o_custkey"))
        .limit(20)
    )


def q14_join_agg(spark, sf):
    cust = _t(spark, sf, "customer")
    nation = _t(spark, sf, "nation")
    return (
        cust.join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("n_name")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def q15_set_diff(spark, sf):
    part = _t(spark, sf, "part")
    li = _t(spark, sf, "lineitem")
    only_part, _ = cdc.key_set_diff(
        part.select(F.col("p_partkey").alias("k")),
        li.select(F.col("l_partkey").alias("k")),
        ["k"],
    )
    return only_part.select(F.col("k").alias("p_partkey"))


def q16_hash_coercion(spark, sf):
    """Row-hash distinctness (supplier) × numeric coercion w/ default
    (events) — merged former q16/q19 single-row results."""
    supp = _t(spark, sf, "supplier")
    hashes = supp.select(
        row_hash(["s_name", "s_nationkey", "s_suppkey"]).alias("h")
    ).agg(F.countDistinct("h").alias("n_distinct"))
    ev = _t(spark, sf, "events")
    k = F.regexp_extract(F.col("props"), r'"k": (\d+)', 1)
    coerced = ev.select(coerce_double(k).alias("kd")).agg(
        F.round(F.sum("kd"), 2).alias("sum_k")
    )
    return hashes.crossJoin(coerced)


def q17_cdc_classify(spark, sf):
    orders = _t(spark, sf, "orders")
    old = orders.filter(F.col("o_orderkey") % 10 != 0).select(
        "o_orderkey", "o_orderpriority"
    )
    old = cdc.with_row_hash(old, ["o_orderkey", "o_orderpriority"])
    new = orders.select(
        "o_orderkey",
        F.when(F.col("o_orderkey") % 7 == 0, F.lit("X"))
        .otherwise(F.col("o_orderpriority"))
        .alias("o_orderpriority"),
    )
    classified = cdc.cdc_classify(
        new, old, ["o_orderkey"], hash_cols=["o_orderkey", "o_orderpriority"]
    )
    return cdc.cdc_counts(classified)


def q18_intersect(spark, sf):
    """INTERSECT (distinct) of customer keys appearing in orders — the set
    operation q15's EXCEPT doesn't cover."""
    cust = _t(spark, sf, "customer").select(F.col("c_custkey").alias("k"))
    ords = _t(spark, sf, "orders").select(F.col("o_custkey").alias("k"))
    return cust.intersect(ords).select(F.col("k").alias("custkey"))


def q19_stratified_sample(spark, sf):
    """Deterministic hash-threshold stratified sample by language: keep
    iff md5(doc_id:seed)[:8] % 1e6 < frac*1e6 — a pure function of the
    key, so DuckDB replicates it exactly (full rows+schema+hash oracle,
    unlike sampleBy's engine-private RNG)."""
    from presencia_etl_spark.operators.profile import stratified_sample_hash

    docs = _t(spark, sf, "documents")
    sampled = stratified_sample_hash(
        docs, "lang", "doc_id", {"en": 0.25, "es": 1.0, "de": 1.0, "fr": 1.0, "zh": 1.0}
    )
    return sampled.groupBy("lang").agg(F.count(F.lit(1)).alias("n_sampled"))


def q20_union_counts(spark, sf):
    return table_counts_union(
        {
            "lineitem": _t(spark, sf, "lineitem"),
            "orders": _t(spark, sf, "orders"),
        }
    )


# ---------------------------------------------------------------------------
# Training-data extensions (dedup / text / similarity / windows)
# ---------------------------------------------------------------------------

def q21_dedup_exact(spark, sf):
    docs = _t(spark, sf, "documents")
    return docs.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.countDistinct(F.md5("text")).alias("n_distinct"),
    )


def q22_text_tokens(spark, sf):
    docs = parallelize_scan(_t(spark, sf, "documents"))
    return docs.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(text.token_count("text")).cast("bigint").alias("total_tokens"),
        F.round(F.avg(text.token_count("text")), 2).alias("avg_tokens"),
        F.round(F.avg("n_chars"), 2).alias("avg_chars"),
    )


def q23_text_quality(spark, sf):
    docs = quality_featured = text.quality_features(_t(spark, sf, "documents"))
    return quality_featured.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.round(F.avg("avg_token_len"), 4).alias("mean_token_len"),
        F.round(F.avg("stopword_ratio"), 4).alias("mean_stopword_ratio"),
        F.sum(F.when(F.col("n_chars") < 100, 1).otherwise(0))
        .cast("bigint")
        .alias("short_docs"),
    )


def q24_lang_id(spark, sf):
    # predict_lang's tokenize+filter chain is the cost — spread it.
    docs = parallelize_scan(_t(spark, sf, "documents"))
    return docs.select(text.predict_lang("text").alias("pred_lang")).groupBy(
        "pred_lang"
    ).agg(F.count(F.lit(1)).alias("cnt"))


def q25_fingerprint_jaccard(spark, sf):
    """md5 fingerprint distinctness × n-gram Jaccard over consecutive-id
    candidate pairs — merged former q25/q30 single-row results."""
    docs = _t(spark, sf, "documents")
    fps = docs.select(text.md5_fingerprint("text").alias("fp")).agg(
        F.countDistinct("fp").alias("n_distinct")
    )
    # Deterministic candidate pairs: consecutive doc ids (the SQL-checkable
    # slice of the pair space; LSH candidates feed the same verifier).
    pairs = docs.select(F.col("doc_id").alias("id_a")).withColumn(
        "id_b", F.col("id_a") + 1
    ).join(docs.select(F.col("doc_id").alias("id_b")), "id_b", "inner").select("id_a", "id_b")
    jac = dedup.ngram_jaccard(pairs, docs, "doc_id", "text", n=3).agg(
        F.round(F.avg("jaccard"), 4).alias("avg_jaccard"),
        F.round(F.max("jaccard"), 4).alias("max_jaccard"),
        F.count(F.lit(1)).alias("n_pairs"),
    )
    return fps.crossJoin(jac)


def q26_sim_topk(spark, sf):
    emb = _t(spark, sf, "embeddings")
    queries_df = emb.filter(F.col("vec_id") < 5)
    return similarity.cosine_topk(emb, queries_df, k=3).select(
        "query_id", "neighbor_id", F.round("cosine", 4).alias("cosine"), "rk"
    )


def q27_neardup_cosine(spark, sf):
    emb = _t(spark, sf, "embeddings")
    pairs = similarity.cosine_pairs_blocked(emb, min_cosine=0.45)
    return pairs.agg(F.count(F.lit(1)).alias("n_pairs"))


_PLANT_OFFSET = 10_000_000  # planted-copy ids sit far above any real doc_id


def _plant_copies(docs, modulus):
    """Deterministic planted-duplicate leg: every doc whose id matches the
    modulus rule gets an exact copy at id+_PLANT_OFFSET. The planting rule
    is pure SQL, so a DuckDB oracle knows EXACTLY which pairs a dedup
    operator must recover — turning an approximate operator into a
    hash-checkable query (recovery of identical texts is guaranteed by
    construction: identical signatures collide in every band/block)."""
    planted = docs.filter(F.col("doc_id") % modulus == 0).select(
        (F.col("doc_id") + _PLANT_OFFSET).alias("doc_id"), "text"
    )
    return docs.select("doc_id", "text").unionByName(planted)


def q28_minhash_lsh(spark, sf):
    """Banded MinHash LSH over the corpus + planted exact copies: the
    planted pairs (id, id+OFFSET) MUST come back as candidates with
    est_jaccard 1.0 (identical signatures collide in all 8 bands), so the
    recovered count equals the planting-rule count — which DuckDB computes
    without running any LSH. Organic near-dup pairs remain covered by the
    recall/XXH64-parity pytest suite."""
    docs = _t(spark, sf, "documents")
    corpus = _plant_copies(docs, 89)
    cands = dedup.minhash_lsh_candidates(
        corpus, "doc_id", "text", k=5, n_hashes=32, bands=8
    )
    recovered = cands.filter(
        (F.col("id_b") == F.col("id_a") + _PLANT_OFFSET)
        & (F.col("id_a") % 89 == 0)
        & (F.col("est_jaccard") >= 0.999)
    ).agg(F.count(F.lit(1)).alias("n_recovered"))
    planted = docs.filter(F.col("doc_id") % 89 == 0).agg(
        F.count(F.lit(1)).alias("n_planted")
    )
    return planted.crossJoin(recovered).select(
        "n_planted",
        "n_recovered",
        (F.col("n_recovered") == F.col("n_planted")).alias("all_recovered"),
    )


def q29_simhash(spark, sf):
    """SimHash near-pairs with a planted-exact-copy leg: identical text →
    identical 64-bit signature → hamming 0, recovered with FULL certainty
    by the 4-block pigeonhole. Recovered count and max hamming over the
    planted pairs are therefore pure functions of the planting rule —
    DuckDB reproduces both from the rule alone."""
    docs = _t(spark, sf, "documents")
    corpus = _plant_copies(docs, 83)
    sigs = dedup.with_simhash(corpus, "doc_id", "text")
    # Production near-dup threshold: hamming ≤ 3 with 4 rotated 16-bit
    # blocks — FULL recall by pigeonhole (≥1 block has zero differing
    # bits), sparse buckets.
    pairs = dedup.simhash_near_pairs(sigs, max_hamming=3, n_blocks=4)
    recovered = pairs.filter(
        (F.col("id_b") == F.col("id_a") + _PLANT_OFFSET)
        & (F.col("id_a") % 83 == 0)
    ).agg(
        F.count(F.lit(1)).alias("n_recovered"),
        F.max("hamming").cast("int").alias("max_planted_hamming"),
    )
    planted = docs.filter(F.col("doc_id") % 83 == 0).agg(
        F.count(F.lit(1)).alias("n_planted")
    )
    return planted.crossJoin(recovered).select(
        "n_planted",
        "n_recovered",
        "max_planted_hamming",
        (F.col("n_recovered") == F.col("n_planted")).alias("all_recovered"),
    )


def q30_streaming_dedup(spark, sf):
    """TRUE Structured Streaming execution of the stateful cross-batch
    dedup (applyInPandasWithState): documents are split into 2 source
    files, streamed one file per micro-batch (availableNow), deduped on
    md5(text) with per-key state, and the survivors counted. Two batches
    are the minimum that exercises state persisting ACROSS micro-batches;
    each extra batch would only re-pay the fixed per-batch commit cost
    (~1.5 s), not test anything new. The count is order-independent
    (first-winner identity doesn't matter), so the batch oracle is
    COUNT(DISTINCT md5(text)). The result is materialized before return
    so the temp stream workspace can be deleted."""
    import shutil
    import tempfile

    from presencia_etl_spark.streaming.stateful import streaming_dedup

    docs = _t(spark, sf, "documents").select(
        F.md5("text").alias("row_hash"), "doc_id"
    )
    # State shard key must be a function of the hash so per-key state sets
    # are disjoint and survivors == distinct hashes.
    docs = docs.withColumn("shard", F.substring("row_hash", 1, 1))
    work = tempfile.mkdtemp(prefix="q30_stream_")
    # The state store commits one file per shuffle partition per batch —
    # with 16 shard keys, narrowing state partitions cuts the per-batch
    # commit count (state delta + snapshot per partition per batch)
    # while the stateful stage stays parallel. r13 interleaved A/B at
    # sf0.1 (5 reps): 4 parts med 3.76 / 2 parts 3.45 / 1 part 3.17 —
    # width 2 keeps >1-way state parallelism for 9% less fixed cost
    # (width 1 would single-task the stateful stage: wrong shape).
    # Restore the session conf after.
    prev_parts = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "2")
        src, sink, chk = f"{work}/src", f"{work}/sink", f"{work}/chk"
        docs.repartition(2).write.mode("overwrite").parquet(src)
        stream = (
            spark.readStream.schema(docs.schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(src)
        )
        deduped = streaming_dedup(stream, "shard", hash_col="row_hash")
        q = (
            deduped.writeStream.format("parquet")
            .option("path", sink)
            .option("checkpointLocation", chk)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        n = spark.read.parquet(sink).count()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev_parts)
        shutil.rmtree(work, ignore_errors=True)
    return spark.createDataFrame([(n,)], "n_unique bigint")


def q31_event_windows(spark, sf):
    ev = _t(spark, sf, "events")
    return windowed_event_counts(ev, "ts", "event_type", "1 hour")


def q32_sessionize(spark, sf):
    ev = _t(spark, sf, "events")
    return session_stats(ev, "user_id", "ts", gap_minutes=10)


def q33_reconcile(spark, sf):
    orders = _t(spark, sf, "orders")
    src = orders
    tgt = orders.filter(F.col("o_orderkey") % 10 != 0)
    rec = monthly_reconcile(
        src, tgt, "o_orderdate", {"sum_total": F.round(F.sum("o_totalprice"), 2)}
    )
    return rec.select(
        "month",
        "cnt_src",
        "cnt_tgt",
        "cnt_diff",
        F.round(F.col("sum_total_diff"), 2).alias("sum_total_diff"),
    )


def q34_cdc_pipeline_counts(spark, sf):
    """EP2 end-to-end classify on the events table keyed by event_id, with a
    synthetic 'previous state' — exercises normalize_key+composite_key path."""
    ev = _t(spark, sf, "events").select(
        F.col("event_id"), F.col("event_type"), F.col("user_id")
    )
    old = ev.filter(F.col("event_id") % 5 != 0)
    old = cdc.with_row_hash(old, ["event_id", "event_type", "user_id"])
    new = ev.withColumn(
        "event_type",
        F.when(F.col("event_id") % 11 == 0, F.lit("mutated")).otherwise(
            F.col("event_type")
        ),
    )
    classified = cdc.cdc_classify(
        new, old, ["event_id"], hash_cols=["event_id", "event_type", "user_id"]
    )
    return cdc.cdc_counts(classified)


def q37_asof_join(spark, sf):
    """As-of join: for each click, the user's latest purchase at-or-before
    it (operators/joins.asof_join; DuckDB ASOF JOIN is the oracle)."""
    from presencia_etl_spark.operators.joins import asof_join

    ev = _t(spark, sf, "events")
    clicks = ev.filter(F.col("event_type") == "click").select("user_id", "ts")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", "value"
    )
    from presencia_etl_spark.functions.dates import epoch_seconds

    joined = asof_join(clicks, purchases, "user_id", "ts", "ts")
    gap = epoch_seconds("ts") - epoch_seconds("ts_asof")
    return joined.agg(
        F.count(F.lit(1)).alias("n_clicks"),
        F.count("value_asof").cast("bigint").alias("n_matched"),
        F.round(F.avg(gap), 2).alias("avg_gap_sec"),
        F.round(F.sum("value_asof"), 2).alias("sum_purchase_value"),
    )


def q38_range_join(spark, sf):
    """Range join: same-user event pairs within 60 seconds."""
    from presencia_etl_spark.operators.joins import range_join

    # parallelize_scan (r14): the band join explodes each row into 3
    # bucket replicas before its shuffle — per-row work heavy enough
    # that the one-task scan dominated (0.80 -> 0.58 s A/B; no-op on
    # already-parallel scans). q32's window reuses its shuffle and
    # measured SLOWER spread — left alone.
    ev = parallelize_scan(_t(spark, sf, "events")).select(
        "user_id", "ts", "event_id"
    )
    pairs = range_join(
        ev, ev, "user_id", "ts", "ts", 60, left_carry=["event_id"], right_carry=["event_id"]
    ).filter(F.col("l_event_id") < F.col("r_event_id"))
    return pairs.agg(F.count(F.lit(1)).alias("n_pairs"))


def q39_rollup(spark, sf):
    orders = _t(spark, sf, "orders")
    return (
        orders.rollup(F.year("o_orderdate").alias("yr"), F.col("o_orderstatus"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def q40_window_funcs(spark, sf):
    from pyspark.sql import Window

    orders = _t(spark, sf, "orders").filter(F.col("o_custkey") < 100)
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    # Explicit ROWS frame: the default with an ORDER BY is RANGE, which
    # would sum ties together and diverge from the oracle's ROWS frame.
    w_sum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.row_number().over(w).alias("rn"),
        F.round(F.sum("o_totalprice").over(w_sum), 2).alias("running_total"),
    )


def q41_quantiles(spark, sf):
    docs = _t(spark, sf, "documents")
    return docs.agg(
        F.round(F.expr("percentile(n_chars, 0.25)"), 2).alias("p25"),
        F.round(F.expr("percentile(n_chars, 0.5)"), 2).alias("p50"),
        F.round(F.expr("percentile(n_chars, 0.75)"), 2).alias("p75"),
    )


# --- rows-only (no SQL oracle) ---------------------------------------------


def q44_dedup_keep_first(spark, sf):
    """Deterministic keep-first exact dedup (lowest doc_id survives),
    summarized per source. Dedup identity is md5(text) on a pre-projected
    narrow frame, so the window shuffle moves (hash, id, source) — not the
    documents themselves."""
    docs = _t(spark, sf, "documents")
    narrow = docs.select(F.md5("text").alias("_h"), "doc_id", "source")
    kept = dedup.exact_dedup_keep_first(narrow, ["_h"], ["doc_id"])
    return kept.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_kept"),
        F.sum("doc_id").cast("bigint").alias("sum_ids"),
    )


def q45_bpe_tokens(spark, sf):
    docs = _t(spark, sf, "documents")
    return docs.groupBy("lang").agg(
        F.sum(text.bpe_token_count("text")).cast("bigint").alias("total_pieces"),
        F.round(F.avg(text.bpe_token_count("text")), 2).alias("avg_pieces"),
    )


def q46_winnow_fingerprints(spark, sf):
    """Winnowed rolling-hash fingerprints with a planted-copy leg: an
    exact copy winnows to the IDENTICAL fingerprint set, so for every
    planted pair the shared-distinct count equals the original's distinct
    count — a property DuckDB verifies knowing only the planting rule
    (every doc is ≥ 44 chars, so fingerprint sets are never empty). The
    raw xxhash fingerprint values stay engine-specific and remain covered
    by the shift-tolerance pytest. Pure-SQL fold with the gram array bound
    once — measured faster than an Arrow hybrid at every realistic doc
    length (see text.py note)."""
    # The winnowing fold is the most expensive per-row expression in the
    # suite — never let a single-file corpus run it on one task.
    docs = parallelize_scan(_t(spark, sf, "documents"))
    # r13 restructure: the former explode-then-join form referenced the
    # corpus-wide exploded fingerprint subtree THREE times (n_orig agg +
    # both legs of a (doc_id, fp) sort-merge join) — the before-plan ran
    # 6 parquet scans and the winnow Generate 3×, un-pruned. Equivalent
    # per-doc set algebra: countDistinct(fp) ≡ size(array_distinct(fps));
    # shared-distinct count ≡ size(array_intersect(fps_o, fps_c)); the
    # inner join on doc_id reaches exactly the planted pairs (every
    # %79 doc has a copy by construction, so LEFT OUTER ≡ INNER). The
    # %-filters now sit BELOW the winnow fold, so it runs on 2/79ths of
    # the corpus — and each leg still computes its fingerprints from its
    # own text column (the copy leg via _plant_copies, as before).
    wf = text.winnowed_fingerprints("text", k=8, window=4)
    orig = docs.filter(F.col("doc_id") % 79 == 0).select(
        "doc_id", F.array_distinct(wf).alias("fps_o")
    )
    copy = _plant_copies(docs, 79).filter(
        F.col("doc_id") >= _PLANT_OFFSET
    ).select(
        (F.col("doc_id") - _PLANT_OFFSET).alias("doc_id"),
        F.array_distinct(wf).alias("fps_c"),
    )
    per_pair = orig.join(copy, "doc_id").select(
        "doc_id",
        (
            F.size(F.array_intersect("fps_o", "fps_c")) == F.size("fps_o")
        ).alias("full_overlap"),
    )
    return per_pair.agg(
        F.count(F.lit(1)).alias("n_planted"),
        F.sum(F.col("full_overlap").cast("bigint")).alias("n_full_overlap"),
        F.min("full_overlap").alias("all_overlap"),
    )


def q47_pivot(spark, sf):
    """Pivot event counts into per-type columns (df.pivot ↔ conditional
    aggregation in the oracle — identical result columns)."""
    ev = _t(spark, sf, "events")
    return (
        ev.withColumn("g", (F.col("user_id") % 10).cast("int"))
        .groupBy("g")
        .pivot("event_type", ["click", "error", "purchase", "signup", "view"])
        .agg(F.count(F.lit(1)))
        .na.fill(0)
    )


def q48_grouped_centroid(spark, sf):
    """Per-label embedding centroid via applyInPandas (grouped-map Arrow
    UDF) — oracle checks the first 3 dimensions with per-position AVGs."""
    import numpy as np
    import pandas as pd

    from pyspark.sql import types as T

    emb = _t(spark, sf, "embeddings")
    out_schema = T.StructType(
        [
            T.StructField("label", T.IntegerType()),
            T.StructField("n", T.LongType()),
            T.StructField("d0", T.DoubleType()),
            T.StructField("d1", T.DoubleType()),
            T.StructField("d2", T.DoubleType()),
        ]
    )

    def centroid(pdf: pd.DataFrame) -> pd.DataFrame:
        mat = np.vstack(pdf["embedding"].to_numpy()).astype(np.float64)
        c = mat.mean(axis=0)
        return pd.DataFrame(
            {
                "label": [int(pdf["label"].iloc[0])],
                "n": [len(pdf)],
                "d0": [round(float(c[0]), 6)],
                "d1": [round(float(c[1]), 6)],
                "d2": [round(float(c[2]), 6)],
            }
        )

    return emb.groupBy("label").applyInPandas(centroid, out_schema)


def _ann_recall_query(spark, sf, approx_fn, min_recall):
    """Shared self-verifying ANN shape: deterministic EXACT top-k rows
    (oracle-computable brute-force cosine, ties broken on neighbor id)
    plus one `recall_ok` column asserting the approximate operator's
    recall@k against that exact set IN-PLAN. DuckDB reproduces the exact
    rows and emits literal TRUE — if the ANN path ever regresses below the
    bound, Spark emits FALSE and the row hash breaks. 20 query vectors
    (60 exact pairs) keep the recall estimate stable across scale factors
    — at 5 queries the ±1-hit noise straddled any honest bound."""
    emb = _t(spark, sf, "embeddings")
    queries_df = emb.filter(F.col("vec_id") < 20)
    # The exact top-k subtree is referenced three times below (hit join,
    # total count, output rows); without a materialization point Spark
    # re-runs the whole brute-force cosine pass per reference (8 corpus
    # scans in the r13 before-plan). Its result is ~60 rows — checkpoint
    # once, read three times.
    exact = similarity.cosine_topk(emb, queries_df, k=3).localCheckpoint(eager=True)
    approx = approx_fn(emb, queries_df)
    # r13: hits and totals fold in ONE aggregate over a left join (match
    # flag summed) instead of two separate 1-row aggregates cross-joined
    # — same recall boolean, two fewer AQE stages per ANN query.
    flagged = exact.join(
        approx.select("query_id", "neighbor_id")
        .distinct()
        .withColumn("_hit", F.lit(1)),
        ["query_id", "neighbor_id"],
        "left_outer",
    )
    recall = flagged.agg(
        (
            F.sum(F.coalesce(F.col("_hit"), F.lit(0))) / F.count(F.lit(1))
            >= min_recall
        ).alias("recall_ok")
    )
    return exact.select(
        "query_id", "neighbor_id", F.round("cosine", 4).alias("cosine"), "rk"
    ).crossJoin(recall)


def q43_ivf_topk(spark, sf):
    """IVF (KMeans posting lists) approximate top-k, verified in-plan:
    exact top-3 rows + recall@3 ≥ 0.6 boolean (pytest asserts the same
    bound; sample-fit centroids are seed-deterministic)."""
    return _ann_recall_query(
        spark,
        sf,
        lambda emb, q: similarity.ivf_topk(emb, q, k=3, n_clusters=8, n_probe=4),
        min_recall=0.6,
    )


def q42_hll_distinct(spark, sf):
    """HLL approx-distinct verified in-plan against the exact count: the
    output carries the exact value plus a boolean pinning the approx
    estimate inside its 5% envelope — DuckDB computes the exact count and
    literal TRUE, so an HLL regression breaks the row hash."""
    ev = _t(spark, sf, "events")
    # r13: pre-distinct the key, then count + HLL over the distinct set.
    # HLL registers are a pure function of the distinct hashed values, so
    # the estimate is IDENTICAL over set vs multiset — but the former
    # fused (exact, approx) aggregate planned an Expand (2× the rows
    # through a double shuffle); this is one hash-dedup pass + a 1-row
    # agg. count("user_id") over the distinct set ≡ countDistinct.
    return ev.select("user_id").distinct().agg(
        F.count("user_id").alias("exact_users"),
        F.approx_count_distinct("user_id", 0.02).alias("_approx"),
    ).select(
        "exact_users",
        (
            F.abs(F.col("_approx") - F.col("exact_users"))
            / F.col("exact_users")
            <= 0.05
        ).alias("approx_within_5pct"),
    )


def q35_multimodal_features(spark, sf):
    """Multimodal feature extraction (real Arrow mapInPandas plumbing over
    binary payloads) made hash-checkable: payloads are the utf-8 bytes of
    `text` and the corpus is ASCII, so DuckDB reproduces byte counts, md5
    checksums, and the byte-mean feature from the string column alone —
    any mangling in the binary path breaks the hash."""
    docs = _t(spark, sf, "documents")
    media = synthesize_media(docs, "doc_id", "text")
    feats = extract_features(media, fake=True)
    return feats.agg(
        F.count(F.lit(1)).alias("n_media"),
        F.sum("n_bytes").cast("bigint").alias("total_bytes"),
        F.countDistinct("checksum").alias("n_distinct_payloads"),
        F.round(F.avg("feat_mean"), 2).alias("mean_feat"),
    )


def q36_lsh_topk(spark, sf):
    """Multi-table hyperplane LSH approximate top-k, verified in-plan:
    exact top-3 rows + recall@3 ≥ 0.6 boolean (seeded planes → the
    approximate side is deterministic; pytest asserts recall too)."""
    return _ann_recall_query(
        spark,
        sf,
        lambda emb, q: similarity.lsh_topk(emb, q, k=3, dim=64, n_tables=16),
        min_recall=0.6,
    )


# Multi-join analytics in plain ANSI SQL — the SAME text runs on Spark
# (via temp views) and DuckDB. Exercises Catalyst's join reordering +
# broadcast selection over a 3-way and a 6-way star join.
#
# r13 join-order fix (guide §3.1 "check the build side"): the former
# dims-first FROM order made Catalyst's left-deep tree put LINEITEM — the
# fact — on the BUILD side of its join (its pruned-column estimate sits
# under the 10 MB auto-broadcast threshold at sf0.1, and the dim-join
# subtree's post-join estimate is inflated past it), so the plan collected
# and broadcast 600K fact rows while streaming ~1K dim rows through the
# probe. Fact-first order keeps lineitem as the streamed side of every
# join with all dims on the build side — the only shape that survives at
# 100 TB, where the fact can never be the hash relation. Inner joins
# commute, so the result (and the DuckDB oracle, which reorders joins
# itself) is unchanged; plans/r13/q49*/q50* pin the before/after shape.
_Q49_SQL = (
    "SELECT o_orderkey, "
    "ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue, "
    "COUNT(*) AS n_lines "
    "FROM lineitem JOIN orders ON l_orderkey = o_orderkey "
    "JOIN customer ON c_custkey = o_custkey "
    "WHERE c_mktsegment = 'BUILDING' AND o_orderstatus = 'O' "
    "GROUP BY o_orderkey HAVING COUNT(*) >= 4"
)
_Q50_SQL = (
    "SELECT r_name, n_name, "
    "CAST(COUNT(*) AS BIGINT) AS n_lines, "
    "ROUND(SUM(l_extendedprice * (1 - l_discount)), 0) AS revenue "
    "FROM lineitem JOIN supplier ON l_suppkey = s_suppkey "
    "JOIN nation ON n_nationkey = s_nationkey "
    "JOIN region ON r_regionkey = n_regionkey "
    "JOIN orders ON o_orderkey = l_orderkey "
    "JOIN customer ON c_custkey = o_custkey "
    "WHERE o_orderstatus = 'F' "
    "GROUP BY r_name, n_name"
)


def _register_views(spark, sf):
    for t in [
        "region", "nation", "customer", "supplier", "part",
        "orders", "lineitem",
    ]:
        _t(spark, sf, t).createOrReplaceTempView(t)


def q49_sql_3way_join(spark, sf):
    """TPC-H-Q3-style revenue per order: identical SQL text on both engines."""
    _register_views(spark, sf)
    return spark.sql(_Q49_SQL)


def q50_sql_6way_join(spark, sf):
    """Six-way star join through region→nation→supplier→lineitem→orders→
    customer; Catalyst reorders and broadcasts the dims."""
    _register_views(spark, sf)
    return spark.sql(_Q50_SQL)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on sf0.001: the monthly rollup (EP4's aggregation
    shape — the reference's compare_historico_mensual core)."""
    return q08_monthly_rollup(spark, "/root/testdata/sf0.001").orderBy("month")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "q01_scan_stats": q01_scan_stats,
        "q02_project_filter": q02_project_filter,
        "q03_filters": q03_filters,
        "q04_vocab": q04_vocab,
        "q05_semi_join": q05_semi_join,
        "q06_anti_join": q06_anti_join,
        "q07_date_predicates": q07_date_predicates,
        "q08_monthly_rollup": q08_monthly_rollup,
        "q09_frequency": q09_frequency,
        "q10_tfidf": q10_tfidf,
        "q11_profile": q11_profile,
        "q12_topk_days": q12_topk_days,
        "q13_duplicate_keys": q13_duplicate_keys,
        "q14_join_agg": q14_join_agg,
        "q15_set_diff": q15_set_diff,
        "q16_hash_coercion": q16_hash_coercion,
        "q17_cdc_classify": q17_cdc_classify,
        "q18_intersect": q18_intersect,
        "q19_stratified_sample": q19_stratified_sample,
        "q20_union_counts": q20_union_counts,
        "q21_dedup_exact": q21_dedup_exact,
        "q22_text_tokens": q22_text_tokens,
        "q23_text_quality": q23_text_quality,
        "q24_lang_id": q24_lang_id,
        "q25_fingerprint_jaccard": q25_fingerprint_jaccard,
        "q26_sim_topk": q26_sim_topk,
        "q27_neardup_cosine": q27_neardup_cosine,
        "q28_minhash_lsh": q28_minhash_lsh,
        "q29_simhash": q29_simhash,
        "q30_streaming_dedup": q30_streaming_dedup,
        "q31_event_windows": q31_event_windows,
        "q32_sessionize": q32_sessionize,
        "q33_reconcile": q33_reconcile,
        "q34_cdc_pipeline_counts": q34_cdc_pipeline_counts,
        "q35_multimodal_features": q35_multimodal_features,
        "q36_lsh_topk": q36_lsh_topk,
        "q37_asof_join": q37_asof_join,
        "q38_range_join": q38_range_join,
        "q39_rollup": q39_rollup,
        "q40_window_funcs": q40_window_funcs,
        "q41_quantiles": q41_quantiles,
        "q42_hll_distinct": q42_hll_distinct,
        "q43_ivf_topk": q43_ivf_topk,
        "q44_dedup_keep_first": q44_dedup_keep_first,
        "q45_bpe_tokens": q45_bpe_tokens,
        "q46_winnow_fingerprints": q46_winnow_fingerprints,
        "q47_pivot": q47_pivot,
        "q48_grouped_centroid": q48_grouped_centroid,
        "q49_sql_3way_join": q49_sql_3way_join,
        "q50_sql_6way_join": q50_sql_6way_join,
    }


def oracle_sql() -> dict[str, str]:
    return {
        "q01_scan_stats": (
            "SELECT * FROM "
            "(SELECT COUNT(*) AS n, ROUND(SUM(l_extendedprice), 0) AS sum_price, "
            "ROUND(SUM(l_extendedprice * (1 - l_discount)), 0) AS sum_revenue "
            "FROM lineitem) "
            "CROSS JOIN (SELECT strftime(MIN(o_orderdate), '%Y-%m-%d') AS min_date, "
            "strftime(MAX(o_orderdate), '%Y-%m-%d') AS max_date, "
            "COUNT(DISTINCT CAST(o_orderdate AS DATE)) AS distinct_days FROM orders)"
        ),
        "q02_project_filter": (
            "SELECT o_orderkey, o_totalprice FROM orders WHERE o_orderstatus = 'F'"
        ),
        "q03_filters": (
            "SELECT * FROM "
            "(SELECT COUNT(*) AS n_neq FROM orders "
            "WHERE o_orderstatus IS NULL OR o_orderstatus <> 'F') "
            "CROSS JOIN (SELECT COUNT(*) AS n_conj FROM lineitem "
            "WHERE l_returnflag = 'R' AND l_linestatus = 'F')"
        ),
        "q04_vocab": (
            "WITH toks AS (SELECT doc_id, unnest(list_distinct("
            "string_split_regex(text, '\\s+'))) AS tok FROM documents) "
            "SELECT tok, COUNT(*) AS doc_freq FROM toks GROUP BY tok "
            "ORDER BY doc_freq DESC, tok ASC LIMIT 20"
        ),
        "q05_semi_join": (
            "SELECT c_custkey FROM customer "
            "WHERE c_custkey IN (SELECT o_custkey FROM orders)"
        ),
        "q06_anti_join": (
            "SELECT c_custkey FROM customer "
            "WHERE c_custkey NOT IN (SELECT o_custkey FROM orders "
            "WHERE o_custkey IS NOT NULL)"
        ),
        "q07_date_predicates": (
            "WITH synth AS (SELECT ts, CASE "
            "WHEN event_id % 3 = 0 THEN strftime(ts, '%m/%d/%y %H:%M:%S') "
            "WHEN event_id % 3 = 1 THEN strftime(ts, '%m/%d/%Y %H:%M:%S') "
            "ELSE strftime(ts, '%Y-%m-%d %H:%M:%S') END AS s FROM events), "
            "parsed AS (SELECT ts, COALESCE("
            "try_strptime(s, '%m/%d/%y %H:%M:%S'), "
            "try_strptime(s, '%m/%d/%Y %H:%M:%S'), "
            "try_strptime(s, '%Y-%m-%d %H:%M:%S')) AS p FROM synth) "
            "SELECT * FROM "
            "(SELECT COUNT(*) AS n_mar1995 FROM orders "
            "WHERE EXTRACT(year FROM o_orderdate) = 1995 "
            "AND EXTRACT(month FROM o_orderdate) = 3) "
            "CROSS JOIN (SELECT COUNT(p) AS n_parsed, "
            "CAST(SUM(CASE WHEN p = date_trunc('second', ts) THEN 1 ELSE 0 END) "
            "AS BIGINT) AS n_roundtrip FROM parsed)"
        ),
        "q08_monthly_rollup": (
            "SELECT strftime(o_orderdate, '%Y-%m') AS month, COUNT(*) AS cnt, "
            "ROUND(SUM(o_totalprice), 2) AS sum_total FROM orders GROUP BY month"
        ),
        "q09_frequency": (
            "SELECT o_orderstatus, COUNT(*) AS cnt FROM orders GROUP BY o_orderstatus"
        ),
        "q10_tfidf": (
            "WITH tf AS (SELECT doc_id, unnest(string_split_regex(text, '\\s+')) AS tok "
            "FROM documents), "
            "tfc AS (SELECT doc_id, tok, COUNT(*) AS tf FROM tf GROUP BY doc_id, tok), "
            "dfc AS (SELECT tok, COUNT(DISTINCT doc_id) AS df FROM tfc GROUP BY tok), "
            "n AS (SELECT COUNT(*) AS n_docs FROM documents), "
            "scored AS (SELECT tfc.doc_id, tfc.tok, "
            "ROUND(tfc.tf * ln(CAST(n.n_docs AS DOUBLE) / dfc.df), 6) AS tfidf "
            "FROM tfc JOIN dfc ON tfc.tok = dfc.tok CROSS JOIN n "
            "WHERE tfc.doc_id < 10) "
            "SELECT doc_id, tok, tfidf FROM scored "
            "QUALIFY ROW_NUMBER() OVER (PARTITION BY doc_id "
            "ORDER BY tfidf DESC, tok ASC) = 1"
        ),
        "q11_profile": (
            "WITH n AS (SELECT COUNT(*) AS n_rows FROM orders), "
            "p AS ("
            "SELECT 'o_orderkey' AS column_name, "
            "CAST(SUM(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null, "
            "CAST(COUNT(DISTINCT o_orderkey) AS BIGINT) AS n_distinct FROM orders "
            "UNION ALL SELECT 'o_orderstatus', "
            "CAST(SUM(CASE WHEN o_orderstatus IS NULL THEN 1 ELSE 0 END) AS BIGINT), "
            "CAST(COUNT(DISTINCT o_orderstatus) AS BIGINT) FROM orders "
            "UNION ALL SELECT 'o_totalprice', "
            "CAST(SUM(CASE WHEN o_totalprice IS NULL THEN 1 ELSE 0 END) AS BIGINT), "
            "CAST(COUNT(DISTINCT o_totalprice) AS BIGINT) FROM orders) "
            "SELECT column_name, n.n_rows, p.n_null, "
            "ROUND(CAST(p.n_null AS DOUBLE) / n.n_rows, 4) AS null_rate, "
            "p.n_distinct FROM p CROSS JOIN n"
        ),
        "q12_topk_days": (
            "SELECT strftime(o_orderdate, '%Y-%m-%d') AS k, COUNT(*) AS cnt "
            "FROM orders GROUP BY k ORDER BY cnt DESC, k ASC LIMIT 5"
        ),
        "q13_duplicate_keys": (
            "SELECT o_custkey, COUNT(*) AS cnt FROM orders GROUP BY o_custkey "
            "HAVING COUNT(*) > 1 ORDER BY cnt DESC, o_custkey ASC LIMIT 20"
        ),
        "q14_join_agg": (
            "SELECT n_name, COUNT(*) AS cnt FROM customer "
            "JOIN nation ON c_nationkey = n_nationkey GROUP BY n_name"
        ),
        "q15_set_diff": (
            "SELECT p_partkey FROM part "
            "EXCEPT SELECT l_partkey FROM lineitem"
        ),
        "q16_hash_coercion": (
            "SELECT * FROM "
            "(SELECT COUNT(DISTINCT sha256(concat_ws('|', "
            "coalesce(nullif(CAST(s_name AS VARCHAR), ''), 'NULL'), "
            "coalesce(nullif(CAST(s_nationkey AS VARCHAR), ''), 'NULL'), "
            "coalesce(nullif(CAST(s_suppkey AS VARCHAR), ''), 'NULL')))) "
            "AS n_distinct FROM supplier) "
            "CROSS JOIN (SELECT ROUND(SUM(COALESCE(TRY_CAST(NULLIF("
            "regexp_extract(props, '\"k\": (\\d+)', 1), '') AS DOUBLE), 0)), 2) "
            "AS sum_k FROM events)"
        ),
        "q17_cdc_classify": (
            "WITH old AS (SELECT o_orderkey, o_orderpriority FROM orders "
            "WHERE o_orderkey % 10 <> 0), "
            "new AS (SELECT o_orderkey, CASE WHEN o_orderkey % 7 = 0 THEN 'X' "
            "ELSE o_orderpriority END AS o_orderpriority FROM orders) "
            "SELECT CASE WHEN old.o_orderkey IS NULL THEN 'insert' "
            "WHEN new.o_orderpriority <> old.o_orderpriority THEN 'update' "
            "ELSE 'skip' END AS op, COUNT(*) AS cnt "
            "FROM new LEFT JOIN old ON new.o_orderkey = old.o_orderkey GROUP BY op"
        ),
        "q18_intersect": (
            "SELECT c_custkey AS custkey FROM customer "
            "INTERSECT SELECT o_custkey FROM orders"
        ),
        "q19_stratified_sample": (
            # Same md5-threshold predicate as stratified_sample_hash: md5 of
            # the decimal key string is bit-identical across engines. The
            # COALESCE mirrors the operator's NULL-id sentinel (chr(0)||'null')
            # so keep/drop agrees even on nullable keys.
            "SELECT lang, COUNT(*) AS n_sampled FROM documents "
            "WHERE CAST(('0x' || substr(md5(COALESCE(CAST(doc_id AS VARCHAR), chr(0) || 'null') || ':42'), 1, 8)) "
            "AS BIGINT) % 1000000 < "
            "CASE lang WHEN 'en' THEN 250000 WHEN 'es' THEN 1000000 "
            "WHEN 'de' THEN 1000000 WHEN 'fr' THEN 1000000 "
            "WHEN 'zh' THEN 1000000 ELSE 0 END "
            "GROUP BY lang"
        ),
        "q20_union_counts": (
            "SELECT 'lineitem' AS table_name, COUNT(*) AS cnt FROM lineitem "
            "UNION ALL SELECT 'orders' AS table_name, COUNT(*) AS cnt FROM orders"
        ),
        "q21_dedup_exact": (
            "SELECT COUNT(*) AS n_rows, COUNT(DISTINCT md5(text)) AS n_distinct "
            "FROM documents"
        ),
        "q22_text_tokens": (
            "SELECT lang, COUNT(*) AS n_docs, "
            "CAST(SUM(len(string_split_regex(text, '\\s+'))) AS BIGINT) AS total_tokens, "
            "ROUND(AVG(len(string_split_regex(text, '\\s+'))), 2) AS avg_tokens, "
            "ROUND(AVG(n_chars), 2) AS avg_chars "
            "FROM documents GROUP BY lang"
        ),
        "q23_text_quality": (
            "WITH feat AS (SELECT source, n_chars, "
            "ROUND(CAST(length(text) AS DOUBLE) / "
            "GREATEST(CAST(len(string_split_regex(text, '\\s+')) AS DOUBLE), 1.0), 4) "
            "AS avg_token_len, "
            "ROUND(CAST(len(list_filter(string_split_regex(text, '\\s+'), "
            "x -> x IN ('the', 'a', 'of', 'and', 'to', 'in'))) AS DOUBLE) / "
            "GREATEST(CAST(len(string_split_regex(text, '\\s+')) AS DOUBLE), 1.0), 4) "
            "AS stopword_ratio FROM documents) "
            "SELECT source, COUNT(*) AS n_docs, "
            "ROUND(AVG(avg_token_len), 4) AS mean_token_len, "
            "ROUND(AVG(stopword_ratio), 4) AS mean_stopword_ratio, "
            "CAST(SUM(CASE WHEN n_chars < 100 THEN 1 ELSE 0 END) AS BIGINT) "
            "AS short_docs FROM feat GROUP BY source"
        ),
        "q24_lang_id": (
            "WITH scored AS (SELECT "
            "len(list_filter(string_split_regex(text, '\\s+'), "
            "x -> x IN ('der', 'die', 'und', 'das'))) AS s_de, "
            "len(list_filter(string_split_regex(text, '\\s+'), "
            "x -> x IN ('the', 'a', 'of', 'and'))) AS s_en, "
            "len(list_filter(string_split_regex(text, '\\s+'), "
            "x -> x IN ('el', 'la', 'de', 'que'))) AS s_es, "
            "len(list_filter(string_split_regex(text, '\\s+'), "
            "x -> x IN ('le', 'la', 'et', 'les'))) AS s_fr "
            "FROM documents), "
            "pred AS (SELECT CASE "
            "WHEN s_fr > GREATEST(s_de, s_en, s_es) THEN 'fr' "
            "WHEN s_es > GREATEST(s_de, s_en) THEN 'es' "
            "WHEN s_en > s_de THEN 'en' "
            "WHEN s_de > 0 THEN 'de' "
            "ELSE 'und' END AS pred_lang FROM scored) "
            "SELECT pred_lang, COUNT(*) AS cnt FROM pred GROUP BY pred_lang"
        ),
        "q25_fingerprint_jaccard": (
            "WITH grams AS (SELECT doc_id, list_distinct(list_transform("
            "generate_series(1, GREATEST(len(string_split_regex(text, '\\s+')) - 2, 1)), "
            "i -> array_to_string(string_split_regex(text, '\\s+')[i:i+2], ' '))) AS g "
            "FROM documents), "
            "pairs AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, a.g AS ga, b.g AS gb "
            "FROM grams a JOIN grams b ON b.doc_id = a.doc_id + 1), "
            "jac AS (SELECT ROUND(CASE WHEN len(list_distinct(ga || gb)) > 0 THEN "
            "CAST(len(list_intersect(ga, gb)) AS DOUBLE) / "
            "CAST(len(list_distinct(ga || gb)) AS DOUBLE) ELSE 0.0 END, 4) AS j "
            "FROM pairs) "
            "SELECT * FROM "
            "(SELECT COUNT(DISTINCT md5(concat_ws('|', "
            "CAST(length(text) AS VARCHAR), substr(text, 1, 40)))) "
            "AS n_distinct FROM documents) "
            "CROSS JOIN (SELECT ROUND(AVG(j), 4) AS avg_jaccard, "
            "ROUND(MAX(j), 4) AS max_jaccard, COUNT(*) AS n_pairs FROM jac)"
        ),
        "q30_streaming_dedup": (
            "SELECT CAST(COUNT(DISTINCT md5(text)) AS BIGINT) AS n_unique "
            "FROM documents"
        ),
        # Planted-duplicate legs: recovery of an exact copy is guaranteed by
        # construction (identical signature → collides in every band/block),
        # so the oracle derives the recovered counts from the planting rule
        # alone — no LSH/SimHash/winnowing runs in DuckDB.
        "q28_minhash_lsh": (
            "SELECT CAST(COUNT(*) AS BIGINT) AS n_planted, "
            "CAST(COUNT(*) AS BIGINT) AS n_recovered, TRUE AS all_recovered "
            "FROM documents WHERE doc_id % 89 = 0"
        ),
        "q29_simhash": (
            "SELECT CAST(COUNT(*) AS BIGINT) AS n_planted, "
            "CAST(COUNT(*) AS BIGINT) AS n_recovered, "
            "CAST(0 AS INTEGER) AS max_planted_hamming, TRUE AS all_recovered "
            "FROM documents WHERE doc_id % 83 = 0"
        ),
        "q46_winnow_fingerprints": (
            "SELECT CAST(COUNT(*) AS BIGINT) AS n_planted, "
            "CAST(COUNT(*) AS BIGINT) AS n_full_overlap, TRUE AS all_overlap "
            "FROM documents WHERE doc_id % 79 = 0"
        ),
        "q42_hll_distinct": (
            "SELECT CAST(COUNT(DISTINCT user_id) AS BIGINT) AS exact_users, "
            "TRUE AS approx_within_5pct FROM events"
        ),
        # ANN queries return the deterministic EXACT top-k (brute-force
        # cosine, ties on neighbor id) plus an in-plan recall bound the
        # oracle asserts as literal TRUE — an ANN regression flips the
        # Spark-side boolean and breaks the hash.
        "q36_lsh_topk": (
            "WITH q AS (SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv "
            "FROM embeddings WHERE vec_id < 20), "
            "c AS (SELECT vec_id AS neighbor_id, CAST(embedding AS DOUBLE[]) AS cv "
            "FROM embeddings), "
            "sims AS (SELECT query_id, neighbor_id, "
            "ROUND(ROUND(list_cosine_similarity(cv, qv), 6), 4) AS cosine, "
            "CAST(ROW_NUMBER() OVER (PARTITION BY query_id "
            "ORDER BY ROUND(list_cosine_similarity(cv, qv), 6) DESC, neighbor_id ASC) "
            "AS INTEGER) AS rk "
            "FROM c, q WHERE neighbor_id <> query_id) "
            "SELECT query_id, neighbor_id, cosine, rk, TRUE AS recall_ok "
            "FROM sims WHERE rk <= 3"
        ),
        "q43_ivf_topk": (
            "WITH q AS (SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv "
            "FROM embeddings WHERE vec_id < 20), "
            "c AS (SELECT vec_id AS neighbor_id, CAST(embedding AS DOUBLE[]) AS cv "
            "FROM embeddings), "
            "sims AS (SELECT query_id, neighbor_id, "
            "ROUND(ROUND(list_cosine_similarity(cv, qv), 6), 4) AS cosine, "
            "CAST(ROW_NUMBER() OVER (PARTITION BY query_id "
            "ORDER BY ROUND(list_cosine_similarity(cv, qv), 6) DESC, neighbor_id ASC) "
            "AS INTEGER) AS rk "
            "FROM c, q WHERE neighbor_id <> query_id) "
            "SELECT query_id, neighbor_id, cosine, rk, TRUE AS recall_ok "
            "FROM sims WHERE rk <= 3"
        ),
        # Media payloads are the utf-8 bytes of `text` (ASCII corpus), so
        # byte counts, md5 checksums, and the byte-mean feature are pure
        # string functions DuckDB evaluates without the binary path.
        "q35_multimodal_features": (
            "SELECT CAST(COUNT(*) AS BIGINT) AS n_media, "
            "CAST(SUM(octet_length(encode(text))) AS BIGINT) AS total_bytes, "
            "CAST(COUNT(DISTINCT md5(text)) AS BIGINT) AS n_distinct_payloads, "
            "ROUND(AVG(ROUND(list_aggregate(list_transform("
            "regexp_split_to_array(text, ''), x -> ord(x)), 'avg'), 4)), 2) "
            "AS mean_feat FROM documents"
        ),
        "q26_sim_topk": (
            "WITH q AS (SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv "
            "FROM embeddings WHERE vec_id < 5), "
            "c AS (SELECT vec_id AS neighbor_id, CAST(embedding AS DOUBLE[]) AS cv "
            "FROM embeddings), "
            "sims AS (SELECT query_id, neighbor_id, "
            "ROUND(ROUND(list_cosine_similarity(cv, qv), 6), 4) AS cosine, "
            "CAST(ROW_NUMBER() OVER (PARTITION BY query_id "
            "ORDER BY ROUND(list_cosine_similarity(cv, qv), 6) DESC, neighbor_id ASC) "
            "AS INTEGER) AS rk "
            "FROM c, q WHERE neighbor_id <> query_id) "
            "SELECT query_id, neighbor_id, cosine, rk FROM sims WHERE rk <= 3"
        ),
        "q27_neardup_cosine": (
            "SELECT COUNT(*) AS n_pairs FROM embeddings a JOIN embeddings b "
            "ON a.vec_id < b.vec_id "
            "WHERE ROUND(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]), "
            "CAST(b.embedding AS DOUBLE[])), 6) >= 0.45"
        ),
        "q31_event_windows": (
            "SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') "
            "AS window_start, event_type, COUNT(*) AS cnt, "
            "ROUND(SUM(value), 2) AS sum_value FROM events "
            "GROUP BY window_start, event_type"
        ),
        "q32_sessionize": (
            "WITH lagged AS (SELECT user_id, ts, "
            "LAG(ts) OVER (PARTITION BY user_id ORDER BY ts) AS prev_ts FROM events), "
            "flagged AS (SELECT user_id, ts, CASE WHEN prev_ts IS NULL "
            "OR epoch(date_trunc('second', ts)) - epoch(date_trunc('second', prev_ts)) > 600 "
            "THEN 1 ELSE 0 END AS new_s FROM lagged), "
            "sessions AS (SELECT user_id, "
            "SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts "
            "ROWS UNBOUNDED PRECEDING) AS session_seq FROM flagged), "
            "per AS (SELECT user_id, session_seq, COUNT(*) AS n_events "
            "FROM sessions GROUP BY user_id, session_seq) "
            "SELECT COUNT(*) AS n_sessions, "
            "ROUND(AVG(n_events), 4) AS avg_events_per_session, "
            "MAX(n_events) AS max_events_per_session FROM per"
        ),
        "q33_reconcile": (
            "WITH s AS (SELECT strftime(o_orderdate, '%Y-%m') AS month, "
            "COUNT(*) AS cnt_src, ROUND(SUM(o_totalprice), 2) AS sum_total_src "
            "FROM orders GROUP BY month), "
            "t AS (SELECT strftime(o_orderdate, '%Y-%m') AS month, "
            "COUNT(*) AS cnt_tgt, ROUND(SUM(o_totalprice), 2) AS sum_total_tgt "
            "FROM orders WHERE o_orderkey % 10 <> 0 GROUP BY month) "
            "SELECT month, COALESCE(cnt_src, 0) AS cnt_src, "
            "COALESCE(cnt_tgt, 0) AS cnt_tgt, "
            "COALESCE(cnt_src, 0) - COALESCE(cnt_tgt, 0) AS cnt_diff, "
            "ROUND(COALESCE(sum_total_src, 0) - COALESCE(sum_total_tgt, 0), 2) "
            "AS sum_total_diff FROM s FULL OUTER JOIN t USING (month)"
        ),
        "q34_cdc_pipeline_counts": (
            "WITH old AS (SELECT event_id, event_type, user_id FROM events "
            "WHERE event_id % 5 <> 0), "
            "new AS (SELECT event_id, CASE WHEN event_id % 11 = 0 THEN 'mutated' "
            "ELSE event_type END AS event_type, user_id FROM events) "
            "SELECT CASE WHEN old.event_id IS NULL THEN 'insert' "
            "WHEN new.event_type <> old.event_type THEN 'update' "
            "ELSE 'skip' END AS op, COUNT(*) AS cnt "
            "FROM new LEFT JOIN old ON new.event_id = old.event_id GROUP BY op"
        ),
        "q37_asof_join": (
            "WITH clicks AS (SELECT user_id, ts FROM events WHERE event_type = 'click'), "
            "purchases AS (SELECT user_id, ts, value FROM events "
            "WHERE event_type = 'purchase'), "
            "j AS (SELECT c.user_id, c.ts AS cts, p.ts AS pts, p.value "
            "FROM clicks c ASOF LEFT JOIN purchases p "
            "ON c.user_id = p.user_id AND p.ts <= c.ts) "
            "SELECT COUNT(*) AS n_clicks, "
            "CAST(COUNT(value) AS BIGINT) AS n_matched, "
            "ROUND(AVG(epoch(date_trunc('second', cts)) - "
            "epoch(date_trunc('second', pts))), 2) AS avg_gap_sec, "
            "ROUND(SUM(value), 2) AS sum_purchase_value FROM j"
        ),
        "q38_range_join": (
            "SELECT COUNT(*) AS n_pairs FROM events a JOIN events b "
            "ON a.user_id = b.user_id AND a.event_id < b.event_id "
            "AND ABS(epoch(date_trunc('second', a.ts)) - "
            "epoch(date_trunc('second', b.ts))) <= 60"
        ),
        "q39_rollup": (
            "SELECT CAST(EXTRACT(year FROM o_orderdate) AS INTEGER) AS yr, "
            "o_orderstatus, COUNT(*) AS cnt FROM orders "
            "GROUP BY ROLLUP(yr, o_orderstatus)"
        ),
        "q40_window_funcs": (
            "SELECT o_custkey, o_orderkey, "
            "CAST(ROW_NUMBER() OVER w AS INTEGER) AS rn, "
            "ROUND(SUM(o_totalprice) OVER (PARTITION BY o_custkey "
            "ORDER BY o_orderdate, o_orderkey ROWS UNBOUNDED PRECEDING), 2) "
            "AS running_total FROM orders WHERE o_custkey < 100 "
            "WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)"
        ),
        "q41_quantiles": (
            "SELECT ROUND(quantile_cont(n_chars, 0.25), 2) AS p25, "
            "ROUND(quantile_cont(n_chars, 0.5), 2) AS p50, "
            "ROUND(quantile_cont(n_chars, 0.75), 2) AS p75 FROM documents"
        ),
        "q44_dedup_keep_first": (
            "WITH kept AS (SELECT * FROM documents "
            "QUALIFY ROW_NUMBER() OVER (PARTITION BY md5(text) ORDER BY doc_id) = 1) "
            "SELECT source, COUNT(*) AS n_kept, "
            "CAST(SUM(doc_id) AS BIGINT) AS sum_ids FROM kept GROUP BY source"
        ),
        "q45_bpe_tokens": (
            "SELECT lang, "
            "CAST(SUM(len(regexp_extract_all(text, "
            "'[A-Za-z]+|[0-9]+|[^A-Za-z0-9[:space:]]'))) AS BIGINT) AS total_pieces, "
            "ROUND(AVG(len(regexp_extract_all(text, "
            "'[A-Za-z]+|[0-9]+|[^A-Za-z0-9[:space:]]'))), 2) AS avg_pieces "
            "FROM documents GROUP BY lang"
        ),
        "q47_pivot": (
            "SELECT CAST(user_id % 10 AS INTEGER) AS g, "
            "CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS click, "
            "CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS error, "
            "CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS purchase, "
            "CAST(SUM(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS BIGINT) AS signup, "
            "CAST(SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS view "
            "FROM events GROUP BY g"
        ),
        "q48_grouped_centroid": (
            "SELECT label, COUNT(*) AS n, "
            "ROUND(AVG(CAST(embedding[1] AS DOUBLE)), 6) AS d0, "
            "ROUND(AVG(CAST(embedding[2] AS DOUBLE)), 6) AS d1, "
            "ROUND(AVG(CAST(embedding[3] AS DOUBLE)), 6) AS d2 "
            "FROM embeddings GROUP BY label"
        ),
        "q49_sql_3way_join": _Q49_SQL,
        "q50_sql_6way_join": _Q50_SQL,
    }
