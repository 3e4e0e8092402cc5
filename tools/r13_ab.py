#!/usr/bin/env python
"""Within-run interleaved A/B harness for round-13 batch-5 candidates.

Times baseline entry queries against locally-defined variants in ONE warm
session, interleaved A,B,A,B,... so ambient drift hits both arms equally.
"""

from __future__ import annotations

import os
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import __spark_entry__ as entrymod
from pyspark.sql import functions as F

from presencia_etl_spark.functions import coerce_double, parse_access_datetime, row_hash
from presencia_etl_spark.functions.partitioning import parallelize_scan
from presencia_etl_spark.operators import cdc, similarity, text
from presencia_etl_spark.operators.filters import date_component_filter
from presencia_etl_spark.operators.multimodal import extract_features, synthesize_media
from presencia_etl_spark.session import get_spark
from presencia_etl_spark.sources.readers import read_table


def _t(spark, sf, name):
    return read_table(spark, sf, name)


# --- variants ---------------------------------------------------------------

def q17_v(spark, sf):
    orders = parallelize_scan(_t(spark, sf, "orders"))
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


def q34_v(spark, sf):
    ev = parallelize_scan(_t(spark, sf, "events")).select(
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


def q07_v(spark, sf):
    orders = _t(spark, sf, "orders")
    comp = date_component_filter(orders, "o_orderdate", 1995, 3).agg(
        F.count(F.lit(1)).alias("n_mar1995")
    )
    ev = parallelize_scan(_t(spark, sf, "events"))
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


def q16_v(spark, sf):
    supp = _t(spark, sf, "supplier")
    hashes = supp.select(
        row_hash(["s_name", "s_nationkey", "s_suppkey"]).alias("h")
    ).agg(F.countDistinct("h").alias("n_distinct"))
    ev = parallelize_scan(_t(spark, sf, "events"))
    k = F.regexp_extract(F.col("props"), r'"k": (\d+)', 1)
    coerced = ev.select(coerce_double(k).alias("kd")).agg(
        F.round(F.sum("kd"), 2).alias("sum_k")
    )
    return hashes.crossJoin(coerced)


def q23_v(spark, sf):
    quality_featured = text.quality_features(
        parallelize_scan(_t(spark, sf, "documents"))
    )
    return quality_featured.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.round(F.avg("avg_token_len"), 4).alias("mean_token_len"),
        F.round(F.avg("stopword_ratio"), 4).alias("mean_stopword_ratio"),
        F.sum(F.when(F.col("n_chars") < 100, 1).otherwise(0))
        .cast("bigint")
        .alias("short_docs"),
    )


def q35_v(spark, sf):
    docs = parallelize_scan(_t(spark, sf, "documents"))
    media = synthesize_media(docs, "doc_id", "text")
    feats = extract_features(media, fake=True)
    return feats.agg(
        F.count(F.lit(1)).alias("n_media"),
        F.sum("n_bytes").cast("bigint").alias("total_bytes"),
        F.countDistinct("checksum").alias("n_distinct_payloads"),
        F.round(F.avg("feat_mean"), 2).alias("mean_feat"),
    )


def _ann_recall_nodistinct(spark, sf, approx_fn, min_recall):
    emb = _t(spark, sf, "embeddings")
    queries_df = emb.filter(F.col("vec_id") < 20)
    exact = similarity.cosine_topk(emb, queries_df, k=3).localCheckpoint(eager=True)
    approx = approx_fn(emb, queries_df)
    flagged = exact.join(
        approx.select("query_id", "neighbor_id").withColumn("_hit", F.lit(1)),
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


def q36_v(spark, sf):
    return _ann_recall_nodistinct(
        spark,
        sf,
        lambda emb, q: similarity.lsh_topk(emb, q, k=3, dim=64, n_tables=16),
        min_recall=0.6,
    )


def q43_v(spark, sf):
    return _ann_recall_nodistinct(
        spark,
        sf,
        lambda emb, q: similarity.ivf_topk(emb, q, k=3, n_clusters=8, n_probe=4),
        min_recall=0.6,
    )


def _ivf_topk_nospread(emb, q, k=3, n_clusters=8, n_probe=4):
    """ivf_topk minus the batch-3 corpus spread (assign on the raw scan)."""
    from pyspark.sql import Window

    C = similarity.ivf_fit_centroids(emb, "vec_id", "embedding", n_clusters, 42)
    assigned = similarity.ivf_assign(
        emb.select(F.col("vec_id").alias("neighbor_id"),
                   F.col("embedding").alias("cv")),
        C, "cv", out="cluster",
    )
    qa = similarity.ivf_assign(
        q.select(F.col("vec_id").alias("query_id"),
                 F.col("embedding").alias("qv")),
        C, "qv", out="probe_list", n_probe=n_probe,
    )
    qa = qa.withColumn("cluster", F.explode("probe_list")).drop("probe_list")
    joined = assigned.join(F.broadcast(qa), "cluster").filter(
        F.col("neighbor_id") != F.col("query_id")
    )
    cos = similarity._pair_cosine_udf()(F.col("cv"), F.col("qv"))
    ranked = joined.withColumn("cosine", F.round(cos, 6)).withColumn(
        "rk",
        F.row_number().over(
            Window.partitionBy("query_id").orderBy(
                F.desc("cosine"), F.asc("neighbor_id"))
        ),
    )
    return ranked.filter(F.col("rk") <= k).select(
        "query_id", "neighbor_id", "cosine", "rk"
    )


def _ann_recall_like_entry(spark, sf, approx_fn, min_recall, use_arrow=True):
    """Entry's _ann_recall_query with a switchable exact-leg kernel."""
    emb = _t(spark, sf, "embeddings")
    queries_df = emb.filter(F.col("vec_id") < 20)
    exact = similarity.cosine_topk(
        emb, queries_df, k=3, use_arrow=use_arrow
    ).localCheckpoint(eager=True)
    approx = approx_fn(emb, queries_df)
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


def _lsh_topk_oldshape(emb, q, k=3, dim=64, n_tables=16):
    """Pre-fusion lsh_topk: bucket both sides, join, dedup, pair re-rank."""
    from pyspark.sql import Window

    n_planes, seed = 8, 42
    c_base = parallelize_scan(emb).select(
        F.col("vec_id").alias("neighbor_id"), F.col("embedding").alias("cv")
    )
    q_base = q.select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qv")
    )
    c = similarity._lsh_bucketed(c_base, "cv", n_planes, n_tables, dim, seed, probe=False)
    qb = similarity._lsh_bucketed(q_base, "qv", n_planes, n_tables, dim, seed, probe=True)
    joined = c.join(F.broadcast(qb), ["tbl", "bucket"]).filter(
        F.col("neighbor_id") != F.col("query_id")
    )
    cos = similarity._pair_cosine_udf()(F.col("cv"), F.col("qv"))
    ranked = (
        joined.select("query_id", "neighbor_id", "cv", "qv")
        .dropDuplicates(["query_id", "neighbor_id"])
        .withColumn("cosine", F.round(cos, 6))
        .withColumn(
            "rk",
            F.row_number().over(
                Window.partitionBy("query_id").orderBy(
                    F.desc("cosine"), F.asc("neighbor_id"))
            ),
        )
    )
    return ranked.filter(F.col("rk") <= k).select(
        "query_id", "neighbor_id", "cosine", "rk"
    )


def q36_oldshape_v(spark, sf):
    return _ann_recall_like_entry(
        spark, sf,
        lambda emb, q: _lsh_topk_oldshape(emb, q, k=3, dim=64, n_tables=16),
        min_recall=0.6,
    )


def q43_nospread_v(spark, sf):
    return _ann_recall_like_entry(
        spark, sf, lambda emb, q: _ivf_topk_nospread(emb, q), min_recall=0.6
    )


def q43_foldexact_v(spark, sf):
    return _ann_recall_like_entry(
        spark, sf,
        lambda emb, q: similarity.ivf_topk(emb, q, k=3, n_clusters=8, n_probe=4),
        min_recall=0.6, use_arrow=False,
    )


PAIRS = {
    "q17_cdc_classify": q17_v,
    "q34_cdc_pipeline_counts": q34_v,
    "q07_date_predicates": q07_v,
    "q16_hash_coercion": q16_v,
    "q23_text_quality": q23_v,
    "q35_multimodal_features": q35_v,
    "q36_lsh_topk": q36_v,
    "q43_ivf_topk": q43_v,
    "q43_nospread": q43_nospread_v,
    "q36_oldshape": q36_oldshape_v,
    "q43_foldexact": q43_foldexact_v,
}


def main():
    names = sys.argv[1:] or list(PAIRS)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    reps = int(os.environ.get("R13_REPS", "5"))
    spark = get_spark(
        app_name="r13-ab",
        shuffle_partitions=int(os.environ.get("SPARK_GRAFT_SHUFFLE_PARTITIONS", "16")),
    )
    spark.sparkContext.setLogLevel("ERROR")
    sc = spark.sparkContext
    tracker = sc.statusTracker()
    queries = entrymod.queries()

    # warm
    spark.range(1000).selectExpr("sum(id)").collect()
    for t in ("orders", "events", "documents", "embeddings", "supplier"):
        df = read_table(spark, sf_dir, t)
        df.write.format("noop").mode("overwrite").save()
    # shakedown both arms of the first query (Python worker warm-up)
    first_base = names[0] if names[0] in queries else (
        "q36_lsh_topk" if names[0].startswith("q36") else "q43_ivf_topk"
    )
    queries[first_base](spark, sf_dir).collect()
    PAIRS[names[0]](spark, sf_dir).collect()

    for name in names:
        base_name = name if name in queries else (
            "q36_lsh_topk" if name.startswith("q36") else "q43_ivf_topk"
        )
        base_fn, var_fn = queries[base_name], PAIRS[name]
        rows_base = rows_var = None
        runs = {"base": [], "var": []}
        jobs = {}
        for rep in range(reps):
            for tag, fn in (("base", base_fn), ("var", var_fn)):
                group = f"ab:{name}:{tag}:{rep}"
                sc.setJobGroup(group, f"{name}:{tag}")
                t0 = time.perf_counter()
                out = fn(spark, sf_dir).collect()
                runs[tag].append(time.perf_counter() - t0)
                if rep == 0:
                    jobs[tag] = len(tracker.getJobIdsForGroup(group))
                    if tag == "base":
                        rows_base = sorted(map(tuple, out))
                    else:
                        rows_var = sorted(map(tuple, out))
        sc.setLocalProperty("spark.jobGroup.id", None)
        same = rows_base == rows_var
        for tag in ("base", "var"):
            r = sorted(runs[tag])
            print(
                f"{name:26s} {tag:4s} med={r[len(r)//2]:6.3f} min={r[0]:6.3f} "
                f"max={r[-1]:6.3f} jobs={jobs[tag]}"
            )
        print(f"{name:26s} rows identical: {same}")
        if not same:
            print(f"  BASE: {rows_base[:3]}")
            print(f"  VAR : {rows_var[:3]}")


if __name__ == "__main__":
    main()
