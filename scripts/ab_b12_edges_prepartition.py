"""Interleaved A/B (r14): dedup_clusters' loop-invariant edge table —
eager localCheckpoint (current; partitioning lost, edges re-exchange
every round at scale) vs repartition("dst") + persist (partitioning
preserved through InMemoryTableScan, per-round edge exchange removed).

Also captures one round's executed plan with autoBroadcastJoinThreshold
=-1 to emulate the at-scale join strategy (locally the tiny label side
broadcasts, hiding the exchange question).

Usage: python scripts/ab_b12_edges_prepartition.py [reps] [sf_dir]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyspark.sql.functions as F  # noqa: E402
from pyspark import StorageLevel  # noqa: E402
from pyspark.sql import Observation  # noqa: E402

from data_and_analytics_etl_spark.catalog import load_table  # noqa: E402
from data_and_analytics_etl_spark.operators.dedup import (  # noqa: E402
    jaccard_pairs, with_word_shingles)
from data_and_analytics_etl_spark.session import get_spark  # noqa: E402


def run_cc(spark, sf_dir, prepartition, max_iter=25):
    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 250)
    sh = with_word_shingles(d, "text", n=3)
    pairs = jaccard_pairs(sh, "doc_id", "shingles", threshold=0.5)
    vertices = d.select("doc_id")
    edges = (pairs.select(F.col("id_a").alias("src"),
                          F.col("id_b").alias("dst"))
             .unionByName(pairs.select(F.col("id_b").alias("src"),
                                       F.col("id_a").alias("dst"))))
    labels = vertices.select(F.col("doc_id").alias("vid"),
                             F.col("doc_id").alias("label"))
    if prepartition:
        edges = edges.repartition("dst").persist(
            StorageLevel.MEMORY_AND_DISK)
    else:
        edges = edges.localCheckpoint(eager=True)
    labels = labels.localCheckpoint(eager=True)
    for _ in range(max_iter):
        neighbor_min = (edges.join(labels, edges.dst == labels.vid)
                        .groupBy("src").agg(F.min("label").alias("nmin")))
        prop = (labels.join(neighbor_min,
                            labels.vid == neighbor_min.src, "left")
                .select(F.col("vid"), F.col("label").alias("__old"),
                        F.least(F.col("label"),
                                F.coalesce(F.col("nmin"), F.col("label")))
                        .alias("__mid")))
        ref = prop.select(F.col("vid").alias("__rvid"),
                          F.col("__mid").alias("__rlab"))
        updated = (prop.join(ref, prop.__mid == ref.__rvid, "left")
                   .select(F.col("vid"),
                           F.least(F.col("__mid"),
                                   F.coalesce(F.col("__rlab"),
                                              F.col("__mid")))
                           .alias("label"), F.col("__old")))
        updated = updated.withColumn(
            "__changed", F.col("label") != F.col("__old")).drop("__old")
        obs = Observation()
        updated = updated.observe(
            obs, F.sum(F.col("__changed").cast("long")).alias("n"))
        updated = updated.localCheckpoint(eager=True)
        changed = obs.get["n"]
        labels = updated.drop("__changed")
        if changed == 0:
            break
    if prepartition:
        edges.unpersist()
    return labels


def main():
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    sf = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    spark = get_spark("ab-b12-edges")
    spark.sparkContext.setLogLevel("ERROR")
    res = {False: [], True: []}
    for variant in (False, True):  # warm-up
        spark.catalog.clearCache()
        run_cc(spark, sf, variant)
    for i in range(reps):
        for variant in (False, True):
            spark.catalog.clearCache()
            spark.sparkContext.setJobDescription(f"cc pre={variant} {i}")
            t0 = time.monotonic()
            run_cc(spark, sf, variant)
            res[variant].append(time.monotonic() - t0)
    for v in (False, True):
        a = sorted(res[v])
        print(f"prepartition={v}: min={a[0]:.2f} med={a[len(a)//2]:.2f} "
              f"raw={[round(x, 2) for x in a]}")
    # scale-emulation plan check: with broadcast off, does the
    # prepartitioned edge side skip its per-round exchange?
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        for variant in (False, True):
            spark.catalog.clearCache()
            d = load_table(spark, sf, "documents").filter(
                F.col("doc_id") < 250)
            sh = with_word_shingles(d, "text", n=3)
            pairs = jaccard_pairs(sh, "doc_id", "shingles", threshold=0.5)
            edges = (pairs.select(F.col("id_a").alias("src"),
                                  F.col("id_b").alias("dst"))
                     .unionByName(pairs.select(F.col("id_b").alias("src"),
                                               F.col("id_a").alias("dst"))))
            labels = d.select(F.col("doc_id").alias("vid"),
                              F.col("doc_id").alias("label"))
            if variant:
                edges = edges.repartition("dst").persist(
                    StorageLevel.MEMORY_AND_DISK)
                edges.count()
            else:
                edges = edges.localCheckpoint(eager=True)
            labels = labels.localCheckpoint(eager=True)
            joined = (edges.join(labels, edges.dst == labels.vid)
                      .groupBy("src").agg(F.min("label").alias("nmin")))
            joined.write.format("noop").mode("overwrite").save()
            plan = joined._jdf.queryExecution().executedPlan().toString()
            ex = [ln.strip()[:70] for ln in plan.splitlines()
                  if "Exchange hashpartitioning(dst" in ln]
            print(f"prepartition={variant}: edge-side exchanges in "
                  f"per-round join plan = {len(ex)} {ex}")
            if variant:
                edges.unpersist()
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")


if __name__ == "__main__":
    main()
