"""Interleaved A/B: b6 cosine_topk with the r14 mapInArrow partial
top-k vs the engine's own WindowGroupLimit(Partial) form.

Times, per variant, best-of-N noop-sink runs of
  (a) the bench probe shape (10 probes x corpus),
  (b) the mutual-5NN substrate (corpus x corpus, ~4M pairs at sf0.1),
interleaved A,B,A,B,... in ONE session (host-noise rule).

Usage: SPARK_GRAFT_SF_DIR=... python scripts/ab_b6_partial_topk.py [reps]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyspark.sql.functions as F  # noqa: E402
from pyspark.sql import Window  # noqa: E402

from data_and_analytics_etl_spark.catalog import load_table  # noqa: E402
from data_and_analytics_etl_spark.operators import similarity as sim  # noqa: E402
from data_and_analytics_etl_spark.session import get_spark  # noqa: E402


def build(spark, sf_dir, probes_small: bool, partial: bool):
    e = load_table(spark, sf_dir, "embeddings")
    probes = e.filter(F.col("vec_id") < 10) if probes_small else e
    from data_and_analytics_etl_spark.operators.text import (
        ensure_fanout_parallelism)
    p = probes.select(F.col("vec_id").alias("probe_id"),
                      sim.as_double(F.col("embedding")).alias("__pvec"))
    p = p.withColumn("__pnorm", sim.l2_norm(F.col("__pvec")))
    c = ensure_fanout_parallelism(
        e.select(F.col("vec_id"),
                 sim.as_double(F.col("embedding")).alias("__cvec")))
    c = c.withColumn("__cnorm", sim.l2_norm(F.col("__cvec")))
    scored = (c.join(F.broadcast(p), F.col("probe_id") != F.col("vec_id"))
              .withColumn("cosine", F.round(sim.cosine_prenormed(
                  F.col("__pvec"), F.col("__cvec"),
                  F.col("__pnorm"), F.col("__cnorm")), 6)))
    base = scored.select("probe_id", "vec_id", "cosine")
    if partial:
        base = sim._partition_topk(base, 5)
    w = Window.partitionBy("probe_id").orderBy(F.desc("cosine"),
                                               F.asc("vec_id"))
    return (base.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= 5)
            .select("probe_id", "vec_id", "cosine", "rank"))


def run_once(spark, df, label):
    spark.catalog.clearCache()
    spark.sparkContext.setJobDescription(label)
    t0 = time.monotonic()
    df.write.format("noop").mode("overwrite").save()
    return time.monotonic() - t0


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    spark = get_spark("ab-b6-partial-topk")
    spark.sparkContext.setLogLevel("ERROR")
    shapes = {"bench(10xN)": True, "mutual(NxN)": False}
    out: dict[str, dict[str, list[float]]] = {
        s: {"partial": [], "window": []} for s in shapes}
    # warm-up both variants once (JIT/page cache)
    for s, small in shapes.items():
        run_once(spark, build(spark, sf_dir, small, True), "warm")
        run_once(spark, build(spark, sf_dir, small, False), "warm")
    for i in range(reps):
        for s, small in shapes.items():
            out[s]["partial"].append(run_once(
                spark, build(spark, sf_dir, small, True), f"{s} partial {i}"))
            out[s]["window"].append(run_once(
                spark, build(spark, sf_dir, small, False), f"{s} window {i}"))
    for s in shapes:
        a, b = out[s]["partial"], out[s]["window"]
        print(f"{s}: partial min={min(a):.3f} med={sorted(a)[len(a)//2]:.3f} "
              f"| window min={min(b):.3f} med={sorted(b)[len(b)//2]:.3f} "
              f"| raw partial={[round(x,3) for x in a]} "
              f"window={[round(x,3) for x in b]}")


if __name__ == "__main__":
    main()
