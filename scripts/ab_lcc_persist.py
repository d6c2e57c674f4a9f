"""Interleaved A/B (r14 verdict task 4): graph_local_clustering with
and without persisting the oriented-edge table `o` (consumed by the
wedge self-join twice and the closing join once).

Usage: python scripts/ab_lcc_persist.py [reps] [sf_dir]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyspark.sql.functions as F  # noqa: E402
from pyspark import StorageLevel  # noqa: E402

from data_and_analytics_etl_spark.catalog import load_table  # noqa: E402
from data_and_analytics_etl_spark.session import get_spark  # noqa: E402


def build(spark, sf, persist_o):
    from data_and_analytics_etl_spark.operators import graph as G
    li = (load_table(spark, sf, "lineitem")
          .filter(F.col("l_orderkey") % 8 == 0)
          .select(F.col("l_orderkey").alias("o"),
                  F.col("l_partkey").alias("p")))
    x = li.select(F.col("o"), F.col("p").alias("p1"))
    yy = li.select(F.col("o"), F.col("p").alias("p2"))
    edges = (x.join(yy, "o").filter(F.col("p1") < F.col("p2"))
             .select(F.col("p1").alias("src"), F.col("p2").alias("dst")))
    if not persist_o:
        return G.local_clustering_by_degree(edges)
    # persist variant: copy of the operator with o cached
    dec = "decimal(38,0)"
    a, b = F.col("src"), F.col("dst")
    e = (edges.select(F.least(a, b).alias("a"), F.greatest(a, b).alias("b"))
         .filter(F.col("a") != F.col("b")).distinct()
         .persist(StorageLevel.MEMORY_AND_DISK))
    deg = (e.select(F.col("a").alias("node"))
           .unionAll(e.select(F.col("b").alias("node")))
           .groupBy("node").agg(F.count(F.lit(1)).alias("deg")))
    ed = (e.join(deg.withColumnRenamed("node", "a")
                 .withColumnRenamed("deg", "da"), "a")
          .join(deg.withColumnRenamed("node", "b")
                .withColumnRenamed("deg", "db"), "b"))
    lf = (F.col("da") < F.col("db")) | (
        (F.col("da") == F.col("db")) & (F.col("a") < F.col("b")))
    o = ed.select(
        F.when(lf, F.col("a")).otherwise(F.col("b")).alias("u"),
        F.when(lf, F.col("b")).otherwise(F.col("a")).alias("v"),
        F.when(lf, F.col("db")).otherwise(F.col("da")).alias("dv")) \
        .persist(StorageLevel.MEMORY_AND_DISK)
    o1 = o.select("u", F.col("v").alias("v1"), F.col("dv").alias("dv1"))
    o2 = o.select("u", F.col("v").alias("v2"), F.col("dv").alias("dv2"))
    wedges = o1.join(o2, "u").filter(
        (F.col("dv1") < F.col("dv2"))
        | ((F.col("dv1") == F.col("dv2")) & (F.col("v1") < F.col("v2"))))
    closing = o.select(F.col("u").alias("v1"), F.col("v").alias("v2"))
    tri = wedges.join(closing.hint("SHUFFLE_HASH"), ["v1", "v2"])
    corners = (tri.select(F.col("u").alias("node"))
               .unionAll(tri.select(F.col("v1").alias("node")))
               .unionAll(tri.select(F.col("v2").alias("node"))))
    tpn = corners.groupBy("node").agg(F.count(F.lit(1)).alias("__tri"))
    per_node = (deg.filter(F.col("deg") >= 2).join(tpn, "node", "left")
                .select("deg", F.coalesce("__tri", F.lit(0)).alias("__tri")))
    byk = per_node.groupBy("deg").agg(
        F.count(F.lit(1)).alias("n_nodes"), F.sum("__tri").alias("triangles"))
    k = F.col("deg").cast(dec)
    num = (F.lit(2).cast(dec) * F.col("triangles").cast(dec)).cast(dec)
    den = (F.col("n_nodes").cast(dec) * k * (k - 1)).cast(dec)
    return (byk.select(F.col("deg").cast("long").alias("deg"),
                       F.col("n_nodes").cast("long").alias("n_nodes"),
                       F.col("triangles").cast("long").alias("triangles"),
                       (num.cast("double") / den.cast("double"))
                       .alias("avg_lcc"))
            .orderBy("deg"))


def main():
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    sf = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    spark = get_spark("ab-lcc", extra_conf={"spark.driver.memory": "8g"})
    spark.sparkContext.setLogLevel("ERROR")
    for variant in (False, True):
        spark.catalog.clearCache()
        build(spark, sf, variant).write.format("noop").mode(
            "overwrite").save()
    res = {False: [], True: []}
    for i in range(reps):
        for variant in (False, True):
            spark.catalog.clearCache()
            spark.sparkContext.setJobDescription(f"lcc p={variant} {i}")
            t0 = time.monotonic()
            build(spark, sf, variant).write.format("noop").mode(
                "overwrite").save()
            res[variant].append(time.monotonic() - t0)
    for v in (False, True):
        a = sorted(res[v])
        print(f"{sf} persist_o={v}: min={a[0]:.2f} med={a[len(a)//2]:.2f} "
              f"raw={[round(x, 2) for x in a]}")


if __name__ == "__main__":
    main()
