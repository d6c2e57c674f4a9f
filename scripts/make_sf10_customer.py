"""Deterministic synthetic sf10 CUSTOMER table (r12 verdict task 5):
the weighted-closure growth-curve needs a second decade (sf1 → sf10)
behind the "output is sub-linear on THIS topology" claim, and the
digit-hierarchy probes read ONLY the customer table — so this
synthesizes customer alone (1.5M rows, ~100 key-remapped isomorphic
copies of sf0.1) rather than the full 10 GB universe.

Same key design as make_sf1_synthetic.py: every copy k in 0..99
shifts c_custkey by k * 10_000_000. CAVEAT (same as sf1, documented
at scripts/growth_curve.py's closure check): the GLOBAL-key digit
hierarchy u -> u//10 is NOT isomorphic under this shift — copy-k
parents (k*1e6 + u//10) are not customer keys, so copy-k chains
truncate after 1-2 hops and the raw growth-curve rows measure a
mostly-star topology. The honest posture evidence is therefore the
LOCAL-key isomorphic check in growth_curve.py (copy = key DIV 1e7,
u = key MOD 1e7, dst = u//10 + copy*1e7): with per-copy local chains
every copy is a true replica of sf0.1's hierarchy and the weighted
closure's pairs grow EXACTLY 10x per decade (measured 63,889 →
638,890 → 6,388,900 at 0.1 → 1 → 10).

Run: python scripts/make_sf10_customer.py   (idempotent overwrite)
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SRC = "/root/testdata/sf0.1"
OUT = os.path.join(REPO, "spark-warehouse", "sf10-synthetic")
STRIDE = 10_000_000
COPIES = 100


def main() -> int:
    import pyspark.sql.functions as F
    from pyspark.sql import SparkSession

    spark = (SparkSession.builder.master("local[16]")
             .config("spark.ui.enabled", "false")
             .config("spark.sql.shuffle.partitions", "16")
             .getOrCreate())
    os.makedirs(OUT, exist_ok=True)
    base = spark.read.parquet(f"{SRC}/customer.parquet")
    copies = (base.crossJoin(
        spark.range(COPIES).select(F.col("id").alias("__k")))
        .withColumn("c_custkey",
                    F.col("c_custkey") + F.col("__k") * F.lit(STRIDE))
        .drop("__k"))
    copies.coalesce(8).write.mode("overwrite").parquet(
        f"{OUT}/customer.parquet")
    n = spark.read.parquet(f"{OUT}/customer.parquet").count()
    print(f"sf10-synthetic customer: {n} rows at {OUT}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
