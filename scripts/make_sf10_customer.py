"""Deterministic synthetic sf10 CUSTOMER table (r12 verdict task 5):
the weighted-closure growth-curve needs a second decade (sf1 → sf10)
behind the "output is sub-linear on THIS topology" claim, and the
digit-hierarchy probes read ONLY the customer table — so this
synthesizes customer alone (1.5M rows, ~100 key-remapped isomorphic
copies of sf0.1) rather than the full 10 GB universe.

Same design as make_sf1_synthetic.py: every copy k in 0..99 shifts
c_custkey by k * 10_000_000 — disjoint self-similar universes, so a
LINEAR operator's output grows exactly 100x vs sf0.1 and any
super-linear cross-copy interaction is a real red flag. Keys reach
~10 digits, so the digit hierarchy deepens to ~10 hops (still inside
the probes' max_depth=16 horizon) — the property under test: the
hierarchy gets SHALLOWER per key as the key space widens, keeping
pair fan-out sub-linear.

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
