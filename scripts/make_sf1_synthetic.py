"""Deterministic synthetic sf1 (r8 verdict task 3): the growth-curve
harness tops out at /root/testdata/sf0.1, so the next scale decade is
synthesized as TEN key-remapped isomorphic copies of sf0.1 under
spark-warehouse/sf1-synthetic/.

Design — each copy k in 0..9 is a disjoint, internally self-similar
universe, so a LINEAR operator's output grows exactly 10x and any
super-linear CROSS-copy interaction a shape develops is a real
red flag, not a synthesis artifact:

- every id column shifts by k * 10_000_000 (far above any sf0.1 key),
  with foreign keys remapped consistently (o_custkey moves with
  c_custkey, l_orderkey with o_orderkey, ...);
- document text gets a per-copy token suffix for k > 0 (split ->
  transform -> join, all codegen), so cross-copy docs are NOT exact
  or near duplicates — within-copy dedup structure is preserved
  verbatim while the global vocabulary grows 10x (the Heaps behavior
  a real 10x corpus shows);
- embeddings apply a per-copy dimension rotation + deterministic sign
  flips — an ORTHOGONAL transform, so every within-copy inner product
  (and thus the whole similarity/ANN structure) is preserved exactly,
  while cross-copy cosines decorrelate;
- event/lineitem timestamps keep their ranges (scaling densifies a
  fixed time window — the TPC-H convention), so window shapes see 10x
  rows per window, the honest scale-up;
- nation/region stay single-copy (fixed dimensions, as in TPC-H).

Run: python scripts/make_sf1_synthetic.py   (idempotent overwrite)
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SRC = "/root/testdata/sf0.1"
OUT = os.path.join(REPO, "spark-warehouse", "sf1-synthetic")
STRIDE = 10_000_000
COPIES = 10

#: table -> id columns shifted by k*STRIDE (FKs listed with their PKs
#: so remapping is consistent across tables)
ID_COLS = {
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}


def main() -> int:
    import pyspark.sql.functions as F
    from pyspark.sql import SparkSession

    spark = (SparkSession.builder.master("local[16]")
             .config("spark.ui.enabled", "false")
             .config("spark.sql.shuffle.partitions", "16")
             .getOrCreate())
    os.makedirs(OUT, exist_ok=True)

    for t in ("nation", "region"):
        (spark.read.parquet(f"{SRC}/{t}.parquet")
         .write.mode("overwrite").parquet(f"{OUT}/{t}.parquet"))
        print(f"{t}: copied 1x")

    for t, ids in ID_COLS.items():
        base = spark.read.parquet(f"{SRC}/{t}.parquet")
        dim = None
        if t == "embeddings":
            dim = len(base.select("embedding").first()["embedding"])
        parts = []
        for k in range(COPIES):
            c = base
            for col in ids:
                c = c.withColumn(col, F.col(col) + F.lit(k * STRIDE))
            if t == "documents" and k > 0:
                # per-copy vocabulary: suffix every whitespace token
                c = c.withColumn(
                    "text",
                    F.when(F.col("text").isNotNull(), F.array_join(
                        F.transform(F.split(F.col("text"), " "),
                                    lambda x: F.concat(
                                        x, F.lit(f"_{k}"))), " ")))
            if t == "embeddings" and k > 0:
                # orthogonal per-copy transform: rotate dims by k and
                # flip signs by a fixed integer hash — inner products
                # within a copy are exactly preserved
                def rot(i, kk=k, d=dim):
                    sgn = 1 if ((i * 2654435761 + kk * 40503)
                                % 7) % 2 == 0 else -1
                    return (F.lit(float(sgn))
                            * F.element_at("embedding",
                                           ((i + kk) % d) + 1))
                c = c.withColumn(
                    "embedding",
                    F.array(*[rot(i) for i in range(dim)])
                    .cast("array<float>"))
            parts.append(c)
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        (out.repartition(8)
            .write.mode("overwrite").parquet(f"{OUT}/{t}.parquet"))
        n = spark.read.parquet(f"{OUT}/{t}.parquet").count()
        print(f"{t}: {n} rows ({COPIES}x)")
    print(f"wrote {OUT}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
