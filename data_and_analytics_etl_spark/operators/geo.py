"""Spatial proximity via grid bucketing — the LSH-of-geometry.

A radius self-join ("every pair of points within r") is the spatial
analog of near-dup mining: the naive form is an O(n²) cross join, and
the scale answer is the same banding trick the text/embedding dedup
stack uses — hash each point to a coarse cell, probe only the cells
that could possibly contain a match, verify exactly after the
candidate equi-join. With cell side == r, the 3×3 neighborhood of a
point's cell provably covers every point within r (any point farther
than one cell away is farther than r in that axis), so the candidate
join is COMPLETE, not approximate; the exact distance filter after it
makes the result identical to the cross join. Candidate volume is
bounded by local density (points per 9 cells), never by n².

Exactness: coordinates quantize to a 10⁻⁶ integer grid FIRST, so cell
ids are integer floordiv, squared distances are exact integer
arithmetic in DECIMAL(38,0) (operands cast before multiplying), and
the radius test compares integers — no float boundary decides a pair
on either engine.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame


def grid_proximity_join(df: DataFrame, id_col: str, x: Column,
                        y: Column, radius: float) -> DataFrame:
    """All pairs (id_a < id_b) within ``radius`` in the x/y plane.

    Plan: quantize → cell id → LEFT side explodes its 3×3 neighbor
    cells (a 9-element map-side array, no shuffle) → equi-join on the
    cell key against the RIGHT side keyed by its OWN cell (each true
    pair matches exactly once because the right cell is unique) →
    exact integer distance verify → id_a < id_b dedupe. One shuffle,
    on the cell key; skew equals physical point density, the honest
    cost of the problem.

    Output: (id_a, id_b, dist_sq_q12) with the squared distance in
    10⁻¹² coordinate² units (the quantization grid squared) — exact
    long, hash-stable; callers wanting metric distance take
    sqrt(dist_sq_q12)/1e6 themselves.
    """
    rq = int(round(radius * 1e6))
    dec = "decimal(38,0)"
    q = df.select(F.col(id_col).alias("id"),
                  F.round(x * 1e6).cast("long").alias("xq"),
                  F.round(y * 1e6).cast("long").alias("yq"))
    cell_x = F.floor(F.col("xq") / F.lit(rq))
    cell_y = F.floor(F.col("yq") / F.lit(rq))
    right = q.select(F.col("id").alias("id_b"),
                     F.col("xq").alias("xb"), F.col("yq").alias("yb"),
                     cell_x.alias("cx"), cell_y.alias("cy"))
    probe_cells = F.flatten(F.transform(
        F.sequence(F.lit(-1), F.lit(1)),
        lambda dx: F.transform(
            F.sequence(F.lit(-1), F.lit(1)),
            lambda dy: F.struct((cell_x + dx).alias("cx"),
                                (cell_y + dy).alias("cy")))))
    left = (q.select(F.col("id").alias("id_a"),
                     F.col("xq").alias("xa"), F.col("yq").alias("ya"),
                     F.explode(probe_cells).alias("c"))
            .select("id_a", "xa", "ya",
                    F.col("c.cx").alias("cx"), F.col("c.cy").alias("cy")))
    dx = (F.col("xa") - F.col("xb")).cast(dec)
    dy = (F.col("ya") - F.col("yb")).cast(dec)
    d2 = dx * dx + dy * dy
    return (left.join(right, ["cx", "cy"])
            .filter(F.col("id_a") < F.col("id_b"))
            .filter(d2 <= F.lit(rq).cast(dec) * F.lit(rq).cast(dec))
            .select("id_a", "id_b", d2.cast("long").alias("dist_sq_q12"))
            .orderBy("id_a", "id_b"))


def grid_core_points(df: DataFrame, id_col: str, x: Column, y: Column,
                     radius: float, min_pts: int) -> DataFrame:
    """DBSCAN core-point detection: per point, the count of OTHER
    points within ``radius``, and whether it meets the ``min_pts``
    density bar (core points seed DBSCAN clusters; the expansion step
    is dedup_clusters' connected components over the core-core
    proximity edges — both halves reuse engine machinery).

    Same complete grid decomposition as :func:`grid_proximity_join`
    (cell side = r ⇒ 3×3 probe covers the radius; exact integer
    distance verify on the 10⁻⁶ grid), but aggregated to per-point
    neighbor COUNTS instead of emitted pairs — and points with zero
    neighbors must appear, so the candidate count left-joins back onto
    the full point set. One candidate-join shuffle on the cell key +
    one hash aggregate on point id.
    """
    rq = int(round(radius * 1e6))
    dec = "decimal(38,0)"
    q = (df.select(F.col(id_col).alias("id"),
                   F.round(x * 1e6).cast("long").alias("xq"),
                   F.round(y * 1e6).cast("long").alias("yq")))
    cell_x = F.floor(F.col("xq") / F.lit(rq))
    cell_y = F.floor(F.col("yq") / F.lit(rq))
    right = q.select(F.col("id").alias("id_b"),
                     F.col("xq").alias("xb"), F.col("yq").alias("yb"),
                     cell_x.alias("cx"), cell_y.alias("cy"))
    probe_cells = F.flatten(F.transform(
        F.sequence(F.lit(-1), F.lit(1)),
        lambda dx: F.transform(
            F.sequence(F.lit(-1), F.lit(1)),
            lambda dy: F.struct((cell_x + dx).alias("cx"),
                                (cell_y + dy).alias("cy")))))
    left = (q.select(F.col("id").alias("id_a"),
                     F.col("xq").alias("xa"), F.col("yq").alias("ya"),
                     F.explode(probe_cells).alias("c"))
            .select("id_a", "xa", "ya",
                    F.col("c.cx").alias("cx"), F.col("c.cy").alias("cy")))
    dx = (F.col("xa") - F.col("xb")).cast(dec)
    dy = (F.col("ya") - F.col("yb")).cast(dec)
    d2 = dx * dx + dy * dy
    counts = (left.join(right, ["cx", "cy"])
              .filter(F.col("id_a") != F.col("id_b"))
              .filter(d2 <= F.lit(rq).cast(dec) * F.lit(rq).cast(dec))
              .groupBy(F.col("id_a").alias("id"))
              .agg(F.count(F.lit(1)).alias("n_neighbors")))
    return (q.select("id").join(counts, "id", "left")
            .select("id",
                    F.coalesce(F.col("n_neighbors"), F.lit(0))
                    .cast("long").alias("n_neighbors"))
            .withColumn("is_core", F.col("n_neighbors") >= F.lit(min_pts))
            .orderBy("id"))
