"""Deterministic hash-based sampling (simple and stratified).

Engine-neutral sampling for reproducible corpus curation: membership is
a pure function of the row key — ``md5(key)`` prefix under a hex
threshold — so the same rows are chosen on every engine, every run,
every partitioning, and every incremental load (a row's fate never
changes when data around it moves). Seeded Bernoulli ``df.sample`` has
none of those properties (engine-defined RNG stream per partition).

Threshold semantics: the first two hex chars of md5 give 256 buckets;
``frac`` rounds to the nearest k/256. At curation scale that galaxy of
precision is irrelevant; what matters is determinism + stability.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, Window


def _hex_threshold(frac: float) -> str:
    """frac -> threshold string ('1a' means 26/256 ~ 10.2%).

    A frac that rounds to 256/256 returns 'g0', which sorts after every
    2-hex-char bucket ('f' < 'g'), so the strict `<` keeps ALL rows —
    capping at 'ff' would silently drop the 'ff' bucket (~0.4%) at
    frac=1.0.
    """
    if not 0.0 <= frac <= 1.0:
        raise ValueError(f"frac must be in [0,1], got {frac}")
    k = round(frac * 256)
    return "g0" if k >= 256 else format(k, "02x")


def hash_bucket(key: Column) -> Column:
    """The row's 2-hex-char md5 bucket (256 buckets)."""
    return F.substring(F.md5(key.cast("string")), 1, 2)


def hash_sample(df: DataFrame, key_col: str, frac: float) -> DataFrame:
    """Keep ~frac of rows, chosen deterministically by key hash."""
    return df.filter(hash_bucket(F.col(key_col)) < _hex_threshold(frac))


def hash_stratified_sample(df: DataFrame, key_col: str, stratum_col: str,
                           fractions: dict[str, float],
                           default_frac: float = 0.0) -> DataFrame:
    """Per-stratum deterministic sampling rates (sampleBy, made stable).

    ``fractions`` maps stratum values to sampling fractions; strata not
    listed fall back to ``default_frac``. One scan, zero shuffles — the
    predicate is a CASE over the stratum column compared against the
    row's hash bucket, fully inside codegen and pushable.
    """
    thresh = F.lit(_hex_threshold(default_frac))
    for value, frac in sorted(fractions.items()):
        thresh = F.when(F.col(stratum_col) == value,
                        F.lit(_hex_threshold(frac))).otherwise(thresh)
    return df.filter(hash_bucket(F.col(key_col)) < thresh)


def rebalance_sample(df: DataFrame, key_col: str,
                     stratum_col: str) -> DataFrame:
    """Downsample every stratum to (about) the smallest stratum's size.

    The corpus-curation "equalize the language mix" move: per-stratum
    keep-fraction = min_count/count, quantized to floor(256·frac)/256
    so membership stays a pure hash-threshold function of the key.
    ``floor`` (not round) keeps the threshold engine-neutral: both
    engines do the same IEEE double division, and floor has no
    half-way tie to disagree on.

    Scale shape: one groupBy over the stratum column (tiny result),
    broadcast back onto the scan, then the same codegen-only hash
    filter as ``hash_sample``. No global shuffle of the data.
    """
    counts = df.groupBy(stratum_col).agg(F.count(F.lit(1)).alias("__c"))
    smallest = counts.agg(F.min("__c").alias("__mc"))
    counts = (counts.crossJoin(F.broadcast(smallest))
              .withColumn("__k",
                          F.floor(F.lit(256.0) * F.col("__mc")
                                  / F.col("__c")).cast("int")))
    thresh = (F.when(F.col("__k") >= 256, F.lit("g0"))
              .otherwise(F.lpad(F.lower(F.hex(F.col("__k"))), 2, "0")))
    lookup = counts.select(stratum_col, thresh.alias("__thresh"))
    return (df.join(F.broadcast(lookup), stratum_col)
            .filter(hash_bucket(F.col(key_col)) < F.col("__thresh"))
            .drop("__thresh"))


def weighted_sample(df: DataFrame, key_col: str, weight: Column,
                    scale: float) -> DataFrame:
    """Keep each row with probability ~ min(weight*scale, 1),
    deterministically (importance sampling for corpus curation —
    quality-weighted keeps, recency decay, source boosts).

    Per-row threshold = floor(256 * clamp(weight*scale, 0, 1)), same
    floor/256 quantization as the other hash samplers, so membership
    is a pure function of (key, weight) — stable across engines,
    partitionings and incremental loads. Rows with weight*scale >= 1
    are always kept. Zero shuffles; the predicate stays in codegen.
    """
    p = F.least(F.greatest(weight * F.lit(scale), F.lit(0.0)), F.lit(1.0))
    k = F.floor(F.lit(256.0) * p).cast("int")
    thresh = (F.when(k >= 256, F.lit("g0"))
              .otherwise(F.lpad(F.lower(F.hex(k)), 2, "0")))
    return df.filter(hash_bucket(F.col(key_col)) < thresh)


def top_p_by_group(df: DataFrame, group_cols: list[str], score_col: str,
                   p: str, tiebreak_cols: list[str]) -> DataFrame:
    """Nucleus (top-p) selection per group: scan each group's rows in
    descending score order and keep rows until the kept mass reaches
    fraction ``p`` of the group's total (the boundary-crossing row is
    kept, so every non-empty group keeps >= 1 row).

    The curation counterpart of a token budget: "keep the
    highest-quality documents holding p of each source's score mass".
    One shuffle (the group partitioning); both running and total sums
    ride one Window sort. ``p`` is a decimal string (e.g. ``"0.30"``)
    and the score is summed as DECIMAL(18,2): the keep predicate
    ``cum - score < p * total`` stays in exact arithmetic, so
    membership is engine- and fold-order-independent (double window
    sums are order-sensitive in the last bits, which would make the
    boundary row nondeterministic).
    """
    from pyspark.sql import Window

    score = F.col(score_col).cast("decimal(18,2)")
    order = [F.desc(score_col), *[F.col(c) for c in tiebreak_cols]]
    w_run = (Window.partitionBy(*group_cols).orderBy(*order)
             .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    w_all = Window.partitionBy(*group_cols)
    cum = F.sum(score).over(w_run)
    total = F.sum(score).over(w_all)
    keep = (cum - score) < (F.lit(p).cast("decimal(9,6)") * total)
    return df.withColumn("__keep", keep).filter("__keep").drop("__keep")


def holdout_split(df: DataFrame, key_col: str, holdout_frac: float,
                  split_col: str = "split") -> DataFrame:
    """Leakage-safe train/holdout assignment: label every row by the
    md5 bucket of its GROUP key, so all rows sharing a key (all events
    of a user, all chunks of a document) land on the same side — the
    group-aware split an eval set needs to avoid train/test leakage.

    Same floor/256 hash-threshold quantization as the samplers above:
    assignment is a pure function of the key — stable across engines,
    partitionings, and incremental loads (yesterday's training rows
    never migrate into today's holdout). Zero shuffles, pure codegen.
    """
    thr = _hex_threshold(holdout_frac)
    return df.withColumn(
        split_col,
        F.when(hash_bucket(F.col(key_col)) < F.lit(thr),
               F.lit("holdout")).otherwise(F.lit("train")))


def kfold_assign(df: DataFrame, key_col: str, k: int,
                 fold_col: str = "fold") -> DataFrame:
    """Deterministic k-fold cross-validation assignment by group key.

    Fold i covers the md5 buckets [round(i·256/k), round((i+1)·256/k)):
    contiguous hex-threshold ranges, so the fold id is a chain of the
    same engine-portable prefix comparisons the samplers use (no
    hex→int conversion, which SQL dialects disagree on). All rows of a
    key share a fold (group-aware, like :func:`holdout_split`), folds
    are ~equal mass, and fold membership is stable across engines,
    partitionings, and incremental loads. Zero shuffles, pure codegen.
    """
    if k < 2:
        raise ValueError(f"need k >= 2, got {k}")
    bucket = hash_bucket(F.col(key_col))
    expr = F.lit(k - 1)
    # descending when-chain: fold i iff bucket < threshold(i+1), tested
    # from the lowest threshold up so the first match wins
    for i in range(k - 1, 0, -1):
        expr = F.when(bucket < F.lit(_hex_threshold(i / k)),
                      F.lit(i - 1)).otherwise(expr)
    return df.withColumn(fold_col, expr.cast("int"))


def temperature_mixture_sample(df: DataFrame, key_col: str,
                               stratum_col: str, target_rows: int,
                               alpha: float = 0.5) -> DataFrame:
    """Temperature-flattened source mixing: sample each stratum so kept
    counts are proportional to n_s^alpha (alpha=1 natural mix, alpha=0
    equal mix, 0.5 the usual multilingual-corpus softening), targeting
    ``target_rows`` total — the T5/mT5-style mixture step between
    per-source curation and corpus packing.

    Keep-fraction per stratum: f_s = target·n_s^(α−1) / Σ n_t^α, capped
    at 1, quantized floor(256·f)/256 onto the shared md5-bucket space —
    membership stays a pure (key, stratum-counts) function: stable
    across engines, partitionings, incremental loads.

    Engine-exactness of the thresholds: only α=0.5 is accepted, because
    sqrt is IEEE-correctly-rounded (bit-identical in every engine) while
    pow(x, α) is not; each √n_s quantizes to an integer (×10^6 floor)
    BEFORE summing so the denominator is an exact integer sum, never an
    order-sensitive double accumulation. Scale shape = rebalance_sample:
    one tiny stratum-count aggregate broadcast back, the keep predicate
    in codegen on the scan — the data itself never shuffles.
    """
    if alpha != 0.5:
        raise NotImplementedError(
            "only alpha=0.5 is supported: sqrt is the one power IEEE "
            "guarantees correctly rounded, which the cross-engine "
            "threshold determinism contract depends on")
    counts = df.groupBy(stratum_col).agg(F.count(F.lit(1)).alias("__n"))
    counts = counts.withColumn(
        "__w", F.floor(F.sqrt(F.col("__n")) * 1_000_000).cast("long"))
    tot = counts.agg(F.sum("__w").alias("__tw"))
    # Denominator in DECIMAL(38,0): __tw ≈ Σ√n·10^6 and __n are both
    # longs, and their long*long product silently wraps (ANSI off) around
    # n ~ 1e11 per stratum — real at the operator's 100 TB framing. The
    # DuckDB oracle computes the same product in HUGEINT; decimal(38,0)
    # matches that exactness, and the final division is double on both
    # engines either way.
    k = (F.least(
            F.floor(F.lit(256.0) * F.lit(target_rows) * F.col("__w")
                    / (F.col("__tw").cast("decimal(38,0)")
                       * F.col("__n").cast("decimal(38,0)"))),
            F.lit(256)).cast("int"))
    lookup = (counts.crossJoin(F.broadcast(tot))
              .select(stratum_col,
                      F.when(k >= 256, F.lit("g0"))
                       .otherwise(F.lpad(F.lower(F.hex(k)), 2, "0"))
                       .alias("__thresh")))
    return (df.join(F.broadcast(lookup), stratum_col)
            .filter(hash_bucket(F.col(key_col)) < F.col("__thresh"))
            .drop("__thresh"))


def cap_per_group(df: DataFrame, group_col: str, key_col: str,
                  k: int) -> DataFrame:
    """Deterministic per-group row cap: at most ``k`` rows survive per
    group, chosen by md5-hash order of the key (with the key itself as
    tie-break), so the kept subset is stable across runs, partitionings
    and engines — the "max N documents per domain/source" curation gate
    (C4/RefinedWeb-style anti-domination), which a seeded ``sample()``
    cannot express because its row choice is engine-defined.

    ONE shuffle on the group column for the ranking window; the hash
    order (not insertion or timestamp order) means no upstream sort is
    assumed and hot groups cannot bias toward early files. At 100 TB a
    skewed group still bounds its window state to a counter (row_number
    needs no buffering beyond the sort), and AQE's skew-split handles
    the sort spill of pathological domains.
    """
    from pyspark.sql import Window

    w = Window.partitionBy(group_col).orderBy(
        F.md5(F.col(key_col).cast("string")), F.col(key_col))
    return (df.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") <= k)
            .drop("__rn"))


def weighted_reservoir_sample(df: DataFrame, key_col: str,
                              weight: Column, k: int,
                              seed: int = 0) -> DataFrame:
    """Fixed-size weighted sample WITHOUT replacement (Efraimidis–
    Spirakis A-Res): each row draws a deterministic pseudo-uniform
    u ∈ (0,1) from hash(key, seed) and scores u^(1/w); the k largest
    scores are the sample. P(row i first) = w_i / Σw, and conditioning
    repeats on the remainder — the exact without-replacement semantics
    a Bernoulli sampler (:func:`weighted_sample`) cannot give when the
    output size must be k.

    The whole operator is one codegen projection + a global top-k,
    which Spark executes as TakeOrderedAndProject: per-partition
    partial top-k, then a k-row merge on ONE reducer — k rows cross
    the wire per partition, not data. Deterministic: same (data, seed,
    k) → same sample on any partitioning, so splits are reproducible
    across re-runs and engines that share the hash. Rows with
    non-positive weight are excluded (their score is undefined).

    The pow() puts this on the rows-only tier (libm pow is not
    cross-engine bit-stable, the sampling.py:206 rule) — the
    distributional contract is property-tested instead: inclusion
    frequency across seeds tracks weight rank.
    """
    u = ((F.pmod(F.xxhash64(F.col(key_col), F.lit(seed)),
                 F.lit(1 << 53)).cast("double") + 0.5)
         / F.lit(float(1 << 53)))
    score = F.pow(u, 1.0 / weight)
    scored = (df.filter(weight > 0)
              .withColumn("__score", score))
    from .topk import top_k
    return (top_k(scored, k,
                  [F.desc("__score"), F.col(key_col)])
            .drop("__score"))


def select_diverse_topk(df: DataFrame, vec_col: str, quality_col: str,
                        id_col: str, per_cell: int = 1,
                        n_cells: int = 16, seed: int = 42) -> DataFrame:
    """Diversity-aware data selection: the best ``per_cell`` rows (by
    quality, id tie-break) from each k-means cell of embedding space.

    Greedy submodular selectors (MMR, facility location) are
    inherently sequential — each pick re-scores every candidate, a
    driver loop of corpus-sized jobs. The cluster-coverage relaxation
    keeps the intent (cover the embedding space, prefer quality inside
    each region) as ONE plan: a coarse quantizer assigns cells (the
    ivf_ann machinery), then a per-cell ranking window keeps the
    quality winners. Selection size = populated_cells × per_cell,
    tunable by n_cells.

    This is the training-mix curation step after dedup/quality gates:
    cap redundancy (near-identical embeddings share a cell and compete
    for its slots) while spending the budget on the best examples of
    each mode. Deterministic given the seeded quantizer; the k-means
    fit is an index build (eager, the IVF contract).
    """
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    feat = df.withColumn(
        "__features",
        array_to_vector(F.col(vec_col).cast("array<double>")))
    model = KMeans(k=n_cells, seed=seed, featuresCol="__features",
                   predictionCol="__cell").fit(feat)
    assigned = model.transform(feat).drop("__features")
    w = Window.partitionBy("__cell").orderBy(
        F.desc(quality_col), F.asc(id_col))
    return (assigned.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") <= per_cell)
            .withColumnRenamed("__cell", "cell")
            .drop("__rn"))


def quota_allocate(df: DataFrame, stratum_col: str,
                   total: int) -> DataFrame:
    """Exact proportional quota allocation across strata by the
    largest-remainder (Hamilton) method: quotas are integers, sum to
    EXACTLY ``total``, and each stratum's quota differs from its exact
    proportional share by < 1 — the allocation step a fixed-size
    stratified sample needs before any row is drawn (float
    `frac`-based samplers can't promise an exact total).

    All arithmetic is integer: base = (n_s · total) DIV T, remainder
    r_s = n_s · total − base · T, and the ``total − Σ base`` leftover
    units go to the strata with the largest remainders (stratum value
    ascending on ties). No float ever enters, so the allocation is
    deterministic and oracle-exact. The products n_s · total ride
    DECIMAL(38,0) so corpus-scale counts cannot overflow a long.

    Scale shape: one hash aggregate to a strata-sized table; the only
    windows (remainder rank) and the 1-row totals rollup run over that
    bounded table, broadcast back — nothing data-sized crosses a
    single task. Output: (stratum, n_rows, quota).
    """
    if total < 0:
        raise ValueError("total must be >= 0")
    per = (df.groupBy(F.col(stratum_col).alias("stratum"))
           .agg(F.count(F.lit(1)).alias("n_rows")))
    tot = per.agg(F.sum(F.col("n_rows").cast("decimal(38,0)"))
                  .alias("__T"))
    j = per.crossJoin(F.broadcast(tot))
    prod = F.col("n_rows").cast("decimal(38,0)") * F.lit(total)
    base = F.floor(prod / F.col("__T")).cast("long")
    rem = (prod - base.cast("decimal(38,0)") * F.col("__T"))
    j = j.withColumn("__base", base).withColumn("__rem", rem)
    # leftover units: total - sum(base); strata-sized table, bounded
    left = j.agg((F.lit(total)
                  - F.sum("__base")).cast("long").alias("__L"))
    wr = Window.orderBy(F.desc("__rem"), F.asc("stratum"))
    return (j.crossJoin(F.broadcast(left))
            .withColumn("__rk", F.row_number().over(wr))
            .select("stratum", "n_rows",
                    (F.col("__base")
                     + (F.col("__rk") <= F.col("__L")).cast("long"))
                    .alias("quota")))


def systematic_sample(df: DataFrame, key_col: str, every_k: int,
                      offset: int = 0) -> DataFrame:
    """Systematic (every k-th) sample over the md5 order of the key —
    the evenly-spaced design whose sample size is EXACTLY ⌈(n−offset)
    /k⌉ (hash-threshold sampling only hits the target fraction in
    expectation; quota sampling needs a ranking pass per cell).

    Ordering by md5(key) de-correlates the walk from any storage or
    business order (the classic systematic-sampling periodicity trap),
    stays deterministic cross-engine, and makes the selection a pure
    function of the key set. Global positions come from the
    weighted_systematic_sample bucketing pattern — the first md5 byte
    is a value-derived ORDERED bucket (hex-prefix ordering == string
    ordering, md5 bytes are uniform), per-bucket counts feed exclusive
    offsets through a 256-row window, position = offset + row_number
    within the bucket — never a single-task global window AND never a
    quantile sketch (ids.assign_dense_ids' percentile_approx cutpoints
    require a NUMERIC order column; feeding it the md5 hex string
    made bucket boundaries garbage — caught by the sf0.1 FULLVERIFY
    section in r10). One data shuffle (the per-bucket renumber).
    """
    # md5 collisions between DISTINCT keys are negligible, but
    # duplicate key VALUES share an md5 exactly — append the key
    # itself as a tie-break (the weighted/quota samplers' pattern) so
    # positions are a pure function of the key set. The contract
    # requires key_col unique per row: rows sharing a key would still
    # tie-break arbitrarily (r9 advice #2).
    keyed = df.withColumn(
        "__ord", F.concat(F.md5(F.col(key_col).cast("string")),
                          F.col(key_col).cast("string")))
    b = keyed.withColumn(
        "__b", F.conv(F.substring("__ord", 1, 2), 16, 10).cast("int"))
    counts = b.groupBy("__b").agg(F.count(F.lit(1)).alias("__c"))
    wb = (Window.orderBy("__b")
          .rowsBetween(Window.unboundedPreceding, -1))  # ≤ 256 rows
    boff = counts.withColumn(
        "__off", F.coalesce(F.sum("__c").over(wb), F.lit(0)))
    wrow = Window.partitionBy("__b").orderBy("__ord")
    ranked = (b.join(F.broadcast(boff.select("__b", "__off")), "__b")
              .withColumn("__pos",
                          (F.col("__off") + F.row_number().over(wrow) - 1)
                          .cast("long")))
    return (ranked.filter(F.col("__pos") % every_k == offset)
            .drop("__ord", "__pos", "__b", "__off"))


def weighted_systematic_sample(df: DataFrame, key_col: str,
                               weight: Column, k: int,
                               buckets: int = 64) -> DataFrame:
    """Probability-proportional-to-size SYSTEMATIC sample of ``k``
    draws — the exact-arithmetic, oracle-checkable twin of
    :func:`weighted_reservoir_sample` (A-Res orders by u^(1/w), whose
    pow/ln chain is engine-specific in the last ulp; this design
    never leaves integer arithmetic, so selection is bit-identical on
    any engine with md5).

    Classic PPS-systematic (Madow '49): rows are laid on a line in
    md5(key)-order, each occupying a segment of its integer weight;
    k equally-spaced odd-grid points g_j = (2j+1)·W/(2k), j in
    [0, k), select the rows whose segment they land in. A row with
    weight > W/k can be hit multiple times — ``n_hits`` carries the
    multiplicity (the with-replacement view), and Σ n_hits = k
    exactly. All comparisons are cross-multiplied integers: row i
    with exclusive prefix c_i and weight w_i is hit by grid j iff
    2k·c_i <= (2j+1)·W < 2k·(c_i + w_i) — no division, no doubles.
    (Beyond ~2^63/(2k) total weight, cast the cross products to
    DECIMAL(38,0); the probe scale stays in long range.)

    Scale shape: the exclusive weight prefix sum uses the
    assign_dense_ids bucketing pattern — md5-derived hash buckets,
    per-bucket weight totals (tiny) through a single-task window for
    exclusive offsets, per-bucket windows for the within-bucket
    prefix — so no corpus-sized single-task window exists. One data
    shuffle (the per-bucket prefix), one broadcast of the
    bucket-offset table. ``key_col`` must be unique per row (the
    systematic_sample contract).
    """
    if 256 % buckets:
        raise ValueError("buckets must divide 256 (2 hex digits)")
    ordk = F.concat(F.md5(F.col(key_col).cast("string")),
                    F.col(key_col).cast("string"))
    # value-derived ORDERED bucket: first byte of the md5 order key
    # floor-divided into `buckets` equal hex ranges (hex prefix
    # ordering == string ordering), so bucket boundaries respect the
    # order without a quantile sketch pass — md5 bytes are uniform.
    # A negative weight silently corrupts the prefix segments and
    # grid-hit ranges (Σ n_hits ≠ k) — refuse loudly. The guard must
    # stay LAZY (construction purity: probes launch zero jobs at
    # build), so it is an execution-time raise_error folded into the
    # weight expression — value-neutral for valid weights; zero
    # weights are fine (zero-width segments are never hit).
    wl = weight.cast("long")
    guarded_w = F.when(
        wl < 0,
        F.raise_error(F.lit(
            "weighted_systematic_sample: negative weight violates "
            "the PPS invariant (sum of n_hits == k)")).cast("long")
    ).otherwise(wl)
    d = (df.withColumn("__ord", ordk)
         .withColumn("__w", guarded_w)
         .withColumn("__b", F.floor(
             F.conv(F.substring("__ord", 1, 2), 16, 10).cast("int")
             / F.lit(256 // buckets)).cast("int")))
    btot = d.groupBy("__b").agg(F.sum("__w").alias("__bw"))
    wb = (Window.orderBy("__b")
          .rowsBetween(Window.unboundedPreceding, -1))
    boff = btot.withColumn(
        "__boff", F.coalesce(F.sum("__bw").over(wb), F.lit(0)))
    ww = (Window.partitionBy("__b").orderBy("__ord")
          .rowsBetween(Window.unboundedPreceding, -1))
    pre = (d.join(F.broadcast(boff.select("__b", "__boff")), "__b")
           .withColumn("__c", F.col("__boff")
                       + F.coalesce(F.sum("__w").over(ww), F.lit(0))))
    total = d.agg(F.sum("__w").alias("__tw"))
    two_k = F.lit(2 * k)

    def _ceil_div(x, den):
        # exact ceil(x / den) for x >= 0, den > 0 (numerators are
        # clamped nonneg below — a negative numerator's true ceil is
        # <= 0, which the j-clamps absorb; staying nonneg keeps the
        # identity portable to engines whose integer division
        # TRUNCATES rather than floors, e.g. DuckDB's //). The
        # exactly-divisible quotient is taken in DECIMAL(38,0) so the
        # arithmetic never passes through a double (2^53 cliff).
        y = x + den - F.lit(1)
        return ((y - F.pmod(y, den)).cast("decimal(38,0)")
                / den.cast("decimal(38,0)")).cast("long")

    # grid j hits row (c, w) iff 2k*c <= (2j+1)*W < 2k*(c+w):
    # j_lo = ceil((2k*c - W) / 2W) clamped to [0, k], j_hi_excl =
    # ceil((2k*(c+w) - W) / 2W) clamped likewise; hits = j_hi - j_lo
    num_lo = F.greatest(two_k * F.col("__c") - F.col("__tw"), F.lit(0))
    num_hi = F.greatest(
        two_k * (F.col("__c") + F.col("__w")) - F.col("__tw"), F.lit(0))
    den = F.lit(2) * F.col("__tw")
    j_lo = F.least(F.lit(k), _ceil_div(num_lo, den))
    j_hi = F.least(F.lit(k), _ceil_div(num_hi, den))
    return (pre.crossJoin(F.broadcast(total))
            .withColumn("n_hits", F.greatest(F.lit(0),
                                             (j_hi - j_lo).cast("long")))
            .filter(F.col("n_hits") > 0)
            .drop("__ord", "__w", "__b", "__boff", "__c", "__tw"))
