"""Streaming operators over the `events` table replayed as a file stream.

Every operator here takes/returns DataFrames so the same call works on a
batch frame (for the equivalence tests) and a streaming frame; Spark
plans the incremental stateful version automatically when the input is
streaming. Watermarks bound state: without one, a windowed agg on an
unbounded stream accumulates state forever — the 100 TB streaming
posture is watermark + windowed state + checkpointed sink, never
unbounded state.
"""

from __future__ import annotations

import tempfile
import uuid

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from ..catalog import load_table, normalize_event_timestamps


def events_stream(spark: SparkSession, sf_dir: str,
                  max_files_per_trigger: int | None = None) -> DataFrame:
    """Replay `events.parquet` as a file-source stream.

    Schema comes from the batch catalog read (file streams require an
    explicit schema); the stream routes through the SAME ts normalization
    as the batch path (catalog.normalize_event_timestamps handles
    int64-nanos, TIMESTAMP_NTZ, and TIMESTAMP encodings) so stream and
    batch frames are column-identical and ``withWatermark("ts", ...)``
    always sees TimestampType.
    """
    import os

    batch = load_table(spark, sf_dir, "events")
    path = f"{sf_dir}/events.parquet"
    raw = spark.read.parquet(path)  # pre-normalize schema
    reader = spark.readStream.schema(raw.schema)
    # Two fixture layouts exist (r14): the driver SFs ship events as ONE
    # parquet FILE named events.parquet, while spark-written decades
    # (sf1-synthetic) ship it as a DIRECTORY of part files. File stream
    # sources list a directory, so stream sf_dir filtered to the one
    # file in the first case and the table directory itself in the
    # second. (isdir is a local-fs probe — fixtures are local by the
    # harness contract; a remote deployment points at its own layout.)
    if os.path.isdir(path):
        reader = reader.option("pathGlobFilter", "*.parquet")
        src = path
    else:
        reader = reader.option("pathGlobFilter", "events.parquet")
        src = sf_dir
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    df = normalize_event_timestamps(reader.parquet(src))
    assert df.schema == batch.schema, "stream/batch schema drift"
    return df


#: Target state rows per state-store instance for the derived sizing in
#: :func:`run_stream_to_table`. Each instance costs a FIXED open/commit/
#: maintenance fee per micro-batch (x4 stores for a stream-stream join),
#: so instances should be meaningfully loaded: ~10k rows amortizes the
#: fixed cost while keeping per-instance state far under memory limits
#: (state rows are O(100 B); 10k rows ≈ 1 MB/store). Production callers
#: with bigger rows or tighter latency pass ``state_partitions``
#: explicitly; results are partitioning-invariant (test-pinned).
STATE_ROWS_PER_STORE = 10_000


def derive_state_partitions(spark: SparkSession,
                            est_state_rows: int) -> int:
    """Default state-store instance count from an estimated state-row
    footprint: ceil(est_state_rows / STATE_ROWS_PER_STORE), clamped to
    [1, session shuffle partitions]. The estimate is the caller's
    watermark-bounded state size (e.g. events-per-hour x watermark
    hours for a windowed agg; sum of both sides' retained rows for a
    stream-stream join) — precision does not matter, the cost curve is
    flat within 2x (sizing only avoids the two cliffs: hundreds of
    near-empty instances each paying the fixed per-batch fee, or one
    giant instance serializing all state work)."""
    cap = int(spark.conf.get("spark.sql.shuffle.partitions"))
    return max(1, min(cap, -(-est_state_rows // STATE_ROWS_PER_STORE)))


def run_stream_to_table(stream_df: DataFrame, output_mode: str = "append",
                        state_partitions: int | None = None,
                        est_state_rows: int | None = None) -> DataFrame:
    """Run a streaming frame to completion (availableNow) into a memory
    sink; return the materialized result as a batch DataFrame.

    availableNow processes exactly the data present at start then stops —
    the deterministic replay mode the equivalence tests and driver probes
    rely on. Checkpoint goes to a fresh temp dir per run (probe runs are
    independent by contract; production sinks pass a durable location).

    ``state_partitions`` sizes the STATE STORE instance count for
    stateful queries: shuffle partitions at a streaming query's FIRST
    start are pinned into its checkpoint as the state partitioning for
    the query's whole life, so this is a per-query state-sizing
    decision, not a parallelism knob — every micro-batch pays a fixed
    open/commit/maintenance cost per (partition x store) even when the
    batch carries a handful of rows (a stream-stream join holds FOUR
    stores per partition). Size it to state volume: the replay probes'
    tens-of-thousands of state rows need single-digit instances, while
    a production deployment passes whatever its state footprint needs.
    Results are partitioning-invariant (verified: identical row hashes
    across 4/8/32 on the interval-join replays). None = leave the
    session's conf untouched (the pre-r13 behavior), UNLESS
    ``est_state_rows`` is given, in which case the count derives via
    :func:`derive_state_partitions` — the documented sizing default for
    production callers who know their state footprint but not their
    cluster's conf (r13 left None = session conf, which re-created the
    32-near-empty-store pathology on small-state queries).
    """
    if state_partitions is None and est_state_rows is not None:
        state_partitions = derive_state_partitions(
            stream_df.sparkSession, est_state_rows)
    name = f"q_{uuid.uuid4().hex[:12]}"
    ckpt = tempfile.mkdtemp(prefix=f"ckpt_{name}_")
    spark = stream_df.sparkSession
    # The conf swap is session-wide: it assumes single-threaded probe
    # execution (any query PLANNED concurrently in this session during
    # the window would inherit the temporary value). Probe/test
    # harnesses are single-threaded by contract; a concurrent caller
    # must scope partitioning per query itself.
    key = "spark.sql.shuffle.partitions"
    old = spark.conf.get(key) if state_partitions is not None else None
    if state_partitions is not None:
        spark.conf.set(key, str(state_partitions))
    q = None
    try:
        q = (stream_df.writeStream
             .format("memory").queryName(name)
             .outputMode(output_mode)
             .option("checkpointLocation", ckpt)
             .trigger(availableNow=True)
             .start())
        q.awaitTermination()
    except BaseException:
        # don't leak a running query (holding state stores + the memory
        # sink name) when awaitTermination/start raises
        if q is not None:
            try:
                q.stop()
            except Exception:
                pass
        raise
    finally:
        if old is not None:
            spark.conf.set(key, old)
    return stream_df.sparkSession.table(name)


def stream_merge_to_partitioned(stream_df: DataFrame, path: str,
                                keys: list[str], ts_col: str,
                                checkpoint_dir: str,
                                fmt: str = "parquet"):
    """Streaming MERGE sink: each micro-batch upserts into the hourly
    Hive-partitioned table at ``path`` via foreachBatch +
    :func:`~..etl.merge.merge_upsert_partitioned`.

    This is the streaming completion of the incremental story: the batch
    path re-runs MERGE per extract; here the SAME partition-targeted
    merge (rewrite only partitions holding touched keys, dynamic
    partition overwrite, stale-partition purge) applies per micro-batch,
    so at 100 TB a stream of updates never rewrites the table.

    Delivery semantics: the foreachBatch body is at-least-once under
    task/query retries, but the merge is IDEMPOTENT on the merge keys
    (re-applying a batch re-elects the same winners), so the TABLE state
    is effectively exactly-once — the same replay-safety argument as the
    batch checkpoint contract (write-then-commit, SURVEY §7.4). The
    first batch bootstraps the table with a plain partitioned write.

    Returns the started StreamingQuery (availableNow trigger); callers
    ``awaitTermination()``.
    """
    import os

    from ..etl.merge import merge_upsert_partitioned
    from ..etl.sink import write_partitioned

    def _apply(batch_df: DataFrame, _batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        if not os.path.isdir(path):
            # bootstrap: dedup within the batch (merge keys must be
            # unique in the table), newest ts wins — same winner rule
            # the merge applies on later batches
            from ..operators.dedup import keyed_dedup
            first = keyed_dedup(batch_df, keys,
                                [F.col(ts_col).desc()] +
                                [F.col(c) for c in batch_df.columns])
            write_partitioned(first, path, ts_col, fmt=fmt)
            return
        merge_upsert_partitioned(batch_df.sparkSession, path, batch_df,
                                 keys, ts_col,
                                 order_by=[F.col(ts_col).desc()], fmt=fmt)

    return (stream_df.writeStream
            .foreachBatch(_apply)
            .option("checkpointLocation", checkpoint_dir)
            .trigger(availableNow=True)
            .start())


def tumbling_window_agg(df: DataFrame, duration: str = "10 minutes",
                        watermark: str | None = None) -> DataFrame:
    """Per-window count/sum. With a watermark the state store drops
    windows older than (max event time - delay); append mode then emits
    only finalized windows."""
    src = df.withWatermark("ts", watermark) if watermark else df
    return (src.groupBy(F.window("ts", duration))
            .agg(F.count(F.lit(1)).alias("n"),
                 # decimal sum: micro-batch accumulation order must not
                 # change the result (cross-engine + cross-run stable)
                 F.sum(F.col("value").cast("decimal(18,2)"))
                  .cast("double").alias("sum_value"))
            .select(F.col("window.start").alias("window_start"),
                    F.col("window.end").alias("window_end"), "n", "sum_value"))


def sliding_window_agg(df: DataFrame, duration: str = "10 minutes",
                       slide: str = "5 minutes") -> DataFrame:
    """Overlapping windows: each event lands in duration/slide windows."""
    return (df.groupBy(F.window("ts", duration, slide))
            .agg(F.count(F.lit(1)).alias("n"))
            .select(F.col("window.start").alias("window_start"), "n"))


def session_window_agg(df: DataFrame, gap: str = "30 minutes",
                       key: str = "user_id",
                       watermark: str | None = None) -> DataFrame:
    """Event-time session windows: sessions merge while events arrive
    within ``gap`` of the running session end (native session_window —
    the streaming twin of operators/sessionize.py)."""
    src = df.withWatermark("ts", watermark) if watermark else df
    return (src.groupBy(F.session_window("ts", gap), F.col(key))
            .agg(F.count(F.lit(1)).alias("n_events"),
                 F.sum(F.col("value").cast("decimal(18,2)"))
                  .cast("double").alias("sum_value"))
            .select(key,
                    F.col("session_window.start").alias("session_start"),
                    F.col("session_window.end").alias("session_end"),
                    "n_events", "sum_value"))


def streaming_dedup(df: DataFrame, keys: list[str],
                    watermark: str | None = None) -> DataFrame:
    """Keep the first occurrence per key. With a watermark, key state
    expires once the key can no longer recur inside the lateness bound
    (dropDuplicatesWithinWatermark) — bounded state, the scale form."""
    if watermark:
        return (df.withWatermark("ts", watermark)
                .dropDuplicatesWithinWatermark(keys))
    return df.dropDuplicates(keys)


#: Output schema of the stateful per-key operator.
_STATE_OUTPUT = ("user_id long, n_events long, sum_value double, "
                 "first_event long, last_event long")
_STATE_SCHEMA = "n long, s_cents long, first_e long, last_e long"


def stateful_user_stats(df: DataFrame) -> DataFrame:
    """Custom stateful per-key processing via applyInPandasWithState.

    Maintains (count, sum, first/last event id by timestamp) per user
    across micro-batches — the declared arbitrary-state surface (ref
    per-entity pull state, CommCareAPIHandler.py:264-272, generalized).
    Emits the running state each batch (update mode).
    """
    from pyspark.sql.streaming.state import GroupStateTimeout

    def update(key, pdfs, state):
        from decimal import ROUND_HALF_UP, Decimal

        import pandas as pd
        n, s_cents, first_e, last_e = (state.get if state.exists
                                       else (0, 0, None, None))
        cent = Decimal("0.01")
        for pdf in pdfs:
            pdf = pdf.sort_values(["ts", "event_id"])
            n += len(pdf)
            # integer-cent accumulation: exact regardless of batch order,
            # matching sum(CAST(value AS DECIMAL(18,2))) engine-side
            # (str(float) is the shortest repr, same as Spark's
            # BigDecimal.valueOf + HALF_UP scale-2)
            s_cents += sum(
                int(Decimal(str(v)).quantize(cent, ROUND_HALF_UP)
                    .scaleb(2))
                for v in pdf["value"])
            if len(pdf):
                if first_e is None:
                    first_e = int(pdf["event_id"].iloc[0])
                last_e = int(pdf["event_id"].iloc[-1])
        state.update((n, s_cents, first_e, last_e))
        yield pd.DataFrame([{"user_id": key[0], "n_events": n,
                             "sum_value": s_cents / 100.0,
                             "first_event": first_e, "last_event": last_e}])

    return (df.groupBy("user_id")
            .applyInPandasWithState(update, _STATE_OUTPUT, _STATE_SCHEMA,
                                    "update", GroupStateTimeout.NoTimeout))


def stream_stream_interval_join(views: DataFrame, purchases: DataFrame,
                                key: str = "user_id",
                                within: str = "10 minutes",
                                watermark: str = "30 minutes",
                                how: str = "inner") -> DataFrame:
    """Stream-stream join on a key + event-time interval (inner or
    left_outer).

    Both sides carry watermarks so the join state store can evict rows
    once the other side can no longer produce a match inside ``within``
    — the bounded-state requirement for stream-stream joins at scale
    (without it, state grows with stream length). With availableNow
    replay the result equals the equivalent batch interval join.

    ``how="left_outer"``: unmatched left rows emit with NULL right
    columns once the watermark passes their match window — which means
    the LAST rows of a FINITE stream only flush if something later
    advances the watermark past them. Batch replays that need the
    complete outer result must append watermark-advancing sentinel
    rows in a TRAILING micro-batch and filter them from the output
    (see the stream_stream_left_outer probe); on an unbounded
    production stream the next events do this naturally and no
    sentinel is needed.

    ``how="full_outer"`` (r13, the r12-verdict task-4d frontier item)
    extends the same contract to BOTH sides: unmatched purchases also
    emit (NULL view columns) once the watermark passes their window —
    state eviction still works because the interval condition bounds
    each side relative to the other in both directions. The key
    column is coalesced across sides (either may be NULL per row);
    the sentinel requirement applies to both sides' tails.
    """
    if how not in ("inner", "left_outer", "full_outer"):
        raise ValueError(f"unsupported stream-stream join type {how!r}")
    l = views.withWatermark("ts", watermark).alias("l")
    r = purchases.withWatermark("ts", watermark).alias("r")
    cond = ((F.col(f"l.{key}") == F.col(f"r.{key}"))
            & (F.col("r.ts") >= F.col("l.ts"))
            & (F.col("r.ts") <= F.col("l.ts") + F.expr(f"INTERVAL {within}")))
    key_col = (F.coalesce(F.col(f"l.{key}"), F.col(f"r.{key}"))
               if how == "full_outer" else F.col(f"l.{key}"))
    return (l.join(r, cond, how)
            .select(key_col.alias(key),
                    F.col("l.event_id").alias("view_id"),
                    F.col("r.event_id").alias("purchase_id"),
                    F.col("l.ts").alias("ts_view"),
                    F.col("r.ts").alias("ts_purchase")))


def stream_sketch_to_table(stream_df: DataFrame, key_col: str, path: str,
                           checkpoint_dir: str, depth: int = 4,
                           width: int = 4096,
                           hash_family: str = "xxhash64"):
    """Incremental count-min sketch maintenance over a stream: each
    micro-batch builds its own counter table (operators/sketch.py) and
    merges it into the persisted one at ``path``.

    This is what CMS's mergeability is FOR: the stored sketch is the
    exact cell-for-cell equal of a batch build over everything ever
    streamed (counters are sums), so frequency estimates stay available
    at O(d·w) storage while the stream itself is unbounded — no raw-data
    re-scan, no growing state. Per micro-batch the work is one bounded
    aggregate (≤ d·w rows survive the partial combine) + a ≤ d·w-row
    read-merge-rewrite of the stored table; batch size only changes the
    scan cost, never the state size.

    Delivery semantics: foreachBatch is at-least-once under retries and
    counter merge is NOT idempotent, so the rewrite goes through a
    temp-dir + atomic rename commit — a replayed batch that died before
    the rename re-merges from the last committed sketch, and one that
    died after finds its work already committed and the stream engine
    skips the batch id. Same write-then-commit discipline as the batch
    checkpoint contract (SURVEY §7.4).

    Returns the started StreamingQuery (availableNow); callers
    ``awaitTermination()``.
    """
    import os
    import shutil

    from ..operators.sketch import cms_build, cms_merge

    def _apply(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        spark = batch_df.sparkSession
        committed = os.path.join(path, "committed")
        marker = os.path.join(path, "_last_batch")
        if os.path.isfile(marker):
            with open(marker) as fh:
                if int(fh.read().strip() or -1) >= batch_id:
                    return  # replayed batch already merged + committed
        batch_sketch = cms_build(batch_df, key_col, depth=depth,
                                 width=width, hash_family=hash_family)
        if os.path.isdir(committed):
            prior = spark.read.parquet(committed)
            merged = cms_merge(prior, batch_sketch)
        else:
            merged = batch_sketch
        tmp = os.path.join(path, f"_staging_{batch_id}")
        merged.coalesce(1).write.mode("overwrite").parquet(tmp)
        old = os.path.join(path, f"_old_{batch_id}")
        if os.path.isdir(committed):
            os.rename(committed, old)
        os.rename(tmp, committed)
        shutil.rmtree(old, ignore_errors=True)
        with open(marker, "w") as fh:
            fh.write(str(batch_id))

    return (stream_df.writeStream
            .foreachBatch(_apply)
            .option("checkpointLocation", checkpoint_dir)
            .trigger(availableNow=True)
            .start())


def stateful_user_stats_tws(df: DataFrame) -> DataFrame:
    """The :func:`stateful_user_stats` semantics on Spark 4's
    transformWithState API (StatefulProcessor + typed ValueState) —
    the successor surface to applyInPandasWithState, kept as a twin so
    both arbitrary-state APIs stay covered.

    Runtime gate: transformWithState's Python worker speaks a protobuf
    protocol to the JVM state server, so executing the stream needs the
    public ``protobuf`` package (absent in this container — the
    equivalence test skips itself when the import fails, the same
    optional-dependency contract as the Pillow JPEG path). The
    applyInPandasWithState twin above is the dependency-free portable
    path and carries the driver-verified evidence.

    Same contract: per-user running (count, integer-cent sum,
    first/last event id by timestamp) across micro-batches, emitted in
    update mode; cent accumulation makes the fold exact and
    batch-order-independent, so the completed stream equals the batch
    aggregate bit-for-bit. State is one fixed-width row per key —
    bounded by keys, not stream length.
    """
    from pyspark.sql.streaming import StatefulProcessor
    from pyspark.sql.types import LongType, StructField, StructType

    class _UserStats(StatefulProcessor):
        def init(self, handle) -> None:
            self._state = handle.getValueState("agg", StructType([
                StructField("n", LongType(), True),
                StructField("s_cents", LongType(), True),
                StructField("first_e", LongType(), True),
                StructField("last_e", LongType(), True)]))

        def handleInputRows(self, key, rows, timerValues):
            from decimal import ROUND_HALF_UP, Decimal

            import pandas as pd
            if self._state.exists():
                n, s_cents, first_e, last_e = self._state.get()
            else:
                n, s_cents, first_e, last_e = 0, 0, None, None
            cent = Decimal("0.01")
            for pdf in rows:
                pdf = pdf.sort_values(["ts", "event_id"])
                n += len(pdf)
                s_cents += sum(
                    int(Decimal(str(v)).quantize(cent, ROUND_HALF_UP)
                        .scaleb(2))
                    for v in pdf["value"])
                if len(pdf):
                    if first_e is None:
                        first_e = int(pdf["event_id"].iloc[0])
                    last_e = int(pdf["event_id"].iloc[-1])
            self._state.update((n, s_cents, first_e, last_e))
            yield pd.DataFrame([{"user_id": key[0], "n_events": n,
                                 "sum_value": s_cents / 100.0,
                                 "first_event": first_e,
                                 "last_event": last_e}])

        def close(self) -> None:
            pass

    return (df.groupBy("user_id")
            .transformWithStateInPandas(statefulProcessor=_UserStats(),
                                        outputStructType=_STATE_OUTPUT,
                                        outputMode="Update",
                                        timeMode="None"))


def stream_quality_gate(stream_df: DataFrame, checks: dict,
                        good_path: str, quarantine_path: str,
                        checkpoint_dir: str):
    """Per-micro-batch data-quality gate: rows satisfying every check
    land in ``good_path``, violators land in ``quarantine_path`` with a
    ``__violated`` column naming the failed checks — the streaming
    composition of the batch constraint validator
    (operators/profile.py:check_constraints / quarantine_violations).

    ``checks``: {name: boolean Column} (NULL counts as a violation, the
    Deequ convention). Both sinks are plain appends inside ONE
    foreachBatch body, so a batch is split exactly once — the predicate
    evaluates per row in codegen, no second scan of the micro-batch
    (the batch frame is persisted for the two writes and released
    after). At-least-once under retries like any foreachBatch file
    sink; idempotent readers dedup on their keys downstream.

    Returns the started StreamingQuery (availableNow).
    """
    names = list(checks)

    def _apply(batch_df: DataFrame, _batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        violated = F.array_compact(F.array(*[
            F.when(~F.coalesce(c, F.lit(False)), F.lit(n))
            for n, c in checks.items()]))
        tagged = batch_df.withColumn("__violated", violated).persist()
        try:
            (tagged.filter(F.size("__violated") == 0)
             .drop("__violated")
             .write.mode("append").parquet(good_path))
            bad = tagged.filter(F.size("__violated") > 0)
            (bad.withColumn("__violated",
                            F.array_join("__violated", ","))
             .write.mode("append").parquet(quarantine_path))
        finally:
            tagged.unpersist()

    return (stream_df.writeStream
            .foreachBatch(_apply)
            .option("checkpointLocation", checkpoint_dir)
            .trigger(availableNow=True)
            .start())


def windowed_distinct_users(df: DataFrame, duration: str = "1 hour",
                            key: str = "user_id",
                            dim: str = "event_type") -> DataFrame:
    """Exact distinct-key counts per event-time window on a stream —
    hourly DAU — via CHAINED stateful operators: a streaming
    dropDuplicates on (key, dim, window bucket) feeding a windowed
    count. COUNT(DISTINCT) is not directly streamable (the distinct set
    isn't an algebraic accumulator); the dedup-then-count chain is its
    streaming-native decomposition, exact because the first operator's
    state IS the distinct set, held as compact dedup keys.

    Multiple stateful operators in one query is the Spark 3.4+
    capability this exercises; the bucket rides the dedup key so the
    kept representative's window assignment is deterministic (any
    arrival order yields the same counts — proven against batch
    countDistinct in the probe oracle and tests). State: one dedup key
    per (key, dim, bucket) + one count per (window, dim); add a
    watermark upstream to evict both at production scale.
    """
    b = F.date_trunc(duration.split()[-1].rstrip("s"), F.col("ts"))
    dedup = (df.withColumn("__b", b)
             .dropDuplicates([key, dim, "__b"]))
    return (dedup.groupBy(F.window("ts", duration).alias("window"), dim)
            .agg(F.count(F.lit(1)).alias("n_distinct")))


def stream_to_versioned_sink(stream_df: DataFrame, path: str,
                             ts_col: str, checkpoint_dir: str,
                             fmt: str = "parquet"):
    """Streaming append sink that COMMITS A SNAPSHOT VERSION per
    micro-batch (etl/versioning.py) — so downstream batch consumers
    get the streaming-offset experience on a plain parquet table:
    read AS OF any committed version, or read_changes(since, until)
    to consume exactly the micro-batches they haven't seen.

    This closes the loop between the engine's two incremental stories:
    the stream's checkpoint makes the WRITE exactly-once per batch,
    the version manifest makes the READ incremental — without a table
    format. Append-only by construction (the partitioned sink in
    append mode), so the versioning fence never trips.

    Returns the started query (availableNow trigger).
    """
    from ..etl.sink import write_partitioned
    from ..etl.versioning import commit_version

    def _apply(batch_df: DataFrame, _batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        # align_partitions: a micro-batch arrives with the SOURCE's
        # partitioning (often 1 scan partition) while spanning many
        # hours — without the rebalance one task writes every hourly
        # directory serially (measured 9-12 s for a 720-hour batch).
        write_partitioned(batch_df, path, ts_col, fmt=fmt,
                          align_partitions=True)
        commit_version(path, fmt=fmt)

    return (stream_df.writeStream
            .foreachBatch(_apply)
            .option("checkpointLocation", checkpoint_dir)
            .trigger(availableNow=True)
            .start())


def stream_static_enrich_agg(stream_df: DataFrame, dim_df: DataFrame,
                             join_key: str, dim_col: str,
                             duration: str = "1 day") -> DataFrame:
    """Stream-static enrichment join + windowed rollup: each micro-batch
    joins the (broadcast) static dimension — the streaming analog of
    every TPC-H star join, and the shape a 100 TB event firehose uses
    to tag events with slowly-changing reference data without any
    stream-stream state.

    Stream-static joins keep NO join state (the static side re-reads
    its current snapshot per micro-batch — pair with an SCD2 dimension
    for bitemporal correctness); the only stateful operator is the
    downstream windowed aggregate. Dimension broadcast means the
    stream side never shuffles for the join.
    """
    enriched = stream_df.join(F.broadcast(dim_df),
                              stream_df[join_key] == dim_df[join_key])
    return (enriched
            .groupBy(F.window("ts", duration).alias("w"),
                     F.col(dim_col))
            .agg(F.count(F.lit(1)).alias("n"),
                 F.sum(F.round(F.col("value") * 100).cast("long"))
                 .alias("cents"))
            .select(F.col("w.start").alias("window_start"),
                    F.col(dim_col), "n",
                    (F.col("cents").cast("double") / 100)
                    .alias("sum_value")))


def stream_cdc_to_partitioned(stream_df: DataFrame, path: str,
                              keys: list[str], ts_col: str,
                              checkpoint_dir: str,
                              op_col: str = "op", seq_col: str = "seq",
                              fmt: str = "parquet"):
    """Streaming CDC consumer: each micro-batch of changelog rows
    (op ∈ {insert, update, delete} + a monotone ``seq``) applies to the
    hourly-partitioned table via the partition-targeted writers — the
    Debezium/binlog tail brought to rest, completing
    :func:`~..operators.incremental.apply_changelog` (pure computation)
    with the sink side at the merge/delete write-amplification bound
    (only partitions holding touched keys rewrite; a full-table rewrite
    per batch is a non-starter at 100 TB).

    The table persists the changelog sequence (``__seq``) and keeps
    deletes as TOMBSTONE rows (``__deleted`` = true, payload NULLed)
    instead of physically erasing — because micro-batch boundaries are
    an artifact of the trigger, not of the log: a key's changes may
    straddle batches OUT of seq order (replayed partitions, multi-
    topic sources), and without persisted state a later batch's
    lower-seq change would silently overwrite the higher-seq row
    already applied, and a lower-seq upsert would RESURRECT a deleted
    key. The Delta/Iceberg MoR answer, on plain parquet.

    Per batch: collapse to the highest-seq change per key (upsert
    beats delete on seq ties — apply_changelog's rule, spelled as the
    boolean ``op == 'delete'`` so it never depends on the op
    literals' lexicographic order), convert deletes to tombstones,
    then ONE partition-targeted MERGE with ``order_dominates=True``
    on (__seq DESC, __deleted ASC): the stored seq — not the batch
    boundary — decides every conflict, cross-batch reordering
    included. Read the table through :func:`read_cdc_table`, which
    filters tombstones; tombstones are retained until a compaction
    with a seq horizon older than the source's maximum reordering
    window (the Kafka-compaction delete.retention.ms contract).

    At-least-once foreachBatch + an idempotent batch body
    (re-applying re-elects the same winners against the same stored
    seqs) = effectively-exactly-once table state.

    Returns the started StreamingQuery (availableNow trigger).
    """
    import os

    from ..etl.merge import merge_upsert_partitioned
    from ..etl.sink import write_partitioned
    from ..operators.dedup import keyed_dedup

    def _apply(batch_df: DataFrame, _batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        # highest seq per key; upserts outrank deletes on seq ties
        latest = keyed_dedup(
            batch_df, keys,
            [F.col(seq_col).desc(),
             (F.col(op_col) == "delete").asc()]
            + [F.col(c) for c in batch_df.columns])
        payload = [c for c in batch_df.columns
                   if c not in set(keys) | {ts_col, op_col, seq_col}]
        # deletes become tombstones: key + partition ts + seq survive,
        # payload is NULLed (the GDPR posture — a tombstone must not
        # retain the data it deletes)
        rows = (latest
                .withColumn("__deleted", F.col(op_col) == F.lit("delete"))
                .withColumn("__seq", F.col(seq_col).cast("long"))
                .select(*keys, ts_col, "__seq", "__deleted",
                        *[F.when(~F.col("__deleted"), F.col(c))
                          .alias(c) for c in payload]))
        if not os.path.isdir(path):
            write_partitioned(rows, path, ts_col, fmt=fmt)
            return
        merge_upsert_partitioned(
            batch_df.sparkSession, path, rows, keys, ts_col,
            order_by=[F.col("__seq").desc_nulls_last(),
                      F.col("__deleted").asc()],
            order_dominates=True, fmt=fmt,
            allow_missing_columns=True)

    return (stream_df.writeStream
            .foreachBatch(_apply)
            .option("checkpointLocation", checkpoint_dir)
            .trigger(availableNow=True)
            .start())


def read_cdc_table(spark: SparkSession, path: str,
                   fmt: str = "parquet") -> DataFrame:
    """Read the LIVE rows of a CDC-maintained table
    (:func:`stream_cdc_to_partitioned`): tombstones filtered, the
    bookkeeping columns (``__seq``, ``__deleted``) dropped. The
    filter is a partition-local predicate on a stored boolean —
    min/max row-group stats skip pure-tombstone files, no shuffle.
    Tables written before seq persistence (no ``__deleted`` column)
    read back unchanged.
    """
    df = spark.read.format(fmt).load(path)
    if "__deleted" in df.columns:
        df = (df.filter(~F.coalesce(F.col("__deleted"), F.lit(False)))
              .drop("__seq", "__deleted"))
    return df


def table_stream(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Replay any catalog table's parquet as a file-source stream
    (events_stream generalized; events itself should keep using
    events_stream for the ts normalization)."""
    schema = spark.read.parquet(f"{sf_dir}/{name}.parquet").schema
    return (spark.readStream.schema(schema)
            .option("pathGlobFilter", f"{name}.parquet")
            .parquet(sf_dir))


def novelty_filter(docs: DataFrame, history_fps: DataFrame,
                   text_col: str = "text",
                   fp_col: str = "fingerprint") -> DataFrame:
    """Keep only documents whose content fingerprint has never been
    seen — the incremental-crawl dedup gate: yesterday's corpus
    publishes its fingerprint manifest, today's batches stream through
    and only NOVEL documents survive to the expensive downstream
    stages (quality, near-dup, embedding).

    Stateless per batch, so the SAME call works on a batch frame or a
    streaming frame: fingerprint (md5 over normalized text — a codegen
    projection) + a stream-static LEFT ANTI join against the broadcast
    manifest. No streaming state store at all — the history is the
    state, which is why the manifest, not a watermark, bounds memory;
    refresh the static side per deployment to advance the horizon. At
    100 TB the manifest is fingerprints only (16 bytes a row), never
    document bodies.
    """
    from ..operators.text import fingerprint
    return (docs.withColumn(fp_col, fingerprint(F.col(text_col)))
            .join(F.broadcast(history_fps.select(fp_col)),
                  fp_col, "left_anti"))
