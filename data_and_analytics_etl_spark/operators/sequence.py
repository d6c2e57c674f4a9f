"""Event-sequence pattern matching (MATCH_RECOGNIZE-lite).

The funnel operator (funnel.py) answers "how deep did each user get
through ONE fixed stage list"; this answers the general question — how
many times does an arbitrary regex over the user's full ordered event
history match. Encoding each event type as one character turns a
billion-row ordered-sequence problem into per-key string matching:
one shuffle (the groupBy), then `regexp_count` on a compact string,
all JVM-side.

At 100 TB the per-key string is bounded by events-per-entity, not by
table size; entities with pathological histories can be length-capped
upstream (`F.slice` after the sort) without changing the shape.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window


def encode_events(df: DataFrame, key_col: str, ts_col: str,
                  type_col: str, codes: dict[str, str],
                  tiebreak_col: str) -> DataFrame:
    """Collapse each key's events to one string: events sorted by
    ``(ts, tiebreak)``, each type mapped to its single-char code
    (types absent from ``codes`` map to ``_``). One shuffle; the sort
    happens inside `array_sort` per group, not as a global ORDER BY.
    """
    mapping = F.create_map(
        *[F.lit(x) for kv in codes.items() for x in kv])
    coded = df.select(
        F.col(key_col),
        F.struct(F.col(ts_col), F.col(tiebreak_col),
                 F.coalesce(mapping[F.col(type_col)], F.lit("_"))
                 .alias("c")).alias("ev"))
    seq = (F.array_join(
        F.transform(F.array_sort(F.collect_list("ev")),
                    lambda s: s["c"]), ""))
    return coded.groupBy(key_col).agg(seq.alias("seq"))


def sequence_match(df: DataFrame, key_col: str, ts_col: str,
                   type_col: str, codes: dict[str, str], pattern: str,
                   tiebreak_col: str) -> DataFrame:
    """Per key: encoded history length and the number of
    non-overlapping matches of ``pattern`` (a regex over the
    single-char codes, e.g. ``vc*p`` = view, any clicks, purchase).
    """
    enc = encode_events(df, key_col, ts_col, type_col, codes,
                        tiebreak_col)
    return enc.select(
        key_col,
        F.length("seq").cast("long").alias("n_events"),
        F.regexp_count(F.col("seq"), F.lit(pattern)).cast("long")
        .alias("n_matches"))


def transition_matrix(df: DataFrame, key_col: str, ts_col: str,
                      type_col: str, tiebreak_col: str) -> DataFrame:
    """First-order Markov transition matrix over per-key event
    sequences: for each (from_type, to_type) adjacent pair in a key's
    (ts, tiebreak)-ordered history, the count and the row-normalized
    transition probability P(to | from).

    One window shuffle on the key (lag pairs), one aggregate on the
    (from, to) cell; the normalizing row total rides a window over the
    aggregated cell table, bounded by |types|² rows by construction.
    The probability is ONE double division from exact integer counts —
    engine-portable. Output: (from_type, to_type, n, n_from, p).
    """
    from pyspark.sql import Window

    w = Window.partitionBy(key_col).orderBy(ts_col, tiebreak_col)
    pairs = (df.select(F.col(key_col),
                       F.col(type_col).alias("to_type"),
                       F.lag(type_col).over(w).alias("from_type"))
             .filter(F.col("from_type").isNotNull()))
    cells = (pairs.groupBy("from_type", "to_type")
             .agg(F.count(F.lit(1)).alias("n")))
    wrow = Window.partitionBy("from_type")
    return (cells
            .withColumn("n_from", F.sum("n").over(wrow))
            .select("from_type", "to_type", "n", "n_from",
                    F.round(F.col("n") / F.col("n_from"), 6).alias("p")))


def top_paths(df: DataFrame, key_col: str, ts_col: str, type_col: str,
              gap_seconds: int, tiebreak_col: str,
              max_len: int = 8, k: int = 50) -> DataFrame:
    """Top-k navigation paths: sessionize the event stream (gap rule),
    render each session's first ``max_len`` event types as a '>'-joined
    path string, and rank paths by session count — the "what do users
    actually do" report product analytics starts from.

    Determinism: the per-session ordering is a total (ts, tiebreak)
    sort INSIDE array_sort over collected structs (JVM-side, no window
    sort), truncation to ``max_len`` is applied after it, and the
    final ranking breaks count ties on the path string.

    Scale shape: one shuffle to (key)-partition the sessionize window,
    one hash agg to (key, session) path strings, one hash agg to path
    counts (path cardinality is grammar-bounded — event-type^max_len
    worst case, Zipf-tiny in practice), and only that path-count table
    crosses the global ranking window. Output: (path, n_sessions,
    rank).
    """
    from .sessionize import sessionize

    s = sessionize(df, key_col, ts_col, gap_seconds,
                   tie_break=(tiebreak_col,))
    ev = F.struct(F.col(ts_col), F.col(tiebreak_col),
                  F.col(type_col).alias("t"))
    path = F.array_join(
        F.transform(F.slice(F.array_sort(F.collect_list(ev)),
                            1, max_len),
                    lambda e: e["t"]), ">")
    per_session = (s.groupBy(key_col, "session_id")
                   .agg(path.alias("path")))
    counts = (per_session.groupBy("path")
              .agg(F.count(F.lit(1)).alias("n_sessions")))
    w = Window.orderBy(F.desc("n_sessions"), F.asc("path"))
    return (counts.withColumn("rank",
                              F.row_number().over(w).cast("long"))
            .filter(F.col("rank") <= k))
