"""Multi-touch marketing attribution over an event stream.

Which channels get credit for a conversion? The four classic
integer-credit models over a lookback window:

- first_touch: the earliest touchpoint in the window gets the
  conversion;
- last_touch: the latest one does;
- participation: every channel present in the window gets one count
  (the "any-touch" model);
- touches: raw touch volume per channel (the denominator marketers
  sanity-check the above against).

Fractional models (linear 1/n, U-shaped 40/40/20) are deliberately
NOT emitted: their per-channel sums accumulate doubles in partition
order, which breaks the engine's cross-engine exact-hash determinism
contract (SURVEY §7.5). The integer models carry the same decisions
and are exact.

Scale shape: conversions join touches per user (one hash shuffle on
the user key; the per-user event list bounds the pair fan-out, and
the lookback predicate prunes it further — at extreme per-user
volumes route through operators/rangejoin.py's binned form). First/
last election is a single min_by/max_by hash aggregate on the
conversion id — no window sort, and the per-(conversion, channel)
rollup reuses the same shuffle key prefix. Channel-level outputs are
dictionary-sized.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def multitouch_attribution(events: DataFrame, user_col: str,
                           ts_col: str, type_col: str, id_col: str,
                           conversion_type: str,
                           touch_types: list[str],
                           lookback_seconds: int) -> DataFrame:
    """Per-channel attribution counts for ``conversion_type`` events.

    A touch is credited to a conversion when it is the same user's,
    STRICTLY before the conversion, and within ``lookback_seconds``
    of it. Ties in touch ordering break on ``id_col`` so first/last
    election is total. Conversions with no in-window touch appear
    nowhere (the unattributed remainder = conversions − sum of
    first_touch counts).

    Output: (channel, first_touch, last_touch, participation,
    touches), one row per channel that credited at least once.
    """
    conv = (events.filter(F.col(type_col) == conversion_type)
            .select(F.col(user_col).alias("__u"),
                    F.col(ts_col).alias("__cts"),
                    F.col(id_col).alias("__cid")))
    touch = (events.filter(F.col(type_col).isin(touch_types))
             .select(F.col(user_col).alias("__u"),
                     F.col(ts_col).alias("__tts"),
                     F.col(id_col).alias("__tid"),
                     F.col(type_col).alias("channel")))
    joined = (conv.join(touch, "__u")
              .filter((F.col("__tts") < F.col("__cts"))
                      & (F.col("__tts") >= F.col("__cts")
                         - F.expr(f"INTERVAL {int(lookback_seconds)} "
                                  "SECOND"))))
    order_key = F.struct(F.col("__tts"), F.col("__tid"))
    per_conv = (joined.groupBy("__cid")
                .agg(F.min_by("channel", order_key).alias("__first"),
                     F.max_by("channel", order_key).alias("__last")))
    per_conv_channel = (joined.groupBy("__cid", "channel")
                        .agg(F.count(F.lit(1)).alias("__n")))
    firsts = (per_conv.groupBy(F.col("__first").alias("channel"))
              .agg(F.count(F.lit(1)).alias("first_touch")))
    lasts = (per_conv.groupBy(F.col("__last").alias("channel"))
             .agg(F.count(F.lit(1)).alias("last_touch")))
    parts = (per_conv_channel.groupBy("channel")
             .agg(F.count(F.lit(1)).alias("participation"),
                  F.sum("__n").alias("touches")))
    return (parts.join(firsts, "channel", "left")
            .join(lasts, "channel", "left")
            .select("channel",
                    F.coalesce("first_touch", F.lit(0)).cast("long")
                    .alias("first_touch"),
                    F.coalesce("last_touch", F.lit(0)).cast("long")
                    .alias("last_touch"),
                    F.col("participation").cast("long")
                    .alias("participation"),
                    F.col("touches").cast("long").alias("touches")))
