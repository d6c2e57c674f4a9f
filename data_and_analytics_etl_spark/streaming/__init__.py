"""Structured Streaming surface (SURVEY §2.2 "Streaming").

The reference's incremental pull loop is a hand-rolled stream: watermark
restore (CommCareAPIHandler.py:87-94), 5-minute ingestion lag (:65-69),
page-at-a-time processing, checkpoint commit (:105-112). Here that is
Structured Streaming: file-source replay -> event-time operators with
watermarks -> checkpointed sinks, with ``trigger(availableNow=True)``
giving deterministic batch-replay runs (the stream-batch equivalence
harness, SURVEY §5.2 item 2).
"""

from .ops import (events_stream, run_stream_to_table,  # noqa: F401
                  session_window_agg, sliding_window_agg,
                  stateful_user_stats, streaming_dedup, tumbling_window_agg)
