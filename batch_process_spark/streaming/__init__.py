"""Structured Streaming surface.

The reference is strictly batch (SURVEY §2.11); this module is the
engine's forward-looking stream path: the same event-table operators
expressed over ``readStream`` with watermarks, plus batch twins whose
results are oracle-checkable (a tumbling/sliding/session aggregation
has identical semantics in batch mode — Spark's unified model).
"""

from batch_process_spark.streaming.windows import (
    run_stream_to_memory,
    session_agg,
    sliding_window_agg,
    tumbling_window_agg,
)

__all__ = [
    "tumbling_window_agg",
    "sliding_window_agg",
    "session_agg",
    "run_stream_to_memory",
]
