"""Custom stateful streaming operators via ``applyInPandasWithState``.

The reference has no streaming; this is the engine's forward path for
order-dependent per-key state that windowed aggregates can't express
(the distributed answer to the reference's mutable ProcessingContext).

``running_totals_stream``: per-key running event count + value sum,
emitting one updated row per key per micro-batch. State is a single
(count, total) pair per key — bounded, spillable, timeout-evictable.
"""

from __future__ import annotations

from typing import Any, Iterator, Tuple

import pandas as pd
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = "user_id long, n_events long, total_value double"
STATE_SCHEMA = "n long, total double"


def _update_running_totals(
    key: Tuple[Any, ...],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    n, total = state.get if state.exists else (0, 0.0)
    for pdf in pdfs:
        n += len(pdf)
        total += float(pdf["value"].sum())
    state.update((n, total))
    yield pd.DataFrame(
        {"user_id": [key[0]], "n_events": [n], "total_value": [round(total, 4)]}
    )


def running_totals_stream(events):
    """Attach the stateful running-totals operator to a streaming
    events frame (grouped per user)."""
    return events.groupBy("user_id").applyInPandasWithState(
        _update_running_totals,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# Exact-integer variant (q134): values quantized to cents INSIDE the
# kernel, so the accumulated state is order- and batching-independent
# BIGINTs — the only shape of custom state an engine-portable oracle
# can pin (a float accumulator's low bits depend on summation order).
CENTS_OUTPUT_SCHEMA = "user_id long, n_events long, total_cents long"
CENTS_STATE_SCHEMA = "n long, cents long"


def _update_totals_cents(
    key: Tuple[Any, ...],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    import numpy as np

    n, cents = state.get if state.exists else (0, 0)
    for pdf in pdfs:
        n += len(pdf)
        # floor(v*100 + 0.5) per element is exact; the int sum stays
        # < 2^53 so the float64 reduction is exact too
        cents += int(np.floor(pdf["value"].to_numpy() * 100 + 0.5).sum())
    state.update((n, cents))
    yield pd.DataFrame(
        {"user_id": [key[0]], "n_events": [n], "total_cents": [cents]}
    )


def running_totals_cents_stream(events):
    """Exact-integer running totals per user — one updated row per key
    per micro-batch; the LAST emission per key is the final state."""
    return events.groupBy("user_id").applyInPandasWithState(
        _update_totals_cents,
        outputStructType=CENTS_OUTPUT_SCHEMA,
        stateStructType=CENTS_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# ---------------------------------------------------------------------------
# transformWithStateInPandas (Spark 4 arbitrary-state API)
# ---------------------------------------------------------------------------
# The successor API to applyInPandasWithState: named state variables on
# a handle (value/list/map state, TTL, timers) instead of one packed
# GroupState tuple. Requires the RocksDB state store provider (the
# default HDFS-backed store does not implement the new operator's
# column families) — ``tws_conf()`` returns the conf to scope in.


def tws_conf() -> dict:
    return {
        "spark.sql.streaming.stateStore.providerClass": (
            "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
        )
    }


def tws_available() -> bool:
    """transformWithStateInPandas ships a protobuf-based driver<->worker
    protocol: without the ``protobuf`` package the streaming runner
    crashes at first micro-batch (probed empirically — the plan builds
    fine and the failure is a mid-query worker init error, so callers
    must gate BEFORE starting the stream). This container ships no
    protobuf; the operator is exercised by a skipif test elsewhere and
    the applyInPandasWithState twin (same kernel, same oracle shape)
    carries the coverage here."""
    try:
        from google.protobuf import descriptor  # noqa: F401

        return True
    except ImportError:
        return False


def running_totals_cents_tws(events):
    """The q134 kernel re-expressed on ``transformWithStateInPandas``:
    per-user exact-integer (count, cents) in a NAMED ValueState.
    Emissions and final state are identical to
    ``running_totals_cents_stream`` — pinned by the shared oracle —
    so the two APIs are interchangeable here; this one adds named
    multi-variable state, TTL, and timers for operators that need
    them."""
    if not tws_available():
        raise NotImplementedError(
            "transformWithStateInPandas needs the protobuf package (its "
            "driver<->worker protocol) — not available in this environment; "
            "use running_totals_cents_stream (applyInPandasWithState), the "
            "same kernel on the older API"
        )
    from pyspark.sql.streaming import StatefulProcessor, StatefulProcessorHandle

    class _Totals(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._state = handle.getValueState("totals", "n LONG, cents LONG")

        def handleInputRows(self, key, rows, timerValues):
            import numpy as np
            import pandas as pd

            cur = self._state.get() if self._state.exists() else None
            n, cents = (cur[0], cur[1]) if cur is not None else (0, 0)
            for pdf in rows:
                n += len(pdf)
                cents += int(np.floor(pdf["value"].to_numpy() * 100 + 0.5).sum())
            self._state.update((n, cents))
            yield pd.DataFrame(
                {"user_id": [key[0]], "n_events": [n], "total_cents": [cents]}
            )

        def close(self) -> None:
            pass

    return events.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=_Totals(),
        outputStructType=CENTS_OUTPUT_SCHEMA,
        outputMode="Update",
        timeMode="None",
    )
