"""Plan-keyed bounded persist memos.

One shared implementation for every operator that persists an
intermediate frame keyed on its analyzed plan (the shingle+signature
frame in dedup.py, the tf table in queries_ext5.py): an OrderedDict of
(semanticHash, *extra) -> (weakref(session), persisted DataFrame) with
LRU eviction. Extracted so the subtle parts — session validation,
eviction, release — are fixed in ONE place (the original two copies
both leaked a frame when a key hit came from a different LIVE session:
the entry was deleted without unpersisting, leaving the other session's
executors holding an unreachable cache).
"""

from __future__ import annotations

import weakref
from collections import OrderedDict

from pyspark.sql import DataFrame


class PersistMemo:
    """Bounded memo of persisted DataFrames keyed on the analyzed
    plan's ``semanticHash`` plus caller extras.

    - A hit from the SAME live session returns the cached frame.
    - A hit from a DIFFERENT live session unpersists the old entry
      (its frame is unreachable from here but still pinned in that
      session's executors) and rebuilds.
    - A dead session's entry is dropped without the unpersist RPC.
    """

    def __init__(self, max_entries: int):
        self._entries: "OrderedDict[tuple, tuple]" = OrderedDict()
        self._max = max_entries

    @staticmethod
    def plan_key(df: DataFrame, *extra) -> tuple | None:
        """Key for ``df``; None when the plan can't be hashed (e.g.
        test fakes without a JVM plan) — the memo is then bypassed."""
        try:
            sem = df._jdf.queryExecution().analyzed().semanticHash()
        except Exception:
            return None
        return (sem, *extra)

    def get(self, key: tuple | None, session) -> DataFrame | None:
        if key is None or key not in self._entries:
            return None
        sess_ref, cached = self._entries[key]
        target = sess_ref()
        if target is session:
            self._entries.move_to_end(key)
            return cached
        if target is not None:  # other LIVE session: release its frame
            try:
                cached.unpersist()
            except Exception:
                pass
        del self._entries[key]
        return None

    def put(self, key: tuple | None, session, df: DataFrame,
            storage_level=None) -> DataFrame:
        """Persist ``df`` (at ``storage_level`` when given, else the
        engine default), record it under ``key``, evict LRU overflow."""
        df = df.persist(storage_level) if storage_level is not None else df.persist()
        if key is not None:
            self._entries[key] = (weakref.ref(session), df)
            while len(self._entries) > self._max:
                _, (_, old) = self._entries.popitem(last=False)
                try:
                    old.unpersist()
                except Exception:
                    pass
        return df

    def release_all(self) -> None:
        """Unpersist and drop every entry (file-rewrite invalidation)."""
        while self._entries:
            _, (_, cached) = self._entries.popitem()
            try:
                cached.unpersist()
            except Exception:
                pass  # session already stopped; nothing to release
