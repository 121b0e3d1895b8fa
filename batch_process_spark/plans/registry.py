"""Operator registry — the engine's extensibility surface.

Re-expresses the reference's decorator registry
(``decorators/processor.py:105-298``): named operators with phase
(pre/inline/post), priority, metadata (author/version/tags), retry
policy, and introspection. An operator here is a DataFrame transform
``f(df, **config) -> DataFrame`` (the reference's per-file
``f(path, context, **cfg)`` becomes a whole-DataFrame stage — the
engine hands it the matched-files frame instead of one path at a time).

Fault tolerance: ``retry`` wraps driver-side transient failures
(the reference's ``@retry`` ``processor.py:316-357``); per-row errors
follow the errors-as-data convention (operators emit status/error
columns) because distributed per-row retry is the task scheduler's job
(``spark.task.maxFailures``).
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field
from typing import Callable

PRE, INLINE, POST = "pre", "inline", "post"


@dataclass
class OperatorInfo:
    name: str
    fn: Callable
    phase: str = INLINE
    priority: int = 0
    metadata: dict = field(default_factory=dict)

    def __call__(self, df, **config):
        return self.fn(df, **config)


class Registry:
    def __init__(self):
        self._ops: dict[str, OperatorInfo] = {}

    def register(self, name=None, phase=INLINE, priority=0, **metadata):
        def deco(fn):
            op_name = name or fn.__name__
            self._ops[op_name] = OperatorInfo(op_name, fn, phase, priority, metadata)
            return fn

        return deco

    def get(self, name: str) -> OperatorInfo:
        if name not in self._ops:
            raise KeyError(f"unknown operator {name!r}; registered: {sorted(self._ops)}")
        return self._ops[name]

    def __contains__(self, name: str) -> bool:
        return name in self._ops

    def all(self) -> list[OperatorInfo]:
        """Introspection listing, sorted by (phase, -priority, name) —
        the reference's ``get_all_processors``."""
        return sorted(
            self._ops.values(), key=lambda o: (o.phase, -o.priority, o.name)
        )


REGISTRY = Registry()
operator = REGISTRY.register  # default global registry decorator


def retry(max_attempts: int = 3, delay: float = 0.1, backoff: float = 2.0):
    """Driver-side retry with exponential backoff; after the final
    attempt the error is returned as data (a structured record), never
    raised — the reference's partial-failure convention."""

    def deco(fn):
        def wrapped(*args, **kwargs):
            wait = delay
            for attempt in range(1, max_attempts + 1):
                try:
                    return fn(*args, **kwargs)
                except Exception as exc:
                    if attempt == max_attempts:
                        return {
                            "status": "failed",
                            "error": f"{type(exc).__name__}: {exc}",
                            "attempts": attempt,
                        }
                    time.sleep(wait)
                    wait *= backoff
        wrapped.__name__ = getattr(fn, "__name__", "wrapped")
        return wrapped

    return deco
