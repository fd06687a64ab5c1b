"""Session-lifetime persist hygiene (r13 verdict ask #6).

Several query builders ``persist()`` a frame that remains part of the
returned DataFrame's plan — the cache cannot be released before the
caller's action runs, so the builder itself can never ``unpersist()``.
The bench is unaffected (it ``clearCache()``s after every timing), but a
long-lived production session would accumulate cached partitions per
invocation.

``managed_persist(df, key)`` bounds that growth to ONE live frame per
call site: persisting under a key first unpersists whatever the same key
registered before.  Unpersisting a previous invocation's frame is always
safe — if a caller still holds the old DataFrame, its lineage simply
recomputes.  ``release()`` drops everything (the facade-level hook).
"""

from __future__ import annotations

import threading
from typing import TYPE_CHECKING

if TYPE_CHECKING:  # pragma: no cover
    from pyspark.sql import DataFrame

_LOCK = threading.Lock()
_LIVE: dict[str, "DataFrame"] = {}


def managed_persist(df: "DataFrame", key: str) -> "DataFrame":
    """Persist ``df`` under ``key``, releasing the frame the same call
    site persisted on its previous invocation."""
    with _LOCK:
        prev = _LIVE.pop(key, None)
        _LIVE[key] = df
    if prev is not None:
        try:
            prev.unpersist()
        except Exception:
            pass  # session already stopped — nothing to release
    return df.persist()


def release(key: str | None = None) -> None:
    """Unpersist one key's frame (or every registered frame)."""
    with _LOCK:
        items = [(key, _LIVE.pop(key))] if key in _LIVE else []
        if key is None:
            items = list(_LIVE.items())
            _LIVE.clear()
    for _, df in items:
        try:
            df.unpersist()
        except Exception:
            pass
