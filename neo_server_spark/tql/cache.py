"""TQL result cache — TTL cache with preemptive refresh.

Reference: mods/tql/tqlcache.go:21-70 (LRU+TTL over rendered TQL results,
checked before execution in task.go:393-418) and the preemptive-refresh
path that re-runs the script shortly before expiry so hot endpoints never
see a cold cache.

Spark shape: we cache the *collected, rendered* result (small API payloads),
never DataFrames — a DataFrame handle is already lazy/cheap, and caching
row data driver-side for big results would fight the executors' own
storage.  For large intermediate reuse, Spark-native ``df.persist()`` /
``localCheckpoint`` is the right tool instead.
"""

from __future__ import annotations

import threading
import time
from collections import OrderedDict
from collections.abc import Callable
from dataclasses import dataclass, field


@dataclass
class _Entry:
    value: object
    expires_at: float
    ttl: float
    hits: int = 0
    lock: threading.Lock = field(default_factory=threading.Lock)


class ResultCache:
    """TTL + LRU result cache with optional preemptive refresh.

    ``get_or_compute(key, ttl, producer)`` returns the cached value when
    fresh; recomputes (once, under a per-key lock) when missing/expired.
    When ``refresh_factor`` < 1 and a hit lands after ``ttl*refresh_factor``
    of the entry's life, the value is refreshed in a background thread while
    the caller still gets the (valid) cached value — the reference's
    preemptive refresh.
    """

    def __init__(self, capacity: int = 256, refresh_factor: float = 0.8):
        self.capacity = capacity
        self.refresh_factor = refresh_factor
        self._data: OrderedDict[str, _Entry] = OrderedDict()
        self._lock = threading.Lock()
        self.stats = {"hits": 0, "misses": 0, "refreshes": 0}

    def get_or_compute(self, key: str, ttl: float, producer: Callable[[], object]):
        now = time.time()
        with self._lock:
            ent = self._data.get(key)
            if ent is not None and now < ent.expires_at:
                self._data.move_to_end(key)
                ent.hits += 1
                self.stats["hits"] += 1
                needs_refresh = (
                    self.refresh_factor < 1.0
                    and now > ent.expires_at - ent.ttl * (1.0 - self.refresh_factor)
                )
                value = ent.value
            else:
                needs_refresh = False
                value = None
                self.stats["misses"] += 1

        if value is not None:
            if needs_refresh:
                self.stats["refreshes"] += 1
                threading.Thread(
                    target=self._refresh, args=(key, ttl, producer), daemon=True
                ).start()
            return value

        fresh = producer()
        self._put(key, fresh, ttl)
        return fresh

    def _refresh(self, key: str, ttl: float, producer: Callable[[], object]) -> None:
        try:
            self._put(key, producer(), ttl)
        except Exception:
            pass  # stale-but-valid beats a background crash

    def _put(self, key: str, value: object, ttl: float) -> None:
        with self._lock:
            self._data[key] = _Entry(value=value, expires_at=time.time() + ttl, ttl=ttl)
            self._data.move_to_end(key)
            while len(self._data) > self.capacity:
                self._data.popitem(last=False)

    def invalidate(self, key: str | None = None) -> None:
        with self._lock:
            if key is None:
                self._data.clear()
            else:
                self._data.pop(key, None)


#: process-wide default instance (the reference keeps one per server)
default_cache = ResultCache()
