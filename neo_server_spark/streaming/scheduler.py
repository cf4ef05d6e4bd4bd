"""Timer/subscriber scheduler (reference: mods/scheduler — cron TIMERs running
TQL scripts, sched_timer.go:16-60; MQTT/NATS SUBSCRIBERs running TQL or
appends per message, sched_subs.go:26-112).

Spark mapping: timers run registered jobs (any callable — typically a TQL
pipeline execution or a ``stream_append`` availableNow drain) on an interval
in a daemon thread; subscribers ARE availableNow streams (the broker dumps
messages to files/Kafka; each tick drains whatever arrived).  State mirrors
the reference's start/stop/state surface.
"""

from __future__ import annotations

import threading
import time
from collections.abc import Callable
from dataclasses import dataclass, field


@dataclass
class TimerEntry:
    name: str
    interval_sec: float
    job: Callable[[], object]
    last_run: float | None = None
    last_error: str | None = None
    run_count: int = 0
    state: str = "STOP"  # STOP | RUNNING — matches reference entry states
    _stop: threading.Event = field(default_factory=threading.Event)
    _thread: threading.Thread | None = None


class Scheduler:
    """Interval timers (cron-expression parsing reduced to fixed intervals —
    the reference's '@every 10s' style specs, sched_timer.go)."""

    def __init__(self):
        self._entries: dict[str, TimerEntry] = {}

    def add_timer(self, name: str, interval_sec: float, job: Callable[[], object],
                  start: bool = False) -> TimerEntry:
        entry = TimerEntry(name=name, interval_sec=interval_sec, job=job)
        self._entries[name] = entry
        if start:
            self.start(name)
        return entry

    def start(self, name: str) -> None:
        entry = self._entries[name]
        if entry.state == "RUNNING":
            return
        entry._stop.clear()
        entry.state = "RUNNING"

        def loop():
            while not entry._stop.wait(entry.interval_sec):
                self._fire(entry)

        entry._thread = threading.Thread(target=loop, daemon=True, name=f"timer-{name}")
        entry._thread.start()

    def _fire(self, entry: TimerEntry) -> None:
        try:
            entry.job()
            entry.last_error = None
        except Exception as e:  # job errors are recorded, not fatal
            entry.last_error = str(e)
        entry.last_run = time.time()
        entry.run_count += 1

    def trigger_now(self, name: str) -> None:
        """Run one tick synchronously (the reference's manual trigger)."""
        self._fire(self._entries[name])

    def stop(self, name: str) -> None:
        entry = self._entries[name]
        entry._stop.set()
        if entry._thread:
            entry._thread.join(timeout=5)
        entry.state = "STOP"

    def stop_all(self) -> None:
        for name in list(self._entries):
            self.stop(name)

    def remove(self, name: str) -> None:
        """Stop and drop an entry (the facility routers' DELETE verb)."""
        if name in self._entries:
            self.stop(name)
            del self._entries[name]

    def entries(self) -> list[dict]:
        """SHOW TIMERS equivalent."""
        return [
            {"name": e.name, "state": e.state, "interval_sec": e.interval_sec,
             "run_count": e.run_count, "last_error": e.last_error}
            for e in self._entries.values()
        ]
