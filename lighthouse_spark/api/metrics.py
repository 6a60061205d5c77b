"""Query/job metrics (ref: /root/reference/app/internal/metrics/
metrics.go:10-55).

The reference registers four Prometheus collectors: SearchDuration
(histogram vec by type + term_count, observed at search.go:144-147),
AutoCompleteDuration (histogram), jobs (histogram vec by job name via
the Job() deferral helper) and JobLoad (gauge vec of active calls).
No Prometheus client ships in this environment, so these are the same
cumulative-bucket histograms as plain dicts, exported through
SearchService.status() — the data a scraper would read.
"""

from __future__ import annotations

import threading
import time

# prometheus.DefBuckets — the defaults the reference's collectors use
DEFAULT_BUCKETS = (0.005, 0.01, 0.025, 0.05, 0.1, 0.25, 0.5, 1.0, 2.5, 5.0, 10.0)

# Per-collector locks (matching the Prometheus client design):
# SearchService is called from multiple threads and sync() runs driver
# threads — unsynchronized read-modify-write would drop observations,
# and an unlocked snapshot() could tear mid-update or crash iterating
# a dict another thread is inserting into. Locks are per instance so
# unrelated collectors never contend on the hot search path.


class Histogram:
    """Cumulative-bucket histogram: counts per upper bound + sum/count."""

    def __init__(self, buckets: tuple[float, ...] = DEFAULT_BUCKETS):
        self.bounds = tuple(buckets)
        self.bucket_counts = [0] * (len(self.bounds) + 1)  # +Inf tail
        self.sum = 0.0
        self.count = 0
        self._lock = threading.Lock()

    def observe(self, value: float) -> None:
        with self._lock:
            self.sum += value
            self.count += 1
            for i, b in enumerate(self.bounds):
                if value <= b:
                    self.bucket_counts[i] += 1
                    return
            self.bucket_counts[-1] += 1

    def snapshot(self) -> dict:
        with self._lock:
            counts = list(self.bucket_counts)
            total, s = self.count, self.sum
        out = {}
        cum = 0
        for b, n in zip(self.bounds, counts):
            cum += n
            out[str(b)] = cum
        out["+Inf"] = total
        return {"count": total, "sum": round(s, 6), "buckets": out}


class HistogramVec:
    """Labelled histograms, auto-created per label values."""

    def __init__(self, labels: tuple[str, ...], buckets: tuple[float, ...] = DEFAULT_BUCKETS):
        self.labels = labels
        self.buckets = buckets
        self._h: dict[tuple[str, ...], Histogram] = {}
        self._lock = threading.Lock()

    def with_labels(self, *values: str) -> Histogram:
        key = tuple(str(v) for v in values)
        with self._lock:
            if key not in self._h:
                self._h[key] = Histogram(self.buckets)
            return self._h[key]

    def snapshot(self) -> dict:
        with self._lock:
            items = sorted(self._h.items())  # stable view of the key set
        return {"|".join(k): h.snapshot() for k, h in items}


class GaugeVec:
    def __init__(self, labels: tuple[str, ...]):
        self.labels = labels
        self._g: dict[tuple[str, ...], int] = {}
        self._lock = threading.Lock()

    def inc(self, *values: str) -> None:
        key = tuple(str(v) for v in values)
        with self._lock:
            self._g[key] = self._g.get(key, 0) + 1

    def dec(self, *values: str) -> None:
        key = tuple(str(v) for v in values)
        with self._lock:
            self._g[key] = self._g.get(key, 0) - 1

    def snapshot(self) -> dict:
        with self._lock:
            return {"|".join(k): v for k, v in sorted(self._g.items())}


# module-level registry — mirrors the Go promauto globals
SearchDuration = HistogramVec(("type", "term_count"))     # metrics.go:20-25
AutoCompleteDuration = Histogram()                        # metrics.go:28-33
Jobs = HistogramVec(("job",))                             # metrics.go:35-40
JobLoad = GaugeVec(("job",))                              # metrics.go:43-48


def job(start: float, name: str) -> None:
    """metrics.Job (metrics.go:51-55): one-line job-duration deferral."""
    Jobs.with_labels(name).observe(time.time() - start)


def snapshot() -> dict:
    return {
        "search_duration": SearchDuration.snapshot(),
        "auto_complete_duration": AutoCompleteDuration.snapshot(),
        "jobs": Jobs.snapshot(),
        "job_load": JobLoad.snapshot(),
    }
