"""Concurrent-serving evidence (VERDICT r4 next #5; extended r7 per
VERDICT r6 next #6: sustained mixed load at 8/16/32 workers with a
latency histogram and cache-hit accounting, plus a concurrent
single-flight error-path check).

Drives SearchService from N driver threads (FAIR scheduler pool) over
a sustained mixed request stream (~25% duplicate keys, as real serving
traffic has) against a synthetic claims corpus, verifies every
response is bit-identical to serial execution, and prints one JSON
line: serial qps, then per worker level {qps, speedup, p50/p95/p99
overall and for cache misses only, cache hit ratio}.

Usage: python scripts/bench_concurrent.py
 [env: CONC_N_DOCS=50000, CONC_WORKER_SET=8,16,32, CONC_N_REQS=96,
  SPARK_GRAFT_CPUS]
"""

from __future__ import annotations

import json
import os
import random
import statistics
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def pct(vals: list[float], p: float) -> float:
    if not vals:
        return 0.0
    s = sorted(vals)
    i = min(len(s) - 1, max(0, int(round(p / 100.0 * (len(s) - 1)))))
    return round(s[i], 4)


def error_path_under_concurrency() -> dict:
    """Hammer one FAILING key from 32 threads: the single-flight cache
    must run ONE compute per error-TTL window, every caller must see
    the exception, and each raiser must get its own exception object
    (shared-traceback fix, ADVICE r6)."""
    from lighthouse_spark.api.service import QueryCache

    cache = QueryCache(ttl_seconds=300, error_ttl_seconds=0.5)
    computes = [0]
    lock = threading.Lock()

    def compute():
        with lock:
            computes[0] += 1
        raise RuntimeError("boom")

    seen_exc_ids: set[int] = set()
    raised = [0]

    def worker():
        for _ in range(20):
            try:
                cache.fetch("bad-key", compute)
            except RuntimeError as e:
                with lock:
                    raised[0] += 1
                    seen_exc_ids.add(id(e))

    threads = [threading.Thread(target=worker) for _ in range(32)]
    t0 = time.time()
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    wall = time.time() - t0
    # one compute per 0.5s error-TTL window (+1 for boundary raciness)
    max_computes = int(wall / 0.5) + 2
    return {
        "raised": raised[0],
        "expected_raised": 32 * 20,
        "computes": computes[0],
        "computes_bound": max_computes,
        "distinct_exception_objects": len(seen_exc_ids),
        "ok": raised[0] == 32 * 20
        and computes[0] <= max_computes
        and len(seen_exc_ids) > 1,  # followers get copies, not the one object
    }


def main() -> None:
    n_docs = int(os.environ.get("CONC_N_DOCS", "50000"))
    worker_set = [
        int(x) for x in os.environ.get("CONC_WORKER_SET", "8,16,32").split(",")
    ]
    n_reqs = int(os.environ.get("CONC_N_REQS", "96"))

    from lighthouse_spark import get_spark
    from lighthouse_spark.api.engine import SearchEngine
    from lighthouse_spark.api.request import SearchRequest
    from lighthouse_spark.api.service import SearchService
    from lighthouse_spark.plans.indexer import FieldSpec, build_index
    from lighthouse_spark.sources.claims import synthetic_claims

    spark = get_spark("conc-bench", extra_conf={"spark.scheduler.mode": "FAIR"})
    sc = spark.sparkContext
    claims = synthetic_claims(spark, n_docs).cache()
    idx = build_index(
        claims,
        "doc_id",
        {
            f: FieldSpec(f, positions=True)
            for f in ("name", "title", "description", "channel")
        },
        mode="simple",
    ).cache()
    idx.postings.count()
    engine = SearchEngine(idx)

    base = [
        "interesting and amazing facts",
        "crypto news",
        "music video",
        "daily podcast episode",
        "amazing stories",
        "channel update",
        "world politics",
        "gaming review",
        "cooking show",
        "travel vlog",
        "science explained",
        "funny moments",
        "crypto daily crypto",  # repeated token: MLT-active request
    ]
    # sustained mixed stream: deterministic 2-3 word combinations of the
    # base vocabulary, with ~25% duplicate keys (cache-hit traffic)
    pool = sorted({w for q in base for w in q.split()})
    rng = random.Random(7)
    uniq_qs = list(base)
    while len(uniq_qs) < max(1, int(n_reqs * 0.75)):
        q = " ".join(rng.sample(pool, rng.choice((2, 2, 3))))
        if q not in uniq_qs:
            uniq_qs.append(q)
    stream = list(uniq_qs)
    while len(stream) < n_reqs:
        stream.append(rng.choice(uniq_qs))
    rng.shuffle(stream)
    reqs = {q: SearchRequest(s=q, size=10) for q in uniq_qs}

    # warmup: one full pass (JVM/codegen/dictionary caches)
    warm = SearchService(engine)
    for q in uniq_qs:
        warm.search(reqs[q])

    # serial reference, fresh cache, SAME stream (same miss/hit mix as
    # each concurrent level — anything else skews the speedup ratio)
    svc_serial = SearchService(engine)
    t0 = time.time()
    serial_results = [svc_serial.search(reqs[q]) for q in stream]
    serial_s = time.time() - t0
    expected = dict(zip(stream, serial_results))
    out = {
        "metric": "concurrent_serving",
        "n_docs": n_docs,
        "n_queries": len(stream),
        "n_unique": len(uniq_qs),
        "serial_qps": round(len(stream) / serial_s, 3),
        "levels": [],
    }

    from concurrent.futures import ThreadPoolExecutor

    for workers in worker_set:
        svc = SearchService(engine)
        lat: list[tuple[str, float]] = []
        lock = threading.Lock()

        def one(q: str) -> list[dict]:
            sc.setLocalProperty("spark.scheduler.pool", "serving")
            try:
                t0 = time.time()
                r = svc.search(reqs[q])
                dt = time.time() - t0
                with lock:
                    lat.append((q, dt))
                return r
            finally:
                sc.setLocalProperty("spark.scheduler.pool", None)

        t0 = time.time()
        with ThreadPoolExecutor(max_workers=workers) as ex:
            results = list(ex.map(one, stream))
        wall = time.time() - t0
        identical = all(r == expected[q] for q, r in zip(stream, results))
        all_lat = [d for _, d in lat]
        # a duplicate key served from cache (or as a single-flight
        # follower) is a "hit" for histogram purposes; first-seen keys
        # are the misses that actually ran Spark jobs
        first_seen: set[str] = set()
        miss_lat = []
        for q, d in lat:
            if q not in first_seen:
                first_seen.add(q)
                miss_lat.append(d)
        out["levels"].append(
            {
                "workers": workers,
                "qps": round(len(stream) / wall, 3),
                "speedup_vs_serial": round(serial_s / wall, 3),
                "p50": pct(all_lat, 50),
                "p95": pct(all_lat, 95),
                "p99": pct(all_lat, 99),
                "p50_miss": pct(miss_lat, 50),
                "p95_miss": pct(miss_lat, 95),
                "p99_miss": pct(miss_lat, 99),
                "cache_hits": svc.cache.hits,
                "cache_misses": svc.cache.misses,
                "cache_hit_ratio": round(
                    svc.cache.hits / max(1, svc.cache.hits + svc.cache.misses), 3
                ),
                "results_identical": identical,
            }
        )
        assert identical, f"concurrent results diverge from serial at {workers}"

    out["error_path"] = error_path_under_concurrency()
    spark.stop()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
