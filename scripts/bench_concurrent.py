"""Concurrent-serving throughput evidence (VERDICT r4 next #5).

Drives SearchService from N driver threads (FAIR scheduler pool) over a
mixed query set against a synthetic claims corpus, verifies the results
are identical to serial execution, and prints one JSON line with serial
q/s, concurrent q/s, and the speedup. A real deployment serves many
clients against one SparkSession; this measures that path on this box.

Usage: python scripts/bench_concurrent.py  [env: CONC_N_DOCS=50000,
CONC_WORKERS=8, SPARK_GRAFT_CPUS]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    n_docs = int(os.environ.get("CONC_N_DOCS", "50000"))
    workers = int(os.environ.get("CONC_WORKERS", "8"))

    from lighthouse_spark import get_spark
    from lighthouse_spark.api.engine import SearchEngine
    from lighthouse_spark.api.request import SearchRequest
    from lighthouse_spark.api.service import SearchService
    from lighthouse_spark.plans.indexer import FieldSpec, build_index
    from lighthouse_spark.sources.claims import synthetic_claims

    spark = get_spark(
        "conc-bench", extra_conf={"spark.scheduler.mode": "FAIR"}
    )
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

    qset = [
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
        "crypto daily crypto",   # repeated token: MLT-active request
    ]
    reqs = [SearchRequest(s=q, size=10) for q in qset]

    # warmup: one full pass (JVM/codegen/dictionary caches)
    warm = SearchService(engine)
    for r in reqs:
        warm.search(r)

    # serial, cold cache: steady-state one-at-a-time serving
    svc_serial = SearchService(engine)
    t0 = time.time()
    serial_out = [svc_serial.search(r) for r in reqs]
    serial_s = time.time() - t0

    # concurrent, cold cache: N driver threads, FAIR pool
    svc_conc = SearchService(engine)
    t0 = time.time()
    conc_out = svc_conc.search_many(reqs, max_workers=workers)
    conc_s = time.time() - t0

    assert conc_out == serial_out, "concurrent results diverge from serial"
    spark.stop()
    print(
        json.dumps(
            {
                "metric": "concurrent_serving",
                "n_docs": n_docs,
                "n_queries": len(reqs),
                "workers": workers,
                "serial_qps": round(len(reqs) / serial_s, 3),
                "concurrent_qps": round(len(reqs) / conc_s, 3),
                "speedup": round(serial_s / conc_s, 3),
                "results_identical": True,
            }
        )
    )


if __name__ == "__main__":
    main()
