"""Count Spark jobs dispatched per composite /search request.

VERDICT r6 next #2: composite latency at local scale is dominated by
multi-job dispatch, not compute — this probe records the job count so
the fusion work has a measured before/after. Run:

    python scripts/bench_jobs.py [n_claims]

Prints one JSON line: {"n_claims": N, "jobs_per_search": J,
"jobs_prefetch": P, "sec_warm": S, ...} for the flat-engine path and
the store-served path.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def jobs_in(spark, group: str, fn):
    sc = spark.sparkContext
    sc.setJobGroup(group, group)
    t0 = time.time()
    out = fn()
    dt = time.time() - t0
    sc.setJobGroup("idle", "idle")
    ids = spark.sparkContext.statusTracker().getJobIdsForGroup(group)
    return len(ids), dt, out


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 2000
    from lighthouse_spark import get_spark
    from lighthouse_spark.api.engine import SearchEngine
    from lighthouse_spark.api.request import SearchRequest
    from lighthouse_spark.plans.indexer import FieldSpec, build_index
    from lighthouse_spark.sources.claims import synthetic_claims

    spark = get_spark("bench-jobs", cpus=8, shuffle_partitions=8)
    claims = synthetic_claims(spark, n).cache()
    idx = build_index(
        claims,
        "doc_id",
        {k: FieldSpec(k, positions=True) for k in ("name", "title", "description", "channel")},
        "simple",
    ).cache()
    idx.postings.count()
    eng = SearchEngine(idx)
    req = SearchRequest(s="interesting and amazing facts", size=10)
    eng.search(SearchRequest(s="warmup query", size=5)).collect()
    eng.search(req).collect()  # warm plan caches

    out: dict = {"n_claims": n}
    # prefetch-only job count
    s = req.s
    terms = eng._terms(s)
    jp, tp, _ = jobs_in(spark, "probe_prefetch", lambda: eng._prefetch(s, terms))
    out["jobs_prefetch"] = jp
    out["sec_prefetch"] = round(tp, 3)
    best = (1 << 30, None)
    for i in range(3):
        j, dt, _ = jobs_in(spark, f"probe_search_{i}", lambda: eng.search(req).collect())
        best = min(best, (j, dt))
        out.setdefault("search_runs", []).append({"jobs": j, "sec": round(dt, 3)})
    out["jobs_per_search"] = best[0]
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
