"""Sloppy-phrase worst-case measurement (VERDICT r4 next #6).

`lucene_sloppy_freq` runs per-candidate-doc Python inside an
Arrow-batched pandas UDF. The worst case is a slop-5 phrase of two
STOPWORD-frequency terms over a large corpus: nearly every doc is a
candidate and every doc carries long position arrays, so the kernel's
per-doc cost is maximal and paid corpus-wide. This script quantifies
that case at 200k docs against two baselines on the same corpus: the
exact (slop=0) JVM-HOF phrase and the greedy-window JVM expression.

Prints one JSON line; paste the row into BASELINE.md.

Usage: python scripts/bench_sloppy.py  [env: SLOPPY_N_DOCS=200000]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    n_docs = int(os.environ.get("SLOPPY_N_DOCS", "200000"))

    from pyspark.sql import functions as F

    from lighthouse_spark import get_spark
    from lighthouse_spark.operators import search
    from lighthouse_spark.plans.indexer import FieldSpec, build_index
    from lighthouse_spark.sources.corpus import synthetic_corpus

    spark = get_spark("sloppy-bench")
    docs = synthetic_corpus(spark, n_docs, partitions=128).cache()
    docs.count()
    idx = build_index(
        docs, "doc_id", {"content": FieldSpec("content", positions=True)},
        mode="code", cache_agg=True,
    )
    idx.postings.persist().count()

    # two stopword-frequency code terms (df close to corpus size)
    stats = (
        idx.term_stats.orderBy(F.desc("df")).limit(5).collect()
    )
    t1, t2 = stats[0]["term"], stats[1]["term"]
    out = {
        "metric": "sloppy_phrase_worst_case",
        "n_docs": n_docs,
        "terms": [t1, t2],
        "dfs": [int(stats[0]["df"]), int(stats[1]["df"])],
    }

    def timed(name, fn):
        fn()  # warmup
        best = float("inf")
        for _ in range(2):
            t0 = time.time()
            n = fn()
            best = min(best, time.time() - t0)
        out[name] = {"sec": round(best, 3), "matching_docs": n}

    timed(
        "exact_slop0_jvm",
        lambda: search.phrase(idx, "content", [t1, t2], slop=0).count(),
    )
    timed(
        "window_slop5_jvm",
        lambda: search.phrase(
            idx, "content", [t1, t2], slop=5, slop_mode="window"
        ).count(),
    )
    timed(
        "lucene_slop5_python",
        lambda: search.phrase(idx, "content", [t1, t2], slop=5).count(),
    )
    out["lucene_vs_window_ratio"] = round(
        out["lucene_slop5_python"]["sec"] / out["window_slop5_jvm"]["sec"], 2
    )
    spark.stop()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
