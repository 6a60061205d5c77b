"""Extra isolation benchmarks (guide §1.4) — NOT the driver's bench.

Each stage of the hot paths timed with the noop sink so the sink/write
cost never pollutes the number. Usage:

    python bench_extra.py [section ...]

Sections: build (index-build stage breakdown), serve (per-query
serving latency with job counts). Defaults to all.
Env: SPARK_GRAFT_CPUS, SPARK_GRAFT_BIG_TIER (default 200000).
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time


def noop(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    sections = sys.argv[1:] or ["build", "serve"]
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "0")) or (os.cpu_count() or 8)
    big_n = int(os.environ.get("SPARK_GRAFT_BIG_TIER", "200000"))

    from lighthouse_spark import get_spark
    from lighthouse_spark.plans.indexer import FieldSpec, build_index
    from lighthouse_spark.sources.corpus import synthetic_corpus
    from lighthouse_spark.sources.store import build_and_save

    spark = get_spark("lighthouse-bench-extra", cpus=cpus, shuffle_partitions=cpus)
    sc = spark.sparkContext
    out: dict[str, float] = {}

    def timed(key: str, fn) -> None:
        sc.setJobDescription(key)
        t0 = time.time()
        fn()
        out[key] = round(time.time() - t0, 3)
        sc.setJobDescription(None)
        print(f"{key:40s} {out[key]:8.3f}s", flush=True)

    big = synthetic_corpus(spark, big_n, partitions=4 * cpus).cache()
    big.count()

    if "build" in sections:
        # stage 1: tokenize + per-doc aggregate (the Python boundary)
        idx = build_index(
            big, "doc_id", {"content": FieldSpec("content", positions=True)},
            "code", cache_agg=True,
        )
        timed("build.tokenize_agg_noop", lambda: noop(idx._intermediates[0]))
        idx.unpersist_intermediates()

        # stage 2: tokenize + explode to flat postings (adds the explode)
        idx2 = build_index(
            big, "doc_id", {"content": FieldSpec("content", positions=True)},
            "code",
        )
        timed("build.tokenize_explode_noop", lambda: noop(idx2.postings))

        # full store build (tokenize + encode + writes)
        workdir = tempfile.mkdtemp(prefix="bench_extra_")
        timed(
            "build.build_and_save",
            lambda: build_and_save(
                big, "doc_id", {"content": FieldSpec("content", positions=True)},
                f"{workdir}/idx", mode="code", n_shards=2 * cpus,
            ),
        )
        import shutil

        shutil.rmtree(workdir, ignore_errors=True)

    if "serve" in sections:
        from lighthouse_spark.api.autocomplete import autocomplete
        from lighthouse_spark.api.engine import SearchEngine
        from lighthouse_spark.api.request import AutoCompleteRequest, SearchRequest
        from lighthouse_spark.sources.claims import synthetic_claims

        claims = synthetic_claims(spark, big_n).cache()
        cidx = build_index(
            claims, "doc_id",
            {k: FieldSpec(k, positions=True)
             for k in ("name", "title", "description", "channel")},
            "simple",
        ).cache()
        cidx.postings.count()
        eng = SearchEngine(cidx)
        eng.search(SearchRequest(s="warmup query", size=5)).collect()

        def jobs_and_time(key, fn, reps=3):
            tracker = sc.statusTracker()
            before_ids = tracker.getJobIdsForGroup(None) or []
            best = float("inf")
            for _ in range(reps):
                t0 = time.time()
                fn()
                best = min(best, time.time() - t0)
            after_ids = tracker.getJobIdsForGroup(None) or []
            out[key] = round(best, 3)
            out[key + ".jobs"] = (len(after_ids) - len(before_ids)) / reps
            print(f"{key:40s} {best:8.3f}s  jobs/req={out[key + '.jobs']:.1f}", flush=True)

        jobs_and_time(
            "serve.composite",
            lambda: eng.search(
                SearchRequest(s="interesting and amazing facts", size=10)
            ).collect(),
        )
        autocomplete(cidx, AutoCompleteRequest(s="warm up", size=5)).collect()
        jobs_and_time(
            "serve.autocomplete",
            lambda: autocomplete(
                cidx, AutoCompleteRequest(s="interesting am", size=10)
            ).collect(),
        )

    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
