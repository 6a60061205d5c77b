"""spark-submit entry point: build the compressed index over the
synthetic source-code corpus and run the BM25 WAND query set.

Usage (north_rule deployment shape — the same command at N and 4N
executors on a real cluster):

    python scripts/package_pyfiles.py              # -> dist/lighthouse_spark.zip
    spark-submit --master local[8]  --py-files dist/lighthouse_spark.zip \
        scripts/build_and_query_job.py --n-docs 20000 --out /tmp/idx8
    spark-submit --master local[32] --py-files dist/lighthouse_spark.zip \
        scripts/build_and_query_job.py --n-docs 20000 --out /tmp/idx32

Prints one JSON line with build/query timings and the top-k results
(for cross-run rank-identity checks).
"""

from __future__ import annotations

import argparse
import json
import time


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n-docs", type=int, default=20000)
    ap.add_argument("--out", required=True)
    ap.add_argument("--n-shards", type=int, default=32)
    ap.add_argument("--queries", default="the return license,sparklight,getUserName parseHttpRequest")
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    spark = SparkSession.builder.appName("lighthouse-build-query").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    from lighthouse_spark.functions.analysis import tokenize_text
    from lighthouse_spark.operators import wand
    from lighthouse_spark.plans.indexer import FieldSpec
    from lighthouse_spark.sources.corpus import synthetic_corpus
    from lighthouse_spark.sources.store import build_and_save

    docs = synthetic_corpus(spark, args.n_docs, partitions=128).cache()
    docs.count()
    t0 = time.time()
    ci = build_and_save(
        docs, "doc_id", {"content": FieldSpec("content")}, args.out,
        mode="code", n_shards=args.n_shards,
    )
    build_s = time.time() - t0

    results = {}
    t0 = time.time()
    for q in args.queries.split(","):
        rows = wand.wand_topk(ci, "content", tokenize_text(q, "code"), k=10).collect()
        results[q] = [(r["doc_id"], round(r["score"], 9)) for r in rows]
    query_s = time.time() - t0

    print(
        "JOB:" + json.dumps(
            {
                "n_docs": args.n_docs,
                "build_s": round(build_s, 2),
                "docs_per_sec": round(args.n_docs / build_s, 1),
                "query_s": round(query_s, 2),
                "results": results,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
