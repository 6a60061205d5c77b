"""Trigram-index vs full-scan crossover in the DISK-RESIDENT regime
(VERDICT r4 next #2 / missing #1).

The r4 A/B was honest but memory-resident: with the whole corpus cached
in executor memory, a 32-way ``contains()`` scan beat the index on
present needles, and the "index pays off when corpus text >> memory"
claim carried no measured number. This script measures that claim's
regime on this box:

- a ≥1M-doc code corpus is WRITTEN TO PARQUET and never cached — every
  full scan pays read + decompress + parse of the whole text column,
  exactly what a 100 TB scan pays per query (modulo the disk itself;
  the OS page cache stands in for fast storage, but the parse cost —
  the dominant CPU term — is paid in full);
- the trigram index is PERSISTED to its pfx-partitioned layout and read
  back — queries touch only the pruned gram partitions + the candidate
  verify, the serving path;
- A/B per needle class (selective / dense / absent), interleaved
  best-of-2, fresh timings after an untimed warmup of each plan shape.

Prints one JSON line; paste the table into BASELINE.md.

Usage: python scripts/bench_trigram_crossover.py
Env: CROSS_N_DOCS (default 1_000_000), SPARK_GRAFT_CPUS.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def drop_page_cache(*roots: str) -> None:
    """Evict every parquet byte under `roots` from the OS page cache
    (sync first so dirty pages become droppable). With CROSS_COLD=1
    this runs before EVERY timed query, so each scan/index read pays
    real block-device IO — the r5 crossover table's honest gap was
    that every corpus fit in page cache (VERDICT r5 next #8)."""
    os.sync()
    for root in roots:
        for dp, _, fs in os.walk(root):
            for f in fs:
                fd = os.open(os.path.join(dp, f), os.O_RDONLY)
                try:
                    os.posix_fadvise(fd, 0, 0, os.POSIX_FADV_DONTNEED)
                finally:
                    os.close(fd)


def main() -> None:
    n_docs = int(os.environ.get("CROSS_N_DOCS", "1000000"))
    rich = os.environ.get("CROSS_RICH", "0") == "1"
    cold = os.environ.get("CROSS_COLD", "0") == "1"

    from lighthouse_spark import get_spark
    from lighthouse_spark.operators import trigram
    from lighthouse_spark.sources.corpus import synthetic_corpus

    spark = get_spark("trigram-crossover")
    # CROSS_WORKDIR makes the ~27-min 500k-rich build resumable: corpus
    # and index persist there and are reused when already complete, so
    # a killed run only repeats the cheap query phase.
    workdir = os.environ.get("CROSS_WORKDIR", "")
    work = workdir or tempfile.mkdtemp(prefix="tri_cross_")
    if workdir:
        os.makedirs(work, exist_ok=True)
    out: dict = {
        "metric": "trigram_crossover", "n_docs": n_docs, "rich": rich,
        "cold_io": cold,
    }
    try:
        # ---- materialize the corpus on disk (not timed), ID-SORTED
        # (repartitionByRange + sortWithinPartitions on doc_id — the
        # same physical layout the store's docs_sort_col keeps), so the
        # candidate-driven IN-filter fetch can prune row groups by
        # doc_id min/max stats ----
        corpus_path = f"{work}/docs"
        done_marker = f"{work}/BUILD_DONE"
        if not os.path.exists(done_marker):
            synthetic_corpus(
                spark, n_docs, partitions=256, rich_identifiers=rich
            ).repartitionByRange(256, "doc_id").sortWithinPartitions(
                "doc_id"
            ).write.mode("overwrite").parquet(corpus_path)
        docs = spark.read.parquet(corpus_path)
        sz = sum(
            os.path.getsize(os.path.join(dp, f))
            for dp, _, fs in os.walk(corpus_path)
            for f in fs
        )
        out["corpus_parquet_mb"] = round(sz / 1e6, 1)

        # ---- build + persist the index (timed once, amortized) ----
        if not os.path.exists(done_marker):
            t0 = time.time()
            post, _stats = trigram.build_trigram_index(docs, "doc_id", "content")
            trigram.save_trigram_index(post, f"{work}/tri", "doc_id")
            out["index_build_save_sec"] = round(time.time() - t0, 3)
            with open(done_marker, "w") as fh:
                fh.write(str(n_docs))
        else:
            out["index_build_save_sec"] = None  # reused prior build
        isz = sum(
            os.path.getsize(os.path.join(dp, f))
            for dp, _, fs in os.walk(f"{work}/tri")
            for f in fs
        )
        out["index_parquet_mb"] = round(isz / 1e6, 1)
        tri = trigram.load_trigram_index(spark, f"{work}/tri", "doc_id")

        # needle classes over the synthetic code corpus vocabulary:
        # selective = the rarest Zipf-tail identifier (~0.1% of docs);
        # common = a frequent identifier (~80% of docs); dense = a
        # stopword (~100%); absent = no gram hits (df=0 short-circuit)
        needles = {
            "selective": "sym1999",
            "common": "parsehttprequest",
            "dense": "return",
            "absent": "zqxjkwvqq",
        }
        if rich:
            # the selective class of REAL code search: a locally-unique
            # identifier (variable/hash) — pull one from an actual doc
            row = docs.limit(1).collect()[0]
            uid = next(t for t in row["content"].split(" ") if t.startswith("uid"))
            needles["selective"] = uid
        # untimed warmup of both plan shapes (JVM + codegen)
        trigram.substring_search(docs, "doc_id", "content", "license", tri).count()
        trigram.substring_search(docs, "doc_id", "content", "license", None).count()

        spark.catalog.clearCache()
        cache_roots = (corpus_path, f"{work}/tri")
        for cls, needle in needles.items():
            idx_t, scan_t = float("inf"), float("inf")
            hits = None
            for _ in range(2):  # interleaved best-of-2
                if cold:
                    drop_page_cache(*cache_roots)
                t0 = time.time()
                hits = trigram.substring_search(
                    docs, "doc_id", "content", needle, tri,
                    fetch_ids_max=trigram._FETCH_IDS_MAX,
                ).count()
                idx_t = min(idx_t, time.time() - t0)
                if cold:
                    drop_page_cache(*cache_roots)
                t0 = time.time()
                scan_hits = trigram.substring_search(
                    docs, "doc_id", "content", needle, None
                ).count()
                scan_t = min(scan_t, time.time() - t0)
                assert scan_hits == hits, (cls, scan_hits, hits)
            out[cls] = {
                "needle": needle,
                "hits": hits,
                "index_sec": round(idx_t, 3),
                "fullscan_sec": round(scan_t, 3),
                "speedup": round(scan_t / idx_t, 2),
            }
    finally:
        spark.stop()
        if not workdir:  # persistent workdirs are caller-managed
            shutil.rmtree(work, ignore_errors=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
