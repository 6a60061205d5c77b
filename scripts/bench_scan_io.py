"""Quantify the full-scan's IO term: cold-vs-warm A/B with measured
device bytes (VERDICT r5 next #8, completing the crossover story).

The r6 cold-IO crossover run showed cold ≈ warm at a 1.1 GB corpus —
on this box's NVMe (~1.2 GB/s sequential) the eviction is real but the
read overlaps the 32-thread parquet parse, so the scan stays
parse-bound. This script makes that a measured statement instead of a
guess: every timed scan brackets /proc/diskstats (sectors read on the
backing device), so each row carries (wall_sec, device_gb_read,
implied io_sec = bytes / measured_seq_bw) for both cache regimes, at
the base corpus size and an 8x replicated one (~9 GB), where the IO
term's share is as large as this hardware lets it get.

Usage: python scripts/bench_scan_io.py <corpus_parquet_dir>
Env: SCANIO_REPL (default 8), SCANIO_DEV (default vda),
     SCANIO_WORK (replica dir; default a temp dir).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench_trigram_crossover import drop_page_cache  # noqa: E402


def device_bytes_read(dev: str) -> int:
    with open("/proc/diskstats") as fh:
        for line in fh:
            f = line.split()
            if f[2] == dev:
                return int(f[5]) * 512  # sectors read * 512
    raise RuntimeError(f"device {dev} not in /proc/diskstats")


def timed_scan(docs, needle: str, dev: str) -> dict:
    b0 = device_bytes_read(dev)
    t0 = time.time()
    hits = docs.where(docs.content.contains(needle)).count()
    wall = time.time() - t0
    gb = (device_bytes_read(dev) - b0) / 1e9
    return {"hits": hits, "wall_sec": round(wall, 3),
            "device_gb_read": round(gb, 2)}


def main() -> None:
    corpus = sys.argv[1]
    repl = int(os.environ.get("SCANIO_REPL", "8"))
    dev = os.environ.get("SCANIO_DEV", "vda")

    from pyspark.sql import functions as F

    from lighthouse_spark import get_spark

    spark = get_spark("scan-io")
    out: dict = {"metric": "scan_io_share", "device": dev}
    work = os.environ.get("SCANIO_WORK") or tempfile.mkdtemp(prefix="scan_io_")
    big_path = f"{work}/docs_x{repl}"
    try:
        docs = spark.read.parquet(corpus)
        sz = sum(os.path.getsize(os.path.join(dp, f))
                 for dp, _, fs in os.walk(corpus) for f in fs)
        out["base_parquet_gb"] = round(sz / 1e9, 2)

        if not os.path.exists(f"{big_path}/_SUCCESS"):
            # id-perturbed replicas (xor — doc_ids are full 64-bit
            # hashes, addition overflows): same text bytes, distinct
            # ids, so the scan parses `repl`x the corpus
            reps = [docs.withColumn(
                "doc_id", F.col("doc_id").bitwiseXOR(
                    F.lit(int(k) * 1315423911)))
                for k in range(repl)]
            u = reps[0]
            for r in reps[1:]:
                u = u.unionByName(r)
            u.write.mode("overwrite").parquet(big_path)
        big = spark.read.parquet(big_path)
        bsz = sum(os.path.getsize(os.path.join(dp, f))
                  for dp, _, fs in os.walk(big_path) for f in fs)
        out["big_parquet_gb"] = round(bsz / 1e9, 2)

        needle = "parsehttprequest"
        for label, frame, root in (("base", docs, corpus),
                                   ("big", big, big_path)):
            frame.where(frame.content.contains(needle)).count()  # warmup
            warm = min((timed_scan(frame, needle, dev) for _ in range(2)),
                       key=lambda r: r["wall_sec"])
            colds = []
            for _ in range(2):
                drop_page_cache(root)
                colds.append(timed_scan(frame, needle, dev))
            cold = min(colds, key=lambda r: r["wall_sec"])
            out[label] = {"warm": warm, "cold": cold}
    finally:
        spark.stop()
        if not os.environ.get("SCANIO_WORK"):
            shutil.rmtree(work, ignore_errors=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
