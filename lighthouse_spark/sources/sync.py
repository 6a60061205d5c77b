"""Incremental sync: checkpointed upsert/delete into a live index.

The reference's chainquery sync job re-expressed for the compressed
store (ref: /root/reference/app/jobs/chainquery/chainquery.go:76-166):

- **cursor semantics** (chainquery.go:67-68 `id > ? AND modified_at
  >= ?`): `plan_batch` filters the source table by the checkpointed
  cursor — in Spark this is one predicate-pushed scan, no keyset
  pagination loop needed; the 1000/5000-row batching of the reference
  exists only because it streams row-by-row over a MySQL wire.
- **routing** (chainquery.go:127-131): rows with bid_state in
  {Spent, Expired} become deletes, everything else upserts — exactly
  the reference's predicate-routed sink (SURVEY.md P13).
- **upsert by doc id** (claim.go:142-157 `_id`=claimId): MERGE
  semantics = docs-table rewrite (anti-join + union) + posting DELTA
  build for the affected docs + tombstoning their dead base postings.
  Lucene does the same thing with segment tombstones; compaction
  (below) is our segment merge.
- **checkpoint** (syncstate.json, chainquery.go:168-207): SyncState
  JSON with last_id / last_sync_time + the manifest lineage.

Statistics stay EXACT across increments: n_docs and total_dl are
maintained by integer bookkeeping (removed docs' dl read from
doc_stats), and df is computed per-query from live postings while
deltas exist (store.df_map). Block-max bounds stay safe under avgdl
drift via the enc_avgdl rescale in the WAND kernel. Consequently
query results between compactions are IDENTICAL to a full rebuild —
pinned by tests/test_sync.py.

At 10^12-doc scale the docs rewrite becomes an Iceberg MERGE INTO
(file-level rewrite of matched files only); the delta/tombstone/
compaction mechanics are unchanged.
"""

from __future__ import annotations

import json
import os
import time
import uuid
from dataclasses import asdict, dataclass

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from lighthouse_spark.plans.indexer import FieldSpec, build_index
from lighthouse_spark.sources import store as store_mod
from lighthouse_spark.sources.store import CompressedIndex, POSTING_SCHEMA, _commit


@dataclass
class SyncState:
    """syncstate.json analogue (chainquery.go:20-24, 168-207)."""

    last_id: int = 0
    last_sync_unix: int = 0
    started_unix: int = 0

    @classmethod
    def load(cls, path: str) -> "SyncState":
        if os.path.exists(path):
            with open(path) as f:
                return cls(**json.load(f))
        return cls()

    def save(self, path: str) -> None:
        tmp = path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(asdict(self), f)
        os.replace(tmp, path)


def plan_batch(source: DataFrame, state: SyncState, id_col: str, modified_col: str) -> DataFrame:
    """The incremental scan (chainquery.go:32-73): everything new or
    re-modified since the checkpoint. Predicate pushes to the source
    scan; partition pruning applies if the source is partitioned on
    the modified column."""
    return source.filter(
        (F.col(id_col) > state.last_id)
        | (F.col(modified_col) >= F.lit(state.last_sync_unix))
    )


def route_batch(batch: DataFrame, bid_state_col: str = "bid_state") -> tuple[DataFrame, DataFrame]:
    """(upserts, deletes) per chainquery.go:127-131."""
    is_dead = F.col(bid_state_col).isin("Spent", "Expired")
    return batch.filter(~is_dead), batch.filter(is_dead)


def _affected_ids(cindex: CompressedIndex, ids_df: DataFrame) -> list[int]:
    rows = ids_df.select("doc_id").distinct().collect()
    return sorted(int(r["doc_id"]) for r in rows)


def apply_incremental(
    cindex: CompressedIndex,
    upserts: DataFrame | None = None,
    delete_ids: DataFrame | None = None,
) -> CompressedIndex:
    """MERGE a batch into the live index (S6-S8 analogue).

    upserts: full new doc rows (same schema as docs). delete_ids: a
    one-column `doc_id` frame. Existing versions of upserted docs and
    all deleted docs are tombstoned; new postings land in a delta
    snapshot dir; exact corpus bookkeeping updates the manifest.
    """
    spark = cindex.spark
    man = dict(cindex.manifest)
    t0 = time.time()
    snap = uuid.uuid4().hex[:12]
    id_col = man["doc_id_col"]
    fields = {
        k: FieldSpec(v["column"], v["positions"]) for k, v in man["fields"].items()
    }

    affected = []
    if upserts is not None:
        affected.append(upserts.select(F.col(id_col).alias("doc_id")))
    if delete_ids is not None:
        affected.append(delete_ids.select(F.col("doc_id")))
    if not affected:
        return cindex
    aff = affected[0]
    for a in affected[1:]:
        aff = aff.unionByName(a)
    aff = aff.distinct()

    docs = cindex.docs
    # exact bookkeeping: lengths of docs being removed/replaced that
    # previously existed (tombstoned only if they had postings), split
    # BY SOURCE SNAPSHOT (per-segment live-docs semantics: a re-upsert
    # must kill the old version in whichever source holds it, without
    # touching the new delta)
    old_by_snap: dict[str, set[int]] = {}
    prev_tombs = man.get("tombstones", {})
    if isinstance(prev_tombs, list):
        prev_tombs = {"base": prev_tombs}
    sources = [("base", cindex.dir_of("doc_stats"))] + [
        (s, f"{cindex.path}/doc_stats_delta/{s}") for s in man.get("deltas", [])
    ]
    removed = []
    for sname, spath in sources:
        ds = spark.read.parquet(spath).join(aff, "doc_id", "left_semi")
        # a source's doc_stats keeps rows for docs already dead there —
        # exclude them or their dl would be subtracted twice
        dead = prev_tombs.get(sname, [])
        if dead:
            ds = ds.filter(~F.col("doc_id").isin([int(x) for x in dead]))
        rows = ds.groupBy("field").agg(
            F.count("*").alias("n"), F.sum("dl").alias("dl")
        ).collect()
        removed.extend(rows)
        ids = {int(r["doc_id"]) for r in ds.select("doc_id").distinct().collect()}
        if ids:
            old_by_snap[sname] = ids
    old_ids = set().union(*old_by_snap.values()) if old_by_snap else set()

    # docs table rewrite into a NEW versioned dir (Iceberg MERGE INTO
    # at real scale); the manifest pointer flips at commit — readers
    # and cached plans of the old version stay valid
    new_docs = docs.join(aff, docs[id_col] == aff["doc_id"], "left_anti")
    if upserts is not None:
        new_docs = new_docs.unionByName(upserts.select(docs.columns))
    new_docs_dir = f"docs_v_{snap}"
    new_docs.write.mode("overwrite").parquet(f"{cindex.path}/{new_docs_dir}")
    n_docs_total = spark.read.parquet(f"{cindex.path}/{new_docs_dir}").count()

    # delta postings for upserted docs
    added = []
    if upserts is not None and upserts.limit(1).count() > 0:
        delta_idx = build_index(upserts, id_col, fields, man["analyzer_mode"])
        avgdl_now = {
            f: (v["total_dl"] / v["n_docs"] if v["n_docs"] else 1.0)
            for f, v in man["corpus"].items()
        }
        p = delta_idx.postings.withColumn(
            "shard", F.pmod(F.xxhash64("doc_id"), F.lit(man["n_shards"])).cast("int")
        )
        if "positions" not in delta_idx.postings.columns:
            p = p.withColumn("positions", F.lit(None).cast("array<int>"))
        bs = man["block_size"]

        def enc(pdf: pd.DataFrame) -> pd.DataFrame:
            return store_mod._encode_group(pdf, bs, avgdl_now)

        blocks = p.groupBy("shard", "field").applyInPandas(enc, POSTING_SCHEMA)
        blocks.write.mode("overwrite").parquet(f"{cindex.path}/postings_delta/{snap}")
        delta_idx.doc_stats.write.mode("overwrite").parquet(
            f"{cindex.path}/doc_stats_delta/{snap}"
        )
        added = delta_idx.doc_stats.groupBy("field").agg(
            F.count("*").alias("n"), F.sum("dl").alias("dl")
        ).collect()

    # manifest bookkeeping
    for r in removed:
        c = man["corpus"][r["field"]]
        c["n_docs"] -= int(r["n"])
        c["total_dl"] -= int(r["dl"])
    for r in added:
        c = man["corpus"][r["field"]]
        c["n_docs"] += int(r["n"])
        c["total_dl"] += int(r["dl"])
    man.setdefault("dirs", {k: k for k in ("docs", "doc_stats", "term_stats", "postings")})
    man["dirs"] = {**man["dirs"], "docs": new_docs_dir}
    tombs = prev_tombs
    for sname, ids in old_by_snap.items():
        tombs[sname] = sorted(set(tombs.get(sname, [])) | ids)
    man["tombstones"] = tombs
    if added:
        man["deltas"] = man.get("deltas", []) + [snap]
    man["metrics"]["n_docs"] = n_docs_total
    man.setdefault("lineage", []).append(
        {
            "snapshot": snap,
            "op": "incremental",
            "upserts": int(upserts.count()) if upserts is not None else 0,
            "deletes": int(delete_ids.count()) if delete_ids is not None else 0,
            "tombstoned": len(old_ids),
            "wall_seconds": round(time.time() - t0, 3),
        }
    )
    _commit(cindex.path, man)
    cindex.manifest = man
    return cindex


def compact(cindex: CompressedIndex) -> CompressedIndex:
    """Segment merge: fold deltas+tombstones back into a clean base.

    Rebuilds postings from the (already-merged) docs table — the
    simplest correct merge; a production compactor would merge block
    files without re-tokenizing. Lineage is preserved."""
    spark = cindex.spark
    man = dict(cindex.manifest)
    t0 = time.time()
    fields = {k: FieldSpec(v["column"], v["positions"]) for k, v in man["fields"].items()}
    # save_index writes fresh versioned dirs, so reading the live docs
    # while writing the compacted snapshot is safe
    docs = cindex.docs
    idx = build_index(docs, man["doc_id_col"], fields, man["analyzer_mode"])
    lineage = man.get("lineage", [])
    old_dirs = set(man.get("dirs", {}).values())
    new = store_mod.save_index(
        idx, cindex.path, n_shards=man["n_shards"], block_size=man["block_size"]
    )
    import shutil

    # drop deltas + superseded version dirs
    keep = set(new.manifest["dirs"].values())
    for sub in ("postings_delta", "doc_stats_delta"):
        p = f"{cindex.path}/{sub}"
        if os.path.exists(p):
            shutil.rmtree(p)
    for d in old_dirs - keep:
        p = f"{cindex.path}/{d}"
        if os.path.exists(p):
            shutil.rmtree(p)
    new.manifest["lineage"] = lineage + [
        {
            "snapshot": new.manifest["snapshot"],
            "op": "compaction",
            "wall_seconds": round(time.time() - t0, 3),
        }
    ]
    _commit(cindex.path, new.manifest)
    return new


def sync(
    cindex: CompressedIndex,
    source: DataFrame,
    state_path: str,
    id_col: str = "id",
    modified_col: str = "modified_at",
    bid_state_col: str = "bid_state",
) -> CompressedIndex:
    """One checkpointed sync cycle (the 15-min cron body, cron.go:18)."""
    state = SyncState.load(state_path)
    start = int(time.time())
    batch = plan_batch(source, state, id_col, modified_col)
    if batch.limit(1).count() == 0:
        state.last_sync_unix = start
        state.save(state_path)
        return cindex
    upserts, deletes = route_batch(batch, bid_state_col)
    del_ids = deletes.select(F.col(cindex.manifest["doc_id_col"]).alias("doc_id"))
    cindex = apply_incremental(cindex, upserts=upserts, delete_ids=del_ids)
    state.last_id = int(batch.agg(F.max(id_col)).collect()[0][0] or state.last_id)
    state.last_sync_unix = start
    state.started_unix = state.started_unix or start
    state.save(state_path)
    return cindex


# --- blocked/filtered lists (P12; blocked.go:25-179) ----------------------

def delete_blocked(
    cindex: CompressedIndex,
    blocked: DataFrame,
    channel_id_col: str = "channel_claim_id",
) -> CompressedIndex:
    """Remove blocked docs; entries with a channel id expand to every
    doc of that channel (blocked.go:122-141's channel expansion)."""
    docs = cindex.docs
    id_col = cindex.manifest["doc_id_col"]
    parts = []
    if "doc_id" in blocked.columns:
        parts.append(blocked.select("doc_id").filter(F.col("doc_id").isNotNull()))
    if channel_id_col in blocked.columns and channel_id_col in docs.columns:
        chans = blocked.select(F.col(channel_id_col).alias("_cid")).filter(
            F.col("_cid").isNotNull()
        )
        parts.append(
            docs.join(
                F.broadcast(chans), docs[channel_id_col] == F.col("_cid"), "left_semi"
            ).select(F.col(id_col).alias("doc_id"))
        )
    if not parts:
        return cindex
    u = parts[0]
    for p in parts[1:]:
        u = u.unionByName(p)
    return apply_incremental(cindex, delete_ids=u.distinct())


# --- enrichment counts (S11; views.go/subs.go) -----------------------------

def apply_counts(cindex: CompressedIndex, counts: DataFrame) -> CompressedIndex:
    """Partial update of ranking counters (view_cnt/sub_cnt) — touches
    stored fields only, postings untouched (claim.go:154-157 partial
    update semantics)."""
    docs = cindex.docs
    id_col = cindex.manifest["doc_id_col"]
    update_cols = [c for c in counts.columns if c != "doc_id"]
    joined = docs.alias("d").join(
        F.broadcast(counts.alias("c")), F.col(f"d.{id_col}") == F.col("c.doc_id"), "left"
    )
    sel = []
    for col in docs.columns:
        if col in update_cols:
            sel.append(F.coalesce(F.col(f"c.{col}"), F.col(f"d.{col}")).alias(col))
        else:
            sel.append(F.col(f"d.{col}").alias(col))
    out = joined.select(*sel)
    snap = uuid.uuid4().hex[:12]
    new_dir = f"docs_v_{snap}"
    out.write.mode("overwrite").parquet(f"{cindex.path}/{new_dir}")
    man = dict(cindex.manifest)
    man.setdefault("dirs", {k: k for k in ("docs", "doc_stats", "term_stats", "postings")})
    man["dirs"] = {**man["dirs"], "docs": new_dir}
    man.setdefault("lineage", []).append({"snapshot": snap, "op": "enrichment"})
    _commit(cindex.path, man)
    cindex.manifest = man
    return cindex
