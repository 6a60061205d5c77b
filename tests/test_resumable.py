"""Resumable checkpointed build (north_rule: per-partition shard
checkpoints with lineage + build metrics; resume skips tokenized
slices). Pins: (1) sliced build == one-shot build, query-for-query and
stat-for-stat; (2) an interrupted build resumes from the journal
without re-tokenizing completed slices; (3) parameter mismatches are
refused instead of silently mixing checkpoints."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from lighthouse_spark.functions.analysis import tokenize_text
from lighthouse_spark.operators import wand
from lighthouse_spark.sources.corpus import synthetic_corpus
from lighthouse_spark.sources.store import build_and_save, build_resumable

FIELDS = {"content": "content"}
QUERIES = ["the return license", "sparklight", "getUserName merge"]


def _results(ci):
    out = {}
    for q in QUERIES:
        rows = wand.wand_topk(ci, "content", tokenize_text(q, "code"), k=10).collect()
        out[q] = [(r["doc_id"], round(r["score"], 9)) for r in rows]
    return out


@pytest.fixture(scope="module")
def corpus(spark):
    return synthetic_corpus(spark, 350).cache()


def test_sliced_build_equals_oneshot(spark, corpus, tmp_path):
    one = build_and_save(corpus, "doc_id", FIELDS, str(tmp_path / "one"),
                         mode="code", n_shards=4)
    sliced = build_resumable(corpus, "doc_id", FIELDS, str(tmp_path / "sl"),
                             mode="code", n_shards=4, n_slices=3)
    assert sliced is not None
    assert _results(sliced) == _results(one)
    # exact corpus stats: identical bookkeeping to the one-shot path
    assert sliced.manifest["corpus"] == one.manifest["corpus"]
    assert sliced.manifest["metrics"]["n_docs"] == one.manifest["metrics"]["n_docs"]
    # checkpoint dir cleaned up after finalize; slice lineage kept
    assert not os.path.exists(str(tmp_path / "sl" / "build_checkpoint"))
    ops = [e["op"] for e in sliced.manifest["lineage"]]
    assert ops.count("build_slice") == 3 and ops[-1] == "full_build_finalize"


def test_interrupted_build_resumes_without_retokenize(spark, corpus, tmp_path):
    path = str(tmp_path / "resume")
    # run 1: budget of one slice -> incomplete
    assert build_resumable(corpus, "doc_id", FIELDS, path,
                           mode="code", n_shards=4, n_slices=3, max_slices=1) is None
    j1 = json.load(open(f"{path}/build_checkpoint/progress.json"))
    assert len(j1["slices"]) == 1
    (done_slice,) = j1["slices"]
    mtime1 = os.path.getmtime(f"{path}/build_checkpoint/slice_{done_slice}/postings")
    # run 2: another single slice -> still incomplete, slice 1 untouched
    assert build_resumable(corpus, "doc_id", FIELDS, path,
                           mode="code", n_shards=4, n_slices=3, max_slices=1) is None
    j2 = json.load(open(f"{path}/build_checkpoint/progress.json"))
    assert len(j2["slices"]) == 2
    assert j2["slices"][done_slice] == j1["slices"][done_slice]
    assert os.path.getmtime(
        f"{path}/build_checkpoint/slice_{done_slice}/postings"
    ) == mtime1, "resume must not re-tokenize a journaled slice"
    # run 3: unbudgeted -> finalizes; identical to one-shot
    ci = build_resumable(corpus, "doc_id", FIELDS, path,
                         mode="code", n_shards=4, n_slices=3)
    assert ci is not None
    one = build_and_save(corpus, "doc_id", FIELDS, str(tmp_path / "one2"),
                         mode="code", n_shards=4)
    assert _results(ci) == _results(one)
    assert ci.manifest["corpus"] == one.manifest["corpus"]


def test_checkpoint_param_mismatch_refused(spark, corpus, tmp_path):
    path = str(tmp_path / "mismatch")
    assert build_resumable(corpus, "doc_id", FIELDS, path,
                           mode="code", n_shards=4, n_slices=3, max_slices=1) is None
    with pytest.raises(ValueError, match="different"):
        build_resumable(corpus, "doc_id", FIELDS, path,
                        mode="code", n_shards=4, n_slices=4)
