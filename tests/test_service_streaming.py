"""Serving layer (cache/status/explain) + streaming ingestion."""

from __future__ import annotations

import time

import pytest
from pyspark.sql import functions as F

from lighthouse_spark.api.engine import SearchEngine
from lighthouse_spark.api.request import AutoCompleteRequest, SearchRequest
from lighthouse_spark.api.service import QueryCache, SearchService
from lighthouse_spark.functions.analysis import tokenize_text
from lighthouse_spark.operators import wand
from lighthouse_spark.plans.indexer import FieldSpec, build_index
from lighthouse_spark.sources.claims import synthetic_claims
from lighthouse_spark.sources.corpus import synthetic_corpus
from lighthouse_spark.sources.store import build_and_save
from lighthouse_spark.streaming.incremental import run_available_now


@pytest.fixture(scope="module")
def service(spark):
    claims = synthetic_claims(spark, 200).cache()
    idx = build_index(
        claims,
        "doc_id",
        {
            "name": FieldSpec("name", positions=True),
            "title": FieldSpec("title", positions=True),
            "description": FieldSpec("description", positions=True),
            "channel": FieldSpec("channel", positions=True),
        },
        mode="simple",
    ).cache()
    return SearchService(SearchEngine(idx))


def test_cache_hit_and_ttl():
    c = QueryCache(max_entries=2, ttl_seconds=0.2)
    calls = []
    assert c.fetch("a", lambda: calls.append(1) or "va") == "va"
    assert c.fetch("a", lambda: calls.append(1) or "vb") == "va"  # hit
    assert len(calls) == 1 and c.hits == 1
    time.sleep(0.25)
    assert c.fetch("a", lambda: calls.append(1) or "vc") == "vc"  # expired
    # LRU eviction at max_entries
    c.fetch("b", lambda: "vb")
    c.fetch("c", lambda: "vc")
    assert c.fetch("a", lambda: "fresh") == "fresh"  # 'a' was evicted


def test_service_search_cached(service):
    req = SearchRequest(s="interesting facts", size=5)
    r1 = service.search(req)
    m = service.cache.misses
    r2 = service.search(SearchRequest(s="interesting facts", size=5))
    assert r1 == r2
    assert service.cache.misses == m  # second call was a cache hit
    assert service.cache.hits >= 1


def test_search_many_equals_serial(service):
    """Concurrent serving (VERDICT r4 next #5): N driver threads over
    one session return positionally identical results to the serial
    loop, and the single-flight cache computes a duplicated request
    once."""
    reqs = [
        SearchRequest(s="interesting facts", size=5),
        SearchRequest(s="crypto news", size=5),
        # repeated token -> the MLT clause is ACTIVE (min_term_freq=2):
        # this is the request that exposes a shared-prefetch race —
        # mlt_terms silently drops like-terms missing from a df_map
        # another thread overwrote (engine prefetch is thread-local)
        SearchRequest(s="crypto daily crypto", size=5),
        SearchRequest(s="amazing stories", size=5),
        SearchRequest(s="interesting facts", size=5),  # duplicate key
        SearchRequest(s="music video", size=5, nsfw=False),
        SearchRequest(s="daily podcast", size=5),
    ]
    fresh = SearchService(service.engine)  # empty cache
    serial = [
        [r.asDict() for r in fresh.engine.search(q).collect()] for q in reqs
    ]
    got = fresh.search_many(reqs, max_workers=4)
    assert got == serial
    # the MLT-active request must actually have results to compare
    assert got[2]
    # 7 requests, 6 distinct keys: single-flight + cache -> <=6 computes
    assert fresh.cache.misses <= 6


def test_query_cache_single_flight_threads():
    """Concurrent misses of one key run ONE compute; followers get the
    leader's value."""
    import threading

    c = QueryCache()
    calls = []
    gate = threading.Event()

    def compute():
        calls.append(1)
        gate.wait(1.0)
        return "v"

    outs = []
    ts = [
        threading.Thread(target=lambda: outs.append(c.fetch("k", compute)))
        for _ in range(6)
    ]
    for t in ts:
        t.start()
    time.sleep(0.1)
    gate.set()
    for t in ts:
        t.join()
    assert outs == ["v"] * 6
    assert len(calls) == 1 and c.misses == 1 and c.hits == 5


def test_query_cache_leader_failure_propagates():
    """A failing leader's exception reaches its followers as-is (ONE
    compute, not N serial retries), is served from the short-TTL
    negative entry until it expires, then a fresh leader retries
    (ADVICE r5)."""
    import threading

    c = QueryCache(error_ttl_seconds=0.2)
    calls = []
    gate = threading.Event()

    def compute():
        calls.append(1)
        gate.wait(1.0)
        raise ValueError("boom")

    errs = []

    def run():
        try:
            c.fetch("k", compute)
        except ValueError as e:
            errs.append(str(e))

    ts = [threading.Thread(target=run) for _ in range(5)]
    for t in ts:
        t.start()
    time.sleep(0.1)
    gate.set()
    for t in ts:
        t.join()
    assert errs == ["boom"] * 5
    assert len(calls) == 1  # followers re-raised, never re-computed
    # fresh request inside the error TTL: still the cached error
    with pytest.raises(ValueError):
        c.fetch("k", lambda: "never")
    assert len(calls) == 1
    # after expiry a new leader retries and can succeed
    time.sleep(0.25)
    assert c.fetch("k", lambda: "recovered") == "recovered"


def test_service_autocomplete(service):
    names = service.autocomplete(AutoCompleteRequest(s="cr", size=5))
    assert isinstance(names, list)
    assert len(names) == len(set(names))


def test_service_status(service):
    st = service.status()
    assert st["doc_count"] == 200
    assert st["status"] == "green"
    assert "name" in st["fields"] and st["fields"]["name"]["n_docs"] > 0


def test_metrics_histograms(service):
    """SearchDuration keyed by (type, term_count) + AutoCompleteDuration
    (app/internal/metrics/metrics.go:20-33; observed search.go:144-147)."""
    service.search(SearchRequest(s="metrics probe query", size=3))
    service.autocomplete(AutoCompleteRequest(s="me", size=3))
    m = service.status()["metrics"]
    # "metrics probe query" = 3 space-split terms, general search type
    sd = m["search_duration"]
    assert "general|3" in sd and sd["general|3"]["count"] >= 1
    assert sd["general|3"]["sum"] > 0
    assert m["auto_complete_duration"]["count"] >= 1
    # cumulative buckets are monotone and end at the total count
    b = sd["general|3"]["buckets"]
    vals = list(b.values())
    assert vals == sorted(vals) and vals[-1] == sd["general|3"]["count"]


def test_explain_breakdown_sums_to_score(service):
    req = SearchRequest(s="crypto news", size=5)
    hits = service.engine.search(req).select("doc_id", "score").collect()
    br = service.explain(req).collect()
    per_doc: dict[int, float] = {}
    for r in br:
        per_doc[r["doc_id"]] = per_doc.get(r["doc_id"], 0.0) + r["score"]
    for h in hits:
        assert per_doc[h["doc_id"]] == pytest.approx(h["score"], rel=1e-9)
    clauses = {r["clause"] for r in br}
    assert "boosts" in clauses and "gauss_decay" in clauses
    assert any(c.endswith("match") or "phrase" in c for c in clauses)


def test_streaming_available_now(spark, tmp_path):
    docs = synthetic_corpus(spark, 200)
    ci = build_and_save(
        docs, "doc_id", {"content": FieldSpec("content")},
        str(tmp_path / "idx"), mode="code", n_shards=2,
    )
    # drop two files into the stream source dir: one upsert batch, one
    # with a delete-routed row
    src = tmp_path / "incoming"
    one = ci.docs.orderBy("doc_id").limit(2).cache()
    ids = [r["doc_id"] for r in one.select("doc_id").collect()]
    batch1 = one.withColumn("content", F.lit("streamedterm alpha")).withColumn(
        "bid_state", F.lit("Accepted")
    )
    batch1.write.mode("overwrite").parquet(str(src))
    schema = batch1.schema

    ci = run_available_now(ci, str(src), str(tmp_path / "ckpt"), schema=schema)
    got = {r["doc_id"] for r in wand.wand_topk(ci, "content", ["streamedterm"], k=10).collect()}
    assert got == set(ids)

    # second pass with NO new files: checkpoint prevents re-processing
    lineage_len = len(ci.manifest["lineage"])
    ci = run_available_now(ci, str(src), str(tmp_path / "ckpt"), schema=schema)
    assert len(ci.manifest["lineage"]) == lineage_len

    # a new file with a Spent row deletes the doc
    batch2 = one.limit(1).withColumn("bid_state", F.lit("Spent"))
    batch2.write.mode("append").parquet(str(src))
    ci = run_available_now(ci, str(src), str(tmp_path / "ckpt"), schema=schema)
    got2 = {r["doc_id"] for r in wand.wand_topk(ci, "content", ["streamedterm"], k=10).collect()}
    assert len(got2) == 1 and got2 < set(ids)


def test_service_over_store(spark, tmp_path_factory):
    """The whole serving layer on the persisted index:
    SearchService(StoreEngine(cindex)) must serve /search,
    /autocomplete and /status with results identical to the flat-index
    service."""
    from lighthouse_spark.api.service import StoreEngine
    from lighthouse_spark.sources.store import build_and_save

    claims = synthetic_claims(spark, 200).cache()
    specs = {
        f: FieldSpec(f, positions=True)
        for f in ("name", "title", "description", "channel")
    }
    flat_svc = SearchService(
        SearchEngine(build_index(claims, "doc_id", specs, mode="simple").cache())
    )
    d = str(tmp_path_factory.mktemp("svc_store"))
    ci = build_and_save(claims, "doc_id", specs, d, mode="simple", n_shards=4)
    store_svc = SearchService(StoreEngine(ci, now_seconds=flat_svc.engine.now_seconds))

    req = SearchRequest(s="interesting facts", size=5)
    assert store_svc.search(req) == flat_svc.search(req)
    ac = AutoCompleteRequest(s="cr", size=5)
    assert store_svc.autocomplete(ac) == flat_svc.autocomplete(ac)
    st = store_svc.status()
    assert st["doc_count"] == 200 and st["status"] == "green"
    # cached second call: no new miss
    m = store_svc.cache.misses
    store_svc.search(SearchRequest(s="interesting facts", size=5))
    assert store_svc.cache.misses == m
