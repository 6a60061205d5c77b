"""Codec round-trip tests, incl. property-based (hypothesis)."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from lighthouse_spark.functions import codec


def test_varint_roundtrip_basic():
    vals = np.array([0, 1, 127, 128, 300, 2**32, 2**63, 2**64 - 1], dtype=np.uint64)
    assert (codec.varint_decode(codec.varint_encode(vals)) == vals).all()


def test_varint_empty():
    assert codec.varint_encode(np.array([], dtype=np.uint64)) == b""
    assert codec.varint_decode(b"").size == 0


@settings(max_examples=200, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=2**64 - 1), max_size=300))
def test_varint_roundtrip_property(xs):
    vals = np.array(xs, dtype=np.uint64)
    out = codec.varint_decode(codec.varint_encode(vals))
    assert out.tolist() == xs


@settings(max_examples=200, deadline=None)
@given(
    st.lists(
        st.integers(min_value=-(2**62), max_value=2**62), min_size=0, max_size=300, unique=True
    )
)
def test_delta_roundtrip_property(xs):
    ids = np.array(sorted(xs), dtype=np.int64)
    out = codec.delta_decode(codec.delta_encode(ids))
    assert out.tolist() == ids.tolist()


def test_delta_negative_first():
    ids = np.array([-(2**62), -5, 0, 3, 2**61], dtype=np.int64)
    assert (codec.delta_decode(codec.delta_encode(ids)) == ids).all()


def test_positions_roundtrip():
    plists = [np.array([0, 5, 6]), np.array([], dtype=np.int64), np.array([42])]
    buf = codec.encode_positions(plists)
    out = codec.decode_positions(buf, 3)
    for a, b in zip(plists, out):
        assert list(a) == list(b)


def test_compression_is_compact():
    ids = np.arange(0, 100_000, 7, dtype=np.int64)
    raw = ids.nbytes
    enc = len(codec.delta_encode(ids))
    assert enc < raw / 4  # gaps of 7 fit in one byte each


def test_corpus_generator_determinism_pins():
    """The synthetic corpus is part of the oracle surface (bench rank
    identity, fuzzy/trigram fixtures): pin the default-mode content
    bytes (sha256 prefixes) so an accidental change to the generator's
    RNG consumption order can't silently shift every downstream
    number, and pin that rich_identifiers mode (a) leaves the default
    path byte-identical, (b) injects its 30 deterministic uid tokens."""
    import hashlib

    import numpy as np

    from lighthouse_spark.sources.corpus import _gen_batch

    pins = {
        "src/core/shard_0.py": "5cc0cd8db57f09bb",
        "src/net/token_5.py": "31a9eae2a66bdb23",
        "src/query/codec_17.js": "4d7851dbd2b5c04b",
    }
    b = _gen_batch(np.array([0, 5, 17]))
    got = {
        r["path"]: hashlib.sha256(r["content"].encode()).hexdigest()[:16]
        for _, r in b.iterrows()
    }
    assert got == pins
    r1 = _gen_batch(np.array([5]), rich=True).iloc[0]["content"]
    r2 = _gen_batch(np.array([5]), rich=True).iloc[0]["content"]
    assert r1 == r2  # deterministic
    assert sum(1 for t in r1.split() if t.startswith("uid")) == 30


def test_arrow_block_encoder_matches_pandas_encoder():
    """r8: _block_encoder_arrow (mapInArrow fast path) must produce
    byte-identical block rows to _encode_group (the pandas path it
    replaced) for the same logical postings — same blocks, same
    varint payloads, same block-max metadata."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa

    from lighthouse_spark.sources import store as store_mod

    rng = np.random.default_rng(7)
    docs = []
    vocab = [f"t{i:02d}" for i in range(12)] + ["the", "zz"]
    for doc_id in range(80):
        n_terms = int(rng.integers(0, 8))
        terms = sorted(rng.choice(vocab, size=n_terms, replace=False).tolist())
        poss, tfs = [], []
        cur = 0
        for _ in terms:
            k = int(rng.integers(1, 5))
            ps = sorted(rng.choice(np.arange(cur, cur + 40), size=k, replace=False).tolist())
            cur += 40
            poss.append([int(x) for x in ps])
            tfs.append(k)
        dl = int(sum(tfs))
        docs.append((doc_id, "content", dl, terms, tfs, poss))

    n_shards, block_size, avgdl = 4, 8, 17.3
    shard_of = lambda d: hash(("s", d)) % n_shards  # noqa: E731 — any grouping works

    # pandas path: one exploded frame per (shard, field) group
    rows = []
    for doc_id, field, dl, terms, tfs, poss in docs:
        for t, tf, ps in zip(terms, tfs, poss):
            rows.append((shard_of(doc_id), field, t, doc_id, tf, dl, ps))
    flat = pd.DataFrame(
        rows, columns=["shard", "field", "term", "doc_id", "tf", "dl", "positions"]
    )
    want = {}
    for (sh, fld), g in flat.groupby(["shard", "field"]):
        out = store_mod._encode_group(g.copy(), block_size, {"content": avgdl})
        for r in out.itertuples(index=False):
            want[(sh, fld, r.term, r.block_id)] = (
                r.n_docs, bytes(r.doc_ids_enc), bytes(r.tfs_enc),
                bytes(r.dls_enc),
                None if r.positions_enc is None else bytes(r.positions_enc),
                round(float(r.max_tfn), 12), int(r.max_doc_id),
            )

    # arrow path: per-doc aggregate batch through the mapInArrow encoder
    b = pa.RecordBatch.from_arrays(
        [
            pa.array([d[0] for d in docs], pa.int64()),
            pa.array([shard_of(d[0]) for d in docs], pa.int32()),
            pa.array([d[1] for d in docs], pa.string()),
            pa.array([d[2] for d in docs], pa.int64()),
            pa.array([d[3] for d in docs], pa.list_(pa.string())),
            pa.array([d[4] for d in docs], pa.list_(pa.int32())),
            pa.array([d[5] for d in docs], pa.list_(pa.list_(pa.int32()))),
        ],
        ["doc_id", "shard", "field", "dl", "terms", "tfs", "poss"],
    )
    enc = store_mod._block_encoder_arrow(block_size, {"content": avgdl})
    got = {}
    for out in enc(iter([b])):
        t = out.to_pydict()
        for i in range(out.num_rows):
            got[(t["shard"][i], t["field"][i], t["term"][i], t["block_id"][i])] = (
                t["n_docs"][i], t["doc_ids_enc"][i], t["tfs_enc"][i],
                t["dls_enc"][i], t["positions_enc"][i],
                round(float(t["max_tfn"][i]), 12), t["max_doc_id"][i],
            )
    assert got == want
