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
