"""Text analysis (tokenization) — the engine's analyzer.

The reference delegates analysis to the Lucene/ES *standard analyzer*
(Unicode word-break + lowercase); it is applied identically at index
and query time (ref: /root/reference/app/es/index/claims.go — no custom
analyzer is configured, so the standard analyzer applies to all text
fields). We own the analyzer natively, in two modes:

- ``simple``: lowercase, split on non-alphanumeric runs. This is the
  standard-analyzer analogue and is exactly expressible in ANSI SQL
  (``regexp_split_to_array(lower(s), '[^a-z0-9]+')``), which the DuckDB
  oracle uses for the correctness gate.
- ``code``: ``simple`` plus code-aware identifier splitting — camelCase
  and ALLCAPSWord boundaries are split before lowercasing (snake_case
  splits fall out of the punctuation rule). This is the mode mandated
  for the source-code corpus (BASELINE.json north_star).

The SAME vectorized pandas implementation backs (a) the index-build
pandas UDF, (b) driver-side query tokenization, and (c) the pure-Python
test oracle — byte-identical analysis on both sides by construction.

No per-row Python UDFs: the Spark entry point is a pandas (Arrow) UDF.
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.column import Column

TOKEN_RE = re.compile(r"[a-z0-9]+")
# camelCase boundary: lower/digit followed by upper …
_CAMEL1 = re.compile(r"([a-z0-9])([A-Z])")
# … and ACRONYMWord boundary: run of uppers followed by Upper+lower.
_CAMEL2 = re.compile(r"([A-Z]+)([A-Z][a-z])")

MODES = ("simple", "code")


def _normalize(s: pd.Series, mode: str) -> pd.Series:
    s = s.fillna("")
    if mode == "code":
        s = s.str.replace(_CAMEL1, r"\1 \2", regex=True)
        s = s.str.replace(_CAMEL2, r"\1 \2", regex=True)
    return s.str.lower()


def _tokenize_pandas_re(s: pd.Series, mode: str) -> pd.Series:
    """Pure-pandas reference implementation (re module). Byte-identical
    to the Arrow fast path — pinned by tests/test_tokenizer.py."""
    return _normalize(s, mode).str.findall(TOKEN_RE)


def _arrow_split(arr, mode: str):
    """Shared Arrow-compute tokenize pipeline: string Array ->
    ListArray of split pieces (INCLUDING boundary empties — callers
    strip them). One definition backs both the pandas tokenizer and
    the mapInArrow index-build path, so the two can never diverge."""
    import pyarrow.compute as pc

    arr = pc.fill_null(arr, "")
    if mode == "code":
        arr = pc.replace_substring_regex(
            arr, pattern=r"([a-z0-9])([A-Z])", replacement=r"\1 \2"
        )
        arr = pc.replace_substring_regex(
            arr, pattern=r"([A-Z]+)([A-Z][a-z])", replacement=r"\1 \2"
        )
    arr = pc.utf8_lower(arr)
    return pc.split_pattern_regex(arr, pattern="[^a-z0-9]+")


def tokenize_pandas(s: pd.Series, mode: str = "simple") -> pd.Series:
    """Vectorized tokenizer: Series[str] -> Series[list[str]].

    Fast path runs entirely in Arrow compute (C++ RE2 replace + split,
    no per-row Python until the final list materialization) — ~2x the
    pandas-regex throughput, which matters because tokenization is the
    largest single compute slice of the index build. Output is
    byte-identical to the re-based reference implementation (the camel
    patterns use capture groups, not lookarounds, precisely so RE2
    accepts them)."""
    if mode not in MODES:
        raise ValueError(f"unknown analyzer mode {mode!r}")
    import os

    if os.environ.get("LIGHTHOUSE_TOKENIZER", "arrow") == "re":
        return _tokenize_pandas_re(s, mode)
    try:
        import pyarrow as pa
    except ImportError:  # pragma: no cover — pyarrow ships with pyspark
        return _tokenize_pandas_re(s, mode)
    toks = _arrow_split(pa.Array.from_pandas(s.astype(object)), mode)
    # split keeps boundary empties ("" at start/end); strip them while
    # materializing the Python lists the downstream map/Counter needs
    out = toks.to_pandas()
    out.index = s.index
    return out.map(lambda ts: [t for t in ts if t])


def tokenize_text(text: str, mode: str = "simple") -> list[str]:
    """Single-string tokenizer (query side / oracle side)."""
    return tokenize_pandas(pd.Series([text]), mode).iloc[0]


def tokenize_udf(mode: str = "simple"):
    """Return a pandas UDF column function: string col -> array<string>.

    Arrow-batched; used by the index builder. Token *positions* are
    recovered JVM-side with ``posexplode`` so Python never loops rows.
    """
    if mode not in MODES:
        raise ValueError(f"unknown analyzer mode {mode!r}")

    @F.pandas_udf("array<string>")
    def _tok(s: pd.Series) -> pd.Series:
        return tokenize_pandas(s, mode)

    return _tok


def tokens_col(col: Column | str, mode: str = "simple") -> Column:
    """Tokenize a column to array<string>."""
    c = F.col(col) if isinstance(col, str) else col
    return tokenize_udf(mode)(c)


def doc_terms_arrow(mode: str = "simple", positions: bool = True):
    """mapInArrow function: batches of (doc_id, _src) -> batches of
    (doc_id, dl, terms, tfs[, poss]) — the per-doc tokenize aggregate
    with ZERO per-token Python (guide §4.2).

    The r1-r7 pandas UDFs aggregated per doc with a Python loop over
    every token occurrence (plus a pandas round trip with object-list
    columns on both sides of the Arrow boundary) — the index build's
    largest single compute slice. Here everything stays in
    Arrow/numpy: RE2 split, dictionary-encode, one lexsort to group
    (doc, term), reduceat-style boundaries for tf, and the output List
    arrays assembled straight from offsets+values buffers.

    Semantics match the old UDFs exactly (same analyzer, same per-doc
    (term, tf, positions) multiset — pinned by tests); the order of
    terms WITHIN one doc's arrays is unspecified (it was first-
    occurrence order before), which no consumer observes: postings
    explode to a row set, and every query path aggregates or joins."""
    if mode not in MODES:
        raise ValueError(f"unknown analyzer mode {mode!r}")

    import numpy as np
    import pyarrow as pa

    def fn(batches):
        for b in batches:
            ndocs = b.num_rows
            if ndocs == 0:
                continue
            doc_id = b.column(0)
            toks = _arrow_split(b.column(1), mode)
            off = toks.offsets.to_numpy()
            values = toks.values
            counts_all = np.diff(off)
            # strip the boundary empties split() keeps
            nonempty = pa.compute.not_equal(values, "").to_numpy(
                zero_copy_only=False
            ).astype(bool)
            doc_of = np.repeat(np.arange(ndocs, dtype=np.int64), counts_all)
            d = doc_of[nonempty]
            flat = values.filter(pa.array(nonempty))
            n = len(flat)
            dl = np.bincount(d, minlength=ndocs).astype(np.int64)
            names = ["doc_id", "dl", "terms", "tfs"] + (["poss"] if positions else [])
            if n == 0:
                zeros = np.zeros(ndocs + 1, dtype=np.int32)
                empty_terms = pa.ListArray.from_arrays(zeros, pa.array([], pa.string()))
                empty_tfs = pa.ListArray.from_arrays(zeros, pa.array([], pa.int32()))
                cols = [doc_id, pa.array(dl), empty_terms, empty_tfs]
                if positions:
                    inner = pa.ListArray.from_arrays(
                        np.zeros(1, dtype=np.int32), pa.array([], pa.int32())
                    )
                    cols.append(pa.ListArray.from_arrays(zeros, inner))
                yield pa.RecordBatch.from_arrays(cols, names)
                continue
            # position of each kept token within its doc
            starts = np.zeros(ndocs, dtype=np.int64)
            np.cumsum(dl[:-1], out=starts[1:])
            pos = np.arange(n, dtype=np.int64) - np.repeat(starts, dl)
            # group by (doc, term): dictionary codes + one stable lexsort
            denc = flat.dictionary_encode()
            codes = denc.indices.to_numpy().astype(np.int64)
            uniq = denc.dictionary
            order = np.lexsort((codes, d))
            ds, cs, ps = d[order], codes[order], pos[order]
            newgrp = np.empty(n, dtype=bool)
            newgrp[0] = True
            newgrp[1:] = (ds[1:] != ds[:-1]) | (cs[1:] != cs[:-1])
            gstart = np.flatnonzero(newgrp)
            tf = np.diff(np.append(gstart, n))
            grp_per_doc = np.bincount(ds[gstart], minlength=ndocs)
            goff = np.zeros(ndocs + 1, dtype=np.int32)
            np.cumsum(grp_per_doc, out=goff[1:])
            term_vals = uniq.take(pa.array(cs[gstart], pa.int64()))
            terms_arr = pa.ListArray.from_arrays(goff, term_vals)
            tfs_arr = pa.ListArray.from_arrays(goff, pa.array(tf.astype(np.int32)))
            cols = [doc_id, pa.array(dl), terms_arr, tfs_arr]
            if positions:
                poff = np.zeros(gstart.size + 1, dtype=np.int32)
                np.cumsum(tf, out=poff[1:])
                inner = pa.ListArray.from_arrays(poff, pa.array(ps.astype(np.int32)))
                cols.append(pa.ListArray.from_arrays(goff, inner))
            yield pa.RecordBatch.from_arrays(cols, names)

    return fn


# --- reference-parity string helpers -------------------------------------

_STRIP_NAME = re.compile(r"(-|_|\bThe\b|\bthe\b|&)")


def stripped_name_col(col: Column | str) -> Column:
    """`stripped_name` derivation: remove `- _ The the &`.

    Ref: /root/reference/app/model/claim.go:170-185 (checkForSpecialChars
    / createStrippedName). Pure built-in functions — stays in codegen.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_replace(c, r"(-|_|\bThe\b|\bthe\b|&)", "")


def compressed_col(col: Column | str) -> Column:
    """Space-stripped "compressed" variant of a name/channel.

    Ref: /root/reference/app/actions/search/query.go:193,212.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.replace(c, F.lit(" "), F.lit(""))
