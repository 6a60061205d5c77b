"""Text-analysis operators vs Python oracles."""

from __future__ import annotations

import hashlib
import re

import pytest
from pyspark.sql import functions as F

from lighthouse_spark.pipeline import text as T

SAMPLES = [
    (1, "The cat and the dog sat in front of the door to wait."),
    (2, "el gato y la casa de los perros que ladran"),
    (3, "le chat et les chiens des villes"),
    (4, "der Hund und die Katze das ist gut"),
    (5, "xyzzy plugh 42"),
    (6, ""),
]


@pytest.fixture(scope="module")
def df(spark):
    return spark.createDataFrame(SAMPLES, "id long, text string").cache()


def test_lang_id(df):
    got = {r["id"]: r["lang"] for r in df.select("id", T.lang_id("text").alias("lang")).collect()}
    assert got[1] == "en"
    assert got[2] == "es"
    assert got[3] == "fr"
    assert got[4] == "de"
    assert got[5] == "und"
    assert got[6] == "und"


def test_token_counts(df):
    rows = df.select(
        "id",
        T.whitespace_token_count("text").alias("ws"),
        T.bpe_ish_token_count("text").alias("bpe"),
    ).collect()
    for r in rows:
        txt = dict(SAMPLES)[r["id"]]
        assert r["ws"] == len(txt.split())
        assert r["bpe"] == len(re.findall(r"[a-z]+|[0-9]+|[^a-z0-9\s]", txt.lower()))


def test_quality_score_bounds(df):
    rows = df.select("id", T.quality_score("text").alias("q")).collect()
    q = {r["id"]: r["q"] for r in rows}
    assert all(0.0 <= v <= 1.0 for v in q.values())
    assert q[1] > q[5] > q[6] or (q[1] > q[6] and q[5] >= q[6])


def test_fingerprint_normalization(spark):
    df = spark.createDataFrame(
        [(1, "Hello,   World! foo"), (2, "hello world FOO"), (3, "different text")],
        "id long, text string",
    )
    got = {r["id"]: r["fp"] for r in df.select("id", T.fingerprint_sha("text").alias("fp")).collect()}
    assert got[1] == got[2] != got[3]
    want = hashlib.sha256(b"hello world foo").hexdigest()
    assert got[1] == want


def test_winnowing_matches_python(df):
    k, w = 3, 4

    def py_winnow(txt):
        toks = re.findall(r"[a-z0-9]+", txt.lower())
        grams = [
            hashlib.sha256(" ".join(toks[i : i + k]).encode()).hexdigest()
            for i in range(max(len(toks) - k, 0) + 1)
        ]
        wins = [min(grams[i : i + w]) for i in range(max(len(grams) - w, 0) + 1)]
        return sorted(set(wins))

    rows = df.select("id", T.winnowing_fingerprints("text", k, w).alias("fp")).collect()
    for r in rows:
        txt = dict(SAMPLES)[r["id"]]
        assert list(r["fp"]) == py_winnow(txt), r["id"]


# ---------------------------------------------------------------------------
# Gopher repetition signals (Rae et al. 2021 §A1.1)
# ---------------------------------------------------------------------------

GOPHER_SAMPLES = [
    (1, "a b c d e f g h i j"),                 # tiny: top-n flags it (paper definition)
    (2, "x y\nx y\nz w\n\nx y\nx y\nz w"),       # dup lines AND dup paras
    (3, "spam ham " * 20),                       # saturating n-gram repetition
    (4, "one two"),                              # shorter than every dup n
    (5, ""),                                     # empty
    (6, "alpha beta gamma alpha beta gamma alpha beta delta epsilon"),
    # long diverse doc: every signal small -> the filter keeps it
    (7, " ".join(f"w{i:02d}token" for i in range(60))),
]


def _py_gopher(text: str) -> dict:
    toks = [t for t in re.split(r"[^a-z0-9]+", text.lower()) if t]
    nchars = len(text)

    def dup_fracs(raw_parts):
        parts = [p.strip() for p in raw_parts]
        parts = [p for p in parts if p]
        n, nd = len(parts), len(set(parts))
        chars = sum(map(len, parts))
        chars_d = sum(map(len, set(parts)))
        return (
            round((n - nd) / max(n, 1), 6),
            round((chars - chars_d) / max(chars, 1), 6),
        )

    out = {}
    out["dup_para_frac"], out["dup_para_char_frac"] = dup_fracs(text.split("\n\n"))
    out["dup_line_frac"], out["dup_line_char_frac"] = dup_fracs(text.split("\n"))

    def counts(n):
        from collections import Counter
        return Counter(
            " ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)
        ) if len(toks) >= n else {}

    for n in (2, 3, 4):
        c = counts(n)
        top = max((cnt * len(g) for g, cnt in c.items()), default=0)
        out[f"top_{n}gram_char_frac"] = round(min(1.0, top / nchars), 6) if nchars else 0.0
    for n in (5, 6, 7):
        c = counts(n)
        dup = sum(cnt * len(g) for g, cnt in c.items() if cnt > 1)
        out[f"dup_{n}gram_char_frac"] = round(min(1.0, dup / nchars), 6) if nchars else 0.0
    return out


def test_gopher_repetition_exact(spark):
    df = spark.createDataFrame(GOPHER_SAMPLES, "doc_id long, text string")
    got = {
        r["doc_id"]: r.asDict()
        for r in T.gopher_repetition(df, "doc_id", "text").collect()
    }
    for doc_id, text in GOPHER_SAMPLES:
        want = _py_gopher(text)
        for k, v in want.items():
            assert got[doc_id][k] == pytest.approx(v, abs=2e-6), (doc_id, k)


def test_gopher_filter_verdicts(spark):
    df = spark.createDataFrame(GOPHER_SAMPLES, "doc_id long, text string")
    keep = {
        r["doc_id"]: r["keep"]
        for r in T.gopher_repetition_filter(df, "doc_id", "text").collect()
    }
    # a long diverse doc and the empty doc keep; tiny docs are flagged
    # by the paper's top-n definition (the single most frequent n-gram
    # covers most of their chars); repeated-structure docs are removed
    assert keep[5] and keep[7]
    assert not keep[1] and not keep[2] and not keep[3] and not keep[4]
    # verdict is exactly the conjunction of the published thresholds
    for doc_id, text in GOPHER_SAMPLES:
        want = all(
            v <= T.GOPHER_THRESHOLDS[k] for k, v in _py_gopher(text).items()
        )
        assert keep[doc_id] == want, doc_id
