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
