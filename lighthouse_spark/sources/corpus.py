"""Deterministic synthetic source-code corpus.

Materializes the BASELINE.json ``input_hint`` table shape —
``(repo string, path string, commit string, lang string, content
string)`` — at any scale, fully deterministic (seed folded into each
row id), so tests, the oracle, and both parallelism levels of the
bench see byte-identical data. Per FIXTURES.md §1: Zipf-ish long-tail
vocabulary plus heavy stopword-like terms (``the``, ``return``,
``license``) to exercise skew salting; camelCase + snake_case
identifiers for the code-aware analyzer; shared-prefix terms
(``sparklight/sparkline/sparkplug``) and embedded exact phrases for
prefix/fuzzy/phrase tests.

Content is generated inside ``mapInPandas`` (distributed, scales with
partitions); determinism comes from seeding a Philox generator with
the row id, never from partition layout.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

SEED = 42

LANGS = ["python", "go", "javascript", "markdown", "java"]
EXTS = {"python": "py", "go": "go", "javascript": "js", "markdown": "md", "java": "java"}

STOPWORDS = ["the", "return", "license", "if", "for", "import", "func", "def", "var"]
CAMEL = [
    "getUserName", "parseHttpRequest", "buildIndexShard", "mergeSortedRuns",
    "TokenStreamFactory", "readFileSync", "XMLHttpFactory", "computeBM25Score",
]
SNAKE = [
    "load_config_file", "posting_list_codec", "doc_id_offset", "term_freq_map",
    "block_max_score", "shard_writer_pool",
]
PREFIXED = ["sparklight", "sparkline", "sparkplug", "sparkly"]
PHRASES = [
    "interesting and amazing facts",  # the reference smoke query (app/test/test.go:21)
    "block max wand pruning",
]
DIRS = ["core", "util", "index", "query", "io", "net", "api"]
NAMES = ["main", "engine", "codec", "shard", "merge", "scan", "token", "score"]

# Zipf long tail: vocab_k terms, term k with weight ~ 1/(k+1)
VOCAB_N = 2000


def _vocab() -> tuple[np.ndarray, np.ndarray]:
    """(words, probabilities): explicit mixture so every word class is
    actually drawn — heavy stopwords (skew), code identifiers, shared
    prefixes, and a Zipf long tail of `symK` terms."""
    words: list[str] = []
    weights: list[float] = []

    def add(ws: list[str], total: float):
        for w in ws:
            words.append(w)
            weights.append(total / len(ws))

    add(STOPWORDS, 0.55)   # skewed head — exercises salting
    add(CAMEL, 0.07)
    add(SNAKE, 0.05)
    add(PREFIXED, 0.04)
    tail = np.array([1.0 / (k + 2) ** 1.1 for k in range(VOCAB_N)])
    tail = 0.29 * tail / tail.sum()
    words.extend(f"sym{k}" for k in range(VOCAB_N))
    weights.extend(tail.tolist())
    p = np.array(weights)
    return np.array(words), p / p.sum()


_WORDS, _PROBS = _vocab()


def _gen_batch(ids: np.ndarray, rich: bool = False) -> pd.DataFrame:
    rows = []
    for i in ids:
        rng = np.random.Generator(np.random.Philox(key=SEED, counter=int(i)))
        lang = LANGS[int(i) % len(LANGS)]
        d = DIRS[int(i) % len(DIRS)]
        nm = NAMES[int(i * 7 + 3) % len(NAMES)]
        path = f"src/{d}/{nm}_{int(i)}.{EXTS[lang]}"
        n_tokens = int(rng.integers(150, 1200) if rich else rng.integers(50, 400))
        idx = rng.choice(len(_WORDS), size=n_tokens, p=_PROBS)
        toks = list(_WORDS[idx])
        if rich:
            # realistic source files carry locally-unique identifiers
            # (variable names, hashes, uuids) whose trigrams are RARE
            # corpus-wide — the property that makes a gram index
            # selective on real code and that the 2k-word shared vocab
            # alone cannot model. ~30 per doc, deterministic.
            uids = [
                "uid" + bytes(rng.integers(0, 256, 6, dtype=np.uint8)).hex()
                for _ in range(30)
            ]
            at = rng.integers(0, max(1, len(toks)), size=len(uids))
            for p_, u in zip(sorted(int(a) for a in at), uids):
                toks.insert(p_, u)
        if int(i) % 17 == 0:
            pos = int(rng.integers(0, max(1, len(toks) - 1)))
            toks[pos:pos] = PHRASES[int(i) % len(PHRASES)].split(" ")
        content = " ".join(toks)
        commit = hashlib.sha1(f"commit-{SEED}-{int(i)}".encode()).hexdigest()
        rows.append(
            {
                "id": int(i),
                "repo": f"org{int(i) % 7}/repo{int(i) % 23}",
                "path": path,
                "commit": commit,
                "lang": lang,
                "content": content,
            }
        )
    return pd.DataFrame(rows)


def synthetic_corpus(
    spark: SparkSession,
    n_docs: int = 1000,
    partitions: int | None = None,
    rich_identifiers: bool = False,
) -> DataFrame:
    """Distributed deterministic corpus of ``n_docs`` files.

    Adds ``doc_id`` = xxhash64(repo, path, commit) — stable across
    runs/partitioning (SURVEY.md §7.4.2) — and ``content_sha256`` for
    the per-row invariant (BASELINE.json input_hint).
    ``rich_identifiers`` switches to realistic-file sizing with ~30
    per-doc unique identifiers (rare-trigram density of real code);
    default off — the shared-vocab shape every existing test/bench
    pins."""
    base = spark.range(0, n_docs, 1, partitions or spark.sparkContext.defaultParallelism)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            yield _gen_batch(b["id"].to_numpy(), rich_identifiers)

    schema = "id long, repo string, path string, commit string, lang string, content string"
    df = base.mapInPandas(gen, schema)
    return (
        df.withColumn("doc_id", F.xxhash64("repo", "path", "commit"))
        .withColumn("content_sha256", F.sha2("content", 256))
        .drop("id")
    )
