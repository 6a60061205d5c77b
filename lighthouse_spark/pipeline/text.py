"""Text-analysis operators: language-ID, quality scoring, token
counting, document fingerprinting.

All pure built-in expressions (codegen'd, SQL-mirrorable for the
DuckDB oracle) except where noted. Deterministic by construction.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.column import Column

# tiny per-language marker profiles (shared verbatim with the SQL
# oracle in __spark_entry__.py — the *mechanism* is the operator, the
# wordlists are config)
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "in"],
    "es": ["el", "la", "de", "que", "los"],
    "fr": ["le", "la", "et", "les", "des"],
    "de": ["der", "die", "und", "das", "ist"],
    "zh": ["de", "shi", "le", "zai", "he"],
}

TOKEN_SPLIT_RE = "[^a-z0-9]+"
# BPE-ish subword chunks: letter-runs, digit-runs, or single punctuation
BPE_ISH_RE = "[a-z]+|[0-9]+|[^a-z0-9\\s]"


def tokens_simple(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.filter(F.split(F.lower(c), TOKEN_SPLIT_RE), lambda x: x != "")


def whitespace_token_count(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.size(F.filter(F.split(c, "\\s+"), lambda x: x != ""))


def bpe_ish_token_count(col: Column | str) -> Column:
    """Subword-ish token count via regexp extraction (a cheap proxy for
    BPE token budgeting in data pipelines)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.size(F.regexp_extract_all(F.lower(c), F.lit(BPE_ISH_RE), F.lit(0)))


def lang_scores(col: Column | str) -> dict[str, Column]:
    toks = tokens_simple(col)
    out = {}
    for lang, markers in LANG_MARKERS.items():
        arr = F.array(*[F.lit(m) for m in markers])
        out[lang] = F.size(F.array_intersect(F.array_distinct(toks), arr))
    return out


def lang_id(col: Column | str) -> Column:
    """argmax over marker-hit counts via struct-ordering array_min
    ((-score, lang) — score desc, lang asc on ties); 0 hits -> 'und'.
    Deterministic and exactly mirrorable in the SQL oracle."""
    scores = lang_scores(col)
    entries = F.array(
        *[
            F.struct((-scores[lang]).alias("neg"), F.lit(lang).alias("lang"))
            for lang in sorted(scores)
        ]
    )
    best = F.array_min(entries)
    return F.when(best["neg"] < 0, best["lang"]).otherwise(F.lit("und"))


def quality_score(col: Column | str) -> Column:
    """Composite [0,1] quality heuristic: length band, alpha ratio,
    stopword presence, mean word length band. Mirrors common pretraining
    quality filters (C4/Gopher-style rules) as pure column math."""
    c = F.col(col) if isinstance(col, str) else col
    n_chars = F.length(c)
    toks = tokens_simple(c)
    n_tok = F.size(toks)
    alpha_ratio = F.length(F.regexp_replace(F.lower(c), "[^a-z]", "")) / F.greatest(
        n_chars, F.lit(1)
    )
    stop_hits = F.size(
        F.array_intersect(
            F.array_distinct(toks), F.array(*[F.lit(m) for m in LANG_MARKERS["en"]])
        )
    )
    mean_wlen = F.aggregate(
        toks, F.lit(0.0), lambda s, t: s + F.length(t)
    ) / F.greatest(n_tok, F.lit(1)).cast("double")
    len_ok = F.when((n_tok >= 10) & (n_tok <= 100000), 1.0).otherwise(0.0)
    alpha_ok = F.when(alpha_ratio >= 0.6, 1.0).otherwise(alpha_ratio / 0.6)
    stop_ok = F.when(stop_hits >= 2, 1.0).otherwise(stop_hits.cast("double") / 2.0)
    wlen_ok = F.when((mean_wlen >= 2.0) & (mean_wlen <= 12.0), 1.0).otherwise(0.0)
    return F.round((len_ok + alpha_ok + stop_ok + wlen_ok) / 4.0, 6)


def fingerprint_sha(col: Column | str) -> Column:
    """Whole-document fingerprint: sha256 of the normalized token
    stream (whitespace/case/punct-insensitive identity)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sha2(F.array_join(tokens_simple(c), " "), 256)


def winnowing_fingerprints(col: Column | str, k: int = 5, window: int = 4) -> Column:
    """Winnowing (Schleimer et al., SIGMOD'03): k-gram hashes, keep the
    minimum per sliding window — a position-robust fingerprint set for
    near-dup/plagiarism detection. Hash = sha256 hex of the k-gram
    (string min is deterministic and oracle-portable); output is the
    sorted distinct fingerprint array."""
    toks = tokens_simple(col)
    grams = F.transform(
        F.sequence(F.lit(0), F.greatest(F.size(toks) - k, F.lit(0))),
        lambda i: F.sha2(F.array_join(F.slice(toks, i + 1, k), " "), 256),
    )
    wins = F.transform(
        F.sequence(F.lit(0), F.greatest(F.size(grams) - window, F.lit(0))),
        lambda i: F.array_min(F.slice(grams, i + 1, window)),
    )
    return F.array_sort(F.array_distinct(wins))
