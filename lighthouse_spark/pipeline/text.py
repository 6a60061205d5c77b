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


# Gopher repetition thresholds (Rae et al. 2021, "Scaling Language
# Models: ...", Table A1): a doc is removed when ANY signal exceeds
# its bound.
GOPHER_THRESHOLDS: dict[str, float] = {
    "dup_line_frac": 0.30,
    "dup_para_frac": 0.30,
    "dup_line_char_frac": 0.20,
    "dup_para_char_frac": 0.20,
    "top_2gram_char_frac": 0.20,
    "top_3gram_char_frac": 0.18,
    "top_4gram_char_frac": 0.16,
    "dup_5gram_char_frac": 0.15,
    "dup_6gram_char_frac": 0.14,
    "dup_7gram_char_frac": 0.13,
}


def _dup_fracs(parts: Column, prefix: str) -> dict[str, Column]:
    """(fraction of repeated elements, fraction of chars in repeat
    occurrences beyond the first) for an array of line/paragraph
    strings — Σlen(all) − Σlen(distinct) is exactly the chars spent on
    re-occurrences. Pure per-row expressions, no shuffle."""
    n = F.size(parts)
    n_d = F.size(F.array_distinct(parts))
    chars = F.aggregate(parts, F.lit(0).cast("long"), lambda s, x: s + F.length(x))
    chars_d = F.aggregate(
        F.array_distinct(parts), F.lit(0).cast("long"), lambda s, x: s + F.length(x)
    )
    return {
        f"dup_{prefix}_frac": F.round(
            (n - n_d) / F.greatest(n, F.lit(1)).cast("double"), 6
        ),
        f"dup_{prefix}_char_frac": F.round(
            (chars - chars_d) / F.greatest(chars, F.lit(1)).cast("double"), 6
        ),
    }


def _split_parts(c: Column, sep: str) -> Column:
    """Trimmed non-empty line/paragraph segments."""
    return F.filter(
        F.transform(F.split(c, sep), lambda x: F.trim(x)), lambda x: x != ""
    )


def gopher_repetition(
    docs, id_col: str, text_col: str, top_ns=(2, 3, 4), dup_ns=(5, 6, 7)
):
    """Gopher repetition signals (Rae et al. 2021 §A1.1) per document.

    Line/paragraph signals are pure column math. The word-n-gram
    signals for ALL n values ride ONE explode → ONE partial-aggregating
    groupBy on (doc, n, gram) — at 100 TB that is a single shuffle
    whose width is the corpus token stream, never an n-pass scan.

    Char fractions are normalized by length(text). ``top_n`` = chars
    covered by the single most frequent n-gram (count × len);
    ``dup_n`` = chars in n-grams occurring more than once (count × len,
    capped at 1.0) — the standard open-source simplification of
    Gopher's span-coverage accounting (overlaps not deduplicated),
    which this module states rather than hides.
    """
    c = F.col(text_col)
    base = docs.select(
        F.col(id_col),
        F.length(c).cast("double").alias("_nchars"),
        tokens_simple(c).alias("_toks"),
        *[
            v.alias(k)
            for sep, pfx in (("\n\n", "para"), ("\n", "line"))
            for k, v in _dup_fracs(_split_parts(c, sep), pfx).items()
        ],
    )

    def ngrams(n: int) -> Column:
        toks = F.col("_toks")
        return F.when(
            F.size(toks) >= n,
            F.transform(
                F.sequence(F.lit(0), F.size(toks) - n),
                lambda i: F.struct(
                    F.lit(n).alias("n"),
                    F.array_join(F.slice(toks, i + 1, n), " ").alias("gram"),
                ),
            ),
        ).otherwise(F.array().cast(f"array<struct<n:int,gram:string>>"))

    all_ns = sorted(set(top_ns) | set(dup_ns))
    pairs = base.select(
        id_col,
        "_nchars",
        F.explode(F.concat(*[ngrams(n) for n in all_ns])).alias("g"),
    )
    counted = (
        pairs.groupBy(id_col, "_nchars", F.col("g.n").alias("n"), F.col("g.gram").alias("gram"))
        .agg(F.count(F.lit(1)).alias("cnt"))
        .withColumn("chars", F.col("cnt") * F.length("gram"))
    )
    aggs = []
    for n in top_ns:
        # top-n takes the MOST FREQUENT n-gram with no repetition
        # requirement — the paper's definition ("fraction of characters
        # contained in the most frequently-occurring n-gram"); a tiny
        # doc whose single top gram covers most of its chars IS flagged
        # (Gopher's upstream word-count filters are a separate signal,
        # quality_score here). The cnt>1 gate applies only to dup-n,
        # where "duplicated" requires >1 by definition. Overlapping
        # occurrences can cover more chars than the text has -> cap.
        aggs.append(
            F.round(
                F.least(
                    F.coalesce(
                        F.max(F.when(F.col("n") == n, F.col("chars"))),
                        F.lit(0),
                    )
                    / F.col("_nchars"),
                    F.lit(1.0),
                ),
                6,
            ).alias(f"top_{n}gram_char_frac")
        )
    for n in dup_ns:
        aggs.append(
            F.round(
                F.least(
                    F.coalesce(
                        F.sum(
                            F.when((F.col("n") == n) & (F.col("cnt") > 1), F.col("chars"))
                        ),
                        F.lit(0),
                    )
                    / F.col("_nchars"),
                    F.lit(1.0),
                ),
                6,
            ).alias(f"dup_{n}gram_char_frac")
        )
    grams_agg = counted.groupBy(id_col, "_nchars").agg(*aggs)
    out = base.drop("_toks").join(grams_agg.drop("_nchars"), on=id_col, how="left")
    fills = {f"top_{n}gram_char_frac": 0.0 for n in top_ns}
    fills.update({f"dup_{n}gram_char_frac": 0.0 for n in dup_ns})
    return out.fillna(fills).drop("_nchars")


def gopher_repetition_filter(docs, id_col: str, text_col: str):
    """Signals + the published keep/remove verdict: keep iff every
    signal is at or under its Gopher Table-A1 threshold."""
    sig = gopher_repetition(docs, id_col, text_col)
    keep = F.lit(True)
    for name, bound in GOPHER_THRESHOLDS.items():
        if name in sig.columns:
            keep = keep & (F.col(name) <= bound)
    return sig.withColumn("keep", keep)


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
