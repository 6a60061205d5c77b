"""Corpus-curation operators for training-data pipelines:
benchmark decontamination, deterministic sampling, PII scrubbing.

All pure built-in expressions (whole-stage codegen; no Python in any
hot path), all cross-engine reproducible so the driver's DuckDB oracle
can check values bit-for-bit:

- decontamination joins on word n-gram shingles — the standard
  test-set-overlap removal (any doc sharing >=1 n-gram with the
  reference set is dropped). The reference side (a benchmark test set)
  is typically tiny; no broadcast hint is forced — AQE picks the build
  side, so a genuinely large reference set still shuffle-joins.
- sampling hashes doc ids with sha256 (not xxhash64: sha2 is the
  cross-engine-reproducible choice, see sha2_token_hash) — the SAME
  rows are kept at any parallelism, any engine, any run.
- PII scrubbing is regexp_replace with patterns restricted to the
  regex intersection of Java and RE2 dialects (char classes +
  bounded quantifiers, no lookaround), so Spark and DuckDB rewrite
  byte-identically.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from lighthouse_spark.functions.analysis import tokens_col
from lighthouse_spark.pipeline.dedup import _shingles_from_tokens, with_shingles


def contamination(
    df: DataFrame,
    id_col: str,
    text_col: str,
    ref: DataFrame,
    ref_text_col: str,
    n: int = 5,
    mode: str = "simple",
) -> DataFrame:
    """(id, shared_ngrams) for every doc sharing >=1 word n-gram with
    ANY reference document — the audit view of decontamination.

    Scale shape: reference shingles are DISTINCT'd before the join
    (the ref set's size, not its row count, bounds the join input);
    the corpus side explodes shingles once and partial-aggregates the
    per-doc match count map-side."""
    corpus_sh = with_shingles(df, id_col, text_col, n, mode).select(
        "id", F.explode("sh").alias("shingle")
    )
    ref_sh = (
        ref.select(tokens_col(ref_text_col, mode).alias("_toks"))
        .select(F.explode(_shingles_from_tokens(F.col("_toks"), n)).alias("shingle"))
        .distinct()
    )
    return (
        corpus_sh.join(ref_sh, "shingle")
        .groupBy("id")
        .agg(F.count("*").alias("shared_ngrams"))
    )


def decontaminate(
    df: DataFrame,
    id_col: str,
    text_col: str,
    ref: DataFrame,
    ref_text_col: str,
    n: int = 5,
    mode: str = "simple",
) -> DataFrame:
    """The cleaned corpus: drop every doc sharing >=1 word n-gram with
    the reference (test/benchmark) set. Anti-join on the contamination
    ids — the corpus is never collected or broadcast."""
    bad = contamination(df, id_col, text_col, ref, ref_text_col, n, mode).select(
        F.col("id").alias(id_col)
    )
    return df.join(bad, id_col, "left_anti")


def _sha_unit(col):
    """Deterministic uniform [0, 1) from a column value via sha256 —
    identical in Spark and DuckDB ('0x' || substr(sha256(x),1,15)).
    60 bits of hash over a 2^60 denominator."""
    h = F.conv(F.substring(F.sha2(col.cast("string"), 256), 1, 15), 16, 10).cast("long")
    return (h / F.lit(float(2 ** 60))).cast("double")


def hash_sample(
    df: DataFrame, id_col: str, fraction: float, salt: str = ""
) -> DataFrame:
    """Deterministic Bernoulli sample: keep rows whose sha256-derived
    unit hash < fraction. Unlike df.sample(), the SAME rows survive at
    any parallelism / partitioning / engine — the property a resumable
    100 TB pipeline needs (re-runs must agree). ``salt`` decorrelates
    independent samples."""
    u = _sha_unit(F.concat(F.lit(salt), F.col(id_col).cast("string")))
    return df.filter(u < F.lit(float(fraction)))


def stratified_sample_exact(
    df: DataFrame,
    id_col: str,
    strata_cols: list[str],
    k_per_stratum: int,
    salt: str = "",
) -> DataFrame:
    """EXACTLY k rows per stratum, chosen by deterministic hash order
    (rank over the sha256 unit hash within each stratum).

    Skew-resilient: ranks via search.topk_per_key's two-phase window
    (pre-rank per input partition, then a k-bounded global rank), so a
    mega-stratum never funnels its whole row set through one window
    task. Output is identical to the single-window plan."""
    from lighthouse_spark.operators.search import topk_per_key

    u = _sha_unit(F.concat(F.lit(salt), F.col(id_col).cast("string")))
    return topk_per_key(
        df.withColumn("_u", u),
        list(strata_cols),
        [F.col("_u").asc(), F.col(id_col).asc()],
        k_per_stratum,
    ).drop("_u", "rank")


# regex intersection of Java (Spark) and RE2 (DuckDB 'g' flag):
# char classes + bounded quantifiers only, no lookaround. Phone forms
# split by their FIRST character because \b only exists at a word/non-
# word transition: a pattern starting \b\+? can never consume a '+'
# after whitespace (space→'+' is no boundary), which both leaked the
# '+' and skipped non-NANP numbers entirely. '+'-anchored and
# '('-anchored variants need no boundary (those chars can't sit inside
# a digit run); the bare-digit variant keeps \b on both ends so it
# never fires inside a longer number.
PII_PATTERNS = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ipv4", r"\b(?:\d{1,3}\.){3}\d{1,3}\b", "<IP>"),
    ("phone_intl", r"\+\d{1,3}[-. ]?\(?\d{3}\)?[-. ]?\d{3}[-. ]?\d{4}\b", "<PHONE>"),
    ("phone_e164", r"\+\d{7,15}\b", "<PHONE>"),
    ("phone_paren", r"\(\d{3}\)[-. ]?\d{3}[-. ]?\d{4}\b", "<PHONE>"),
    # bare country code ("1-415-555-0199"): the separator after the
    # code is MANDATORY so pure digit runs never match mid-number
    ("phone_cc", r"\b\d{1,3}[-. ]\(?\d{3}\)?[-. ]?\d{3}[-. ]?\d{4}\b", "<PHONE>"),
    ("phone_us", r"\b\d{3}[-. ]?\d{3}[-. ]?\d{4}\b", "<PHONE>"),
    ("ssn", r"\b\d{3}-\d{2}-\d{4}\b", "<SSN>"),
)


def pii_scrub_col(col):
    """Column expression replacing emails / IPv4s / phone numbers /
    SSNs with typed placeholders. Order matters (email before phone so
    digits inside addresses aren't half-eaten); all JVM-side."""
    out = col
    for _, pat, repl in PII_PATTERNS:
        out = F.regexp_replace(out, pat, repl)
    return out


def pii_scrub(df: DataFrame, text_col: str) -> DataFrame:
    return df.withColumn(text_col, pii_scrub_col(F.col(text_col)))
