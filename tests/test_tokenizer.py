"""Golden tests for the analyzer (index side == query side == oracle).

The analyzer is the one component shared by engine and oracle, so its
behavior is pinned here with explicit expected token streams.
"""

from __future__ import annotations

import pandas as pd
import pytest

from lighthouse_spark.functions.analysis import (
    tokenize_pandas,
    tokenize_text,
    tokens_col,
)

GOLDEN_SIMPLE = [
    ("Interesting AND Amazing facts!", ["interesting", "and", "amazing", "facts"]),
    ("foo_bar-baz.qux", ["foo", "bar", "baz", "qux"]),
    ("x2 3y", ["x2", "3y"]),
    ("", []),
    ("   ", []),
    ("getUserName", ["getusername"]),  # simple mode: no camel split
]

GOLDEN_CODE = [
    ("getUserName", ["get", "user", "name"]),
    ("parseHTTPRequest", ["parse", "http", "request"]),
    ("load_config_file", ["load", "config", "file"]),
    ("XMLHttpFactory2", ["xml", "http", "factory2"]),
    ("computeBM25Score", ["compute", "bm25", "score"]),
    ("snake_and_camelCase mix", ["snake", "and", "camel", "case", "mix"]),
    ("The-quick_brown", ["the", "quick", "brown"]),
]


@pytest.mark.parametrize("text,expected", GOLDEN_SIMPLE)
def test_simple_golden(text, expected):
    assert tokenize_text(text, "simple") == expected


@pytest.mark.parametrize("text,expected", GOLDEN_CODE)
def test_code_golden(text, expected):
    assert tokenize_text(text, "code") == expected


def test_null_and_vectorized():
    s = pd.Series([None, "a b", "C_d"])
    out = tokenize_pandas(s, "code").tolist()
    assert out == [[], ["a", "b"], ["c", "d"]]


def test_spark_udf_matches_pandas(spark):
    texts = [t for t, _ in GOLDEN_SIMPLE + GOLDEN_CODE]
    df = spark.createDataFrame([(t,) for t in texts], "t string")
    for mode in ("simple", "code"):
        got = [r["toks"] for r in df.select(tokens_col("t", mode).alias("toks")).collect()]
        want = tokenize_pandas(pd.Series(texts), mode).tolist()
        assert got == want


def test_simple_mode_matches_sql_contract(spark):
    """`simple` must equal the DuckDB-oracle expression
    regexp_split_to_array(lower(s), '[^a-z0-9]+') minus empties —
    this is the contract the driver correctness gate relies on."""
    import duckdb

    texts = [t for t, _ in GOLDEN_SIMPLE] + ["Mixed CASE 42x", "a--b  c"]
    con = duckdb.connect()
    for t in texts:
        sql = con.execute(
            "select list_filter(regexp_split_to_array(lower(?), '[^a-z0-9]+'), x -> x <> '')",
            [t],
        ).fetchone()[0]
        assert list(sql) == tokenize_text(t, "simple"), t


def test_arrow_fast_path_identical_to_re_reference():
    """The Arrow tokenizer must be byte-identical to the re-based
    reference on adversarial inputs (unicode, empties, nulls, camel
    edge shapes) in both modes."""
    import pandas as pd

    from lighthouse_spark.functions.analysis import (
        _tokenize_pandas_re,
        tokenize_pandas,
    )

    cases = pd.Series([
        "getUserName parseHTTPRequest2 now",
        "HTTPServerAPI XMLHttpRequest aXYb",
        "planètes 360 ès café",
        "", "   ", None,
        "snake_case-and.dots:colons/slashes",
        "ALLCAPS MiXeD123Case x",
        "ünïcödé ÀÉÎ déjà",
        "tabs\tnewlines\nand  doubles",
    ])
    for mode in ("simple", "code"):
        a = tokenize_pandas(cases, mode)
        b = _tokenize_pandas_re(cases, mode)
        assert list(a) == list(b), mode
