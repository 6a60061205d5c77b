"""lighthouse_spark — a PySpark-native fulltext index + BM25 query engine.

A from-scratch re-expression of the capabilities of shyba/lighthouse
(an Elasticsearch 6.6-backed search API for LBRY claims) as an idiomatic
PySpark engine: inverted-index construction as DataFrame jobs, BM25
(k1=1.2, b=0.75 — the ES 6.x default similarity) ranked retrieval with
function-score boosts, phrase/prefix/fuzzy matching, incremental
upsert/delete sync, plus the large-scale training-data-pipeline
operators (dedup, ANN, text analysis, multimodal plumbing).

Nothing here is ported from the reference's Go code; the reference
(cited per-module as /root/reference/<file>:<line>) defines WHAT is
computed, not HOW.
"""

__version__ = "0.1.0"

from lighthouse_spark.session import get_spark  # noqa: F401
