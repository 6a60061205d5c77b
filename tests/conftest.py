from __future__ import annotations

import pytest

from lighthouse_spark import get_spark
from lighthouse_spark.plans.indexer import FieldSpec, build_index
from lighthouse_spark.sources.corpus import synthetic_corpus

N_DOCS = 300


@pytest.fixture(scope="session")
def spark():
    s = get_spark("lighthouse-tests", cpus=8, shuffle_partitions=8)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def docs(spark):
    return synthetic_corpus(spark, N_DOCS).cache()


@pytest.fixture(scope="session")
def docs_pd(docs):
    return docs.toPandas()


@pytest.fixture(scope="session")
def index(spark, docs):
    return build_index(
        docs,
        "doc_id",
        {
            "content": FieldSpec("content", positions=True),
            "path": FieldSpec("path", positions=True),
            "repo": FieldSpec("repo"),
        },
        mode="code",
    ).cache()
