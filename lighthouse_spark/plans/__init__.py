from lighthouse_spark.plans.indexer import FieldSpec, InvertedIndex, build_index  # noqa: F401
