from lighthouse_spark.functions.analysis import (  # noqa: F401
    tokenize_pandas,
    tokenize_text,
    tokenize_udf,
)
