from lighthouse_spark.api.request import AutoCompleteRequest, SearchRequest  # noqa: F401
from lighthouse_spark.api.engine import SearchEngine  # noqa: F401
