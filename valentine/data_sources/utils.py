from valentine_spark.sources.csv import get_delimiter, get_encoding  # noqa: F401
from valentine_spark.types import is_date  # noqa: F401
