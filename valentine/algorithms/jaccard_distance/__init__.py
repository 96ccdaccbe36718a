from valentine_spark.matchers.jaccard import (  # noqa: F401
    JaccardDistanceMatcher,
    StringDistanceFunction,
)
