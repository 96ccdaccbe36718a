from valentine_spark.results import MatcherResults  # noqa: F401
