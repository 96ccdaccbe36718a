from valentine_spark.metrics import get_fp, get_tp_fn  # noqa: F401
