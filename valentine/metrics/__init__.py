from valentine_spark.metrics import *  # noqa: F401,F403
from valentine_spark.metrics import (  # noqa: F401
    METRICS_ALL,
    METRICS_CORE,
    METRICS_PRECISION_INCREASING_N,
    METRICS_PRECISION_RECALL,
)
