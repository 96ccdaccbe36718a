"""Schema-matching walkthrough (mirrors the reference's examples/
valentine_example.py usage shape on Spark)."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession

import valentine_spark as V

spark = SparkSession.builder.master("local[4]").appName("example").getOrCreate()

df1 = spark.read.parquet("/root/testdata/sf0.001/customer.parquet")
df2 = (
    df1.withColumnRenamed("c_name", "customer_name")
    .withColumnRenamed("c_acctbal", "account_balance")
)

matcher = V.JaccardDistanceMatcher(distance_fun=V.StringDistanceFunction.Exact)
matches = V.valentine_match(df1, df2, matcher, "customer", "drifted")

print("matches:")
for pair, sim in matches.one_to_one().items():
    print(f"  {pair} -> {sim:.3f}")

# every customer column has a correct correspondence (two renamed, six
# identity) — an incomplete list would make the metrics report false
# positives for a perfect matcher
ground_truth = [
    ("c_custkey", "c_custkey"),
    ("c_name", "customer_name"),
    ("c_address", "c_address"),
    ("c_nationkey", "c_nationkey"),
    ("c_phone", "c_phone"),
    ("c_acctbal", "account_balance"),
    ("c_mktsegment", "c_mktsegment"),
    ("c_comment", "c_comment"),
]
print("metrics:", matches.get_metrics(ground_truth))
