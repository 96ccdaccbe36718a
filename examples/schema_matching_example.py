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

# every column of the 5-column testdata customer table has a correct
# correspondence (two renamed, three identity) — the list is COMPLETE, so
# a perfect matcher scores precision = recall = 1.0
ground_truth = [
    ("c_custkey", "c_custkey"),
    ("c_name", "customer_name"),
    ("c_nationkey", "c_nationkey"),
    ("c_acctbal", "account_balance"),
    ("c_mktsegment", "c_mktsegment"),
]
print("metrics:", matches.get_metrics(ground_truth))
