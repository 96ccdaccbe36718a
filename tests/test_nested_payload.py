"""Nested/complex payload columns (struct, array, map) through the whole
lake surface: explicit read schemas, MoR resolution's max_by struct
payload, the changelog's null-safe fingerprint, compaction and point
lookup all handle non-atomic column types — nothing in the engine
assumes flat strings beyond the key columns."""

from pyspark.sql import functions as F
from pyspark.sql import types as T

from valentine_spark.cdc import LakeTable

SCHEMA = T.StructType(
    [
        T.StructField("repo", T.StringType()),
        T.StructField("path", T.StringType()),
        T.StructField("commit", T.StringType()),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("stars", T.IntegerType()),
                    T.StructField("tags", T.ArrayType(T.StringType())),
                ]
            ),
        ),
        T.StructField("attrs", T.MapType(T.StringType(), T.LongType())),
    ]
)


def test_nested_payload_through_merge_mor_changes_compact(spark, tmp_path):
    lake = LakeTable.create(
        str(tmp_path / "n"), spark, schema=SCHEMA, n_buckets=2, target_file_rows=50
    )
    rows = spark.range(200).select(
        F.lit("r").alias("repo"),
        F.concat(F.lit("p"), F.col("id")).alias("path"),
        F.lit("head").alias("commit"),
        F.struct(
            F.col("id").cast("int").alias("stars"),
            F.array(F.lit("a"), F.lit("b")).alias("tags"),
        ).alias("meta"),
        F.create_map(F.lit("k"), F.col("id")).alias("attrs"),
    )
    empty = spark.createDataFrame([], "repo string, path string, commit string")
    lake.merge(rows, empty, "b1")
    assert lake.read().count() == 200
    v1 = lake.version

    upd = rows.limit(40).withColumn(
        "meta",
        F.struct(F.lit(999).alias("stars"), F.array(F.lit("z")).alias("tags")),
    )
    lake.merge(upd, empty, "b2", mode="mor")  # MoR: nested max_by payload
    assert lake.read().where("meta.stars = 999").count() == 40
    ch = lake.changes(v1)
    assert ch.where("change_op = 'update'").count() == 40
    assert ch.where("meta.stars = 999").count() == 40
    assert ch.where("change_op = 'insert' OR change_op = 'delete'").count() == 0

    lake.compact()
    assert lake.read().where("meta.stars = 999").count() == 40
    got = lake.lookup([("r", "p0", "head")]).collect()[0]
    assert got["meta"]["stars"] == 999 and got["meta"]["tags"] == ["z"]
    assert got["attrs"]["k"] == 0
    # rename of a nested-typed top-level column era-maps like any other
    lake.rename_column("meta", "metadata")
    assert lake.read().where("metadata.stars = 999").count() == 40
    # merge INTO the renamed multi-era table with nested SET
    src = spark.createDataFrame(
        [("r", "p0", "head")], "repo string, path string, commit string"
    )
    (
        lake.merge_into(src)
        .when_matched_update(
            {"metadata": F.struct(F.lit(1).alias("stars"), F.array().cast(
                "array<string>").alias("tags"))}
        )
        .execute()
    )
    assert lake.lookup([("r", "p0", "head")]).collect()[0]["metadata"]["stars"] == 1
