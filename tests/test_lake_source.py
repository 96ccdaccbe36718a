"""lake_changes Python Data Source (streaming/lake_source.py): the
Structured-Streaming face of the lake changelog.

Core contract under test: for any offset window, the source's output equals
``LakeTable.changes(start, end)`` — on clean (COW), dirty (merge-on-read),
delete-heavy, and schema-evolved state — and Spark's checkpointed offset log
resumes it without loss or duplication.
"""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from valentine_spark.cdc import LakeTable, replay, synth_change_stream
from valentine_spark.streaming.lake_source import (
    LakeChangesStreamReader,
    register_lake_changes,
)


def _canon(pdf: pd.DataFrame) -> pd.DataFrame:
    pdf = pdf[sorted(pdf.columns)].astype(str)
    return pdf.sort_values(list(pdf.columns)).reset_index(drop=True)


def _assert_matches_changes(spark, lake, got_df, v0, v1):
    want = lake.changes(v0, v1).toPandas()
    got = got_df.toPandas() if not isinstance(got_df, pd.DataFrame) else got_df
    assert _canon(got).equals(_canon(want)), (
        f"source window v{v0}->v{v1}: {len(got)} rows vs changes() {len(want)}"
    )


def _reader_window_df(spark, lake, v0, v1):
    """Drive the reader's partitions()/read() directly (unit level) and
    assemble the window's output as a Spark DataFrame."""
    reader = LakeChangesStreamReader(
        _source_schema(lake), {"path": lake.root, "startingversion": str(v0)}
    )
    parts = reader.partitions({"version": v0}, {"version": v1})
    batches = [b for p in parts for b in reader.read(p)]
    if not batches:
        return spark.createDataFrame([], _source_schema(lake))
    pdf = pd.concat([b.to_pandas() for b in batches], ignore_index=True)
    return spark.createDataFrame(pdf, _source_schema(lake))


def _source_schema(lake):
    import pyspark.sql.types as T

    return T.StructType(
        [T.StructField("change_op", T.StringType(), False)]
        + list(lake.schema.fields)
    )


def test_reader_window_equals_changes_cow(spark, tmp_path):
    stream = synth_change_stream(spark, 4_000, 700, seed=101).cache()
    lake = LakeTable.create(str(tmp_path / "l"), spark, n_buckets=4)
    replay(lake, stream, batch_lsns=1_000, max_lsn=3_999)
    v = lake.version
    _assert_matches_changes(spark, lake, _reader_window_df(spark, lake, 0, v), 0, v)
    # interior window too (not just full history)
    _assert_matches_changes(spark, lake, _reader_window_df(spark, lake, 2, v), 2, v)


def test_reader_window_equals_changes_mor_dirty(spark, tmp_path):
    """Dirty merge-on-read buckets: the executor-side pyarrow resolution
    (max (version, liveness) per key) must agree with the lake's own."""
    stream = synth_change_stream(spark, 4_000, 600, seed=103).cache()
    lake = LakeTable.create(
        str(tmp_path / "l"), spark, n_buckets=4, write_mode="mor"
    )
    replay(lake, stream, batch_lsns=1_000, max_lsn=3_999)
    assert lake.metadata().get("dirty"), "fixture must exercise dirty buckets"
    v = lake.version
    _assert_matches_changes(spark, lake, _reader_window_df(spark, lake, 0, v), 0, v)
    _assert_matches_changes(spark, lake, _reader_window_df(spark, lake, 1, v - 1), 1, v - 1)


def test_reader_handles_deletes_and_evolution(spark, tmp_path):
    import pyspark.sql.types as T

    stream = synth_change_stream(
        spark, 3_000, 400, seed=107, delete_fraction=0.3
    ).cache()
    lake = LakeTable.create(str(tmp_path / "l"), spark, n_buckets=2)
    replay(lake, stream.where(F.col("lsn") < 1_500), batch_lsns=750, max_lsn=1_499)
    lake.evolve_schema([T.StructField("stars", T.LongType())], note="test")
    replay(
        lake,
        stream.where(F.col("lsn") >= 1_500),
        batch_lsns=750,
        batch_id_prefix="tail",
        max_lsn=2_999,
    )
    v = lake.version
    df = _reader_window_df(spark, lake, 0, v)
    assert "stars" in df.columns
    deletes = df.where(F.col("change_op") == "delete")
    assert deletes.where(F.col("content").isNotNull()).count() == 0
    _assert_matches_changes(spark, lake, df, 0, v)


def test_streaming_end_to_end_and_checkpoint_resume(spark, tmp_path):
    """The real readStream path: offsets advance through Spark's checkpoint,
    a restart delivers only post-stop commits, nothing twice."""
    register_lake_changes(spark)
    stream = synth_change_stream(spark, 3_000, 500, seed=109).cache()
    lake = LakeTable.create(str(tmp_path / "l"), spark, n_buckets=2)
    replay(lake, stream.where(F.col("lsn") < 2_000), batch_lsns=1_000, max_lsn=1_999)
    v_mid = lake.version

    ckpt = str(tmp_path / "ckpt")
    collected = []

    def run_once():
        q = (
            spark.readStream.format("lake_changes")
            .load(lake.root)
            .writeStream.foreachBatch(
                lambda df, bid: collected.append(df.toPandas())
            )
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    run_once()
    first = pd.concat(collected, ignore_index=True)
    _assert_matches_changes(
        spark, lake, spark.createDataFrame(first, _source_schema(lake)), 0, v_mid
    )

    collected.clear()
    replay(
        lake,
        stream.where(F.col("lsn") >= 2_000),
        batch_lsns=1_000,
        batch_id_prefix="tail",
        max_lsn=2_999,
    )
    run_once()
    second = pd.concat(collected, ignore_index=True) if collected else pd.DataFrame()
    assert len(second), "restart must deliver the post-stop window"
    _assert_matches_changes(
        spark,
        lake,
        spark.createDataFrame(second, _source_schema(lake)),
        v_mid,
        lake.version,
    )


def test_starting_version_latest(spark, tmp_path):
    stream = synth_change_stream(spark, 2_000, 300, seed=113).cache()
    lake = LakeTable.create(str(tmp_path / "l"), spark, n_buckets=2)
    replay(lake, stream, batch_lsns=1_000, max_lsn=1_999)
    reader = LakeChangesStreamReader(
        _source_schema(lake), {"path": lake.root, "startingversion": "latest"}
    )
    assert reader.initialOffset() == {"version": lake.version}
    assert reader.partitions(reader.initialOffset(), reader.latestOffset()) == []
