"""LakeTable — an Iceberg-style copy-on-write table on bucket-partitioned
parquet, with atomic snapshot metadata, MERGE upsert, exactly-once commit
manifests and per-bucket high watermarks.

Why not the Iceberg runtime itself: the sandbox ships no Iceberg jars; this
implements the same table-format mechanics at the API level so the engine's
semantics (snapshot isolation, idempotent commits, partition-pruned MERGE,
schema evolution, time travel) are real and tested.  On a cluster with the
Iceberg catalog the ``merge()`` body maps 1:1 onto ``MERGE INTO target USING
updates ON t.repo=u.repo AND t.path=u.path AND t.commit=u.commit WHEN MATCHED
[AND op='delete' THEN DELETE | THEN UPDATE SET *] WHEN NOT MATCHED AND
op!='delete' THEN INSERT *`` plus a snapshot-property stamp for the batch id
(SURVEY.md §2.3 note on MERGE).

Layout::

    root/
      metadata/v{N}.json      # snapshot: schema, bucket -> data dir,
                              # applied_batches, per-bucket watermarks, lineage
      metadata/CURRENT        # atomic pointer (os.replace)
      data/v{N}/bucket=.../   # only buckets CHANGED by commit N

Correctness argument for exactly-once: all commit state (which batches are
applied, watermarks, live files) lives in ONE metadata file installed with an
atomic rename.  A crash before the rename leaves orphan data files but an
unchanged table; re-running the batch is a no-op once its batch_id is in
``applied_batches``.

Scale: MERGE touches only the buckets named by the update set (hash-pruned
scan on both sides); each bucket rewrite is a shuffle-free co-partitioned
anti-join + union; bucket count is the unit of write parallelism (default 64,
size for ~1 GB/bucket at target scale).
"""

from __future__ import annotations

import json
import os
import time
import uuid
from typing import Dict, List, Optional

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql import types as T

from .generator import KEY_COLS

# Bench hook (see BENCH/scaling_run.py): when set to a list, merge() appends
# ("<label>", seconds) for its two phases — "merge_write" (the distributed
# read+anti-join+write job) and "commit_io" (driver-side manifest JSON) — so
# the scaling harness can decompose wall time into the parallel part and the
# per-batch serial driver part for the Amdahl analysis.
MERGE_TIMINGS: Optional[list] = None

BUCKET_COL = "_bucket"


def bucket_expr(n_buckets: int) -> F.Column:
    """Bucket on (repo, path): spreads hot repos across buckets by path while
    keeping every (repo,path,commit) key in exactly one bucket."""
    return F.pmod(F.xxhash64(F.col("repo"), F.col("path")), F.lit(n_buckets))


class LakeTable:
    def __init__(self, root: str, spark: SparkSession):
        self.root = root
        self.spark = spark

    # -- creation / metadata -------------------------------------------

    @classmethod
    def create(
        cls,
        root: str,
        spark: SparkSession,
        schema: Optional[T.StructType] = None,
        n_buckets: int = 64,
    ) -> "LakeTable":
        if schema is not None and not isinstance(schema, T.StructType):
            raise TypeError(
                f"schema must be a StructType, got {type(schema).__name__} "
                "(did you mean n_buckets=...?)"
            )
        os.makedirs(os.path.join(root, "metadata"), exist_ok=True)
        os.makedirs(os.path.join(root, "data"), exist_ok=True)
        table = cls(root, spark)
        meta = {
            "version": 0,
            "n_buckets": n_buckets,
            "schema": (schema or _default_schema()).json(),
            "buckets": {},  # bucket id (str) -> data dir relative path
            "applied_batches": [],
            "watermarks": {},  # bucket id (str) -> max applied lsn
            "lineage": [],  # per-commit audit entries (incl. drift mappings)
        }
        table._write_metadata(meta)
        return table

    def _meta_path(self, version: int) -> str:
        return os.path.join(self.root, "metadata", f"v{version}.json")

    def _current_path(self) -> str:
        return os.path.join(self.root, "metadata", "CURRENT")

    def metadata(self, version: Optional[int] = None) -> dict:
        if version is None:
            with open(self._current_path()) as fh:
                version = int(fh.read().strip())
        with open(self._meta_path(version)) as fh:
            return json.load(fh)

    def _write_metadata(self, meta: dict) -> None:
        path = self._meta_path(meta["version"])
        tmp = path + f".tmp.{uuid.uuid4().hex}"
        with open(tmp, "w") as fh:
            json.dump(meta, fh)
        os.replace(tmp, path)
        cur_tmp = self._current_path() + f".tmp.{uuid.uuid4().hex}"
        with open(cur_tmp, "w") as fh:
            fh.write(str(meta["version"]))
        os.replace(cur_tmp, self._current_path())

    @property
    def schema(self) -> T.StructType:
        return T.StructType.fromJson(json.loads(self.metadata()["schema"]))

    @property
    def version(self) -> int:
        return self.metadata()["version"]

    def applied_batches(self) -> List[str]:
        return list(self.metadata()["applied_batches"])

    def watermarks(self) -> Dict[int, int]:
        return {int(k): v for k, v in self.metadata()["watermarks"].items()}

    # -- reads -----------------------------------------------------------

    def read(self, version: Optional[int] = None, buckets: Optional[List[int]] = None) -> DataFrame:
        """Snapshot read; ``buckets`` prunes to the named buckets (the MERGE
        fast path).  Returns an empty frame of the table schema when nothing
        has been written yet."""
        meta = self.metadata(version)
        bucket_map = meta["buckets"]
        wanted = bucket_map if buckets is None else {
            str(b): bucket_map[str(b)] for b in buckets if str(b) in bucket_map
        }
        schema = T.StructType.fromJson(json.loads(meta["schema"]))
        if not wanted:
            with_bucket = T.StructType(list(schema.fields) + [T.StructField(BUCKET_COL, T.LongType())])
            return self.spark.createDataFrame([], with_bucket)
        dirs = sorted({os.path.join(self.root, rel) for rel in wanted.values()})
        df = self.spark.read.option("basePath", os.path.join(self.root, "data")).parquet(*dirs)
        if buckets is not None:
            df = df.where(F.col(BUCKET_COL).isin([int(b) for b in wanted]))
        # project to schema order, add columns added by schema evolution
        cols = [
            F.col(f.name) if f.name in df.columns else F.lit(None).cast(f.dataType).alias(f.name)
            for f in schema.fields
        ]
        return df.select(*cols, F.col(BUCKET_COL))

    # -- MERGE -----------------------------------------------------------

    def merge(
        self,
        upserts: DataFrame,
        deletes: DataFrame,
        batch_id: str,
        batch_watermarks: Optional[Dict[int, int]] = None,
        lineage: Optional[dict] = None,
        changed_buckets: Optional[List[int]] = None,
    ) -> dict:
        """Key-partitioned MERGE: ``upserts`` (full rows, one per key) replace
        or insert; ``deletes`` (key rows) remove.  Exactly one row per key per
        call (callers run LWW dedup first).  Idempotent under ``batch_id``.

        Returns the commit summary dict (also appended to lineage)."""
        meta = self.metadata()
        if batch_id in meta["applied_batches"]:
            return {"batch_id": batch_id, "skipped": True, "version": meta["version"]}

        n_buckets = meta["n_buckets"]
        schema_cols = [f.name for f in self.schema.fields]

        # upserts/deletes are re-read by the bucket scan, the touched-key
        # anti-join and the final write; no explicit persist — the upstream
        # LWW aggregation's shuffle files are reused across those jobs
        # (Spark exchange reuse), and measured end-to-end an explicit
        # MEMORY_AND_DISK persist here was ~35% slower.
        upserts = upserts.withColumn(BUCKET_COL, bucket_expr(n_buckets))
        deletes = deletes.withColumn(BUCKET_COL, bucket_expr(n_buckets))
        if changed_buckets is not None:
            changed = sorted(int(b) for b in changed_buckets)
        else:
            changed = sorted(
                r[BUCKET_COL]
                for r in upserts.select(BUCKET_COL)
                .union(deletes.select(BUCKET_COL))
                .distinct()
                .collect()
            )
        new_version = meta["version"] + 1
        commit = {
            "batch_id": batch_id,
            "version": new_version,
            "changed_buckets": changed,
            "ts": time.time(),
        }
        if lineage:
            commit.update(lineage)

        _t_write0 = time.time()
        if changed:
            current = self.read(buckets=changed)
            touched_keys = (
                upserts.select(*KEY_COLS, BUCKET_COL)
                .union(deletes.select(*KEY_COLS, BUCKET_COL))
                .distinct()
            )
            # co-partitioned anti-join: survivors = current rows whose key is
            # NOT touched by this batch
            survivors = current.join(touched_keys, [*KEY_COLS, BUCKET_COL], "left_anti")
            merged = survivors.select(*schema_cols, BUCKET_COL).unionByName(
                upserts.select(*schema_cols, BUCKET_COL)
            )
            rel_dir = os.path.join("data", f"v{new_version}")
            out_dir = os.path.join(self.root, rel_dir)
            (
                merged.repartition(max(len(changed), 1), F.col(BUCKET_COL))
                .write.mode("overwrite")
                .partitionBy(BUCKET_COL)
                .parquet(out_dir)
            )
            bucket_map = dict(meta["buckets"])
            for b in changed:
                bdir = os.path.join(out_dir, f"{BUCKET_COL}={b}")
                if os.path.isdir(bdir):
                    bucket_map[str(b)] = os.path.join(rel_dir, f"{BUCKET_COL}={b}")
                else:
                    bucket_map.pop(str(b), None)  # bucket emptied by deletes
        else:
            bucket_map = dict(meta["buckets"])
        if MERGE_TIMINGS is not None:
            MERGE_TIMINGS.append(("merge_write", time.time() - _t_write0))

        watermarks = dict(meta["watermarks"])
        for b, lsn in (batch_watermarks or {}).items():
            watermarks[str(b)] = max(watermarks.get(str(b), -1), int(lsn))

        new_meta = {
            **meta,
            "version": new_version,
            "buckets": bucket_map,
            "applied_batches": meta["applied_batches"] + [batch_id],
            "watermarks": watermarks,
            "lineage": meta["lineage"] + [commit],
        }
        _t_io0 = time.time()
        self._write_metadata(new_meta)
        if MERGE_TIMINGS is not None:
            MERGE_TIMINGS.append(("commit_io", time.time() - _t_io0))
        return commit

    def evolve_schema(self, new_fields: List[T.StructField], note: str) -> None:
        """Additive schema evolution: append columns; existing data serves
        nulls for them (projection handled at read)."""
        meta = self.metadata()
        schema = T.StructType.fromJson(json.loads(meta["schema"]))
        existing = {f.name for f in schema.fields}
        added = [f for f in new_fields if f.name not in existing]
        if not added:
            return
        new_schema = T.StructType(list(schema.fields) + added)
        meta["version"] += 1
        meta["schema"] = new_schema.json()
        meta["lineage"] = meta["lineage"] + [
            {"schema_evolution": [f.name for f in added], "note": note, "version": meta["version"]}
        ]
        self._write_metadata(meta)

    # -- integrity --------------------------------------------------------

    def state_checksum(self) -> dict:
        """Order-insensitive table-state checksum: row count + sum of the
        first 15 hex digits of sha256(repo|path|commit|content) per row —
        computed entirely JVM-side; identical across any partitioning."""
        df = self.read()
        if not df.columns:
            return {"rows": 0, "checksum": 0}
        row_hash = F.sha2(
            F.concat_ws("\x1f", F.col("repo"), F.col("path"), F.col("commit"),
                        F.coalesce(F.col("content"), F.lit(""))),
            256,
        )
        agg = df.select(
            F.count(F.lit(1)).alias("rows"),
            F.sum(F.conv(F.substring(row_hash, 1, 15), 16, 10).cast("decimal(38,0)")).alias("checksum"),
        ).collect()[0]
        return {"rows": agg["rows"], "checksum": int(agg["checksum"] or 0)}


def _default_schema() -> T.StructType:
    return T.StructType(
        [
            T.StructField("repo", T.StringType()),
            T.StructField("path", T.StringType()),
            T.StructField("commit", T.StringType()),
            T.StructField("lang", T.StringType()),
            T.StructField("content", T.StringType()),
        ]
    )
