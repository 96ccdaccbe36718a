"""``writeStream.format("lake")`` — a PySpark 4 Python Data Source streaming
SINK (SPARK-44076 write path) that makes a :class:`~valentine_spark.cdc.lake.
LakeTable` a first-class, exactly-once Structured Streaming destination:

    from valentine_spark.streaming.lake_sink import prepare_lake_sink
    q = (prepare_lake_sink(changes_df, dst_root)
         .writeStream.format("lake")
         .option("path", dst_root)
         .option("checkpointLocation", ckpt)
         .start())

Composed with the ``lake_changes`` streaming SOURCE (``streaming/
lake_source.py``) this closes the loop: a lake-to-lake mirror becomes one
declarative Spark pipeline —

    src = spark.readStream.format("lake_changes").load(src_root)
    prepare_lake_sink(src, dst_root).writeStream.format("lake")...

with Spark's own checkpoint carrying the source offset and the sink's
applied-batch-id manifest de-duplicating replays (end-to-end exactly-once,
the same contract ``cdc/follow.py`` implements imperatively).

Input contract: the stream must carry the target table's full column set
(exact names; ``prepare_lake_sink`` casts to the exact types), an optional
``change_op`` column (``delete`` ⇒ key tombstone; anything else / absent ⇒
upsert — the ``lake_changes`` vocabulary), and the three sink bookkeeping
columns ``prepare_lake_sink`` adds JVM-side: ``_bucket`` / ``_khash``
(``bucket_expr`` / ``khash_expr`` — Spark ``xxhash64`` expressions that a
Python task could not cheaply recompute) and ``_n_buckets`` (the layout the
plan's bucket ids were computed under; every task asserts it against the
writer's pinned layout, closing the plan-built-then-table-rebucketed race).
At most ONE row per (repo, path, commit) key per micro-batch — the natural
shape of a ``lake_changes`` batch (a two-snapshot diff is per-key unique) or
of any LWW-reduced delivery (``cdc/apply.py``); two same-key rows in one
batch land at the same commit version, whose read-time resolution order is
unspecified (the same contract as ``LakeTable.merge``).

Execution shape (scale story):

* ``write(iterator[RecordBatch])`` runs on EXECUTORS, Arrow end-to-end
  (:class:`DataSourceStreamArrowWriter` — no per-row Python, no Spark Rows):
  one (bucket, khash) sort of the task's batches, contiguous bucket runs
  sliced into khash-sorted parquet files of at most ``target_file_rows``
  rows, delete keys into tombstone files, and per-file footer stats
  (khash bounds + ``stats_cols`` bounds — ``_footer_stat``, the exact
  entry shape ``_new_file_stats`` collects) computed WHERE THE FILE WAS
  WRITTEN.  The commit never re-reads data: stats travel in the commit
  messages, so the driver's work is O(files) dict assembly — there is no
  footer-walk floor at all, better than the COW path's distributed
  footer pass (round-3 VERDICT ask #1 lineage).
* ``commit(messages, batchId)`` runs on the DRIVER's Python worker with NO
  SparkSession — by design: the install is ``LakeTable._install_mor_entries``
  (shared with ``_merge_mor``), pure JSON/file I/O ending in the
  put-if-absent snapshot CAS.  Each micro-batch is one merge-on-read
  commit: O(batch) bytes written, zero read amplification, buckets go
  dirty and ``compact_if_needed`` folds them back — the same bounded
  maintenance story as MoR MERGE (BENCH §2d).
* Exactly-once: the batch id is ``{sinkId}#{batchId}`` (``sinkId`` option,
  defaulting to a hash of ``checkpointLocation`` — stable across restarts,
  distinct across queries).  A crash after commit but before Spark's
  checkpoint advances replays the batch; ``is_applied`` skips the replay
  and the re-staged files are unreferenced debris for
  ``remove_orphan_files``.  ``abort`` deletes the staged files eagerly.

Natural alignment: when source and target share ``n_buckets`` (the mirror
case), each ``lake_changes`` partition holds exactly one target bucket, so
each task writes one file per batch with NO extra shuffle.  For foreign
sources, repartition by ``_bucket`` upstream (or let ``compact_if_needed``
fold the extra per-task files).

Divergences to know about: the writer pins the table's schema and bucket
layout at query start — a concurrent ``evolve_schema``/``rename_column``/
``widen_column``/``rebucket`` on the target fails the query's next commit
with ``CommitConflictError`` (restart re-pins; identical to ``_merge_mor``'s
rebase rule and to the fixed-schema semantics of the ``lake_changes``
source).  Parquet bloom filters (``bloom_cols``) are written when the
installed pyarrow supports ``bloom_filter_columns``; otherwise sink-written
files simply don't bloom-skip (correctness unaffected) until ``compact()``
rewrites them through the Spark writer.

No reference counterpart; new construction (SURVEY.md §2.8 / §2.12).
"""

from __future__ import annotations

import hashlib
import json
import os
import shutil
import time
import uuid
from dataclasses import dataclass, field
from typing import Dict, Iterator, List, Optional, Tuple

from pyspark.sql import DataFrame, functions as F
from pyspark.sql import types as T
from pyspark.sql.datasource import (
    DataSourceStreamArrowWriter,
    WriterCommitMessage,
)

from valentine_spark.cdc.lake import (
    BUCKET_COL,
    KHASH_COL,
    KEY_COLS,
    LakeTable,
    CommitConflictError,
    bucket_expr,
    khash_expr,
    _footer_stat,
)
from valentine_spark.streaming.lake_source import _read_meta

_NB_COL = "_n_buckets"
_UPSERT_SCHEMA_TAIL = [BUCKET_COL, KHASH_COL, _NB_COL]


def prepare_lake_sink(df: DataFrame, root: str) -> DataFrame:
    """Project ``df`` into the ``lake`` sink's input contract against the
    table at ``root``: the table's columns cast to their exact types (plus
    ``change_op`` when present), and the JVM-computed ``_bucket`` /
    ``_khash`` / ``_n_buckets`` bookkeeping columns.  Works on batch and
    streaming frames alike (pure column projection)."""
    meta = _read_meta(root)
    tschema = T.StructType.fromJson(json.loads(meta["schema"]))
    missing = [f.name for f in tschema.fields if f.name not in df.columns]
    if missing:
        raise KeyError(
            f"stream is missing target table column(s) {missing}; the lake "
            "sink needs the full current schema (evolve the query, not the "
            "batch)"
        )
    cols = []
    if "change_op" in df.columns:
        cols.append(F.col("change_op").cast("string").alias("change_op"))
    cols += [F.col(f.name).cast(f.dataType).alias(f.name) for f in tschema.fields]
    n = int(meta["n_buckets"])
    return df.select(
        *cols,
        bucket_expr(n).alias(BUCKET_COL),
        khash_expr().alias(KHASH_COL),
        F.lit(n).cast("int").alias(_NB_COL),
    )


@dataclass
class LakeSinkCommitMessage(WriterCommitMessage):
    """Per-task result: the staged manifest entries (stats computed
    executor-side) plus the staging dirs for abort cleanup."""

    files: List[Tuple[int, dict]] = field(default_factory=list)
    tombs: List[Tuple[int, dict]] = field(default_factory=list)
    staged_dirs: List[str] = field(default_factory=list)
    rows: int = 0
    deletes: int = 0


class LakeStreamWriter(DataSourceStreamArrowWriter):
    """See module docstring.  Constructed on the driver at query start
    (pins layout + schema), pickled to executors per micro-batch."""

    def __init__(self, schema: T.StructType, options: dict):
        options = {k.lower(): v for k, v in options.items()}
        self.root = options.get("path")
        if not self.root:
            raise ValueError('lake sink requires .option("path", <lake root>)')
        meta = _read_meta(self.root)
        self.n_buckets = int(meta["n_buckets"])
        self.schema_json = meta["schema"]  # pinned; compared as a string at commit
        self.stats_cols = list(meta.get("stats_cols") or [])
        self.bloom_cols = list(meta.get("bloom_cols") or [])
        self.target_file_rows = int(meta.get("target_file_rows", 1_000_000))
        sink_id = options.get("sinkid")
        if not sink_id:
            ckpt = options.get("checkpointlocation")
            if not ckpt:
                raise ValueError(
                    'lake sink needs .option("sinkId", <stable id>) or a '
                    '.option("checkpointLocation", ...) to derive one from — '
                    "the exactly-once batch ids must survive query restarts"
                )
            sink_id = "ckpt-" + hashlib.md5(
                os.path.abspath(ckpt).encode()
            ).hexdigest()[:16]
        self.sink_id = sink_id
        self._validate_input_schema(schema)
        self.has_op = "change_op" in schema.fieldNames()
        tschema = T.StructType.fromJson(json.loads(self.schema_json))
        self.table_cols = [f.name for f in tschema.fields]

    def _validate_input_schema(self, schema: T.StructType) -> None:
        tschema = T.StructType.fromJson(json.loads(self.schema_json))
        expect = {f.name: f.dataType for f in tschema.fields}
        got = {f.name: f.dataType for f in schema.fields}
        for c in _UPSERT_SCHEMA_TAIL:
            if c not in got:
                raise ValueError(
                    f"lake sink input lacks {c!r} — wrap the stream in "
                    "prepare_lake_sink(df, root) (bucket/khash are JVM "
                    "xxhash64 exprs; the Python writer cannot recompute them)"
                )
        extra = set(got) - set(expect) - set(_UPSERT_SCHEMA_TAIL) - {"change_op"}
        if extra:
            raise ValueError(
                f"lake sink input has column(s) {sorted(extra)} not in the "
                "target table schema; project them away (prepare_lake_sink "
                "does)"
            )
        for name, dt in expect.items():
            if name not in got:
                raise ValueError(
                    f"lake sink input lacks table column {name!r}; the sink "
                    "needs the full current schema"
                )
            if got[name] != dt:
                raise ValueError(
                    f"lake sink input column {name!r} is {got[name].simpleString()} "
                    f"but the table expects {dt.simpleString()} — use "
                    "prepare_lake_sink (it casts)"
                )

    # -- executor side -------------------------------------------------------

    def write(self, iterator: Iterator) -> LakeSinkCommitMessage:
        import numpy as np
        import pyarrow as pa
        import pyarrow.parquet as pq

        batches = [b for b in iterator if b.num_rows]
        msg = LakeSinkCommitMessage()
        if not batches:
            return msg
        tbl = pa.Table.from_batches(batches)
        nb = tbl.column(_NB_COL).to_numpy(zero_copy_only=False)
        if len(nb) and (int(nb.min()) != self.n_buckets or int(nb.max()) != self.n_buckets):
            raise ValueError(
                f"rows carry bucket ids for n_buckets={int(nb[0])} but the "
                f"writer pinned n_buckets={self.n_buckets} at query start — "
                "the table was rebucketed between plan construction and "
                "query start; rebuild the query (re-run prepare_lake_sink)"
            )
        rel_dir = f"data/s-{uuid.uuid4().hex}"
        out_dir = os.path.join(self.root, rel_dir)
        msg.staged_dirs.append(rel_dir)

        if self.has_op:
            import pyarrow.compute as pc

            is_del = pc.fill_null(
                pc.equal(tbl.column("change_op"), pa.scalar("delete")), False
            )
            dels = tbl.filter(is_del)
            ups = tbl.filter(pc.invert(is_del))
        else:
            dels, ups = tbl.slice(0, 0), tbl

        def _emit(part: pa.Table, cols: List[str], sub: str, kind: str,
                  out: List[Tuple[int, dict]]) -> None:
            if part.num_rows == 0:
                return
            part = part.sort_by([(BUCKET_COL, "ascending"), (KHASH_COL, "ascending")])
            buckets = part.column(BUCKET_COL).to_numpy(zero_copy_only=False)
            body = part.select(cols + [KHASH_COL])
            # contiguous runs of one bucket -> one or more files each
            starts = np.flatnonzero(np.r_[True, buckets[1:] != buckets[:-1]])
            bounds = np.r_[starts, len(buckets)]
            scols = self.stats_cols if kind == "data" else None
            for i, s in enumerate(starts):
                e = bounds[i + 1]
                b = int(buckets[s])
                bdir = os.path.join(out_dir, sub, f"{BUCKET_COL}={b}")
                os.makedirs(bdir, exist_ok=True)
                for j, off in enumerate(range(s, e, self.target_file_rows)):
                    chunk = body.slice(off, min(self.target_file_rows, e - off))
                    path = os.path.join(bdir, f"part-{j:05d}.parquet")
                    pq.write_table(chunk, path, **_bloom_kw(self.bloom_cols, cols))
                    p, mn, mx, rows, nbytes, col_bounds = _footer_stat(path, scols)
                    entry = {
                        "path": os.path.relpath(p, self.root),
                        "min_h": int(mn) if mn is not None else -(1 << 63),
                        "max_h": int(mx) if mx is not None else (1 << 63) - 1,
                        "rows": rows,
                        "bytes": nbytes,
                    }
                    if col_bounds:
                        entry["cols"] = col_bounds
                    if kind != "data":
                        entry["kind"] = kind
                    out.append((b, entry))

        _emit(ups, self.table_cols, "", "data", msg.files)
        _emit(dels, KEY_COLS, "_tombs", "tomb", msg.tombs)
        msg.rows = ups.num_rows
        msg.deletes = dels.num_rows
        return msg

    # -- driver side (Python worker, no SparkSession) -------------------------

    def commit(self, messages: List[Optional[LakeSinkCommitMessage]], batchId: int) -> None:
        table = LakeTable(self.root, None)
        meta = table.metadata()
        if int(meta["n_buckets"]) != self.n_buckets:
            raise CommitConflictError(
                "target table was rebucketed while the stream ran — restart "
                "the query (staged bucket ids are stale)"
            )
        if meta["schema"] != self.schema_json:
            raise CommitConflictError(
                "target table schema evolved while the stream ran — restart "
                "the query to pick up the new schema"
            )
        batch_id = f"{self.sink_id}#{batchId}"
        if table.is_applied(batch_id, meta):
            return  # replayed batch (crash between commit and checkpoint)
        new_files: Dict[int, List[dict]] = {}
        tomb_files: Dict[int, List[dict]] = {}
        rows = deletes = 0
        for m in messages:
            if m is None:
                continue
            for b, e in m.files:
                new_files.setdefault(b, []).append(e)
            for b, e in m.tombs:
                tomb_files.setdefault(b, []).append(e)
            rows += m.rows
            deletes += m.deletes
        changed = sorted(set(new_files) | set(tomb_files))
        commit = {
            "batch_id": batch_id,
            "changed_buckets": changed,
            "mode": "stream",
            "stream_batch": int(batchId),
            "files_rewritten": 0,
            "bytes_rewritten": 0,
            "rows_upserted": rows,
            "rows_deleted": deletes,
            "tomb_files": sum(len(v) for v in tomb_files.values()),
            "files_written": sum(len(v) for v in new_files.values())
            + sum(len(v) for v in tomb_files.values()),
            "bytes_written": sum(
                e["bytes"] for fs in (new_files, tomb_files)
                for es in fs.values() for e in es
            ),
            "ts": time.time(),
        }
        table._install_mor_entries(meta, new_files, tomb_files, batch_id, commit)

    def abort(self, messages: List[Optional[LakeSinkCommitMessage]], batchId: int) -> None:
        for m in messages or []:
            if m is None:
                continue
            for rel in m.staged_dirs:
                shutil.rmtree(os.path.join(self.root, rel), ignore_errors=True)


def _bloom_kw(bloom_cols: List[str], present: List[str]) -> dict:
    """Bloom-filter kwargs for ``pyarrow.parquet.write_table`` when this
    pyarrow supports them (older ones simply skip — read correctness is
    unaffected, files just aren't bloom-skippable until compaction)."""
    cols = [c for c in bloom_cols if c in present]
    if not cols:
        return {}
    import inspect

    import pyarrow.parquet as pq

    if "bloom_filter_columns" in inspect.signature(pq.ParquetWriter.__init__).parameters:
        return {"bloom_filter_columns": cols}
    return {}
