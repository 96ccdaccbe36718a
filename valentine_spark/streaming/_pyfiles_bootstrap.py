"""Bootstrap shims that make the lake streaming source/sink usable from a
``spark-submit --py-files`` deployment.

Spark 4.1 gap (verified empirically; regression-tested by
``tests/test_spark_submit.py``): the driver-side Python workers that plan
STREAMING data sources (``pyspark/sql/streaming/python_streaming_source_
runner.py`` and ``pyspark/sql/worker/python_streaming_sink_runner.py``)
call ``worker_util.setup_spark_files`` but are handed no py-files includes,
so they unpickle the registered ``DataSource`` with the session's
``--py-files`` zips absent from ``sys.path``.  The BATCH planner workers
(``create_data_source.py``, ``plan_data_source_read.py``) and ordinary
executor tasks DO receive the includes.  Net effect: a DataSource class
that lives in a py-files zip reads fine as a batch source but dies with
``ModuleNotFoundError: valentine_spark`` the moment it is used as a stream
source or sink.

Fix, contained entirely in this module (imported by ``register_lake`` /
``register_lake_changes`` and nothing else):

* This module registers ITSELF pickle-by-value with pyspark's vendored
  cloudpickle at import time, so the shim classes below serialize with
  their own code attached and unpickle with no valentine_spark import.
* The shims subclass only ``pyspark.sql.datasource.DataSource`` (always
  importable in a Spark python worker) and delegate every capability to
  the real implementation, lazily imported AFTER :func:`_ensure_importable`
  has repaired ``sys.path`` from the worker's SparkFiles root — which is
  where ``--py-files`` artifacts are materialized, and which
  ``setup_spark_files`` communicates to every worker including the
  streaming runners.  Once the repair runs, all later by-reference pickles
  landing in the same worker process (stream readers, commit messages)
  resolve normally.

Everything here is plain public PySpark mechanics; no reference
counterpart (SURVEY.md §2.8 / §2.12 deployment surface).
"""

from __future__ import annotations

import glob
import importlib
import os
import sys

from pyspark.sql.datasource import DataSource

try:  # vendored cloudpickle — the serializer spark.dataSource.register uses
    from pyspark import cloudpickle as _cloudpickle

    _cloudpickle.register_pickle_by_value(sys.modules[__name__])
except Exception:  # pragma: no cover - ancient pyspark without the API
    pass


def _ensure_importable() -> None:
    """Make ``valentine_spark`` importable in this python worker, adding the
    SparkFiles root and any zip/egg inside it to ``sys.path`` if needed."""
    try:
        import valentine_spark  # noqa: F401

        return
    except ImportError:
        pass
    candidates = []
    try:
        from pyspark.core.files import SparkFiles

        root = SparkFiles.getRootDirectory()
        # The streaming planner runners are handed a per-query SUBDIRECTORY
        # of the session's userFiles dir (".../userFiles-*/streaming_job")
        # while --py-files zips are materialized in the userFiles dir
        # itself — so walk the root and a couple of ancestors.
        probe = os.path.abspath(root)
        for _ in range(3):
            candidates.append(probe)
            for pattern in ("*.zip", "*.egg"):
                candidates.extend(sorted(glob.glob(os.path.join(probe, pattern))))
            parent = os.path.dirname(probe)
            if parent == probe:
                break
            probe = parent
    except Exception:  # pragma: no cover - SparkFiles root not communicated
        pass
    # executor-style deployments also land py-files in the task's cwd
    for pattern in ("*.zip", "*.egg"):
        candidates.extend(sorted(glob.glob(os.path.join(os.getcwd(), pattern))))
    for path in candidates:
        if path not in sys.path:
            sys.path.insert(1, path)
    importlib.invalidate_caches()
    try:
        import valentine_spark  # noqa: F401
    except ImportError as exc:  # pragma: no cover - genuinely missing
        raise ImportError(
            "valentine_spark is not importable in this Spark python worker "
            f"and was not found under the SparkFiles root (searched {candidates}); "
            "ship it with spark-submit --py-files valentine_spark.zip"
        ) from exc


class _BootstrapDataSource(DataSource):
    """Shared delegation: lazily construct the real DataSource (after the
    sys.path repair) and forward stashes across process hops as plain data."""

    # overridden per subclass: "module:Class" of the real implementation
    _impl = ""

    def _real(self) -> DataSource:
        real = self.__dict__.get("_real_ds")
        if real is None:
            _ensure_importable()
            mod_name, cls_name = type(self)._impl.split(":")
            real = getattr(importlib.import_module(mod_name), cls_name)(
                dict(self.options)
            )
            # a schema()-time stash exported by __getstate__ in a previous
            # process (see below) rides along as plain data
            for stash in ("_schema_meta", "_meta"):
                val = self.__dict__.get("_stashed" + stash)
                if val is not None:
                    setattr(real, stash, val)
            self._real_ds = real
        return real

    def __getstate__(self):
        # Never pickle the real DataSource by reference — the receiving
        # worker may be a streaming runner that cannot import it yet.  Its
        # snapshot stash (plain json data) is preserved so the schema() /
        # streamReader() pairing stays pinned to one snapshot even across
        # the create_data_source -> streaming-runner process hop.
        state = dict(self.__dict__)
        real = state.pop("_real_ds", None)
        if real is not None:
            for stash in ("_schema_meta", "_meta"):
                val = getattr(real, stash, None)
                if val is not None:
                    state["_stashed" + stash] = val
        return state

    def schema(self):
        return self._real().schema()

    def reader(self, schema):
        return self._real().reader(schema)

    def streamReader(self, schema):
        return self._real().streamReader(schema)

    def streamWriter(self, schema, overwrite):
        return self._real().streamWriter(schema, overwrite)


class LakeBootstrapDataSource(_BootstrapDataSource):
    """py-files-safe shim for ``valentine_spark.sources.lake_batch.
    LakeDataSource`` (batch ``lake`` reads + the exactly-once streaming
    ``lake`` sink)."""

    _impl = "valentine_spark.sources.lake_batch:LakeDataSource"

    @classmethod
    def name(cls) -> str:
        return "lake"


class LakeChangesBootstrapDataSource(_BootstrapDataSource):
    """py-files-safe shim for ``valentine_spark.streaming.lake_source.
    LakeChangesDataSource`` (streaming changelog tail + batch windows)."""

    _impl = "valentine_spark.streaming.lake_source:LakeChangesDataSource"

    @classmethod
    def name(cls) -> str:
        return "lake_changes"
