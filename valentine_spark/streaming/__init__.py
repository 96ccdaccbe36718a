from .lake_source import LakeChangesDataSource, register_lake_changes
from .stateful import repo_stats_stream, run_repo_stats
from .stream import stream_apply, stream_from_files, stream_route, synth_rate_stream
from .windows import gap_sessions, run_gap_sessions, run_windowed_counts, windowed_op_counts

__all__ = [
    "LakeChangesDataSource",
    "register_lake_changes",
    "stream_apply",
    "stream_from_files",
    "stream_route",
    "synth_rate_stream",
    "repo_stats_stream",
    "run_repo_stats",
    "gap_sessions",
    "run_gap_sessions",
    "windowed_op_counts",
    "run_windowed_counts",
]
