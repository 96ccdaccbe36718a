from .stream import stream_apply, stream_from_files, synth_rate_stream

__all__ = ["stream_apply", "stream_from_files", "synth_rate_stream"]
