"""Pure-Python shim for ``chardet.detect`` (reference
``data_sources/utils.py:6-21`` sniffs CSV encodings with it).  Good enough
for the reference's own fixtures (pure-ASCII CSVs): ascii -> utf-8 ->
windows-1252 fallback."""


def detect(data: bytes) -> dict:
    try:
        data.decode("ascii")
        return {"encoding": "ascii", "confidence": 1.0}
    except (UnicodeDecodeError, AttributeError):
        pass
    try:
        data.decode("utf-8")
        return {"encoding": "utf-8", "confidence": 0.99}
    except UnicodeDecodeError:
        return {"encoding": "windows-1252", "confidence": 0.5}
