"""Drop-in import-compatibility shim: a user of the reference library
(delftdata/valentine) can keep their import paths and run on Spark —
``from valentine import valentine_match`` etc. resolve to valentine_spark.

Citation map: mirrors /root/reference/valentine/__init__.py's public surface.
"""

from valentine_spark import (  # noqa: F401
    NotAValentineMatcher,
    valentine_match,
    valentine_match_batch,
)

__all__ = ["valentine_match", "valentine_match_batch", "NotAValentineMatcher"]
