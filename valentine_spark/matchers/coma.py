"""COMA matcher stub.

The reference delegates COMA to a Java subprocess jar
(``/root/reference/valentine/algorithms/coma/coma.py:42-63``); the jar is
absent from the reference checkout (``.MISSING_LARGE_BLOBS``), so there is no
behavior to reproduce.  This class keeps the API surface (constructor
defaults per ``coma.py:19-25``) and raises an informative error on use.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


from . import BaseMatcher


class Coma(BaseMatcher):
    def __init__(
        self,
        max_n: int = 0,
        use_instances: bool = False,
        java_xmx: str = "1024m",
    ):
        self.max_n = int(max_n)
        self.use_instances = bool(use_instances)
        self.java_xmx = str(java_xmx)

    def get_matches(
        self,
        source: DataFrame,
        target: DataFrame,
        source_name: str = "table_1",
        target_name: str = "table_2",
    ):
        raise NotImplementedError(
            "COMA requires the external COMA 3.0 Java artifact, which is not "
            "distributed with the reference repository (it is listed in its "
            ".MISSING_LARGE_BLOBS). Use JaccardDistanceMatcher, "
            "DistributionBased, SimilarityFlooding or Cupid instead."
        )
