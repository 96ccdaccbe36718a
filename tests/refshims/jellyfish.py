"""Pure-Python shim for the ``jellyfish`` string-distance package, used ONLY
to execute the reference implementation at /root/reference in-process for
value-parity testing (jellyfish is not installed in this environment).

Semantics reproduce jellyfish's documented behaviour:
  * ``levenshtein_distance``: classic edit distance;
  * ``damerau_levenshtein_distance``: UNRESTRICTED Damerau-Levenshtein;
  * ``hamming_distance``: positional mismatches, length delta counts;
  * ``jaro_similarity`` / ``jaro_winkler_similarity``: standard Jaro, with
    jellyfish's empty-string rule (either side empty -> 0.0) and Winkler
    boost (threshold 0.7, scale 0.1, max prefix 4).

The Damerau/Hamming/Jaro kernels are imported from the engine's own
``valentine_spark.functions.string_distance``, which is independently
verified against DuckDB's built-ins in tests/test_matchers.py — so the
parity comparison does not silently share an unverified primitive.
"""

from valentine_spark.functions.string_distance import (  # noqa: F401
    _damerau_levenshtein,
    _hamming,
    _jaro,
    _jaro_winkler,
)


def levenshtein_distance(s1: str, s2: str) -> int:
    if s1 == s2:
        return 0
    if not s1:
        return len(s2)
    if not s2:
        return len(s1)
    prev = list(range(len(s2) + 1))
    for i, ca in enumerate(s1, 1):
        cur = [i]
        for j, cb in enumerate(s2, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def damerau_levenshtein_distance(s1: str, s2: str) -> int:
    return _damerau_levenshtein(s1, s2)


def hamming_distance(s1: str, s2: str) -> int:
    return _hamming(s1, s2)


def jaro_similarity(s1: str, s2: str) -> float:
    # jellyfish: either side empty -> 0.0 (even both-empty)
    if not s1 or not s2:
        return 0.0
    return _jaro(s1, s2)


def jaro_winkler_similarity(s1: str, s2: str, long_tolerance: bool = False) -> float:
    if not s1 or not s2:
        return 0.0
    return _jaro_winkler(s1, s2)
