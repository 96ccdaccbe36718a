from .string_distance import (
    damerau_levenshtein_udf,
    hamming_udf,
    jaro_udf,
    jaro_winkler_udf,
    normalized_similarity_expr,
)

__all__ = [
    "damerau_levenshtein_udf",
    "hamming_udf",
    "jaro_udf",
    "jaro_winkler_udf",
    "normalized_similarity_expr",
]
