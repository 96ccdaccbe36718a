from valentine_spark.types import convert_data_type  # noqa: F401


def is_sorted(matches: dict) -> bool:
    values = list(matches.values())
    return all(a >= b for a, b in zip(values, values[1:]))


def normalize_distance(dist: int, str1: str, str2: str) -> float:
    return 1 - dist / max(max(len(str1), len(str2)), 1)
