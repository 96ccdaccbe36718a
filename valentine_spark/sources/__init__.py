from .profiles import as_spark, profile_pair, profile_table

__all__ = ["profile_table", "profile_pair", "as_spark"]
