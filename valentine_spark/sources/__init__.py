from .bucketed import (
    assert_no_shuffle_join,
    cobucketed_join,
    plan_has_exchange,
    read_bucketed,
    write_bucketed,
)
from .lake_batch import LakeDataSource, register_lake
from .profiles import as_spark, profile_pair, profile_table

__all__ = [
    "profile_table",
    "profile_pair",
    "as_spark",
    "LakeDataSource",
    "register_lake",
    "write_bucketed",
    "read_bucketed",
    "cobucketed_join",
    "plan_has_exchange",
    "assert_no_shuffle_join",
]
