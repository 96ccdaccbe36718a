"""The reference's DataframeTable wraps a pandas frame; on Spark the native
input is a DataFrame, so the shim keeps the symbol as a pass-through
constructor returning (df, name) handled by valentine_match."""

from valentine_spark.sources.profiles import as_spark


class DataframeTable:
    def __init__(self, df, name: str = "table"):
        self.df = as_spark(df)
        self.name = name

    def get_df(self):
        return self.df

    @property
    def is_empty(self) -> bool:
        return len(self.df.columns) == 0 or self.df.isEmpty()
