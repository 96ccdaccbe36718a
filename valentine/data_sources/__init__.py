"""Import-compatible ``valentine.data_sources`` surface over Spark.

The reference's ``DataframeTable`` wraps a pandas frame and lazily explodes
it into ``DataframeColumn`` objects (``/root/reference/valentine/
data_sources/dataframe/dataframe_table.py:12-41``, ``dataframe_column.py:
4-27``).  Here the frame is a Spark DataFrame; the full BaseTable/BaseColumn
introspection surface is preserved:

  * ``get_columns()`` -> column objects with ``name`` / ``data_type`` /
    ``unique_identifier`` / ``data`` / ``size`` / ``is_empty``;
  * ``data`` collects the column's non-null values to the driver LAZILY on
    first access (columns are the reference's own driver-side unit; at lake
    scale use the engine's profile DataFrames, not this API edge);
  * ``unique_identifier`` reproduces the reference quirk verbatim: the
    table guid is the table NAME string, so the column uid is
    ``f"{name[0]}_{name[1]}:{column}"`` — its first two characters
    (``dataframe_column.py:13-14``, where ``table_guid`` is the str returned
    by ``DataframeTable.unique_identifier``);
  * ``data_type`` is the reference's 4-type lattice {int,float,varchar,date}
    via the engine's Spark-schema coarsening (``valentine_spark.types``).
"""

from __future__ import annotations

from typing import Dict, List

from pyspark.sql import functions as F

from valentine_spark.sources.profiles import as_spark
from valentine_spark.types import lattice_types


class DataframeColumn:
    def __init__(self, column_name: str, d_type: str, table_guid: str, sdf):
        self.__column_name = column_name
        self.__d_type = d_type
        self.__table_guid = table_guid
        self.__sdf = sdf
        self.__data = None

    @property
    def unique_identifier(self) -> str:
        return f"{self.__table_guid[0]}_{self.__table_guid[1]}:{self.__column_name}"

    @property
    def name(self) -> str:
        return self.__column_name

    @property
    def data_type(self) -> str:
        return self.__d_type

    @property
    def data(self) -> list:
        """Non-null column values (reference drops NaNs per column,
        ``dataframe_table.py:39``) — collected on first access only."""
        if self.__data is None:
            col = F.col(self.__column_name)
            self.__data = [
                r[0] for r in self.__sdf.select(col).where(col.isNotNull()).collect()
            ]
        return self.__data

    @property
    def size(self) -> int:
        return len(self.data)

    @property
    def is_empty(self) -> bool:
        return self.size == 0

    def __str__(self):
        return f"\t\tColumn: {self.name} <{self.data_type}>  |  {self.unique_identifier}\n"


class DataframeTable:
    def __init__(self, df, name: str = "table"):
        self.df = as_spark(df)
        self.name = name
        self.__columns: Dict[str, DataframeColumn] = {}

    @property
    def unique_identifier(self) -> str:
        # reference: the table guid IS the table name (dataframe_table.py:18)
        return self.name

    def get_df(self):
        return self.df

    def get_columns(self) -> List[DataframeColumn]:
        if not self.__columns:
            types = lattice_types(self.df)
            for c in self.df.columns:
                self.__columns[c] = DataframeColumn(c, types[c], self.unique_identifier, self.df)
        return list(self.__columns.values())

    def get_guid_column_lookup(self) -> Dict[str, str]:
        return {c.name: c.unique_identifier for c in self.get_columns()}

    @property
    def is_empty(self) -> bool:
        return len(self.df.columns) == 0 or self.df.isEmpty()

    def __str__(self):
        out = f"\tTable: {self.name}  |  {self.unique_identifier}\n"
        for column in self.get_columns():
            out += str(column)
        return out
