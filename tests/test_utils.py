"""Utility tests mirroring the reference suite (tests/test_utils.py:10-32):
CSV encoding/delimiter sniffing, date sniffing, numeric coercion, lattice."""

import pandas as pd
import pytest

from valentine_spark.sources.csv import get_delimiter, get_encoding, read_csv
from valentine_spark.types import convert_data_type, is_date, lattice_types


@pytest.fixture()
def csv_file(tmp_path):
    p = tmp_path / "data.csv"
    p.write_text("EID;Authors;Cited by\na1;Smith J.;12\na2;Jones K.;7\n", encoding="utf-8")
    return str(p)


def test_get_encoding(csv_file, tmp_path):
    assert get_encoding(csv_file) == "utf-8"
    latin = tmp_path / "latin.csv"
    latin.write_bytes("a,b\ncafé,1\n".encode("cp1252"))
    assert get_encoding(str(latin)) in ("cp1252", "latin-1")


def test_get_delimiter(csv_file):
    assert get_delimiter(csv_file) == ";"


def test_read_csv(spark, csv_file):
    df = read_csv(spark, csv_file)
    assert df.columns == ["EID", "Authors", "Cited by"]
    assert df.count() == 2


def test_convert_data_type():
    assert convert_data_type("15") == 15
    assert convert_data_type("15.0") == 15
    assert convert_data_type("0.5") == 0.5
    assert convert_data_type("hello") == "hello"


def test_is_date():
    assert is_date("2021-03-06")
    assert is_date("06/03/2021")
    assert is_date("2015")  # bare year, like dateutil
    assert not is_date("Science")
    assert not is_date("2-s2.0-84924565530")


def test_lattice_types(spark):
    pdf = pd.DataFrame(
        {
            "i": [1, 2],
            "f": [0.5, 1.5],
            "s": ["a", "b"],
            "d": ["2020-01-01", "2020-01-02"],
        }
    )
    types = lattice_types(spark.createDataFrame(pdf))
    assert types == {"i": "int", "f": "float", "s": "varchar", "d": "date"}
