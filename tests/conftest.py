import os
import sys

import pandas as pd
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession


@pytest.fixture(scope="session")
def spark():
    session = (
        SparkSession.builder.master("local[4]")
        .appName("valentine-spark-tests")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "4g")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .getOrCreate()
    )
    yield session
    session.stop()


def _authors_fixture():
    """Deterministic stand-in for the reference test fixture pair
    (FIXTURES.md §1): two 20-row tables sharing EID / Authors / Cited by
    values row-for-row, with disjoint extra columns."""
    n = 20
    eids = [f"2-s2.0-{84924565530 + 7919 * i}" for i in range(n)]
    authors = [
        "Zeisel A.", "Munoz-Manchado A.", "Codeluppi S.", "Lonnerberg P.",
        "La Manno G.", "Jureus A.", "Marques S.", "Munguba H.", "He L.",
        "Betsholtz C.", "Rolny C.", "Castelo-Branco G.", "Hjerling-Leffler J.",
        "Linnarsson S.", "Borm L.", "Gyllborg D.", "Spanjaard B.",
        "Hochgerner H.", "Zwan M.", "Braun E.",
    ]
    cited = [1113, 874, 643, 521, 498, 402, 377, 298, 254, 201,
             187, 154, 132, 118, 97, 84, 61, 44, 23, 9]
    years = [2015 + (i % 8) for i in range(n)]
    titles = [f"Study {i} of cortical cell types and transcriptomics" for i in range(n)]
    sources = ["Science", "Nature", "Cell", "Neuron", "eLife"] * 4
    dois = [f"10.1126/science.aaa{1000 + i}" for i in range(n)]
    countries = ["Sweden", "Norway", "Denmark", "Finland"] * 5
    doc_types = ["Article", "Review"] * 10
    cities = ["Stockholm", "Oslo", "Copenhagen", "Helsinki"] * 5
    access = [i % 2 for i in range(n)]
    agg_types = ["Journal"] * n

    df1 = pd.DataFrame(
        {
            "EID": eids,
            "Authors": authors,
            "Cited by": cited,
            "Title": titles,
            "Year": years,
            "Source tittle": sources,
            "DOI": dois,
        }
    )
    df2 = pd.DataFrame(
        {
            "EID": eids,
            "Authors": authors,
            "Cited by": cited,
            "Country": countries,
            "Document Type": doc_types,
            "City": cities,
            "Access Type": access,
            "aggregationType": agg_types,
        }
    )
    return df1, df2


@pytest.fixture(scope="session")
def authors_pd():
    return _authors_fixture()


@pytest.fixture(scope="session")
def authors(spark, authors_pd):
    df1, df2 = authors_pd
    return spark.createDataFrame(df1), spark.createDataFrame(df2)


GROUND_TRUTH = [("Cited by", "Cited by"), ("Authors", "Authors"), ("EID", "EID")]


@pytest.fixture(scope="session")
def ground_truth():
    return list(GROUND_TRUTH)


@pytest.fixture(scope="session")
def sf_dir():
    return os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
