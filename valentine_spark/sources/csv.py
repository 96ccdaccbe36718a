"""CSV ingestion helpers: encoding + delimiter sniffing feeding
``spark.read.csv`` options (reference ``data_sources/utils.py:6-29``; S2/S3 in
SURVEY.md §2.1).  Sniffing reads only a small file prefix on the driver —
the actual data load stays a distributed Spark CSV scan."""

from __future__ import annotations

import codecs
import csv
import io

from pyspark.sql import DataFrame, SparkSession

_BOMS = (
    (codecs.BOM_UTF8, "utf-8"),
    (codecs.BOM_UTF32_LE, "utf-32"),
    (codecs.BOM_UTF32_BE, "utf-32"),
    (codecs.BOM_UTF16_LE, "utf-16"),
    (codecs.BOM_UTF16_BE, "utf-16"),
)


def get_encoding(path: str, sniff_bytes: int = 1 << 16) -> str:
    """BOM detection + decode probing (chardet-free)."""
    with open(path, "rb") as fh:
        head = fh.read(sniff_bytes)
    for bom, name in _BOMS:
        if head.startswith(bom):
            return name
    # the sniff window can cut a valid multibyte sequence mid-character; a
    # strict decode of the raw prefix would then reject utf-8 and fall
    # through to cp1252, mojibaking the whole file.  An incremental decoder
    # with final=False tolerates exactly (and only) a truncated tail.
    try:
        codecs.getincrementaldecoder("utf-8")().decode(head, final=False)
        return "utf-8"
    except UnicodeDecodeError:
        pass
    for candidate in ("cp1252", "latin-1"):
        try:
            head.decode(candidate)
            return candidate
        except UnicodeDecodeError:
            continue
    return "utf-8"


def get_delimiter(path: str, encoding: str | None = None) -> str:
    enc = encoding or get_encoding(path)
    with io.open(path, "r", encoding=enc, errors="replace") as fh:
        first_line = fh.readline()
    try:
        return csv.Sniffer().sniff(first_line).delimiter
    except csv.Error:
        return ","


def read_csv(spark: SparkSession, path: str, **options) -> DataFrame:
    """Sniffed CSV read: header + inferSchema on by default."""
    opts = {
        "header": "true",
        "inferSchema": "true",
        "encoding": get_encoding(path),
        "sep": get_delimiter(path),
    }
    opts.update({k: str(v) for k, v in options.items()})
    return spark.read.options(**opts).csv(path)
