"""Ingestion layer: declarative readers replacing the reference's
stage + PUT + COPY INTO three-step (BlueForty.py:23-116).

In Spark the stage/COPY split collapses into a single ``spark.read`` —
files are scanned in place, in parallel, with format options and error
tolerance expressed declaratively so Catalyst can prune partitions and
push projections into the scan.
"""

from .catalog import TABLES, load_table, register_testdata
from .csv import (
    NULL_SENTINELS,
    PURCHASES_CSV_OPTIONS,
    SUPPLIER_CSV_OPTIONS,
    TSV_OPTIONS,
    read_csv,
    read_tsv,
    with_file_metadata,
    with_filename_partition,
)
from .xml import shred_xml_docs, xml_records_from_doc

__all__ = [
    "TABLES",
    "load_table",
    "register_testdata",
    "NULL_SENTINELS",
    "PURCHASES_CSV_OPTIONS",
    "SUPPLIER_CSV_OPTIONS",
    "TSV_OPTIONS",
    "read_csv",
    "read_tsv",
    "with_file_metadata",
    "with_filename_partition",
    "shred_xml_docs",
    "xml_records_from_doc",
]
