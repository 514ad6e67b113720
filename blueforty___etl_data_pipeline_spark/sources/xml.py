"""Semi-structured XML shredding: whole document → typed rows.

Reference pipeline (BlueForty.py:128-201): a whole XML file lands in one
``DOC VARIANT`` cell (:159-176), then ``LATERAL FLATTEN`` turns the doc's
repeated child elements into rows with their ordinal kept as ``XML_INDEX``
(:197-199) and ``XMLGET(...):"$"`` extracts + casts each field (:185-196),
dropping children without a ``SupplierTransactionID`` (:200).

Spark-native shape: ``from_xml`` (built into Spark 4) parses the document
into ``array<struct<...>>`` in one JVM-side expression, ``posexplode``
supplies the ordinal, and the typed casts are ordinary Column expressions.
No VARIANT staging table is needed — the parse is part of the lazy plan, so
at 100 TB the shred runs scan-parallel with no intermediate materialization.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, StringType, StructField, StructType


def _doc_schema(row_tag: str, field_names: list[str]) -> StructType:
    # All fields parsed as string; typed conversion is the caller's concern,
    # mirroring XMLGET(...):"$" returning text before the ::cast
    # (BlueForty.py:186-196).
    child = StructType([StructField(n, StringType()) for n in field_names])
    return StructType([StructField(row_tag, ArrayType(child))])


def xml_records_from_doc(
    doc: Column, row_tag: str, field_names: list[str]
) -> Column:
    """Parse one whole-document XML string column into
    ``array<struct<field: string, ...>>`` of its ``<row_tag>`` children —
    the Spark analog of ``doc:"$"`` feeding LATERAL FLATTEN."""
    return F.from_xml(doc, _doc_schema(row_tag, field_names))[row_tag]


def shred_xml_docs(
    df: DataFrame,
    doc_col: str,
    row_tag: str,
    fields: dict[str, Column | None],
    index_col: str = "XML_INDEX",
    required: str | None = None,
    keep: tuple[str, ...] = (),
) -> DataFrame:
    """LATERAL FLATTEN + XMLGET analog.

    ``fields`` maps output column name → cast expression over ``F.col("_e." +
    name)`` (None ⇒ keep as string).  ``index_col`` receives the element
    ordinal (``t.index`` at BlueForty.py:197).  ``required`` drops rows where
    that extracted field is null (the :200 malformed-element filter).
    ``keep`` carries parent-row columns through the flatten.
    """
    arr = xml_records_from_doc(F.col(doc_col), row_tag, list(fields))
    exploded = df.select(F.posexplode(arr).alias(index_col, "_e"), "*")
    out_cols: list[Column] = [F.col(c) for c in keep]
    for name, expr in fields.items():
        raw = F.col(f"_e.{name}")
        out_cols.append((raw if expr is None else expr).alias(name))
    out_cols.append(F.col(index_col))
    out = exploded.select(*out_cols)
    if required is not None:
        out = out.filter(F.col(required).isNotNull())
    return out
