"""Cleaning / coercion scalars (SURVEY.md §2.8, F1-F12).

These reproduce the Snowflake null-on-failure conversion contract the
reference's loaders rely on (BlueForty.py:90-105, :186-196, :364-388):
TRY_TO_NUMBER, TRY_TO_NUMERIC, TRY_TO_DATE, NULLIF, int→bool, and the ZIP5
normalizer with its deliberate pad-THEN-strip quirk.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.types import DecimalType


def try_to_number(col: Column) -> Column:
    """TRY_TO_NUMBER($n) (BlueForty.py:90-93,100-101): string → bigint,
    null when unparseable."""
    return col.try_cast("bigint")


def try_to_decimal(col: Column, precision: int = 18, scale: int = 4) -> Column:
    """TRY_TO_NUMERIC($n, p, s) (BlueForty.py:94-96)."""
    return col.try_cast(DecimalType(precision, scale))


def try_to_date(col: Column, fmt: str | None = None) -> Column:
    """TRY_TO_DATE (BlueForty.py:97-99 with 'MM/DD/YYYY'; :190,:195
    format-less ISO).  Spark's try_to_date nulls on parse failure."""
    return F.try_to_date(col, fmt) if fmt else F.try_to_date(col)


def nullif_empty(col: Column) -> Column:
    """NULLIF(x, '') (BlueForty.py:102, :188-189)."""
    return F.nullif(col, F.lit(""))


def int_flag_to_bool(col: Column) -> Column:
    """(x::INT = 1) boolean derivation (BlueForty.py:103-104, :196)."""
    return col.try_cast("int") == F.lit(1)


def zip5(primary: Column, fallback: Column) -> Column:
    """SUPPLIER_ZIP5 normalization (BlueForty.py:364-388).

    COALESCE the two postal columns, LPAD to 5 with '0', THEN strip
    non-digits.  The reference pads before stripping, so dirty input can
    yield a <5-char ZIP — that order is semantics and is preserved
    (SURVEY.md F11 note).
    """
    joined = F.coalesce(
        primary.cast("string"), fallback.cast("string"), F.lit("")
    )
    return F.regexp_replace(F.lpad(joined, 5, "0"), "[^0-9]", "")


def zip5_not_null_filter(primary: Column, fallback: Column) -> Column:
    """The view's WHERE clause (BlueForty.py:380-387): coalesced postal
    code IS NOT NULL AND != ''."""
    joined = F.coalesce(primary.cast("string"), fallback.cast("string"))
    return joined.isNotNull() & (joined != F.lit(""))


def luhn_valid(pan: Column, n_digits: int = 16) -> Column:
    """Luhn (ISO/IEC 7812 mod-10) checksum validation of a fixed-width
    digit string — the step that separates REAL payment-card numbers
    from random 16-digit sequences in PII scrubbing: regex-only
    scrubbers redact phone numbers and order ids as "cards" (false
    positives) while a checksum gate masks only what could actually
    be a PAN.

    Unrolled pure-codegen arithmetic: digit i (1-based from the left)
    doubles when its distance from the rightmost digit is odd, with
    the classic >9 fold (2d - 9).  No UDF, and the identical unrolled
    expression runs on any SQL engine.  NULL/short/non-digit inputs
    return false, not null."""
    terms = []
    for i in range(1, n_digits + 1):
        d = F.substring(pan, i, 1).cast("int")
        dist = n_digits - i  # distance from the rightmost digit
        if dist % 2 == 1:
            terms.append(
                F.when(d * 2 > 9, d * 2 - 9).otherwise(d * 2)
            )
        else:
            terms.append(d)
    total = terms[0]
    for t in terms[1:]:
        total = total + t
    ok_shape = pan.rlike(f"^[0-9]{{{n_digits}}}$")
    return F.when(ok_shape, total % 10 == 0).otherwise(F.lit(False))


def mask_pan(pan: Column, n_digits: int = 16) -> Column:
    """Mask a Luhn-VALID digit string to its last four
    (``************1234``); checksum-failing strings pass through
    untouched — the false-positive-free PII redaction composite."""
    return F.when(
        luhn_valid(pan, n_digits),
        F.concat(
            F.lit("*" * (n_digits - 4)), F.substring(pan, n_digits - 3, 4)
        ),
    ).otherwise(pan)
