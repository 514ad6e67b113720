"""Scalar function layer — every scalar the reference uses (SURVEY.md §2.8)
plus the text/vector primitives for the large-scale pipeline extensions.

Everything here returns Column expressions built from
``pyspark.sql.functions`` — JVM-side, vectorized, inside whole-stage
codegen.  No row-at-a-time Python in this module.
"""

from .cleaning import (
    int_flag_to_bool,
    nullif_empty,
    try_to_date,
    try_to_decimal,
    try_to_number,
    zip5,
)
from .geo import haversine_km
from .inference import infer_csv_schema, infer_type
from .text import (
    doc_fingerprint,
    language_scores,
    md5_hash64,
    ngrams,
    normalize_text,
    quality_features,
    token_count_bpeish,
    token_count_ws,
    tokens_ws,
)
from .vectors import cosine_similarity, dot, l2_norm

__all__ = [
    "try_to_number",
    "try_to_decimal",
    "try_to_date",
    "nullif_empty",
    "int_flag_to_bool",
    "zip5",
    "haversine_km",
    "infer_csv_schema",
    "infer_type",
    "ngrams",
    "tokens_ws",
    "normalize_text",
    "md5_hash64",
    "token_count_ws",
    "token_count_bpeish",
    "quality_features",
    "language_scores",
    "doc_fingerprint",
    "cosine_similarity",
    "dot",
    "l2_norm",
]
