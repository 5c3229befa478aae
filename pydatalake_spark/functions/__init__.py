from pydatalake_spark.functions.text import (
    tokenize,
    shingles,
    language_scores,
    LANG_MARKERS,
)
from pydatalake_spark.functions.vector import to_double_array, dot, l2_norm, cosine

__all__ = [
    "tokenize",
    "shingles",
    "language_scores",
    "LANG_MARKERS",
    "to_double_array",
    "dot",
    "l2_norm",
    "cosine",
]
