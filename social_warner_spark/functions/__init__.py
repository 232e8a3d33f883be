"""Scalar/array expression helpers shared by operators and queries."""

from social_warner_spark.functions.vectors import dot, l2_norm, cosine
from social_warner_spark.functions.text import (
    tokens,
    word_shingles,
    token_count_ws,
    token_count_bpe,
    stopword_ratio,
    fingerprint,
)

__all__ = [
    "dot",
    "l2_norm",
    "cosine",
    "tokens",
    "word_shingles",
    "token_count_ws",
    "token_count_bpe",
    "stopword_ratio",
    "fingerprint",
]
