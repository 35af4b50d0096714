"""Scalar / array column functions (SURVEY.md SS2.8-2.9)."""

from .vector import (  # noqa: F401
    cosine_similarity,
    dequantize_int8,
    dot,
    l2_norm,
    l2_normalize,
    quantize_int8,
)
from .ids import (  # noqa: F401
    content_id,
    stable_hash64,
    uuid5_udf,
)
from .text import (  # noqa: F401
    char_ngrams,
    doc_fingerprint,
    language_id,
    quality_score,
    repetition_stats,
    token_stats,
    tokens,
    word_shingles,
)
