"""Scalar / array column functions (SURVEY.md SS2.8-2.9)."""

from .vector import (  # noqa: F401
    cosine_similarity,
    dot,
    l2_norm,
    l2_normalize,
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
    token_stats,
    tokens,
    word_shingles,
)
