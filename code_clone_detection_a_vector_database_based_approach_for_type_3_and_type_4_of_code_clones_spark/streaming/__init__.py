"""Structured Streaming extension (beyond the reference surface — the
reference is strictly batch, SURVEY SS2.10)."""

from .events import (  # noqa: F401
    sessionize_batch,
    streaming_hourly_counts,
)
