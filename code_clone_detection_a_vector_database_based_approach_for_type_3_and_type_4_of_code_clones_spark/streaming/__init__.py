"""Structured Streaming extension (beyond the reference surface — the
reference is strictly batch, SURVEY SS2.10)."""

from .export_stream import (  # noqa: F401
    export_stream,
    lm_score_stream,
    quality_annotate_stream,
    read_shards_as_of,
)
from .index_ingest import index_ingest_stream  # noqa: F401
from .events import (  # noqa: F401
    click_purchase_join_stream,
    dedup_stream,
    sessionize_batch,
    sessionize_batch_salted,
    sessionize_stream,
    streaming_hourly_counts,
)
