"""Structured Streaming operators.

The reference is a batch per-document library (SURVEY §2.3: streaming state
is *absent* in the reference); these operators are the pipeline-harness side:
continuous ingestion of document/event streams with watermarked state —
`readStream → transform → writeStream` per the north-star architecture.
"""

from .ops import (  # noqa: F401
    streaming_dedup_exact,
    streaming_extract,
    streaming_hourly_counts,
    streaming_minhash_candidates,
    streaming_sessionize,
)
