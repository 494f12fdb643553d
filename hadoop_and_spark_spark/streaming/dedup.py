"""Streaming deduplication — the continuous-ingest twin of
``operators/dedup.dedup_exact``.

A training-data pipeline ingesting documents as a stream drops exact
re-arrivals ACROSS micro-batches: ``dropDuplicates`` on the content
hash keeps per-key state in the state store, so the first arrival
wins and every later copy — same batch or any later batch — is
suppressed. This is the capability the batch ``dedup_exact`` query
cannot express (its groupBy sees one static table).

Scale notes: state grows with the number of DISTINCT keys ever seen —
only the md5 + key columns are stored, never the payload. For
unbounded streams bound the state with
``dropDuplicatesWithinWatermark`` (same plan, state evicted once the
watermark passes each key's arrival time); the unbounded form here
matches the batch semantics exactly, which is what the cross-check
test pins.

Reference parity: no streaming dedup exists in the reference; the
state-store shape is T5's (a7/TrendingArrivals.scala:47-68), keyed by
content hash instead of region.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def streaming_dedup_exact(
    docs_stream: DataFrame,
    text_col: str = "text",
    watermark: tuple[str, str] | None = None,
) -> DataFrame:
    """First-arrival-wins exact dedup over a document stream.

    Output rows carry the content hash so a downstream sink can join
    payloads back; with ``watermark=(ts_col, delay)`` the state store
    evicts hashes older than the watermark (bounded state, at the
    cost of re-admitting a duplicate that re-arrives after the
    delay).
    """
    hashed = docs_stream.withColumn("text_md5", F.md5(F.col(text_col)))
    if watermark is not None:
        ts_col, delay = watermark
        return hashed.withWatermark(ts_col, delay).dropDuplicatesWithinWatermark(
            ["text_md5"]
        )
    return hashed.dropDuplicates(["text_md5"])
