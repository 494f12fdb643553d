"""Streaming joins: stream-static enrichment + stream-stream interval
self-join (SURVEY §2.9 T8/T9 — beyond the reference, which never joins
inside a stream).

Two shapes a production event pipeline needs that windowed aggregation
(T2/T3) can't express:

- **Stream-static enrich (T8)**: every incoming event joins a slowly-
  changing batch dimension (here a per-user profile derived offline
  from history). Spark re-plans the static side per micro-batch; with
  a broadcastable dim the stream side never shuffles for the join —
  the streaming analogue of the J2 broadcast dim join. The aggregation
  downstream keys on (profile tier × event-time window), so state
  stays bounded by tiers × hours, not users.

- **Stream-stream interval self-join (T9)**: purchases ⋈ clicks of
  the same user within the 24 h window before the purchase — the
  STREAMING twin of the bucketized batch range join (X23,
  `operators/temporal.py:range_join_counts`). Both sides carry
  watermarks and the join condition bounds event-time distance in
  BOTH directions, so the state store can evict rows once the
  watermark passes `ts + 24 h` — without the bound the click state
  grows forever. Inner join ⇒ append-mode output per match.

Neither is driver-registrable (streaming plans have no DuckDB twin);
each is pinned by a batch↔stream duality test over the same parquet
feed (`tests/test_stream_joins.py`), the module's standing pattern.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..operators.temporal import ASOF_LEFT_TYPE, ASOF_RIGHT_TYPE

TIER_SPLIT = 50.7  # per-user mean value splitting low/high profile tiers
PAIR_WINDOW = "24 hours"
PAIR_WATERMARK = "1 hour"


def user_profiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The static dimension: per-user historical mean event value,
    banded into a profile tier. Computed offline (batch) and joined
    into the live stream — the lambda-architecture enrich shape."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("user_id").agg(
        F.when(F.avg("value") < TIER_SPLIT, "low").otherwise("high").alias("tier")
    )


def enriched_tier_counts(events: DataFrame, profiles: DataFrame) -> DataFrame:
    """events (batch OR stream) ⋈ broadcast(profiles) → hourly counts
    per profile tier. The identical expression runs both ways — the
    duality test pins them equal."""
    ev = events.withColumn("ts", F.col("ts").cast("timestamp"))
    return (
        ev.join(F.broadcast(profiles), "user_id")
        .groupBy("tier", F.window("ts", "1 hour").alias("w"))
        .agg(F.count("*").alias("cnt"))
        .select(
            "tier",
            F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm").alias(
                "window_start"
            ),
            "cnt",
        )
    )


def purchase_click_pairs_stream(events_stream: DataFrame) -> DataFrame:
    """Stream-stream self-join: (purchase, click) pairs of the same
    user with the click in the 24 h window before the purchase.

    Both branches of the SAME source stream are watermarked; the join
    predicate bounds c_ts to (p_ts − 24 h, p_ts], which is what lets
    the state store evict a buffered click once the watermark passes
    its reach. Returns append-mode match rows keyed
    (purchase_id, click_id)."""
    ev = events_stream.withColumn("ts", F.col("ts").cast("timestamp"))
    p = (
        ev.where(F.col("event_type") == ASOF_LEFT_TYPE)
        .select(
            F.col("event_id").alias("purchase_id"),
            F.col("user_id").alias("p_user"),
            F.col("ts").alias("p_ts"),
        )
        .withWatermark("p_ts", PAIR_WATERMARK)
    )
    c = (
        ev.where(F.col("event_type") == ASOF_RIGHT_TYPE)
        .select(
            F.col("event_id").alias("click_id"),
            F.col("user_id").alias("c_user"),
            F.col("ts").alias("c_ts"),
        )
        .withWatermark("c_ts", PAIR_WATERMARK)
    )
    cond = (
        (F.col("p_user") == F.col("c_user"))
        & (F.col("c_ts") > F.col("p_ts") - F.expr(f"INTERVAL {PAIR_WINDOW}"))
        & (F.col("c_ts") <= F.col("p_ts"))
    )
    return p.join(c, cond, "inner").select(
        "purchase_id", "click_id", F.col("p_user").alias("user_id")
    )


def purchase_click_pairs_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The batch twin of the stream-stream join, for the duality test.
    (Deliberately the naive interval join: at test scale it is exact
    and simple; the scale-safe BATCH form is the bucketized
    range_join_counts — X23 — which aggregates these same pairs.)"""
    ev = load_table(spark, sf_dir, "events")
    p = ev.where(F.col("event_type") == ASOF_LEFT_TYPE).select(
        F.col("event_id").alias("purchase_id"),
        F.col("user_id").alias("p_user"),
        F.col("ts").cast("timestamp").alias("p_ts"),
    )
    c = ev.where(F.col("event_type") == ASOF_RIGHT_TYPE).select(
        F.col("event_id").alias("click_id"),
        F.col("user_id").alias("c_user"),
        F.col("ts").cast("timestamp").alias("c_ts"),
    )
    cond = (
        (F.col("p_user") == F.col("c_user"))
        & (F.col("c_ts") > F.col("p_ts") - F.expr(f"INTERVAL {PAIR_WINDOW}"))
        & (F.col("c_ts") <= F.col("p_ts"))
    )
    return p.join(c, cond, "inner").select(
        "purchase_id", "click_id", F.col("p_user").alias("user_id")
    )
