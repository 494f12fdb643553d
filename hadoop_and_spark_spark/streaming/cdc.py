"""CDC table maintenance under the driver gate.

``sources/maintenance.merge_upsert`` is the keyed keep-latest merge
(one max_by aggregation, no join) and ``operators/layout.
latest_snapshot`` is the batch changelog→snapshot READ. This module
drives the WRITE path end-to-end through the real incremental engine:
the weekly event replay flows through ``foreachBatch`` → merge_upsert
into a plain-parquet table (write-new-directory + atomic swap), one
merge per micro-batch, and the registered query returns the FINAL
table — which must equal the window-form latest-per-key oracle over
the whole events table. A green driver row therefore witnesses that
N successive incremental merges converge to the batch answer (the
exactly-once contract a foreachBatch sink + checkpoint provides).

Scale notes: each micro-batch merge shuffles (table ∪ batch) once on
the key — table size is keyed-cardinality (one row per user), never
stream history; the swap is metadata-only. In production the same
foreachBatch body targets a transactional table format instead of the
directory swap; the merge plan is unchanged.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .runtime import start_and_await

_CDC_COLS = "user_id long, ts timestamp, event_type string, event_id long"


def cdc_upsert_stream(spark, sf_dir: str) -> DataFrame:
    """Latest event per user, materialized by STREAMING upserts (one
    merge_upsert per weekly micro-batch) and read back from the final
    table. Shares latest_snapshot's window-form oracle shape, minus
    the tombstone filter (a keep-latest merge never deletes).

    Runs once per (session, corpus) like every registered stream —
    re-invoking reads the sink, it does not restart the stream."""
    from ..sources.maintenance import session_memo

    return session_memo(
        spark, sf_dir, "events", "cdcupsert_run_v1",
        lambda: _run_cdc_upsert(spark, sf_dir),
    )


def _run_cdc_upsert(spark, sf_dir: str) -> DataFrame:
    import os
    import shutil
    import tempfile

    from ..sources.maintenance import build_once, merge_upsert, source_marker
    from .trending import weekly_replay_path, write_weekly_replay

    src = weekly_replay_path(sf_dir)
    build_once(
        src,
        source_marker(sf_dir, "events", "trendwk_v3"),
        lambda: write_weekly_replay(spark, sf_dir, src),
    )
    work = tempfile.mkdtemp(prefix="hs_cdc_")
    table = os.path.join(work, "table")
    # versioned changelog row: (ts, event_id) is a unique per-key total
    # order, so max_by on it IS "latest"
    empty = spark.createDataFrame([], _CDC_COLS).withColumn(
        "ver", F.struct("ts", "event_id")
    )
    empty.write.parquet(table)

    def apply_batch(bdf: DataFrame, _bid: int) -> None:
        staged = os.path.join(work, "staged")
        updates = bdf.withColumn("ver", F.struct("ts", "event_id"))
        merge_upsert(
            bdf.sparkSession, table, updates, "user_id", "ver", staged
        )
        shutil.rmtree(table)
        os.replace(staged, table)

    stream = (
        spark.readStream.schema(_CDC_COLS)
        .option("maxFilesPerTrigger", 1)
        .parquet(src + "/wk*.parquet")
    )
    writer = (
        stream.writeStream.foreachBatch(apply_batch)
        .option("checkpointLocation", os.path.join(work, "ckpt"))
        .trigger(availableNow=True)
    )
    start_and_await(spark, writer)
    return (
        spark.read.parquet(table)
        .select(
            "user_id",
            F.col("ts").alias("last_ts"),
            F.col("event_type").alias("last_type"),
        )
        .sortWithinPartitions("user_id")
    )


QUERIES = {"cdc_upsert_stream": cdc_upsert_stream}

ORACLE_SQL = {
    "cdc_upsert_stream": """
        WITH ranked AS (
            SELECT user_id, ts AS last_ts, event_type AS last_type,
                   row_number() OVER (
                       PARTITION BY user_id
                       ORDER BY ts DESC, event_id DESC
                   ) AS rn
            FROM events
        )
        SELECT user_id, last_ts, last_type
        FROM ranked WHERE rn = 1
        ORDER BY user_id
    """,
}
