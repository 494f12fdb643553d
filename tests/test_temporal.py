"""Tests for temporal operators: as-of attribution + sessionization."""

from __future__ import annotations

import pytest

from hadoop_and_spark_spark.operators import temporal
from hadoop_and_spark_spark.oracle import compare


@pytest.mark.parametrize("name", sorted(temporal.QUERIES))
def test_temporal_vs_oracle(spark, sf_dir, name):
    ok, msg = compare(
        spark, sf_dir, temporal.QUERIES[name], temporal.ORACLE_SQL[name]
    )
    assert ok, f"{name}: {msg}"


def test_asof_semantics_on_toy_frame(spark):
    """Hand-checkable as-of semantics: latest click at or BEFORE each
    purchase, per user; equal timestamps match (>=); no preceding
    click → NO_MATCH sentinel."""
    from pyspark.sql import functions as F

    rows = [
        # (event_id, ts, user_id, event_type)
        (1, "2024-01-01 10:00:00", 7, "click"),
        (2, "2024-01-01 11:00:00", 7, "purchase"),  # → click 1
        (3, "2024-01-01 12:00:00", 7, "click"),
        (4, "2024-01-01 12:00:00", 7, "purchase"),  # same ts → click 3
        (5, "2024-01-01 09:00:00", 8, "purchase"),  # no click before
        (6, "2024-01-01 09:30:00", 8, "click"),
        (7, "2024-01-01 09:45:00", 8, "purchase"),  # → click 6
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, ts string, user_id long, event_type string"
    ).select(
        "event_id",
        F.to_timestamp("ts").cast("timestamp_ntz").alias("ts"),
        "user_id",
        "event_type",
        F.lit(1.0).alias("value"),
        F.lit("{}").alias("props"),
    )

    import os
    import tempfile

    with tempfile.TemporaryDirectory() as d:
        ev.write.parquet(os.path.join(d, "events.parquet"))
        got = {
            r.purchase_id: r.click_id
            for r in temporal.asof_attribution(spark, d).collect()
        }
    assert got == {2: 1, 4: 3, 5: temporal.NO_MATCH, 7: 6}


def test_session_gap_boundary(spark):
    """An event exactly SESSION_GAP after the previous one EXTENDS the
    session (Spark merges when the next event's time equals the
    session end), and only a strictly larger gap opens a new one — the
    boundary the lag-based oracle mirrors with `> gap`."""
    from pyspark.sql import functions as F

    rows = [
        (1, "2024-01-01 00:00:00", 1),
        (2, "2024-01-01 05:59:59", 1),  # < gap → same session
        (3, "2024-01-01 11:59:59", 1),  # exactly 6h after #2 → merged
        (4, "2024-01-02 00:00:00", 1),  # > gap after #3 → NEW
    ]
    ev = spark.createDataFrame(rows, "event_id long, ts string, user_id long").select(
        "event_id",
        F.to_timestamp("ts").cast("timestamp_ntz").alias("ts"),
        "user_id",
        F.lit(1.0).alias("value"),
    )
    sessions = temporal.sessionize(ev).collect()
    assert [s.n_events for s in sessions] == [3, 1]


def test_streaming_sessions_match_batch(spark, sf_dir, tmp_path):
    """Batch/stream duality: the same sessionize() expression over the
    events table replayed as a file stream (availableNow) must produce
    the batch result exactly."""
    import shutil

    from hadoop_and_spark_spark.catalog import load_table

    ev = load_table(spark, sf_dir, "events")
    batch = [tuple(r) for r in temporal.user_sessions(spark, sf_dir).collect()]

    src = tmp_path / "stream_src"
    src.mkdir()
    shutil.copy(f"{sf_dir}/events.parquet", src / "events.parquet")
    stream = spark.readStream.schema(ev.schema).parquet(str(src))
    q = (
        temporal.streaming_user_sessions(stream)
        .writeStream.format("memory")
        .queryName("t_sessions")
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = [
        tuple(r)
        for r in spark.sql(
            "SELECT * FROM t_sessions ORDER BY user_id, session_start_us"
        ).collect()
    ]
    assert got == batch


def test_range_join_boundaries_and_bins(spark):
    """Window boundaries ((p-24h, p] — exclusive start, inclusive end)
    and the cross-bin case: a click late in the previous 24h bin must
    still count for an early-next-bin purchase (that's what the
    explode-to-two-bins exists for)."""
    from pyspark.sql import functions as F

    rows = [
        # user 1: purchase at 2024-01-02 01:00 (bin 19724 of 24h epochs)
        (1, "2024-01-02 01:00:00", 1, "purchase"),
        (2, "2024-01-01 23:00:00", 1, "click"),  # prev bin, in window
        (3, "2024-01-01 01:00:00", 1, "click"),  # exactly 24h → OUT
        (4, "2024-01-01 01:00:01", 1, "click"),  # just inside
        (5, "2024-01-02 01:00:00", 1, "click"),  # same instant → IN
        (6, "2024-01-02 02:00:00", 1, "click"),  # after purchase → OUT
        # user 2: no clicks at all
        (7, "2024-01-02 01:00:00", 2, "purchase"),
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, ts string, user_id long, event_type string"
    ).select(
        "event_id",
        F.to_timestamp("ts").cast("timestamp_ntz").alias("ts"),
        "user_id",
        "event_type",
        F.lit(1.0).alias("value"),
        F.lit("{}").alias("props"),
    )

    import os
    import tempfile

    with tempfile.TemporaryDirectory() as d:
        ev.write.parquet(os.path.join(d, "events.parquet"))
        got = {
            r.purchase_id: r.n_clicks_24h
            for r in temporal.range_join_counts(spark, d).collect()
        }
    assert got == {1: 3, 7: 0}


def test_range_join_plan_is_equi_join(spark, sf_dir):
    """The binned range join must plan as an equi hash join on
    (user_id, bin) — never the BroadcastNestedLoopJoin a raw
    inequality join degenerates to."""
    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        temporal.range_join_counts(spark, sf_dir).explain("simple")
    p = buf.getvalue()
    assert "NestedLoop" not in p
    assert "HashJoin" in p


def test_asof_plan_single_shuffle_no_join(spark, sf_dir):
    """The as-of plan must contain NO join node — one exchange on the
    key feeding a running window (plus the output sort)."""
    import contextlib
    import io

    df = temporal.asof_attribution(spark, sf_dir)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("simple")
    p = buf.getvalue()
    assert "Join" not in p
    assert p.count("Window") == 1
    # exchanges: one hash on user_id for the window/agg + the final
    # range sort; the pre-window click dedupe shares the user hash
    n_exchange = p.count("Exchange")
    assert n_exchange <= 3, p


def test_next_event_pairs_toy_transitions(spark, tmp_path):
    from datetime import datetime

    from hadoop_and_spark_spark.operators.temporal import next_event_pairs

    def ts(h, m=0):
        return datetime(2021, 1, 1, h, m)

    rows = [
        # user 1: a->b within bound, b->(c after 7h: pair dropped)
        (1, ts(0), 1, "a", 0.0, "{}"),
        (2, ts(1), 1, "b", 0.0, "{}"),
        (3, ts(8, 30), 1, "c", 0.0, "{}"),
        # user 2: simultaneous events tie-break by event_id
        (10, ts(2), 2, "x", 0.0, "{}"),
        (11, ts(2), 2, "y", 0.0, "{}"),
    ]
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp_ntz, user_id long, "
        "event_type string, value double, props string",
    ).write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))
    got = {
        r.event_id: (r.event_type, r.next_type, r.gap_us)
        for r in next_event_pairs(spark, str(tmp_path)).collect()
    }
    assert got == {
        1: ("a", "b", 3600 * 1_000_000),
        10: ("x", "y", 0),
    }


def test_pseudonymize_stable_and_injective(spark, sf_dir):
    from hadoop_and_spark_spark.catalog import load_table
    from hadoop_and_spark_spark.streaming.windows import pseudonymize_events

    out = pseudonymize_events(spark, sf_dir)
    assert "user_id" not in out.columns  # the raw id never leaves
    import pyspark.sql.functions as F

    n_users = (
        load_table(spark, sf_dir, "events").select("user_id").distinct().count()
    )
    n_hashes = out.select("user_hash").distinct().count()
    assert n_hashes == n_users  # injective re-keying: joins survive


def test_funnel_counts_matches_bruteforce(spark, sf_dir):
    """Driver-side replay of the ordered-funnel semantics: stage n+1
    counts exactly the users whose first stage-n event strictly
    precedes some stage-n+1 event."""
    from hadoop_and_spark_spark.catalog import load_table
    from hadoop_and_spark_spark.operators.temporal import (
        FUNNEL_STAGES,
        funnel_counts,
    )

    ev = load_table(spark, sf_dir, "events").collect()
    by_user: dict[int, list] = {}
    for r in ev:
        by_user.setdefault(r.user_id, []).append((r.ts, r.event_type))
    reach = [0, 0, 0]
    for rows in by_user.values():
        t_prev = None
        for i, stage in enumerate(FUNNEL_STAGES):
            ts = [
                t
                for t, typ in rows
                if typ == stage and (t_prev is None or t > t_prev)
            ]
            if not ts:
                break
            t_prev = min(ts)
            reach[i] += 1
    row = funnel_counts(spark, sf_dir).collect()[0]
    assert (row.n_stage1, row.n_stage2, row.n_stage3) == tuple(reach)
    assert row.n_stage1 >= row.n_stage2 >= row.n_stage3


def test_cohort_retention_triangle(spark, sf_dir):
    """Retention invariants: offset 0 exists for every cohort with its
    full cohort size (everyone is active on their first day), offsets
    are non-negative, and no (cohort, offset) cell exceeds the cohort
    size."""
    from hadoop_and_spark_spark.operators.temporal import cohort_retention

    rows = cohort_retention(spark, sf_dir).collect()
    assert rows
    size = {
        r.cohort_day: r.n_users for r in rows if r.day_offset == 0
    }
    cohorts = {r.cohort_day for r in rows}
    assert set(size) == cohorts  # day-0 row exists per cohort
    for r in rows:
        assert r.day_offset >= 0
        assert r.n_users <= size[r.cohort_day]
