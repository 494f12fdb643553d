"""Salted-join equivalence + hierarchical top-k equivalence tests."""

from __future__ import annotations

import pyspark.sql.functions as F

from hadoop_and_spark_spark.catalog import load_table
from hadoop_and_spark_spark.operators.skew import salted_equi_join


def test_salted_join_equals_plain_join(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type"
    )
    profile = (
        load_table(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(F.round(F.avg("value"), 6).alias("avg_value"))
    )
    plain = {
        (r.event_id, r.avg_value)
        for r in ev.join(profile, "user_id").collect()
    }
    salted = {
        (r.event_id, r.avg_value)
        for r in salted_equi_join(
            ev, profile, key="user_id", spread="event_id", salt=8
        ).collect()
    }
    assert salted == plain and plain


def test_salted_join_spreads_hot_key(spark):
    """A single ultra-hot key must land in >1 salt sub-key (the whole
    point), and the join must still match every row exactly once."""
    hot = spark.range(1000).select(
        F.lit(7).alias("k"), F.col("id").alias("rid")
    )
    dim = spark.createDataFrame([(7, "x")], "k long, v string")
    out = salted_equi_join(hot, dim, key="k", spread="rid", salt=8)
    assert out.count() == 1000
    n_salts = (
        hot.withColumn("s", F.pmod(F.hash("rid"), F.lit(8)))
        .select("s")
        .distinct()
        .count()
    )
    assert n_salts > 1


def test_hierarchical_topk_equals_naive_window(spark, sf_dir):
    from pyspark.sql import Window

    from hadoop_and_spark_spark.streaming.windows import (
        HEAVY_K,
        heavy_users_topk,
    )

    counts = (
        load_table(spark, sf_dir, "events")
        .groupBy("event_type", "user_id")
        .agg(F.count("*").alias("cnt"))
    )
    w = Window.partitionBy("event_type").orderBy(F.desc("cnt"), F.asc("user_id"))
    naive = {
        (r.event_type, r.rank, r.user_id, r.cnt)
        for r in counts.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= HEAVY_K)
        .collect()
    }
    got = {
        (r.event_type, r.rank, r.user_id, r.cnt)
        for r in heavy_users_topk(spark, sf_dir).collect()
    }
    assert got == naive and got
