"""Capstone pipeline composition: corpus_training_set vs its stages,
its composed DuckDB oracle, and its end-to-end plan shape."""

from __future__ import annotations

from hadoop_and_spark_spark.operators import pipeline
from hadoop_and_spark_spark.oracle import compare


def test_corpus_training_set_vs_oracle(spark, sf_dir):
    ok, msg = compare(
        spark,
        sf_dir,
        pipeline.corpus_training_set,
        pipeline.ORACLE_SQL["corpus_training_set"],
    )
    assert ok, msg


def test_corpus_training_set_composes_its_stages(spark, sf_dir):
    """The capstone's kept-document set must equal the INTERSECTION of
    the four gates run standalone — composition adds no filtering of
    its own and loses none (a regression here means the composed plan
    and the registered stages have drifted apart semantically)."""
    from pyspark.sql import functions as F

    from hadoop_and_spark_spark.operators.dedup import (
        decontaminate,
        dedup_survivors,
    )
    from hadoop_and_spark_spark.operators.textstats import (
        doc_quality,
        repetition_filter,
    )

    caps = pipeline.corpus_training_set(spark, sf_dir)
    kept = {r.doc_id for r in caps.select("doc_id").distinct().collect()}
    surv = {r.doc_id for r in dedup_survivors(spark, sf_dir).collect()}
    dec = {
        r.doc_id
        for r in decontaminate(spark, sf_dir)
        .where(~F.col("contaminated"))
        .collect()
    }
    rep = {
        r.doc_id
        for r in repetition_filter(spark, sf_dir).where("keep").collect()
    }
    qua = {
        r.doc_id
        for r in doc_quality(spark, sf_dir)
        .where(F.col("quality") >= pipeline.CAPSTONE_MIN_QUALITY)
        .collect()
    }
    expected = surv & dec & rep & qua
    assert kept == expected and kept  # non-empty AND a real filter
    assert expected < surv  # each gate actually bites on this corpus


def test_corpus_training_set_plan_shape(spark, sf_dir):
    """End-to-end plan audit of the composition: the whole pipeline
    must execute as ONE declarative plan whose only exchanges are the
    stages' own — the gate aggregates (repetition top-token, decon
    hits), the key-only kept-set joins, and the pack window's bucket
    partitioning — with zero global sorts, zero cartesian products,
    zero Python in the plan (the memoized pair graph enters as a
    checkpoint scan), and the packing window PARTITIONED (never the
    move-the-corpus-to-one-task trap). The hash-exchange budget is an
    upper bound, not an exact count, because AQE legitimately flips
    small sides between broadcast and shuffle as the corpus grows —
    what may never change is exchanges appearing for anything OTHER
    than a doc_id-keyed stage output or the bucket window."""
    plan = (
        pipeline.corpus_training_set(spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan
    assert "Exchange rangepartitioning" not in plan  # no global sort
    assert "Exchange SinglePartition" not in plan  # nothing driver-bound
    # every exchange is doc_id-keyed or the pack window's bucket key;
    # measured 8 at sf0.001 (2 gate aggregates + key-only joins + the
    # window) — headroom of 2 for AQE broadcast/shuffle flips
    assert plan.count("Exchange hashpartitioning") <= 10
    # the packing window is partitioned by bucket
    assert "Window [" in plan
    for line in plan.splitlines():
        if "windowspecdefinition" in line and "Window [" in line:
            assert "bucket" in line
