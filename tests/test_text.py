"""Differential tests: text analytics vs DuckDB oracle."""

from __future__ import annotations

import pytest

from hadoop_and_spark_spark.operators import text
from hadoop_and_spark_spark.oracle import compare


@pytest.mark.parametrize("name", sorted(text.ORACLE_SQL))
def test_text_vs_oracle(spark, sf_dir, name):
    ok, msg = compare(spark, sf_dir, text.QUERIES[name], text.ORACLE_SQL[name])
    assert ok, f"{name}: {msg}"


def test_tokenizer_semantics(spark):
    """bespin Tokenizer parity: lowercase, strip non-alphanumerics,
    drop empties (a0/WordCount.java:19 import)."""
    from pyspark.sql import functions as F

    from hadoop_and_spark_spark.functions import tokenize

    df = spark.createDataFrame(
        [("Hello, World! it's 42 ",), ("",), ("--- ---",)], ["text"]
    )
    rows = df.select(tokenize("text").alias("t")).collect()
    assert rows[0].t == ["hello", "world", "it", "s", "42"]
    assert rows[1].t == []
    assert rows[2].t == []


def test_bigram_relfreq_sums_to_one(spark, sf_dir):
    """Per-a relative frequencies must sum to ~1 (A7 semantics)."""
    from pyspark.sql import functions as F

    df = text.bigram_relative_frequency(spark, sf_dir)
    sums = df.groupBy("a").agg(F.sum("rel_freq").alias("s")).collect()
    assert all(abs(r.s - 1.0) < 1e-3 for r in sums)


def test_doc_perplexity_scores_known_anomaly_higher(spark, sf_dir, tmp_path):
    """A doc of corpus-frequent repeated bigrams must score LOWER
    surprisal than a doc of singleton bigrams — the quality-filter
    contract — on a corpus constructed so both shapes exist."""
    import os

    from hadoop_and_spark_spark.operators.text import doc_perplexity

    ed = str(tmp_path / "lm")
    os.makedirs(ed, exist_ok=True)
    rows = (
        [(i, "the cat sat on the mat", "en", "t", 20) for i in range(20)]
        + [(100, "zqx wvu ptk mno jhg fde", "en", "t", 20)]
    )
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.mode("overwrite").parquet(os.path.join(ed, "documents.parquet"))
    scores = {r.doc_id: r.surprisal for r in doc_perplexity(spark, ed).collect()}
    assert scores[0] < scores[100]
    assert scores[0] == scores[19]  # identical docs score identically


def test_token_freq_sketch_within_cms_bound(spark, sf_dir):
    """The Count-Min guarantee against the exact (oracle-green)
    wordcount: exact <= approx <= exact + eps*N for every declared
    probe term, where N is the total token count."""
    from pyspark.sql import functions as F

    from hadoop_and_spark_spark.operators.text import (
        CMS_EPS,
        CMS_PROBES,
        _tokens,
        token_freq_sketch,
        wordcount,
    )

    exact = {r.word: r.cnt for r in wordcount(spark, sf_dir).collect()}
    n_total = (
        _tokens(spark, sf_dir).select(F.explode("toks")).count()
    )
    got = {r.term: r.approx_cnt for r in token_freq_sketch(spark, sf_dir).collect()}
    assert set(got) == set(CMS_PROBES)
    for t, approx in got.items():
        ex = exact.get(t, 0)
        assert ex <= approx <= ex + CMS_EPS * n_total, (t, ex, approx)


def test_token_freq_cms_bound_and_builtin_twin(spark, sf_dir):
    """The portable Count-Min grid honors the CMS guarantee against
    the exact (oracle-green) wordcount — never under-counts, and
    over-counts by at most e·N/width per probe (the standard bound at
    the grid's own ε = e/CMS_WIDTH) — and the engine-internal JVM
    sketch (token_freq_sketch, rows-only by necessity) is tolerance-
    PINNED against this hash-gated twin: both sketches bracket the
    same exact counts, so their estimates can differ by at most the
    sum of their over-estimate allowances. This is the cross-check
    that keeps the rows-only query honest without an oracle."""
    import math

    from pyspark.sql import functions as F

    from hadoop_and_spark_spark.operators.text import (
        CMS_EPS,
        CMS_PROBES,
        CMS_WIDTH,
        _tokens,
        token_freq_cms,
        token_freq_sketch,
        wordcount,
    )

    exact = {r.word: r.cnt for r in wordcount(spark, sf_dir).collect()}
    n_total = _tokens(spark, sf_dir).select(F.explode("toks")).count()
    portable = {
        r.term: r.approx_cnt for r in token_freq_cms(spark, sf_dir).collect()
    }
    builtin = {
        r.term: r.approx_cnt
        for r in token_freq_sketch(spark, sf_dir).collect()
    }
    assert set(portable) == set(CMS_PROBES) == set(builtin)
    slack_portable = math.e * n_total / CMS_WIDTH
    slack_builtin = CMS_EPS * n_total
    for t in CMS_PROBES:
        ex = exact.get(t, 0)
        assert ex <= portable[t] <= ex + slack_portable, (t, ex, portable[t])
        # twin pin: both bracket [exact, exact + own slack]
        assert abs(portable[t] - builtin[t]) <= slack_portable + slack_builtin


def test_token_freq_cms_partial_aggregates_and_broadcast_probe(spark, sf_dir):
    """The portable grid must build as partial+final hash aggregation
    (fixed-size sketch state merging map-side — the 100 TB property)
    and the probe read must broadcast the grid, never shuffle the
    probe side."""
    from hadoop_and_spark_spark.operators.text import token_freq_cms

    plan = (
        token_freq_cms(spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("HashAggregate") >= 2  # partial + final grid agg
    assert "BroadcastHashJoin" in plan


def test_token_freq_sketch_partial_aggregates(spark, sf_dir):
    """The sketch must build as partial+final aggregation (fixed-size
    state merging map-side), not a single global buffer."""
    from hadoop_and_spark_spark.functions import tokenize
    from hadoop_and_spark_spark.catalog import load_table
    from hadoop_and_spark_spark.operators.text import (
        CMS_CONF,
        CMS_EPS,
        CMS_SEED,
    )
    from pyspark.sql import functions as F

    plan = (
        load_table(spark, sf_dir, "documents")
        .select(F.explode(tokenize("text")).alias("w"))
        .agg(
            F.count_min_sketch(
                "w", F.lit(CMS_EPS), F.lit(CMS_CONF), F.lit(CMS_SEED)
            )
        )
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("ObjectHashAggregate") + plan.count("SortAggregate") >= 2
