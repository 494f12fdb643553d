"""Differential tests: text analytics vs DuckDB oracle."""

from __future__ import annotations

import pytest

from hadoop_and_spark_spark.operators import text
from hadoop_and_spark_spark.oracle import compare


@pytest.mark.parametrize("name", sorted(text.QUERIES))
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
