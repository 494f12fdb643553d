"""Inverted index + boolean retrieval tests."""

from __future__ import annotations

import pytest

from hadoop_and_spark_spark.operators import index
from hadoop_and_spark_spark.oracle import compare


@pytest.mark.parametrize("name", sorted(index.QUERIES))
def test_index_vs_oracle(spark, sf_dir, name):
    ok, msg = compare(spark, sf_dir, index.QUERIES[name], index.ORACLE_SQL[name])
    assert ok, f"{name}: {msg}"


def test_written_index_roundtrip(spark, sf_dir, tmp_path):
    """Persisted index: typed postings survive the parquet round-trip
    docno-sorted, partitioned into the reference's 4-way split."""
    out = str(tmp_path / "idx")
    index.write_index(spark, sf_dir, out, buckets=4)
    idx = spark.read.parquet(out)
    assert set(idx.columns) == {"term", "df", "postings"}
    row = idx.where(idx.term == "spark").collect()[0]
    docnos = [p.doc_id for p in row.postings]
    assert docnos == sorted(docnos)
    assert row.df == len(docnos)


def test_rpn_and_or_semantics(spark, sf_dir):
    """(spark OR hash) AND table == manual set algebra on doc sets."""
    from pyspark.sql import functions as F

    from hadoop_and_spark_spark.functions import tokenize
    from hadoop_and_spark_spark.catalog import load_table

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", tokenize("text").alias("toks")
    )
    expected = {
        r.doc_id
        for r in docs.where(
            (
                F.array_contains("toks", "spark") | F.array_contains("toks", "hash")
            )
            & F.array_contains("toks", "table")
        ).collect()
    }
    got = {r.doc_id for r in index.boolean_retrieval(spark, sf_dir).collect()}
    assert got == expected and got
