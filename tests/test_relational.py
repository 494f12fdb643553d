"""Differential tests: relational queries vs DuckDB oracle (SURVEY §5.2)."""

from __future__ import annotations

import pytest

from hadoop_and_spark_spark.operators import relational
from hadoop_and_spark_spark.oracle import compare


@pytest.mark.parametrize("name", sorted(relational.QUERIES))
def test_relational_vs_oracle(spark, sf_dir, name):
    ok, msg = compare(
        spark, sf_dir, relational.QUERIES[name], relational.ORACLE_SQL[name]
    )
    assert ok, f"{name}: {msg}"


def test_entry_smoke(spark):
    import sys

    sys.path.insert(0, "/root/repo")
    import __spark_entry__ as e

    df = e.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    q = e.queries()
    o = e.oracle_sql()
    assert set(o) <= set(q)
