"""Differential tests: relational queries vs DuckDB oracle (SURVEY §5.2)."""

from __future__ import annotations

import pytest

from hadoop_and_spark_spark.operators import relational
from hadoop_and_spark_spark.oracle import compare


@pytest.mark.parametrize("name", sorted(relational.QUERIES))
def test_relational_vs_oracle(spark, sf_dir, name):
    if name not in relational.ORACLE_SQL:
        # rows-only at the driver (q9b: sketches aren't cross-engine
        # hashable); its correctness pin is
        # test_approx_percentile_tracks_exact
        assert relational.QUERIES[name](spark, sf_dir).count() >= 1
        return
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


def test_sql_surface_over_registered_views(spark, sf_dir):
    """The engine is usable as literal SQL: register_views + a
    spark.sql() rendering of the Q6 pricing summary must match the
    DataFrame query exactly (same Catalyst plan space, a5's
    SQL-vs-DataFrame duality)."""
    from hadoop_and_spark_spark.catalog import register_views
    from hadoop_and_spark_spark.operators.relational import (
        Q6_CUTOFF,
        q6_pricing_summary,
    )

    register_views(spark, sf_dir)
    got = spark.sql(f"""
        SELECT l_returnflag, l_linestatus,
               round(sum(l_quantity), 2)                         AS sum_qty,
               round(sum(l_extendedprice), 2)                    AS sum_base_price,
               round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
               round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2)
                                                                 AS sum_charge,
               round(avg(l_quantity), 4)                         AS avg_qty,
               round(avg(l_extendedprice), 4)                    AS avg_price,
               round(avg(l_discount), 4)                         AS avg_disc,
               count(*)                                          AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '{Q6_CUTOFF}'
        GROUP BY l_returnflag, l_linestatus
        ORDER BY l_returnflag, l_linestatus
    """).collect()
    want = q6_pricing_summary(spark, sf_dir).collect()
    assert [tuple(r) for r in got] == [tuple(r) for r in want]


def test_q9_histogram_matches_builtin_percentile_bitwise(spark, sf_dir):
    """The registered domain-bounded histogram plan must reproduce the
    builtin exact ``percentile`` aggregate BIT-FOR-BIT (same
    Percentile.getPercentile interpolation arithmetic), not merely
    within tolerance — that identity is what lets the scale-safe plan
    keep q9's hash-green DuckDB oracle."""
    from hadoop_and_spark_spark.operators.relational import (
        q9_percentiles_builtin,
        q9_price_percentiles,
    )

    got = [tuple(r) for r in q9_price_percentiles(spark, sf_dir).collect()]
    want = [tuple(r) for r in q9_percentiles_builtin(spark, sf_dir).collect()]
    assert got == want


def test_approx_percentile_tracks_exact(spark, sf_dir):
    """The registered 100 TB percentile plan (q9b's bounded-memory
    sketch) must land within 2% relative error of the exact
    interpolated percentiles (oracle-green q9) it replaces — this pin
    IS q9b's correctness story (sketches aren't cross-engine
    hashable, so the driver row is rows-only)."""
    from hadoop_and_spark_spark.operators.relational import (
        q9_price_percentiles,
        q9b_price_percentiles_approx,
    )

    exact = {r.l_returnflag: r for r in q9_price_percentiles(spark, sf_dir).collect()}
    approx = {
        r.l_returnflag: r
        for r in q9b_price_percentiles_approx(spark, sf_dir).collect()
    }
    assert set(exact) == set(approx)
    for k in exact:
        assert exact[k].cnt == approx[k].cnt
        for col in ("p50", "p90", "p99"):
            e, a = getattr(exact[k], col), getattr(approx[k], col)
            assert abs(a - e) / e < 0.02, (k, col, e, a)


def test_balance_quartiles_by_value_semantics(spark, sf_dir):
    """Quartile assignment is monotone in balance within a segment,
    uses all four buckets on real data, and matches a direct
    recomputation from the exact boundaries."""
    from hadoop_and_spark_spark.operators.relational import balance_quartiles

    rows = balance_quartiles(spark, sf_dir).collect()
    assert rows and {r.quartile for r in rows} == {1, 2, 3, 4}
    by_seg: dict[str, list] = {}
    for r in rows:
        by_seg.setdefault(r.c_mktsegment, []).append(r)
    for rs in by_seg.values():
        rs.sort(key=lambda r: r.c_acctbal)
        quarts = [r.quartile for r in rs]
        assert quarts == sorted(quarts)  # monotone in balance
        # by-value split: each bucket holds ~25% (interpolated
        # boundaries guarantee no bucket exceeds half the segment)
        n = len(rs)
        for q in (1, 2, 3, 4):
            assert quarts.count(q) <= n * 0.5 + 1
