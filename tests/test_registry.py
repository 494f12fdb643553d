"""Registry rotation: the driver verifies ~50 queries per round in
registration order, so collect() must order least-recently-verified
first or the registry tail never earns a driver row."""

from __future__ import annotations

from hadoop_and_spark_spark.registry import collect, last_green_round


def test_collect_orders_least_recently_verified_first():
    queries, oracles = collect()
    green = last_green_round(has_oracle=set(oracles))
    rounds = [green.get(n, -1) for n in queries]
    assert rounds == sorted(rounds), (
        "collect() must be ascending in last-green-round "
        "(never-verified queries first)"
    )


def test_oracle_upgrade_reenters_window(tmp_path, monkeypatch):
    """A query verified rows-only that NOW carries an oracle has zero
    driver evidence for the stronger claim — it must sort as
    never-verified so the upgrade lands in the next driver window
    (this is how the round-7 PageRank oracle conversion gets its
    hash-green row in round 7, not round 9)."""
    import hadoop_and_spark_spark.registry as reg

    (tmp_path / "CORRECTNESS_r06.json").write_text(
        '{"upgraded": {"hash_match": null, "err": "no_oracle", "spark_rows": 9},'
        ' "still_rows_only": {"hash_match": null, "err": "no_oracle", "spark_rows": 9}}'
    )
    monkeypatch.setattr(reg, "_repo_root", lambda: str(tmp_path))
    green = reg.last_green_round(has_oracle={"upgraded"})
    assert "upgraded" not in green
    assert green["still_rows_only"] == 6


def test_every_query_name_is_registered_once_and_oracle_keys_subset():
    queries, oracles = collect()
    # collect() raises on duplicates; here we pin oracle keys refer to
    # real queries (a typo'd oracle name silently skips verification).
    stray = set(oracles) - set(queries)
    assert not stray, f"oracle entries without a registered query: {stray}"


def test_registry_fits_two_driver_windows():
    """Freshness cap, stated honestly: the driver verifies ~50 queries
    per round, least-recently-verified first, so 100 queries fit the
    strict every-query-within-2-rounds invariant and each query past
    100 stretches its own horizon to 3 rounds. The cap admits a grace
    of 7 such queries (the registry sits at exactly 107 — raised from
    105 in round 12 for the two judge-directed additions, the
    portable Count-Min twin and the capstone pipeline composition);
    growing further must retire a query or consciously rewrite this
    pin."""
    queries, _ = collect()
    window = 50  # driver rows per CORRECTNESS_r{N}.json, observed r1–r6
    strict_two_round_max = 2 * window  # 100
    grace = 7  # queries tolerated at a 3-round staleness horizon
    assert len(queries) <= strict_two_round_max + grace, (
        f"{len(queries)} registered queries exceed the two-window "
        f"freshness cap ({strict_two_round_max}) plus the {grace}-query "
        "grace; retire queries or rewrite this pin deliberately"
    )


def test_red_rows_do_not_count_as_verified(tmp_path, monkeypatch):
    import hadoop_and_spark_spark.registry as reg

    art = tmp_path / "CORRECTNESS_r09.json"
    art.write_text(
        '{"good": {"hash_match": true, "err": null, "spark_rows": 3},'
        ' "red": {"hash_match": false, "err": null, "spark_rows": 3},'
        ' "rows_only": {"hash_match": null, "err": "no_oracle", "spark_rows": 5},'
        ' "errored": {"hash_match": null, "err": "boom", "spark_rows": null}}'
    )
    monkeypatch.setattr(reg, "_repo_root", lambda: str(tmp_path))
    green = reg.last_green_round()
    assert green == {"good": 9, "rows_only": 9}


def test_later_red_row_supersedes_earlier_green(tmp_path, monkeypatch):
    """A query green in round 3 but red in round 5 must sort as
    NEVER-verified (-1), not at position 3: its most recent driver
    evidence is a regression, so it must re-enter the ~50-row driver
    window immediately."""
    import hadoop_and_spark_spark.registry as reg

    (tmp_path / "CORRECTNESS_r03.json").write_text(
        '{"regressed": {"hash_match": true, "err": null, "spark_rows": 3},'
        ' "stable": {"hash_match": true, "err": null, "spark_rows": 3}}'
    )
    (tmp_path / "CORRECTNESS_r05.json").write_text(
        '{"regressed": {"hash_match": false, "err": null, "spark_rows": 3},'
        ' "stable": {"hash_match": true, "err": null, "spark_rows": 3}}'
    )
    monkeypatch.setattr(reg, "_repo_root", lambda: str(tmp_path))
    green = reg.last_green_round()
    assert "regressed" not in green, (
        "a query whose LATEST driver row is red must be treated as "
        "never-verified so it re-enters the verification window"
    )
    assert green["stable"] == 5
