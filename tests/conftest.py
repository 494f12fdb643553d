from __future__ import annotations

import os

import pytest

os.environ.setdefault("SPARK_GRAFT_CPUS", "8")
os.environ.setdefault("SPARK_GRAFT_SHUFFLE", "8")

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    from hadoop_and_spark_spark.session import get_spark

    spark = get_spark("tests")
    yield spark


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF_DIR


def py_round6(x: float) -> float:
    """The one Python mirror of functions/portable.round6's
    half-away-from-zero tie rule — tests import THIS instead of
    hand-rolling copies, so a semantics change can't leave a stale
    witness validating the old rule."""
    import math

    mag = math.floor(abs(x) * 1e6 + 0.5) / 1e6
    return (-mag if x < 0 else mag) + 0.0  # + 0.0: -0.0 → +0.0
