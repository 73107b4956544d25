"""Every harness query must hash-match its DuckDB oracle (the driver's t2
correctness gate, replicated locally at sf0.001 for speed)."""

from __future__ import annotations

import pytest

from dublin_smart_city_graphdb_spark import harness
from tests.conftest import SF_DIR
from tools.check_oracle import compare


# Driver-window hygiene (round 12, VERDICT r11 item 6): the full
# 202-entry oracle replica is the slow-gate class (tools/check_oracle
# + the committed LOCALGATE runs cover it); excluded from the default
# suite so the driver's verify completes inside its window.
@pytest.mark.slow
@pytest.mark.parametrize("name", sorted(harness.REGISTRY))
def test_query_matches_oracle(spark, duck, name):
    q = harness.REGISTRY[name]
    res = compare(name, spark, duck, SF_DIR, q.fn, q.oracle)
    assert res.ok, f"{name}: {res.msg}"


def test_every_query_has_doc():
    for name, q in harness.REGISTRY.items():
        assert q.doc, f"{name} lacks an operator-inventory docstring"


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() >= 0
    assert set(e.oracle_sql()) <= set(e.queries())


# sf0.01 replica of the driver's gate (VERDICT r3 task 9): sf-dependent
# divergence is real (r1's scalar_numeric), so the driver-scale data gets
# its own marker-gated sweep. Excluded from the default suite (pytest.ini
# addopts '-m "not slow"'); run with `pytest -m slow -q`.
SF_001 = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def duck_sf001():
    from tools.check_oracle import duck_connection

    return duck_connection(SF_001)


@pytest.mark.slow
@pytest.mark.parametrize("name", sorted(harness.REGISTRY))
def test_query_matches_oracle_sf001(spark, duck_sf001, name):
    q = harness.REGISTRY[name]
    res = compare(name, spark, duck_sf001, SF_001, q.fn, q.oracle)
    assert res.ok, f"{name}: {res.msg}"


# Per-round sf0.01 rotation (VERDICT r5 task 3): the DEFAULT suite runs a
# deterministic ~20-entry cohort at driver scale each round (the full
# sf0.01 sweep stays behind the slow marker), so every registry entry
# gets fresh full-scale oracle evidence within ~8 rounds even when only
# the default suite runs. The round number is inferred from the driver's
# committed CORRECTNESS_r*.json artifacts; tools/close_round.py records
# the same cohort in LOCALGATE metadata.
def _current_round() -> int:
    import glob
    import os

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    return len(glob.glob(os.path.join(root, "CORRECTNESS_r*.json"))) + 1


def _rotation_cohort() -> list[str]:
    from tools.close_round import rotation_cohort

    return rotation_cohort(_current_round(), sorted(harness.REGISTRY))


@pytest.mark.parametrize("name", _rotation_cohort())
def test_rotation_cohort_matches_oracle_sf001(spark, duck_sf001, name):
    q = harness.REGISTRY[name]
    res = compare(name, spark, duck_sf001, SF_001, q.fn, q.oracle)
    assert res.ok, f"{name}: {res.msg}"
