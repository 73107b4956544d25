"""Every harness query must hash-match its DuckDB oracle (the driver's t2
correctness gate, replicated locally at sf0.001 for speed)."""

from __future__ import annotations

import pytest

from dublin_smart_city_graphdb_spark import harness
from tests.conftest import SF_DIR
from tools.check_oracle import compare


@pytest.mark.parametrize("name", sorted(harness.REGISTRY))
def test_query_matches_oracle(spark, duck, name):
    q = harness.REGISTRY[name]
    ok, msg, _ = compare(name, spark, duck, SF_DIR, q.fn, q.oracle)
    assert ok, f"{name}: {msg}"


def test_every_query_has_doc():
    for name, q in harness.REGISTRY.items():
        assert q.doc, f"{name} lacks an operator-inventory docstring"


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() >= 0
    assert set(e.oracle_sql()) <= set(e.queries())
