"""Every queries() entry must hash-match its DuckDB oracle — the same gate the
driver applies at sf0.01 (run locally at sf0.001 for speed; set
SPARK_GRAFT_TEST_SF=/root/testdata/sf0.01 to reproduce the driver's scale)."""

from __future__ import annotations

import pytest

import __spark_entry__ as entrymod
from tests.conftest import SF_ORACLE
from tests.oracle_harness import compare

QUERIES = entrymod.queries()
ORACLES = entrymod.oracle_sql()


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0


def test_every_query_has_callable_signature():
    for name, fn in QUERIES.items():
        assert callable(fn), name


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_matches_oracle(spark, name):
    df = QUERIES[name](spark, SF_ORACLE)
    if name not in ORACLES:
        assert df.count() >= 0  # rows-only check (non-SQL-expressible op)
        return
    problems = compare(df, ORACLES[name], SF_ORACLE)
    assert not problems, f"{name}: " + " | ".join(problems)
