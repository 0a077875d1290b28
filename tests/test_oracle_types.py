"""All-oracle DuckDB output-type guard.

The driver materializes each oracle's result through pandas before hashing.
DuckDB's integer ``SUM`` returns HUGEINT (int128), which pandas widens to
float64 — so an oracle column can be value-identical to Spark's int64 and
still hash differently (``13.0`` vs ``13``). That exact defect kept
``tokenize_ids`` red through rounds 11-12 while rows/schema stayed green,
and four more oracles carried the same latent typing.

Class-level guard: bind EVERY registered oracle against the real parquet
schemas (analysis only — ``.types`` binds the plan, no query runs) and
assert no output column has a type pandas represents lossily or
differently from Spark's wire types. Any future ``SUM(...)`` added to an
oracle without a ``CAST(... AS BIGINT)`` fails here, locally, before it can
burn a driver round.
"""

from __future__ import annotations

import duckdb
import pytest

import __spark_entry__ as entrymod
from recsys_pipeline_spark.schemas import TESTDATA_TABLES
from tests.conftest import SF_SMOKE

# Types whose pandas materialization drifts from what Spark emits for the
# equivalent value: int128 widens to float64; UINT64 values above int64 also
# land in float64/object.  (DECIMAL is deliberately allowed — the harness
# canonicalizes Decimal as float, matching Spark's double aggregates, and
# several oracles rely on it.)
_BANNED = {"HUGEINT", "UHUGEINT", "UBIGINT"}


@pytest.fixture(scope="module")
def oracle_con():
    con = duckdb.connect()
    for t in TESTDATA_TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_SMOKE}/{t}.parquet'"
        )
    yield con
    con.close()


_ORACLES = entrymod.oracle_sql()


@pytest.mark.parametrize("name", sorted(_ORACLES))
def test_oracle_output_types_pandas_safe(oracle_con, name):
    rel = oracle_con.sql(_ORACLES[name])
    bad = [
        (col, str(typ))
        for col, typ in zip(rel.columns, rel.types)
        if str(typ) in _BANNED
    ]
    assert not bad, (
        f"oracle {name!r} emits driver-unsafe column types {bad}: the "
        f"driver's pandas canonicalizer widens these (HUGEINT -> float64) "
        f"so the value hash diverges from Spark's int64 even when values "
        f"match — wrap the aggregate in CAST(... AS BIGINT)"
    )
