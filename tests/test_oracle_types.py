"""All-oracle DuckDB output-type guard.

The driver materializes each oracle's result through pandas before hashing.
DuckDB's integer ``SUM`` returns HUGEINT (int128), which pandas widens to
float64 — so an oracle column can be value-identical to Spark's int64 and
still hash differently (``13.0`` vs ``13``). That exact defect kept
``tokenize_ids`` red through rounds 11-12 while rows/schema stayed green,
and four more oracles carried the same latent typing.

Class-level guard, ALLOWLIST form: bind EVERY registered oracle against the
real parquet schemas (analysis only — ``.types`` binds the plan, no query
runs) and accept only types whose pandas materialization is representation-
stable against Spark's toPandas output. This rejects not just the HUGEINT
class but every other lossy/drifting family before it can burn a driver
round: DATE (pandas datetime64 prints ``2024-01-01 00:00:00`` vs Spark's
``datetime.date``), DECIMAL (object column), TIMESTAMPTZ, UUID, unsigned
ints, INTERVAL, …  Recorded-window oracles additionally reject LIST types
(the driver's sort_values cannot factorize list cells — the CORRECTNESS_r11
err); deferred entries may emit lists because only the pytest fetchall
harness compares them.
"""

from __future__ import annotations

import duckdb
import pytest

import __spark_entry__ as entrymod
from recsys_pipeline_spark.schemas import TESTDATA_TABLES
from tests.conftest import SF_SMOKE

RECORDED_WINDOW = 50

# pandas-representation-stable scalar types (match Spark's toPandas dtypes):
# signed ints -> int64, DOUBLE/FLOAT -> float64, VARCHAR -> object(str),
# BOOLEAN -> bool, TIMESTAMP (naive micros) -> datetime64[us/ns].
_SCALAR_OK = {
    "BIGINT", "INTEGER", "SMALLINT", "TINYINT",
    "DOUBLE", "FLOAT", "VARCHAR", "BOOLEAN", "TIMESTAMP",
}
_LIST_OK = {f"{t}[]" for t in _SCALAR_OK}


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
_RECORDED = set(list(entrymod.queries())[:RECORDED_WINDOW])


@pytest.mark.parametrize("name", sorted(_ORACLES))
def test_oracle_output_types_pandas_safe(oracle_con, name):
    allowed = _SCALAR_OK if name in _RECORDED else _SCALAR_OK | _LIST_OK
    rel = oracle_con.sql(_ORACLES[name])
    bad = [
        (col, str(typ))
        for col, typ in zip(rel.columns, rel.types)
        if str(typ) not in allowed
    ]
    where = "recorded-window" if name in _RECORDED else "deferred"
    assert not bad, (
        f"{where} oracle {name!r} emits driver-unsafe column types {bad}: "
        f"the driver's pandas canonicalizer represents these differently "
        f"from Spark's toPandas output (HUGEINT->float64, DATE->datetime64, "
        f"DECIMAL->object, lists unsortable in-window) — CAST to one of "
        f"{sorted(allowed)}"
    )
