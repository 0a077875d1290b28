"""Driver-faithful hash simulation over EVERY oracle-carrying entry.

tests/test_oracle_parity.py compares through ``fetchall()`` Python values —
which is how the round-11/12 ``tokenize_ids`` defect stayed invisible
locally: DuckDB HUGEINT arrives as a Python int (matches Spark) but the
driver materializes results through PANDAS, where it widens to float64 and
the value hash diverges. This suite closes that fidelity gap for every
oracle-carrying registry entry — the recorded 46 AND the deferred tail, so
any future window promotion is pre-validated against the driver's exact
canonicalization: both engines' results go through the pandas path
(Spark ``toPandas`` vs DuckDB ``.df()``), dtypes are normalized only in
ways pandas itself guarantees lossless (int widths), rows are sorted by
every column, and the CSV rendering is hashed — if the two renderings
differ HERE, the driver's hash will differ too.

Runs at sf0.001 (the window's eager ML entries already pay that scale in
the window-shape suite); entries without an oracle (iterative ML training)
are skipped exactly as the driver records them rows-only.
"""

from __future__ import annotations

import hashlib

import duckdb
import pandas as pd
import pytest

import __spark_entry__ as entrymod
from recsys_pipeline_spark.schemas import TESTDATA_TABLES
from tests.conftest import SF_SMOKE

RECORDED_WINDOW = 50


def _canon_csv(df: pd.DataFrame) -> str:
    df = df[sorted(df.columns)].copy()
    # normalize integer WIDTH only (int32 vs int64 render identically in
    # CSV anyway; this keeps the sort deterministic across engines) — never
    # int<->float: that difference is exactly what must fail the test
    for c in df.columns:
        if pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("int64")
        elif pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].astype("float64")
        elif pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]")
    df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(
        drop=True
    )
    return hashlib.md5(df.to_csv(index=False).encode()).hexdigest()


@pytest.fixture(scope="module")
def oracle_con():
    con = duckdb.connect()
    for t in TESTDATA_TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_SMOKE}/{t}.parquet'"
        )
    yield con
    con.close()


_QUERIES = entrymod.queries()
_ORACLES = entrymod.oracle_sql()
# every oracle entry, recorded window first (registration order preserved)
_CHECKED = [n for n in _QUERIES if n in _ORACLES]


@pytest.mark.parametrize("name", _CHECKED)
def test_query_pandas_hash_matches_oracle(spark, oracle_con, name):
    spd = _QUERIES[name](spark, SF_SMOKE).toPandas()
    opd = oracle_con.sql(_ORACLES[name]).df()
    assert sorted(spd.columns) == sorted(opd.columns), (
        f"{name}: column mismatch {sorted(spd.columns)} vs {sorted(opd.columns)}"
    )
    assert len(spd) == len(opd), f"{name}: row count {len(spd)} vs {len(opd)}"
    h_s, h_o = _canon_csv(spd), _canon_csv(opd)
    if h_s != h_o:
        # render a small diff for the failure message
        a = spd[sorted(spd.columns)].astype(str)
        b = opd[sorted(opd.columns)].astype(str)
        dt_s = dict(spd.dtypes.astype(str))
        dt_o = dict(opd.dtypes.astype(str))
        pytest.fail(
            f"{name}: pandas-path hash mismatch (driver would record "
            f"hash_match=false). spark dtypes={dt_s} oracle dtypes={dt_o}; "
            f"spark head={a.head(3).to_dict()} oracle head={b.head(3).to_dict()}"
        )
