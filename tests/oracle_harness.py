"""Local replica of the driver's DuckDB-oracle correctness gate.

For each (query, oracle_sql) pair: run the Spark DataFrame and the DuckDB SQL
on the same parquet tables, then compare row count, column-name set, and an
order-insensitive canonical value comparison (columns sorted by name, rows
sorted by canonical repr). Exact — floats must match bit-for-bit, which the
query design guarantees via decimal-exact aggregation.
"""

from __future__ import annotations

import datetime
import decimal
import math

import duckdb

from recsys_pipeline_spark.schemas import TESTDATA_TABLES


def _canon(v):
    if v is None:
        return "\x00NULL"
    if isinstance(v, bool):
        return f"b:{int(v)}"
    if isinstance(v, (int,)):
        return f"i:{v}"
    if isinstance(v, decimal.Decimal):
        return f"f:{float(v)!r}"
    if isinstance(v, float):
        if math.isnan(v):
            return "f:nan"
        return f"f:{v!r}"
    if isinstance(v, datetime.datetime):
        return f"t:{v.isoformat()}"
    if isinstance(v, datetime.date):
        return f"d:{v.isoformat()}"
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_canon(x) for x in v) + "]"
    return f"s:{v}"


def canonical_rows(col_names, rows):
    order = sorted(range(len(col_names)), key=lambda i: col_names[i])
    out = [tuple(_canon(r[i]) for i in order) for r in rows]
    out.sort()
    return out


def run_oracle(sql: str, sf_dir: str):
    con = duckdb.connect()
    try:
        for t in TESTDATA_TABLES:
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
        cur = con.execute(sql)
        cols = [d[0] for d in cur.description]
        rows = cur.fetchall()
        return cols, rows
    finally:
        con.close()


def compare(spark_df, sql: str, sf_dir: str) -> list[str]:
    """Returns a list of mismatch descriptions (empty == pass)."""
    problems: list[str] = []
    s_cols = spark_df.columns
    s_rows = [tuple(r) for r in spark_df.collect()]
    d_cols, d_rows = run_oracle(sql, sf_dir)
    if sorted(s_cols) != sorted(d_cols):
        problems.append(f"schema mismatch: spark={sorted(s_cols)} duckdb={sorted(d_cols)}")
        return problems
    if len(s_rows) != len(d_rows):
        problems.append(f"row count mismatch: spark={len(s_rows)} duckdb={len(d_rows)}")
    a = canonical_rows(s_cols, s_rows)
    b = canonical_rows(d_cols, d_rows)
    if a != b:
        diff_a = [r for r in a if r not in set(b)][:3]
        diff_b = [r for r in b if r not in set(a)][:3]
        problems.append(f"value mismatch: spark-only={diff_a} duckdb-only={diff_b}")
    return problems
