"""Salted aggregation/join must be value-identical to the plain forms on a
deliberately skewed input (one key holds ~90% of rows)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from recsys_pipeline_spark.operators import skew


@pytest.fixture(scope="module")
def skewed(spark):
    rows = [(i, "hot" if i % 10 else f"cold{i}", float(i % 7)) for i in range(2000)]
    return spark.createDataFrame(rows, ["rid", "key", "v"]).cache()


def test_salted_sum_count_matches_plain(spark, skewed):
    got = {
        r["key"]: (r["n"], r["sum_v"])
        for r in skew.salted_sum_count(skewed, ["key"], ["v"], n_salts=8, unique_col="rid").collect()
    }
    want = {
        r["key"]: (r["n"], r["s"])
        for r in skewed.groupBy("key").agg(F.count(F.lit(1)).alias("n"), F.sum("v").alias("s")).collect()
    }
    assert set(got) == set(want)
    for k in want:
        assert got[k][0] == want[k][0]
        assert abs(got[k][1] - want[k][1]) < 1e-9  # float sum: different merge tree


def test_salted_join_matches_plain(spark, skewed):
    dim_rows = [("hot", 1), ("cold5", 2), ("absent", 3)]
    dim = spark.createDataFrame(dim_rows, ["key", "attr"])
    for how in ("inner", "left"):
        got = sorted(
            (r["rid"], r["attr"])
            for r in skew.salted_join(skewed, dim, "key", n_salts=4, how=how, big_unique_col="rid").collect()
        )
        want = sorted((r["rid"], r["attr"]) for r in skewed.join(dim, "key", how).collect())
        assert got == want, how
