"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship point-in-time sliding-window feature query
on sf0.001; ``queries()`` / ``oracle_sql()`` expose every implemented operator
from SURVEY.md §2 with its DuckDB oracle (see recsys_pipeline_spark/queries.py).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from recsys_pipeline_spark import queries as Q
from recsys_pipeline_spark import queries_analytics as QA
from recsys_pipeline_spark import queries_ext as QX
from recsys_pipeline_spark import queries_ml as QM

SF0001 = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: point-in-time per-type imp/clk counts over each user's
    previous <=10 interactions (the reference's leak-free as-of feature join,
    offline/preprocess/s2_term_trans.py:37-61, re-expressed as window frames)."""
    return Q.q_pit_sliding_features(spark, SF0001)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {**Q.QUERIES, **QA.QUERIES_AN, **QX.QUERIES_EXT, **QM.QUERIES_ML}


def oracle_sql() -> dict[str, str]:
    return {**Q.ORACLES, **QA.ORACLES_AN, **QX.ORACLES_EXT, **QM.ORACLES_ML}
