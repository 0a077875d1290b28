"""Benchmark harness: runs the headline query set at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) and prints ONE JSON line with per-query and
total wall times. Each query is fully materialized through a noop sink so the
whole physical plan (scan -> shuffle -> window/join/agg) executes; nothing is
collected to the driver.
"""

from __future__ import annotations

import json
import os
import re
import time

import __spark_entry__ as entrymod
from recsys_pipeline_spark.session import get_spark

# Model-TRAINING queries (iterative ALS / FM fits) are correctness entries,
# not latency benchmarks — their cost is solver iterations, not query
# execution. The bench times the query surface; training quality/runtime is
# covered by tests/test_recall_rank_serve.py.
SKIP_TRAINING = {
    "mf_recall_topk", "rank_score_test", "rank_auc", "rank_deepfm_auc",
    "recommend_top50", "embedding_classifier_acc",
}


def materialize(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else -1.0
    spark = get_spark("recsys-pipeline-bench")

    # JIT/codegen warmup so the first measured query doesn't absorb JVM
    # compilation cost (standard benchmarking practice; touches every table
    # so file listings + footers are cached like a warmed metastore)
    from recsys_pipeline_spark.io import read_all_tables

    for df in read_all_tables(spark, sf_dir).values():
        df.count()

    timings: dict[str, float] = {}
    total = 0.0
    for name, fn in entrymod.queries().items():
        if name in SKIP_TRAINING:
            continue
        df = fn(spark, sf_dir)
        t0 = time.perf_counter()
        materialize(df)
        dt = time.perf_counter() - t0
        timings[name] = round(dt, 4)
        total += dt

    print(
        json.dumps(
            {
                "metric": "total_query_wall_time",
                "value": round(total, 4),
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
