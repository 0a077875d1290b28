"""Construct-vs-execute split for named queries (r16 survey tool, r17 form):
times DataFrame CONSTRUCTION (driver-side Catalyst planning + any eager
work) separately from EXECUTION (noop materialization of the built plan).

Usage: python tools/construct_split.py <query> [<query>...] [--reps N]
       [--sf /root/testdata/sf0.1]
"""
from __future__ import annotations

import gc
import statistics
import sys
import time

sys.path.insert(0, "/root/repo")

from recsys_pipeline_spark.session import get_spark  # noqa: E402


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    reps = 5
    sf_dir = "/root/testdata/sf0.1"
    for i, a in enumerate(sys.argv):
        if a == "--reps":
            reps = int(sys.argv[i + 1])
        if a == "--sf":
            sf_dir = sys.argv[i + 1]
    spark = get_spark("construct-split")
    spark.sparkContext.setLogLevel("ERROR")
    import __spark_entry__ as entry

    qs = entry.queries()
    for name in args:
        fn = qs[name]
        spark.sparkContext.setJobDescription(f"warm:{name}")
        fn(spark, "/root/testdata/sf0.001").write.format("noop").mode(
            "overwrite").save()
        cons, execs = [], []
        for r in range(reps):
            spark.sparkContext.setJobDescription(f"{name}#{r}")
            gc.collect()
            t0 = time.perf_counter()
            df = fn(spark, sf_dir)
            t1 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            t2 = time.perf_counter()
            del df
            cons.append(t1 - t0)
            execs.append(t2 - t1)
            print(f"[{name} rep {r}] construct {t1-t0:.3f}s execute {t2-t1:.3f}s",
                  flush=True)
        print(f"== {name}: construct min {min(cons):.3f} med "
              f"{statistics.median(cons):.3f} | execute min {min(execs):.3f} "
              f"med {statistics.median(execs):.3f}", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
