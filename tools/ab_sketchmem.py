"""Alternating A/B for the sketch_memberships Arrow kernel (r17, VERDICT #1):
OLD per-(table,bit,dim) fresh-allocation fold vs NEW reused-buffer
vectorized fold (bit-identical math; see operators/dedup.py).

Variants run the full consumer queries (ivfpq_recall is the driver-red one;
ann_recall_report is the heaviest membership consumer) with
dedup.sketch_memberships monkeypatched per variant. Usage:

    python tools/ab_sketchmem.py [reps] [query] [sf_dir]
"""
from __future__ import annotations

import gc
import statistics
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

import recsys_pipeline_spark.operators.dedup as dedup  # noqa: E402
from recsys_pipeline_spark.session import get_spark  # noqa: E402

NEW = dedup.sketch_memberships


def sketch_memberships_old(emb, planes, id_col="vec_id", vec_col="embedding",
                           with_vec=True):
    """The pre-r17 kernel, verbatim (fresh allocations per batch)."""
    import numpy as np
    import pandas as pd

    tables, bits = len(planes), planes[0].shape[0]
    prepared = emb.select(
        F.col(id_col).cast("long").alias("_id"),
        F.col(vec_col).cast("array<double>").alias("_v"),
    )

    def gen_memberships(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            X = np.array([np.asarray(v, dtype=np.float64) for v in pdf["_v"]])
            ids = pdf["_id"].to_numpy()
            for t in range(tables):
                words = np.zeros(len(ids), dtype=np.int64)
                for b in range(bits):
                    p = planes[t][b]
                    acc = X[:, 0] * p[0]
                    for k in range(1, X.shape[1]):
                        acc = acc + X[:, k] * p[k]
                    words |= (acc >= 0).astype(np.int64) << b
                cols = {"tbl": t, "sketch": words, "_id": ids}
                if with_vec:
                    cols["_v"] = pdf["_v"]
                yield pd.DataFrame(cols)

    schema = "tbl int, sketch long, _id long"
    if with_vec:
        schema += ", _v array<double>"
    return prepared.mapInPandas(gen_memberships, schema=schema)


def materialize(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 6
    qname = sys.argv[2] if len(sys.argv) > 2 else "ivfpq_recall"
    sf_dir = sys.argv[3] if len(sys.argv) > 3 else "/root/testdata/sf0.1"

    spark = get_spark("ab-sketchmem")
    spark.sparkContext.setLogLevel("ERROR")
    import __spark_entry__ as entry

    fn = entry.queries()[qname]
    variants = {"new": NEW, "old": sketch_memberships_old}

    def steal() -> int:
        with open("/proc/stat") as fh:
            return int(fh.readline().split()[8])

    try:
        for name, impl in variants.items():
            dedup.sketch_memberships = impl
            spark.sparkContext.setJobDescription(f"warmup:{name}")
            materialize(fn(spark, "/root/testdata/sf0.001"))

        times = {n: [] for n in variants}
        steals = {n: [] for n in variants}
        for rep in range(reps):
            order = ("new", "old") if rep % 2 == 0 else ("old", "new")
            for name in order:
                dedup.sketch_memberships = variants[name]
                spark.sparkContext.setJobDescription(f"{name}#{rep}")
                s0, t0 = steal(), time.perf_counter()
                df = fn(spark, sf_dir)
                materialize(df)
                dt = time.perf_counter() - t0
                del df
                gc.collect()
                times[name].append(dt)
                steals[name].append(steal() - s0)
                print(f"[rep {rep}] {name}: {dt:.3f}s (steal {steals[name][-1]}j)",
                      flush=True)
    finally:
        dedup.sketch_memberships = NEW

    print(f"\n=== {qname} @ {sf_dir} ===")
    for n, ts in times.items():
        print(f"{n}: min {min(ts):.3f}s median {statistics.median(ts):.3f}s "
              f"all={[round(t, 2) for t in ts]} steal={steals[n]}")
    spark.stop()


if __name__ == "__main__":
    main()
