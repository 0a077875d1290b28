"""Focused re-run of the 8x scale gate for repeat_purchase_sessions (the one
failure in the interrupted round-16 full-suite pass) with session_conversions
as its structural-twin control. Mirrors tests/test_scaleup.py exactly:
same replication, same warm + min-of-2 protocol."""

import sys
import time
from functools import reduce

sys.path.insert(0, "/root/repo")

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from recsys_pipeline_spark.io import read_table
import __spark_entry__ as entry

SF1 = "/root/testdata/sf0.1"
REPLICAS = 8
OFF = 10**12

spark = (
    SparkSession.builder.master("local[32]")
    .appName("check_repeat_scale")
    .config("spark.sql.shuffle.partitions", "32")
    .config("spark.driver.memory", "16g")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")


def _replicate(df: DataFrame, shift_cols):
    parts = []
    for i in range(REPLICAS):
        parts.append(
            df.select(
                *[
                    (F.col(c) + F.lit(i * OFF)).alias(c) if c in shift_cols else F.col(c)
                    for c in df.columns
                ]
            )
        )
    return reduce(DataFrame.unionByName, parts)


import tempfile, os

root = tempfile.mkdtemp(prefix="sf8_check_")
# both queries read only events
_replicate(read_table(spark, SF1, "events"), ["event_id", "user_id"]).repartition(
    32
).write.mode("overwrite").parquet(os.path.join(root, "events.parquet"))

q = entry.queries()


def _wall(fn, sf_dir):
    times = []
    for _ in range(2):
        t0 = time.perf_counter()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        times.append(time.perf_counter() - t0)
    return min(times)


for name in ["session_conversions", "repeat_purchase_sessions"]:
    fn = q[name]
    fn(spark, SF1).write.format("noop").mode("overwrite").save()
    fn(spark, root).write.format("noop").mode("overwrite").save()
    t1 = _wall(fn, SF1)
    t8 = _wall(fn, root)
    ratio = t8 / max(t1, 0.1)
    print(f"[scale-check] {name}: 1x={t1:.2f}s 8x={t8:.2f}s ratio={ratio:.1f}")

# cardinality check too (rows must be exactly 8x)
for name in ["session_conversions", "repeat_purchase_sessions"]:
    n1 = q[name](spark, SF1).count()
    n8 = q[name](spark, root).count()
    print(f"[card-check] {name}: n1={n1} n8={n8} exact8x={n8 == 8 * n1}")

spark.stop()
