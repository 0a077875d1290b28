"""Capture .explain('formatted') output for named queries to plans/<tag>/.

Usage: python tools/capture_plan.py <tag> <suffix> <query> [<query> ...]
Writes plans/<tag>/<query>_<suffix>.txt. Runs at sf0.001 (plan shape is
scale-independent; eager-materializing queries run small jobs only).
"""

import os
import sys

sys.path.insert(0, "/root/repo")

from pyspark.sql import SparkSession


def main() -> None:
    tag, suffix = sys.argv[1], sys.argv[2]
    names = sys.argv[3:]
    spark = (
        SparkSession.builder.master("local[4]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.ui.enabled", "false")
        .appName("capture-plan")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    import __spark_entry__ as entry

    qs = entry.queries()
    outdir = os.path.join("/root/repo/plans", tag)
    os.makedirs(outdir, exist_ok=True)
    for name in names:
        df = qs[name](spark, "/root/testdata/sf0.001")
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(outdir, f"{name}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(plan)
        print(f"wrote {path} ({len(plan)} chars)", flush=True)


if __name__ == "__main__":
    main()
