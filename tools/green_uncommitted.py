"""Oracle check for the uncommitted r16 changes (ann_recall_report,
fuzzy_decontaminate, minhash_dup_pairs) at sf0.001 + sf0.01."""
import sys, time, json
sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tests")
from pyspark.sql import SparkSession
spark = (SparkSession.builder.master("local[8]")
         .config("spark.sql.shuffle.partitions", "32").getOrCreate())
spark.sparkContext.setLogLevel("ERROR")
import __spark_entry__ as E
from oracle_harness import compare
qs, oracles = E.queries(), E.oracle_sql()
fails = []
for sf_dir in ("/root/testdata/sf0.001", "/root/testdata/sf0.01"):
    for name in ("ann_recall_report", "fuzzy_decontaminate", "minhash_dup_pairs"):
        t0 = time.time()
        try:
            problems = compare(qs[name](spark, sf_dir), oracles[name], sf_dir)
            dt = time.time() - t0
            if problems:
                fails.append((sf_dir, name, str(problems)[:200]))
                print(f"{sf_dir} {name}: FAIL {problems} ({dt:.1f}s)", flush=True)
            else:
                print(f"{sf_dir} {name}: ok ({dt:.1f}s)", flush=True)
        except Exception as exc:
            fails.append((sf_dir, name, repr(exc)[:200]))
            print(f"{sf_dir} {name}: ERROR {exc!r}"[:300], flush=True)
print(json.dumps({"fails": fails}))
sys.exit(1 if fails else 0)
