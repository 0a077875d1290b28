"""Driver simulation for round-16 green check: bare session, entry(),
recorded-50 window + changed-query oracle compare at sf0.01."""
import sys, time, json

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tests")

from pyspark.sql import SparkSession

spark = (
    SparkSession.builder.master("local[8]")
    .config("spark.sql.shuffle.partitions", "32")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

import __spark_entry__ as E
from oracle_harness import compare

t0 = time.time()
rows = E.entry(spark).collect()
print(f"entry(): {len(rows)} rows in {time.time()-t0:.1f}s", flush=True)

qs = E.queries()
oracles = E.oracle_sql()
names = list(qs)
window = names[:50]
# queries affected by post-r15 commits, beyond the window
extra = [
    "repeat_purchase_sessions", "deepfm_score_det", "segment_quantiles_cont", "bpe_encode", "ngram_jaccard_dup", "embedding_near_dup", "exact_dedup", "fuzzy_decontaminate", "exact_mad",
    "ann_recall_report", "ngram_jaccard_dup", "audience_set_ops",
    "segment_quantiles", "sessionize", "salted_group_sum", "trailing_spend_30d",
]
check = window + [n for n in extra if n not in window]
sf_dir = "/root/testdata/sf0.01"
fails = []
for name in check:
    if name not in qs:
        fails.append((name, "MISSING from registry"))
        print(f"{name}: MISSING", flush=True)
        continue
    t0 = time.time()
    try:
        df = qs[name](spark, sf_dir)
        if name not in oracles:
            n = df.count()
            print(f"{name}: no_oracle rows={n} ({time.time()-t0:.1f}s)", flush=True)
            continue
        problems = compare(df, oracles[name], sf_dir)
        dt = time.time() - t0
        if problems:
            fails.append((name, problems))
            print(f"{name}: FAIL {problems} ({dt:.1f}s)", flush=True)
        else:
            print(f"{name}: ok ({dt:.1f}s)", flush=True)
    except Exception as exc:
        fails.append((name, repr(exc)[:300]))
        print(f"{name}: ERROR {exc!r}"[:400], flush=True)

print(json.dumps({"checked": len(check), "fails": [f[0] for f in fails]}))
sys.exit(1 if fails else 0)
