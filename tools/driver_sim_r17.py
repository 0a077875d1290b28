"""Driver simulation for round-17: bare session, entry(), recorded-50
window + every-query-touched-this-round oracle compare at sf0.01."""
import json
import sys
import time

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
# queries touched in round 17: the BPE family (checkpoint cadence + pair
# alias), every sketch_memberships consumer (reused-buffer kernel), the
# fuzzy_decontaminate verify-width floor, and recommend_top50_det (fusion
# gate, if landed)
extra = [
    "bpe_train", "bpe_encode", "training_batches",
    "ivfpq_recall", "ivfpq_topk", "quantized_ann_overlap",
    "ann_recall_report", "embedding_near_dup_lsh", "ann_lsh_topk",
    "ann_ivf_topk", "semdedup_survivors", "cluster_balanced_sample",
    "fuzzy_decontaminate", "recommend_top50_det",
    "dup_span_trim", "dup_max_spans", "rolling_anomaly",
]
check = window + [n for n in extra if n not in window]
sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
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
