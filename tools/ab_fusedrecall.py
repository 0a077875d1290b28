"""A/B for fused_recall's channel-fusion join: full_outer (old) vs the
complete-matrix left-join + term-only-union decomposition (new).

Modes:
  equiv  — value-equivalence: sorted collect-compare of q_recommend_top50_det
           at sf0.001 + sf0.01, plus an adversarial synthetic fused_recall
           case (term itemids outside the vector catalog, term userids
           outside the request set, NULL-score degenerate vectors).
  time   — alternating timed A/B of q_recommend_top50_det at sf0.1
           (noop sink, REPS alternating reps; min + median per variant).
"""

import os
import statistics
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import SparkSession, Window
from pyspark.sql import functions as F

import recsys_pipeline_spark.recall.retrieve as retrieve

REPS = int(os.environ.get("AB_REPS", "6"))
MODE = sys.argv[1] if len(sys.argv) > 1 else "equiv"


def fused_recall_old(user_vecs, item_vecs, user_terms, item_terms, seen,
                     k=200, vector_boost=0.9, term_boost=0.1,
                     ann_item_threshold=100_000):
    n_items = item_vecs.count()
    if n_items > ann_item_threshold:
        vec = retrieve.vector_scores_ann(user_vecs, item_vecs, k=max(k * 4, k))
    else:
        vec = retrieve.vector_scores(user_vecs, item_vecs)
    term = retrieve.term_scores(user_terms, item_terms)
    fused = (
        vec.join(term, ["userid", "itemid"], "full_outer")
        .select(
            "userid", "itemid",
            (F.lit(vector_boost) * F.coalesce(F.col("cos_score"), F.lit(0.0))
             + F.lit(term_boost) * F.coalesce(F.col("term_score"), F.lit(0.0))
             ).alias("recall_score"),
        )
    )
    seen_pairs = seen.select("userid", F.explode("items").alias("itemid"))
    fused = fused.join(seen_pairs, ["userid", "itemid"], "left_anti")
    w = Window.partitionBy("userid").orderBy(
        F.col("recall_score").desc(), F.col("itemid").asc())
    return (fused.withColumn("rk", F.row_number().over(w))
            .filter(F.col("rk") <= k).drop("rk"))


def main():
    spark = (
        SparkSession.builder.master("local[8]" if MODE == "equiv" else "local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.ui.enabled", "false")
        .appName("ab-fusedrecall")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    import __spark_entry__ as entry

    qs = entry.queries()

    if MODE == "equiv":
        ok = True
        # 1. composite collect-compare: monkeypatch old formulation in
        for sf_dir in ("/root/testdata/sf0.001", "/root/testdata/sf0.01"):
            new_rows = sorted(
                map(tuple, qs["recommend_top50_det"](spark, sf_dir).collect()))
            saved = retrieve.fused_recall
            retrieve.fused_recall = fused_recall_old
            try:
                old_rows = sorted(
                    map(tuple, qs["recommend_top50_det"](spark, sf_dir).collect()))
            finally:
                retrieve.fused_recall = saved
            same = old_rows == new_rows
            ok &= same
            print(f"{sf_dir}: rows={len(new_rows)} identical={same}", flush=True)

        # 2. adversarial direct fused_recall case
        uv = spark.createDataFrame(
            [(1, [1.0, 0.0]), (2, [0.0, 1.0]), (3, [0.0, 0.0])],  # 3: zero-norm
            "userid long, vector array<double>")
        iv = spark.createDataFrame(
            [(10, [1.0, 1.0]), (11, [0.0, 0.0])],  # 11: zero-norm item
            "itemid long, vector array<float>")
        ut = spark.createDataFrame(
            [(1, [7]), (2, [8]), (99, [7, 8])],  # 99: user outside vec set
            "userid long, terms array<int>")
        it = spark.createDataFrame(
            [(10, [7]), (500, [7, 8])],  # 500: item outside catalog
            "itemid long, genre_ids array<int>")
        seen = spark.createDataFrame(
            [(1, [10])], "userid long, items array<bigint>")
        new_rows = sorted(map(tuple, retrieve.fused_recall(
            uv, iv, ut, it, seen, k=5).collect()))
        old_rows = sorted(map(tuple, fused_recall_old(
            uv, iv, ut, it, seen, k=5).collect()))
        same = old_rows == new_rows
        ok &= same
        print(f"adversarial: rows={len(new_rows)} identical={same}", flush=True)
        if not same:
            print("old:", old_rows)
            print("new:", new_rows)
        print("EQUIV PASS" if ok else "EQUIV FAIL", flush=True)
        sys.exit(0 if ok else 1)

    # timed mode (restore the real fused_recall whatever REPS' parity is)
    sf_dir = "/root/testdata/sf0.1"
    fn = qs["recommend_top50_det"]
    saved = retrieve.fused_recall
    variants = {"new": saved, "old": fused_recall_old}
    try:
        # warm both
        for name, impl in variants.items():
            retrieve.fused_recall = impl
            fn(spark, "/root/testdata/sf0.001").write.format("noop").mode("overwrite").save()
        times = {"new": [], "old": []}
        for r in range(REPS):
            for name in ("new", "old") if r % 2 == 0 else ("old", "new"):
                retrieve.fused_recall = variants[name]
                t0 = time.time()
                fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
                dt = time.time() - t0
                times[name].append(dt)
                print(f"rep{r} {name}: {dt:.3f}s", flush=True)
    finally:
        retrieve.fused_recall = saved
    for name, ts in times.items():
        print(f"{name}: min={min(ts):.3f} median={statistics.median(ts):.3f}", flush=True)


if __name__ == "__main__":
    main()
