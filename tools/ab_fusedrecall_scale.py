"""fused_recall channel-fusion crossover sweep (r17, VERDICT #6).

The r16 A/B rejected the complete-matrix decomposition (full_outer ->
broadcast LEFT join + uncovered-term union) at the bench's 150k-row score
matrix (1.26x slower: the removed sort was tiny, the added stages weren't).
At 100 TB the matrix is |batch| x |catalog| and the full-outer's sort is NOT
free — this sweep grows a SYNTHETIC matrix (deterministic hash vectors) to
find the crossover, so the shape switch can be gated on matrix size the way
vector_scores gates its broadcast.

Modes:
    python tools/ab_fusedrecall_scale.py equiv          # value-identity
    python tools/ab_fusedrecall_scale.py time [reps]    # sweep + A/B
"""
from __future__ import annotations

import statistics
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import Window  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

import recsys_pipeline_spark.recall.retrieve as retrieve  # noqa: E402
from recsys_pipeline_spark.session import get_spark  # noqa: E402

MODE = sys.argv[1] if len(sys.argv) > 1 else "equiv"
REPS = int(sys.argv[2]) if len(sys.argv) > 2 else 4

# (n_users, n_items) -> matrix rows; bench-scale is 1500 x 100 = 150k
SCALES = [(1500, 100), (6000, 4000), (20000, 4000)]
DIM = 16
GENRES = 24


def synth(spark, n_users: int, n_items: int):
    """Deterministic synthetic recall inputs at a given matrix size."""
    def vec(idcol, salt):
        return F.array(*[
            (F.pmod(F.xxhash64(F.col(idcol) * 2654435761 + d * salt), F.lit(2000))
             .cast("double") / 1000.0 - 1.0)
            for d in range(DIM)
        ])

    u = spark.range(n_users).select(
        F.col("id").alias("userid"), vec("id", 7).alias("vector"))
    i = spark.range(n_items).select(
        F.col("id").alias("itemid"), vec("id", 13).alias("vector"))
    ut = spark.range(n_users).select(
        F.col("id").alias("userid"),
        F.array(F.pmod(F.col("id"), F.lit(GENRES)).cast("int")).alias("terms"))
    it = spark.range(n_items).select(
        F.col("id").alias("itemid"),
        F.array(
            F.pmod(F.col("id"), F.lit(GENRES)).cast("int"),
            F.pmod(F.col("id") + 1, F.lit(GENRES)).cast("int"),
        ).alias("genre_ids"))
    seen = spark.range(n_users).select(
        F.col("id").alias("userid"),
        F.array(F.pmod(F.col("id"), F.lit(n_items))).alias("items"))
    return u, i, ut, it, seen


def fused_recall_decomp(user_vecs, item_vecs, user_terms, item_terms, seen,
                        k=200, vector_boost=0.9, term_boost=0.1,
                        ann_item_threshold=100_000):
    """Complete-matrix decomposition: vec LEFT-joins the (broadcast) term
    channel — every term row whose userid is a scored user AND itemid is a
    catalog item is covered by exactly one matrix row — and the uncovered
    term rows (outside the request set / catalog) union in with cos 0.
    Exactly the full_outer's rows; one fewer full-matrix exchange+sort."""
    n_items = item_vecs.count()
    term = retrieve.term_scores(user_terms, item_terms)
    if n_items > ann_item_threshold:
        return retrieve.fused_recall(user_vecs, item_vecs, user_terms,
                                     item_terms, seen, k=k,
                                     vector_boost=vector_boost,
                                     term_boost=term_boost,
                                     ann_item_threshold=ann_item_threshold)
    vec = retrieve.vector_scores(user_vecs, item_vecs, n_items=n_items)
    score = (
        F.lit(vector_boost) * F.coalesce(F.col("cos_score"), F.lit(0.0))
        + F.lit(term_boost) * F.coalesce(F.col("term_score"), F.lit(0.0))
    ).alias("recall_score")
    term = term.localCheckpoint(eager=False)  # consumers: covered join + leftover
    main = vec.join(F.broadcast(term), ["userid", "itemid"], "left").select(
        "userid", "itemid", score)
    uids = user_vecs.select("userid").withColumn("_u", F.lit(True))
    iids = item_vecs.select("itemid").withColumn("_i", F.lit(True))
    leftover = (
        term.join(F.broadcast(uids), "userid", "left")
        .join(F.broadcast(iids), "itemid", "left")
        .filter(F.col("_u").isNull() | F.col("_i").isNull())
        .select("userid", "itemid",
                F.lit(None).cast("double").alias("cos_score"), "term_score")
        .select("userid", "itemid", score)
    )
    fused = main.unionByName(leftover)
    seen_pairs = seen.select("userid", F.explode("items").alias("itemid"))
    fused = fused.join(seen_pairs, ["userid", "itemid"], "left_anti")
    w = Window.partitionBy("userid").orderBy(
        F.col("recall_score").desc(), F.col("itemid").asc())
    return (fused.withColumn("rk", F.row_number().over(w))
            .filter(F.col("rk") <= k).drop("rk"))


def materialize(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    spark = get_spark("ab-fusedrecall-scale")
    spark.sparkContext.setLogLevel("ERROR")

    if MODE == "equiv":
        ok = True
        for nu, ni in [(200, 50), (1500, 100)]:
            frames = synth(spark, nu, ni)
            new_rows = sorted(map(tuple, fused_recall_decomp(*frames, k=50).collect()))
            old_rows = sorted(map(tuple, retrieve.fused_recall(*frames, k=50).collect()))
            same = old_rows == new_rows
            ok &= same
            print(f"{nu}x{ni}: rows={len(new_rows)} identical={same}", flush=True)
        # adversarial: term users outside request set, items outside catalog,
        # zero-norm vectors (NULL cos)
        uv = spark.createDataFrame(
            [(1, [1.0, 0.0]), (2, [0.0, 1.0]), (3, [0.0, 0.0])],
            "userid long, vector array<double>")
        iv = spark.createDataFrame(
            [(10, [1.0, 1.0]), (11, [0.0, 0.0])],
            "itemid long, vector array<double>")
        ut = spark.createDataFrame(
            [(1, [7]), (2, [8]), (99, [7, 8])], "userid long, terms array<int>")
        it = spark.createDataFrame(
            [(10, [7]), (500, [7, 8])], "itemid long, genre_ids array<int>")
        seen = spark.createDataFrame([(1, [10])], "userid long, items array<bigint>")
        new_rows = sorted(map(tuple, fused_recall_decomp(uv, iv, ut, it, seen, k=5).collect()))
        old_rows = sorted(map(tuple, retrieve.fused_recall(uv, iv, ut, it, seen, k=5).collect()))
        same = old_rows == new_rows
        ok &= same
        print(f"adversarial: rows={len(new_rows)} identical={same}", flush=True)
        if not same:
            print("old:", old_rows)
            print("new:", new_rows)
        print("EQUIV PASS" if ok else "EQUIV FAIL", flush=True)
        sys.exit(0 if ok else 1)

    def steal() -> int:
        with open("/proc/stat") as fh:
            return int(fh.readline().split()[8])

    for nu, ni in SCALES:
        frames = synth(spark, nu, ni)
        variants = {
            "full_outer": lambda: retrieve.fused_recall(*frames, k=200),
            "decomp": lambda: fused_recall_decomp(*frames, k=200),
        }
        for name, fn in variants.items():
            spark.sparkContext.setJobDescription(f"warm:{name}:{nu}x{ni}")
            materialize(fn())
        times = {n: [] for n in variants}
        steals = {n: [] for n in variants}
        for rep in range(REPS):
            order = list(variants) if rep % 2 == 0 else list(variants)[::-1]
            for name in order:
                spark.sparkContext.setJobDescription(f"{name}:{nu}x{ni}#{rep}")
                s0, t0 = steal(), time.perf_counter()
                materialize(variants[name]())
                dt = time.perf_counter() - t0
                times[name].append(dt)
                steals[name].append(steal() - s0)
                print(f"[{nu}x{ni} rep {rep}] {name}: {dt:.3f}s "
                      f"(steal {steals[name][-1]}j)", flush=True)
        print(f"=== matrix {nu}x{ni} = {nu*ni/1e6:.1f}M pairs ===")
        for n, ts in times.items():
            print(f"  {n}: min {min(ts):.3f}s median {statistics.median(ts):.3f}s "
                  f"all={[round(t, 2) for t in ts]} steal={steals[n]}")
    spark.stop()


if __name__ == "__main__":
    main()
