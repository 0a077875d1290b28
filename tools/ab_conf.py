"""A/B a runtime SQL conf across the whole bench surface.

Alternates conf settings pass-by-pass in ONE session (A,B,A,B,...) so both
variants sample the same host-noise windows; per-query and total deltas
come from pass medians.

Usage: python tools/ab_conf.py [passes_per_variant] [sf_dir]
Edit CONFS below for the experiment.
"""
from __future__ import annotations

import gc
import statistics
import sys
import time

sys.path.insert(0, "/root/repo")

import __spark_entry__ as entrymod  # noqa: E402
from bench import SKIP_TRAINING  # noqa: E402
from recsys_pipeline_spark.session import get_spark  # noqa: E402

# r16 experiment (kept for the record): parallelismFirst=false measured
# 1.055x SLOWER on pass mins — post-shuffle compute stages must not be
# coalesced to byte-sized partition counts. Stock kept.
#
# r17 experiment (guide §6 / VERDICT #5): scan split sizing. At sf0.1 every
# table is a single file; defaultMaxSplitBytes = min(maxPartitionBytes,
# max(openCostInBytes, bytes/parallelism)) = 4m, so lineitem scans as 3
# tasks and everything else as 1 — raising openCost collapses multi-split
# scans to one task (less scheduling, less parallelism; compute-dense text
# pipelines re-fan via io.spread regardless).
# r17 experiment 2: coalescePartitions.minPartitionSize 1m -> 64k measured
# TOTAL(min) 0.993x / TOTAL(median) 1.011x — a wash with real losers
# (boilerplate_ngrams 1.36x, doc_repetition 1.31x): byte-proportional small
# stages pay task overhead for the parallelism only compute-dense stages
# want. Stock kept; the compute-dense exchanges get explicit widths instead
# (fuzzy_decontaminate verify, rolling_anomaly window).
CONFS = {
    "scan_stock": {
        "spark.sql.files.maxPartitionBytes": "134217728",
        "spark.sql.files.openCostInBytes": "4194304",
    },
    "scan_big": {
        "spark.sql.files.maxPartitionBytes": "536870912",
        "spark.sql.files.openCostInBytes": "16777216",
    },
}


def materialize(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    passes = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    spark = get_spark("ab-conf")
    spark.sparkContext.setLogLevel("ERROR")
    qs = {n: f for n, f in entrymod.queries().items() if n not in SKIP_TRAINING}

    warm = "/root/testdata/sf0.001"
    for name, fn in qs.items():
        try:
            materialize(fn(spark, warm))
        except Exception:
            pass

    results: dict[str, dict[str, list[float]]] = {
        c: {n: [] for n in qs} for c in CONFS
    }
    for p in range(passes):
        for cname, confs in CONFS.items():
            for k, v in confs.items():
                spark.conf.set(k, v)
            t_pass = 0.0
            for name, fn in qs.items():
                spark.sparkContext.setJobDescription(f"{cname}#{p}:{name}")
                t0 = time.perf_counter()
                df = fn(spark, sf_dir)
                materialize(df)
                dt = time.perf_counter() - t0
                del df
                gc.collect()
                results[cname][name].append(dt)
                t_pass += dt
            print(f"[pass {p}] {cname}: total {t_pass:.1f}s", flush=True)
            # restore defaults so the next variant starts clean
            for k in confs:
                spark.conf.unset(k)

    names = list(CONFS)
    base, other = names[0], names[1]
    print(f"\n=== per-query min ({base} -> {other}) ===")
    tot_a = tot_b = 0.0
    rows = []
    for n in qs:
        a = min(results[base][n])
        b = min(results[other][n])
        tot_a += a
        tot_b += b
        rows.append((b - a, n, a, b))
    rows.sort()
    for d, n, a, b in rows:
        if abs(d) > 0.08:
            print(f"  {n}: {a:.3f} -> {b:.3f} ({b/a:.2f}x)")
    print(f"TOTAL(min): {tot_a:.1f} -> {tot_b:.1f} ({tot_b/tot_a:.3f}x)")
    med_a = {n: statistics.median(results[base][n]) for n in qs}
    med_b = {n: statistics.median(results[other][n]) for n in qs}
    print(
        f"TOTAL(median): {sum(med_a.values()):.1f} -> {sum(med_b.values()):.1f}"
        f" ({sum(med_b.values())/sum(med_a.values()):.3f}x)"
    )


if __name__ == "__main__":
    main()
