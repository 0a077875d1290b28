"""Full-surface alternating A/B for the session table registry (r17,
VERDICT #5): SPARK_GRAFT_TABLE_REGISTRY=1 (memoized scan frames) vs =0
(fresh spark.read.parquet per call, the r16 behaviour). Passes alternate
in ONE session so both variants sample the same noise windows.

Usage: python tools/ab_registry.py [passes_per_variant] [sf_dir]
"""
from __future__ import annotations

import gc
import os
import statistics
import sys
import time

sys.path.insert(0, "/root/repo")

import __spark_entry__ as entrymod  # noqa: E402
from bench import SKIP_TRAINING  # noqa: E402
from recsys_pipeline_spark.session import get_spark  # noqa: E402

VARIANTS = {"reg_on": "1", "reg_off": "0"}


def materialize(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    passes = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    spark = get_spark("ab-registry")
    spark.sparkContext.setLogLevel("ERROR")
    qs = {n: f for n, f in entrymod.queries().items() if n not in SKIP_TRAINING}

    warm = "/root/testdata/sf0.001"
    for name, fn in qs.items():
        try:
            materialize(fn(spark, warm))
        except Exception:
            pass

    results: dict[str, dict[str, list[float]]] = {
        v: {n: [] for n in qs} for v in VARIANTS
    }
    for p in range(passes):
        order = list(VARIANTS) if p % 2 == 0 else list(VARIANTS)[::-1]
        for vname in order:
            os.environ["SPARK_GRAFT_TABLE_REGISTRY"] = VARIANTS[vname]
            t_pass = 0.0
            for name, fn in qs.items():
                spark.sparkContext.setJobDescription(f"{vname}#{p}:{name}")
                t0 = time.perf_counter()
                df = fn(spark, sf_dir)
                materialize(df)
                dt = time.perf_counter() - t0
                del df
                gc.collect()
                results[vname][name].append(dt)
                t_pass += dt
            print(f"[pass {p}] {vname}: total {t_pass:.1f}s", flush=True)
    os.environ.pop("SPARK_GRAFT_TABLE_REGISTRY", None)

    base, other = "reg_off", "reg_on"
    print(f"\n=== per-query min ({base} -> {other}) ===")
    tot_a = tot_b = 0.0
    rows = []
    for n in qs:
        a, b = min(results[base][n]), min(results[other][n])
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
    print(f"TOTAL(median): {sum(med_a.values()):.1f} -> "
          f"{sum(med_b.values()):.1f} "
          f"({sum(med_b.values())/sum(med_a.values()):.3f}x)")
    spark.stop()


if __name__ == "__main__":
    main()
