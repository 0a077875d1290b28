"""Product-quantization ANN (operators/pq.py): independent NumPy replication
of the whole pipeline (codebook designation -> encode -> ADC ranking), the
zero-distance pivot invariant, and the physical-plan properties that make the
codes-only ADC scan the 100 TB shape (the DuckDB value parity of all three
registered queries runs in test_oracle_parity.py like every registry entry).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pytest
from pyspark.sql import functions as F

from recsys_pipeline_spark.io import read_table
from recsys_pipeline_spark.operators import pq

SF = "/root/testdata/sf0.001"
M, K, SUB, DIM = pq.PQ_M, pq.PQ_K, 64 // pq.PQ_M, 64


def _h(vid: int) -> int:
    return int(hashlib.md5(f"pqc:{vid}".encode()).hexdigest()[:15], 16)


def _left_fold_d2(a: np.ndarray, b: np.ndarray) -> float:
    # left-associated accumulation — np.sum's pairwise order could differ
    # in the last ulp and flip a fixed-point boundary
    acc = 0.0
    for x, y in zip(a, b):
        d = float(x) - float(y)
        acc += d * d
    return acc


def _d2i(a: np.ndarray, b: np.ndarray) -> int:
    import math

    return int(math.floor(_left_fold_d2(a, b) * pq.MICRO + 0.5))


def _numpy_pq(emb: dict[int, np.ndarray]):
    """Reference PQ: returns (pivot ids in rank order, codes dict)."""
    pivots = sorted(emb, key=lambda v: (_h(v), v))[:K]
    cents = {
        (m, k): emb[pid][m * SUB : (m + 1) * SUB].astype("float64")
        for k, pid in enumerate(pivots)
        for m in range(M)
    }
    codes = {}
    for vid, v in emb.items():
        v64 = v.astype("float64")
        codes[vid] = [
            min(range(K), key=lambda k: (_d2i(v64[m * SUB : (m + 1) * SUB], cents[(m, k)]), k))
            for m in range(M)
        ]
    return pivots, cents, codes


@pytest.fixture(scope="module")
def emb_local(spark):
    rows = read_table(spark, SF, "embeddings").select("vec_id", "embedding").collect()
    return {int(r["vec_id"]): np.array(r["embedding"], dtype="float32") for r in rows}


@pytest.fixture(scope="module")
def spark_frames(spark):
    e = read_table(spark, SF, "embeddings")
    cents = pq.pq_centroids(e)
    codes = pq.pq_encode(e, cents)
    return e, cents, codes


def test_codes_match_numpy_replication(spark, emb_local, spark_frames):
    _, _, want = _numpy_pq(emb_local)
    got = {
        int(r["vec_id"]): list(r["codes"])
        for r in spark_frames[2].collect()
    }
    assert got == want


def test_pivots_encode_to_their_own_rank(spark, emb_local, spark_frames):
    """A pivot's m-th subvector IS centroid k=rank of subspace m: distance 0,
    ties impossible below it, so its code vector is [rank] * M."""
    pivots, _, _ = _numpy_pq(emb_local)
    got = {
        int(r["vec_id"]): list(r["codes"])
        for r in spark_frames[2].filter(F.col("vec_id").isin([int(p) for p in pivots])).collect()
    }
    for rank, pid in enumerate(pivots):
        assert got[pid] == [rank] * M


def test_adc_topk_matches_numpy(spark, emb_local, spark_frames):
    _, cents_np, codes_np = _numpy_pq(emb_local)
    qids = [0, 7]
    queries = (
        read_table(spark, SF, "embeddings")
        .filter(F.col("vec_id").isin(qids))
        .select(
            F.col("vec_id").alias("qid"),
            F.col("embedding").cast("array<double>").alias("qvec"),
        )
    )
    lut = pq.adc_lut(queries, spark_frames[1])
    got = {
        (int(r["qid"]), int(r["rk"])): (int(r["vec_id"]), int(r["adc_d2_micro"]))
        for r in pq.adc_topk(spark_frames[2], lut, k=5).collect()
    }
    for qid in qids:
        q64 = emb_local[qid].astype("float64")
        lut_np = {
            (m, k): _d2i(q64[m * SUB : (m + 1) * SUB], cents_np[(m, k)])
            for m in range(M)
            for k in range(K)
        }
        scored = sorted(
            (sum(lut_np[(m, codes_np[vid][m])] for m in range(M)), vid)
            for vid in emb_local
        )
        for rk, (d, vid) in enumerate(scored[:5], start=1):
            assert got[(qid, rk)] == (vid, d)


def test_adc_beats_random_ranking(spark):
    """Quality floor: with 16 deterministic centroids the ADC top-10 must
    overlap the exact L2 top-10 far above chance (10 * 10/500 = 0.2/query).
    Measured at sf0.001: 3-5 of 10 per query."""
    from recsys_pipeline_spark.queries_ext import q_pq_ann_overlap

    rows = q_pq_ann_overlap(spark, SF).collect()
    overlaps = [int(r["overlap10"]) for r in rows]
    assert len(overlaps) == 4
    assert sum(overlaps) / len(overlaps) >= 2.0
    assert all(o >= 1 for o in overlaps)


def _final_plan(df) -> str:
    df.count()
    return df._jdf.queryExecution().executedPlan().toString()


def test_adc_scan_plan_shape(spark, spark_frames):
    """The flat ADC scan must stay codes-only and shuffle-free: the single
    shuffle Exchange is the final per-query top-k window; the LUT arrives by
    broadcast; no sort-merge join or cartesian on the corpus side."""
    e, cents, codes = spark_frames
    queries = (
        e.filter(F.col("vec_id") < 2)
        .select(F.col("vec_id").alias("qid"), F.col("embedding").cast("array<double>").alias("qvec"))
    )
    # checkpoint both stored-index frames (codes table + Q-row LUT) so the
    # plan under test is the scan itself, not the index build
    lut = pq.adc_lut(queries, cents).localCheckpoint(eager=False)
    plan = _final_plan(
        pq.adc_topk(codes.localCheckpoint(eager=False), lut, k=10)
    )
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastExchange" in plan  # the Q-row LUT frame
    # codes scan -> broadcast join -> ONE shuffle for the window top-k
    assert plan.count("Exchange hashpartitioning") == 1


def test_encode_plan_never_shuffles_vectors(spark):
    """Both encode exchanges ship (id, m, 8-int struct/code) rows — the
    64-double vector column must be projected away before any exchange."""
    e = read_table(spark, SF, "embeddings")
    cents = pq.pq_centroids(e)
    plan = _final_plan(pq.pq_encode(e, cents))
    import re

    for m in re.finditer(r"Exchange hashpartitioning[^\n]*", plan):
        assert "svec" not in m.group(0)
        assert "embedding" not in m.group(0)


# ---------------------------------------------------------------------------
# Property: on arbitrary (double) corpora and a smaller PQ geometry, codes
# and ADC rankings equal a sequential NumPy/Python simulation of the contract
# ---------------------------------------------------------------------------

from hypothesis import HealthCheck, given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402

_PDIM, _PM, _PK = 16, 4, 4
_PSUB = _PDIM // _PM

_vec = st.lists(
    st.floats(min_value=-4, max_value=4, allow_nan=False, allow_infinity=False),
    min_size=_PDIM,
    max_size=_PDIM,
)
_corpus = st.lists(
    st.tuples(st.integers(min_value=0, max_value=200), _vec),
    min_size=2,
    max_size=24,
)


def _sim_pq(emb: dict[int, list[float]]):
    pivots = sorted(emb, key=lambda v: (_h(v), v))[:_PK]
    cents = {
        (m, k): emb[pid][m * _PSUB : (m + 1) * _PSUB]
        for k, pid in enumerate(pivots)
        for m in range(_PM)
    }

    def d2i(a, b):
        import math

        acc = 0.0
        for x, y in zip(a, b):
            d = x - y
            acc += d * d
        return int(math.floor(acc * pq.MICRO + 0.5))

    codes = {
        vid: [
            min(
                range(len(pivots)),
                key=lambda k: (d2i(v[m * _PSUB : (m + 1) * _PSUB], cents[(m, k)]), k),
            )
            for m in range(_PM)
        ]
        for vid, v in emb.items()
    }
    return pivots, cents, codes, d2i


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(_corpus)
def test_pq_codes_and_adc_equal_simulation_on_random_corpora(spark, data):
    emb = {i: v for i, v in data}  # last write wins on duplicate ids
    df = spark.createDataFrame(
        [(i, v) for i, v in emb.items()], "vec_id long, embedding array<double>"
    )
    cents = pq.pq_centroids(df, m_sub=_PM, k_cent=_PK, dim=_PDIM)
    codes = pq.pq_encode(df, cents, m_sub=_PM, k_cent=_PK, dim=_PDIM)
    pivots, cents_sim, codes_sim, d2i = _sim_pq(emb)
    got = {int(r["vec_id"]): list(r["codes"]) for r in codes.collect()}
    assert got == codes_sim

    qids = sorted(emb)[:2]
    queries = df.filter(F.col("vec_id").isin(qids)).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec")
    )
    lut = pq.adc_lut(queries, cents, m_sub=_PM, k_cent=_PK, dim=_PDIM)
    top = pq.adc_topk(codes, lut, k=3, m_sub=_PM, k_cent=_PK)
    got_top = {
        (int(r["qid"]), int(r["rk"])): (int(r["vec_id"]), int(r["adc_d2_micro"]))
        for r in top.collect()
    }
    for qid in qids:
        q = emb[qid]
        lut_sim = {
            (m, k): d2i(q[m * _PSUB : (m + 1) * _PSUB], cents_sim[(m, k)])
            for m in range(_PM)
            for k in range(len(pivots))
        }
        scored = sorted(
            (sum(lut_sim[(m, codes_sim[vid][m])] for m in range(_PM)), vid)
            for vid in emb
        )
        for rk, (d, vid) in enumerate(scored[:3], start=1):
            assert got_top[(qid, rk)] == (vid, d)


# ---------------------------------------------------------------------------
# Lloyd-trained codebooks (pq_centroids_kmeans): contract + recall dominance
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def kmeans_cents(spark):
    e = read_table(spark, SF, "embeddings")
    return pq.pq_centroids_kmeans(e)


def test_kmeans_codebook_contract(spark, kmeans_cents):
    """Same (m, k, cvec) frame as pq_centroids: dense k per subspace,
    sub-dim centroids — so encode/LUT/ADC compose unchanged."""
    rows = kmeans_cents.collect()
    assert len(rows) == M * K
    by_m = {}
    for r in rows:
        assert len(r["cvec"]) == SUB
        by_m.setdefault(int(r["m"]), []).append(int(r["k"]))
    assert set(by_m) == set(range(M))
    for ks in by_m.values():
        assert sorted(ks) == list(range(K))


def test_kmeans_codebook_train_limit_contract(spark):
    """The bounded-training scale path (hash-designated sample) keeps the
    full contract shape; the whole corpus still encodes against it."""
    e = read_table(spark, SF, "embeddings")
    cents = pq.pq_centroids_kmeans(e, train_limit=64)
    assert cents.count() == M * K
    codes = pq.pq_encode(e, cents)
    assert codes.count() == 500
    assert all(
        0 <= c < K for r in codes.limit(20).collect() for c in r["codes"]
    )


def _mean_overlap10(spark, cents) -> float:
    """Mean |flat-ADC top-10 ∩ exact-L2 top-10| over the 4 frontier query
    ids, for a given codebook — full-corpus candidates so the comparison
    isolates CODEBOOK quality (no coarse-probe confound)."""
    e = read_table(spark, SF, "embeddings")
    codes = pq.pq_encode(e, cents)
    queries = (
        e.filter(F.col("vec_id").isin([0, 7, 21, 42]))
        .select(
            F.col("vec_id").alias("qid"),
            F.col("embedding").cast("array<double>").alias("qvec"),
        )
    )
    lut = pq.adc_lut(queries, cents)
    top = pq.adc_topk(codes, lut, k=10).select("qid", "vec_id")
    exact = pq.l2_topk_for_queries(queries, e, k=10).select("qid", "vec_id")
    hits = top.join(exact, ["qid", "vec_id"]).count()
    return hits / 4.0


def test_kmeans_recall_dominates_pivot_codebooks(spark, spark_frames, kmeans_cents):
    """The reason to train at all: Lloyd codebooks minimize in-subspace
    quantization error, so ADC recall@10 must be at least the
    hash-designated pivots' on the same embeddings/queries/ground truth.
    Measured at sf0.001: pivots 3.5/10, k-means 4.0/10 (the synthetic
    embeddings are near-uniform, so the Lloyd gain is real but modest)."""
    pivot_recall = _mean_overlap10(spark, spark_frames[1])
    kmeans_recall = _mean_overlap10(spark, kmeans_cents)
    assert kmeans_recall >= pivot_recall, (
        f"k-means codebooks ({kmeans_recall}) must not lose to "
        f"hash-pivot codebooks ({pivot_recall})"
    )


def test_ivfpq_kmeans_recall_query_shape(spark):
    """The rows-only registry entry: one row per frontier query id with
    the (n_cand, recall_ppm) frontier columns."""
    from recsys_pipeline_spark.queries_ext import q_ivfpq_kmeans_recall

    rows = q_ivfpq_kmeans_recall(spark, SF).collect()
    assert sorted(int(r["qid"]) for r in rows) == [0, 7, 21, 42]
    for r in rows:
        assert 0 < int(r["n_cand"]) <= 500
        assert 0 <= int(r["recall_ppm"]) <= 1_000_000


def test_pq_encode_invariant_to_input_partitioning(spark, spark_frames):
    """Rerun-stability contract: codes are a pure function of row content —
    identical under any input partitioning (AQE/speculation-proof)."""
    e, cents, _ = spark_frames
    a = {
        int(r["vec_id"]): list(r["codes"])
        for r in pq.pq_encode(e.repartition(1), cents).collect()
    }
    b = {
        int(r["vec_id"]): list(r["codes"])
        for r in pq.pq_encode(e.repartition(7), cents).collect()
    }
    assert a == b


def test_production_ann_operating_point_recall_gate(spark):
    """The frontier must include a production-grade operating point, not
    only the cheap ends (r13 verdict item 2): lsh_hi (4 bits x 16 tables)
    must hold mean recall@10 >= 0.8 on the shipped corpus — the regime the
    reference's effectively-exact ANN (num_candidates=3952,
    online/readers/es_caller.py:43) serves from. ivf_hi (probe 6 of 8)
    is gated at its measured floor as the multi-probe analog. Both knobs
    are deterministic (seeded hyperplanes), so these gates are exact
    reruns, not statistical tests."""
    from recsys_pipeline_spark.queries_ext import q_ann_recall_report

    rows = q_ann_recall_report(spark, SF).collect()
    by_method: dict[str, list[int]] = {}
    for r in rows:
        by_method.setdefault(r["method"], []).append(int(r["recall_ppm"]))
    assert sorted(by_method) == ["ivf", "ivf_hi", "lsh", "lsh_hi"]
    mean_ppm = {m: sum(v) / len(v) for m, v in by_method.items()}
    assert mean_ppm["lsh_hi"] >= 800_000, mean_ppm
    assert mean_ppm["ivf_hi"] >= 750_000, mean_ppm
    # the hi points must dominate their cheap siblings (more candidates
    # can only add recall under exact rerank — a union-monotonicity check)
    assert mean_ppm["lsh_hi"] >= mean_ppm["lsh"], mean_ppm
    assert mean_ppm["ivf_hi"] >= mean_ppm["ivf"], mean_ppm


def test_d2_micro_expr_bit_identical_to_column_form(spark):
    """The one-F.expr unrolled distance (r17 — built in 1 py4j call instead
    of ~5*dim) must parse to the same left-associated tree as the Column
    fold: bit-identical BIGINT micro-distances on real vectors, including
    the operand-cast form l2_topk_for_queries uses."""
    from pyspark.sql import functions as F

    from recsys_pipeline_spark.io import read_table

    e = read_table(spark, "/root/testdata/sf0.001", "embeddings")
    q = e.limit(5).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec")
    )
    pairs = e.crossJoin(F.broadcast(q))
    old = pairs.select(
        "qid", "vec_id",
        pq.d2_micro(F.col("embedding").cast("array<double>"),
                    F.col("qvec").cast("array<double>"), 64).alias("d"),
    )
    new = pairs.select(
        "qid", "vec_id",
        pq.d2_micro_expr("CAST(`embedding` AS ARRAY<DOUBLE>)",
                         "CAST(`qvec` AS ARRAY<DOUBLE>)", 64).alias("d"),
    )
    assert sorted(map(tuple, old.collect())) == sorted(map(tuple, new.collect()))
