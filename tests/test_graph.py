"""connected_components: hand-graph semantics + convergence guard
(the oracle-checked dup_clusters query covers it end-to-end)."""

from __future__ import annotations

import pytest

from recsys_pipeline_spark.operators.graph import connected_components


def _cc(spark, pairs, **kw):
    edges = spark.createDataFrame(pairs, "id_a long, id_b long")
    return {
        r["id"]: r["component"] for r in connected_components(edges, **kw).collect()
    }


def test_chain_and_clique_and_disjoint(spark):
    # chain 1-2-3-4, clique {10,11,12}, pair {20,21}
    got = _cc(
        spark,
        [(1, 2), (2, 3), (3, 4), (10, 11), (11, 12), (10, 12), (20, 21)],
    )
    assert got == {
        1: 1, 2: 1, 3: 1, 4: 1,
        10: 10, 11: 10, 12: 10,
        20: 20, 21: 20,
    }


def test_min_label_crosses_bridges(spark):
    # two cliques bridged by one edge -> one component labeled by global min
    got = _cc(spark, [(5, 6), (6, 7), (100, 101), (7, 100)])
    assert set(got.values()) == {5}


def test_nonconvergence_raises(spark):
    with pytest.raises(RuntimeError, match="did not converge"):
        _cc(spark, [(i, i + 1) for i in range(1, 12)], max_iter=2)


def test_star_contraction_matches_hashmin(spark):
    """large-star/small-star must produce exactly the hash-min labeling —
    on the high-diameter chain it converges in O(log n) rounds where
    hash-min needs n (the reason it exists)."""
    import random

    from recsys_pipeline_spark.operators.graph import connected_components_star

    chain = [(i, i + 1) for i in range(1, 30)]
    rng = random.Random(11)
    rand = list(
        {
            (a, b)
            for a, b in (
                (rng.randrange(1, 200), rng.randrange(1, 200)) for _ in range(220)
            )
            if a != b
        }
    )
    for pairs in (chain, rand):
        edges = spark.createDataFrame(pairs, "id_a long, id_b long")
        star = {
            r["id"]: r["component"]
            for r in connected_components_star(edges).collect()
        }
        want = _cc(spark, pairs, max_iter=200)
        assert star == want


def test_nonconverge_star_fallback(spark):
    from recsys_pipeline_spark.operators.graph import connected_components

    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(1, 12)], "id_a long, id_b long"
    )
    got = {
        r["id"]: r["component"]
        for r in connected_components(edges, max_iter=2, on_nonconverge="star").collect()
    }
    assert set(got) == set(range(1, 13)) and set(got.values()) == {1}


def test_triangle_counts_planted(spark):
    """K4 minus one edge = 2 triangles; the two degree-2 apexes sit in one
    triangle each, the shared edge's endpoints in two each."""
    from recsys_pipeline_spark.operators import graph as G

    edges = spark.createDataFrame(
        [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4)],  # K4 minus (3,4)
        "src long, dst long",
    )
    got = {int(r["host"]): int(r["n_triangles"]) for r in G.triangle_counts(edges).collect()}
    assert got == {1: 2, 2: 2, 3: 1, 4: 1}


def test_triangle_counts_matches_bruteforce_random(spark):
    """Property: on random multigraphs (parallel + reversed + self edges)
    the oriented count equals the brute-force enumeration of the simple
    undirected graph."""
    import itertools
    import random

    from recsys_pipeline_spark.operators import graph as G

    rng = random.Random(7)
    edges = [(rng.randrange(12), rng.randrange(12)) for _ in range(70)]
    und = {(min(a, b), max(a, b)) for a, b in edges if a != b}
    adj = {v: set() for v in range(12)}
    for a, b in und:
        adj[a].add(b)
        adj[b].add(a)
    want = {}
    for x, y, z in itertools.combinations(range(12), 3):
        if y in adj[x] and z in adj[x] and z in adj[y]:
            for v in (x, y, z):
                want[v] = want.get(v, 0) + 1
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {int(r["host"]): int(r["n_triangles"]) for r in G.triangle_counts(df).collect()}
    assert got == want


def test_label_init_fuses_first_round(spark):
    """Closed-neighborhood label init (min(id, min(neighbor))) fuses the
    first hash-min round into the init shuffle: a clique is fully labeled
    at init, so the first probe (round 2 at the default check_every=2)
    certifies the fixpoint — 2 rounds, where identity init needed 4. A
    diameter-3 chain converges in 4 (was 6). Regressing the init to
    identity breaks these caps (r13 verdict item 3)."""
    stats: dict = {}
    got = _cc(spark, [(10, 11), (11, 12), (10, 12)], stats=stats)
    assert got == {10: 10, 11: 10, 12: 10}
    assert stats["rounds"] <= 2
    stats = {}
    got = _cc(spark, [(1, 2), (2, 3), (3, 4)], stats=stats)
    assert got == {1: 1, 2: 1, 3: 1, 4: 1}
    assert stats["rounds"] <= 4
