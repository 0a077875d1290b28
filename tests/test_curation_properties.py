"""Property-based checks for the curation operators: on arbitrary corpora
(random groups, sizes, budgets) each operator must equal a direct sequential
simulation of its contract. Randomized generalization of the fixed-world
assertions in test_curation.py."""

from __future__ import annotations

import hashlib

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from recsys_pipeline_spark.operators import curation

doc = st.tuples(
    st.integers(min_value=0, max_value=500),  # doc_id (dupes possible pre-distinct)
    st.sampled_from(["s0", "s1", "s2"]),      # group
    st.integers(min_value=0, max_value=30),   # size (0-token docs allowed)
)
corpora = st.lists(doc, min_size=1, max_size=40)


def _h(salt: str, key) -> int:
    """Python twin of dedup.portable_hash64 over the salted key."""
    return int(hashlib.md5(f"{salt}:{key}".encode()).hexdigest()[:15], 16)


def _df(spark, data):
    uniq = {d[0]: d for d in data}.values()  # ids must be unique keys
    return spark.createDataFrame(
        [(i, g, n) for i, g, n in uniq], "doc_id long, grp string, n long"
    )


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(corpora, st.integers(min_value=0, max_value=100))
def test_hash_sample_equals_bucket_rule(spark, data, rate):
    df = _df(spark, data)
    got = {r["doc_id"] for r in curation.hash_sample(df, "doc_id", rate).collect()}
    want = {r["doc_id"] for r in df.collect() if _h("samp", r["doc_id"]) % 100 < rate}
    assert got == want


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(corpora, st.integers(min_value=1, max_value=6))
def test_cap_per_group_equals_hash_rank_simulation(spark, data, k):
    df = _df(spark, data)
    got = {r["doc_id"] for r in curation.cap_per_group(df, "grp", "doc_id", k).collect()}
    by_grp: dict[str, list] = {}
    for r in df.collect():
        by_grp.setdefault(r["grp"], []).append(r["doc_id"])
    want = set()
    for ids in by_grp.values():
        want |= set(sorted(ids, key=lambda i: (_h("cap", i), i))[:k])
    assert got == want


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(corpora, st.integers(min_value=1, max_value=50))
def test_pack_greedy_equals_running_sum_simulation(spark, data, budget):
    df = _df(spark, data)
    got = {
        r["doc_id"]: (r["bin_id"], r["bin_offset"])
        for r in curation.pack_greedy(df, "grp", "doc_id", F.col("n"), budget).collect()
    }
    by_grp: dict[str, list] = {}
    for r in df.collect():
        by_grp.setdefault(r["grp"], []).append((r["doc_id"], r["n"]))
    want = {}
    for items in by_grp.values():
        off = 0
        for i, n in sorted(items):
            want[i] = (off // budget, off)
            off += n
    assert got == want


interaction = st.tuples(
    st.integers(min_value=0, max_value=5),   # user
    st.integers(min_value=0, max_value=9),   # item
)
interaction_logs = st.lists(interaction, min_size=1, max_size=30)


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(interaction_logs)
def test_negative_sample_equals_hash_draw_simulation(spark, data):
    rows = [(eid, u, i) for eid, (u, i) in enumerate(data)]
    df = spark.createDataFrame(rows, "event_id long, userid long, itemid long")
    got = {
        (r["event_id"], r["userid"], r["itemid"])
        for r in curation.negative_sample(df, "userid", "itemid", "event_id", 10).collect()
    }
    seen = {(u, i) for _, u, i in rows}
    want = set()
    for eid, u, _ in rows:
        cand = _h("neg", eid) % 10
        if (u, cand) not in seen:
            want.add((eid, u, cand))
    assert got == want


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(corpora, st.integers(min_value=1, max_value=6), st.integers(min_value=1, max_value=7))
def test_cap_survivors_invariant_to_input_partitioning(spark, data, k, nparts):
    """The cap must pick the same survivors whatever the physical input
    split — the guarantee that makes the engine's map-side WindowGroupLimit
    Partial pre-filter (and any future repartitioning) safe."""
    df = _df(spark, data)
    base = {r["doc_id"] for r in curation.cap_per_group(df, "grp", "doc_id", k).collect()}
    got = {
        r["doc_id"]
        for r in curation.cap_per_group(
            df.repartition(nparts), "grp", "doc_id", k
        ).collect()
    }
    assert got == base


def test_cap_map_side_group_limit_is_in_the_plan(spark):
    """Giant-group scale guard: Catalyst must rewrite the row_number filter
    into a WindowGroupLimit with a PARTIAL stage below the exchange, so each
    input partition ships at most k rows per group into the shuffle. If a
    refactor breaks the rewrite (e.g. swaps the deterministic order key for
    one InferWindowGroupLimit cannot prove rankLike), a domain that is half
    the corpus would shuffle whole again — this pins the shape."""
    from recsys_pipeline_spark.io import read_table

    docs = read_table(spark, "/root/testdata/sf0.01", "documents").repartition(8)
    df = curation.cap_per_group(docs, "source", "doc_id", 15)
    plan = df._jdf.queryExecution().executedPlan().toString()
    partial = plan.find("WindowGroupLimit")
    assert partial != -1 and "Partial" in plan, plan
    # the Partial stage sits BELOW the group-key exchange (map side): in the
    # printed tree the exchange line appears above it
    exch = plan.find("Exchange hashpartitioning(source")
    part_line = plan.find(", Partial")
    assert exch != -1 and part_line > exch, plan


texted = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=300),  # doc_id
        st.sampled_from(["s0", "s1"]),            # source
        st.lists(
            st.sampled_from(["alpha", "beta", "gamma", "delta", "eps"]),
            min_size=0, max_size=12,
        ),
    ),
    min_size=1, max_size=30,
)


def _text_df(spark, data):
    uniq = {d[0]: d for d in data}.values()
    return spark.createDataFrame(
        [(i, g, " ".join(ws)) for i, g, ws in uniq],
        "doc_id long, source string, text string",
    )


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(texted, st.integers(min_value=10, max_value=90))
def test_select_token_budget_equals_prefix_simulation(spark, data, pct):
    df = _text_df(spark, data)
    got = {
        r["doc_id"]: (r["qscore"], r["n_tokens"])
        for r in curation.select_token_budget(df, "doc_id", "text", pct).collect()
    }
    corpus = []
    for r in df.collect():
        toks = [t for t in r["text"].lower().split() if t]
        if not toks:
            continue
        q = (len(set(toks)) * 1000) // len(toks)
        corpus.append((q, _h("sel", r["doc_id"]), r["doc_id"], len(toks)))
    budget = sum(t for *_, t in corpus) * pct // 100
    corpus.sort(key=lambda x: (-x[0], x[1], x[2]))
    want, run = {}, 0
    for q, _hh, i, tok in corpus:
        if run + tok > budget:
            break
        run += tok
        want[i] = (q, tok)
    assert got == want


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(texted, st.integers(min_value=10, max_value=80), st.integers(min_value=2, max_value=3))
def test_boilerplate_flags_equals_df_simulation(spark, data, share_pct, n):
    df = _text_df(spark, data)
    got = {
        r["doc_id"]: (r["n_grams"], r["n_boiler"])
        for r in curation.boilerplate_flags(
            df, "doc_id", "text", "source", n=n, share_pct=share_pct
        ).collect()
    }
    by_src: dict[str, dict[int, set]] = {}
    for r in df.collect():
        toks = [t for t in r["text"].lower().split() if t]
        grams = {
            " ".join(toks[i : i + n]) for i in range(max(len(toks) - n + 1, 0))
        }
        by_src.setdefault(r["source"], {})[r["doc_id"]] = grams
    want = {}
    for src, docs_g in by_src.items():
        n_docs = len(docs_g)
        df_counts: dict[str, int] = {}
        for grams in docs_g.values():
            for g in grams:
                df_counts[g] = df_counts.get(g, 0) + 1
        boiler = {g for g, c in df_counts.items() if c * 100 >= share_pct * n_docs}
        for i, grams in docs_g.items():
            hits = len(grams & boiler)
            if grams and hits:
                want[i] = (len(grams), hits)
    assert got == want


# --- quality_gate: arbitrary ASCII word-soup corpora vs a direct Python
# simulation of every signal and rule (ASCII only: the tokenizer contract
# under test is whitespace/lowercase/threshold logic, not unicode folding)
_word = st.text(alphabet="abcdefghij.,!", min_size=1, max_size=6)
_texts = st.lists(
    st.lists(_word, min_size=0, max_size=25).map(" ".join),
    min_size=1,
    max_size=25,
)
_STOP = {"the", "a", "of", "and", "to", "in", "is", "it", "that", "for"}


def _gate_sim(text, lo, hi, mlo, mhi, dmax):
    toks = [t for t in text.lower().split() if t]
    n = len(toks)
    mtl = sum(len(t) for t in toks) * 100 // n if n else 0
    stops = sum(1 for t in toks if t in _STOP)
    grams = [" ".join(toks[i : i + 3]) for i in range(n - 2)] if n >= 3 else []
    ppm = (len(grams) - len(set(grams))) * 1_000_000 // len(grams) if grams else 0
    reasons = [
        name
        for name, fired in [
            ("too_short", n < lo),
            ("too_long", n > hi),
            ("word_len", mtl < mlo or mtl > mhi),
            ("no_stopword", stops == 0),
            ("repetitive", ppm > dmax),
        ]
        if fired
    ]
    return (n, mtl, stops, ppm, ",".join(reasons), 0 if reasons else 1)


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    _texts,
    st.integers(min_value=0, max_value=10),
    st.integers(min_value=10, max_value=30),
    st.integers(min_value=0, max_value=300),
    st.integers(min_value=300, max_value=900),
    st.integers(min_value=0, max_value=800_000),
)
def test_quality_gate_equals_python_simulation(spark, texts, lo, hi, mlo, mhi, dmax):
    df = spark.createDataFrame(list(enumerate(texts)), "doc_id long, text string")
    got = {
        r["doc_id"]: (
            r["n_tokens"], r["mean_tok_len_x100"], r["stop_hits"],
            r["dup3_ppm"], r["drop_reasons"], r["keep"],
        )
        for r in curation.quality_gate(
            df, "doc_id", "text",
            min_tokens=lo, max_tokens=hi, min_mtl_x100=mlo, max_mtl_x100=mhi,
            dup3_ppm_max=dmax,
        ).collect()
    }
    want = {
        i: _gate_sim(t, lo, hi, mlo, mhi, dmax) for i, t in enumerate(texts)
    }
    assert got == want


# random word-soup documents over a tiny vocabulary so cross-doc duplicate
# n-grams actually occur; n=3 keeps spans plausible at these lengths
_words = st.sampled_from(["aa", "bb", "cc", "dd"])
_docs_txt = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=200),
        st.lists(_words, min_size=0, max_size=12),
    ),
    min_size=1,
    max_size=12,
)


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(_docs_txt)
def test_dup_span_coverage_equals_interval_union_simulation(spark, data):
    """dup_span_coverage must equal a direct simulation: mark every n-gram
    occurring in >= 2 docs, union the [i, i+n) intervals per doc, count."""
    from recsys_pipeline_spark.operators.dedup import dup_span_coverage

    n = 3
    uniq = {d[0]: d for d in data}.values()
    rows = [(i, " ".join(toks)) for i, toks in uniq]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["n_tokens"], r["covered_tokens"])
        for r in dup_span_coverage(df, "doc_id", "text", n=n).collect()
    }
    toks_by_id = {i: t.split() if t else [] for i, t in rows}
    grams: dict[tuple, set] = {}
    for i, toks in toks_by_id.items():
        for s in range(len(toks) - n + 1):
            grams.setdefault(tuple(toks[s : s + n]), set()).add(i)
    dup = {g for g, ids in grams.items() if len(ids) >= 2}
    want = {}
    for i, toks in toks_by_id.items():
        covered = set()
        for s in range(len(toks) - n + 1):
            if tuple(toks[s : s + n]) in dup:
                covered |= set(range(s, s + n))
        want[i] = (len(toks), len(covered))
    assert got == want


# ---------------------------------------------------------------------------
# bpe_train: on arbitrary corpora the learned merge table equals a direct
# sequential simulation of the Sennrich loop (greedy left-to-right apply)
# ---------------------------------------------------------------------------

_bpe_word = st.text(alphabet="ab", min_size=1, max_size=5)
_bpe_doc = st.lists(_bpe_word, min_size=1, max_size=8)
_bpe_corpus = st.lists(_bpe_doc, min_size=1, max_size=6)


def _bpe_sim(word_counts: dict[str, int], rounds: int):
    state = {w: list(w) for w in word_counts}
    merges = []
    for r in range(1, rounds + 1):
        counts: dict[tuple[str, str], int] = {}
        for w, c in word_counts.items():
            toks = state[w]
            for i in range(len(toks) - 1):
                counts[(toks[i], toks[i + 1])] = counts.get((toks[i], toks[i + 1]), 0) + c
        if not counts:
            continue  # no adjacent pairs left: the round learns nothing
        (l, rr), cnt = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        merges.append((r, l, rr, l + rr, cnt))
        for w in state:
            toks, new, i = state[w], [], 0
            while i < len(toks):
                if i + 1 < len(toks) and toks[i] == l and toks[i + 1] == rr:
                    new.append(l + rr)
                    i += 2
                else:
                    new.append(toks[i])
                    i += 1
            state[w] = new
    return merges


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(_bpe_corpus, st.integers(min_value=1, max_value=3))
def test_bpe_train_equals_sequential_simulation(spark, docs_words, rounds):
    from recsys_pipeline_spark.operators import curation as cur

    rows = [(i, " ".join(ws)) for i, ws in enumerate(docs_words)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    wc: dict[str, int] = {}
    for _, text in rows:
        for w in text.split():
            wc[w] = wc.get(w, 0) + 1
    want = _bpe_sim(wc, rounds)
    merges = cur.bpe_train(df, "text", rounds=rounds)
    got = [
        (int(r["merge_round"]), r["lhs"], r["rhs"], r["merged"], int(r["cnt"]))
        for r in merges.orderBy("merge_round").collect()
    ]
    assert got == want

    # encode with the learned merges == the simulation's final word state
    state = {w: list(w) for w in wc}
    for _, l, rr, _, _ in want:
        for w in state:
            toks, new, i = state[w], [], 0
            while i < len(toks):
                if i + 1 < len(toks) and toks[i] == l and toks[i + 1] == rr:
                    new.append(l + rr)
                    i += 2
                else:
                    new.append(toks[i])
                    i += 1
            state[w] = new
    want_enc = {
        i: (
            " ".join(t for w in text.split() for t in state[w]),
            sum(len(state[w]) for w in text.split()),
        )
        for i, text in rows
        if text.split()
    }
    got_enc = {
        int(r["doc_id"]): (r["bpe_text"], int(r["n_bpe_tokens"]))
        for r in cur.bpe_encode(df, merges, "doc_id", "text", rounds=rounds).collect()
    }
    assert got_enc == want_enc
