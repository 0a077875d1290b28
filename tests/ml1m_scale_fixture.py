"""ml-1m-MAGNITUDE planted fixture (VERDICT r6 item 4).

Same planted structure as tests/planted_fixture.py — low-rank user x item
affinity + genre preference + a nonlinear band on the recent genre-history
count — but at the reference dataset's cardinalities (readme.md:53,64 trains
on real ml-1m: 6,040 users x 3,952 movies, ~1M ratings, published AUC
0.8081 recall / 0.8206 rank). Real ml-1m isn't shipped in this container, so
this world plants the SAME learnable components at the SAME id cardinality:
the models must now recover one embedding row per 6k/4k ids from ~100
interactions each, not per 150/80 ids — the regime the published bar was
measured in.

Generation is numpy-vectorized (the per-row Python loop of the small fixture
would take minutes at 10^6 rows): items are drawn i.i.d. uniform per user
step, so the rolling genre-history band reduces to a windowed cumsum over a
(users x steps) indicator tensor — no sequential dependence to unroll.
Deterministic via a single seeded Generator; every draw order is fixed.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from recsys_pipeline_spark.schemas import GENRES

N_USERS = 6040
N_ITEMS = 3952
N_PER_USER = 100  # ~604k ratings: ml-1m's per-user magnitude (1M/6040 ~ 165)
DIM = 6
SEED = 1001

# identical affinity mix to the small planted fixture (tests/planted_fixture.py
# — see its comment block for how the coefficients were sized against the
# Bernoulli-label noise floor)
A_DOT = 3.5
B_GENRE = 1.2
C_BAND = 1.6
NOISE = 0.25
WINDOW = 10
BAND_GENRES = [GENRES[4], GENRES[7], GENRES[11]]
BAND_IDX = [4, 7, 11]
BAND_ITEM_P = 0.45
BAND_LO, BAND_HI = 3, 6


def gen_world(seed: int = SEED):
    """-> (ratings_pdf, movies_pdf, users_pdf), all deterministic."""
    rng = np.random.default_rng(seed)
    G = len(GENRES)

    # --- latent structure -------------------------------------------------
    user_vec = rng.normal(0.0, 1.0, (N_USERS, DIM)) / np.sqrt(DIM)
    item_vec = rng.normal(0.0, 1.0, (N_ITEMS, DIM)) / np.sqrt(DIM)

    # item genres: each band genre independently w.p. BAND_ITEM_P, plus 1-2
    # uniformly-drawn non-band genres (mirrors the small fixture's sampler)
    item_genre = np.zeros((N_ITEMS, G), dtype=bool)
    item_genre[:, BAND_IDX] = rng.random((N_ITEMS, len(BAND_IDX))) < BAND_ITEM_P
    non_band = np.array([g for g in range(G) if g not in BAND_IDX])
    for k in range(2):  # first extra genre always, second w.p. 1/2
        pick = non_band[rng.integers(0, len(non_band), N_ITEMS)]
        take = np.ones(N_ITEMS, dtype=bool) if k == 0 else rng.random(N_ITEMS) < 0.5
        item_genre[np.arange(N_ITEMS)[take], pick[take]] = True

    # user preference: 3 distinct genres each
    user_pref = np.zeros((N_USERS, G), dtype=bool)
    prefs = np.argsort(rng.random((N_USERS, G)), axis=1)[:, :3]
    np.put_along_axis(user_pref, prefs, True, axis=1)

    # --- interactions -----------------------------------------------------
    items = rng.integers(0, N_ITEMS, (N_USERS, N_PER_USER))  # i.i.d. uniform

    # affinity terms, all (U, T)
    dot = np.einsum("ud,utd->ut", user_vec, item_vec[items]) * DIM
    genre_hit = np.einsum("ug,utg->ut", user_pref, item_genre[items])

    # band: count of each band genre in the user's previous <=WINDOW items
    band = np.zeros((N_USERS, N_PER_USER))
    for g in BAND_IDX:
        ind = item_genre[items, g].astype(np.int32)  # (U, T)
        csum = np.concatenate(
            [np.zeros((N_USERS, 1), dtype=np.int64), np.cumsum(ind, axis=1)], axis=1
        )
        t = np.arange(N_PER_USER)
        lo = np.maximum(t - WINDOW, 0)
        cnt = csum[:, t] - csum[:, lo]  # history BEFORE step t, last WINDOW
        band += np.where((cnt >= BAND_LO) & (cnt <= BAND_HI), 1.0, -1.0)

    aff = (
        A_DOT * dot
        + B_GENRE * genre_hit
        - B_GENRE * 1.0
        + C_BAND * band
        + NOISE * rng.normal(0.0, 1.0, (N_USERS, N_PER_USER))
    )
    label = rng.random((N_USERS, N_PER_USER)) < 1.0 / (1.0 + np.exp(-aff))

    uids = np.repeat(np.arange(1, N_USERS + 1), N_PER_USER)
    ts = (
        1_000_000_000
        + np.repeat(np.arange(1, N_USERS + 1), N_PER_USER) * 100_000
        + np.tile(np.arange(N_PER_USER) * 60, N_USERS)
    )
    ratings = pd.DataFrame(
        {
            "userid": uids.astype(np.int64),
            "itemid": (items.ravel() + 1).astype(np.int64),
            "rating": np.where(label.ravel(), 5, 2).astype(np.int64),
            "ts": ts.astype(np.int64),
        }
    )
    ratings["_line_id"] = np.arange(len(ratings), dtype=np.int64)

    movies = pd.DataFrame(
        {
            "itemid": np.arange(1, N_ITEMS + 1, dtype=np.int64),
            "title": [f"Movie {i}" for i in range(1, N_ITEMS + 1)],
            "genres": [
                "|".join(GENRES[g] for g in np.flatnonzero(item_genre[i]))
                for i in range(N_ITEMS)
            ],
        }
    )
    ages = np.array([1, 18, 25, 35, 45, 50, 56])
    users = pd.DataFrame(
        {
            "userid": np.arange(1, N_USERS + 1, dtype=np.int64),
            "gender": np.where(rng.random(N_USERS) < 0.5, "M", "F"),
            "age": ages[rng.integers(0, len(ages), N_USERS)].astype(np.int64),
            "occupation": rng.integers(0, 21, N_USERS).astype(np.int64),
            "zipcode": [f"{z}" for z in rng.integers(10000, 100000, N_USERS)],
        }
    )
    return ratings, movies, users
