"""Deterministic ml-1m-shaped synthetic fixture (FIXTURES.md §A) + an
independent plain-Python simulator of the reference semantics, written from
the SURVEY spec (NOT from the reference code) — the golden oracle for the
pipeline tests.
"""

from __future__ import annotations

import random
from collections import deque

import pandas as pd

from recsys_pipeline_spark.schemas import GENRES, GENRE_TO_ID

N_USERS = 25
N_ITEMS = 40
SEED = 42


def gen_ratings() -> pd.DataFrame:
    rng = random.Random(SEED)
    rows = []
    for u in range(1, N_USERS + 1):
        n = rng.randint(25, 60) if u != N_USERS else 8  # one short-history edge user
        ts_base = 1_000_000_000 + u * 10_000
        for i in range(n):
            rows.append(
                {
                    "userid": u,
                    "itemid": rng.randint(1, N_ITEMS),
                    "rating": rng.randint(1, 5),
                    # duplicate timestamps on purpose: stability must come from line order
                    "ts": ts_base + (i // 2) * 60,
                }
            )
    df = pd.DataFrame(rows)
    df["_line_id"] = range(len(df))
    return df


def gen_movies() -> pd.DataFrame:
    rng = random.Random(SEED + 1)
    rows = []
    for it in range(1, N_ITEMS + 1):
        k = rng.randint(1, 3)
        gs = rng.sample(GENRES, k)
        rows.append({"itemid": it, "title": f"Movie {it}", "genres": "|".join(gs)})
    return pd.DataFrame(rows)


def gen_users() -> pd.DataFrame:
    rng = random.Random(SEED + 2)
    ages = [1, 18, 25, 35, 45, 50, 56]
    rows = []
    for u in range(1, N_USERS + 1):
        rows.append(
            {
                "userid": u,
                "gender": rng.choice(["M", "F"]),
                "age": rng.choice(ages),
                "occupation": rng.randint(0, 20),
                "zipcode": f"{rng.randint(10000, 99999)}",
            }
        )
    return pd.DataFrame(rows)


# ---------------------------------------------------------------------------
# Independent simulation of the reference semantics (from SURVEY §2 spec)
# ---------------------------------------------------------------------------

def simulate_split(ratings: pd.DataFrame, n_online: int = 10, train_frac: float = 0.8) -> pd.DataFrame:
    """Per user ordered by (ts, line): rn, u_cnt, label, istest."""
    df = ratings.sort_values(["userid", "ts", "_line_id"]).copy()
    df["label"] = (df["rating"] > 3).astype(int)
    df["rn"] = df.groupby("userid").cumcount()
    df["u_cnt"] = df.groupby("userid")["userid"].transform("size")
    def flag(r):
        if r.rn >= r.u_cnt - n_online:
            return 2
        if r.rn < (r.u_cnt - n_online) * train_frac:
            return 0
        return 1
    df["istest"] = df.apply(flag, axis=1)
    return df


def item_genre_ids(movies: pd.DataFrame) -> dict[int, list[int]]:
    return {
        int(r.itemid): [GENRE_TO_ID[g] for g in r.genres.split("|")]
        for r in movies.itertuples()
    }


def simulate_pit(
    offline: pd.DataFrame, genre_map: dict[int, list[int]], window: int = 10
) -> tuple[dict[int, dict[int, list[int]]], dict[int, dict[int, list[int]]]]:
    """Sliding last-`window` per-user scan.

    Returns (imp_pit, user_state):
      imp_pit[line_id][genre] = [imp_cnt, clk_cnt] over the user's previous
        <= window rows (strictly past);
      user_state[userid][genre] = counts over the user's LAST window+1 rows
        (the final row joins the full window without evicting — SURVEY A5).
    """
    imp_pit: dict[int, dict[int, list[int]]] = {}
    user_state: dict[int, dict[int, list[int]]] = {}
    for uid, grp in offline.sort_values(["userid", "ts", "_line_id"]).groupby("userid"):
        dq: deque = deque()
        counts: dict[int, list[int]] = {}
        last_counts = None
        for row in grp.to_dict("records"):
            imp_pit[int(row["_line_id"])] = {g: list(v) for g, v in counts.items()}
            # add current row
            genres = genre_map.get(int(row["itemid"]), [])
            dq.append((genres, int(row["label"])))
            for g in genres:
                c = counts.setdefault(g, [0, 0])
                c[0] += 1
                c[1] += int(row["label"])
            last_counts = {g: list(v) for g, v in counts.items()}  # before evict = last window+1
            if len(dq) > window:
                old_genres, old_label = dq.popleft()
                for g in old_genres:
                    counts[g][0] -= 1
                    counts[g][1] -= old_label
        user_state[int(uid)] = last_counts or {}
    return imp_pit, user_state
