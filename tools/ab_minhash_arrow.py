"""A/B (r16, not-yet-optimized #1): the portable minhash signature kernel as
ONE Arrow-batched mapInPandas (md5 per unique shingle in Python, the k affine
mins as a vectorized numpy reduceat) vs the expression kernel (shingle-position
explode + k codegen agg buffers).

Variants:
  sig_expr / sig_arrow       — the signature pass alone (component measure)
  fd_cur / fd_arrow          — full fuzzy_decontaminate with each kernel
  mh_cur / mh_arrow          — full minhash_dup_pairs with each kernel
"""
from __future__ import annotations

import hashlib
import sys

sys.path.insert(0, "/root/repo")

import numpy as np  # noqa: E402
import pandas as pd  # noqa: E402
from pyspark.sql import DataFrame, functions as F  # noqa: E402

from recsys_pipeline_spark.operators import dedup  # noqa: E402
from recsys_pipeline_spark.operators.curation import hash_bucket  # noqa: E402
from recsys_pipeline_spark.queries_curation import QUERIES_CUR  # noqa: E402
from recsys_pipeline_spark.queries_ext import QUERIES_EXT  # noqa: E402
from recsys_pipeline_spark.io import read_table  # noqa: E402


def minhash_signature_arrow(
    df: DataFrame,
    id_col: str,
    text_col: str = "text",
    k: int = 32,
    shingle_n: int = 3,
    seed: int = 7,
) -> DataFrame:
    """Portable-hash minhash signatures via one mapInPandas pass.

    Bit-identical to minhash_signature(..., portable=True): h(s) =
    int(md5(s)[:15 hex], 16) % P per shingle, m_i = min (a_i*h + b_i) % P.
    """
    params = dedup._hash_params(k, seed)
    A = np.array([a for a, _ in params], dtype=np.int64).reshape(-1, 1)
    B = np.array([b for _, b in params], dtype=np.int64).reshape(-1, 1)
    P = dedup._P
    n = shingle_n
    # Chunked affine-min evaluation with a REUSED buffer: on this host a
    # fresh (k, n_shingles) allocation page-faults at ~8 MB/s (measured:
    # the one-shot broadcast form took 63 s at sf0.1; chunked+out= 1.9 s).
    CHUNK_DOCS = 128

    def gen(batches):
        cache: dict[str, int] = {}
        md5 = hashlib.md5
        buf = np.empty((k, 1 << 16), dtype=np.int64)
        for pdf in batches:
            texts = pdf[text_col].tolist()
            n_docs = len(texts)
            if n_docs == 0:
                continue
            rows = []
            offsets = np.empty(n_docs, dtype=np.int64)
            total = 0
            for i, t in enumerate(texts):
                offsets[i] = total
                L = len(t)
                m = L - n + 1 if L >= n else 1
                row = np.empty(m, dtype=np.int64)
                for j in range(m):
                    s = t[j : j + n]
                    h = cache.get(s)
                    if h is None:
                        h = int(md5(s.encode("utf-8")).hexdigest()[:15], 16) % P
                        cache[s] = h
                    row[j] = h
                rows.append(row)
                total += m
            H = np.concatenate(rows)
            ends = np.append(offsets[1:], total)
            S = np.empty((k, n_docs), dtype=np.int64)
            i = 0
            while i < n_docs:
                j = min(i + CHUNK_DOCS, n_docs)
                lo, hi = offsets[i], ends[j - 1]
                seg = H[lo:hi]
                if len(seg) > buf.shape[1]:
                    buf = np.empty((k, len(seg)), dtype=np.int64)
                b = buf[:, : len(seg)]
                np.multiply(A, seg[None, :], out=b)
                np.add(b, B, out=b)
                np.mod(b, P, out=b)
                S[:, i:j] = np.minimum.reduceat(b, offsets[i:j] - lo, axis=1)
                i = j
            yield pd.DataFrame(
                {id_col: pdf[id_col], "sig": [S[:, i].tolist() for i in range(n_docs)]}
            )

    from recsys_pipeline_spark.io import spread

    return spread(df.select(id_col, text_col)).mapInPandas(
        gen, schema=f"{id_col} long, sig array<bigint>"
    )


def _docs(spark, sf_dir):
    return read_table(spark, sf_dir, "documents").select("doc_id", "text")


def sig_expr(spark, sf_dir):
    return dedup.minhash_signature(_docs(spark, sf_dir), "doc_id", "text", k=32, shingle_n=5, portable=True)


def sig_arrow(spark, sf_dir):
    return minhash_signature_arrow(_docs(spark, sf_dir), "doc_id", "text", k=32, shingle_n=5)


def fd_cur(spark, sf_dir):
    return QUERIES_CUR["fuzzy_decontaminate"](spark, sf_dir)


def _fd_flags_with_sig(docs, sig, id_col, text_col, eval_pct, salt, k, bands, rows, shingle_n, threshold):
    is_eval = hash_bucket(F.col(id_col), salt) < eval_pct
    band_df = dedup.lsh_bands(sig, id_col, bands, rows, k=k, portable=True)
    ev_bands = band_df.filter(is_eval).select(
        "band_id", "band_hash", F.col(id_col).alias("_eval_id")
    )
    tr_bands = band_df.filter(~is_eval)
    cand = (
        tr_bands.join(ev_bands, ["band_id", "band_hash"])
        .select(F.col(id_col), F.col("_eval_id"))
        .distinct()
    )
    sh = docs.filter(~is_eval).select(
        F.col(id_col),
        F.array_distinct(dedup.char_shingles(text_col, shingle_n)).alias("_sh"),
    )
    sh_e = docs.filter(is_eval).select(
        F.col(id_col).alias("_eval_id"),
        F.array_distinct(dedup.char_shingles(text_col, shingle_n)).alias("_sh_e"),
    )
    verified = (
        cand.join(sh, id_col)
        .join(sh_e, "_eval_id")
        .select(F.col(id_col), dedup.jaccard(F.col("_sh"), F.col("_sh_e")).alias("_j"))
        .filter(F.col("_j") >= threshold)
    )
    return verified.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_eval_matches"),
        F.max("_j").alias("max_jaccard"),
    )


def fd_arrow(spark, sf_dir):
    docs = _docs(spark, sf_dir)
    sig = minhash_signature_arrow(docs, "doc_id", "text", k=32, shingle_n=5)
    return _fd_flags_with_sig(docs, sig, "doc_id", "text", 10, "eval", 32, 4, 4, 5, 0.8)


def _fd_flags_with_sig_pin(docs, sig, id_col, text_col, eval_pct, salt, k, bands, rows, shingle_n, threshold):
    is_eval = hash_bucket(F.col(id_col), salt) < eval_pct
    band_df = dedup.lsh_bands(sig, id_col, bands, rows, k=k, portable=True).localCheckpoint(eager=False)
    ev_bands = band_df.filter(is_eval).select(
        "band_id", "band_hash", F.col(id_col).alias("_eval_id")
    )
    tr_bands = band_df.filter(~is_eval)
    cand = (
        tr_bands.join(ev_bands, ["band_id", "band_hash"])
        .select(F.col(id_col), F.col("_eval_id"))
        .distinct()
    )
    sh = docs.filter(~is_eval).select(
        F.col(id_col),
        F.array_distinct(dedup.char_shingles(text_col, shingle_n)).alias("_sh"),
    )
    sh_e = docs.filter(is_eval).select(
        F.col(id_col).alias("_eval_id"),
        F.array_distinct(dedup.char_shingles(text_col, shingle_n)).alias("_sh_e"),
    )
    verified = (
        cand.join(sh, id_col)
        .join(sh_e, "_eval_id")
        .select(F.col(id_col), dedup.jaccard(F.col("_sh"), F.col("_sh_e")).alias("_j"))
        .filter(F.col("_j") >= threshold)
    )
    return verified.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_eval_matches"),
        F.max("_j").alias("max_jaccard"),
    )


def fd_arrow_pin(spark, sf_dir):
    docs = _docs(spark, sf_dir)
    sig = minhash_signature_arrow(docs, "doc_id", "text", k=32, shingle_n=5)
    return _fd_flags_with_sig_pin(docs, sig, "doc_id", "text", 10, "eval", 32, 4, 4, 5, 0.8)


def fd_spread(spark, sf_dir):
    """Current expression kernel, but the sig input is spread() so the
    k-min agg fans out across cores instead of serializing on the single
    scan split (the mh query already does this via cpu_heavy=True)."""
    from recsys_pipeline_spark.io import spread

    docs = _docs(spark, sf_dir)
    sig = dedup.minhash_signature(
        spread(docs), "doc_id", "text", k=32, shingle_n=5, portable=True
    )
    return _fd_flags_with_sig(docs, sig, "doc_id", "text", 10, "eval", 32, 4, 4, 5, 0.8)


def mh_cur(spark, sf_dir):
    return QUERIES_EXT["minhash_dup_pairs"](spark, sf_dir)


def mh_arrow(spark, sf_dir):
    from recsys_pipeline_spark.queries_ext import _docs as _ext_docs

    df = _ext_docs(spark, sf_dir, cpu_heavy=True)
    id_col, text_col, k, bands, rows, shingle_n, threshold = (
        "doc_id", "text", 32, 4, 8, 5, 0.8,
    )
    sig = minhash_signature_arrow(df, id_col, text_col, k=k, shingle_n=shingle_n)
    cand = dedup.candidate_pairs(
        dedup.lsh_bands(sig, id_col, bands, rows, k=k, portable=True), id_col
    )
    a = df.select(F.col(id_col).alias("id_a"), F.col(text_col).alias("_t_a"))
    b = df.select(F.col(id_col).alias("id_b"), F.col(text_col).alias("_t_b"))
    verified = (
        F.broadcast(F.broadcast(cand).join(a, "id_a"))
        .join(b, "id_b")
        .select(
            "id_a",
            "id_b",
            dedup.jaccard(
                F.array_distinct(dedup.char_shingles("_t_a", shingle_n)),
                F.array_distinct(dedup.char_shingles("_t_b", shingle_n)),
            ).alias("jaccard"),
        )
    )
    return verified.filter(F.col("jaccard") >= threshold)


VARIANTS = {
    "fd_cur": fd_cur,
    "fd_arrow": fd_arrow,
    "fd_arrow_pin": fd_arrow_pin,
}

VARIANTS_MH = {
    "mh_cur": mh_cur,
    "mh_arrow": mh_arrow,
}

VARIANTS_SIG = {
    "sig_expr": sig_expr,
    "sig_arrow": sig_arrow,
}
