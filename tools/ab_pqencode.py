"""A/B for pq_encode: posexplode -> x16 broadcast join -> two groupBys
(current) vs a ZERO-exchange inline argmin projection against a 1-row
broadcast codebook array (identical IEEE fold order, identical codes)."""
from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: age E402

from recsys_pipeline_spark.operators import pq  # noqa: E402
from recsys_pipeline_spark.queries_ext import _emb  # noqa: E402

PQ_M, PQ_K, MICRO = pq.PQ_M, pq.PQ_K, pq.MICRO


def pq_encode_inline(
    corpus, cents, id_col="vec_id", vec_col="embedding",
    m_sub=PQ_M, k_cent=PQ_K, dim=64,
):
    sub = dim // m_sub
    # 1-row codebook: map (m*k_cent + k) -> cvec
    book = cents.agg(
        F.map_from_entries(
            F.collect_list(
                F.struct((F.col("m") * k_cent + F.col("k")).cast("int"), F.col("cvec"))
            )
        ).alias("_book")
    )
    v = F.col(vec_col).cast("array<double>")

    def d2_struct(m, k):
        cv = F.element_at(F.col("_book"), F.lit(m * k_cent + k))
        terms = []
        for i in range(sub):
            d = F.element_at(v, m * sub + i + 1) - F.element_at(cv, i + 1)
            terms.append(d * d)
        out = terms[0]
        for t in terms[1:]:
            out = out + t
        d2i = F.floor(out * MICRO + F.lit(0.5)).cast("long")
        # missing (m, k) slot (codebook smaller than k_cent): sentinel the
        # argmin can never pick while any real pivot exists
        return F.when(cv.isNull(), F.struct(F.lit(2**62).cast("long").alias("d"), F.lit(k).alias("k"))) \
                .otherwise(F.struct(d2i.alias("d"), F.lit(k).alias("k")))

    def code_m(m):
        return F.least(*[d2_struct(m, k) for k in range(k_cent)])["k"].cast("int")

    return corpus.crossJoin(F.broadcast(book)).select(
        F.col(id_col),
        F.array(*[code_m(m) for m in range(m_sub)]).alias("codes"),
    )


def cur_codes(spark, sf_dir):
    e = _emb(spark, sf_dir)
    cents = pq.pq_centroids(e).localCheckpoint(eager=False)
    return pq.pq_encode(e, cents)


def inline_codes(spark, sf_dir):
    e = _emb(spark, sf_dir)
    cents = pq.pq_centroids(e).localCheckpoint(eager=False)
    return pq_encode_inline(e, cents)


VARIANTS = {"cur_codes": cur_codes, "inline_codes": inline_codes}
