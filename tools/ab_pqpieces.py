import sys
sys.path.insert(0, "/root/repo")
from pyspark.sql import functions as F
from recsys_pipeline_spark.operators import pq, similarity
from recsys_pipeline_spark.queries_ext import _emb, _ann_queries_df

def cand(spark, sf_dir):
    e = _emb(spark, sf_dir)
    q = _ann_queries_df(spark, sf_dir)
    return similarity.ivf_sketch_candidates_multi(e, q, cell_bits=3, n_probe=4, seed=7, with_vec=False)

def exact(spark, sf_dir):
    e = _emb(spark, sf_dir)
    q = _ann_queries_df(spark, sf_dir)
    return pq.l2_topk_for_queries(q, e, k=10)

def queries_only(spark, sf_dir):
    return _ann_queries_df(spark, sf_dir)

VARIANTS = {"cand": cand, "exact": exact, "queries_only": queries_only}
