"""The reference's offline pipeline (akiragy/recsys_pipeline), re-expressed as
lazy DataFrame DAGs:

  preprocess  — implicit labeling + temporal split     (s1_data_split.py)
  terms       — PIT per-genre features, user/item term state (s2_term_trans.py)
  feature_engi— encodings, scaling, 59-slot layout     (s1_feature_engi.py)

The reference chains eager pandas scripts through CSV/pickle files; here each
stage is a DataFrame transformation and the "file boundary" is an optional
Parquet checkpoint.
"""
