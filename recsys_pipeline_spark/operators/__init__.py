"""Dataflow operators (SURVEY §2), each expressed as composable DataFrame
transformations. Modules:

  split       — implicit-feedback labeling + temporal train/test/online split
  pit         — point-in-time (as-of) sliding-window features, user/item state
  features    — encodings, scaling, constant-prune, star joins, slot assembly
  topk        — per-group and global top-k
  text        — tokenization, quality scoring, language-ID, fingerprinting
  dedup       — exact / MinHash-LSH / SimHash / n-gram-Jaccard / embedding near-dup
  similarity  — brute-force + LSH approximate nearest neighbors
  multimodal  — opaque binary columns with typed metadata (decode stubbed)
"""
