"""Dataflow operators (SURVEY §2), each expressed as composable DataFrame
transformations. Modules:

  split       — implicit-feedback labeling + temporal train/test/online split
  pit         — point-in-time (as-of) sliding-window features, user/item state
  features    — encodings, scaling, constant-prune, star joins, slot assembly
  topk        — per-group and global top-k
  text        — tokenization, quality scoring, language-ID, fingerprinting
  dedup       — exact / MinHash-LSH / SimHash / n-gram-Jaccard / embedding near-dup
  similarity  — brute-force + LSH/IVF approximate nearest neighbors
  pq          — product quantization + ADC scoring (the IVF-PQ index layer)
  curation    — sampling/caps/packing/decontamination/BPE training + encode
  graph       — connected components (near-dup cluster resolution)
  web         — HTML extraction, host link graph, integer PageRank, z-order
  multimodal  — opaque binary columns with typed metadata (decode stubbed)
"""
