"""Two-channel candidate recall (SURVEY §2.7):

  vectors   — embedding training (MF via MLlib ALS) + vector extraction
  retrieve  — term (inverted-index) recall, brute-force/LSH cosine top-k,
              seen-item anti-join, 0.9/0.1 score fusion
"""
