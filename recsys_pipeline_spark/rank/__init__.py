"""Ranking stage (SURVEY §2.8): MLlib model over the 59-slot feature table,
AUC evaluation, distributed batch scoring, offline/online parity checks."""
