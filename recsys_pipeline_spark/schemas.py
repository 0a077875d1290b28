"""Schema and constant definitions.

Two families:
  1. ml-1m-shaped tables — the reference's data model (ratings/users/movies,
     see /root/reference offline/preprocess/s1_data_split.py:10 and
     data_exchange_center/constants.py). Explicit StructTypes; the reference
     relies on pandas dtype inference.
  2. Driver testdata tables (/root/testdata/sf*) — TPC-H-ish star schema used
     by the oracle-checked operator queries.

Categorical mappings mirror data_exchange_center/constants.py:28-72 (dict-encode
with an empty-key→0 default) as Spark map literals so the lookup stays JVM-side.
"""

from __future__ import annotations

from itertools import chain

from pyspark.sql import functions as F
from pyspark.sql import types as T

# ---------------------------------------------------------------------------
# ml-1m-shaped schemas (reference data model)
# ---------------------------------------------------------------------------

RATINGS_SCHEMA = T.StructType(
    [
        T.StructField("userid", T.LongType(), False),
        T.StructField("itemid", T.LongType(), False),
        T.StructField("rating", T.IntegerType(), False),
        T.StructField("ts", T.LongType(), False),  # epoch seconds
    ]
)

USERS_SCHEMA = T.StructType(
    [
        T.StructField("userid", T.LongType(), False),
        T.StructField("gender", T.StringType(), True),
        T.StructField("age", T.IntegerType(), True),
        T.StructField("occupation", T.IntegerType(), True),
        T.StructField("zipcode", T.StringType(), True),
    ]
)

MOVIES_SCHEMA = T.StructType(
    [
        T.StructField("itemid", T.LongType(), False),
        T.StructField("title", T.StringType(), True),
        T.StructField("genres", T.StringType(), True),  # pipe-delimited multi-value
    ]
)

# Reference constants (data_exchange_center/constants.py:20-22)
N_ONLINE_PER_USER = 10  # last-10 interactions per user go to the online split
TRAIN_FRACTION = 0.8  # of the remaining rows, first 80% train / rest test
PIT_WINDOW = 10  # point-in-time frame: previous <=10 interactions
RECALL_TERM_CLICK_MIN = 3  # genre becomes a recall term at >=3 clicks
EMBEDDING_DIM = 16  # constants.py:76
RECALL_SIZE = 200  # candidates from recall (dto.py:19)
RESPONSE_SIZE = 50  # final top-k (dto.py:21)
VECTOR_BOOST = 0.9  # es_caller.py:44
TERM_BOOST = 0.1  # es_caller.py:23

# Genre vocabulary (constants.py:29-49): 18 genres, ids 1..18; 0 = empty key.
GENRES = [
    "Action", "Adventure", "Animation", "Children's", "Comedy", "Crime",
    "Documentary", "Drama", "Fantasy", "Film-Noir", "Horror", "Musical",
    "Mystery", "Romance", "Sci-Fi", "Thriller", "War", "Western",
]
GENRE_TO_ID = {g: i + 1 for i, g in enumerate(GENRES)}
GENRE_IDS = list(range(1, len(GENRES) + 1))

# Dict-encodes with default 0 (constants.py:51-72)
GENDER_MAP = {"M": 1, "F": 2}
AGE_MAP = {1: 1, 18: 2, 25: 3, 35: 4, 45: 5, 50: 6, 56: 7}
OCCUPATION_MAP = {i: i + 1 for i in range(21)}  # 0..20 -> 1..21


def map_literal(mapping: dict) -> F.Column:
    """A Spark map literal for dict-encoding (stays in codegen, no UDF)."""
    return F.create_map(*[F.lit(x) for x in chain.from_iterable(mapping.items())])


def encode_with_default(col: str, mapping: dict, default: int = 0) -> F.Column:
    """``mapping.get(x, default)`` as a JVM-side expression (SURVEY P4)."""
    return F.coalesce(map_literal(mapping)[F.col(col)], F.lit(default))


# ---------------------------------------------------------------------------
# Driver testdata (TPC-H-ish) table names
# ---------------------------------------------------------------------------

TESTDATA_TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]
