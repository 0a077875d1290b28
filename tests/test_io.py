"""S1/S2 scans: multi-char '::' separator + ISO-8859-1 encoding (the
reference's raw-file format, offline/preprocess/s1_data_split.py:10,
s2_term_trans.py:12) through both the CSV reader and the text+split fallback."""

from __future__ import annotations

import pytest
from pyspark.sql import types as T

from recsys_pipeline_spark import io as eio

SCHEMA = T.StructType(
    [
        T.StructField("itemid", T.LongType()),
        T.StructField("title", T.StringType()),
        T.StructField("genres", T.StringType()),
    ]
)

ROWS = [
    (1, "Les Misérables (1995)", "Drama|Musical"),
    (2, "Café Société", "Comedy"),
    (3, "Plain", "Action|Thriller"),
]


@pytest.fixture(scope="module")
def dat_file(tmp_path_factory):
    p = tmp_path_factory.mktemp("raw") / "movies.dat"
    text = "\n".join("::".join(str(v) for v in r) for r in ROWS) + "\n"
    p.write_bytes(text.encode("ISO-8859-1"))
    return str(p)


def test_multichar_sep_with_encoding(spark, dat_file):
    got = sorted(
        tuple(r) for r in eio.read_delimited(spark, dat_file, SCHEMA, encoding="ISO-8859-1").collect()
    )
    assert got == sorted(ROWS)  # accents survive the ISO-8859-1 decode


def test_text_split_fallback_same_rows(spark, dat_file):
    # fallback path reads bytes as UTF-8 -> use it on the ASCII-only columns
    df = eio.read_delimited_fallback(spark, dat_file, SCHEMA)
    assert df.count() == len(ROWS)
    ids = sorted(r["itemid"] for r in df.collect())
    assert ids == [1, 2, 3]
