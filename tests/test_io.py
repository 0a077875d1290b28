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


def test_parquet_ts_unit_probe_and_plain_int64_guard(spark, tmp_path):
    """The era guard must branch on the parquet LOGICAL type: certified-nanos
    columns get the div-1000 truncation, while a physically-plain INT64 ts
    (no timestamp annotation — epoch unit unknowable) raises loudly instead
    of being silently mis-scaled 1000x (ADVICE round 6)."""
    import datetime

    import pyarrow as pa
    import pyarrow.parquet as pq

    us = 1_700_000_000_123_456  # fixed UTC epoch micros
    t0 = datetime.datetime.fromtimestamp(us / 1e6, tz=datetime.timezone.utc)

    ns_dir = tmp_path / "ns"
    ns_dir.mkdir()
    pq.write_table(
        pa.table({"event_id": [1], "ts": pa.array([us * 1000], pa.timestamp("ns"))}),
        str(ns_dir / "events.parquet"),
        store_schema=False,  # no arrow-schema override: readers see raw NANOS
    )
    int_dir = tmp_path / "plain"
    int_dir.mkdir()
    pq.write_table(
        pa.table({"event_id": [1], "ts": pa.array([us], pa.int64())}),
        str(int_dir / "events.parquet"),
    )

    assert eio.parquet_ts_unit(str(ns_dir / "events.parquet"), "ts") == "ns"
    assert eio.parquet_ts_unit(str(int_dir / "events.parquet"), "ts") == "int"
    assert eio.parquet_ts_unit(str(int_dir / "events.parquet"), "event_id") == "int"
    assert eio.parquet_ts_unit(str(int_dir / "events.parquet"), "missing") is None

    got = eio.read_table(spark, str(ns_dir), "events").collect()[0]["ts"]
    got_us = int(got.replace(tzinfo=datetime.timezone.utc).timestamp() * 1_000_000)
    assert got_us == us

    with pytest.raises(ValueError, match="plain INT64"):
        eio.read_table(spark, str(int_dir), "events")

    from recsys_pipeline_spark.streaming.pipeline import _ts_stored_as_int64

    assert _ts_stored_as_int64(str(ns_dir)) is True
    with pytest.raises(ValueError, match="plain INT64"):
        _ts_stored_as_int64(str(int_dir))
