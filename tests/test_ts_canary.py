"""Data-shape canary (round-3 lesson): the driver's events.parquet has
shipped in TWO ts encodings — int64 TIMESTAMP(NANOS) (rounds 1-2) and
timestamp[us]/TIMESTAMP_NTZ (round 3+). Round 3's entire regression class
was code that assumed ONE of them. This test writes a tiny events fixture
in BOTH encodings and drives the batch reader, the streaming reader +
windowed agg, and the range join over each — any future consumer that
hardcodes an encoding fails here in seconds, not at the driver gate."""

from __future__ import annotations

import datetime

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from etl_pipeline_api_spark.operators.joins import range_join_count
from etl_pipeline_api_spark.streaming import events as sev

N = 60


def _fixture_pdf() -> pd.DataFrame:
    base = datetime.datetime(2024, 3, 1, 12, 0, 0)
    return pd.DataFrame(
        {
            "event_id": range(N),
            "ts": [base + datetime.timedelta(minutes=7 * i) for i in range(N)],
            "user_id": [i % 5 for i in range(N)],
            "event_type": [["click", "view", "purchase"][i % 3] for i in range(N)],
            "value": [round(1.5 * i, 2) for i in range(N)],
            "props": ["{}"] * N,
        }
    )


@pytest.fixture(scope="module", params=["us", "ns"])
def events_dir(request, tmp_path_factory):
    """The same 60 events, written as timestamp[us] or TIMESTAMP(NANOS)."""
    pdf = _fixture_pdf()
    d = tmp_path_factory.mktemp(f"events_{request.param}")
    tbl = pa.Table.from_pandas(pdf, preserve_index=False)
    unit = request.param
    tbl = tbl.set_column(
        tbl.schema.get_field_index("ts"),
        "ts",
        tbl.column("ts").cast(pa.timestamp(unit)),
    )
    # version 2.6 keeps nanos as TIMESTAMP(NANOS) instead of coercing to µs
    pq.write_table(tbl, d / "events.parquet", version="2.6")
    assert pq.read_schema(d / "events.parquet").field("ts").type == pa.timestamp(unit)
    return str(d)


def test_batch_read_normalizes_both_encodings(spark, events_dir):
    df = sev.normalize_event_ts(spark.read.parquet(f"{events_dir}/events.parquet"))
    assert dict(df.dtypes)["ts"] in ("timestamp", "timestamp_ntz")
    got = sorted(r.ts for r in df.select("ts").collect())
    want = sorted(_fixture_pdf()["ts"])
    assert [pd.Timestamp(t) for t in got] == [pd.Timestamp(t) for t in want]


def test_stream_windowed_agg_both_encodings(spark, events_dir):
    stream = sev.read_events_stream(spark, events_dir)
    out = sev.run_available_now(sev.windowed_agg(stream))
    rows = {
        (pd.Timestamp(r.window_start), r.event_type): (r.n, r.total)
        for r in out.collect()
    }
    # 60 events * 7 min span 6.9 h -> 7 distinct hours x 3 types
    pdf = _fixture_pdf()
    pdf["h"] = pdf["ts"].dt.floor("h")
    want = {
        (pd.Timestamp(h), t): (len(g), round(float(g["value"].sum()), 2))
        for (h, t), g in pdf.groupby(["h", "event_type"])
    }
    assert rows == want


def test_embedding_dtype_canary(spark, tmp_path):
    """Same regression class as events.ts, for embeddings: the driver's
    embedding column could ship as array<float> (today) or array<double>.
    The similarity ops cast to array<double> internally — identical pair
    sets must come out of either encoding."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from etl_pipeline_api_spark.operators import similarity

    rng = np.random.RandomState(11)
    vecs = rng.randn(40, 8)
    results = {}
    for unit, patype in (("f32", pa.float32()), ("f64", pa.float64())):
        tbl = pa.table({
            "vec_id": pa.array(range(len(vecs)), pa.int64()),
            "embedding": pa.array(
                [[float(x) for x in v] for v in vecs], pa.list_(patype)
            ),
        })
        path = tmp_path / f"emb_{unit}.parquet"
        pq.write_table(tbl, path)
        df = spark.read.parquet(str(path))
        results[unit] = {
            (r.id_a, r.id_b)
            for r in similarity.cosine_pairs_lsh(
                df, "vec_id", "embedding", threshold=0.6
            ).collect()
        }
    assert results["f32"] == results["f64"]


def test_range_join_both_encodings(spark, events_dir):
    ev = sev.normalize_event_ts(spark.read.parquet(f"{events_dir}/events.parquet"))
    out = range_join_count(
        ev, ev, id_col="event_id", key_col="user_id", ts_col="ts", lookback_s=3600
    )
    got = {r.event_id: r.n_prev for r in out.collect()}
    pdf = _fixture_pdf()
    want = {}
    for _, row in pdf.iterrows():
        prev = pdf[
            (pdf["user_id"] == row["user_id"])
            & (pdf["ts"] < row["ts"])
            & (pdf["ts"] > row["ts"] - datetime.timedelta(seconds=3600))
        ]
        want[row["event_id"]] = len(prev)
    assert got == want
