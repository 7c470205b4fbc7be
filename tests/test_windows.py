"""Event-time windowed aggregation: batch/stream parity and watermark
late-row handling."""

import os

from pyspark.sql import functions as F

from bloomsearch_spark.streaming.windows import (
    stream_windowed_stats,
    windowed_event_stats,
)

SF = "/root/testdata/sf0.001"


def test_batch_windowed_stats(spark):
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    events = spark.read.parquet(os.path.join(SF, "events.parquet"))
    out = windowed_event_stats(events, window="10 minutes").toPandas()
    assert out["n_events"].sum() == events.count()
    assert set(out.columns) == {"window_start", "event_type", "n_events", "sum_value", "n_users"}
    # windows align to 10-minute boundaries
    assert out["window_start"].str.endswith(("0:00", "omit")).any() or True
    mins = out["window_start"].str[14:16].astype(int)
    assert (mins % 10 == 0).all()


def test_stream_windowed_stats_parity(spark, tmp_path):
    """Streaming (availableNow, watermarked) totals equal the batch agg for
    on-time data — one definition, two execution modes."""
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    src = os.path.join(SF, "events.parquet")
    schema = spark.read.parquet(src).schema
    # the file stream source requires a directory; glob down to one table
    stream = (
        spark.readStream.schema(schema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(SF)
    )
    out_tbl = "evtwin_sink"
    q = (
        stream_windowed_stats(stream, window="10 minutes", watermark="30 minutes")
        .writeStream.format("memory")
        .queryName(out_tbl)
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.table(out_tbl).toPandas()
    batch = windowed_event_stats(
        spark.read.parquet(src), window="10 minutes"
    ).toPandas()
    # append-mode emits only windows closed by the final watermark; all but
    # the trailing ~30min of windows must match the batch result exactly
    merged = got.merge(
        batch, on=["window_start", "event_type"], suffixes=("_s", "_b")
    )
    assert len(merged) == len(got) > 0
    assert (merged["n_events_s"] == merged["n_events_b"]).all()
    assert (merged["sum_value_s"] == merged["sum_value_b"]).all()
