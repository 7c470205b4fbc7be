"""Event-time windowed aggregation — the Structured Streaming shape for
metric rollups over event streams.

The reference has no event-time operators (its "streaming" is an ingest
actor, SURVEY.md §2.4); this module is part of the training-pipeline
surface: one definition serves batch backfill AND the live stream —
``windowed_event_stats`` works on a batch DataFrame as-is, and
``stream_windowed_stats`` wraps it with a watermark for late data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def windowed_event_stats(
    df: DataFrame,
    ts_col: str = "ts",
    window: str = "10 minutes",
    keys: tuple[str, ...] = ("event_type",),
) -> DataFrame:
    """Tumbling-window counts/sums per key.  Pure built-in aggregation:
    partial (map-side) + final hash agg, shuffle only on (window, keys).

    Output window bounds are formatted as strings so results compare
    stably across engines (driver oracle gate)."""
    w = F.window(F.col(ts_col), window)
    return (
        df.groupBy(w.alias("w"), *keys)
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 6).alias("sum_value"),
            F.countDistinct("user_id").alias("n_users"),
        )
        .select(
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            *keys,
            "n_events",
            "sum_value",
            "n_users",
        )
    )


def stream_windowed_stats(
    stream_df: DataFrame,
    ts_col: str = "ts",
    window: str = "10 minutes",
    watermark: str = "30 minutes",
    keys: tuple[str, ...] = ("event_type",),
) -> DataFrame:
    """Streaming variant: watermarked event-time windows (late rows beyond
    ``watermark`` are dropped; state for closed windows is evicted).
    Feed to ``.writeStream.outputMode("append")``.

    Exact ``countDistinct`` is unsupported in streaming aggregations, so
    n_users uses the HLL-based ``approx_count_distinct`` (a mergeable
    sketch — the same partial-aggregation algebra as our blooms)."""
    # watermarks require TIMESTAMP (not NTZ); with a UTC session the cast
    # is value-identical
    stream_df = stream_df.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
    w = F.window(F.col(ts_col), window)
    return (
        stream_df.withWatermark(ts_col, watermark)
        .groupBy(w.alias("w"), *keys)
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 6).alias("sum_value"),
            F.approx_count_distinct("user_id").alias("n_users_approx"),
        )
        .select(
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            *keys,
            "n_events",
            "sum_value",
            "n_users_approx",
        )
    )
