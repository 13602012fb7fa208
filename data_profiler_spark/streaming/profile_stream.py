"""Streaming profile/validation — BEYOND the reference.

The reference has zero streaming support (SURVEY §2.10: no structured
streaming imports anywhere). For a training-data pipeline, continuous
validation of an arriving table matters, so we provide the minimal
Spark-native layer:

- ``streaming_profile``: windowed per-column metric rows (row/null counts,
  approx distinct, mean/min/max on numeric views) over event-time windows
  with a watermark — the same fused-aggregate idea as the batch planner,
  expressed as one ``groupBy(window(...)).agg(...)``.
- ``streaming_map_violations``: map-constraint conditions are ordinary
  Column expressions, so they apply unchanged to a streaming DataFrame;
  violating rows stream to any sink.

Works with any streaming source; tests drive it with the parquet source +
``processAllAvailable()`` (synchronous smoke per the PySpark guide).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import NumericType


def streaming_profile(
    stream: DataFrame,
    time_col: str,
    columns: list[str],
    window: str = "5 minutes",
    watermark: str = "10 minutes",
) -> DataFrame:
    """One windowed fused agg for all requested columns."""
    # watermarks require TIMESTAMP (with zone); parquet TIMESTAMP_NTZ (the
    # Spark 4 default read for unadjusted parquet timestamps) is rejected
    if stream.schema[time_col].dataType.typeName() != "timestamp":
        stream = stream.withColumn(time_col, F.col(time_col).cast("timestamp"))
    aggs: list[Column] = [F.count(F.lit(1)).alias("row_count")]
    for c in columns:
        col = F.col(c)
        aggs.append(
            F.sum(F.when(col.isNull(), 1).otherwise(0)).alias(f"{c}__null_count")
        )
        aggs.append(F.approx_count_distinct(col).alias(f"{c}__approx_distinct"))
        if isinstance(stream.schema[c].dataType, NumericType):
            aggs.append(F.min(col).alias(f"{c}__min"))
            aggs.append(F.max(col).alias(f"{c}__max"))
            aggs.append(F.avg(col).alias(f"{c}__mean"))
    return (
        stream.withWatermark(time_col, watermark)
        .groupBy(F.window(F.col(time_col), window).alias("win"))
        .agg(*aggs)
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            *[c for c in ["row_count"]],
            *[
                F.col(f"{c}__{m}")
                for c in columns
                for m in ["null_count", "approx_distinct"]
            ],
            *[
                F.col(f"{c}__{m}")
                for c in columns
                if isinstance(stream.schema[c].dataType, NumericType)
                for m in ["min", "max", "mean"]
            ],
        )
    )


def streaming_map_violations(
    stream: DataFrame, unexpected_condition: Column
) -> DataFrame:
    """Filter a stream down to constraint-violating rows (append mode)."""
    return stream.where(unexpected_condition)
