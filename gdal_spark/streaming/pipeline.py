"""Structured Streaming wrapper over the batch spatial pipeline.

The reference is a batch library (SURVEY.md §2.9: no watermarks, no
event-time state) — this module is the *additive* streaming face the
north rule's ingest scenario needs: pages stream in, geotags extract,
tiles assign, and windowed per-tile counts emit with late-data handling.

All transformations reuse the exact batch column expressions
(gdal_spark.pages / operators.spatial_join), so batch and streaming
paths cannot diverge — the Spark way of "one engine, two run modes".

- ``streaming_pages_from_rate``: deterministic pages stream from the
  built-in rate source (value → same splitmix64 synth as batch).
- ``streaming_tile_counts``: watermark on ``warc_ts`` + tumbling window
  + groupBy tile → append-mode aggregate. State is bounded by
  (watermark horizon × active tiles).
- ``streaming_url_dedup``: watermarked ``dropDuplicates`` on url — the
  streaming form of exact dedup (first occurrence wins, late dupes
  beyond the watermark age out).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from gdal_spark import tiling
from gdal_spark.pages import extract_geotags, pages_columns


def streaming_pages_from_rate(
    spark: SparkSession, rows_per_second: int = 1000
) -> DataFrame:
    """Deterministic pages stream: rate-source ``value`` drives the same
    splitmix64 synthesis as the batch ``synth_pages``."""
    rate = (
        spark.readStream.format("rate")
        .option("rowsPerSecond", rows_per_second)
        .load()
    )
    return rate.select(pages_columns(F.col("value"), F.col("timestamp")))


def streaming_tile_counts(
    pages: DataFrame,
    zoom: int = 8,
    window: str = "1 minute",
    watermark: str = "2 minutes",
) -> DataFrame:
    """pages stream → (window, tile_x, tile_y, n) with late-data bound."""
    tagged = extract_geotags(pages)
    tx_sql, ty_sql = tiling.lonlat_tile_sql("lon", "lat", zoom)
    tiled = tagged.withColumn("tile_x", F.expr(tx_sql)).withColumn(
        "tile_y", F.expr(ty_sql)
    )
    return (
        tiled.withWatermark("warc_ts", watermark)
        .groupBy(F.window("warc_ts", window).alias("w"), "tile_x", "tile_y")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.col("w.start").alias("window_start"),
            "tile_x",
            "tile_y",
            "n",
        )
    )


def streaming_url_dedup(pages: DataFrame, watermark: str = "10 minutes") -> DataFrame:
    """Streaming exact dedup by url (state aged out past the watermark)."""
    return pages.withWatermark("warc_ts", watermark).dropDuplicates(["url"])


def streaming_site_stats(pages: DataFrame, timeout_ms: int = 60000) -> DataFrame:
    """Custom stateful operator via ``applyInPandasWithState``: running
    per-site page count + total text bytes, emitted on every update.

    The explicit-state form the reference lacks entirely (§2.9): state is
    a (count, bytes) pair per site key, timeout-evicted — the pattern for
    any custom streaming accumulator (session windows, rolling sketches).
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def update(key, pdfs, state: GroupState):
        n = 0
        b = 0
        for pdf in pdfs:
            n += len(pdf)
            b += int(pdf["text"].str.len().sum())
        if state.exists:
            (pn, pb) = state.get
            n += pn
            b += pb
        state.update((n, b))
        state.setTimeoutDuration(timeout_ms)
        yield pd.DataFrame({"site": [key[0]], "n_pages": [n], "text_bytes": [b]})

    keyed = pages.withColumn(
        "site", F.regexp_extract("url", r"https://([^/]+)/", 1)
    )
    return keyed.groupBy("site").applyInPandasWithState(
        update,
        outputStructType="site STRING, n_pages LONG, text_bytes LONG",
        stateStructType="n LONG, b LONG",
        outputMode="update",
        timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
    )
