"""Byte-identity lineage manifests (BASELINE.json input_hint invariant:
``text`` bytes unchanged per ``url`` through every pipeline stage).

Uses Spark's JVM-side ``xxhash64`` (seed 42) — no Python in the path.
Two granularities:

- :func:`partition_manifest` — one row per physical partition
  (partition_id, row_count, xor of per-row hashes): the checkpointable
  artifact a resumable 100 TB job emits per stage.
- :func:`global_fingerprint` — (count, xor-of-hashes) for the whole table:
  partitioning-invariant, so it compares across stages that repartition.

XOR aggregation is order- and partition-independent and cannot overflow,
making stage-boundary comparison exact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def _row_hash(key_col: str, text_col: str):
    return F.xxhash64(F.col(key_col), F.col(text_col))


def partition_manifest(df: DataFrame, key_col: str = "url", text_col: str = "text") -> DataFrame:
    return (
        df.select(
            F.spark_partition_id().alias("partition_id"),
            _row_hash(key_col, text_col).alias("h"),
        )
        .groupBy("partition_id")
        .agg(
            F.count(F.lit(1)).alias("row_count"),
            F.expr("bit_xor(h)").alias("xxh64_xor"),
        )
    )


def global_fingerprint(df: DataFrame, key_col: str = "url", text_col: str = "text") -> tuple[int, int]:
    row = (
        df.select(_row_hash(key_col, text_col).alias("h"))
        .agg(F.count(F.lit(1)).alias("n"), F.expr("bit_xor(h)").alias("x"))
        .collect()[0]
    )
    return int(row["n"]), int(row["x"] if row["x"] is not None else 0)


def assert_unchanged(before: tuple[int, int], after: tuple[int, int], stage: str = "") -> None:
    if before != after:
        raise AssertionError(
            f"text byte-identity violated at stage {stage!r}: {before} -> {after}"
        )
