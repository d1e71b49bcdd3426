"""Salted joins (skew fallback) and checkpoint/resume machinery."""
import json
import os

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from gdal_spark.checkpoint import manifest_path, pending_shards, run_sharded, verify_manifests
from gdal_spark.operators.salting import salted_join, salted_join_hot_keys, top_hot_keys
from gdal_spark.pages import synth_pages


@pytest.fixture(scope="module")
def skewed(spark):
    # fact: 5000 rows, 60% on cell 7
    rng = np.random.default_rng(3)
    cells = np.where(rng.random(5000) < 0.6, 7, rng.integers(0, 50, 5000))
    fact = spark.createDataFrame(
        pd.DataFrame({"cell": cells, "fid": np.arange(5000)})
    )
    dim = spark.createDataFrame(
        pd.DataFrame({"cell": np.arange(50), "poly": np.arange(50) + 100})
    )
    return fact, dim


def test_salted_join_matches_plain(spark, skewed):
    fact, dim = skewed
    plain = fact.join(dim, "cell").select("fid", "poly")
    salted = salted_join(fact, dim, ["cell"], n_salt=8).select("fid", "poly")
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))


def test_salted_hot_keys_matches_plain(spark, skewed):
    fact, dim = skewed
    hot = top_hot_keys(fact, ["cell"], top_n=3)
    plain = fact.join(dim, "cell").select("fid", "poly")
    salted = salted_join_hot_keys(fact, dim, ["cell"], hot, n_salt=8).select("fid", "poly")
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))


def test_checkpoint_run_and_resume(spark, tmp_path):
    root = str(tmp_path / "ckpt")
    pages = synth_pages(spark, 400)
    s1 = run_sharded(pages, root, n_shards=4)
    assert s1 == {"ran": 4, "skipped": 0, "rows_written": 400}
    assert pending_shards(root, 4) == []
    assert verify_manifests(spark, root, 4)
    # resume: nothing to do
    s2 = run_sharded(pages, root, n_shards=4)
    assert s2 == {"ran": 0, "skipped": 4, "rows_written": 0}
    # simulate a lost shard → only that one re-runs
    os.remove(manifest_path(root, 2))
    s3 = run_sharded(pages, root, n_shards=4)
    assert s3["ran"] == 1 and s3["skipped"] == 3
    assert verify_manifests(spark, root, 4)
    # manifests carry lineage fingerprints
    with open(manifest_path(root, 0)) as f:
        m = json.load(f)
    assert m["row_count"] > 0 and "xxh64_xor" in m


def test_checkpoint_total_rows_partition_invariant(spark, tmp_path):
    root = str(tmp_path / "ckpt2")
    pages = synth_pages(spark, 300, partitions=7)
    run_sharded(pages, root, n_shards=3)
    total = sum(
        json.load(open(manifest_path(root, s)))["row_count"] for s in range(3)
    )
    assert total == 300


def test_salted_join_rejects_right_full(spark):
    import pytest
    from gdal_spark.operators.salting import salted_join

    df = spark.range(10).withColumnRenamed("id", "k")
    with pytest.raises(ValueError):
        salted_join(df, df, on=["k"], how="right")
    with pytest.raises(ValueError):
        salted_join(df, df, on=["k"], how="full")


def test_salted_join_salt_deterministic_and_spread(spark):
    """Salt derives from row content (stable across re-runs) and spreads
    a hot key across buckets."""
    from pyspark.sql import functions as F
    from gdal_spark.operators.salting import salted_join

    fact = spark.range(1000).select(F.lit(7).alias("k"), F.col("id").alias("payload"))
    dim = spark.createDataFrame([(7, "x")], "k INT, v STRING")
    out = salted_join(fact, dim, on=["k"], n_salt=8)
    assert out.count() == 1000
    # same content → same salt: re-running the plan yields identical rows
    a = sorted(tuple(r) for r in out.collect())
    b = sorted(tuple(r) for r in out.collect())
    assert a == b
