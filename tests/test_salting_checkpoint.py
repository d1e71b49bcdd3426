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
