"""Embedding similarity: exact top-k vs NumPy; LSH variant recall."""
import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, FloatType, LongType, StructField, StructType

from gdal_spark.operators.similarity import (
    cosine_topk,
    knn_cosine_join,
    lsh_bucketed_topk,
)


@pytest.fixture(scope="module")
def vecs(spark):
    rng = np.random.default_rng(99)
    n, d = 300, 16
    v = rng.standard_normal((n, d)).astype(np.float32)
    schema = StructType(
        [StructField("vec_id", LongType()), StructField("embedding", ArrayType(FloatType()))]
    )
    df = spark.createDataFrame(
        [(i, v[i].tolist()) for i in range(n)], schema
    )
    return df, v


def _np_topk(v, q, k):
    cos = (v @ q) / (np.linalg.norm(v.astype(np.float64), axis=1) * np.linalg.norm(q))
    e6 = np.floor(cos * 1e6 + 0.5).astype(np.int64)
    order = sorted(range(len(v)), key=lambda i: (-e6[i], i))
    return [(i, int(e6[i])) for i in order[:k]]


def test_cosine_topk_matches_numpy(spark, vecs):
    df, v = vecs
    q = v[7].astype(np.float64)
    got = [(r.id, r.cos_e6) for r in cosine_topk(df, q, k=10).collect()]
    want = _np_topk(v.astype(np.float64), q, 10)
    assert got == want


def test_knn_cosine_join_matches_numpy(spark, vecs):
    df, v = vecs
    queries = df.filter(F.col("vec_id") < 5).withColumnRenamed("vec_id", "qid")
    got = {}
    for r in knn_cosine_join(queries, df, k=4, query_id="qid").collect():
        got.setdefault(r.qid, []).append((r.id, r.cos_e6))
    for qid in range(5):
        want = _np_topk(v.astype(np.float64), v[qid].astype(np.float64), 4)
        assert got[qid] == want, qid


def test_lsh_bucketed_recall(spark, vecs):
    df, v = vecs
    queries = df.filter(F.col("vec_id") < 20).withColumnRenamed("vec_id", "qid")
    approx = {}
    for r in lsh_bucketed_topk(queries, df, k=3, n_planes=10, probe_flips=2, dim=v.shape[1]).collect():
        approx.setdefault(r.qid, set()).add(r.id)
    hits = total = 0
    for qid in range(20):
        want = {i for i, _ in _np_topk(v.astype(np.float64), v[qid].astype(np.float64), 3)}
        hits += len(want & approx.get(qid, set()))
        total += 3
    assert hits / total >= 0.5  # multiprobe recall on random data
    # the query itself (cos=1) must always be found (identical bucket)
    for qid in range(20):
        assert qid in approx.get(qid, set())
