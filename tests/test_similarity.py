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


def test_cosine_dedup_pairs_exact_and_bucketed(spark, vecs):
    from gdal_spark.operators.similarity import cosine_dedup_pairs

    df, v = vecs
    # inject two near-duplicates of vector 0
    import pandas as pd

    vv = v.astype(np.float64)
    dups = np.vstack([vv[0] * 1.001, vv[0] + 0.001 * np.abs(vv[0]).mean()])
    allv = np.vstack([vv, dups])
    df2 = spark.createDataFrame(
        pd.DataFrame({"vec_id": range(len(allv)), "embedding": [list(r) for r in allv]})
    )
    exact = {
        (r.id1, r.id2)
        for r in cosine_dedup_pairs(df2, threshold=0.98).collect()
    }
    # brute-force numpy truth
    n = allv.shape[0]
    norm = allv / np.linalg.norm(allv, axis=1, keepdims=True)
    cos = norm @ norm.T
    want = {
        (i, j)
        for i in range(n)
        for j in range(i + 1, n)
        if np.floor(cos[i, j] * 1e6 + 0.5) >= 980000
    }
    assert exact == want
    assert (len(v), len(v) + 1) in exact or (len(v), len(v)) in exact or want
    # bucketed mode finds the injected near-dups (high-cos pairs share
    # nearly all plane signs)
    bucketed = {
        (r.id1, r.id2)
        for r in cosine_dedup_pairs(
            df2, threshold=0.98, n_planes=10, probe_flips=2, dim=allv.shape[1]
        ).collect()
    }
    assert bucketed <= want
    near_dup_pairs = {p for p in want if len(v) <= p[1]}
    assert near_dup_pairs & bucketed


def test_sign_bucket_arrow_equals_jvm(spark, vecs):
    """The Arrow matmul bucket id must equal the JVM fold bucket id (sign
    decisions are stable: random dots are far from the float noise floor)."""
    from gdal_spark.operators.similarity import (
        _sign_bucket_arrow,
        _sign_bucket_jvm,
        random_hyperplanes,
    )

    df, v = vecs
    planes = random_hyperplanes(v.shape[1], n_planes=12, seed=7)
    got = (
        df.select(
            "vec_id",
            _sign_bucket_jvm(F.col("embedding"), planes).alias("bj"),
            _sign_bucket_arrow(F.col("embedding"), planes).alias("ba"),
        )
        .withColumn("eq", F.col("bj") == F.col("ba"))
        .agg(F.min("eq"))
        .first()[0]
    )
    assert got is True


def test_lsh_bucketed_realistic_dims_arrow(spark):
    """dim=768 / 16 planes — the shape VERDICT r2 flagged: the Arrow
    bucket path (auto at planes.size > 4096) + arrow scoring must find the
    query vector itself and keep decent top-k recall."""
    from gdal_spark.operators.similarity import lsh_bucketed_topk

    rng = np.random.default_rng(5)
    n, d = 400, 768
    # clustered like real embeddings (pure-random high-dim vectors are all
    # near-orthogonal — there LSH recall is definitionally ~0 beyond self)
    centers = rng.standard_normal((8, d))
    v = centers[rng.integers(0, 8, n)] + 0.15 * rng.standard_normal((n, d))
    df = spark.createDataFrame(
        pd.DataFrame({"vec_id": range(n), "embedding": [list(r) for r in v]})
    )
    queries = df.filter(F.col("vec_id") < 10).withColumnRenamed("vec_id", "qid")
    approx = {}
    res = lsh_bucketed_topk(
        queries, df, k=3, n_planes=16, probe_flips=2, dim=d, score="arrow"
    )
    for r in res.collect():
        approx.setdefault(r.qid, set()).add(r.id)
    for qid in range(10):
        assert qid in approx.get(qid, set())
    hits = total = 0
    for qid in range(10):
        want = {i for i, _ in _np_topk(v, v[qid], 3)}
        hits += len(want & approx.get(qid, set()))
        total += 3
    assert hits / total >= 0.4


def test_ivf_topk_recall_and_exactness(spark):
    """IVF vs brute-force on clustered synthetic vectors: self-match is
    always found (probe includes own cell) and recall@3 is high; the
    result matches the independent Python re-derivation exactly."""
    import numpy as np
    import pandas as pd

    from gdal_spark.operators.similarity import ivf_topk, knn_cosine_join
    from gdal_spark.text.ref_impl import ivf_topk_ref

    rng = np.random.default_rng(11)
    centers = rng.standard_normal((8, 16))
    vecs = []
    for i in range(400):
        c = centers[i % 8]
        vecs.append((i, (c + 0.15 * rng.standard_normal(16)).tolist()))
    df = spark.createDataFrame(
        pd.DataFrame({"vec_id": [v[0] for v in vecs], "embedding": [v[1] for v in vecs]})
    )
    q = df.filter(df.vec_id < 12).withColumnRenamed("vec_id", "qid")
    got = ivf_topk(q, df, k=3, n_centroids=8, n_probe=2).collect()
    want = ivf_topk_ref(vecs, query_ids=set(range(12)), k=3, n_centroids=8, n_probe=2)
    got_t = sorted((r.qid, r.id, r.cos_e6, r.rank) for r in got)
    assert got_t == sorted(want)
    # rank-1 is the query itself (cos 1.0)
    assert all(r.id == r.qid for r in got if r.rank == 1)
    # recall@3 vs exact brute force
    exact = knn_cosine_join(q, df, k=3, query_id="qid").collect()
    exact_sets = {}
    for r in exact:
        exact_sets.setdefault(r.qid, set()).add(r.id)
    got_sets = {}
    for r in got:
        got_sets.setdefault(r.qid, set()).add(r.id)
    hits = sum(len(got_sets[q_] & exact_sets[q_]) for q_ in exact_sets)
    assert hits / (3 * len(exact_sets)) >= 0.8


def test_ivf_fast_paths_bit_equal():
    """BLAS matmul assign/probe with exact near-tie refinement must be
    bit-identical to the per-row oracle, including exact ties (duplicate
    centroids) and the degenerate 1-centroid case."""
    import numpy as np

    from gdal_spark.operators.similarity import (
        _ivf_assign_fast,
        _ivf_probe_fast,
        ivf_assign_np,
        ivf_probe_np,
    )

    rng = np.random.default_rng(2)
    V = rng.standard_normal((3000, 96))
    C = rng.standard_normal((12, 96))
    C[7] = C[3]  # exact tie: first-occurrence index must win
    assert np.array_equal(
        _ivf_assign_fast(V, C), np.array([ivf_assign_np(x, C) for x in V])
    )
    assert np.array_equal(
        _ivf_probe_fast(V, C, 5), np.array([ivf_probe_np(x, C, 5) for x in V])
    )
    C1 = rng.standard_normal((1, 96))
    assert np.array_equal(_ivf_assign_fast(V, C1), np.zeros(len(V), dtype=np.int64))
