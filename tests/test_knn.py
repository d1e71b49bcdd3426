"""kNN join (k-ring expansion) vs the brute-force oracle."""
import numpy as np
import pandas as pd

from gdal_spark.operators.knn import knn_join, knn_join_bruteforce
from gdal_spark import tiling


def _xy_df(spark, n, seed, idc):
    rng = np.random.default_rng(seed)
    # mercator meters in a regional window (so k-ring actually matters)
    x = rng.uniform(-2e6, 2e6, n)
    y = rng.uniform(-1e6, 3e6, n)
    pdf = pd.DataFrame({idc: np.arange(n, dtype=np.int64), "x": x, "y": y})
    return spark.createDataFrame(pdf), pdf


def _collect_pairs(df):
    p = df.toPandas().sort_values(["qid", "rank"])
    return list(zip(p["qid"].astype(int), p["rank"].astype(int), p["nid"].astype(int)))


def test_knn_matches_bruteforce(spark):
    q, _ = _xy_df(spark, 120, 7, "qid")
    nb, _ = _xy_df(spark, 900, 13, "nid")
    got = _collect_pairs(knn_join(q, nb, k=3, zoom=6, radius=1, max_rounds=5))
    want = _collect_pairs(knn_join_bruteforce(q, nb, k=3))
    assert got == want


def test_knn_sparse_neighbors_needs_expansion(spark):
    """Few neighbors → first ring usually empty → exercises the doubling."""
    q, _ = _xy_df(spark, 40, 17, "qid")
    nb, _ = _xy_df(spark, 25, 19, "nid")
    got = _collect_pairs(knn_join(q, nb, k=2, zoom=8, radius=1, max_rounds=6))
    want = _collect_pairs(knn_join_bruteforce(q, nb, k=2))
    assert got == want


def test_knn_exact_under_k_neighbors(spark):
    """k larger than the neighbor table: every query returns all neighbors."""
    q, _ = _xy_df(spark, 10, 23, "qid")
    nb, _ = _xy_df(spark, 4, 29, "nid")
    got = knn_join(q, nb, k=6, zoom=6, radius=1, max_rounds=6).toPandas()
    assert (got.groupby("qid").size() == 4).all()


def test_knn_join_no_persisted_leftovers(spark):
    """r3 VERDICT wrong-3: knn_join must not leak persisted RDDs across
    calls (round ids are localCheckpointed, not persisted; blocks are
    GC-reclaimed). Assert no MEMORY_AND_DISK persists tagged by a
    user persist() remain registered after the result materializes."""
    import gc

    from gdal_spark.operators.knn import knn_join

    q = spark.createDataFrame(
        [(i, float(i % 7), float(i % 5)) for i in range(40)], "qid INT, x DOUBLE, y DOUBLE"
    )
    nb = spark.createDataFrame(
        [(i, float((i * 3) % 11), float((i * 5) % 9)) for i in range(200)],
        "nid INT, x DOUBLE, y DOUBLE",
    )
    out = knn_join(q, nb, k=3, query_id="qid", neighbor_id="nid",
                   query_x="x", query_y="y", neighbor_x="x", neighbor_y="y")
    assert out.count() == 40 * 3
    del out
    gc.collect()
    jsc = spark.sparkContext._jsc
    persisted = dict(jsc.getPersistentRDDs())
    # localCheckpoint RDDs are reclaimed on GC; no named persist() from
    # knn_join may remain (other session fixtures may hold their own)
    leaked = [v.name() for v in persisted.values()
              if v.name() and "final_ids" in str(v.name())]
    assert leaked == []
