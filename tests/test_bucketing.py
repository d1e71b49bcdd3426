"""Bucketed co-located joins: same result, no Exchange in the plan."""
import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from gdal_spark.io import read_table, write_bucketed


def test_bucketed_join_is_exchange_free(spark):
    rng = np.random.default_rng(5)
    a = spark.createDataFrame(
        pd.DataFrame({"cell": rng.integers(0, 200, 5000), "v": np.arange(5000)})
    )
    b = spark.createDataFrame(
        pd.DataFrame({"cell": np.arange(200), "w": np.arange(200) * 10})
    )
    write_bucketed(a, "bt_a", ["cell"], 8, sort_cols=["cell"])
    write_bucketed(b, "bt_b", ["cell"], 8, sort_cols=["cell"])
    try:
        old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            ta, tb = read_table(spark, "bt_a"), read_table(spark, "bt_b")
            joined = ta.join(tb, "cell")
            plan = joined._jdf.queryExecution().executedPlan().toString()
            assert "Exchange" not in plan, plan
            got = joined.agg(F.sum(F.col("v") * F.col("w"))).collect()[0][0]
            want = (
                a.join(b, "cell").agg(F.sum(F.col("v") * F.col("w"))).collect()[0][0]
            )
            assert got == want
            # non-bucketed SMJ join of the same data DOES shuffle
            plan2 = a.join(b, "cell")._jdf.queryExecution().executedPlan().toString()
            assert "Exchange" in plan2
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    finally:
        spark.sql("DROP TABLE IF EXISTS bt_a")
        spark.sql("DROP TABLE IF EXISTS bt_b")
