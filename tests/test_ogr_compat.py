"""OGR SQL semantics layer vs reference goldens (ogr_sql_test.py)."""
import pandas as pd
import pytest
from pyspark.sql import functions as F

from fixtures_poly import POLY_ATTRS
from gdal_spark.operators.ogr_compat import (
    distinct_list,
    first_match_join,
    summary_aggregates,
)


@pytest.fixture(scope="module")
def poly_df(spark):
    pdf = pd.DataFrame(
        {
            "fid": range(len(POLY_ATTRS)),
            "area": [a[0] for a in POLY_ATTRS],
            "eas_id": [a[1] for a in POLY_ATTRS],
            "prfedea": [a[2] for a in POLY_ATTRS],
        }
    )
    return spark.createDataFrame(pdf)


def test_distinct_first_occurrence_golden(spark, poly_df):
    """ogr_sql_test.py:196-204: select distinct eas_id where eas_id < 170
    → [168, 169, 166, 158, 165] in first-occurrence order."""
    got = distinct_list(poly_df.filter("eas_id < 170"), "eas_id", "fid")
    assert [r.eas_id for r in got.collect()] == [168, 169, 166, 158, 165]


def test_distinct_order_by_golden(spark, poly_df):
    """ogr_sql_test.py:211-219: ... order by eas_id → sorted."""
    got = (
        distinct_list(poly_df.filter("eas_id < 170"), "eas_id", "fid")
        .orderBy("eas_id")
    )
    assert [r.eas_id for r in got.collect()] == [158, 165, 166, 168, 169]
    got_desc = (
        distinct_list(poly_df.filter("eas_id < 170"), "eas_id", "fid")
        .orderBy(F.col("eas_id").desc())
    )
    assert [r.eas_id for r in got_desc.collect()] == [169, 168, 166, 165, 158]


def test_summary_aggregates(spark, poly_df):
    row = summary_aggregates(
        poly_df,
        [
            ("count", "*", "cnt"),
            ("count_distinct", "eas_id", "cd"),
            ("min", "eas_id", "mn"),
            ("max", "eas_id", "mx"),
            ("sum", "eas_id", "sm"),
            ("avg", "eas_id", "av"),
        ],
    ).collect()[0]
    eas = [a[1] for a in POLY_ATTRS]
    assert row.cnt == 10 and row.cd == 10
    assert row.mn == min(eas) and row.mx == max(eas)
    assert row.sm == sum(eas)
    assert abs(row.av - sum(eas) / 10) < 1e-9


def test_first_match_join_semantics(spark):
    """ogr_gensql.cpp:1493-1523: one secondary row per primary (min FID),
    no row multiplication, no row drops, NULL key → NULL fields."""
    prim = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, None), (4, "d")], "pid INT, k STRING"
    )
    sec = spark.createDataFrame(
        [(10, "a", "first"), (11, "a", "second"), (12, "b", "only"), (13, "x", "z")],
        "sfid INT, sk STRING, val STRING",
    )
    got = (
        first_match_join(prim, sec, on=("k", "sk"), secondary_fid="sfid")
        .orderBy("pid")
        .collect()
    )
    assert len(got) == 4  # never multiplied, never dropped
    assert got[0].val == "first"  # min sfid wins among duplicates
    assert got[1].val == "only"
    assert got[2].val is None  # NULL key → no lookup
    assert got[3].val is None  # no match → NULLs
