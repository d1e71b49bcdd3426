"""OGR SQL semantics compatibility layer.

The reference's SQL dialect has non-standard behaviors that a plain
``spark.sql`` would get wrong; this module keeps them in a thin layer so
the idiomatic API stays clean (SURVEY.md §2.3-2.6):

- **first-match join** (ogr/ogrsf_frmts/generic/ogr_gensql.cpp:1493-1523):
  per primary row exactly ONE secondary row is fetched (driver read order
  == FID order); no match → NULLs; primary rows are never multiplied nor
  dropped, and a NULL join key skips the lookup.
- **summary queries** (no GROUP BY in OGR SQL; aggregates are whole-table,
  ogr/ogr_swq.h:322): COUNT/SUM/AVG/MIN/MAX/STDDEV + COUNT(DISTINCT).
- **DISTINCT list** (single column, first-occurrence order,
  ogr/ogr_swq.h:324,383).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def first_match_join(
    primary: DataFrame,
    secondary: DataFrame,
    on: tuple[str, str],
    secondary_fid: str,
    prefix: str = "",
) -> DataFrame:
    """OGR lookup join: left join keeping only the secondary row with the
    smallest ``secondary_fid`` per primary row.

    ``on=(primary_key, secondary_key)``. Secondary is broadcast (the
    reference requires it to fit a per-row lookup; at scale a non-broadcast
    shuffle join + the same window is produced automatically by Catalyst if
    the hint is ignored). Deterministic "first" = min FID, matching the
    reference where FID order == read order.
    """
    pk, sk = on
    sec_cols = [c for c in secondary.columns]
    sec = secondary.select(
        *[F.col(c).alias(prefix + c if prefix else c) for c in sec_cols]
    )
    skp = prefix + sk if prefix else sk
    fidp = prefix + secondary_fid if prefix else secondary_fid
    # rank secondary rows per key once (tiny side) instead of per joined row
    wsec = Window.partitionBy(skp).orderBy(F.col(fidp).asc())
    sec_first = sec.withColumn("__rn", F.row_number().over(wsec)).filter(
        F.col("__rn") == 1
    ).drop("__rn")
    return primary.join(
        F.broadcast(sec_first), on=F.col(pk) == F.col(skp), how="left"
    )


def summary_aggregates(df: DataFrame, specs: list[tuple[str, str, str]]) -> DataFrame:
    """Whole-table summary record (OGR SWQM_SUMMARY_RECORD).

    specs: list of (func, column, alias) with func in
    count/count_distinct/sum/avg/min/max/stddev_pop/stddev_samp.
    """
    fns = {
        "count": F.count,
        "count_distinct": lambda c: F.count_distinct(F.col(c)),
        "sum": F.sum,
        "avg": F.avg,
        "min": F.min,
        "max": F.max,
        "stddev_pop": F.stddev_pop,
        "stddev_samp": F.stddev_samp,
    }
    aggs = []
    for func, col, alias in specs:
        if func == "count" and col == "*":
            aggs.append(F.count(F.lit(1)).alias(alias))
        else:
            aggs.append(fns[func](col).alias(alias))
    return df.agg(*aggs)


def distinct_list(df: DataFrame, col: str, fid: str) -> DataFrame:
    """``SELECT DISTINCT col`` with OGR's ordering: first occurrence wins
    (insertion order of ``oVectorDistinctValues``, ogr/ogr_swq.h:383).

    Emitted with a ``first_fid`` order column so callers (and oracles) can
    sort deterministically.
    """
    return (
        df.groupBy(col)
        .agg(F.min(fid).alias("first_fid"))
        .orderBy("first_fid")
    )
