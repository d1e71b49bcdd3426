"""ANSI-SQL emission of the engine's deterministic math, shared by the
Spark plans and the DuckDB correctness oracle.

Two families:

- **key→point derivation**: synthetic lon/lat from an integer key via
  modular hash math (overflow-free in int64 for keys < 3.4e9) — both
  engines evaluate the identical expression, so fixtures need no stored
  geometry.
- **ray-cast containment**: given a fixed polygon's coordinates, emit the
  crossing-count expression implementing the reference's even-odd rule
  (ogr/ogrlinearring.cpp:462-531). Division-free form: on a counted
  crossing, sign((x1*y2 - x2*y1) / (y2-y1)) == sign of the product, so the
  SQL uses the multiply form (identical truth value for non-degenerate
  segments).
"""

from __future__ import annotations

import numpy as np

from gdal_spark.tiling import dlit

# key→lon/lat: coprime multipliers, exact in int64 and in Spark/DuckDB BIGINT
LON_MULT = 2654435761
LAT_MULT = 40503


def lon_sql(key_expr: str) -> str:
    return f"((((({key_expr}) * {LON_MULT}) % 360000000) / 1000000.0) - 180.0)"


def lat_sql(key_expr: str) -> str:
    return f"((((({key_expr}) * {LAT_MULT}) % 168000000) / 1000000.0) - 84.0)"


def lon_np(key) -> np.ndarray:
    k = np.asarray(key, dtype=np.int64)
    return ((k * LON_MULT) % 360000000) / 1000000.0 - 180.0


def lat_np(key) -> np.ndarray:
    k = np.asarray(key, dtype=np.int64)
    return ((k * LAT_MULT) % 168000000) / 1000000.0 - 84.0


def ray_cast_sql(px_expr: str, py_expr: str, ring) -> str:
    """Boolean SQL: point (px, py) strictly inside the closed ring.

    Per segment (pt[i-1] → pt[i]) with point-relative y's y1=ring[i].y-py,
    y2=ring[i-1].y-py: crossing iff ((y1>0 AND y2<=0) OR (y2>0 AND y1<=0))
    AND (x1*y2 - x2*y1)*(y2 - y1) > 0. Sum % 2 = 1 → inside.
    """
    ring = np.asarray(ring, dtype=np.float64)
    terms = []
    for i in range(1, len(ring)):
        x1c, y1c = ring[i]
        x2c, y2c = ring[i - 1]
        y1 = f"({dlit(y1c)} - ({py_expr}))"
        y2 = f"({dlit(y2c)} - ({py_expr}))"
        x1 = f"({dlit(x1c)} - ({px_expr}))"
        x2 = f"({dlit(x2c)} - ({px_expr}))"
        cond = f"((({y1} > 0) AND ({y2} <= 0)) OR (({y2} > 0) AND ({y1} <= 0)))"
        num = f"(({x1} * {y2}) - ({x2} * {y1}))"
        den = f"({y2} - {y1})"
        terms.append(f"(CASE WHEN {cond} AND ({num} * {den} > 0) THEN 1 ELSE 0 END)")
    return "((" + " + ".join(terms) + ") % 2 = 1)"


def polygon_contains_sql(px_expr: str, py_expr: str, rings) -> str:
    """Exterior minus holes (even-odd across rings)."""
    parts = [ray_cast_sql(px_expr, py_expr, rings[0])]
    for hole in rings[1:]:
        parts.append(f"(NOT {ray_cast_sql(px_expr, py_expr, hole)})")
    return "(" + " AND ".join(parts) + ")"
