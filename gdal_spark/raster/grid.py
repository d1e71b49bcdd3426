"""Scattered-point gridding (``gdal_grid``; alg/gdalgrid.cpp) —
distributed interpolation of an irregular point cloud onto a raster grid.

Implemented algorithms (GDALGridAlgorithm, alg/gdal_alg.h:402-416):

- ``invdist`` — inverse distance to a power with smoothing
  (GDALGridInverseDistanceToAPower, gdalgrid.cpp:135+): w = 1/r^power
  over points with r ≤ radius (r² smoothed by +smoothing²); exact-hit
  short circuit (r²smoothed < 1e-13 → z); < min_points → nodata
- ``invdistnn`` — same + nearest-``max_points`` cap sorted by distance
  (gdalgrid.cpp:241-330)
- ``nearest``    — closest point's z (gdalgrid.cpp:853)
- ``average``    — mean of z within radius (min_points honored)
- ``count`` / ``min`` / ``max`` / ``range`` — data-metric variants

Distribution: grid nodes live in raster blocks; each point is assigned
to every block whose node set it can influence (envelope + radius →
block-range explode, pure column math), so the shuffle moves each point
O((2r/block_span)²) times and each block interpolates its nodes against
only its gathered neighborhood — the distributed analogue of the
reference's per-node quadtree radius search (port/cpl_quad_tree.cpp).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

from gdal_spark.raster.model import RasterMeta, TILES_SCHEMA


def _node_coords(meta: RasterMeta, bx: int, by: int, h: int, w: int):
    """Grid node georeferenced coords (pixel centers)."""
    px = np.arange(w) + bx * meta.block_w + 0.5
    py = np.arange(h) + by * meta.block_h + 0.5
    PX, PY = np.meshgrid(px, py)
    gx, gy = meta.px_to_geo(PX.ravel(), PY.ravel())
    return gx, gy


def _interp_block(
    gx, gy, px, py, pz, alg: str, radius: float, power: float,
    smoothing: float, min_points: int, max_points: int, nodata: float,
):
    n_nodes = len(gx)
    out = np.full(n_nodes, nodata, dtype=np.float64)
    if len(px) == 0:
        return out
    # canonical point order: the distributed path receives points in
    # shuffle order — sorting makes every float reduction bit-identical
    # to the single-node oracle regardless of arrival order
    order = np.lexsort((pz, py, px))
    px, py, pz = px[order], py[order], pz[order]
    r2max = radius * radius
    s2 = smoothing * smoothing
    for i in range(n_nodes):
        dx = px - gx[i]
        dy = py - gy[i]
        d2 = dx * dx + dy * dy
        m = d2 <= r2max
        if alg == "nearest":
            if m.any():
                out[i] = pz[np.argmin(np.where(m, d2, np.inf))]
            continue
        k = int(m.sum())
        if alg == "count":
            out[i] = float(k)
            continue
        if k < max(min_points, 1):
            continue
        zs = pz[m]
        if alg == "average":
            out[i] = zs.mean()
        elif alg == "min":
            out[i] = zs.min()
        elif alg == "max":
            out[i] = zs.max()
        elif alg == "range":
            out[i] = zs.max() - zs.min()
        elif alg == "avgdist":
            # GGA_MetricAverageDistance: mean node→point distance
            out[i] = np.sqrt(d2[m]).mean()
        elif alg == "avgdistpts":
            # GGA_MetricAverageDistancePts: mean pairwise distance among
            # the points found in the radius (gdal_alg.h:402-416)
            if k < 2:
                out[i] = 0.0 if k < 2 and min_points <= k else nodata
                continue
            qx = px[m]
            qy = py[m]
            ddx = qx[:, None] - qx[None, :]
            ddy = qy[:, None] - qy[None, :]
            dd = np.sqrt(ddx * ddx + ddy * ddy)
            iu = np.triu_indices(k, 1)
            out[i] = dd[iu].mean()
        elif alg in ("invdist", "invdistnn"):
            rs2 = d2[m] + s2
            hit = rs2 < 1e-13
            if hit.any():
                out[i] = zs[np.argmax(hit)]
                continue
            if alg == "invdistnn" and max_points > 0 and k > max_points:
                order = np.argsort(rs2, kind="stable")[:max_points]
                rs2 = rs2[order]
                zs = zs[order]
            wgt = 1.0 / np.power(rs2, power / 2.0)
            out[i] = (wgt * zs).sum() / wgt.sum()
        else:
            raise ValueError(f"unknown grid alg {alg!r}")
    return out


def grid_points(
    points: DataFrame,
    meta: RasterMeta,
    alg: str = "invdist",
    radius: float = 1.0,
    power: float = 2.0,
    smoothing: float = 0.0,
    min_points: int = 0,
    max_points: int = 0,
    nodata: float = 0.0,
    x_col: str = "x",
    y_col: str = "y",
    z_col: str = "z",
    band: int = 1,
) -> DataFrame:
    """Interpolate (x, y, z) points onto the meta grid → float64 tiles."""
    spark = points.sparkSession
    g = meta.gt
    # block span in geo units (axis-aligned geotransforms)
    span_x = abs(g[1]) * meta.block_w
    span_y = abs(g[5]) * meta.block_h
    pad_bx = int(np.ceil(radius / span_x)) + 1
    pad_by = int(np.ceil(radius / span_y)) + 1

    pts = points.select(
        F.col(x_col).alias("x"), F.col(y_col).alias("y"), F.col(z_col).alias("z")
    )
    # point → home block via geo_to_px column math
    det = g[1] * g[5] - g[2] * g[4]
    px = ((F.col("x") - g[0]) * g[5] - (F.col("y") - g[3]) * g[2]) / det
    py = ((F.col("y") - g[3]) * g[1] - (F.col("x") - g[0]) * g[4]) / det
    pts = pts.withColumn("__pbx", F.floor(px / meta.block_w).cast("int")).withColumn(
        "__pby", F.floor(py / meta.block_h).cast("int")
    )
    offs = spark.createDataFrame(
        [(dx, dy) for dx in range(-pad_bx, pad_bx + 1) for dy in range(-pad_by, pad_by + 1)],
        "dx INT, dy INT",
    )
    spread = (
        pts.crossJoin(F.broadcast(offs))
        .select(
            (F.col("__pbx") + F.col("dx")).alias("block_x"),
            (F.col("__pby") + F.col("dy")).alias("block_y"),
            "x", "y", "z",
        )
        .filter(
            (F.col("block_x") >= 0) & (F.col("block_x") < meta.blocks_x)
            & (F.col("block_y") >= 0) & (F.col("block_y") < meta.blocks_y)
        )
    )
    all_blocks = spark.createDataFrame(
        [(x, y) for y in range(meta.blocks_y) for x in range(meta.blocks_x)],
        "block_x INT, block_y INT",
    )
    joined = all_blocks.join(spread, ["block_x", "block_y"], "left")

    def interp(key, pdf: pd.DataFrame) -> pd.DataFrame:
        bx, by = int(key[0]), int(key[1])
        h, w = meta.block_shape(bx, by)
        gx, gy = _node_coords(meta, bx, by, h, w)
        m = pdf["x"].notna()
        out = _interp_block(
            gx, gy,
            pdf.loc[m, "x"].to_numpy(np.float64),
            pdf.loc[m, "y"].to_numpy(np.float64),
            pdf.loc[m, "z"].to_numpy(np.float64),
            alg, radius, power, smoothing, min_points, max_points, nodata,
        )
        return pd.DataFrame(
            [(band, by, bx, h, w, out.reshape(h, w).tobytes())],
            columns=["band", "block_y", "block_x", "h", "w", "data"],
        )

    return joined.groupBy("block_x", "block_y").applyInPandas(interp, TILES_SCHEMA)


def grid_points_np(
    px, py, pz, meta: RasterMeta, alg="invdist", radius=1.0, power=2.0,
    smoothing=0.0, min_points=0, max_points=0, nodata=0.0,
) -> np.ndarray:
    """Single-node oracle with the identical per-node math."""
    h, w = meta.height, meta.width
    PX, PY = np.meshgrid(np.arange(w) + 0.5, np.arange(h) + 0.5)
    gx, gy = meta.px_to_geo(PX.ravel(), PY.ravel())
    out = _interp_block(
        gx, gy,
        np.asarray(px, np.float64), np.asarray(py, np.float64), np.asarray(pz, np.float64),
        alg, radius, power, smoothing, min_points, max_points, nodata,
    )
    return out.reshape(h, w)


# ---------------------------------------------------------------------------
# linear (Delaunay TIN) — GGA_Linear, alg/gdalgrid.cpp GDALGridLinear
# ---------------------------------------------------------------------------

def delaunay_triangulate(px: np.ndarray, py: np.ndarray) -> np.ndarray:
    """Bowyer–Watson Delaunay triangulation → (n_tri, 3) point indices.

    Plain-NumPy implementation of the public algorithm (Bowyer 1981,
    Watson 1981). O(n²) worst case — the triangulation runs ONCE
    (driver-side, then broadcast), mirroring the reference's in-memory
    QHull/triangulation step (alg/delaunay.c); only the barycentric
    interpolation is distributed.
    """
    n = len(px)
    if n < 3:
        return np.zeros((0, 3), dtype=np.int64)
    minx, maxx = float(px.min()), float(px.max())
    miny, maxy = float(py.min()), float(py.max())
    d = max(maxx - minx, maxy - miny, 1.0) * 10.0
    cx, cy = (minx + maxx) / 2.0, (miny + maxy) / 2.0
    P = np.vstack(
        [
            np.column_stack([px, py]),
            [[cx - 2 * d, cy - d], [cx + 2 * d, cy - d], [cx, cy + 2 * d]],
        ]
    )
    tris = [(n, n + 1, n + 2)]

    def circum_contains(tri, p):
        a, b, c = P[tri[0]], P[tri[1]], P[tri[2]]
        ax, ay = a - p
        bx, by = b - p
        cx_, cy_ = c - p
        det = (
            (ax * ax + ay * ay) * (bx * cy_ - cx_ * by)
            - (bx * bx + by * by) * (ax * cy_ - cx_ * ay)
            + (cx_ * cx_ + cy_ * cy_) * (ax * by - bx * ay)
        )
        # orientation of tri
        o = (b[0] - a[0]) * (c[1] - a[1]) - (b[1] - a[1]) * (c[0] - a[0])
        return det > 0 if o > 0 else det < 0

    for i in range(n):
        p = P[i]
        bad = [t for t in tris if circum_contains(t, p)]
        if not bad:
            # numerically on the hull boundary — attach to nearest edge
            continue
        edges = {}
        for t in bad:
            for e in ((t[0], t[1]), (t[1], t[2]), (t[2], t[0])):
                k = (min(e), max(e))
                edges[k] = edges.get(k, 0) + 1
        boundary = [e for e, cnt in edges.items() if cnt == 1]
        tris = [t for t in tris if t not in bad]
        for (u, v) in boundary:
            tris.append((u, v, i))
    out = [
        t for t in tris if t[0] < n and t[1] < n and t[2] < n
    ]
    return np.asarray(out, dtype=np.int64) if out else np.zeros((0, 3), np.int64)


def _linear_interp_nodes(gx, gy, px, py, pz, tris, radius, nodata):
    """Barycentric interpolation of nodes against a broadcast TIN;
    outside-hull nodes fall back to nearest-within-radius (GDALGridLinear
    dfRadius contract: <0 → unlimited, 0 → nodata)."""
    out = np.full(len(gx), nodata, dtype=np.float64)
    done = np.zeros(len(gx), dtype=bool)
    eps = 1e-12
    for (i0, i1, i2) in tris:
        x1, y1 = px[i0], py[i0]
        x2, y2 = px[i1], py[i1]
        x3, y3 = px[i2], py[i2]
        det = (y2 - y3) * (x1 - x3) + (x3 - x2) * (y1 - y3)
        if det == 0:
            continue
        todo = ~done
        if not todo.any():
            break
        l1 = ((y2 - y3) * (gx[todo] - x3) + (x3 - x2) * (gy[todo] - y3)) / det
        l2 = ((y3 - y1) * (gx[todo] - x3) + (x1 - x3) * (gy[todo] - y3)) / det
        l3 = 1.0 - l1 - l2
        inside = (l1 >= -eps) & (l2 >= -eps) & (l3 >= -eps)
        idx = np.flatnonzero(todo)[inside]
        out[idx] = (
            l1[inside] * pz[i0] + l2[inside] * pz[i1] + l3[inside] * pz[i2]
        )
        done[idx] = True
    if radius != 0:
        rest = np.flatnonzero(~done)
        if len(rest) and len(px):
            r2max = np.inf if radius < 0 else radius * radius
            for i in rest:
                d2 = (px - gx[i]) ** 2 + (py - gy[i]) ** 2
                j = int(np.argmin(d2))
                if d2[j] <= r2max:
                    out[i] = pz[j]
    return out


def grid_linear(
    points: DataFrame,
    meta: RasterMeta,
    radius: float = -1.0,
    nodata: float = 0.0,
    x_col: str = "x",
    y_col: str = "y",
    z_col: str = "z",
    band: int = 1,
) -> DataFrame:
    """GGA_Linear: Delaunay-TIN interpolation. The triangulation is
    computed once from the full point cloud (driver + broadcast — the
    same memory contract as the reference, which triangulates in-process;
    a cloud too big for one node needs tiled pre-aggregation first), and
    every raster block interpolates its nodes independently."""
    pdf = points.select(
        F.col(x_col).alias("x"), F.col(y_col).alias("y"), F.col(z_col).alias("z")
    ).toPandas()
    px = pdf["x"].to_numpy(np.float64)
    py = pdf["y"].to_numpy(np.float64)
    pz = pdf["z"].to_numpy(np.float64)
    tris = delaunay_triangulate(px, py)
    spark = points.sparkSession
    bc = spark.sparkContext.broadcast((px, py, pz, tris))
    all_blocks = spark.createDataFrame(
        [(x, y) for y in range(meta.blocks_y) for x in range(meta.blocks_x)],
        "block_x INT, block_y INT",
    )

    def interp(iterator):
        bpx, bpy, bpz, btris = bc.value
        for pdf_ in iterator:
            rows = []
            for _, r in pdf_.iterrows():
                bx, by = int(r.block_x), int(r.block_y)
                h, w = meta.block_shape(bx, by)
                gx, gy = _node_coords(meta, bx, by, h, w)
                out = _linear_interp_nodes(gx, gy, bpx, bpy, bpz, btris, radius, nodata)
                rows.append((band, by, bx, h, w, out.reshape(h, w).tobytes()))
            yield pd.DataFrame(
                rows, columns=["band", "block_y", "block_x", "h", "w", "data"]
            )

    return all_blocks.mapInPandas(interp, TILES_SCHEMA)


def grid_linear_np(
    px, py, pz, meta: RasterMeta, radius: float = -1.0, nodata: float = 0.0
) -> np.ndarray:
    """Single-node oracle with the identical triangulation + math."""
    px = np.asarray(px, np.float64)
    py = np.asarray(py, np.float64)
    pz = np.asarray(pz, np.float64)
    tris = delaunay_triangulate(px, py)
    h, w = meta.height, meta.width
    PX, PY = np.meshgrid(np.arange(w) + 0.5, np.arange(h) + 0.5)
    gx, gy = meta.px_to_geo(PX.ravel(), PY.ravel())
    return _linear_interp_nodes(gx, gy, px, py, pz, tris, radius, nodata).reshape(h, w)
