"""Raster analysis ops: contour (marching squares), proximity, fillnodata.

- **contour** (alg/contour.cpp + alg/marching_squares/): classical
  marching squares over the pixel-center grid, linear interpolation on
  cell edges, saddle disambiguation by cell-mean (the reference's
  documented choice, marching_squares/square.h:266). Output is per-cell
  segments (level, x0, y0, x1, y1 in pixel-center coordinates); the
  reference additionally stitches them into polylines — segment sets are
  equal, stitching is representation.
  Distribution: cells are owned by the tile containing their upper-left
  pixel; a halo-1 exchange supplies the right/bottom neighbors, so every
  cell is computed exactly once — no cross-tile seams.
- **proximity** (alg/gdalproximity.cpp:94): distance to the nearest
  target pixel. Exact Euclidean per pixel against the target set; the
  target coordinates (sparse by assumption) broadcast to every block.
  maxdist clips the search. (The reference's two-pass scanline is an
  approximation of the same metric; ours is the exact form.)
- **fillnodata** (alg/rasterfill.cpp:394): nodata pixels filled by
  inverse-distance weighting of the first valid pixel hit in each of the
  8 compass directions within max_distance — the reference's
  smoothing-free contract; vectorized as 8 directional shift scans.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

from gdal_spark.raster.halo import padded_blocks
from gdal_spark.raster.model import RasterMeta, TILES_SCHEMA


# ---------------------------------------------------------------------------
# contour
# ---------------------------------------------------------------------------

def _cell_segments(z00, z10, z01, z11, level):
    """Marching squares for one cell (corners: 00=UL, 10=UR, 01=LL, 11=LR
    at pixel centers distance 1 apart). Returns list of (x0,y0,x1,y1)
    relative to the UL corner."""
    b = (z00 >= level, z10 >= level, z01 >= level, z11 >= level)
    idx = b[0] * 1 + b[1] * 2 + b[2] * 4 + b[3] * 8
    if idx in (0, 15):
        return []

    def t(a, c):
        # edges with a == c are never used by the lookup table (they
        # cannot straddle the level); avoid the div-by-zero warning
        return (level - a) / (c - a) if c != a else 0.5

    top = (t(z00, z10), 0.0)
    bottom = (t(z01, z11), 1.0)
    left = (0.0, t(z00, z01))
    right = (1.0, t(z10, z11))
    table = {
        1: [(left, top)], 2: [(top, right)], 3: [(left, right)],
        4: [(bottom, left)], 5: [(bottom, top)], 6: None, 7: [(bottom, right)],
        8: [(right, bottom)], 9: None, 10: [(top, bottom)], 11: [(left, bottom)],
        12: [(right, left)], 13: [(right, top)], 14: [(top, left)],
    }
    segs = table[idx]
    if segs is None:  # saddle: disambiguate by cell mean (square.h:266)
        mean = (z00 + z10 + z01 + z11) / 4.0
        if idx == 6:
            segs = [(top, right), (bottom, left)] if mean < level else [(top, left), (bottom, right)]
        else:  # idx == 9
            segs = [(left, top), (right, bottom)] if mean < level else [(left, bottom), (right, top)]
    return [(p[0], p[1], q[0], q[1]) for p, q in segs]


def contour_segments_np(arr: np.ndarray, levels) -> list:
    """Oracle: sorted list of (level, x0, y0, x1, y1) pixel-center coords."""
    h, w = arr.shape
    a = arr.astype(np.float64)
    out = []
    for level in levels:
        for y in range(h - 1):
            for x in range(w - 1):
                for (sx0, sy0, sx1, sy1) in _cell_segments(
                    a[y, x], a[y, x + 1], a[y + 1, x], a[y + 1, x + 1], level
                ):
                    out.append(
                        (float(level), round(x + 0.5 + sx0, 9), round(y + 0.5 + sy0, 9),
                         round(x + 0.5 + sx1, 9), round(y + 0.5 + sy1, 9))
                    )
    return sorted(out)


def contour_segments(
    tiles: DataFrame, meta: RasterMeta, levels, band: int = 1
) -> DataFrame:
    """Distributed marching squares → (level, x0, y0, x1, y1)."""
    dtype = meta.dtype
    H, W = meta.height, meta.width
    bh, bw = meta.block_h, meta.block_w
    padded = padded_blocks(tiles.filter(F.col("band") == band), meta, 1)
    lv = list(map(float, levels))

    def cells(iterator):
        for pdf in iterator:
            rows = []
            for _, r in pdf.iterrows():
                pad = np.frombuffer(r.data, dtype=dtype).reshape(r.h + 2, r.w + 2).astype(np.float64)
                bx, by = int(r.block_x), int(r.block_y)
                gx0, gy0 = bx * bw, by * bh
                # cells owned: UL pixel inside this block, and not past
                # the raster's last row/col of cells
                for level in lv:
                    for yy in range(r.h):
                        gy = gy0 + yy
                        if gy >= H - 1:
                            break
                        for xx in range(r.w):
                            gx = gx0 + xx
                            if gx >= W - 1:
                                break
                            z00 = pad[yy + 1, xx + 1]
                            z10 = pad[yy + 1, xx + 2]
                            z01 = pad[yy + 2, xx + 1]
                            z11 = pad[yy + 2, xx + 2]
                            for (sx0, sy0, sx1, sy1) in _cell_segments(z00, z10, z01, z11, level):
                                rows.append(
                                    (float(level),
                                     round(gx + 0.5 + sx0, 9), round(gy + 0.5 + sy0, 9),
                                     round(gx + 0.5 + sx1, 9), round(gy + 0.5 + sy1, 9))
                                )
            yield pd.DataFrame(rows, columns=["level", "x0", "y0", "x1", "y1"])

    return padded.mapInPandas(
        cells, "level DOUBLE, x0 DOUBLE, y0 DOUBLE, x1 DOUBLE, y1 DOUBLE"
    )


# ---------------------------------------------------------------------------
# proximity
# ---------------------------------------------------------------------------

def _target_extractor(meta: RasterMeta, tv):
    """mapInPandas body: global (tx, ty) coords of target-valued pixels."""
    dtype = meta.dtype
    bw, bh = meta.block_w, meta.block_h

    def targets(iterator):
        for pdf in iterator:
            frames = []
            for _, r in pdf.iterrows():
                arr = np.frombuffer(r.data, dtype=dtype).reshape(r.h, r.w).astype(np.float64)
                ys, xs = np.nonzero(np.isin(arr, tv))
                frames.append(
                    pd.DataFrame(
                        {
                            "tx": int(r.block_x) * bw + xs.astype(np.int64),
                            "ty": int(r.block_y) * bh + ys.astype(np.int64),
                        }
                    )
                )
            yield pd.concat(frames, ignore_index=True) if frames else pd.DataFrame(
                columns=["tx", "ty"]
            )

    return targets


def _proximity_broadcast_targets(src, meta: RasterMeta, tv, md: float) -> DataFrame:
    """Unbounded-distance (max_dist=None) path: every tile may need every
    target, so the target set is inherently global — distributing the
    assignment would replicate |targets| × |blocks| rows (ADVICE r2).
    Collect + broadcast of the target coords instead: O(|targets|)
    driver memory, documented cost. Pass an explicit ``max_dist`` to get
    the bounded, fully-distributed box-assignment path."""
    tpts = src.mapInPandas(_target_extractor(meta, tv), "tx LONG, ty LONG")
    pts = tpts.collect()
    txs = np.array([r.tx for r in pts], dtype=np.float64)
    tys = np.array([r.ty for r in pts], dtype=np.float64)
    bcast = src.sparkSession.sparkContext.broadcast((txs, tys))
    bw, bh = meta.block_w, meta.block_h
    dtype = meta.dtype

    def dist_block(iterator):
        btx, bty = bcast.value
        for pdf in iterator:
            rows = []
            for _, r in pdf.iterrows():
                h, w = int(r.h), int(r.w)
                gx = np.arange(w) + int(r.block_x) * bw
                gy = np.arange(h) + int(r.block_y) * bh
                GX, GY = np.meshgrid(gx, gy)
                if len(btx):
                    d2 = (
                        (GX.ravel()[:, None] - btx[None, :]) ** 2
                        + (GY.ravel()[:, None] - bty[None, :]) ** 2
                    )
                    d = np.sqrt(d2.min(axis=1)).reshape(h, w)
                else:
                    d = np.full((h, w), md)
                d = np.minimum(d, md)
                rows.append(
                    (int(r.band), int(r.block_y), int(r.block_x), h, w, d.tobytes())
                )
            yield pd.DataFrame(
                rows, columns=["band", "block_y", "block_x", "h", "w", "data"]
            )

    return src.mapInPandas(dist_block, TILES_SCHEMA)


def proximity(
    tiles: DataFrame,
    meta: RasterMeta,
    target_values: list,
    max_dist: float | None = None,
    band: int = 1,
) -> DataFrame:
    """Distance raster to the nearest target pixel (exact Euclidean,
    pixel units), fully distributed:

    1. target pixel coords extracted per tile (vectorized nonzero);
    2. each target is ASSIGNED to every tile whose max_dist-expanded
       bounding box can see it (column-math sequence/explode — no
       driver collect, no global broadcast of the target set);
    3. a cogrouped applyInPandas computes each tile's min distance
       against only its local target set (pixels × local targets).

    Per-tile work is bounded by target density × (tile + 2·max_dist)²
    instead of the global target count — the property that lets dense
    targets on a 100-TB raster scale. Distances past max_dist clamp to
    max_dist (GDALComputeProximity maxdist contract).

    ``max_dist=None`` (unbounded) cannot use the box assignment — it
    would replicate every target to every tile — so it takes the
    collect+broadcast path (:func:`_proximity_broadcast_targets`),
    whose driver memory cost is O(|targets|).
    """
    dtype = meta.dtype
    bw, bh = meta.block_w, meta.block_h
    tv = sorted(float(v) for v in target_values)
    src = tiles.filter(F.col("band") == band)
    if max_dist is None:
        return _proximity_broadcast_targets(
            src, meta, tv, float(np.hypot(meta.width, meta.height))
        )
    md = float(max_dist)
    tpts = src.mapInPandas(_target_extractor(meta, tv), "tx LONG, ty LONG")
    # assign each target to the tile range its max_dist box overlaps
    mdc = int(np.ceil(md))
    bx0 = F.greatest(F.lit(0), F.floor((F.col("tx") - mdc) / bw)).cast("int")
    bx1 = F.least(F.lit(meta.blocks_x - 1), F.floor((F.col("tx") + mdc) / bw)).cast("int")
    by0 = F.greatest(F.lit(0), F.floor((F.col("ty") - mdc) / bh)).cast("int")
    by1 = F.least(F.lit(meta.blocks_y - 1), F.floor((F.col("ty") + mdc) / bh)).cast("int")
    assigned = (
        tpts.withColumn("block_x", F.explode(F.sequence(bx0, bx1)))
        .withColumn("block_y", F.explode(F.sequence(by0, by1)))
        .select("block_x", "block_y", "tx", "ty")
    )

    def dist_block(key, tiles_pdf: pd.DataFrame, tgt_pdf: pd.DataFrame) -> pd.DataFrame:
        txs = tgt_pdf["tx"].to_numpy(np.float64)
        tys = tgt_pdf["ty"].to_numpy(np.float64)
        rows = []
        for _, r in tiles_pdf.iterrows():
            h, w = int(r.h), int(r.w)
            gx = np.arange(w) + int(r.block_x) * bw
            gy = np.arange(h) + int(r.block_y) * bh
            GX, GY = np.meshgrid(gx, gy)
            if len(txs):
                d2 = (
                    (GX.ravel()[:, None] - txs[None, :]) ** 2
                    + (GY.ravel()[:, None] - tys[None, :]) ** 2
                )
                d = np.sqrt(d2.min(axis=1)).reshape(h, w)
            else:
                d = np.full((h, w), md)
            d = np.minimum(d, md)
            rows.append((int(r.band), int(r.block_y), int(r.block_x), h, w, d.tobytes()))
        return pd.DataFrame(rows, columns=["band", "block_y", "block_x", "h", "w", "data"])

    return (
        src.groupBy("block_x", "block_y")
        .cogroup(assigned.groupBy("block_x", "block_y"))
        .applyInPandas(dist_block, TILES_SCHEMA)
    )


def proximity_np(arr: np.ndarray, target_values, max_dist=None) -> np.ndarray:
    tv = set(float(v) for v in target_values)
    m = np.isin(arr.astype(np.float64), list(tv))
    ys, xs = np.nonzero(m)
    h, w = arr.shape
    md = float(max_dist) if max_dist is not None else float(np.hypot(w, h))
    GX, GY = np.meshgrid(np.arange(w), np.arange(h))
    if len(xs) == 0:
        return np.full((h, w), md)
    d2 = (GX.ravel()[:, None] - xs[None, :]) ** 2 + (GY.ravel()[:, None] - ys[None, :]) ** 2
    return np.minimum(np.sqrt(d2.min(axis=1)).reshape(h, w), md)


# ---------------------------------------------------------------------------
# fillnodata
# ---------------------------------------------------------------------------

_DIRS = [(-1, 0), (1, 0), (0, -1), (0, 1), (-1, -1), (-1, 1), (1, -1), (1, 1)]


def fillnodata_np(arr: np.ndarray, nodata: float, max_distance: int) -> np.ndarray:
    """8-direction first-hit IDW fill (pixel units, weight 1/d)."""
    a = arr.astype(np.float64)
    invalid = a == nodata
    num = np.zeros_like(a)
    den = np.zeros_like(a)
    h, w = a.shape
    for dy, dx in _DIRS:
        step = np.hypot(dy, dx)
        hit_val = np.full((h, w), np.nan)
        hit_d = np.full((h, w), np.inf)
        for k in range(1, max_distance + 1):
            sy = k * dy
            sx = k * dx
            shifted = np.full((h, w), np.nan)
            ys0, ys1 = max(0, -sy), min(h, h - sy)
            xs0, xs1 = max(0, -sx), min(w, w - sx)
            shifted[ys0:ys1, xs0:xs1] = a[ys0 + sy : ys1 + sy, xs0 + sx : xs1 + sx]
            valid_sh = ~np.isnan(shifted) & (shifted != nodata)
            take = np.isinf(hit_d) & valid_sh
            hit_val[take] = shifted[take]
            hit_d[take] = k * step
            if k * step > max_distance:
                break
        use = invalid & np.isfinite(hit_d) & (hit_d <= max_distance)
        wgt = np.zeros((h, w))
        wgt[use] = 1.0 / hit_d[use]
        num[use] += hit_val[use] * wgt[use]
        den[use] += wgt[use]
    out = a.copy()
    fill = invalid & (den > 0)
    out[fill] = num[fill] / den[fill]
    return out


def fillnodata(
    tiles: DataFrame, meta: RasterMeta, nodata: float, max_distance: int, band: int = 1
) -> DataFrame:
    """Distributed fill: halo = max_distance so every directional scan
    sees the same neighborhood the full-array oracle sees."""
    dtype = meta.dtype
    padded = padded_blocks(tiles.filter(F.col("band") == band), meta, max_distance)

    def fill(iterator):
        for pdf in iterator:
            rows = []
            for _, r in pdf.iterrows():
                md = int(r.halo)
                pad = np.frombuffer(r.data, dtype=dtype).reshape(
                    r.h + 2 * md, r.w + 2 * md
                ).astype(np.float64)
                # halo replicates edges OUTSIDE the raster; the full-array
                # scan sees nothing there — mask those cells to nodata so
                # block and oracle agree at raster borders
                y0 = int(r.block_y) * meta.block_h - md
                x0 = int(r.block_x) * meta.block_w - md
                gys = np.arange(pad.shape[0]) + y0
                gxs = np.arange(pad.shape[1]) + x0
                outside = (
                    ((gys < 0) | (gys >= meta.height))[:, None]
                    | ((gxs < 0) | (gxs >= meta.width))[None, :]
                )
                pad[outside] = nodata
                out = fillnodata_np(pad, nodata, md)[md:-md, md:-md]
                rows.append((int(r.band), int(r.block_y), int(r.block_x),
                             int(r.h), int(r.w), out.tobytes()))
            yield pd.DataFrame(rows, columns=["band", "block_y", "block_x", "h", "w", "data"])

    return padded.mapInPandas(fill, TILES_SCHEMA)


# ---------------------------------------------------------------------------
# contour stitching + interval mode (alg/contour.cpp:331,568)
# ---------------------------------------------------------------------------

def interval_levels(zmin: float, zmax: float, interval: float, base: float = 0.0):
    """The reference's fixed-interval level set: every base + k*interval
    strictly inside (zmin, zmax] (contour.cpp IntervalLevelRangeIterator)."""
    import math

    k0 = int(math.ceil((zmin - base) / interval))
    if base + k0 * interval <= zmin:
        k0 += 1
    out = []
    k = k0
    while base + k * interval <= zmax:
        out.append(base + k * interval)
        k += 1
    return out


def _stitch_segments(segs):
    """Join marching-squares segments into polylines. Endpoints are exact
    (both adjacent cells interpolate from the same pixel values, rounded
    identically), so matching is dict-based. Returns list of vertex lists;
    open chains start/end at degree-1 nodes; closed rings are rotated to
    their lexicographically smallest vertex. Deterministic."""
    from collections import defaultdict

    adj = defaultdict(list)
    for (x0, y0, x1, y1) in segs:
        adj[(x0, y0)].append((x1, y1))
        adj[(x1, y1)].append((x0, y0))
    used = set()

    def seg_key(a, b):
        return (a, b) if a <= b else (b, a)

    lines = []
    # open chains first: start at odd-degree nodes, smallest first
    starts = sorted(p for p, nb in adj.items() if len(nb) % 2 == 1)
    for s in starts:
        while True:
            nxt = [q for q in adj[s] if seg_key(s, q) not in used]
            if not nxt:
                break
            line = [s]
            cur, prev = s, None
            while True:
                cand = sorted(q for q in adj[cur] if seg_key(cur, q) not in used)
                if not cand:
                    break
                q = cand[0]
                used.add(seg_key(cur, q))
                line.append(q)
                prev, cur = cur, q
                if len(adj[cur]) % 2 == 1 and cur != s:
                    break
            lines.append(line)
    # closed loops from the remainder
    remaining = sorted(
        p for p, nb in adj.items()
        if any(seg_key(p, q) not in used for q in nb)
    )
    for s in remaining:
        cand = [q for q in adj[s] if seg_key(s, q) not in used]
        if not cand:
            continue
        line = [s]
        cur = s
        while True:
            nxts = sorted(q for q in adj[cur] if seg_key(cur, q) not in used)
            if not nxts:
                break
            q = nxts[0]
            used.add(seg_key(cur, q))
            line.append(q)
            cur = q
            if cur == s:
                break
        # rotate closed ring to smallest vertex
        if line[0] == line[-1] and len(line) > 2:
            body = line[:-1]
            k = min(range(len(body)), key=lambda i: body[i])
            body = body[k:] + body[:k]
            line = body + [body[0]]
        lines.append(line)
    return lines


def contour_lines(
    tiles: DataFrame,
    meta: RasterMeta,
    levels=None,
    interval: float | None = None,
    base: float = 0.0,
    band: int = 1,
) -> DataFrame:
    """Stitched contour polylines: (level, line_id, wkt). ``interval``
    derives the level set from the distributed min/max (fixed-interval
    mode, contour.cpp:568); explicit ``levels`` match the reference's
    FIXED_LEVELS. Stitching runs per level in applyInPandas (the
    reference is single-node for the whole raster; per-level grouping is
    the distributed compromise — segments per level must fit a worker)."""
    dtype = meta.dtype

    if levels is None:
        if interval is None:
            raise ValueError("need levels or interval")

        def mm(iterator):
            for pdf in iterator:
                rows = []
                for _, r in pdf.iterrows():
                    arr = np.frombuffer(r.data, dtype=dtype).reshape(r.h, r.w)
                    rows.append((float(arr.min()), float(arr.max())))
                yield pd.DataFrame(rows, columns=["mn", "mx"])

        agg = (
            tiles.filter(F.col("band") == band)
            .mapInPandas(mm, "mn DOUBLE, mx DOUBLE")
            .agg(F.min("mn").alias("mn"), F.max("mx").alias("mx"))
            .collect()[0]
        )
        levels = interval_levels(agg.mn, agg.mx, interval, base)
        if not levels:
            empty = tiles.sparkSession.createDataFrame(
                [], "level DOUBLE, line_id INT, wkt STRING"
            )
            return empty

    segs = contour_segments(tiles, meta, levels, band)

    def stitch(key, pdf: pd.DataFrame) -> pd.DataFrame:
        level = float(key[0])
        seg_list = list(
            zip(pdf["x0"], pdf["y0"], pdf["x1"], pdf["y1"])
        )
        lines = _stitch_segments(seg_list)
        rows = []
        for i, line in enumerate(
            sorted(lines, key=lambda l: (l[0], l[-1], len(l)))
        ):
            pts = ", ".join(f"{x:.9g} {y:.9g}" for x, y in line)
            rows.append((level, i, f"LINESTRING ({pts})"))
        return pd.DataFrame(rows, columns=["level", "line_id", "wkt"])

    return segs.groupBy("level").applyInPandas(
        stitch, "level DOUBLE, line_id INT, wkt STRING"
    )


def contour_lines_np(arr: np.ndarray, levels) -> list:
    """Single-node oracle with the identical stitch + canonical order."""
    out = []
    for level in levels:
        segs = [
            (x0, y0, x1, y1)
            for (lv, x0, y0, x1, y1) in contour_segments_np(arr, [level])
        ]
        lines = _stitch_segments(segs)
        for i, line in enumerate(sorted(lines, key=lambda l: (l[0], l[-1], len(l)))):
            pts = ", ".join(f"{x:.9g} {y:.9g}" for x, y in line)
            out.append((float(level), i, f"LINESTRING ({pts})"))
    return out
