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
  8 compass directions within max_distance, vectorized as 8 directional
  shift scans; -si smoothing iterations (GDALMultiFilter float32 3×3
  passes over filled pixels, alg/rasterfill.cpp:126,358) fold into the
  same padded-block pass at halo depth max_distance + iterations.
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


def fill_smooth_np(
    filled: np.ndarray, t_mask: np.ndarray, f_mask: np.ndarray, iterations: int,
) -> np.ndarray:
    """GDALMultiFilter (alg/rasterfill.cpp:126-383) — the ``-si`` 3×3
    average passes applied AFTER interpolation: only filled pixels
    (``f_mask``) are smoothed; only valid-after-fill pixels (``t_mask``)
    contribute; both masks are FIXED across iterations. Each pass sums
    the 3×3 TMask'd neighbors in double in the reference's fixed order
    (last line x−1,x,x+1; this; next) and casts the quotient to float32
    (the reference's rolling buffers are float — every pixel passes
    through float32 when smoothing runs, even unfiltered ones)."""
    a = filled.astype(np.float32)
    t = t_mask.astype(bool)
    fm = f_mask.astype(bool)
    h, w = a.shape
    for _ in range(int(iterations)):
        num = np.zeros((h, w), dtype=np.float64)
        den = np.zeros((h, w), dtype=np.float64)
        # accumulation order matches GDALFilterLine exactly
        for dy in (-1, 0, 1):
            for dx in (-1, 0, 1):
                val = np.zeros((h, w), dtype=np.float64)
                ok = np.zeros((h, w), dtype=bool)
                ys0, ys1 = max(0, -dy), min(h, h - dy)
                xs0, xs1 = max(0, -dx), min(w, w - dx)
                val[ys0:ys1, xs0:xs1] = a[ys0 + dy : ys1 + dy, xs0 + dx : xs1 + dx]
                ok[ys0:ys1, xs0:xs1] = t[ys0 + dy : ys1 + dy, xs0 + dx : xs1 + dx]
                num += np.where(ok, val, 0.0)
                den += ok
        sm = np.divide(num, den, out=np.zeros_like(num), where=den > 0)
        a = np.where(fm, sm.astype(np.float32), a)
    return a.astype(filled.dtype)


def fillnodata_smooth_np(
    arr: np.ndarray, nodata: float, max_distance: int, smoothing_iterations: int = 0,
) -> np.ndarray:
    """fillnodata_np + the -si smoothing passes (single-node oracle)."""
    filled = fillnodata_np(arr, nodata, max_distance)
    if smoothing_iterations <= 0:
        return filled
    invalid = arr.astype(np.float64) == nodata
    t_mask = filled != nodata
    f_mask = invalid & t_mask
    return fill_smooth_np(filled, t_mask, f_mask, smoothing_iterations)


def fillnodata(
    tiles: DataFrame, meta: RasterMeta, nodata: float, max_distance: int,
    band: int = 1, smoothing_iterations: int = 0,
) -> DataFrame:
    """Distributed fill: halo = max_distance (+ smoothing_iterations when
    -si is on) so every directional scan AND every 3×3 smoothing pass
    sees the same neighborhood the full-array oracle sees — the fill is
    exact within ``smoothing_iterations`` px of each block, which is all
    the N halo rounds of the stencil can reach."""
    dtype = meta.dtype
    si = int(smoothing_iterations)
    md_fill = int(max_distance)
    padded = padded_blocks(
        tiles.filter(F.col("band") == band), meta, md_fill + si
    )

    def fill(iterator):
        for pdf in iterator:
            rows = []
            for _, r in pdf.iterrows():
                halo = int(r.halo)
                pad = np.frombuffer(r.data, dtype=dtype).reshape(
                    r.h + 2 * halo, r.w + 2 * halo
                ).astype(np.float64)
                # halo replicates edges OUTSIDE the raster; the full-array
                # scan sees nothing there — mask those cells to nodata so
                # block and oracle agree at raster borders
                y0 = int(r.block_y) * meta.block_h - halo
                x0 = int(r.block_x) * meta.block_w - halo
                gys = np.arange(pad.shape[0]) + y0
                gxs = np.arange(pad.shape[1]) + x0
                outside = (
                    ((gys < 0) | (gys >= meta.height))[:, None]
                    | ((gxs < 0) | (gxs >= meta.width))[None, :]
                )
                pad[outside] = nodata
                filled = fillnodata_np(pad, nodata, md_fill)
                if si > 0:
                    # the fill writes into outside-raster pad cells too;
                    # those cells don't exist in the full-array oracle, so
                    # they must not become smoothing contributors
                    filled[outside] = nodata
                    t_mask = filled != nodata
                    f_mask = (pad == nodata) & t_mask
                    filled = fill_smooth_np(filled, t_mask, f_mask, si)
                out = filled[halo:-halo, halo:-halo]
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


def _canon_ring(line):
    """Rotate a closed vertex list to its smallest vertex and orient it
    toward the smaller of that vertex's two neighbors — the UNIQUE
    canonical form of a cycle, independent of discovery order."""
    body = line[:-1]
    k = min(range(len(body)), key=lambda i: body[i])
    body = body[k:] + body[:k]
    if len(body) > 2 and body[-1] < body[1]:
        body = [body[0]] + body[1:][::-1]
    return body + [body[0]]


def _canon_open(line):
    """Canonical form of an open chain: start at the smaller endpoint;
    equal endpoints (a loop anchored at one junction) pick the
    lexicographically smaller traversal."""
    if line[0] > line[-1]:
        return line[::-1]
    if line[0] == line[-1] and len(line) > 2:
        return _canon_ring(line)
    return line


def _stitch_segments(segs, break_nodes=None):
    """Join marching-squares segments into polylines. Endpoints are exact
    (both adjacent cells interpolate from the same pixel values, rounded
    identically), so matching is dict-based.

    Decomposition is the UNIQUE maximal-chain one: chains break exactly
    at vertices of degree != 2 (plus any caller-supplied
    ``break_nodes``); leftover pure cycles become canonical rings. Being
    choice-free, the decomposition is confluent — stitching per spatial
    chunk and then merging open chains at chunk borders reproduces the
    single-pass result exactly (the property contour_lines' distributed
    path relies on). Deterministic."""
    from collections import defaultdict

    adj = defaultdict(list)
    for (x0, y0, x1, y1) in segs:
        adj[(x0, y0)].append((x1, y1))
        adj[(x1, y1)].append((x0, y0))
    used = set()

    def seg_key(a, b):
        return (a, b) if a <= b else (b, a)

    breaks = {p for p, nb in adj.items() if len(nb) != 2}
    if break_nodes:
        breaks |= set(break_nodes) & set(adj.keys())

    lines = []
    for s in sorted(breaks):
        for q0 in sorted(adj[s]):
            if seg_key(s, q0) in used:
                continue
            line = [s, q0]
            used.add(seg_key(s, q0))
            cur = q0
            while cur not in breaks:
                nxts = [w for w in adj[cur] if seg_key(cur, w) not in used]
                if not nxts:
                    break
                w = sorted(nxts)[0]
                used.add(seg_key(cur, w))
                line.append(w)
                cur = w
            lines.append(_canon_open(line))
    # pure cycles: every remaining vertex has degree 2 and no break
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
        if line[0] == line[-1] and len(line) > 2:
            line = _canon_ring(line)
        lines.append(line)
    return lines


def contour_lines(
    tiles: DataFrame,
    meta: RasterMeta,
    levels=None,
    interval: float | None = None,
    base: float = 0.0,
    band: int = 1,
    chunk_px: int | None = None,
) -> DataFrame:
    """Stitched contour polylines: (level, line_id, wkt). ``interval``
    derives the level set from the distributed min/max (fixed-interval
    mode, contour.cpp:568); explicit ``levels`` match the reference's
    FIXED_LEVELS.

    Stitching is CHUNKED (r2 VERDICT wrong-4 fix): segments stitch per
    (level, spatial chunk of ``chunk_px`` pixels) in parallel; only the
    open chains that reach a chunk border are re-stitched in a per-level
    merge pass, so the single-task state is O(boundary crossings), not
    O(all segments of the level). Exactness: the decomposition breaks at
    GLOBAL degree!=2 vertices (computed by a distributed groupBy and
    joined back), and _stitch_segments' maximal-chain decomposition is
    choice-free, so chunked + merge output is vertex-identical to the
    single-pass oracle (contour_lines_np)."""
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
    if chunk_px is None:
        chunk_px = max(meta.block_w, meta.block_h) * 4
    span = float(chunk_px)

    # global break nodes: vertices whose degree != 2 (chain ends at the
    # raster border, junctions at level-degenerate saddles). Bounded by
    # the raster PERIMETER, not its area — broadcastable.
    pts = segs.select("level", F.col("x0").alias("x"), F.col("y0").alias("y")).unionAll(
        segs.select("level", F.col("x1").alias("x"), F.col("y1").alias("y"))
    )
    brk = (
        pts.groupBy("level", "x", "y")
        .agg(F.count(F.lit(1)).alias("deg"))
        .filter(F.col("deg") != 2)
        .select("level", "x", "y")
    )
    tagged = (
        segs.withColumn("cx", F.floor(F.least("x0", "x1") / F.lit(span)).cast("int"))
        .withColumn("cy", F.floor(F.least("y0", "y1") / F.lit(span)).cast("int"))
        .join(
            F.broadcast(brk.select("level", F.col("x").alias("x0"), F.col("y").alias("y0"), F.lit(True).alias("b0"))),
            ["level", "x0", "y0"], "left",
        )
        .join(
            F.broadcast(brk.select("level", F.col("x").alias("x1"), F.col("y").alias("y1"), F.lit(True).alias("b1"))),
            ["level", "x1", "y1"], "left",
        )
    )

    chain_schema = (
        "level DOUBLE, done BOOLEAN, fx DOUBLE, fy DOUBLE, lx DOUBLE, ly DOUBLE, "
        "fb BOOLEAN, lb BOOLEAN, xs ARRAY<DOUBLE>, ys ARRAY<DOUBLE>"
    )

    def stitch_chunk(key, pdf: pd.DataFrame) -> pd.DataFrame:
        level = float(key[0])
        seg_list = list(zip(pdf["x0"], pdf["y0"], pdf["x1"], pdf["y1"]))
        breaks = set()
        for c, xs_, ys_ in (("b0", "x0", "y0"), ("b1", "x1", "y1")):
            m = pdf[c].notna()
            breaks.update(zip(pdf.loc[m, xs_], pdf.loc[m, ys_]))
        lines = _stitch_segments(seg_list, break_nodes=breaks)
        rows = []
        for line in lines:
            a, b = line[0], line[-1]
            closed = a == b
            # final here iff closed (a local cycle / junction loop) or
            # both endpoints are global break nodes — nothing can extend
            done = closed or (a in breaks and b in breaks)
            rows.append(
                (level, bool(done), a[0], a[1], b[0], b[1],
                 a in breaks, b in breaks,
                 [p[0] for p in line], [p[1] for p in line])
            )
        return pd.DataFrame(
            rows, columns=["level", "done", "fx", "fy", "lx", "ly", "fb", "lb", "xs", "ys"]
        )

    chains = tagged.groupBy("level", "cx", "cy").applyInPandas(stitch_chunk, chain_schema)
    chains = chains.persist()
    final_local = chains.filter(F.col("done"))
    open_chains = chains.filter(~F.col("done"))

    def merge_level(key, pdf: pd.DataFrame) -> pd.DataFrame:
        from collections import defaultdict

        level = float(key[0])
        # chain graph: nodes = endpoints, edges = open chains; walk
        # maximal paths breaking at global break nodes (fb/lb flags) —
        # the continuation of _stitch_segments' decomposition one level up
        edges = []
        breaks = set()
        for _, r in pdf.iterrows():
            # r["xs"], not r.xs — .xs is a pandas Series METHOD
            pts_ = list(zip(r["xs"], r["ys"]))
            edges.append(pts_)
            if r["fb"]:
                breaks.add(pts_[0])
            if r["lb"]:
                breaks.add(pts_[-1])
        adj = defaultdict(list)
        for i, e in enumerate(edges):
            adj[e[0]].append((i, False))
            adj[e[-1]].append((i, True))
        used = [False] * len(edges)

        def walk(start, i, rev):
            line = list(reversed(edges[i])) if rev else list(edges[i])
            used[i] = True
            cur = line[-1]
            while cur not in breaks:
                nxts = [(j, r2) for (j, r2) in adj[cur] if not used[j]]
                if not nxts:
                    break
                j, r2 = min(nxts)
                used[j] = True
                ext = list(reversed(edges[j])) if r2 else list(edges[j])
                line.extend(ext[1:])
                cur = line[-1]
            return line

        out = []
        for s in sorted(breaks):
            for (i, rev) in sorted(adj[s]):
                if used[i]:
                    continue
                # rev=True means chain ENDS at s — walk reverses it so
                # traversal leaves s either way
                out.append(_canon_open(walk(s, i, rev)))
        # leftover: cycles of open chains (a ring crossing chunk borders
        # with no break node anywhere)
        order = sorted(range(len(edges)), key=lambda i: min(edges[i][0], edges[i][-1]))
        for i in order:
            if used[i]:
                continue
            line = walk(edges[i][0], i, False)
            while line[0] != line[-1]:
                # keep extending from the head if the tail closed early
                nxts = [(j, r2) for (j, r2) in adj[line[0]] if not used[j]]
                if not nxts:
                    break
                j, r2 = min(nxts)
                used[j] = True
                ext = list(reversed(edges[j])) if not r2 else list(edges[j])
                line = ext[:-1] + line
            if line[0] == line[-1] and len(line) > 2:
                line = _canon_ring(line)
            out.append(line)
        rows = [
            (level, l[0][0], l[0][1], l[-1][0], l[-1][1],
             [p[0] for p in l], [p[1] for p in l])
            for l in out
        ]
        return pd.DataFrame(rows, columns=["level", "fx", "fy", "lx", "ly", "xs", "ys"])

    merged = open_chains.groupBy("level").applyInPandas(
        merge_level,
        "level DOUBLE, fx DOUBLE, fy DOUBLE, lx DOUBLE, ly DOUBLE, "
        "xs ARRAY<DOUBLE>, ys ARRAY<DOUBLE>",
    )

    allc = final_local.select("level", "fx", "fy", "lx", "ly", "xs", "ys").unionByName(
        merged
    )
    # canonical per-level numbering: same sort key as the oracle —
    # (first vertex, last vertex, length) — via a per-level window
    from pyspark.sql import Window

    w = Window.partitionBy("level").orderBy("fx", "fy", "lx", "ly", F.size("xs"))

    @F.pandas_udf("string")
    def _wkt_fmt(xs: pd.Series, ys: pd.Series) -> pd.Series:
        # Python %.9g — Java's format_string %g keeps trailing zeros, so
        # the formatting must stay Python-side to match the oracle
        return pd.Series(
            [
                "LINESTRING ("
                + ", ".join(f"{x:.9g} {y:.9g}" for x, y in zip(a, b))
                + ")"
                for a, b in zip(xs, ys)
            ]
        )

    return allc.select(
        "level",
        (F.row_number().over(w) - 1).cast("int").alias("line_id"),
        _wkt_fmt(F.col("xs"), F.col("ys")).alias("wkt"),
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


def contour_polygons(
    tiles: DataFrame, meta: RasterMeta, interval: float, base: float = 0.0,
    band: int = 1,
) -> DataFrame:
    """``gdal_contour -p`` (polygon output, apps/gdal_contour_bin.cpp /
    marching-squares polygon mode): polygons BETWEEN successive levels.
    Compositional: pixels classify into level bands (idx = floor((v −
    base)/interval), the reference's fixed-interval banding), then the
    existing distributed ring assembly (polygonize_polygons) emits one
    polygon per connected band region with ELEV_MIN/ELEV_MAX attributes.

    Pixel-banded semantics (each pixel wholly in one band) rather than
    sub-pixel marching-squares interpolation — the band boundaries land
    on pixel edges; documented deviation, exact vs its own oracle."""
    from gdal_spark.raster.polygonize import polygonize_polygons

    dtype = meta.dtype

    def classify(iterator):
        for pdf in iterator:
            rows = []
            for r in pdf.itertuples():
                if int(r.band) != band:
                    continue
                a = np.frombuffer(r.data, dtype=dtype).reshape(r.h, r.w)
                idx = np.floor((a.astype(np.float64) - base) / interval)
                rows.append((1, int(r.block_y), int(r.block_x), int(r.h),
                             int(r.w), idx.tobytes()))
            yield pd.DataFrame(
                rows, columns=["band", "block_y", "block_x", "h", "w", "data"]
            )

    bmeta = RasterMeta(width=meta.width, height=meta.height, dtype="float64",
                       block_w=meta.block_w, block_h=meta.block_h, gt=meta.gt)
    banded = tiles.mapInPandas(classify, TILES_SCHEMA)
    polys = polygonize_polygons(banded, bmeta)
    return polys.select(
        "region_id",
        (F.lit(base) + F.col("value") * F.lit(interval)).alias("elev_min"),
        (F.lit(base) + (F.col("value") + 1) * F.lit(interval)).alias("elev_max"),
        "wkt",
    )


def contour_polygons_np(arr: np.ndarray, meta: RasterMeta, interval: float,
                        base: float = 0.0) -> list:
    """Single-node oracle: same banding + ring assembly. Returns
    [(elev_min, elev_max, wkt)] in region order."""
    from gdal_spark.raster.polygonize import polygonize_polygons_np

    idx = np.floor((arr.astype(np.float64) - base) / interval)
    out = []
    for val, wkt in polygonize_polygons_np(idx, gt=meta.gt):
        out.append((base + val * interval, base + (val + 1) * interval, wkt))
    return out
