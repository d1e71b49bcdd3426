"""Vector→raster burn-in (``gdal_rasterize``), distributed per block.

Scanline semantics replicate ``GDALdllImageFilledPolygon``
(alg/llrasterize.cpp:58-229) exactly:

- test line at the pixel-center height ``dy = y + 0.5``
- an edge (y1 < y2 after ordering) contributes a crossing when
  ``dy1 <= dy < dy2`` at ``x = (dy-dy1)*(dx2-dx1)/(dy2-dy1) + dx1``
- crossings round to ``floor(x + 0.5)`` and fill pairwise as
  ``[x_even, x_odd - 1]`` inclusive (pixel-center inclusion)
- bottom horizontal edges fill separately; top horizontals are skipped
- points burn at ``(floor(x), floor(y))`` (llrasterize.cpp:233+)
- ALL_TOUCHED burns every pixel the boundary traverses via the EXACT
  GDALdllImageLineAllTouched grid walk (llrasterize.cpp:383-713):
  boundary first with intersect_only=True, then the fill (skipping
  boundary-burnt pixels under ADD — the poSetVisitedPoints handoff)
- MERGE_ALG: REPLACE (last feature wins, feature order) or ADD

Distribution: features → covering blocks via envelope math (column-side
explode), shuffled once to their blocks, then one NumPy scanline pass per
(block, ordered features) group — the reference's CHUNKYSIZE chunking
(gdalrasterize.cpp:915) realized as the natural block partition.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F

from gdal_spark.geometry import ops, wkb
from gdal_spark.raster.model import RasterMeta, TILES_SCHEMA


def _scanline_burn(
    img: np.ndarray,
    rings: list,
    value: float,
    y0: int,
    x0: int,
    merge_add: bool,
    skip_mask: np.ndarray | None = None,
):
    """Burn one polygon (pixel coords) into img whose top-left is global
    (y0, x0). Mirrors GDALdllImageFilledPolygon for the single-feature
    case (bAvoidBurningSamePoints=False). ``skip_mask`` (img-shaped bool)
    marks pixels already burnt by an ALL_TOUCHED boundary pass under ADD
    (the reference's poSetVisitedPoints handoff)."""
    h, w = img.shape
    ally = np.concatenate([r[:, 1] for r in rings])
    miny = max(int(ally.min()), y0)
    maxy = min(int(ally.max()), y0 + h - 1)
    for y in range(miny, maxy + 1):
        dy = y + 0.5
        xs = []
        hxs = []
        for r in rings:
            y1 = r[:-1, 1]
            y2 = r[1:, 1]
            x1 = r[:-1, 0]
            x2 = r[1:, 0]
            lo = np.minimum(y1, y2)
            hi = np.maximum(y1, y2)
            xlo = np.where(y1 < y2, x1, x2)
            xhi = np.where(y1 < y2, x2, x1)
            # non-horizontal crossings: dy in [lo, hi)
            m = (lo <= dy) & (dy < hi)
            if m.any():
                inter = (dy - lo[m]) * (xhi[m] - xlo[m]) / (hi[m] - lo[m]) + xlo[m]
                xs.extend(np.floor(inter + 0.5).astype(np.int64).tolist())
            # bottom horizontal segments: reached only when the edge sits
            # exactly at the test height (llrasterize.cpp:138-185), and
            # only right-to-left (bottom) ones fill; top ones are skipped
            hm = (y1 == y2) & (y1 == dy) & (x1 > x2)
            for i in np.nonzero(hm)[0]:
                hx1 = int(np.floor(x2[i] + 0.5))
                hx2 = int(np.floor(x1[i] + 0.5))
                hxs.append((hx1, hx2 - 1))
        xs.sort()
        for i in range(0, len(xs) - 1, 2):
            a, b = xs[i], xs[i + 1] - 1
            a = max(a, x0)
            b = min(b, x0 + w - 1)
            if a <= b:
                row = img[y - y0, a - x0 : b - x0 + 1]
                if skip_mask is not None:
                    keep = ~skip_mask[y - y0, a - x0 : b - x0 + 1]
                    if merge_add:
                        row[keep] += value
                    else:
                        row[keep] = value
                elif merge_add:
                    row += value
                else:
                    row[:] = value
        for a, b in hxs:
            a = max(a, x0)
            b = min(b, x0 + w - 1)
            if a <= b:
                row = img[y - y0, a - x0 : b - x0 + 1]
                if skip_mask is not None:
                    keep = ~skip_mask[y - y0, a - x0 : b - x0 + 1]
                    if merge_add:
                        row[keep] += value
                    else:
                        row[keep] = value
                elif merge_add:
                    row += value
                else:
                    row[:] = value


def _bresenham_line_burn(img, pts, value, y0, x0, merge_add, variants=None,
                         visited=None):
    """Exact GDALdllImageLine Bresenham (llrasterize.cpp:255+): integer
    error stepping; intermediate segment endpoints burn once.

    ``variants``: optional per-vertex Z (BURN_VALUE_FROM=Z) — linearly
    interpolated along the major axis with the reference's
    dfDeltaVariant stepping (llrasterize.cpp:298-357); burn value is
    ``value + variant`` per pixel.

    ``visited``: per-FEATURE (iy, ix) set shared across all line parts
    (gvBurnPoint + poSetVisitedPoints, gdalrasterize.cpp:694-698): under
    ADD every pixel burns at most once per geometry, so self-crossing
    lines and shared pixels between MultiLineString parts don't
    double-add."""
    h, w = img.shape
    n = len(pts)
    var = 0.0

    def put(iy, ix):
        if visited is not None and merge_add:
            yx = (iy, ix)
            if yx in visited:
                return
            visited.add(yx)
        if y0 <= iy < y0 + h and x0 <= ix < x0 + w:
            if merge_add:
                img[iy - y0, ix - x0] += value + var
            else:
                img[iy - y0, ix - x0] = value + var

    for j in range(1, n):
        ix = int(np.floor(pts[j - 1][0]))
        iy = int(np.floor(pts[j - 1][1]))
        ix1 = int(np.floor(pts[j][0]))
        iy1 = int(np.floor(pts[j][1]))
        ndx = abs(ix1 - ix)
        ndy = abs(iy1 - iy)
        xstep = -1 if ix > ix1 else 1
        ystep = -1 if iy > iy1 else 1
        v0 = float(variants[j - 1]) if variants is not None else 0.0
        v1 = float(variants[j]) if variants is not None else 0.0
        if ndx >= ndy:
            xerr = ndy << 1
            yerr = xerr - (ndx << 1)
            err = xerr - ndx
            dvar = 0.0 if ndx == 0 else (v1 - v0) / ndx
            var = v0
            if j != n - 1:
                ndx -= 1
            while ndx >= 0:
                put(iy, ix)
                var += dvar
                ix += xstep
                if err > 0:
                    iy += ystep
                    err += yerr
                else:
                    err += xerr
                ndx -= 1
        else:
            yerr = ndx << 1
            xerr = yerr - (ndy << 1)
            err = yerr - ndy
            dvar = 0.0 if ndy == 0 else (v1 - v0) / ndy
            var = v0
            if j != n - 1:
                ndy -= 1
            while ndy >= 0:
                put(iy, ix)
                var += dvar
                iy += ystep
                if err > 0:
                    ix += xstep
                    err += xerr
                else:
                    err += yerr
                ndy -= 1


def _all_touched_burn(
    img, pts, value, y0, x0, merge_add, raster_w, raster_h,
    variants=None, intersect_only=False, visited=None,
):
    """EXACT GDALdllImageLineAllTouched (llrasterize.cpp:383-713): the
    grid walk with the reference's vertical/horizontal special cases
    (.01 thresholds, the 1e-4 EPSILON_INTERSECT_ONLY end-floor nudge),
    raster-border segment clipping with variant adjustment, and the
    avoid-burning-same-points sets for ADD mode (consecutive segments
    share their endpoint pixel only once). ``pts`` is ONE part (ring or
    line) in pixel coords; ``variants`` optional per-vertex Z;
    ``visited`` an optional global (iy, ix) set that accumulates burnt
    pixels (consulted later by the ADD fill pass)."""
    EPS = 1e-4
    h, w = img.shape
    avoid = merge_add
    last_burnt: set = set()
    new_burnt: set = set()

    def put(iy, ix, var):
        if visited is not None:
            # gvBurnPoint + poSetVisitedPoints (gdalrasterize.cpp:694-698):
            # under ADD every pixel burns at most once per geometry
            yx = (iy, ix)
            if merge_add and yx in visited:
                return
            visited.add(yx)
        if y0 <= iy < y0 + h and x0 <= ix < x0 + w:
            if merge_add:
                img[iy - y0, ix - x0] += value + var
            else:
                img[iy - y0, ix - x0] = value + var

    n = len(pts)
    for j in range(1, n):
        last_burnt = new_burnt
        new_burnt = set()
        x_a, y_a = float(pts[j - 1][0]), float(pts[j - 1][1])
        x_b, y_b = float(pts[j][0]), float(pts[j][1])
        v_a = float(variants[j - 1]) if variants is not None else 0.0
        v_b = float(variants[j]) if variants is not None else 0.0
        if (y_a < 0 and y_b < 0) or (y_a > raster_h and y_b > raster_h) \
                or (x_a < 0 and x_b < 0) or (x_a > raster_w and x_b > raster_w):
            continue
        if x_a > x_b:
            x_a, x_b = x_b, x_a
            y_a, y_b = y_b, y_a
            v_a, v_b = v_b, v_a
        if abs(x_a - x_b) < 0.01:  # vertical
            if intersect_only and abs(x_a - round(x_a)) < EPS and \
                    abs(x_b - round(x_b)) < EPS:
                continue
            if y_b < y_a:
                y_a, y_b = y_b, y_a
                v_a, v_b = v_b, v_a
            ix = int(np.floor(x_b))
            iy = int(np.floor(y_a))
            iy_end = int(np.floor(y_b - EPS))
            if ix < 0 or ix >= raster_w:
                continue
            dvar = (v_b - v_a) / (y_b - y_a) if y_b - y_a > 0 else 0.0
            if iy < 0:
                iy = 0
            if iy_end >= raster_h:
                iy_end = raster_h - 1
            var = v_a + dvar * (iy - y_a)
            while iy <= iy_end:
                yx = (iy, ix)
                if not (avoid and yx in last_burnt):
                    if avoid:
                        new_burnt.add(yx)
                    put(iy, ix, var if variants is not None else 0.0)
                iy += 1
                var += dvar
            continue
        dvar = (v_b - v_a) / (x_b - x_a)
        if abs(y_a - y_b) < 0.01:  # horizontal
            if intersect_only and abs(y_a - round(y_a)) < EPS and \
                    abs(y_b - round(y_b)) < EPS:
                continue
            ix = int(np.floor(x_a))
            iy = int(np.floor(y_a))
            ix_end = int(np.floor(x_b - EPS))
            if iy < 0 or iy >= raster_h:
                continue
            if ix < 0:
                ix = 0
            if ix_end >= raster_w:
                ix_end = raster_w - 1
            var = v_a + dvar * (ix - x_a)
            while ix <= ix_end:
                yx = (iy, ix)
                if not (avoid and yx in last_burnt):
                    if avoid:
                        new_burnt.add(yx)
                    put(iy, ix, var if variants is not None else 0.0)
                ix += 1
                var += dvar
            continue
        # general sloped case
        slope = (y_b - y_a) / (x_b - x_a)
        if x_b > raster_w:
            y_b -= (x_b - raster_w) * slope
            x_b = float(raster_w)
        if x_a < 0.0:
            y_a += (0.0 - x_a) * slope
            v_a += dvar * (0.0 - x_a)
            x_a = 0.0
        if y_b > y_a:
            if y_a < 0.0:
                dx = (0.0 - y_a) / slope
                x_a += dx
                v_a += dvar * dx
                y_a = 0.0
            if y_b >= raster_h:
                x_b += (y_b - raster_h) / slope
                if x_b > raster_w:
                    x_b = float(raster_w)
        else:
            if y_a >= raster_h:
                dx = (raster_h - y_a) / slope
                x_a += dx
                v_a += dvar * dx
                y_a = float(raster_h)
            if y_b < 0.0:
                x_b -= (y_b - 0.0) / slope
        x, y, var = x_a, y_a, v_a
        while 0.0 <= x < x_b:
            ix = int(np.floor(x))
            iy = int(np.floor(y))
            if 0 <= iy < raster_h:
                yx = (iy, ix)
                if avoid:
                    if yx not in last_burnt and yx not in new_burnt:
                        new_burnt.add(yx)
                        put(iy, ix, var if variants is not None else 0.0)
                else:
                    put(iy, ix, var if variants is not None else 0.0)
            step_x = np.floor(x + 1.0) - x
            step_y = step_x * slope
            if int(np.floor(y + step_y)) == iy:
                x += step_x
                y += step_y
                var += dvar * step_x
            elif slope < 0:
                step_y = iy - y
                if step_y > -1e-9:
                    step_y = -1e-9
                step_x = step_y / slope
                x += step_x
                y += step_y
                var += dvar * step_x
            else:
                step_y = (iy + 1) - y
                if step_y < 1e-9:
                    step_y = 1e-9
                step_x = step_y / slope
                x += step_x
                y += step_y
                var += dvar * step_x


def rasterize_np(
    rings_list: list,
    values: list,
    meta: RasterMeta,
    all_touched: bool = False,
    merge_add: bool = False,
    init: float = 0.0,
) -> np.ndarray:
    """Single-node oracle: burn features (pixel-space rings) in order."""
    img = np.full((meta.height, meta.width), init, dtype=np.float64)
    for rings, v in zip(rings_list, values):
        visited = set() if (all_touched and merge_add) else None
        if all_touched:
            for r in rings:
                _all_touched_burn(img, np.asarray(r, dtype=float), v, 0, 0,
                                  merge_add, meta.width, meta.height,
                                  intersect_only=True, visited=visited)
        skip = None
        if visited:
            skip = np.zeros(img.shape, dtype=bool)
            for (iy, ix) in visited:
                if 0 <= iy < meta.height and 0 <= ix < meta.width:
                    skip[iy, ix] = True
        _scanline_burn(img, rings, v, 0, 0, merge_add, skip_mask=skip)
    return img


def rasterize_z_np(
    geoms_wkb: list,
    values: list,
    meta: RasterMeta,
    merge_add: bool = False,
    init: float = 0.0,
) -> np.ndarray:
    """Single-node BURN_VALUE_FROM=Z oracle: the same collection + burn
    discipline as the distributed kernel over the whole raster at once
    (fills = first-vertex Z constant; lines = interpolated variants;
    points = own Z)."""
    img = np.full((meta.height, meta.width), init, dtype=np.float64)
    for buf, v in zip(geoms_wkb, values):
        geom = wkb.parse_wkb_z(bytes(buf))
        polys = ops._polygons_of(geom)
        value = float(v)
        if polys:
            fill_value = value + float(polys[0][0][0, 2])
            for rings in polys:
                prings = []
                for r in rings:
                    x, y = meta.geo_to_px(r[:, 0], r[:, 1])
                    prings.append(np.column_stack([x, y]))
                _scanline_burn(img, prings, fill_value, 0, 0, merge_add)
        for pt in ops._points_of(geom):
            pxx, pyy = meta.geo_to_px(pt[0], pt[1])
            ix, iy = int(np.floor(pxx)), int(np.floor(pyy))
            if 0 <= iy < meta.height and 0 <= ix < meta.width:
                if merge_add:
                    img[iy, ix] += value + float(pt[2])
                else:
                    img[iy, ix] = value + float(pt[2])
        line_visited = set() if merge_add else None
        for line in [l for l in ops._lines_of(geom) if not polys]:
            line = np.asarray(line, dtype=float)[::-1]
            x, y = meta.geo_to_px(line[:, 0], line[:, 1])
            pts = np.column_stack([x, y])
            _bresenham_line_burn(img, pts, value, 0, 0, merge_add,
                                 variants=line[:, 2], visited=line_visited)
    return img


def rasterize(
    features: DataFrame,
    meta: RasterMeta,
    burn_col: str = "burn",
    geom_col: str = "geometry",
    fid_col: str | None = None,
    all_touched: bool = False,
    merge_alg: str = "REPLACE",
    init: float = 0.0,
    band: int = 1,
    burn_value_from_z: bool = False,
) -> DataFrame:
    """Distributed rasterize → float64 tiles DataFrame.

    Geometries are WKB in *georeferenced* coords; converted to pixel space
    via the meta geotransform. Features shuffle only to the blocks their
    envelope covers; burn order within a block follows ``fid_col``
    (insertion order — the reference's feature iteration order).

    ``burn_value_from_z`` (gdal_rasterize -3d / BURN_VALUE_FROM=Z,
    alg/gdalrasterize.cpp:780-796): burn value becomes ``burn + Z``.
    Matching GDALdllImageFilledPolygon exactly, polygon fills use the
    geometry's FIRST vertex Z (dfVariant[0] — the reference does NOT
    interpolate Z across fills); line burns interpolate Z along each
    segment; points use their own Z; ALL_TOUCHED lines interpolate along
    the exact grid walk (GDALdllImageLineAllTouched)."""
    merge_add = merge_alg.upper() == "ADD"
    gt = meta.gt
    bw, bh = meta.block_w, meta.block_h
    nbx, nby = meta.blocks_x, meta.blocks_y

    fid = F.col(fid_col) if fid_col else F.monotonically_increasing_id()
    feats = features.select(
        fid.alias("__fid"), F.col(geom_col).alias("__g"), F.col(burn_col).alias("__v")
    )

    @F.pandas_udf("ARRAY<STRUCT<bx: INT, by: INT>>")
    def covering_blocks(g: pd.Series) -> pd.Series:
        out = []
        for b in g:
            geom = wkb.parse_wkb(bytes(b))
            minx, miny, maxx, maxy = ops.envelope(geom)
            # geo → pixel corners (handle negative nsres)
            px, py = [], []
            for cx, cy in ((minx, miny), (maxx, miny), (minx, maxy), (maxx, maxy)):
                x, y = meta.geo_to_px(cx, cy)
                px.append(x)
                py.append(y)
            bx0 = max(int(min(px) // bw), 0)
            bx1 = min(int(max(px) // bw), nbx - 1)
            by0 = max(int(min(py) // bh), 0)
            by1 = min(int(max(py) // bh), nby - 1)
            out.append(
                [
                    {"bx": x, "by": y}
                    for y in range(by0, by1 + 1)
                    for x in range(bx0, bx1 + 1)
                ]
            )
        return pd.Series(out)

    exploded = (
        feats.withColumn("__blk", F.explode(covering_blocks(F.col("__g"))))
        .select(
            F.col("__blk.bx").alias("block_x"),
            F.col("__blk.by").alias("block_y"),
            "__fid",
            "__g",
            "__v",
        )
    )

    def burn_block(key, pdf: pd.DataFrame) -> pd.DataFrame:
        bx, by = int(key[0]), int(key[1])
        h, w = meta.block_shape(bx, by)
        img = np.full((h, w), init, dtype=np.float64)
        pdf = pdf[pdf["__g"].notna()].sort_values("__fid")
        for _, row in pdf.iterrows():
            geom = (wkb.parse_wkb_z if burn_value_from_z else wkb.parse_wkb)(
                bytes(row.__g)
            )
            polys = ops._polygons_of(geom)
            value = float(row.__v)
            if polys:
                fill_value = value
                if burn_value_from_z:
                    # dfVariant[0]: Z of the geometry's first collected vertex
                    fill_value = value + float(polys[0][0][0, 2])
                # reference order (gdalrasterize.cpp:723-760): ALL_TOUCHED
                # boundary first (intersect_only=True, constant first-vertex
                # variant) recording visited pixels under ADD; the fill then
                # skips those pixels
                visited = set() if (all_touched and merge_add) else None
                ppolys = []
                for rings in polys:
                    prings = []
                    for r in rings:
                        x, y = meta.geo_to_px(r[:, 0], r[:, 1])
                        prings.append(np.column_stack([x, y]))
                    ppolys.append(prings)
                if all_touched:
                    for prings in ppolys:
                        for r_px in prings:
                            _all_touched_burn(
                                img, r_px, fill_value, by * bh, bx * bw,
                                merge_add, meta.width, meta.height,
                                intersect_only=True, visited=visited,
                            )
                skip = None
                if visited:
                    skip = np.zeros(img.shape, dtype=bool)
                    for (iy, ix) in visited:
                        if by * bh <= iy < by * bh + h and bx * bw <= ix < bx * bw + w:
                            skip[iy - by * bh, ix - bx * bw] = True
                for prings in ppolys:
                    _scanline_burn(img, prings, fill_value, by * bh, bx * bw,
                                   merge_add, skip_mask=skip)
            for pt in ops._points_of(geom):
                x, y = pt[0], pt[1]
                pv = value + (float(pt[2]) if burn_value_from_z else 0.0)
                pxx, pyy = meta.geo_to_px(x, y)
                ix, iy = int(np.floor(pxx)), int(np.floor(pyy))
                if by * bh <= iy < by * bh + h and bx * bw <= ix < bx * bw + w:
                    if merge_add:
                        img[iy - by * bh, ix - bx * bw] += pv
                    else:
                        img[iy - by * bh, ix - bx * bw] = pv
            # ONE visited set per feature spanning all line parts
            # (gdalrasterize.cpp:694-698 creates poSetVisitedPoints per
            # geometry before the single all-parts walker call)
            line_visited = set() if merge_add else None
            for line in [l for l in ops._lines_of(geom) if not polys]:
                # GDALCollectRingsFromGeometry pushes LineString vertices in
                # REVERSE order (gdalrasterize.cpp wkbLineString branch) —
                # the Bresenham phase depends on direction, so match it
                line = np.asarray(line, dtype=float)[::-1]
                x, y = meta.geo_to_px(line[:, 0], line[:, 1])
                pts = np.column_stack([x, y])
                variants = line[:, 2] if burn_value_from_z else None
                if all_touched:
                    _all_touched_burn(
                        img, pts, value, by * bh, bx * bw, merge_add,
                        meta.width, meta.height, variants=variants,
                        visited=line_visited,
                    )
                else:
                    _bresenham_line_burn(img, pts, value, by * bh, bx * bw,
                                         merge_add, variants=variants,
                                         visited=line_visited)
        return pd.DataFrame(
            [(band, by, bx, h, w, img.tobytes())],
            columns=["band", "block_y", "block_x", "h", "w", "data"],
        )

    spark = features.sparkSession
    # every block must exist in the output, including untouched ones
    all_blocks = spark.createDataFrame(
        [(x, y) for y in range(nby) for x in range(nbx)], "block_x INT, block_y INT"
    )
    joined = all_blocks.join(exploded, ["block_x", "block_y"], "left")
    return joined.groupBy("block_x", "block_y").applyInPandas(burn_block, TILES_SCHEMA)
