"""Broadcastable packed polygon index — the engine's analogue of the
reference's prepared-geometry + spatial-index acceleration
(ogrlayer.cpp:2311-2320 prepared geoms; .qix quadtree shptree.c:80).

A :class:`PolygonSet` packs N polygons into flat NumPy arrays (coords +
ring offsets + per-polygon ring spans + envelopes) so the whole dimension
table serializes once into the closure of a pandas UDF / Spark broadcast
and refines point batches with zero per-row Python.

The filter-refine contract matches ``OGRLayer::FilterGeometry``
(ogrlayer.cpp:2253-2325): envelope reject → (cell-level full-containment
accept, our addition for scale) → exact ray-cast refine.
"""

from __future__ import annotations

import numpy as np

from gdal_spark.geometry import kernels, wkb
from gdal_spark import tiling


class PolygonSet:
    """Packed set of polygons addressable by dense index 0..N-1."""

    def __init__(self, ids, coords, ring_starts, ring_counts, poly_ring_start, poly_ring_count):
        self.ids = np.asarray(ids, dtype=np.int64)
        self.coords = coords  # (total_pts, 2) float64
        self.ring_starts = ring_starts  # per ring: start offset into coords
        self.ring_counts = ring_counts  # per ring: number of points
        self.poly_ring_start = poly_ring_start  # per poly: first ring index
        self.poly_ring_count = poly_ring_count  # per poly: number of rings
        # envelopes: (N, 4) minx miny maxx maxy
        env = np.empty((len(ids), 4), dtype=np.float64)
        for i in range(len(ids)):
            rs = self._rings(i)
            env[i] = kernels.envelope(rs)
        self.env = env

    # -- construction --------------------------------------------------

    @classmethod
    def from_wkb(cls, ids, blobs) -> "PolygonSet":
        coords_list, ring_starts, ring_counts = [], [], []
        poly_ring_start, poly_ring_count = [], []
        off = 0
        for blob in blobs:
            rings = wkb.polygon_rings(bytes(blob))
            poly_ring_start.append(len(ring_starts))
            poly_ring_count.append(len(rings))
            for r in rings:
                ring_starts.append(off)
                ring_counts.append(len(r))
                coords_list.append(np.asarray(r, dtype=np.float64))
                off += len(r)
        coords = np.vstack(coords_list) if coords_list else np.zeros((0, 2))
        return cls(
            ids,
            coords,
            np.asarray(ring_starts, dtype=np.int64),
            np.asarray(ring_counts, dtype=np.int64),
            np.asarray(poly_ring_start, dtype=np.int64),
            np.asarray(poly_ring_count, dtype=np.int64),
        )

    @classmethod
    def from_coords(cls, ids, polys) -> "PolygonSet":
        """polys: list of list-of-rings, each ring an (N,2) array (closed)."""
        blobs = [wkb.polygon_wkb(p[0], p[1:]) for p in polys]
        return cls.from_wkb(ids, blobs)

    def _rings(self, i: int) -> list[np.ndarray]:
        out = []
        for r in range(self.poly_ring_start[i], self.poly_ring_start[i] + self.poly_ring_count[i]):
            s, c = self.ring_starts[r], self.ring_counts[r]
            out.append(self.coords[s : s + c])
        return out

    def __len__(self) -> int:
        return len(self.ids)

    # -- refine --------------------------------------------------------

    def contains(self, px, py, poly_idx) -> np.ndarray:
        """Exact containment for (point_i, candidate_poly_idx_i) pairs.

        Envelope prefilter then ray-cast, grouped by polygon so each
        polygon's rings are tested against all its candidate points in one
        vectorized pass.
        """
        px = np.asarray(px, dtype=np.float64)
        py = np.asarray(py, dtype=np.float64)
        poly_idx = np.asarray(poly_idx, dtype=np.int64)
        out = np.zeros(len(px), dtype=bool)
        if len(px) == 0:
            return out
        e = self.env[poly_idx]
        alive = (px >= e[:, 0]) & (px <= e[:, 2]) & (py >= e[:, 1]) & (py <= e[:, 3])
        idx_alive = np.nonzero(alive)[0]
        if len(idx_alive) == 0:
            return out
        order = idx_alive[np.argsort(poly_idx[idx_alive], kind="stable")]
        sorted_pidx = poly_idx[order]
        bounds = np.nonzero(np.diff(sorted_pidx))[0] + 1
        for grp in np.split(order, bounds):
            pi = int(poly_idx[grp[0]])
            out[grp] = kernels.points_in_polygon_np(px[grp], py[grp], self._rings(pi))
        return out

    # -- cell cover ------------------------------------------------------

    def tile_cover(self, z: int):
        """Cover every polygon with zoom-z WebMercator tiles.

        Returns int64 arrays (poly_idx, tx, ty, full) where ``full=1``
        marks tiles wholly inside the polygon (points there are accepted
        without refinement — the scale lever: interior cells skip the UDF).

        Coordinates are assumed to already be in mercator meters; for
        lon/lat data convert envelopes/rings first.
        """
        n = 1 << z
        span = tiling.WORLD_SPAN / n
        P, X, Y, F = [], [], [], []
        for i in range(len(self.ids)):
            minx, miny, maxx, maxy = self.env[i]
            tx0, ty1 = tiling.tile_indices_np(np.array([minx]), np.array([miny]), z)
            tx1, ty0 = tiling.tile_indices_np(np.array([maxx]), np.array([maxy]), z)
            txs = np.arange(tx0[0], tx1[0] + 1, dtype=np.int64)
            tys = np.arange(ty0[0], ty1[0] + 1, dtype=np.int64)
            gx, gy = np.meshgrid(txs, tys)
            gx, gy = gx.ravel(), gy.ravel()
            # tile rectangles in mercator meters
            rx0 = -tiling.ORIGIN + gx * span
            rx1 = rx0 + span
            ry1 = tiling.ORIGIN - gy * span
            ry0 = ry1 - span
            # does any boundary segment of any ring intersect the tile rect?
            crossed = np.zeros(len(gx), dtype=bool)
            for ring in self._rings(i):
                ax, ay = ring[:-1, 0], ring[:-1, 1]
                bx, by = ring[1:, 0], ring[1:, 1]
                for t in range(len(gx)):
                    if not crossed[t]:
                        crossed[t] = kernels.segments_intersect_rect_np(
                            ax, ay, bx, by, rx0[t], ry0[t], rx1[t], ry1[t]
                        ).any()
            cx = (rx0 + rx1) * 0.5
            cy = (ry0 + ry1) * 0.5
            center_in = kernels.points_in_polygon_np(cx, cy, self._rings(i))
            keep = crossed | center_in
            full = center_in & ~crossed
            P.append(np.full(int(keep.sum()), i, dtype=np.int64))
            X.append(gx[keep])
            Y.append(gy[keep])
            F.append(full[keep].astype(np.int64))
        return (
            np.concatenate(P) if P else np.zeros(0, np.int64),
            np.concatenate(X) if X else np.zeros(0, np.int64),
            np.concatenate(Y) if Y else np.zeros(0, np.int64),
            np.concatenate(F) if F else np.zeros(0, np.int64),
        )

    # -- misc ------------------------------------------------------------

    def areas(self) -> np.ndarray:
        return np.array([kernels.polygon_area(self._rings(i)) for i in range(len(self.ids))])
