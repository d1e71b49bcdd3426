"""Coordinate reference systems and batched NumPy transforms — the
engine's replacement for the reference's PROJ-backed
``OGRCoordinateTransformation`` (ogr/ogrct.cpp) for the projections a
web-scale tiling pipeline actually uses:

- EPSG:4326 geographic (WGS84)
- EPSG:3857 spherical web mercator
- EPSG:32601-32660 / 32701-32760 UTM (WGS84), and generic transverse
  Mercator via :class:`TMerc`

The ellipsoidal transverse Mercator is the Krüger series in the
exponential form (Karney, "Transverse Mercator with an accuracy of a few
nanometers", J. Geod. 2011 — the same formulation PROJ's ``etmerc``
uses; coefficients to n^6 give sub-micrometer accuracy inside a UTM
zone). The inverse recovers latitude from the conformal latitude by
Newton iteration. An independent Redfearn/Snyder series implementation
(:func:`utm_forward_redfearn`, USGS PP 1395 eq. 8-9..8-17) exists purely
as a cross-check oracle: two unrelated derivations agreeing to
sub-millimeter is the correctness evidence in lieu of PROJ itself
(tests/test_crs.py).

All transforms are vectorized NumPy (lon/lat arrays in, x/y arrays out)
and plug into the existing pandas-UDF geometry plumbing
(``ops.transform_geom``) and the raster warp gather — no per-row Python.
"""

from __future__ import annotations

import numpy as np

# WGS84
A_WGS84 = 6378137.0
F_WGS84 = 1.0 / 298.257223563


class TMerc:
    """Ellipsoidal transverse Mercator (Krüger series, 6th order in n)."""

    def __init__(
        self,
        lon0_deg: float,
        k0: float = 0.9996,
        false_e: float = 500000.0,
        false_n: float = 0.0,
        a: float = A_WGS84,
        f: float = F_WGS84,
    ):
        self.lon0 = np.deg2rad(lon0_deg)
        self.k0 = k0
        self.fe = false_e
        self.fn = false_n
        self.a = a
        self.f = f
        n = f / (2.0 - f)
        self.n = n
        self.e2 = f * (2.0 - f)
        self.e = np.sqrt(self.e2)
        self.A = a / (1 + n) * (1 + n**2 / 4 + n**4 / 64 + n**6 / 256)
        self.alpha = np.array([
            n / 2 - 2 * n**2 / 3 + 5 * n**3 / 16 + 41 * n**4 / 180
            - 127 * n**5 / 288 + 7891 * n**6 / 37800,
            13 * n**2 / 48 - 3 * n**3 / 5 + 557 * n**4 / 1440 + 281 * n**5 / 630
            - 1983433 * n**6 / 1935360,
            61 * n**3 / 240 - 103 * n**4 / 140 + 15061 * n**5 / 26880
            + 167603 * n**6 / 181440,
            49561 * n**4 / 161280 - 179 * n**5 / 168 + 6601661 * n**6 / 7257600,
            34729 * n**5 / 80640 - 3418889 * n**6 / 1995840,
            212378941 * n**6 / 319334400,
        ])
        self.beta = np.array([
            n / 2 - 2 * n**2 / 3 + 37 * n**3 / 96 - n**4 / 360
            - 81 * n**5 / 512 + 96199 * n**6 / 604800,
            n**2 / 48 + n**3 / 15 - 437 * n**4 / 1440 + 46 * n**5 / 105
            - 1118711 * n**6 / 3870720,
            17 * n**3 / 480 - 37 * n**4 / 840 - 209 * n**5 / 4480
            + 5569 * n**6 / 90720,
            4397 * n**4 / 161280 - 11 * n**5 / 504 - 830251 * n**6 / 7257600,
            4583 * n**5 / 161280 - 108847 * n**6 / 3991680,
            20648693 * n**6 / 638668800,
        ])

    def forward(self, lon_deg, lat_deg):
        """(lon, lat) degrees → (easting, northing) meters."""
        lam = np.deg2rad(np.asarray(lon_deg, dtype=np.float64)) - self.lon0
        phi = np.deg2rad(np.asarray(lat_deg, dtype=np.float64))
        e = self.e
        s = np.sin(phi)
        # conformal latitude tangent via Gauss-Schreiber: t = sinh(ψ)
        t = np.sinh(np.arctanh(s) - e * np.arctanh(e * s))
        xi_p = np.arctan2(t, np.cos(lam))
        eta_p = np.arcsinh(np.sin(lam) / np.sqrt(t * t + np.cos(lam) ** 2))
        xi = xi_p.copy()
        eta = eta_p.copy()
        for j in range(6):
            k = 2.0 * (j + 1)
            xi += self.alpha[j] * np.sin(k * xi_p) * np.cosh(k * eta_p)
            eta += self.alpha[j] * np.cos(k * xi_p) * np.sinh(k * eta_p)
        x = self.fe + self.k0 * self.A * eta
        y = self.fn + self.k0 * self.A * xi
        return x, y

    def inverse(self, x, y):
        """(easting, northing) meters → (lon, lat) degrees."""
        eta = (np.asarray(x, dtype=np.float64) - self.fe) / (self.k0 * self.A)
        xi = (np.asarray(y, dtype=np.float64) - self.fn) / (self.k0 * self.A)
        xi_p = xi.copy()
        eta_p = eta.copy()
        for j in range(6):
            k = 2.0 * (j + 1)
            xi_p -= self.beta[j] * np.sin(k * xi) * np.cosh(k * eta)
            eta_p -= self.beta[j] * np.cos(k * xi) * np.sinh(k * eta)
        tau_p = np.sin(xi_p) / np.sqrt(np.sinh(eta_p) ** 2 + np.cos(xi_p) ** 2)
        lam = np.arctan2(np.sinh(eta_p), np.cos(xi_p))
        # Newton-invert the conformal latitude: solve tau'(tau) = tau_p
        e = self.e
        e2 = self.e2
        tau = tau_p / (1.0 - e2)  # first guess
        for _ in range(5):
            sig = np.sinh(e * np.arctanh(e * tau / np.sqrt(1.0 + tau * tau)))
            f_tau = tau * np.sqrt(1.0 + sig * sig) - sig * np.sqrt(1.0 + tau * tau)
            dtau = (
                (tau_p - f_tau)
                * (1.0 + (1.0 - e2) * tau * tau)
                / ((1.0 - e2) * np.sqrt((1.0 + f_tau * f_tau) * (1.0 + tau * tau)))
            )
            tau = tau + dtau
        phi = np.arctan(tau)
        return np.rad2deg(lam + self.lon0), np.rad2deg(phi)


# ---------------------------------------------------------------------------
# spherical web mercator (EPSG:3857)
# ---------------------------------------------------------------------------

R_MERC = 6378137.0


def lonlat_to_webmerc(lon, lat):
    lon = np.asarray(lon, dtype=np.float64)
    lat = np.asarray(lat, dtype=np.float64)
    x = np.deg2rad(lon) * R_MERC
    y = np.log(np.tan(np.pi / 4.0 + np.deg2rad(lat) / 2.0)) * R_MERC
    return x, y


def webmerc_to_lonlat(x, y):
    x = np.asarray(x, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    lon = np.rad2deg(x / R_MERC)
    lat = np.rad2deg(2.0 * np.arctan(np.exp(y / R_MERC)) - np.pi / 2.0)
    return lon, lat


# ---------------------------------------------------------------------------
# registry + transformer factory
# ---------------------------------------------------------------------------

def _parse_epsg(code: str | int) -> int:
    if isinstance(code, int):
        return code
    c = code.strip().upper()
    if c.startswith("EPSG:"):
        return int(c[5:])
    return int(c)


def _utm_tmerc(epsg: int) -> TMerc:
    if 32601 <= epsg <= 32660:
        zone, south = epsg - 32600, False
    elif 32701 <= epsg <= 32760:
        zone, south = epsg - 32700, True
    else:
        raise ValueError(f"not a WGS84 UTM code: EPSG:{epsg}")
    return TMerc(
        lon0_deg=zone * 6.0 - 183.0,
        k0=0.9996,
        false_e=500000.0,
        false_n=10000000.0 if south else 0.0,
    )


def _is_utm(epsg: int) -> bool:
    return 32601 <= epsg <= 32660 or 32701 <= epsg <= 32760


def _to_lonlat(epsg: int):
    """fn(x, y) -> (lon, lat) for the supported CRS family."""
    if epsg == 4326:
        return lambda x, y: (np.asarray(x, np.float64), np.asarray(y, np.float64))
    if epsg == 3857:
        return webmerc_to_lonlat
    if _is_utm(epsg):
        tm = _utm_tmerc(epsg)
        return tm.inverse
    raise NotImplementedError(
        f"EPSG:{epsg} not in the supported registry (4326, 3857, WGS84 UTM)"
    )


def _from_lonlat(epsg: int):
    if epsg == 4326:
        return lambda lon, lat: (np.asarray(lon, np.float64), np.asarray(lat, np.float64))
    if epsg == 3857:
        return lonlat_to_webmerc
    if _is_utm(epsg):
        tm = _utm_tmerc(epsg)
        return tm.forward
    raise NotImplementedError(
        f"EPSG:{epsg} not in the supported registry (4326, 3857, WGS84 UTM)"
    )


def transformer(src: str | int, dst: str | int):
    """Batched fn(xs, ys) -> (xs, ys) between two supported CRS.

    Pivot through geographic (both endpoints are WGS84-datum here, so no
    datum shift is involved — codes on other datums raise)."""
    s, d = _parse_epsg(src), _parse_epsg(dst)
    if s == d:
        return lambda x, y: (np.asarray(x, np.float64), np.asarray(y, np.float64))
    inv = _to_lonlat(s)
    fwd = _from_lonlat(d)

    def fn(x, y):
        lon, lat = inv(x, y)
        return fwd(lon, lat)

    return fn


# ---------------------------------------------------------------------------
# independent cross-check: Redfearn/Snyder UTM series (USGS PP 1395)
# ---------------------------------------------------------------------------

def utm_forward_redfearn(lon_deg, lat_deg, zone: int, south: bool = False):
    """UTM forward by the classic Redfearn/Snyder expansion (eq. 8-9..8-17)
    — shares NOTHING with the Krüger path above; test oracle only."""
    a, f = A_WGS84, F_WGS84
    e2 = f * (2 - f)
    ep2 = e2 / (1 - e2)
    k0 = 0.9996
    lon0 = np.deg2rad(zone * 6.0 - 183.0)
    lam = np.deg2rad(np.asarray(lon_deg, dtype=np.float64))
    phi = np.deg2rad(np.asarray(lat_deg, dtype=np.float64))
    N = a / np.sqrt(1 - e2 * np.sin(phi) ** 2)
    T = np.tan(phi) ** 2
    C = ep2 * np.cos(phi) ** 2
    Aq = (lam - lon0) * np.cos(phi)
    # meridian arc (Snyder 3-21)
    M = a * (
        (1 - e2 / 4 - 3 * e2**2 / 64 - 5 * e2**3 / 256) * phi
        - (3 * e2 / 8 + 3 * e2**2 / 32 + 45 * e2**3 / 1024) * np.sin(2 * phi)
        + (15 * e2**2 / 256 + 45 * e2**3 / 1024) * np.sin(4 * phi)
        - (35 * e2**3 / 3072) * np.sin(6 * phi)
    )
    x = k0 * N * (
        Aq
        + (1 - T + C) * Aq**3 / 6
        + (5 - 18 * T + T**2 + 72 * C - 58 * ep2) * Aq**5 / 120
    ) + 500000.0
    y = k0 * (
        M
        + N
        * np.tan(phi)
        * (
            Aq**2 / 2
            + (5 - T + 9 * C + 4 * C**2) * Aq**4 / 24
            + (61 - 58 * T + T**2 + 600 * C - 330 * ep2) * Aq**6 / 720
        )
    )
    if south:
        y = y + 10000000.0
    return x, y
