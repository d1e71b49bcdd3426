"""Golden fixture: the reference's canonical 10-polygon test layer.

Coordinates + attributes extracted from autotest/ogr/data/poly.shp/.dbf
(the fixture behind ogr_sql_test.py / ogr_basic_test.py goldens). Stored
as data (compressed JSON), not code. EPSG:27700-ish projected meters.
"""
import base64
import json
import zlib

import numpy as np

_RINGS_B64Z = (
    "eNqNWGGOXiEIvEoP0BgRFD3Lpve/RnHbx8xLPm2T/fHlsSLCMIN+fX19ma8pq0xT7z9/mI8us5b+"
    "6+ePbRqrFpmPpfUFi3mpfz7rwGfXWtKT1cfTrFVXqSrtr6nrIlMviv17n2mS2NFnrhoCh6220mCy"
    "2Ur9a9LRn9jCQ67Qucp4DmOr11wgqmXBNPtAcJENbGPLKe7YEqt6NTbNgtiEDxsnWnU8psamqIMj"
    "2ypI69pRwGSVTPEba/w5VJS1k6Gx4VO9f23j1z/KcSzisfBHoJyRdYGj+9tEaRhTCCm2DOe1Mf9G"
    "EJ9brjCRkr6+FzwW7ZoL6IitzhIYfLaYE75kDdTbZoT5bC5NGaYbj4+pWsAM2RRxmNoLCiIIroqV"
    "hRREdjOIACAsjWsQp0jI6fpH6z1QuJbiiK4jHo8YviD/3i/nJrt0Zq2vepgiQLXXqkYts3rBmgqD"
    "x5rE0Bwo7njzxuwNJjOG6mxOhfICGqqIbQQ4kLz4Qwh9Ou8UeYTJJvWrjaW5U5yc8mqDWmnnGP56"
    "xaE2RClwA2DPDXDpmkOfnRvz0MmX3r8wxpUGb312ac5zgs5J1fidhdUhWBIyRNXTCChLFNik6jUh"
    "Ktr/9uezuIFRAhaEEpOH1X3OqF2eNBKSEUw36jDTijV9YxOxNYBuWhwhnWmmbVq0GrYhiQgLZ826"
    "wVcEAF0OYqAAGvQjlsAyZqJqi1J+bsIRx7HhazmxYPwNmLSV7J6OiKP/0Fbg9GmRI+oqOoruSUSp"
    "RUaaogIlaYzI5RMECaAXjTgry0WPLiJ2hPXHIGiWuI1Ix8HqOI4FRwcDGEy7itnqMdCRpTYi6c7d"
    "4i8ujnQDld7QfmOLIUyDpOxCnjfKPRP1hd7PknCRkbP4HAXrKHFHWbyI6aHyAMZ5Fo+ZoUjqRd89"
    "kKbhjIuVCZx11Gfkt6k9P3sVakdXLPBAKoqEa0Wfr6q7kSl+OxXJBJFJJz5YFEBQFqlf3GDS3VjM"
    "YEFusLiTMgVvLpyz88AWFqfIqbLf0voYokqGLGjD7UY3xonG3XEnivBgkQl/0h2HbQPe2sYWyQUq"
    "16LcMBhuFCrjqZtS2uKIBVkzCmtbqAjf/Pxs0l+t54MO4wyqKB0ui9H9BaRBAI4ppD6tb3QT6y9E"
    "obOO1HS9X35qBLTJBb+BJN7NYZrNXrtRw8bgwCkKFc1AYg7hxIIzwhTIgixklWQP4FixdKRF4jch"
    "eK0ngUEWMay9ZTAtS5iLw3/6CyVlwp2eVRcLNGIjzZpLD1am1luDTJFIcrcm3HVPIlm4KMnY40b+"
    "Px4VZDSeIiPZtMY6ndTRqjK2IFHxFvw15UUDxCit8gQ5NPlCJAIl9RiNTAHXVCkkYL+rINN9YhcJ"
    "kiNcdby4hEkKenLW1/6UA3m5U5rlK3vbDwbPcZTkX/YrQwanezh6MLovDxmbQpE35gcaRQfh2qMK"
    "gjUN3LOns4wtLESli1KtY1QiMqHYuhP5xejwfEZt6s4NQt6YBMF2gnvwGu3iSov2BSHporK7OpTe"
    "w4SK0NZodFcnTLXJt3hj/g+WxmTnkancqAmGC1tchNlpLNq/swiLbvEBXkaoTHriO+rMRZwuknaU"
    "wYt03gT3qNIXaT+OA7cR4jx4nGaVT+qA+8F5Hr4M0Sd5O+jhWT4vinvR6Yu6X0aCzzPEceY4jynH"
    "yeYyDJ2QfW6HWwuFtJX8PjB2WOTv+b4W/b/m2eNceFNYk/id75RqeAq0pvU/niGOLxeXa9Dl8vQJ"
    "l/+D2ovLyy3ucvf7HMiv361WN2o="
)

# dbf insertion order (FID order) — (AREA, EAS_ID, PRFEDEA)
POLY_ATTRS = [
    (215229.266, 168, "35043411"),
    (247328.172, 179, "35043423"),
    (261752.781, 171, "35043414"),
    (547597.188, 173, "35043416"),
    (15775.758, 172, "35043415"),
    (101429.977, 169, "35043412"),
    (268597.625, 166, "35043409"),
    (1634833.375, 158, "35043369"),
    (-596610.313, 165, "35043408"),
    (5268.813, 170, "35043413"),
]


def poly_rings():
    """list[ list[ (N,2) ndarray ] ] — one entry per feature, FID order."""
    raw = json.loads(zlib.decompress(base64.b64decode("".join(_RINGS_B64Z))))
    return [[np.asarray(r, dtype=np.float64) for r in p] for p in raw]
