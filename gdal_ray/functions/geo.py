"""Pure-numpy geodesy / tiling kernels.

Re-answers GDAL's georeferencing layer (reference: ``gcore/gdal_geotransform.h``
affine pixel<->world, ``ogr/ogrct.cpp`` CRS transforms, tile math
``apps/gdalalg_raster_tile.cpp:192-215`` / ``gcore/tilematrixset.hpp``) with
closed-form EPSG:4326 <-> EPSG:3857 (spherical WebMercator) formulas and
XYZ/WebMercatorQuad tile addressing.  No PROJ / pyproj dependency: the sandbox
only needs these two CRSs, and the closed forms are exact.

Everything here is vectorized over numpy arrays: these functions run inside
``Dataset.map_batches`` on zero-copy Arrow columns converted to numpy views.

SQL-parity note: several kernels (``derive_lonlat``, ``lonlat_to_tile``) are
mirrored 1:1 by ANSI-SQL expressions in ``__ray_entry__.oracle_sql`` — keep the
operation ORDER identical when editing (floating point must agree bit-for-bit
with DuckDB's evaluation of the same expression).
"""

from __future__ import annotations

import numpy as np

EARTH_RADIUS = 6378137.0
ORIGIN_SHIFT = np.pi * EARTH_RADIUS  # 20037508.342789244
MAX_MERC_LAT = 85.05112877980659  # atan(sinh(pi)) in degrees

# ---------------------------------------------------------------------------
# Deterministic geometry derivation (FIXTURES.md F1): the interleaved document
# corpus has no native coordinates; lon/lat are a deterministic pure-integer
# function of the int64 key so that DuckDB oracles can recompute them exactly.
# ---------------------------------------------------------------------------

LON_MULT = 9973
LAT_MULT = 7919


def derive_lonlat(key: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """int64 key -> (lon, lat) on a 0.01-degree grid, WebMercator-safe range.

    lon in [-180, 179.99], lat in [-85, 84.99].  Mirrored by SQL:
    ``-180.0 + ((key * 9973) % 36000) / 100.0`` etc.
    """
    key = np.asarray(key, dtype=np.int64)
    lon = -180.0 + ((key * LON_MULT) % 36000) / 100.0
    lat = -85.0 + ((key * LAT_MULT) % 17000) / 100.0
    return lon, lat


# ---------------------------------------------------------------------------
# CRS: EPSG:4326 <-> EPSG:3857
# ---------------------------------------------------------------------------


def lonlat_to_mercator(lon: np.ndarray, lat: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    lon = np.asarray(lon, dtype=np.float64)
    lat = np.clip(np.asarray(lat, dtype=np.float64), -MAX_MERC_LAT, MAX_MERC_LAT)
    mx = lon * (ORIGIN_SHIFT / 180.0)
    my = np.log(np.tan((90.0 + lat) * (np.pi / 360.0))) * EARTH_RADIUS
    return mx, my


def mercator_to_lonlat(mx: np.ndarray, my: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    mx = np.asarray(mx, dtype=np.float64)
    my = np.asarray(my, dtype=np.float64)
    lon = mx / (ORIGIN_SHIFT / 180.0)
    lat = np.degrees(2.0 * np.arctan(np.exp(my / EARTH_RADIUS)) - np.pi / 2.0)
    return lon, lat


# ---------------------------------------------------------------------------
# XYZ tile addressing (WebMercatorQuad / slippy-map).
# Reference semantics: apps/gdalalg_raster_tile.cpp GetTileIndices.
# ---------------------------------------------------------------------------


def reproject_points(x: np.ndarray, y: np.ndarray, src_crs: str, dst_crs: str):
    """General CRS transform: uses pyproj when importable (the PROJ-backed
    path, ogr/ogrct.cpp role), else the built-in closed forms for
    EPSG:4326 <-> EPSG:3857, else raises.  This is the `reproject` step's
    transformer hook — the sandbox has no pyproj, production does."""
    src, dst = src_crs.upper(), dst_crs.upper()
    if src == dst:
        return np.asarray(x, dtype=np.float64), np.asarray(y, dtype=np.float64)
    try:  # pragma: no cover - pyproj absent in this container
        from pyproj import Transformer

        t = Transformer.from_crs(src, dst, always_xy=True)
        return t.transform(np.asarray(x, dtype=np.float64), np.asarray(y, dtype=np.float64))
    except ImportError:
        pass
    if (src, dst) == ("EPSG:4326", "EPSG:3857"):
        return lonlat_to_mercator(x, y)
    if (src, dst) == ("EPSG:3857", "EPSG:4326"):
        return mercator_to_lonlat(x, y)

    from . import transformer as _tr

    src_p = epsg_params(src)
    dst_p = epsg_params(dst)
    if src == "EPSG:4326" and dst_p is not None:
        fam, kw = dst_p
        return _PROJ_FAMILIES[fam][0](x, y, **kw)
    if src_p is not None and dst == "EPSG:4326":
        fam, kw = src_p
        return _PROJ_FAMILIES[fam][1](x, y, **kw)
    if src_p is not None and dst_p is not None:
        # projected -> projected: chain through geographic
        fam_s, kw_s = src_p
        fam_d, kw_d = dst_p
        lon, lat = _PROJ_FAMILIES[fam_s][1](x, y, **kw_s)
        return _PROJ_FAMILIES[fam_d][0](lon, lat, **kw_d)
    # general path: the data-driven CRS registry (curated EPSG extract,
    # +proj= strings, WKT1), incl. non-WGS84 ellipsoids + datum shifts
    from . import crs as _crs

    return _crs.transform(x, y, src, dst)


def _proj_families():
    from . import transformer as _tr

    return {
        "tmerc": (_tr.tmerc_forward, _tr.tmerc_inverse),
        "lcc": (_tr.lcc_forward, _tr.lcc_inverse),
        "aea": (_tr.aea_forward, _tr.aea_inverse),
        "stereo_polar": (_tr.stereo_polar_forward, _tr.stereo_polar_inverse),
        "eqc": (_tr.eqc_forward, _tr.eqc_inverse),
        "laea": (_tr.laea_forward, _tr.laea_inverse),
        "cea": (_tr.cea_forward, _tr.cea_inverse),
        "merc": (lambda lon, lat: lonlat_to_mercator(lon, lat),
                 lambda x, y: mercator_to_lonlat(x, y)),
    }


class _LazyFamilies(dict):
    def __missing__(self, k):
        self.update(_proj_families())
        return dict.__getitem__(self, k)


_PROJ_FAMILIES = _LazyFamilies()

# Data-driven EPSG routing (reference: ogr/ogrct.cpp PROJ-backed generality;
# here a registry extract of (projection family, parameters) over the
# in-repo Snyder/Krueger kernels).  Datum note: every entry is WGS84-,
# GRS80-, ETRS89-, NAD83-, GDA94- or CGCS2000-based — all coincident with
# WGS84 at or below the ~1-2 m datum-drift level, served on the WGS84
# ellipsoid (GRS80 flattening delta is sub-mm).  Non-WGS84-ellipsoid grids
# (OSGB36 Airy, Hughes sea-ice, Swiss oblique Mercator) are intentionally
# NOT listed rather than silently wrong.
_EPSG_TABLE = {
    # --- Lambert Conformal Conic (2SP) ---
    "EPSG:2154": ("lcc", dict(lon0=3.0, lat1=44.0, lat2=49.0, lat0=46.5,
                              fe=700000.0, fn=6600000.0)),   # RGF93 Lambert-93
    "EPSG:3978": ("lcc", dict(lon0=-95.0, lat1=49.0, lat2=77.0, lat0=49.0)),
    "EPSG:3347": ("lcc", dict(lon0=-91.8666666666667, lat1=49.0, lat2=77.0,
                              lat0=63.390675, fe=6200000.0, fn=3000000.0)),
    # --- Albers Equal-Area ---
    "EPSG:5070": ("aea", dict(lon0=-96.0, lat1=29.5, lat2=45.5, lat0=23.0)),
    "EPSG:6350": ("aea", dict(lon0=-96.0, lat1=29.5, lat2=45.5, lat0=23.0)),
    "EPSG:3577": ("aea", dict(lon0=132.0, lat1=-18.0, lat2=-36.0, lat0=0.0)),
    "EPSG:3338": ("aea", dict(lon0=-154.0, lat1=55.0, lat2=65.0, lat0=50.0)),
    # --- polar stereographic ---
    "EPSG:3413": ("stereo_polar", dict(lon0=-45.0, lat_ts=70.0, north=True)),
    "EPSG:3031": ("stereo_polar", dict(lon0=0.0, lat_ts=-71.0, north=False)),
    "EPSG:3995": ("stereo_polar", dict(lon0=0.0, lat_ts=71.0, north=True)),
    "EPSG:3976": ("stereo_polar", dict(lon0=0.0, lat_ts=-70.0, north=False)),
    # --- transverse mercator national grids (lat0 = 0) ---
    "EPSG:2193": ("tmerc", dict(lon0=173.0, k0=0.9996, fe=1600000.0,
                                fn=10000000.0)),             # NZTM2000
    "EPSG:3067": ("tmerc", dict(lon0=27.0, k0=0.9996, fe=500000.0, fn=0.0)),
    # --- equidistant cylindrical ---
    "EPSG:4087": ("eqc", dict(lon0=0.0, lat_ts=0.0)),
    "EPSG:32662": ("eqc", dict(lon0=0.0, lat_ts=0.0)),       # deprecated alias
    # --- Lambert azimuthal equal-area ---
    "EPSG:3035": ("laea", dict(lon0=10.0, lat0=52.0,
                               fe=4321000.0, fn=3210000.0)), # ETRS89-LAEA
    "EPSG:6931": ("laea", dict(lon0=0.0, lat0=90.0)),        # EASE2 North
    "EPSG:6932": ("laea", dict(lon0=0.0, lat0=-90.0)),       # EASE2 South
    "EPSG:3573": ("laea", dict(lon0=-100.0, lat0=90.0)),     # Arctic LAEA CA
    "EPSG:3574": ("laea", dict(lon0=-40.0, lat0=90.0)),      # Arctic Atlantic
    "EPSG:3575": ("laea", dict(lon0=10.0, lat0=90.0)),       # Arctic Europe
    "EPSG:3576": ("laea", dict(lon0=180.0, lat0=90.0)),      # Arctic Russia
    # --- cylindrical equal-area ---
    "EPSG:6933": ("cea", dict(lon0=0.0, lat_ts=30.0)),       # EASE2 global
    # --- web-mercator aliases ---
    "EPSG:3857": ("merc", {}),
    "EPSG:900913": ("merc", {}),
}


def epsg_params(code: str):
    """(projection family, kernel kwargs) for a projected EPSG code, or
    None.  Table lookups first, then the three UTM zone families:
    EPSG:326xx/327xx (WGS84 N/S), EPSG:258xx (ETRS89 zones 28-38),
    EPSG:269xx (NAD83 zones 1-23)."""
    from . import transformer as _tr

    hit = _EPSG_TABLE.get(code)
    if hit is not None:
        return hit
    if not code.startswith("EPSG:") or not code[5:].isdigit():
        return None
    num = int(code[5:])
    if 4534 <= num <= 4554:  # CGCS2000 / 3-degree Gauss-Kruger CM 75E..135E
        return ("tmerc", dict(lon0=75.0 + 3.0 * (num - 4534), k0=1.0,
                              fe=500000.0, fn=0.0))
    zone = None
    south = False
    if 32601 <= num <= 32660:
        zone = num - 32600
    elif 32701 <= num <= 32760:
        zone, south = num - 32700, True
    elif 25828 <= num <= 25838:   # ETRS89 / UTM
        zone = num - 25800
    elif 26901 <= num <= 26923:   # NAD83 / UTM
        zone = num - 26900
    elif 28348 <= num <= 28358:   # GDA94 / MGA (UTM south)
        zone, south = num - 28300, True
    elif 7846 <= num <= 7859:     # GDA2020 / MGA (UTM south)
        zone, south = num - 7800, True
    if zone is None:
        return None
    lon0, k0, fe, fn = _tr.utm_zone_params(zone, south)
    return ("tmerc", dict(lon0=lon0, k0=k0, fe=fe, fn=fn))


def lonlat_to_tile(lon: np.ndarray, lat: np.ndarray, z: int) -> tuple[np.ndarray, np.ndarray]:
    """(lon, lat) -> (tx, ty) XYZ tile indices at zoom z.

    SQL mirror (keep op order identical):
      tx = least(greatest(cast(floor((lon + 180.0) / 360.0 * n) as bigint), 0), n-1)
      ty = least(greatest(cast(floor((1.0 - ln(tan(radians(lat)) +
             1.0/cos(radians(lat))) / pi()) / 2.0 * n) as bigint), 0), n-1)
    """
    n = float(1 << z)
    lon = np.asarray(lon, dtype=np.float64)
    lat = np.asarray(lat, dtype=np.float64)
    tx = np.floor((lon + 180.0) / 360.0 * n).astype(np.int64)
    lat_rad = np.radians(lat)
    ty = np.floor(
        (1.0 - np.log(np.tan(lat_rad) + 1.0 / np.cos(lat_rad)) / np.pi) / 2.0 * n
    ).astype(np.int64)
    hi = (1 << z) - 1
    return np.clip(tx, 0, hi), np.clip(ty, 0, hi)


def tile_bounds_mercator(z: int, tx: np.ndarray, ty: np.ndarray):
    """Tile -> (minx, miny, maxx, maxy) in EPSG:3857 meters."""
    n = float(1 << z)
    size = 2.0 * ORIGIN_SHIFT / n
    tx = np.asarray(tx, dtype=np.float64)
    ty = np.asarray(ty, dtype=np.float64)
    minx = -ORIGIN_SHIFT + tx * size
    maxy = ORIGIN_SHIFT - ty * size
    return minx, maxy - size, minx + size, maxy


def tile_geotransform(z: int, tx: int, ty: int, tile_px: int = 256):
    """GDAL-style 6-coefficient affine geotransform for one tile
    (reference: gcore/gdal_geotransform.h GDALApplyGeoTransform)."""
    minx, miny, maxx, maxy = tile_bounds_mercator(z, np.array([tx]), np.array([ty]))
    res = (maxx[0] - minx[0]) / tile_px
    return (float(minx[0]), res, 0.0, float(maxy[0]), 0.0, -res)


def apply_geotransform(gt, px: np.ndarray, py: np.ndarray):
    """pixel/line -> georeferenced x/y (GDALApplyGeoTransform semantics)."""
    px = np.asarray(px, dtype=np.float64)
    py = np.asarray(py, dtype=np.float64)
    return gt[0] + px * gt[1] + py * gt[2], gt[3] + px * gt[4] + py * gt[5]


def inv_geotransform(gt):
    """Invert an affine geotransform (GDALInvGeoTransform semantics)."""
    det = gt[1] * gt[5] - gt[2] * gt[4]
    if det == 0.0:
        raise ValueError("non-invertible geotransform")
    inv_det = 1.0 / det
    return (
        (gt[2] * gt[3] - gt[0] * gt[5]) * inv_det,
        gt[5] * inv_det,
        -gt[2] * inv_det,
        (-gt[1] * gt[3] + gt[0] * gt[4]) * inv_det,
        -gt[4] * inv_det,
        gt[1] * inv_det,
    )


# ---------------------------------------------------------------------------
# Space-filling curves: Morton (cell ids / partition keys) and Hilbert
# (physical clustering; reference: alg/hilbert.cpp:80 GDALHilbertCode,
# apps/gdalalg_vector_sort.cpp:351-375).
# ---------------------------------------------------------------------------


def _spread_bits32(v: np.ndarray) -> np.ndarray:
    """Spread the low 32 bits of each uint64 so bit i lands at position 2i."""
    v = v.astype(np.uint64)
    v &= np.uint64(0xFFFFFFFF)
    v = (v | (v << np.uint64(16))) & np.uint64(0x0000FFFF0000FFFF)
    v = (v | (v << np.uint64(8))) & np.uint64(0x00FF00FF00FF00FF)
    v = (v | (v << np.uint64(4))) & np.uint64(0x0F0F0F0F0F0F0F0F)
    v = (v | (v << np.uint64(2))) & np.uint64(0x3333333333333333)
    v = (v | (v << np.uint64(1))) & np.uint64(0x5555555555555555)
    return v


def morton_encode(x: np.ndarray, y: np.ndarray) -> np.ndarray:
    """Interleave (x, y) -> Morton/Z-order code, vectorized."""
    return (_spread_bits32(np.asarray(x)) | (_spread_bits32(np.asarray(y)) << np.uint64(1))).astype(
        np.int64
    )


def _squash_bits32(v: np.ndarray) -> np.ndarray:
    v = v.astype(np.uint64) & np.uint64(0x5555555555555555)
    v = (v | (v >> np.uint64(1))) & np.uint64(0x3333333333333333)
    v = (v | (v >> np.uint64(2))) & np.uint64(0x0F0F0F0F0F0F0F0F)
    v = (v | (v >> np.uint64(4))) & np.uint64(0x00FF00FF00FF00FF)
    v = (v | (v >> np.uint64(8))) & np.uint64(0x0000FFFF0000FFFF)
    v = (v | (v >> np.uint64(16))) & np.uint64(0x00000000FFFFFFFF)
    return v


def morton_decode(code: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    code = np.asarray(code).astype(np.uint64)
    return (
        _squash_bits32(code).astype(np.int64),
        _squash_bits32(code >> np.uint64(1)).astype(np.int64),
    )


def hilbert_encode(x: np.ndarray, y: np.ndarray, order: int = 16) -> np.ndarray:
    """Hilbert curve distance for (x, y) on a 2^order grid, vectorized.

    Standard rotate-and-flip iteration (same curve as alg/hilbert.cpp:80);
    the loop is over ``order`` bits, all array ops inside are vectorized.
    """
    x = np.asarray(x, dtype=np.int64).copy()
    y = np.asarray(y, dtype=np.int64).copy()
    d = np.zeros_like(x)
    s = np.int64(1 << (order - 1))
    while s > 0:
        rx = ((x & s) > 0).astype(np.int64)
        ry = ((y & s) > 0).astype(np.int64)
        d += s * s * ((3 * rx) ^ ry)
        # rotate quadrant
        flip = ry == 0
        swap_mask = flip & (rx == 1)
        x_f = np.where(swap_mask, s - 1 - x, x)
        y_f = np.where(swap_mask, s - 1 - y, y)
        x, y = np.where(flip, y_f, x_f), np.where(flip, x_f, y_f)
        s >>= 1
    return d


# ---------------------------------------------------------------------------
# Cell covers: the engine's H3/S2 stand-in is the XYZ grid at a chosen
# resolution, addressed by (res, tx, ty) packed into one int64 cell id:
#   cell = (res << 58) | morton(tx, ty)
# Neighbor rings and bbox covers are what the spatial join / kNN need.
# ---------------------------------------------------------------------------

_RES_SHIFT = np.uint64(58)


def cell_id(res: int, tx: np.ndarray, ty: np.ndarray) -> np.ndarray:
    return ((np.uint64(res) << _RES_SHIFT) | morton_encode(tx, ty).astype(np.uint64)).astype(
        np.int64
    )


def cell_decode(cell: np.ndarray) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    cell = np.asarray(cell).astype(np.uint64)
    res = (cell >> _RES_SHIFT).astype(np.int64)
    tx, ty = morton_decode(cell & ((np.uint64(1) << _RES_SHIFT) - np.uint64(1)))
    return res, tx, ty


def point_cells(lon: np.ndarray, lat: np.ndarray, res: int) -> np.ndarray:
    tx, ty = lonlat_to_tile(lon, lat, res)
    return cell_id(res, tx, ty)


def bbox_cover_cells(
    minx: np.ndarray,
    miny: np.ndarray,
    maxx: np.ndarray,
    maxy: np.ndarray,
    res: int,
    max_cells_per_box: int = 256,
) -> tuple[np.ndarray, np.ndarray]:
    """Cover each lon/lat bbox with grid cells at ``res``.

    Returns (row_index, cell) pairs — a flat CSR-style expansion suitable for
    building the flat_map side of a partitioned spatial join.  Boxes whose
    cover would exceed ``max_cells_per_box`` raise (caller should use a
    coarser res, or split the feature).
    """
    x0, y1 = lonlat_to_tile(minx, miny, res)  # note: miny -> larger ty
    x1, y0 = lonlat_to_tile(maxx, maxy, res)
    nx = (x1 - x0 + 1).astype(np.int64)
    ny = (y1 - y0 + 1).astype(np.int64)
    counts = nx * ny
    if counts.size and counts.max() > max_cells_per_box:
        raise ValueError(
            f"bbox cover exceeds {max_cells_per_box} cells at res={res}; "
            "use a coarser resolution or split the geometry"
        )
    total = int(counts.sum())
    rows = np.repeat(np.arange(counts.size, dtype=np.int64), counts)
    # per-box local offsets 0..count-1
    starts = np.concatenate(([0], np.cumsum(counts)[:-1]))
    local = np.arange(total, dtype=np.int64) - np.repeat(starts, counts)
    nx_r = np.repeat(nx, counts)
    cx = np.repeat(x0, counts) + local % nx_r
    cy = np.repeat(y0, counts) + local // nx_r
    return rows, cell_id(res, cx, cy)


def neighbor_cells(cell: int, ring: int = 1) -> np.ndarray:
    """All cells within ``ring`` grid steps of ``cell`` (kNN ring expansion)."""
    res, tx, ty = cell_decode(np.array([cell]))
    res, tx, ty = int(res[0]), int(tx[0]), int(ty[0])
    hi = (1 << res) - 1
    xs = np.arange(max(0, tx - ring), min(hi, tx + ring) + 1, dtype=np.int64)
    ys = np.arange(max(0, ty - ring), min(hi, ty + ring) + 1, dtype=np.int64)
    gx, gy = np.meshgrid(xs, ys)
    return cell_id(res, gx.ravel(), gy.ravel())


_PROJ_NAME = {
    "lcc": "lcc", "aea": "aea", "stereo_polar": "stere", "tmerc": "tmerc",
    "eqc": "eqc", "laea": "laea", "aeqd": "aeqd", "sinu": "sinu",
    "stereo": "sterea", "merc": "merc", "webmerc": "webmerc",
}


def srs_info(code: str) -> dict:
    """``gdalsrsinfo`` for the engine's routed CRS set (reference
    ``apps/gdalsrsinfo.cpp`` -o proj4/pretty_wkt surface): the projection
    family, its parameters, and a proj4-style string assembled from them.
    Raises for codes the transformer cannot route — the same honest guard
    the reproject path uses."""
    if code in ("EPSG:4326", "CRS:84"):
        return {"code": "EPSG:4326", "family": "geographic",
                "params": {}, "proj4": "+proj=longlat +datum=WGS84 +no_defs"}
    if code == "EPSG:3857":
        return {"code": code, "family": "webmerc", "params": {},
                "proj4": ("+proj=webmerc +datum=WGS84 +units=m +no_defs")}
    hit = epsg_params(code)
    if hit is None:
        # round 5: fall through to the general CRS registry (non-WGS84
        # ellipsoids, datum shifts, ftUS units)
        from . import crs as _crs

        d = _crs.resolve_crs(code)
        ren = {"lon0": "lon_0", "lat0": "lat_0", "lat1": "lat_1",
               "lat2": "lat_2", "lat_ts": "lat_ts", "lat_c": "lat_0",
               "lat_p": None, "alpha_c": "alpha", "k": "k_0", "k0": "k_0",
               "fe": "x_0", "fn": "y_0", "east_north": None}
        p4 = [f"+proj={_PROJ_NAME.get(d.family, d.family)}"]
        for k, v in d.kw.items():
            rk = ren.get(k, k)
            if rk:
                p4.append(f"+{rk}={v:g}" if not isinstance(v, bool)
                          else f"+{rk}={int(v)}")
        p4.append(f"+a={d.a:.3f}")
        if d.f:
            p4.append(f"+rf={1.0 / d.f:.9f}")
        if d.towgs84:
            p4.append("+towgs84=" + ",".join(f"{x:g}" for x in d.towgs84))
        if d.to_meter != 1.0:
            p4.append(f"+to_meter={d.to_meter:.12f}")
        else:
            p4.append("+units=m")
        p4.append("+no_defs")
        return {"code": code, "family": d.family, "params": dict(d.kw),
                "proj4": " ".join(p4), "name": d.name}
    family, params = hit
    p4 = [f"+proj={_PROJ_NAME.get(family, family)}"]
    ren = {"lon0": "lon_0", "lat0": "lat_0", "lat1": "lat_1",
           "lat2": "lat_2", "lat_ts": "lat_ts", "k0": "k_0",
           "fe": "x_0", "fn": "y_0"}
    for k, v in params.items():
        if k == "north":
            p4.append(f"+lat_0={90.0 if v else -90.0}")
            continue
        if k in ren:
            p4.append(f"+{ren[k]}={v:g}")
    p4 += ["+datum=WGS84", "+units=m", "+no_defs"]
    return {"code": code, "family": family, "params": dict(params),
            "proj4": " ".join(p4)}
