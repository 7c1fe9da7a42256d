"""Deterministic synthetic fixtures (FIXTURES.md F1-F5).

Mirrors the reference's autotest style (tiny seeded synthetic inputs + exact
golden assertions, e.g. ``autotest/alg/rasterize.py:26-70``): every generator
is a pure function of integer keys, so oracles can recompute inputs without
sharing code paths.

The authoritative corpus shape (BASELINE.json input_hint) is
``(doc_id: string, spans: list<struct<kind,text,media_ref,offset>>)``; the
engine derives lon/lat/wkb geometry columns from the numeric part of doc_id
(see ``gdal_ray.functions.geo.derive_lonlat``).

Lance is the nominal storage format; this container has no ``lance`` package,
so parquet files stand in (same Arrow schema either way — see
``gdal_ray.sources.io.read_table``).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..functions import geo, wkb

SPAN_KINDS = ("text", "image", "audio", "video")

SPANS_TYPE = pa.list_(
    pa.struct(
        [
            pa.field("kind", pa.string()),
            pa.field("text", pa.string()),
            pa.field("media_ref", pa.string()),
            pa.field("offset", pa.int32()),
        ]
    )
)

DOCS_SCHEMA = pa.schema(
    [
        pa.field("doc_id", pa.string()),
        pa.field("spans", SPANS_TYPE),
    ]
)

_WORDS = (
    "raster vector tile warp merge cell join span layer band pixel zone "
    "index stream batch arrow shuffle actor block mosaic"
).split()


def doc_key_to_id(keys: np.ndarray) -> pa.Array:
    """int64 key -> canonical doc_id string 'doc-%09d'."""
    return pa.array([f"doc-{int(k):09d}" for k in keys], type=pa.string())


def doc_id_to_key(doc_ids) -> np.ndarray:
    """Inverse of doc_key_to_id, vectorized enough for batch use.
    Slices to end-of-string: %09d zero-PADS but does not truncate, so keys
    >= 1e9 format to 10+ digits and must parse fully."""
    import pyarrow.compute as pc

    arr = doc_ids if isinstance(doc_ids, (pa.Array, pa.ChunkedArray)) else pa.array(doc_ids)
    return pc.cast(pc.utf8_slice_codeunits(arr, 4, 2**30), pa.int64()).to_numpy(
        zero_copy_only=False
    )


def _span_text(key: int, j: int) -> str:
    h = (key * 2654435761 + j * 40503) & 0xFFFFFFFF
    return " ".join(_WORDS[(h >> (3 * i)) % len(_WORDS)] for i in range(1 + h % 7))


def make_docs(n: int, start_key: int = 0) -> pa.Table:
    """The interleaved corpus: deterministic spans per doc.

    span count = 1 + key % 4; kinds cycle through SPAN_KINDS seeded by key;
    offsets strictly increasing.  Pure function of key -> reproducible at any
    shard boundary (generate shard [a, b) with start_key=a).
    """
    keys = np.arange(start_key, start_key + n, dtype=np.int64)
    kinds, texts, refs, offsets = [], [], [], []
    span_offsets = [0]
    for k in keys:
        nspans = 1 + int(k) % 4
        off = 0
        for j in range(nspans):
            kind = SPAN_KINDS[(int(k) + j) % len(SPAN_KINDS)]
            kinds.append(kind)
            if kind == "text":
                t = _span_text(int(k), j)
                texts.append(t)
                refs.append("")
                off += len(t)
            else:
                texts.append("")
                refs.append(f"media://{kind}/{int(k):09d}/{j}")
                off += 1
            offsets.append(off)
        span_offsets.append(span_offsets[-1] + nspans)
    structs = pa.StructArray.from_arrays(
        [
            pa.array(kinds, type=pa.string()),
            pa.array(texts, type=pa.string()),
            pa.array(refs, type=pa.string()),
            pa.array(np.asarray(offsets, dtype=np.int32)),
        ],
        names=["kind", "text", "media_ref", "offset"],
    )
    spans = pa.ListArray.from_arrays(pa.array(span_offsets, type=pa.int32()), structs)
    return pa.table({"doc_id": doc_key_to_id(keys), "spans": spans})


def docs_with_geometry(docs: pa.Table) -> pa.Table:
    """Attach derived lon/lat/wkb columns (engine-materialized, F1)."""
    keys = doc_id_to_key(docs["doc_id"])
    lon, lat = geo.derive_lonlat(keys)
    return (
        docs.append_column("lon", pa.array(lon))
        .append_column("lat", pa.array(lat))
        .append_column("wkb", pa.array(wkb.encode_points(lon, lat), type=pa.binary()))
    )


# ---------------------------------------------------------------------------
# Zones (F2): SQL-derivable rectangles + literal edge-case polygons
# ---------------------------------------------------------------------------

ZONE_MINX_MULT, ZONE_MINX_MOD = 7321, 33000
ZONE_MINY_MULT, ZONE_MINY_MOD = 4231, 15000
ZONE_W_MULT, ZONE_W_MOD = 131, 800
ZONE_H_MULT, ZONE_H_MOD = 197, 600


def zone_rects_from_keys(keys: np.ndarray, consts=None):
    """int64 key -> rectangle (minx, miny, maxx, maxy), exact 0.01-grid
    arithmetic mirrored by SQL in __ray_entry__.oracle_sql.  ``consts``
    overrides the (mult, mod) scheme to derive independent layers from other
    key columns (e.g. the customer-key zones of the polygon join)."""
    c = consts or dict(
        minx_mult=ZONE_MINX_MULT, minx_mod=ZONE_MINX_MOD,
        miny_mult=ZONE_MINY_MULT, miny_mod=ZONE_MINY_MOD,
        w_mult=ZONE_W_MULT, w_mod=ZONE_W_MOD,
        h_mult=ZONE_H_MULT, h_mod=ZONE_H_MOD,
    )
    keys = np.asarray(keys, dtype=np.int64)
    minx = -180.0 + ((keys * c["minx_mult"]) % c["minx_mod"]) / 100.0
    miny = -85.0 + ((keys * c["miny_mult"]) % c["miny_mod"]) / 100.0
    w = 2.0 + ((keys * c["w_mult"]) % c["w_mod"]) / 100.0
    h = 2.0 + ((keys * c["h_mult"]) % c["h_mod"]) / 100.0
    return minx, miny, minx + w, miny + h


def rect_wkbs(minx, miny, maxx, maxy) -> list[bytes]:
    """Axis-aligned rectangle rings -> WKB polygons (shared by every
    rect-layer builder)."""
    out = []
    for i in range(len(minx)):
        ring = np.array(
            [
                [minx[i], miny[i]],
                [maxx[i], miny[i]],
                [maxx[i], maxy[i]],
                [minx[i], maxy[i]],
                [minx[i], miny[i]],
            ]
        )
        out.append(wkb.encode_polygon([ring]))
    return out


def make_rect_zones(keys: np.ndarray, consts=None) -> pa.Table:
    minx, miny, maxx, maxy = zone_rects_from_keys(keys, consts)
    wkbs = rect_wkbs(minx, miny, maxx, maxy)
    return pa.table(
        {
            "zone_id": pa.array([f"zone-{int(k):06d}" for k in keys]),
            "zone_key": pa.array(np.asarray(keys, dtype=np.int64)),
            "minx": pa.array(minx),
            "miny": pa.array(miny),
            "maxx": pa.array(maxx),
            "maxy": pa.array(maxy),
            "wkb": pa.array(wkbs, type=pa.binary()),
        }
    )


def make_edge_case_zones() -> pa.Table:
    """Literal autotest-style fixtures: hole, sliver, shared-edge pair,
    nested containment, concave L-shape (FIXTURES.md F2)."""
    sq = lambda x0, y0, x1, y1: np.array(
        [[x0, y0], [x1, y0], [x1, y1], [x0, y1], [x0, y0]], float
    )
    geoms = {
        "ez-hole": wkb.encode_polygon([sq(0, 0, 10, 10), sq(4, 4, 6, 6)]),
        "ez-sliver": wkb.encode_polygon(
            [np.array([[20, 0], [30, 0.001], [30, 0.002], [20, 0.001], [20, 0]])]
        ),
        "ez-adj-a": wkb.encode_polygon([sq(40, 0, 45, 10)]),
        "ez-adj-b": wkb.encode_polygon([sq(45, 0, 50, 10)]),
        "ez-outer": wkb.encode_polygon([sq(60, 0, 80, 20)]),
        "ez-inner": wkb.encode_polygon([sq(65, 5, 75, 15)]),
        "ez-concave": wkb.encode_polygon(
            [np.array([[-60, 0], [-40, 0], [-40, 20], [-50, 20], [-50, 10], [-60, 10], [-60, 0]], float)]
        ),
        "ez-multi": wkb.encode_multipolygon([[sq(-30, 30, -25, 35)], [sq(-20, 30, -15, 35)]]),
    }
    boxes = wkb.bboxes(list(geoms.values()))
    return pa.table(
        {
            "zone_id": pa.array(list(geoms.keys())),
            "zone_key": pa.array(np.arange(len(geoms), dtype=np.int64)),
            "minx": pa.array(boxes[:, 0]),
            "miny": pa.array(boxes[:, 1]),
            "maxx": pa.array(boxes[:, 2]),
            "maxy": pa.array(boxes[:, 3]),
            "wkb": pa.array(list(geoms.values()), type=pa.binary()),
        }
    )


# ---------------------------------------------------------------------------
# Raster tile fixtures (F3)
# ---------------------------------------------------------------------------


RECTS = ((10, 8, 30, 24), (55, 45, 80, 65), (100, 82, 130, 106), (145, 119, 180, 139))


def make_raster_tiles(kind: str, nx: int, ny: int, size: int = 64, z: int = 4) -> pa.Table:
    """Tile table per F3: kinds 'checker' | 'ramp' | 'blobs' | 'rects' |
    'donut' | 'hump'.

    data = C-order uint8 (checker/blobs/rects) or float32 (ramp) bytes.
    Global pixel coordinates: gx = x*size + col, gy = y*size + row.
    'rects' = four disjoint axis-aligned rectangles (RECTS, half-open
    [x0,x1) x [y0,y1), value r+1), most crossing tile borders — the
    separations are > 1 px so component structure is closed-form (the
    SQL-oracle-able footprint fixture)."""
    zs, xs, ys, dtypes, datas = [], [], [], [], []
    for ty in range(ny):
        for tx in range(nx):
            gy, gx = np.mgrid[0:size, 0:size]
            gx = gx + tx * size
            gy = gy + ty * size
            if kind == "checker":
                arr = (((gx // 8) + (gy // 8)) % 2).astype(np.uint8) * 255
                dtype = "uint8"
            elif kind == "ramp":
                arr = (gx + gy).astype(np.float32)
                dtype = "float32"
            elif kind == "blobs":
                arr = np.zeros((size, size), dtype=np.uint8)
                # deterministic discs, several crossing tile borders
                for b in range(6):
                    cx = (b * 157) % (nx * size)
                    cy = (b * 211) % (ny * size)
                    r = 10 + (b * 7) % 20
                    arr[(gx - cx) ** 2 + (gy - cy) ** 2 <= r * r] = b + 1
                dtype = "uint8"
            elif kind == "rects":
                arr = np.zeros((size, size), dtype=np.uint8)
                for r, (x0, y0, x1, y1) in enumerate(RECTS):
                    arr[(gx >= x0) & (gx < x1) & (gy >= y0) & (gy < y1)] = r + 1
                dtype = "uint8"
            elif kind == "donut":
                # square annulus crossing every tile border: outer [20,172)^2
                # minus inner [60,132)^2, value 7 — the hole-ring fixture
                outer = (gx >= 20) & (gx < 172) & (gy >= 20) & (gy < 172)
                inner = (gx >= 60) & (gx < 132) & (gy >= 60) & (gy < 132)
                arr = np.where(outer & ~inner, 7, 0).astype(np.uint8)
                dtype = "uint8"
            elif kind == "hump":
                # paraboloid bowl: exact dyadic-rational float32 values
                # ((gx-96)^2 + (gy-96)^2) / 64 — spatially varying gradient
                # direction/magnitude (the shading-variant fixture; SQL-exact)
                arr = (((gx - 96) ** 2 + (gy - 96) ** 2) / 64.0).astype(np.float32)
                dtype = "float32"
            elif kind == "diag":
                # 8-connectivity fixture: a main-diagonal chain (crosses tile
                # corners exactly — the 4-tile NW-SE junction), an
                # anti-diagonal chain (NE-SW junction), and a hollow diamond
                # |dx|+|dy| == 12 (8-connected wall enclosing a 4-connected
                # complement hole).  All disjoint; closed-form counts.
                arr = np.zeros((size, size), dtype=np.uint8)
                arr[(gx == gy) & (gx >= 10) & (gx <= 180)] = 1
                arr[(gx + gy == 191) & (gx >= 20) & (gx <= 170)] = 2
                arr[np.abs(gx - 64) + np.abs(gy - 96) == 12] = 3
                dtype = "uint8"
            else:
                raise ValueError(kind)
            zs.append(z)
            xs.append(tx)
            ys.append(ty)
            dtypes.append(dtype)
            datas.append(arr.tobytes())
    n = len(datas)
    return pa.table(
        {
            "z": pa.array(zs, type=pa.int16()),
            "x": pa.array(xs, type=pa.int32()),
            "y": pa.array(ys, type=pa.int32()),
            "band": pa.array([1] * n, type=pa.int8()),
            "width": pa.array([size] * n, type=pa.int32()),
            "height": pa.array([size] * n, type=pa.int32()),
            "crs": pa.array(["EPSG:3857"] * n),
            "nodata": pa.array([0.0] * n),
            "dtype": pa.array(dtypes),
            "data": pa.array(datas, type=pa.binary()),
        }
    )


def make_footprint_layer(rect, a: int, b: int, mod: int,
                         nx: int, ny: int, size: int = 64, z: int = 4) -> pa.Table:
    """Tile table for one mosaic SOURCE with a rectangular footprint: value
    ((a*gx + b*gy) % mod) + 1 inside the half-open rect [x0,x1) x [y0,y1)
    (always >= 1, so 0 is unambiguously nodata), 0 outside.  The
    feather-blend fixture (rastermap.mosaic_blend): closed-form per-pixel
    values + a straight-edged footprint make the density ramp SQL-exact."""
    x0, y0, x1, y1 = rect
    zs, xs, ys, datas = [], [], [], []
    for ty in range(ny):
        for tx in range(nx):
            gy, gx = np.mgrid[0:size, 0:size]
            gx = gx + tx * size
            gy = gy + ty * size
            inside = (gx >= x0) & (gx < x1) & (gy >= y0) & (gy < y1)
            arr = np.where(inside, (a * gx + b * gy) % mod + 1, 0).astype(np.uint8)
            zs.append(z)
            xs.append(tx)
            ys.append(ty)
            datas.append(arr.tobytes())
    n = len(datas)
    return pa.table(
        {
            "z": pa.array(zs, type=pa.int16()),
            "x": pa.array(xs, type=pa.int32()),
            "y": pa.array(ys, type=pa.int32()),
            "band": pa.array([1] * n, type=pa.int8()),
            "width": pa.array([size] * n, type=pa.int32()),
            "height": pa.array([size] * n, type=pa.int32()),
            "crs": pa.array(["EPSG:3857"] * n),
            "nodata": pa.array([0.0] * n),
            "dtype": pa.array(["uint8"] * n),
            "data": pa.array(datas, type=pa.binary()),
        }
    )


def make_pixel_zones(keys: np.ndarray) -> pa.Table:
    """Zone rectangles in RASTER PIXEL coordinates with dyadic (1/16 px)
    bounds, for the fractional-coverage zonal fixture: bounds on a 2^-4
    grid make every pixel-overlap product exact in float64, so the
    coverage sums are bit-stable against the SQL closed form regardless of
    fold order.  Sized to stay inside a 4x4-tile (256 px) raster."""
    keys = np.asarray(keys, dtype=np.int64)
    x0 = ((keys * 7) % 3520) / 16.0
    y0 = ((keys * 11) % 3520) / 16.0
    x1 = x0 + 2.0 + ((keys * 5) % 320) / 16.0
    y1 = y0 + 2.0 + ((keys * 3) % 320) / 16.0
    return pa.table({
        "zone_key": pa.array(keys),
        "minx": pa.array(x0), "miny": pa.array(y0),
        "maxx": pa.array(x1), "maxy": pa.array(y1),
        "wkb": pa.array(rect_wkbs(x0, y0, x1, y1), type=pa.binary()),
    })
