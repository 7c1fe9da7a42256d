"""Minimal pure-Python/numpy WKB codec.

The reference's geometry wire format is WKB (OGRLayer Arrow bridge tags the
geometry column ``ARROW:extension:name = ogc.wkb``, reference:
``ogr/ogrsf_frmts/generic/ogrlayerarrow.cpp:443-566``,
``perftests/bench_ogr_to_geopandas.py:30-33``).  We carry geometry the same
way: a ``binary`` Arrow column of little-endian WKB.

Supported types: Point (1), LineString (2), Polygon (3), MultiPoint (4),
MultiLineString (5), MultiPolygon (6).  2-D only (GDAL Z/M variants are out of
scope for the sandbox corpus).

Bulk point encode/decode is fully vectorized (the hot path: the document
corpus is point-dominant); polygon parse is per-geometry Python over numpy
views (the polygon side of joins is small and parsed once per actor).
"""

from __future__ import annotations

import struct

import numpy as np

POINT = 1
LINESTRING = 2
POLYGON = 3
MULTIPOINT = 4
MULTILINESTRING = 5
MULTIPOLYGON = 6
GEOMETRYCOLLECTION = 7
CIRCULARSTRING = 8  # ISO SQL/MM curve: arcs through consecutive point triples
COMPOUNDCURVE = 9   # sequence of LineString / CircularString segments
CURVEPOLYGON = 10   # polygon whose rings may be curves
MULTICURVE = 11     # collection of LineString / CircularString / CompoundCurve
MULTISURFACE = 12   # collection of Polygon / CurvePolygon
POLYHEDRALSURFACE = 15  # ISO surface: contiguous polygon patches
TIN = 16                # triangulated irregular network: Triangle patches
TRIANGLE = 17           # polygon restricted to one 4-point ring

_POINT_SIZE = 21  # 1 byte order + 4 type + 16 coords


def encode_points(x: np.ndarray, y: np.ndarray) -> list[bytes]:
    """Vectorized bulk encode of POINT WKBs; returns a list of bytes objects."""
    x = np.asarray(x, dtype="<f8")
    y = np.asarray(y, dtype="<f8")
    n = x.size
    buf = np.empty((n, _POINT_SIZE), dtype=np.uint8)
    buf[:, 0] = 1  # little-endian
    buf[:, 1:5] = np.frombuffer(struct.pack("<I", POINT), dtype=np.uint8)
    buf[:, 5:13] = x.reshape(-1, 1).view(np.uint8)
    buf[:, 13:21] = y.reshape(-1, 1).view(np.uint8)
    return [row.tobytes() for row in buf]


def decode_points(wkbs) -> tuple[np.ndarray, np.ndarray]:
    """Vectorized bulk decode of uniform POINT WKBs -> (x, y)."""
    arr = np.frombuffer(b"".join(wkbs), dtype=np.uint8).reshape(-1, _POINT_SIZE)
    x = arr[:, 5:13].copy().view("<f8").ravel()
    y = arr[:, 13:21].copy().view("<f8").ravel()
    return x, y


def encode_polygon(rings: list[np.ndarray]) -> bytes:
    """rings: list of (N, 2) float64 arrays, first = shell, rest = holes.
    Rings must be closed (first == last vertex)."""
    out = [b"\x01", struct.pack("<II", POLYGON, len(rings))]
    for ring in rings:
        ring = np.asarray(ring, dtype="<f8")
        out.append(struct.pack("<I", len(ring)))
        out.append(ring.tobytes())
    return b"".join(out)


def encode_linestring(pts: np.ndarray) -> bytes:
    pts = np.asarray(pts, dtype="<f8")
    return b"\x01" + struct.pack("<II", LINESTRING, len(pts)) + pts.tobytes()


def encode_circularstring(pts: np.ndarray) -> bytes:
    """(N, 2) control points, N odd >= 3: arc k passes through points
    (2k, 2k+1, 2k+2) per ISO SQL/MM (ogr/ogr_core.h wkbCircularString)."""
    pts = np.asarray(pts, dtype="<f8")
    if len(pts) < 3 or len(pts) % 2 == 0:
        raise ValueError(f"CircularString needs an odd point count >= 3 "
                         f"(got {len(pts)})")
    return b"\x01" + struct.pack("<II", CIRCULARSTRING, len(pts)) + pts.tobytes()


def encode_geometrycollection(members: list[bytes]) -> bytes:
    """Members are full WKBs of any supported geometry."""
    return (b"\x01" + struct.pack("<II", GEOMETRYCOLLECTION, len(members))
            + b"".join(members))


def encode_compoundcurve(members: list[bytes]) -> bytes:
    """Members are full WKBs of LineString / CircularString segments whose
    endpoints chain (ISO SQL/MM CompoundCurve)."""
    return (b"\x01" + struct.pack("<II", COMPOUNDCURVE, len(members))
            + b"".join(members))


def encode_curvepolygon(rings: list[bytes]) -> bytes:
    """Rings are full WKBs of closed LineString / CircularString /
    CompoundCurve geometries (ISO SQL/MM CurvePolygon)."""
    return (b"\x01" + struct.pack("<II", CURVEPOLYGON, len(rings))
            + b"".join(rings))


def encode_multipolygon(polys: list[list[np.ndarray]]) -> bytes:
    out = [b"\x01", struct.pack("<II", MULTIPOLYGON, len(polys))]
    for rings in polys:
        out.append(encode_polygon(rings))
    return b"".join(out)


def encode_triangle(rings: list[np.ndarray]) -> bytes:
    """Triangle (WKB 17): a polygon body restricted to one 4-point ring."""
    if len(rings) != 1 or len(rings[0]) != 4:
        raise ValueError("Triangle needs exactly one closed 4-point ring")
    body = encode_polygon(rings)
    return b"\x01" + struct.pack("<I", TRIANGLE) + body[5:]


def encode_surface(polys: list[list[np.ndarray]], kind: int) -> bytes:
    """PolyhedralSurface (15: Polygon patches) / TIN (16: Triangle
    patches)."""
    if kind not in (POLYHEDRALSURFACE, TIN):
        raise ValueError(f"kind must be PolyhedralSurface or TIN, got {kind}")
    out = [b"\x01", struct.pack("<II", kind, len(polys))]
    for rings in polys:
        out.append(encode_triangle(rings) if kind == TIN
                   else encode_polygon(rings))
    return b"".join(out)


def encode_geom(g: "Geom") -> bytes:
    """Re-serialize a parsed 2-D Geom (linear types + CircularString)."""
    if g.kind == POINT:
        return encode_points(g.parts[0][:, 0], g.parts[0][:, 1])[0]
    if g.kind == LINESTRING:
        return encode_linestring(g.parts[0])
    if g.kind == CIRCULARSTRING:
        return encode_circularstring(g.parts[0])
    if g.kind == POLYGON:
        return encode_polygon(g.parts[0])
    if g.kind == MULTIPOLYGON:
        return encode_multipolygon(g.parts)
    if g.kind in (MULTIPOINT, MULTILINESTRING):
        member = POINT if g.kind == MULTIPOINT else LINESTRING
        out = [b"\x01", struct.pack("<II", g.kind, len(g.parts))]
        for pts in g.parts:
            out.append(encode_points(pts[:, 0], pts[:, 1])[0]
                       if member == POINT else encode_linestring(pts))
        return b"".join(out)
    if g.kind == COMPOUNDCURVE:
        return encode_compoundcurve([encode_geom(m) for m in g.parts])
    if g.kind == CURVEPOLYGON:
        return encode_curvepolygon([encode_geom(m) for m in g.parts])
    if g.kind == GEOMETRYCOLLECTION:
        return encode_geometrycollection([encode_geom(m) for m in g.parts])
    if g.kind in (MULTICURVE, MULTISURFACE):
        return (b"\x01" + struct.pack("<II", g.kind, len(g.parts))
                + b"".join(encode_geom(m) for m in g.parts))
    if g.kind == TRIANGLE:
        return encode_triangle(g.parts[0])
    if g.kind in (POLYHEDRALSURFACE, TIN):
        return encode_surface(g.parts, g.kind)
    raise ValueError(f"cannot re-encode geometry kind {g.kind}")


class Geom:
    """Parsed geometry: kind + list of parts.

    - POINT: parts = [(1,2) array]
    - LINESTRING: parts = [(N,2) array]
    - POLYGON: parts = [rings]  (one entry: list of (N,2) rings)
    - MULTI*: parts = list of the member parts
    """

    __slots__ = ("kind", "parts")

    def __init__(self, kind: int, parts):
        self.kind = kind
        self.parts = parts

    def rings(self) -> list[np.ndarray]:
        """All polygon rings (shells + holes) flattened; [] for non-areal."""
        if self.kind in (POLYGON, TRIANGLE):
            return self.parts[0]
        if self.kind in (MULTIPOLYGON, POLYHEDRALSURFACE, TIN):
            return [r for rings in self.parts for r in rings]
        return []

    def shells_and_holes(self) -> list[list[np.ndarray]]:
        """List of polygons, each a list of rings (shell first).
        PolyhedralSurface/TIN patches each count as one polygon (the
        reference's get_Area over surfaces sums patch areas,
        ogr/ogrpolyhedralsurface.cpp)."""
        if self.kind in (POLYGON, TRIANGLE):
            return [self.parts[0]]
        if self.kind in (MULTIPOLYGON, POLYHEDRALSURFACE, TIN):
            return self.parts
        return []

    def vertices(self) -> np.ndarray:
        """All vertices stacked (N, 2)."""
        arrs = []
        if self.kind in (POINT, LINESTRING):
            arrs = self.parts
        elif self.kind == POLYGON:
            arrs = self.parts[0]
        elif self.kind in (MULTIPOINT, MULTILINESTRING):
            arrs = self.parts
        elif self.kind in (MULTIPOLYGON, POLYHEDRALSURFACE, TIN):
            arrs = [r for rings in self.parts for r in rings]
        elif self.kind == TRIANGLE:
            arrs = self.parts[0]
        return np.concatenate(arrs, axis=0) if arrs else np.empty((0, 2))

    def bbox(self) -> tuple[float, float, float, float]:
        v = self.vertices()
        return (v[:, 0].min(), v[:, 1].min(), v[:, 0].max(), v[:, 1].max())


def _parse(buf: memoryview, off: int, allow_zm: bool = False) -> tuple[Geom, int]:
    byte_order = buf[off]
    fmt = "<" if byte_order == 1 else ">"
    (raw_type,) = struct.unpack_from(fmt + "I", buf, off + 1)
    off += 5
    if raw_type & 0x20000000:  # EWKB SRID flag: skip the 4-byte SRID value
        off += 4
    has_z = bool(raw_type & 0x80000000)  # EWKB flags
    has_m = bool(raw_type & 0x40000000)
    base = raw_type & 0x1FFFFFFF  # SRID flag stripped
    if base >= 1000:  # ISO type codes: 1000+Z, 2000+M, 3000+ZM
        has_z |= (base // 1000) in (1, 3)
        has_m |= (base // 1000) in (2, 3)
        base %= 1000
    if (has_z or has_m) and not allow_zm:
        raise ValueError(
            f"WKB Z/M variant (type {raw_type:#x}): this engine computes in "
            f"2-D — route through geomops.force_2d_batch (ogr2ogr -dim XY) "
            f"to drop the extra ordinates explicitly")
    dim = 2 + has_z + has_m
    gtype = base
    if gtype == POINT:
        pt = np.frombuffer(buf, dtype=fmt + "f8", count=dim, offset=off
                           ).reshape(1, dim)[:, :2]
        return Geom(POINT, [pt]), off + 8 * dim
    if gtype in (LINESTRING, CIRCULARSTRING):
        (n,) = struct.unpack_from(fmt + "I", buf, off)
        off += 4
        pts = np.frombuffer(buf, dtype=fmt + "f8", count=dim * n, offset=off
                            ).reshape(n, dim)[:, :2]
        return Geom(gtype, [pts]), off + 8 * dim * n
    if gtype in (POLYGON, TRIANGLE):
        (nrings,) = struct.unpack_from(fmt + "I", buf, off)
        off += 4
        rings = []
        for _ in range(nrings):
            (n,) = struct.unpack_from(fmt + "I", buf, off)
            off += 4
            rings.append(np.frombuffer(buf, dtype=fmt + "f8", count=dim * n,
                                       offset=off).reshape(n, dim)[:, :2])
            off += 8 * dim * n
        if gtype == TRIANGLE and (len(rings) != 1 or len(rings[0]) != 4):
            raise ValueError("WKB Triangle must be one closed 4-point ring "
                             "(ogr/ogrtriangle.cpp importFromWkb contract)")
        return Geom(gtype, [rings]), off
    if gtype in (COMPOUNDCURVE, CURVEPOLYGON, GEOMETRYCOLLECTION,
                 MULTICURVE, MULTISURFACE):
        (nparts,) = struct.unpack_from(fmt + "I", buf, off)
        off += 4
        members = []
        for _ in range(nparts):
            g, off = _parse(buf, off, allow_zm)
            members.append(g)  # full member Geoms (kind matters downstream)
        return Geom(gtype, members), off
    if gtype in (MULTIPOINT, MULTILINESTRING, MULTIPOLYGON,
                 POLYHEDRALSURFACE, TIN):
        (nparts,) = struct.unpack_from(fmt + "I", buf, off)
        off += 4
        parts = []
        for _ in range(nparts):
            g, off = _parse(buf, off, allow_zm)
            # member Geom stores its payload at parts[0] for every member
            # kind (point/linestring array, or a polygon's ring list)
            parts.append(g.parts[0])
        return Geom(gtype, parts), off
    raise ValueError(f"unsupported WKB geometry type {gtype}")


def decode(wkb: bytes, allow_zm: bool = False) -> Geom:
    """Parse a WKB.  ``allow_zm=True`` accepts ISO/EWKB Z/M variants and
    DROPS the extra ordinates (the force-2d read mode); the default is
    strict 2-D so Z data can't silently lose its third dimension."""
    g, _ = _parse(memoryview(wkb), 0, allow_zm)
    return g


def geom_type(wkb: bytes) -> int:
    fmt = "<" if wkb[0] == 1 else ">"
    (gtype,) = struct.unpack_from(fmt + "I", wkb, 1)
    return gtype & 0xFF


def bboxes(wkbs) -> np.ndarray:
    """(N, 4) array of (minx, miny, maxx, maxy) for a column of WKBs."""
    out = np.empty((len(wkbs), 4), dtype=np.float64)
    for i, w in enumerate(wkbs):
        out[i] = decode(w).bbox()
    return out


def ring_area(ring: np.ndarray) -> float:
    """Signed shoelace area (positive = CCW)."""
    x, y = ring[:, 0], ring[:, 1]
    return 0.5 * float(np.sum(x[:-1] * y[1:] - x[1:] * y[:-1]))


def geom_area(g: Geom) -> float:
    """Areal area: |shell| - |holes| per polygon, summed (GEOS Area semantics,
    reference: ogr/ogrgeometry.cpp OGR_G_Area)."""
    total = 0.0
    for rings in g.shells_and_holes():
        if not rings:
            continue
        total += abs(ring_area(rings[0]))
        for hole in rings[1:]:
            total -= abs(ring_area(hole))
    return total


def geom_centroid(g: Geom) -> tuple[float, float]:
    """Area-weighted centroid for areal geoms; vertex mean otherwise."""
    polys = g.shells_and_holes()
    if polys:
        cx = cy = a_sum = 0.0
        for rings in polys:
            for j, ring in enumerate(rings):
                x, y = ring[:-1, 0], ring[:-1, 1]
                x1, y1 = ring[1:, 0], ring[1:, 1]
                cross = x * y1 - x1 * y
                a = cross.sum() / 2.0
                if a == 0:
                    continue
                sign = 1.0 if j == 0 else -1.0
                cx += sign * abs(a) * float(((x + x1) * cross).sum() / (6.0 * a))
                cy += sign * abs(a) * float(((y + y1) * cross).sum() / (6.0 * a))
                a_sum += sign * abs(a)
        if a_sum != 0:
            return cx / a_sum, cy / a_sum
    v = g.vertices()
    return float(v[:, 0].mean()), float(v[:, 1].mean())
