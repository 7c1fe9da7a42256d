"""Geometry scalar operators (1 -> 1 / 1 -> N transforms on WKB columns).

Re-answers the `gdal vector geom` family (reference: Buffer
``ogr/ogrgeometry.cpp:4949``, Simplify :6778, ConvexHull :4449, Centroid via
GEOS, explode-collections ``apps/gdalalg_vector_explode_collections.h``,
segmentize ``apps/gdalalg_vector_segmentize.h:28``, swap-xy, set-precision
:7024) as stateless ``map_batches`` bodies over WKB columns — no GEOS;
algorithms are own implementations (shoelace, monotone chain, Douglas-Peucker,
circular point buffer).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..functions import wkb as _wkb


def area_centroid_batch(batch: pa.Table, wkb_col: str = "wkb") -> pa.Table:
    """Append area, cx, cy computed from the WKB geometry."""
    areas, cxs, cys = [], [], []
    for w in batch[wkb_col].to_pylist():
        g = _wkb.decode(w)
        areas.append(_wkb.geom_area(g))
        cx, cy = _wkb.geom_centroid(g)
        cxs.append(cx)
        cys.append(cy)
    return (
        batch.append_column("area", pa.array(areas, pa.float64()))
        .append_column("cx", pa.array(cxs, pa.float64()))
        .append_column("cy", pa.array(cys, pa.float64()))
    )


def bbox_batch(batch: pa.Table, wkb_col: str = "wkb") -> pa.Table:
    boxes = _wkb.bboxes(batch[wkb_col].to_pylist())
    out = batch
    for i, name in enumerate(("minx", "miny", "maxx", "maxy")):
        if name not in batch.column_names:
            out = out.append_column(name, pa.array(boxes[:, i]))
    return out


def buffer_points_batch(batch: pa.Table, distance: float, segments: int = 16,
                        wkb_col: str = "wkb") -> pa.Table:
    """Point buffer -> regular polygon approximation of the circle (the
    GEOS Buffer quadrant-segments model)."""
    ang = np.linspace(0.0, 2.0 * np.pi, segments, endpoint=False)
    ca, sa = np.cos(ang), np.sin(ang)
    out = []
    for w in batch[wkb_col].to_pylist():
        g = _wkb.decode(w)
        v = g.vertices()[0]
        ring = np.column_stack([v[0] + distance * ca, v[1] + distance * sa])
        ring = np.vstack([ring, ring[:1]])
        out.append(_wkb.encode_polygon([ring]))
    return batch.set_column(
        batch.column_names.index(wkb_col), wkb_col, pa.array(out, pa.binary())
    )


def _dp_simplify(pts: np.ndarray, tol: float) -> np.ndarray:
    """Douglas-Peucker (matches OGR Simplify's GEOS DP semantics)."""
    if len(pts) <= 2:
        return pts
    keep = np.zeros(len(pts), dtype=bool)
    keep[0] = keep[-1] = True
    stack = [(0, len(pts) - 1)]
    while stack:
        a, b = stack.pop()
        if b - a < 2:
            continue
        seg = pts[b] - pts[a]
        ln = np.hypot(*seg)
        mid = pts[a + 1 : b]
        if ln == 0:
            d = np.hypot(mid[:, 0] - pts[a][0], mid[:, 1] - pts[a][1])
        else:
            d = np.abs(np.cross(seg, mid - pts[a])) / ln
        imax = int(np.argmax(d))
        if d[imax] > tol:
            keep[a + 1 + imax] = True
            stack.append((a, a + 1 + imax))
            stack.append((a + 1 + imax, b))
    return pts[keep]


def simplify_batch(batch: pa.Table, tolerance: float, wkb_col: str = "wkb") -> pa.Table:
    out = []
    for w in batch[wkb_col].to_pylist():
        g = _wkb.decode(w)
        if g.kind == _wkb.LINESTRING:
            out.append(_wkb.encode_linestring(_dp_simplify(g.parts[0], tolerance)))
        elif g.kind == _wkb.POLYGON:
            rings = []
            for r in g.parts[0]:
                s = _dp_simplify(r[:-1], tolerance)
                rings.append(np.vstack([s, s[:1]]))
            out.append(_wkb.encode_polygon(rings))
        else:
            out.append(w)
    return batch.set_column(
        batch.column_names.index(wkb_col), wkb_col, pa.array(out, pa.binary())
    )


def convex_hull(pts: np.ndarray) -> np.ndarray:
    """Andrew monotone chain; returns closed CCW ring."""
    pts = np.unique(pts, axis=0)
    if len(pts) < 3:
        return np.vstack([pts, pts[:1]])
    order = np.lexsort((pts[:, 1], pts[:, 0]))
    p = pts[order]

    def half(points):
        out = []
        for q in points:
            while len(out) >= 2 and np.cross(out[-1] - out[-2], q - out[-2]) <= 0:
                out.pop()
            out.append(q)
        return out

    lower = half(p)
    upper = half(p[::-1])
    ring = np.array(lower[:-1] + upper[:-1])
    return np.vstack([ring, ring[:1]])


def convex_hull_batch(batch: pa.Table, wkb_col: str = "wkb") -> pa.Table:
    out = []
    for w in batch[wkb_col].to_pylist():
        g = _wkb.decode(w)
        out.append(_wkb.encode_polygon([convex_hull(g.vertices())]))
    return batch.set_column(
        batch.column_names.index(wkb_col), wkb_col, pa.array(out, pa.binary())
    )


def segmentize_batch(batch: pa.Table, max_len: float, wkb_col: str = "wkb") -> pa.Table:
    """Densify: insert vertices so no segment exceeds max_len."""

    def dens(pts: np.ndarray) -> np.ndarray:
        out = [pts[:1]]
        for i in range(len(pts) - 1):
            a, b = pts[i], pts[i + 1]
            d = float(np.hypot(*(b - a)))
            n = max(1, int(np.ceil(d / max_len)))
            t = np.linspace(0, 1, n + 1)[1:]
            out.append(a + t[:, None] * (b - a))
        return np.vstack(out)

    out = []
    for w in batch[wkb_col].to_pylist():
        g = _wkb.decode(w)
        if g.kind == _wkb.LINESTRING:
            out.append(_wkb.encode_linestring(dens(g.parts[0])))
        elif g.kind == _wkb.POLYGON:
            out.append(_wkb.encode_polygon([dens(r) for r in g.parts[0]]))
        else:
            out.append(w)
    return batch.set_column(
        batch.column_names.index(wkb_col), wkb_col, pa.array(out, pa.binary())
    )


def swap_xy_batch(batch: pa.Table, wkb_col: str = "wkb") -> pa.Table:
    out = []
    for w in batch[wkb_col].to_pylist():
        g = _wkb.decode(w)
        sw = lambda a: a[:, ::-1].copy()
        if g.kind == _wkb.POLYGON:
            out.append(_wkb.encode_polygon([sw(r) for r in g.parts[0]]))
        elif g.kind == _wkb.LINESTRING:
            out.append(_wkb.encode_linestring(sw(g.parts[0])))
        elif g.kind == _wkb.POINT:
            v = g.parts[0]
            out.append(_wkb.encode_points(v[:, 1], v[:, 0])[0])
        else:
            out.append(w)
    return batch.set_column(
        batch.column_names.index(wkb_col), wkb_col, pa.array(out, pa.binary())
    )


def set_precision_batch(batch: pa.Table, grid: float, wkb_col: str = "wkb") -> pa.Table:
    """Snap coordinates to a grid (OGRGeometry::SetPrecision semantics)."""

    def snap(a: np.ndarray) -> np.ndarray:
        return np.round(a / grid) * grid

    out = []
    for w in batch[wkb_col].to_pylist():
        g = _wkb.decode(w)
        if g.kind == _wkb.POLYGON:
            out.append(_wkb.encode_polygon([snap(r) for r in g.parts[0]]))
        elif g.kind == _wkb.LINESTRING:
            out.append(_wkb.encode_linestring(snap(g.parts[0])))
        elif g.kind == _wkb.POINT:
            v = snap(g.parts[0])
            out.append(_wkb.encode_points(v[:, 0], v[:, 1])[0])
        else:
            out.append(w)
    return batch.set_column(
        batch.column_names.index(wkb_col), wkb_col, pa.array(out, pa.binary())
    )


def explode_collections(ds, wkb_col: str = "wkb"):
    """1 -> N: multi-geometries split into single-part rows (flat_map via
    map_batches emitting more rows; apps/gdalalg_vector_explode_collections.h)."""

    def explode(batch: pa.Table) -> pa.Table:
        idx, parts = [], []
        for i, w in enumerate(batch[wkb_col].to_pylist()):
            g = _wkb.decode(w)
            if g.kind == _wkb.MULTIPOLYGON:
                for rings in g.parts:
                    idx.append(i)
                    parts.append(_wkb.encode_polygon(rings))
            elif g.kind == _wkb.MULTILINESTRING:
                for pts in g.parts:
                    idx.append(i)
                    parts.append(_wkb.encode_linestring(pts))
            elif g.kind == _wkb.MULTIPOINT:
                for pts in g.parts:
                    idx.append(i)
                    parts.append(_wkb.encode_points(pts[:, 0], pts[:, 1])[0])
            else:
                idx.append(i)
                parts.append(w)
        out = batch.take(pa.array(idx))
        return out.set_column(
            out.column_names.index(wkb_col), wkb_col, pa.array(parts, pa.binary())
        )

    return ds.map_batches(explode, batch_format="pyarrow")
