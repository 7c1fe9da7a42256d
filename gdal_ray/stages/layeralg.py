"""Layer algebra: polygon x polygon spatial joins and overlay ops.

Re-answers OGR layer algebra (reference: Intersection ``ogrlayer.cpp:5385``,
Union :5803, SymDifference :6340, Identity :6770, Clip/Erase; envelope reject
:5466-5485, prepared-geometry pretest :5510-5543) Ray-Data-first:

- **Pair identification** (which L x R pairs satisfy the predicate): both
  sides flat_map to grid-cell covers, co-partitioned by salted
  ``groupby(cell)``; per group an envelope reject then the exact
  ``polygons_intersect`` test.  A pair sharing k cells is seen k times ->
  **exact pair dedup** by ``groupby((l_id, r_id)).first`` (SURVEY §2.7 —
  the reference sees each pair once because its outer loop owns the pair).
- **Overlay construction**: ``clip_polygon`` implements Sutherland-Hodgman
  clipping against a CONVEX clipper — exact for the Clip/Intersection overlay
  with convex zones (the dominant GDAL clip use-case: bbox/tile clippers);
  general concave-concave overlay is documented out of scope for round 1.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..functions import geo, pip, wkb


def clip_ring_convex(subject: np.ndarray, clipper: np.ndarray) -> np.ndarray:
    """Sutherland-Hodgman: clip a closed subject ring by a CCW convex closed
    clipper ring.  Returns a closed ring (possibly empty)."""
    # ensure clipper CCW
    if wkb.ring_area(clipper) < 0:
        clipper = clipper[::-1]
    out = subject[:-1].tolist()
    for i in range(len(clipper) - 1):
        a, b = clipper[i], clipper[i + 1]
        if not out:
            return np.empty((0, 2))
        inp = out
        out = []
        ex, ey = b[0] - a[0], b[1] - a[1]

        def inside(p):
            return ex * (p[1] - a[1]) - ey * (p[0] - a[0]) >= 0

        def isect(p, q):
            dx, dy = q[0] - p[0], q[1] - p[1]
            denom = ex * dy - ey * dx
            t = (ex * (a[1] - p[1]) - ey * (a[0] - p[0])) / denom
            return [p[0] + t * dx, p[1] + t * dy]

        s = inp[-1]
        for p in inp:
            if inside(p):
                if not inside(s):
                    out.append(isect(s, p))
                out.append(list(p))
            elif inside(s):
                out.append(isect(s, p))
            s = p
    if len(out) < 3:
        return np.empty((0, 2))
    ring = np.array(out + [out[0]])
    return ring


def clip_geom_convex(g: "wkb.Geom", clipper_ring: np.ndarray) -> "wkb.Geom | None":
    """Clip a polygon/multipolygon by a convex ring; holes are clipped too."""
    polys_out = []
    for rings in g.shells_and_holes():
        shell = clip_ring_convex(rings[0], clipper_ring)
        if shell.size == 0:
            continue
        holes = []
        for hole in rings[1:]:
            hc = clip_ring_convex(hole, clipper_ring)
            if hc.size:
                holes.append(hc)
        polys_out.append([shell, *holes])
    if not polys_out:
        return None
    if len(polys_out) == 1:
        return wkb.Geom(wkb.POLYGON, [polys_out[0]])
    return wkb.Geom(wkb.MULTIPOLYGON, polys_out)


def _tag_side(batch: pa.Table, side: int, res: int, id_col: str) -> pa.Table:
    """flat_map polygons over their bbox cell cover."""
    boxes = wkb.bboxes(batch["wkb"].to_pylist())
    rows, cells = geo.bbox_cover_cells(boxes[:, 0], boxes[:, 1], boxes[:, 2], boxes[:, 3], res)
    take = pa.array(rows)
    return pa.table(
        {
            "cell": pa.array(cells),
            "side": pa.array(np.full(len(cells), side, dtype=np.int8)),
            "gid": batch[id_col].take(take),
            "wkb": batch["wkb"].take(take),
            "minx": pa.array(boxes[rows, 0]),
            "miny": pa.array(boxes[rows, 1]),
            "maxx": pa.array(boxes[rows, 2]),
            "maxy": pa.array(boxes[rows, 3]),
        }
    )


def polygon_join(
    left_ds,
    right_ds,
    res: int = 5,
    left_id: str = "l_id",
    right_id: str = "r_id",
):
    """Polygon x polygon intersects join -> deduped (l_id, r_id) pairs."""
    lt = left_ds.map_batches(lambda b: _tag_side(b, 0, res, left_id), batch_format="pyarrow")
    rt = right_ds.map_batches(lambda b: _tag_side(b, 1, res, right_id), batch_format="pyarrow")

    def join_group(group: pa.Table) -> pa.Table:
        side = group["side"].to_numpy(zero_copy_only=False)
        lmask = side == 0
        if not lmask.any() or lmask.all():
            return pa.table({"l_id": pa.array([], pa.int64()), "r_id": pa.array([], pa.int64())})
        lbox = np.column_stack(
            [group[c].to_numpy(zero_copy_only=False)[lmask] for c in ("minx", "miny", "maxx", "maxy")]
        )
        rbox = np.column_stack(
            [group[c].to_numpy(zero_copy_only=False)[~lmask] for c in ("minx", "miny", "maxx", "maxy")]
        )
        lids = group["gid"].to_numpy(zero_copy_only=False)[lmask]
        rids = group["gid"].to_numpy(zero_copy_only=False)[~lmask]
        lwkb = [w for w, m in zip(group["wkb"].to_pylist(), lmask) if m]
        rwkb = [w for w, m in zip(group["wkb"].to_pylist(), lmask) if not m]
        # envelope reject (ogrlayer.cpp:5466-5485)
        cand = np.nonzero(pip.bbox_intersects(lbox, rbox))
        out_l, out_r = [], []
        # lazy decode, once per geometry (setdefault would decode per PAIR)
        geom_cache_l: dict[int, wkb.Geom] = {}
        geom_cache_r: dict[int, wkb.Geom] = {}
        for li, ri in zip(*cand):
            if li not in geom_cache_l:
                geom_cache_l[li] = wkb.decode(lwkb[li])
            if ri not in geom_cache_r:
                geom_cache_r[ri] = wkb.decode(rwkb[ri])
            gl = geom_cache_l[li]
            gr = geom_cache_r[ri]
            if pip.polygons_intersect(gl, gr):
                out_l.append(int(lids[li]))
                out_r.append(int(rids[ri]))
        return pa.table({"l_id": pa.array(out_l, pa.int64()), "r_id": pa.array(out_r, pa.int64())})

    both = lt.union(rt)
    pairs = both.groupby("cell").map_groups(join_group, batch_format="pyarrow")
    # exact pair dedup: a pair seen once per shared cell
    from ray.data.aggregate import Count

    return pairs.groupby(["l_id", "r_id"]).aggregate(Count(alias_name="n_cells")).drop_columns(
        ["n_cells"]
    )


def _owner_cell_pairs(group: pa.Table, res: int):
    """Yield (l_id, r_id, geom_l, geom_r) for every bbox-candidate pair of one
    cell group whose OWNER cell is this group's cell.  Owner = the cell
    containing the intersection-bbox min corner — a cell both sides' covers
    are guaranteed to include — so a pair sharing k cells is emitted by
    exactly ONE group (no dedup shuffle needed).  Shared by overlay_join and
    predicate_join; geometries decode lazily, once per feature."""
    side = group["side"].to_numpy(zero_copy_only=False)
    lmask = side == 0
    if not lmask.any() or lmask.all():
        return
    cell = int(group["cell"][0].as_py())
    lbox = np.column_stack(
        [group[c].to_numpy(zero_copy_only=False)[lmask] for c in ("minx", "miny", "maxx", "maxy")]
    )
    rbox = np.column_stack(
        [group[c].to_numpy(zero_copy_only=False)[~lmask] for c in ("minx", "miny", "maxx", "maxy")]
    )
    lids = group["gid"].to_numpy(zero_copy_only=False)[lmask]
    rids = group["gid"].to_numpy(zero_copy_only=False)[~lmask]
    lwkb = [w for w, m in zip(group["wkb"].to_pylist(), lmask) if m]
    rwkb = [w for w, m in zip(group["wkb"].to_pylist(), lmask) if not m]
    cand = np.nonzero(pip.bbox_intersects(lbox, rbox))
    ocx = np.maximum(lbox[cand[0], 0], rbox[cand[1], 0])
    ocy = np.maximum(lbox[cand[0], 1], rbox[cand[1], 1])
    owner = geo.point_cells(ocx, ocy, res) if ocx.size else np.empty(0, np.int64)
    cache_l: dict = {}
    cache_r: dict = {}
    for k, (li, ri) in enumerate(zip(*cand)):
        if int(owner[k]) != cell:
            continue
        if li not in cache_l:
            cache_l[li] = wkb.decode(lwkb[li])
        if ri not in cache_r:
            cache_r[ri] = wkb.decode(rwkb[ri])
        yield int(lids[li]), int(rids[ri]), cache_l[li], cache_r[ri]


def overlay_join(
    left_ds,
    right_ds,
    res: int = 5,
    left_id: str = "l_id",
    right_id: str = "r_id",
):
    """Layer-algebra overlay with GEOMETRY construction (Intersection /
    Union / SymDifference output per intersecting pair — ogrlayer.cpp:5385,
    :5803, :6340 semantics; Identity/Update/Erase compose from these plus
    ``erase_layer``).  Same cell-partitioned shuffle as ``polygon_join``;
    per-pair boolean ops run inside the group (stages/overlay.py, concave-
    capable).  Emits (l_id, r_id, inter_wkb, inter_area, union_area,
    symdiff_area); boundary-touch pairs (zero-area intersection) are skipped."""
    from . import overlay

    lt = left_ds.map_batches(lambda b: _tag_side(b, 0, res, left_id), batch_format="pyarrow")
    rt = right_ds.map_batches(lambda b: _tag_side(b, 1, res, right_id), batch_format="pyarrow")
    empty = pa.table(
        {"l_id": pa.array([], pa.int64()), "r_id": pa.array([], pa.int64()),
         "inter_wkb": pa.array([], pa.binary()),
         "inter_area": pa.array([], pa.float64()),
         "union_area": pa.array([], pa.float64()),
         "symdiff_area": pa.array([], pa.float64())}
    )

    def join_group(group: pa.Table) -> pa.Table:
        rows = {k: [] for k in ("l_id", "r_id", "inter_wkb", "inter_area",
                                "union_area", "symdiff_area")}
        for lid, rid, gl, gr in _owner_cell_pairs(group, res):
            gi = overlay.boolean_op(gl, gr, "intersection")
            ia = overlay.geom_area(gi)
            if gi is None or ia <= 0:
                continue
            gu = overlay.boolean_op(gl, gr, "union")
            gs = overlay.boolean_op(gl, gr, "symdifference")
            rows["l_id"].append(lid)
            rows["r_id"].append(rid)
            rows["inter_wkb"].append(overlay.encode(gi))
            rows["inter_area"].append(ia)
            rows["union_area"].append(overlay.geom_area(gu))
            rows["symdiff_area"].append(overlay.geom_area(gs))
        if not rows["l_id"]:
            return empty
        return pa.table(
            {"l_id": pa.array(rows["l_id"], pa.int64()),
             "r_id": pa.array(rows["r_id"], pa.int64()),
             "inter_wkb": pa.array(rows["inter_wkb"], pa.binary()),
             "inter_area": pa.array(rows["inter_area"], pa.float64()),
             "union_area": pa.array(rows["union_area"], pa.float64()),
             "symdiff_area": pa.array(rows["symdiff_area"], pa.float64())}
        )

    both = lt.union(rt)
    return both.groupby("cell").map_groups(join_group, batch_format="pyarrow")


def predicate_join(
    left_ds,
    right_ds,
    res: int = 5,
    left_id: str = "l_id",
    right_id: str = "r_id",
):
    """Full spatial-predicate join (ogr/ogrgeometry.cpp:6009-6362 predicate
    set): emits (l_id, r_id, predicate) for every non-disjoint pair, with
    predicate in equals | contains | within | overlaps | touches
    (pip.polygon_predicate).  Cell-partitioned with owner-cell dedup."""
    lt = left_ds.map_batches(lambda b: _tag_side(b, 0, res, left_id), batch_format="pyarrow")
    rt = right_ds.map_batches(lambda b: _tag_side(b, 1, res, right_id), batch_format="pyarrow")
    empty = pa.table(
        {"l_id": pa.array([], pa.int64()), "r_id": pa.array([], pa.int64()),
         "predicate": pa.array([], pa.string())}
    )

    def join_group(group: pa.Table) -> pa.Table:
        out_l, out_r, out_p = [], [], []
        for lid, rid, gl, gr in _owner_cell_pairs(group, res):
            pred = pip.polygon_predicate(gl, gr)
            if pred is None:
                continue
            out_l.append(lid)
            out_r.append(rid)
            out_p.append(pred)
        if not out_l:
            return empty
        return pa.table(
            {"l_id": pa.array(out_l, pa.int64()), "r_id": pa.array(out_r, pa.int64()),
             "predicate": pa.array(out_p, pa.string())}
        )

    both = lt.union(rt)
    return both.groupby("cell").map_groups(join_group, batch_format="pyarrow")


def erase_layer(ds, eraser_wkb: bytes, id_col: str = "fid"):
    """Erase: subtract a (possibly concave) eraser geometry from every
    feature (ogrlayer.cpp Erase); features left empty are dropped.
    Emits erased WKB + exact erased area."""
    from . import overlay

    ger = wkb.decode(eraser_wkb)
    ebox = wkb.bboxes([eraser_wkb])[0]

    def fn(batch: pa.Table) -> pa.Table:
        ids, out_wkb, areas = [], [], []
        for fid, w in zip(batch[id_col].to_pylist(), batch["wkb"].to_pylist()):
            g = wkb.decode(w)
            b = g.bbox()
            if b[2] <= ebox[0] or b[0] >= ebox[2] or b[3] <= ebox[1] or b[1] >= ebox[3]:
                ge = g  # no overlap: feature survives whole
            else:
                ge = overlay.boolean_op(g, ger, "difference")
            if ge is None:
                continue
            a = overlay.geom_area(ge)
            if a <= 0:
                continue
            ids.append(fid)
            out_wkb.append(overlay.encode(ge))
            areas.append(a)
        return pa.table(
            {id_col: pa.array(ids), "wkb": pa.array(out_wkb, pa.binary()),
             "erase_area": pa.array(areas, pa.float64())}
        )

    return ds.map_batches(fn, batch_format="pyarrow")


def clip_layer(ds, clipper_wkb: bytes, id_col: str = "fid"):
    """Clip every polygon by a convex clipper (gdal vector clip /
    layer-algebra Clip with a convex clip geometry).  Emits clipped WKB +
    exact clipped area."""
    clip_ring = wkb.decode(clipper_wkb).parts[0][0]

    def fn(batch: pa.Table) -> pa.Table:
        ids, out_wkb, areas = [], [], []
        for fid, w in zip(batch[id_col].to_pylist(), batch["wkb"].to_pylist()):
            g = wkb.decode(w)
            cg = clip_geom_convex(g, clip_ring)
            if cg is None:
                continue
            ids.append(fid)
            out_wkb.append(
                wkb.encode_polygon(cg.parts[0])
                if cg.kind == wkb.POLYGON
                else wkb.encode_multipolygon(cg.parts)
            )
            areas.append(wkb.geom_area(cg))
        return pa.table(
            {
                id_col: pa.array(ids),
                "wkb": pa.array(out_wkb, pa.binary()),
                "clip_area": pa.array(areas, pa.float64()),
            }
        )

    return ds.map_batches(fn, batch_format="pyarrow")


def dissolve_union(ds, key_col: str, id_col: str = "fid"):
    """Dissolve with TRUE geometric union (apps/gdalalg_vector_dissolve.cpp
    UnaryUnion semantics): per attribute group, member polygons are folded
    through the overlay engine's boolean union, so OVERLAPPING members
    contribute their union area exactly (the round-1 ``dissolve_collect``
    double-counts overlaps).  Emits (key, n_parts, union_area, wkb).

    Per-group cost is O(members^2) segment work — partition the dissolve key
    so groups stay small (the usual dissolve shape); huge groups would use a
    tree-fold (pairwise union reduction), the documented scale path."""
    from . import overlay

    def per_group(group: pa.Table) -> pa.Table:
        key = group[key_col][0].as_py()
        geoms = [wkb.decode(w) for w in group["wkb"].to_pylist()]
        acc = geoms[0]
        for g in geoms[1:]:
            u = overlay.boolean_op(acc, g, "union")
            if u is None:
                # union of two non-empty polygons can never be empty — fail
                # loudly rather than silently shrinking the dissolve result
                raise ValueError(
                    f"dissolve_union: degenerate union in group {key!r}"
                )
            acc = u
        return pa.table(
            {
                key_col: pa.array([key]),
                "n_parts": pa.array([len(geoms)], pa.int64()),
                "union_area": pa.array([overlay.geom_area(acc)], pa.float64()),
                "wkb": pa.array([overlay.encode(acc)], pa.binary()),
            }
        )

    return ds.groupby(key_col).map_groups(per_group, batch_format="pyarrow")


def dissolve_collect(ds, key_col: str, id_col: str = "fid"):
    """Dissolve (vector dissolve, apps/gdalalg_vector_dissolve.cpp:120):
    group by attribute, collect members into a MultiPolygon + aggregate
    bbox/total-area.  NOTE: member polygons are collected, not unioned —
    use ``dissolve_union`` for exact boundary union of OVERLAPPING members;
    for non-overlapping inputs (the common dissolve case) collect == union
    in area and bbox."""

    def per_group(group: pa.Table) -> pa.Table:
        key = group[key_col][0].as_py()
        polys = []
        area = 0.0
        geoms = [wkb.decode(w) for w in group["wkb"].to_pylist()]  # decode once
        boxes = np.array([g.bbox() for g in geoms])
        for g in geoms:
            area += wkb.geom_area(g)
            polys.extend(g.shells_and_holes())
        return pa.table(
            {
                key_col: pa.array([key]),
                "wkb": pa.array([wkb.encode_multipolygon(polys)], pa.binary()),
                "n_parts": pa.array([len(polys)], pa.int64()),
                "total_area": pa.array([area], pa.float64()),
                "minx": pa.array([float(boxes[:, 0].min())]),
                "miny": pa.array([float(boxes[:, 1].min())]),
                "maxx": pa.array([float(boxes[:, 2].max())]),
                "maxy": pa.array([float(boxes[:, 3].max())]),
            }
        )

    return ds.groupby(key_col).map_groups(per_group, batch_format="pyarrow")
