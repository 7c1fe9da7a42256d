"""Spatial joins (intersects / within / contains) — the engine's core target.

Re-answers OGR layer algebra (Intersection/Clip/... nested-loop join with
envelope reject + prepared-geometry pretest, reference ``ogrlayer.cpp:5385``,
``5466-5543``) Ray-Data-first, in two physical plans:

1. **Broadcast join** (small polygon side — the common GDAL case): the zone
   table is ``ray.put`` once; each actor builds an STRtree + decoded
   geometries in ``__init__`` and streams point batches through it with zero
   shuffle.  This is the 100 TB-friendly plan whenever the polygon side fits
   worker memory (millions of zones).

2. **Partitioned join** (both sides large): both sides are flat-mapped to
   grid-cell keys (zones duplicated over their bbox cover, points to their
   single containing cell), co-partitioned by a salted ``groupby(cell)``, and
   probed per group with a per-group STRtree.  A point lives in exactly one
   cell, so point x polygon pairs are emitted exactly once — no dedup shuffle
   needed (polygon x polygon joins would need the (l,r) first-dedup, §2.7).

Predicate semantics (GEOS/OGC, ``ogr/ogrgeometry.cpp:6009-6362``):
  - ``intersects``: boundary inclusive.  Exact for axis-aligned-rectangle
    zones via envelope test; general polygons use even-odd crossing number
    (boundary resolution = half-open rule; autotest-style off-boundary
    fixtures are used for exact assertions).
  - ``within``: point strictly in interior (rect fast path: exclusive bounds).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray

from ..functions import geo, pip, wkb


class _ZoneIndex:
    """Decoded zone geometries + CSR grid-bucket index, built once per
    actor/group.

    The probe index is a uniform lon/lat grid: each zone is registered in
    every grid cell its bbox covers (CSR layout: cell -> zone ids).  A point
    probe is then cell lookup + vectorized candidate gather + exact test —
    O(candidates), no tree descent.  This beats an R-tree here because zone
    envelopes are large relative to the domain (node MBRs stop pruning), the
    precise regime GDAL's own spatial filter handles with envelope prefilter
    + prepared geometry (ogrlayer.cpp:3887-3922).

    Grid resolution adapts to the median zone size; zones whose cover would
    explode (near-global geometries) go to a small always-checked list.
    """

    MAX_COVER_CELLS = 4096

    def __init__(self, zones: pa.Table):
        self.zone_id = zones["zone_id"].to_pylist()
        if "zone_key" in zones.column_names:
            self.zone_key = zones["zone_key"].to_numpy(zero_copy_only=False)
        else:
            self.zone_key = np.arange(zones.num_rows, dtype=np.int64)
        wkbs = zones["wkb"].to_pylist()
        self.geoms = [wkb.decode(w) for w in wkbs]
        if {"minx", "miny", "maxx", "maxy"} <= set(zones.column_names):
            self.boxes = np.column_stack(
                [zones[c].to_numpy(zero_copy_only=False) for c in ("minx", "miny", "maxx", "maxy")]
            )
        else:
            self.boxes = wkb.bboxes(wkbs)
        self.is_rect = np.array(
            [self._rect_like(g, b) for g, b in zip(self.geoms, self.boxes)], dtype=bool
        ).reshape(-1)
        self._build_grid()

    def _build_grid(self):
        b = self.boxes
        n = len(b)
        if n == 0:
            self.nx = self.ny = 1
            self.csr_off = np.zeros(2, dtype=np.int64)
            self.csr_val = np.empty(0, dtype=np.int64)
            self.always = np.empty(0, dtype=np.int64)
            self.x0 = self.y0 = 0.0
            self.inv_dx = self.inv_dy = 1.0
            return
        self.x0, self.y0 = float(b[:, 0].min()), float(b[:, 1].min())
        x1, y1 = float(b[:, 2].max()), float(b[:, 3].max())
        # cell size ~ median box size => O(1) covered cells per typical zone
        w = np.median(b[:, 2] - b[:, 0]) or 1.0
        h = np.median(b[:, 3] - b[:, 1]) or 1.0
        self.nx = int(np.clip((x1 - self.x0) / max(w, 1e-9), 1, 4096))
        self.ny = int(np.clip((y1 - self.y0) / max(h, 1e-9), 1, 4096))
        self.inv_dx = self.nx / max(x1 - self.x0, 1e-9)
        self.inv_dy = self.ny / max(y1 - self.y0, 1e-9)
        cx0 = np.clip(((b[:, 0] - self.x0) * self.inv_dx).astype(np.int64), 0, self.nx - 1)
        cx1 = np.clip(((b[:, 2] - self.x0) * self.inv_dx).astype(np.int64), 0, self.nx - 1)
        cy0 = np.clip(((b[:, 1] - self.y0) * self.inv_dy).astype(np.int64), 0, self.ny - 1)
        cy1 = np.clip(((b[:, 3] - self.y0) * self.inv_dy).astype(np.int64), 0, self.ny - 1)
        counts = (cx1 - cx0 + 1) * (cy1 - cy0 + 1)
        big = counts > self.MAX_COVER_CELLS
        self.always = np.nonzero(big)[0].astype(np.int64)
        counts = np.where(big, 0, counts)
        total = int(counts.sum())
        zrep = np.repeat(np.arange(n, dtype=np.int64), counts)
        starts = np.concatenate(([0], np.cumsum(counts)[:-1]))
        local = np.arange(total, dtype=np.int64) - np.repeat(starts, counts)
        ncx = np.repeat(cx1 - cx0 + 1, counts)
        gx = np.repeat(cx0, counts) + local % ncx
        gy = np.repeat(cy0, counts) + local // ncx
        cell = gy * self.nx + gx
        order = np.argsort(cell, kind="stable")
        cell, zrep = cell[order], zrep[order]
        self.csr_off = np.zeros(self.nx * self.ny + 1, dtype=np.int64)
        np.add.at(self.csr_off, cell + 1, 1)
        np.cumsum(self.csr_off, out=self.csr_off)
        self.csr_val = zrep

    def _candidates(self, px: np.ndarray, py: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        """(point_row, zone_index) candidate pairs from the grid (env-tested)."""
        n = px.size
        if n == 0:
            return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.int64)
        gx = np.clip(((px - self.x0) * self.inv_dx).astype(np.int64), 0, self.nx - 1)
        gy = np.clip(((py - self.y0) * self.inv_dy).astype(np.int64), 0, self.ny - 1)
        cell = gy * self.nx + gx
        starts = self.csr_off[cell]
        counts = self.csr_off[cell + 1] - starts
        rows = np.repeat(np.arange(n, dtype=np.int64), counts)
        so = np.concatenate(([0], np.cumsum(counts)[:-1]))
        flat = np.arange(int(counts.sum()), dtype=np.int64) - np.repeat(so, counts)
        zidx = self.csr_val[np.repeat(starts, counts) + flat]
        if self.always.size:
            rows = np.concatenate([rows, np.repeat(np.arange(n, dtype=np.int64), self.always.size)])
            zidx = np.concatenate([zidx, np.tile(self.always, n)])
        bb = self.boxes[zidx]
        hit = (px[rows] >= bb[:, 0]) & (px[rows] <= bb[:, 2]) & (py[rows] >= bb[:, 1]) & (
            py[rows] <= bb[:, 3]
        )
        return rows[hit], zidx[hit]

    @staticmethod
    def _rect_like(g: "wkb.Geom", box: np.ndarray) -> bool:
        if g.kind != wkb.POLYGON or len(g.parts[0]) != 1:
            return False
        ring = g.parts[0][0]
        if len(ring) != 5:
            return False
        xs, ys = set(ring[:, 0]), set(ring[:, 1])
        return xs == {box[0], box[2]} and ys == {box[1], box[3]}

    def probe_points(
        self, px: np.ndarray, py: np.ndarray, predicate: str
    ) -> tuple[np.ndarray, np.ndarray]:
        """(point_row, zone_index) matching pairs under the predicate."""
        rows, zidx = self._candidates(px, py)
        if rows.size == 0:
            return rows, zidx
        keep = np.zeros(rows.size, dtype=bool)
        if predicate == "within":
            # strict interior: envelope candidates on the boundary drop out
            strict = (
                (px[rows] > self.boxes[zidx, 0])
                & (px[rows] < self.boxes[zidx, 2])
                & (py[rows] > self.boxes[zidx, 1])
                & (py[rows] < self.boxes[zidx, 3])
            )
        else:
            strict = np.ones(rows.size, dtype=bool)
        rect_mask = self.is_rect[zidx]
        keep[rect_mask] = strict[rect_mask]
        # general polygons: exact crossing-number test, grouped per zone so the
        # edge arrays are broadcast once per zone, not per pair
        gen = np.nonzero(~rect_mask)[0]
        if gen.size:
            order = gen[np.argsort(zidx[gen], kind="stable")]
            zs = zidx[order]
            starts = np.nonzero(np.r_[True, zs[1:] != zs[:-1]])[0]
            bounds = np.r_[starts, zs.size]
            for s, e in zip(bounds[:-1], bounds[1:]):
                sel = order[s:e]
                g = self.geoms[zs[s]]
                inside = pip.points_in_geom(px[rows[sel]], py[rows[sel]], g)
                if predicate == "within":
                    keep[sel] = inside & strict[sel]
                else:
                    keep[sel] = inside
        return rows[keep], zidx[keep]


class BroadcastPointJoin:
    """Actor-pool stage: stream point batches against a broadcast zone index.

    State (zone table fetch + STRtree build + WKB decode) happens ONCE per
    actor in ``__init__`` (the PROJ-TLS-context pattern,
    ``ogr/ogr_proj_p.cpp:268``); ``__call__`` is pure vectorized probing.
    """

    def __init__(
        self,
        zones_ref,
        predicate: str = "intersects",
        id_col: str = "doc_id",
        lon_col: str = "lon",
        lat_col: str = "lat",
        emit_cols: tuple = (),
        emit_zone_index: bool = False,
        zonal_reduce_col: str | None = None,
        anti: bool = False,
    ):
        # anti=True: emit points matching NO zone (spatial NOT EXISTS — the
        # point-layer Erase analogue, ogrlayer.cpp:6770 Identity/Erase family)
        self.anti = anti
        self.emit_zone_index = emit_zone_index
        # aggregate pushdown (GDAL zonal RASTER_SEQUENTIAL analogue,
        # alg/zonal.cpp:201-208): when set, __call__ reduces each batch's
        # matches to fixed-length per-zone count/sum/min/max vectors instead
        # of materializing O(pairs) rows through the object store
        self.zonal_reduce_col = zonal_reduce_col
        zones = ray.get(zones_ref) if isinstance(zones_ref, ray.ObjectRef) else zones_ref
        self.index = _ZoneIndex(zones)
        self.predicate = predicate
        self.id_col = id_col
        self.lon_col = lon_col
        self.lat_col = lat_col
        self.emit_cols = emit_cols
        # warm-up probe: pre-faults the numpy allocator pools once per actor
        # (in parallel across the pool) so steady-state batches run at full
        # speed from the first real batch
        rng = np.random.default_rng(0)
        for _ in range(2):
            wx = rng.uniform(-180.0, 180.0, 32768)
            wy = rng.uniform(-85.0, 85.0, 32768)
            self.index.probe_points(wx, wy, self.predicate)

    def __call__(self, batch: pa.Table) -> pa.Table:
        px = batch[self.lon_col].to_numpy(zero_copy_only=False)
        py = batch[self.lat_col].to_numpy(zero_copy_only=False)
        rows, zidx = self.index.probe_points(px, py, self.predicate)
        if self.anti:
            mask = np.ones(batch.num_rows, dtype=bool)
            mask[rows] = False
            out = {self.id_col: batch[self.id_col].filter(pa.array(mask))}
            for c in self.emit_cols:
                out[c] = batch[c].filter(pa.array(mask))
            return pa.table(out)
        if self.zonal_reduce_col is not None:
            return self._zonal_reduce(batch, rows, zidx)
        out = {self.id_col: batch[self.id_col].take(pa.array(rows))}
        if self.emit_zone_index:
            # int index instead of string id: cheaper across downstream
            # shuffles; resolve to zone_id at the consumer
            out["zone_idx"] = pa.array(zidx.astype(np.int32))
        else:
            out["zone_id"] = pa.array([self.index.zone_id[i] for i in zidx], type=pa.string())
        for c in self.emit_cols:
            out[c] = batch[c].take(pa.array(rows))
        return pa.table(out)

    def _zonal_reduce(self, batch: pa.Table, rows: np.ndarray, zidx: np.ndarray) -> pa.Table:
        n_zones = len(self.index.zone_id)
        v = batch[self.zonal_reduce_col].to_numpy(zero_copy_only=False)[rows].astype(np.int64)
        cnt = np.bincount(zidx, minlength=n_zones).astype(np.int64)
        # integer-exact sum (bincount weights would accumulate in float64 and
        # lose exactness above 2^53, breaking the bit-stable policy)
        sm = np.zeros(n_zones, dtype=np.int64)
        np.add.at(sm, zidx, v)
        order = np.argsort(zidx, kind="stable")
        zs, vs = zidx[order], v[order]
        starts = np.nonzero(np.r_[True, zs[1:] != zs[:-1]])[0]
        mn = np.full(n_zones, np.iinfo(np.int64).max, dtype=np.int64)
        mx = np.full(n_zones, np.iinfo(np.int64).min, dtype=np.int64)
        if zs.size:
            mn[zs[starts]] = np.minimum.reduceat(vs, starts)
            mx[zs[starts]] = np.maximum.reduceat(vs, starts)
        return pa.table(
            {
                "cnt": pa.array([cnt.tobytes()], pa.binary()),
                "sm": pa.array([sm.tobytes()], pa.binary()),
                "mn": pa.array([mn.tobytes()], pa.binary()),
                "mx": pa.array([mx.tobytes()], pa.binary()),
            }
        )


def broadcast_spatial_join(
    points_ds,
    zones: pa.Table,
    predicate: str = "intersects",
    id_col: str = "doc_id",
    concurrency: int | tuple = 4,
    batch_size: int = 65536,
    emit_cols: tuple = (),
    emit_zone_index: bool = False,
    zonal_reduce_col: str | None = None,
    anti: bool = False,
):
    """Plan 1: broadcast the zone table, stream the points.  Zero shuffle."""
    zones_ref = ray.put(zones)
    return points_ds.map_batches(
        BroadcastPointJoin,
        fn_constructor_kwargs=dict(
            zones_ref=zones_ref,
            predicate=predicate,
            id_col=id_col,
            emit_cols=emit_cols,
            emit_zone_index=emit_zone_index,
            zonal_reduce_col=zonal_reduce_col,
            anti=anti,
        ),
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )


# ---------------------------------------------------------------------------
# Plan 2: partitioned join (both sides large)
# ---------------------------------------------------------------------------


def _zone_cell_expansion(batch: pa.Table, res: int, salts: dict | None) -> pa.Table:
    """flat_map zones over their bbox cell cover (x salt replicas for hot cells)."""
    minx = batch["minx"].to_numpy(zero_copy_only=False)
    miny = batch["miny"].to_numpy(zero_copy_only=False)
    maxx = batch["maxx"].to_numpy(zero_copy_only=False)
    maxy = batch["maxy"].to_numpy(zero_copy_only=False)
    rows, cells = geo.bbox_cover_cells(minx, miny, maxx, maxy, res)
    take = pa.array(rows)
    base = {
        "cell": cells,
        "salt": np.zeros(len(cells), dtype=np.int32),
        "side": np.zeros(len(cells), dtype=np.int8),  # 0 = zone
        "zone_id": batch["zone_id"].take(take),
        "wkb": batch["wkb"].take(take),
        "minx": batch["minx"].take(take),
        "miny": batch["miny"].take(take),
        "maxx": batch["maxx"].take(take),
        "maxy": batch["maxy"].take(take),
    }
    tables = [pa.table({**base})]
    if salts:
        # replicate zone rows into every salt bucket of hot cells
        salt_counts = np.array([salts.get(int(c), 1) for c in cells], dtype=np.int32)
        hot = np.nonzero(salt_counts > 1)[0]
        if hot.size:
            reps = salt_counts[hot] - 1
            ridx = np.repeat(hot, reps)
            starts = np.concatenate(([0], np.cumsum(reps)[:-1]))
            salt_vals = (np.arange(reps.sum()) - np.repeat(starts, reps) + 1).astype(np.int32)
            extra = pa.table(
                {
                    "cell": cells[ridx],
                    "salt": salt_vals,
                    "side": np.zeros(ridx.size, dtype=np.int8),
                    "zone_id": base["zone_id"].take(pa.array(ridx)),
                    "wkb": base["wkb"].take(pa.array(ridx)),
                    "minx": base["minx"].take(pa.array(ridx)),
                    "miny": base["miny"].take(pa.array(ridx)),
                    "maxx": base["maxx"].take(pa.array(ridx)),
                    "maxy": base["maxy"].take(pa.array(ridx)),
                }
            )
            tables.append(extra)
    return pa.concat_tables(tables)


def _point_cell_tag(batch: pa.Table, res: int, salts: dict | None, id_col: str) -> pa.Table:
    lon = batch["lon"].to_numpy(zero_copy_only=False)
    lat = batch["lat"].to_numpy(zero_copy_only=False)
    cells = geo.point_cells(lon, lat, res)
    if salts:
        salt_counts = np.array([salts.get(int(c), 1) for c in cells], dtype=np.int64)
        from ..sources.synthetic import doc_id_to_key

        try:
            keys = doc_id_to_key(batch[id_col])
        except Exception:
            keys = np.arange(len(cells), dtype=np.int64)
        salt = (keys % salt_counts).astype(np.int32)
    else:
        salt = np.zeros(len(cells), dtype=np.int32)
    return pa.table(
        {
            "cell": cells,
            "salt": salt,
            "side": np.ones(len(cells), dtype=np.int8),  # 1 = point
            "zone_id": pa.nulls(len(cells), pa.string()),
            "wkb": pa.nulls(len(cells), pa.binary()),
            "doc_id": batch[id_col],
            "lon": batch["lon"],
            "lat": batch["lat"],
        }
    )


def compute_hot_cells(
    points_ds, res: int, hot_threshold: int = 200_000, max_salt: int = 32
) -> dict:
    """Pre-pass count sketch: cells whose point count exceeds the threshold get
    a salt factor (SURVEY §4 skew row).  The result is tiny (only hot cells)
    and is broadcast to both flat_map stages."""

    def cell_counts(batch: pa.Table) -> pa.Table:
        lon = batch["lon"].to_numpy(zero_copy_only=False)
        lat = batch["lat"].to_numpy(zero_copy_only=False)
        cells, counts = np.unique(geo.point_cells(lon, lat, res), return_counts=True)
        return pa.table({"cell": cells, "n": counts})

    partials = points_ds.map_batches(cell_counts, batch_format="pyarrow")
    totals = partials.groupby("cell").sum("n").to_pandas()
    hot = totals[totals["sum(n)"] > hot_threshold]
    return {
        int(c): int(min(max_salt, max(2, n // hot_threshold + 1)))
        for c, n in zip(hot["cell"], hot["sum(n)"])
    }


def partitioned_spatial_join(
    points_ds,
    zones_ds,
    res: int = 6,
    predicate: str = "intersects",
    id_col: str = "doc_id",
    salts: dict | None = None,
):
    """Plan 2: cell-cover co-partitioned join via union + groupby + map_groups."""
    zones_tagged = zones_ds.map_batches(
        lambda b: _zone_cell_expansion(b, res, salts), batch_format="pyarrow"
    )
    points_tagged = points_ds.map_batches(
        lambda b: _point_cell_tag(b, res, salts, id_col), batch_format="pyarrow"
    )

    def join_group(group: pa.Table) -> pa.Table:
        side = group["side"].to_numpy(zero_copy_only=False)
        zmask = side == 0
        if not zmask.any() or zmask.all():
            return pa.table({"doc_id": pa.array([], pa.string()), "zone_id": pa.array([], pa.string())})
        zones = group.filter(pa.array(zmask)).select(["zone_id", "wkb", "minx", "miny", "maxx", "maxy"])
        pts = group.filter(pa.array(~zmask))
        index = _ZoneIndex(zones)
        px = pts["lon"].to_numpy(zero_copy_only=False)
        py = pts["lat"].to_numpy(zero_copy_only=False)
        rows, zidx = index.probe_points(px, py, predicate)
        return pa.table(
            {
                "doc_id": pts["doc_id"].take(pa.array(rows)),
                "zone_id": pa.array([index.zone_id[i] for i in zidx], type=pa.string()),
            }
        )

    both = zones_tagged.union(points_tagged)
    return both.groupby(["cell", "salt"]).map_groups(join_group, batch_format="pyarrow")
