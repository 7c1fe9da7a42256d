"""FlatGeobuf driver from the published spec (flatgeobuf.org; reference:
ogr/ogrsf_frmts/flatgeobuf/) — magic bytes, size-prefixed flatbuffers
Header + Feature stream, columnar xy/ends geometry encoding, and the
(uint16 column index, typed value) properties blob.

The flatbuffers wire format (vtables, uoffsets, strings, vectors) is
implemented from the public flatbuffers internals doc — built back-to-front
exactly like the reference builder, parsed with relative offsets only.
``index_node_size > 0`` writes the spec's packed Hilbert R-tree (flatbush
layout: root level first, 40-byte nodes), enabling bbox reads that parse
only matching features; features stream size-prefixed either way.

Field ids follow the spec's .fbs declaration order:
  Header: name 0, envelope 1, geometry_type 2, has_z 3, has_m 4, has_t 5,
          has_tm 6, columns 7, features_count 8, index_node_size 9, crs 10
  Column: name 0, type 1
  Feature: geometry 0, properties 1, columns 2
  Geometry: ends 0, xy 1, z 2, m 3, t 4, tm 5, type 6, parts 7
"""

from __future__ import annotations

import struct

import numpy as np
import pyarrow as pa

from ..functions import wkb as _wkb

MAGIC = bytes([0x66, 0x67, 0x62, 0x03, 0x66, 0x67, 0x62, 0x01])

# ColumnType enum (spec order)
CT_BYTE, CT_UBYTE, CT_BOOL, CT_SHORT, CT_USHORT = 0, 1, 2, 3, 4
CT_INT, CT_UINT, CT_LONG, CT_ULONG, CT_FLOAT, CT_DOUBLE = 5, 6, 7, 8, 9, 10
CT_STRING, CT_JSON, CT_DATETIME, CT_BINARY = 11, 12, 13, 14

# GeometryType enum (spec order; matches WKB codes 1-7)
GT_UNKNOWN = 0


# -- minimal flatbuffers builder (back-to-front, like the reference) ---------


class Builder:
    def __init__(self):
        self.buf = bytearray()  # the TAIL of the final buffer
        self.minalign = 1

    def _align(self, size: int, extra: int = 0):
        self.minalign = max(self.minalign, size)
        while (len(self.buf) + extra) % size:
            self.buf[:0] = b"\x00"

    def _push(self, data: bytes):
        self.buf[:0] = data

    def offset(self) -> int:
        return len(self.buf)

    def push_scalar(self, fmt: str, v) -> None:
        data = struct.pack("<" + fmt, v)
        self._align(len(data))
        self._push(data)

    def create_string(self, s: str) -> int:
        raw = s.encode() + b"\x00"
        self._align(4, len(raw) + 4)  # length prefix must land 4-aligned
        self._push(raw)
        self._push(struct.pack("<I", len(raw) - 1))
        return self.offset()

    def create_vector_bytes(self, raw: bytes) -> int:
        self._align(4, len(raw) + 4)
        self._push(raw)
        self._push(struct.pack("<I", len(raw)))
        return self.offset()

    def create_vector_scalar(self, fmt: str, arr) -> int:
        arr = np.asarray(arr)
        data = arr.astype("<" + fmt).tobytes()
        esize = arr.dtype.itemsize if fmt != "d" else 8
        self._align(max(4, esize), len(data) + 4)
        self._push(data)
        self._push(struct.pack("<I", len(arr)))
        return self.offset()

    def create_vector_offsets(self, offs: list[int]) -> int:
        self._align(4, 4 * len(offs) + 4)
        for o in reversed(offs):
            # uoffset from this field position to the target
            self._push(struct.pack("<I", self.offset() + 4 - o))
        self._push(struct.pack("<I", len(offs)))
        return self.offset()

    def table(self, slots: list[tuple[int, str, object]]) -> int:
        """Build a table from (slot_id, kind, value) where kind is a struct
        fmt for inline scalars, 'o' for a child offset.  Values equal to
        None are omitted.  Returns the table offset."""
        present = [(sid, kind, v) for sid, kind, v in slots if v is not None]
        if not present:
            max_id = -1
        else:
            max_id = max(sid for sid, _, _ in present)
        # write inline data back-to-front, recording each field's
        # distance-from-end and length; patch uoffsets for children
        field_end: dict[int, int] = {}
        field_len: dict[int, int] = {}
        for sid, kind, v in sorted(present, key=lambda t: t[0]):
            if kind == "o":
                self._align(4)
                self._push(struct.pack("<I", self.offset() + 4 - v))
                field_len[sid] = 4
            else:
                data = struct.pack("<" + kind, v)
                self._align(len(data))
                self._push(data)
                field_len[sid] = len(data)
            field_end[sid] = self.offset()
        self._align(4)
        self._push(struct.pack("<i", 0))  # placeholder soffset to vtable
        table_off = self.offset()
        # vtable: entry = byte offset from the table position to the field
        n_slots = max_id + 1
        vt_size = 4 + 2 * n_slots
        tbl_size = 4 if not field_end else table_off - min(
            field_end[s] - field_len[s] for s in field_end)
        vt = [struct.pack("<HH", vt_size, tbl_size)]
        for sid in range(n_slots):
            if sid in field_end:
                vt.append(struct.pack("<H", table_off - field_end[sid]))
            else:
                vt.append(struct.pack("<H", 0))
        self._push(b"".join(vt))
        vtable_off = self.offset()
        # patch the soffset (table -> vtable, signed, = vtable_pos - table_pos
        # in END distances: positive because vtable is before the table in
        # the final buffer)
        pos = len(self.buf) - table_off
        struct.pack_into("<i", self.buf, pos, vtable_off - table_off)
        return table_off

    def finish(self, root: int) -> bytes:
        self._align(self.minalign, 4)
        self._push(struct.pack("<I", self.offset() + 4 - root))
        return bytes(self.buf)


# -- minimal flatbuffers parser ----------------------------------------------


class Tbl:
    __slots__ = ("buf", "pos")

    def __init__(self, buf, pos):
        self.buf, self.pos = buf, pos

    @classmethod
    def root(cls, buf):
        (o,) = struct.unpack_from("<I", buf, 0)
        return cls(buf, o)

    def _field(self, fid: int):
        (so,) = struct.unpack_from("<i", self.buf, self.pos)
        vt = self.pos - so
        (vt_size,) = struct.unpack_from("<H", self.buf, vt)
        if 4 + 2 * fid >= vt_size:
            return None
        (off,) = struct.unpack_from("<H", self.buf, vt + 4 + 2 * fid)
        return self.pos + off if off else None

    def scalar(self, fid: int, fmt: str, default=0):
        p = self._field(fid)
        if p is None:
            return default
        return struct.unpack_from("<" + fmt, self.buf, p)[0]

    def _indirect(self, fid: int):
        p = self._field(fid)
        if p is None:
            return None
        (u,) = struct.unpack_from("<I", self.buf, p)
        return p + u

    def string(self, fid: int):
        p = self._indirect(fid)
        if p is None:
            return None
        (n,) = struct.unpack_from("<I", self.buf, p)
        return bytes(self.buf[p + 4:p + 4 + n]).decode()

    def vector_np(self, fid: int, dtype):
        p = self._indirect(fid)
        if p is None:
            return None
        (n,) = struct.unpack_from("<I", self.buf, p)
        return np.frombuffer(self.buf, dtype="<" + dtype, count=n,
                             offset=p + 4)

    def vector_bytes(self, fid: int):
        p = self._indirect(fid)
        if p is None:
            return None
        (n,) = struct.unpack_from("<I", self.buf, p)
        return bytes(self.buf[p + 4:p + 4 + n])

    def vector_tables(self, fid: int):
        p = self._indirect(fid)
        if p is None:
            return []
        (n,) = struct.unpack_from("<I", self.buf, p)
        out = []
        for i in range(n):
            ep = p + 4 + 4 * i
            (u,) = struct.unpack_from("<I", self.buf, ep)
            out.append(Tbl(self.buf, ep + u))
        return out

    def table(self, fid: int):
        p = self._indirect(fid)
        return None if p is None else Tbl(self.buf, p)


# -- geometry <-> FGB columnar encoding ---------------------------------------


def _geom_to_fb(b: Builder, g: "_wkb.Geom") -> int:
    if g.kind == _wkb.POINT:
        xy = b.create_vector_scalar("d", np.asarray(g.parts[0]).ravel())
        return b.table([(1, "o", xy), (6, "I", _wkb.POINT)])
    if g.kind == _wkb.LINESTRING:
        xy = b.create_vector_scalar("d", np.asarray(g.parts[0]).ravel())
        return b.table([(1, "o", xy), (6, "I", _wkb.LINESTRING)])
    if g.kind == _wkb.MULTIPOINT:
        flat = np.vstack([np.asarray(p) for p in g.parts]).ravel()
        xy = b.create_vector_scalar("d", flat)
        return b.table([(1, "o", xy), (6, "I", _wkb.MULTIPOINT)])
    if g.kind == _wkb.POLYGON or g.kind == _wkb.MULTILINESTRING:
        rings = g.parts[0] if g.kind == _wkb.POLYGON else g.parts
        flat = np.vstack([np.asarray(r) for r in rings])
        ends = np.cumsum([len(r) for r in rings]).astype(np.uint32)
        xy = b.create_vector_scalar("d", flat.ravel())
        eo = b.create_vector_scalar("I", ends) if len(rings) > 1 else None
        slots = [(1, "o", xy), (6, "I", g.kind)]
        if eo is not None:
            slots.insert(0, (0, "o", eo))
        return b.table(slots)
    if g.kind == _wkb.MULTIPOLYGON:
        parts = [_geom_to_fb(b, _wkb.Geom(_wkb.POLYGON, [rings]))
                 for rings in g.parts]
        pv = b.create_vector_offsets(parts)
        return b.table([(6, "I", _wkb.MULTIPOLYGON), (7, "o", pv)])
    raise ValueError(f"flatgeobuf: unsupported geometry kind {g.kind}")


def _fb_to_geom(t: Tbl) -> "_wkb.Geom":
    gt = t.scalar(6, "I", GT_UNKNOWN)
    if gt == _wkb.MULTIPOLYGON:
        polys = [_fb_to_geom(p).parts[0] for p in t.vector_tables(7)]
        return _wkb.Geom(_wkb.MULTIPOLYGON, polys)
    xy = t.vector_np(1, "d")
    pts = xy.reshape(-1, 2).astype(np.float64)
    if gt == _wkb.POINT:
        return _wkb.Geom(_wkb.POINT, [pts])
    if gt == _wkb.LINESTRING:
        return _wkb.Geom(_wkb.LINESTRING, [pts])
    if gt == _wkb.MULTIPOINT:
        return _wkb.Geom(_wkb.MULTIPOINT, [pts[i:i + 1]
                                           for i in range(len(pts))])
    ends = t.vector_np(0, "I")
    if ends is None:
        ends = np.array([len(pts)], np.uint32)
    rings, prev = [], 0
    for e in ends:
        rings.append(pts[prev:int(e)].copy())
        prev = int(e)
    if gt == _wkb.POLYGON:
        return _wkb.Geom(_wkb.POLYGON, [rings])
    if gt == _wkb.MULTILINESTRING:
        return _wkb.Geom(_wkb.MULTILINESTRING, rings)
    raise ValueError(f"flatgeobuf: unsupported geometry type {gt}")


_CT_OF_ARROW = {
    pa.int64(): CT_LONG, pa.int32(): CT_INT, pa.float64(): CT_DOUBLE,
    pa.float32(): CT_FLOAT, pa.string(): CT_STRING, pa.bool_(): CT_BOOL,
    pa.binary(): CT_BINARY,
}
_FMT_OF_CT = {CT_LONG: "q", CT_INT: "i", CT_DOUBLE: "d", CT_FLOAT: "f",
              CT_BOOL: "?"}
_ARROW_OF_CT = {CT_LONG: pa.int64(), CT_INT: pa.int32(),
                CT_DOUBLE: pa.float64(), CT_FLOAT: pa.float32(),
                CT_BOOL: pa.bool_(), CT_STRING: pa.string(),
                CT_JSON: pa.string(), CT_BINARY: pa.binary()}


def write_flatgeobuf(table: pa.Table, path: str, wkb_col: str = "wkb",
                     name: str = "layer", crs_code: int = 4326,
                     index_node_size: int = 0) -> int:
    """Encode an Arrow table (wkb + property columns) as one .fgb file.
    ``index_node_size > 0`` writes the spec's packed Hilbert R-tree
    (features sorted by Hilbert value of their bbox center over the
    dataset extent, order-16 curve — the flatbush layout), enabling
    bbox-filtered reads that parse only matching features.  Returns the
    feature count."""
    if index_node_size:
        from ..functions.geo import hilbert_encode

        boxes = _wkb.bboxes(table[wkb_col].to_pylist())
        lo = boxes[:, :2].min(axis=0)
        hi = boxes[:, 2:].max(axis=0)
        cx = (boxes[:, 0] + boxes[:, 2]) / 2.0
        cy = (boxes[:, 1] + boxes[:, 3]) / 2.0
        span = np.maximum(hi - lo, 1e-300)
        gx = ((cx - lo[0]) / span[0] * ((1 << 16) - 1)).astype(np.int64)
        gy = ((cy - lo[1]) / span[1] * ((1 << 16) - 1)).astype(np.int64)
        order = np.argsort(hilbert_encode(gx, gy, 16), kind="stable")
        table = table.take(pa.array(order))
        boxes = boxes[order]
    prop_cols = [c for c in table.column_names if c != wkb_col]
    col_types = []
    for c in prop_cols:
        t = table.schema.field(c).type
        if t not in _CT_OF_ARROW:
            raise ValueError(f"flatgeobuf: unsupported column type {t}")
        col_types.append(_CT_OF_ARROW[t])

    # header
    hb = Builder()
    col_offs = []
    for c, ct in zip(prop_cols, col_types):
        no = hb.create_string(c)
        col_offs.append(hb.table([(0, "o", no), (1, "B", ct)]))
    cols_vec = hb.create_vector_offsets(col_offs) if col_offs else None
    name_off = hb.create_string(name)
    crs_off = hb.table([(1, "i", int(crs_code))])  # Crs: org 0, code 1
    slots = [(0, "o", name_off), (2, "B", GT_UNKNOWN),
             (8, "Q", table.num_rows),
             (9, "H", index_node_size), (10, "o", crs_off)]
    if cols_vec is not None:
        slots.append((7, "o", cols_vec))
    header = hb.finish(hb.table(slots))

    feats = []
    for i in range(table.num_rows):
        fb = Builder()
        geo = _geom_to_fb(fb, _wkb.decode(table[wkb_col][i].as_py()))
        props = bytearray()
        for j, (c, ct) in enumerate(zip(prop_cols, col_types)):
            v = table[c][i].as_py()
            if v is None:
                continue  # nullable columns omit the pair
            props += struct.pack("<H", j)
            if ct in _FMT_OF_CT:
                props += struct.pack("<" + _FMT_OF_CT[ct], v)
            elif ct in (CT_STRING, CT_JSON):
                raw = v.encode()
                props += struct.pack("<I", len(raw)) + raw
            else:  # CT_BINARY
                props += struct.pack("<I", len(v)) + v
        slots = [(0, "o", geo)]
        if props:
            slots.append((1, "o", fb.create_vector_bytes(bytes(props))))
        body = fb.finish(fb.table(slots))
        feats.append(struct.pack("<I", len(body)) + body)
    with open(path, "wb") as f:
        f.write(MAGIC)
        f.write(struct.pack("<I", len(header)))
        f.write(header)
        if index_node_size and table.num_rows:
            offs = np.concatenate(
                ([0], np.cumsum([len(b) for b in feats])[:-1]))
            f.write(_build_index(boxes, offs, index_node_size))
        for b in feats:
            f.write(b)
    return len(feats)


def read_flatgeobuf(path: str, bbox=None) -> pa.Table:
    """Decode one .fgb file -> Arrow table (wkb + property columns).
    ``bbox = (minx, miny, maxx, maxy)`` uses the packed Hilbert R-tree
    (when present) to parse ONLY intersecting features."""
    with open(path, "rb") as f:
        buf = f.read()
    if buf[:8] != MAGIC:
        raise ValueError("not a FlatGeobuf file (bad magic)")
    (hlen,) = struct.unpack_from("<I", buf, 8)
    header = Tbl.root(memoryview(buf)[12:12 + hlen])
    cols = [(c.string(0), c.scalar(1, "B", CT_BYTE))
            for c in header.vector_tables(7)]
    node_size = header.scalar(9, "H", 16)
    nfeat = header.scalar(8, "Q", 0)
    pos = 12 + hlen
    tree = None
    if node_size > 0 and nfeat > 0:
        sizes = sum(_level_counts(nfeat, node_size))
        tree = buf[pos:pos + sizes * 40]
        pos += sizes * 40
    if bbox is not None:
        if tree is None:
            raise ValueError("bbox read requested but the file carries no "
                             "spatial index (written with index_node_size=0)")
        feat_offs = _query_index(tree, nfeat, node_size, tuple(bbox))
        return _parse_features(buf, [pos + o for o in feat_offs], cols)
    positions = []
    while pos < len(buf):
        positions.append(pos)
        (flen,) = struct.unpack_from("<I", buf, pos)
        pos += 4 + flen
    return _parse_features(buf, positions, cols)


def _parse_features(buf, positions, cols) -> pa.Table:
    """Parse the size-prefixed Feature records at ``positions``."""
    wkbs, props_rows = [], []
    for pos in positions:
        (flen,) = struct.unpack_from("<I", buf, pos)
        feat = Tbl.root(memoryview(buf)[pos + 4:pos + 4 + flen])
        wkbs.append(_wkb.encode_geom(_fb_to_geom(feat.table(0))))
        raw = feat.vector_bytes(1) or b""
        row = {}
        p = 0
        while p < len(raw):
            (j,) = struct.unpack_from("<H", raw, p)
            p += 2
            cname, ct = cols[j]
            if ct in _FMT_OF_CT:
                fmt = _FMT_OF_CT[ct]
                (row[cname],) = struct.unpack_from("<" + fmt, raw, p)
                p += struct.calcsize(fmt)
            else:
                (ln,) = struct.unpack_from("<I", raw, p)
                p += 4
                v = raw[p:p + ln]
                row[cname] = v.decode() if ct in (CT_STRING, CT_JSON) else v
                p += ln
        props_rows.append(row)
    out = {"wkb": pa.array(wkbs, pa.binary())}
    for cname, ct in cols:
        out[cname] = pa.array([r.get(cname) for r in props_rows],
                              _ARROW_OF_CT[ct])
    return pa.table(out)


def write_flatgeobuf_parts(ds, out_dir: str, wkb_col: str = "wkb",
                           name: str = "layer", crs_code: int = 4326):
    """Streaming distributed sink: one part-<i>.fgb per input block, written
    on workers (the per-file pattern shared with the GeoParquet sink); the
    driver sees only per-part feature counts."""
    import os

    os.makedirs(out_dir, exist_ok=True)

    def put(t: pa.Table) -> pa.Table:
        import uuid

        part = os.path.join(out_dir, f"part-{uuid.uuid4().hex[:12]}.fgb")
        n = write_flatgeobuf(t, part, wkb_col=wkb_col, name=name,
                             crs_code=crs_code)
        return pa.table({"path": pa.array([part]),
                         "n_features": pa.array([n], pa.int64())})

    return ds.map_batches(put, batch_format="pyarrow")


# -- packed Hilbert R-tree index (spec packedrtree; flatbush layout) ----------


def _level_counts(n: int, node_size: int) -> list[int]:
    """Node counts per level, leaves first (flatbush/packedrtree shape)."""
    counts = [n]
    while counts[-1] != 1:
        counts.append((counts[-1] + node_size - 1) // node_size)
    return counts


def _build_index(boxes: np.ndarray, feat_offsets: np.ndarray,
                 node_size: int) -> bytes:
    """Packed Hilbert R-tree bytes (root level first, 40-byte nodes:
    4 x f64 bbox + u64 offset).  ``boxes`` must already be in Hilbert
    order; leaf offsets point into the feature section, internal offsets
    to the first CHILD node's byte position within the index."""
    n = len(boxes)
    counts = _level_counts(n, node_size)          # leaves first
    # serialized order: root first -> compute start indices
    total = sum(counts)
    start = total
    starts_rev = []
    for c in counts:                              # leaves first
        start -= c
        starts_rev.append(start)
    # starts_rev[i] = start node index of level i (0 = leaves)
    nodes = np.zeros((total, 5), dtype=np.float64)
    off_view = nodes[:, 4].view(np.uint64)
    # leaves
    ls = starts_rev[0]
    nodes[ls:ls + n, 0:4] = boxes
    off_view[ls:ls + n] = feat_offsets.astype(np.uint64)
    # internal levels
    for lvl in range(1, len(counts)):
        cs = starts_rev[lvl - 1]                  # child level start
        cn = counts[lvl - 1]
        ps = starts_rev[lvl]
        for i in range(counts[lvl]):
            c0 = cs + i * node_size
            c1 = min(cs + cn, c0 + node_size)
            nodes[ps + i, 0] = nodes[c0:c1, 0].min()
            nodes[ps + i, 1] = nodes[c0:c1, 1].min()
            nodes[ps + i, 2] = nodes[c0:c1, 2].max()
            nodes[ps + i, 3] = nodes[c0:c1, 3].max()
            off_view[ps + i] = np.uint64(c0 * 40)
    return nodes.tobytes()


def _query_index(tree: bytes, n: int, node_size: int,
                 q: tuple[float, float, float, float]) -> list[int]:
    """Feature byte offsets whose leaf bbox intersects ``q`` — touches only
    the nodes on the search path."""
    if n == 0:
        return []
    counts = _level_counts(n, node_size)
    total = sum(counts)
    leaf_start = total - n
    # level end indices in serialized (root-first) order
    ends, pos = [], 0
    for c in reversed(counts):
        pos += c
        ends.append(pos)
    nodes = np.frombuffer(tree, dtype=np.float64).reshape(total, 5)
    offs = nodes[:, 4].view(np.uint64)
    out = []
    stack = [0]
    while stack:
        i = stack.pop()
        if (nodes[i, 0] > q[2] or nodes[i, 2] < q[0]
                or nodes[i, 1] > q[3] or nodes[i, 3] < q[1]):
            continue
        if i >= leaf_start:
            out.append(int(offs[i]))
        else:
            c0 = int(offs[i]) // 40
            lvl_end = next(e for e in ends if e > c0)
            for c in range(c0, min(c0 + node_size, lvl_end)):
                stack.append(c)
    return sorted(out)
