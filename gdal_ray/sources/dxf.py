"""DXF vector format — group-code reader + writer (ASCII DXF).

Re-answers the reference's DXF driver (``ogr/ogrsf_frmts/dxf/``) from the
public Autodesk DXF specification: an ASCII DXF file is a stream of
(group code, value) line pairs; entities live between the ENTITIES
``SECTION``/``ENDSEC`` pair, each opened by a ``0`` group.

Entity mapping (the reference's ogrdxflayer.cpp translation table):

- ``POINT``       -> POINT (codes 10/20)
- ``LINE``        -> LINESTRING (10/20 -> 11/21)
- ``LWPOLYLINE``  -> LINESTRING, closed ring when flag 70 bit 1 is set
                     (the reference also returns closed polylines as
                     linestrings; polygons travel as HATCH)
- ``POLYLINE`` + ``VERTEX``... ``SEQEND`` -> LINESTRING (legacy form)
- ``CIRCLE``      -> closed CIRCULARSTRING (center 10/20, radius 40),
                     three-point arc encoding like ogrdxf CIRCLE handling
- ``ARC``         -> CIRCULARSTRING from start/end angles (50/51, degrees
                     CCW from east — the reference's convention)
- ``TEXT``/``MTEXT`` -> POINT + ``Text`` attribute (code 1)
- ``HATCH``       -> POLYGON: boundary paths (91/93 counts, 10/20 vertex
                     pairs), first path = shell, rest = holes.  The writer
                     emits POLYGON/MULTIPOLYGON as solid-fill HATCH, the
                     reference writer's behavior (ogrdxfwriterlayer.cpp).

Attributes carried per feature (the reference's fixed DXF schema):
``Layer`` (code 8), ``EntityHandle`` (code 5), ``Text`` (code 1, TEXT
only).  Floats serialize via ``repr`` so f64 coordinates survive bitwise.

Parallel read: entities are self-contained pair runs, so
``read_dxf_dataset`` scans for entity-start byte offsets with a compiled
regex (driver-side, no parse) and ships offset ranges to workers — the
KML/GPX manifest pattern."""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa

from ..functions import wkb as wkb_f

_ENTITY_KINDS = ("POINT", "LINE", "LWPOLYLINE", "POLYLINE", "CIRCLE",
                 "ARC", "TEXT", "MTEXT", "HATCH")


# -- writer -------------------------------------------------------------------


def _pairs(*items) -> str:
    out = []
    for code, val in items:
        if isinstance(val, float):
            val = repr(val)
        out.append(f"{code}\n{val}")
    return "\n".join(out) + "\n"


def _f(v) -> float:
    return float(v)


def _ent_header(name: str, handle: int, layer: str) -> str:
    return _pairs((0, name), (5, format(handle, "X")), (8, layer))


def _lwpolyline(pts: np.ndarray, closed: bool, handle: int,
                layer: str) -> str:
    out = [_ent_header("LWPOLYLINE", handle, layer),
           _pairs((90, len(pts)), (70, 1 if closed else 0))]
    for x, y in pts:
        out.append(_pairs((10, _f(x)), (20, _f(y))))
    return "".join(out)


def _hatch(rings, handle: int, layer: str) -> str:
    out = [_ent_header("HATCH", handle, layer),
           _pairs((2, "SOLID"), (70, 1), (71, 0), (91, len(rings)))]
    for ring in rings:
        pts = ring[:-1] if len(ring) > 1 and np.array_equal(
            ring[0], ring[-1]) else ring
        out.append(_pairs((92, 2), (72, 0), (73, 1), (93, len(pts))))
        for x, y in pts:
            out.append(_pairs((10, _f(x)), (20, _f(y))))
        out.append(_pairs((97, 0)))
    out.append(_pairs((75, 0), (76, 1), (98, 0)))
    return "".join(out)


def write_dxf(path: str, wkbs, attrs: pa.Table | None = None) -> None:
    """Write features to ASCII DXF.  ``Layer``/``Text`` attribute columns
    map to codes 8/1; feature order assigns EntityHandle values."""
    rows = attrs.to_pylist() if attrs is not None else [{}] * len(wkbs)
    ents = []
    handle = 0x100
    for wkb, row in zip(wkbs, rows):
        layer = str(row.get("Layer", "0"))
        text = row.get("Text")
        g = wkb_f.decode(wkb)
        if g.kind == wkb_f.POINT:
            x, y = g.parts[0][0]
            if text is not None:
                ents.append(_ent_header("TEXT", handle, layer) +
                            _pairs((10, _f(x)), (20, _f(y)), (40, 1.0),
                                   (1, str(text))))
            else:
                ents.append(_ent_header("POINT", handle, layer) +
                            _pairs((10, _f(x)), (20, _f(y))))
        elif g.kind == wkb_f.LINESTRING:
            pts = g.parts[0]
            closed = len(pts) > 3 and np.array_equal(pts[0], pts[-1])
            if len(pts) == 2:
                ents.append(_ent_header("LINE", handle, layer) +
                            _pairs((10, _f(pts[0, 0])), (20, _f(pts[0, 1])),
                                   (11, _f(pts[1, 0])), (21, _f(pts[1, 1]))))
            else:
                ents.append(_lwpolyline(pts[:-1] if closed else pts,
                                        closed, handle, layer))
        elif g.kind == wkb_f.POLYGON:
            ents.append(_hatch(g.parts[0], handle, layer))
        elif g.kind == wkb_f.MULTIPOLYGON:
            rings = [r for poly in g.parts for r in poly]
            ents.append(_hatch(rings, handle, layer))
        elif g.kind == wkb_f.MULTILINESTRING:
            for part in g.parts:  # reference explodes these too
                ents.append(_lwpolyline(part, False, handle, layer))
        else:
            raise ValueError(f"DXF writer: unsupported wkb kind {g.kind}")
        handle += 1
    body = (_pairs((0, "SECTION"), (2, "HEADER"),
                   (9, "$ACADVER"), (1, "AC1015"), (0, "ENDSEC")) +
            _pairs((0, "SECTION"), (2, "ENTITIES")) +
            "".join(ents) +
            _pairs((0, "ENDSEC"), (0, "EOF")))
    with open(path, "w", encoding="utf-8") as f:
        f.write(body)


# -- reader -------------------------------------------------------------------


def _tokenize(text: str):
    lines = text.lstrip("\r\n").splitlines()
    for i in range(0, len(lines) - 1, 2):
        yield lines[i].strip(), lines[i + 1].strip()


def _arc_wkb(cx, cy, r, a0_deg, a1_deg) -> bytes:
    a0 = np.deg2rad(a0_deg)
    a1 = np.deg2rad(a1_deg)
    if a1 <= a0:
        a1 += 2 * np.pi
    am = 0.5 * (a0 + a1)
    pts = np.array([[cx + r * np.cos(a0), cy + r * np.sin(a0)],
                    [cx + r * np.cos(am), cy + r * np.sin(am)],
                    [cx + r * np.cos(a1), cy + r * np.sin(a1)]])
    return wkb_f.encode_circularstring(pts)


def _circle_wkb(cx, cy, r) -> bytes:
    # closed circularstring: 5 points (two half arcs), reference's CIRCLE
    pts = np.array([[cx + r, cy], [cx, cy + r], [cx - r, cy],
                    [cx, cy - r], [cx + r, cy]])
    return wkb_f.encode_circularstring(pts)


def parse_entities(tokens) -> list:
    """(wkb, attr-dict) rows from a (code, value) token stream positioned
    anywhere — entities start at 0-groups with a known kind."""
    rows = []
    cur = None  # dict of accumulated state for the open entity

    def flush():
        if cur is None:
            return
        k = cur["kind"]
        attrs = {"Layer": cur.get("layer", "0"),
                 "EntityHandle": cur.get("handle", ""),
                 "Text": cur.get("text")}
        xs, ys = cur["xs"], cur["ys"]
        wkb = None
        if k == "POINT" and xs:
            wkb = wkb_f.encode_points(np.array(xs[:1]), np.array(ys[:1]))[0]
        elif k in ("TEXT", "MTEXT") and xs:
            wkb = wkb_f.encode_points(np.array(xs[:1]), np.array(ys[:1]))[0]
        elif k == "LINE" and len(xs) >= 1:
            pts = np.array([[xs[0], ys[0]], [cur.get("x1", 0.0),
                                             cur.get("y1", 0.0)]])
            wkb = wkb_f.encode_linestring(pts)
        elif k in ("LWPOLYLINE", "POLYLINE") and xs:
            pts = np.column_stack([xs, ys])
            if cur.get("flags", 0) & 1:
                ring = np.vstack([pts, pts[:1]])
                wkb = wkb_f.encode_linestring(ring)
            else:
                wkb = wkb_f.encode_linestring(pts)
        elif k == "CIRCLE" and xs:
            wkb = _circle_wkb(xs[0], ys[0], cur.get("r", 0.0))
        elif k == "ARC" and xs:
            wkb = _arc_wkb(xs[0], ys[0], cur.get("r", 0.0),
                           cur.get("a0", 0.0), cur.get("a1", 360.0))
        elif k == "HATCH" and cur["paths"]:
            rings = []
            for p in cur["paths"]:
                arr = np.array(p, np.float64).reshape(-1, 2)
                rings.append(np.vstack([arr, arr[:1]]))
            wkb = wkb_f.encode_polygon(rings)
        if wkb is not None:
            rows.append((wkb, attrs))

    it = iter(tokens)
    for code, val in it:
        if code == "0":
            if val in _ENTITY_KINDS:
                flush()
                cur = {"kind": val, "xs": [], "ys": [], "paths": []}
            elif val == "VERTEX" and cur is not None and \
                    cur["kind"] == "POLYLINE":
                cur["want_vertex"] = True
            elif val == "SEQEND" and cur is not None and \
                    cur["kind"] == "POLYLINE":
                flush()
                cur = None
            else:
                flush()
                cur = None
            continue
        if cur is None:
            continue
        k = cur["kind"]
        if code == "8":
            cur["layer"] = val
        elif code == "5":
            cur["handle"] = val
        elif code == "1" and k in ("TEXT", "MTEXT"):
            cur["text"] = val
        elif code == "10":
            if k == "HATCH":
                if cur.get("path_pts") is not None:
                    cur["path_pts"].append(float(val))
            else:
                cur["xs"].append(float(val))
        elif code == "20":
            if k == "HATCH":
                if cur.get("path_pts") is not None:
                    cur["path_pts"].append(float(val))
            else:
                cur["ys"].append(float(val))
        elif code == "11":
            cur["x1"] = float(val)
        elif code == "21":
            cur["y1"] = float(val)
        elif code == "40" and k in ("CIRCLE", "ARC"):
            cur["r"] = float(val)
        elif code == "50" and k == "ARC":
            cur["a0"] = float(val)
        elif code == "51" and k == "ARC":
            cur["a1"] = float(val)
        elif code == "70" and k in ("LWPOLYLINE", "POLYLINE"):
            cur["flags"] = int(val)
        elif code == "93" and k == "HATCH":
            cur["path_pts"] = []
            cur["paths"].append(cur["path_pts"])
        elif code in ("97", "98") and k == "HATCH":
            cur["path_pts"] = None  # seed points / source refs: not vertices
    flush()
    return rows


def _rows_to_table(rows) -> pa.Table:
    return pa.table({
        "wkb": pa.array([r[0] for r in rows], pa.binary()),
        "Layer": pa.array([r[1]["Layer"] for r in rows], pa.string()),
        "EntityHandle": pa.array([r[1]["EntityHandle"] for r in rows],
                                 pa.string()),
        "Text": pa.array([r[1]["Text"] for r in rows], pa.string()),
    })


def read_dxf(path: str) -> pa.Table:
    """Eager DXF read -> (wkb, Layer, EntityHandle, Text)."""
    text = open(path, "r", encoding="utf-8", errors="replace").read()
    m = re.search(r"(?ms)^\s*2\s*\nENTITIES\s*$", text)
    if m:
        text = text[m.end():]
    return _rows_to_table(parse_entities(_tokenize(text)))


_START_RE = re.compile(
    r"(?m)^[ \t]*0[ \t]*\r?\n(%s)[ \t]*\r?$" % "|".join(_ENTITY_KINDS))


def entity_ranges(path: str) -> list:
    """Byte offsets of entity starts inside the ENTITIES section (cheap
    driver-side regex scan; the worker parses [start_i, start_{i+1}))."""
    data = open(path, "r", encoding="utf-8", errors="replace").read()
    m = re.search(r"(?ms)^\s*2\s*\nENTITIES\s*$", data)
    lo = m.end() if m else 0
    end_m = re.search(r"(?m)^[ \t]*0[ \t]*\r?\nENDSEC[ \t]*\r?$", data[lo:])
    hi = lo + end_m.start() if end_m else len(data)
    starts = [lo + mm.start() for mm in _START_RE.finditer(data[lo:hi])]
    # POLYLINE's VERTEX/SEQEND children are NOT starts; the regex only
    # matches the kinds list, so children stay inside their parent range
    return [(s, starts[i + 1] if i + 1 < len(starts) else hi)
            for i, s in enumerate(starts)]


def read_dxf_dataset(path: str, per_block: int = 512):
    """Parallel DXF read: entity-range manifest -> workers parse only
    their own byte ranges."""
    import ray.data as rd

    ranges = entity_ranges(path)
    blocks = [(ranges[i][0], ranges[min(i + per_block, len(ranges)) - 1][1])
              for i in range(0, len(ranges), per_block)] or [(0, 0)]
    mft = pa.table({
        "path": pa.array([path] * len(blocks)),
        "start": pa.array([b[0] for b in blocks], pa.int64()),
        "end": pa.array([b[1] for b in blocks], pa.int64()),
    })

    def parse(t: pa.Table) -> pa.Table:
        rows = []
        for i in range(t.num_rows):
            data = open(t["path"][i].as_py(), "r", encoding="utf-8",
                        errors="replace").read()
            frag = data[t["start"][i].as_py():t["end"][i].as_py()]
            rows.extend(parse_entities(_tokenize(frag)))
        return _rows_to_table(rows)

    return rd.from_arrow(mft).map_batches(parse, batch_format="pyarrow")
