"""GPX vector format — stdlib-XML reader + writer.

Re-answers the reference's GPX driver (``ogr/ogrsf_frmts/gpx/``) from the
Topografix GPX 1.1 schema: the driver exposes the spec's three geometry
carriers as OGR-style layers —

- ``waypoints``: ``<wpt lat lon>`` -> POINT
- ``routes``:    ``<rte><rtept lat lon>...`` -> LINESTRING
- ``tracks``:    ``<trk><trkseg><trkpt lat lon>...`` -> MULTILINESTRING
  (one member per ``<trkseg>``, the reference's layer mapping)

Standard fields ``name`` / ``desc`` / ``ele`` (waypoints) map to the spec
elements; any other attribute rides in ``<extensions>`` as
``<ogr:FIELD>value</ogr:FIELD>`` — exactly the reference's
GPX_USE_EXTENSIONS field mapping (ogr_gpx.h).  Attribute values read back
as STRINGS (GPX carries no schema), same policy as the KML driver.

Floats serialize via ``repr`` (shortest round-trip) so f64 lat/lon survive
bitwise.  GPX order is (lat, lon) attributes; WKB holds (x=lon, y=lat).

Parallel read: one XML document, so ``read_gpx_dataset`` scans for
top-level element byte ranges with C-level ``str.find`` (no XML parse) and
ships range blocks to workers that each parse only their own elements —
the KML driver's manifest pattern."""

from __future__ import annotations

from xml.sax.saxutils import escape

import numpy as np
import pyarrow as pa

from ..functions import wkb as wkb_f

_HDR = ('<?xml version="1.0" encoding="UTF-8"?>\n'
        '<gpx version="1.1" creator="gdal_ray" '
        'xmlns="http://www.topografix.com/GPX/1/1" '
        'xmlns:ogr="http://osgeo.org/gdal">\n')
_FTR = "</gpx>\n"
_STD_WPT = ("name", "desc", "ele")
_STD = ("name", "desc")


def _ext_xml(attrs: dict) -> str:
    if not attrs:
        return ""
    body = "".join(f"<ogr:{k}>{escape(str(v))}</ogr:{k}>"
                   for k, v in attrs.items() if v is not None)
    return f"<extensions>{body}</extensions>" if body else ""


def _pt_attrs(x: float, y: float) -> str:
    return f'lat="{repr(float(y))}" lon="{repr(float(x))}"'


def write_gpx(path: str, wkbs, attrs: pa.Table | None = None) -> None:
    """Write features to GPX: POINTs -> waypoints, LINESTRINGs -> routes,
    MULTILINESTRINGs -> tracks (one trkseg per member).  ``name``/``desc``
    (and ``ele`` for points) attribute columns map to the spec elements;
    everything else goes to <extensions>."""
    rows = attrs.to_pylist() if attrs is not None else [{}] * len(wkbs)
    out = [_HDR]
    trailer = []  # spec order: wpt*, rte*, trk*
    routes, tracks = [], []
    for wkb, row in zip(wkbs, rows):
        g = wkb_f.decode(wkb)
        std_keys = _STD_WPT if g.kind == wkb_f.POINT else _STD
        std = {k: row[k] for k in std_keys if k in row and row[k] is not None}
        ext = {k: v for k, v in row.items() if k not in std_keys}
        if g.kind == wkb_f.POINT:
            x, y = g.parts[0][0]
            body = "".join(f"<{k}>{escape(str(std[k]))}</{k}>"
                           for k in ("ele", "name", "desc") if k in std)
            out.append(f"<wpt {_pt_attrs(x, y)}>{body}{_ext_xml(ext)}</wpt>\n")
        elif g.kind == wkb_f.LINESTRING:
            pts = "".join(f"<rtept {_pt_attrs(x, y)}/>"
                          for x, y in g.parts[0])
            body = "".join(f"<{k}>{escape(str(std[k]))}</{k}>"
                           for k in ("name", "desc") if k in std)
            routes.append(f"<rte>{body}{_ext_xml(ext)}{pts}</rte>\n")
        elif g.kind == wkb_f.MULTILINESTRING:
            segs = "".join(
                "<trkseg>" + "".join(f"<trkpt {_pt_attrs(x, y)}/>"
                                     for x, y in seg) + "</trkseg>"
                for seg in g.parts)
            body = "".join(f"<{k}>{escape(str(std[k]))}</{k}>"
                           for k in ("name", "desc") if k in std)
            tracks.append(f"<trk>{body}{_ext_xml(ext)}{segs}</trk>\n")
        else:
            raise ValueError(
                f"GPX carries points/lines only (wkb kind {g.kind}) — "
                "polygons need a different driver (reference rejects too)")
    out += routes + tracks + trailer + [_FTR]
    with open(path, "w", encoding="utf-8") as f:
        f.write("".join(out))


_NS = "{http://www.topografix.com/GPX/1/1}"
_OGR_NS = "{http://osgeo.org/gdal}"


def _strip(tag: str) -> str:
    return tag.rsplit("}", 1)[-1]


def _elem_fields(el, skip: tuple) -> dict:
    row = {}
    for ch in el:
        t = _strip(ch.tag)
        if t in skip:
            continue
        if t == "extensions":
            for e in ch:
                row[_strip(e.tag)] = e.text
        elif ch.text is not None:
            row[t] = ch.text
    return row


def _parse_elem(el):
    """(wkb, attr-dict) for a wpt/rte/trk element."""
    t = _strip(el.tag)
    if t == "wpt":
        x, y = float(el.get("lon")), float(el.get("lat"))
        pts = np.array([[x, y]], np.float64)
        g = wkb_f.Geom(wkb_f.POINT, [pts])
        return wkb_f.encode_geom(g), _elem_fields(el, ())
    if t == "rte":
        pts = np.array([[float(p.get("lon")), float(p.get("lat"))]
                        for p in el if _strip(p.tag) == "rtept"], np.float64)
        g = wkb_f.Geom(wkb_f.LINESTRING, [pts])
        return wkb_f.encode_geom(g), _elem_fields(el, ("rtept",))
    if t == "trk":
        segs = []
        for seg in el:
            if _strip(seg.tag) != "trkseg":
                continue
            segs.append(np.array(
                [[float(p.get("lon")), float(p.get("lat"))]
                 for p in seg if _strip(p.tag) == "trkpt"], np.float64))
        g = wkb_f.Geom(wkb_f.MULTILINESTRING, segs)
        return wkb_f.encode_geom(g), _elem_fields(el, ("trkseg",))
    raise ValueError(t)


_LAYER_TAG = {"waypoints": "wpt", "routes": "rte", "tracks": "trk"}


def read_gpx(path: str, layer: str = "waypoints") -> pa.Table:
    """Eager read of one GPX layer -> (wkb + string attribute columns)."""
    import xml.etree.ElementTree as ET

    tag = _LAYER_TAG[layer]
    root = ET.parse(path).getroot()
    wkbs, rows = [], []
    for el in root:
        if _strip(el.tag) != tag:
            continue
        wkb, row = _parse_elem(el)
        wkbs.append(wkb)
        rows.append(row)
    cols = {"wkb": pa.array(wkbs, pa.binary())}
    keys = sorted({k for r in rows for k in r})
    for k in keys:
        cols[k] = pa.array([r.get(k) for r in rows], pa.string())
    return pa.table(cols)


def element_ranges(path: str, layer: str = "waypoints") -> list:
    """Byte ranges of top-level layer elements (driver-side C-level scan,
    no XML parse) — the per-worker read manifest."""
    tag = _LAYER_TAG[layer]
    data = open(path, "rb").read()
    opens = (b"<%s " % tag.encode(), b"<%s>" % tag.encode())
    close = b"</%s>" % tag.encode()
    self_close = b"/>"
    ranges = []
    pos = 0
    while True:
        cands = [i for i in (data.find(o, pos) for o in opens) if i >= 0]
        if not cands:
            break
        start = min(cands)
        # element ends at its matching close tag, or a self-close before
        # any child opens (wpt with no children)
        end_close = data.find(close, start)
        gt = data.find(b">", start)
        if gt >= 0 and data[gt - 1:gt + 1] == self_close and (
                end_close < 0 or gt < end_close):
            end = gt + 1
        else:
            end = end_close + len(close)
        ranges.append((start, end))
        pos = end
    return ranges


def read_gpx_dataset(path: str, layer: str = "waypoints",
                     per_block: int = 512):
    """Parallel GPX read: range manifest -> workers XML-parse only their
    own elements.  Attribute columns are unioned across blocks."""
    import ray.data as rd

    ranges = element_ranges(path, layer)
    blocks = [(path, ranges[i:i + per_block])
              for i in range(0, len(ranges), per_block)] or [(path, [])]
    mft = pa.table({
        "path": pa.array([b[0] for b in blocks]),
        "start": pa.array([[r[0] for r in b[1]] for b in blocks],
                          pa.list_(pa.int64())),
        "end": pa.array([[r[1] for r in b[1]] for b in blocks],
                        pa.list_(pa.int64())),
    })

    def parse(t: pa.Table) -> pa.Table:
        import xml.etree.ElementTree as ET

        wkbs, rows = [], []
        for i in range(t.num_rows):
            p = t["path"][i].as_py()
            data = open(p, "rb").read()
            for s, e in zip(t["start"][i].as_py(), t["end"][i].as_py()):
                frag = data[s:e].decode("utf-8")
                # parse the fragment with the gpx namespace bound
                el = ET.fromstring(
                    f'<g xmlns="http://www.topografix.com/GPX/1/1" '
                    f'xmlns:ogr="http://osgeo.org/gdal">{frag}</g>')[0]
                wkb, row = _parse_elem(el)
                wkbs.append(wkb)
                rows.append(row)
        cols = {"wkb": pa.array(wkbs, pa.binary())}
        for k in sorted({k for r in rows for k in r}):
            cols[k] = pa.array([r.get(k) for r in rows], pa.string())
        return pa.table(cols)

    return rd.from_arrow(mft).map_batches(parse, batch_format="pyarrow")
