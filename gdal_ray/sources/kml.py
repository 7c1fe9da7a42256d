"""KML vector format — stdlib-XML reader + writer.

Re-answers the reference's KML driver surface (``ogr/ogrsf_frmts/kml/``,
``ogr/ogrsf_frmts/libkml/``) from the OGC KML 2.2 spec: Placemark features
with Point / LineString / Polygon / MultiGeometry, attributes carried in
ExtendedData Data/value elements (the reference's field mapping), coordinate
tuples as ``lon,lat`` whitespace-separated lists.

Floats serialize via Python ``repr`` (shortest round-trip) so f64
coordinates survive bitwise — same policy as the GeoJSON driver.

Parallel read path: KML is one XML document, so generic byte-range splits
are NOT exact (unlike GeoJSONSeq).  ``read_kml_dataset`` does what the
shapefile driver does with its .shx manifest: a cheap driver-side scan for
``<Placemark`` element byte ranges (C-level ``str.find``, no XML parse),
then ships range blocks to workers that each XML-parse only their own
placemarks.  Attribute values are STRINGS (KML carries no schema, matching
the reference's behavior) — callers cast.
"""

from __future__ import annotations

from xml.sax.saxutils import escape

import numpy as np
import pyarrow as pa

from ..functions import wkb as wkb_f

_HDR = ('<?xml version="1.0" encoding="UTF-8"?>\n'
        '<kml xmlns="http://www.opengis.net/kml/2.2">\n<Document>\n')
_FTR = "</Document>\n</kml>\n"
_NS = "{http://www.opengis.net/kml/2.2}"


def _coords_str(arr) -> str:
    return " ".join(f"{repr(float(x))},{repr(float(y))}" for x, y in arr)


def _geom_xml(wkb: bytes) -> str:
    g = wkb_f.decode(wkb)
    if g.kind == wkb_f.POINT:
        return f"<Point><coordinates>{_coords_str(g.parts[0])}</coordinates></Point>"
    if g.kind == wkb_f.LINESTRING:
        return (f"<LineString><coordinates>{_coords_str(g.parts[0])}"
                "</coordinates></LineString>")
    if g.kind == wkb_f.POLYGON:
        rings = g.parts[0]
        out = ["<Polygon><outerBoundaryIs><LinearRing><coordinates>",
               _coords_str(rings[0]),
               "</coordinates></LinearRing></outerBoundaryIs>"]
        for hole in rings[1:]:
            out += ["<innerBoundaryIs><LinearRing><coordinates>",
                    _coords_str(hole),
                    "</coordinates></LinearRing></innerBoundaryIs>"]
        out.append("</Polygon>")
        return "".join(out)
    if g.kind in (wkb_f.MULTIPOINT, wkb_f.MULTILINESTRING, wkb_f.MULTIPOLYGON):
        inner = []
        if g.kind == wkb_f.MULTIPOINT:
            for p in g.parts:
                inner.append(f"<Point><coordinates>{_coords_str(p)}"
                             "</coordinates></Point>")
        elif g.kind == wkb_f.MULTILINESTRING:
            for p in g.parts:
                inner.append(f"<LineString><coordinates>{_coords_str(p)}"
                             "</coordinates></LineString>")
        else:
            for rings in g.parts:
                inner.append(_geom_xml(wkb_f.encode_polygon(rings)))
        return "<MultiGeometry>" + "".join(inner) + "</MultiGeometry>"
    raise ValueError(f"unsupported WKB kind {g.kind} for KML")


def write_kml(path: str, wkbs, attrs: pa.Table | None = None) -> None:
    """One Placemark per feature (each on its own line — valid XML, and it
    keeps the driver-side range scan trivially correct)."""
    with open(path, "w") as f:
        f.write(_HDR)
        for i, w in enumerate(wkbs):
            data = []
            if attrs is not None:
                for name in attrs.column_names:
                    v = attrs[name][i].as_py()
                    data.append(f'<Data name="{escape(str(name))}">'
                                f"<value>{escape(str(v))}</value></Data>")
            ext = f"<ExtendedData>{''.join(data)}</ExtendedData>" if data else ""
            f.write(f"<Placemark>{ext}{_geom_xml(w)}</Placemark>\n")
        f.write(_FTR)


def _parse_coords(text: str) -> np.ndarray:
    pts = []
    for tok in (text or "").split():
        c = tok.split(",")
        pts.append((float(c[0]), float(c[1])))
    return np.asarray(pts, dtype=np.float64)


def _geom_from_elem(el) -> bytes:
    tag = el.tag.removeprefix(_NS)
    if tag == "Point":
        c = _parse_coords(el.find(f"{_NS}coordinates").text)
        return wkb_f.encode_points(c[:, 0], c[:, 1])[0]
    if tag == "LineString":
        return wkb_f.encode_linestring(_parse_coords(el.find(f"{_NS}coordinates").text))
    if tag == "Polygon":
        rings = [_parse_coords(
            el.find(f"{_NS}outerBoundaryIs/{_NS}LinearRing/{_NS}coordinates").text)]
        for ib in el.findall(f"{_NS}innerBoundaryIs"):
            rings.append(_parse_coords(
                ib.find(f"{_NS}LinearRing/{_NS}coordinates").text))
        return wkb_f.encode_polygon(rings)
    if tag == "MultiGeometry":
        subs = list(el)
        kinds = {s.tag.removeprefix(_NS) for s in subs}
        if kinds == {"Polygon"}:
            polys = []
            for s in subs:
                rings = [_parse_coords(
                    s.find(f"{_NS}outerBoundaryIs/{_NS}LinearRing/{_NS}coordinates").text)]
                for ib in s.findall(f"{_NS}innerBoundaryIs"):
                    rings.append(_parse_coords(
                        ib.find(f"{_NS}LinearRing/{_NS}coordinates").text))
                polys.append(rings)
            return wkb_f.encode_multipolygon(polys)
        raise ValueError(f"mixed/unsupported MultiGeometry members {kinds}")
    raise ValueError(f"unsupported KML geometry <{tag}>")


def _placemark_to_row(pm) -> dict:
    row = {}
    for d in pm.findall(f"{_NS}ExtendedData/{_NS}Data"):
        v = d.find(f"{_NS}value")
        row[d.get("name")] = v.text if v is not None else None
    for child in pm:
        if child.tag.removeprefix(_NS) in (
                "Point", "LineString", "Polygon", "MultiGeometry"):
            row["wkb"] = _geom_from_elem(child)
            break
    else:
        row["wkb"] = None
    return row


def read_kml(path: str) -> pa.Table:
    """Eager full-document parse -> pa.Table (wkb + string attributes)."""
    import xml.etree.ElementTree as ET

    root = ET.parse(path).getroot()
    rows = [_placemark_to_row(pm) for pm in root.iter(f"{_NS}Placemark")]
    return pa.Table.from_pylist(rows)


def placemark_ranges(path: str) -> list:
    """Driver-side byte ranges of every <Placemark> element — one C-level
    substring scan, no XML parse (the .shx-manifest analogue for KML)."""
    with open(path, "rb") as f:
        body = f.read()
    ranges = []
    pos = 0
    while True:
        a = body.find(b"<Placemark", pos)
        if a < 0:
            break
        b = body.find(b"</Placemark>", a)
        if b < 0:
            raise ValueError("truncated KML: unterminated <Placemark>")
        b += len(b"</Placemark>")
        ranges.append((a, b))
        pos = b
    return ranges


def read_kml_dataset(path: str, per_block: int = 256):
    """Parallel KML read: placemark byte ranges ship to workers; each worker
    reads and XML-parses ONLY its slice of the file."""
    import ray.data as rd

    ranges = placemark_ranges(path)
    blocks = [
        {"path": path,
         "start": ranges[i][0],
         "end": ranges[min(i + per_block, len(ranges)) - 1][1]}
        for i in range(0, len(ranges), per_block)
    ]

    def parse(t: pa.Table) -> pa.Table:
        import xml.etree.ElementTree as ET

        rows = []
        for p, a, b in zip(t["path"].to_pylist(), t["start"].to_pylist(),
                           t["end"].to_pylist()):
            with open(p, "rb") as f:
                f.seek(a)
                chunk = f.read(b - a)
            # wrap the placemark run in a root with the kml default namespace
            frag = (b'<Document xmlns="http://www.opengis.net/kml/2.2">'
                    + chunk + b"</Document>")
            root = ET.fromstring(frag)
            rows += [_placemark_to_row(pm) for pm in root.iter(f"{_NS}Placemark")]
        return pa.Table.from_pylist(rows)

    return rd.from_items(blocks).map_batches(parse, batch_format="pyarrow")
