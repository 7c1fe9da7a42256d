"""GML vector format — stdlib-XML reader + writer.

Re-answers the reference's GML driver surface (``ogr/ogrsf_frmts/gml/``)
from the OGC GML 3.2 simple-features profile: featureMember elements with
``ogr:``-namespaced attribute children (the reference's own GML output
layout), geometry as gml:Point/gml:pos, gml:LineString/gml:posList,
gml:Polygon (exterior/interior LinearRing posList) and
gml:MultiSurface/surfaceMember.

Floats serialize via Python ``repr`` (shortest round-trip) so f64
coordinates survive bitwise — same policy as the GeoJSON/KML drivers.

Parallel read path: like the KML driver, a cheap driver-side byte scan for
``<gml:featureMember`` ranges (no XML parse), then workers XML-parse only
their own feature slices.  Attribute values are STRINGS (GML without an
.xsd carries no types — the reference behaves the same); callers cast.
"""

from __future__ import annotations

from xml.sax.saxutils import escape

import numpy as np
import pyarrow as pa

from ..functions import wkb as wkb_f

_GML = "{http://www.opengis.net/gml/3.2}"
_OGR = "{http://ogr.maptools.org/}"
_HDR = ('<?xml version="1.0" encoding="UTF-8"?>\n'
        '<gml:FeatureCollection xmlns:gml="http://www.opengis.net/gml/3.2" '
        'xmlns:ogr="http://ogr.maptools.org/">\n')
_FTR = "</gml:FeatureCollection>\n"


def _poslist(arr) -> str:
    return " ".join(f"{repr(float(x))} {repr(float(y))}" for x, y in arr)


def _polygon_xml(rings) -> str:
    out = ["<gml:Polygon><gml:exterior><gml:LinearRing><gml:posList>",
           _poslist(rings[0]),
           "</gml:posList></gml:LinearRing></gml:exterior>"]
    for hole in rings[1:]:
        out += ["<gml:interior><gml:LinearRing><gml:posList>",
                _poslist(hole),
                "</gml:posList></gml:LinearRing></gml:interior>"]
    out.append("</gml:Polygon>")
    return "".join(out)


def _geom_xml(wkb: bytes) -> str:
    g = wkb_f.decode(wkb)
    if g.kind == wkb_f.POINT:
        return f"<gml:Point><gml:pos>{_poslist(g.parts[0])}</gml:pos></gml:Point>"
    if g.kind == wkb_f.LINESTRING:
        return (f"<gml:LineString><gml:posList>{_poslist(g.parts[0])}"
                "</gml:posList></gml:LineString>")
    if g.kind == wkb_f.POLYGON:
        return _polygon_xml(g.parts[0])
    if g.kind == wkb_f.MULTIPOLYGON:
        inner = "".join(f"<gml:surfaceMember>{_polygon_xml(r)}</gml:surfaceMember>"
                        for r in g.parts)
        return f"<gml:MultiSurface>{inner}</gml:MultiSurface>"
    raise ValueError(f"unsupported WKB kind {g.kind} for GML")


def write_gml(path: str, wkbs, attrs: pa.Table | None = None) -> None:
    """One gml:featureMember per feature, each on its own line."""
    with open(path, "w") as f:
        f.write(_HDR)
        for i, w in enumerate(wkbs):
            fields = []
            if attrs is not None:
                for name in attrs.column_names:
                    v = attrs[name][i].as_py()
                    fields.append(f"<ogr:{name}>{escape(str(v))}</ogr:{name}>")
            f.write("<gml:featureMember><ogr:feature>"
                    + "".join(fields)
                    + f"<ogr:geometryProperty>{_geom_xml(w)}</ogr:geometryProperty>"
                    "</ogr:feature></gml:featureMember>\n")
        f.write(_FTR)


def _parse_poslist(text: str) -> np.ndarray:
    vals = [float(v) for v in (text or "").split()]
    return np.asarray(vals, dtype=np.float64).reshape(-1, 2)


def _rings_of_polygon(el) -> list:
    rings = [_parse_poslist(
        el.find(f"{_GML}exterior/{_GML}LinearRing/{_GML}posList").text)]
    for ib in el.findall(f"{_GML}interior"):
        rings.append(_parse_poslist(ib.find(f"{_GML}LinearRing/{_GML}posList").text))
    return rings


def _geom_from_elem(el) -> bytes:
    tag = el.tag.removeprefix(_GML)
    if tag == "Point":
        c = _parse_poslist(el.find(f"{_GML}pos").text)
        return wkb_f.encode_points(c[:, 0], c[:, 1])[0]
    if tag == "LineString":
        return wkb_f.encode_linestring(_parse_poslist(el.find(f"{_GML}posList").text))
    if tag == "Polygon":
        return wkb_f.encode_polygon(_rings_of_polygon(el))
    if tag == "MultiSurface":
        polys = [_rings_of_polygon(sm.find(f"{_GML}Polygon"))
                 for sm in el.findall(f"{_GML}surfaceMember")]
        return wkb_f.encode_multipolygon(polys)
    raise ValueError(f"unsupported GML geometry <{tag}>")


def _feature_to_row(fm) -> dict:
    feat = fm.find(f"{_OGR}feature")
    row = {}
    for child in feat:
        tag = child.tag
        if tag == f"{_OGR}geometryProperty":
            geom = list(child)
            row["wkb"] = _geom_from_elem(geom[0]) if geom else None
        elif tag.startswith(_OGR):
            row[tag.removeprefix(_OGR)] = child.text
    return row


def read_gml(path: str) -> pa.Table:
    """Eager full-document parse -> pa.Table (wkb + string attributes)."""
    import xml.etree.ElementTree as ET

    root = ET.parse(path).getroot()
    rows = [_feature_to_row(fm) for fm in root.iter(f"{_GML}featureMember")]
    return pa.Table.from_pylist(rows)


def feature_ranges(path: str) -> list:
    """Driver-side byte ranges of every featureMember — one substring scan."""
    with open(path, "rb") as f:
        body = f.read()
    ranges = []
    pos = 0
    while True:
        a = body.find(b"<gml:featureMember", pos)
        if a < 0:
            break
        b = body.find(b"</gml:featureMember>", a)
        if b < 0:
            raise ValueError("truncated GML: unterminated featureMember")
        b += len(b"</gml:featureMember>")
        ranges.append((a, b))
        pos = b
    return ranges


def read_gml_dataset(path: str, per_block: int = 256):
    """Parallel GML read: feature byte ranges ship to workers; each worker
    reads and XML-parses only its slice of the file."""
    import ray.data as rd

    ranges = feature_ranges(path)
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
            frag = (b'<gml:FeatureCollection '
                    b'xmlns:gml="http://www.opengis.net/gml/3.2" '
                    b'xmlns:ogr="http://ogr.maptools.org/">'
                    + chunk + b"</gml:FeatureCollection>")
            root = ET.fromstring(frag)
            rows += [_feature_to_row(fm) for fm in root.iter(f"{_GML}featureMember")]
        return pa.Table.from_pylist(rows)

    return rd.from_items(blocks).map_batches(parse, batch_format="pyarrow")
