"""GDALOpen-style VECTOR opener: probe every in-repo vector driver.

The vector half of the reference's driver-identify loop
(``gcore/gdaldataset.cpp`` GDALOpenEx with GDAL_OF_VECTOR -> per-driver
Identify probes; ``ogr/ogrsf_frmts/*/``): magic bytes / containers first
(GPKG SQLite magic, FlatGeobuf magic, Arrow IPC magic, Parquet PAR1,
shapefile 9994), then text sniffs (GeoJSON, GML, KML, CSV-with-WKT).

``open_vector`` returns a features table (wkb + attribute columns) through
the matched driver's own reader — the standard row contract every vector
stage consumes."""

from __future__ import annotations

import os
import re

import pyarrow as pa


def identify(path: str) -> str:
    """Driver short-name for a vector path (GDALIdentifyDriver role).
    Raises ValueError when no driver claims the file."""
    name = os.path.basename(path).lower()
    if os.path.isdir(path):
        entries = os.listdir(path)
        if any(e.endswith(".parquet") for e in entries):
            return "GeoParquet"
        if any(e.endswith(".fgb") for e in entries):
            return "FlatGeobuf"
        raise ValueError(f"directory {path!r}: no .parquet/.fgb parts")
    with open(path, "rb") as f:
        head = f.read(64)
    if head[:16] == b"SQLite format 3\x00":
        return "GPKG"
    if head[:8] == bytes([0x66, 0x67, 0x62, 0x03, 0x66, 0x67, 0x62, 0x01]):
        return "FlatGeobuf"
    if head[:6] == b"ARROW1":
        return "ArrowIPC"
    if head[:4] == b"PAR1":
        return "GeoParquet"
    if head[:4] == b"\x00\x00\x27\x0a":  # shapefile file code 9994 BE
        return "ESRI Shapefile"
    if name.endswith(".mvt") or name.endswith(".pbf"):
        return "MVT"
    text = head.lstrip()
    if name.endswith(".dxf") or re.match(rb"^\s*(999|0)\s*\r?\n", head):
        if name.endswith(".dxf") or b"SECTION" in open(path, "rb").read(512):
            return "DXF"
    if text[:1] == b"{":
        return "GeoJSON"
    if text[:5] == b"<?xml" or text[:1] == b"<":
        body = open(path, "rb").read(4096).lower()
        if b"<kml" in body or b"placemark" in body:
            return "KML"
        if b"<gpx" in body:
            return "GPX"
        return "GML"
    if b"," in head and (b"wkt" in head.lower() or b"geometry" in
                         head.lower()):
        return "CSV"
    raise ValueError(
        f"no vector driver claims {path!r} (probed: GPKG/FlatGeobuf/"
        "ArrowIPC/GeoParquet/Shapefile magics, MVT name, GeoJSON/GML/KML/"
        "CSV text sniffs — the GDALOpenEx identify loop, "
        "gcore/gdaldataset.cpp)")


def open_vector(path: str, layer: str | None = None, **kw):
    """Open any supported vector source -> features (wkb + attributes).
    Returns a pa.Table for single-file formats and a Ray Dataset for the
    partitioned containers (GeoParquet/FlatGeobuf part dirs, Arrow IPC).
    /vsizip//vsigzip//vsitar/ container paths resolve first (cpl_vsil_*)."""
    from .vsi import vsi_resolve

    path = vsi_resolve(path)
    drv = identify(path)
    if drv == "GPKG":
        from . import gpkg

        layers = gpkg.list_layers(path)
        if layer is None:
            if len(layers) != 1:
                raise ValueError(f"GPKG has layers {layers}; pass layer=")
            layer = layers[0]
        return gpkg.read_gpkg(path, layer)
    if drv == "FlatGeobuf":
        from . import flatgeobuf as fgb

        if os.path.isdir(path):
            parts = sorted(os.path.join(path, e) for e in os.listdir(path)
                           if e.endswith(".fgb"))
            return pa.concat_tables([fgb.read_flatgeobuf(p) for p in parts])
        return fgb.read_flatgeobuf(path, **kw)
    if drv == "ArrowIPC":
        from . import arrowipc

        return arrowipc.read_ipc(path, **kw)
    if drv == "GeoParquet":
        from . import geoparquet as gpq

        root = path if os.path.isdir(path) else os.path.dirname(path)
        return gpq.read_geoparquet(root)
    if drv == "ESRI Shapefile":
        from . import shapefile

        return shapefile.read_shapefile(os.path.splitext(path)[0])
    if drv == "GeoJSON":
        from . import geojson

        return geojson.read_geojson(path)
    if drv == "KML":
        from . import kml

        return kml.read_kml(path)
    if drv == "DXF":
        from . import dxf

        return dxf.read_dxf(path)
    if drv == "GPX":
        from . import gpx

        if layer is not None:
            return gpx.read_gpx(path, layer)
        for lyr in ("waypoints", "routes", "tracks"):
            t = gpx.read_gpx(path, lyr)
            if t.num_rows:
                return t
        return t
    if drv == "GML":
        from . import gml

        return gml.read_gml(path)
    if drv == "CSV":
        from . import csvgeo

        return csvgeo.read_csv_layer(path, **kw)
    if drv == "MVT":
        raise ValueError(
            "MVT tiles need their (z, x, y) context for coordinate "
            "un-quantization — use sources.mvt.decode_tile directly")
    raise ValueError(drv)


def vector_tile_index(paths: list, id_from_dir: bool = False):
    """``gdal vector index`` / ``ogrtindex`` (reference
    ``apps/gdalalg_vector_index.cpp``, ``apps/ogrtindex.cpp``): one index
    row per source — (location, n_features, extent rectangle as WKB +
    bbox columns) — the catalog layer gdaltindex-style mosaicking starts
    from.

    Ray shape: the path list is metadata; each ``map_batches`` task opens
    and folds ITS OWN sources (driver auto-probe, one streaming extent
    pass per file), so a million-file catalog builds in parallel and only
    index rows return.  ``id_from_dir`` adds the hive ``key=value``
    directory value as a ``part_key`` column (the vector_partition tree
    case)."""
    import os

    import numpy as np
    import ray.data as rd

    from ..functions import wkb as wkb_f

    index = pa.table({"path": pa.array([str(p) for p in paths])})

    def fold(batch: pa.Table) -> pa.Table:
        locs, keys, ns = [], [], []
        boxes = []
        for p in batch["path"].to_pylist():
            if p.endswith(".parquet"):
                # single-file fast path: no nested Dataset execution
                import pyarrow.parquet as pq

                t = pq.read_table(p, columns=["wkb"])
            else:
                t = open_vector(p)
            if not isinstance(t, pa.Table):
                t = pa.concat_tables(
                    [pa.table(b) for b in
                     t.iter_batches(batch_format="pyarrow")],
                    promote_options="default")
            bb = wkb_f.bboxes(t["wkb"].to_pylist())
            locs.append(p)
            if id_from_dir:
                d = os.path.basename(os.path.dirname(p))
                keys.append(d.split("=", 1)[1] if "=" in d else d)
            ns.append(t.num_rows)
            boxes.append([bb[:, 0].min(), bb[:, 1].min(),
                          bb[:, 2].max(), bb[:, 3].max()]
                         if len(bb) else [np.nan] * 4)
        boxes = np.asarray(boxes, dtype=np.float64).reshape(-1, 4)
        rects = [wkb_f.encode_polygon([np.array(
            [[b[0], b[1]], [b[2], b[1]], [b[2], b[3]], [b[0], b[3]],
             [b[0], b[1]]])]) for b in boxes]
        out = {
            "location": pa.array(locs),
            "n_features": pa.array(ns, pa.int64()),
            "minx": pa.array(boxes[:, 0]), "miny": pa.array(boxes[:, 1]),
            "maxx": pa.array(boxes[:, 2]), "maxy": pa.array(boxes[:, 3]),
            "wkb": pa.array(rects, pa.binary()),
        }
        if id_from_dir:
            out["part_key"] = pa.array(keys)
        return pa.table(out)

    return rd.from_arrow(index).repartition(
        min(max(len(paths), 1), 32)).map_batches(
        fold, batch_format="pyarrow")
