"""GeoPackage vector format — stdlib-sqlite3 reader + writer.

Re-answers the reference's GPKG driver surface (``ogr/ogrsf_frmts/gpkg/``)
from the public OGC GeoPackage 1.3 spec: the required metadata tables
(``gpkg_spatial_ref_sys``, ``gpkg_contents``, ``gpkg_geometry_columns``),
the ``GP`` binary geometry blob header (magic+version+flags+srs_id, optional
envelope, then standard WKB — the engine's native geometry encoding), the
GPKG application_id/user_version pragmas, and feature tables with an
INTEGER PRIMARY KEY fid.

Ray-Data shape: ``read_gpkg_dataset`` reads only ``MIN(fid)/MAX(fid)``
driver-side and fans fid ranges out to ``map_batches`` workers, each opening
the file read-only (sqlite's single-writer/many-reader model) — the classic
distributed-sqlite scan, so a multi-GB .gpkg streams through workers.
"""

from __future__ import annotations

import sqlite3
import struct

import pyarrow as pa

_ENVELOPE_DOUBLES = {0: 0, 1: 4, 2: 6, 3: 6, 4: 8}


def gp_wrap(wkb: bytes, srs_id: int = 4326) -> bytes:
    """WKB -> GeoPackageBinary (LE header, no envelope)."""
    return b"GP" + bytes([0, 0x01]) + struct.pack("<i", srs_id) + wkb


def gp_unwrap(blob: bytes) -> bytes | None:
    """GeoPackageBinary -> WKB (any envelope size, either header endian)."""
    if blob is None:
        return None
    if blob[:2] != b"GP":
        raise ValueError("not a GeoPackage geometry blob")
    flags = blob[3]
    if flags & 0x20:
        raise ValueError("extended GeoPackage geometry not supported")
    env = _ENVELOPE_DOUBLES[(flags >> 1) & 0x07]
    return bytes(blob[8 + 8 * env:])


def _attr_sql_type(t: pa.DataType) -> str:
    if pa.types.is_integer(t):
        return "INTEGER"
    if pa.types.is_floating(t):
        return "REAL"
    if pa.types.is_binary(t):
        return "BLOB"
    return "TEXT"


def write_gpkg(path: str, layer: str, wkbs, attrs: pa.Table | None = None,
               srs_id: int = 4326) -> None:
    """Create/overwrite ``layer`` in a spec-conformant GeoPackage."""
    con = sqlite3.connect(path)
    try:
        con.execute("PRAGMA application_id = 0x47504B47")
        con.execute("PRAGMA user_version = 10300")
        con.execute("""CREATE TABLE IF NOT EXISTS gpkg_spatial_ref_sys (
            srs_name TEXT NOT NULL, srs_id INTEGER PRIMARY KEY,
            organization TEXT NOT NULL, organization_coordsys_id INTEGER NOT NULL,
            definition TEXT NOT NULL, description TEXT)""")
        con.executemany(
            "INSERT OR IGNORE INTO gpkg_spatial_ref_sys VALUES (?,?,?,?,?,?)",
            [("Undefined cartesian", -1, "NONE", -1, "undefined", None),
             ("Undefined geographic", 0, "NONE", 0, "undefined", None),
             ("WGS 84", 4326, "EPSG", 4326, "GEOGCS[\"WGS 84\"]", None),
             ("Web Mercator", 3857, "EPSG", 3857, "PROJCS[\"WGS 84 / Pseudo-Mercator\"]", None)])
        con.execute("""CREATE TABLE IF NOT EXISTS gpkg_contents (
            table_name TEXT PRIMARY KEY, data_type TEXT NOT NULL,
            identifier TEXT UNIQUE, description TEXT DEFAULT '',
            last_change TEXT, min_x REAL, min_y REAL, max_x REAL, max_y REAL,
            srs_id INTEGER)""")
        con.execute("""CREATE TABLE IF NOT EXISTS gpkg_geometry_columns (
            table_name TEXT PRIMARY KEY, column_name TEXT NOT NULL,
            geometry_type_name TEXT NOT NULL, srs_id INTEGER NOT NULL,
            z TINYINT NOT NULL, m TINYINT NOT NULL)""")
        con.execute(f'DROP TABLE IF EXISTS "{layer}"')
        cols, names = [], []
        if attrs is not None:
            for f in attrs.schema:
                names.append(f.name)
                cols.append(f'"{f.name}" {_attr_sql_type(f.type)}')
        con.execute(
            f'CREATE TABLE "{layer}" (fid INTEGER PRIMARY KEY AUTOINCREMENT, '
            f'geom BLOB{"".join(", " + c for c in cols)})')
        attr_cols = [attrs[n].to_pylist() for n in names] if attrs is not None else []
        rows = [
            (None, None if w is None else gp_wrap(w, srs_id),
             *[c[i] for c in attr_cols])
            for i, w in enumerate(wkbs)
        ]
        con.executemany(
            f'INSERT INTO "{layer}" VALUES ({",".join("?" * (2 + len(names)))})',
            rows)
        con.execute(
            "INSERT OR REPLACE INTO gpkg_contents (table_name, data_type, "
            "identifier, last_change, srs_id) VALUES (?, 'features', ?, "
            "'2026-01-01T00:00:00Z', ?)", (layer, layer, srs_id))
        con.execute(
            "INSERT OR REPLACE INTO gpkg_geometry_columns VALUES "
            "(?, 'geom', 'GEOMETRY', ?, 0, 0)", (layer, srs_id))
        con.commit()
    finally:
        con.close()


def list_layers(path: str) -> list[str]:
    con = sqlite3.connect(f"file:{path}?mode=ro", uri=True)
    try:
        return [r[0] for r in con.execute(
            "SELECT table_name FROM gpkg_contents WHERE data_type = 'features'")]
    finally:
        con.close()


def read_gpkg(path: str, layer: str) -> pa.Table:
    """Eager layer read -> pa.Table (fid, wkb, attr columns)."""
    con = sqlite3.connect(f"file:{path}?mode=ro", uri=True)
    try:
        cur = con.execute(f'SELECT * FROM "{layer}" ORDER BY fid')
        names = [d[0] for d in cur.description]
        rows = cur.fetchall()
    finally:
        con.close()
    data: dict[str, list] = {n: [] for n in names}
    for r in rows:
        for n, v in zip(names, r):
            data[n].append(v)
    data["wkb"] = [gp_unwrap(b) for b in data.pop("geom")]
    out = {"fid": pa.array(data.pop("fid"), pa.int64()),
           "wkb": pa.array(data.pop("wkb"), pa.binary())}
    for n, vals in data.items():
        out[n] = pa.array(vals)
    return pa.table(out)


def read_gpkg_dataset(path: str, layer: str, rows_per_block: int = 4096):
    """GPKG layer -> Ray Dataset: fid ranges fan out, each worker opens the
    file read-only and scans its range (sqlite many-reader model)."""
    import ray.data as rd

    con = sqlite3.connect(f"file:{path}?mode=ro", uri=True)
    try:
        lo, hi = con.execute(f'SELECT MIN(fid), MAX(fid) FROM "{layer}"').fetchone()
    finally:
        con.close()
    if lo is None:
        return rd.from_arrow(pa.table({"fid": pa.array([], pa.int64()),
                                       "wkb": pa.array([], pa.binary())}))
    man = pa.table({
        "lo": pa.array(range(lo, hi + 1, rows_per_block), pa.int64()),
        "hi": pa.array([min(a + rows_per_block - 1, hi)
                        for a in range(lo, hi + 1, rows_per_block)], pa.int64()),
    })

    def fetch(t: pa.Table) -> pa.Table:
        con = sqlite3.connect(f"file:{path}?mode=ro", uri=True)
        try:
            out = []
            for i in range(t.num_rows):
                cur = con.execute(
                    f'SELECT * FROM "{layer}" WHERE fid BETWEEN ? AND ? ORDER BY fid',
                    (t["lo"][i].as_py(), t["hi"][i].as_py()))
                names = [d[0] for d in cur.description]
                for r in cur.fetchall():
                    row = dict(zip(names, r))
                    row["wkb"] = gp_unwrap(row.pop("geom"))
                    out.append(row)
            return pa.Table.from_pylist(out)
        finally:
            con.close()

    return rd.from_arrow(man).map_batches(fetch, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# GeoPackage TILES (raster) layers — the gpkg raster side of the driver
# (reference: ogr/ogrsf_frmts/gpkg/ogrgeopackagedataset.cpp raster paths;
# autotest/gdrivers/gpkg.py).  Tile pyramid tables per the OGC GeoPackage
# spec: gpkg_contents(data_type='tiles'), gpkg_tile_matrix_set (bbox+srs),
# gpkg_tile_matrix (per-zoom grid), and the pyramid user data table
# (zoom_level, tile_column, tile_row, tile_data) with TOP-LEFT row origin
# (XYZ orientation, unlike MBTiles' TMS flip).  Payloads are PNG/JPEG
# blobs — the in-repo codecs decode them.
# ---------------------------------------------------------------------------


def list_tile_layers(path: str) -> list[str]:
    con = sqlite3.connect(f"file:{path}?mode=ro", uri=True)
    try:
        return [r[0] for r in con.execute(
            "SELECT table_name FROM gpkg_contents "
            "WHERE data_type IN ('tiles', '2d-gridded-coverage')")]
    finally:
        con.close()


def tile_matrix(path: str, layer: str) -> list[dict]:
    """Per-zoom grid definition rows (gpkg_tile_matrix)."""
    con = sqlite3.connect(f"file:{path}?mode=ro", uri=True)
    try:
        cols = ("zoom_level", "matrix_width", "matrix_height",
                "tile_width", "tile_height", "pixel_x_size",
                "pixel_y_size")
        rows = con.execute(
            f"SELECT {', '.join(cols)} FROM gpkg_tile_matrix "
            "WHERE table_name = ? ORDER BY zoom_level", (layer,)).fetchall()
    finally:
        con.close()
    return [dict(zip(cols, r)) for r in rows]


def raster_tile_index(path: str, layer: str) -> pa.Table:
    con = sqlite3.connect(f"file:{path}?mode=ro", uri=True)
    try:
        rows = con.execute(
            f'SELECT zoom_level, tile_column, tile_row FROM "{layer}" '
            "ORDER BY zoom_level, tile_column, tile_row").fetchall()
    finally:
        con.close()
    return pa.table({"z": pa.array([r[0] for r in rows]),
                     "x": pa.array([r[1] for r in rows]),
                     "y": pa.array([r[2] for r in rows])})


def get_raster_tile(path: str, layer: str, z: int, x: int,
                    y: int) -> bytes | None:
    con = sqlite3.connect(f"file:{path}?mode=ro", uri=True)
    try:
        row = con.execute(
            f'SELECT tile_data FROM "{layer}" WHERE zoom_level=? AND '
            "tile_column=? AND tile_row=?", (z, x, y)).fetchone()
    finally:
        con.close()
    return None if row is None else bytes(row[0])


def read_raster_tiles(path: str, layer: str, decode: bool = True):
    """Tile pyramid as a streaming Dataset; with ``decode`` the PNG/JPEG
    payloads become the engine's standard raster tile rows (width/height/
    dtype/data) through the in-repo codecs, per worker."""
    import ray.data as rd

    man = raster_tile_index(path, layer)

    def fetch(t: pa.Table) -> pa.Table:
        import numpy as np

        from . import jpeg as _jpeg
        from . import png as _png

        con = sqlite3.connect(f"file:{path}?mode=ro", uri=True)
        rows = []
        try:
            for i in range(t.num_rows):
                z = t["z"][i].as_py()
                x = t["x"][i].as_py()
                y = t["y"][i].as_py()
                (blob,) = con.execute(
                    f'SELECT tile_data FROM "{layer}" WHERE zoom_level=? '
                    "AND tile_column=? AND tile_row=?", (z, x, y)).fetchone()
                blob = bytes(blob)
                if not decode:
                    rows.append({"z": z, "x": x, "y": y, "data": blob})
                    continue
                if blob[:8] == b"\x89PNG\r\n\x1a\n":
                    arr = _png.decode_png(blob)
                elif blob[:3] == b"\xff\xd8\xff":
                    arr = _jpeg.decode(blob)
                else:
                    raise ValueError(f"unknown tile payload magic "
                                     f"{blob[:4].hex()}")
                if arr.ndim == 2:
                    arr = arr[:, :, None]
                rows.append({
                    "z": z, "x": x, "y": y, "band": 1,
                    "width": arr.shape[1], "height": arr.shape[0],
                    "n_samples": arr.shape[2], "dtype": str(arr.dtype),
                    "data": np.ascontiguousarray(arr).tobytes()})
        finally:
            con.close()
        return pa.Table.from_pylist(rows)

    return rd.from_arrow(man).map_batches(fetch, batch_format="pyarrow")


def write_gpkg_tiles(path: str, layer: str, tiles, *, tile_size: int = 256,
                     bbox=(-20037508.342789244, -20037508.342789244,
                           20037508.342789244, 20037508.342789244),
                     srs_id: int = 3857) -> None:
    """tiles: iterable of (z, x, y, payload-bytes) — payloads are
    ready-made PNG/JPEG blobs (encode with sources.png / sources.jpeg).
    Creates the full spec table set in a fresh file."""
    import os

    if os.path.exists(path):
        os.unlink(path)
    con = sqlite3.connect(path)
    try:
        con.executescript("""
            CREATE TABLE gpkg_spatial_ref_sys (
              srs_name TEXT NOT NULL, srs_id INTEGER PRIMARY KEY,
              organization TEXT NOT NULL,
              organization_coordsys_id INTEGER NOT NULL,
              definition TEXT NOT NULL, description TEXT);
            CREATE TABLE gpkg_contents (
              table_name TEXT PRIMARY KEY, data_type TEXT NOT NULL,
              identifier TEXT UNIQUE, description TEXT DEFAULT '',
              last_change DATETIME, min_x DOUBLE, min_y DOUBLE,
              max_x DOUBLE, max_y DOUBLE, srs_id INTEGER);
            CREATE TABLE gpkg_tile_matrix_set (
              table_name TEXT PRIMARY KEY, srs_id INTEGER NOT NULL,
              min_x DOUBLE NOT NULL, min_y DOUBLE NOT NULL,
              max_x DOUBLE NOT NULL, max_y DOUBLE NOT NULL);
            CREATE TABLE gpkg_tile_matrix (
              table_name TEXT NOT NULL, zoom_level INTEGER NOT NULL,
              matrix_width INTEGER NOT NULL,
              matrix_height INTEGER NOT NULL,
              tile_width INTEGER NOT NULL, tile_height INTEGER NOT NULL,
              pixel_x_size DOUBLE NOT NULL, pixel_y_size DOUBLE NOT NULL,
              PRIMARY KEY (table_name, zoom_level));
        """)
        con.execute(
            "INSERT INTO gpkg_spatial_ref_sys VALUES "
            "('WGS 84 / Pseudo-Mercator', 3857, 'EPSG', 3857, "
            "'PROJCS[...]', NULL)")
        con.execute(
            f'CREATE TABLE "{layer}" (id INTEGER PRIMARY KEY '
            "AUTOINCREMENT, zoom_level INTEGER NOT NULL, "
            "tile_column INTEGER NOT NULL, tile_row INTEGER NOT NULL, "
            "tile_data BLOB NOT NULL, "
            "UNIQUE (zoom_level, tile_column, tile_row))")
        rows = list(tiles)
        zs = sorted({z for z, _x, _y, _d in rows})
        con.execute(
            "INSERT INTO gpkg_contents (table_name, data_type, "
            "identifier, min_x, min_y, max_x, max_y, srs_id) VALUES "
            "(?, 'tiles', ?, ?, ?, ?, ?, ?)",
            (layer, layer, bbox[0], bbox[1], bbox[2], bbox[3], srs_id))
        con.execute(
            "INSERT INTO gpkg_tile_matrix_set VALUES (?, ?, ?, ?, ?, ?)",
            (layer, srs_id, bbox[0], bbox[1], bbox[2], bbox[3]))
        span_x = bbox[2] - bbox[0]
        span_y = bbox[3] - bbox[1]
        for z in zs:
            n = 1 << z
            con.execute(
                "INSERT INTO gpkg_tile_matrix VALUES "
                "(?, ?, ?, ?, ?, ?, ?, ?)",
                (layer, z, n, n, tile_size, tile_size,
                 span_x / (n * tile_size), span_y / (n * tile_size)))
        con.executemany(
            f'INSERT INTO "{layer}" (zoom_level, tile_column, tile_row, '
            "tile_data) VALUES (?, ?, ?, ?)",
            [(z, x, y, d) for z, x, y, d in rows])
        con.commit()
    finally:
        con.close()
