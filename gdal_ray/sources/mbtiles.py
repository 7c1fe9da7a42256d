"""MBTiles container (SQLite tile archive) — reader + writer + PMTiles
conversion.

Reference driver role: ``frmts/mbtiles/mbtilesdataset.cpp`` (raster +
vector MVT variants) and ``ogr/ogrsf_frmts/pmtiles/ogrpmtilesfrommbtiles
.cpp`` (the MBTiles -> PMTiles converter); test parity target
``autotest/gdrivers/mbtiles.py`` fixtures.  Container access uses the
stdlib sqlite3 (same policy as the GPKG driver: SQLite's file format is
the public spec; the reading library is not the geospatial logic).

Schema (MBTiles 1.3 spec): ``tiles(zoom_level, tile_column, tile_row,
tile_data)`` with TMS row order (y flipped vs XYZ), ``metadata(name,
value)``.  Tile payloads are opaque blobs (MVT gzip, PNG, JPEG — the
in-repo codecs decode them downstream).

Ray-Data shape: the driver reads only the (z, x, y) index; workers open
the file read-only and fetch their own tile ranges (the distributed-
sqlite scan the GPKG driver uses).
"""
from __future__ import annotations

import gzip
import sqlite3

import pyarrow as pa


def _flip(z: int, y_tms: int) -> int:
    return (1 << z) - 1 - y_tms


def read_metadata(path: str) -> dict:
    con = sqlite3.connect(f"file:{path}?mode=ro", uri=True)
    try:
        return dict(con.execute("SELECT name, value FROM metadata"))
    finally:
        con.close()


def tile_index(path: str) -> pa.Table:
    """(z, x, y) manifest in XYZ orientation — the only driver-side read."""
    con = sqlite3.connect(f"file:{path}?mode=ro", uri=True)
    try:
        rows = con.execute(
            "SELECT zoom_level, tile_column, tile_row FROM tiles "
            "ORDER BY zoom_level, tile_column, tile_row").fetchall()
    finally:
        con.close()
    return pa.table({
        "z": pa.array([r[0] for r in rows], pa.int64()),
        "x": pa.array([r[1] for r in rows], pa.int64()),
        "y": pa.array([_flip(r[0], r[2]) for r in rows], pa.int64()),
    })


def get_tile(path: str, z: int, x: int, y: int,
             gunzip: bool = False) -> bytes | None:
    con = sqlite3.connect(f"file:{path}?mode=ro", uri=True)
    try:
        row = con.execute(
            "SELECT tile_data FROM tiles WHERE zoom_level=? AND "
            "tile_column=? AND tile_row=?", (z, x, _flip(z, y))).fetchone()
    finally:
        con.close()
    if row is None:
        return None
    data = bytes(row[0])
    if gunzip:
        data = _unwrap(data)
    return data


def _unwrap(data: bytes) -> bytes:
    """MVT payloads in MBTiles are gzip- OR zlib-wrapped (both occur in
    the wild; mbtilesdataset.cpp sniffs the same two magics)."""
    if data[:2] == b"\x1f\x8b":
        return gzip.decompress(data)
    if data[:1] == b"\x78":
        import zlib

        try:
            return zlib.decompress(data)
        except zlib.error:
            return data
    return data


def read_tiles(path: str, gunzip: bool = True):
    """All tiles as a streaming Dataset (z, x, y, data), XYZ orientation;
    gzip-wrapped MVT payloads are decompressed in the worker."""
    import ray.data as rd

    man = tile_index(path)

    def fetch(t: pa.Table) -> pa.Table:
        con = sqlite3.connect(f"file:{path}?mode=ro", uri=True)
        datas = []
        try:
            for i in range(t.num_rows):
                z = t["z"][i].as_py()
                row = con.execute(
                    "SELECT tile_data FROM tiles WHERE zoom_level=? AND "
                    "tile_column=? AND tile_row=?",
                    (z, t["x"][i].as_py(),
                     _flip(z, t["y"][i].as_py()))).fetchone()
                d = bytes(row[0])
                if gunzip:
                    d = _unwrap(d)
                datas.append(d)
        finally:
            con.close()
        return pa.table({"z": t["z"], "x": t["x"], "y": t["y"],
                         "data": pa.array(datas, pa.binary())})

    return rd.from_arrow(man).map_batches(fetch, batch_format="pyarrow")


def write_mbtiles(path: str, tiles, metadata: dict | None = None,
                  gzip_tiles: bool = False) -> None:
    """tiles: iterable of (z, x, y, payload) in XYZ orientation."""
    import os

    if os.path.exists(path):
        os.unlink(path)
    con = sqlite3.connect(path)
    try:
        con.execute("CREATE TABLE metadata (name TEXT, value TEXT)")
        con.execute("CREATE TABLE tiles (zoom_level INTEGER, "
                    "tile_column INTEGER, tile_row INTEGER, "
                    "tile_data BLOB)")
        con.execute("CREATE UNIQUE INDEX tile_index ON tiles "
                    "(zoom_level, tile_column, tile_row)")
        md = dict(metadata or {})
        md.setdefault("name", "gdal_ray")
        md.setdefault("format", "pbf" if gzip_tiles else "png")
        con.executemany("INSERT INTO metadata VALUES (?, ?)",
                        list(md.items()))
        rows = []
        for z, x, y, data in tiles:
            d = gzip.compress(bytes(data), 6) if gzip_tiles else bytes(data)
            rows.append((z, x, _flip(z, y), d))
        con.executemany("INSERT INTO tiles VALUES (?, ?, ?, ?)", rows)
        con.commit()
    finally:
        con.close()


def mbtiles_to_pmtiles(src: str, dst: str,
                       tile_compression: int | None = None) -> dict:
    """MBTiles -> PMTiles v3 archive (ogrpmtilesfrommbtiles.cpp role):
    re-addresses every tile onto the Hilbert id space, dedups content,
    carries the metadata JSON."""
    from . import pmtiles as pm

    md = read_metadata(src)
    fmt = md.get("format", "")
    idx = tile_index(src)
    if not fmt and idx.num_rows:
        # no format metadata: sniff the first payload's magic, the
        # mbtilesdataset.cpp identification order
        d = get_tile(src, idx["z"][0].as_py(), idx["x"][0].as_py(),
                     idx["y"][0].as_py(), gunzip=True) or b""
        if d[:3] == b"\xff\xd8\xff":
            fmt = "jpg"
        elif d[:8] == b"\x89PNG\r\n\x1a\n":
            fmt = "png"
        elif d[:4] == b"RIFF":
            fmt = "webp"
        else:
            fmt = "pbf"
    ttype = {"pbf": pm.TILETYPE_MVT, "mvt": pm.TILETYPE_MVT,
             "png": pm.TILETYPE_PNG, "jpg": pm.TILETYPE_JPEG,
             "jpeg": pm.TILETYPE_JPEG,
             "webp": pm.TILETYPE_WEBP}.get(fmt, pm.TILETYPE_PNG)
    tiles = []
    for i in range(idx.num_rows):
        z = idx["z"][i].as_py()
        x = idx["x"][i].as_py()
        y = idx["y"][i].as_py()
        tiles.append((z, x, y, get_tile(src, z, x, y, gunzip=True)))
    comp = (pm.COMPRESSION_GZIP if ttype == pm.TILETYPE_MVT
            else pm.COMPRESSION_NONE) if tile_compression is None \
        else tile_compression
    return pm.write_pmtiles(dst, tiles, tile_type=ttype, metadata=md,
                            tile_compression=comp)


def pmtiles_to_mbtiles(src: str, dst: str) -> None:
    """PMTiles -> MBTiles (the reverse converter)."""
    from . import pmtiles as pm

    h = pm.read_header(src)
    md = {str(k): str(v) for k, v in pm.read_metadata(src).items()}
    fmt = {pm.TILETYPE_MVT: "pbf", pm.TILETYPE_PNG: "png",
           pm.TILETYPE_JPEG: "jpg",
           pm.TILETYPE_WEBP: "webp"}.get(h["tile_type"], "png")
    md.setdefault("format", fmt)
    tiles = []
    for tid, off, ln, run in pm.read_entries(src):
        for k in range(max(run, 1)):
            z, x, y = pm.tileid_to_zxy(tid + k)
            tiles.append((z, x, y, pm.get_tile(src, z, x, y)))
    write_mbtiles(dst, tiles, metadata=md,
                  gzip_tiles=(fmt == "pbf"))
