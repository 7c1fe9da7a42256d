"""GeoTIFF raster format — dependency-free reader + writer (classic TIFF).

Re-answers the reference's GTiff driver surface (``frmts/gtiff/geotiff.cpp``,
GeoTIFF keys per ``frmts/gtiff/gt_wkt_srs.cpp``) from the public TIFF 6.0 and
GeoTIFF 1.1 specs — an independent implementation, not a port: classic
(32-bit) TIFF, little- or big-endian read / little-endian write, single-band
uncompressed, BOTH tiled (TileWidth/TileLength/TileOffsets/TileByteCounts)
and stripped layouts, dtypes uint8/uint16/uint32/int16/int32/float32/float64
via BitsPerSample + SampleFormat, georeferencing via ModelPixelScaleTag +
ModelTiepointTag + GeoKeyDirectoryTag (GTModelType / GTRasterType /
ProjectedCSType), nodata via the GDAL_NODATA ASCII tag (42113).

Ray-Data shape: ``read_gtiff_tiles`` parses ONLY the IFD driver-side (a few
hundred bytes) and emits a tile MANIFEST Dataset (one row per TIFF tile with
its byte range); the pixel payload is then range-read inside ``map_batches``
workers — the 100 TB plan, where a 4 GiB BigTIFF-sized mosaic never passes
through the driver.  Edge-tile padding (TIFF pads tiles to full tile size) is
trimmed in the worker so downstream stages see the engine's standard
clipped-edge tile rows.
"""

from __future__ import annotations

import struct

import numpy as np
import pyarrow as pa

# (BitsPerSample, SampleFormat) <-> numpy dtype.  SampleFormat: 1=unsigned
# int, 2=signed int, 3=IEEE float (TIFF 6.0 §19 + TIFF/EP).
_FMT_TO_DTYPE = {
    (8, 1): "uint8", (16, 1): "uint16", (32, 1): "uint32",
    (8, 2): "int8", (16, 2): "int16", (32, 2): "int32",
    (32, 3): "float32", (64, 3): "float64",
}
_DTYPE_TO_FMT = {v: k for k, v in _FMT_TO_DTYPE.items()}

_TYPE_SIZE = {1: 1, 2: 1, 3: 2, 4: 4, 11: 4, 12: 8}
_TYPE_FMT = {1: "B", 3: "H", 4: "I", 11: "f", 12: "d"}

TAG_WIDTH, TAG_HEIGHT = 256, 257
TAG_BITS, TAG_COMPRESSION, TAG_PHOTOMETRIC = 258, 259, 262
TAG_STRIP_OFFSETS, TAG_SAMPLES_PER_PIXEL = 273, 277
TAG_ROWS_PER_STRIP, TAG_STRIP_COUNTS = 278, 279
TAG_PLANAR = 284
TAG_TILE_W, TAG_TILE_H, TAG_TILE_OFFSETS, TAG_TILE_COUNTS = 322, 323, 324, 325
TAG_SAMPLE_FORMAT = 339
TAG_PIXEL_SCALE, TAG_TIEPOINT = 33550, 33922
TAG_GEO_KEYS = 34735
TAG_GDAL_NODATA = 42113

_KEY_MODEL_TYPE, _KEY_RASTER_TYPE = 1024, 1025
_KEY_GEOGRAPHIC_CS, _KEY_PROJECTED_CS = 2048, 3072


def _entry(tag: int, typ: int, values, en: str = "<") -> tuple[int, int, int, bytes]:
    """One IFD entry as (tag, type, count, payload-bytes, unpadded)."""
    if typ == 2:  # ASCII, NUL-terminated
        payload = values.encode() + b"\x00"
        return tag, typ, len(payload), payload
    if not isinstance(values, (list, tuple, np.ndarray)):
        values = [values]
    payload = struct.pack(en + "%d%s" % (len(values), _TYPE_FMT[typ]), *values)
    return tag, typ, len(values), payload


def write_gtiff(path: str, arr: np.ndarray, *, tile_size: int | None = None,
                rows_per_strip: int = 64, origin=(0.0, 0.0),
                pixel_size=(1.0, 1.0), epsg: int = 3857,
                nodata: float | None = None, endian: str = "<") -> None:
    """Serialize a 2-D array as a single-band uncompressed GeoTIFF.

    ``tile_size`` -> tiled layout (TIFF tiles pad to the full tile size with
    zeros, per spec); None -> strips of ``rows_per_strip`` rows (the final
    strip is short, unpadded).  ``origin`` is the outer corner of pixel (0,0)
    (PixelIsArea); north-up files have positive ``pixel_size[1]`` stored as a
    positive ModelPixelScale y (the reader re-applies the north-up sign).
    """
    arr = np.ascontiguousarray(arr)
    if arr.ndim != 2:
        raise ValueError("write_gtiff expects a single-band 2-D array")
    if str(arr.dtype) not in _DTYPE_TO_FMT:
        raise ValueError(f"unsupported dtype {arr.dtype}")
    if endian not in ("<", ">"):
        raise ValueError("endian must be '<' (II) or '>' (MM)")
    en = endian
    bits, sfmt = _DTYPE_TO_FMT[str(arr.dtype)]
    h, w = arr.shape
    le = arr.astype(arr.dtype.newbyteorder(en), copy=False)

    chunks: list[bytes] = []
    if tile_size:
        ts = int(tile_size)
        ntx, nty = (w + ts - 1) // ts, (h + ts - 1) // ts
        for ty in range(nty):
            for tx in range(ntx):
                pad = np.zeros((ts, ts), dtype=le.dtype)
                sub = le[ty * ts:(ty + 1) * ts, tx * ts:(tx + 1) * ts]
                pad[: sub.shape[0], : sub.shape[1]] = sub
                chunks.append(pad.tobytes())
    else:
        for y0 in range(0, h, rows_per_strip):
            chunks.append(le[y0:y0 + rows_per_strip].tobytes())

    geo_keys = [1, 1, 0, 3,
                _KEY_MODEL_TYPE, 0, 1, 1 if 3000 <= epsg else 2,
                _KEY_RASTER_TYPE, 0, 1, 1,
                (_KEY_PROJECTED_CS if 3000 <= epsg else _KEY_GEOGRAPHIC_CS),
                0, 1, epsg]

    entries = [
        _entry(TAG_WIDTH, 4, w, en=en),
        _entry(TAG_HEIGHT, 4, h, en=en),
        _entry(TAG_BITS, 3, bits, en=en),
        _entry(TAG_COMPRESSION, 3, 1, en=en),
        _entry(TAG_PHOTOMETRIC, 3, 1, en=en),
        _entry(TAG_SAMPLES_PER_PIXEL, 3, 1, en=en),
        _entry(TAG_PLANAR, 3, 1, en=en),
        _entry(TAG_SAMPLE_FORMAT, 3, sfmt, en=en),
        _entry(TAG_PIXEL_SCALE, 12,
               [float(pixel_size[0]), float(pixel_size[1]), 0.0], en=en),
        _entry(TAG_TIEPOINT, 12,
               [0.0, 0.0, 0.0, float(origin[0]), float(origin[1]), 0.0], en=en),
        _entry(TAG_GEO_KEYS, 3, geo_keys, en=en),
    ]
    if nodata is not None:
        entries.append(_entry(TAG_GDAL_NODATA, 2, repr(float(nodata)), en=en))
    counts = [len(c) for c in chunks]
    if tile_size:
        entries.append(_entry(TAG_TILE_W, 3, tile_size, en=en))
        entries.append(_entry(TAG_TILE_H, 3, tile_size, en=en))
        off_tag, cnt_tag = TAG_TILE_OFFSETS, TAG_TILE_COUNTS
    else:
        entries.append(_entry(TAG_ROWS_PER_STRIP, 4, rows_per_strip, en=en))
        off_tag, cnt_tag = TAG_STRIP_OFFSETS, TAG_STRIP_COUNTS
    entries.append(_entry(cnt_tag, 4, counts, en=en))
    # offsets filled once the layout is known; reserve the entry now
    entries.append(_entry(off_tag, 4, [0] * len(chunks), en=en))
    entries.sort(key=lambda e: e[0])

    ifd_size = 2 + 12 * len(entries) + 4
    ext_off = 8 + ifd_size
    ext_payloads: list[bytes] = []
    slots = {}  # tag -> external offset (0 = inline)
    for tag, typ, count, payload in entries:
        if len(payload) > 4:
            if len(payload) % 2:
                payload += b"\x00"
            slots[tag] = ext_off
            ext_payloads.append(payload)
            ext_off += len(payload)
        else:
            slots[tag] = 0
    data_off = ext_off
    offsets = []
    for c in chunks:
        offsets.append(data_off)
        data_off += len(c)

    def render(tag, typ, count, payload):
        if tag == off_tag:  # rebuild with real offsets
            payload = struct.pack(en + "%dI" % len(offsets), *offsets)
        if slots[tag]:
            tail = struct.pack(en + "I", slots[tag])
        else:
            tail = payload + b"\x00" * (4 - len(payload))
        return struct.pack(en + "HHI", tag, typ, count) + tail

    with open(path, "wb") as f:
        f.write(struct.pack(en + "2sHI", b"II" if en == "<" else b"MM", 42, 8))
        f.write(struct.pack(en + "H", len(entries)))
        for e in entries:
            f.write(render(*e))
        f.write(struct.pack(en + "I", 0))
        for tag, typ, count, payload in entries:
            if slots[tag]:
                if tag == off_tag:
                    payload = struct.pack(en + "%dI" % len(offsets), *offsets)
                    if len(payload) % 2:
                        payload += b"\x00"
                f.write(payload)
        for c in chunks:
            f.write(c)


def _parse_ifd(buf: bytes):
    """-> (endian '<'/'>', {tag: list-of-values})."""
    if buf[:2] == b"II":
        en = "<"
    elif buf[:2] == b"MM":
        en = ">"
    else:
        raise ValueError("not a TIFF: bad byte-order mark")
    magic, ifd_off = struct.unpack(en + "HI", buf[2:8])
    if magic != 42:
        raise ValueError(f"not a classic TIFF (magic {magic})")
    (n,) = struct.unpack_from(en + "H", buf, ifd_off)
    tags = {}
    for i in range(n):
        tag, typ, count = struct.unpack_from(en + "HHI", buf, ifd_off + 2 + 12 * i)
        voff = ifd_off + 2 + 12 * i + 8
        size = _TYPE_SIZE.get(typ, 1) * count
        if size > 4:
            (voff,) = struct.unpack_from(en + "I", buf, voff)
        if typ == 2:
            tags[tag] = buf[voff:voff + count].split(b"\x00")[0].decode("latin1")
        elif typ in _TYPE_FMT:
            tags[tag] = list(struct.unpack_from(en + "%d%s" % (count, _TYPE_FMT[typ]), buf, voff))
        # unknown types are skipped, per the TIFF readers-ignore rule
    return en, tags


def _chunk_layout(tags, en):
    """-> dict describing the pixel chunks (shared by eager + manifest paths)."""
    w, h = tags[TAG_WIDTH][0], tags[TAG_HEIGHT][0]
    if tags.get(TAG_COMPRESSION, [1])[0] != 1:
        raise ValueError("only uncompressed (Compression=1) TIFFs supported")
    if tags.get(TAG_SAMPLES_PER_PIXEL, [1])[0] != 1:
        raise ValueError("only single-band TIFFs supported")
    bits = tags[TAG_BITS][0]
    sfmt = tags.get(TAG_SAMPLE_FORMAT, [1])[0]
    dname = _FMT_TO_DTYPE.get((bits, sfmt))
    if dname is None:
        raise ValueError(f"unsupported sample layout bits={bits} format={sfmt}")
    geo = {"origin": (0.0, 0.0), "pixel_size": (1.0, 1.0), "epsg": None,
           "nodata": None}
    if TAG_PIXEL_SCALE in tags:
        sx, sy = tags[TAG_PIXEL_SCALE][0], tags[TAG_PIXEL_SCALE][1]
        geo["pixel_size"] = (sx, sy)
    if TAG_TIEPOINT in tags:
        tp = tags[TAG_TIEPOINT]
        geo["origin"] = (tp[3] - tp[0] * geo["pixel_size"][0],
                         tp[4] + tp[1] * geo["pixel_size"][1])
    if TAG_GEO_KEYS in tags:
        gk = tags[TAG_GEO_KEYS]
        for i in range(4, len(gk), 4):
            if gk[i] in (_KEY_PROJECTED_CS, _KEY_GEOGRAPHIC_CS) and gk[i + 1] == 0:
                geo["epsg"] = gk[i + 3]
    if TAG_GDAL_NODATA in tags:
        geo["nodata"] = float(tags[TAG_GDAL_NODATA])
    if TAG_TILE_OFFSETS in tags:
        ts_w, ts_h = tags[TAG_TILE_W][0], tags[TAG_TILE_H][0]
        ntx = (w + ts_w - 1) // ts_w
        chunks = [
            {"tx": i % ntx, "ty": i // ntx, "offset": off, "nbytes": cnt,
             "chunk_w": ts_w, "chunk_h": ts_h,
             "clip_w": min(ts_w, w - (i % ntx) * ts_w),
             "clip_h": min(ts_h, h - (i // ntx) * ts_h)}
            for i, (off, cnt) in enumerate(
                zip(tags[TAG_TILE_OFFSETS], tags[TAG_TILE_COUNTS]))
        ]
    else:
        rps = tags.get(TAG_ROWS_PER_STRIP, [h])[0]
        chunks = [
            {"tx": 0, "ty": i, "offset": off, "nbytes": cnt,
             "chunk_w": w, "chunk_h": min(rps, h - i * rps),
             "clip_w": w, "clip_h": min(rps, h - i * rps)}
            for i, (off, cnt) in enumerate(
                zip(tags[TAG_STRIP_OFFSETS], tags[TAG_STRIP_COUNTS]))
        ]
    return {"width": w, "height": h, "dtype": dname, "endian": en,
            "chunks": chunks, **geo}


def read_gtiff(path: str):
    """Eager parse -> (2-D array in native byte order, meta dict)."""
    with open(path, "rb") as f:
        buf = f.read()
    en, tags = _parse_ifd(buf)
    lay = _chunk_layout(tags, en)
    dt = np.dtype(lay["dtype"]).newbyteorder(en)
    out = np.zeros((lay["height"], lay["width"]), dtype=lay["dtype"])
    for c in lay["chunks"]:
        a = np.frombuffer(buf, dtype=dt, count=c["chunk_w"] * c["chunk_h"],
                          offset=c["offset"]).reshape(c["chunk_h"], c["chunk_w"])
        # grid pitch: tiles advance by the tile size, strips by rows-per-strip
        # (both equal the FIRST chunk's extent; later chunks may be clipped)
        ts_h = lay["chunks"][0]["chunk_h"]
        ts_w = lay["chunks"][0]["chunk_w"]
        y0 = c["ty"] * ts_h
        x0 = c["tx"] * ts_w
        out[y0:y0 + c["clip_h"], x0:x0 + c["clip_w"]] = \
            a[: c["clip_h"], : c["clip_w"]].astype(lay["dtype"])
    meta = {k: lay[k] for k in ("origin", "pixel_size", "epsg", "nodata",
                                "width", "height", "dtype")}
    return out, meta


def read_gtiff_manifest(path: str) -> dict:
    """Parse only the IFD (header bytes) -> layout dict with chunk ranges.
    At 100 TB this is the ONLY driver-side read; pixels stay on workers."""
    with open(path, "rb") as f:
        head = f.read(65536)
    en, tags = _parse_ifd(head)
    return _chunk_layout(tags, en)


def read_gtiff_tiles(path: str, z: int = 4, band: int = 1):
    """GeoTIFF -> the engine's standard tile-row Dataset.

    Driver parses the IFD only; each worker range-reads its chunks' bytes
    (``map_batches`` over the manifest) and trims TIFF edge-tile padding to
    the engine's clipped-edge convention.
    """
    import ray.data as rd

    lay = read_gtiff_manifest(path)
    man = pa.Table.from_pylist([
        {"tx": c["tx"], "ty": c["ty"], "offset": c["offset"],
         "nbytes": c["nbytes"], "chunk_w": c["chunk_w"], "chunk_h": c["chunk_h"],
         "clip_w": c["clip_w"], "clip_h": c["clip_h"]}
        for c in lay["chunks"]
    ])
    dname, en = lay["dtype"], lay["endian"]
    nodata = lay["nodata"] if lay["nodata"] is not None else 0.0
    out_dtype = "float32" if dname in ("float32", "float64") else dname

    def fetch(t: pa.Table) -> pa.Table:
        dt = np.dtype(dname).newbyteorder(en)
        rows = []
        with open(path, "rb") as f:
            for i in range(t.num_rows):
                f.seek(t["offset"][i].as_py())
                raw = f.read(t["nbytes"][i].as_py())
                ch, cw = t["chunk_h"][i].as_py(), t["chunk_w"][i].as_py()
                clh, clw = t["clip_h"][i].as_py(), t["clip_w"][i].as_py()
                a = np.frombuffer(raw, dtype=dt, count=ch * cw).reshape(ch, cw)
                sub = a[:clh, :clw].astype(out_dtype)
                rows.append({
                    "z": z, "x": t["tx"][i].as_py(), "y": t["ty"][i].as_py(),
                    "band": band, "width": clw, "height": clh,
                    "crs": f"EPSG:{lay['epsg'] or 3857}",
                    "nodata": float(nodata), "dtype": out_dtype,
                    "data": sub.tobytes(),
                })
        return pa.Table.from_pylist(rows)

    return rd.from_arrow(man).map_batches(fetch, batch_format="pyarrow")
