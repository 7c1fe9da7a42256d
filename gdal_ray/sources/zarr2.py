"""Zarr v2 store — dependency-free reader + writer feeding the mdim
surface.

From-scratch implementation of the public Zarr v2 storage spec
(``.zarray`` / ``.zattrs`` / ``.zgroup`` JSON + one file per chunk,
``c0.c1...`` keys): numeric dtypes with explicit endianness, C and F
chunk order, zlib / gzip / raw compressors, the ``delta`` filter,
``fill_value`` for missing chunks, nested groups, consolidated metadata
(``.zmetadata``), and the ``_ARRAY_DIMENSIONS`` attribute (xarray's
public dimension convention).  Reference driver role: ``frmts/zarr/``
(zarr_v2 paths); test parity target ``autotest/gdrivers/zarr*.py``
fixtures.  Blosc / zstd / lz4 compressors have no codec in this
container and raise a clear error.

Ray-Data shape mirrors the other mdim containers: the driver reads only
JSON metadata; ``read_hyperslab`` touches just the chunk files
intersecting the request, so ``stages.mdim.read_mdarray_chunks``
workers fault in only their own chunks — a chunk-per-file layout is the
natural object-store format at 100 TB.
"""
from __future__ import annotations

import json
import os
import zlib

import numpy as np

_SUPPORTED_COMPRESSORS = {None, "zlib", "gzip"}


def _codec_decode(data: bytes, comp: dict | None) -> bytes:
    if comp is None:
        return data
    cid = comp.get("id")
    if cid == "zlib":
        return zlib.decompress(data)
    if cid == "gzip":
        import gzip as _gz

        return _gz.decompress(data)
    if cid == "lzma":
        import lzma as _lz

        return _lz.decompress(data)
    raise NotImplementedError(
        f"zarr compressor {cid!r} (no codec in this container; "
        "supported: zlib, gzip, lzma, raw)")


def _codec_encode(data: bytes, comp: dict | None) -> bytes:
    if comp is None:
        return data
    cid = comp.get("id")
    lvl = int(comp.get("level", 6))
    if cid == "zlib":
        return zlib.compress(data, lvl)
    if cid == "gzip":
        import gzip as _gz

        return _gz.compress(data, lvl)
    if cid == "lzma":
        import lzma as _lz

        return _lz.compress(data)
    raise NotImplementedError(f"zarr compressor {cid!r}")


class ZarrArray:
    def __init__(self, path: str, meta: dict, attrs: dict):
        self.path = path
        self.meta = meta
        self.attrs = attrs
        self.shape = list(meta["shape"])
        self.chunks = list(meta["chunks"])
        dt = meta["dtype"]
        if isinstance(dt, list):
            raise NotImplementedError("zarr compound dtype")
        if isinstance(dt, str) and dt[:1] == "!":
            dt = "|" + dt[1:]  # '!' = network order; 1-byte types only here
        self.dtype = np.dtype(dt)
        self.order = meta.get("order", "C")
        self.compressor = meta.get("compressor")
        self.filters = meta.get("filters") or []
        for f in self.filters:
            if f.get("id") not in ("delta", "shuffle", "quantize",
                                   "bitround", "fixedscaleoffset"):
                raise NotImplementedError(f"zarr filter {f.get('id')!r}")
        self.fill = meta.get("fill_value")
        self.sep = meta.get("dimension_separator", ".")

    @property
    def dims(self) -> list[str]:
        ad = self.attrs.get("_ARRAY_DIMENSIONS")
        if ad:
            return list(ad)
        return [f"dim_{i}" for i in range(len(self.shape))]

    def _fill_scalar(self):
        if self.fill is None:
            return 0
        if isinstance(self.fill, str):
            return {"NaN": np.nan, "Infinity": np.inf,
                    "-Infinity": -np.inf}.get(self.fill, 0)
        return self.fill

    def _chunk(self, coords) -> np.ndarray:
        key = self.sep.join(str(c) for c in coords) or "0"
        p = os.path.join(self.path, key)
        cs = self.chunks
        if not os.path.exists(p):
            return np.full(cs, self._fill_scalar(), dtype=self.dtype)
        with open(p, "rb") as f:
            raw = _codec_decode(f.read(), self.compressor)
        n = int(np.prod(cs))
        # filters run innermost-last on encode -> reverse on decode; the
        # ON-DISK dtype is the LAST filter's output type
        disk_dt = np.dtype(self.dtype)
        for f in self.filters:
            if f["id"] == "fixedscaleoffset" and "astype" in f:
                disk_dt = np.dtype(f["astype"])
            elif f["id"] == "quantize" and "astype" in f:
                disk_dt = np.dtype(f["astype"])
        a = np.frombuffer(raw, dtype=disk_dt, count=n)
        for f in reversed(self.filters):
            fid = f["id"]
            if fid == "delta":
                a = np.cumsum(
                    a.astype(np.dtype(f.get("dtype", self.dtype))),
                    axis=None).astype(self.dtype)
            elif fid == "shuffle":
                es = int(f.get("elementsize", disk_dt.itemsize))
                b = np.frombuffer(a.tobytes(), np.uint8)
                k = len(b) // es
                a = np.frombuffer(
                    b[: k * es].reshape(es, k).T.tobytes(), dtype=disk_dt)
            elif fid == "quantize":
                # lossy rounding applied at encode; decode = cast back
                a = a.astype(np.dtype(f.get("dtype", self.dtype)))
            elif fid == "bitround":
                a = a.astype(np.dtype(self.dtype))  # lossy; identity here
            elif fid == "fixedscaleoffset":
                scale = float(f["scale"])
                off = float(f["offset"])
                a = (a.astype(np.float64) / scale + off).astype(
                    np.dtype(f.get("dtype", self.dtype)))
        a = np.asarray(a, dtype=self.dtype)
        a = (a.reshape(cs, order="F") if self.order == "F"
             else a.reshape(cs))
        return a

    def read(self) -> np.ndarray:
        starts = [0] * len(self.shape)
        return self.read_hyperslab(starts, self.shape)

    def read_hyperslab(self, starts, counts) -> np.ndarray:
        starts = [int(s) for s in starts]
        counts = [int(c) for c in counts]
        out = np.full(counts, self._fill_scalar(), dtype=self.dtype)
        nd = len(self.shape)
        cs = self.chunks
        lo = [starts[d] // cs[d] for d in range(nd)]
        hi = [(starts[d] + counts[d] - 1) // cs[d] for d in range(nd)]
        import itertools

        for coords in itertools.product(
                *[range(lo[d], hi[d] + 1) for d in range(nd)]):
            a = self._chunk(coords)
            sl_out, sl_in = [], []
            for d in range(nd):
                c0 = coords[d] * cs[d]
                g0 = max(c0, starts[d])
                g1 = min(c0 + cs[d], starts[d] + counts[d], self.shape[d])
                sl_out.append(slice(g0 - starts[d], g1 - starts[d]))
                sl_in.append(slice(g0 - c0, g1 - c0))
            out[tuple(sl_out)] = a[tuple(sl_in)]
        return out


def _load_json(p: str) -> dict:
    with open(p) as f:
        text = f.read()
    try:
        return json.loads(text)
    except json.JSONDecodeError:
        # the reference tolerates single-quoted strings in hand-written
        # stores (autotest array_attrs.zarr)
        return json.loads(text.replace("'", '"'))


def open_zarr(root: str) -> dict[str, ZarrArray]:
    """Walk a Zarr v2 store -> {'/'-joined array name: ZarrArray}.
    Uses consolidated metadata (.zmetadata) when present."""
    out: dict[str, ZarrArray] = {}
    zmeta = os.path.join(root, ".zmetadata")
    if os.path.exists(zmeta):
        meta = _load_json(zmeta)["metadata"]
        for key, m in meta.items():
            if key.endswith(".zarray"):
                name = key[:-len("/.zarray")] if "/" in key else ""
                attrs = meta.get((name + "/" if name else "") + ".zattrs",
                                 {})
                out[name or os.path.basename(root)] = ZarrArray(
                    os.path.join(root, name), m, attrs)
        if out:
            return out
    if os.path.exists(os.path.join(root, ".zarray")):
        attrs = {}
        za = os.path.join(root, ".zattrs")
        if os.path.exists(za):
            attrs = _load_json(za)
        out[os.path.basename(root.rstrip("/")).removesuffix(".zarr")
            or "array"] = ZarrArray(root, _load_json(
                os.path.join(root, ".zarray")), attrs)
        return out
    for dirpath, dirnames, filenames in os.walk(root):
        if ".zarray" in filenames:
            rel = os.path.relpath(dirpath, root).replace(os.sep, "/")
            attrs = {}
            if ".zattrs" in filenames:
                attrs = _load_json(os.path.join(dirpath, ".zattrs"))
            out[rel] = ZarrArray(dirpath, _load_json(
                os.path.join(dirpath, ".zarray")), attrs)
            dirnames[:] = [d for d in dirnames
                           if not d[0].isdigit()]  # skip chunk dirs
    return out


def is_zarr(path: str) -> bool:
    return os.path.isdir(path) and (
        os.path.exists(os.path.join(path, ".zarray"))
        or os.path.exists(os.path.join(path, ".zgroup"))
        or os.path.exists(os.path.join(path, ".zmetadata")))


def write_zarr(root: str, variables: dict, chunks: dict | None = None,
               compressor: dict | None = {"id": "zlib", "level": 6},
               consolidated: bool = True) -> None:
    """variables: name -> (dim_names, array).  One directory per array
    under a group root, `_ARRAY_DIMENSIONS` attrs, optional consolidated
    metadata."""
    os.makedirs(root, exist_ok=True)
    with open(os.path.join(root, ".zgroup"), "w") as f:
        json.dump({"zarr_format": 2}, f)
    consolidated_meta: dict = {".zgroup": {"zarr_format": 2}}
    for name, (dims, arr) in variables.items():
        arr = np.ascontiguousarray(arr)
        cs = list((chunks or {}).get(name, arr.shape))
        adir = os.path.join(root, name)
        os.makedirs(adir, exist_ok=True)
        meta = {"zarr_format": 2, "shape": list(arr.shape),
                "chunks": [int(c) for c in cs],
                "dtype": arr.dtype.newbyteorder("<").str,
                "compressor": compressor, "fill_value": 0,
                "filters": None, "order": "C"}
        attrs = {"_ARRAY_DIMENSIONS": list(dims)}
        with open(os.path.join(adir, ".zarray"), "w") as f:
            json.dump(meta, f)
        with open(os.path.join(adir, ".zattrs"), "w") as f:
            json.dump(attrs, f)
        consolidated_meta[f"{name}/.zarray"] = meta
        consolidated_meta[f"{name}/.zattrs"] = attrs
        le = arr.astype(arr.dtype.newbyteorder("<"), copy=False)
        import itertools

        grid = [range((arr.shape[d] + cs[d] - 1) // cs[d])
                for d in range(arr.ndim)]
        for coords in itertools.product(*grid):
            sl = tuple(slice(c * cs[d], min((c + 1) * cs[d], arr.shape[d]))
                       for d, c in enumerate(coords))
            pad = np.zeros(cs, dtype=le.dtype)
            pad[tuple(slice(0, s.stop - s.start) for s in sl)] = le[sl]
            key = ".".join(str(c) for c in coords)
            with open(os.path.join(adir, key), "wb") as f:
                f.write(_codec_encode(pad.tobytes(), compressor))
    if consolidated:
        with open(os.path.join(root, ".zmetadata"), "w") as f:
            json.dump({"zarr_consolidated_format": 1,
                       "metadata": consolidated_meta}, f)


# --- netcdf3-compatible facade for stages.mdim ------------------------------


def read_header(path: str):
    arrays = open_zarr(path)
    dims: dict[str, int] = {}
    meta = {}
    for name, za in arrays.items():
        try:
            dtname = za.dtype.name
        except Exception:
            continue
        vdims = za.dims
        meta[name] = (vdims, list(za.shape), dtname, None, dict(za.attrs),
                      None)
        for d, s in zip(vdims, za.shape):
            dims.setdefault(d, s)
    return dims, meta, {}


def read_hyperslab(path: str, var: str, starts, counts) -> np.ndarray:
    a = open_zarr(path)[var].read_hyperslab(starts, counts)
    return a.astype(a.dtype.newbyteorder("="), copy=False)
