"""GDALOpen-style raster opener: probe every in-repo driver, return tiles.

Re-answers the reference's driver-identify loop (``gcore/gdaldataset.cpp``
GDALOpenEx -> per-driver Identify/Open probes, each driver sniffing its own
magic; ``frmts/*/...dataset.cpp`` Identify methods) over the engine's raster
driver set: the file's leading bytes (or, for the headerless formats, its
name/size contract) select the driver, and the matched driver's
``read_*_tiles`` emits the engine's standard tile rows.

Probe order mirrors the reference's registration order idea: unambiguous
magics first, then the headerless/sidecar formats (HGT by filename+size,
ENVI by .hdr sidecar, TGA by extension — TGA has no magic, same caveat as
frmts/tga).
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa


def identify(path: str) -> str:
    """Driver short-name for a raster path (GDALIdentifyDriver role).
    Raises ValueError when no driver claims the file."""
    with open(path, "rb") as f:
        head = f.read(16)
    name = os.path.basename(path).lower()
    if head[:2] == b"BM":
        return "BMP"
    if head[:6] in (b"GIF87a", b"GIF89a"):
        return "GIF"
    if head[:2] in (b"P5", b"P6"):
        return "PNM"
    if head[:8] == b"\x89PNG\r\n\x1a\n":
        return "PNG"
    if head[:2] == b"\xff\xd8":
        return "JPEG"
    if head[:4] in (b"II*\x00", b"MM\x00*", b"II+\x00", b"MM\x00+"):
        return "GTiff"  # classic 42 or BigTIFF 43
    if head[:3] == b"UHL":
        return "DTED"
    if head[:3] in (b"CDF",):
        return "netCDF"
    if head[:1].isdigit() is False and head[:5].lower() in (b"ncols",):
        return "AAIGrid"
    if name.endswith(".asc"):
        return "AAIGrid"
    if name.endswith(".hgt"):
        return "SRTMHGT"
    if name.endswith((".tga", ".tpic")):
        return "TGA"
    if os.path.exists(os.path.splitext(path)[0] + ".hdr") or \
            os.path.exists(path + ".hdr"):
        return "ENVI"
    raise ValueError(
        f"no driver claims {path!r} (probed magics: BMP/GIF/PNM/PNG/JPEG/"
        "GTiff/DTED/netCDF/AAIGrid + HGT/TGA/ENVI name contracts — the "
        "GDALOpenEx identify loop, gcore/gdaldataset.cpp)")


def _image_tiles(arr: np.ndarray, tile_size: int, z: int):
    import ray.data as rd

    if arr.ndim == 3:
        arr = arr.mean(axis=2).astype(arr.dtype)
    h, w = arr.shape
    rows = []
    for ty in range((h + tile_size - 1) // tile_size):
        for tx in range((w + tile_size - 1) // tile_size):
            sub = arr[ty * tile_size:(ty + 1) * tile_size,
                      tx * tile_size:(tx + 1) * tile_size]
            rows.append({
                "z": z, "x": tx, "y": ty, "band": 1,
                "width": sub.shape[1], "height": sub.shape[0],
                "crs": "EPSG:3857", "nodata": 0.0,
                "dtype": str(sub.dtype),
                "data": np.ascontiguousarray(sub).tobytes(),
            })
    return rd.from_arrow(pa.Table.from_pylist(rows))


def open_raster_tiles(path: str, tile_size: int = 64, z: int = 4,
                      band: int = 1, var: str | None = None):
    """Open any supported raster as the engine's standard tile Dataset —
    the GDALOpen entry point.  ``var``: NetCDF variable (defaults to the
    first 2-D one); ``band`` routes through multi-band drivers.
    /vsizip//vsigzip//vsitar/ container paths resolve first (cpl_vsil_*)."""
    from .vsi import vsi_resolve

    path = vsi_resolve(path)
    drv = identify(path)
    if drv == "BMP":
        from .bmp import read_bmp_tiles

        return read_bmp_tiles(path, tile_size=tile_size, z=z, band=band)
    if drv == "GIF":
        from .gif import read_gif_tiles

        return read_gif_tiles(path, tile_size=tile_size, z=z)
    if drv == "PNM":
        from .pnm import read_pnm_tiles

        return read_pnm_tiles(path, tile_size=tile_size, z=z, band=band)
    if drv == "PNG":
        from .png import decode_png

        with open(path, "rb") as f:
            return _image_tiles(decode_png(f.read()), tile_size, z)
    if drv == "JPEG":
        from .jpeg import decode_baseline

        with open(path, "rb") as f:
            return _image_tiles(decode_baseline(f.read()), tile_size, z)
    if drv == "GTiff":
        from .gtiff import read_gtiff_tiles

        return read_gtiff_tiles(path, z=z, band=band)
    if drv == "DTED":
        from .dted import read_dted_tiles

        return read_dted_tiles(path, tile_size=tile_size, z=z)
    if drv == "netCDF":
        from .netcdf3 import read_header, read_netcdf3_tiles

        if var is None:
            _dims, variables, _g = read_header(path)
            two_d = [n for n, (_dn, shape, *_r) in variables.items()
                     if len(shape) == 2]
            if not two_d:
                raise ValueError(f"{path!r} has no 2-D variable")
            var = two_d[0]
        return read_netcdf3_tiles(path, var, tile_size=tile_size, z=z)
    if drv == "AAIGrid":
        from .aaigrid import read_asc_tiles

        return read_asc_tiles(path, tile_size=tile_size, z=z)
    if drv == "SRTMHGT":
        from .hgt import read_hgt_tiles

        return read_hgt_tiles(path, tile_size=tile_size, z=z)
    if drv == "TGA":
        from .tga import read_tga_tiles

        return read_tga_tiles(path, tile_size=tile_size, z=z, band=band)
    if drv == "ENVI":
        from .envi import read_envi_tiles

        return read_envi_tiles(path, tile_size=tile_size, z=z, band=band)
    raise AssertionError(drv)
