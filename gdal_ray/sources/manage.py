"""Dataset management — ``gdalmanage`` / ``gdal dataset`` subcommands.

Re-answers ``apps/gdalmanage.cpp`` and ``apps/gdalalg_dataset_*.cpp``
(identify / copy / rename / delete): driver identification through the
same magic probes the openers use, and file operations that carry a
dataset's SIDECAR files along (``GDALDataset::GetFileList`` semantics —
a shapefile is .shp+.shx+.dbf+.prj+.cpg, an ENVI raster is data+.hdr,
an AAIGrid may carry a .prj, a SOZip-less world file rides .wld), so a
copy or rename never orphans half a dataset.
"""

from __future__ import annotations

import os
import shutil

# sidecar extension groups keyed by the primary extension (lowercase).
# GetFileList parity: gdalmanage moves whatever the driver reports; these
# are the groups our in-repo drivers produce/read.
_SIDECARS = {
    ".shp": (".shx", ".dbf", ".prj", ".cpg"),
    ".asc": (".prj", ".wld"),
    ".bil": (".hdr", ".prj"),
    ".bsq": (".hdr", ".prj"),
    ".bip": (".hdr", ".prj"),
    ".img": (".hdr", ".prj"),
    ".raw": (".hdr", ".prj"),
    ".tif": (".tfw", ".prj", ".msk"),
    ".png": (".pgw", ".prj"),
    ".jpg": (".jgw", ".prj"),
    ".bmp": (".bpw", ".prj"),
}


def dataset_identify(path: str) -> str | None:
    """``gdalmanage identify``: driver name via the raster then vector
    magic probes; None when nothing claims the file."""
    from . import openraster, openvector

    for probe in (openraster.identify, openvector.identify):
        try:
            drv = probe(path)
        except Exception:
            drv = None
        if drv:
            return drv
    return None


def dataset_files(path: str) -> list[str]:
    """The dataset's file set: the primary file plus every EXISTING
    sidecar (GDALDataset::GetFileList shape)."""
    if not os.path.exists(path):
        raise FileNotFoundError(path)
    stem, ext = os.path.splitext(path)
    out = [path]
    for sc in _SIDECARS.get(ext.lower(), ()):
        for cand in (stem + sc, stem + sc.upper()):
            if os.path.exists(cand) and cand not in out:
                out.append(cand)
    return out


def _retarget(src: str, dst: str, f: str) -> str:
    """Map a sidecar of ``src`` onto the corresponding name under ``dst``."""
    sstem, _ = os.path.splitext(src)
    dstem, _ = os.path.splitext(dst)
    assert f.startswith(sstem)
    return dstem + f[len(sstem):]


def dataset_copy(src: str, dst: str) -> list[str]:
    """``gdalmanage copy``: duplicate the dataset WITH its sidecars.
    Returns the created paths."""
    made = []
    for f in dataset_files(src):
        target = _retarget(src, dst, f)
        os.makedirs(os.path.dirname(os.path.abspath(target)), exist_ok=True)
        shutil.copy2(f, target)
        made.append(target)
    return made


def dataset_rename(src: str, dst: str) -> list[str]:
    """``gdalmanage rename``: move the dataset and its sidecars."""
    moved = []
    for f in dataset_files(src):
        target = _retarget(src, dst, f)
        os.makedirs(os.path.dirname(os.path.abspath(target)), exist_ok=True)
        os.replace(f, target)
        moved.append(target)
    return moved


def dataset_delete(path: str) -> list[str]:
    """``gdalmanage delete``: remove the dataset and its sidecars
    (GDALDriver::QuietDelete shape).  Returns the removed paths."""
    gone = []
    for f in dataset_files(path):
        os.remove(f)
        gone.append(f)
    return gone
