"""gdalmanage / gdal dataset identify-copy-rename-delete (apps/gdalmanage.cpp,
gdalalg_dataset_*.cpp): sidecar-aware file operations + driver probe."""

import os

import numpy as np
import pytest

from gdal_ray.sources import manage


@pytest.fixture()
def shp(tmp_path):
    from gdal_ray.functions import wkb as wkb_f
    from gdal_ray.sources import shapefile
    import pyarrow as pa

    base = str(tmp_path / "pts")
    wkbs = wkb_f.encode_points(np.arange(5.0), np.arange(5.0) + 1)
    shapefile.write_shapefile(
        base, wkbs, pa.table({"fid": pa.array(np.arange(5, dtype=np.int64))}))
    return base + ".shp"


def test_identify(shp, tmp_path):
    assert manage.dataset_identify(shp) in ("ESRI Shapefile", "SHP",
                                            "Shapefile")
    junk = str(tmp_path / "junk.bin")
    with open(junk, "wb") as f:
        f.write(b"\x00\x01nothing")
    assert manage.dataset_identify(junk) is None


def test_files_copy_rename_delete(shp, tmp_path):
    files = manage.dataset_files(shp)
    assert len(files) >= 3  # .shp + .shx + .dbf at minimum
    exts = {os.path.splitext(f)[1] for f in files}
    assert {".shp", ".shx", ".dbf"} <= exts

    dst = str(tmp_path / "copy" / "pts2.shp")
    made = manage.dataset_copy(shp, dst)
    assert os.path.exists(dst)
    assert len(made) == len(files)
    from gdal_ray.sources import shapefile
    t = shapefile.read_shapefile(os.path.splitext(dst)[0])
    assert t.num_rows == 5

    dst2 = str(tmp_path / "moved.shp")
    manage.dataset_rename(dst, dst2)
    assert os.path.exists(dst2) and not os.path.exists(dst)
    assert not os.path.exists(os.path.splitext(dst)[0] + ".dbf")

    gone = manage.dataset_delete(dst2)
    assert not any(os.path.exists(f) for f in gone)
    # original untouched
    assert os.path.exists(shp)


def test_missing_raises(tmp_path):
    with pytest.raises(FileNotFoundError):
        manage.dataset_files(str(tmp_path / "nope.shp"))
