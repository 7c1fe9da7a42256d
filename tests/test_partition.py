"""gdal vector partition (apps/gdalalg_vector_partition.cpp): hive/flat
schemes, feature-limit rollover, omit-partitioned-field, geojson driver."""

import glob
import os

import numpy as np
import pyarrow as pa
import pytest

from gdal_ray.functions import wkb as wkb_f
from gdal_ray.sources import partition


def _layer(n=97):
    k = np.arange(n, dtype=np.int64)
    x = (k % 10).astype(np.float64)
    wkbs = wkb_f.encode_points(x, x + 1)
    return pa.table({"fid": pa.array(k), "cat": pa.array(k % 3),
                     "wkb": pa.array(wkbs, pa.binary())})


def test_hive_roundtrip(ray_session, tmp_path):
    import ray.data as rd

    root = str(tmp_path / "hive")
    partition.vector_partition(rd.from_arrow(_layer()), root, "cat")
    dirs = sorted(os.listdir(root))
    assert dirs == ["cat=0", "cat=1", "cat=2"]
    back = partition.read_partitioned_vector(root).to_pandas()
    assert len(back) == 97
    assert sorted(back["fid"]) == list(range(97))
    # rows landed in the right directory
    for d in dirs:
        val = int(d.split("=")[1])
        for f in glob.glob(os.path.join(root, d, "*.parquet")):
            import pyarrow.parquet as pq
            t = pq.read_table(f)
            assert (t["cat"].to_numpy() == val).all()


def test_omit_field_rederived(ray_session, tmp_path):
    import ray.data as rd

    root = str(tmp_path / "omit")
    partition.vector_partition(rd.from_arrow(_layer()), root, "cat",
                               omit_field=True)
    f = glob.glob(os.path.join(root, "cat=1", "*.parquet"))[0]
    import pyarrow.parquet as pq
    assert "cat" not in pq.read_table(f).column_names
    back = partition.read_partitioned_vector(root, field="cat").to_pandas()
    assert set(back["cat"]) == {"0", "1", "2"}
    got = back[back["cat"] == "1"]["fid"].to_numpy()
    assert sorted(got) == [i for i in range(97) if i % 3 == 1]


def test_feature_limit_rollover(ray_session, tmp_path):
    import ray.data as rd

    root = str(tmp_path / "lim")
    ds = rd.from_arrow(_layer(90)).repartition(1)
    partition.vector_partition(ds, root, "cat", feature_limit=10)
    files = glob.glob(os.path.join(root, "cat=0", "*.parquet"))
    assert len(files) == 3  # 30 rows / 10 per file
    import pyarrow.parquet as pq
    assert all(pq.read_table(f).num_rows == 10 for f in files)


def test_flat_scheme_and_geojson(ray_session, tmp_path):
    import ray.data as rd

    root = str(tmp_path / "flat")
    partition.vector_partition(rd.from_arrow(_layer(30)), root, "cat",
                               scheme="flat", driver="geojson")
    dirs = sorted(os.listdir(root))
    assert dirs == ["0", "1", "2"]
    back = partition.read_partitioned_vector(root, driver="geojson")
    df = back.to_pandas()
    assert len(df) == 30
    assert "wkb" in df.columns


def test_bad_inputs(ray_session, tmp_path):
    import ray.data as rd

    with pytest.raises(ValueError):
        partition.vector_partition(rd.from_arrow(_layer(5)),
                                   str(tmp_path / "x"), "cat", scheme="bogus")
    with pytest.raises(FileNotFoundError):
        partition.read_partitioned_vector(str(tmp_path / "empty"))


def test_vector_tile_index(ray_session, tmp_path):
    import ray.data as rd

    from gdal_ray.sources import openvector

    root = str(tmp_path / "tix")
    partition.vector_partition(rd.from_arrow(_layer(30)), root, "cat")
    import glob as _g
    paths = sorted(_g.glob(os.path.join(root, "*", "*.parquet")))
    idx = openvector.vector_tile_index(paths, id_from_dir=True).to_pandas()
    assert len(idx) == len(paths)
    assert idx["n_features"].sum() == 30
    # extent covers the points (x in 0..9, y = x+1)
    assert idx["minx"].min() == 0.0 and idx["maxx"].max() == 9.0
    assert idx["miny"].min() == 1.0 and idx["maxy"].max() == 10.0
    assert set(idx["part_key"]) == {"0", "1", "2"}
    # index rectangles decode as polygons
    from gdal_ray.functions import wkb as wkb_f
    g = wkb_f.decode(idx["wkb"].iloc[0])
    assert g is not None
