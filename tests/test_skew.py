"""Skew handling: pathological all-in-one-cell fixture (north rule / SURVEY §7).

50%+ of points land in a single grid cell; the salted partitioned join must
still produce exact results, with zone rows replicated across salt buckets and
point rows spread over them.
"""

import numpy as np
import pyarrow as pa
import ray.data as rd

from gdal_ray.functions import geo
from gdal_ray.sources import synthetic
from gdal_ray.stages import join as join_stage
from gdal_ray.stages import tiles as tiles_stage
from tests.test_join_stages import brute_pairs


def _skewed_docs(n=2000):
    """Half the docs at (10.005..10.015, 10.005..) inside ONE res-4 cell."""
    keys = np.arange(n, dtype=np.int64)
    lon, lat = geo.derive_lonlat(keys)
    hot = keys % 2 == 0
    lon = np.where(hot, 10.0 + (keys % 97) * 0.0001, lon)
    lat = np.where(hot, 10.0 + (keys % 89) * 0.0001, lat)
    from gdal_ray.functions import wkb as _w

    return pa.table(
        {
            "doc_id": synthetic.doc_key_to_id(keys),
            "lon": pa.array(lon),
            "lat": pa.array(lat),
            "wkb": pa.array(_w.encode_points(lon, lat), pa.binary()),
        }
    )


def test_salted_join_exact_under_extreme_skew():
    docs = _skewed_docs()
    zones = synthetic.make_rect_zones(np.arange(1, 80))
    # add one zone right on the hotspot so the hot cell actually joins
    hot_zone = synthetic.make_rect_zones(np.array([100000]))
    import pyarrow as pa_

    hz = hot_zone.set_column(2, "minx", pa_.array([9.0]))
    hz = hz.set_column(3, "miny", pa_.array([9.0]))
    hz = hz.set_column(4, "maxx", pa_.array([11.0]))
    hz = hz.set_column(5, "maxy", pa_.array([11.0]))
    from gdal_ray.functions import wkb as _w

    ring = np.array([[9.0, 9.0], [11.0, 9.0], [11.0, 11.0], [9.0, 11.0], [9.0, 9.0]])
    hz = hz.set_column(6, "wkb", pa_.array([_w.encode_polygon([ring])], pa_.binary()))
    zones = pa.concat_tables([zones, hz])

    ds = rd.from_arrow(docs)
    salts = join_stage.compute_hot_cells(ds, res=4, hot_threshold=100, max_salt=8)
    assert salts, "hot cell must be detected"
    hot_cell = int(geo.point_cells(np.array([10.005]), np.array([10.005]), 4)[0])
    assert hot_cell in salts and salts[hot_cell] >= 2

    got = {
        (r["doc_id"], r["zone_id"])
        for r in join_stage.partitioned_spatial_join(
            ds, rd.from_arrow(zones), res=4, salts=salts
        ).take_all()
    }
    expect = brute_pairs(docs, zones, "intersects")
    assert got == expect
    assert len({p for p in expect if p[1] == "zone-100000"}) == 1000  # all hot docs joined
