"""Regression tests for the round-2 ADVICE findings."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from gdal_ray.functions import wkb
from gdal_ray.stages import geomops


def test_simplify_never_emits_degenerate_ring():
    """A ring whose vertices all fall within tolerance must NOT collapse to a
    2-point WKB ring — the original ring is preserved instead."""
    s = 0.001
    ring = np.array([[0, 0], [s, 0], [s, s], [0, s], [0, 0]], dtype=np.float64)
    t = pa.table({"wkb": pa.array([wkb.encode_polygon([ring])], pa.binary())})
    out = geomops.simplify_batch(t, tolerance=0.01)
    g = wkb.decode(out["wkb"][0].as_py())
    assert g.kind == wkb.POLYGON
    shell = np.asarray(g.parts[0][0])
    assert len(shell) >= 4
    # still a closed ring with nonzero area (it kept the original vertices)
    assert (shell[0] == shell[-1]).all()
    assert abs(wkb.ring_area(shell)) > 0


def test_line_locate_zero_length_chain_yields_nulls():
    """All-coincident-vertex linestring: emit nulls, don't crash the batch."""
    degenerate = wkb.encode_linestring(
        np.array([[2.0, 3.0], [2.0, 3.0], [2.0, 3.0]]))
    normal = wkb.encode_linestring(np.array([[0.0, 0.0], [10.0, 0.0]]))
    t = pa.table({
        "px": pa.array([5.0, 5.0]), "py": pa.array([1.0, 1.0]),
        "wkb": pa.array([degenerate, normal], pa.binary()),
    })
    out = geomops.line_locate_batch(t)
    assert out["edge"][0].as_py() is None
    assert out["frac_e7"][0].as_py() is None
    assert out["dist_e7"][0].as_py() is None
    # the valid row still computes
    assert out["edge"][1].as_py() == 0
    assert out["frac_e7"][1].as_py() == 5_000_000


def test_mvt_negative_feature_id_raises():
    from gdal_ray.sources import mvt

    with pytest.raises(ValueError, match="non-negative"):
        mvt.encode_point_layer(
            "l", np.array([-1]), np.array([1]), np.array([2]))


def test_dither_ordered_ragged_tiles_fail_loudly(ray_session):
    from gdal_ray.stages import fillpalette

    rows = []
    for i, (w, h) in enumerate([(8, 8), (8, 6)]):  # ragged second tile
        arr = np.zeros((h, w), dtype=np.uint8)
        rows.append({"z": 0, "x": i, "y": 0, "band": 1, "width": w,
                     "height": h, "crs": "EPSG:3857", "nodata": 0.0,
                     "dtype": "uint8", "data": arr.tobytes()})
    tiles = rd.from_arrow(pa.Table.from_pylist(rows))
    with pytest.raises(Exception, match="uniform tile sizes"):
        fillpalette.dither_ordered(tiles, [0, 128, 255]).take_all()


def test_read_table_translates_expression_filter_for_lance():
    """The lance branch forwards filter= as an SQL string (str(Expression)),
    not the raw pyarrow.dataset Expression read_parquet takes."""
    import pyarrow.dataset as pads

    from gdal_ray.sources import io as gio

    captured = {}

    def fake_read_lance(path, columns=None, **kwargs):
        captured.update(kwargs)
        return "SENTINEL"

    orig = (gio.HAVE_LANCE, getattr(gio.rd, "read_lance", None))
    gio.HAVE_LANCE = True
    gio.rd.read_lance = fake_read_lance
    try:
        import os
        import tempfile

        with tempfile.TemporaryDirectory() as d:
            lp = os.path.join(d, "t.lance")
            os.makedirs(lp)
            out = gio.read_table(d, "t", filter=pads.field("p_size") >= 10)
        assert out == "SENTINEL"
        assert isinstance(captured["filter"], str)
        assert "p_size" in captured["filter"]
    finally:
        gio.HAVE_LANCE = orig[0]
        if orig[1] is None:
            del gio.rd.read_lance
        else:
            gio.rd.read_lance = orig[1]
