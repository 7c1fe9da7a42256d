"""General overlay construction vs closed-form fixtures (reference:
ogr/ogrlayer.cpp Intersection/Union/SymDifference/Erase overlay output)."""

import numpy as np
import pytest

from gdal_ray.functions import wkb
from gdal_ray.stages import overlay


def rect(x0, y0, x1, y1):
    ring = np.array([[x0, y0], [x1, y0], [x1, y1], [x0, y1], [x0, y0]], float)
    return wkb.decode(wkb.encode_polygon([ring]))


def lshape():
    # L: 0..4 x 0..4 minus 2..4 x 2..4  (area 12)
    ring = np.array(
        [[0, 0], [4, 0], [4, 2], [2, 2], [2, 4], [0, 4], [0, 0]], float)
    return wkb.decode(wkb.encode_polygon([ring]))


def area(g):
    return overlay.geom_area(g)


def test_rect_rect_intersection_exact():
    g = overlay.boolean_op(rect(0, 0, 4, 4), rect(2, 1, 7, 3), "intersection")
    assert area(g) == pytest.approx(2 * 2, abs=1e-9)
    xs = np.asarray(g.shells_and_holes()[0][0])
    assert xs[:, 0].min() == pytest.approx(2) and xs[:, 0].max() == pytest.approx(4)
    assert xs[:, 1].min() == pytest.approx(1) and xs[:, 1].max() == pytest.approx(3)


def test_rect_rect_union_symdiff_difference():
    a, b = rect(0, 0, 4, 4), rect(2, 2, 6, 6)
    inter = 2 * 2
    assert area(overlay.boolean_op(a, b, "union")) == pytest.approx(16 + 16 - inter)
    assert area(overlay.boolean_op(a, b, "symdifference")) == pytest.approx(
        16 + 16 - 2 * inter)
    assert area(overlay.boolean_op(a, b, "difference")) == pytest.approx(16 - inter)


def test_concave_intersection():
    # L-shape vs rect covering its notch area
    g = overlay.boolean_op(lshape(), rect(1, 1, 3, 3), "intersection")
    # inside L: [1,3]x[1,2] strip (2) + [1,2]x[2,3] (1) = 3
    assert area(g) == pytest.approx(3.0, abs=1e-9)


def test_concave_concave_union():
    a = lshape()
    # second L rotated into the notch partially
    ring = np.array([[2.5, 2.5], [5, 2.5], [5, 5], [2.5, 5], [2.5, 2.5]], float)
    b = wkb.decode(wkb.encode_polygon([ring]))
    # disjoint-interiors (notch is exactly the hole region of a): a area 12,
    # b area 6.25, overlap 0 -> union 18.25
    assert area(overlay.boolean_op(a, b, "union")) == pytest.approx(12 + 6.25)


def test_difference_creates_hole():
    g = overlay.boolean_op(rect(0, 0, 10, 10), rect(3, 3, 6, 6), "difference")
    assert area(g) == pytest.approx(100 - 9, abs=1e-9)
    polys = g.shells_and_holes()
    assert len(polys) == 1 and len(polys[0]) == 2  # shell + hole


def test_difference_splits_into_two():
    # vertical band cuts the subject into two parts
    g = overlay.boolean_op(rect(0, 0, 10, 4), rect(4, -1, 6, 5), "difference")
    assert area(g) == pytest.approx(40 - 8, abs=1e-9)
    assert len(g.shells_and_holes()) == 2


def test_shared_edge_intersection():
    # degenerate: B shares A's right edge; intersection is the overlap strip
    g = overlay.boolean_op(rect(0, 0, 4, 4), rect(2, 0, 4, 4), "intersection")
    assert area(g) == pytest.approx(8.0, abs=1e-9)


def test_shared_edge_union():
    g = overlay.boolean_op(rect(0, 0, 4, 4), rect(4, 0, 8, 4), "union")
    assert area(g) == pytest.approx(32.0, abs=1e-9)


def test_contained_intersection_is_inner():
    g = overlay.boolean_op(rect(0, 0, 10, 10), rect(2, 2, 5, 5), "intersection")
    assert area(g) == pytest.approx(9.0, abs=1e-9)


def test_disjoint_ops():
    a, b = rect(0, 0, 1, 1), rect(5, 5, 6, 6)
    assert overlay.boolean_op(a, b, "intersection") is None
    assert area(overlay.boolean_op(a, b, "union")) == pytest.approx(2.0)
    assert area(overlay.boolean_op(a, b, "difference")) == pytest.approx(1.0)


def test_hole_subject_intersection():
    # subject with hole: donut ∩ rect over the hole counts only the ring part
    ring = np.array([[0, 0], [8, 0], [8, 8], [0, 8], [0, 0]], float)
    hole = np.array([[2, 2], [6, 2], [6, 6], [2, 6], [2, 2]], float)
    donut = wkb.decode(wkb.encode_polygon([ring, hole]))
    g = overlay.boolean_op(donut, rect(1, 1, 7, 7), "intersection")
    # rect 6x6 = 36 minus hole 16 -> 20
    assert area(g) == pytest.approx(20.0, abs=1e-9)


def test_erase_fold_multiple():
    g = overlay.erase_fold(rect(0, 0, 10, 10),
                           [rect(-1, -1, 2, 2), rect(8, 8, 12, 12), rect(4, 4, 5, 5)])
    assert area(g) == pytest.approx(100 - 4 - 4 - 1, abs=1e-9)


def test_identity_composition():
    # Identity(A; B) = (A ∩ B) + (A − B): areas partition A
    a, b = lshape(), rect(1, 1, 3, 3)
    inter = overlay.boolean_op(a, b, "intersection")
    diff = overlay.boolean_op(a, b, "difference")
    assert area(inter) + area(diff) == pytest.approx(12.0, abs=1e-9)


def test_polygon_predicates():
    from gdal_ray.functions import pip

    a = rect(0, 0, 4, 4)
    assert pip.polygon_predicate(a, rect(0, 0, 4, 4)) == "equals"
    assert pip.polygon_predicate(a, rect(1, 1, 2, 2)) == "contains"
    assert pip.polygon_predicate(rect(1, 1, 2, 2), a) == "within"
    assert pip.polygon_predicate(a, rect(2, 2, 6, 6)) == "overlaps"
    assert pip.polygon_predicate(a, rect(4, 0, 8, 4)) == "touches"
    assert pip.polygon_predicate(a, rect(4, 4, 8, 8)) == "touches"  # corner
    assert pip.polygon_predicate(a, rect(9, 9, 10, 10)) is None


def test_line_crosses_polygon():
    from gdal_ray.functions import pip, wkb as w
    import numpy as np

    poly = rect(0, 0, 4, 4)
    crossing = w.decode(w.encode_linestring(np.array([[-1.0, 2.0], [5.0, 2.0]])))
    inside = w.decode(w.encode_linestring(np.array([[1.0, 1.0], [3.0, 3.0]])))
    outside = w.decode(w.encode_linestring(np.array([[6.0, 6.0], [8.0, 8.0]])))
    assert pip.line_crosses_polygon(crossing, poly)
    assert not pip.line_crosses_polygon(inside, poly)
    assert not pip.line_crosses_polygon(outside, poly)
