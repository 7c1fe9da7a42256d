"""General overlay construction vs closed-form fixtures (reference:
ogr/ogrlayer.cpp Intersection/Union/SymDifference/Erase overlay output)."""

import numpy as np
import pyarrow as pa
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


def test_randomized_rect_boolean_areas():
    """300 random axis-aligned rect pairs: every op's constructed geometry
    area matches the closed-form interval arithmetic."""
    rng = np.random.default_rng(20260817)
    for _ in range(300):
        ax0, ay0 = rng.integers(0, 50, 2)
        aw, ah = rng.integers(1, 30, 2)
        bx0, by0 = rng.integers(0, 50, 2)
        bw, bh = rng.integers(1, 30, 2)
        a = rect(ax0, ay0, ax0 + aw, ay0 + ah)
        b = rect(bx0, by0, bx0 + bw, by0 + bh)
        iw = max(0, min(ax0 + aw, bx0 + bw) - max(ax0, bx0))
        ih = max(0, min(ay0 + ah, by0 + bh) - max(ay0, by0))
        inter = iw * ih
        aa, ab = aw * ah, bw * bh
        assert area(overlay.boolean_op(a, b, "intersection")) == pytest.approx(
            inter, abs=1e-9)
        assert area(overlay.boolean_op(a, b, "union")) == pytest.approx(
            aa + ab - inter, abs=1e-9)
        assert area(overlay.boolean_op(a, b, "difference")) == pytest.approx(
            aa - inter, abs=1e-9)
        assert area(overlay.boolean_op(a, b, "symdifference")) == pytest.approx(
            aa + ab - 2 * inter, abs=1e-9)


def test_randomized_union_fold_vs_cell_oracle():
    """40 random groups of overlapping integer rects: the dissolve union fold
    equals the distinct-covered-cell count."""
    rng = np.random.default_rng(77)
    for _ in range(40):
        n = int(rng.integers(2, 12))
        acc = None
        covered = set()
        for _ in range(n):
            x0, y0 = rng.integers(0, 25, 2)
            w, h = rng.integers(1, 10, 2)
            g = rect(x0, y0, x0 + w, y0 + h)
            covered.update((x, y) for x in range(x0, x0 + w)
                           for y in range(y0, y0 + h))
            if acc is None:
                acc = g
            else:
                u = overlay.boolean_op(acc, g, "union")
                assert u is not None
                acc = u
        assert area(acc) == pytest.approx(len(covered), abs=1e-9)


def test_randomized_concave_intersection_vs_pixel_oracle():
    """Concave (L-shaped) subjects vs random rects: constructed intersection
    area equals a fine-grid pixel-count oracle."""
    rng = np.random.default_rng(99)
    for _ in range(25):
        # random L: outer rect minus a corner notch
        x0, y0 = rng.integers(0, 10, 2)
        w, h = rng.integers(6, 16, 2)
        nw, nh = rng.integers(2, max(3, w // 2), 1)[0], rng.integers(2, max(3, h // 2), 1)[0]
        ring = np.array([
            [x0, y0], [x0 + w, y0], [x0 + w, y0 + h - nh], [x0 + w - nw, y0 + h - nh],
            [x0 + w - nw, y0 + h], [x0, y0 + h], [x0, y0]], float)
        lpoly = wkb.decode(wkb.encode_polygon([ring]))
        bx0, by0 = rng.integers(0, 20, 2)
        bw, bh = rng.integers(2, 12, 2)
        b = rect(bx0, by0, bx0 + bw, by0 + bh)
        got = area(overlay.boolean_op(lpoly, b, "intersection"))
        # integer-grid oracle: count unit cells inside both
        cnt = 0
        for cx in range(bx0, bx0 + bw):
            for cy in range(by0, by0 + bh):
                inside_l = (x0 <= cx < x0 + w and y0 <= cy < y0 + h
                            and not (cx >= x0 + w - nw and cy >= y0 + h - nh))
                if inside_l:
                    cnt += 1
        assert got == pytest.approx(cnt, abs=1e-9)


def test_overlay_translation_invariance_webmercator_magnitude():
    """Epsilon policy scales with coordinate magnitude: overlays remain
    structurally exact (inclusion-exclusion closes) at webmercator-meter
    offsets, where absolute 1e-9/1e-14 thresholds would misclassify."""
    def poly(coords, off):
        r = np.array([(x + off, y + off) for x, y in coords + [coords[0]]])
        return wkb.Geom(wkb.POLYGON, [[r]])

    A = [(0.0, 0.0), (4.0, 0.0), (4.0, 3.0), (1.5, 4.5), (0.0, 3.0)]
    B = [(2.0, 1.0), (6.0, 1.0), (6.0, 5.0), (2.0, 5.0)]
    for off in (0.0, 1e6, 2.0e7):
        ga, gb = poly(A, off), poly(B, off)
        inter = overlay.geom_area(overlay.boolean_op(ga, gb, "intersection"))
        union = overlay.geom_area(overlay.boolean_op(ga, gb, "union"))
        diff = overlay.geom_area(overlay.boolean_op(ga, gb, "difference"))
        sym = overlay.geom_area(overlay.boolean_op(ga, gb, "symdifference"))
        area_a = overlay.geom_area(ga)
        area_b = overlay.geom_area(gb)
        tol = max(1e-9, off * off * 1e-14)
        assert abs(inter + union - (area_a + area_b)) < tol
        assert abs(diff + inter - area_a) < tol
        assert abs(sym - (union - inter)) < tol

    # diagonal shared edge (collinear-overlap path) at magnitude
    T1 = [(0.0, 0.0), (4.0, 0.0), (4.0, 4.0)]
    T2 = [(0.0, 0.0), (4.0, 4.0), (0.0, 4.0)]
    for off in (0.0, 2.0e7):
        ga, gb = poly(T1, off), poly(T2, off)
        assert abs(overlay.geom_area(overlay.boolean_op(ga, gb, "union")) - 16.0) < 1e-6
        g = overlay.boolean_op(ga, gb, "intersection")
        assert overlay.geom_area(g) < 1e-6


def test_check_coverage(ray_session):
    """Overlap-class coverage validation: touching rects are clean,
    overlapping ones report the exact pair area on BOTH participants."""
    import ray.data as rd

    from gdal_ray.functions import wkb as wkb_f
    from gdal_ray.stages import layeralg

    def rect(x0, y0, x1, y1):
        ring = np.array([[x0, y0], [x1, y0], [x1, y1], [x0, y1], [x0, y0]],
                        dtype=np.float64)
        return wkb_f.encode_polygon([ring])

    layer = pa.table({
        "fid": pa.array([1, 2, 3, 4, 5], pa.int64()),
        "wkb": pa.array([
            rect(0, 0, 2, 2),       # overlaps 2 (area 1) and 3 (area 0.25)
            rect(1, 1, 3, 3),       # overlaps 1, 3
            rect(1.5, 1.5, 4, 4),   # overlaps 1 (0.25), 2 (1.5*1.5=2.25)
            rect(10, 10, 12, 12),   # touches 5 only -> clean
            rect(12, 10, 14, 12),   # touches 4 -> clean
        ], pa.binary()),
    })
    out = layeralg.check_coverage(rd.from_arrow(layer), res=2,
                                  area_scale=100).to_pandas()
    got = out.set_index("id").sort_index()
    assert got.loc[1, "n_overlaps"] == 2
    assert got.loc[1, "overlap_area"] == 100 + 25
    assert got.loc[2, "n_overlaps"] == 2
    assert got.loc[2, "overlap_area"] == 100 + 225
    assert got.loc[3, "n_overlaps"] == 2
    assert got.loc[3, "overlap_area"] == 25 + 225
    assert got.loc[4, "n_overlaps"] == 0 and got.loc[4, "overlap_area"] == 0
    assert got.loc[5, "n_overlaps"] == 0 and got.loc[5, "overlap_area"] == 0


def _rect_wkb(x0, y0, x1, y1):
    from gdal_ray.functions import wkb as wkb_f
    ring = np.array([[x0, y0], [x1, y0], [x1, y1], [x0, y1], [x0, y0]],
                    dtype=np.float64)
    return wkb_f.encode_polygon([ring])


def test_clean_coverage_chain(ray_session):
    """Chain of equal rects overlapping successors by 2: tie -> lower id
    keeps, so every later rect loses its left strip; result is a valid
    coverage with conserved union."""
    import ray.data as rd

    from gdal_ray.stages import layeralg

    n = 6
    layer = pa.table({
        "fid": pa.array(np.arange(n, dtype=np.int64)),
        "wkb": pa.array([_rect_wkb(10 * i, 0, 10 * i + 12, 10)
                         for i in range(n)], pa.binary()),
    })
    out = layeralg.clean_coverage(rd.from_arrow(layer), res=2).to_pandas()
    got = out.set_index("id").sort_index()
    assert got.loc[0, "clean_area"] == pytest.approx(120.0)
    for i in range(1, n):
        assert got.loc[i, "clean_area"] == pytest.approx(100.0), i
    # cleaned layer is a valid coverage (overlap class)
    cleaned = pa.table({
        "fid": pa.array(got.index.to_numpy()),
        "wkb": pa.array(list(got["wkb"]), pa.binary()),
    })
    chk = layeralg.check_coverage(rd.from_arrow(cleaned), res=2,
                                  area_scale=10000).to_pandas()
    assert (chk["n_overlaps"] == 0).all()
    # union preserved: sampled points covered before iff after
    from gdal_ray.functions import wkb as wkb_f, pip
    rng = np.random.default_rng(2)
    pts = np.c_[rng.uniform(-2, 10 * n + 14, 400), rng.uniform(-2, 12, 400)]
    before = [wkb_f.decode(w) for w in layer["wkb"].to_pylist()]
    after = [wkb_f.decode(w) for w in got["wkb"] if w is not None]

    def covered(geoms, x, y):
        return any(bool(pip.points_in_geom(np.array([x]), np.array([y]),
                                           g)[0]) for g in geoms)

    for x, y in pts:
        # skip points within 1e-6 of any edge (boundary convention)
        if (abs(x % 10) < 0.01 or abs(x % 10 - 2) < 0.01
                or y < 0.01 or y > 9.99):
            continue
        assert covered(before, x, y) == covered(after, x, y), (x, y)


def test_clean_coverage_swallowed(ray_session):
    """A feature entirely inside a bigger one: max-area -> it loses all
    its area and emits NULL geometry."""
    import ray.data as rd

    from gdal_ray.stages import layeralg

    layer = pa.table({
        "fid": pa.array([1, 2], pa.int64()),
        "wkb": pa.array([_rect_wkb(0, 0, 10, 10), _rect_wkb(2, 2, 4, 4)],
                        pa.binary()),
    })
    out = layeralg.clean_coverage(rd.from_arrow(layer),
                                  res=2).to_pandas().set_index("id")
    assert out.loc[1, "clean_area"] == pytest.approx(100.0)
    assert out.loc[2, "clean_area"] == 0.0
    assert out.loc[2, "wkb"] is None
    # min-area strategy: the small one keeps, the big one gets a hole
    out2 = layeralg.clean_coverage(rd.from_arrow(layer), res=2,
                                   merge_strategy="min-area"
                                   ).to_pandas().set_index("id")
    assert out2.loc[2, "clean_area"] == pytest.approx(4.0)
    assert out2.loc[1, "clean_area"] == pytest.approx(96.0)
