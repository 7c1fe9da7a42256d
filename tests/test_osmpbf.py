"""OSM PBF source (gdal_ray.sources.osmpbf, round 5).

Reference parity: ogr/ogrsf_frmts/osm driver; the public autotest
fixtures (ogr/data/osm/*.pbf) validate the reader against files the real
osmium/libosmpbf toolchain produced, with expectations pinned from
autotest/ogr/ogr_osm.py."""
import os

import numpy as np
import pytest

from gdal_ray.sources import osmpbf

REF = "/root/reference/autotest/ogr/data/osm"


def _decode_all(path):
    nodes = {"id": [], "lon": [], "lat": [], "tags": []}
    ways = {"id": [], "refs": [], "tags": []}
    rels = {"id": []}
    for b in osmpbf.scan_blobs(path):
        if b["type"] != "OSMData":
            continue
        with open(path, "rb") as f:
            f.seek(b["offset"])
            raw = f.read(b["nbytes"])
        n, w, r = osmpbf.decode_block(raw)
        for k in nodes:
            nodes[k].extend(n[k])
        for k in ways:
            ways[k].extend(w[k])
        rels["id"].extend(r["id"])
    return nodes, ways, rels


class TestWriterRoundtrip:
    def test_nodes_ways(self, tmp_path):
        p = str(tmp_path / "t.osm.pbf")
        nodes = [(i, -120 + i * 0.5, 30 + (i % 7) * 0.25,
                  {"k": f"v{i}"} if i % 3 == 0 else None)
                 for i in range(1, 51)]
        ways = [(j, list(range(j, j + 4)), {"highway": "x"})
                for j in range(1, 40, 6)]
        osmpbf.write_osm_pbf(p, nodes, ways)
        n, w, _r = _decode_all(p)
        assert n["id"] == [x[0] for x in nodes]
        assert np.allclose(n["lon"], [x[1] for x in nodes], atol=1e-7)
        assert np.allclose(n["lat"], [x[2] for x in nodes], atol=1e-7)
        assert n["tags"][2] == "k=v3"  # id 3: tagged
        assert w["refs"][0] == [1, 2, 3, 4]
        assert w["tags"][0] == "highway=x"

    def test_uncompressed(self, tmp_path):
        p = str(tmp_path / "u.osm.pbf")
        osmpbf.write_osm_pbf(p, [(7, 1.5, -2.25, None)], compress=False)
        n, _w, _r = _decode_all(p)
        assert n["id"] == [7]
        assert abs(n["lon"][0] - 1.5) < 1e-7

    def test_negative_deltas(self, tmp_path):
        p = str(tmp_path / "n.osm.pbf")
        nodes = [(100, 10.0, 5.0, None), (50, -10.0, -5.0, None),
                 (75, 0.0, 0.0, None)]
        osmpbf.write_osm_pbf(p, nodes)
        n, _w, _r = _decode_all(p)
        assert n["id"] == [100, 50, 75]
        assert abs(n["lon"][1] + 10.0) < 1e-7


@pytest.mark.skipif(not os.path.isdir(REF),
                    reason="reference fixtures not present")
class TestReferenceFixtures:
    def test_test_pbf_values(self):
        # pinned from autotest/ogr/ogr_osm.py::test_ogr_osm_1
        n, w, r = _decode_all(f"{REF}/test.pbf")
        i3 = n["id"].index(3)
        assert (round(n["lon"][i3], 7), round(n["lat"][i3], 7)) \
            == (3.0, 49.5)
        assert "name=Some interesting point" in n["tags"][i3]
        assert "foo=bar" in n["tags"][i3] and "bar=baz" in n["tags"][i3]
        iw1 = w["id"].index(1)
        assert w["refs"][iw1] == [1, 2]
        assert "highway=motorway" in w["tags"][iw1]
        assert len(r["id"]) == 5

    def test_plain_vs_dense_nodes_agree(self):
        nd, wd, _ = _decode_all(f"{REF}/test_uncompressed_dense_true"
                                f"_nometadata.pbf")
        np_, wp, _ = _decode_all(f"{REF}/test_uncompressed_dense_false.pbf")
        assert sorted(nd["id"]) == sorted(np_["id"])
        za = {i: (round(lo, 7), round(la, 7)) for i, lo, la in
              zip(nd["id"], nd["lon"], nd["lat"])}
        zb = {i: (round(lo, 7), round(la, 7)) for i, lo, la in
              zip(np_["id"], np_["lon"], np_["lat"])}
        assert za == zb

    def test_base64(self):
        n, w, _ = _decode_all(f"{REF}/base-64.osm.pbf")
        assert len(n["id"]) == 1751 and len(w["id"]) == 226
        assert all(-180 <= x <= 180 for x in n["lon"])
        assert all(-90 <= y <= 90 for y in n["lat"])


class TestRaySurface:
    def test_way_assembly(self, ray_session, tmp_path):
        from gdal_ray.functions import wkb as wf

        p = str(tmp_path / "w.osm.pbf")
        nodes = [(i, float(i), float(i % 10), None) for i in range(1, 30)]
        ways = [(1, [1, 2, 3], None),
                (2, [5, 999, 6], None),    # missing ref skipped, way kept
                (3, [999, 998], None)]     # fully unresolvable: dropped
        osmpbf.write_osm_pbf(p, nodes, ways)
        nd = osmpbf.read_osm_nodes(p)
        wd = osmpbf.read_osm_ways(p)
        out = osmpbf.assemble_way_lines(wd, nd).to_pandas()
        got = out.set_index("id")
        assert set(got.index) == {1, 2}
        g1 = wf.decode(got.loc[1, "wkb"])
        assert len(g1.parts[0]) == 3
        g2 = wf.decode(got.loc[2, "wkb"])
        assert len(g2.parts[0]) == 2  # 999 skipped
