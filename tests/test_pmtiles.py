"""PMTiles v3 container (gdal_ray.sources.pmtiles, round 5).

Reference parity: ogr/ogrsf_frmts/pmtiles driver; public autotest
fixtures validate the reader against real pmtiles-toolchain archives."""
import glob
import os

import pytest

from gdal_ray.sources import pmtiles as pm

REF = ["/root/reference/autotest/ogr/data/pmtiles",
       "/root/reference/autotest/gdrivers/data/pmtiles"]


class TestTileIds:
    def test_spec_anchors(self):
        assert pm.zxy_to_tileid(0, 0, 0) == 0
        assert sorted(pm.zxy_to_tileid(1, x, y)
                      for x in (0, 1) for y in (0, 1)) == [1, 2, 3, 4]

    def test_roundtrip(self):
        for z, x, y in [(5, 11, 3), (12, 3423, 1763), (20, 0, 1 << 19)]:
            assert pm.tileid_to_zxy(pm.zxy_to_tileid(z, x, y)) == (z, x, y)

    def test_out_of_range(self):
        with pytest.raises(ValueError):
            pm.zxy_to_tileid(2, 4, 0)


class TestDirectoryCodec:
    def test_roundtrip_with_continuations(self):
        entries = [(1, 0, 10, 1), (2, 10, 20, 1), (7, 30, 5, 3),
                   (50, 0, 10, 1)]  # last one re-points at slot 0 (dedup)
        buf = pm.serialize_directory(entries)
        assert pm.deserialize_directory(buf) == entries


class TestWriter:
    def test_roundtrip_and_dedup(self, tmp_path):
        p = str(tmp_path / "t.pmtiles")
        tiles = [(2, x, y, bytes([x * 4 + y]) * 40)
                 for x in range(4) for y in range(4)]
        tiles.append((3, 0, 0, bytes([7]) * 40))  # duplicate payload
        info = pm.write_pmtiles(p, tiles, tile_type=pm.TILETYPE_PNG,
                                metadata={"name": "t"})
        assert info["n_entries"] == 17 and info["n_contents"] == 16
        assert pm.read_metadata(p) == {"name": "t"}
        assert pm.get_tile(p, 2, 3, 3) == bytes([15]) * 40
        assert pm.get_tile(p, 9, 0, 0) is None

    def test_gzip_tiles(self, tmp_path):
        p = str(tmp_path / "z.pmtiles")
        pm.write_pmtiles(p, [(0, 0, 0, b"payload" * 100)],
                         tile_compression=pm.COMPRESSION_GZIP)
        assert pm.get_tile(p, 0, 0, 0) == b"payload" * 100

    def test_ray_read(self, ray_session, tmp_path):
        p = str(tmp_path / "r.pmtiles")
        tiles = [(1, x, y, bytes([x, y]) * 30) for x in (0, 1)
                 for y in (0, 1)]
        pm.write_pmtiles(p, tiles)
        df = pm.read_tiles(p).to_pandas()
        assert len(df) == 4
        got = {(r.z, r.x, r.y): r.data for r in df.itertuples()}
        assert got[(1, 1, 0)] == bytes([1, 0]) * 30


@pytest.mark.skipif(not os.path.isdir(REF[0]),
                    reason="reference fixtures not present")
class TestReferenceFixtures:
    def test_all_archives_open(self):
        n = 0
        for d in REF:
            for p in sorted(glob.glob(f"{d}/*.pmtiles")):
                h = pm.read_header(p)
                ents = pm.read_entries(p)
                assert ents, p
                t0 = pm.tileid_to_zxy(ents[0][0])
                assert pm.get_tile(p, *t0) is not None
                n += 1
        assert n >= 10

    def test_leaf_directory_equivalence(self):
        a = f"{REF[0]}/poly.pmtiles"
        b = f"{REF[0]}/poly_with_leaf_dir.pmtiles"
        ea = {(t, r) for t, _o, _l, r in pm.read_entries(a)}
        eb = {(t, r) for t, _o, _l, r in pm.read_entries(b)}
        assert {t for t, _ in ea} == {t for t, _ in eb}

    def test_mvt_payload_decodes(self):
        from gdal_ray.sources import mvt

        t = pm.get_tile(f"{REF[0]}/poly.pmtiles", 0, 0, 0)
        (layer,) = mvt.parse_tile(t)
        assert layer["features"]

    def test_run_length(self):
        p = f"{REF[0]}/run_length_max.pmtiles"
        ents = pm.read_entries(p)
        assert any(r > 1 for _t, _o, _l, r in ents)
        # every addressed tile in a run resolves to the same payload
        tid, off, ln, run = max(ents, key=lambda e: e[3])
        z, x, y = pm.tileid_to_zxy(tid)
        d0 = pm.get_tile(p, z, x, y)
        z2, x2, y2 = pm.tileid_to_zxy(tid + min(run - 1, 5))
        assert pm.get_tile(p, z2, x2, y2) == d0
