"""Property-based tests (hypothesis) — round-trip and invariance laws.

Mirrors the reference's property-style coverage (SURVEY §5: round-trips like
rasterize(polygonize(X)) == X for categorical rasters, WKB codec laws).
"""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from gdal_ray.functions import geo, pip, wkb
from gdal_ray.stages.polygonize import label_tile
from gdal_ray.stages.rasterize import _traverse_line

coords = st.floats(-1e6, 1e6, allow_nan=False, width=64)


@given(st.lists(st.tuples(coords, coords), min_size=1, max_size=50))
@settings(max_examples=50, deadline=None)
def test_wkb_point_roundtrip(pts):
    xs = np.array([p[0] for p in pts])
    ys = np.array([p[1] for p in pts])
    enc = wkb.encode_points(xs, ys)
    x2, y2 = wkb.decode_points(enc)
    assert (xs == x2).all() and (ys == y2).all()


@given(st.lists(st.tuples(st.floats(-100, 100), st.floats(-100, 100)),
                min_size=3, max_size=12), st.floats(-50, 50), st.floats(-50, 50))
@settings(max_examples=50, deadline=None)
def test_pip_translation_invariance(raw, dx, dy):
    """PIP result is invariant under translating polygon AND points."""
    angles = np.sort(np.array([abs(a) % (2 * np.pi) for a, _ in raw]))
    radii = np.array([1 + abs(b) % 5 for _, b in raw])
    ring = np.column_stack([radii * np.cos(angles), radii * np.sin(angles)])
    ring = np.vstack([ring, ring[:1]])
    px = np.linspace(-6, 6, 20)
    py = np.linspace(-6, 6, 20)
    base = pip.points_in_ring(px, py, ring)
    moved = pip.points_in_ring(px + dx, py + dy, ring + [dx, dy])
    assert (base == moved).all()


@given(st.integers(0, (1 << 30) - 1), st.integers(0, (1 << 30) - 1))
@settings(max_examples=200, deadline=None)
def test_morton_roundtrip_prop(x, y):
    c = geo.morton_encode(np.array([x]), np.array([y]))
    x2, y2 = geo.morton_decode(c)
    assert x2[0] == x and y2[0] == y


@given(st.floats(-179.99, 179.99), st.floats(-84.99, 84.99), st.integers(0, 14))
@settings(max_examples=200, deadline=None)
def test_tile_contains_point(lon, lat, z):
    """A point's tile bounds always contain the point (in mercator space)."""
    tx, ty = geo.lonlat_to_tile(np.array([lon]), np.array([lat]), z)
    minx, miny, maxx, maxy = geo.tile_bounds_mercator(z, tx, ty)
    mx, my = geo.lonlat_to_mercator(np.array([lon]), np.array([lat]))
    assert minx[0] - 1e-6 <= mx[0] <= maxx[0] + 1e-6
    assert miny[0] - 1e-6 <= my[0] <= maxy[0] + 1e-6


@given(st.floats(-50, 50), st.floats(-50, 50), st.floats(-50, 50), st.floats(-50, 50))
@settings(max_examples=100, deadline=None)
def test_line_traversal_connected(x0, y0, x1, y1):
    """Traversed pixels form a connected path from start pixel toward the
    endpoint pixel (8-connected steps)."""
    px = _traverse_line(x0, y0, x1, y1)
    assert px[0] == (int(np.floor(x0)), int(np.floor(y0)))
    for (a, b), (c, d) in zip(px, px[1:]):
        assert max(abs(a - c), abs(b - d)) == 1


@given(st.integers(0, 2**31 - 1))
@settings(max_examples=100, deadline=None)
def test_ccl_labels_partition_valid_pixels(seed):
    rng = np.random.default_rng(seed)
    arr = rng.integers(0, 3, (16, 16)).astype(np.uint8)
    labels, n = label_tile(arr, 0)
    valid = arr != 0
    assert ((labels >= 0) == valid).all()
    if n:
        # labels are compact 0..n-1
        u = np.unique(labels[valid])
        assert u.min() == 0 and u.max() == n - 1 and len(u) == n
        # each component has a single value
        for lbl in u:
            assert len(np.unique(arr[labels == lbl])) == 1


def test_ivf_topk_probe_tradeoff():
    """IVF ANN: full probe == brute exact; partial probe returns a subset-
    quality result with nonzero recall that grows with nprobe."""
    import numpy as np
    import ray.data as rd

    from gdal_ray.sources.io import read_table
    from gdal_ray.stages import sim

    sf = "/root/testdata/sf0.01"
    import pyarrow.parquet as pq

    emb = pq.read_table(f"{sf}/embeddings.parquet", columns=["vec_id", "embedding"],
                        filters=[("vec_id", "=", 0)])
    q0 = np.asarray(emb["embedding"].to_pylist()[0])
    ds = read_table(sf, "embeddings", columns=["vec_id", "embedding"])
    brute = sim.cosine_topk(ds, np.array([q0]), [0], k=10).to_pandas()
    truth = set(brute["vec_id"])
    full = sim.ivf_topk(ds, np.array([q0]), [0], k=10, n_centroids=16, nprobe=16).to_pandas()
    assert set(full["vec_id"]) == truth  # exhaustive probe == exact
    r4 = len(set(sim.ivf_topk(ds, np.array([q0]), [0], k=10, n_centroids=16,
                              nprobe=4).to_pandas()["vec_id"]) & truth)
    r12 = len(set(sim.ivf_topk(ds, np.array([q0]), [0], k=10, n_centroids=16,
                               nprobe=12).to_pandas()["vec_id"]) & truth)
    assert 0 < r4 <= r12 <= 10


def test_hll_estimate_accuracy_and_merge_invariance(ray_session):
    """HLL: estimate within the ~13% (1.04/sqrt(64)) band on known
    cardinalities, and batch-split layout does not change the result
    (register max-merge is associative/commutative)."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from gdal_ray.stages import sim

    for true_n in (150, 2000):
        keys = np.repeat(np.arange(true_n, dtype=np.int64), 3)
        tbl = pa.table({"k": pa.array(keys)})
        one = sim.hll_estimate(rd.from_arrow(tbl), "k").take_all()[0]
        est = one["est_x1000"] / 1000.0
        assert abs(est - true_n) / true_n < 0.35  # 64 registers: sigma ~13%
        many = sim.hll_estimate(
            rd.from_arrow(tbl).repartition(7), "k").take_all()[0]
        assert many == one


def test_count_min_never_undercounts(ray_session):
    """CMS property: estimate >= true count for every queried word, exact on
    a collision-free toy vocab; merge across repartitions is invariant."""
    import pyarrow as pa
    import ray.data as rd

    from gdal_ray.stages import sim

    texts = ["alpha beta beta", "gamma alpha", "alpha"] * 5
    true = {"alpha": 15, "beta": 10, "gamma": 5, "absent": 0}
    ds = rd.from_arrow(pa.table({"text": pa.array(texts)}))
    one = {r["word"]: r["est"]
           for r in sim.count_min_estimate(ds, list(true)).take_all()}
    for w, c in true.items():
        assert one[w] >= c
    many = {r["word"]: r["est"]
            for r in sim.count_min_estimate(ds.repartition(5), list(true)).take_all()}
    assert many == one


def test_hll_window_matches_unwindowed_on_single_window(ray_session):
    """A stream confined to one window reproduces the plain HLL estimate."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from gdal_ray.stages import sim

    n = 500
    ts = pa.array(np.full(n, 1_700_000_000_000_000, dtype=np.int64),
                  pa.timestamp("us"))
    tbl = pa.table({"user_id": pa.array(np.arange(n) % 77), "ts": ts})
    win = sim.hll_window_estimate(rd.from_arrow(tbl)).take_all()
    assert len(win) == 1
    plain = sim.hll_estimate(rd.from_arrow(tbl), "user_id").take_all()[0]
    assert win[0]["est_x1000"] == plain["est_x1000"]
    assert win[0]["n_registers"] == plain["n_registers"]


@given(st.lists(st.text(alphabet="ab ", min_size=0, max_size=60),
                min_size=1, max_size=12))
@settings(max_examples=25, deadline=None)
def test_duplicated_spans_matches_brute(texts):
    """duplicated_spans == brute dict-of-grams + interval merge on random
    low-alphabet corpora (low alphabet forces heavy duplication)."""
    import collections

    import pyarrow as pa
    import ray.data as rd

    from gdal_ray.stages import dedup

    k = 16
    t = pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                  "text": pa.array(texts)})
    got = sorted((r["doc_id"], r["span_start"], r["span_len"]) for r in
                 dedup.duplicated_spans(rd.from_arrow(t)).take_all())
    # brute
    grams = collections.Counter()
    for s in texts:
        b = s.encode()
        for p in range(len(b) - k + 1):
            grams[b[p:p + k]] += 1
    exp = []
    for i, s in enumerate(texts):
        b = s.encode()
        pos = [p for p in range(len(b) - k + 1) if grams[b[p:p + k]] > 1]
        start = end = None
        for p in pos:
            if start is None:
                start, end = p, p + k
            elif p <= end:
                end = p + k
            else:
                exp.append((i, start, end - start))
                start, end = p, p + k
        if start is not None:
            exp.append((i, start, end - start))
    assert got == sorted(exp)


@given(st.lists(st.integers(0, 6), min_size=2, max_size=60),
       st.lists(st.integers(-500, 500), min_size=2, max_size=60))
@settings(max_examples=25, deadline=None)
def test_window_frames_matches_pandas(users, vals):
    """window_frames == pandas groupby-apply on random keys/values."""
    import pandas as pd
    import ray.data as rd

    from gdal_ray.stages import events

    n = min(len(users), len(vals))
    df = pd.DataFrame({
        "event_id": np.arange(n, dtype=np.int64),
        "user_id": np.array(users[:n], dtype=np.int64),
        "ts": pd.to_datetime(np.arange(n) % 7, unit="s"),  # deliberate ties
        "value": np.array(vals[:n], dtype=np.float64) / 4.0,
    })
    got = events.window_frames(rd.from_pandas(df)).to_pandas() \
        .set_index("event_id").sort_index()
    cents = np.floor(df["value"].to_numpy() * 100.0 + 0.5).astype(np.int64)
    df = df.assign(cents=cents)
    for _, g in df.groupby("user_id"):
        g = g.sort_values(["ts", "event_id"], kind="stable")
        c = g["cents"].to_numpy()
        m = len(g)
        q, rem = divmod(m, 4)
        for r, eid in enumerate(g["event_id"].to_numpy()):
            row = got.loc[eid]
            big = rem * (q + 1)
            tile = (r // (q + 1) if r < big else rem + (r - big) // max(q, 1)) + 1
            assert row["ntile"] == tile
            assert row["first_x100"] == c[0] and row["last_x100"] == c[-1]
            lo = max(0, r - 2)
            assert row["mov_sum_x100"] == c[lo:r + 1].sum()
            assert row["mov_cnt"] == r + 1 - lo


# -- round 3: codec + kernel property tests ----------------------------------


@given(st.lists(st.integers(0, 255), min_size=0, max_size=400),
       st.sampled_from([8000, 16000, 44100]))
@settings(max_examples=60, deadline=None)
def test_wav_roundtrip_u8_property(vals, rate):
    from gdal_ray.sources.wav import decode_wav, encode_wav

    arr = np.array(vals, dtype=np.uint8)
    back, r = decode_wav(encode_wav(arr, rate=rate))
    assert r == rate and (back == arr).all()


@given(st.integers(1, 6), st.integers(1, 20), st.integers(1, 20),
       st.integers(0, 2**32 - 1))
@settings(max_examples=60, deadline=None)
def test_avi_roundtrip_property(n, h, w, seed):
    from gdal_ray.sources.avi import decode_avi, encode_avi

    rng = np.random.default_rng(seed)
    frames = rng.integers(0, 256, (n, h, w)).astype(np.uint8)
    back, _fps = decode_avi(encode_avi(frames))
    assert (back == frames).all()


@given(st.lists(st.text(max_size=120), min_size=0, max_size=60))
@settings(max_examples=80, deadline=None)
def test_fnv1a_matches_scalar_property(strs):
    """Vectorized FNV-1a equals the scalar definition for arbitrary unicode
    (exercises the int32 gather-matrix, mid-size, and alive-set paths)."""
    import pyarrow as pa

    from gdal_ray.functions.arrowbuf import fnv1a_u64

    def ref(s: str) -> int:
        hsh = 0xCBF29CE484222325
        for byt in s.encode():
            hsh = ((hsh ^ byt) * 0x100000001B3) & 0xFFFFFFFFFFFFFFFF
        return hsh

    got = fnv1a_u64(pa.array(strs, pa.string()))
    assert [int(v) for v in got] == [ref(s) for s in strs]


def test_adpcm_vectorized_matches_scalar_reference():
    """decode_wav's across-block vectorized ADPCM recurrence must be
    bit-identical to the scalar per-block reference (_ima_decode_block)."""
    import numpy as np

    from gdal_ray.sources.wav import (_ima_decode_block, decode_wav,
                                      encode_wav_adpcm)

    rng = np.random.default_rng(11)
    for spb in (9, 33, 505):
        nblk = int(rng.integers(1, 20))
        sig = rng.integers(-32768, 32768, nblk * spb).astype(np.int16)
        buf = encode_wav_adpcm(sig, samples_per_block=spb)
        fast, _ = decode_wav(buf)
        data = buf[buf.rfind(b"data") + 8:]
        ba = 4 + (spb - 1) // 2
        data = data[:nblk * ba]
        ref = []
        for s in range(0, len(data), ba):
            blk = data[s:s + ba]
            nb = np.frombuffer(blk, np.uint8, offset=4)
            nib = np.empty(2 * len(nb), np.uint8)
            nib[0::2] = nb & 0xF
            nib[1::2] = nb >> 4
            ref.append(_ima_decode_block(blk[:4], nib))
        assert np.array_equal(fast, np.concatenate(ref))


def test_curve_wkt_roundtrip_property():
    """Random curve geometries survive WKB -> WKT -> WKB bitwise (repr
    serialization is shortest-round-trip for float64)."""
    import numpy as np
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from gdal_ray.functions import wkb as wkb_f
    from gdal_ray.functions.wkt import encode_wkt, parse_wkt

    coord = st.floats(allow_nan=False, allow_infinity=False,
                      min_value=-1e6, max_value=1e6)

    @st.composite
    def circularstring(draw):
        n_arcs = draw(st.integers(1, 3))
        pts = [[draw(coord), draw(coord)] for _ in range(2 * n_arcs + 1)]
        return wkb_f.encode_circularstring(np.array(pts))

    @st.composite
    def compound(draw):
        members = []
        last = [draw(coord), draw(coord)]
        for _ in range(draw(st.integers(1, 3))):
            if draw(st.booleans()):
                nxt = [draw(coord), draw(coord)]
                members.append(wkb_f.encode_linestring(np.array([last, nxt])))
                last = nxt
            else:
                mid = [draw(coord), draw(coord)]
                nxt = [draw(coord), draw(coord)]
                members.append(wkb_f.encode_circularstring(
                    np.array([last, mid, nxt])))
                last = nxt
        return wkb_f.encode_compoundcurve(members)

    @given(st.one_of(circularstring(), compound()))
    @settings(max_examples=60, deadline=None)
    def check(blob):
        assert parse_wkt(encode_wkt(blob)) == blob

    check()


def test_g711_codec_consistency():
    """G.711 mu-law/A-law: encode(decode(b)) == b over all 256 codes (the
    canonical consistency check; mu-law negative zero 0x7F re-encodes as
    +0, the standard exception), ITU anchor values, container roundtrip
    with bounded companding error."""
    import numpy as np

    from gdal_ray.sources import wav

    b = np.arange(256, dtype=np.uint8)
    md = wav.mulaw_decode(b)
    re = wav.mulaw_encode(md)
    keep = b != 0x7F
    assert np.array_equal(re[keep], b[keep])
    assert np.array_equal(wav.alaw_encode(wav.alaw_decode(b)), b)
    assert wav.mulaw_decode(np.array([0xFF], np.uint8))[0] == 0
    assert wav.mulaw_decode(np.array([0x00], np.uint8))[0] == -32124
    rng = np.random.default_rng(3)
    s = rng.integers(-32000, 32000, 5000).astype(np.int16)
    for law, bound in (("mulaw", 1024), ("alaw", 1100)):
        out, rate = wav.decode_wav(wav.encode_wav_g711(s, 8000, law))
        assert rate == 8000 and len(out) == len(s)
        assert np.abs(out.astype(np.int32) - s.astype(np.int32)).max() <= bound
        # quantized values are an encode fixed point
        out2, _ = wav.decode_wav(wav.encode_wav_g711(out, 8000, law))
        assert np.array_equal(out, out2)
