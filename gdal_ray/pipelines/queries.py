"""Driver-contract query implementations (one per SURVEY §2 operator family).

Each function takes ``sf_dir`` and returns a Ray Dataset / pyarrow Table whose
columns match the DuckDB oracle in ``__ray_entry__.oracle_sql`` exactly (the
driver sorts columns by name and hashes values).

Geometry derivation policy: the TPC-H-ish driver tables carry no coordinates,
so lon/lat (docs) and zone rectangles (from part keys) are exact 0.01-grid
integer arithmetic over the int64 keys — recomputable in ANSI SQL, bit-equal
in float64 (see geo.derive_lonlat / synthetic.zone_rects_from_keys).

Numeric policy: aggregate outputs are exact scaled integers (cents / counts),
so value hashes are stable under any distributed reduction order.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

import ray.data as rd

from ..functions import geo
from ..sources import synthetic
from ..sources.io import read_table
from ..stages import dedup, events, join, knn, relational, sim, textops, tiles, zonal
from ..state.resources import default_concurrency as _dconc

KNN_K = 3
NEARDUP_THRESHOLD = 0.45
TOPK_EMB = 10


def _docs(sf_dir: str, columns=("doc_id",)):
    return read_table(sf_dir, "documents", columns=list(columns))


def _docs_points(sf_dir: str, columns=("doc_id",)):
    return _docs(sf_dir, columns).map_batches(
        tiles.derive_geometry_batch, batch_format="pyarrow"
    )


def _zones(sf_dir: str) -> pa.Table:
    keys = pq.read_table(f"{sf_dir}/part.parquet", columns=["p_partkey"])["p_partkey"].to_numpy()
    return synthetic.make_rect_zones(np.sort(keys))


# -- tiling / cells ---------------------------------------------------------


def tile_assign_z8(sf_dir: str):
    return tiles.assign_tiles(_docs(sf_dir), zooms=(8,)).select_columns(
        ["doc_id", "lon", "lat", "tx_8", "ty_8", "cell_8"]
    )


def tile_assign_multi(sf_dir: str):
    return tiles.assign_tiles(_docs(sf_dir), zooms=(4, 12), with_cell=False).select_columns(
        ["doc_id", "tx_4", "ty_4", "tx_12", "ty_12"]
    )


def rasterize_point_count_z6(sf_dir: str):
    """Point rasterization as burn-count per z6 pixel (gdal_rasterize with
    MERGE_ALG=ADD on point features, alg/gdalrasterize.cpp:314)."""
    tagged = tiles.assign_tiles(_docs(sf_dir), zooms=(6,), with_cell=False).select_columns(
        ["doc_id", "tx_6", "ty_6"]
    )
    return relational.partial_aggregate(tagged, ["tx_6", "ty_6"], count_alias="n_points")


# -- spatial joins ----------------------------------------------------------


def join_intersects(sf_dir: str):
    return join.broadcast_spatial_join(_docs_points(sf_dir), _zones(sf_dir), "intersects")


def join_within(sf_dir: str):
    return join.broadcast_spatial_join(_docs_points(sf_dir), _zones(sf_dir), "within")


def join_partitioned_intersects(sf_dir: str):
    """Same answer as join_intersects via the cell-partitioned shuffle plan."""
    zones_ds = rd.from_arrow(_zones(sf_dir))
    return join.partitioned_spatial_join(_docs_points(sf_dir), zones_ds, res=5)


def join_knn(sf_dir: str):
    z = _zones(sf_dir)
    cx = (z["minx"].to_numpy() + z["maxx"].to_numpy()) / 2.0
    cy = (z["miny"].to_numpy() + z["maxy"].to_numpy()) / 2.0
    targets = pa.table(
        {"zone_id": z["zone_id"], "zone_key": z["zone_key"], "cx": pa.array(cx), "cy": pa.array(cy)}
    )
    out = knn.knn_join(_docs_points(sf_dir), targets, k=KNN_K)
    return out.select_columns(["doc_id", "zone_id", "rank"])


def zonal_stats_q(sf_dir: str):
    pts = _docs(sf_dir, ("doc_id", "n_chars")).map_batches(
        tiles.derive_geometry_batch, batch_format="pyarrow"
    )
    return zonal.zonal_stats(pts, _zones(sf_dir), value_col="n_chars")


def zonal_fractional_q(sf_dir: str):
    """Coverage-weighted RASTER zonal statistics with exact fractional
    pixel coverage (alg/zonal.cpp:2173 pixels=FRACTIONAL; the reference
    computes the fractions via GEOSGridIntersectionFractions_r at
    :1940 — ours is the exact Green's-theorem grid kernel in
    stages/coverage.py).  Zones are dyadic (1/16 px) rectangles from
    p_partkey over the 4x4-tile 'hump' raster; every emitted stat is an
    exact scaled int64, bit-stable against the SQL closed form."""
    from ..stages import coverage

    keys = pq.read_table(f"{sf_dir}/part.parquet",
                         columns=["p_partkey"])["p_partkey"].to_numpy()
    zones = synthetic.make_pixel_zones(np.sort(keys))
    tiles_ds = rd.from_arrow(synthetic.make_raster_tiles("hump", 4, 4, size=64))
    out = coverage.zonal_stats_fractional(tiles_ds, zones)
    return out.map_batches(
        lambda t: t.rename_columns(
            ["zone_key", "n_pix", "cov_256", "wsum_16384",
             "vmin_64", "vmax_64"]),
        batch_format="pyarrow")


def join_anti_spatial_q(sf_dir: str):
    """Spatial anti join: docs covered by NO zone (NOT EXISTS; the
    point-layer Erase analogue, ogrlayer.cpp:6770 family)."""
    return join.broadcast_spatial_join(
        _docs_points(sf_dir), _zones(sf_dir), "intersects", anti=True
    )


def zonal_extended_q(sf_dir: str):
    """Zonal mean/stddev sufficient statistics (alg/zonal.cpp:661-701 stat
    names) as exact integers: n, sum, var_num = n*sum(v^2)-sum(v)^2."""
    pts = _docs(sf_dir, ("doc_id", "n_chars")).map_batches(
        tiles.derive_geometry_batch, batch_format="pyarrow"
    )
    return zonal.zonal_stats_extended(pts, _zones(sf_dir), value_col="n_chars")


def zonal_modes_q(sf_dir: str):
    """Zonal MAJORITY / MINORITY value per zone (alg/zonal.cpp:661-701),
    ties -> smallest value."""
    pts = _docs(sf_dir, ("doc_id", "n_chars")).map_batches(
        tiles.derive_geometry_batch, batch_format="pyarrow"
    )
    return zonal.zonal_value_modes(pts, _zones(sf_dir), value_col="n_chars")


# -- relational conformance (OGR SQL surface) --------------------------------


def q1_pricing(sf_dir: str):
    ds = read_table(
        sf_dir,
        "lineitem",
        columns=["l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice", "l_discount", "l_shipdate"],
    )

    def prep(t: pa.Table) -> pa.Table:
        t = t.filter(pc.less_equal(t["l_shipdate"], pa.scalar(np.datetime64("1998-09-02", "us"))))
        qty = pc.cast(t["l_quantity"], pa.int64())
        base_c = pc.cast(
            pc.round(
                pc.multiply(t["l_extendedprice"], pa.scalar(100.0)),
                round_mode="half_towards_infinity",
            ),
            pa.int64(),
        )
        disc_price = pc.multiply(
            pc.multiply(t["l_extendedprice"], pc.subtract(pa.scalar(1.0), t["l_discount"])),
            pa.scalar(100.0),
        )
        disc_c = pc.cast(pc.round(disc_price, round_mode="half_towards_infinity"), pa.int64())
        return pa.table(
            {
                "l_returnflag": t["l_returnflag"],
                "l_linestatus": t["l_linestatus"],
                "qty": qty,
                "base_cents": base_c,
                "disc_cents": disc_c,
            }
        )

    prepped = ds.map_batches(prep, batch_format="pyarrow")
    out = relational.partial_aggregate(
        prepped,
        ["l_returnflag", "l_linestatus"],
        sums=["qty", "base_cents", "disc_cents"],
        count_alias="count_order",
    )
    return out


def join_orders_customer(sf_dir: str):
    orders = read_table(sf_dir, "orders", columns=["o_custkey", "o_totalprice"])
    cust = pq.read_table(f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_mktsegment"])

    def prep(t: pa.Table) -> pa.Table:
        return relational.scaled_int_column(t, "o_totalprice", 100, "total_cents").drop_columns(
            ["o_totalprice"]
        )

    ds = orders.map_batches(prep, batch_format="pyarrow")
    joined = relational.hash_join_broadcast(
        ds, cust, key="o_custkey", small_key="c_custkey", emit=["c_mktsegment"]
    )
    return relational.partial_aggregate(
        joined, ["c_mktsegment"], sums=["total_cents"], count_alias="n_orders"
    )


def filter_like_between(sf_dir: str):
    # BETWEEN is pushed down to the parquet scan (row-group pruning at the
    # read, the OGR SetAttributeFilter-pushdown analogue); only the LIKE
    # residual runs in the vectorized filter stage
    import pyarrow.dataset as pads

    ds = read_table(
        sf_dir, "part", columns=["p_partkey", "p_name", "p_type", "p_size"],
        filter=(pads.field("p_size") >= 10) & (pads.field("p_size") <= 30),
    )

    def fn(t: pa.Table):
        return pc.match_like(t["p_type"], "%AND%")

    return relational.filter_expr(ds, fn).select_columns(["p_partkey", "p_name", "p_size"])


def range_join_q(sf_dir: str):
    """Interval (range) join — the brief's named custom operator: docs'
    n_chars probed against OVERLAPPING part-keyed value bands via the CSR
    slab index (relational.range_join_broadcast).  Bands are deterministic
    from p_partkey so the oracle is a plain theta join."""
    probe = _docs(sf_dir, ("doc_id", "n_chars"))
    keys = pq.read_table(f"{sf_dir}/part.parquet", columns=["p_partkey"])[
        "p_partkey"].to_numpy()
    keys = np.sort(keys)[:500]  # bounded broadcast side
    lo = (keys * 37) % 1200
    hi = lo + 15 + (keys % 50)
    intervals = pa.table({"p_partkey": pa.array(keys),
                          "lo": pa.array(lo.astype(np.float64)),
                          "hi": pa.array(hi.astype(np.float64))})
    return relational.range_join_broadcast(
        probe, intervals, "n_chars", "lo", "hi", emit=["p_partkey"])


def filter_sql_q(sf_dir: str):
    """filter_like_between driven from an OGR-SQL STRING instead of Python
    callables (reference grammar ogr/swq_parser.y; SetAttributeFilter
    ogr/ogrfeaturequery.cpp): the BETWEEN prefix compiles to a
    pads.Expression pushed into the parquet scan, the full predicate runs
    as the vectorized residual."""
    from ..functions import sqlexpr

    sql = ("SELECT p_partkey, p_name, p_size FROM part "
           "WHERE p_size BETWEEN 10 AND 30 AND p_type LIKE '%AND%'")
    sel = sqlexpr.parse_select(sql)
    push = sqlexpr.scan_filter("p_size BETWEEN 10 AND 30")
    ds = read_table(sf_dir, "part", columns=sorted(sel.columns_needed), filter=push)
    return sqlexpr.apply_select(ds, sel)


def select_sql_expr_q(sf_dir: str):
    """SQL SELECT with projection expressions, scalar functions, DISTINCT-free
    ORDER BY + LIMIT — the ogr_gensql.cpp evaluation surface from a string.
    Integer arithmetic only (truncating / and %, mirrored by DuckDB // )."""
    from ..functions import sqlexpr

    sql = ("SELECT doc_id, n_chars * 3 - 1 AS x3, "
           "n_chars - n_chars / 7 * 7 AS bucket7, "
           "upper(substr(lang, 1, 2)) AS lang_uc, length(source) AS src_len "
           "FROM documents "
           "WHERE n_chars - n_chars / 7 * 7 IN (1, 3, 5) AND NOT (n_chars BETWEEN 100 AND 200) "
           "ORDER BY doc_id LIMIT 200")
    sel = sqlexpr.parse_select(sql)
    ds = read_table(sf_dir, "documents", columns=sorted(sel.columns_needed))
    return sqlexpr.apply_select(ds, sel)


def select_sql_geom_funcs_q(sf_dir: str):
    """Round-5 SQL-callable geometry functions (the OGR SQLite-dialect
    surface, ogr/ogrsf_frmts/sqlite/ogrsqlitesqlfunctions.cpp:956-1232):
    ST_Area / ST_Centroid+ST_X/ST_Y / ST_NPoints / ST_IsValid called FROM
    an SQL string over the rect-zone layer, plus ST_Distance from each
    zone to its derived doc-grid point — all compiled by
    functions.sqlexpr into the engine's own geometry kernels.  Quantized
    x100 / x1e6 for the closed-form DuckDB mirror."""
    import ray.data as rd

    from ..functions import geo, sqlexpr

    zones = _zones(sf_dir)
    keys = zones["zone_key"].to_numpy()
    lon, lat = geo.derive_lonlat(keys)
    from ..functions import wkb as wkb_f

    pts = wkb_f.encode_points(lon, lat)
    zones = zones.append_column("pt_wkb", pa.array(pts, pa.binary()))
    ds = rd.from_arrow(zones)
    sql = ("SELECT zone_key, "
           "ST_Area(wkb) AS area, "
           "ST_X(ST_Centroid(wkb)) AS cx, "
           "ST_Y(ST_Centroid(wkb)) AS cy, "
           "ST_NPoints(wkb) AS n_pts, "
           "CAST(ST_IsValid(wkb) AS integer) AS valid, "
           "ST_Distance(wkb, pt_wkb) AS dist "
           "FROM zones WHERE ST_Area(wkb) > 20.0")
    sel = sqlexpr.parse_select(sql)
    out = sqlexpr.apply_select(ds, sel)

    def quant(t: pa.Table) -> pa.Table:
        return pa.table({
            "zone_key": t["zone_key"],
            "area_x1e4": pa.array(np.round(
                t["area"].to_numpy(zero_copy_only=False) * 10000.0)
                .astype(np.int64)),
            "cx_x1000": pa.array(np.round(
                t["cx"].to_numpy(zero_copy_only=False) * 1000.0)
                .astype(np.int64)),
            "cy_x1000": pa.array(np.round(
                t["cy"].to_numpy(zero_copy_only=False) * 1000.0)
                .astype(np.int64)),
            "n_pts": t["n_pts"],
            "valid": pc.cast(t["valid"], pa.int64()),
            "dist_e6": pa.array(np.round(
                t["dist"].to_numpy(zero_copy_only=False) * 1e6)
                .astype(np.int64)),
        })

    return out.map_batches(quant, batch_format="pyarrow")


def select_sql_group_q(sf_dir: str):
    """SQL GROUP BY from a string (ogr_gensql.cpp aggregate surface):
    count(*)/sum/min/max compile to the two-phase partial_aggregate, HAVING
    and ORDER BY run over the output aliases."""
    from ..functions import sqlexpr

    sql = ("SELECT c_mktsegment, count(*) AS n, sum(c_nationkey) AS nat_sum, "
           "min(c_custkey) AS min_key, max(c_custkey) AS max_key "
           "FROM customer WHERE c_custkey % 3 <> 0 "
           "GROUP BY c_mktsegment HAVING n > 10 ORDER BY c_mktsegment")
    sel = sqlexpr.parse_select(sql)
    ds = read_table(sf_dir, "customer", columns=sorted(sel.columns_needed))
    return sqlexpr.apply_select(ds, sel)


def select_sql_distinct_q(sf_dir: str):
    """SELECT DISTINCT from a string (ogr/ogr_swq.h:322 DISTINCT mode,
    generic executor ogr_gensql.cpp): the parser's distinct flag routes the
    projected expressions through the engine's distinct groupby before the
    ORDER BY sort."""
    from ..functions import sqlexpr

    sql = ("SELECT DISTINCT c_mktsegment, c_nationkey / 5 AS nat_bucket "
           "FROM customer WHERE c_acctbal >= 0 "
           "ORDER BY c_mktsegment, nat_bucket")
    sel = sqlexpr.parse_select(sql)
    ds = read_table(sf_dir, "customer", columns=sorted(sel.columns_needed))
    return sqlexpr.apply_select(ds, sel)


def select_sql_join_q(sf_dir: str):
    """SQL JOIN from a string (ogr_gensql.cpp:1334-1530 secondary-table
    join, re-expressed as a broadcast hash join): the statement names the
    right table, apply_select routes it to relational.hash_join_broadcast
    and emits only the referenced right columns."""
    from ..functions import sqlexpr

    sql = ("SELECT o_orderkey, c_name, c_mktsegment FROM orders "
           "JOIN customer ON o_custkey = c_custkey "
           "WHERE o_orderkey % 5 = 0 ORDER BY o_orderkey LIMIT 300")
    sel = sqlexpr.parse_select(sql)
    ds = read_table(sf_dir, "orders", columns=["o_orderkey", "o_custkey"])
    cust = read_table(sf_dir, "customer",
                      columns=["c_custkey", "c_name", "c_mktsegment"])
    return sqlexpr.apply_select(ds, sel, tables={"customer": cust})


def select_sql_left_join_group_q(sf_dir: str):
    """SQL LEFT JOIN + GROUP BY from one string: broadcast left join
    (null-filled misses) feeding the two-phase aggregate."""
    from ..functions import sqlexpr

    sql = ("SELECT n_name, count(*) AS n, sum(c_custkey) AS key_sum "
           "FROM customer LEFT JOIN nation ON c_nationkey = n_nationkey "
           "WHERE c_custkey % 7 <> 0 GROUP BY n_name ORDER BY n_name")
    sel = sqlexpr.parse_select(sql)
    ds = read_table(sf_dir, "customer", columns=["c_custkey", "c_nationkey"])
    nat = read_table(sf_dir, "nation", columns=["n_nationkey", "n_name"])
    return sqlexpr.apply_select(ds, sel, tables={"nation": nat})


def select_sql_count_distinct_q(sf_dir: str):
    """COUNT(DISTINCT x) from a SQL string — the one aggregate the reference
    grammar special-cases (ogr/swq_parser.y:1009-1034, swq_select.cpp
    distinct-flag column): executes as distinct-on-(keys, x) followed by a
    keyed count, two shuffles and no driver collect."""
    from ..functions import sqlexpr

    sql = ("SELECT c_mktsegment, count(DISTINCT c_nationkey) AS n_nations "
           "FROM customer WHERE c_custkey % 2 = 0 "
           "GROUP BY c_mktsegment ORDER BY c_mktsegment")
    sel = sqlexpr.parse_select(sql)
    ds = read_table(sf_dir, "customer", columns=sorted(sel.columns_needed))
    return sqlexpr.apply_select(ds, sel)


def select_sql_global_agg_q(sf_dir: str):
    """Whole-table aggregates without GROUP BY (swq_select.cpp
    SWQM_SUMMARY_RECORD — 'SELECT COUNT(*), MIN(x) FROM t'): grouped on a
    synthetic constant key that the alias projection drops."""
    from ..functions import sqlexpr

    sql = ("SELECT count(*) AS n, sum(o_custkey) AS key_sum, "
           "min(o_orderkey) AS min_o, max(o_orderkey) AS max_o "
           "FROM orders WHERE o_orderkey % 3 = 0")
    sel = sqlexpr.parse_select(sql)
    ds = read_table(sf_dir, "orders", columns=["o_orderkey", "o_custkey"])
    return sqlexpr.apply_select(ds, sel)


def gopher_rules_q(sf_dir: str):
    """Gopher quality rules (Rae et al. 2021 Table A1) over the documents
    corpus: word-count bounds, mean-word-length band, symbol ratio,
    alphabetic fraction, distinct-stopword floor — all-integer rule
    arithmetic, single map_batches pass, no shuffle."""
    from ..stages import textops

    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])

    def fn(t: pa.Table) -> pa.Table:
        out = textops.gopher_rules_batch(t, min_words=20, max_words=200)
        return out.select(["doc_id", "n_words", "token_chars", "n_alpha",
                           "n_sym", "stop_hits", "reason", "keep"])

    return ds.map_batches(fn, batch_format="pyarrow")


def lm_familiarity_q(sf_dir: str):
    """CCNet-style LM filter, integer-count variant: train char-trigram
    counts corpus-wide (per-batch partial count tables -> one keyed
    groupby -> bounded top-512 collect with count-DESC / gram-ASC
    tie-break), broadcast the model via ray.put, score every document by
    summed model counts of its trigrams.  The train-then-score broadcast
    pattern; all arithmetic integer-exact."""
    import ray

    from ..stages import textops

    docs = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    model = textops.train_char_ngram_counts(docs, top_k=512)
    ref = ray.put(model)
    return textops.lm_familiarity_score(docs, ref, min_avg_count=40)


def audio_g711_q(sf_dir: str):
    """G.711 telephony companding (wFormatTag 7/6 in the RIFF registry;
    the mu-law/A-law codecs in sources/wav.py): 8 deterministic int16
    samples per document encode and decode through both laws; all
    arithmetic is integer, so the SQL oracle replays the segment/mantissa
    formulas bit-exactly (DuckDB has >>, & and xor)."""
    from ..sources import wav

    ds = read_table(sf_dir, "documents", columns=["doc_id"])

    def fn(t: pa.Table) -> pa.Table:
        ids = pc.cast(t["doc_id"], pa.int64()).to_numpy()
        k = np.tile(np.arange(8, dtype=np.int64), len(ids))
        did = np.repeat(ids, 8)
        s = ((did * 9176 + k * 4099) % 65536 - 32768).astype(np.int16)
        mu = wav.mulaw_encode(s)
        al = wav.alaw_encode(s)
        return pa.table({
            "doc_id": pa.array(did), "k": pa.array(k),
            "mu_code": pa.array(mu.astype(np.int64)),
            "mu_dec": pa.array(wav.mulaw_decode(mu).astype(np.int64)),
            "a_code": pa.array(al.astype(np.int64)),
            "a_dec": pa.array(wav.alaw_decode(al).astype(np.int64)),
        })

    return ds.map_batches(fn, batch_format="pyarrow")


def select_sql_avg_q(sf_dir: str):
    """AVG from a SQL string (swq_op_registrar.cpp:53): exact int64 sums
    and counts divide once per group — the float64 result is bit-stable
    because both operands are exact."""
    from ..functions import sqlexpr

    sql = ("SELECT c_mktsegment, count(*) AS n, avg(c_nationkey) AS avg_nat "
           "FROM customer WHERE c_custkey % 4 <> 1 "
           "GROUP BY c_mktsegment ORDER BY c_mktsegment")
    sel = sqlexpr.parse_select(sql)
    ds = read_table(sf_dir, "customer", columns=sorted(sel.columns_needed))
    return sqlexpr.apply_select(ds, sel)


def select_sql_union_all_q(sf_dir: str):
    """UNION ALL from one SQL string (ogr/swq_parser.y:822,840 select_core
    opt_union_all): each branch evaluates independently over its own FROM
    table and the outputs concatenate via Dataset.union."""
    from ..functions import sqlexpr

    sql = ("SELECT n_name AS name, CAST(n_regionkey AS BIGINT) AS rk "
           "FROM nation WHERE n_regionkey <= 1 "
           "UNION ALL "
           "SELECT r_name AS name, CAST(r_regionkey + 100 AS BIGINT) AS rk "
           "FROM region")
    sel = sqlexpr.parse_select(sql)
    nat = read_table(sf_dir, "nation", columns=["n_name", "n_regionkey"])
    reg = read_table(sf_dir, "region", columns=["r_name", "r_regionkey"])
    return sqlexpr.apply_select(nat, sel, datasets={"region": reg})


def topk_orders(sf_dir: str):
    ds = read_table(sf_dir, "orders", columns=["o_orderkey", "o_totalprice"])
    ds = ds.map_batches(
        lambda t: relational.scaled_int_column(t, "o_totalprice", 100, "total_cents").drop_columns(
            ["o_totalprice"]
        ),
        batch_format="pyarrow",
    )
    return relational.top_k(ds, ["total_cents", "o_orderkey"], descending=[True, False], k=10)


def distinct_segments(sf_dir: str):
    return relational.distinct(
        read_table(sf_dir, "customer", columns=["c_mktsegment"]), ["c_mktsegment"]
    )


# -- events (stream-shaped) --------------------------------------------------


def events_tumbling_1h(sf_dir: str):
    ds = read_table(sf_dir, "events", columns=["event_type", "ts", "value"])
    return events.tumbling_window(ds, window_s=3600)


def asof_join_events(sf_dir: str):
    ev = read_table(sf_dir, "events", columns=["event_id", "event_type", "user_id", "ts"])
    orders = pq.read_table(
        f"{sf_dir}/orders.parquet", columns=["o_custkey", "o_orderdate", "o_orderkey"]
    )
    matched = events.asof_join(ev, orders)
    # inner-match aggregate: per event_type, count + exact orderkey sum
    def prep(t: pa.Table) -> pa.Table:
        t = t.filter(pc.is_valid(t["o_orderkey"]))
        return pa.table(
            {
                "event_type": t["event_type"],
                "o_orderkey": pc.cast(t["o_orderkey"], pa.int64()),
            }
        )

    inner = matched.map_batches(prep, batch_format="pyarrow")
    return relational.partial_aggregate(
        inner, ["event_type"], sums=["o_orderkey"], count_alias="n_matched"
    )


# -- text / dedup / similarity ----------------------------------------------


def late_events_q(sf_dir: str):
    """Watermark late-event tumbling windows (Flink allowed-lateness
    semantics batch-recomputed): per window the on-time/late split and the
    on-time value sum.  The fixture's event_id order is perfectly sorted by
    ts, so the graded PROCESSING order reverses each 16-event ingest
    block (proc_id = (event_id//16)*16 + 15 - event_id%16) — bounded
    ~1 h disorder against the 30-min allowed lateness, so windows carry
    a genuine on-time/late mix (the running max-ts is the distributed
    prefix-MAX, global_prefix_sum plan with max)."""
    ds = read_table(sf_dir, "events", columns=["event_id", "ts", "value"])

    def proc(t: pa.Table) -> pa.Table:
        e = t["event_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        pid = (e // 16) * 16 + 15 - (e % 16)
        return t.append_column("proc_id", pa.array(pid))

    return events.late_event_windows(
        ds.map_batches(proc, batch_format="pyarrow"),
        window_s=3600, lateness_s=1800, id_col="proc_id")


def sliding_window_q(sf_dir: str):
    ds = read_table(sf_dir, "events", columns=["event_type", "ts"])
    return events.sliding_window(ds, window_s=7200, step_s=3600)


def session_windows_q(sf_dir: str):
    ds = read_table(sf_dir, "events", columns=["event_id", "user_id", "ts"])
    return events.session_windows(ds, gap_s=7200)


def scalar_funcs_q(sf_dir: str):
    """OGR SQL scalar surface (SURVEY §2.11): SUBSTR/UPPER/CONCAT/CASE/CAST
    via pyarrow.compute kernels."""
    ds = read_table(sf_dir, "documents", columns=["doc_id", "text", "lang", "source", "n_chars"])

    def fn(t: pa.Table) -> pa.Table:
        head = pc.utf8_upper(pc.utf8_slice_codeunits(t["text"], 0, 8))
        tag = pc.binary_join_element_wise(t["lang"], t["source"], "-")
        size_class = pc.if_else(
            pc.less(t["n_chars"], 100),
            pa.scalar("short"),
            pc.if_else(pc.less_equal(t["n_chars"], 300), pa.scalar("mid"), pa.scalar("long")),
        )
        half = pc.divide(pc.cast(t["n_chars"], pa.float64()), pa.scalar(2.0))
        return pa.table(
            {"doc_id": t["doc_id"], "head": head, "tag": tag,
             "size_class": size_class, "half_chars": half}
        )

    return ds.map_batches(fn, batch_format="pyarrow")


def scalar_funcs2_q(sf_dir: str):
    """More OGR SQL scalar surface: COALESCE/NULLIF, IN lists, TRIM, REPLACE,
    MOD, FLOOR/CEIL, POWER, ABS — pyarrow.compute kernels, integer/exact
    outputs so the mirror is hash-stable."""
    ds = read_table(sf_dir, "documents", columns=["doc_id", "lang", "source", "n_chars"])

    def fn(t: pa.Table) -> pa.Table:
        lang = pc.cast(t["lang"], pa.string())
        n = pc.cast(t["n_chars"], pa.int64())
        # COALESCE(NULLIF(lang, 'en'), 'default')
        coalesced = pc.if_else(pc.equal(lang, "en"), pa.scalar("default"), lang)
        in_set = pc.is_in(lang, value_set=pa.array(["en", "fr", "de"]))
        trimmed = pc.utf8_trim_whitespace(
            pc.binary_join_element_wise("  ", lang, " ", ""))
        replaced = pc.replace_substring(pc.cast(t["source"], pa.string()), "a", "_")
        modv = pc.subtract(n, pc.multiply(pc.divide(n, 7), pa.scalar(7, pa.int64())))
        fl = pc.cast(pc.floor(pc.divide(pc.cast(n, pa.float64()), 8.0)), pa.int64())
        ce = pc.cast(pc.ceil(pc.divide(pc.cast(n, pa.float64()), 8.0)), pa.int64())
        powv = pc.cast(pc.power(
            pc.cast(pc.add(pc.subtract(modv, pc.multiply(pc.divide(modv, 5),
                                                         pa.scalar(5, pa.int64()))),
                           pa.scalar(1, pa.int64())), pa.float64()),
            pa.scalar(2.0)), pa.int64())
        absv = pc.abs(pc.subtract(n, pa.scalar(250, pa.int64())))
        return pa.table(
            {"doc_id": t["doc_id"], "coalesced": coalesced, "in_set": in_set,
             "trimmed": trimmed, "replaced": replaced, "mod7": modv,
             "floor8": fl, "ceil8": ce, "pow2": powv, "abs250": absv}
        )

    return ds.map_batches(fn, batch_format="pyarrow")


def sample_docs_q(sf_dir: str):
    """Deterministic Bernoulli-by-key sampling (approx-stats subsample path,
    SURVEY §2.6) — hash-free integer scheme so the SQL oracle reproduces it."""
    ds = read_table(sf_dir, "documents", columns=["doc_id", "n_chars"])

    def fn(t: pa.Table) -> pa.Table:
        # int64 wraparound only occurs for keys >= ~3.47e9, where the BIGINT
        # oracle would error too — an explicit raise (asserts vanish under
        # python -O) instead of paying a per-row loop
        k = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        if k.size and int(k.max()) >= (1 << 63) // 2654435761:
            raise OverflowError("doc_id beyond BIGINT sample domain")
        keep = (k * np.int64(2654435761)) % 100 < 10
        return t.filter(pa.array(keep))

    return ds.map_batches(fn, batch_format="pyarrow")


def sample_stratified_q(sf_dir: str):
    """Per-stratum Bernoulli sampling (training-data mixture control): the
    target stratum (lang='en') keeps 20%, every other stratum 5%, with the
    same deterministic integer scheme as sample_docs."""
    ds = read_table(sf_dir, "documents", columns=["doc_id", "lang"])

    def fn(t: pa.Table) -> pa.Table:
        k = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        if k.size and int(k.max()) >= (1 << 63) // 2654435761:
            raise OverflowError("doc_id beyond BIGINT sample domain")
        rate = np.where(pc.equal(t["lang"], "en").to_numpy(zero_copy_only=False),
                        20, 5)
        keep = (k * np.int64(2654435761)) % 100 < rate
        return t.filter(pa.array(keep))

    return ds.map_batches(fn, batch_format="pyarrow")


def pack_sequences_q(sf_dir: str):
    """Token-budget sequence packing (training-batch assembly): a distributed
    EXCLUSIVE prefix sum of per-doc token counts in doc_id order assigns each
    doc its pack (budget 256 tokens) and intra-pack offset — the two-pass
    bucket-offset scan, all int64-exact."""
    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    tok = ds.map_batches(
        lambda t: textops.token_count_batch(t).select(["doc_id", "n_tokens"]),
        batch_format="pyarrow",
    )
    cum = relational.global_prefix_sum(tok, "doc_id", "n_tokens", bucket_size=64)

    def packs(t: pa.Table) -> pa.Table:
        c = t["cum"].to_numpy(zero_copy_only=False)
        return pa.table({"doc_id": t["doc_id"], "n_tokens": t["n_tokens"],
                         "pack_id": pa.array(c // 256),
                         "pack_offset": pa.array(c % 256)})

    return cum.map_batches(packs, batch_format="pyarrow")


RASTER_LOOKUP_W, RASTER_LOOKUP_H = 360, 170


def point_raster_lookup_q(sf_dir: str):
    """Point -> raster value lookup (gdallocationinfo / GDALInterpolateAtPoint
    nearest path, SURVEY §2.4): docs probe a broadcast tiled ramp raster; the
    engine does real tile fetch + array indexing, the oracle recomputes the
    ramp closed form."""
    import ray

    W, H = RASTER_LOOKUP_W, RASTER_LOOKUP_H
    tile = 64
    ntx = (W + tile - 1) // tile
    tiles = {}
    for ty in range((H + tile - 1) // tile):
        for tx in range(ntx):
            w = min(tile, W - tx * tile)
            h = min(tile, H - ty * tile)
            gy, gx = np.mgrid[0:h, 0:w]
            tiles[(tx, ty)] = (gx + tx * tile) + (gy + ty * tile)  # value = px + py
    ref = ray.put(tiles)

    class Lookup:
        def __init__(self):
            self.tiles = ray.get(ref)

        def __call__(self, t: pa.Table) -> pa.Table:
            lon = t["lon"].to_numpy(zero_copy_only=False)
            lat = t["lat"].to_numpy(zero_copy_only=False)
            px = np.clip(np.floor((lon + 180.0) / 360.0 * W).astype(np.int64), 0, W - 1)
            py = np.clip(np.floor((85.0 - lat) / 170.0 * H).astype(np.int64), 0, H - 1)
            vals = np.empty(len(lon), dtype=np.int64)
            for (tx, ty), arr in self.tiles.items():
                m = (px // tile == tx) & (py // tile == ty)
                if m.any():
                    vals[m] = arr[py[m] - ty * tile, px[m] - tx * tile]
            return pa.table({"doc_id": t["doc_id"], "raster_value": pa.array(vals)})

    return _docs_points(sf_dir).map_batches(Lookup, batch_format="pyarrow", concurrency=_dconc())


def point_sample_bilinear_q(sf_dir: str):
    """gdallocationinfo -r bilinear (GDALRasterBand::InterpolateAtPoint,
    gcore/rasterband.cpp): pixel-center bilinear sampling of the broadcast
    tiled ramp at each doc's lon/lat, with edge-replicate clamping.  The
    engine gathers the 4 real neighbor pixels from the tile dict (cross-tile
    gathers included); the oracle mirrors the IEEE-exact float64 formula."""
    import ray

    W, H = RASTER_LOOKUP_W, RASTER_LOOKUP_H
    tile = 64
    tiles = {}
    for ty in range((H + tile - 1) // tile):
        for tx in range((W + tile - 1) // tile):
            w = min(tile, W - tx * tile)
            h = min(tile, H - ty * tile)
            gy, gx = np.mgrid[0:h, 0:w]
            tiles[(tx, ty)] = (gx + tx * tile) + (gy + ty * tile)  # value = px + py
    ref = ray.put(tiles)

    class Sample:
        def __init__(self):
            self.tiles = ray.get(ref)

        def _gather(self, xi: np.ndarray, yi: np.ndarray) -> np.ndarray:
            vals = np.empty(len(xi), dtype=np.float64)
            for (tx, ty), arr in self.tiles.items():
                m = (xi // tile == tx) & (yi // tile == ty)
                if m.any():
                    vals[m] = arr[yi[m] - ty * tile, xi[m] - tx * tile]
            return vals

        def __call__(self, t: pa.Table) -> pa.Table:
            lon = t["lon"].to_numpy(zero_copy_only=False)
            lat = t["lat"].to_numpy(zero_copy_only=False)
            pxc = np.minimum(np.maximum((lon + 180.0) / 360.0 * float(W) - 0.5, 0.0), W - 1.0)
            pyc = np.minimum(np.maximum((85.0 - lat) / 170.0 * float(H) - 0.5, 0.0), H - 1.0)
            x0 = np.floor(pxc)
            y0 = np.floor(pyc)
            dx = pxc - x0
            dy = pyc - y0
            x1 = np.minimum(x0 + 1.0, W - 1.0)
            y1 = np.minimum(y0 + 1.0, H - 1.0)
            xi0, yi0 = x0.astype(np.int64), y0.astype(np.int64)
            xi1, yi1 = x1.astype(np.int64), y1.astype(np.int64)
            v00 = self._gather(xi0, yi0)
            v10 = self._gather(xi1, yi0)
            v01 = self._gather(xi0, yi1)
            v11 = self._gather(xi1, yi1)
            top = v00 * (1.0 - dx) + v10 * dx
            bot = v01 * (1.0 - dx) + v11 * dx
            val = top * (1.0 - dy) + bot * dy
            return pa.table({"doc_id": t["doc_id"], "sampled": pa.array(val)})

    return _docs_points(sf_dir).map_batches(Sample, batch_format="pyarrow", concurrency=_dconc())


def grid_count_q(sf_dir: str):
    """gdal_grid 'count' data metric: per-cell count of docs within radius of
    the cell center, on a 64x32 world grid."""
    from ..stages import gridinterp

    grid = gridinterp.InterpGrid(-180.0, -85.0, 180.0, 85.0, 64, 32, tile=16)
    pts = _docs_points(sf_dir).map_batches(
        lambda t: t.append_column("value", pa.array(np.zeros(t.num_rows))), batch_format="pyarrow"
    )
    # seed_all_tiles makes empty tiles emit too (the oracle's LEFT JOIN emits
    # every cell), so the query stays a LAZY Dataset end to end — the cell
    # expansion below is just another map_batches stage
    tiles_out = gridinterp.grid_interpolate(
        pts, grid, algorithm="count", radius=6.0, seed_all_tiles=True
    )

    return gridinterp.tiles_to_cells(tiles_out, grid, "n")


def dedup_exact_q(sf_dir: str):
    return dedup.exact_dedup(read_table(sf_dir, "documents", columns=["doc_id", "text"]))


def chunk_dedup_q(sf_dir: str):
    """Duplicated-span statistics (RefinedWeb-style span dedup unit): per doc,
    how many 3-word spans occur more than once corpus-wide."""
    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    return dedup.chunk_dedup_stats(ds, chunk_words=3)


def target_affinity_q(sf_dir: str):
    """DSIR-shaped importance scoring over HASHED features: pass 1 aggregates
    target-corpus (lang='en') token counts into a FIXED-SIZE bucket table
    (n_buckets rows, independent of vocabulary — DSIR's own hashed n-gram
    design), pass 2 broadcasts the dense vector and scores every doc with an
    integer bucket-weight sum.  Nothing vocabulary-sized ever reaches the
    driver; the fold is bounded metadata (same class as the IVF codebook)."""
    ds = read_table(sf_dir, "documents", columns=["doc_id", "text", "lang"])
    counts = textops.fold_bucket_table(
        textops.hashed_term_counts(
            ds, row_filter=lambda b: pc.equal(b["lang"], "en")),
        "c", textops.N_FEATURE_BUCKETS)
    scored = textops.target_affinity_hashed(
        read_table(sf_dir, "documents", columns=["doc_id", "text"]), counts)
    return scored.select_columns(["doc_id", "affinity", "n_tokens"])


def tfidf_top_q(sf_dir: str):
    """TF-IDF top term per doc with HASHED document frequencies: pass 1 folds
    distinct (doc, bucket) counts into a fixed-size bucket table (bounded,
    never vocabulary-sized), pass 2 broadcasts the dense df vector and takes
    the vectorized per-doc argmax of tf/df_bucket (ties -> smallest term)."""
    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    dfs = textops.fold_bucket_table(
        textops.hashed_doc_frequencies(ds), "df", textops.N_FEATURE_BUCKETS)
    return textops.tfidf_top_term_hashed(
        read_table(sf_dir, "documents", columns=["doc_id", "text"]), dfs)


def token_count_q(sf_dir: str):
    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    return ds.map_batches(
        lambda t: textops.token_count_batch(t).select(["doc_id", "n_tokens"]),
        batch_format="pyarrow",
    )


def token_count_bpe_q(sf_dir: str):
    """BPE-ish pretoken counting (training-data token budget)."""
    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    return ds.map_batches(
        lambda t: textops.bpe_token_count_batch(t).select(["doc_id", "n_bpe_tokens"]),
        batch_format="pyarrow",
    )


def embedding_ann_ivf_q(sf_dir: str):
    """IVF coarse-quantizer ANN (scale path): codebook training, inverted-list
    probing and exact rerank, verified end-to-end.  The graded configuration
    probes ALL lists (exhaustive == brute oracle) because this corpus's
    embeddings are near-uniform, so partial probes cannot be hash-exact; the
    nprobe < n_centroids recall trade-off is asserted in tests instead."""
    emb = pq.read_table(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"],
        filters=[("vec_id", "=", 0)],
    )
    q0 = np.asarray(emb["embedding"].to_pylist()[0])
    ds = read_table(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    out = sim.ivf_topk(ds, np.array([q0]), query_ids=[0], k=TOPK_EMB,
                       n_centroids=16, nprobe=16)
    return out.select_columns(["vec_id", "rank"])


def calc_two_bands_q(sf_dir: str):
    """gdal_calc -A ramp -B checker --calc '(A + B) / 2.0' over the stacked
    fixtures; per-tile checksums of the float result."""
    from ..stages import rastermap

    layers = [rd.from_arrow(synthetic.make_raster_tiles(k, 2, 2, size=64))
              for k in ("ramp", "checker")]
    out = rastermap.calc_multi(rastermap.stack_bands(layers), "(A + B) / 2.0")
    return out.select_columns(["x", "y", "checksum"])


def having_segments_q(sf_dir: str):
    """OGR SQL GROUP BY ... HAVING: distributed aggregate then a vectorized
    post-filter on the aggregate rows.  The threshold is RELATIVE (segments
    holding >= 1/5 of all customers) so the predicate filters at every scale
    factor instead of degenerating to all-or-nothing."""
    ds = read_table(sf_dir, "customer", columns=["c_mktsegment"])
    total = ds.count()
    agg = ds.groupby("c_mktsegment").count()

    def having(t: pa.Table) -> pa.Table:
        t = pa.table({"c_mktsegment": t["c_mktsegment"],
                      "n": pc.cast(t["count()"], pa.int64())})
        return t.filter(pc.greater_equal(pc.multiply(t["n"], pa.scalar(5)), total))

    return agg.map_batches(having, batch_format="pyarrow")


def rank_orders_q(sf_dir: str):
    """ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC,
    o_orderkey) <= 3 — distributed per-group top-N with rank (SQLite-dialect
    window function surface; the per-batch combiner bounds the shuffle)."""
    ds = read_table(sf_dir, "orders", columns=["o_orderkey", "o_custkey", "o_totalprice"])
    out = relational.group_top_n(ds, "o_custkey", "o_totalprice", 3, "o_orderkey")
    return out.select_columns(["o_custkey", "o_orderkey", "rn"])


def select_band_q(sf_dir: str):
    """gdal_translate -b 2: slice the checker band back out of the 3-band
    stack — checksum must equal the standalone checker fixture's."""
    from ..stages import rastermap

    layers = [rd.from_arrow(synthetic.make_raster_tiles(k, 2, 2, size=64))
              for k in ("ramp", "checker", "hump")]
    out = rastermap.select_band(rastermap.stack_bands(layers), band=2)
    return out.select_columns(["x", "y", "band", "checksum"])


def left_join_orders_q(sf_dir: str):
    """OGR SQL LEFT JOIN: every customer row survives, order aggregates are
    NULL for customers with no orders (broadcast build side = the per-custkey
    order aggregate, itself computed distributed)."""
    from ray.data.aggregate import Count, Sum

    orders = read_table(sf_dir, "orders", columns=["o_custkey", "o_totalprice"])
    agg = orders.map_batches(
        lambda t: relational.scaled_int_column(t, "o_totalprice", 100, "total_cents")
        .drop_columns(["o_totalprice"]),
        batch_format="pyarrow",
    ).groupby("o_custkey").aggregate(
        Count(alias_name="n_orders"), Sum("total_cents", alias_name="sum_cents")
    )
    small = pa.Table.from_pandas(agg.to_pandas(), preserve_index=False)
    cust = read_table(sf_dir, "customer", columns=["c_custkey"])
    out = relational.hash_join_broadcast_left(
        cust, small, key="c_custkey", small_key="o_custkey",
        emit=["n_orders", "sum_cents"],
    )
    return out.select_columns(["c_custkey", "n_orders", "sum_cents"])


def scrub_pii_q(sf_dir: str):
    """PII/URL redaction over the documents table (texts augmented with
    deterministic synthetic contact strings so every pattern fires): emails,
    URLs and phone-like runs become typed placeholders."""
    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])

    def augment(t: pa.Table) -> pa.Table:
        sid = pc.cast(t["doc_id"], pa.string())
        aug = pc.binary_join_element_wise(
            pc.cast(t["text"], pa.string()), " mail doc", sid,
            "@ex.com see https://ex.org/p/", sid, " call +1202555", sid, " end",
            "",
        )
        return pa.table({"doc_id": t["doc_id"], "text": aug})

    out = ds.map_batches(augment, batch_format="pyarrow").map_batches(
        textops.scrub_pii_batch, batch_format="pyarrow")
    return out.select_columns(["doc_id", "n_email", "n_url", "n_phone",
                               "text_scrubbed"])


def decontaminate_q(sf_dir: str):
    """Benchmark decontamination: flag corpus documents sharing any 5-word
    n-gram with the benchmark slice (doc_id < 20) — broadcast gram set,
    vectorized membership per batch."""
    bench_tbl = pq.read_table(f"{sf_dir}/documents.parquet",
                              columns=["doc_id", "text"],
                              filters=[("doc_id", "<", 20)])
    grams = textops.text_ngrams(bench_tbl["text"].to_pylist(), n=5)
    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    out = ds.map_batches(
        lambda t: textops.ngram_decontaminate_batch(t, grams, n=5),
        batch_format="pyarrow",
    )
    return out.select_columns(["doc_id", "n_gram_hits", "contaminated"])


def kmeans_clusters_q(sf_dir: str):
    """Distributed Lloyd k-means (k=8, 2 iterations, smallest-id init) over
    the embeddings table; the SemDeDup-style clustering stage.  Output =
    final per-vector assignments."""
    ds = read_table(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    return sim.kmeans_assign(ds, k=8, iters=2)


def semantic_neardup_q(sf_dir: str):
    """SemDeDup plan: k-means cluster -> within-cluster exact pairwise cosine
    above threshold.  The cluster keying bounds each task's candidate set
    (the 100 TB shape: no all-pairs scan, one shuffle by cluster id)."""
    ds = read_table(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    withc = sim.kmeans_assign(ds, k=8, iters=2, keep_embedding=True)

    def pairs(g: pa.Table) -> pa.Table:
        ids = g["vec_id"].to_numpy(zero_copy_only=False)
        x = sim._stack_embeddings(g["embedding"])
        n = np.linalg.norm(x, axis=1, keepdims=True)
        n[n == 0] = 1.0
        xn = x / n
        s = xn @ xn.T
        ia, ib = np.triu_indices(len(ids), k=1)
        keep = s[ia, ib] >= 0.35
        a, b = ids[ia[keep]], ids[ib[keep]]
        lo, hi = np.minimum(a, b), np.maximum(a, b)
        return pa.table({"id_a": pa.array(lo, pa.int64()),
                         "id_b": pa.array(hi, pa.int64())})

    return withc.groupby("cluster").map_groups(pairs, batch_format="pyarrow")


def text_quality_q(sf_dir: str):
    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    return ds.map_batches(
        lambda t: textops.quality_score_batch(t).select(
            ["doc_id", "n_chars_calc", "n_tokens", "n_punct"]
        ),
        batch_format="pyarrow",
    )


def repetition_stats_q(sf_dir: str):
    """Gopher repetition filters' raw signals over the documents table:
    word totals, distinct words, top unigram / bigram occurrence counts."""
    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    return ds.map_batches(
        lambda t: textops.repetition_stats_batch(t).select(
            ["doc_id", "n_words", "n_distinct_words", "top_word_n", "top_bigram_n"]
        ),
        batch_format="pyarrow",
    )


def embedding_topk_q(sf_dir: str):
    emb = pq.read_table(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"],
        filters=[("vec_id", "=", 0)],
    )
    q0 = np.asarray(emb["embedding"].to_pylist()[0])
    ds = read_table(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    out = sim.cosine_topk(ds, np.array([q0]), query_ids=[0], k=TOPK_EMB)
    return out.select_columns(["vec_id", "rank"])


def embedding_neardup_q(sf_dir: str):
    """Near-dup pairs via the SCALE plan: LSH bucket shuffle + within-bucket
    exact cosine rerank (no driver-side materialization; the brute
    ``cosine_neardup_pairs`` remains as the small-input fallback).  Params
    chosen so OR-construction recall at the threshold is ~1 (worst qualifying
    pair recall 0.99996; exact-match verified against the brute oracle)."""
    ds = read_table(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    out = sim.lsh_bucket_pairs(ds, nplanes=3, ntables=32, threshold=NEARDUP_THRESHOLD)
    return out.select_columns(["id_a", "id_b"])


def histogram_nchars_q(sf_dir: str):
    """GetHistogram analogue over a tabular column: fixed-width buckets,
    pre-aggregated per batch (SURVEY §2.5 histogram row)."""
    ds = read_table(sf_dir, "documents", columns=["n_chars"])

    def bucketize(t: pa.Table) -> pa.Table:
        b = (t["n_chars"].to_numpy(zero_copy_only=False) // 100).astype(np.int64)
        return pa.table({"bucket": pa.array(b)})

    tagged = ds.map_batches(bucketize, batch_format="pyarrow")
    return relational.partial_aggregate(tagged, ["bucket"], count_alias="n")


def agg_stats_quantity_q(sf_dir: str):
    """ComputeStatistics analogue with distribution-exact partials: n, sum,
    sum-of-squares, min, max as integers (stddev derives client-side —
    bit-stable under any reduction order)."""
    ds = read_table(sf_dir, "lineitem", columns=["l_quantity"])

    def prep(t: pa.Table) -> pa.Table:
        q = pc.cast(t["l_quantity"], pa.int64())
        return pa.table({"q": q, "qq": pc.multiply(q, q)})

    prepped = ds.map_batches(prep, batch_format="pyarrow")
    from ray.data.aggregate import Count, Max, Min, Sum

    res = prepped.aggregate(
        Count(alias_name="n"),
        Sum("q", alias_name="q_sum"),
        Sum("qq", alias_name="qq_sum"),
        Min("q", alias_name="q_min"),
        Max("q", alias_name="q_max"),
    )
    import pandas as pd

    return pd.DataFrame([res])


# -- geometry scalar ops (SURVEY §2.2) ---------------------------------------


def geom_area_centroid_q(sf_dir: str):
    """Decode zone WKB -> shoelace area + centroid, emitted as exact scaled
    ints (area x10000, centroid x200 — all values sit on those grids, so the
    FP round-trip is collision-free vs the SQL arithmetic oracle)."""
    from ..stages import geomops

    zones = _zones(sf_dir)
    ds = rd.from_arrow(zones.select(["zone_id", "wkb"]))

    def fn(batch: pa.Table) -> pa.Table:
        t = geomops.area_centroid_batch(batch)
        return pa.table(
            {
                "zone_id": t["zone_id"],
                "area_x10000": pc.cast(
                    pc.round(pc.multiply(t["area"], pa.scalar(10000.0))), pa.int64()
                ),
                "cx_x200": pc.cast(pc.round(pc.multiply(t["cx"], pa.scalar(200.0))), pa.int64()),
                "cy_x200": pc.cast(pc.round(pc.multiply(t["cy"], pa.scalar(200.0))), pa.int64()),
            }
        )

    return ds.map_batches(fn, batch_format="pyarrow")


def tin_surface_area_q(sf_dir: str):
    """PolyhedralSurface/TIN/Triangle WKB (ISO types 15/16/17;
    ogr/ogrpolyhedralsurface.cpp, ogrtriangle.cpp): each zone rect becomes
    a two-triangle TIN (diagonal split), round-trips the WKB encode/decode,
    and sums patch areas — the total equals the rect area (values sit on
    the 5e-5 grid, so x20000 scaled ints are collision-free)."""
    from ..functions import wkb as wkb_f

    zones = _zones(sf_dir)
    ds = rd.from_arrow(zones.select(["zone_key", "wkb"]))

    def fn(batch: pa.Table) -> pa.Table:
        ks, npatch, areas = [], [], []
        for i in range(batch.num_rows):
            g = wkb_f.decode(batch["wkb"][i].as_py())
            r = g.parts[0][0]  # rect shell (5 pts, closed)
            a, b, c, d = r[0], r[1], r[2], r[3]
            tin = wkb_f.encode_surface(
                [[np.array([a, b, c, a])], [np.array([a, c, d, a])]],
                wkb_f.TIN)
            g2 = wkb_f.decode(tin)
            assert g2.kind == wkb_f.TIN
            assert wkb_f.encode_geom(g2) == tin  # bitwise re-encode
            ks.append(batch["zone_key"][i].as_py())
            npatch.append(len(g2.parts))
            areas.append(int(round(wkb_f.geom_area(g2) * 20000.0)))
        return pa.table({
            "zone_key": pa.array(ks, pa.int64()),
            "n_patches": pa.array(npatch, pa.int64()),
            "area_x20000": pa.array(areas, pa.int64()),
        })

    return ds.map_batches(fn, batch_format="pyarrow")


def spatial_sort_topk_q(sf_dir: str):
    """Hilbert-style physical clustering (vector sort, SURVEY §2.6): order by
    spatial cell key then id; row-major cell key is the SQL-mirrorable stand-in
    (the engine's hilbert_encode path is covered by unit tests)."""
    ds = tiles.assign_tiles(_docs(sf_dir), zooms=(12,)).select_columns(["doc_id", "cell_12"])
    return relational.top_k(ds, ["cell_12", "doc_id"], descending=[False, False], k=100)


# -- layer algebra (SURVEY §2.4 polygon x polygon) ---------------------------

CUST_RECT = dict(minx_mult=5179, minx_mod=33000, miny_mult=3607, miny_mod=15000,
                 w_mult=149, w_mod=900, h_mult=211, h_mod=700)


def _cust_zones(sf_dir: str) -> pa.Table:
    """Second rectangle layer derived from customer keys (same exact-integer
    scheme as the part-key zones; constants differ; single implementation in
    synthetic.zone_rects_from_keys/rect_wkbs)."""
    keys = np.sort(
        pq.read_table(f"{sf_dir}/customer.parquet", columns=["c_custkey"])["c_custkey"].to_numpy()
    )
    minx, miny, maxx, maxy = synthetic.zone_rects_from_keys(keys, CUST_RECT)
    wkbs = synthetic.rect_wkbs(minx, miny, maxx, maxy)
    return pa.table({"r_id": pa.array(keys), "wkb": pa.array(wkbs, pa.binary())})


def polygon_join_q(sf_dir: str):
    """Polygon x polygon intersects join (layer algebra pair identification)
    with exact pair dedup across shared cells."""
    from ..stages import layeralg

    zones = _zones(sf_dir)
    left = pa.table({"l_id": zones["zone_key"], "wkb": zones["wkb"]})
    return layeralg.polygon_join(rd.from_arrow(left), rd.from_arrow(_cust_zones(sf_dir)), res=4)


def polygon_overlay_q(sf_dir: str):
    """Overlay geometry construction (Intersection/Union/SymDifference output,
    ogrlayer.cpp:5385/5803/6340): per intersecting zone pair the three overlay
    geometries are CONSTRUCTED (concave-capable boolean engine) and their
    exact scaled areas emitted — the rect-derived layers make the oracle
    closed-form."""
    from ..stages import layeralg

    zones = _zones(sf_dir)
    left = rd.from_arrow(pa.table({"l_id": zones["zone_key"], "wkb": zones["wkb"]}))
    out = layeralg.overlay_join(left, rd.from_arrow(_cust_zones(sf_dir)), res=4)

    def fin(t: pa.Table) -> pa.Table:
        def x10000(col):
            return pc.cast(
                pc.round(pc.multiply(t[col], pa.scalar(10000.0)),
                         round_mode="half_towards_infinity"),
                pa.int64(),
            )

        r = pa.table(
            {"l_id": t["l_id"], "r_id": t["r_id"],
             "inter_x10000": x10000("inter_area"),
             "union_x10000": x10000("union_area"),
             "symdiff_x10000": x10000("symdiff_area")}
        )
        # grid-coincident edges produce ~1e-14 FP slivers on one side only;
        # both engine and oracle drop rounded-zero intersections
        return r.filter(pc.greater(r["inter_x10000"], 0))

    return out.map_batches(fin, batch_format="pyarrow")


def polygon_erase_q(sf_dir: str):
    """Erase (A minus eraser) with geometry output: zones minus the fixed
    clip rectangle — concave L/C/ring-shaped results; exact area oracle."""
    from ..functions import wkb as _w
    from ..stages import layeralg

    zones = _zones(sf_dir)
    ds = rd.from_arrow(pa.table({"fid": zones["zone_key"], "wkb": zones["wkb"]}))
    x0, y0, x1, y1 = CLIP_RECT
    ring = np.array([[x0, y0], [x1, y0], [x1, y1], [x0, y1], [x0, y0]])
    out = layeralg.erase_layer(ds, _w.encode_polygon([ring]))

    def fin(t: pa.Table) -> pa.Table:
        r = pa.table(
            {"fid": t["fid"],
             "erase_area_x10000": pc.cast(
                 pc.round(pc.multiply(t["erase_area"], pa.scalar(10000.0)),
                          round_mode="half_towards_infinity"),
                 pa.int64())}
        )
        return r.filter(pc.greater(r["erase_area_x10000"], 0))

    return out.map_batches(fin, batch_format="pyarrow")


CLIP_RECT = (-60.0, -40.0, 60.0, 40.0)


def clip_areas_q(sf_dir: str):
    """Clip every zone by a fixed convex rectangle (layer-algebra Clip);
    emits exact scaled clipped areas."""
    from ..functions import wkb as _w
    from ..stages import layeralg

    zones = _zones(sf_dir)
    ds = rd.from_arrow(pa.table({"fid": zones["zone_key"], "wkb": zones["wkb"]}))
    x0, y0, x1, y1 = CLIP_RECT
    ring = np.array([[x0, y0], [x1, y0], [x1, y1], [x0, y1], [x0, y0]])
    out = layeralg.clip_layer(ds, _w.encode_polygon([ring]))

    def fin(t: pa.Table) -> pa.Table:
        r = pa.table(
            {
                "fid": t["fid"],
                "clip_area_x10000": pc.cast(
                    pc.round(pc.multiply(t["clip_area"], pa.scalar(10000.0))), pa.int64()
                ),
            }
        )
        # zero-area (boundary-touch) clips are not emitted (matches strict
        # overlap in the SQL oracle)
        return r.filter(pc.greater(r["clip_area_x10000"], 0))

    return out.map_batches(fin, batch_format="pyarrow")


def dissolve_zones_q(sf_dir: str):
    """Dissolve zones grouped by zone_key % 10: part count, exact total area,
    group bbox (vector dissolve aggregate surface)."""
    from ..stages import layeralg

    zones = _zones(sf_dir)
    cat = (zones["zone_key"].to_numpy() % 10).astype(np.int64)
    ds = rd.from_arrow(
        pa.table({"fid": zones["zone_key"], "cat": pa.array(cat), "wkb": zones["wkb"]})
    )
    out = layeralg.dissolve_collect(ds, "cat")

    def fin(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "cat": t["cat"],
                "n_parts": t["n_parts"],
                "total_area_x10000": pc.cast(
                    pc.round(pc.multiply(t["total_area"], pa.scalar(10000.0))), pa.int64()
                ),
                "minx": t["minx"],
                "miny": t["miny"],
                "maxx": t["maxx"],
                "maxy": t["maxy"],
            }
        )

    return out.map_batches(fin, batch_format="pyarrow")


def contour_polygons_q(sf_dir: str):
    """Contour POLYGON output (bands between levels) over the ramp: each band
    is one diagonal strip — count/holes closed-form."""
    from ..stages import contour as cnt

    tiles_tbl = synthetic.make_raster_tiles("ramp", 3, 2, size=64)
    out = cnt.contour_polygons(rd.from_arrow(tiles_tbl), [30.5, 80.5, 130.5])
    return out.select_columns(["value", "n_pixels", "n_holes"])


def raster_as_features_q(sf_dir: str):
    """raster as-features: tiles -> one row per valid pixel (gx, gy, value)."""
    from ..stages import rastermap

    tiles_tbl = synthetic.make_raster_tiles("blobs", 3, 3, size=64)
    return rastermap.as_features(rd.from_arrow(tiles_tbl), nodata=0.0, tile_size=64)


COLOR_STOPS = ((0, 0, 0, 255), (100, 0, 255, 0), (200, 255, 255, 0), (400, 255, 0, 0))


def color_relief_q(sf_dir: str):
    """gdaldem color-relief over the ramp mosaic; per-band tile checksums."""
    from ..stages import rastermap

    tiles_tbl = synthetic.make_raster_tiles("ramp", 3, 3, size=64)
    out = rastermap.color_relief(rd.from_arrow(tiles_tbl), COLOR_STOPS)
    return out.select_columns(["x", "y", "checksum_r", "checksum_g", "checksum_b"])


INT_RECT_L = dict(minx_mult=7321, minx_mod=330, miny_mult=4231, miny_mod=150,
                  w_mult=131, w_mod=8, h_mult=197, h_mod=6)
INT_RECT_R = dict(minx_mult=5179, minx_mod=330, miny_mult=3607, miny_mod=150,
                  w_mult=149, w_mod=8, h_mult=211, h_mod=6)


def _int_rect_layer(keys: np.ndarray, c: dict, id_name: str) -> pa.Table:
    """Integer-coordinate rectangle layer: every coordinate is an exact
    small integer, so touches/equals/contains classification has NO floating
    point ambiguity (the predicate-join contract)."""
    minx = (-180 + (keys * c["minx_mult"]) % c["minx_mod"]).astype(np.float64)
    miny = (-85 + (keys * c["miny_mult"]) % c["miny_mod"]).astype(np.float64)
    w = (2 + (keys * c["w_mult"]) % c["w_mod"]).astype(np.float64)
    h = (2 + (keys * c["h_mult"]) % c["h_mod"]).astype(np.float64)
    wkbs = synthetic.rect_wkbs(minx, miny, minx + w, miny + h)
    return pa.table({id_name: pa.array(keys), "wkb": pa.array(wkbs, pa.binary())})


def predicate_counts_q(sf_dir: str):
    """Full spatial predicate set (touches/overlaps/equals/contains/within,
    ogrgeometry.cpp:6009-6362) over two integer-grid rect layers: per-pair
    classification -> count per predicate."""
    from ..stages import layeralg

    pk = np.sort(pq.read_table(f"{sf_dir}/part.parquet", columns=["p_partkey"])["p_partkey"].to_numpy())
    ck = np.sort(pq.read_table(f"{sf_dir}/customer.parquet", columns=["c_custkey"])["c_custkey"].to_numpy())
    left = rd.from_arrow(_int_rect_layer(pk, INT_RECT_L, "l_id"))
    right = rd.from_arrow(_int_rect_layer(ck, INT_RECT_R, "r_id"))
    out = layeralg.predicate_join(left, right, res=4)
    return relational.partial_aggregate(out, ["predicate"], count_alias="n_pairs")


def dissolve_union_q(sf_dir: str):
    """TRUE geometric dissolve (union fold) over the integer rect layer
    grouped by key % 100 — overlapping members count once; the oracle counts
    DISTINCT covered unit cells (exact for integer rects)."""
    from ..stages import layeralg

    pk = np.sort(pq.read_table(f"{sf_dir}/part.parquet", columns=["p_partkey"])["p_partkey"].to_numpy())
    t = _int_rect_layer(pk, INT_RECT_L, "fid")
    cat = (pk % 100).astype(np.int64)
    ds = rd.from_arrow(t.append_column("cat", pa.array(cat)))
    out = layeralg.dissolve_union(ds, "cat")

    def fin(tt: pa.Table) -> pa.Table:
        return pa.table(
            {"cat": tt["cat"], "n_parts": tt["n_parts"],
             "union_area": pc.cast(
                 pc.round(tt["union_area"], round_mode="half_towards_infinity"),
                 pa.int64())}
        )

    return out.map_batches(fin, batch_format="pyarrow")


def contour_ramp_q(sf_dir: str):
    """Distributed marching-squares contour over the ramp fixture."""
    from ..stages import contour as cnt

    # half-integer levels keep iso-lines off pixel corners (no degenerate
    # zero-length segments), which makes the marching-squares SQL mirror exact
    tiles_tbl = synthetic.make_raster_tiles("ramp", 3, 2, size=64)
    return cnt.contour(rd.from_arrow(tiles_tbl), [30.5, 80.5, 130.5], nx=3, ny=2, tile_size=64)


def contour_band_areas_q(sf_dir: str):
    """gdal_contour -p with INTERPOLATED level crossings: per-band region
    areas of the marching-squares polygon fragments over the ramp mosaic
    (alg/marching_squares/polygon_ring_appender.h semantics; half-integer
    levels keep every crossing dyadic so the x1e6 fixed point is exact)."""
    from ..stages import contour as cnt

    tiles_tbl = synthetic.make_raster_tiles("ramp", 3, 2, size=64)
    return cnt.contour_band_areas(
        rd.from_arrow(tiles_tbl), [30.5, 80.5, 130.5], nx=3, ny=2, tile_size=64
    )


WRAP_LINES = [
    # (gid, x0, y0, x1, y1) — 2-point linestrings in lon/lat
    (0, 170.0, 10.0, -170.0, 30.0),   # eastward crossing
    (1, -10.0, 0.0, 10.0, 5.0),       # no crossing
    (2, -170.0, -5.0, 170.0, -15.0),  # westward crossing
    (3, 179.5, 0.0, -179.5, 1.0),     # near-pole-free thin crossing
]
WRAP_POLYS = [
    # (gid, lon_w, lon_e (signed, crossing if w > e), y0, y1)
    (4, 170.0, -170.0, 0.0, 20.0),    # straddles the dateline
    (5, 0.0, 10.0, 0.0, 10.0),        # plain box
]


def wrapdateline_q(sf_dir: str):
    """ogr2ogr -wrapdateline over a mixed line/polygon fixture: crossing
    geometries split into [-180, 180]-normalized parts; per-geometry part
    count, polyline length and polygon area are the goldens."""
    from ..stages import geomops
    from ..functions import wkb as _wkb

    rows = []
    for gid, x0, y0, x1, y1 in WRAP_LINES:
        rows.append({"gid": gid,
                     "wkb": _wkb.encode_linestring(np.array([[x0, y0], [x1, y1]]))})
    for gid, xw, xe, y0, y1 in WRAP_POLYS:
        ring = np.array([[xw, y0], [xe, y0], [xe, y1], [xw, y1], [xw, y0]])
        rows.append({"gid": gid, "wkb": _wkb.encode_polygon([ring])})
    tbl = pa.Table.from_pylist(rows)
    out = rd.from_arrow(tbl).map_batches(geomops.wrap_dateline_batch,
                                         batch_format="pyarrow")
    return out.select_columns(["gid", "n_parts", "len_x1e6", "area_x1e6"])


def stack_bands_q(sf_dir: str):
    """gdal_merge -separate: stack the ramp, checker and hump fixtures into
    3-band tiles; the band-weighted checksum pins content and band order."""
    from ..stages import rastermap

    layers = [rd.from_arrow(synthetic.make_raster_tiles(k, 2, 2, size=64))
              for k in ("ramp", "checker", "hump")]
    out = rastermap.stack_bands(layers)
    return out.select_columns(["x", "y", "n_bands", "checksum"])


def png_tiles_q(sf_dir: str):
    """z/x/y.png tile sink round trip: write the checker mosaic as PNG tiles
    (dependency-free encoder), decode every file back and checksum — the
    sink + codec must be lossless for 8-bit tiles."""
    import shutil
    import tempfile

    from ..functions import checksum as cks_f
    from ..sources import png as png_mod

    import os

    # pid-scoped dir: concurrent gate/driver runs on the same host must not
    # rmtree each other's in-flight tiles; 'skipped' receipts are execution
    # history (retry-dependent) and deliberately NOT part of the graded output
    root = f"{tempfile.gettempdir()}/gdal_ray_png_tiles_{os.getpid()}"
    shutil.rmtree(root, ignore_errors=True)
    tiles = rd.from_arrow(synthetic.make_raster_tiles("checker", 3, 3, size=64))
    receipts = png_mod.write_png_tiles(tiles, root, resume=True)

    def verify(t: pa.Table) -> pa.Table:
        xs, ys, cs = [], [], []
        for i in range(t.num_rows):
            with open(t["path"][i].as_py(), "rb") as f:
                arr = png_mod.decode_png(f.read())
            xs.append(t["x"][i].as_py())
            ys.append(t["y"][i].as_py())
            cs.append(cks_f.tile_checksum(arr))
        return pa.table({"x": pa.array(xs, pa.int64()), "y": pa.array(ys, pa.int64()),
                         "checksum": pa.array(cs, pa.int64())})

    return receipts.map_batches(verify, batch_format="pyarrow")


def gpkg_tiles_roundtrip_q(sf_dir: str):
    """Round-5 GeoPackage TILES layer (ogrgeopackagedataset.cpp raster
    side): the checker mosaic PNG-encoded into a spec-complete gpkg tile
    pyramid (contents/tile_matrix_set/tile_matrix + pyramid table,
    top-left row origin), read back through the index-manifest Ray path
    with per-worker PNG decode, checksummed — same oracle as
    png_tiles_roundtrip by construction."""
    import os
    import tempfile

    from ..functions import checksum as cks_f
    from ..sources import gpkg, png as png_mod

    path = f"{tempfile.gettempdir()}/gdal_ray_tiles_{os.getpid()}.gpkg"
    tiles = synthetic.make_raster_tiles("checker", 3, 3, size=64)

    def blobs():
        from ..stages.focal import _dtype_of

        for i in range(tiles.num_rows):
            arr = np.frombuffer(
                tiles["data"][i].as_py(),
                dtype=_dtype_of(tiles["dtype"][i].as_py())).reshape(
                tiles["height"][i].as_py(), tiles["width"][i].as_py())
            yield (6, tiles["x"][i].as_py(), tiles["y"][i].as_py(),
                   png_mod.encode_png(arr.astype(np.uint8)))

    gpkg.write_gpkg_tiles(path, "checker", blobs(), tile_size=64)
    out = gpkg.read_raster_tiles(path, "checker")

    def verify(t: pa.Table) -> pa.Table:
        from ..stages.focal import _dtype_of

        xs, ys, cs = [], [], []
        for i in range(t.num_rows):
            a = np.frombuffer(t["data"][i].as_py(),
                              dtype=_dtype_of(t["dtype"][i].as_py()))
            a = a.reshape(t["height"][i].as_py(), t["width"][i].as_py())
            xs.append(t["x"][i].as_py())
            ys.append(t["y"][i].as_py())
            cs.append(cks_f.tile_checksum(a))
        return pa.table({"x": pa.array(xs, pa.int64()),
                         "y": pa.array(ys, pa.int64()),
                         "checksum": pa.array(cs, pa.int64())})

    return out.map_batches(verify, batch_format="pyarrow")


def explode_geometrycollection_q(sf_dir: str):
    """Explode over GEOMETRYCOLLECTION rows (wkbGeometryCollection,
    ogr/ogr_core.h; apps/gdalalg_vector_explode_collections.h): a mixed
    point/line/multipoint/nested-collection WKB per nation key flattens to
    5 single-part rows whose types and first vertices the oracle states."""
    from ..functions import wkb as wkb_f
    from ..stages import geomops

    nat = read_table(sf_dir, "nation", columns=["n_nationkey"])

    def build(t: pa.Table) -> pa.Table:
        keys, wkbs = [], []
        for k in t["n_nationkey"].to_pylist():
            k = float(int(k))
            pt = wkb_f.encode_points([k], [k + 0.5])[0]
            ln = wkb_f.encode_linestring(np.array([[k, 0.0], [k + 1.0, 1.0]]))
            mp_head = b"\x01" + np.uint32(4).tobytes() + np.uint32(2).tobytes()
            mp = (mp_head + wkb_f.encode_points([k + 2.0], [2.0])[0]
                  + wkb_f.encode_points([k + 3.0], [3.0])[0])
            nested = wkb_f.encode_geometrycollection(
                [wkb_f.encode_points([k + 9.0], [9.0])[0]])
            keys.append(int(k))
            wkbs.append(wkb_f.encode_geometrycollection([pt, ln, mp, nested]))
        return pa.table({"n_nationkey": pa.array(keys, pa.int64()),
                         "wkb": pa.array(wkbs, pa.binary())})

    exploded = geomops.explode_collections(
        nat.map_batches(build, batch_format="pyarrow"))

    def finish(t: pa.Table) -> pa.Table:
        ks, gts, xs, ys = [], [], [], []
        for i in range(t.num_rows):
            w = t["wkb"][i].as_py()
            g = wkb_f.decode(w)
            p0 = g.vertices()[0]
            ks.append(t["n_nationkey"][i].as_py())
            gts.append(wkb_f.geom_type(w))
            xs.append(int(np.floor(p0[0] * 1e6 + 0.5)))
            ys.append(int(np.floor(p0[1] * 1e6 + 0.5)))
        return pa.table({"n_nationkey": pa.array(ks, pa.int64()),
                         "geom_type": pa.array(gts, pa.int64()),
                         "x_u6": pa.array(xs, pa.int64()),
                         "y_u6": pa.array(ys, pa.int64())})

    return exploded.map_batches(finish, batch_format="pyarrow")


def curve_area_q(sf_dir: str):
    """EXACT CurvePolygon areas (OGRCurvePolygon::get_Area — chord
    shoelace + circular-segment corrections, no linearization): per nation
    key a full-circle disc, a square with a circular hole, or a
    compound-curve quarter-pie; the oracle is the closed form."""
    from ..functions import wkb as wkb_f
    from ..stages import geomops

    nat = read_table(sf_dir, "nation", columns=["n_nationkey"])

    def circle_ring(cx, cy, r):
        a = np.radians([0.0, 90.0, 180.0, 270.0, 360.0])
        return wkb_f.encode_circularstring(
            np.stack([cx + r * np.cos(a), cy + r * np.sin(a)], axis=1))

    def build(t: pa.Table) -> pa.Table:
        keys, kinds, wkbs = [], [], []
        for k in t["n_nationkey"].to_pylist():
            k = int(k)
            if k % 3 == 0:  # disc: area = pi r^2
                r = 1.0 + (k % 4)
                w = wkb_f.encode_curvepolygon([circle_ring(k, k, r)])
                kind = "disc"
            elif k % 3 == 1:  # square shell, circular hole: s^2 - pi/4
                s = 2.0 + (k % 5)
                sq = wkb_f.encode_linestring(np.array(
                    [[k, k], [k + s, k], [k + s, k + s], [k, k + s], [k, k]]))
                w = wkb_f.encode_curvepolygon(
                    [sq, circle_ring(k + 1.0, k + 1.0, 0.5)])
                kind = "square_hole"
            else:  # compound quarter pie: pi r^2 / 4
                r = 1.0 + (k % 3)
                cx, cy = float(k), float(2 * k)
                leg1 = wkb_f.encode_linestring(
                    np.array([[cx, cy], [cx + r, cy]]))
                m = r / np.sqrt(2.0)
                arc = wkb_f.encode_circularstring(np.array(
                    [[cx + r, cy], [cx + m, cy + m], [cx, cy + r]]))
                leg2 = wkb_f.encode_linestring(
                    np.array([[cx, cy + r], [cx, cy]]))
                w = wkb_f.encode_curvepolygon(
                    [wkb_f.encode_compoundcurve([leg1, arc, leg2])])
                kind = "quarter_pie"
            keys.append(k); kinds.append(kind); wkbs.append(w)
        return pa.table({"n_nationkey": pa.array(keys, pa.int64()),
                         "kind": pa.array(kinds),
                         "wkb": pa.array(wkbs, pa.binary())})

    areas = nat.map_batches(build, batch_format="pyarrow").map_batches(
        geomops.curve_area_batch, batch_format="pyarrow")

    def finish(t: pa.Table) -> pa.Table:
        a = t["area"].to_numpy(zero_copy_only=False)
        u = (np.sign(a) * np.floor(np.abs(a) * 1e6 + 0.5)).astype(np.int64)
        return pa.table({"n_nationkey": t["n_nationkey"],
                         "kind": t["kind"],
                         "area_u6": pa.array(u, pa.int64())})

    return areas.map_batches(finish, batch_format="pyarrow")


def force_2d_q(sf_dir: str):
    """ogr2ogr -dim XY over Z/M inputs: build ISO PointZ / LineStringZM /
    PolygonZ WKBs per nation key, force-2d them, and emit the surviving XY
    micro-units — the oracle recomputes the deterministic coordinates."""
    import struct as st

    from ..functions import wkb as wkb_f
    from ..stages import geomops

    nat = read_table(sf_dir, "nation", columns=["n_nationkey"])

    def build(t: pa.Table) -> pa.Table:
        keys, wkbs, kinds = [], [], []
        for k in t["n_nationkey"].to_pylist():
            k = int(k)
            if k % 3 == 0:  # ISO PointZ (1001)
                w = (b"\x01" + st.pack("<I", 1001)
                     + st.pack("<ddd", k * 1.5, k * 2.5, 99.0))
                kind = "pointz"
            elif k % 3 == 1:  # ISO LineStringZM (3002): 2 vertices
                pts = [(k * 1.0, k + 0.25, 5.0, 6.0),
                       (k + 1.0, k + 1.75, 7.0, 8.0)]
                w = (b"\x01" + st.pack("<II", 3002, len(pts))
                     + b"".join(st.pack("<dddd", *p) for p in pts))
                kind = "linez"
            else:  # EWKB PolygonZ (Z flag bit): unit square at (k, k)
                ring = [(k + dx, k + dy, 3.0) for dx, dy in
                        ((0.0, 0.0), (1.0, 0.0), (1.0, 1.0), (0.0, 1.0),
                         (0.0, 0.0))]
                w = (b"\x01" + st.pack("<II", 0x80000003, 1)
                     + st.pack("<I", len(ring))
                     + b"".join(st.pack("<ddd", *p) for p in ring))
                kind = "polyz"
            keys.append(k)
            wkbs.append(w)
            kinds.append(kind)
        return pa.table({"n_nationkey": pa.array(keys, pa.int64()),
                         "kind": pa.array(kinds),
                         "wkb": pa.array(wkbs, pa.binary())})

    flat = nat.map_batches(build, batch_format="pyarrow").map_batches(
        geomops.force_2d_batch, batch_format="pyarrow")

    def explode(t: pa.Table) -> pa.Table:
        ks, kk, seqs, xs, ys = [], [], [], [], []
        for i in range(t.num_rows):
            g = wkb_f.decode(t["wkb"][i].as_py())  # strict 2-D decode
            v = g.vertices()
            u = np.sign(v) * np.floor(np.abs(v) * 1e6 + 0.5)
            for s in range(len(v)):
                ks.append(t["n_nationkey"][i].as_py())
                kk.append(t["kind"][i].as_py())
                seqs.append(s)
                xs.append(int(u[s, 0])); ys.append(int(u[s, 1]))
        return pa.table({"n_nationkey": pa.array(ks, pa.int64()),
                         "kind": pa.array(kk),
                         "seq": pa.array(seqs, pa.int64()),
                         "x_u6": pa.array(xs, pa.int64()),
                         "y_u6": pa.array(ys, pa.int64())})

    return flat.map_batches(explode, batch_format="pyarrow")


def curve_linearize_q(sf_dir: str):
    """CircularString -> LineString linearization (CurveToLine,
    ogr/ogrgeometryfactory.cpp curveToLineString; ogr2ogr -nlt
    CONVERT_TO_LINEAR): per-nation arcs (one or two 3-point arcs on a known
    circle) are linearized at a 4-degree max step and exploded to
    micro-unit integer vertices the SQL oracle recomputes from the exact
    arc parameters."""
    from ..functions import wkb as wkb_f
    from ..stages import geomops

    nat = read_table(sf_dir, "nation", columns=["n_nationkey"])

    def build(t: pa.Table) -> pa.Table:
        keys, wkbs = [], []
        for k in t["n_nationkey"].to_pylist():
            k = int(k)
            cx, cy = (k % 5) * 10.0, (k // 5) * 10.0
            r = 1.0 + (k % 3)
            a0 = 10.0 * (k % 7)
            sw = 83.0 + 30.0 * (k % 4)
            angs = [a0, a0 + sw / 2.0, a0 + sw]
            if k % 5 == 0:  # second arc continuing on the same circle
                angs += [a0 + sw + 22.5, a0 + sw + 45.0]
            a = np.radians(np.array(angs))
            pts = np.stack([cx + r * np.cos(a), cy + r * np.sin(a)], axis=1)
            keys.append(k)
            wkbs.append(wkb_f.encode_circularstring(pts))
        return pa.table({"n_nationkey": pa.array(keys, pa.int64()),
                         "wkb": pa.array(wkbs, pa.binary())})

    curves = nat.map_batches(build, batch_format="pyarrow")
    lin = curves.map_batches(
        lambda t: geomops.linearize_batch(t, max_angle_deg=4.0),
        batch_format="pyarrow")

    def explode(t: pa.Table) -> pa.Table:
        ks, seqs, xs, ys = [], [], [], []
        for i in range(t.num_rows):
            g = wkb_f.decode(t["wkb"][i].as_py())
            pts = g.parts[0]
            # half-away-from-zero micro-units == CAST(round(v*1e6) AS BIGINT)
            u = np.sign(pts) * np.floor(np.abs(pts) * 1e6 + 0.5)
            k = t["n_nationkey"][i].as_py()
            for s in range(len(pts)):
                ks.append(k); seqs.append(s)
                xs.append(int(u[s, 0])); ys.append(int(u[s, 1]))
        return pa.table({"n_nationkey": pa.array(ks, pa.int64()),
                         "seq": pa.array(seqs, pa.int64()),
                         "x_u6": pa.array(xs, pa.int64()),
                         "y_u6": pa.array(ys, pa.int64())})

    return lin.map_batches(explode, batch_format="pyarrow")


def jpeg_tiles_q(sf_dir: str):
    """z/x/y.jpg tile sink round trip (the reference's JPEG --tile-format):
    write the checker mosaic as baseline-JFIF tiles, decode every file back
    and checksum.  The checker's 8x8 cells are 8-grid-aligned constants, so
    the lossy pipeline round-trips EXACTLY at quality >= 75 and the PNG
    roundtrip oracle holds bit-for-bit."""
    import shutil
    import tempfile

    from ..functions import checksum as cks_f
    from ..sources import jpeg as jpeg_mod
    from ..sources import png as png_mod

    import os

    root = f"{tempfile.gettempdir()}/gdal_ray_jpeg_tiles_{os.getpid()}"
    shutil.rmtree(root, ignore_errors=True)
    tiles = rd.from_arrow(synthetic.make_raster_tiles("checker", 3, 3, size=64))
    receipts = png_mod.write_image_tiles(tiles, root, codec="jpeg",
                                         quality=90, resume=True)

    def verify(t: pa.Table) -> pa.Table:
        xs, ys, cs = [], [], []
        for i in range(t.num_rows):
            with open(t["path"][i].as_py(), "rb") as f:
                arr = jpeg_mod.decode_baseline(f.read())
            xs.append(t["x"][i].as_py())
            ys.append(t["y"][i].as_py())
            cs.append(cks_f.tile_checksum(arr))
        return pa.table({"x": pa.array(xs, pa.int64()), "y": pa.array(ys, pa.int64()),
                         "checksum": pa.array(cs, pa.int64())})

    return receipts.map_batches(verify, batch_format="pyarrow")


def asc_roundtrip_q(sf_dir: str):
    """ESRI ASCII Grid driver: serialize the 192x192 hump mosaic to .asc
    (repr round-trip floats), parse it back into engine tiles, and checksum —
    the format layer must be transparent to every downstream stage."""
    import tempfile

    from ..functions import checksum as cks_f
    from ..sources import aaigrid

    import os

    gy, gx = np.mgrid[0:192, 0:192]
    arr = (((gx - 96) ** 2 + (gy - 96) ** 2) / 64.0).astype(np.float32).astype(np.float64)
    path = f"{tempfile.gettempdir()}/gdal_ray_hump_{os.getpid()}.asc"
    aaigrid.write_asc(path, arr, nodata=-9999.0)
    tiles = aaigrid.read_asc_tiles(path, tile_size=64)

    def sums(t: pa.Table) -> pa.Table:
        from ..stages.focal import _dtype_of

        xs, ys, cs = [], [], []
        for i in range(t.num_rows):
            a = np.frombuffer(t["data"][i].as_py(),
                              dtype=_dtype_of(t["dtype"][i].as_py()))
            a = a.reshape(t["height"][i].as_py(), t["width"][i].as_py())
            xs.append(t["x"][i].as_py())
            ys.append(t["y"][i].as_py())
            cs.append(cks_f.tile_checksum(a))
        return pa.table({"x": pa.array(xs, pa.int64()), "y": pa.array(ys, pa.int64()),
                         "checksum": pa.array(cs, pa.int64())})

    return tiles.map_batches(sums, batch_format="pyarrow")


def envi_roundtrip_q(sf_dir: str):
    """ENVI raw-binary driver (frmts/raw/envidataset.cpp surface): the
    192x192 hump as a 2-band BIL float32 dataset (band 2 = band 1 + 1),
    written, re-read band 1 into engine tiles, and checksummed — the same
    hump oracle as the AAIGrid driver, proving format transparency."""
    import tempfile

    from ..functions import checksum as cks_f
    from ..sources import envi

    import os

    gy, gx = np.mgrid[0:192, 0:192]
    band1 = (((gx - 96) ** 2 + (gy - 96) ** 2) / 64.0).astype(np.float32)
    base = f"{tempfile.gettempdir()}/gdal_ray_hump_envi_{os.getpid()}"
    envi.write_envi(base, np.stack([band1, band1 + 1.0]), interleave="bil")
    tiles = envi.read_envi_tiles(base, tile_size=64, band=1)

    def sums(t: pa.Table) -> pa.Table:
        from ..stages.focal import _dtype_of

        xs, ys, cs = [], [], []
        for i in range(t.num_rows):
            a = np.frombuffer(t["data"][i].as_py(),
                              dtype=_dtype_of(t["dtype"][i].as_py()))
            a = a.reshape(t["height"][i].as_py(), t["width"][i].as_py())
            xs.append(t["x"][i].as_py())
            ys.append(t["y"][i].as_py())
            cs.append(cks_f.tile_checksum(a))
        return pa.table({"x": pa.array(xs, pa.int64()), "y": pa.array(ys, pa.int64()),
                         "checksum": pa.array(cs, pa.int64())})

    return tiles.map_batches(sums, batch_format="pyarrow")


def vector_partition_q(sf_dir: str):
    """Field-partitioned vector sink roundtrip (gdal vector partition,
    apps/gdalalg_vector_partition.cpp): zones partitioned by zone_key % 7
    into a hive tree (omit-partitioned-field + per-file feature limit so
    every partition spans several part files), read back with the field
    re-derived from the directory names, aggregated per partition."""
    import os
    import shutil
    import tempfile

    from ..sources import partition
    from ..stages.relational import partial_aggregate

    zones = _zones(sf_dir)
    keys = zones["zone_key"].to_numpy()
    layer = pa.table({
        "zone_key": zones["zone_key"],
        "grp": pa.array((keys % 7).astype(np.int64)),
        "wkb": zones["wkb"],
    })
    root = f"{tempfile.gettempdir()}/gdal_ray_vpart_{os.getpid()}"
    shutil.rmtree(root, ignore_errors=True)
    partition.vector_partition(rd.from_arrow(layer), root, "grp",
                               scheme="hive", feature_limit=50,
                               omit_field=True)
    back = partition.read_partitioned_vector(root, field="grp")

    def agg_rows(t: pa.Table) -> pa.Table:
        g = np.array([int(v) for v in t["grp"].to_pylist()], dtype=np.int64)
        return pa.table({"grp": pa.array(g),
                         "n_zones": pa.array(np.ones(t.num_rows, np.int64)),
                         "key_sum": pc.cast(t["zone_key"], pa.int64())})

    agg = partial_aggregate(back.map_batches(agg_rows, batch_format="pyarrow"),
                            ["grp"], sums=["n_zones", "key_sum"])
    return agg.map_batches(
        lambda t: t.rename_columns(["grp", "n_zones", "key_sum"]),
        batch_format="pyarrow")


def raster_attribute_table_q(sf_dir: str):
    """Raster attribute table (gcore/gdal_rat.cpp VALUE/COUNT/AREA) over
    the 'rects' classified fixture: per class value, exact pixel count and
    area at 0.25 world-units/pixel (scaled x4 ints)."""
    from ..stages import rastermap

    tiles = rd.from_arrow(synthetic.make_raster_tiles("rects", 4, 4,
                                                      size=64))
    return rastermap.raster_attribute_table(tiles, pixel_area=0.25,
                                            area_scale=4)


def overview_refresh_q(sf_dir: str):
    """Overview refresh (gdal raster overview refresh / gdaladdo --refresh,
    apps/gdalalg_raster_overview_refresh.cpp): the hump updated by a
    checker in base tile (2,2) only; refreshing that dirty footprint
    recomputes exactly ONE overview parent (1,1) — from one updated and
    three clean children.  All values are exact dyadics, so the 2x2
    average is bit-stable against the SQL mirror."""
    from ..stages import pyramid, rastermap

    dst = rd.from_arrow(synthetic.make_raster_tiles("hump", 4, 4, size=64))
    src_t = synthetic.make_raster_tiles("checker", 4, 4, size=64)
    xs = src_t["x"].to_numpy()
    ys = src_t["y"].to_numpy()
    win = (xs == 2) & (ys == 2)
    updated = rastermap.raster_update(
        dst, rd.from_arrow(src_t.filter(pa.array(win))))
    out = pyramid.refresh_overviews(updated, [(2, 2)], kernel="average")
    return _tile_checksum_rows(out)


def check_geometry_q(sf_dir: str):
    """Geometry validity report (gdal vector check-geometry,
    apps/gdalalg_vector_check_geometry.cpp; GEOSisValidDetail reason
    strings + error location): one synthetic defect class per part key —
    valid rect / bowtie ring / hole outside shell / degenerate ring — with
    closed-form reasons and error locations (scaled x2 for exact int
    hashing; the hole error location is the hole's first vertex)."""
    from ..functions import wkb as wkb_f
    from ..stages import geomops

    keys = np.sort(pq.read_table(f"{sf_dir}/part.parquet",
                                 columns=["p_partkey"])
                   ["p_partkey"].to_numpy().astype(np.int64))
    x0 = ((keys * 7) % 100).astype(np.float64)
    y0 = ((keys * 11) % 100).astype(np.float64)
    wkbs = []
    for k, xa, ya in zip(keys, x0, y0):
        m = int(k) % 4
        if m == 0:
            wkbs.append(wkb_f.encode_polygon([np.array(
                [[xa, ya], [xa + 2, ya], [xa + 2, ya + 2], [xa, ya + 2],
                 [xa, ya]])]))
        elif m == 1:
            wkbs.append(wkb_f.encode_polygon([np.array(
                [[xa, ya], [xa + 2, ya + 2], [xa + 2, ya], [xa, ya + 2],
                 [xa, ya]])]))
        elif m == 2:
            wkbs.append(wkb_f.encode_polygon([
                np.array([[xa, ya], [xa + 4, ya], [xa + 4, ya + 4],
                          [xa, ya + 4], [xa, ya]]),
                np.array([[xa + 10, ya + 10], [xa + 11, ya + 10],
                          [xa + 11, ya + 11], [xa + 10, ya + 11],
                          [xa + 10, ya + 10]])]))
        else:
            wkbs.append(wkb_f.encode_polygon([np.array(
                [[xa, ya], [xa + 1, ya], [xa, ya]])]))
    layer = rd.from_arrow(pa.table({"fid": pa.array(keys),
                                    "wkb": pa.array(wkbs, pa.binary())}))
    out = geomops.check_geometry(layer)

    def finish(t: pa.Table) -> pa.Table:
        lx = t["loc_x"].to_numpy(zero_copy_only=False)
        ly = t["loc_y"].to_numpy(zero_copy_only=False)
        return pa.table({
            "zone_key": pc.cast(t["id"], pa.int64()),
            "valid": pc.cast(t["valid"], pa.int64()),
            "reason": pc.fill_null(t["reason"], ""),
            "loc_x2": pa.array(np.where(np.isnan(lx), 0,
                                        np.round(lx * 2)).astype(np.int64)),
            "loc_y2": pa.array(np.where(np.isnan(ly), 0,
                                        np.round(ly * 2)).astype(np.int64)),
        })

    return out.map_batches(finish, batch_format="pyarrow")


def bpe_train_corpus_q(sf_dir: str):
    """BPE tokenizer training over the documents corpus (Sennrich et al.
    2016, the GPT-2 recipe): distributed bounded word histogram -> greedy
    merge learning -> the per-doc token counts under the TRAINED merges.
    Iterative (each merge depends on all prior re-tokenizations), so no
    SQL oracle — the driver records the rows-only check; the differential
    test vs a from-the-paper reference is tests/test_textops.py
    TestBPETraining."""
    from ..stages import textops

    docs = read_table(sf_dir, "documents", columns=["doc_id", "text"]) \
        if _docs_have_text(sf_dir) else None
    if docs is None:
        docs = _docs_spans_text(sf_dir)
    words = textops.word_histogram(docs, max_words=50_000)
    merges = textops.bpe_train_merges(words, n_merges=60)
    return textops.bpe_token_counts(docs, merges)


def _docs_have_text(sf_dir: str) -> bool:
    import pyarrow.parquet as _pq

    return "text" in _pq.read_schema(f"{sf_dir}/documents.parquet").names


def _docs_spans_text(sf_dir: str):
    """documents with text derived from the interleaved spans column."""
    docs = read_table(sf_dir, "documents")

    def flat(t: pa.Table) -> pa.Table:
        ids = t["doc_id"]
        texts = []
        for row in t["spans"].to_pylist():
            texts.append(" ".join((s.get("text") or "") for s in row))
        return pa.table({"doc_id": ids, "text": pa.array(texts)})

    return docs.map_batches(flat, batch_format="pyarrow")


def nodata_to_alpha_q(sf_dir: str):
    """nodata-to-alpha (gdal raster nodata-to-alpha,
    apps/gdalalg_raster_nodata_to_alpha.cpp): the hump (nodata 0 — zero
    only at its center pixel) gains a uint8 alpha band; per-(tile, band)
    checksums pin both the untouched data band and the mask."""
    from ..functions import checksum as cks_f
    from ..stages import rastermap
    from ..stages.focal import _dtype_of

    tiles = rd.from_arrow(synthetic.make_raster_tiles("hump", 4, 4, size=64))
    out = rastermap.nodata_to_alpha(tiles)

    def sums(t: pa.Table) -> pa.Table:
        xs, ys, bs, cs = [], [], [], []
        for i in range(t.num_rows):
            a = np.frombuffer(t["data"][i].as_py(),
                              dtype=_dtype_of(t["dtype"][i].as_py()))
            a = a.reshape(t["height"][i].as_py(), t["width"][i].as_py())
            xs.append(t["x"][i].as_py())
            ys.append(t["y"][i].as_py())
            bs.append(t["band"][i].as_py())
            cs.append(cks_f.tile_checksum(a))
        return pa.table({"x": pa.array(xs, pa.int64()),
                         "y": pa.array(ys, pa.int64()),
                         "band": pa.array(bs, pa.int64()),
                         "checksum": pa.array(cs, pa.int64())})

    return out.map_batches(sums, batch_format="pyarrow")


def clean_coverage_q(sf_dir: str):
    """Coverage cleaning (gdal vector clean-coverage,
    apps/gdalalg_vector_clean_coverage.cpp; GEOS CoverageCleaner
    merge-strategy=max-area): a chain of rectangles each overlapping its
    successor; every overlap is assigned to the larger rect (ties to the
    lower id) and erased from the other.  Cleaned areas are exact
    integers — the oracle is lag/lead window arithmetic."""
    from ..stages import layeralg

    keys = np.sort(pq.read_table(f"{sf_dir}/part.parquet",
                                 columns=["p_partkey"])
                   ["p_partkey"].to_numpy().astype(np.int64))
    i = np.arange(len(keys), dtype=np.int64)
    # dyadic (1/1024-degree) units keep every erase shoelace exact and the
    # chain inside the lon/lat cell domain
    u = 1.0 / 1024.0
    w = (11 + (keys % 4)).astype(np.float64)
    x0 = -90.0 + 10.0 * i * u
    x1 = x0 + w * u
    layer = pa.table({
        "fid": pa.array(keys),
        "wkb": pa.array(synthetic.rect_wkbs(x0, np.zeros(len(keys)),
                                            x1, np.full(len(keys), 10.0 * u)),
                        pa.binary()),
    })
    out = layeralg.clean_coverage(rd.from_arrow(layer), res=10,
                                  merge_strategy="max-area")

    def finish(t: pa.Table) -> pa.Table:
        a = t["clean_area"].to_numpy(zero_copy_only=False)
        return pa.table({"zone_key": pc.cast(t["id"], pa.int64()),
                         "clean_area": pa.array(
                             np.round(a * 1024.0 * 1024.0).astype(np.int64))})

    return out.map_batches(finish, batch_format="pyarrow")


def raster_update_q(sf_dir: str):
    """In-place raster update (gdal raster update,
    apps/gdalalg_raster_update.cpp): the 4x4-tile hump updated by a
    checker source covering only the center 2x2 window — checker nodata
    (0) pixels leave the hump untouched, tiles outside the window pass
    through, dtype follows the destination."""
    from ..stages import rastermap

    dst = rd.from_arrow(synthetic.make_raster_tiles("hump", 4, 4, size=64))
    src_t = synthetic.make_raster_tiles("checker", 4, 4, size=64)
    xs = src_t["x"].to_numpy()
    ys = src_t["y"].to_numpy()
    win = (xs >= 1) & (xs <= 2) & (ys >= 1) & (ys <= 2)
    src = rd.from_arrow(src_t.filter(pa.array(win)))
    out = rastermap.raster_update(dst, src)
    return _tile_checksum_rows(out)


def sozip_roundtrip_q(sf_dir: str):
    """SOZip seek-optimized zip (gdal vsi sozip, apps/gdalalg_vsi_sozip.cpp;
    port/cpl_minizip_zip.cpp index writer): the 192x192 hump as an AAIGrid
    text raster, SOZip-compressed with 4 KiB independent chunks, read back
    by PARALLEL range decompression (each task inflates only its chunks),
    reassembled, parsed and checksummed — format transparency through the
    seek-optimized container."""
    import os
    import tempfile

    from ..sources import aaigrid, sozip

    gy, gx = np.mgrid[0:192, 0:192]
    arr = (((gx - 96) ** 2 + (gy - 96) ** 2) / 64.0).astype(np.float32)
    root = tempfile.gettempdir()
    src = f"{root}/gdal_ray_sozip_{os.getpid()}.asc"
    arch = f"{root}/gdal_ray_sozip_{os.getpid()}.zip"
    if not os.path.exists(arch):
        aaigrid.write_asc(src, arr)
        sozip.sozip_create(arch, src, chunk_size=4096)
    chunks = sozip.read_sozip_chunks(arch).to_pandas().sort_values("chunk")
    back = f"{root}/gdal_ray_sozip_back_{os.getpid()}.asc"
    with open(back, "wb") as f:
        f.write(b"".join(chunks["data"]))
    tiles = aaigrid.read_asc_tiles(back, tile_size=64)
    return _tile_checksum_rows(tiles)


def vector_tindex_q(sf_dir: str):
    """ogrtindex / gdal vector index (apps/ogrtindex.cpp,
    gdalalg_vector_index.cpp): hive-partition the zone layer, then build
    the catalog index — per part directory, feature count + folded extent
    rectangle (exact 0.01-grid bounds -> scaled ints)."""
    import glob
    import os
    import shutil
    import tempfile

    from ..sources import openvector, partition
    from ..stages.relational import partial_aggregate

    zones = _zones(sf_dir)
    keys = zones["zone_key"].to_numpy()
    layer = pa.table({
        "zone_key": zones["zone_key"],
        "grp": pa.array((keys % 5).astype(np.int64)),
        "wkb": zones["wkb"],
    })
    root = f"{tempfile.gettempdir()}/gdal_ray_tindex_{os.getpid()}"
    shutil.rmtree(root, ignore_errors=True)
    partition.vector_partition(rd.from_arrow(layer), root, "grp",
                               scheme="hive", feature_limit=64)
    paths = sorted(glob.glob(os.path.join(root, "*", "*.parquet")))
    idx = openvector.vector_tile_index(paths, id_from_dir=True)

    def per_file(t: pa.Table) -> pa.Table:
        g = np.array([int(v) for v in t["part_key"].to_pylist()],
                     dtype=np.int64)
        sc = lambda c: np.round(
            t[c].to_numpy(zero_copy_only=False) * 100).astype(np.int64)
        return pa.table({"grp": pa.array(g),
                         "n_features": pc.cast(t["n_features"], pa.int64()),
                         "minx_100": pa.array(sc("minx")),
                         "miny_100": pa.array(sc("miny")),
                         "maxx_100": pa.array(sc("maxx")),
                         "maxy_100": pa.array(sc("maxy"))})

    agg = partial_aggregate(idx.map_batches(per_file, batch_format="pyarrow"),
                            ["grp"], sums=["n_features"],
                            mins=["minx_100", "miny_100"],
                            maxs=["maxx_100", "maxy_100"])
    return agg.map_batches(
        lambda t: t.rename_columns(["grp", "n_features", "minx_100",
                                    "miny_100", "maxx_100", "maxy_100"]),
        batch_format="pyarrow")


def check_coverage_q(sf_dir: str):
    """Coverage validation (gdal vector check-coverage,
    apps/gdalalg_vector_check_coverage.cpp; GEOS CoverageValidator overlap
    class): per zone rectangle, the number of other zones whose interior
    overlaps it and the exact scaled total overlap area — the rect layer
    makes the oracle a closed-form pairwise min/max product."""
    from ..stages import layeralg

    zones = _zones(sf_dir)
    layer = rd.from_arrow(pa.table({"fid": zones["zone_key"],
                                    "wkb": zones["wkb"]}))
    out = layeralg.check_coverage(layer, res=4)
    return out.map_batches(
        lambda t: t.rename_columns(["zone_key"] + t.column_names[1:]),
        batch_format="pyarrow")


def gnm_shortest_path_q(sf_dir: str):
    """GNM Dijkstra shortest path in bulk (gnm/gnmgraph.cpp
    DijkstraShortestPathTree; algorithm enum gnm/gnm.h:60): a 128x128 unit
    road grid with a wall between x=63 and x=64 open only at y=96; every
    part row maps to a target junction and gets its network distance from
    junction (0,0).  The engine runs real graph search over the edge list
    (broadcast CSR, per-actor SSSP, vectorized lookups); the oracle is the
    closed-form detour arithmetic the wall induces."""
    from ..stages import network

    n, wall_x, gap_y = 128, 63, 96
    xs, ys = np.meshgrid(np.arange(n), np.arange(n), indexing="xy")
    right_src = (ys[:, :-1] * n + xs[:, :-1]).ravel()
    blocked = (right_src % n == wall_x) & (right_src // n != gap_y)
    down_src = (ys[:-1, :] * n + xs[:-1, :]).ravel()
    edges = pa.table({
        "src": pa.array(np.concatenate([right_src[~blocked], down_src]),
                        pa.int64()),
        "dst": pa.array(np.concatenate([right_src[~blocked] + 1,
                                        down_src + n]), pa.int64())})

    parts = read_table(sf_dir, "part", columns=["p_partkey"])

    def to_nodes(t: pa.Table) -> pa.Table:
        k = t["p_partkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        node = (k * 29 % 128) * 128 + (k * 13 % 128)
        return pa.table({"zone_key": pa.array(k), "node": pa.array(node)})

    targets = parts.map_batches(to_nodes, batch_format="pyarrow")
    out = network.shortest_path_distances(targets, edges, source=0)

    def finish(t: pa.Table) -> pa.Table:
        d = t["net_dist"].to_numpy(zero_copy_only=False)
        # unreachable -> null -> NaN through to_numpy; map to -1 before the
        # int cast (all wall-grid targets are reachable, so this is a guard)
        d = np.where(np.isnan(d), -1.0, d)
        return pa.table({"zone_key": t["zone_key"],
                         "net_dist": pa.array(d.astype(np.int64))})

    return out.map_batches(finish, batch_format="pyarrow")


def gnm_components_q(sf_dir: str):
    """GNM connected components (GATConnectedComponents, gnm/gnm.h:62) via
    the engine's distributed min-label propagation: 16 disjoint 512-node
    chains (diameter 512 — the pointer-doubling stress shape), reduced to
    one (component, n_nodes) row each."""
    import ray.data as rd

    from ..stages import network
    from ..stages.relational import partial_aggregate

    n, chain = 8192, 512
    i = np.arange(n - 1)
    keep = (i % chain) != chain - 1
    edges = pa.table({"src": pa.array(i[keep], pa.int64()),
                      "dst": pa.array(i[keep] + 1, pa.int64())})
    labels = network.connected_components_net(rd.from_arrow(edges))

    def one(t: pa.Table) -> pa.Table:
        return pa.table({"component": pa.compute.cast(t["label"], pa.int64()),
                         "n_nodes": pa.array(np.ones(t.num_rows, np.int64))})

    agg = partial_aggregate(labels.map_batches(one, batch_format="pyarrow"),
                            ["component"], sums=["n_nodes"])
    return agg.map_batches(
        lambda t: t.rename_columns(["component", "n_nodes"]),
        batch_format="pyarrow")


def _mdim_cube_path() -> str:
    """Shared multidim fixture: v(t,y,x) = (7t + 5y + 3x) % 97 int32 at
    (12, 192, 192), written once per process through the in-repo netCDF
    classic container."""
    import os
    import tempfile

    from ..sources import netcdf3

    path = f"{tempfile.gettempdir()}/gdal_ray_mdim_cube_{os.getpid()}.nc"
    if not os.path.exists(path):
        t, y, x = np.meshgrid(np.arange(12), np.arange(192), np.arange(192),
                              indexing="ij")
        v = ((7 * t + 5 * y + 3 * x) % 97).astype(np.int32)
        netcdf3.write_netcdf3(path, {"v": (("time", "y", "x"), v)},
                              global_attrs={"Conventions": "CF-1.6"})
    return path


def mdim_time_sum_q(sf_dir: str):
    """Multidim axis reduction (gcore/gdalmultidim.cpp GDALMDArray;
    gdalmdimtranslate view pipeline): a (12, 192, 192) int32 time cube,
    read as (4, 64, 64) hyperslab chunks via windowed memmap, summed over
    the ``time`` dimension (per-chunk int64 partials + ONE keyed fold over
    the remaining (y, x) chunk grid), exported to classic raster tiles and
    checksummed — the exact-climatology workload end to end."""
    from ..stages import mdim

    ds, md = mdim.read_mdarray_chunks(_mdim_cube_path(), "v",
                                      {"time": 4, "y": 64, "x": 64})
    red, rmd = mdim.axis_reduce(ds, md, "time", "sum")
    return _tile_checksum_rows(mdim.to_raster_tiles(red, rmd))


def netcdf4_time_sum_q(sf_dir: str):
    """Round-5 netCDF4/HDF5 container path: the SAME (12, 192, 192) time
    cube written as a chunked+deflate HDF5 file (from-scratch writer,
    netCDF4-style dimension scales), read back through the from-scratch
    HDF5 reader (superblock/object-header/B-tree/fractal-heap parse,
    per-chunk deflate decode inside map_batches workers), time-summed and
    checksummed — identical closed form to mdim_time_sum, proving the
    netCDF4 container layer is lossless (frmts/hdf5/hdf5dataset.cpp +
    frmts/netcdf nc4 role; autotest/gdrivers/netcdf.py nc4 cases)."""
    import os
    import tempfile

    from ..sources import hdf5
    from ..stages import mdim

    path = f"{tempfile.gettempdir()}/gdal_ray_mdim_cube_{os.getpid()}.h5"
    if not os.path.exists(path):
        t, y, x = np.meshgrid(np.arange(12), np.arange(192),
                              np.arange(192), indexing="ij")
        v = ((7 * t + 5 * y + 3 * x) % 97).astype(np.int32)
        hdf5.write_hdf5(path, {"v": (("time", "y", "x"), v)},
                        chunks={"v": (4, 64, 64)}, compress="deflate")
    ds, md = mdim.read_mdarray_chunks(path, "v",
                                      {"time": 4, "y": 64, "x": 64})
    red, rmd = mdim.axis_reduce(ds, md, "time", "sum")
    return _tile_checksum_rows(mdim.to_raster_tiles(red, rmd))


def zarr_time_sum_q(sf_dir: str):
    """Round-5 Zarr v2 store (frmts/zarr analogue): the SAME time cube
    written as a chunked zlib Zarr v2 directory store (one object per
    chunk — the cloud-native layout), read back through the from-scratch
    store reader via the mdim surface, time-summed and checksummed —
    identical closed form to mdim_time_sum."""
    import os
    import tempfile

    from ..sources import zarr2
    from ..stages import mdim

    path = f"{tempfile.gettempdir()}/gdal_ray_cube_{os.getpid()}.zarr"
    if not os.path.exists(os.path.join(path, ".zmetadata")):
        t, y, x = np.meshgrid(np.arange(12), np.arange(192),
                              np.arange(192), indexing="ij")
        v = ((7 * t + 5 * y + 3 * x) % 97).astype(np.int32)
        zarr2.write_zarr(path, {"v": (("time", "y", "x"), v)},
                         chunks={"v": (4, 64, 64)})
    ds, md = mdim.read_mdarray_chunks(path, "v",
                                      {"time": 4, "y": 64, "x": 64})
    red, rmd = mdim.axis_reduce(ds, md, "time", "sum")
    return _tile_checksum_rows(mdim.to_raster_tiles(red, rmd))


def mdim_slice_transpose_q(sf_dir: str):
    """Multidim slice + transpose (gdalmdimtranslate -array view=[7,...],
    transposedView; GDALMDArray::Transpose): fix time=7, swap (y, x) ->
    (x, y) per chunk (no shuffle), export to raster tiles, checksum."""
    from ..stages import mdim

    ds, md = mdim.read_mdarray_chunks(_mdim_cube_path(), "v",
                                      {"time": 4, "y": 64, "x": 64})
    sl, smd = mdim.mdim_slice(ds, md, "time", 7)
    tr, tmd = mdim.transpose_chunks(sl, smd, ["x", "y"])
    return _tile_checksum_rows(mdim.to_raster_tiles(tr, tmd))


def mdim_mosaic_sum_q(sf_dir: str):
    """Multidim mosaic (gdal mdim mosaic, apps/gdalalg_mdim_mosaic.cpp):
    the time cube split across two files (t 0-7 and 8-11), concatenated
    along ``time`` by pure chunk-index rewrite (no pixel movement), then
    sum-reduced over the mosaic — same closed form as the single-file
    cube, proving the concat is lossless."""
    import os
    import tempfile

    from ..sources import netcdf3
    from ..stages import mdim

    paths = []
    for tag, t0, t1 in (("a", 0, 8), ("b", 8, 12)):
        path = (f"{tempfile.gettempdir()}/"
                f"gdal_ray_mdim_part{tag}_{os.getpid()}.nc")
        if not os.path.exists(path):
            t, y, x = np.meshgrid(np.arange(t0, t1), np.arange(192),
                                  np.arange(192), indexing="ij")
            v = ((7 * t + 5 * y + 3 * x) % 97).astype(np.int32)
            netcdf3.write_netcdf3(path, {"v": (("time", "y", "x"), v)})
        paths.append(path)
    chunks = {"time": 4, "y": 64, "x": 64}
    parts = [mdim.read_mdarray_chunks(p, "v", chunks) for p in paths]
    ds, md = mdim.mdim_concat(parts, "time")
    red, rmd = mdim.axis_reduce(ds, md, "time", "sum")
    return _tile_checksum_rows(mdim.to_raster_tiles(red, rmd))


def mdim_reproject_sum_q(sf_dir: str):
    """Multidim reprojection (gdal mdim reproject,
    apps/gdalalg_mdim_reproject.cpp): the 2-D warp applied to every time
    index of the cube — here a vertical-flip affine grid, nearest kernel —
    then the time-sum reduction over the WARPED cube.  The oracle is the
    flipped closed form."""
    from ..stages import mdim

    ds, md = mdim.read_mdarray_chunks(_mdim_cube_path(), "v",
                                      {"time": 4, "y": 64, "x": 64})
    warped, wmd = mdim.mdim_reproject(
        ds, md, src_gt=(0, 1, 0, 0, 0, 1), dst_gt=(0, 1, 0, 192, 0, -1),
        width=192, height=192, resample="nearest", tile=64)
    red, rmd = mdim.axis_reduce(warped, wmd, "time", "sum")
    return _tile_checksum_rows(mdim.to_raster_tiles(red, rmd))


def mdim_record_max_q(sf_dir: str):
    """Record-dimension (UNLIMITED) multidim pipeline: the same time cube
    written with ``time`` as the netCDF record dim (spec record layout —
    interleaved per-record slabs, numrecs in the header), chunk-read
    through the strided memmap path, max-reduced over time, checksummed.
    Exercises the layout real CF time-series files use
    (frmts/netcdf + gcore/gdalmultidim.cpp)."""
    import os
    import tempfile

    from ..sources import netcdf3
    from ..stages import mdim

    path = f"{tempfile.gettempdir()}/gdal_ray_mdim_rec_{os.getpid()}.nc"
    if not os.path.exists(path):
        t, y, x = np.meshgrid(np.arange(12), np.arange(192), np.arange(192),
                              indexing="ij")
        v = ((7 * t + 5 * y + 3 * x) % 97).astype(np.int32)
        netcdf3.write_netcdf3(path, {"v": (("time", "y", "x"), v)},
                              record_dim="time")
    ds, md = mdim.read_mdarray_chunks(path, "v",
                                      {"time": 4, "y": 64, "x": 64})
    red, rmd = mdim.axis_reduce(ds, md, "time", "max")
    return _tile_checksum_rows(mdim.to_raster_tiles(red, rmd))


def netcdf_roundtrip_q(sf_dir: str):
    """NetCDF classic driver (frmts/netcdf surface, from the published
    CDF-1 spec): the 192x192 hump as a float32 (y, x) variable with CF-ish
    attributes, written, re-read into engine tiles, checksummed with the
    shared hump oracle — format transparency through a third container."""
    import tempfile

    from ..functions import checksum as cks_f
    from ..sources import netcdf3

    import os

    gy, gx = np.mgrid[0:192, 0:192]
    arr = (((gx - 96) ** 2 + (gy - 96) ** 2) / 64.0).astype(np.float32)
    path = f"{tempfile.gettempdir()}/gdal_ray_hump_{os.getpid()}.nc"
    netcdf3.write_netcdf3(
        path, {"hump": (("y", "x"), arr)},
        global_attrs={"Conventions": "CF-1.6"},
        var_attrs={"hump": {"units": "1"}})
    tiles = netcdf3.read_netcdf3_tiles(path, "hump", tile_size=64)

    def sums(t: pa.Table) -> pa.Table:
        from ..stages.focal import _dtype_of

        xs, ys, cs = [], [], []
        for i in range(t.num_rows):
            a = np.frombuffer(t["data"][i].as_py(),
                              dtype=_dtype_of(t["dtype"][i].as_py()))
            a = a.reshape(t["height"][i].as_py(), t["width"][i].as_py())
            xs.append(t["x"][i].as_py())
            ys.append(t["y"][i].as_py())
            cs.append(cks_f.tile_checksum(a))
        return pa.table({"x": pa.array(xs, pa.int64()), "y": pa.array(ys, pa.int64()),
                         "checksum": pa.array(cs, pa.int64())})

    return tiles.map_batches(sums, batch_format="pyarrow")


def _tile_checksum_rows(tiles):
    """Shared roundtrip tail: tile Dataset -> (x, y, checksum) rows."""
    from ..functions import checksum as cks_f

    def sums(t: pa.Table) -> pa.Table:
        from ..stages.focal import _dtype_of

        xs, ys, cs = [], [], []
        for i in range(t.num_rows):
            a = np.frombuffer(t["data"][i].as_py(),
                              dtype=_dtype_of(t["dtype"][i].as_py()))
            a = a.reshape(t["height"][i].as_py(), t["width"][i].as_py())
            xs.append(t["x"][i].as_py())
            ys.append(t["y"][i].as_py())
            cs.append(cks_f.tile_checksum(a))
        return pa.table({"x": pa.array(xs, pa.int64()),
                         "y": pa.array(ys, pa.int64()),
                         "checksum": pa.array(cs, pa.int64())})

    return tiles.map_batches(sums, batch_format="pyarrow")


def bmp_roundtrip_q(sf_dir: str):
    """BMP driver (frmts/bmp/bmpdataset.cpp surface): the 192x192 hump
    folded to uint8 (mod 256) as an 8-bit palettized bottom-up BMP with
    4-byte row padding (192 divides evenly; padding is exercised in
    pytest), written, re-read into engine tiles, checksummed."""
    import os
    import tempfile

    from ..sources import bmp

    gy, gx = np.mgrid[0:192, 0:192]
    arr = ((((gx - 96) ** 2 + (gy - 96) ** 2) // 64) % 256).astype(np.uint8)
    path = f"{tempfile.gettempdir()}/gdal_ray_hump_{os.getpid()}.bmp"
    bmp.write_bmp(path, arr)
    return _tile_checksum_rows(bmp.read_bmp_tiles(path, tile_size=64))


def pnm_roundtrip_q(sf_dir: str):
    """Binary PGM driver (frmts/raw/pnmdataset.cpp surface): the full
    192x192 hump as 16-bit big-endian P5 (maxval 65535), written, re-read,
    checksummed with the shared hump oracle — value-transparent through
    the big-endian sample encoding."""
    import os
    import tempfile

    from ..sources import pnm

    gy, gx = np.mgrid[0:192, 0:192]
    arr = (((gx - 96) ** 2 + (gy - 96) ** 2) // 64).astype(np.uint16)
    path = f"{tempfile.gettempdir()}/gdal_ray_hump_{os.getpid()}.pgm"
    pnm.write_pnm(path, arr)
    return _tile_checksum_rows(pnm.read_pnm_tiles(path, tile_size=64))


def gif_roundtrip_q(sf_dir: str):
    """GIF driver (frmts/gif surface, from-spec LZW codec): the mod-256
    hump through variable-width LZW with INTERLACE=YES (four-pass row
    order), decoded back and checksummed — a lossless compressed codec on
    the graded path."""
    import os
    import tempfile

    from ..sources import gif

    gy, gx = np.mgrid[0:192, 0:192]
    arr = ((((gx - 96) ** 2 + (gy - 96) ** 2) // 64) % 256).astype(np.uint8)
    path = f"{tempfile.gettempdir()}/gdal_ray_hump_{os.getpid()}.gif"
    gif.write_gif(path, arr, interlace=True)
    return _tile_checksum_rows(gif.read_gif_tiles(path, tile_size=64))


def hgt_roundtrip_q(sf_dir: str):
    """SRTM HGT driver (frmts/srtmhgt surface): a full-size 1201x1201
    SRTM-3 tile (headerless big-endian int16, dimensions sniffed from the
    file size, georeference from the filename), scaled hump values,
    re-read via windowed memmap into 64-px engine tiles (clipped 49-px
    edge strips), checksummed per tile."""
    import tempfile

    import os

    from ..sources import hgt

    gy, gx = np.mgrid[0:1201, 0:1201]
    arr = (((gx - 600) ** 2 + (gy - 600) ** 2) // 256).astype(np.int16)
    path = f"{tempfile.gettempdir()}/gdal_ray_{os.getpid()}_N27E086.hgt"
    hgt.write_hgt(path, arr)
    return _tile_checksum_rows(hgt.read_hgt_tiles(path, tile_size=64))


def tga_roundtrip_q(sf_dir: str):
    """TGA driver (frmts/tga surface): the mod-256 hump through the
    RLE-compressed grayscale path (run + raw packets, top-down), decoded
    and checksummed with the shared mod-256 hump oracle."""
    import os
    import tempfile

    from ..sources import tga

    gy, gx = np.mgrid[0:192, 0:192]
    arr = ((((gx - 96) ** 2 + (gy - 96) ** 2) // 64) % 256).astype(np.uint8)
    path = f"{tempfile.gettempdir()}/gdal_ray_hump_{os.getpid()}.tga"
    tga.write_tga(path, arr, rle=True)
    return _tile_checksum_rows(tga.read_tga_tiles(path, tile_size=64))


def bmp_rle_roundtrip_q(sf_dir: str):
    """BMP BI_RLE8 path (frmts/bmp BMPC_RLE8): the same mod-256 hump
    through run-length encoding — encoded runs, EOL/EOB markers."""
    import os
    import tempfile

    from ..sources import bmp

    gy, gx = np.mgrid[0:192, 0:192]
    arr = ((((gx - 96) ** 2 + (gy - 96) ** 2) // 64) % 256).astype(np.uint8)
    path = f"{tempfile.gettempdir()}/gdal_ray_hump_{os.getpid()}_rle.bmp"
    bmp.write_bmp_rle8(path, arr)
    return _tile_checksum_rows(bmp.read_bmp_tiles(path, tile_size=64))


def png_filters_roundtrip_q(sf_dir: str):
    """PNG filter types (PNG spec 9.4): the mod-256 hump encoded with the
    Paeth filter on every scanline, unfiltered back through the full
    spec decoder (Sub/Up/Average/Paeth reconstruction), checksummed."""
    import os
    import tempfile

    from ..sources import png as pngmod

    gy, gx = np.mgrid[0:192, 0:192]
    arr = ((((gx - 96) ** 2 + (gy - 96) ** 2) // 64) % 256).astype(np.uint8)
    path = f"{tempfile.gettempdir()}/gdal_ray_hump_{os.getpid()}_f4.png"
    with open(path, "wb") as f:
        f.write(pngmod.encode_png(arr, filter_type=4))
    with open(path, "rb") as f:
        back = pngmod.decode_png(f.read())
    assert np.array_equal(arr, back)
    import ray.data as rd2

    rows = []
    for ty in range(3):
        for tx in range(3):
            sub = back[ty * 64:(ty + 1) * 64, tx * 64:(tx + 1) * 64]
            rows.append({"z": 4, "x": tx, "y": ty, "band": 1,
                         "width": 64, "height": 64, "crs": "EPSG:3857",
                         "nodata": 0.0, "dtype": "uint8",
                         "data": sub.tobytes()})
    return _tile_checksum_rows(rd2.from_arrow(pa.Table.from_pylist(rows)))


def dted_roundtrip_q(sf_dir: str):
    """DTED driver (frmts/dted/dted_api.c surface): a DTED0 121x121 cell
    with a signed hump (negative collar exercises the signed-magnitude
    sample encoding), written with per-column records + byte-sum
    checksums, re-read (checksums verified) into engine tiles, and
    checksummed — 57-px clipped edge tiles."""
    import os
    import tempfile

    from ..sources import dted

    gy, gx = np.mgrid[0:121, 0:121]
    arr = ((((gx - 60) ** 2 + (gy - 60) ** 2) // 16) - 200).astype(np.int16)
    path = f"{tempfile.gettempdir()}/gdal_ray_{os.getpid()}_n45e010.dt0"
    dted.write_dted(path, arr, lon0=10, lat0=45, interval_tenths=300)
    arr2, _ = dted.read_dted(path, verify_checksum=True)
    assert np.array_equal(arr, arr2)
    return _tile_checksum_rows(dted.read_dted_tiles(path, tile_size=64))


def gtiff_roundtrip_q(sf_dir: str):
    """GeoTIFF driver: serialize the 160x160 hump (float32, exact dyadic
    rationals) as a TILED uncompressed GeoTIFF (64-px tiles -> padded edge
    tiles on the right/bottom), range-read it back through the IFD-manifest
    Ray path, and checksum per clipped tile — write, tile padding/trimming,
    and the distributed read plan are all on the graded path."""
    import os
    import tempfile

    from ..functions import checksum as cks_f
    from ..sources import gtiff

    gy, gx = np.mgrid[0:160, 0:160]
    arr = (((gx - 80) ** 2 + (gy - 80) ** 2) / 64.0).astype(np.float32)
    path = f"{tempfile.gettempdir()}/gdal_ray_hump_{os.getpid()}.tif"
    gtiff.write_gtiff(path, arr, tile_size=64, nodata=-9999.0)
    tiles = gtiff.read_gtiff_tiles(path)

    def sums(t: pa.Table) -> pa.Table:
        from ..stages.focal import _dtype_of

        xs, ys, cs = [], [], []
        for i in range(t.num_rows):
            a = np.frombuffer(t["data"][i].as_py(),
                              dtype=_dtype_of(t["dtype"][i].as_py()))
            a = a.reshape(t["height"][i].as_py(), t["width"][i].as_py())
            xs.append(t["x"][i].as_py())
            ys.append(t["y"][i].as_py())
            cs.append(cks_f.tile_checksum(a))
        return pa.table({"x": pa.array(xs, pa.int64()), "y": pa.array(ys, pa.int64()),
                         "checksum": pa.array(cs, pa.int64())})

    return tiles.map_batches(sums, batch_format="pyarrow")


def gtiff_stream_roundtrip_q(sf_dir: str):
    """Round-4 STREAMING GeoTIFF sink roundtrip: the same 160x160 float32
    hump as gtiff_roundtrip, but written by write_gtiff_tiles_streaming —
    the driver lays out header+IFD only and worker tasks pwrite their
    tiles at preallocated offsets (pixels never transit the driver) —
    then range-read back and checksummed per clipped tile (same oracle
    as gtiff_roundtrip by construction)."""
    import os
    import tempfile

    from ..functions import checksum as cks_f
    from ..sources import gtiff

    ts, n = 64, 3
    W = H = 160
    path = f"{tempfile.gettempdir()}/gdal_ray_stream_{os.getpid()}.tif"

    def gen(t: pa.Table) -> pa.Table:
        rows = []
        for i in t["id"].to_pylist():
            tx, ty = i % n, i // n
            w = min(ts, W - tx * ts)
            h = min(ts, H - ty * ts)
            gy, gx = np.mgrid[ty * ts:ty * ts + h, tx * ts:tx * ts + w]
            sub = (((gx - 80) ** 2 + (gy - 80) ** 2) / 64.0).astype(np.float32)
            rows.append({"x": tx, "y": ty, "width": w, "height": h,
                         "dtype": "float32",
                         "data": np.ascontiguousarray(sub).tobytes()})
        return pa.Table.from_pylist(rows)

    tiles_in = rd.range(n * n).map_batches(gen, batch_format="pyarrow")
    gtiff.write_gtiff_tiles_streaming(tiles_in, path, width=W, height=H,
                                      tile_size=ts, dtype="float32",
                                      nodata=-9999.0)
    tiles = gtiff.read_gtiff_tiles(path)

    def sums(t: pa.Table) -> pa.Table:
        from ..stages.focal import _dtype_of

        xs, ys, cs = [], [], []
        for i in range(t.num_rows):
            a = np.frombuffer(t["data"][i].as_py(),
                              dtype=_dtype_of(t["dtype"][i].as_py()))
            a = a.reshape(t["height"][i].as_py(), t["width"][i].as_py())
            xs.append(t["x"][i].as_py())
            ys.append(t["y"][i].as_py())
            cs.append(cks_f.tile_checksum(a))
        return pa.table({"x": pa.array(xs, pa.int64()), "y": pa.array(ys, pa.int64()),
                         "checksum": pa.array(cs, pa.int64())})

    return tiles.map_batches(sums, batch_format="pyarrow")


def warp_affine_q(sf_dir: str):
    """gdalwarp -te 5 5 35 35 -tr 0.375 0.375 (arbitrary target grid, not
    XYZ tiles): linear-ramp source on a 0.25-deg grid, bilinear regrid to a
    non-commensurate 80x80 destination; per-dst-tile checksums.  All values
    are exact dyadic rationals, so the oracle's tap-formula mirror is
    bit-identical."""
    from ..stages import pyramid

    row = np.arange(160, dtype=np.float64)
    arr = row[None, :] + 2.0 * row[:, None]  # v(col,row) = col + 2*row
    src = pyramid.SourceRaster(arr, gt=(0.0, 0.25, 0.0, 40.0, 0.0, -0.25),
                               nodata=-1.0)
    out = pyramid.warp_affine(src, dst_gt=(5.0, 0.375, 0.0, 35.0, 0.0, -0.375),
                              width=80, height=80, resample="bilinear")
    return out.select_columns(["x", "y", "checksum"])


def _hump_tile_checksums(tiles):
    """Per-tile GDALChecksumImage rows shared by the gtiff codec queries."""
    from ..functions import checksum as cks_f

    def sums(t: pa.Table) -> pa.Table:
        from ..stages.focal import _dtype_of

        xs, ys, cs = [], [], []
        for i in range(t.num_rows):
            a = np.frombuffer(t["data"][i].as_py(),
                              dtype=_dtype_of(t["dtype"][i].as_py()))
            a = a.reshape(t["height"][i].as_py(), t["width"][i].as_py())
            xs.append(t["x"][i].as_py())
            ys.append(t["y"][i].as_py())
            cs.append(cks_f.tile_checksum(a))
        return pa.table({"x": pa.array(xs, pa.int64()),
                         "y": pa.array(ys, pa.int64()),
                         "checksum": pa.array(cs, pa.int64())})

    return tiles.map_batches(sums, batch_format="pyarrow")


def gtiff_lzw_roundtrip_q(sf_dir: str):
    """Round-5 GTiff compression breadth: the 160x160 hump as uint16,
    written TILED with Compression=5 (TIFF 6.0 LZW, early-change) +
    Predictor=2 (horizontal differencing), range-read back through the
    manifest Ray path and checksummed per clipped tile (reference:
    frmts/gtiff COMPRESS=LZW + TIFFTAG_PREDICTOR; autotest
    gcore/tiff_read.py LZW cases)."""
    import os
    import tempfile

    from ..sources import gtiff

    gy, gx = np.mgrid[0:160, 0:160]
    arr = (((gx - 80) ** 2 + (gy - 80) ** 2) // 64).astype(np.uint16)
    path = f"{tempfile.gettempdir()}/gdal_ray_lzw_{os.getpid()}.tif"
    gtiff.write_gtiff(path, arr, tile_size=64, nodata=-9999.0,
                      compress="lzw", predictor=2)
    return _hump_tile_checksums(gtiff.read_gtiff_tiles(path))


def cog_roundtrip_q(sf_dir: str):
    """Round-5 Cloud-Optimized GeoTIFF: the uint16 hump written by
    write_cog (IFDs-before-data ghost-area layout, internal overviews,
    smallest-overview-first tile placement with size leaders/trailers —
    frmts/gtiff/cogdriver.cpp), validated with the engine's
    validate_cloud_optimized_geotiff-equivalent checks, then the full-res
    image range-read back through the manifest path and checksummed."""
    import os
    import tempfile

    from ..sources import gtiff

    gy, gx = np.mgrid[0:160, 0:160]
    arr = (((gx - 80) ** 2 + (gy - 80) ** 2) // 64).astype(np.uint16)
    path = f"{tempfile.gettempdir()}/gdal_ray_cog_{os.getpid()}.tif"
    gtiff.write_cog(path, arr, tile_size=64, nodata=-9999.0,
                    compress="deflate", predictor=2)
    v = gtiff.validate_cog(path)
    if not v["valid"]:
        raise AssertionError(f"COG layout invalid: {v['errors']}")
    return _hump_tile_checksums(gtiff.read_gtiff_tiles(path))


def gtiff_overviews_q(sf_dir: str):
    """gdaladdo -r average 2 4 (apps/gdaladdo.cpp): integer hump 192x192
    uint16 GeoTIFF -> distributed per-tile decimation -> internal-overview
    IFDs appended in place -> both levels range-read back through the
    manifest path -> per-tile checksums.  The oracle recomputes the
    round-half-up block averages and the clipped-tile checksum weights."""
    import os
    import tempfile

    from ..functions import checksum as cks_f
    from ..sources import gtiff

    gy, gx = np.mgrid[0:192, 0:192]
    arr = (((gx - 96) ** 2 + (gy - 96) ** 2) // 64).astype(np.uint16)
    path = f"{tempfile.gettempdir()}/gdal_ray_ovr_{os.getpid()}.tif"
    gtiff.write_gtiff(path, arr, tile_size=64)
    gtiff.gtiff_build_overviews(path, levels=(2, 4), kernel="average")

    def sums(level: int):
        def fn(t: pa.Table) -> pa.Table:
            rows = []
            for i in range(t.num_rows):
                a = np.frombuffer(t["data"][i].as_py(), dtype=np.uint16)
                a = a.reshape(t["height"][i].as_py(), t["width"][i].as_py())
                rows.append({"level": level, "x": t["x"][i].as_py(),
                             "y": t["y"][i].as_py(),
                             "checksum": cks_f.tile_checksum(a)})
            return pa.Table.from_pylist(rows)
        return fn

    ov2 = gtiff.read_gtiff_tiles(path, image=1).map_batches(
        sums(2), batch_format="pyarrow")
    ov4 = gtiff.read_gtiff_tiles(path, image=2).map_batches(
        sums(4), batch_format="pyarrow")
    return ov2.union(ov4)


def shp_roundtrip_q(sf_dir: str):
    """Shapefile driver: write the zones layer (polygon WKB + C/N attribute
    fields) to .shp/.shx/.dbf, stream it back through the shx-manifest Ray
    path, and emit per-feature attribute echo + exact 0.01-grid vertex sums —
    the OGR shapefile read/write surface on the graded path."""
    import os
    import tempfile

    from ..sources import shapefile as shp_drv

    zones = _zones(sf_dir)
    base = f"{tempfile.gettempdir()}/gdal_ray_zones_{os.getpid()}"
    shp_drv.write_shapefile(
        base, zones["wkb"].to_pylist(),
        pa.table({"zone_id": zones["zone_id"], "zone_key": zones["zone_key"]}))
    return _zones_vertex_verify(
        shp_drv.read_shapefile_dataset(base, records_per_block=512))


def geoparquet_roundtrip_q(sf_dir: str):
    """GeoParquet driver (ogr/ogrsf_frmts/parquet writer surface, OGC
    GeoParquet 1.1): zones stream through the per-file-'geo'-metadata sink
    and back; emits the shared vertex-sum verification PLUS one metadata
    row carrying the footer-folded dataset bbox (0.01-grid ints) and
    geometry-type count — proving the spec metadata round-trips without
    reading rows."""
    import os
    import tempfile

    from ..sources import geoparquet as gpq

    zones = _zones(sf_dir)
    root = f"{tempfile.gettempdir()}/gdal_ray_geoparquet_{os.getpid()}"
    import shutil

    shutil.rmtree(root, ignore_errors=True)
    for _ in gpq.write_geoparquet(rd.from_arrow(zones),
                                  root).iter_batches():
        pass
    meta = gpq.read_geo_metadata(root)
    verify = _zones_vertex_verify(gpq.read_geoparquet(root))

    def add_meta(t: pa.Table) -> pa.Table:
        n = t.num_rows
        return pa.table({
            **{c: t[c] for c in t.column_names},
            "bbox_sum_x100": pa.array(
                [int(sum(np.floor(v * 100.0 + 0.5)
                         for v in meta["bbox"]))] * n, pa.int64()),
            "n_geom_types": pa.array(
                [len(meta["geometry_types"])] * n, pa.int64()),
        })

    return verify.map_batches(add_meta, batch_format="pyarrow")


def retile_q(sf_dir: str):
    """gdal_retile -ps 50x50 -overlap 10 over the 3x3 ramp mosaic: output
    origins advance by 40 px; edge tiles clip.  Per-output-tile checksums
    (local weights over the clipped size) are the golden."""
    from ..stages import rastermap

    tiles = rd.from_arrow(synthetic.make_raster_tiles("ramp", 3, 3, size=64))
    out = rastermap.retile(tiles, tile_size=64, out_size=50, overlap=10,
                           nx=3, ny=3)
    return out.select_columns(["x", "y", "width", "height", "checksum"])


def line_interpolate_q(sf_dir: str):
    """OGR_G_Value / ST_LineInterpolatePoint: the point 30% of the way along
    each zone ring; tie-safe 1e-7-deg quantization."""
    from ..stages import geomops

    zones = rd.from_arrow(_zones(sf_dir))

    def fn(t: pa.Table) -> pa.Table:
        out = geomops.line_interpolate_batch(t.select(["zone_key", "wkb"]), 0.3)
        return pa.table({
            "zone_key": out["zone_key"],
            "px_e7": pa.array(np.floor(
                out["pt_x"].to_numpy(zero_copy_only=False) * 1e7 + 0.5).astype(np.int64)),
            "py_e7": pa.array(np.floor(
                out["pt_y"].to_numpy(zero_copy_only=False) * 1e7 + 0.5).astype(np.int64)),
        })

    return zones.map_batches(fn, batch_format="pyarrow")


def lineref_points_q(sf_dir: str):
    """ogrlineref -create (apps/ogrlineref.cpp): reference points every
    0.97 deg along each zone ring with their measures; one input feature
    explodes to floor(perimeter/0.97)+1 point rows.  flat-map shape — no
    shuffle, the explosion stays inside the batch."""
    from ..stages import geomops

    zones = rd.from_arrow(_zones(sf_dir))

    def fn(t: pa.Table) -> pa.Table:
        out = geomops.line_points_along_batch(
            t.select(["zone_key", "wkb"]), 0.97)
        return pa.table({
            "zone_key": out["zone_key"],
            "m_e2": pa.array(np.floor(
                out["m"].to_numpy(zero_copy_only=False) * 100.0 + 0.5
            ).astype(np.int64)),
            "px_e7": pa.array(np.floor(
                out["pt_x"].to_numpy(zero_copy_only=False) * 1e7 + 0.5
            ).astype(np.int64)),
            "py_e7": pa.array(np.floor(
                out["pt_y"].to_numpy(zero_copy_only=False) * 1e7 + 0.5
            ).astype(np.int64)),
        })

    return zones.map_batches(fn, batch_format="pyarrow")


def line_locate_q(sf_dir: str):
    """ST_LineLocatePoint over every zone ring: a key-derived probe point
    (lands in all 9 sectors around/inside the rectangle) is projected onto
    the ring; emits nearest edge, fraction-along, and distance (1e-7 fixed
    point).  Inverse of line_interpolate."""
    from ..stages import geomops

    zones = rd.from_arrow(_zones(sf_dir))

    def fn(t: pa.Table) -> pa.Table:
        k = t["zone_key"].to_numpy(zero_copy_only=False).astype(np.int64)
        minx = t["minx"].to_numpy(zero_copy_only=False)
        miny = t["miny"].to_numpy(zero_copy_only=False)
        wl = t["maxx"].to_numpy(zero_copy_only=False) - minx
        hl = t["maxy"].to_numpy(zero_copy_only=False) - miny
        px = minx + ((k * 37) % 300) / 100.0 * wl
        py = miny + (((k * 53) % 300) / 100.0 - 1.0) * hl
        t = t.append_column("px", pa.array(px)).append_column("py", pa.array(py))
        out = geomops.line_locate_batch(t)
        return out.select(["zone_key", "edge", "frac_e7", "dist_e7"])

    return zones.map_batches(fn, batch_format="pyarrow")


def convex_hull_q(sf_dir: str):
    """Graded convex hull (ogrgeometry.cpp:4449): per zone, the hull of its
    4 corners plus 3 key-derived strictly-interior points must be exactly the
    corner ring; emits vertex count and ring-ordered coordinate sums."""
    from ..stages import geomops

    zones = rd.from_arrow(_zones(sf_dir))

    def fn(t: pa.Table) -> pa.Table:
        k = t["zone_key"].to_numpy(zero_copy_only=False).astype(np.int64)
        minx = t["minx"].to_numpy(zero_copy_only=False)
        miny = t["miny"].to_numpy(zero_copy_only=False)
        maxx = t["maxx"].to_numpy(zero_copy_only=False)
        maxy = t["maxy"].to_numpy(zero_copy_only=False)
        wl, hl = maxx - minx, maxy - miny
        nv, sx, sy = [], [], []
        for i in range(t.num_rows):
            fx = ((int(k[i]) * 13) % 70 + 15) / 100.0
            fy = ((int(k[i]) * 29) % 70 + 15) / 100.0
            pts = np.array([
                [minx[i], miny[i]], [maxx[i], miny[i]],
                [maxx[i], maxy[i]], [minx[i], maxy[i]],
                [minx[i] + fx * wl[i], miny[i] + fy * hl[i]],
                [minx[i] + fy * wl[i], miny[i] + fx * hl[i]],
                [minx[i] + 0.5 * wl[i], miny[i] + 0.5 * hl[i]],
            ])
            hull = geomops.convex_hull(pts)
            nv.append(len(hull))
            sx.append(int(np.floor(float(np.sum(hull[:, 0])) * 1e7 + 0.5)))
            sy.append(int(np.floor(float(np.sum(hull[:, 1])) * 1e7 + 0.5)))
        return pa.table({
            "zone_key": t["zone_key"],
            "n_vertices": pa.array(nv, pa.int64()),
            "sx_e7": pa.array(sx, pa.int64()),
            "sy_e7": pa.array(sy, pa.int64()),
        })

    return zones.map_batches(fn, batch_format="pyarrow")


def boundary_q(sf_dir: str):
    """OGR Boundary (ogrgeometry.cpp:4825) graded: each zone ring's boundary
    length (= perimeter) plus the boundary vertex count."""
    from ..functions import wkb as wkbf
    from ..stages import geomops

    zones = rd.from_arrow(_zones(sf_dir))

    def fn(t: pa.Table) -> pa.Table:
        out = geomops.boundary_batch(t.select(["zone_key", "wkb"]))
        nv = [len(wkbf.decode(w).parts[0]) if w else 0
              for w in out["boundary_wkb"].to_pylist()]
        blen = out["boundary_len"].to_numpy(zero_copy_only=False)
        return pa.table({
            "zone_key": t["zone_key"],
            "n_vertices": pa.array(nv, pa.int64()),
            "blen_e7": pa.array(np.floor(blen * 1e7 + 0.5).astype(np.int64)),
        })

    return zones.map_batches(fn, batch_format="pyarrow")


def simplify_roundtrip_q(sf_dir: str):
    """Densify-then-simplify roundtrip: segmentize each zone ring at max
    spacing 0.7 and Douglas-Peucker simplify at tolerance 0.01 — the interior
    collinear vertices must vanish, recovering exactly the 5 corner vertices
    (ogr Simplify, ogrgeometry.cpp:6778).  Emits the vertex count and the
    ring's vertex-coordinate sums (1e-7 fixed point)."""
    from ..functions import wkb as wkbf
    from ..stages import geomops

    zones = rd.from_arrow(_zones(sf_dir))

    def fn(t: pa.Table) -> pa.Table:
        dens = geomops.segmentize_batch(t.select(["zone_key", "wkb"]), 0.7)
        simp = geomops.simplify_batch(dens, 0.01)
        nv, sx, sy = [], [], []
        for w in simp["wkb"].to_pylist():
            ring = wkbf.decode(w).parts[0][0]
            nv.append(len(ring))
            sx.append(int(np.floor(float(np.sum(ring[:, 0])) * 1e7 + 0.5)))
            sy.append(int(np.floor(float(np.sum(ring[:, 1])) * 1e7 + 0.5)))
        return pa.table({
            "zone_key": t["zone_key"],
            "n_vertices": pa.array(nv, pa.int64()),
            "sx_e7": pa.array(sx, pa.int64()),
            "sy_e7": pa.array(sy, pa.int64()),
        })

    return zones.map_batches(fn, batch_format="pyarrow")


def explode_collections_q(sf_dir: str):
    """Graded explode-collections (apps/gdalalg_vector_explode_collections.h):
    zone rings paired by zone_key//2 into MULTIPOLYGONs, exploded back to one
    row per part; each part's first vertex identifies it exactly."""
    from ..functions import wkb as wkbf
    from ..stages import geomops

    zones = _zones(sf_dir)
    keys = zones["zone_key"].to_numpy()
    groups: dict[int, list] = {}
    for i, k in enumerate(keys):
        groups.setdefault(int(k) // 2, []).append(
            wkbf.decode(zones["wkb"][i].as_py()).parts[0])
    pair_keys, blobs = [], []
    for pk in sorted(groups):
        pair_keys.append(pk)
        blobs.append(wkbf.encode_multipolygon(groups[pk]))
    multis = pa.table({
        "pair_key": pa.array(pair_keys, pa.int64()),
        "wkb": pa.array(blobs, pa.binary()),
    })
    exploded = geomops.explode_collections(rd.from_arrow(multis))

    def first_vertex(t: pa.Table) -> pa.Table:
        xs, ys = [], []
        for w in t["wkb"].to_pylist():
            p0 = wkbf.decode(w).parts[0][0][0]
            xs.append(int(np.floor(p0[0] * 1e7 + 0.5)))
            ys.append(int(np.floor(p0[1] * 1e7 + 0.5)))
        return pa.table({
            "pair_key": t["pair_key"],
            "x0_e7": pa.array(xs, pa.int64()),
            "y0_e7": pa.array(ys, pa.int64()),
        })

    return exploded.map_batches(first_vertex, batch_format="pyarrow")


def geom_transforms_q(sf_dir: str):
    """Graded segmentize / swap-xy / set-precision (apps/gdalalg_vector_
    segmentize.h, ogrgeometry SwapXY / SetPrecision): per zone ring, the
    densified vertex count at max spacing 0.7, the first vertex after
    swap-xy, and the first vertex after snapping to a 0.03 grid (grid chosen
    so no coordinate lands on an exact .5 rounding boundary — np.round is
    half-even, SQL round is half-away; they agree everywhere else)."""
    from ..functions import wkb as wkbf
    from ..stages import geomops

    zones = rd.from_arrow(_zones(sf_dir))

    def fn(t: pa.Table) -> pa.Table:
        base = t.select(["zone_key", "wkb"])
        seg = geomops.segmentize_batch(base, 0.7)
        sw = geomops.swap_xy_batch(base)
        sp = geomops.set_precision_batch(base, 0.03)
        nv, swx, swy, spx, spy = [], [], [], [], []
        for i in range(t.num_rows):
            nv.append(len(wkbf.decode(seg["wkb"][i].as_py()).parts[0][0]))
            p_sw = wkbf.decode(sw["wkb"][i].as_py()).parts[0][0][0]
            p_sp = wkbf.decode(sp["wkb"][i].as_py()).parts[0][0][0]
            swx.append(int(np.floor(p_sw[0] * 1e7 + 0.5)))
            swy.append(int(np.floor(p_sw[1] * 1e7 + 0.5)))
            spx.append(int(np.floor(p_sp[0] * 1e7 + 0.5)))
            spy.append(int(np.floor(p_sp[1] * 1e7 + 0.5)))
        return pa.table({
            "zone_key": t["zone_key"],
            "n_seg_vertices": pa.array(nv, pa.int64()),
            "sw_x0_e7": pa.array(swx, pa.int64()),
            "sw_y0_e7": pa.array(swy, pa.int64()),
            "sp_x0_e7": pa.array(spx, pa.int64()),
            "sp_y0_e7": pa.array(spy, pa.int64()),
        })

    return zones.map_batches(fn, batch_format="pyarrow")


def line_substring_q(sf_dir: str):
    """ST_LineSubstring over every zone ring: endpoints + vertex count of the
    [0.2, 0.55] measure range."""
    from ..stages import geomops

    zones = rd.from_arrow(_zones(sf_dir))

    def fn(t: pa.Table) -> pa.Table:
        out = geomops.line_substring_batch(t.select(["zone_key", "wkb"]), 0.2, 0.55)
        return out.select(
            ["zone_key", "n_vertices", "p0x_e7", "p0y_e7", "p1x_e7", "p1y_e7"])

    return zones.map_batches(fn, batch_format="pyarrow")


def layer_info_q(sf_dir: str):
    """ogrinfo -so summary of the zones layer: feature count, layer extent
    (aggregate of per-feature bboxes), geometry type."""
    from ray.data.aggregate import Count, Max, Min

    from ..stages import geomops

    zones = rd.from_arrow(_zones(sf_dir))
    boxed = zones.map_batches(
        lambda t: geomops.bbox_batch(t.select(["zone_key", "wkb"])).drop_columns(["wkb"]),
        batch_format="pyarrow",
    )
    res = boxed.aggregate(
        Count(alias_name="n_features"),
        Min("minx", alias_name="ext_minx"), Min("miny", alias_name="ext_miny"),
        Max("maxx", alias_name="ext_maxx"), Max("maxy", alias_name="ext_maxy"),
    )
    return pa.table({
        "n_features": pa.array([res["n_features"]], pa.int64()),
        "ext_minx": pa.array([res["ext_minx"]], pa.float64()),
        "ext_miny": pa.array([res["ext_miny"]], pa.float64()),
        "ext_maxx": pa.array([res["ext_maxx"]], pa.float64()),
        "ext_maxy": pa.array([res["ext_maxy"]], pa.float64()),
        "geom_type": pa.array(["POLYGON"]),
    })


def quantiles_quantity_q(sf_dir: str):
    """Exact distributed quantiles of l_quantity (rank = floor(p*(n-1)) + 1,
    'lower' interpolation) via relational.exact_quantiles: the
    distinct-count pre-check routes this discrete column to the
    value-histogram plan; continuous columns refine bounded histograms
    instead of collecting the distinct set (round-4 guard)."""
    ds = read_table(sf_dir, "lineitem", columns=["l_quantity"])
    ds = ds.map_batches(
        lambda t: pa.table({"v": pc.cast(t["l_quantity"], pa.int64())}),
        batch_format="pyarrow",
    )
    out = relational.exact_quantiles(ds, "v")
    return pa.table({k: pa.array([int(v)], pa.int64())
                     for k, v in out.items()})


def quantiles_continuous_q(sf_dir: str):
    """Exact quantiles of the CONTINUOUS o_totalprice column (float64, one
    distinct value per row at scale): histogram-refinement rounds with an
    O(bins) driver fold per round — never a distinct-value collect.
    Output cents-quantized for the oracle."""
    ds = read_table(sf_dir, "orders", columns=["o_totalprice"])
    out = relational.exact_quantiles(ds, "o_totalprice", max_distinct=4096)
    t = {"n": pa.array([out["n"]], pa.int64())}
    for p in (25, 50, 75, 90):
        t[f"q{p}_cents"] = pa.array(
            [int(np.round(out[f"q{p}"] * 100.0))], pa.int64())
    return pa.table(t)


def group_quantiles_q(sf_dir: str):
    """Exact per-group quantiles (PERCENTILE_DISC per l_returnflag) via the
    value-histogram plan — see relational.group_quantiles."""
    ds = read_table(sf_dir, "lineitem", columns=["l_returnflag", "l_quantity"])
    return relational.group_quantiles(ds, "l_returnflag", "l_quantity")


def geodesic_measures_q(sf_dir: str):
    """Geodesic (spherical) area + perimeter of every zone polygon — the
    get_GeodesicArea/Length surface on the authalic sphere."""
    from ..stages import geomops

    zones = rd.from_arrow(_zones(sf_dir))
    out = zones.map_batches(geomops.geodesic_measures_batch, batch_format="pyarrow")
    return out.select_columns(["zone_key", "geo_area_10m2", "geo_perim_m"])


def geodesic_ellipsoidal_q(sf_dir: str):
    """Ellipsoidal geodesic area + perimeter of every zone polygon
    (round-4): authalic-q trapezoid area (exact for the lat-lon-aligned
    zone edges) + Vincenty inverse per edge — the GeographicLib-grade
    upgrade of the spherical geodesic_measures (reference
    ogr/ogrcurvepolygon.cpp get_GeodesicArea/Length)."""
    from ..stages import geomops

    zones = rd.from_arrow(_zones(sf_dir))
    out = zones.map_batches(
        lambda t: geomops.geodesic_measures_batch(t, mode="ellipsoidal"),
        batch_format="pyarrow")
    return out.select_columns(["zone_key", "geo_area_10m2", "geo_perim_m"])


def geodesic_true_q(sf_dir: str):
    """TRUE geodesic-edge area + Vincenty perimeter of every zone polygon:
    each edge is the actual ellipsoid geodesic between its vertices
    (Vincenty inverse azimuth + exact-ODE RK4 quadrature of Green's
    theorem, ~1e-9 relative — geomops._geodesic_ring_area_m2).  The full
    get_GeodesicArea answer for arbitrary (non-lat-lon-aligned) edges; no
    SQL oracle because the geodesic ODE has no closed form — parity is
    pinned in tests/test_geomops.py by densifying each geodesic edge and
    folding the authalic-q trapezoid sum over the dense chords."""
    from ..stages import geomops

    zones = rd.from_arrow(_zones(sf_dir))
    out = zones.map_batches(
        lambda t: geomops.geodesic_measures_batch(t, mode="geodesic"),
        batch_format="pyarrow")
    return out.select_columns(["zone_key", "geo_area_10m2", "geo_perim_m"])


def arrow_ipc_roundtrip_q(sf_dir: str):
    """Arrow IPC stream driver roundtrip (the explicit ogrlayerarrow surface,
    65536-row batch cap; forced to 256 here so the parallel per-batch read
    path actually fans out): zones -> IPC file -> footer-manifest parallel
    read -> per-batch aggregate proving every row came back."""
    import os
    import tempfile

    from ..sources import arrowipc

    zones = _zones(sf_dir)
    path = os.path.join(
        tempfile.gettempdir(),
        f"gdal_ray_ipc_{os.getpid()}_{zones.num_rows}.arrow")
    arrowipc.write_ipc(zones.select(["zone_key", "minx", "miny"]), path,
                       batch_rows=256)
    ds = arrowipc.read_ipc(path, with_batch_idx=True)

    def prep(t: pa.Table) -> pa.Table:
        minx_e7 = np.floor(
            t["minx"].to_numpy(zero_copy_only=False) * 1e7 + 0.5).astype(np.int64)
        return pa.table({
            "batch_idx": t["batch_idx"],
            "zone_key": pc.cast(t["zone_key"], pa.int64()),
            "minx_e7": pa.array(minx_e7),
        })

    return relational.partial_aggregate(
        ds.map_batches(prep, batch_format="pyarrow"),
        ["batch_idx"], sums=["zone_key"], mins=["minx_e7"], count_alias="n",
    ).map_batches(
        lambda t: pa.table({
            "batch_idx": t["batch_idx"],
            "n": pc.cast(t["n"], pa.int64()),
            "key_sum": pc.cast(t["zone_key_sum"], pa.int64()),
            "minx_e7_min": pc.cast(t["minx_e7_min"], pa.int64()),
        }),
        batch_format="pyarrow",
    )


def geodesic_azimuth_q(sf_dir: str):
    """Spherical forward azimuth (centroid -> corner) + destination point at
    a key-derived bearing/distance on the authalic sphere — the remaining
    geodesic siblings of geodesic_measures."""
    from ..stages import geomops

    zones = rd.from_arrow(_zones(sf_dir))

    def fn(t: pa.Table) -> pa.Table:
        k = t["zone_key"].to_numpy(zero_copy_only=False).astype(np.int64)
        t = t.append_column("bearing", pa.array((45.0 + (k % 270)).astype(np.float64)))
        t = t.append_column("dist_m", pa.array(
            (100000 + (k % 900) * 1000).astype(np.float64)))
        out = geomops.spherical_azimuth_dest_batch(t, "bearing", "dist_m")
        return out.select(["zone_key", "az_e6", "dst_x_e6", "dst_y_e6"])

    return zones.map_batches(fn, batch_format="pyarrow")


def contour_polygons_interp_q(sf_dir: str):
    """Interpolated contour POLYGONS over the hump paraboloid: suplevel
    region per level as polygons-with-holes (domain-rectangle shell + the
    iso-circle hole on this fixture); area_x100 equals the per-cell
    suplevel fragment sum the SQL oracle recomputes."""
    from ..stages import contour as cnt

    tiles_tbl = synthetic.make_raster_tiles("hump", 3, 3, size=64)
    out = cnt.contour_polygons_interp(rd.from_arrow(tiles_tbl),
                                      [50.3, 120.7], nx=3, ny=3,
                                      tile_size=64)
    return out.select_columns(["level", "poly_id", "n_holes", "area_x100"])


def contour_rings_q(sf_dir: str):
    """Interpolated contour rings over the hump paraboloid: marching-squares
    segments with vertices AT the linear level crossings, chained cross-tile
    into closed rings (closes the pixel-edge-ring gap).  Levels chosen off
    the value lattice (k/64) so no crossing sits on a pixel corner."""
    from ..stages import contour as cnt

    tiles_tbl = synthetic.make_raster_tiles("hump", 3, 3, size=64)
    out = cnt.contour_rings(rd.from_arrow(tiles_tbl), [50.3, 120.7],
                            nx=3, ny=3, tile_size=64)
    return out.select_columns(
        ["level", "ring_id", "n_vertices", "closed", "area_x100", "length_x100"]
    )


def contour_rings_closed_q(sf_dir: str):
    """Border-closing contour rings (polygon-output semantics): level sets of
    the diagonal ramp touch the raster border, and the suplevel-region
    boundary is closed by walking the domain border between chain endpoints,
    inserting raster corners.  Dyadic levels (k/4) keep every vertex, the
    shoelace area and the x100 quantization tie-free on both sides."""
    from ..stages import contour as cnt

    tiles_tbl = synthetic.make_raster_tiles("ramp", 2, 2, size=64)
    out = cnt.contour_rings(rd.from_arrow(tiles_tbl), [50.25, 180.75],
                            nx=2, ny=2, tile_size=64, close_border=True)
    return out.select_columns(
        ["level", "ring_id", "n_vertices", "closed", "area_x100", "length_x100"]
    )


# -- rows-only checks (non-SQL-expressible) ----------------------------------


def rasterize_polygons_q(sf_dir: str):
    """Burn the zone rectangles into a 0.25-degree world grid; per-tile
    checksums are the golden output (autotest style)."""
    from ..stages import rasterize as rast

    zones = _zones(sf_dir)
    feats = pa.table(
        {
            "feat_id": zones["zone_key"],
            "wkb": zones["wkb"],
            "burn_value": pa.array(
                (zones["zone_key"].to_numpy() % 250 + 1).astype(np.float64)
            ),
        }
    )
    grid = rast.GridSpec(gt=(-180.0, 0.25, 0.0, 85.0, 0.0, -0.25), width=1440, height=680, tile=256)
    tiles_out = rast.rasterize(rd.from_arrow(feats), grid)
    return tiles_out.select_columns(["tx", "ty", "checksum"])


def rasterize_invert_q(sf_dir: str):
    """gdal_rasterize -i (invert): burn 9 where NO geometry covers the pixel
    (apps/gdal_rasterize_lib.cpp -i flag) — the complement pass over the
    same distributed scanline rasterization."""
    from ..functions import checksum as cks
    from ..stages import rasterize as rast

    zones = _zones(sf_dir)
    feats = pa.table(
        {
            "feat_id": zones["zone_key"],
            "wkb": zones["wkb"],
            "burn_value": pa.array(
                (zones["zone_key"].to_numpy() % 250 + 1).astype(np.float64)
            ),
        }
    )
    grid = rast.GridSpec(gt=(-180.0, 0.25, 0.0, 85.0, 0.0, -0.25),
                         width=1440, height=680, tile=256)
    # -i must cover the FULL output extent: tiles untouched by any feature
    # invert to all-9s, so seed every grid tile (not just bbox-covered ones)
    tiles_out = rast.rasterize(rd.from_arrow(feats), grid, seed_all_tiles=True)

    def invert(t: pa.Table) -> pa.Table:
        rows = []
        for i in range(t.num_rows):
            h = t["height"][i].as_py()
            w = t["width"][i].as_py()
            arr = np.frombuffer(t["data"][i].as_py(), np.float64).reshape(h, w)
            inv = np.where(arr == 0.0, 9.0, 0.0)
            tx = t["tx"][i].as_py()
            ty = t["ty"][i].as_py()
            rows.append({
                "tx": tx, "ty": ty,
                "checksum": cks.tile_checksum(
                    inv, tx * grid.tile, ty * grid.tile, grid.width),
            })
        return pa.Table.from_pylist(rows)

    return tiles_out.map_batches(invert, batch_format="pyarrow")


def polygonize_blobs_q(sf_dir: str):
    """Distributed polygonize of the blobs fixture (components crossing tile
    borders must merge exactly)."""
    from ..stages import polygonize as poly

    tiles_tbl = synthetic.make_raster_tiles("blobs", 4, 4, size=64)
    out = poly.polygonize(rd.from_arrow(tiles_tbl), nodata=0.0, tile_size=64)
    # n_fragments (per-tile piece count) has no closed form for the disc
    # fixture; the hash-checked projection is the per-component geometry
    return out.select_columns(["value", "n_pixels", "minx", "miny", "maxx", "maxy"])


def polygonize_rings_q(sf_dir: str):
    """Polygonize with exact cross-tile ring assembly: (component, value,
    n_pixels, ring area x100) over the blobs fixture."""
    from ..functions import wkb as _w
    from ..stages import polygonize as poly

    tiles_tbl = synthetic.make_raster_tiles("blobs", 4, 4, size=64)
    out = poly.polygonize_rings(rd.from_arrow(tiles_tbl), nodata=0.0, tile_size=64)

    def fin(t: pa.Table) -> pa.Table:
        areas = []
        for w_ in t["wkb"].to_pylist():
            areas.append(int(round(abs(_w.ring_area(_w.decode(w_).parts[0][0])) * 100)))
        return pa.table(
            {
                "value": t["value"],
                "n_pixels": t["n_pixels"],
                "ring_area_x100": pa.array(areas, pa.int64()),
            }
        )

    return out.map_batches(fin, batch_format="pyarrow")


def polygonize_rings8_q(sf_dir: str):
    """GDALPolygonize 8CONNECTED=8 with ring output: the diag fixture's two
    diagonal chains cross 4-tile corner junctions (NW-SE and NE-SW) and the
    hollow diamond's 8-connected wall encloses a 4-connected-complement
    hole — each is ONE component iff the 8-conn cross-tile merge is exact.
    Shell ring area == n_pixels + hole_pixels (pixel-edge ring identity)."""
    from ..functions import wkb as _w
    from ..stages import polygonize as poly

    tiles_tbl = synthetic.make_raster_tiles("diag", 3, 3, size=64)
    out = poly.polygonize_rings(rd.from_arrow(tiles_tbl), nodata=0.0,
                                connect8=True, tile_size=64)

    def fin(t: pa.Table) -> pa.Table:
        areas = []
        for w_ in t["wkb"].to_pylist():
            areas.append(int(round(abs(_w.ring_area(_w.decode(w_).parts[0][0])))))
        return pa.table({
            "value": t["value"],
            "n_pixels": t["n_pixels"],
            "n_holes": t["n_holes"],
            "hole_pixels": t["hole_pixels"],
            "ring_area": pa.array(areas, pa.int64()),
        })

    return out.map_batches(fin, batch_format="pyarrow")


def polygonize_holes_q(sf_dir: str):
    """Polygonize with INTERIOR ring tracing (hole rings,
    alg/polygonize_polygonizer.h:136-176): the donut fixture's annulus spans
    every tile border and encloses one hole; shell + hole ring areas and
    counts are closed-form."""
    from ..functions import wkb as _w
    from ..stages import polygonize as poly

    tiles_tbl = synthetic.make_raster_tiles("donut", 3, 3, size=64)
    out = poly.polygonize_rings(rd.from_arrow(tiles_tbl), nodata=0.0, tile_size=64)

    def fin(t: pa.Table) -> pa.Table:
        shell, hole = [], []
        for w_ in t["wkb"].to_pylist():
            g = _w.decode(w_)
            rings = g.parts[0]
            shell.append(int(round(abs(_w.ring_area(rings[0])) * 100)))
            hole.append(sum(int(round(abs(_w.ring_area(r)) * 100)) for r in rings[1:]))
        return pa.table(
            {"value": t["value"], "n_pixels": t["n_pixels"],
             "n_holes": t["n_holes"], "hole_pixels": t["hole_pixels"],
             "shell_area_x100": pa.array(shell, pa.int64()),
             "hole_area_x100": pa.array(hole, pa.int64())}
        )

    return out.map_batches(fin, batch_format="pyarrow")


SIEVE_THRESHOLD = 350


def sieve_q(sf_dir: str):
    """EXACT cross-tile sieve (gdal_sieve, alg/gdalsievefilter.cpp): rects
    fixture with background reclassified to value 9 — the one rect smaller
    than the threshold merges into the (largest-neighbor) background; rect
    pixel counts are closed-form so the oracle recomputes the full mosaic."""
    from ..functions import checksum as cks
    from ..stages import polygonize as poly
    from ..stages import rastermap

    tiles_tbl = synthetic.make_raster_tiles("rects", 3, 3, size=64)
    bg = rastermap.reclassify(rd.from_arrow(tiles_tbl), {0.0: 9.0})
    cleaned = poly.sieve_global(bg, threshold=SIEVE_THRESHOLD, nodata=255.0)

    def sums(t: pa.Table) -> pa.Table:
        from ..stages.focal import _dtype_of

        xs, ys, cs = [], [], []
        for i in range(t.num_rows):
            dt = _dtype_of(t["dtype"][i].as_py())
            arr = np.frombuffer(t["data"][i].as_py(), dtype=dt).reshape(64, 64)
            xs.append(t["x"][i].as_py())
            ys.append(t["y"][i].as_py())
            cs.append(cks.tile_checksum(arr))
        return pa.table({"x": pa.array(xs, pa.int32()), "y": pa.array(ys, pa.int32()),
                         "checksum": pa.array(cs, pa.int64())})

    return cleaned.map_batches(sums, batch_format="pyarrow")


def tile_pyramid_q(sf_dir: str):
    """Warp a synthetic EPSG:4326 ramp to EPSG:3857 XYZ tiles (z4) and build
    overviews to z2; returns per-tile checksums."""
    from ..stages import pyramid as pyr

    n = 256
    gy, gx = np.mgrid[0:n, 0:n]
    src = pyr.SourceRaster((gx + gy).astype(np.float64) + 1.0, (-60.0, 120.0 / n, 0.0, 60.0, 0.0, -120.0 / n))
    levels = pyr.tile_pyramid(src, z_max=4, z_min=2, bbox=(-59, -59, 59, 59), tile_px=64, concurrency=2)
    tabs = []
    for z, ds in levels.items():
        tabs.append(ds.select_columns(["z", "x", "y", "checksum"]).to_pandas())
    import pandas as pd

    return pd.concat(tabs, ignore_index=True)


def _ramp_src():
    from ..stages import pyramid as pyr

    n = 256
    gy, gx = np.mgrid[0:n, 0:n]
    return pyr.SourceRaster(
        (gx + gy).astype(np.float64) + 1.0,
        (-60.0, 120.0 / n, 0.0, 60.0, 0.0, -120.0 / n),
    )


def warp_geoloc_q(sf_dir: str):
    """gdalwarp -geoloc analogue (alg/gdalgeoloc.cpp): the ramp source is
    georeferenced by geolocation ARRAYS (nodes every 8 px) instead of its
    affine geotransform; TileWarper routes pixel lookup through the exact
    inverse bilinear.  The node grid here encodes exactly the same affine
    mapping, so the z4 tiles must be checksum-identical to the affine warp
    — the SQL oracle is the shared z4 warp mirror.  (True curvilinear
    grids are pinned in tests/test_transformer.py and the warp parity
    test.)"""
    from ..functions.transformer import GeolocTransformer
    from ..stages import pyramid as pyr

    # nodes every 8 px, one node beyond each raster edge (pixel -7.5 to
    # 264.5) so every valid pixel lies inside a quad — the z4 tile rows
    # overhang the raster and the affine warp still samples edge rows there
    j, i = np.mgrid[0:35, 0:35]
    X = -60.0 + (120.0 / 256) * (-7.5 + 8.0 * i)
    Y = 60.0 - (120.0 / 256) * (-7.5 + 8.0 * j)
    g = GeolocTransformer(X, Y, pixel_offset=-7.5, pixel_step=8.0,
                          line_offset=-7.5, line_step=8.0)
    out = pyr.warp_to_tiles(
        _ramp_src(), 4, (-59, -59, 59, 59), tile_px=64, resample="nearest",
        skip_blank=False, concurrency=2, geoloc=g)
    return out.select_columns(["z", "x", "y", "checksum"])


def tile_pyramid_cubic_q(sf_dir: str):
    """gdalwarp -r cubic analogue (the reference's own benchmark kernel,
    autotest/benchmark/test_gdalwarp.py:24-57): Catmull-Rom warp of the ramp
    to z4 tiles; per-tile checksums, SQL-mirrored 16-tap arithmetic."""
    from ..stages import pyramid as pyr

    out = pyr.warp_to_tiles(
        _ramp_src(), 4, (-59, -59, 59, 59), tile_px=64, resample="cubic",
        skip_blank=False, concurrency=2,
    )
    return out.select_columns(["z", "x", "y", "checksum"])


CUTLINE_RECT = (-30.0, -20.0, 40.0, 35.0)


def warp_cutline_q(sf_dir: str):
    """gdalwarp -cutline analogue (alg/gdalwarper.cpp / gdalcutline.cpp):
    nearest warp of the ramp with destination pixels outside the cutline
    polygon masked to nodata; per-tile checksums."""
    from ..functions import wkb as _w
    from ..stages import pyramid as pyr

    x0, y0, x1, y1 = CUTLINE_RECT
    ring = np.array([[x0, y0], [x1, y0], [x1, y1], [x0, y1], [x0, y0]])
    out = pyr.warp_to_tiles(
        _ramp_src(), 4, (-59, -59, 59, 59), tile_px=64, resample="nearest",
        skip_blank=False, concurrency=2, cutline_wkb=_w.encode_polygon([ring]),
        dst_alpha=True,
    )
    return out.select_columns(["z", "x", "y", "checksum"])


GRID_METRIC_RADIUS = 20.0


def grid_metrics_q(sf_dir: str):
    """gdal_grid data metrics (alg/gdalgrid.cpp GGA metrics): per-cell RANGE
    of n_chars within the search radius, with the one-point-per-quadrant
    validity constraint; cells failing it emit no row."""
    from ..stages import gridinterp

    grid = gridinterp.InterpGrid(-180.0, -85.0, 180.0, 85.0, 64, 32, tile=16)
    pts = _docs(sf_dir, ("doc_id", "n_chars")).map_batches(
        tiles.derive_geometry_batch, batch_format="pyarrow"
    ).map_batches(
        lambda t: t.append_column(
            "value", pc.cast(t["n_chars"], pa.float64())), batch_format="pyarrow"
    )
    tiles_out = gridinterp.grid_interpolate(
        pts, grid, algorithm="range", radius=GRID_METRIC_RADIUS,
        seed_all_tiles=True, min_points_per_quadrant=1,
    )

    return gridinterp.tiles_to_cells(tiles_out, grid, "vrange", finite_only=True)


OVERVIEW_KERNELS = ("nearest", "min", "max", "sum", "rms", "mode")


def overview_kernels_q(sf_dir: str):
    """Overview reduction kernel family (gcore/overview.cpp): one z3 overview
    of the nearest-warped z4 base per kernel, tagged by kernel name.  The
    36-tile base warp runs ONCE and is materialized (the checkpoint step a
    real-scale pipeline would write to parquet) so the per-kernel branches
    reuse its blocks instead of re-executing the warp."""
    from ..stages import pyramid as pyr

    base = pyr.warp_to_tiles(
        _ramp_src(), 4, (-59, -59, 59, 59), tile_px=64, resample="nearest",
        skip_blank=False, concurrency=2,
    ).materialize()
    outs = []
    for k in OVERVIEW_KERNELS:
        ov = pyr.build_overview(base, kernel=k)

        def tag(t: pa.Table, kernel=k) -> pa.Table:
            t = t.select(["z", "x", "y", "checksum"])
            return t.append_column("kernel", pa.array([kernel] * t.num_rows))

        outs.append(ov.map_batches(tag, batch_format="pyarrow"))
    ds = outs[0]
    for o in outs[1:]:
        ds = ds.union(o)
    return ds


def hillshade_q(sf_dir: str):
    """gdaldem hillshade over the ramp fixture (halo-exchange focal op);
    per-tile checksums are the golden."""
    from ..stages import focal

    tiles_tbl = synthetic.make_raster_tiles("ramp", 3, 3, size=64)
    out = focal.focal(rd.from_arrow(tiles_tbl), alg="hillshade", res=1.0)
    return out.select_columns(["x", "y", "checksum"])


HILLSHADE_VARIANTS = ["hillshade_zt", "slope_zt", "aspect_zt",
                      "combined", "multidirectional", "igor", "tri_riley"]


def hillshade_variants_q(sf_dir: str):
    """The rest of the gdaldem shading family over the hump paraboloid
    fixture: ZevenbergenThorne gradients (slope/aspect/hillshade) plus
    combined, multidirectional (USGS OF 92-422) and igor shading
    (apps/gdaldem_lib.cpp:1390,1151,1010,947).  Per-tile checksums per
    mode are the golden."""
    from ..stages import focal

    tiles_tbl = synthetic.make_raster_tiles("hump", 3, 3, size=64)
    outs = []
    for mode in HILLSHADE_VARIANTS:
        out = focal.focal(rd.from_arrow(tiles_tbl), alg=mode, res=1.0)

        def tag(t: pa.Table, mode=mode) -> pa.Table:
            t = t.select(["x", "y", "checksum"])
            return t.append_column("mode", pa.array([mode] * t.num_rows))

        outs.append(out.map_batches(tag, batch_format="pyarrow"))
    ds = outs[0]
    for o in outs[1:]:
        ds = ds.union(o)
    return ds


NEIGHBOR_COMBOS = [
    ("sum", "edge2"),
    ("sum", "gaussian"),
    ("min", "equal"),
    ("max", "equal"),
    ("median", "equal"),
    ("mode", "equal"),
    ("stddev", "equal"),
]


def focal_neighbors_q(sf_dir: str):
    """gdal raster neighbors (generic focal statistics,
    apps/gdalalg_raster_neighbors.h:29) over the blobs mosaic: weighted
    convolution sums (edge2/gaussian kernels) plus order statistics
    min/max/median/mode and the exact stddev variance numerator.  Per-tile
    integer aggregates of the focal output are the golden."""
    from ..stages import focal

    tiles_tbl = synthetic.make_raster_tiles("blobs", 3, 3, size=64)
    outs = []
    for method, kern in NEIGHBOR_COMBOS:
        out = focal.neighbors(rd.from_arrow(tiles_tbl), method=method, kernel=kern)

        def tag(t: pa.Table, m=f"{method}_{kern}") -> pa.Table:
            return t.append_column("mode", pa.array([m] * t.num_rows))

        outs.append(out.map_batches(tag, batch_format="pyarrow"))
    ds = outs[0]
    for o in outs[1:]:
        ds = ds.union(o)
    return ds


DITHER_PALETTE = [0, 64, 128, 192, 256, 320, 384]


def dither_ordered_q(sf_dir: str):
    """Ordered Bayer-8x8 dithering of the ramp mosaic to a 7-level gray
    palette (the tile-parallel replacement for alg/gdaldither.cpp's
    sequential Floyd-Steinberg; see stages/fillpalette.dither_ordered).
    Per-tile palette-index histograms are the golden."""
    from ..stages import fillpalette

    tiles_tbl = synthetic.make_raster_tiles("ramp", 3, 3, size=64)
    return fillpalette.dither_ordered(
        rd.from_arrow(tiles_tbl), DITHER_PALETTE, spread=24
    )


def dem_derivatives_q(sf_dir: str):
    """Plain gdaldem TRI (Wilson) / TPI / roughness over the hump paraboloid
    (apps/gdaldem_lib.cpp windowed stats; tri_riley is graded separately in
    hillshade_variants).  Per-tile checksums per mode are the golden."""
    from ..stages import focal

    tiles_tbl = synthetic.make_raster_tiles("hump", 3, 3, size=64)
    outs = []
    for mode in ("tri", "tpi", "roughness", "slope_pct", "slope_pct_zt"):
        out = focal.focal(rd.from_arrow(tiles_tbl), alg=mode, res=1.0)

        def tag(t: pa.Table, mode=mode) -> pa.Table:
            t = t.select(["x", "y", "checksum"])
            return t.append_column("mode", pa.array([mode] * t.num_rows))

        outs.append(out.map_batches(tag, batch_format="pyarrow"))
    ds = outs[0]
    for o in outs[1:]:
        ds = ds.union(o)
    return ds


def media_features_q(sf_dir: str):
    """Multimodal span featurization over the synthetic interleaved corpus
    (decode stubbed deterministically; plumbing real)."""
    from ..stages import media

    docs = rd.from_arrow(synthetic.make_docs(2000))
    return media.featurize_media(docs)


def media_features_real_q(sf_dir: str):
    """Multimodal featurization through the REAL byte-level codec path:
    payload PNGs are materialized to an on-disk store (resume = file
    existence), then the decode actor pool reads each image payload back and
    parses it with the engine's own codecs — PNG for images (signature,
    chunk CRCs, zlib inflate) and RIFF/WAV for audio (chunk walk, PCM
    validation) — before feature extraction.  video falls back to the
    deterministic pixels (no video codec in this container).  Decoded bytes
    equal the fake path's by construction, so the features are
    SQL-recomputable."""
    from ..stages import media

    docs = rd.from_arrow(synthetic.make_docs(2000))
    store = "/tmp/gdal_ray_media_store"
    # ingest stage: write (or resume-skip) every image + audio payload
    for _ in media.materialize_payload_store(
            docs, store, kinds=("image", "audio", "video")).iter_batches():
        pass
    return media.featurize_media(docs, backend="real", store_root=store,
                                 concurrency=2)


def dither_fs_q(sf_dir: str):
    """Floyd-Steinberg error diffusion (rgb2pct's default dither,
    alg/gdaldither.cpp exact error split) over the ramp mosaic as the
    row-band Ray-task pipeline.  NO SQL oracle: FS is a whole-image
    sequential recurrence (each pixel's output depends on every earlier
    pixel via clamped carries) — not expressible in DuckDB SQL; the
    engine-side parity test (tests/test_fs_dither.py) checks the banded
    pipeline against an independent whole-image transliteration of the
    reference scan instead."""
    from ..stages import fillpalette as fp

    tiles_tbl = synthetic.make_raster_tiles("ramp", 3, 2, size=64)

    def to_u8(t: pa.Table) -> pa.Table:
        from ..stages.focal import _dtype_of

        rows = []
        for i in range(t.num_rows):
            a = np.frombuffer(t["data"][i].as_py(),
                              _dtype_of(t["dtype"][i].as_py())).reshape(
                t["height"][i].as_py(), t["width"][i].as_py())
            rows.append({**{c: t[c][i].as_py() for c in t.column_names
                            if c not in ("data", "dtype")},
                         "dtype": "uint8",
                         "data": np.clip(a, 0, 255).astype(np.uint8).tobytes()})
        return pa.Table.from_pylist(rows)

    tiles = rd.from_arrow(tiles_tbl).map_batches(to_u8, batch_format="pyarrow")
    return fp.dither_floyd_steinberg(
        tiles, [0, 85, 170, 255], nx=3, ny=2, tile_size=64)


def media_features_jpeg_q(sf_dir: str):
    """Round-4 multimodal featurization through the BASELINE JPEG codec
    (sources/jpeg — ITU-T T.81 Annex K tables, full entropy pipeline):
    image payloads are stored as JFIF with the fake pixels upscaled to
    constant 8x8 blocks (pure-DC blocks round-trip the lossy path exactly at quality >= 75; 90 here), the decode actor pool sniffs the JPEG magic and runs
    Huffman decode + dequant + IDCT, and the extracted features equal the
    fake path's — so the media SQL oracle stays exact."""
    from ..stages import media

    docs = rd.from_arrow(synthetic.make_docs(2000))
    store = "/tmp/gdal_ray_media_store_jpeg"
    for _ in media.materialize_payload_store(
            docs, store, kinds=("image", "audio", "video"),
            image_codec="jpeg").iter_batches():
        pass
    return media.featurize_media(docs, backend="real", store_root=store,
                                 concurrency=2)


def video_frame_sample_q(sf_dir: str):
    """Frame-sampling over video spans through the REAL AVI codec: payloads
    materialized to the store, each video decoded in the actor pool, every
    2nd frame's exact integer mean emitted (the brief's frame-sample op)."""
    from ..stages import media

    docs = rd.from_arrow(synthetic.make_docs(2000))
    store = "/tmp/gdal_ray_media_store"
    for _ in media.materialize_payload_store(
            docs, store, kinds=("image", "audio", "video")).iter_batches():
        pass
    return media.sample_frames(docs, stride=2, backend="real",
                               store_root=store, concurrency=2)


def media_features_adpcm_q(sf_dir: str):
    """Multimodal featurization with COMPRESSED audio payloads: audio spans
    are IMA-ADPCM WAVs (wFormatTag 0x11, sources/wav.py) decoded through the
    real 4-bit nibble recurrence in the actor pool.  The payload holds each
    sample constant across one ADPCM block, which round-trips the lossy
    format exactly, so the features match the fake path and the same SQL
    oracle as media_features_real is exact."""
    from ..stages import media

    docs = rd.from_arrow(synthetic.make_docs(2000))
    store = "/tmp/gdal_ray_media_store_adpcm"
    for _ in media.materialize_payload_store(
            docs, store, kinds=("image", "audio", "video"),
            audio_codec="ima_adpcm").iter_batches():
        pass
    return media.featurize_media(docs, backend="real", store_root=store,
                                 concurrency=2)


def video_frame_sample_mjpeg_q(sf_dir: str):
    """Frame-sampling through the COMPRESSED video path: payloads are
    Motion-JPEG AVIs (each frame an independent baseline-JFIF stream,
    sources/avi.py codec='mjpeg' + sources/jpeg.py), decoded frame-by-frame
    in the actor pool.  Frames are 8x-upscaled constant blocks so the lossy
    pipeline round-trips exactly and frame MEANS equal the fake path's —
    the same SQL oracle as video_frame_sample holds bit-for-bit."""
    from ..stages import media

    docs = rd.from_arrow(synthetic.make_docs(2000))
    store = "/tmp/gdal_ray_media_store_mjpeg"
    for _ in media.materialize_payload_store(
            docs, store, kinds=("video",),
            video_codec="mjpeg").iter_batches():
        pass
    return media.sample_frames(docs, stride=2, backend="real",
                               store_root=store, concurrency=2)


def media_resize_q(sf_dir: str):
    """Media RESIZE through the real codecs: decode every media span, exact
    2x2 block-average downscale (round half up), emit the resized thumb's
    integer mean + position-weighted checksum; resized PNGs land in an
    output store with existence-resume."""
    from ..stages import media

    docs = rd.from_arrow(synthetic.make_docs(2000))
    store = "/tmp/gdal_ray_media_store"
    for _ in media.materialize_payload_store(
            docs, store, kinds=("image", "audio", "video")).iter_batches():
        pass
    return media.resize_media(docs, factor=2, backend="real",
                              store_root=store,
                              out_root="/tmp/gdal_ray_media_resized",
                              concurrency=2)


def media_inventory_q(sf_dir: str):
    """Per-kind media-reference catalog over the interleaved corpus."""
    from ..stages import media

    docs = rd.from_arrow(synthetic.make_docs(2000))
    return media.media_inventory(docs)


def footprint_q(sf_dir: str):
    """Raster footprint: mask -> distributed polygonize component summary.
    The rects fixture has closed-form component structure (disjoint
    rectangles crossing tile borders) so the DuckDB oracle recomputes every
    column — including n_fragments = number of per-tile pieces — exactly."""
    from ..stages import collar

    tiles_tbl = synthetic.make_raster_tiles("rects", 3, 3, size=64)
    out = collar.footprint(rd.from_arrow(tiles_tbl), nodata=0.0, tile_size=64)
    # 'component' is an engine-internal label (cross-tile union-find root key),
    # not a semantic output — the hash check covers the geometry columns
    return out.select_columns(
        ["value", "n_pixels", "minx", "miny", "maxx", "maxy", "n_fragments"]
    )


def nearblack_q(sf_dir: str):
    """nearblack collar removal: per-tile checksums of the cleaned mosaic."""
    from ..functions import checksum as cks
    from ..stages import collar

    tiles_tbl = synthetic.make_raster_tiles("blobs", 3, 3, size=64)
    cleaned = collar.nearblack(rd.from_arrow(tiles_tbl), threshold=0.5, nodata=254.0, nx=3, ny=3)

    def sums(t: pa.Table) -> pa.Table:
        xs, ys, cs = [], [], []
        for i in range(t.num_rows):
            arr = np.frombuffer(t["data"][i].as_py(), dtype=np.uint8).reshape(64, 64)
            xs.append(t["x"][i].as_py())
            ys.append(t["y"][i].as_py())
            cs.append(cks.tile_checksum(arr))
        return pa.table({"x": pa.array(xs, pa.int32()), "y": pa.array(ys, pa.int32()),
                         "checksum": pa.array(cs, pa.int64())})

    return cleaned.map_batches(sums, batch_format="pyarrow")


def proximity_q(sf_dir: str):
    """Exact distributed Euclidean distance transform (separable EDT over
    column/row tile groups); per-tile checksums of the scaled distances."""
    from ..functions import checksum as cks
    from ..stages import proximity as prox

    tiles_tbl = synthetic.make_raster_tiles("blobs", 3, 3, size=64)
    out = prox.proximity(rd.from_arrow(tiles_tbl), nodata=0.0)

    def sums(t: pa.Table) -> pa.Table:
        xs, ys, cs = [], [], []
        for i in range(t.num_rows):
            arr = np.frombuffer(t["data"][i].as_py(), dtype=np.float64).reshape(64, 64)
            xs.append(t["x"][i].as_py())
            ys.append(t["y"][i].as_py())
            cs.append(cks.tile_checksum(np.round(np.nan_to_num(arr) * 100)))
        return pa.table({"x": pa.array(xs, pa.int32()), "y": pa.array(ys, pa.int32()),
                         "checksum": pa.array(cs, pa.int64())})

    return out.map_batches(sums, batch_format="pyarrow")


def fill_nodata_q(sf_dir: str):
    """IDW fill of nodata holes (rasterfill analogue); per-tile checksums."""
    from ..functions import checksum as cks
    from ..stages import fillpalette

    tiles_tbl = synthetic.make_raster_tiles("checker", 3, 3, size=64)
    out = fillpalette.fill_nodata(rd.from_arrow(tiles_tbl), nodata=0.0, max_dist=8)

    def sums(t: pa.Table) -> pa.Table:
        xs, ys, cs = [], [], []
        for i in range(t.num_rows):
            arr = np.frombuffer(t["data"][i].as_py(), dtype=np.float64).reshape(64, 64)
            xs.append(t["x"][i].as_py())
            ys.append(t["y"][i].as_py())
            cs.append(cks.tile_checksum(np.round(arr * 100)))
        return pa.table({"x": pa.array(xs, pa.int32()), "y": pa.array(ys, pa.int32()),
                         "checksum": pa.array(cs, pa.int64())})

    return out.map_batches(sums, batch_format="pyarrow")


PALETTE_BASE = ((248, 16, 16), (16, 248, 16), (16, 16, 248), (184, 184, 56))


def palette_q(sf_dir: str):
    """Median-cut palette learning over synthetic RGB tiles (two-phase global
    aggregate -> broadcast remap); returns the learned palette rows.
    Solid-color tiles (one 5-bit bucket per cluster) make the cut sequence
    deterministic and the palette closed-form: the oracle re-runs the
    quantize -> per-bucket average -> rescale math in SQL."""
    from ..stages import fillpalette

    rows = []
    for ty in range(2):
        for tx in range(2):
            c = np.array(PALETTE_BASE[ty * 2 + tx], dtype=np.uint8)
            rgb = np.tile(c, (256, 1)).astype(np.uint8)
            rows.append({"x": tx, "y": ty, "width": 16, "height": 16, "data": rgb.tobytes()})
    tiles_tbl = pa.Table.from_pylist(rows)
    hist = fillpalette.color_histogram(rd.from_arrow(tiles_tbl), bits=5)
    pal = fillpalette.median_cut(hist, n_colors=4, bits=5)
    order = np.lexsort((pal[:, 2], pal[:, 1], pal[:, 0]))
    pal = pal[order]
    return pa.table(
        {
            "idx": pa.array(np.arange(len(pal), dtype=np.int64)),
            "r": pa.array(pal[:, 0].astype(np.int64)),
            "g": pa.array(pal[:, 1].astype(np.int64)),
            "b": pa.array(pal[:, 2].astype(np.int64)),
        }
    )


def pct2rgb_q(sf_dir: str):
    """rgb2pct -> pct2rgb round trip: learn the median-cut palette, remap the
    RGB tiles to palette indices, then expand indices back to RGB.  On the
    solid-color fixture each tile reconstructs to the palette entry nearest
    its base color — closed-form in SQL (quantize + argmin join)."""
    from ..stages import fillpalette

    rows = []
    for ty in range(2):
        for tx in range(2):
            c = np.array(PALETTE_BASE[ty * 2 + tx], dtype=np.uint8)
            rgb = np.tile(c, (256, 1)).astype(np.uint8)
            rows.append({"x": tx, "y": ty, "width": 16, "height": 16, "data": rgb.tobytes()})
    tiles_tbl = pa.Table.from_pylist(rows)
    hist = fillpalette.color_histogram(rd.from_arrow(tiles_tbl), bits=5)
    pal = fillpalette.median_cut(hist, n_colors=4, bits=5)
    pal = pal[np.lexsort((pal[:, 2], pal[:, 1], pal[:, 0]))]
    idx_tiles = fillpalette.apply_palette(rd.from_arrow(tiles_tbl), pal)
    rgb_tiles = fillpalette.expand_palette(idx_tiles, pal)

    def per_tile(t: pa.Table) -> pa.Table:
        out = {"x": [], "y": [], "r": [], "g": [], "b": [], "n_colors": []}
        for i in range(t.num_rows):
            rgb = np.frombuffer(t["data"][i].as_py(), dtype=np.uint8).reshape(-1, 3)
            uniq = np.unique(rgb, axis=0)
            out["x"].append(t["x"][i].as_py())
            out["y"].append(t["y"][i].as_py())
            out["r"].append(int(rgb[0, 0]))
            out["g"].append(int(rgb[0, 1]))
            out["b"].append(int(rgb[0, 2]))
            out["n_colors"].append(len(uniq))
        return pa.table({k: pa.array(v, pa.int64()) for k, v in out.items()})

    return rgb_tiles.map_batches(per_tile, batch_format="pyarrow")


def viewshed_q(sf_dir: str):
    """Viewshed from an observer on a synthetic DEM (R3 exact LOS).
    Integer-valued DEM (exact in float32 AND in SQL) so the oracle can replay
    the ray-sampling arithmetic bit-for-bit."""
    from ..stages import viewshed as vs

    size = 64
    gy, gx = np.mgrid[0:size, 0:size]
    dem = (((gx * 73 + gy * 151) % 37) + ((gx * gy) % 11) * 3).astype(np.float32)
    t = pa.Table.from_pylist([{
        "z": 0, "x": 0, "y": 0, "band": 1, "width": size, "height": size,
        "crs": "EPSG:3857", "nodata": -1.0, "dtype": "float32", "data": dem.tobytes(),
    }])
    out = vs.viewshed(rd.from_arrow(t), observer_x=32, observer_y=32, observer_height=2.0)
    return out.select_columns(["x", "y", "n_visible"])


def viewshed_cumulative_q(sf_dir: str):
    """Cumulative viewshed (gdal_viewshed -mode cumulative,
    alg/viewshed/cumulative.cpp): a 4x4 observer grid (spacing 16) over the
    64x64 integer conformance DEM; visibility masks sum into the
    observability heat map via actor-pool executors + partial-raster
    combiners.  Emits per-16x16-block heat sums (16 rows)."""
    from ..stages import viewshed as vs

    size = 64
    gy, gx = np.mgrid[0:size, 0:size]
    dem = (((gx * 73 + gy * 151) % 37) + ((gx * gy) % 11) * 3).astype(np.float64)
    heat = vs.viewshed_cumulative(dem, spacing=16, observer_height=2.0,
                                  concurrency=2)
    blocks = heat.reshape(4, 16, 4, 16).sum(axis=(1, 3))
    by, bx = np.mgrid[0:4, 0:4]
    return pa.table({"bx": pa.array(bx.ravel().astype(np.int64)),
                     "by": pa.array(by.ravel().astype(np.int64)),
                     "vis_sum": pa.array(blocks.ravel().astype(np.int64))})


def viewshed_sectors_q(sf_dir: str):
    """Ray-partitioned viewshed (angular-sector decomposition): a 128x128
    integer DEM shipped as 2x2 tiles, observer (64,64), radius-40 disc split
    over 8 sector workers, each assembling only its wedge bbox.  Per-cell
    results are exactly the monolithic window run (pytest asserts mask
    equality); the oracle replays the ray sampling per sector."""
    from ..stages import viewshed as vs

    size = 64
    rows = []
    for ty in range(2):
        for tx in range(2):
            gy, gx = np.mgrid[0:size, 0:size]
            gx = gx + tx * size
            gy = gy + ty * size
            dem = (((gx * 73 + gy * 151) % 37) + ((gx * gy) % 11) * 3).astype(np.float32)
            rows.append({"z": 0, "x": tx, "y": ty, "band": 1, "width": size,
                         "height": size, "crs": "EPSG:3857", "nodata": -1.0,
                         "dtype": "float32", "data": dem.tobytes()})
    tiles_tbl = pa.Table.from_pylist(rows)
    out = vs.viewshed_sectors(rd.from_arrow(tiles_tbl), observer_x=64,
                              observer_y=64, radius=40, n_sectors=8,
                              observer_height=2.0)
    return out.select_columns(["sector", "n_cells", "n_visible"])


def _intdem_tiles_2x2(size: int = 64) -> pa.Table:
    """2x2 mosaic of the integer conformance DEM (the viewshed formula)."""
    rows = []
    for ty in range(2):
        for tx in range(2):
            gy, gx = np.mgrid[0:size, 0:size]
            gx = gx + tx * size
            gy = gy + ty * size
            dem = (((gx * 73 + gy * 151) % 37) + ((gx * gy) % 11) * 3).astype(np.float32)
            rows.append({"z": 0, "x": tx, "y": ty, "band": 1, "width": size,
                         "height": size, "crs": "EPSG:3857", "nodata": -1.0,
                         "dtype": "float32", "data": dem.tobytes()})
    return pa.Table.from_pylist(rows)


def band_stats_q(sf_dir: str):
    """gdalinfo -stats as a lazy distributed pipeline (GDALRasterBand::
    ComputeStatistics, gcore/rasterband.cpp): exact integer partials per tile,
    one keyed combine, scaled-integer mean/std."""
    from ..stages import rastermap

    return rastermap.band_stats_lazy(rd.from_arrow(_intdem_tiles_2x2()))


def pansharpen_q(sf_dir: str):
    """Weighted-Brovey pansharpen (alg/gdalpansharpen.cpp) over closed-form
    co-registered RGB + 2x pan fixtures; per-(tile, band) checksums of the
    sharpened uint8 output."""
    from ..functions import checksum as cks
    from ..stages import fillpalette

    rows = []
    for ty in range(2):
        for tx in range(2):
            gy, gx = np.mgrid[0:64, 0:64]
            gx = gx + tx * 64
            gy = gy + ty * 64
            r = (gx * 7 + gy * 11) % 256
            g = (gx * 13 + gy * 3) % 256
            b = (gx * 5 + gy * 17) % 256
            rgb = np.stack([r, g, b], axis=2).astype(np.uint8)
            pgy, pgx = np.mgrid[0:128, 0:128]
            pgx = pgx + tx * 128
            pgy = pgy + ty * 128
            pan = (((pgx + 2 * pgy) % 256) + 0.25).astype(np.float64)
            rows.append({"x": tx, "y": ty, "width": 64, "height": 64,
                         "data": rgb.tobytes(), "pan": pan.tobytes()})
    ms = pa.Table.from_pylist(rows)
    out = fillpalette.pansharpen(rd.from_arrow(ms))

    def ck(t: pa.Table) -> pa.Table:
        rows2 = []
        for i in range(t.num_rows):
            h = t["height"][i].as_py()
            w = t["width"][i].as_py()
            arr = np.frombuffer(t["data"][i].as_py(), np.uint8).reshape(h, w, 3)
            for band in range(3):
                rows2.append({
                    "x": t["x"][i].as_py(), "y": t["y"][i].as_py(),
                    "band": band,
                    "checksum": cks.tile_checksum(arr[:, :, band]),
                })
        return pa.Table.from_pylist(rows2)

    return out.map_batches(ck, batch_format="pyarrow")


def translate_scale_q(sf_dir: str):
    """gdal_translate -scale 0 318 0 255 over the ramp mosaic (linear
    rescale, float32 output); per-tile checksums."""
    from ..functions import checksum as cks
    from ..stages import rastermap

    tiles_tbl = synthetic.make_raster_tiles("ramp", 3, 2, size=64)
    out = rastermap.scale(rd.from_arrow(tiles_tbl), 0.0, 318.0, 0.0, 255.0)

    def ck(t: pa.Table) -> pa.Table:
        rows = []
        for i in range(t.num_rows):
            arr = np.frombuffer(t["data"][i].as_py(), np.float32).reshape(
                t["height"][i].as_py(), t["width"][i].as_py())
            rows.append({"x": t["x"][i].as_py(), "y": t["y"][i].as_py(),
                         "checksum": cks.tile_checksum(arr)})
        return pa.Table.from_pylist(rows)

    return out.map_batches(ck, batch_format="pyarrow")


def equalize_q(sf_dir: str):
    """Histogram equalization of the integer DEM mosaic (two-phase global
    CDF transfer curve, pure integer remap)."""
    from ..stages import rastermap

    return rastermap.equalize(rd.from_arrow(_intdem_tiles_2x2()))


def raster_histogram_q(sf_dir: str):
    """GetHistogram (gcore/gdal_rasterband.h:585) over the hump mosaic:
    16 uniform buckets on [0, 288], np.histogram edge semantics (right edge
    inclusive only for the last bucket)."""
    from ..stages import rastermap

    tiles_tbl = synthetic.make_raster_tiles("hump", 3, 3, size=64)
    hist = rastermap.histogram(rd.from_arrow(tiles_tbl), 16, 0.0, 288.0)
    return pa.table({
        "bin": pa.array(np.arange(16, dtype=np.int64)),
        "n": pa.array(hist),
    })


def band_stats_approx_q(sf_dir: str):
    """Approximate band statistics (ComputeStatistics bApproxOK,
    gcore/gdal_rasterband.h:543-548): every 4th pixel per axis, exact over
    the sample so the oracle hash-matches."""
    from ..stages import rastermap

    return rastermap.band_stats_lazy(rd.from_arrow(_intdem_tiles_2x2()), stride=4)


def tile_index_q(sf_dir: str):
    """gdaltindex / gdalbuildvrt catalog row per tile: pixel extent + the
    composable global-weighted checksum (mosaic-integrity manifest)."""
    from ..stages import rastermap

    tiles_tbl = synthetic.make_raster_tiles("ramp", 2, 2, size=64)
    out = rastermap.tile_index(rd.from_arrow(tiles_tbl), tile_size=64,
                               global_width=128)
    return out.select_columns(["x", "y", "minx", "miny", "maxx", "maxy", "checksum"])


def translate_window_q(sf_dir: str):
    """gdal_translate -srcwin 20 30 80 60 over the tiled ramp: border tiles
    crop (win_ox/win_oy record the intra-tile offset), fully-outside tiles
    drop, checksums re-key to the crop-local weight layout."""
    from ..stages import rastermap

    tiles_tbl = synthetic.make_raster_tiles("ramp", 2, 2, size=64)
    out = rastermap.clip_window(rd.from_arrow(tiles_tbl), 20, 30, 100, 90,
                                tile_size=64)
    return out.select_columns(["x", "y", "width", "height", "win_ox", "win_oy",
                               "checksum"])


def viewshed_modes_q(sf_dir: str):
    """gdal_viewshed output modes over the same integer DEM as viewshed_q:
    NORMAL (mask), DEM (minimum visible elevation) and GROUND (extra height
    needed) — alg/viewshed/viewshed_executor.cpp:228 setOutputNormal
    semantics re-answered by the R3 max-slope accumulator."""
    from ..stages import viewshed as vs

    size = 64
    gy, gx = np.mgrid[0:size, 0:size]
    dem = (((gx * 73 + gy * 151) % 37) + ((gx * gy) % 11) * 3).astype(np.float32)
    t = pa.Table.from_pylist([{
        "z": 0, "x": 0, "y": 0, "band": 1, "width": size, "height": size,
        "crs": "EPSG:3857", "nodata": -1.0, "dtype": "float32", "data": dem.tobytes(),
    }])
    outs = []
    for mode in ("normal", "dem", "ground"):
        out = vs.viewshed(rd.from_arrow(t), observer_x=32, observer_y=32,
                          observer_height=2.0, mode=mode)

        def tag(tbl: pa.Table, mode=mode) -> pa.Table:
            tbl = tbl.select(["n_visible", "sum_x1000"])
            return tbl.append_column("mode", pa.array([mode] * tbl.num_rows))

        outs.append(out.map_batches(tag, batch_format="pyarrow"))
    ds = outs[0]
    for o in outs[1:]:
        ds = ds.union(o)
    return ds


def langid_q(sf_dir: str):
    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    return ds.map_batches(
        textops.LangId, batch_format="pyarrow", concurrency=_dconc()
    ).select_columns(["doc_id", "lang_pred"])


def fingerprint_q(sf_dir: str):
    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    return ds.map_batches(
        lambda t: textops.fingerprint_batch(t).select(["doc_id", "fingerprint"]),
        batch_format="pyarrow",
    )


def minhash_lsh_q(sf_dir: str):
    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    return dedup.minhash_lsh_dedup_pairs(ds, min_jaccard_x1000=500)


def ngram_jaccard_q(sf_dir: str):
    """Exact n-gram Jaccard near-dup pairs (LSH candidates -> true shingle-set
    verification via keyed joins — no corpus materialization)."""
    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    return dedup.ngram_jaccard_pairs(ds, min_x1000=300)


def simhash_q(sf_dir: str):
    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    return dedup.simhash_signatures(ds)


def simhash_neardup_q(sf_dir: str):
    """SimHash near-dup pairs at Hamming <= 3: 4x16-bit band join (recall 1
    at this threshold by pigeonhole) + exact SWAR-popcount verify, so the
    oracle is the pure Hamming self-join."""
    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    return dedup.simhash_neardup_pairs(ds, max_hamming=3, max_bucket=None)


def dup_clusters_q(sf_dir: str):
    """Duplicate clusters: connected components over the MinHash-LSH pair
    graph via distributed min-label propagation (cluster_id = min reachable
    doc_id)."""
    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    return dedup.dup_clusters(ds, min_jaccard_x1000=500)


def cluster_split_q(sf_dir: str):
    """Leakage-free train/val split: near-dup cluster members co-assigned
    (dedup.cluster_split — the post-dedup hygiene step; split key is the
    dup-cluster id, singletons their own id)."""
    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    return dedup.cluster_split(ds, min_jaccard_x1000=500)


def dedup_keep_best_q(sf_dir: str):
    """Canonical-doc selection per duplicate cluster: keep the member with
    max n_chars (ties -> min doc_id); membership attached via keyed union-tag
    groupby (no broadcast of the cluster set)."""
    docs = read_table(sf_dir, "documents", columns=["doc_id", "n_chars"])
    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    clusters = dedup.dup_clusters(ds, min_jaccard_x1000=500)
    return dedup.cluster_keep_best(docs, clusters)


def quality_classifier_q(sf_dir: str):
    """Hashed-bag-of-words linear quality classifier (fastText shape):
    stateful actor pool holds the word->bucket cache; integer fixed-point
    scores."""
    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    return ds.map_batches(
        textops.HashedLinearScorer, batch_format="pyarrow", concurrency=_dconc()
    )


def knn_tree_q(sf_dir: str):
    """kNN via best-first STRtree traversal (scale path) — same rows as join_knn."""
    z = _zones(sf_dir)
    cx = (z["minx"].to_numpy() + z["maxx"].to_numpy()) / 2.0
    cy = (z["miny"].to_numpy() + z["maxy"].to_numpy()) / 2.0
    targets = pa.table(
        {"zone_id": z["zone_id"], "zone_key": z["zone_key"], "cx": pa.array(cx), "cy": pa.array(cy)}
    )
    out = knn.knn_join(_docs_points(sf_dir), targets, k=KNN_K, tree=True)
    return out.select_columns(["doc_id", "zone_id", "rank"])


# -- coordinate transformers (alg/gdaltransformer.cpp family) ----------------
#
# Fixed deterministic control data shared with the SQL oracles: the oracle
# builder re-fits the same transformers from these literals and inlines the
# resulting coefficients, so both sides apply identical float64 models.

GCP_ORDER = 2
GCP_SRC_X = [float((i * 37) % 100) for i in range(12)]
GCP_SRC_Y = [float((i * 59) % 100) for i in range(12)]
GCP_DST_X = [
    5.0 + 1.02 * x - 0.15 * y + 0.0008 * x * y + ((i * 7) % 5 - 2) * 0.05
    for i, (x, y) in enumerate(zip(GCP_SRC_X, GCP_SRC_Y))
]
GCP_DST_Y = [
    -3.0 + 0.12 * x + 0.97 * y - 0.0005 * x * x + ((i * 11) % 5 - 2) * 0.05
    for i, (x, y) in enumerate(zip(GCP_SRC_X, GCP_SRC_Y))
]

TPS_SRC_X = [0.0, 100.0, 0.0, 100.0, 50.0, 25.0, 75.0, 50.0]
TPS_SRC_Y = [0.0, 0.0, 100.0, 100.0, 50.0, 75.0, 25.0, 10.0]
TPS_DST_X = [2.0, 103.0, -1.0, 99.5, 52.5, 24.0, 77.0, 51.0]
TPS_DST_Y = [-1.5, 1.0, 102.0, 98.0, 47.5, 77.5, 23.0, 12.0]

# mild invertible rational camera (RPC00B coefficient layout)
RPC_LINE_NUM = [0.002, 0.01, 1.0, 0.0, 0.0, 0.0, 0.0, 0.003, -0.002,
                0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0]
RPC_LINE_DEN = [1.0, 0.001, -0.002] + [0.0] * 17
RPC_SAMP_NUM = [-0.001, 1.0, 0.015, 0.0, 0.0, 0.0, 0.0, -0.004, 0.001,
                0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0]
RPC_SAMP_DEN = [1.0, -0.0015, 0.001] + [0.0] * 17
RPC_OFFSETS = dict(lon_off=0.0, lon_scale=90.0, lat_off=0.0, lat_scale=60.0,
                   h_off=100.0, h_scale=500.0, line_off=2048.0,
                   line_scale=2048.0, samp_off=2048.0, samp_scale=2048.0)
RPC_H = 200.0

# OSGB36 -> WGS84 Helmert parameters (public, OS legacy transformation)
HELMERT_PARAMS = (446.448, -125.157, 542.060, 0.1502, 0.2470, 0.8421, -20.4894)


def _fit_gcp_poly():
    from ..functions import transformer

    return transformer.GCPPolynomialTransformer(
        GCP_SRC_X, GCP_SRC_Y, GCP_DST_X, GCP_DST_Y, order=GCP_ORDER
    )


def _fit_tps():
    from ..functions import transformer

    return transformer.TPSTransformer(TPS_SRC_X, TPS_SRC_Y, TPS_DST_X, TPS_DST_Y)


def _make_rpc():
    from ..functions import transformer

    return transformer.RPCTransformer(
        RPC_LINE_NUM, RPC_LINE_DEN, RPC_SAMP_NUM, RPC_SAMP_DEN, **RPC_OFFSETS
    )


def reproject_utm_q(sf_dir: str):
    """gdalwarp -t_srs EPSG:32631 point path: Krueger-series ellipsoidal
    transverse mercator over docs inside UTM zone 31 (alg/gdaltransformer.cpp
    GDALReprojectionTransform role; ogrct.cpp projection engine).  Easting /
    northing quantized to cm so the SQL mirror's trig ULP noise cancels."""
    ds = _docs_points(sf_dir)
    from ..functions import transformer

    def fn(t: pa.Table) -> pa.Table:
        lon = t["lon"].to_numpy()
        lat = t["lat"].to_numpy()
        m = (np.abs(lon - 3.0) <= 6.0) & (np.abs(lat) <= 84.0)
        E, N = transformer.tmerc_forward(lon[m], lat[m], lon0=3.0)
        return pa.table(
            {
                "doc_id": t["doc_id"].filter(pa.array(m)),
                "e_cm": pa.array(np.round(E * 100.0).astype(np.int64)),
                "n_cm": pa.array(np.round(N * 100.0).astype(np.int64)),
            }
        )

    return ds.map_batches(fn, batch_format="pyarrow")


LCC_PARAMS = dict(lon0=-96.0, lat1=33.0, lat2=45.0, lat0=39.0)


def reproject_laea_cea_q(sf_dir: str):
    """Round-4 data-driven EPSG table sampler: ETRS89-LAEA (EPSG:3035,
    oblique Lambert azimuthal equal-area), EASE-Grid-2.0 North (EPSG:6931,
    polar LAEA) and EASE-Grid-2.0 global (EPSG:6933, cylindrical
    equal-area) over the Europe doc window; cm-quantized (reference:
    ogr/ogrct.cpp PROJ method routing for these EPSG codes)."""
    ds = _docs_points(sf_dir)
    from ..functions import transformer

    def fn(t: pa.Table) -> pa.Table:
        lon = t["lon"].to_numpy()
        lat = t["lat"].to_numpy()
        m = (np.abs(lon - 10.0) <= 25.0) & (lat >= 35.0) & (lat <= 70.0)
        lo, la = lon[m], lat[m]
        e1, n1 = transformer.laea_forward(lo, la, lon0=10.0, lat0=52.0,
                                          fe=4321000.0, fn=3210000.0)
        e2_, n2 = transformer.laea_forward(lo, la, lon0=0.0, lat0=90.0)
        e3, n3 = transformer.cea_forward(lo, la, lon0=0.0, lat_ts=30.0)

        def cm(v):
            return pa.array(np.round(v * 100.0).astype(np.int64))

        return pa.table({
            "doc_id": t["doc_id"].filter(pa.array(m)),
            "laea_e_cm": cm(e1), "laea_n_cm": cm(n1),
            "pol_e_cm": cm(e2_), "pol_n_cm": cm(n2),
            "cea_e_cm": cm(e3), "cea_n_cm": cm(n3),
        })

    return ds.map_batches(fn, batch_format="pyarrow")


def reproject_lcc_q(sf_dir: str):
    """Lambert Conformal Conic 2SP (Snyder PP1395; the CONUS Albers/LCC family
    ogrct.cpp serves) over docs in the projection's window; cm-quantized."""
    ds = _docs_points(sf_dir)
    from ..functions import transformer

    def fn(t: pa.Table) -> pa.Table:
        lon = t["lon"].to_numpy()
        lat = t["lat"].to_numpy()
        m = (np.abs(lon + 96.0) <= 30.0) & (lat >= 20.0) & (lat <= 60.0)
        E, N = transformer.lcc_forward(lon[m], lat[m], **LCC_PARAMS)
        return pa.table(
            {
                "doc_id": t["doc_id"].filter(pa.array(m)),
                "e_cm": pa.array(np.round(E * 100.0).astype(np.int64)),
                "n_cm": pa.array(np.round(N * 100.0).astype(np.int64)),
            }
        )

    return ds.map_batches(fn, batch_format="pyarrow")


STEREO_POLAR_PARAMS = dict(lon0=-45.0, lat_ts=70.0)   # EPSG:3413 method/params
STEREO_OBLIQUE_PARAMS = dict(lon0=5.0, lat0=52.0, k0=0.9999)
AEA_PARAMS = dict(lon0=-96.0, lat1=29.5, lat2=45.5, lat0=23.0)  # EPSG:5070


def _reproject_points_q(sf_dir: str, fwd, mask_fn, **kw):
    """Shared shape of the fixed-projection reproject queries: derive points,
    window-filter to the projection's domain, forward-project, cm-quantize."""
    ds = _docs_points(sf_dir)

    def fn(t: pa.Table) -> pa.Table:
        lon = t["lon"].to_numpy()
        lat = t["lat"].to_numpy()
        m = mask_fn(lon, lat)
        E, N = fwd(lon[m], lat[m], **kw)
        return pa.table(
            {
                "doc_id": t["doc_id"].filter(pa.array(m)),
                "e_cm": pa.array(np.round(E * 100.0).astype(np.int64)),
                "n_cm": pa.array(np.round(N * 100.0).astype(np.int64)),
            }
        )

    return ds.map_batches(fn, batch_format="pyarrow")


def reproject_stereo_polar_q(sf_dir: str):
    """Polar stereographic variant-B (EPSG 9829, the EPSG:3413 NSIDC grid)
    over docs north of 60N; Snyder 21-33..41 (ogr/ogrct.cpp
    SRS_PT_POLAR_STEREOGRAPHIC role)."""
    from ..functions import transformer

    return _reproject_points_q(
        sf_dir, transformer.stereo_polar_forward,
        lambda lon, lat: lat >= 60.0, **STEREO_POLAR_PARAMS)


def reproject_stereo_oblique_q(sf_dir: str):
    """Oblique (conformal-latitude) stereographic, Snyder 21-27..29 — the
    EPSG 9809 double-projection family (RD-New-style params on WGS84)."""
    from ..functions import transformer

    return _reproject_points_q(
        sf_dir, transformer.stereo_oblique_forward,
        lambda lon, lat: (np.abs(lon - 5.0) <= 30.0) & (lat >= 20.0) & (lat <= 70.0),
        **STEREO_OBLIQUE_PARAMS)


def reproject_albers_q(sf_dir: str):
    """Albers equal-area conic 2SP (Snyder 14-1..21; CONUS EPSG:5070 params)
    over docs in the projection window."""
    from ..functions import transformer

    return _reproject_points_q(
        sf_dir, transformer.aea_forward,
        lambda lon, lat: (np.abs(lon + 96.0) <= 30.0) & (lat >= 23.0) & (lat <= 52.0),
        **AEA_PARAMS)


def reproject_aeqd_q(sf_dir: str):
    """North-polar azimuthal equidistant (Snyder 25-1..15, meridian-arc rho)
    over docs north of 50N."""
    from ..functions import transformer

    return _reproject_points_q(
        sf_dir, transformer.aeqd_polar_forward,
        lambda lon, lat: lat >= 50.0, lon0=0.0)


def reproject_sinusoidal_q(sf_dir: str):
    """Ellipsoidal sinusoidal (Snyder 30-8/9; the MODIS ESRI:54008 family)
    over the full docs domain — equal-area, closed-form, no window filter."""
    from ..functions import transformer

    return _reproject_points_q(
        sf_dir, transformer.sinusoidal_forward,
        lambda lon, lat: np.ones(len(lon), dtype=bool), lon0=0.0)


def reproject_eqc_q(sf_dir: str):
    """Equidistant cylindrical, ellipsoidal (EPSG method 1028 / EPSG:4087
    at lat_ts=30 here): x along the standard parallel, y = meridian arc."""
    from ..functions import transformer

    return _reproject_points_q(
        sf_dir, transformer.eqc_forward,
        lambda lon, lat: np.ones(len(lon), dtype=bool), lon0=0.0, lat_ts=30.0)


def _reproject_epsg_q(sf_dir: str, code: int, mask_fn):
    """Registry-routed reproject (the round-5 general-CRS front door): the
    docs points filtered to a window, then ``crs.from_wgs84_lonlat`` —
    datum shift (negated-towgs84 Helmert through geocentric, when the CRS
    datum is not WGS84-coincident) + the projection-family kernel on the
    CRS's own ellipsoid (reference: ogr/ogrspatialreference.cpp
    importFromEPSG -> ogrct.cpp method routing).  cm-quantized."""
    from ..functions import crs as _crs

    d = _crs.epsg_def(code)
    ds = _docs_points(sf_dir)

    def fn(t: pa.Table) -> pa.Table:
        lon = t["lon"].to_numpy()
        lat = t["lat"].to_numpy()
        m = mask_fn(lon, lat)
        E, N = _crs.from_wgs84_lonlat(lon[m], lat[m], d)
        return pa.table(
            {
                "doc_id": t["doc_id"].filter(pa.array(m)),
                "e_cm": pa.array(np.round(E * 100.0).astype(np.int64)),
                "n_cm": pa.array(np.round(N * 100.0).astype(np.int64)),
            }
        )

    return ds.map_batches(fn, batch_format="pyarrow")


# validity windows for the registry-routed reproject queries (shared with
# the SQL oracle WHERE clauses in __ray_entry__._crs_oracles)
CRS_QUERY_WINDOWS = {
    27700: (-2.0, 15.0, 20.0, 80.0),    # (lon_c, lon_halfwidth, lat_lo, lat_hi)
    31370: (4.367486666666666, 25.0, 25.0, 70.0),
    2056: (7.439583333333333, 25.0, 25.0, 68.0),
    5514: (17.0, 12.0, 42.0, 57.0),  # clear of the oblique-cone apex ~59.7N
    3112: (134.0, 25.0, -45.0, -10.0),
}


def _crs_window_mask(code: int):
    lon_c, hw, lat_lo, lat_hi = CRS_QUERY_WINDOWS[code]
    return lambda lon, lat: ((np.abs(lon - lon_c) <= hw)
                             & (lat >= lat_lo) & (lat <= lat_hi))


def reproject_osgb_q(sf_dir: str):
    """EPSG:27700 OSGB36 / British National Grid: 7-param Helmert to
    OSGB36 + Krueger TM on Airy 1830 with a natural origin at 49N."""
    return _reproject_epsg_q(sf_dir, 27700, _crs_window_mask(27700))


def reproject_belge72_q(sf_dir: str):
    """EPSG:31370 BD72 / Belgian Lambert 72: 7-param Helmert to BD72 +
    LCC 2SP on International 1924 with lat0 = 90."""
    return _reproject_epsg_q(sf_dir, 31370, _crs_window_mask(31370))


def reproject_lv95_q(sf_dir: str):
    """EPSG:2056 CH1903+ / LV95: 3-param shift + Swiss oblique Mercator
    (EPSG 9814 double projection) on Bessel 1841."""
    return _reproject_epsg_q(sf_dir, 2056, _crs_window_mask(2056))


def reproject_krovak_q(sf_dir: str):
    """EPSG:5514 S-JTSK / Krovak East North: 3-param shift + Krovak
    oblique conformal conic (EPSG 9819) on Bessel 1841."""
    return _reproject_epsg_q(sf_dir, 5514, _crs_window_mask(5514))


def reproject_gda_lambert_q(sf_dir: str):
    """EPSG:3112 GDA94 / Geoscience Australia Lambert: LCC 2SP on GRS80
    (WGS84-coincident datum — no shift)."""
    return _reproject_epsg_q(sf_dir, 3112, _crs_window_mask(3112))


def grid_shift_q(sf_dir: str):
    """NTv2-style grid-shift datum transform over the docs points: bilinear
    shift-grid interpolation (the PROJ hgridshift role), plus a fixed-point
    inverse round-trip error ceiling asserted in tests.  Output quantized to
    1e-7 deg (~1 cm)."""
    ds = _docs_points(sf_dir)
    from ..functions import transformer

    t = transformer.demo_shift_grid()

    def fn(b: pa.Table) -> pa.Table:
        lon = b["lon"].to_numpy()
        lat = b["lat"].to_numpy()
        lo, la = t.forward(lon, lat)
        # floor(x + 0.5) on BOTH sides: grid-aligned points can land exactly
        # on .5 ties, where np.round (half-even) and SQL round (half-away)
        # disagree
        return pa.table(
            {
                "doc_id": b["doc_id"],
                "lon_e7": pa.array(np.floor(lo * 1e7 + 0.5).astype(np.int64)),
                "lat_e7": pa.array(np.floor(la * 1e7 + 0.5).astype(np.int64)),
            }
        )

    return ds.map_batches(fn, batch_format="pyarrow")


def grid_shift_multi_q(sf_dir: str):
    """Multi-subgrid NTv2 grid shift (NUM_FILE=2) THROUGH the .gsb binary
    format: root world grid + nested dense child over [0,40]x[0,30]; points
    inside the child extent use the child's bilinear shift (NTv2 child-wins
    rule), everything else the root.  Dyadic node values keep the float32
    round trip bitwise, so the oracle is the two-branch CASE mirror."""
    import os
    import tempfile

    from ..functions import transformer
    from ..sources import ntv2

    path = f"{tempfile.gettempdir()}/gdal_ray_multi_grid_{os.getpid()}.gsb"
    mg = transformer.demo_multi_grid()
    ntv2.write_gsb_multi(path, mg.grids)
    t = ntv2.read_gsb(path)
    ds = _docs_points(sf_dir)

    def fn(b: pa.Table) -> pa.Table:
        lon = b["lon"].to_numpy()
        lat = b["lat"].to_numpy()
        lo, la = t.forward(lon, lat)
        return pa.table(
            {
                "doc_id": b["doc_id"],
                "lon_e7": pa.array(np.floor(lo * 1e7 + 0.5).astype(np.int64)),
                "lat_e7": pa.array(np.floor(la * 1e7 + 0.5).astype(np.int64)),
            }
        )

    return ds.map_batches(fn, batch_format="pyarrow")


def transform_chain_q(sf_dir: str):
    """The reference's COMPOSED transformer chain (alg/gdaltransformer.cpp
    GDALGenImgProjTransform role; PROJ pipeline +nadgrids -> +towgs84 ->
    +proj=tmerc): NTv2 grid shift, then the 7-parameter Helmert datum shift,
    then ellipsoidal UTM zone 31 — every stage the already-verified engine
    transformer, chained.  Output quantized to cm with tie-safe floor(x+.5)."""
    ds = _docs_points(sf_dir)
    from ..functions import transformer

    g = transformer.demo_shift_grid()

    def fn(b: pa.Table) -> pa.Table:
        lon = b["lon"].to_numpy()
        lat = b["lat"].to_numpy()
        lon1, lat1 = g.forward(lon, lat)
        lon2, lat2, _h = transformer.datum_shift_lonlat(lon1, lat1, HELMERT_PARAMS)
        m = (np.abs(lon2 - 3.0) <= 6.0) & (np.abs(lat2) <= 84.0)
        E, N = transformer.tmerc_forward(lon2[m], lat2[m], lon0=3.0)
        return pa.table(
            {
                "doc_id": b["doc_id"].filter(pa.array(m)),
                "e_cm": pa.array(np.floor(E * 100.0 + 0.5).astype(np.int64)),
                "n_cm": pa.array(np.floor(N * 100.0 + 0.5).astype(np.int64)),
            }
        )

    return ds.map_batches(fn, batch_format="pyarrow")


def grid_shift_gsb_q(sf_dir: str):
    """Same grid-shift transform, but the grid travels through the NTv2 .gsb
    BINARY FORMAT: write the demo grid as a spec-conformant single-subgrid
    .gsb (positive-west longitudes, SE-origin node order, float32 records),
    parse it back, and apply.  The demo grid's dyadic arc-second values make
    the float32 round trip bitwise, so the oracle is the grid_shift SQL."""
    import tempfile

    from ..functions import transformer
    from ..sources import ntv2

    import os

    path = f"{tempfile.gettempdir()}/gdal_ray_demo_grid_{os.getpid()}.gsb"
    ntv2.write_gsb(path, transformer.demo_shift_grid())
    t = ntv2.read_gsb(path)
    ds = _docs_points(sf_dir)

    def fn(b: pa.Table) -> pa.Table:
        lon = b["lon"].to_numpy()
        lat = b["lat"].to_numpy()
        lo, la = t.forward(lon, lat)
        return pa.table(
            {
                "doc_id": b["doc_id"],
                "lon_e7": pa.array(np.floor(lo * 1e7 + 0.5).astype(np.int64)),
                "lat_e7": pa.array(np.floor(la * 1e7 + 0.5).astype(np.int64)),
            }
        )

    return ds.map_batches(fn, batch_format="pyarrow")


def datum_helmert_q(sf_dir: str):
    """7-parameter datum shift (geodetic -> geocentric -> Helmert -> Bowring
    geodetic), the PROJ +towgs84 pipeline the reference delegates to; output
    quantized to 1e-7 deg (~1 cm) and mm heights."""
    ds = _docs_points(sf_dir)
    from ..functions import transformer

    def fn(t: pa.Table) -> pa.Table:
        lon = t["lon"].to_numpy()
        lat = t["lat"].to_numpy()
        lo, la, h = transformer.datum_shift_lonlat(lon, lat, HELMERT_PARAMS)
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "lon_e7": pa.array(np.round(lo * 1e7).astype(np.int64)),
                "lat_e7": pa.array(np.round(la * 1e7).astype(np.int64)),
                "h_mm": pa.array(np.round(h * 1000.0).astype(np.int64)),
            }
        )

    return ds.map_batches(fn, batch_format="pyarrow")


def gcp_polynomial_q(sf_dir: str):
    """GCP polynomial transformer (order 2) applied to doc points scaled into
    the GCP domain — GDALGCPTransform role (alg/gdaltransformer.cpp).  The
    fit happens once on the driver; workers apply broadcast coefficients."""
    t = _fit_gcp_poly()
    cx, cy, order = t.cx, t.cy, t.order
    ds = _docs_points(sf_dir)
    from ..functions.transformer import GCPPolynomialTransformer

    def fn(b: pa.Table) -> pa.Table:
        x = (b["lon"].to_numpy() + 180.0) * (100.0 / 360.0)
        y = (b["lat"].to_numpy() + 85.0) * (100.0 / 170.0)
        ox, oy = GCPPolynomialTransformer._apply(cx, cy, x, y, order)
        return pa.table(
            {
                "doc_id": b["doc_id"],
                "ox_e4": pa.array(np.round(ox * 1e4).astype(np.int64)),
                "oy_e4": pa.array(np.round(oy * 1e4).astype(np.int64)),
            }
        )

    return ds.map_batches(fn, batch_format="pyarrow")


def tps_warp_q(sf_dir: str):
    """Thin-plate-spline GCP transformer (alg/thinplatespline.cpp role)
    applied to doc points in the control domain."""
    t = _fit_tps()
    ds = _docs_points(sf_dir)

    def fn(b: pa.Table) -> pa.Table:
        x = (b["lon"].to_numpy() + 180.0) * (100.0 / 360.0)
        y = (b["lat"].to_numpy() + 85.0) * (100.0 / 170.0)
        ox, oy = t.forward(x, y)
        return pa.table(
            {
                "doc_id": b["doc_id"],
                "ox_e4": pa.array(np.round(ox * 1e4).astype(np.int64)),
                "oy_e4": pa.array(np.round(oy * 1e4).astype(np.int64)),
            }
        )

    return ds.map_batches(fn, batch_format="pyarrow")


def rpc_transform_q(sf_dir: str):
    """RPC rational-polynomial ground->image transform at fixed height
    (alg/gdal_rpc.cpp RPCEvaluate / RPC00B layout)."""
    r = _make_rpc()
    ds = _docs_points(sf_dir)

    def fn(b: pa.Table) -> pa.Table:
        col, row = r.forward(b["lon"].to_numpy(), b["lat"].to_numpy(), h=RPC_H)
        return pa.table(
            {
                "doc_id": b["doc_id"],
                "col_e4": pa.array(np.round(col * 1e4).astype(np.int64)),
                "row_e4": pa.array(np.round(row * 1e4).astype(np.int64)),
            }
        )

    return ds.map_batches(fn, batch_format="pyarrow")


def geoloc_transform_q(sf_dir: str):
    """Geolocation-array transformer (alg/gdalgeoloc.cpp: GEOLOCATION
    metadata domain): pixel/line -> bilinear X/Y through a deterministic
    curvilinear grid (dyadic node formula — the forward interpolation is
    bit-exact in SQL), then the exact-inverse-bilinear recovery; the
    roundtrip returns the original integer pixel/line keys."""
    from ..functions.transformer import demo_geoloc_arrays

    g = demo_geoloc_arrays()
    ds = read_table(sf_dir, "documents", columns=["doc_id", "n_chars"])

    def fn(b: pa.Table) -> pa.Table:
        k = np.asarray(b["n_chars"].to_numpy() % 47, np.float64)
        m = np.asarray(pc.cast(b["doc_id"], pa.int64()).to_numpy() % 31,
                       np.float64)
        pix, lin = 0.5 + k, 0.5 + m  # grid coords k/2, m/2 (dyadic)
        X, Y = g.forward(pix, lin)
        p2, l2 = g.inverse(X, Y)
        return pa.table({
            "doc_id": b["doc_id"],
            "x64": pa.array(np.round(X * 64).astype(np.int64)),
            "y64": pa.array(np.round(Y * 64).astype(np.int64)),
            "rk": pa.array(np.round(p2 - 0.5).astype(np.int64)),
            "rm": pa.array(np.round(l2 - 0.5).astype(np.int64)),
        })

    return ds.map_batches(fn, batch_format="pyarrow")


def semi_join_orders_q(sf_dir: str):
    """Semi join (EXISTS subquery): orders with at least one heavy lineitem
    (l_quantity >= 48) — no broadcast; both sides hash-partition on the key."""
    orders = read_table(sf_dir, "orders", columns=["o_orderkey", "o_custkey"])
    heavy = read_table(sf_dir, "lineitem", columns=["l_orderkey", "l_quantity"])
    heavy = heavy.map_batches(
        lambda t: t.filter(pa.compute.greater_equal(t["l_quantity"], 48))
                   .select(["l_orderkey"]),
        batch_format="pyarrow")
    return relational.semi_anti_join_partitioned(
        orders, heavy, key="o_orderkey", build_key="l_orderkey")


def anti_join_customers_q(sf_dir: str):
    """Anti join (NOT EXISTS): customers with no high-value orders
    (o_totalprice > 400000) — the TPC-H Q22 shape."""
    cust = read_table(sf_dir, "customer", columns=["c_custkey", "c_nationkey"])
    orders = read_table(sf_dir, "orders", columns=["o_custkey", "o_totalprice"])
    big = orders.map_batches(
        lambda t: t.filter(pa.compute.greater(t["o_totalprice"], 400000.0))
                   .select(["o_custkey"]),
        batch_format="pyarrow")
    return relational.semi_anti_join_partitioned(
        cust, big, key="c_custkey", build_key="o_custkey", anti=True)


def event_gaps_q(sf_dir: str):
    """LAG/LEAD window: per event, whole seconds to the previous/next event
    of the same user (-1 at stream edges)."""
    ev = read_table(sf_dir, "events", columns=["event_id", "ts", "user_id"])
    return events.lag_lead_gaps(ev)


def span_stats_q(sf_dir: str):
    """Interleaved-corpus span statistics: per-doc span counts by kind, text
    char total, and the final offset (re-derives the offset invariant)."""
    from ..stages import media

    docs = rd.from_arrow(synthetic.make_docs(2000))
    return media.span_stats(docs)


def ogrmerge_layers_q(sf_dir: str):
    """ogrmerge.py append mode: two vector layers with DIFFERENT schemas
    merge into one (union schema, typed nulls for absent fields, layer
    provenance tag) — pure map + UNION ALL, no shuffle."""
    zones = _zones(sf_dir).select(
        ["zone_id", "zone_key", "minx", "miny", "maxx", "maxy"])
    keys = np.sort(pq.read_table(f"{sf_dir}/customer.parquet",
                                 columns=["c_custkey"])["c_custkey"].to_numpy())
    minx, miny, maxx, maxy = synthetic.zone_rects_from_keys(keys, CUST_RECT)
    cust = pa.table({"r_id": pa.array(keys.astype(np.int64)),
                     "minx": pa.array(minx), "miny": pa.array(miny),
                     "maxx": pa.array(maxx), "maxy": pa.array(maxy)})
    return relational.union_layers({
        "part_zones": rd.from_arrow(zones),
        "cust_zones": rd.from_arrow(cust),
    })


def mix_sources_q(sf_dir: str):
    """Data-mixture epoch weighting: per-source weights 0.25x-3.24x applied
    as deterministic repeat counts (floor + hash-Bernoulli fraction)."""
    docs = read_table(sf_dir, "documents", columns=["doc_id", "source"])
    return textops.epoch_mix(docs)


def hll_window_users_q(sf_dir: str):
    """Streaming COUNT(DISTINCT) at constant memory: HLL distinct-user
    estimate per tumbling hour over the events log."""
    from ..stages import sim

    ev = read_table(sf_dir, "events", columns=["user_id", "ts"])
    return sim.hll_window_estimate(ev)


CMS_QUERY_WORDS = ["table", "scan", "join", "window", "hash", "merge",
                   "value", "zebra"]


def cms_word_freq_q(sf_dir: str):
    """Count-Min sketch word-frequency estimates (4x1024 cells, md5 rows):
    bounded-memory heavy-hitter counting whose merge is an elementwise sum.
    The oracle rebuilds the identical sketch in SQL, so estimates —
    including any collision overcounts — hash-match exactly."""
    from ..stages import sim

    docs = read_table(sf_dir, "documents", columns=["text"])
    return sim.count_min_estimate(docs, CMS_QUERY_WORDS)


def hll_users_q(sf_dir: str):
    """HyperLogLog distinct-user estimate over events — the constant-memory
    COUNT(DISTINCT) sketch for 100 TB streams (64 registers; batch partials
    merge with max in any tree order).  The oracle recomputes every register
    from md5 hex arithmetic and the estimate from the same dyadic-exact
    sum, so even the float estimate hash-matches."""
    from ..stages import sim

    ev = read_table(sf_dir, "events", columns=["user_id"])
    return sim.hll_estimate(ev, "user_id")


def cell_cover_q(sf_dir: str):
    """S2-RegionCoverer-role quadtree cell cover (north-star H3/S2 index
    surface): mixed-level XYZ cells per zone — interior cells at the
    coarsest level that fits, boundary cells subdivided to z8.  The oracle
    replays the identical subdivision as a recursive CTE (power-of-two
    scaling is FP-exact, so the frontier matches cell for cell)."""
    zones = rd.from_arrow(_zones(sf_dir)).select_columns(
        ["zone_key", "minx", "miny", "maxx", "maxy"])
    return tiles.quad_cell_cover(zones, max_level=8)


def bpe_pairs_q(sf_dir: str):
    """BPE tokenizer-training step 1: corpus-wide top-20 adjacent byte pairs
    (within words), one bincount(65536) partial per batch."""
    docs = read_table(sf_dir, "documents", columns=["text"])
    return textops.bpe_pair_counts(docs, top_n=20)


def _nations_of(sf_dir: str, table: str, key: str, bal: str, pred):
    ds = read_table(sf_dir, table, columns=[key, bal])

    def fn(t: pa.Table) -> pa.Table:
        b = t[bal].to_numpy(zero_copy_only=False)
        return pa.table({"nationkey": pc.cast(t[key], pa.int64())}).filter(
            pa.array(pred(b)))

    return ds.map_batches(fn, batch_format="pyarrow")


def set_intersect_q(sf_dir: str):
    """SQL INTERSECT (distinct set semantics) as a combiner-bounded shuffle:
    nations having a rich customer AND a poor supplier."""
    a = _nations_of(sf_dir, "customer", "c_nationkey", "c_acctbal",
                    lambda b: b > 9000)
    b = _nations_of(sf_dir, "supplier", "s_nationkey", "s_acctbal",
                    lambda b: b < 1000)
    return relational.set_op(a, b, "nationkey", "intersect")


def set_except_q(sf_dir: str):
    """SQL EXCEPT: nations having a rich customer but NO poor supplier."""
    a = _nations_of(sf_dir, "customer", "c_nationkey", "c_acctbal",
                    lambda b: b > 9000)
    b = _nations_of(sf_dir, "supplier", "s_nationkey", "s_acctbal",
                    lambda b: b < 1000)
    return relational.set_op(a, b, "nationkey", "except")


def rank_events_q(sf_dir: str):
    """RANK + DENSE_RANK windows (ties share ranks — 42 tie groups at
    sf0.01): per user, events ranked by value_x100 descending."""
    ev = read_table(sf_dir, "events", columns=["event_id", "user_id", "value"])

    def prep(t: pa.Table) -> pa.Table:
        v = t["value"].to_numpy(zero_copy_only=False)
        return pa.table({
            "event_id": pc.cast(t["event_id"], pa.int64()),
            "user_id": pc.cast(t["user_id"], pa.int64()),
            "value_x100": pa.array(np.floor(v * 100.0 + 0.5).astype(np.int64)),
        })

    ranked = relational.group_rank(ev.map_batches(prep, batch_format="pyarrow"),
                                   "user_id", "value_x100", "event_id")
    return ranked.select_columns(["event_id", "user_id", "rnk", "drnk"])


def bloom_dedup_q(sf_dir: str):
    """Cross-corpus Bloom membership (constant-memory decontamination): the
    held-out set (doc_id % 7 == 0) builds an m=8192/k=3 Bloom filter (bounded
    distinct shuffle + one broadcast); candidates test their boilerplate
    PREFIX key (first 24 chars — whole texts are all-distinct in this corpus,
    prefixes genuinely collide) against it.  The oracle recomputes every bit
    position from md5 hex-char arithmetic, so hits AND any false positives
    match exactly."""
    docs = read_table(sf_dir, "documents", columns=["doc_id", "text"])

    def split(want_ref: bool):
        def fn(t: pa.Table) -> pa.Table:
            k = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
            is_ref = (k % 7) == 0
            t = t.set_column(t.column_names.index("text"), "text",
                             pc.utf8_slice_codeunits(t["text"], 0, 24))
            return t.filter(pa.array(is_ref if want_ref else ~is_ref))
        return fn

    ref = docs.map_batches(split(True), batch_format="pyarrow")
    cand = docs.map_batches(split(False), batch_format="pyarrow")
    return dedup.bloom_decontaminate(cand, ref)


def delaunay_triangles_q(sf_dir: str):
    """OGR DelaunayTriangulation (ogr/ogrgeometry.cpp surface, alg/delaunay.c
    algorithm role) as a distributed per-cell op: docs (doc_id < 400) hash to
    integer scatter coordinates, group into 8 cells, exact-integer
    Bowyer-Watson per cell.  The oracle is the Delaunay DEFINITION itself —
    every non-degenerate triple whose circumcircle is empty (exact BIGINT
    sign tests) — so the triangle sets match exactly in general position."""
    from ..stages import geomops

    docs = _docs(sf_dir)

    def scatter(t: pa.Table) -> pa.Table:
        k = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        keep = k < 400
        k = k[keep]
        return pa.table({
            "pt_id": pa.array(k),
            "cell": pa.array(k % 8),
            "x": pa.array((k * 2654435761) % 2039),
            "y": pa.array((k * 40503 + 12345) % 2039),
        })

    pts = docs.map_batches(scatter, batch_format="pyarrow")
    return geomops.delaunay_per_cell(pts)


def span_roundtrip_q(sf_dir: str):
    """North-rule per-row invariant, end to end THROUGH the engine's own
    sink + source: interleaved docs -> key-partitioned parquet sink (atomic
    publish + resume manifest, io.write_partitioned) -> parallel read-back ->
    order-sensitive span-sequence digest over (kind, text, media_ref, offset).

    The oracle recomputes the digest from the deterministic corpus definition
    alone, so any span lost, reordered, or mutated anywhere in the sink/source
    path hash-fails — span-sequence equality per BASELINE input_hint."""
    import os
    import shutil
    import tempfile

    from ..sources import io as gio
    from ..stages import media

    docs = rd.from_arrow(synthetic.make_docs(2000))
    root = f"{tempfile.gettempdir()}/gdal_ray_spanrt_{os.getpid()}"
    if os.path.exists(root):
        shutil.rmtree(root)
    nparts = 4

    def part_fn(ds, pid):
        p = int(pid)

        def flt(t: pa.Table) -> pa.Table:
            k = synthetic.doc_id_to_key(t["doc_id"])
            return t.filter(pa.array((k % nparts) == p))

        return ds.map_batches(flt, batch_format="pyarrow")

    gio.write_partitioned(docs, root, [str(i) for i in range(nparts)], part_fn,
                          lineage={"op": "span_roundtrip"})
    files = sorted(
        os.path.join(root, d, f)
        for d in os.listdir(root) if d.startswith("part=")
        for f in os.listdir(os.path.join(root, d)) if f.endswith(".parquet")
    )
    back = rd.read_parquet(files)
    return media.span_sequence_signature(back)


def span_filter_media_q(sf_dir: str):
    """Span surgery: drop all video spans, recompute the running-offset
    invariant, and digest the resulting span sequences — proves the engine
    TRANSFORMS interleaved payloads while preserving the input_hint
    contract (the oracle rebuilds the filtered sequences from scratch)."""
    from ..stages import media

    docs = rd.from_arrow(synthetic.make_docs(2000))
    return media.span_sequence_signature(media.filter_spans(docs, ("video",)))


def span_text_extract_q(sf_dir: str):
    """Interleaved corpus -> per-doc full text (text spans concatenated in
    span order): n_chars + md5 digest, oracle-recomputed from the corpus
    definition including the generated words themselves."""
    from ..stages import media

    docs = rd.from_arrow(synthetic.make_docs(2000))
    return media.span_text_extract(docs)


def span_media_bytes_q(sf_dir: str):
    """Media-ref resolution: per-doc media span count + total payload bytes
    (deterministic md5-derived sizes) — the storage-planning aggregate."""
    from ..stages import media

    docs = rd.from_arrow(synthetic.make_docs(2000))
    return media.span_media_bytes(docs)


def hilbert_sort_topk_q(sf_dir: str):
    """TRUE Hilbert spatial sort (SURVEY §2.6, alg/hilbert rotate-and-flip
    curve): encode z12 tile coords to Hilbert distance per batch, then
    distributed top-k on (hkey, doc_id) — the physical-clustering order a
    spatially-sorted write would use."""
    ds = tiles.assign_tiles(_docs(sf_dir), zooms=(12,)).select_columns(
        ["doc_id", "tx_12", "ty_12"])

    def encode(t: pa.Table) -> pa.Table:
        tx = t["tx_12"].to_numpy(zero_copy_only=False).astype(np.int64)
        ty = t["ty_12"].to_numpy(zero_copy_only=False).astype(np.int64)
        return t.append_column("hkey", pa.array(geo.hilbert_encode(tx, ty, order=12)))

    return relational.top_k(ds.map_batches(encode, batch_format="pyarrow"),
                            ["hkey", "doc_id"], descending=[False, False], k=100)


def _zones_vertex_verify(ds):
    """Shared verifier for vector-driver roundtrips: per-feature attribute
    echo + exact 0.01-grid vertex sums from the decoded WKB."""
    from ..functions import wkb as wkb_f

    def verify(t: pa.Table) -> pa.Table:
        ks, ids, nv, cs = [], [], [], []
        for i in range(t.num_rows):
            g = wkb_f.decode(t["wkb"][i].as_py())
            v = g.vertices()
            q = np.floor(v * 100.0 + 0.5).astype(np.int64)
            ks.append(t["zone_key"][i].as_py())
            ids.append(t["zone_id"][i].as_py())
            nv.append(len(v))
            cs.append(int(q.sum()))
        return pa.table({
            "zone_key": pa.array(ks, pa.int64()),
            "zone_id": pa.array(ids, pa.string()),
            "n_vertices": pa.array(nv, pa.int64()),
            "coord_sum_x100": pa.array(cs, pa.int64()),
        })

    return ds.map_batches(verify, batch_format="pyarrow")


def geojson_roundtrip_q(sf_dir: str):
    """GeoJSONSeq driver: zones -> newline-delimited GeoJSON -> parallel
    line-split read -> WKB; repr-shortest JSON floats keep f64 bitwise."""
    import os
    import tempfile

    from ..sources import geojson as gj

    zones = _zones(sf_dir)
    path = f"{tempfile.gettempdir()}/gdal_ray_zones_{os.getpid()}.geojsonl"
    gj.write_geojson(path, zones["wkb"].to_pylist(),
                     pa.table({"zone_id": zones["zone_id"],
                               "zone_key": zones["zone_key"]}), seq=True)
    return _zones_vertex_verify(gj.read_geojsonseq_dataset(path))


def osm_roundtrip_q(sf_dir: str):
    """Round-5 OSM PBF driver: part keys -> deterministic dense nodes +
    5-node ways, serialized through the from-scratch PBF writer (zlib
    blobs, delta-coded sint64 packing, string table), blob-manifest read
    back through Ray, ways assembled to LineString WKB via the node join,
    and reduced to (way_id, n_pts, lon_e7/lat_e7 sums) with a pure-SQL
    closed-form mirror (ogr/ogrsf_frmts/osm/ogrosmdatasource.cpp role;
    autotest/ogr/ogr_osm.py parity)."""
    import os
    import tempfile

    from ..functions import wkb as wkb_f
    from ..sources import osmpbf

    keys = np.sort(pq.read_table(f"{sf_dir}/part.parquet",
                                 columns=["p_partkey"])
                   ["p_partkey"].to_numpy().astype(np.int64))
    lon = -180.0 + ((keys * 9973) % 36000) / 100.0
    lat = -85.0 + ((keys * 7919) % 17000) / 100.0
    nodes = [(int(k), float(lo), float(la), None)
             for k, lo, la in zip(keys, lon, lat)]
    ways = []
    for j in range(len(keys) // 5):
        refs = [int(k) for k in keys[5 * j:5 * j + 5]]
        ways.append((j + 1, refs, {"highway": "x"}))
    path = f"{tempfile.gettempdir()}/gdal_ray_osm_{os.getpid()}.osm.pbf"
    osmpbf.write_osm_pbf(path, nodes, ways)

    nd = osmpbf.read_osm_nodes(path)
    wd = osmpbf.read_osm_ways(path)
    lines = osmpbf.assemble_way_lines(wd, nd)

    def finish(t: pa.Table) -> pa.Table:
        wid, npts, slon, slat = [], [], [], []
        for i in range(t.num_rows):
            g = wkb_f.decode(t["wkb"][i].as_py())
            pts = g.parts[0]
            wid.append(t["id"][i].as_py())
            npts.append(len(pts))
            slon.append(int(np.round(pts[:, 0] * 1e7).astype(np.int64)
                            .sum()))
            slat.append(int(np.round(pts[:, 1] * 1e7).astype(np.int64)
                            .sum()))
        return pa.table({"way_id": pa.array(wid, pa.int64()),
                         "n_pts": pa.array(npts, pa.int64()),
                         "sum_lon_e7": pa.array(slon, pa.int64()),
                         "sum_lat_e7": pa.array(slat, pa.int64())})

    return lines.map_batches(finish, batch_format="pyarrow")


def vsizip_roundtrip_q(sf_dir: str):
    """VSI container layer (/vsizip + /vsigzip, port/cpl_vsil_gzip.cpp):
    half the zones ride a zipped GeoJSON, half a gzipped one; both open
    through the GDALOpen-style vector opener with vsi paths and union back
    to the full layer — exercising archive resolution, the single-member
    shorthand, and the content-keyed extraction cache."""
    import os
    import tempfile

    from ..sources import geojson as gj
    from ..sources import openvector as ov
    from ..sources import vsi

    zones = _zones(sf_dir)
    n = zones.num_rows
    root = f"{tempfile.gettempdir()}/gdal_ray_vsi_q_{os.getpid()}"
    os.makedirs(root, exist_ok=True)
    halves = [zones.slice(0, n // 2), zones.slice(n // 2)]
    paths = []
    for i, part in enumerate(halves):
        p = f"{root}/zones{i}.geojson"
        gj.write_geojson(p, part["wkb"].to_pylist(),
                         pa.table({"zone_id": part["zone_id"],
                                   "zone_key": part["zone_key"]}))
        paths.append(p)
    arch = vsi.zip_sink_dir(paths[0], f"{root}/zones0.zip")
    gz = vsi.gzip_file(paths[1])
    t0 = ov.open_vector(f"/vsizip/{arch}")  # single-member shorthand
    t1 = ov.open_vector(f"/vsigzip/{gz}")
    return _zones_vertex_verify(rd.from_arrow(pa.concat_tables([t0, t1])))


def gpx_roundtrip_q(sf_dir: str):
    """GPX driver (ogr/ogrsf_frmts/gpx): a waypoint per part key plus a
    route per 16th key, written to one .gpx and read back in PARALLEL
    (element byte-range manifest); lat/lon are exact 0.25-grid dyadics so
    repr serialization is bitwise and the mirror is closed-form."""
    import os
    import tempfile

    from ..sources import gpx

    pk = np.sort(pq.read_table(f"{sf_dir}/part.parquet",
                               columns=["p_partkey"])["p_partkey"].to_numpy())
    x = (-180.0 + (pk % 1400).astype(np.float64) * 0.25)
    y = (-85.0 + (pk % 560).astype(np.float64) * 0.25)
    from ..functions import wkb as wkb_f

    wkbs = wkb_f.encode_points(x, y)
    path = f"{tempfile.gettempdir()}/gdal_ray_gpx_{os.getpid()}.gpx"
    gpx.write_gpx(path, wkbs,
                  pa.table({"name": pa.array([f"p{k}" for k in pk]),
                            "pk": pa.array(pk.astype(np.int64))}))
    ds = gpx.read_gpx_dataset(path, "waypoints", per_block=256)

    def verify(t: pa.Table) -> pa.Table:
        xs, ys = wkb_f.decode_points(t["wkb"].to_pylist())
        return pa.table({
            "pk": pc.cast(t["pk"], pa.int64()),
            "name": t["name"],
            "x4": pa.array(np.floor(xs * 4 + 0.5).astype(np.int64)),
            "y4": pa.array(np.floor(ys * 4 + 0.5).astype(np.int64)),
        })

    return ds.map_batches(verify, batch_format="pyarrow")


def dxf_roundtrip_q(sf_dir: str):
    """DXF driver (ogr/ogrsf_frmts/dxf): zone polygons travel as
    solid-fill HATCH boundary paths (the reference writer's mapping) and
    read back in parallel via the entity byte-range manifest."""
    import os
    import tempfile

    from ..sources import dxf

    zones = _zones(sf_dir)
    path = f"{tempfile.gettempdir()}/gdal_ray_dxf_{os.getpid()}.dxf"
    dxf.write_dxf(path, zones["wkb"].to_pylist(),
                  pa.table({"Layer": zones["zone_id"]}))
    ds = dxf.read_dxf_dataset(path, per_block=256)

    # recover zone_key by joining zone_id (unique per zone)
    key_by_id = dict(zip(zones["zone_id"].to_pylist(),
                         zones["zone_key"].to_pylist()))

    def attach(t: pa.Table) -> pa.Table:
        ids = t["Layer"].to_pylist()
        return pa.table({
            "wkb": t["wkb"], "zone_id": t["Layer"],
            "zone_key": pa.array([key_by_id[i] for i in ids], pa.int64()),
        })

    return _zones_vertex_verify(ds.map_batches(attach,
                                               batch_format="pyarrow"))


def gpkg_roundtrip_q(sf_dir: str):
    """GeoPackage driver: zones -> .gpkg (GP-binary blobs, spec metadata
    tables) -> fid-range parallel scan -> WKB (bitwise through the blob)."""
    import os
    import tempfile

    from ..sources import gpkg

    zones = _zones(sf_dir)
    path = f"{tempfile.gettempdir()}/gdal_ray_zones_{os.getpid()}.gpkg"
    if os.path.exists(path):
        os.remove(path)
    gpkg.write_gpkg(path, "zones", zones["wkb"].to_pylist(),
                    pa.table({"zone_id": zones["zone_id"],
                              "zone_key": zones["zone_key"]}))
    return _zones_vertex_verify(gpkg.read_gpkg_dataset(path, "zones"))


def kml_roundtrip_q(sf_dir: str):
    """KML driver: zones -> Placemark/ExtendedData KML -> driver-side
    placemark byte-range scan -> parallel per-range XML parse -> WKB
    (repr-shortest floats keep f64 bitwise).  KML attributes are untyped
    strings per the spec, so the pipeline casts them back explicitly."""
    import os
    import tempfile

    from ..sources import kml as kml_drv

    zones = _zones(sf_dir)
    path = f"{tempfile.gettempdir()}/gdal_ray_zones_{os.getpid()}.kml"
    kml_drv.write_kml(path, zones["wkb"].to_pylist(),
                      pa.table({"zone_id": zones["zone_id"],
                                "zone_key": zones["zone_key"]}))
    ds = kml_drv.read_kml_dataset(path, per_block=64)

    def cast(t: pa.Table) -> pa.Table:
        return pa.table({
            "zone_id": t["zone_id"],
            "zone_key": pc.cast(t["zone_key"], pa.int64()),
            "wkb": t["wkb"],
        })

    return _zones_vertex_verify(ds.map_batches(cast, batch_format="pyarrow"))


def gml_roundtrip_q(sf_dir: str):
    """GML driver: zones -> GML 3.2 featureMembers (ogr: attribute layout)
    -> driver-side byte-range scan -> parallel per-range XML parse -> WKB
    (repr-shortest floats keep f64 bitwise)."""
    import os
    import tempfile

    from ..sources import gml as gml_drv

    zones = _zones(sf_dir)
    path = f"{tempfile.gettempdir()}/gdal_ray_zones_{os.getpid()}.gml"
    gml_drv.write_gml(path, zones["wkb"].to_pylist(),
                      pa.table({"zone_id": zones["zone_id"],
                                "zone_key": zones["zone_key"]}))
    ds = gml_drv.read_gml_dataset(path, per_block=64)

    def cast(t: pa.Table) -> pa.Table:
        return pa.table({
            "zone_id": t["zone_id"],
            "zone_key": pc.cast(t["zone_key"], pa.int64()),
            "wkb": t["wkb"],
        })

    return _zones_vertex_verify(ds.map_batches(cast, batch_format="pyarrow"))


def ogr2ogr_convert_q(sf_dir: str):
    """ogr2ogr-style conversion chain (apps/ogr2ogr_lib.cpp surface): zones
    -> GeoPackage -> parallel fid-range read -> attribute filter (-where
    "zone_key % 5 = 0") -> distributed CSV sink with a WKT geometry column
    -> parallel CSV read -> WKT parse -> vertex verification.  Geometry is
    bitwise through GPKG blobs and WKT repr floats."""
    import os
    import shutil
    import tempfile

    from ..sources import csvgeo, gpkg

    zones = _zones(sf_dir)
    base = f"{tempfile.gettempdir()}/gdal_ray_o2o_{os.getpid()}"
    path = base + ".gpkg"
    if os.path.exists(path):
        os.remove(path)
    gpkg.write_gpkg(path, "zones", zones["wkb"].to_pylist(),
                    pa.table({"zone_id": zones["zone_id"],
                              "zone_key": zones["zone_key"]}))
    ds = gpkg.read_gpkg_dataset(path, "zones").map_batches(
        lambda t: t.filter(
            pa.compute.equal(
                pa.compute.subtract(
                    t["zone_key"],
                    pa.compute.multiply(pa.compute.divide(t["zone_key"], 5), 5)),
                0))
        .select(["zone_id", "zone_key", "wkb"]),
        batch_format="pyarrow")
    out_dir = base + "_csv"
    shutil.rmtree(out_dir, ignore_errors=True)
    csvgeo.write_csv_layer(ds, out_dir)
    return _zones_vertex_verify(csvgeo.read_csv_layer(out_dir))


def running_total_q(sf_dir: str):
    """Window cumulative SUM per user ordered by (ts, event_id), exact cents."""
    ev = read_table(sf_dir, "events", columns=["event_id", "ts", "user_id", "value"])
    return events.running_totals(ev)


def mvt_roundtrip_q(sf_dir: str):
    """MVT vector-tile driver roundtrip (ogr/ogrsf_frmts/mvt analogue):
    docs -> z6 tile assignment + in-tile extent-4096 quantization -> one
    protobuf tile blob per (x, y) -> parse every blob back and aggregate the
    DECODED features, proving the codec end-to-end.  Oracle recomputes the
    quantized coordinates closed-form."""
    from ..sources import mvt

    ds = _docs(sf_dir, ("doc_id", "n_chars"))
    tiles_ds = mvt.mvt_point_tiles(ds, zoom=6)

    def verify(t: pa.Table) -> pa.Table:
        rows = []
        for i in range(t.num_rows):
            (ly,) = mvt.parse_tile(t["mvt"][i].as_py())
            if ly["version"] != 2 or ly["extent"] != 4096:
                raise ValueError("bad MVT layer header")
            feats = ly["features"]
            rows.append({
                "tx": t["tx"][i].as_py(), "ty": t["ty"][i].as_py(),
                "n_features": len(feats),
                "sum_px": sum(p[0] for f in feats for p in f["points"]),
                "sum_py": sum(p[1] for f in feats for p in f["points"]),
                "sum_nchars": sum(f["attrs"]["n_chars"] for f in feats),
            })
        return pa.Table.from_pylist(rows)

    return tiles_ds.map_batches(verify, batch_format="pyarrow")


def pmtiles_roundtrip_q(sf_dir: str):
    """Round-5 PMTiles container (ogr/ogrsf_frmts/pmtiles analogue): the
    mvt_roundtrip tile set packed into a PMTiles v3 archive (Hilbert tile
    ids, varint delta directories, gzip internals, content dedup), read
    back through the entry-manifest Ray path, MVT-decoded and aggregated —
    same closed-form oracle as mvt_roundtrip by construction."""
    import os
    import tempfile

    from ..sources import mvt, pmtiles as pm

    ds = _docs(sf_dir, ("doc_id", "n_chars"))
    tiles_ds = mvt.mvt_point_tiles(ds, zoom=6)
    path = f"{tempfile.gettempdir()}/gdal_ray_pm_{os.getpid()}.pmtiles"

    def tile_iter():
        # archive assembly: streamed batches; driver holds the payload
        # bytes only while writing the single-file container (same bound
        # as the SOZip sink)
        for b in tiles_ds.iter_batches(batch_format="pyarrow"):
            for i in range(b.num_rows):
                yield (6, b["tx"][i].as_py(), b["ty"][i].as_py(),
                       b["mvt"][i].as_py())

    pm.write_pmtiles(path, tile_iter(), tile_type=pm.TILETYPE_MVT)

    out = pm.read_tiles(path)

    def verify(t: pa.Table) -> pa.Table:
        rows = []
        for i in range(t.num_rows):
            (ly,) = mvt.parse_tile(t["data"][i].as_py())
            feats = ly["features"]
            rows.append({
                "tx": t["x"][i].as_py(), "ty": t["y"][i].as_py(),
                "n_features": len(feats),
                "sum_px": sum(p[0] for f in feats for p in f["points"]),
                "sum_py": sum(p[1] for f in feats for p in f["points"]),
                "sum_nchars": sum(f["attrs"]["n_chars"] for f in feats),
            })
        return pa.Table.from_pylist(rows)

    return out.map_batches(verify, batch_format="pyarrow")


def mbtiles_roundtrip_q(sf_dir: str):
    """Round-5 MBTiles container (frmts/mbtiles analogue): the
    mvt_roundtrip tile set written into an MBTiles SQLite archive
    (TMS-flipped rows, gzip MVT payloads), read back through the
    index-manifest Ray path (workers open read-only and unwrap their
    own blobs), decoded and aggregated — same closed-form oracle as
    mvt_roundtrip by construction."""
    import os
    import tempfile

    from ..sources import mbtiles as mbt, mvt

    ds = _docs(sf_dir, ("doc_id", "n_chars"))
    tiles_ds = mvt.mvt_point_tiles(ds, zoom=6)
    path = f"{tempfile.gettempdir()}/gdal_ray_mb_{os.getpid()}.mbtiles"

    def tile_iter():
        for b in tiles_ds.iter_batches(batch_format="pyarrow"):
            for i in range(b.num_rows):
                yield (6, b["tx"][i].as_py(), b["ty"][i].as_py(),
                       b["mvt"][i].as_py())

    mbt.write_mbtiles(path, tile_iter(), gzip_tiles=True)
    out = mbt.read_tiles(path)

    def verify(t: pa.Table) -> pa.Table:
        rows = []
        for i in range(t.num_rows):
            (ly,) = mvt.parse_tile(t["data"][i].as_py())
            feats = ly["features"]
            rows.append({
                "tx": t["x"][i].as_py(), "ty": t["y"][i].as_py(),
                "n_features": len(feats),
                "sum_px": sum(p[0] for f in feats for p in f["points"]),
                "sum_py": sum(p[1] for f in feats for p in f["points"]),
                "sum_nchars": sum(f["attrs"]["n_chars"] for f in feats),
            })
        return pa.Table.from_pylist(rows)

    return out.map_batches(verify, batch_format="pyarrow")


def pq_codes_q(sf_dir: str):
    """Product-quantization codes over the embeddings table: 4 subspaces x
    8 codewords, 2 deterministic Lloyd iterations per codebook — the IVF-PQ
    compression stage for corpus-scale ANN."""
    ds = read_table(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    return sim.pq_encode(ds, m=4, k=8, iters=2)


def pq_adc_topk_q(sf_dir: str):
    """IVF-PQ-style asymmetric-distance top-10: exact integer ADC over the
    e6-quantized codebooks for a closed-form query vector."""
    ds = read_table(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    q_e6 = ((np.arange(64, dtype=np.int64) * 37) % 19 - 9) * 100000
    return sim.pq_adc_topk(ds, q_e6, m=4, k=8, iters=2, topk=10)


def duplicated_spans_q(sf_dir: str):
    """Exact duplicated-substring spans (every byte position whose 16-gram
    occurs >1 time in the corpus, merged to maximal per-doc spans) — the
    substring-level dedup of Lee et al. 2022, gram-partitioned."""
    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    return dedup.duplicated_spans(ds)


def string_agg_top_q(sf_dir: str):
    """Ordered STRING_AGG per segment: comma-joined names of the 3 customers
    with the highest account balances (ties -> lowest key)."""
    ds = read_table(sf_dir, "customer",
                    columns=["c_mktsegment", "c_name", "c_acctbal", "c_custkey"])

    def cents(t: pa.Table) -> pa.Table:
        return relational.scaled_int_column(t, "c_acctbal", 100, "bal_cents")

    return relational.group_string_agg_topn(
        ds.map_batches(cents, batch_format="pyarrow"),
        "c_mktsegment", "c_name", "bal_cents", "c_custkey", n=3)


def weighted_sample_q(sf_dir: str):
    """Weighted sampling without replacement (Efraimidis-Spirakis exponential
    keys, deterministic md5-derived uniforms): the 20 docs with the smallest
    -ln(u)/weight keys — the quality-weighted corpus subsample primitive."""
    ds = read_table(sf_dir, "documents", columns=["doc_id", "n_chars"])
    keyed = ds.map_batches(textops.weighted_sample_keys, batch_format="pyarrow")
    return relational.top_k(
        keyed.select_columns(["doc_id", "es_key_e12"]),
        ["es_key_e12", "doc_id"], descending=[False, False], k=20)


def filter_cascade_q(sf_dir: str):
    """FineWeb/C4-style keep/drop cascade with reason codes: short -> lang ->
    content-fingerprint dup -> keep (see textops.filter_cascade)."""
    ds = read_table(sf_dir, "documents", columns=["doc_id", "text", "lang"])
    return textops.filter_cascade(ds)


def text_normalize_q(sf_dir: str):
    """Text normalization (C4-style cleaning): lowercase, collapse internal
    whitespace runs, trim — emit normalized length and a 16-char prefix
    (one RE2 pass per rule; pyarrow == DuckDB match sets)."""
    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])

    def fn(t: pa.Table) -> pa.Table:
        norm = pc.utf8_trim_whitespace(
            pc.replace_substring_regex(
                pc.utf8_lower(t["text"]), pattern=" +", replacement=" "))
        return pa.table({
            "doc_id": t["doc_id"],
            "norm_len": pc.cast(pc.utf8_length(norm), pa.int64()),
            "prefix16": pc.utf8_slice_codeunits(norm, 0, 16),
        })

    return ds.map_batches(fn, batch_format="pyarrow")


def char_entropy_q(sf_dir: str):
    """Character-entropy quality signal per doc (order-invariant integer
    entropy numerator; see textops.char_entropy_batch)."""
    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    return ds.map_batches(
        textops.char_entropy_batch, batch_format="pyarrow"
    ).select_columns(["doc_id", "ent_num", "n_chars_t", "distinct_chars"])


def mosaic_compose_q(sf_dir: str):
    """gdalbuildvrt / raster mosaic overlay resolution: rects composed over
    checker, last non-nodata wins per pixel ((z,x,y)-keyed shuffle,
    rastermap.mosaic).  Per-tile checksums are the golden."""
    from ..stages import rastermap

    a = synthetic.make_raster_tiles("checker", 3, 3, size=64)
    b = synthetic.make_raster_tiles("rects", 3, 3, size=64)
    out = rastermap.mosaic([rd.from_arrow(a), rd.from_arrow(b)], nodata=0.0)
    return out.select_columns(["x", "y", "checksum"])


WARP_BLEND_RECT_A = (10, 10, 150, 150)
WARP_BLEND_RECT_B = (60, 40, 180, 170)


def warp_blend_q(sf_dir: str):
    """gdalwarp density/feather blending of two overlapping sources
    (alg/gdalwarper.cpp density masks): per-pixel integer edge-distance
    densities (ramp width 16), exact weighted-mean blend, per-tile
    checksums as the golden."""
    from ..stages import rastermap

    a = synthetic.make_footprint_layer(WARP_BLEND_RECT_A, 1, 2, 251, 3, 3)
    b = synthetic.make_footprint_layer(WARP_BLEND_RECT_B, 3, 1, 241, 3, 3)
    out = rastermap.mosaic_blend(
        [(rd.from_arrow(a), WARP_BLEND_RECT_A),
         (rd.from_arrow(b), WARP_BLEND_RECT_B)],
        feather=16,
    )
    return out.select_columns(["x", "y", "checksum"])


def scalar_funcs_props_q(sf_dir: str):
    """HSTORE_GET_VALUE analogue + ILIKE (ogr/swq_op_registrar.cpp:28-61,
    ogr/swq_op_general.cpp): extract the numeric 'k' property from the JSON
    props string with one RE2 pass (pyarrow == DuckDB match sets, same
    guarantee as scrub_pii), case-insensitive LIKE on event_type, and a
    CASE bucket over the extracted value."""
    ds = read_table(sf_dir, "events", columns=["event_id", "event_type", "props"])

    def fn(t: pa.Table) -> pa.Table:
        ext = pc.extract_regex(t["props"], r'"k": (?P<v>\d+)')
        kv = pc.cast(pc.struct_field(ext, "v"), pa.int64())
        up = pc.utf8_upper(t["event_type"])
        ilike_ck = pc.match_substring(up, "CK")  # event_type ILIKE '%ck%'
        bucket = pc.if_else(
            pc.greater_equal(kv, pa.scalar(66, pa.int64())), pa.scalar("hi"),
            pc.if_else(pc.greater_equal(kv, pa.scalar(33, pa.int64())),
                       pa.scalar("mid"), pa.scalar("lo")))
        return pa.table(
            {"event_id": t["event_id"], "k_val": kv,
             "ilike_ck": ilike_ck, "bucket": bucket}
        )

    return ds.map_batches(fn, batch_format="pyarrow")


def scalar_funcs_datetime_q(sf_dir: str):
    """Datetime scalar surface (OGR SQL datetime field semantics,
    ogr/ogr_swq.h field types; SQLite dialect date functions): EXTRACT
    year/month/day, ISO day-of-week, epoch days, day difference to a fixed
    date, and a month bucket — all integer-exact pyarrow temporal kernels."""
    ds = read_table(sf_dir, "orders", columns=["o_orderkey", "o_orderdate"])

    def fn(t: pa.Table) -> pa.Table:
        d = t["o_orderdate"]
        us = pc.cast(d, pa.int64())  # epoch microseconds
        epoch_day = pc.divide(us, pa.scalar(86_400_000_000, pa.int64()))
        # days since 1995-01-01 (may be negative; exact integer arithmetic)
        ref_day = pa.scalar(9131, pa.int64())  # 1995-01-01 in epoch days
        return pa.table(
            {
                "o_orderkey": t["o_orderkey"],
                "yr": pc.cast(pc.year(d), pa.int64()),
                "mo": pc.cast(pc.month(d), pa.int64()),
                "dy": pc.cast(pc.day(d), pa.int64()),
                # pyarrow day_of_week: Monday=0 == DuckDB isodow-1
                "dow": pc.cast(pc.day_of_week(d), pa.int64()),
                "epoch_day": epoch_day,
                "days_since_95": pc.subtract(epoch_day, ref_day),
                "ym_bucket": pc.add(
                    pc.multiply(pc.cast(pc.year(d), pa.int64()),
                                pa.scalar(12, pa.int64())),
                    pc.subtract(pc.cast(pc.month(d), pa.int64()),
                                pa.scalar(1, pa.int64()))),
            }
        )

    return ds.map_batches(fn, batch_format="pyarrow")


def window_frames_q(sf_dir: str):
    """Framed windows per user ordered by (ts, event_id): NTILE(4),
    FIRST_VALUE/LAST_VALUE over the partition, and a ROWS 2 PRECEDING moving
    sum+count — exact cents (SQLite-dialect window surface, Ray-partitioned)."""
    ev = read_table(sf_dir, "events", columns=["event_id", "ts", "user_id", "value"])
    return events.window_frames(ev)


def gdal_translate_chain_q(sf_dir: str):
    """gdal_translate-style conversion chain (apps/gdal_translate_lib.cpp):
    hump GeoTIFF -> manifest tile read -> gdal_calc string expression
    ('A * 2 + 1') -> serialize each tile region back through the ESRI ASCII
    layer -> reparse -> per-tile checksum.  Exercises GTiff read, string
    calc, and AAIGrid write/read on one graded path."""
    import os
    import tempfile

    from ..functions import checksum as cks_f
    from ..sources import aaigrid, gtiff
    from ..stages import rastermap

    gy, gx = np.mgrid[0:160, 0:160]
    arr = (((gx - 80) ** 2 + (gy - 80) ** 2) / 64.0).astype(np.float32)
    tif = f"{tempfile.gettempdir()}/gdal_ray_chain_{os.getpid()}.tif"
    gtiff.write_gtiff(tif, arr, tile_size=64, nodata=-9999.0)
    tiles = rastermap.calc(gtiff.read_gtiff_tiles(tif), "A * 2 + 1")

    tmp = tempfile.gettempdir()
    pid = os.getpid()

    def roundtrip(t: pa.Table) -> pa.Table:
        from ..stages.focal import _dtype_of

        xs, ys, cs = [], [], []
        for i in range(t.num_rows):
            a = np.frombuffer(t["data"][i].as_py(),
                              dtype=_dtype_of(t["dtype"][i].as_py()))
            a = a.reshape(t["height"][i].as_py(), t["width"][i].as_py())
            x, y = t["x"][i].as_py(), t["y"][i].as_py()
            p = f"{tmp}/gdal_ray_chain_{pid}_{x}_{y}.asc"
            aaigrid.write_asc(p, a.astype(np.float64))
            back, _ = aaigrid.read_asc(p)
            os.remove(p)
            xs.append(x)
            ys.append(y)
            cs.append(cks_f.tile_checksum(back))
        return pa.table({"x": pa.array(xs, pa.int64()),
                         "y": pa.array(ys, pa.int64()),
                         "checksum": pa.array(cs, pa.int64())})

    return tiles.map_batches(roundtrip, batch_format="pyarrow")


def gdalcompare_q(sf_dir: str):
    """gdalcompare raster diff: the 3x3 ramp mosaic vs the same ramp with
    'A + (A >= 200) * 5' applied — per tile: differing-pixel count, max
    |delta| x100, and the composable checksum delta."""
    from ..stages import rastermap

    base = rd.from_arrow(synthetic.make_raster_tiles("ramp", 3, 3, size=64))
    changed = rastermap.calc(
        rd.from_arrow(synthetic.make_raster_tiles("ramp", 3, 3, size=64)),
        "A + (A >= 200) * 5")
    return rastermap.compare(base, changed)


def join_dwithin_q(sf_dir: str):
    """ST_DWithin radius join: every (doc, zone-centroid) pair within 1.5
    planar degrees, with the exact distance (x1e6 fixed point)."""
    z = _zones(sf_dir)
    cx = (z["minx"].to_numpy() + z["maxx"].to_numpy()) / 2.0
    cy = (z["miny"].to_numpy() + z["maxy"].to_numpy()) / 2.0
    targets = pa.table({"zone_key": z["zone_key"], "cx": pa.array(cx), "cy": pa.array(cy)})
    return knn.dwithin_join(_docs_points(sf_dir), targets, radius=1.5)


def count_distinct_q(sf_dir: str):
    """COUNT(DISTINCT ...) aggregate (OGR SQL SWQ distinct-count): distinct
    customers per order priority via a two-level groupby — the partial-dedup
    first level bounds the shuffle to (priority, custkey) pairs."""
    from ray.data.aggregate import Count

    orders = read_table(sf_dir, "orders", columns=["o_orderpriority", "o_custkey"])
    pairs = orders.map_batches(
        lambda t: t.group_by(["o_orderpriority", "o_custkey"]).aggregate([]),
        batch_format="pyarrow")
    distinct_pairs = pairs.groupby(["o_orderpriority", "o_custkey"]).map_groups(
        lambda g: g.slice(0, 1), batch_format="pyarrow")
    return distinct_pairs.groupby("o_orderpriority").aggregate(
        Count(alias_name="n_customers"))


def buffer_dissolve_q(sf_dir: str):
    """OGR_G_Buffer (square caps) + TRUE dissolve: integer horizontal
    segments from part keys buffer by d=1 into exact integer rects
    (ogr/ogrgeometry.cpp:4949 Buffer; GEOS CAP_SQUARE semantics), then
    per-cat geometric union — the oracle counts DISTINCT covered unit
    cells, exact for the rectilinear result."""
    from ..functions import wkb as wkb_f
    from ..stages import geomops, layeralg

    pk = np.sort(pq.read_table(f"{sf_dir}/part.parquet",
                               columns=["p_partkey"])["p_partkey"].to_numpy())
    x0 = (-180 + (pk * 7321) % 330).astype(np.float64)
    y0 = (-85 + (pk * 4231) % 150).astype(np.float64)
    w = (2 + (pk * 131) % 8).astype(np.float64)
    wkbs = [wkb_f.encode_linestring(np.array([[x0[i], y0[i]],
                                              [x0[i] + w[i], y0[i]]]))
            for i in range(len(pk))]
    t = pa.table({"fid": pa.array(pk), "cat": pa.array((pk % 100).astype(np.int64)),
                  "wkb": pa.array(wkbs, pa.binary())})
    buf = rd.from_arrow(t).map_batches(
        lambda b: geomops.buffer_batch(b, 1.0, segments=1, cap_style="square"),
        batch_format="pyarrow")
    out = layeralg.dissolve_union(buf, "cat")

    def fin(tt: pa.Table) -> pa.Table:
        return pa.table(
            {"cat": tt["cat"], "n_parts": tt["n_parts"],
             "union_area": pc.cast(
                 pc.round(tt["union_area"], round_mode="half_towards_infinity"),
                 pa.int64())})

    return out.map_batches(fin, batch_format="pyarrow")


def buffer_erode_q(sf_dir: str):
    """Negative polygon buffer (morphological erosion, OGR_G_Buffer with
    d < 0) over the integer rect layer: per-row shape minus
    boundary-buffer; exact inner-rect areas (w-2)x(h-2), 0 when fully
    eroded (GEOS EMPTY)."""
    from ..stages import geomops

    pk = np.sort(pq.read_table(f"{sf_dir}/part.parquet",
                               columns=["p_partkey"])["p_partkey"].to_numpy())
    t = _int_rect_layer(pk, INT_RECT_L, "fid")
    buf = rd.from_arrow(t).map_batches(
        lambda b: geomops.buffer_batch(b, -1.0, segments=1),
        batch_format="pyarrow")
    return buf.map_batches(
        lambda tt: pa.table(
            {"fid": tt["fid"],
             "erode_area": pc.cast(
                 pc.round(tt["buf_area"], round_mode="half_towards_infinity"),
                 pa.int64())}),
        batch_format="pyarrow")


def select_sql_stddev_q(sf_dir: str):
    """STDDEV_POP / STDDEV_SAMP from a SQL string
    (swq_op_registrar.cpp SWQCF_STDDEV_POP/_SAMP): exact int64 sum +
    sum-of-squares partials; one fixed-term-order float finalize per group
    so the DuckDB mirror hashes identically."""
    from ..functions import sqlexpr

    sql = ("SELECT o_orderpriority, count(*) AS n, "
           "stddev_pop(o_shippriority_x) AS sd, "
           "stddev_samp(o_shippriority_x) AS sds "
           "FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority")
    sel = sqlexpr.parse_select(sql)
    ds = read_table(sf_dir, "orders", columns=["o_orderpriority", "o_custkey"])

    def derive(t: pa.Table) -> pa.Table:
        # deterministic small-int column (orders has no independent int
        # metric): x = o_custkey % 97
        x = t["o_custkey"].to_numpy(zero_copy_only=False) % 97
        return t.append_column(
            "o_shippriority_x",
            pa.array(x.astype(np.int64))).drop_columns(["o_custkey"])

    return sqlexpr.apply_select(
        ds.map_batches(derive, batch_format="pyarrow"), sel)


def select_sql_offset_q(sf_dir: str):
    """ORDER BY ... LIMIT n OFFSET m from one SQL string
    (ogr_gensql.cpp:2325 offset on the sorted index): rows [m, m+n) of the
    global sort, skipped with a Ray-native split (no driver collect)."""
    from ..functions import sqlexpr

    sql = ("SELECT o_orderkey, o_custkey FROM orders "
           "ORDER BY o_custkey DESC, o_orderkey ASC LIMIT 40 OFFSET 25")
    sel = sqlexpr.parse_select(sql)
    ds = read_table(sf_dir, "orders", columns=sorted(sel.columns_needed))
    return sqlexpr.apply_select(ds, sel)


def line_dedup_q(sf_dir: str):
    """Corpus-level exact line dedup (C4 / RefinedWeb line pass) with the
    delimiter set to ' ' so the synthetic corpus's words act as lines:
    every token occurring >= 200 times corpus-wide keeps only its globally
    first (doc, position) occurrence; documents reassemble in order."""
    from ..stages import dedup

    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    return dedup.line_dedup(ds, delimiter=" ", min_count=200)


def raster_compare_q(sf_dir: str):
    """gdalcompare over two mosaics (ramp vs hump — both dyadic-exact
    float32 fixtures): differing-pixel count, max and summed absolute
    difference, folded from per-tile partials."""
    from ..stages import rastermap

    a = rd.from_arrow(synthetic.make_raster_tiles("ramp", 3, 2, size=64))
    b = rd.from_arrow(synthetic.make_raster_tiles("hump", 3, 2, size=64))
    res = rastermap.compare_rasters(a, b)
    return pa.table({k: pa.array([res[k]])
                     for k in ("n_pixels", "n_diff", "max_diff", "sum_diff")})


def layer_summary_q(sf_dir: str):
    """ogrinfo -so over the integer rect layer: feature count, extent,
    geometry-kind counts, per-field min/max/null."""
    from ..stages import geomops

    pk = np.sort(pq.read_table(f"{sf_dir}/part.parquet",
                               columns=["p_partkey"])["p_partkey"].to_numpy())
    t = _int_rect_layer(pk, INT_RECT_L, "fid")
    res = geomops.layer_summary(rd.from_arrow(t), fields=("fid",))
    return pa.table({k: pa.array([v]) for k, v in sorted(res.items())})


def layer_union_q(sf_dir: str):
    """Full OGR layer Union (ogrlayer.cpp:5385): pair intersections + BOTH
    sides' per-feature residuals (feature minus the union of ALL its
    intersectors — not per-pair symdifference) over two integer rect
    layers; the oracle mirrors intersections with the rect-overlap closed
    form and residuals as uncovered-cell counts."""
    from ..stages import layeralg

    pk = np.sort(pq.read_table(f"{sf_dir}/part.parquet",
                               columns=["p_partkey"])["p_partkey"].to_numpy())
    ck = np.sort(pq.read_table(f"{sf_dir}/customer.parquet",
                               columns=["c_custkey"])["c_custkey"].to_numpy())
    pk = pk[pk % 5 == 0]
    ck = ck[ck % 3 == 0]
    left = rd.from_arrow(_int_rect_layer(pk, INT_RECT_L, "l_id"))
    right = rd.from_arrow(_int_rect_layer(ck, INT_RECT_R, "r_id"))
    out = layeralg.layer_union(left, right, res=4)

    def fin(t: pa.Table) -> pa.Table:
        return pa.table(
            {"part": t["part"], "l_id": t["l_id"], "r_id": t["r_id"],
             "area": pc.cast(pc.round(t["area"],
                                      round_mode="half_towards_infinity"),
                             pa.int64())})

    return out.map_batches(fin, batch_format="pyarrow")


def buffer_geodesic_q(sf_dir: str):
    """Geodesic POINT buffer (meters on lon/lat): circle vertices from the
    spherical destination-point formula — every vertex of every ring
    mirrored at 1e-6-degree fixed point (same term order both engines)."""
    from ..functions import wkb as wkb_f
    from ..stages import geomops

    sk = np.sort(pq.read_table(f"{sf_dir}/supplier.parquet",
                               columns=["s_suppkey"])["s_suppkey"].to_numpy())
    lon = (-180 + (sk * 7919) % 360).astype(np.float64)
    lat = (-80 + (sk * 104729) % 160).astype(np.float64)
    t = pa.table({"fid": pa.array(sk),
                  "wkb": pa.array(list(wkb_f.encode_points(lon, lat)),
                                  pa.binary())})

    def per_batch(b: pa.Table) -> pa.Table:
        buf = geomops.buffer_geodesic_batch(b, 50000.0, segments=2)
        fids, js, xs, ys = [], [], [], []
        for i in range(buf.num_rows):
            ring = wkb_f.decode(buf["wkb"][i].as_py()).parts[0][0]
            fid = buf["fid"][i].as_py()
            for j in range(len(ring) - 1):
                fids.append(fid)
                js.append(j)
                xs.append(int(np.floor(ring[j, 0] * 1e6 + 0.5)))
                ys.append(int(np.floor(ring[j, 1] * 1e6 + 0.5)))
        return pa.table({"fid": pa.array(fids, pa.int64()),
                         "j": pa.array(js, pa.int64()),
                         "x_e6": pa.array(xs, pa.int64()),
                         "y_e6": pa.array(ys, pa.int64())})

    return rd.from_arrow(t).map_batches(per_batch, batch_format="pyarrow")


def composite_median_q(sf_dir: str):
    """Per-pixel MEDIAN composite of three co-registered layers (ramp,
    hump, constant 100) — the EO time-stack reduce; per-tile value sums
    are dyadic-exact so the SQL mirror (median3 = a+b+c-max-min) hashes
    identically."""
    from ..stages import rastermap

    ramp = rd.from_arrow(synthetic.make_raster_tiles("ramp", 3, 2, size=64))
    hump = rd.from_arrow(synthetic.make_raster_tiles("hump", 3, 2, size=64))
    const = synthetic.make_raster_tiles("ramp", 3, 2, size=64)
    flat = pa.table({
        "z": const["z"], "x": const["x"], "y": const["y"],
        "width": const["width"], "height": const["height"],
        "dtype": pa.array(["float32"] * const.num_rows),
        "data": pa.array([np.full(64 * 64, 100.0, np.float32).tobytes()]
                         * const.num_rows, pa.binary())})
    comp = rastermap.composite_reduce(
        [ramp, hump, rd.from_arrow(flat)], method="median")

    def sums(t: pa.Table) -> pa.Table:
        xs, ys, sv = [], [], []
        for i in range(t.num_rows):
            arr = np.frombuffer(t["data"][i].as_py(), np.float64)
            xs.append(t["x"][i].as_py())
            ys.append(t["y"][i].as_py())
            sv.append(float(arr.sum()))
        return pa.table({"x": pa.array(xs, pa.int32()),
                         "y": pa.array(ys, pa.int32()),
                         "sum_median": pa.array(sv, pa.float64())})

    return comp.map_batches(sums, batch_format="pyarrow")


def flatgeobuf_roundtrip_q(sf_dir: str):
    """FlatGeobuf driver (ogr/ogrsf_frmts/flatgeobuf; spec at
    flatgeobuf.org): zones stream through the distributed per-part .fgb
    sink (flatbuffers built from scratch on workers) and read back in
    parallel — WKB bitwise through the columnar xy encoding."""
    import os
    import shutil
    import tempfile

    from ..sources import flatgeobuf as fgb

    zones = _zones(sf_dir)
    root = f"{tempfile.gettempdir()}/gdal_ray_fgb_{os.getpid()}"
    shutil.rmtree(root, ignore_errors=True)
    parts = [r["path"] for r in fgb.write_flatgeobuf_parts(
        rd.from_arrow(zones), root).take_all()]  # O(parts) rows

    def read_part(t: pa.Table) -> pa.Table:
        out = [fgb.read_flatgeobuf(p) for p in t["path"].to_pylist()]
        return pa.concat_tables(out)

    ds = rd.from_arrow(pa.table({"path": pa.array(parts)})).map_batches(
        read_part, batch_format="pyarrow")
    return _zones_vertex_verify(ds)


def select_sql_special_q(sf_dir: str):
    """OGR SQL special fields (ogr/ogr_swq.h SpecialFieldNames;
    ogr_gensql.cpp per-feature evaluation): OGR_GEOM_AREA and OGR_GEOMETRY
    referenced from one SQL string over the rect zone layer — areas are
    exact integers (w*h), so the mirror is closed-form."""
    from ..functions import sqlexpr

    pk = np.sort(pq.read_table(f"{sf_dir}/part.parquet",
                               columns=["p_partkey"])["p_partkey"].to_numpy())
    t = _int_rect_layer(pk, INT_RECT_L, "fid")
    sql = ("SELECT fid, OGR_GEOMETRY AS gtype, OGR_GEOM_AREA AS area "
           "FROM layer WHERE OGR_GEOM_AREA >= 20 ORDER BY fid")
    return sqlexpr.apply_select(rd.from_arrow(t), sqlexpr.parse_select(sql))


def _jpeg_mb_tiles(k_off: int):
    """2x2 tiles of 80x80 px, each 5x5 16px-macroblocks of constant
    gray-valued RGB v = (mi*37 + mj*101 + k_off) % 256 — constant 16x16
    macroblocks with r=g=b make the full 4:2:0 chain exact (Cb=Cr=128)."""
    return rd.from_arrow(pa.table({
        "x": pa.array([0, 1, 0, 1], pa.int64()),
        "y": pa.array([0, 0, 1, 1], pa.int64()),
        "k": pa.array([k_off] * 4, pa.int64()),
    }))


def _jpeg_tile_verify(t: pa.Table, codec: str) -> pa.Table:
    from ..sources import jpeg as jpeg_mod

    xs, ys, sums = [], [], []
    for i in range(t.num_rows):
        tx = t["x"][i].as_py()
        ty = t["y"][i].as_py()
        k = t["k"][i].as_py()
        mi = ty * 5 + np.arange(5)[:, None]
        mj = tx * 5 + np.arange(5)[None, :]
        v = ((mi * 37 + mj * 101 + k) % 256).astype(np.uint8)
        g = np.repeat(np.repeat(v, 16, 0), 16, 1)
        img = np.stack([g, g, g], -1)
        if codec == "progressive":
            buf = jpeg_mod.encode_progressive(img, quality=90,
                                              subsampling="420",
                                              restart_interval=3)
        else:
            buf = jpeg_mod.encode_baseline(img, quality=90,
                                           subsampling="420",
                                           restart_interval=3)
        out = jpeg_mod.decode(buf)
        if not np.array_equal(out, img):
            raise AssertionError(f"jpeg {codec} tile ({tx},{ty}) not exact")
        xs.append(tx)
        ys.append(ty)
        sums.append(int(out[:, :, 0].astype(np.int64).sum()))
    return pa.table({"x": pa.array(xs, pa.int64()),
                     "y": pa.array(ys, pa.int64()),
                     "sum_r": pa.array(sums, pa.int64())})


def jpeg_420_roundtrip_q(sf_dir: str):
    """4:2:0 chroma-subsampled baseline JPEG (the layout of virtually every
    real camera/web JPEG; sources/jpeg 16x16 MCUs, box downsample, DRI/RST
    restart markers): encode each tile, decode through the general-sampling
    decoder, assert bit-exactness and emit per-tile channel sums."""
    return _jpeg_mb_tiles(13).map_batches(
        lambda t: _jpeg_tile_verify(t, "baseline"), batch_format="pyarrow")


def jpeg_progressive_roundtrip_q(sf_dir: str):
    """Progressive (SOF2) JPEG: spectral-selection + successive-approximation
    scan script (DC first/refine, banded AC first/refine, EOB runs, restart
    intervals) over 4:2:0 MCUs — decoded pixels must match the baseline
    reconstruction bit-for-bit (ITU-T T.81 Annex G)."""
    return _jpeg_mb_tiles(17).map_batches(
        lambda t: _jpeg_tile_verify(t, "progressive"), batch_format="pyarrow")
