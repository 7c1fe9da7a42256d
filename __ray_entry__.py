"""Driver contract for the graft builder (Ray Data target).

Ray is initialised by the driver BEFORE this module is imported: nothing here
calls ``ray.init()`` / ``ray.shutdown()``.

Each ``queries()`` entry is one operator/pipeline family from SURVEY.md §2,
implemented in ``gdal_ray.pipelines.queries``; the matching ``oracle_sql()``
string recomputes the same result in DuckDB over the same parquet views.
Geometry is derived from int64 keys with exact 0.01-grid integer arithmetic so
the SQL oracles reproduce coordinates bit-for-bit (float64); aggregate outputs
use exact scaled-integer semantics (cents) so value hashes are stable under
any distributed reduction order.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

# -- shared SQL fragments (mirror gdal_ray.functions.geo / sources.synthetic) --

_DOCS_GEO = """
d AS (
  SELECT doc_id,
         -180.0 + ((doc_id * 9973) % 36000) / 100.0 AS lon,
         -85.0 + ((doc_id * 7919) % 17000) / 100.0 AS lat,
         n_chars
  FROM documents
)
"""

_ZONES = """
z AS (
  SELECT printf('zone-%06d', p_partkey) AS zone_id,
         p_partkey AS zone_key,
         -180.0 + ((p_partkey * 7321) % 33000) / 100.0 AS minx,
         -85.0 + ((p_partkey * 4231) % 15000) / 100.0 AS miny,
         2.0 + ((p_partkey * 131) % 800) / 100.0 AS w,
         2.0 + ((p_partkey * 197) % 600) / 100.0 AS h
  FROM part
),
zz AS (
  SELECT zone_id, zone_key, minx, miny, minx + w AS maxx, miny + h AS maxy FROM z
)
"""


def _hex_u64(hcol: str) -> str:
    """SQL expression: uint64 (as HUGEINT) from the FIRST 8 bytes of a 32-char
    md5 hex string column, little-endian — mirrors np.frombuffer(md5.digest()
    [:8], uint64).  strpos('123456789abcdef', c) maps hex char -> value
    (0 for '0' since strpos returns 0 on no-match)."""
    terms = []
    for i in range(1, 9):
        terms.append(
            f"CAST(strpos('123456789abcdef', substr({hcol}, {2 * i - 1}, 1)) AS HUGEINT)"
            f" * {1 << (8 * (i - 1) + 4)}"
        )
        terms.append(
            f"strpos('123456789abcdef', substr({hcol}, {2 * i}, 1))"
            f" * {1 << (8 * (i - 1))}"
        )
    return "(" + " + ".join(terms) + ")"


_U64_TO_I64 = (
    "CAST(CASE WHEN {v} >= 9223372036854775808 THEN {v} - 18446744073709551616 "
    "ELSE {v} END AS BIGINT)"
)

_M61 = (1 << 61) - 1


def _shingle_cte(shingle_k: int, source: str = "documents") -> str:
    """CTEs w/g/hx/xs: word shingles of each doc -> md5 hex -> uint64 hash.
    Mirrors textops._shingle_hashes (k-word grams; <k words -> one gram of all
    words; no words -> the empty gram)."""
    return f"""
w AS (SELECT doc_id, regexp_extract_all(text, '[^ ]+') AS ws FROM {source}),
g AS (SELECT doc_id,
        CASE WHEN len(ws) >= {shingle_k} THEN array_to_string(ws[i.i:i.i+{shingle_k - 1}], ' ')
             WHEN len(ws) > 0 THEN array_to_string(ws, ' ')
             ELSE '' END AS gram
      FROM w, LATERAL (SELECT unnest(generate_series(1, greatest(len(ws)-{shingle_k - 1}, 1))) AS i) i),
hx AS (SELECT doc_id, md5(gram) AS h FROM g),
xs AS (SELECT doc_id, {_hex_u64('h')} AS x FROM hx)
"""


def _minhash_ctes(num_perm: int, bands: int) -> str:
    """CTEs params/mh/bk/bh: minhash signatures + band hashes, with the
    engine's seeded universal-hash and band-fold constants inlined as
    literals (same spec, independent SQL recomputation from the text)."""
    from gdal_ray.stages import textops

    a, b = textops._minhash_params(num_perm)
    r = num_perm // bands
    params = ", ".join(f"({p}, {int(a[p])}, {int(b[p])})" for p in range(num_perm))
    bk = ", ".join(
        f"({i}, {int(textops._BAND_K[i])}, {int(textops._BAND_L[i])})" for i in range(r)
    )
    return f"""
params(p, a, b) AS (VALUES {params}),
mh AS (SELECT doc_id, p, min((a * (x % 4294967296) + b) % {_M61}) AS sig
       FROM xs, params GROUP BY doc_id, p),
bk(i, kk, ll) AS (VALUES {bk}),
bh AS (SELECT doc_id, p // {r} AS band_id,
              CAST(sum((kk * CAST(sig % 4294967296 AS HUGEINT)) % {_M61}
                     + (ll * CAST(sig // 4294967296 AS HUGEINT)) % {_M61}) % {_M61} AS BIGINT)
                AS band_hash
       FROM mh JOIN bk ON bk.i = mh.p % {r}
       GROUP BY doc_id, band_id),
cand AS (SELECT DISTINCT a1.doc_id AS id_a, b1.doc_id AS id_b
         FROM bh a1 JOIN bh b1 ON a1.band_id = b1.band_id
                               AND a1.band_hash = b1.band_hash
                               AND a1.doc_id < b1.doc_id)
"""


_LANG_STOPWORDS_SQL = {
    "en": ("the", "and", "of", "a", "to", "in", "is", "it", "that"),
    "de": ("der", "die", "das", "und", "ist", "nicht", "ein", "zu"),
    "fr": ("le", "la", "les", "et", "est", "un", "une", "de"),
    "es": ("el", "la", "los", "y", "es", "un", "una", "que"),
}


def _langid_sql() -> str:
    """Stopword-vote language id: per-lang token-hit counts + first-max CASE
    chain (earlier language wins ties, all-zero -> 'und') — mirrors
    textops.LangId exactly."""
    hits = []
    for lang, words in _LANG_STOPWORDS_SQL.items():
        inlist = ", ".join(f"'{w}'" for w in words)
        hits.append(
            f"len(list_filter(regexp_extract_all(lower(text), '[a-z'']+'),"
            f" x -> x IN ({inlist}))) AS {lang}"
        )
    return f"""
        WITH h AS (SELECT doc_id, {", ".join(hits)} FROM documents)
        SELECT doc_id,
               CASE WHEN en > 0 AND en >= de AND en >= fr AND en >= es THEN 'en'
                    WHEN de > 0 AND de >= fr AND de >= es THEN 'de'
                    WHEN fr > 0 AND fr >= es THEN 'fr'
                    WHEN es > 0 THEN 'es'
                    ELSE 'und' END AS lang_pred
        FROM h
    """


def _tile_expr(z: int) -> str:
    n = float(1 << z)
    hi = (1 << z) - 1
    tx = f"LEAST(GREATEST(CAST(floor((lon + 180.0) / 360.0 * {n}) AS BIGINT), 0), {hi})"
    ty = (
        f"LEAST(GREATEST(CAST(floor((1.0 - ln(tan(radians(lat)) + 1.0/cos(radians(lat))) "
        f"/ pi()) / 2.0 * {n}) AS BIGINT), 0), {hi})"
    )
    return tx, ty


def entry() -> Any:
    """Flagship pipeline at sf0.001: documents -> derive geometry ->
    tile-assign z8 -> spatial join vs zones -> zonal aggregate."""
    from gdal_ray.pipelines import queries as q

    return q.zonal_stats_q("/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[str], Any]]:
    from gdal_ray.pipelines import queries as q

    return {
        # tiling / rasterize (SURVEY §2.9 / §2.8)
        "tile_assign_z8": q.tile_assign_z8,
        "tile_assign_multi": q.tile_assign_multi,
        "rasterize_point_count_z6": q.rasterize_point_count_z6,
        # spatial joins (SURVEY §2.4)
        "join_intersects": q.join_intersects,
        "join_within": q.join_within,
        "join_partitioned_intersects": q.join_partitioned_intersects,
        "join_knn": q.join_knn,
        "knn_tree": q.knn_tree_q,
        "zonal_stats": q.zonal_stats_q,
        # relational conformance (SURVEY §2.2/2.5/2.6/2.7/2.11)
        "q1_pricing": q.q1_pricing,
        "join_orders_customer": q.join_orders_customer,
        "filter_like_between": q.filter_like_between,
        "topk_orders": q.topk_orders,
        "distinct_segments": q.distinct_segments,
        # stream-shaped (SURVEY §2.12 analogues)
        "events_tumbling_1h": q.events_tumbling_1h,
        "asof_join_events": q.asof_join_events,
        "sliding_window_2h": q.sliding_window_q,
        "session_windows": q.session_windows_q,
        # scalar functions / sampling / raster lookup / grid metric
        "scalar_funcs": q.scalar_funcs_q,
        "sample_docs": q.sample_docs_q,
        "point_raster_lookup": q.point_raster_lookup_q,
        "grid_count": q.grid_count_q,
        # text / dedup / similarity (training-data ops)
        "dedup_exact": q.dedup_exact_q,
        "token_count": q.token_count_q,
        "text_quality": q.text_quality_q,
        "embedding_topk": q.embedding_topk_q,
        "embedding_neardup": q.embedding_neardup_q,
        # layer algebra: polygon x polygon (SURVEY §2.4), clip/dissolve
        "polygon_join": q.polygon_join_q,
        "clip_areas": q.clip_areas_q,
        "dissolve_zones": q.dissolve_zones_q,
        "contour_ramp": q.contour_ramp_q,
        # aggregates: histogram + exact stats partials (SURVEY §2.5)
        "histogram_nchars": q.histogram_nchars_q,
        "agg_stats_quantity": q.agg_stats_quantity_q,
        # geometry scalar ops (SURVEY §2.2) + spatial sort (§2.6)
        "geom_area_centroid": q.geom_area_centroid_q,
        "spatial_sort_topk": q.spatial_sort_topk_q,
        # raster<->vector + warp/pyramid (SURVEY §2.8/2.9; rows-only goldens)
        "rasterize_polygons": q.rasterize_polygons_q,
        "polygonize_blobs": q.polygonize_blobs_q,
        "polygonize_rings": q.polygonize_rings_q,
        "tile_pyramid": q.tile_pyramid_q,
        "hillshade": q.hillshade_q,
        "footprint": q.footprint_q,
        "nearblack": q.nearblack_q,
        "proximity": q.proximity_q,
        "fill_nodata": q.fill_nodata_q,
        "viewshed": q.viewshed_q,
        "palette_median_cut": q.palette_q,
        "media_features": q.media_features_q,
        # text sketches / near-dup (oracle-checked via SQL recomputation)
        "langid": q.langid_q,
        "fingerprint": q.fingerprint_q,
        "minhash_lsh_pairs": q.minhash_lsh_q,
        "simhash_signatures": q.simhash_q,
        "ngram_jaccard_pairs": q.ngram_jaccard_q,
    }


def oracle_sql() -> dict[str, str]:
    tx8, ty8 = _tile_expr(8)
    tx4, ty4 = _tile_expr(4)
    tx12, ty12 = _tile_expr(12)
    tx6, ty6 = _tile_expr(6)
    join_intersects_sql = f"""
        WITH {_DOCS_GEO}, {_ZONES}
        SELECT d.doc_id, zz.zone_id
        FROM d, zz
        WHERE d.lon >= zz.minx AND d.lon <= zz.maxx
          AND d.lat >= zz.miny AND d.lat <= zz.maxy
    """
    knn_sql = f"""
        WITH {_DOCS_GEO}, {_ZONES},
        c AS (SELECT zone_id, zone_key, (minx + maxx) / 2.0 AS cx,
                     (miny + maxy) / 2.0 AS cy FROM zz),
        s AS (
          SELECT d.doc_id, c.zone_id,
                 row_number() OVER (
                   PARTITION BY d.doc_id
                   ORDER BY (d.lon - c.cx) * (d.lon - c.cx)
                          + (d.lat - c.cy) * (d.lat - c.cy), c.zone_key
                 ) AS "rank"
          FROM d, c)
        SELECT doc_id, zone_id, "rank" FROM s WHERE "rank" <= 3
    """
    return {
        "tile_assign_z8": f"""
            WITH {_DOCS_GEO}
            SELECT doc_id, lon, lat, {tx8} AS tx_8, {ty8} AS ty_8,
                   {tx8} * 256 + {ty8} AS cell_8
            FROM d
        """,
        "tile_assign_multi": f"""
            WITH {_DOCS_GEO}
            SELECT doc_id, {tx4} AS tx_4, {ty4} AS ty_4,
                   {tx12} AS tx_12, {ty12} AS ty_12
            FROM d
        """,
        "rasterize_point_count_z6": f"""
            WITH {_DOCS_GEO}
            SELECT {tx6} AS tx_6, {ty6} AS ty_6,
                   CAST(count(*) AS BIGINT) AS n_points
            FROM d GROUP BY 1, 2
        """,
        "join_intersects": join_intersects_sql,
        "join_partitioned_intersects": join_intersects_sql,
        "join_within": f"""
            WITH {_DOCS_GEO}, {_ZONES}
            SELECT d.doc_id, zz.zone_id
            FROM d, zz
            WHERE d.lon > zz.minx AND d.lon < zz.maxx
              AND d.lat > zz.miny AND d.lat < zz.maxy
        """,
        "join_knn": knn_sql,
        "knn_tree": knn_sql,
        "zonal_stats": f"""
            WITH {_DOCS_GEO}, {_ZONES}
            SELECT zz.zone_id,
                   CAST(count(*) AS BIGINT) AS n_docs,
                   CAST(sum(d.n_chars) AS BIGINT) AS n_chars_sum,
                   CAST(min(d.n_chars) AS BIGINT) AS n_chars_min,
                   CAST(max(d.n_chars) AS BIGINT) AS n_chars_max
            FROM d, zz
            WHERE d.lon >= zz.minx AND d.lon <= zz.maxx
              AND d.lat >= zz.miny AND d.lat <= zz.maxy
            GROUP BY zz.zone_id
        """,
        "q1_pricing": """
            SELECT l_returnflag, l_linestatus,
                   CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty_sum,
                   CAST(sum(CAST(round(l_extendedprice * 100.0) AS BIGINT)) AS BIGINT)
                     AS base_cents_sum,
                   CAST(sum(CAST(round(l_extendedprice * (1.0 - l_discount) * 100.0)
                     AS BIGINT)) AS BIGINT) AS disc_cents_sum,
                   CAST(count(*) AS BIGINT) AS count_order
            FROM lineitem
            WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
            GROUP BY l_returnflag, l_linestatus
        """,
        "join_orders_customer": """
            SELECT c.c_mktsegment,
                   CAST(sum(CAST(round(o.o_totalprice * 100.0) AS BIGINT)) AS BIGINT)
                     AS total_cents_sum,
                   CAST(count(*) AS BIGINT) AS n_orders
            FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
            GROUP BY c.c_mktsegment
        """,
        "filter_like_between": """
            SELECT p_partkey, p_name, p_size
            FROM part
            WHERE p_type LIKE '%AND%' AND p_size >= 10 AND p_size <= 30
        """,
        "topk_orders": """
            SELECT o_orderkey, CAST(round(o_totalprice * 100.0) AS BIGINT) AS total_cents
            FROM orders
            ORDER BY total_cents DESC, o_orderkey
            LIMIT 10
        """,
        "distinct_segments": "SELECT DISTINCT c_mktsegment FROM customer",
        "events_tumbling_1h": """
            SELECT event_type,
                   epoch_us(ts) // 1000000 // 3600 AS window_id,
                   CAST(sum(CAST(round(value * 100.0) AS BIGINT)) AS BIGINT)
                     AS value_cents_sum,
                   CAST(count(*) AS BIGINT) AS n_events
            FROM events
            GROUP BY 1, 2
        """,
        "asof_join_events": """
            WITH m AS (
              SELECT e.event_id, e.event_type, o.o_orderkey,
                     row_number() OVER (
                       PARTITION BY e.event_id
                       ORDER BY o.o_orderdate DESC, o.o_orderkey DESC) AS rn
              FROM events e
              JOIN orders o ON e.user_id = o.o_custkey AND o.o_orderdate <= e.ts)
            SELECT event_type,
                   CAST(sum(o_orderkey) AS BIGINT) AS o_orderkey_sum,
                   CAST(count(*) AS BIGINT) AS n_matched
            FROM m WHERE rn = 1
            GROUP BY event_type
        """,
        "sliding_window_2h": """
            WITH w AS (
              SELECT event_type,
                     UNNEST(generate_series(epoch_us(ts) // 1000000 // 3600 - 1,
                                            epoch_us(ts) // 1000000 // 3600)) AS window_id
              FROM events)
            SELECT event_type, window_id, CAST(count(*) AS BIGINT) AS n_events
            FROM w GROUP BY 1, 2
        """,
        "session_windows": """
            WITH s AS (
              SELECT user_id, event_id,
                     epoch_us(ts) // 1000000 AS sec,
                     CASE WHEN epoch_us(ts) // 1000000
                            - lag(epoch_us(ts) // 1000000) OVER
                              (PARTITION BY user_id ORDER BY ts, event_id) > 7200
                          THEN 1 ELSE 0 END AS brk
              FROM events),
            t AS (
              SELECT user_id,
                     sum(brk) OVER (PARTITION BY user_id ORDER BY sec, event_id
                                    ROWS UNBOUNDED PRECEDING) AS sid
              FROM s),
            g AS (SELECT user_id, sid, count(*) AS n FROM t GROUP BY 1, 2)
            SELECT user_id,
                   CAST(count(*) AS BIGINT) AS n_sessions,
                   CAST(max(n) AS BIGINT) AS max_session_events
            FROM g GROUP BY 1
        """,
        "scalar_funcs": """
            SELECT doc_id,
                   upper(substr(text, 1, 8)) AS head,
                   lang || '-' || source AS tag,
                   CASE WHEN n_chars < 100 THEN 'short'
                        WHEN n_chars <= 300 THEN 'mid'
                        ELSE 'long' END AS size_class,
                   CAST(n_chars AS DOUBLE) / 2.0 AS half_chars
            FROM documents
        """,
        "sample_docs": """
            SELECT doc_id, n_chars FROM documents
            WHERE (doc_id * 2654435761) % 100 < 10
        """,
        "point_raster_lookup": f"""
            WITH {_DOCS_GEO}
            SELECT doc_id,
                   LEAST(GREATEST(CAST(floor((lon + 180.0) / 360.0 * 360.0) AS BIGINT), 0), 359)
                 + LEAST(GREATEST(CAST(floor((85.0 - lat) / 170.0 * 170.0) AS BIGINT), 0), 169)
                   AS raster_value
            FROM d
        """,
        "grid_count": f"""
            WITH {_DOCS_GEO},
            cells AS (
              SELECT a.range AS cx, b.range AS cy
              FROM range(64) a, range(32) b)
            SELECT c.cx, c.cy,
                   CAST(count(d.doc_id) AS BIGINT) AS n
            FROM cells c LEFT JOIN d
              ON ((-180.0 + (c.cx + 0.5) * 5.625) - d.lon)
                 * ((-180.0 + (c.cx + 0.5) * 5.625) - d.lon)
               + ((-85.0 + (c.cy + 0.5) * 5.3125) - d.lat)
                 * ((-85.0 + (c.cy + 0.5) * 5.3125) - d.lat) <= 36.0
            GROUP BY 1, 2
        """,
        "dedup_exact": """
            SELECT md5(text) AS text_md5,
                   CAST(min(doc_id) AS BIGINT) AS keep_id,
                   CAST(count(*) AS BIGINT) AS n_dups
            FROM documents GROUP BY 1
        """,
        "token_count": """
            SELECT doc_id,
                   CAST(length(regexp_extract_all(text, '[^ ]+')) AS BIGINT) AS n_tokens
            FROM documents
        """,
        "text_quality": """
            SELECT doc_id,
                   CAST(length(text) AS BIGINT) AS n_chars_calc,
                   CAST(length(regexp_extract_all(text, '[^ ]+')) AS BIGINT) AS n_tokens,
                   CAST(length(regexp_extract_all(text, '[.,!?;:]')) AS BIGINT) AS n_punct
            FROM documents
        """,
        "embedding_topk": """
            WITH q AS (SELECT embedding FROM embeddings WHERE vec_id = 0),
            s AS (
              SELECT e.vec_id,
                     row_number() OVER (
                       ORDER BY list_cosine_similarity(
                         CAST(e.embedding AS DOUBLE[]), CAST(q.embedding AS DOUBLE[])) DESC,
                       e.vec_id) AS "rank"
              FROM embeddings e, q)
            SELECT vec_id, "rank" FROM s WHERE "rank" <= 10
        """,
        "polygon_join": f"""
            WITH {_ZONES},
            c AS (
              SELECT c_custkey AS r_id,
                     -180.0 + ((c_custkey * 5179) % 33000) / 100.0 AS minx,
                     -85.0 + ((c_custkey * 3607) % 15000) / 100.0 AS miny
              FROM customer
            ),
            cc AS (
              SELECT r_id, minx, miny,
                     minx + (2.0 + ((r_id * 149) % 900) / 100.0) AS maxx,
                     miny + (2.0 + ((r_id * 211) % 700) / 100.0) AS maxy
              FROM c
            )
            SELECT zz.zone_key AS l_id, cc.r_id
            FROM zz, cc
            WHERE zz.minx <= cc.maxx AND zz.maxx >= cc.minx
              AND zz.miny <= cc.maxy AND zz.maxy >= cc.miny
        """,
        "clip_areas": f"""
            WITH {_ZONES}
            SELECT zone_key AS fid,
                   CAST(round(
                     (LEAST(maxx, 60.0) - GREATEST(minx, -60.0)) *
                     (LEAST(maxy, 40.0) - GREATEST(miny, -40.0)) * 10000.0
                   ) AS BIGINT) AS clip_area_x10000
            FROM zz
            WHERE LEAST(maxx, 60.0) > GREATEST(minx, -60.0)
              AND LEAST(maxy, 40.0) > GREATEST(miny, -40.0)
        """,
        "dissolve_zones": f"""
            WITH {_ZONES}
            SELECT zone_key % 10 AS cat,
                   CAST(count(*) AS BIGINT) AS n_parts,
                   CAST(sum(CAST(round((maxx - minx) * (maxy - miny) * 10000.0)
                     AS BIGINT)) AS BIGINT) AS total_area_x10000,
                   min(minx) AS minx, min(miny) AS miny,
                   max(maxx) AS maxx, max(maxy) AS maxy
            FROM zz
            GROUP BY 1
        """,
        "histogram_nchars": """
            SELECT n_chars // 100 AS bucket, CAST(count(*) AS BIGINT) AS n
            FROM documents GROUP BY 1
        """,
        "agg_stats_quantity": """
            SELECT CAST(count(*) AS BIGINT) AS n,
                   CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS q_sum,
                   CAST(sum(CAST(l_quantity AS BIGINT) * CAST(l_quantity AS BIGINT))
                     AS BIGINT) AS qq_sum,
                   CAST(min(CAST(l_quantity AS BIGINT)) AS BIGINT) AS q_min,
                   CAST(max(CAST(l_quantity AS BIGINT)) AS BIGINT) AS q_max
            FROM lineitem
        """,
        "geom_area_centroid": f"""
            WITH {_ZONES}
            SELECT zone_id,
                   CAST(round((maxx - minx) * (maxy - miny) * 10000.0) AS BIGINT)
                     AS area_x10000,
                   CAST(round((minx + maxx) / 2.0 * 200.0) AS BIGINT) AS cx_x200,
                   CAST(round((miny + maxy) / 2.0 * 200.0) AS BIGINT) AS cy_x200
            FROM zz
        """,
        "spatial_sort_topk": f"""
            WITH {_DOCS_GEO}
            SELECT doc_id, {_tile_expr(12)[0]} * 4096 + {_tile_expr(12)[1]} AS cell_12
            FROM d
            ORDER BY cell_12, doc_id
            LIMIT 100
        """,
        "embedding_neardup": """
            SELECT a.vec_id AS id_a, b.vec_id AS id_b
            FROM embeddings a, embeddings b
            WHERE a.vec_id < b.vec_id
              AND list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                         CAST(b.embedding AS DOUBLE[])) >= 0.45
        """,
        "fingerprint": f"""
            WITH h AS (SELECT doc_id, md5(text) AS h FROM documents),
            f AS (SELECT doc_id, {_hex_u64('h')} AS v FROM h)
            SELECT doc_id, {_U64_TO_I64.format(v='v')} AS fingerprint FROM f
        """,
        "langid": _langid_sql(),
        "simhash_signatures": f"""
            WITH {_shingle_cte(3)},
            pw(j, pj) AS (VALUES {", ".join(f"({j}, {1 << j}::HUGEINT)" for j in range(64))}),
            bits AS (SELECT doc_id, j,
                            sum(CASE WHEN (x // pj) % 2 = 1 THEN 1 ELSE -1 END) AS votes
                     FROM xs, pw GROUP BY doc_id, j),
            val AS (SELECT b.doc_id,
                           sum(CASE WHEN b.votes > 0 THEN p.pj ELSE 0::HUGEINT END) AS v
                    FROM bits b JOIN pw p ON p.j = b.j GROUP BY b.doc_id)
            SELECT doc_id, {_U64_TO_I64.format(v='v')} AS simhash FROM val
        """,
        "minhash_lsh_pairs": f"""
            WITH {_shingle_cte(5)}, {_minhash_ctes(64, 16)},
            est AS (SELECT c.id_a, c.id_b,
                           (sum(CASE WHEN ma.sig = mb.sig THEN 1 ELSE 0 END) * 1000) // 64
                             AS est_jaccard_x1000
                    FROM cand c
                    JOIN mh ma ON ma.doc_id = c.id_a
                    JOIN mh mb ON mb.doc_id = c.id_b AND mb.p = ma.p
                    GROUP BY c.id_a, c.id_b)
            SELECT id_a, id_b, CAST(est_jaccard_x1000 AS BIGINT) AS est_jaccard_x1000
            FROM est WHERE est_jaccard_x1000 >= 500
        """,
        "ngram_jaccard_pairs": f"""
            WITH {_shingle_cte(3)}, {_minhash_ctes(32, 8)},
            sh AS (SELECT DISTINCT doc_id, x FROM xs),
            cnt AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
            inter AS (SELECT c.id_a, c.id_b, count(*) AS ni
                      FROM cand c
                      JOIN sh sa ON sa.doc_id = c.id_a
                      JOIN sh sb ON sb.doc_id = c.id_b AND sb.x = sa.x
                      GROUP BY c.id_a, c.id_b),
            jac AS (SELECT c.id_a, c.id_b,
                           (2000 * COALESCE(i.ni, 0)
                            + (ca.n + cb.n - COALESCE(i.ni, 0)))
                           // (2 * (ca.n + cb.n - COALESCE(i.ni, 0))) AS jaccard_x1000
                    FROM cand c
                    LEFT JOIN inter i ON i.id_a = c.id_a AND i.id_b = c.id_b
                    JOIN cnt ca ON ca.doc_id = c.id_a
                    JOIN cnt cb ON cb.doc_id = c.id_b)
            SELECT id_a, id_b, CAST(jaccard_x1000 AS BIGINT) AS jaccard_x1000
            FROM jac WHERE jaccard_x1000 >= 300
        """,
    }
