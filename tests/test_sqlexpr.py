"""OGR-SQL string front end (functions/sqlexpr.py): parser, compiler,
scan-filter pushdown, Select application, and step-registry integration."""
import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pytest

from gdal_ray.functions import sqlexpr


def _mask(sql, table):
    node = sqlexpr.parse_where(sql)
    return sqlexpr.compile_node(node, lambda n: table[n]).to_pylist()


T = pa.table({
    "a": pa.array([1, 2, 3, 4, 5, None], pa.int64()),
    "s": pa.array(["Apple", "banana", "Cherry", "date", None, "fig"]),
    "x": pa.array([1.5, -2.0, 0.0, 3.25, 10.0, 2.0]),
})


def test_comparisons_and_precedence():
    assert _mask("a > 2 AND a < 5", T) == [False, False, True, True, False, None]
    # OR binds looser than AND
    assert _mask("a = 1 OR a > 2 AND a < 5", T) == [True, False, True, True, False, None]
    assert _mask("(a = 1 OR a > 2) AND a < 5", T) == [True, False, True, True, False, None]
    assert _mask("NOT a = 2", T) == [True, False, True, True, True, None]


def test_between_in_like_null():
    assert _mask("a BETWEEN 2 AND 4", T) == [False, True, True, True, False, None]
    assert _mask("a NOT BETWEEN 2 AND 4", T) == [True, False, False, False, True, None]
    # SQL three-valued IN: NULL IN (...) is NULL
    assert _mask("a IN (1, 4)", T) == [True, False, False, True, False, None]
    assert _mask("s LIKE '%an%'", T) == [False, True, False, False, None, False]
    assert _mask("s ILIKE 'a%'", T) == [True, False, False, False, None, False]
    assert _mask("s IS NULL", T) == [False, False, False, False, True, False]
    assert _mask("s IS NOT NULL", T) == [True, True, True, True, False, True]
    # string literal escaping
    assert _mask("s = 'It''s'", T) == [False, False, False, False, None, False]


def test_arithmetic_and_functions():
    node = sqlexpr.parse_where("a * 2 + 1")
    got = sqlexpr.compile_node(node, lambda n: T[n]).to_pylist()
    assert got == [3, 5, 7, 9, 11, None]
    # truncating integer division + derived modulo
    node = sqlexpr.parse_where("a - a / 2 * 2")
    got = sqlexpr.compile_node(node, lambda n: T[n]).to_pylist()
    assert got == [1, 0, 1, 0, 1, None]
    node = sqlexpr.parse_where("a % 2")
    assert sqlexpr.compile_node(node, lambda n: T[n]).to_pylist() == got
    node = sqlexpr.parse_where("upper(substr(s, 1, 3))")
    got = sqlexpr.compile_node(node, lambda n: T[n]).to_pylist()
    assert got == ["APP", "BAN", "CHE", "DAT", None, "FIG"]
    node = sqlexpr.parse_where("CAST(x AS BIGINT)")
    got = sqlexpr.compile_node(node, lambda n: T[n]).to_pylist()
    assert got[1] == -2 and got[4] == 10


def test_columns_used_and_errors():
    node = sqlexpr.parse_where("a > 1 AND upper(s) = 'Q' OR x IS NULL")
    assert sqlexpr.columns_used(node) == {"a", "s", "x"}
    with pytest.raises(ValueError):
        sqlexpr.parse_where("a >")
    with pytest.raises(ValueError):
        sqlexpr.parse_where("a = 1 extra junk ^^")
    with pytest.raises(ValueError):
        sqlexpr.compile_node(sqlexpr.parse_where("nosuchfn(a)"), lambda n: T[n])


def test_scan_filter_pushdown_matches_residual():
    import pyarrow.dataset as pads

    expr = sqlexpr.scan_filter("a BETWEEN 2 AND 4 AND s LIKE '%a%'")
    assert expr is not None
    got = T.filter(expr)
    # same rows as the residual path
    res = T.filter(pa.array([bool(v) if v is not None else False
                             for v in _mask("a BETWEEN 2 AND 4 AND s LIKE '%a%'", T)]))
    assert got.equals(res)


def test_parse_select_full():
    sel = sqlexpr.parse_select(
        "SELECT a, a * 2 AS dbl, upper(s) AS su FROM t "
        "WHERE a >= 2 ORDER BY a DESC LIMIT 3")
    assert [alias for _, alias in sel.projections] == ["a", "dbl", "su"]
    assert sel.table == "t"
    assert sel.order_by == [("a", True)]
    assert sel.limit == 3
    assert sel.columns_needed == {"a", "s"}


def test_apply_select_over_dataset(ray_session):
    import ray.data as rd

    ds = rd.from_arrow(T)
    sel = sqlexpr.parse_select(
        "SELECT a, a * 10 AS a10 FROM t WHERE a IS NOT NULL AND a <> 3 "
        "ORDER BY a DESC LIMIT 2")
    rows = sqlexpr.apply_select(ds, sel).take_all()
    assert rows == [{"a": 5, "a10": 50}, {"a": 4, "a10": 40}]
    # ORDER BY a column not in the projection: carried then dropped
    sel2 = sqlexpr.parse_select(
        "SELECT s FROM t WHERE a IS NOT NULL ORDER BY a DESC LIMIT 2")
    rows2 = sqlexpr.apply_select(ds, sel2).take_all()
    assert rows2 == [{"s": None}, {"s": "date"}]


def test_sql_steps_in_pipeline(ray_session):
    import ray.data as rd

    from gdal_ray.pipelines import steps

    ds = rd.from_arrow(T)
    out = steps.run_pipeline(
        ds, "sql_filter where='a BETWEEN 2 AND 4' ! select cols=a ! limit n=10"
    ).take_all()
    assert sorted(r["a"] for r in out) == [2, 3, 4]
    out2 = steps.run_pipeline(
        ds, 'sql_select sql="SELECT a, a + 1 AS b FROM t WHERE a IN (1, 5)"'
    ).take_all()
    assert sorted((r["a"], r["b"]) for r in out2) == [(1, 2), (5, 6)]


def test_group_by_aggregates(ray_session):
    import ray.data as rd

    t2 = pa.table({
        "k": pa.array(["a", "a", "b", "b", "b", "c"]),
        "v": pa.array([1, 2, 3, 4, 5, 6], pa.int64()),
    })
    ds = rd.from_arrow(t2)
    sel = sqlexpr.parse_select(
        "SELECT k, count(*) AS n, sum(v) AS sv, min(v) AS lo, max(v) AS hi "
        "FROM t WHERE v <> 6 GROUP BY k ORDER BY k")
    rows = sqlexpr.apply_select(ds, sel).take_all()
    assert rows == [
        {"k": "a", "n": 2, "sv": 3, "lo": 1, "hi": 2},
        {"k": "b", "n": 3, "sv": 12, "lo": 3, "hi": 5},
    ]
    # HAVING over output aliases
    sel2 = sqlexpr.parse_select(
        "SELECT k, sum(v) AS sv FROM t GROUP BY k HAVING sv >= 12 ORDER BY k")
    assert sqlexpr.apply_select(ds, sel2).take_all() == [{"k": "b", "sv": 12}]
    # errors: naked non-key column; count(expr); non-column agg arg
    with pytest.raises(ValueError, match="GROUP BY"):
        sqlexpr.apply_select(ds, sqlexpr.parse_select(
            "SELECT v, count(*) AS n FROM t GROUP BY k"))
    with pytest.raises(ValueError, match="count"):
        sqlexpr.apply_select(ds, sqlexpr.parse_select(
            "SELECT k, count(v + 1) AS n FROM t GROUP BY k"))
    with pytest.raises(ValueError, match="plain column"):
        sqlexpr.apply_select(ds, sqlexpr.parse_select(
            "SELECT k, sum(v * 2) AS s FROM t GROUP BY k"))


def test_sql_string_join(ray_session):
    """Round-4: JOIN routed from the SQL string to hash_join_broadcast."""
    import duckdb
    import ray.data as rd

    orders = pa.table({"o_orderkey": pa.array([1, 2, 3, 4], pa.int64()),
                       "o_custkey": pa.array([10, 20, 10, 30], pa.int64()),
                       "o_totalprice": pa.array([5.0, 50.0, 500.0, 5000.0])})
    cust = pa.table({"c_custkey": pa.array([10, 20], pa.int64()),
                     "c_name": ["alice", "bob"]})
    con = duckdb.connect()
    con.register("orders", orders)
    con.register("customer", cust)

    def run(sql):
        got = sqlexpr.apply_select(rd.from_arrow(orders),
                                   sqlexpr.parse_select(sql),
                                   tables={"customer": cust}).take_all()
        exp = [dict(zip([d[0] for d in con.sql(sql).description], r))
               for r in con.sql(sql).fetchall()]
        return got, exp

    got, exp = run("SELECT o_orderkey, c_name FROM orders JOIN customer "
                   "ON o_custkey = c_custkey WHERE o_totalprice > 10 "
                   "ORDER BY o_orderkey DESC LIMIT 2")
    assert got == exp
    got, exp = run("SELECT o_orderkey, c_name FROM orders LEFT JOIN customer "
                   "ON o_custkey = c_custkey ORDER BY o_orderkey")
    assert got == exp
    got, exp = run("SELECT c_name, count(*) AS n, sum(o_totalprice) AS total "
                   "FROM orders JOIN customer ON orders.o_custkey = "
                   "customer.c_custkey GROUP BY c_name ORDER BY c_name")
    assert got == exp
    # right side may also be a (small) Ray Dataset
    got2 = sqlexpr.apply_select(
        rd.from_arrow(orders),
        sqlexpr.parse_select("SELECT o_orderkey, c_name FROM orders JOIN "
                             "customer ON o_custkey = c_custkey "
                             "ORDER BY o_orderkey"),
        tables={"customer": rd.from_arrow(cust)}).take_all()
    assert [r["c_name"] for r in got2] == ["alice", "bob", "alice"]
    # missing table -> clear error
    with pytest.raises(ValueError, match="JOIN references table"):
        sqlexpr.apply_select(rd.from_arrow(orders), sqlexpr.parse_select(
            "SELECT o_orderkey FROM orders JOIN customer ON "
            "o_custkey = c_custkey"))


def test_sql_count_distinct_and_global_agg(ray_session):
    """Round-4 continuation: COUNT(DISTINCT x) (swq_parser.y:1009-1034) and
    whole-table aggregates without GROUP BY (SWQM_SUMMARY_RECORD)."""
    import duckdb
    import ray.data as rd

    t = pa.table({"k": ["a", "a", "b", "b", "b", "a"],
                  "v": pa.array([1, 2, 2, 3, None, 1], pa.int64()),
                  "w": pa.array([10, 20, 30, 40, 50, 60], pa.int64())})
    con = duckdb.connect()
    con.register("t", t)

    def run(sql):
        got = sqlexpr.apply_select(rd.from_arrow(t),
                                   sqlexpr.parse_select(sql)).take_all()
        exp = [dict(zip([d[0] for d in con.sql(sql).description], r))
               for r in con.sql(sql).fetchall()]
        return got, exp

    # grouped count distinct; NULLs are skipped per SQL
    got, exp = run("SELECT k, count(DISTINCT v) AS nv FROM t "
                   "GROUP BY k ORDER BY k")
    assert got == exp
    # global aggregates, no GROUP BY
    got, exp = run("SELECT count(*) AS n, sum(w) AS sw, min(w) AS mn, "
                   "max(w) AS mx FROM t WHERE w > 10")
    assert got == exp
    # global count distinct
    got, exp = run("SELECT count(DISTINCT v) AS nv FROM t")
    assert got == exp
    # count distinct cannot mix with other aggregates in one statement
    with pytest.raises(ValueError, match="cannot be combined"):
        sqlexpr.apply_select(rd.from_arrow(t), sqlexpr.parse_select(
            "SELECT k, count(DISTINCT v) AS nv, sum(w) AS sw FROM t "
            "GROUP BY k"))


def test_sql_union_all(ray_session):
    """Round-4 continuation: UNION ALL (swq_parser.y:822,840) — branches
    evaluate independently and concatenate via Dataset.union."""
    import ray.data as rd

    a = pa.table({"x": pa.array([1, 2, 3], pa.int64())})
    b = pa.table({"y": pa.array([10, 20], pa.int64())})
    sel = sqlexpr.parse_select(
        "SELECT x AS v FROM a WHERE x >= 2 "
        "UNION ALL SELECT y + 1 AS v FROM b")
    out = sqlexpr.apply_select(rd.from_arrow(a), sel,
                               datasets={"b": rd.from_arrow(b)}).take_all()
    assert sorted(r["v"] for r in out) == [2, 3, 11, 21]
    # same-table union needs no datasets map
    sel2 = sqlexpr.parse_select(
        "SELECT x AS v FROM a WHERE x = 1 UNION ALL SELECT x AS v FROM a")
    out2 = sqlexpr.apply_select(rd.from_arrow(a), sel2).take_all()
    assert sorted(r["v"] for r in out2) == [1, 1, 2, 3]
    # missing branch table -> clear error
    with pytest.raises(ValueError, match="UNION ALL branch"):
        sqlexpr.apply_select(rd.from_arrow(a), sqlexpr.parse_select(
            "SELECT x FROM a UNION ALL SELECT z FROM missing"))
    # string literals survive the branch re-tokenization
    c = pa.table({"s": ["it's", "plain"]})
    sel3 = sqlexpr.parse_select(
        "SELECT s FROM c WHERE s = 'plain' "
        "UNION ALL SELECT s FROM c WHERE s = 'it''s'")
    out3 = sqlexpr.apply_select(rd.from_arrow(c), sel3).take_all()
    assert sorted(r["s"] for r in out3) == ["it's", "plain"]


def test_sql_avg_aggregate(ray_session):
    """AVG (swq_op_registrar.cpp:53): sum/count as float64, grouped and
    whole-table, alone or alongside other aggregates."""
    import duckdb
    import ray.data as rd

    t = pa.table({"k": ["a", "a", "b", "b", "b"],
                  "v": pa.array([1, 2, 2, 3, 7], pa.int64())})
    con = duckdb.connect()
    con.register("t", t)

    def run(sql):
        got = sqlexpr.apply_select(rd.from_arrow(t),
                                   sqlexpr.parse_select(sql)).take_all()
        exp = [dict(zip([d[0] for d in con.sql(sql).description], r))
               for r in con.sql(sql).fetchall()]
        return got, exp

    got, exp = run("SELECT k, avg(v) AS m FROM t GROUP BY k ORDER BY k")
    assert got == exp
    got, exp = run("SELECT k, count(*) AS n, avg(v) AS m, sum(v) AS s "
                   "FROM t GROUP BY k ORDER BY k")
    assert got == exp
    got, exp = run("SELECT avg(v) AS m FROM t WHERE v > 1")
    assert got == exp


def test_sql_stddev_aggregates(ray_session):
    """STDDEV_POP/STDDEV_SAMP (swq_op_registrar.cpp SWQCF_STDDEV_*):
    integer sum/sumsq partials, DuckDB-equal results, grouped and global."""
    import duckdb
    import ray.data as rd

    t = pa.table({"k": ["a", "a", "b", "b", "b"],
                  "v": pa.array([1, 2, 2, 3, 7], pa.int64())})
    con = duckdb.connect()
    con.register("t", t)

    def run(sql):
        got = sqlexpr.apply_select(rd.from_arrow(t),
                                   sqlexpr.parse_select(sql)).take_all()
        exp = [dict(zip([d[0] for d in con.sql(sql).description], r))
               for r in con.sql(sql).fetchall()]
        return got, exp

    got, exp = run("SELECT k, stddev_pop(v) AS sd FROM t GROUP BY k "
                   "ORDER BY k")
    for g, e in zip(got, exp):
        assert g["k"] == e["k"] and abs(g["sd"] - e["sd"]) < 1e-12
    got, exp = run("SELECT stddev_samp(v) AS sd, count(*) AS n FROM t")
    assert abs(got[0]["sd"] - exp[0]["sd"]) < 1e-12
    with pytest.raises(ValueError, match="plain column"):
        sqlexpr.apply_select(
            rd.from_arrow(t),
            sqlexpr.parse_select("SELECT stddev_pop(v + 1) AS s FROM t"))


def test_sql_limit_offset(ray_session):
    """LIMIT n OFFSET m / bare OFFSET on the sorted index
    (ogr_gensql.cpp:2325), matching DuckDB row-for-row."""
    import duckdb
    import ray.data as rd

    t = pa.table({"i": pa.array(range(30), pa.int64())})
    con = duckdb.connect()
    con.register("t", t)

    for sql in ("SELECT i FROM t ORDER BY i DESC LIMIT 7 OFFSET 4",
                "SELECT i FROM t ORDER BY i ASC OFFSET 25",
                "SELECT i FROM t ORDER BY i ASC LIMIT 100 OFFSET 28"):
        got = [r["i"] for r in sqlexpr.apply_select(
            rd.from_arrow(t), sqlexpr.parse_select(sql)).take_all()]
        exp = [r[0] for r in con.sql(sql).fetchall()]
        assert got == exp, sql
    # grouped tail goes through the same helper
    t2 = pa.table({"k": pa.array([i % 5 for i in range(40)], pa.int64())})
    got = sqlexpr.apply_select(
        rd.from_arrow(t2),
        sqlexpr.parse_select("SELECT k, count(*) AS n FROM t2 GROUP BY k "
                             "ORDER BY k LIMIT 2 OFFSET 2")).take_all()
    assert [r["k"] for r in got] == [2, 3]


def test_sql_count_column_skips_nulls(ray_session):
    """COUNT(col) (swq summary count: nulls skipped) alongside count(*),
    grouped and whole-table, matching DuckDB."""
    import duckdb
    import ray.data as rd

    t = pa.table({"k": ["a", "a", "b", "b"],
                  "v": pa.array([1, None, 2, None], pa.int64())})
    con = duckdb.connect()
    con.register("t", t)
    for sql in ("SELECT k, count(v) AS n, count(*) AS m FROM t GROUP BY k "
                "ORDER BY k",
                "SELECT count(v) AS n FROM t",
                "SELECT k, count(v) AS n, sum(v) AS s FROM t GROUP BY k "
                "ORDER BY k"):
        got = sqlexpr.apply_select(rd.from_arrow(t),
                                   sqlexpr.parse_select(sql)).take_all()
        exp = [dict(zip([d[0] for d in con.sql(sql).description], r))
               for r in con.sql(sql).fetchall()]
        assert got == exp, sql


def test_sql_special_fields(ray_session):
    """OGR special fields (ogr_swq.h): OGR_GEOM_AREA / OGR_GEOMETRY
    derived from the wkb column; clear error without a wkb column."""
    import numpy as np
    import ray.data as rd

    from gdal_ray.sources.synthetic import rect_wkbs

    t = pa.table({"fid": pa.array([1, 2], pa.int64()),
                  "wkb": pa.array(list(rect_wkbs(
                      np.array([0.0, 0.0]), np.array([0.0, 0.0]),
                      np.array([2.0, 5.0]), np.array([2.0, 4.0]))),
                      pa.binary())})
    out = sqlexpr.apply_select(rd.from_arrow(t), sqlexpr.parse_select(
        "SELECT fid, OGR_GEOM_AREA AS a, OGR_GEOMETRY AS g FROM t "
        "ORDER BY fid")).take_all()
    assert out == [{"fid": 1, "a": 4.0, "g": "POLYGON"},
                   {"fid": 2, "a": 20.0, "g": "POLYGON"}]
    t2 = pa.table({"fid": pa.array([1], pa.int64())})
    with pytest.raises(Exception, match="wkb"):
        sqlexpr.apply_select(rd.from_arrow(t2), sqlexpr.parse_select(
            "SELECT fid, OGR_GEOM_AREA AS a FROM t")).take_all()
