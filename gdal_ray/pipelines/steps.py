"""Pipeline step registry — the user-extension surface.

Re-answers ``gdal vector/raster pipeline`` ``!``-chained steps (reference:
registry ``apps/gdalalg_abstract_pipeline.cpp:93-150``, step base
``apps/gdalpipelinestepalgorithm.h:29``) as a named-callable registry:
a Step is ``(Dataset, **params) -> Dataset``; ``run_pipeline`` parses
"step1 a=1 ! step2 b=2" specs the way the CLI chains steps.

VRT-style pixel functions (``frmts/vrt/vrtderivedrasterband.cpp:307``
GDALAddDerivedBandPixelFunc) map to ``rastermap.calc``'s callable expr and to
``register_step`` for user-defined stages.
"""

from __future__ import annotations

import ast
from collections.abc import Callable

_REGISTRY: dict[str, Callable] = {}


def register_step(name: str):
    def deco(fn: Callable) -> Callable:
        _REGISTRY[name] = fn
        return fn

    return deco


def get_step(name: str) -> Callable:
    if name not in _REGISTRY:
        raise KeyError(f"unknown pipeline step {name!r}; known: {sorted(_REGISTRY)}")
    return _REGISTRY[name]


def list_steps() -> list[str]:
    return sorted(_REGISTRY)


def run_pipeline(ds, spec: str):
    """Run a '!'-chained step spec:
    "derive_geometry ! filter_ge col=n_chars value=100 ! select cols=doc_id ! limit n=10".
    Values are shlex-quoted, so SQL strings survive:
    ``sql_filter where='p_size >= 10 AND p_type LIKE ''%AND%''' ``."""
    import shlex

    for part in spec.split("!"):
        tokens = shlex.split(part.strip())
        if not tokens:
            continue
        name, kwargs = tokens[0], {}
        for tok in tokens[1:]:
            k, _, v = tok.partition("=")
            try:
                kwargs[k] = ast.literal_eval(v)
            except (ValueError, SyntaxError):
                kwargs[k] = v
        ds = get_step(name)(ds, **kwargs)
    return ds


# -- built-in steps (the gdal vector pipeline step set, SURVEY §2.2/2.6) -----


@register_step("select")
def _select(ds, cols):
    cols = cols.split(",") if isinstance(cols, str) else list(cols)
    return ds.select_columns(cols)


@register_step("limit")
def _limit(ds, n):
    return ds.limit(int(n))


@register_step("filter_ge")
def _filter_ge(ds, col, value):
    import pyarrow.compute as pc

    return ds.map_batches(
        lambda t: t.filter(pc.greater_equal(t[col], value)), batch_format="pyarrow"
    )


@register_step("sql_filter")
def _sql_filter(ds, where):
    """OGR SetAttributeFilter role: WHERE string -> vectorized Arrow filter
    (ogr/ogrfeaturequery.cpp; grammar ogr/swq_parser.y)."""
    from ..functions import sqlexpr

    return sqlexpr.sql_filter(ds, where)


@register_step("sql_select")
def _sql_select(ds, sql):
    """OGR SQL SELECT over the current dataset (ogr/ogr_gensql.cpp role):
    projection expressions, WHERE, ORDER BY, LIMIT, DISTINCT.  The FROM
    clause, if present, is ignored — the input Dataset IS the layer."""
    from ..functions import sqlexpr

    return sqlexpr.apply_select(ds, sqlexpr.parse_select(sql))


def _truthy(v) -> bool:
    """Spec values arrive as strings when not Python literals: 'false'/'no'
    must not be bool('false') == True."""
    if isinstance(v, str):
        return v.strip().lower() in ("1", "true", "yes", "on")
    return bool(v)


@register_step("sort")
def _sort(ds, key, desc=False):
    return ds.sort(key, descending=_truthy(desc))


@register_step("derive_geometry")
def _derive_geometry(ds, key_col="doc_id"):
    from ..stages.tiles import derive_geometry_batch

    return ds.map_batches(
        lambda t: derive_geometry_batch(t, key_col), batch_format="pyarrow"
    )


@register_step("assign_tiles")
def _assign_tiles(ds, zooms="8", key_col="doc_id"):
    from ..stages.tiles import assign_tiles

    # literal_eval may already have produced an int or tuple from the spec
    if isinstance(zooms, (tuple, list)):
        zs = tuple(int(z) for z in zooms)
    elif isinstance(zooms, int):
        zs = (zooms,)
    else:
        zs = tuple(int(z) for z in str(zooms).split(","))
    return assign_tiles(ds, zooms=zs, key_col=key_col)


@register_step("reproject")
def _reproject(ds, dst="EPSG:3857"):
    """Per-vertex CRS transform of lon/lat columns (vector reproject,
    apps/gdalalg_vector_reproject.h; EPSG:4326 <-> 3857 closed forms)."""
    import pyarrow as pa

    from ..functions import geo

    if dst not in ("EPSG:3857", "EPSG:4326"):
        raise ValueError("built-in reproject supports EPSG:4326 <-> EPSG:3857")

    def fn(t: pa.Table) -> pa.Table:
        lon = t["lon"].to_numpy(zero_copy_only=False)
        lat = t["lat"].to_numpy(zero_copy_only=False)
        if dst == "EPSG:3857":
            x, y = geo.lonlat_to_mercator(lon, lat)
        else:
            x, y = geo.mercator_to_lonlat(lon, lat)
        return t.append_column("geo_x", pa.array(x)).append_column("geo_y", pa.array(y))

    return ds.map_batches(fn, batch_format="pyarrow")


@register_step("linearize")
def _linearize(ds, max_angle_deg=4.0, wkb_col="wkb"):
    """CurveToLine over a WKB column (ogr2ogr -nlt CONVERT_TO_LINEAR):
    CircularString/CompoundCurve -> LineString, CurvePolygon -> Polygon."""
    from ..stages import geomops

    deg = float(max_angle_deg)
    return ds.map_batches(
        lambda t: geomops.linearize_batch(t, max_angle_deg=deg,
                                          wkb_col=wkb_col),
        batch_format="pyarrow")


@register_step("force_2d")
def _force_2d(ds, wkb_col="wkb"):
    """ogr2ogr -dim XY: drop Z/M ordinates from a WKB column explicitly."""
    from ..stages import geomops

    return ds.map_batches(
        lambda t: geomops.force_2d_batch(t, wkb_col=wkb_col),
        batch_format="pyarrow")


@register_step("explode")
def _explode(ds, wkb_col="wkb"):
    """Explode multi-geometries and GeometryCollections to one row per
    single part (apps/gdalalg_vector_explode_collections.h)."""
    from ..stages import geomops

    return geomops.explode_collections(ds, wkb_col=wkb_col)


@register_step("open_raster")
def _open_raster(ds, path="", tile_size=64, z=4, band=1, var=None):
    """Source step (GDALOpen role, gcore/gdaldataset.cpp identify loop):
    probe the path against every in-repo raster driver and emit the
    standard tile rows.  Ignores the incoming Dataset — it STARTS a
    pipeline ("open_raster path=x.tif ! calc expr='A*2' ! ...")."""
    from ..sources.openraster import open_raster_tiles

    if not path:
        raise ValueError("open_raster needs path=...")
    return open_raster_tiles(path, tile_size=int(tile_size), z=int(z),
                             band=int(band), var=var)


@register_step("open_vector")
def _open_vector(ds, path="", layer=None):
    """Source step (GDALOpen with GDAL_OF_VECTOR): probe the path against
    every in-repo vector driver and emit the standard (wkb + attrs)
    feature rows as a Dataset.  Ignores the incoming Dataset — it STARTS
    a pipeline ("open_vector path=z.gpkg ! filter ... ! ...")."""
    import pyarrow as pa
    import ray.data as rd

    from ..sources.openvector import open_vector

    if not path:
        raise ValueError("open_vector needs path=...")
    out = open_vector(path, layer=layer)
    return rd.from_arrow(out) if isinstance(out, pa.Table) else out


@register_step("tee")
def step_tee(ds, path: str, fmt: str = "parquet"):
    """``gdal pipeline ... ! tee ...`` (reference ``apps/gdalalg_tee.cpp``):
    persist the intermediate dataset to ``path`` and pass it through
    unchanged, so one pipeline both snapshots and continues.  The write is
    the distributed parquet sink (one file per block)."""
    if fmt != "parquet":
        raise ValueError(f"tee supports fmt='parquet' (got {fmt!r})")
    ds = ds.materialize()
    ds.write_parquet(path)
    return ds


@register_step("materialize")
def step_materialize(ds):
    """``gdal pipeline ... ! materialize`` (reference
    ``apps/gdalalg_materialize.cpp``): pin the intermediate result in the
    object store so later steps (or repeated consumption) do not recompute
    the upstream chain.  A deliberate exception to laziness — the
    reference step exists for exactly this."""
    return ds.materialize()
