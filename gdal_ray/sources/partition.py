"""Field-partitioned vector sink — ``gdal vector partition``.

Re-answers ``apps/gdalalg_vector_partition.cpp``: split a layer into a
directory tree keyed by one or more field values, HIVE scheme
(``field=value/part_....ext``) or FLAT scheme (``{FIELD_VALUE}_....ext``),
with an optional per-file feature limit and optional omission of the
partitioned field from the rows (``--omit-partitioned-field``).

Ray-Data shape: ONE streaming pass — every ``map_batches`` task splits its
own batch by key (vectorized Arrow group split) and appends part files
under the key directories.  No shuffle: a partition's rows may span many
part files (exactly the reference's behavior with its feature-limit /
max-file-size rollover), so tasks never need to co-locate a key.  Part
filenames embed (block uuid, sequence), so concurrent tasks cannot
collide and a re-run with the same inputs overwrites cleanly at the
directory level.  Formats: parquet (the scale default) and geojson.
"""

from __future__ import annotations

import os
import uuid

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq


def _key_dir(scheme: str, field: str, value) -> str:
    sval = "__HIVE_DEFAULT_PARTITION__" if value is None else str(value)
    sval = sval.replace(os.sep, "_")
    return f"{field}={sval}" if scheme == "hive" else sval


def _write_part(table: pa.Table, path: str, driver: str) -> None:
    if driver == "parquet":
        pq.write_table(table, path)
    elif driver == "geojson":
        from . import geojson

        attrs = table.drop_columns(["wkb"]) if "wkb" in table.column_names \
            else None
        wkbs = (table["wkb"].to_pylist() if "wkb" in table.column_names
                else [None] * table.num_rows)
        geojson.write_geojson(path, wkbs, attrs)
    else:
        raise ValueError(f"unsupported partition driver {driver!r}; "
                         "known: parquet, geojson")


def vector_partition(ds, out_dir: str, field: str, scheme: str = "hive",
                     driver: str = "parquet",
                     feature_limit: int | None = None,
                     omit_field: bool = False) -> None:
    """Write ``ds`` under ``out_dir`` partitioned by ``field``.

    Consumes the Dataset (terminal).  ``feature_limit`` rolls a partition
    over to a new part file every N features WITHIN a task's batch stream
    (the reference's --feature-limit rollover); ``omit_field`` drops the
    partition column from the written rows (--omit-partitioned-field)."""
    if scheme not in ("hive", "flat"):
        raise ValueError(f"scheme {scheme!r} not in ('hive', 'flat')")
    ext = "parquet" if driver == "parquet" else "geojson"
    os.makedirs(out_dir, exist_ok=True)

    def sink(batch: pa.Table) -> pa.Table:
        if field not in batch.column_names:
            raise KeyError(f"partition field {field!r} not in "
                           f"{batch.column_names}")
        block = uuid.uuid4().hex[:12]
        keys = batch[field]
        # vectorized group split: sort indices by key, slice runs
        idx = pc.sort_indices(keys)
        sk = keys.take(idx)
        vals = sk.to_pylist()
        seq = 0
        i = 0
        n = batch.num_rows
        while i < n:
            j = i
            while j < n and vals[j] == vals[i]:
                j += 1
            sub = batch.take(idx.slice(i, j - i))
            if omit_field:
                sub = sub.drop_columns([field])
            d = os.path.join(out_dir, _key_dir(scheme, field, vals[i]))
            os.makedirs(d, exist_ok=True)
            lim = feature_limit or sub.num_rows
            for k0 in range(0, sub.num_rows, max(lim, 1)):
                piece = sub.slice(k0, lim)
                fname = f"part_{block}_{seq:05d}.{ext}"
                tmp = os.path.join(d, f".{fname}.tmp")
                _write_part(piece, tmp, driver)
                os.replace(tmp, os.path.join(d, fname))
                seq += 1
            i = j
        return pa.table({"rows": pa.array([n], pa.int64())})

    # consume: sum of per-batch row counts forces full execution
    ds.map_batches(sink, batch_format="pyarrow").sum("rows")


def read_partitioned_vector(root: str, driver: str = "parquet",
                            field: str | None = None):
    """Read a hive-partitioned tree back as one Dataset, re-deriving the
    partition field from the directory names when ``field`` is given and
    the rows were written with ``omit_field``."""
    import glob

    import ray.data as rd

    ext = "parquet" if driver == "parquet" else "geojson"
    paths = sorted(glob.glob(os.path.join(root, "*", f"*.{ext}")))
    if not paths:
        raise FileNotFoundError(f"no .{ext} part files under {root}")
    index = pa.table({"path": pa.array(paths)})

    def load(batch: pa.Table) -> pa.Table:
        outs = []
        for p in batch["path"].to_pylist():
            if driver == "parquet":
                t = pq.read_table(p)
            else:
                from . import geojson

                t = geojson.read_geojson(p)
            if field is not None and field not in t.column_names:
                dname = os.path.basename(os.path.dirname(p))
                val = dname.split("=", 1)[1] if "=" in dname else dname
                t = t.append_column(field, pa.array([val] * t.num_rows))
            outs.append(t)
        return pa.concat_tables(outs, promote_options="default")

    return rd.from_arrow(index).repartition(min(len(paths), 32)).map_batches(
        load, batch_format="pyarrow")
