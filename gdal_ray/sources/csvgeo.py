"""CSV vector format (WKT geometry column) — the reference's CSV driver
surface (``ogr/ogrsf_frmts/csv/``, GEOMETRY=AS_WKT mode), built on
Ray Data's parallel CSV reader/writer plus the engine's WKT codec.

Scale shape: geometry travels as a quoted WKT text column, so the format is
line-splittable and both directions run fully distributed — ``to_wkt_batches``
/ ``from_wkt_batches`` are plain ``map_batches`` stages around
``Dataset.write_csv`` / ``ray.data.read_csv``.
"""

from __future__ import annotations

import pyarrow as pa

from ..functions import wkt as wkt_f


def to_wkt_column(ds, wkb_col: str = "wkb", wkt_col: str = "WKT"):
    """Dataset stage: replace the binary WKB column with quoted WKT text
    (CSV-safe); null geometries become empty strings."""

    def enc(t: pa.Table) -> pa.Table:
        wkts = [
            "" if w is None else wkt_f.encode_wkt(w)
            for w in t[wkb_col].to_pylist()
        ]
        idx = t.column_names.index(wkb_col)
        return t.remove_column(idx).add_column(idx, wkt_col, pa.array(wkts, pa.string()))

    return ds.map_batches(enc, batch_format="pyarrow")


def from_wkt_column(ds, wkt_col: str = "WKT", wkb_col: str = "wkb"):
    """Inverse stage: parse the WKT text column back to WKB binary."""

    def dec(t: pa.Table) -> pa.Table:
        wkbs = [
            None if (s is None or s == "") else wkt_f.parse_wkt(s)
            for s in t[wkt_col].to_pylist()
        ]
        idx = t.column_names.index(wkt_col)
        return t.remove_column(idx).add_column(idx, wkb_col, pa.array(wkbs, pa.binary()))

    return ds.map_batches(dec, batch_format="pyarrow")


def write_csv_layer(ds, out_dir: str, wkb_col: str = "wkb") -> None:
    """Distributed CSV sink: one part file per block, WKT geometry column."""
    to_wkt_column(ds, wkb_col=wkb_col).write_csv(out_dir)


def read_csv_layer(path: str, wkt_col: str = "WKT"):
    """Parallel CSV source -> Dataset with a WKB column."""
    import ray.data as rd

    return from_wkt_column(rd.read_csv(path), wkt_col=wkt_col)
