"""Sources / sinks.

Primary format per BASELINE.json is Lance; the sandbox ships no ``lance``
package, so every reader tries Lance first and falls back to parquet (same
Arrow schemas).  Reads always push column projection down
(reference analogue: OGR ``SetIgnoredFields`` / ``SetSpatialFilter`` pushdown,
``ogr/ogrsf_frmts/ogrsf_frmts.h:207-215``).

``write_partitioned`` + ``Manifest`` implement the resumable-output contract
(north rule: per-partition checkpoints with lineage + metrics; reference
analogue: tile-file-existence resume ``apps/gdalalg_raster_tile.cpp:676-682``).
"""

from __future__ import annotations

import json
import os
import time

import pyarrow.parquet as pq

import ray.data as rd

try:  # pragma: no cover - lance not present in this container
    import lance  # noqa: F401

    HAVE_LANCE = True
except ImportError:
    HAVE_LANCE = False


def read_table(path_or_dir: str, table: str | None = None, columns=None, **kwargs) -> "rd.Dataset":
    """Read a named table from a dataset directory (or a direct file path).

    Tries ``<dir>/<table>.lance`` then ``<dir>/<table>.parquet``.
    """
    if table is not None:
        lance_path = os.path.join(path_or_dir, f"{table}.lance")
        pq_path = os.path.join(path_or_dir, f"{table}.parquet")
    else:
        lance_path = pq_path = path_or_dir
    if HAVE_LANCE and os.path.exists(lance_path):
        # read_lance's ``filter`` expects an SQL string, not the
        # pyarrow.dataset Expression read_parquet takes: translate the
        # Expression via its stable str() form (e.g. '(p_size >= 10)')
        # so the pushdown survives on the lance branch instead of failing
        lkw = dict(kwargs)
        flt = lkw.pop("filter", None)
        if flt is not None:
            lkw["filter"] = str(flt)
        return _strip_schema_metadata(rd.read_lance(lance_path,
                                                    columns=columns, **lkw))
    if "schema" not in kwargs:
        # hand read_parquet a metadata-free schema up front: the READ
        # operator's own output blocks then hash cleanly for Ray's schema
        # dedup (the downstream strip map can't fix the read op itself)
        try:
            import pyarrow as pa
            import pyarrow.parquet as pq

            sch = pq.read_schema(pq_path).remove_metadata()
            if columns is not None:
                sch = pa.schema([sch.field(c) for c in columns])
            kwargs = dict(kwargs, schema=sch)
        except Exception:
            pass  # directory inputs etc.: fall back to the strip map alone
    return _strip_schema_metadata(rd.read_parquet(pq_path, columns=columns,
                                                  **kwargs))


def _strip_schema_metadata(ds: "rd.Dataset") -> "rd.Dataset":
    """Drop schema-level metadata (e.g. the pandas block written by
    pandas-authored parquet): pa.Schema.__hash__ raises on metadata dicts,
    which defeats Ray Data's per-worker schema dedup and floods worker logs
    with 'Failed to hash the schemas' warnings.  Zero-copy, and the map
    fuses onto the read tasks."""
    if not hasattr(ds, "map_batches"):  # test doubles / sentinel returns
        return ds
    return ds.map_batches(
        lambda t: t.replace_schema_metadata(None) if t.schema.metadata else t,
        batch_format="pyarrow")


def write_table(ds: "rd.Dataset", path: str, **kwargs) -> None:
    if HAVE_LANCE and path.endswith(".lance"):
        ds.write_lance(path, **kwargs)
    else:
        ds.write_parquet(path, **kwargs)


# ---------------------------------------------------------------------------
# Resumable partitioned output
# ---------------------------------------------------------------------------


class Manifest:
    """Per-partition checkpoint manifest.

    Layout: ``<root>/_manifest/<partition_id>.json`` written atomically
    (tmp + rename) after the partition's data lands at
    ``<root>/part=<partition_id>/``.  Each record carries lineage (input
    fingerprint, stage name) + metrics (rows, bytes, wall seconds), so a
    resumed run can prove which partitions were produced by which inputs.
    """

    def __init__(self, root: str):
        self.root = root
        self.dir = os.path.join(root, "_manifest")
        os.makedirs(self.dir, exist_ok=True)

    def done_partitions(self) -> set[str]:
        return {
            f[: -len(".json")]
            for f in os.listdir(self.dir)
            if f.endswith(".json") and not f.startswith(".")
        }

    def record(self, partition_id: str, lineage: dict, metrics: dict) -> None:
        payload = {
            "partition_id": partition_id,
            "lineage": lineage,
            "metrics": metrics,
            "completed_at": time.time(),
        }
        tmp = os.path.join(self.dir, f".{partition_id}.tmp")
        with open(tmp, "w") as f:
            json.dump(payload, f)
        os.replace(tmp, os.path.join(self.dir, f"{partition_id}.json"))

    def read(self, partition_id: str) -> dict:
        with open(os.path.join(self.dir, f"{partition_id}.json")) as f:
            return json.load(f)


def write_partitioned(
    ds: "rd.Dataset",
    root: str,
    partition_ids: list[str],
    partition_filter_fn,
    lineage: dict | None = None,
    progress_callback=None,
) -> list[str]:
    """Write one output directory per partition, skipping finished ones.

    ``partition_filter_fn(ds, pid) -> Dataset`` selects one partition's rows.
    Returns the list of partitions actually (re)written.  This is the
    driver-side resume loop; each partition is an independent Ray Data
    execution so a crash loses at most one partition.

    ``progress_callback(complete, message) -> bool`` (the GDALProgressFunc
    shape, state/progress.py) is invoked after every partition — including
    resume-skipped ones, so a resumed run starts from its true fraction.
    Returning False cancels at the next partition boundary (partitions
    already recorded stay valid; the run resumes where it stopped)."""
    manifest = Manifest(root)
    done = manifest.done_partitions()
    written = []
    n_total = max(len(partition_ids), 1)
    for i, pid in enumerate(partition_ids):
        if pid in done:
            if progress_callback is not None:
                progress_callback((i + 1) / n_total, f"part={pid} (resumed)")
            continue
        t0 = time.time()
        part = partition_filter_fn(ds, pid)
        out_dir = os.path.join(root, f"part={pid}")
        tmp_dir = os.path.join(root, f"_tmp_part={pid}")
        import shutil

        for d in (tmp_dir, out_dir):  # unrecorded partial output -> rewrite
            if os.path.exists(d):
                shutil.rmtree(d)
        part.write_parquet(tmp_dir)
        os.makedirs(tmp_dir, exist_ok=True)  # empty partition -> empty dir
        os.replace(tmp_dir, out_dir)
        rows = sum(
            pq.read_metadata(os.path.join(out_dir, f)).num_rows
            for f in os.listdir(out_dir)
            if f.endswith(".parquet")
        )
        manifest.record(
            pid,
            lineage={**(lineage or {}), "partition": pid},
            metrics={"rows": int(rows), "seconds": time.time() - t0},
        )
        written.append(pid)
        if progress_callback is not None:
            if progress_callback((i + 1) / n_total, f"part={pid}") is False:
                break
    return written
