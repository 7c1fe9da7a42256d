"""GDAL virtual-filesystem containers: /vsizip/, /vsigzip/, /vsitar/.

Re-answers the reference's VSI archive handlers (``port/cpl_vsil_gzip.cpp``,
``port/cpl_vsil_tar.cpp``, the /vsizip handler in ``port/cpl_vsil_gzip.cpp``
ZIP half, path grammar per ``port/cpl_vsi_virtual.h``): a path of the form

    /vsizip/path/to/archive.zip/inner/file.shp
    /vsigzip/path/to/file.geojson.gz
    /vsitar/path/to/archive.tar/inner/file.tif

resolves the inner member to bytes any driver can read.  The engine's
drivers are windowed-memmap readers over REAL files, so the VSI layer
EXTRACTS the requested member (plus its same-stem sidecars — .shx/.dbf for
a zipped shapefile, .hdr for ENVI) into a content-keyed scratch directory
under ``$TMPDIR/gdal_ray_vsi/`` and returns the concrete path.  The cache
key is (archive device+inode+mtime+size, member), so repeated opens — and
every Ray worker on the same node — reuse one extraction; different nodes
extract independently (no shared state, nothing transits the driver).

That is a deliberate, documented divergence from the reference's streamed
decompression: GDAL streams because its drivers read through VSIFReadL;
ours memmap.  Extraction keeps every downstream read windowed and
zero-copy, and at 100 TB each worker only ever extracts the members its
own tasks open.

Single-member shorthand: ``/vsizip/archive.zip`` (no inner path) resolves
to the archive's only member, same as the reference's behavior when the
zip contains exactly one file.

Writer half: ``zip_sink_dir`` zips a finished sink directory (e.g. the
shapefile part set or a z/x/y tile tree) into one archive — the
``ogr2ogr out.shp.zip`` surface (``ogr/ogrsf_frmts/shape/`` .shp.zip
support)."""

from __future__ import annotations

import gzip
import hashlib
import os
import shutil
import tarfile
import tempfile
import zipfile

_PREFIXES = ("/vsizip/", "/vsigzip/", "/vsitar/")


def is_vsi(path: str) -> bool:
    return any(path.startswith(p) for p in _PREFIXES)


def _find_archive(rest: str, exts: tuple) -> tuple:
    """Split ``rest`` into (existing archive path, inner member path).

    Walks the path components left-to-right; the archive is the first
    prefix that is an existing regular file (the reference walks the same
    way so inner paths may themselves contain '/')."""
    # the double-slash absolute form /vsizip//abs/path.zip/x arrives here
    # as "/abs/path.zip/x"; the relative form as "rel/path.zip/x"
    absolute = rest.startswith("/")
    parts = [p for p in rest.split("/") if p]
    acc = ""
    for i, comp in enumerate(parts):
        acc = acc + "/" + comp if acc else ("/" + comp if absolute else comp)
        if os.path.isfile(acc) and (acc.lower().endswith(exts)
                                    or i == len(parts) - 1):
            return acc, "/".join(parts[i + 1:])
    raise FileNotFoundError(
        f"no archive file found along {rest!r} (looked for {exts})")


def split_vsi(path: str) -> tuple:
    """``(kind, archive_path, inner_member)`` for a /vsi* path."""
    for p in _PREFIXES:
        if path.startswith(p):
            kind = p.strip("/").replace("vsi", "")
            rest = path[len(p):]
            exts = {"zip": (".zip",), "gzip": (".gz", ".gzip"),
                    "tar": (".tar", ".tgz", ".tar.gz")}[kind]
            arch, inner = _find_archive(rest, exts)
            return kind, arch, inner
    raise ValueError(f"not a VSI path: {path!r}")


def _cache_dir(arch: str, tag: str) -> str:
    st = os.stat(arch)
    key = f"{os.path.abspath(arch)}:{st.st_mtime_ns}:{st.st_size}:{tag}"
    h = hashlib.sha1(key.encode()).hexdigest()[:20]
    root = os.path.join(tempfile.gettempdir(), "gdal_ray_vsi", h)
    os.makedirs(root, exist_ok=True)
    return root


def _publish(dst: str, data: bytes) -> None:
    """Atomic write so concurrent workers never see a torn extraction."""
    if os.path.exists(dst):
        return
    tmp = dst + f".tmp.{os.getpid()}"
    with open(tmp, "wb") as f:
        f.write(data)
    os.replace(tmp, dst)


def list_members(path_or_archive: str) -> list:
    """Member names inside a /vsi* path's archive (VSIReadDir role)."""
    if is_vsi(path_or_archive):
        kind, arch, _ = split_vsi(path_or_archive)
    else:
        arch = path_or_archive
        kind = ("zip" if arch.lower().endswith(".zip") else
                "tar" if arch.lower().endswith((".tar", ".tgz", ".tar.gz"))
                else "gzip")
    if kind == "zip":
        with zipfile.ZipFile(arch) as z:
            return [i.filename for i in z.infolist() if not i.is_dir()]
    if kind == "tar":
        with tarfile.open(arch) as t:
            return [m.name for m in t.getmembers() if m.isfile()]
    return [os.path.basename(arch)[:-len(".gz")]]


def vsi_resolve(path: str) -> str:
    """Resolve a /vsi* path to a concrete local file path (extracting into
    the content-keyed scratch cache on first touch).  Non-VSI paths pass
    through untouched, so openers can call this unconditionally."""
    if not is_vsi(path):
        return path
    kind, arch, inner = split_vsi(path)

    if kind == "gzip":
        root = _cache_dir(arch, "gz")
        base = os.path.basename(arch)
        name = base[:-len(".gz")] if base.lower().endswith(".gz") else \
            base[:-len(".gzip")] if base.lower().endswith(".gzip") else base
        dst = os.path.join(root, name)
        if not os.path.exists(dst):
            with gzip.open(arch, "rb") as f:
                _publish(dst, f.read())
        return dst

    if kind == "zip":
        with zipfile.ZipFile(arch) as z:
            names = [i.filename for i in z.infolist() if not i.is_dir()]
            if not inner:
                if len(names) != 1:
                    raise ValueError(
                        f"/vsizip/{arch} has {len(names)} members — name "
                        f"one of {sorted(names)[:8]}...")
                inner = names[0]
            if inner not in names:
                raise FileNotFoundError(
                    f"{inner!r} not in {arch} (members: {sorted(names)[:8]})")
            root = _cache_dir(arch, "zip")
            # pull the member plus same-stem sidecars (.shp -> .shx/.dbf/
            # .prj, ENVI raw -> .hdr) so multi-file drivers just work
            stem = os.path.splitext(inner)[0]
            want = [n for n in names
                    if n == inner or os.path.splitext(n)[0] == stem]
            for n in want:
                dst = os.path.join(root, n.replace("/", "__"))
                if not os.path.exists(dst):
                    _publish(dst, z.read(n))
            return os.path.join(root, inner.replace("/", "__"))

    # tar
    with tarfile.open(arch) as t:
        names = [m.name for m in t.getmembers() if m.isfile()]
        if not inner:
            if len(names) != 1:
                raise ValueError(
                    f"/vsitar/{arch} has {len(names)} members — name one")
            inner = names[0]
        if inner not in names:
            raise FileNotFoundError(
                f"{inner!r} not in {arch} (members: {sorted(names)[:8]})")
        root = _cache_dir(arch, "tar")
        stem = os.path.splitext(inner)[0]
        want = [n for n in names
                if n == inner or os.path.splitext(n)[0] == stem]
        for n in want:
            dst = os.path.join(root, n.replace("/", "__"))
            if not os.path.exists(dst):
                f = t.extractfile(n)
                _publish(dst, f.read())
        return os.path.join(root, inner.replace("/", "__"))


def zip_sink_dir(src: str, archive: str, compress: bool = True) -> str:
    """Zip a finished sink directory (or single file) into ``archive`` —
    the ``out.shp.zip`` / zipped-tile-tree surface.  Store paths relative
    to ``src`` so /vsizip round-trips.  Atomic publish."""
    comp = zipfile.ZIP_DEFLATED if compress else zipfile.ZIP_STORED
    tmp = archive + f".tmp.{os.getpid()}"
    with zipfile.ZipFile(tmp, "w", compression=comp) as z:
        if os.path.isfile(src):
            z.write(src, os.path.basename(src))
        else:
            for base, _dirs, files in os.walk(src):
                for fn in sorted(files):
                    full = os.path.join(base, fn)
                    z.write(full, os.path.relpath(full, src))
    os.replace(tmp, archive)
    return archive


def gzip_file(src: str, dst: str | None = None) -> str:
    """Gzip one file (the writer half of /vsigzip)."""
    dst = dst or src + ".gz"
    tmp = dst + f".tmp.{os.getpid()}"
    with open(src, "rb") as f, gzip.open(tmp, "wb", compresslevel=6) as g:
        shutil.copyfileobj(f, g)
    os.replace(tmp, dst)
    return dst
