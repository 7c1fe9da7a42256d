"""SOZip — seek-optimized ZIP (``gdal vsi sozip``), from the published spec.

Re-answers the reference's SOZip surface (``apps/gdalalg_vsi_sozip.cpp``;
writer ``port/cpl_minizip_zip.cpp:2454`` header layout + hidden index
member ``:2568``; reader ``port/cpl_vsil_gzip.cpp:4208`` + chunk seek
``:3861``): the member's deflate stream is built from INDEPENDENT raw
deflate chunks (each ended with Z_SYNC_FLUSH + Z_FULL_FLUSH markers, pigz
independent-mode style — the concatenation is one valid deflate stream any
unzip can read), and a hidden ``.<name>.sozip.idx`` member (stored
uncompressed, excluded from the central directory, placed right after the
member data) records the chunk offsets:

  32-byte LE header: version=1 u32 | to_skip=0 u32 | chunk_size u32 |
  offset_size=8 u32 | uncompressed_size u64 | compressed_size u64,
  then one u64 per chunk 1..n-1 (chunk 0 starts at 0).

Ray-Data shape — SOZip's whole point is parallelism, on both sides:
``sozip_create`` fans chunk compression out over ``map_batches`` (tasks
read their own byte ranges; chunks are independent by construction) and
the driver appends the ordered stream holding one batch at a time;
``read_sozip_chunks`` fans RANGE DECOMPRESSION out — each task raw-inflates
only its chunks' compressed spans, which is exactly what a 100 GB member
on object storage needs."""

from __future__ import annotations

import os
import struct
import zlib

import numpy as np
import pyarrow as pa

_LOCAL_SIG = b"PK\x03\x04"
_CENTRAL_SIG = b"PK\x01\x02"
_EOCD_SIG = b"PK\x05\x06"


def _compress_chunk(data: bytes, final: bool) -> bytes:
    c = zlib.compressobj(6, zlib.DEFLATED, -15)
    out = c.compress(data)
    if final:
        out += c.flush(zlib.Z_FINISH)
    else:
        out += c.flush(zlib.Z_SYNC_FLUSH)
        out += c.flush(zlib.Z_FULL_FLUSH)
    return out


def _local_header(name: bytes, method: int, crc: int, csize: int,
                  usize: int) -> bytes:
    return (_LOCAL_SIG + struct.pack(
        "<HHHHHIIIHH", 20, 0, method, 0, 0, crc, csize, usize,
        len(name), 0) + name)


def sozip_create(archive: str, src_path: str, chunk_size: int = 32768,
                 arcname: str | None = None, parallel: bool = True) -> dict:
    """Write ``src_path`` into a new SOZip ``archive``.  Returns the info
    dict ``sozip_info`` reports (chunk count, sizes).  Chunk compression
    runs as a Ray Data pipeline when ``parallel`` and the file spans
    enough chunks; the driver only ever holds one ordered batch."""
    size = os.path.getsize(src_path)
    if size > 0xFFFFFFFF:
        raise ValueError("ZIP64 members are not supported by this writer")
    name = (arcname or os.path.basename(src_path)).encode()
    n_chunks = max(1, -(-size // chunk_size))

    def compress_span(i0: int, i1: int) -> list[bytes]:
        out = []
        with open(src_path, "rb") as f:
            f.seek(i0 * chunk_size)
            for i in range(i0, i1):
                data = f.read(min(chunk_size, size - i * chunk_size))
                out.append(_compress_chunk(data, final=(i == n_chunks - 1)))
        return out

    # crc of the whole uncompressed file (streamed)
    crc = 0
    with open(src_path, "rb") as f:
        while True:
            b = f.read(1 << 20)
            if not b:
                break
            crc = zlib.crc32(b, crc)

    pieces_iter = None
    if parallel and n_chunks >= 8:
        import ray.data as rd

        idx = pa.table({"chunk": pa.array(np.arange(n_chunks, dtype=np.int64))})

        def work(batch: pa.Table) -> pa.Table:
            ch = batch["chunk"].to_numpy()
            outs = []
            for i in ch:
                outs.append(compress_span(int(i), int(i) + 1)[0])
            return pa.table({"chunk": pa.array(ch),
                             "blob": pa.array(outs, pa.binary())})

        ds = (rd.from_arrow(idx).repartition(min(n_chunks, 32))
              .map_batches(work, batch_format="pyarrow").sort("chunk"))

        def ordered():
            for b in ds.iter_batches(batch_format="pyarrow"):
                t = pa.table(b)
                for v in t["blob"].to_pylist():
                    yield v

        pieces_iter = ordered()
    else:
        pieces_iter = iter(compress_span(0, n_chunks))

    tmp = archive + f".tmp.{os.getpid()}"
    offsets = []
    with open(tmp, "wb") as f:
        member_lho = f.tell()
        # sizes unknown until chunks stream through: write a placeholder
        # header, patch after (the file is local and seekable)
        f.write(_local_header(name, 8, 0, 0, 0))
        data_start = f.tell()
        comp = 0
        for blob in pieces_iter:
            if comp > 0:
                offsets.append(comp)
            f.write(blob)
            comp += len(blob)
        data_end = f.tell()
        # hidden index member, right after the data, stored, NOT in the
        # central directory
        idx_payload = struct.pack("<IIIIQQ", 1, 0, chunk_size, 8,
                                  size, comp)
        idx_payload += b"".join(struct.pack("<Q", o) for o in offsets)
        idx_name = b"." + name + b".sozip.idx"
        f.write(_local_header(idx_name, 0, zlib.crc32(idx_payload),
                              len(idx_payload), len(idx_payload)))
        f.write(idx_payload)
        # central directory: the MAIN member only
        cd_start = f.tell()
        f.write(_CENTRAL_SIG + struct.pack(
            "<HHHHHHIIIHHHHHII", 20, 20, 0, 8, 0, 0, crc, comp, size,
            len(name), 0, 0, 0, 0, 0, member_lho) + name)
        cd_size = f.tell() - cd_start
        f.write(_EOCD_SIG + struct.pack("<HHHHIIH", 0, 0, 1, 1, cd_size,
                                        cd_start, 0))
        # patch the member header's crc/sizes
        f.seek(member_lho + 14)
        f.write(struct.pack("<III", crc, comp, size))
        assert data_start == member_lho + 30 + len(name)
    os.replace(tmp, archive)
    return {"chunk_size": chunk_size, "n_chunks": n_chunks,
            "uncompressed_size": size, "compressed_size": comp,
            "n_offsets": len(offsets)}


def _find_member(archive: str, member: str | None):
    """Locate the (single central-directory) member + its hidden index.
    Returns (name, data_offset, csize, usize, idx) with idx =
    (chunk_size, offsets list incl. 0 and csize) or None."""
    import zipfile

    with zipfile.ZipFile(archive) as z:
        infos = [i for i in z.infolist() if not i.is_dir()]
        if member is None:
            if len(infos) != 1:
                raise ValueError(f"{archive} has {len(infos)} members; "
                                 "name one")
            info = infos[0]
        else:
            match = [i for i in infos if i.filename == member]
            if not match:
                raise FileNotFoundError(f"{member!r} not in {archive}")
            info = match[0]
    with open(archive, "rb") as f:
        f.seek(info.header_offset)
        hdr = f.read(30)
        if hdr[:4] != _LOCAL_SIG:
            raise ValueError("bad local header")
        nlen, elen = struct.unpack("<HH", hdr[26:30])
        data_off = info.header_offset + 30 + nlen + elen
        # hidden index member right after the data?
        f.seek(data_off + info.compress_size)
        hdr2 = f.read(30)
        idx = None
        if len(hdr2) == 30 and hdr2[:4] == _LOCAL_SIG:
            n2, e2 = struct.unpack("<HH", hdr2[26:30])
            name2 = f.read(n2)
            f.seek(e2, 1)
            if name2.endswith(b".sozip.idx"):
                head = f.read(32)
                ver, skip, chunk_size, osz, usize, csize = struct.unpack(
                    "<IIIIQQ", head)
                if (ver == 1 and osz == 8
                        and usize == info.file_size
                        and csize == info.compress_size and chunk_size > 0):
                    n_off = max(0, -(-usize // chunk_size) - 1) if usize \
                        else 0
                    f.seek(skip, 1)
                    offs = [0] + list(struct.unpack(
                        f"<{n_off}Q", f.read(8 * n_off))) + [csize]
                    idx = (chunk_size, offs)
        return (info.filename, data_off, info.compress_size,
                info.file_size, idx)


def sozip_info(archive: str, member: str | None = None) -> dict:
    """``gdal vsi sozip validate``-style report."""
    name, _off, csize, usize, idx = _find_member(archive, member)
    out = {"member": name, "compressed_size": csize,
           "uncompressed_size": usize, "sozip": idx is not None}
    if idx is not None:
        out["chunk_size"] = idx[0]
        out["n_chunks"] = max(1, -(-usize // idx[0])) if usize else 1
    return out


def sozip_read_chunk(archive: str, member: str | None, chunk_idx: int) -> bytes:
    """Decompress ONE chunk via the index — a seek + bounded raw inflate,
    never touching the rest of the stream (the reader contract at
    cpl_vsil_gzip.cpp:3861)."""
    _name, data_off, _csize, usize, idx = _find_member(archive, member)
    if idx is None:
        raise ValueError(f"{archive} member has no SOZip index")
    chunk_size, offs = idx
    n_chunks = max(1, -(-usize // chunk_size)) if usize else 1
    if not (0 <= chunk_idx < n_chunks):
        raise IndexError(f"chunk {chunk_idx} outside 0..{n_chunks - 1}")
    with open(archive, "rb") as f:
        f.seek(data_off + offs[chunk_idx])
        raw = f.read(offs[chunk_idx + 1] - offs[chunk_idx])
    want = min(chunk_size, usize - chunk_idx * chunk_size)
    return zlib.decompressobj(-15).decompress(raw, want)


def read_sozip_chunks(archive: str, member: str | None = None):
    """Parallel range decompression: a Dataset of (chunk, data) rows, each
    task inflating only its own chunks' compressed spans.  This is the
    scale payoff of the format — a 100 GB member decompresses across the
    cluster with no serial scan."""
    import ray.data as rd

    _name, _off, _csize, usize, idx = _find_member(archive, member)
    if idx is None:
        raise ValueError(f"{archive} member has no SOZip index")
    chunk_size, _offs = idx
    n_chunks = max(1, -(-usize // chunk_size)) if usize else 1
    index = pa.table({"chunk": pa.array(np.arange(n_chunks, dtype=np.int64))})

    def load(batch: pa.Table) -> pa.Table:
        outs = []
        ch = batch["chunk"].to_numpy()
        for i in ch:
            outs.append(sozip_read_chunk(archive, member, int(i)))
        return pa.table({"chunk": pa.array(ch),
                         "data": pa.array(outs, pa.binary())})

    return rd.from_arrow(index).repartition(min(n_chunks, 32)).map_batches(
        load, batch_format="pyarrow")


def sozip_optimize_from(src_archive: str, dst_archive: str,
                        member: str | None = None,
                        chunk_size: int = 32768) -> dict:
    """``gdal vsi sozip optimize``: re-encode a member of an EXISTING zip
    (seek-hostile single deflate stream) into a fresh SOZip archive
    (reference ``apps/gdalalg_vsi_sozip.cpp`` optimize subcommand).
    Returns the new archive's info dict."""
    import tempfile
    import zipfile

    with zipfile.ZipFile(src_archive) as z:
        infos = [i for i in z.infolist() if not i.is_dir()
                 and not i.filename.endswith(".sozip.idx")]
        if member is None:
            if len(infos) != 1:
                raise ValueError(f"{src_archive} has {len(infos)} members; "
                                 "name one")
            member = infos[0].filename
        data = z.read(member)
    with tempfile.NamedTemporaryFile(suffix=os.path.basename(member),
                                     delete=False) as f:
        f.write(data)
        tmp = f.name
    try:
        info = sozip_create(dst_archive, tmp, chunk_size=chunk_size,
                            arcname=member)
    finally:
        os.unlink(tmp)
    return info
