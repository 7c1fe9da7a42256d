"""AVI (RIFF) uncompressed-video codec — dependency-free reader + writer.

The video ingest analogue of ``sources/wav.py`` (same RIFF chunk grammar,
public AVI 1.0 spec): RIFF('AVI ') container, LIST('hdrl') with an 'avih'
main header and one LIST('strl') video stream ('strh' vids / 'strf'
BITMAPINFOHEADER), LIST('movi') holding one '00db' chunk per uncompressed
8-bit grayscale frame.  Frames are stored TOP-DOWN (negative biHeight, the
documented DIB convention) so frame bytes round-trip exactly.

Scope: single video stream, 8-bit gray (BI_RGB with a 256-entry implied
palette is how 8-bit DIBs are declared; palette omitted — consumers here
treat samples as luma).  Unknown chunks are skipped per spec.
"""

from __future__ import annotations

import struct

import numpy as np


def _chunk(cid: bytes, body: bytes) -> bytes:
    return cid + struct.pack("<I", len(body)) + body + (b"\x00" if len(body) % 2 else b"")


def _list(kind: bytes, body: bytes) -> bytes:
    return _chunk(b"LIST", kind + body)


_MJPG = b"MJPG"  # biCompression FOURCC for Motion-JPEG (OpenDML convention)


def encode_avi(frames: np.ndarray, fps: int = 10, codec: str = "raw",
               quality: int = 90) -> bytes:
    """(n_frames, h, w) uint8 grayscale -> AVI bytes.

    ``codec='raw'``: one uncompressed '00db' DIB chunk per frame (exact).
    ``codec='mjpeg'``: Motion-JPEG — each frame is an independent baseline
    JFIF stream (sources/jpeg.encode_baseline) in a '00dc' chunk, with
    biCompression = 'MJPG' per the OpenDML registry; the standard compressed
    intra-frame AVI payload (reference surface: frmts/jpeg + what GDAL's
    raster drivers read via VSI, as an independent from-spec codec)."""
    f = np.asarray(frames)
    if f.ndim != 3 or f.dtype != np.uint8:
        raise ValueError("expected (n, h, w) uint8 frames")
    if codec not in ("raw", "mjpeg"):
        raise ValueError(f"unknown AVI codec {codec!r}")
    n, h, w = f.shape
    if codec == "mjpeg":
        from .jpeg import encode_baseline

        payloads = [encode_baseline(f[i], quality=quality) for i in range(n)]
        cids = [b"00dc"] * n
        compression = struct.unpack("<I", _MJPG)[0]
        handler = _MJPG
    else:
        payloads = [f[i].tobytes() for i in range(n)]
        cids = [b"00db"] * n
        compression = 0
        handler = b"\x00\x00\x00\x00"
    buf_size = max(len(p) for p in payloads) if payloads else 0
    avih = struct.pack(
        "<IIIIIIIIIIIIII",
        1_000_000 // fps,        # microseconds per frame
        buf_size * fps,          # max bytes per sec
        0, 0x10,                 # padding, flags (AVIF_HASINDEX not set)
        n, 0, 1, buf_size,       # total frames, initial, streams, buf size
        w, h, 0, 0, 0, 0)
    strh = struct.pack(
        "<4s4sIHHIIIIIIIIhhhh",
        b"vids", handler, 0, 0, 0, 0,
        1, fps,                  # scale, rate -> fps
        0, n, buf_size, 0, 0, 0, 0, int(w), int(h))
    # BITMAPINFOHEADER: negative height = top-down rows (exact round trip;
    # MJPEG streams carry their own scan order so topdown applies to raw only)
    strf = struct.pack("<IiiHHIIiiII", 40, w, -h, 1, 8, compression,
                       h * w, 0, 0, 0, 0)
    hdrl = _list(b"hdrl", _chunk(b"avih", avih)
                 + _list(b"strl", _chunk(b"strh", strh) + _chunk(b"strf", strf)))
    movi = _list(b"movi", b"".join(_chunk(cid, p)
                                   for cid, p in zip(cids, payloads)))
    body = b"AVI " + hdrl + movi
    return b"RIFF" + struct.pack("<I", len(body)) + body


def _walk(buf: bytes, pos: int, end: int):
    """Yield (cid, body_start, body_size) over a chunk range."""
    while pos + 8 <= end:
        cid = buf[pos:pos + 4]
        (sz,) = struct.unpack_from("<I", buf, pos + 4)
        if pos + 8 + sz > end:
            raise ValueError(f"truncated chunk {cid!r}")
        yield cid, pos + 8, sz
        pos += 8 + sz + (sz % 2)


def decode_avi(buf: bytes) -> tuple[np.ndarray, int]:
    """AVI bytes -> ((n, h, w) uint8 frames, fps).  Validates the RIFF/AVI
    magic, stream headers (vids, 8-bit), frame-chunk sizes.  Dispatches on
    biCompression: 0 = uncompressed DIB frames, 'MJPG' = per-frame baseline
    JPEG via sources/jpeg.decode_baseline (Motion-JPEG)."""
    if len(buf) < 12 or buf[:4] != b"RIFF" or buf[8:12] != b"AVI ":
        raise ValueError("not a RIFF/AVI stream")
    w = h = None
    topdown = False
    mjpeg = False
    fps = 0
    frames = []
    for cid, start, sz in _walk(buf, 12, len(buf)):
        if cid != b"LIST":
            continue
        kind = buf[start:start + 4]
        if kind == b"hdrl":
            for c2, s2, z2 in _walk(buf, start + 4, start + sz):
                if c2 == b"LIST" and buf[s2:s2 + 4] == b"strl":
                    for c3, s3, z3 in _walk(buf, s2 + 4, s2 + z2):
                        if c3 == b"strh":
                            typ = buf[s3:s3 + 4]
                            if typ != b"vids":
                                raise ValueError(f"not a video stream: {typ!r}")
                            scale, rate = struct.unpack_from("<II", buf, s3 + 20)
                            fps = rate // max(scale, 1)
                        elif c3 == b"strf":
                            (bisize, biw, bih, _planes, bits, compression
                             ) = struct.unpack_from("<IiiHHI", buf, s3)
                            if compression == struct.unpack("<I", _MJPG)[0]:
                                mjpeg = True
                            elif compression != 0:
                                cc = struct.pack("<I", compression)
                                raise ValueError(
                                    f"unsupported AVI compression {cc!r} "
                                    f"(raw DIB and MJPG are implemented)")
                            if bits != 8:
                                raise ValueError(f"unsupported bit depth {bits}")
                            w, h = biw, abs(bih)
                            topdown = bih < 0
        elif kind == b"movi":
            for c2, s2, z2 in _walk(buf, start + 4, start + sz):
                if c2[2:4] in (b"db", b"dc"):
                    frames.append((s2, z2))
    if w is None or h is None:
        raise ValueError("missing stream format header")
    out = np.empty((len(frames), h, w), dtype=np.uint8)
    if mjpeg:
        from .jpeg import decode_baseline

        for i, (s2, z2) in enumerate(frames):
            fr = decode_baseline(bytes(buf[s2:s2 + z2]))
            if fr.ndim == 3:  # color MJPEG frame -> channel-mean luma
                fr = fr.mean(axis=2).astype(np.uint8)
            if fr.shape != (h, w):
                raise ValueError(f"frame {i} shape {fr.shape} != {(h, w)}")
            out[i] = fr
        return out, fps
    for i, (s2, z2) in enumerate(frames):
        if z2 != h * w:
            raise ValueError(f"frame {i} size {z2} != {h * w}")
        fr = np.frombuffer(buf, dtype=np.uint8, count=h * w, offset=s2
                           ).reshape(h, w)
        out[i] = fr if topdown else fr[::-1]
    return out, fps
