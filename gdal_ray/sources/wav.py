"""WAV (RIFF PCM) audio codec — dependency-free reader + writer.

Role model: the audio ingest step of a multimodal pipeline (the reference's
driver-decode analogue: any frmts/ codec).  Independent implementation from
the public RIFF/WAVE spec: RIFF/WAVE container, 'fmt ' chunk (PCM format 1,
mono/stereo, 8-bit unsigned or 16-bit signed little-endian), 'data' chunk;
unknown chunks are skipped per spec.  Full header validation so corrupted
payloads fail loudly in the decode pool rather than producing garbage
features.
"""

from __future__ import annotations

import struct

import numpy as np


def encode_wav(samples: np.ndarray, rate: int = 8000) -> bytes:
    """Serialize mono PCM samples: uint8 -> 8-bit unsigned WAV, int16 ->
    16-bit signed little-endian WAV."""
    a = np.asarray(samples).ravel()
    if a.dtype == np.uint8:
        bits, data = 8, a.tobytes()
    elif a.dtype == np.int16:
        bits, data = 16, a.astype("<i2").tobytes()
    else:
        raise ValueError(f"unsupported sample dtype {a.dtype} (uint8/int16)")
    block = bits // 8
    fmt = struct.pack("<HHIIHH", 1, 1, rate, rate * block, block, bits)
    chunks = (b"WAVE"
              + b"fmt " + struct.pack("<I", len(fmt)) + fmt
              + b"data" + struct.pack("<I", len(data)) + data
              + (b"\x00" if len(data) % 2 else b""))
    return b"RIFF" + struct.pack("<I", len(chunks)) + chunks


def decode_wav(buf: bytes) -> tuple[np.ndarray, int]:
    """Parse a mono PCM WAV -> (samples, rate).  8-bit -> uint8, 16-bit ->
    int16.  Validates the RIFF/WAVE magic, chunk sizes, PCM format code,
    channel count, and data-chunk bounds."""
    if len(buf) < 12 or buf[:4] != b"RIFF" or buf[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE stream")
    (riff_size,) = struct.unpack_from("<I", buf, 4)
    if riff_size + 8 > len(buf) + 1:  # +1: tolerate the odd-pad byte
        raise ValueError("RIFF size exceeds payload")
    pos = 12
    fmt = None
    data = None
    while pos + 8 <= len(buf):
        cid = buf[pos:pos + 4]
        (sz,) = struct.unpack_from("<I", buf, pos + 4)
        body = buf[pos + 8:pos + 8 + sz]
        if len(body) < sz:
            raise ValueError(f"truncated chunk {cid!r}")
        if cid == b"fmt ":
            if sz < 16:
                raise ValueError("fmt chunk too short")
            fmt = struct.unpack_from("<HHIIHH", body, 0)
        elif cid == b"data":
            data = body
        pos += 8 + sz + (sz % 2)  # chunks are word-aligned
    if fmt is None or data is None:
        raise ValueError("missing fmt / data chunk")
    audio_fmt, channels, rate, _byte_rate, _block, bits = fmt
    if audio_fmt != 1:
        raise ValueError(f"not PCM (format {audio_fmt})")
    if channels != 1:
        raise ValueError(f"only mono supported (got {channels} channels)")
    if bits == 8:
        return np.frombuffer(data, dtype=np.uint8), rate
    if bits == 16:
        if len(data) % 2:
            raise ValueError("odd 16-bit data length")
        return np.frombuffer(data, dtype="<i2").astype(np.int16), rate
    raise ValueError(f"unsupported bit depth {bits}")
