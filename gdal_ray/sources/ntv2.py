"""NTv2 ``.gsb`` grid-shift file format (reader + writer).

Re-answers the reference's NTv2 datum-grid driver (``frmts/ntv2/`` +
PROJ hgridshift grids) from the PUBLIC format spec: an 11-record overview
header and an 11-record subgrid header (16-byte records: 8-byte ASCII name +
8-byte value), followed by GS_COUNT 16-byte node records of four float32
values (LAT_SHIFT, LON_SHIFT, LAT_ACC, LON_ACC) in arc-seconds.

NTv2 conventions honored here:
- longitudes are POSITIVE WEST (E_LONG/W_LONG and LON_SHIFT sign);
- node order is row-major from the south-east corner: latitude rows ascend
  south -> north, and within a row longitude advances east -> west in the
  positive-west sense.

``read_gsb`` converts back to this engine's convention (degrees east,
arc-second shifts positive east) and returns a
``functions.transformer.GridShiftTransformer`` for NUM_FILE == 1 files, or a
``MultiGridShiftTransformer`` (child subgrids take precedence inside their
extents) for multi-subgrid files.
"""

from __future__ import annotations

import struct

import numpy as np

from ..functions.transformer import GridShiftTransformer

_INT_REC = "<8si4x"
_DBL_REC = "<8sd"
_STR_REC = "<8s8s"


def _srec(name: str, val: str) -> bytes:
    return struct.pack(_STR_REC, name.ljust(8).encode(), val.ljust(8).encode()[:8])


def _irec(name: str, val: int) -> bytes:
    return struct.pack(_INT_REC, name.ljust(8).encode(), val)


def _drec(name: str, val: float) -> bytes:
    return struct.pack(_DBL_REC, name.ljust(8).encode(), val)


def _subgrid_block(t: GridShiftTransformer, name: str, parent: str) -> bytes:
    """11-record subgrid header + SE-origin node records for one subgrid."""
    ny, nx = t.slon.shape
    lat_inc = t.step * 3600.0  # header increments are in arc-seconds
    lon_inc = t.step * 3600.0
    s_lat = t.lat0 * 3600.0
    n_lat = (t.lat0 + t.step * (ny - 1)) * 3600.0
    # positive-west longitudes: east edge = -(max normal lon)
    e_long = -(t.lon0 + t.step * (nx - 1)) * 3600.0
    w_long = -t.lon0 * 3600.0
    buf = [
        _srec("SUB_NAME", name), _srec("PARENT", parent),
        _srec("CREATED", "20260101"), _srec("UPDATED", "20260101"),
        _drec("S_LAT", s_lat), _drec("N_LAT", n_lat),
        _drec("E_LONG", e_long), _drec("W_LONG", w_long),
        _drec("LAT_INC", lat_inc), _drec("LONG_INC", lon_inc),
        _irec("GS_COUNT", nx * ny),
    ]
    # node records: rows south->north, columns east->west (positive-west
    # ascending) == our columns reversed; LON_SHIFT sign flips to positive-west
    slat = np.ascontiguousarray(t.slat[:, ::-1], dtype=np.float32)
    slon = np.ascontiguousarray(-t.slon[:, ::-1], dtype=np.float32)
    acc = np.full_like(slat, -1.0)  # unknown accuracy, NTv2 sentinel
    nodes = np.stack([slat, slon, acc, acc], axis=-1).reshape(-1, 4)
    return b"".join(buf) + nodes.astype("<f4").tobytes()


def _overview_block(num_file: int) -> bytes:
    return b"".join([
        _irec("NUM_OREC", 11), _irec("NUM_SREC", 11), _irec("NUM_FILE", num_file),
        _srec("GS_TYPE", "SECONDS"), _srec("VERSION", "NTV2.0"),
        _srec("SYSTEM_F", "SRC"), _srec("SYSTEM_T", "DST"),
        _drec("MAJOR_F", 6378137.0), _drec("MINOR_F", 6356752.314),
        _drec("MAJOR_T", 6378137.0), _drec("MINOR_T", 6356752.314),
    ])


def write_gsb(path: str, t: GridShiftTransformer, name: str = "DEMOGRID") -> None:
    """Serialize a GridShiftTransformer as a single-subgrid NTv2 file."""
    with open(path, "wb") as f:
        f.write(_overview_block(1))
        f.write(_subgrid_block(t, name, "NONE"))


def write_gsb_multi(path: str, grids) -> None:
    """Serialize a multi-subgrid NTv2 file (NUM_FILE > 1).  ``grids`` is a
    list of (name, parent_name, GridShiftTransformer) with the root's parent
    'NONE' — the MultiGridShiftTransformer layout."""
    with open(path, "wb") as f:
        f.write(_overview_block(len(grids)))
        for name, parent, t in grids:
            f.write(_subgrid_block(t, name, parent))


def read_gsb(path: str) -> GridShiftTransformer:
    """Parse a single-subgrid NTv2 file into a GridShiftTransformer."""
    with open(path, "rb") as f:
        raw = f.read()

    if raw[0:8].decode(errors="replace").strip() != "NUM_OREC":
        raise ValueError("not an NTv2 file (missing NUM_OREC header record)")
    if struct.unpack_from("<i", raw, 8)[0] != 11:
        if struct.unpack_from(">i", raw, 8)[0] == 11:
            raise ValueError("big-endian NTv2 files not supported "
                             "(this reader handles little-endian only)")
        raise ValueError("malformed NTv2 header: NUM_OREC != 11")

    pos = 0
    hdr = {}
    for _ in range(11):
        name = raw[pos:pos + 8].decode().strip()
        if name in ("NUM_OREC", "NUM_SREC", "NUM_FILE", "GS_COUNT"):
            hdr[name] = struct.unpack_from("<i", raw, pos + 8)[0]
        elif name in ("MAJOR_F", "MINOR_F", "MAJOR_T", "MINOR_T"):
            hdr[name] = struct.unpack_from("<d", raw, pos + 8)[0]
        else:
            hdr[name] = raw[pos + 8:pos + 16].decode().strip()
        pos += 16
    if hdr.get("NUM_SREC") != 11:
        raise ValueError("malformed NTv2 header: NUM_SREC != 11")
    if hdr.get("GS_TYPE", "SECONDS") != "SECONDS":
        raise ValueError(f"unsupported NTv2 GS_TYPE {hdr.get('GS_TYPE')!r}: "
                         "only SECONDS grids are handled")
    num_file = hdr.get("NUM_FILE", 1)
    if num_file < 1:
        raise ValueError("malformed NTv2 header: NUM_FILE < 1")
    grids = []
    for _ in range(num_file):
        sub = {}
        for _ in range(11):
            name = raw[pos:pos + 8].decode().strip()
            if name == "GS_COUNT":
                sub[name] = struct.unpack_from("<i", raw, pos + 8)[0]
            elif name in ("S_LAT", "N_LAT", "E_LONG", "W_LONG", "LAT_INC", "LONG_INC"):
                sub[name] = struct.unpack_from("<d", raw, pos + 8)[0]
            else:
                sub[name] = raw[pos + 8:pos + 16].decode().strip()
            pos += 16
        lat_inc = sub["LAT_INC"] / 3600.0
        lon_inc = sub["LONG_INC"] / 3600.0
        ny = int(round((sub["N_LAT"] - sub["S_LAT"]) / sub["LAT_INC"])) + 1
        nx = int(round((sub["W_LONG"] - sub["E_LONG"]) / sub["LONG_INC"])) + 1
        if nx * ny != sub["GS_COUNT"]:
            raise ValueError("GS_COUNT does not match grid dimensions")
        nodes = np.frombuffer(raw, dtype="<f4", count=sub["GS_COUNT"] * 4,
                              offset=pos).reshape(ny, nx, 4)
        pos += sub["GS_COUNT"] * 16
        # back to degrees-east, arc-seconds-east
        slat = nodes[:, ::-1, 0].astype(np.float64)
        slon = -nodes[:, ::-1, 1].astype(np.float64)
        lon0 = -sub["W_LONG"] / 3600.0
        lat0 = sub["S_LAT"] / 3600.0
        if abs(lat_inc - lon_inc) > 1e-12:
            raise ValueError("anisotropic grids not supported by this transformer")
        grids.append((sub["SUB_NAME"], sub["PARENT"],
                      GridShiftTransformer(lon0, lat0, lat_inc, slon, slat)))
    if num_file == 1:
        return grids[0][2]
    from ..functions.transformer import MultiGridShiftTransformer

    return MultiGridShiftTransformer(grids)
