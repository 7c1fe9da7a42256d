"""SOZip (gdal vsi sozip; port/cpl_minizip_zip.cpp writer +
cpl_vsil_gzip.cpp reader semantics): plain-unzip compatibility, hidden
index, random chunk access, parallel read-back."""

import os
import zipfile

import numpy as np
import pytest

from gdal_ray.sources import sozip


@pytest.fixture()
def payload(tmp_path):
    rng = np.random.default_rng(21)
    # compressible but non-trivial: repeated vocab + noise, 200k
    words = [b"raster", b"vector", b"tile", b"chunk", b"zip", b"ray"]
    data = b" ".join(words[i] for i in rng.integers(0, 6, 40000))
    src = str(tmp_path / "doc.txt")
    with open(src, "wb") as f:
        f.write(data)
    return src, data


def test_create_and_plain_unzip(payload, tmp_path, ray_session):
    src, data = payload
    arch = str(tmp_path / "doc.zip")
    info = sozip.sozip_create(arch, src, chunk_size=4096)
    assert info["n_chunks"] == -(-len(data) // 4096)
    assert info["n_offsets"] == info["n_chunks"] - 1
    # a STANDARD unzip must read the member bit-exactly (crc checked by
    # zipfile) and must NOT see the hidden index member
    with zipfile.ZipFile(arch) as z:
        assert z.namelist() == ["doc.txt"]
        assert z.read("doc.txt") == data


def test_info_and_chunk_access(payload, tmp_path, ray_session):
    src, data = payload
    arch = str(tmp_path / "doc.zip")
    sozip.sozip_create(arch, src, chunk_size=4096)
    info = sozip.sozip_info(arch)
    assert info["sozip"] is True
    assert info["chunk_size"] == 4096
    n = info["n_chunks"]
    # random access: first, middle, last (short) chunk
    for i in (0, n // 2, n - 1):
        got = sozip.sozip_read_chunk(arch, None, i)
        assert got == data[i * 4096:(i + 1) * 4096]
    with pytest.raises(IndexError):
        sozip.sozip_read_chunk(arch, None, n)


def test_parallel_roundtrip(payload, tmp_path, ray_session):
    src, data = payload
    arch = str(tmp_path / "doc.zip")
    sozip.sozip_create(arch, src, chunk_size=8192, parallel=True)
    ds = sozip.read_sozip_chunks(arch)
    df = ds.to_pandas().sort_values("chunk")
    assert b"".join(df["data"]) == data


def test_small_file_single_chunk(tmp_path, ray_session):
    src = str(tmp_path / "small.bin")
    with open(src, "wb") as f:
        f.write(b"tiny payload")
    arch = str(tmp_path / "small.zip")
    info = sozip.sozip_create(arch, src, chunk_size=65536)
    assert info["n_chunks"] == 1 and info["n_offsets"] == 0
    with zipfile.ZipFile(arch) as z:
        assert z.read("small.bin") == b"tiny payload"
    assert sozip.sozip_read_chunk(arch, None, 0) == b"tiny payload"


def test_non_sozip_rejected(tmp_path, ray_session):
    arch = str(tmp_path / "plain.zip")
    with zipfile.ZipFile(arch, "w", zipfile.ZIP_DEFLATED) as z:
        z.writestr("a.txt", "hello")
    assert sozip.sozip_info(arch)["sozip"] is False
    with pytest.raises(ValueError):
        sozip.sozip_read_chunk(arch, None, 0)


def test_optimize_from_plain_zip(tmp_path, ray_session):
    import numpy as np

    rng = np.random.default_rng(5)
    words = [b"alpha", b"beta", b"gamma"]
    data = b"-".join(words[i] for i in rng.integers(0, 3, 20000))
    plain = str(tmp_path / "plain.zip")
    with zipfile.ZipFile(plain, "w", zipfile.ZIP_DEFLATED) as z:
        z.writestr("corpus.txt", data)
    assert sozip.sozip_info(plain)["sozip"] is False
    dst = str(tmp_path / "opt.zip")
    info = sozip.sozip_optimize_from(plain, dst, chunk_size=4096)
    assert info["uncompressed_size"] == len(data)
    assert sozip.sozip_info(dst)["sozip"] is True
    with zipfile.ZipFile(dst) as z:
        assert z.read("corpus.txt") == data
    got = sozip.sozip_read_chunk(dst, None, 2)
    assert got == data[2 * 4096:3 * 4096]
