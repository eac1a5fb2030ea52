"""Native C++ .npy batch loader (native/npy_loader.cc) — the default
train-path IO when the .so is built (data/dataset.py native hookup).

Covers: the supported dtype matrix, npy format v1/v2 headers, >1-D shapes,
0-d scalars, rejection of fortran-order / big-endian / corrupt files (each
must yield None, not garbage), missing files, submit-ahead reuse of one
pool, and the numpy fallback of read_batch.
"""

import os

import numpy as np
import pytest

from ctts_tpu.data import native_loader


pytestmark = pytest.mark.skipif(
    not (native_loader.available() or native_loader.build()),
    reason="native loader not built and g++ unavailable")


def _roundtrip(tmp_path, arrays):
    paths = []
    for i, a in enumerate(arrays):
        p = os.path.join(tmp_path, f"a{i}.npy")
        np.save(p, a)
        paths.append(p)
    return native_loader.read_batch(paths)


@pytest.mark.parametrize("dtype", [np.float32, np.float64, np.int32,
                                   np.int64, np.uint8])
def test_dtype_matrix(tmp_path, dtype):
    a = (np.arange(60).reshape(3, 4, 5) % 7).astype(dtype)
    out = _roundtrip(str(tmp_path), [a])
    assert out[0].dtype == a.dtype and out[0].shape == a.shape
    np.testing.assert_array_equal(out[0], a)


def test_shapes_including_scalar_and_1d(tmp_path):
    arrays = [np.float32(3.5) * np.ones(()),          # 0-d
              np.arange(7, dtype=np.int64),           # 1-d (durations)
              np.random.RandomState(0).randn(80, 123).astype(np.float32)]
    out = _roundtrip(str(tmp_path), arrays)
    for got, want in zip(out, arrays):
        np.testing.assert_array_equal(got, want)


def test_npy_v2_header(tmp_path):
    # a huge header forces format 2.0 (4-byte header length)
    p = os.path.join(str(tmp_path), "v2.npy")
    a = np.arange(12, dtype=np.float32).reshape(3, 4)
    with open(p, "wb") as f:
        np.lib.format.write_array(f, a, version=(2, 0))
    out = native_loader.read_batch([p])
    np.testing.assert_array_equal(out[0], a)


def test_fortran_order_rejected(tmp_path):
    p = os.path.join(str(tmp_path), "f.npy")
    np.save(p, np.asfortranarray(np.random.rand(4, 5).astype(np.float32)))
    ok = os.path.join(str(tmp_path), "ok.npy")
    np.save(ok, np.ones(3, np.float32))
    out = native_loader.read_batch([p, ok])
    assert out[0] is None                       # refused, not transposed junk
    np.testing.assert_array_equal(out[1], np.ones(3, np.float32))


def test_big_endian_rejected(tmp_path):
    p = os.path.join(str(tmp_path), "be.npy")
    np.save(p, np.arange(4, dtype=">f4"))
    out = native_loader.read_batch([p])
    assert out[0] is None


def test_unsupported_dtype_rejected(tmp_path):
    p = os.path.join(str(tmp_path), "c.npy")
    np.save(p, np.ones(3, np.complex64))
    out = native_loader.read_batch([p])
    assert out[0] is None


def test_corrupt_and_missing_files(tmp_path):
    trunc = os.path.join(str(tmp_path), "trunc.npy")
    np.save(trunc, np.zeros((100, 100), np.float32))
    with open(trunc, "r+b") as f:
        f.truncate(512)                         # payload cut short
    not_npy = os.path.join(str(tmp_path), "not.npy")
    with open(not_npy, "wb") as f:
        f.write(b"hello world, definitely not numpy")
    missing = os.path.join(str(tmp_path), "nope.npy")
    ok = os.path.join(str(tmp_path), "ok.npy")
    np.save(ok, np.full((2, 2), 7.0, np.float32))
    out = native_loader.read_batch([trunc, not_npy, missing, ok])
    assert out[0] is None and out[1] is None and out[2] is None
    np.testing.assert_array_equal(out[3], np.full((2, 2), 7.0, np.float32))


def test_submit_ahead_pipelining(tmp_path):
    """One pool, several in-flight jobs, fetched out of submit order."""
    rng = np.random.RandomState(1)
    groups = []
    for g in range(3):
        arrays = [rng.randn(16, 8).astype(np.float32) for _ in range(6)]
        paths = []
        for i, a in enumerate(arrays):
            p = os.path.join(str(tmp_path), f"g{g}_{i}.npy")
            np.save(p, a)
            paths.append(p)
        groups.append((paths, arrays))

    pf = native_loader.NativePrefetcher(n_threads=4)
    jobs = [pf.submit(paths) for paths, _ in groups]
    for job, (_, arrays) in reversed(list(zip(jobs, groups))):
        got = pf.fetch(job)
        for g, w in zip(got, arrays):
            np.testing.assert_array_equal(g, w)


def test_numpy_fallback_matches(tmp_path, monkeypatch):
    a = np.random.RandomState(2).randn(5, 9).astype(np.float32)
    p = os.path.join(str(tmp_path), "x.npy")
    np.save(p, a)
    native = native_loader.read_batch([p])
    monkeypatch.setattr(native_loader, "_lib", None)
    fallback = native_loader.read_batch([p])
    np.testing.assert_array_equal(native[0], fallback[0])
