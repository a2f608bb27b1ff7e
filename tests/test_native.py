"""Native (C++) data-pipeline tests: results must be bit-identical to the
numpy fallbacks. Skipped when the library cannot be built (no g++)."""

import os

import numpy as np
import pytest

from nesvor_tpu import native


requires_native = pytest.mark.skipif(
    native.get_lib() is None, reason="native library unavailable"
)


@requires_native
def test_read_file_matches_gzip(tmp_path):
    import gzip

    payload = np.random.default_rng(0).bytes(1 << 20)
    p = str(tmp_path / "x.bin.gz")
    with gzip.open(p, "wb") as f:
        f.write(payload)
    assert native.read_file(p) == payload
    # uncompressed passthrough
    p2 = str(tmp_path / "x.bin")
    with open(p2, "wb") as f:
        f.write(payload)
    assert native.read_file(p2) == payload


@requires_native
def test_cast_f32_matches_numpy():
    rng = np.random.default_rng(1)
    for dtype, code in [(np.int16, 4), (np.uint8, 2), (np.float64, 64)]:
        arr = rng.integers(0, 200, size=100001).astype(dtype)
        raw = b"HDR!" + arr.tobytes()
        got = native.cast_f32(raw, 4, code, arr.size, 2.5, -1.0)
        want = arr.astype(np.float32) * np.float32(2.5) + np.float32(-1.0)
        np.testing.assert_array_equal(got, want)
        got_noscale = native.cast_f32(raw, 4, code, arr.size, 1.0, 0.0)
        np.testing.assert_array_equal(got_noscale, arr.astype(np.float32))


@requires_native
def test_pixel_bag_matches_numpy():
    rng = np.random.default_rng(2)
    img = rng.normal(size=(1, 37, 53)).astype(np.float32)
    msk = rng.random((1, 37, 53)) > 0.6
    res = np.asarray([1.5, 2.0, 3.0], np.float32)
    xyz, v = native.pixel_bag(img, msk, res)

    kji = np.stack(np.nonzero(msk), -1)[:, ::-1].astype(np.float32)
    shape_xyz = np.asarray(img.shape[::-1])
    want_xyz = (kji - (shape_xyz - 1) / 2) * res
    want_v = img[msk]
    np.testing.assert_array_equal(xyz, want_xyz.astype(np.float32))
    np.testing.assert_array_equal(v, want_v)


@requires_native
def test_nifti_roundtrip_through_native(tmp_path):
    """read_nifti uses the native inflate+cast path; values must round-trip."""
    from nesvor_tpu.image.nifti import read_nifti, write_nifti

    rng = np.random.default_rng(3)
    data = rng.normal(size=(11, 13, 7)).astype(np.float32)
    affine = np.eye(4)
    affine[:3, 3] = [1.0, -2.0, 3.0]
    p = str(tmp_path / "v.nii.gz")
    write_nifti(p, data, affine)
    got, pixdim, aff, hdr = read_nifti(p)
    np.testing.assert_allclose(np.asarray(got), data, rtol=0, atol=0)
    np.testing.assert_allclose(aff, affine, atol=1e-5)
