"""Image I/O round-trip tests (port of reference tests/image/test_image.py:39-89),
exercising the from-scratch NIfTI-1 reader/writer."""

import os
import shutil

import jax.numpy as jnp
import numpy as np
import pytest

from nesvor_tpu.image import Slice, Volume, load_slices, load_volume, save_slices
from nesvor_tpu.transform import RigidTransform
from tests.helpers import assert_close, get_transform_test_data


def get_image_test_data(is_volume=False):
    data = []
    for i, (ax, _) in enumerate(get_transform_test_data()):
        transformation = RigidTransform(jnp.asarray(ax), trans_first=i % 2 == 1)
        image = jnp.full(
            ((128 - i) if is_volume else 1, 128 + i, 256 + i), i, dtype=jnp.float32
        )
        rx, ry, rz = 0.5 + 0.1 * i, 0.5 + 0.2 * i, 0.5 + 0.3 * i
        C = Volume if is_volume else Slice
        s = C(image, None, transformation, rx, ry, rz)
        data.append(
            {
                "object": s,
                "image": image,
                "transformation": transformation,
                "resolution_x": rx,
                "resolution_y": ry,
                "resolution_z": rz,
            }
        )
    return data


def test_save_load_slices(tmp_path):
    folder = str(tmp_path / "slices")
    os.makedirs(folder)
    data = get_image_test_data(is_volume=False)
    save_slices(folder, [dat["object"] for dat in data])
    slices = load_slices(folder)
    assert len(slices) == len(data)
    for i in range(len(data)):
        s = slices[i]
        dat = data[i]
        assert abs(dat["resolution_x"] - s.resolution_x) < 1e-3
        assert abs(dat["resolution_y"] - s.resolution_y) < 1e-3
        assert abs(dat["resolution_z"] - s.resolution_z) < 1e-3
        assert_close(
            dat["transformation"].axisangle(),
            s.transformation.axisangle(),
            atol=1e-4,
            rtol=1e-3,
        )
        assert_close(dat["image"], s.image, atol=1e-5, rtol=1e-5)
    shutil.rmtree(folder)


@pytest.mark.slow
def test_save_load_volume(tmp_path):
    folder = str(tmp_path / "vols")
    os.makedirs(folder)
    data = get_image_test_data(is_volume=True)
    for i in range(len(data)):
        v = data[i]["object"]
        path = os.path.join(folder, "%d.nii.gz" % i)
        v.save(path)
        v_ = load_volume(path)
        assert abs(v_.resolution_x - v.resolution_x) < 1e-3
        assert abs(v_.resolution_y - v.resolution_y) < 1e-3
        assert abs(v_.resolution_z - v.resolution_z) < 1e-3
        assert_close(
            v_.transformation.axisangle(),
            v.transformation.axisangle(),
            atol=1e-4,
            rtol=1e-3,
        )
        assert_close(v_.image, v.image, atol=1e-5, rtol=1e-5)
    shutil.rmtree(folder)


def test_nifti_header_fields(tmp_path):
    """The writer must produce a header a NaN-affine reader can fall back on:
    qform == sform == affine."""
    from nesvor_tpu.image.nifti import read_nifti, write_nifti

    rng = np.random.default_rng(0)
    data = rng.normal(size=(7, 6, 5)).astype(np.float32)
    # a rigid affine with anisotropic zooms
    from scipy.spatial.transform import Rotation

    R = Rotation.from_rotvec([0.3, -0.2, 0.5]).as_matrix()
    affine = np.eye(4)
    affine[:3, :3] = R @ np.diag([0.8, 1.1, 2.5])
    affine[:3, 3] = [4.0, -3.0, 7.5]
    path = str(tmp_path / "t.nii.gz")
    write_nifti(path, data, affine)
    data2, pixdim, affine2, hdr = read_nifti(path)
    assert_close(data2, data, atol=0, rtol=0)
    assert_close(pixdim, [0.8, 1.1, 2.5], atol=1e-5, rtol=1e-5)
    assert_close(affine2, affine, atol=1e-5, rtol=1e-5)
    # qform fallback reproduces the same affine for rigid+zooms affines
    from nesvor_tpu.image.nifti import _qform_affine

    assert_close(_qform_affine(hdr), affine, atol=1e-4, rtol=1e-4)


def test_xyz_masked_host_path_matches_device_transform():
    """xyz_masked is computed fully host-side (per-mask-count device
    programs cost a fresh remote compile each reconstruct); it must equal
    the straightforward device transform_points formulation."""
    from nesvor_tpu.transform import transform_points

    rng = np.random.default_rng(0)
    for i, (ax, _) in enumerate(get_transform_test_data()[:4]):
        t = RigidTransform(jnp.asarray(ax[:1]), trans_first=i % 2 == 1)
        img = jnp.asarray(rng.normal(size=(9, 11, 13)).astype(np.float32))
        mask = jnp.asarray(rng.random((9, 11, 13)) > 0.5)
        vol = Volume(img, mask, t, 0.7, 0.9, 1.1)
        # must stay a NUMPY array: any eager device op at the
        # count-dependent (n_masked, 3) shape (even ravel/slice) compiles
        # a fresh remote program per distinct mask count
        assert isinstance(vol.xyz_masked, np.ndarray)
        got = np.asarray(vol.xyz_masked)
        want = np.asarray(
            transform_points(t, vol.xyz_masked_untransformed)
        )
        assert got.shape == want.shape == (int(np.asarray(mask).sum()), 3)
        assert_close(got, want, atol=1e-4, rtol=1e-4)


def test_resample_host_matches_device():
    """Volume.resample(host=True) is the numpy twin of the jitted resample
    (sample_volume uses it for the occupancy mask so no remote compile is
    paid); both paths must agree on shape, affine, and values."""
    rng = np.random.default_rng(1)
    for i, (ax, _) in enumerate(get_transform_test_data()[:3]):
        t = RigidTransform(jnp.asarray(ax[:1]), trans_first=i % 2 == 1)
        img = jnp.asarray(np.abs(rng.normal(size=(12, 14, 10))).astype(np.float32))
        mask = jnp.asarray(rng.random((12, 14, 10)) > 0.3)
        vol = Volume(img, mask, t, 0.8, 1.0, 1.2)
        for res_new in (0.9, 1.5):
            dev = vol.resample(res_new, None)
            host = vol.resample(res_new, None, host=True)
            assert host.image.shape == dev.image.shape
            assert_close(
                host.transformation.matrix(),
                dev.transformation.matrix(),
                atol=1e-4,
                rtol=1e-4,
            )
            assert_close(host.image, dev.image, atol=1e-4, rtol=1e-3)
            # mask = v > 0 can flip at fade-out-band voxels where the true
            # value is ~0 and fp noise crosses the threshold; require
            # agreement wherever the value is decisively nonzero
            decisive = np.asarray(jnp.abs(dev.image)) > 1e-4
            assert bool(
                np.all(np.asarray(host.mask)[decisive] == np.asarray(dev.mask)[decisive])
            )
