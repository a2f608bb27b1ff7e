"""Minimal NIfTI-1 reader/writer in pure numpy (no nibabel dependency).

The reference relies on nibabel for NIfTI I/O (nesvor/image/image.py:251-293);
this environment has no nibabel, so the format is implemented directly from
the NIfTI-1 specification. Behavior matches what the reference uses:

  * read: data scaled by scl_slope/scl_inter, affine = sform if
    sform_code > 0 else qform if qform_code > 0 else pixdim-diagonal;
    NaN-affine falls back to the qform (reference image.py:288-290).
  * write: float32 data, qform ("aligned", code 2) and sform ("scanner",
    code 1) both set from the affine, xyzt units = mm
    (reference image.py:251-271 sets xyzt_units=2, qform aligned, sform scanner).

Supports .nii and .nii.gz.
"""

from __future__ import annotations

import gzip
from typing import Optional, Tuple

import numpy as np

_DTYPES = {
    2: np.uint8,
    4: np.int16,
    8: np.int32,
    16: np.float32,
    64: np.float64,
    256: np.int8,
    512: np.uint16,
    768: np.uint32,
    1024: np.int64,
    1280: np.uint64,
}

_HEADER_SIZE = 348


def _open(path: str, mode: str):
    if path.endswith(".gz"):
        return gzip.open(path, mode)
    return open(path, mode)


def _quaternion_from_rotation(R: np.ndarray) -> Tuple[float, float, float, float]:
    """Rotation matrix -> (a, b, c, d) quaternion, a >= 0 (NIfTI convention)."""
    t = np.trace(R)
    if t > 0:
        s = np.sqrt(t + 1.0) * 2
        a = 0.25 * s
        b = (R[2, 1] - R[1, 2]) / s
        c = (R[0, 2] - R[2, 0]) / s
        d = (R[1, 0] - R[0, 1]) / s
    elif R[0, 0] > R[1, 1] and R[0, 0] > R[2, 2]:
        s = np.sqrt(1.0 + R[0, 0] - R[1, 1] - R[2, 2]) * 2
        a = (R[2, 1] - R[1, 2]) / s
        b = 0.25 * s
        c = (R[0, 1] + R[1, 0]) / s
        d = (R[0, 2] + R[2, 0]) / s
    elif R[1, 1] > R[2, 2]:
        s = np.sqrt(1.0 + R[1, 1] - R[0, 0] - R[2, 2]) * 2
        a = (R[0, 2] - R[2, 0]) / s
        b = (R[0, 1] + R[1, 0]) / s
        c = 0.25 * s
        d = (R[1, 2] + R[2, 1]) / s
    else:
        s = np.sqrt(1.0 + R[2, 2] - R[0, 0] - R[1, 1]) * 2
        a = (R[1, 0] - R[0, 1]) / s
        b = (R[0, 2] + R[2, 0]) / s
        c = (R[1, 2] + R[2, 1]) / s
        d = 0.25 * s
    if a < 0:
        a, b, c, d = -a, -b, -c, -d
    return float(a), float(b), float(c), float(d)


def _qform_affine(hdr: dict) -> np.ndarray:
    b, c, d = hdr["quatern_b"], hdr["quatern_c"], hdr["quatern_d"]
    a2 = 1.0 - (b * b + c * c + d * d)
    a = np.sqrt(max(a2, 0.0))
    R = np.array(
        [
            [a * a + b * b - c * c - d * d, 2 * (b * c - a * d), 2 * (b * d + a * c)],
            [2 * (b * c + a * d), a * a + c * c - b * b - d * d, 2 * (c * d - a * b)],
            [2 * (b * d - a * c), 2 * (c * d + a * b), a * a + d * d - b * b - c * c],
        ]
    )
    qfac = hdr["pixdim"][0]
    if qfac == 0:
        qfac = 1.0
    scale = np.array([hdr["pixdim"][1], hdr["pixdim"][2], hdr["pixdim"][3] * qfac])
    affine = np.eye(4)
    affine[:3, :3] = R * scale[None, :]
    affine[:3, 3] = [hdr["qoffset_x"], hdr["qoffset_y"], hdr["qoffset_z"]]
    return affine


def _parse_header(raw: bytes) -> dict:
    def u(fmt, off):
        return np.frombuffer(raw, dtype=fmt, count=1, offset=off)[0]

    hdr = {
        "sizeof_hdr": int(u("<i4", 0)),
        "dim": np.frombuffer(raw, dtype="<i2", count=8, offset=40).astype(int),
        "datatype": int(u("<i2", 70)),
        "bitpix": int(u("<i2", 72)),
        "pixdim": np.frombuffer(raw, dtype="<f4", count=8, offset=76).astype(float),
        "vox_offset": float(u("<f4", 108)),
        "scl_slope": float(u("<f4", 112)),
        "scl_inter": float(u("<f4", 116)),
        "qform_code": int(u("<i2", 252)),
        "sform_code": int(u("<i2", 254)),
        "quatern_b": float(u("<f4", 256)),
        "quatern_c": float(u("<f4", 260)),
        "quatern_d": float(u("<f4", 264)),
        "qoffset_x": float(u("<f4", 268)),
        "qoffset_y": float(u("<f4", 272)),
        "qoffset_z": float(u("<f4", 276)),
        "srow_x": np.frombuffer(raw, dtype="<f4", count=4, offset=280).astype(float),
        "srow_y": np.frombuffer(raw, dtype="<f4", count=4, offset=296).astype(float),
        "srow_z": np.frombuffer(raw, dtype="<f4", count=4, offset=312).astype(float),
        "magic": raw[344:348],
    }
    if hdr["sizeof_hdr"] != _HEADER_SIZE:
        raise ValueError("Not a NIfTI-1 file (sizeof_hdr != 348); NIfTI-2 unsupported")
    return hdr


def read_nifti(path: str) -> Tuple[np.ndarray, np.ndarray, np.ndarray, dict]:
    """Returns (data in file (x,y,z,...) Fortran order, pixdim[1:4], affine, header)."""
    from ..native import cast_f32 as _native_cast, read_file as _native_read

    raw = _native_read(path)  # C++ zlib inflate; None -> python gzip
    if raw is None:
        with _open(path, "rb") as f:
            raw = f.read()
    hdr = _parse_header(raw)
    ndim = hdr["dim"][0]
    shape = tuple(int(s) for s in hdr["dim"][1 : 1 + ndim])
    dtype = _DTYPES.get(hdr["datatype"])
    if dtype is None:
        raise ValueError(f"Unsupported NIfTI datatype {hdr['datatype']}")
    offset = int(hdr["vox_offset"]) if hdr["vox_offset"] else 352
    count = int(np.prod(shape))
    slope, inter = hdr["scl_slope"], hdr["scl_inter"]
    do_scale = (
        slope not in (0.0,) and np.isfinite(slope) and (slope != 1.0 or inter != 0.0)
    )
    data = _native_cast(  # multithreaded C++ cast+scale; None -> numpy
        raw,
        offset,
        int(hdr["datatype"]),
        count,
        float(slope) if do_scale else 1.0,
        float(inter) if do_scale else 0.0,
    )
    if data is not None:
        data = data.reshape(shape, order="F")
    else:
        data = np.frombuffer(
            raw, dtype=np.dtype(dtype).newbyteorder("<"), count=count, offset=offset
        )
        data = data.reshape(shape, order="F").astype(np.float32)
        if do_scale:
            data = data * np.float32(slope) + np.float32(inter)

    # affine selection mirrors nibabel's get-affine logic used by the reference
    if hdr["sform_code"] > 0:
        affine = np.eye(4)
        affine[0] = hdr["srow_x"]
        affine[1] = hdr["srow_y"]
        affine[2] = hdr["srow_z"]
    elif hdr["qform_code"] > 0:
        affine = _qform_affine(hdr)
    else:
        affine = np.diag(list(hdr["pixdim"][1:4]) + [1.0])
    if np.any(np.isnan(affine)):
        affine = _qform_affine(hdr)

    pixdim = np.asarray(hdr["pixdim"][1:4], dtype=np.float32)
    return data, pixdim, affine, hdr


def write_nifti(
    path: str,
    data_xyz: np.ndarray,
    affine: Optional[np.ndarray] = None,
    qform_code: int = 2,
    sform_code: int = 1,
) -> None:
    """Write float32 NIfTI-1 with qform+sform set from ``affine``.

    ``data_xyz`` is indexed (x, y, z) (Fortran/file order), matching the
    output of :func:`read_nifti`.
    """
    data_xyz = np.asarray(data_xyz, dtype=np.float32)
    if affine is None:
        affine = np.eye(4)
    affine = np.asarray(affine, dtype=np.float64)

    ndim = data_xyz.ndim
    dim = np.ones(8, dtype="<i2")
    dim[0] = ndim
    dim[1 : 1 + ndim] = data_xyz.shape

    # voxel sizes from the affine columns
    pixdim = np.zeros(8, dtype="<f4")
    R = affine[:3, :3]
    zooms = np.sqrt((R**2).sum(axis=0))
    zooms[zooms == 0] = 1.0
    pixdim[1:4] = zooms[:3]
    if ndim > 3:
        pixdim[4 : 1 + ndim] = 1.0

    # qform: orthonormalize R, handle negative determinant with qfac
    Rn = R / zooms[None, :]
    # closest orthogonal matrix via SVD
    u, _, vt = np.linalg.svd(Rn)
    P = u @ vt
    qfac = 1.0
    if np.linalg.det(P) < 0:
        P[:, 2] *= -1
        qfac = -1.0
    a, b, c, d = _quaternion_from_rotation(P)
    pixdim[0] = qfac

    hdr = bytearray(_HEADER_SIZE)

    def put(fmt, off, values):
        arr = np.asarray(values, dtype=fmt)
        hdr[off : off + arr.nbytes] = arr.tobytes()

    put("<i4", 0, [_HEADER_SIZE])
    hdr[39] = 114  # dim_info: none; regular byte 'r'
    put("<i2", 40, dim)
    put("<i2", 70, [16])  # float32
    put("<i2", 72, [32])  # bitpix
    put("<f4", 76, pixdim)
    put("<f4", 108, [352.0])  # vox_offset
    put("<f4", 112, [1.0])  # scl_slope
    put("<f4", 116, [0.0])  # scl_inter
    hdr[123] = 2  # xyzt_units: mm (reference image.py:266 set_xyzt_units(2))
    put("<i2", 252, [qform_code])
    put("<i2", 254, [sform_code])
    put("<f4", 256, [b, c, d])
    put("<f4", 268, list(affine[:3, 3]))
    put("<f4", 280, affine[0, :])
    put("<f4", 296, affine[1, :])
    put("<f4", 312, affine[2, :])
    hdr[344:348] = b"n+1\x00"

    body = bytes(hdr) + b"\x00" * 4 + data_xyz.tobytes(order="F")
    with _open(path, "wb") as f:
        f.write(body)
