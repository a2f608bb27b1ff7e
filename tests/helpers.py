"""Shared test fixtures (port of the reference test strategy, SURVEY.md §4).

The SE(3) fixture reproduces the reference's 11-case set
(tests/__init__.py:17-39) with scipy ``Rotation`` as the oracle, including
near-pi and gimbal-edge rotations.
"""

import numpy as np
from scipy.spatial.transform import Rotation


def assert_close(actual, desired, atol=1e-5, rtol=1.3e-6, msg=""):
    np.testing.assert_allclose(
        np.asarray(actual), np.asarray(desired), atol=atol, rtol=rtol, err_msg=msg
    )


def get_transform_test_data():
    """Returns list of (axisangle (1,6) float32, matrix (1,3,4) float32)."""

    def scipy_axisangle2mat(ax):
        mat = Rotation.from_rotvec(ax[:, :3]).as_matrix().astype(np.float32)
        return np.concatenate([mat, ax[:, 3:, None]], -1)

    ax_list = [
        [0, 0, 0, 0, 0, 0],
        [np.pi / 2, 0, 0, 1, 2, 3],
        [0, -np.pi / 2, 0, -1.1, -10, 100.5],
        [0, 0, np.pi - 0.01, 2, 1, 10.5],
        [0, -np.pi + 0.01, 0, 2, 1, 10.5],
        [0.1, 0.1, 0.1, 0.1, 0.1, 0.1],
        [-0.1, 0, -0.4, 0.1, 0.5, 0.1],
        [-0.2, 0.2, -0.1, -100, 200, -159],
        [-0.12, -0.01, 0.1, -100, 200, -159],
        [np.pi / 4, np.pi / 4, np.pi / 4, 0.1, 0.1, 0.1],
        [np.pi / 3, -np.pi / 4, np.pi / 5, 100, 200, -300],
    ]
    ax_arr = [np.array([a], dtype=np.float32) for a in ax_list]
    return [(a, scipy_axisangle2mat(a)) for a in ax_arr]
