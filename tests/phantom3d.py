"""3-D ellipsoid phantoms (modified Shepp-Logan / Yu-Ye-Wang) for tests.

Independent vectorized implementation of the classic 3-D Shepp-Logan
phantom; ellipsoid tables are the published constants (Toft 1996 pp.
199-200; Yu, Ye & Wang 2004). Semantics match the generator used by the
reference test-suite (tests/phantom3d.py), including its quirk of
evaluating on an (n-1)^3 grid and packing the result into the first
(n-1)^3 entries of a flat n^3 buffer — that layout defines the ground
truth the CG-SRR recovery test is calibrated against.
"""

import numpy as np

# columns: A, a, b, c, x0, y0, z0, phi, theta, psi (angles in degrees)
_MODIFIED_SHEPP_LOGAN = np.array(
    [
        [1.00, 0.6900, 0.920, 0.810, 0.00, 0.0000, 0.00, 0, 0, 0],
        [-0.80, 0.6624, 0.874, 0.780, 0.00, -0.0184, 0.00, 0, 0, 0],
        [-0.20, 0.1100, 0.310, 0.220, 0.22, 0.0000, 0.00, -18, 0, 10],
        [-0.20, 0.1600, 0.410, 0.280, -0.22, 0.0000, 0.00, 18, 0, 10],
        [0.10, 0.2100, 0.250, 0.410, 0.00, 0.3500, -0.15, 0, 0, 0],
        [0.10, 0.0460, 0.046, 0.050, 0.00, 0.1000, 0.25, 0, 0, 0],
        [0.10, 0.0460, 0.046, 0.050, 0.00, -0.1000, 0.25, 0, 0, 0],
        [0.10, 0.0460, 0.023, 0.050, -0.08, -0.6050, 0.00, 0, 0, 0],
        [0.10, 0.0230, 0.023, 0.020, 0.00, -0.6060, 0.00, 0, 0, 0],
        [0.10, 0.0230, 0.046, 0.020, 0.06, -0.6050, 0.00, 0, 0, 0],
    ]
)

_SHEPP_LOGAN_A = np.array(
    [1, -0.98, -0.02, -0.02, 0.01, 0.01, 0.01, 0.01, 0.01, 0.01]
)

_YU_YE_WANG = np.array(
    [
        [1.00, 0.6900, 0.920, 0.900, 0.00, 0.000, 0.000, 0, 0, 0],
        [-0.80, 0.6624, 0.874, 0.880, 0.00, 0.000, 0.000, 0, 0, 0],
        [-0.20, 0.4100, 0.160, 0.210, -0.22, 0.000, -0.250, 108, 0, 0],
        [-0.20, 0.3100, 0.110, 0.220, 0.22, 0.000, -0.250, 72, 0, 0],
        [0.20, 0.2100, 0.250, 0.500, 0.00, 0.350, -0.250, 0, 0, 0],
        [0.20, 0.0460, 0.046, 0.046, 0.00, 0.100, -0.250, 0, 0, 0],
        [0.10, 0.0460, 0.023, 0.020, -0.08, -0.650, -0.250, 0, 0, 0],
        [0.10, 0.0460, 0.023, 0.020, 0.06, -0.650, -0.250, 90, 0, 0],
        [0.20, 0.0560, 0.040, 0.100, 0.06, -0.105, 0.625, 90, 0, 0],
        [-0.20, 0.0560, 0.056, 0.100, 0.00, 0.100, 0.625, 0, 0, 0],
    ]
)


def _euler_zxz(phi_deg, theta_deg, psi_deg):
    """Rotation used by the classic phantom definition (z-x-z Euler)."""
    phi, theta, psi = np.deg2rad([phi_deg, theta_deg, psi_deg])
    cphi, sphi = np.cos(phi), np.sin(phi)
    cth, sth = np.cos(theta), np.sin(theta)
    cpsi, spsi = np.cos(psi), np.sin(psi)
    return np.array(
        [
            [
                cpsi * cphi - cth * sphi * spsi,
                cpsi * sphi + cth * cphi * spsi,
                spsi * sth,
            ],
            [
                -spsi * cphi - cth * sphi * cpsi,
                -spsi * sphi + cth * cphi * cpsi,
                cpsi * sth,
            ],
            [sth * sphi, -sth * cphi, cth],
        ]
    )


def phantom3d(phantom: str = "modified-shepp-logan", n: int = 64) -> np.ndarray:
    if phantom == "modified-shepp-logan":
        table = _MODIFIED_SHEPP_LOGAN
    elif phantom == "shepp_logan":
        table = _MODIFIED_SHEPP_LOGAN.copy()
        table[:, 0] = _SHEPP_LOGAN_A
    elif phantom == "yu_ye_wang":
        table = _YU_YE_WANG
    else:
        raise TypeError('phantom type "%s" not recognized' % phantom)

    rng = (np.arange(0, n - 1) - (n - 1) / 2) / ((n - 1) / 2)
    x, y, z = np.meshgrid(rng, rng, rng)
    coord = np.stack([x.ravel(), y.ravel(), z.ravel()], axis=0)

    vals = np.zeros(coord.shape[1])
    for row in table:
        A = row[0]
        axes_sq = row[1:4] ** 2
        center = row[4:7]
        alpha = _euler_zxz(row[7], row[8], row[9])
        cp = alpha @ coord
        d = cp - center[:, None]
        inside = (d[0] ** 2 / axes_sq[0] + d[1] ** 2 / axes_sq[1] + d[2] ** 2 / axes_sq[2]) <= 1
        vals[inside] += A

    out = np.zeros(n**3)
    out[: vals.size] = vals
    return out.reshape((n, n, n))
