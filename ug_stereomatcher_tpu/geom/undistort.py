"""Plumb-bob lens distortion utilities.

The reference loads five-coefficient plumb_bob distortion vectors with its
calibrations (calL.xml D matrix; distortion_model tag) but never applies
them — its pipeline assumes pre-undistorted captures.  This module
completes the calibration story: forward distortion of normalised points
and iterative undistortion (the standard fixed-point inverse), both
vectorised and jit-safe.
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp


def distort_normalized(x: jnp.ndarray, y: jnp.ndarray, D) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Apply plumb_bob (k1, k2, p1, p2, k3) distortion to normalised
    camera coordinates."""
    D = jnp.asarray(D)
    k1, k2, p1, p2, k3 = (D[0], D[1], D[2], D[3], D[4])
    r2 = x * x + y * y
    radial = 1.0 + r2 * (k1 + r2 * (k2 + r2 * k3))
    xd = x * radial + 2.0 * p1 * x * y + p2 * (r2 + 2.0 * x * x)
    yd = y * radial + p1 * (r2 + 2.0 * y * y) + 2.0 * p2 * x * y
    return xd, yd


def undistort_pixels(u: jnp.ndarray, v: jnp.ndarray, K, D,
                     iterations: int = 8) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Undistort pixel coordinates by fixed-point inversion of the
    plumb_bob model.  u, v: pixel arrays; K: 3x3 intrinsics; D: (5,).
    Returns undistorted pixel coordinates on the same intrinsic grid."""
    K = jnp.asarray(K)
    fx, fy = K[0, 0], K[1, 1]
    cx, cy = K[0, 2], K[1, 2]
    xd = (u - cx) / fx
    yd = (v - cy) / fy
    x, y = xd, yd
    for _ in range(iterations):
        xdh, ydh = distort_normalized(x, y, D)
        x = x + (xd - xdh)
        y = y + (yd - ydh)
    return x * fx + cx, y * fy + cy
