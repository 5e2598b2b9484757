"""Closed-form two-view triangulation, vectorised.

Reproduces the reference's symbolic least-squares intersection
(get3DPoint, getPointCloud.cpp:886-949): P1 is assumed axis-aligned (only
rows 0/1 of its left 3x3 used, zero skew), while P2 is the *full* 3x4
projection of the verged right camera.  The reference runs this per pixel in
a scalar C++ loop with an ASCII progress bar; here it is a single fused XLA
elementwise computation over whole disparity maps.
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp
import numpy as np


def _coeffs(P1, P2, x1, y1, x2, y2):
    """Coefficient fields a..j, x, y of getPointCloud.cpp:917-928."""
    a = P1[0, 0]
    b = P1[0, 2] - x1
    c = P1[1, 1]
    d = P1[1, 2] - y1
    e = P2[0, 0] - x2 * P2[2, 0]
    f = P2[0, 1] - x2 * P2[2, 1]
    g = P2[0, 2] - x2 * P2[2, 2]
    h = P2[1, 0] - y2 * P2[2, 0]
    i = P2[1, 1] - y2 * P2[2, 1]
    j = P2[1, 2] - y2 * P2[2, 2]
    x = x2 * P2[2, 3] - P2[0, 3]
    y = y2 * P2[2, 3] - P2[1, 3]
    return a, b, c, d, e, f, g, h, i, j, x, y


def triangulate_points(P1, P2, x1, y1, x2, y2) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Triangulate matched pixel fields (x1,y1) <-> (x2,y2).

    P1, P2: (3,4) projection matrices.  x1..y2: broadcastable float arrays.
    Returns (X, Y, Z) in the left-camera frame — the closed-form solution of
    getPointCloud.cpp:930-947."""
    P1 = jnp.asarray(P1)
    P2 = jnp.asarray(P2)
    a, b, c, d, e, f, g, h, i, j, x, y = _coeffs(P1, P2, x1, y1, x2, y2)

    x_up = ((d * f * h - c * g * h - d * e * i + c * e * j)
            * (-(d * i * x) + c * j * x + d * f * y - c * g * y)
            + b ** 2 * ((f * h - e * i) * (-(i * x) + f * y)
                        + c ** 2 * (e * x + h * y))
            + a * b * ((-(g * i) + f * j) * (i * x - f * y)
                       + c * d * (f * x + i * y)
                       - c ** 2 * (g * x + j * y)))
    y_up = ((b ** 2 * (f * h - e * i)
             + d * (d * f * h - c * g * h - d * e * i + c * e * j))
            * (h * x - e * y)
            + a * b * ((c * d * e + g * h * i - 2.0 * f * h * j + e * i * j) * x
                       + (c * d * h + f * g * h - 2.0 * e * g * i + e * f * j) * y)
            + a ** 2 * ((g * i - f * j) * (-(j * x) + g * y)
                        + d ** 2 * (f * x + i * y)
                        - c * d * (g * x + j * y)))
    z_up = (c * (-(d * f * h) + c * g * h + d * e * i - c * e * j)
            * (h * x - e * y)
            - a * b * ((f * h - e * i) * (-(i * x) + f * y)
                       + c ** 2 * (e * x + h * y))
            + a ** 2 * ((g * i - f * j) * (i * x - f * y)
                        - c * d * (f * x + i * y)
                        + c ** 2 * (g * x + j * y)))
    divisor = (b ** 2 * (c ** 2 * (e ** 2 + h ** 2) + (f * h - e * i) ** 2)
               + (d * f * h - c * g * h - d * e * i + c * e * j) ** 2
               - 2.0 * a * b * (-(c * d * (e * f + h * i))
                                + (f * h - e * i) * (-(g * i) + f * j)
                                + c ** 2 * (e * g + h * j))
               + a ** 2 * (d ** 2 * (f ** 2 + i ** 2) + (g * i - f * j) ** 2
                           - 2.0 * c * d * (f * g + i * j)
                           + c ** 2 * (g ** 2 + j ** 2)))
    return x_up / divisor, y_up / divisor, z_up / divisor


def triangulate_disparity(P1, P2, disp_h: jnp.ndarray, disp_v: jnp.ndarray
                          ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Triangulate a full-resolution two-axis disparity map.

    Pixel (xx, yy) in the left image matches (xx + disp_h, yy + disp_v) in
    the right image (getPointCloud.cpp:909-914)."""
    h, w = disp_h.shape
    dt = disp_h.dtype
    xx = jnp.broadcast_to(jnp.arange(w, dtype=dt)[None, :], (h, w))
    yy = jnp.broadcast_to(jnp.arange(h, dtype=dt)[:, None], (h, w))
    return triangulate_points(P1, P2, xx, yy, xx + disp_h, yy + disp_v)


def range_map(P1, P2, disp_h: jnp.ndarray, disp_v: jnp.ndarray) -> jnp.ndarray:
    """Z-only triangulation (getRangePoint, getPointCloud.cpp:951-982)."""
    _, _, z = triangulate_disparity(P1, P2, disp_h, disp_v)
    return z
