"""Iteration-convergence metric.

The reference computes a confidence-weighted mean absolute difference
between successive disparity estimates via weightedDifferenceGPU +
two-stage reduceGPU tree sums (MatchLib.cu:1174-1373, host wrapper
MatchGPULib.cpp:1336-1437) and a two-field threshold test
``differenceIterations`` (:1323-1334).  The call sites are commented out of
the live path, but the capability is part of the op inventory — here it is
a single fused reduction.
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp


def weighted_difference(disp_new: jnp.ndarray, disp_old: jnp.ndarray,
                        conf: jnp.ndarray) -> jnp.ndarray:
    """sum(|new - old| * conf) / sum(conf)  — scalar convergence measure
    (MatchGPULib.cpp:1336 weightedDifference)."""
    num = jnp.sum(jnp.abs(disp_new - disp_old) * conf)
    den = jnp.sum(conf)
    # all-zero confidence (fully occluded/masked frame) would give 0/0 =
    # NaN, and NaN < threshold is always False — has_converged would spin
    # forever.  Zero weighted difference is the sensible degenerate value.
    return jnp.where(den > 0.0, num / jnp.where(den > 0.0, den, 1.0), 0.0)


def has_converged(disp_h_new, disp_h_old, disp_v_new, disp_v_old, conf,
                  threshold: float) -> Tuple[jnp.ndarray, jnp.ndarray,
                                             jnp.ndarray]:
    """Both-axis convergence test (differenceIterations,
    MatchGPULib.cpp:1323-1334).  Returns (converged bool scalar,
    diff_h, diff_v)."""
    dh = weighted_difference(disp_h_new, disp_h_old, conf)
    dv = weighted_difference(disp_v_new, disp_v_old, conf)
    return (dh < threshold) & (dv < threshold), dh, dv
