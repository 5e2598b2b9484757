"""Pointwise correlation / subpixel-fit ops.

Subsumes the elementwise CUDA kernels of MatchLib.cu: Square (:556),
MoveCorrelation (:666), PolyDisparity (:790), compCorrelationKernel (:884),
Disparity (:938), TrueConfidence (:990), scaleDisparityKernel (:1042),
floatrescaleKernel (:1377).  Everything here is trivially fusible by XLA.
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp


def correlation_ratio(blurred_cross: jnp.ndarray, blurred_l2: jnp.ndarray,
                      blurred_w2_shifted: jnp.ndarray) -> jnp.ndarray:
    """Normalised correlation ratio, clamped to [0, 1].

    corr = G(L*W_d)^2 / (G(L^2) * G(W^2)(x+d))  — MoveCorrelation
    (MatchLib.cu:666-725): numerator sampled at (x,y), the warped-energy term
    at the shifted position.  Division by zero yields inf -> clamped to 1;
    0/0 yields NaN which propagates, exactly as in the reference."""
    r = (blurred_cross * blurred_cross) / (blurred_l2 * blurred_w2_shifted)
    r = jnp.where(r > 1.0, 1.0, r)
    r = jnp.where(r < 0.0, 0.0, r)
    return r


def parabola_fit(corr_minus: jnp.ndarray, corr_centre: jnp.ndarray,
                 corr_plus: jnp.ndarray, threshold,
                 conf_no_peak: float = 0.4,
                 conf_affine_scale: float = 0.3,
                 conf_affine_bias: float = 0.7
                 ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """3-point parabola subpixel fit over (corr_-, corr_0, corr_+).

    Reproduces PolyDisparity (MatchLib.cu:790-843):

        b1 = (r - l)/2 ;  c1 = r - (c + b1)
        if c1 < 0:   offset = clamp(-b1/(2 c1), ±threshold)
                     cstar  = (c1*offset + b1)*offset + c
                     if cstar > 1: offset *= (1-c)/(cstar-c) if cstar-c>1e-10
                                   conf = 1
                     else:         conf = 0.3*cstar + 0.7
        else:        offset = 0 ; conf = 0.4

    Returns (subpixel offset increment, per-axis confidence)."""
    l, c, r = corr_minus, corr_centre, corr_plus
    b1 = (r - l) * 0.5
    c1 = r - (c + b1)
    has_peak = c1 < 0  # NaN inputs -> False -> (0, 0.4), as in CUDA

    off = (-b1 * 0.5) / c1
    off = jnp.minimum(threshold, jnp.maximum(off, -threshold))
    cstar = (c1 * off + b1) * off + c

    over = cstar > 1.0
    d = cstar - c
    off_over = jnp.where(d > 1e-10, off * ((1.0 - c) / d), off)
    conf_in = jnp.where(over, 1.0,
                        conf_affine_scale * cstar + conf_affine_bias)
    off_in = jnp.where(over, off_over, off)

    offset = jnp.where(has_peak, off_in, 0.0)
    conf = jnp.where(has_peak, conf_in, conf_no_peak)
    return offset, conf


def blend_confidence(conf_new: jnp.ndarray, conf_old: jnp.ndarray,
                     w_new: float = 0.75, w_old: float = 0.25) -> jnp.ndarray:
    """Temporal confidence blend, clamped to [0, 1].

    TrueConfidence (MatchLib.cu:990-1013): 0.75*new + 0.25*old."""
    c = w_new * conf_new + w_old * conf_old
    c = jnp.where(c > 1.0, 1.0, c)
    c = jnp.where(c < 0.0, 0.0, c)
    return c
