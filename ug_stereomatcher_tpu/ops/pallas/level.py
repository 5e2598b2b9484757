"""Level-resident matcher kernel: a whole pyramid level in one Pallas call.

Coarse pyramid levels run 22 refinement iterations over tiny images
(MatchGPULib.cpp:1741 iteration schedule; matchlevel's device-resident
loop :2420-2426).  On the XLA path each iteration costs several kernel
launches, so levels 6-13 are launch-floor bound: ~65 ms of the 16MP
pipeline is spent dispatching work on sub-256k-pixel images.  This kernel
runs the ENTIRE level — warp, correlation, parabola update, smoothing,
average filter, for all mi iterations — inside a single Pallas program
with every plane resident in VMEM (the TPU-native analog of the
reference's all-device-resident matchlevel loop).

Exactness contract: same op set and term order as
``match.match_level``'s unfused XLA scan path, matched under the fused
kernels' tolerance contract: the mask-algebra boundary terms and the
x*(1/3) channel mean contract differently from XLA's fused forms, giving
~1e-5 free-running drift per level in bilinear mode; nearest mode
amplifies that noise through gather-index flips (the repo-wide chaos
rule), so nearest parity is asserted with quantile tolerances
(tests/test_level_kernel.py).  All boundary semantics are reproduced
with mask algebra instead of geometric halos:

* images/state are lane/sublane padded; pad cells hold EDGE-REPLICATED
  values (the clamp invariant), restored by ``clamp_fix`` after every op
  whose output pads are later read through a shifted stencil;
* zero-boundary blurs (cross products, MatchLib.cu:71-305) mask the field
  to zero outside the image, then shift with zero-filled rims;
* clamp-boundary blurs/shifts (energy maps + average filter,
  MatchLib.cu:1461-1718; shift_image) roll and patch the wrapped rim with
  the extracted edge row/column.

The warp reuses the windowed banded sweep of ops/pallas/warp.py
(sweep_nearest / sweep_bilinear) over the whole level at once.  Offsets
beyond the window clamp, exactly as in the tiled kernel; the kernel also
emits an overflow flag — the OR over iterations of the same
max|disparity| > window-reach test match.warp_for_level applies per warp
call — so the caller can fall back to the exact XLA level when any
iteration's field would have clamped.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ug_stereomatcher_tpu.config import (MOVES, average_kernel,
                                         gaussian_kernel)
from ug_stereomatcher_tpu.ops.pointwise import blend_confidence, parabola_fit
from ug_stereomatcher_tpu.ops.pallas.warp import (
    BAND,
    LANES,
    sweep_bilinear,
    sweep_nearest,
    warp_halo_rows,
    window_reach,
)



def _ceil_to(x: int, m: int) -> int:
    return -(-x // m) * m


# Default VMEM budget for the auto gate: the rig's scoped-VMEM ceiling is
# 16 MB; leave headroom for Mosaic's own temporaries and alignment waste.
LEVEL_VMEM_BUDGET = 13 * 2 ** 20


def level_resident_vmem_bytes(height: int, width: int, max_dy: int) -> int:
    """Rough VMEM footprint estimate for gating (live planes at peak).

    Peak liveness is the per-channel direction phase: the 12 input/output
    ref planes (left, right, disp-in, out), the 3-plane carry, 3-plane
    hoisted bl2, the 5 move accumulators, warped_c + bw2_c, and ~4
    transient blur/shift temps — ~28 planes plus the right planes' warp
    halo rows."""
    Hp = _ceil_to(height, 8)
    Wp = _ceil_to(width, LANES)
    plane = Hp * Wp * 4
    vh = warp_halo_rows(max_dy)
    halo_extra = (2 * vh + BAND) * Wp * 4
    return 28 * plane + 3 * halo_extra


def _make_level_runner(leftp_ref, rightp_ref, thr_at, *, H, W, Hp, Wp,
                       VH, HBLK, mi, n_smooth, replace_first, g_taps,
                       a_tap, consts, bilinear, v_reach, h_reach):
    """Build the whole-level iteration loop over VMEM-resident refs.

    Returns ``run(state3) -> ((dh, dv, conf), ovf)`` where state3 is the
    padded (Hp, Wp) plane triple.  ``thr_at(m)`` yields the iteration-m
    clamp threshold."""
    n_cblk = Wp // LANES
    sweep = sweep_bilinear if bilinear else sweep_nearest

    rows = jax.lax.broadcasted_iota(jnp.int32, (Hp, Wp), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (Hp, Wp), 1)
    pad_row = rows > H - 1
    pad_col = cols > W - 1
    inside_f = ((~pad_row) & (~pad_col)).astype(jnp.float32)
    is_row0 = (rows == 0).astype(jnp.float32)
    is_rowH = (rows == H - 1).astype(jnp.float32)
    is_col0 = (cols == 0).astype(jnp.float32)
    is_colW = (cols == W - 1).astype(jnp.float32)
    keep_edge = (rows == 0) | (cols == 0)   # smooth keep-row0/col0 rule

    def row_of(x, onehot):
        return jnp.sum(x * onehot, axis=0, keepdims=True)

    def col_of(x, onehot):
        return jnp.sum(x * onehot, axis=1, keepdims=True)

    def clamp_fix(x):
        """Restore the clamp invariant: pad cells <- edge replicate."""
        x = jnp.where(pad_row, row_of(x, is_rowH), x)
        x = jnp.where(pad_col, col_of(x, is_colW), x)
        return x

    def shift_clamp(x, dx, dy):
        """dst(r,c) = x(clamp(r+dy), clamp(c+dx)) — x invariant-held.
        Only single-axis shifts occur (moves, plus-stencil, separable
        blur taps)."""
        y = x
        if dy:
            y = pltpu.roll(y, (-dy) % Hp, axis=0)
            if dy > 0:
                y = jnp.where(rows >= Hp - dy, row_of(x, is_rowH), y)
            else:
                y = jnp.where(rows < -dy, row_of(x, is_row0), y)
        if dx:
            y = pltpu.roll(y, (-dx) % Wp, axis=1)
            if dx > 0:
                y = jnp.where(cols >= Wp - dx, col_of(x, is_colW), y)
            else:
                y = jnp.where(cols < -dx, col_of(x, is_col0), y)
        return y

    def shift_zero(x, dx, dy):
        """dst = zero-extended x at (r+dy, c+dx) — x already zero outside
        the image (pads included), and the result keeps that invariant."""
        y = x
        if dy:
            y = pltpu.roll(y, (-dy) % Hp, axis=0)
            if dy > 0:
                y = jnp.where(rows >= H - dy, 0.0, y)
            else:
                y = jnp.where(pad_row | (rows < -dy), 0.0, y)
        if dx:
            y = pltpu.roll(y, (-dx) % Wp, axis=1)
            if dx > 0:
                y = jnp.where(cols >= W - dx, 0.0, y)
            else:
                y = jnp.where(pad_col | (cols < -dx), 0.0, y)
        return y

    def blur_pass(x, shift, taps, dx, dy):
        """1-D 5-tap pass along one axis, term order matching
        ops.conv.conv1d (k = -2..2, zero-weight taps skipped)."""
        t0, t1, t2 = taps
        acc = None
        for k, w in ((-2, t0), (-1, t1), (0, t2), (1, t1), (2, t0)):
            if w == 0.0:
                continue
            term = w * (x if k == 0 else shift(x, k * dx, k * dy))
            acc = term if acc is None else acc + term
        return acc

    def blur_zero(x):
        """Gaussian, zero boundary (conv_separable: width pass then
        height pass).  x must be zero-masked outside the image."""
        x = blur_pass(x, shift_zero, g_taps, 1, 0)
        return blur_pass(x, shift_zero, g_taps, 0, 1)

    def blur_clamp(x):
        """Gaussian, clamp boundary — x invariant-held.  Output pads are
        garbage; callers clamp_fix before any shifted read."""
        x = blur_pass(x, shift_clamp, g_taps, 1, 0)
        return blur_pass(x, shift_clamp, g_taps, 0, 1)

    def blur_avg(x):
        """3-tap average filter (taps literal 0.3333), clamp boundary."""
        x = blur_pass(x, shift_clamp, (0.0, a_tap, a_tap), 1, 0)
        return blur_pass(x, shift_clamp, (0.0, a_tap, a_tap), 0, 1)

    # Iteration-invariant blurred left energy (hoisted, as in match_level).
    bl2 = [blur_clamp(leftp_ref[c] * leftp_ref[c]) for c in range(3)]

    def warp_plane(c, dh, dv):
        outs = []
        for cb in range(n_cblk):
            c0 = cb * LANES
            dvb = jax.lax.slice(dv, (0, c0), (Hp, c0 + LANES))
            dhb = jax.lax.slice(dh, (0, c0), (Hp, c0 + LANES))
            lo = max(c0 - HBLK * LANES, 0)
            hi = min(c0 + HBLK * LANES, Wp - LANES)
            outs.append(sweep(rightp_ref.at[c], dvb, dhb, c0, lo, hi, 0,
                              H=H, W=W, TH=Hp, VH=VH, HBLK=HBLK))
        return jnp.concatenate(outs, axis=1)

    no_peak, aff_scale, aff_bias, w_new, w_old = consts

    def smooth_pass(p0, p1, p2):
        """One confidence-weighted plus-smoothing pass over the stacked
        state (ops.smooth.weighted_smooth term order), pads re-fixed."""
        num0 = p0 * p2
        num1 = p1 * p2
        num2 = p2 * p2
        den = p2
        for (dx, dy) in ((-1, 0), (1, 0), (0, -1), (0, 1)):
            cs = shift_clamp(p2, dx, dy)
            num0 = num0 + shift_clamp(p0, dx, dy) * cs
            num1 = num1 + shift_clamp(p1, dx, dy) * cs
            num2 = num2 + cs * cs
            den = den + cs
        q0 = jnp.where(keep_edge, p0, num0 / den)
        q1 = jnp.where(keep_edge, p1, num1 / den)
        q2 = jnp.where(keep_edge, p2, num2 / den)
        return clamp_fix(q0), clamp_fix(q1), clamp_fix(q2)

    def iter_body(m, carry):
        dh, dv, conf, ovf = carry
        thr = thr_at(m)

        # Same per-warp overflow test as match.warp_for_level, folded over
        # iterations (pads masked out of the max).
        ovf = jnp.maximum(
            ovf,
            jnp.where((jnp.max(jnp.abs(dv) * inside_f) > v_reach)
                      | (jnp.max(jnp.abs(dh) * inside_f) > h_reach),
                      1.0, 0.0))

        # Channel-outer accumulation keeps only one warped/bw2 plane live
        # at a time (VMEM peak), while each move's accumulator still sums
        # channels in ascending order — the same additions, in the same
        # order, as the XLA path's channel-mean.
        accs = [None] * len(MOVES)
        for c in range(3):
            warped_c = clamp_fix(warp_plane(c, dh, dv))
            bw2_c = clamp_fix(blur_clamp(warped_c * warped_c))
            for k, (dx, dy) in enumerate(MOVES):
                cross = leftp_ref[c] * shift_clamp(warped_c, dx, dy)
                cross = cross * inside_f          # zero-pad boundary
                bcross = blur_zero(cross)
                num = bcross * bcross
                den = bl2[c] * shift_clamp(bw2_c, dx, dy)
                ratio = num / den
                ratio = jnp.where(ratio > 1.0, 1.0, ratio)
                ratio = jnp.where(ratio < 0.0, 0.0, ratio)
                accs[k] = ratio if accs[k] is None else accs[k] + ratio
        dir_l, dir_r, dir_u, dir_d, dir_c = [
            a * (1.0 / 3.0) for a in accs]

        inc_h, conf_h = parabola_fit(dir_l, dir_c, dir_r, thr,
                                     no_peak, aff_scale, aff_bias)
        inc_v, conf_v = parabola_fit(dir_u, dir_c, dir_d, thr,
                                     no_peak, aff_scale, aff_bias)
        conf_new = conf_h * conf_v

        dh = inc_h + dh
        dv = inc_v + dv
        blended = blend_confidence(conf_new, conf, w_new, w_old)
        if replace_first:
            conf = jnp.where(m == 0, conf_new, blended)
        else:
            conf = blended

        p0, p1, p2 = clamp_fix(dh), clamp_fix(dv), clamp_fix(conf)
        for _ in range(n_smooth):
            p0, p1, p2 = smooth_pass(p0, p1, p2)
        p0 = clamp_fix(blur_avg(p0))
        p1 = clamp_fix(blur_avg(p1))
        p2 = clamp_fix(blur_avg(p2))
        return (p0, p1, p2, ovf)

    def run(state3):
        init = (state3[0], state3[1], state3[2], jnp.float32(0.0))
        dh, dv, conf, ovf = jax.lax.fori_loop(0, mi, iter_body, init)
        return (dh, dv, conf), ovf
    return run


def _level_kernel(leftp_ref, rightp_ref, disp_ref, thr_ref, out_ref,
                  ovf_ref, *, H, W, Hp, Wp, VH, HBLK, mi, n_smooth,
                  replace_first, g_taps, a_tap, consts, bilinear,
                  v_reach, h_reach):
    run = _make_level_runner(
        leftp_ref, rightp_ref, lambda m: thr_ref[0, m], H=H, W=W, Hp=Hp,
        Wp=Wp, VH=VH, HBLK=HBLK, mi=mi, n_smooth=n_smooth,
        replace_first=replace_first, g_taps=g_taps, a_tap=a_tap,
        consts=consts, bilinear=bilinear, v_reach=v_reach, h_reach=h_reach)
    (dh, dv, conf), ovf = run((disp_ref[0], disp_ref[1], disp_ref[2]))
    out_ref[0, :, :] = dh
    out_ref[1, :, :] = dv
    out_ref[2, :, :] = conf
    ovf_ref[0, 0] = ovf


@functools.partial(jax.jit, static_argnames=(
    "mi", "n_smooth", "replace_first", "max_dy", "max_dx", "consts",
    "method", "interpret"))
def level_resident_match(left: jnp.ndarray, right: jnp.ndarray,
                         disp: jnp.ndarray, thresholds: jnp.ndarray,
                         mi: int, n_smooth: int, replace_first: bool,
                         max_dy: int, max_dx: int,
                         consts=(0.4, 0.3, 0.7, 0.75, 0.25),
                         method: str = "nearest",
                         interpret: bool = False
                         ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Run a whole pyramid level's mi-iteration refinement in one kernel.

    left/right: (3, H, W) level images; disp: (3, H, W) state
    [disp_h, disp_v, conf]; thresholds: (mi,) per-iteration clamp
    schedule.  Returns (state (3, H, W), overflow flag scalar float —
    nonzero iff any iteration's disparity exceeded the warp window's
    exact reach, in which case the caller must recompute via the exact
    XLA path to preserve warpAbyB's unbounded-gather semantics)."""
    H, W = disp.shape[-2], disp.shape[-1]
    Hp = _ceil_to(H, 8)
    Wp = _ceil_to(W, LANES)
    VH = warp_halo_rows(max_dy)
    HBLK = max(1, -(-int(max_dx) // LANES))
    v_reach, h_reach = window_reach(max_dy, max_dx)

    def pad_plane(x):
        return jnp.pad(x, ((0, 0), (0, Hp - H), (0, Wp - W)), mode="edge")

    leftp = pad_plane(left)
    dispp = pad_plane(disp)
    rightp = jnp.pad(right, ((0, 0), (VH, VH + BAND + (Hp - H)),
                             (0, Wp - W)), mode="edge")
    thr = jnp.asarray(thresholds, jnp.float32).reshape(1, mi)

    k = gaussian_kernel()
    g_taps = (float(k[0]), float(k[1]), float(k[2]))
    a_tap = float(average_kernel()[1])

    if method not in ("nearest", "bilinear"):
        raise ValueError(f"unknown warp method {method!r}")
    kernel = functools.partial(
        _level_kernel, H=H, W=W, Hp=Hp, Wp=Wp, VH=VH, HBLK=HBLK, mi=mi,
        n_smooth=n_smooth, replace_first=bool(replace_first),
        g_taps=g_taps, a_tap=a_tap, consts=consts,
        bilinear=(method == "bilinear"),
        v_reach=v_reach, h_reach=h_reach)
    state, ovf = pl.pallas_call(
        kernel,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),   # left (padded)
            pl.BlockSpec(memory_space=pltpu.VMEM),   # right (warp-padded)
            pl.BlockSpec(memory_space=pltpu.VMEM),   # disp state (padded)
            pl.BlockSpec(memory_space=pltpu.SMEM),   # threshold schedule
        ],
        out_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((3, Hp, Wp), jnp.float32),
            jax.ShapeDtypeStruct((1, 1), jnp.float32),
        ],
        interpret=interpret,
    )(leftp, rightp, dispp, thr)
    return state[:, :H, :W], ovf[0, 0]
