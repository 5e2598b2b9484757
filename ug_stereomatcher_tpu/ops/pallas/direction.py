"""Fused correlation/direction/update kernel.

Computes one matcher iteration's correlate -> parabola -> update chain
(reference matchlevel steps 2-6, MatchGPULib.cpp:1809-2250) in a single
Pallas kernel:

  for each of the 5 moves d:  corr_d = clip(G(L*W_d)^2 /
                                            (G(L^2) * G(W^2)(x+d)), 0, 1)
  dir_d  = mean_channels(corr_d)
  (inc_h, conf_h) = parabola(dir_left,  dir_centre, dir_right)
  (inc_v, conf_v) = parabola(dir_up,    dir_centre, dir_down)
  disp'  = disp + inc ;  conf' = blend(conf_h*conf_v, conf)  [or replace on
                                  the coarsest level's first iteration]

The XLA path launches ~20 kernels per iteration for this chain and streams
~30 full-map HBM traversals; fused, it reads left/warped/bl2/disp once and
writes the 3-plane state once.  Boundary semantics are preserved exactly:

* the cross-product blur G(L*W_d) uses ZERO padding outside the image
  (shared-memory conv family, MatchLib.cu:71-305) — enforced by masking the
  cross product to zero beyond the image before blurring;
* the energy blur G(W^2) uses CLAMP addressing (texture conv family,
  MatchLib.cu:1461-1586) — the inputs arrive edge-padded, and the blurred
  energy's pad cells are re-clamped before the shifted read.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ug_stereomatcher_tpu.ops.pallas.blur import balanced_tile_cols

from ug_stereomatcher_tpu.config import MOVES, gaussian_kernel
from ug_stereomatcher_tpu.ops.pointwise import blend_confidence, parabola_fit

HW = 64   # horizontal halo (DMA-alignment driven; compute uses <= 4)
HALO = 4  # vertical halo (blur radius 2 + shift 1, rounded to 4)



def _ceil_to(x: int, m: int) -> int:
    return -(-x // m) * m


def _direction_kernel(left_ref, warped_ref, bl2_ref, disp_ref, thr_ref,
                      replace_ref, row0_ref, out_ref, lbufs, wbufs, sems, *,
                      H, W, TH, TW, taps, ni, nj, consts):
    g = pl.program_id(0)
    i = g // nj
    j = g % nj
    r0 = i * TH
    c0 = j * TW
    bh = TH + 2 * HALO
    bw = TW + 2 * HW
    n_tiles = ni * nj
    slot = g % 2
    # global row of this tile's first output row (0 unsharded; the shard
    # offset when the caller row-shards the image) — all boundary masks
    # below are evaluated in GLOBAL coordinates so a shard's interior
    # block edge is never mistaken for the image edge
    row0 = row0_ref[0, 0]

    # Double-buffered halo loads: scratch persists across grid steps, so
    # tile g+1's left/warped copies run behind tile g's compute and the
    # DMA latency never lands on the critical path.
    def dma_pair(slot_idx, tile_idx):
        ti = tile_idx // nj
        tj = tile_idx % nj
        return (
            pltpu.make_async_copy(
                left_ref.at[:, pl.ds(ti * TH, bh), pl.ds(tj * TW, bw)],
                lbufs.at[slot_idx], sems.at[slot_idx, 0]),
            pltpu.make_async_copy(
                warped_ref.at[:, pl.ds(ti * TH, bh), pl.ds(tj * TW, bw)],
                wbufs.at[slot_idx], sems.at[slot_idx, 1]),
        )

    @pl.when(g == 0)
    def _():
        for cp in dma_pair(0, 0):
            cp.start()

    @pl.when(g + 1 < n_tiles)
    def _():
        for cp in dma_pair((g + 1) % 2, g + 1):
            cp.start()

    for cp in dma_pair(slot, g):
        cp.wait()

    def body():
        lbuf = lbufs.at[slot]
        wbuf = wbufs.at[slot]

        rows = jax.lax.broadcasted_iota(jnp.int32, (bh, bw), 0)
        cols = jax.lax.broadcasted_iota(jnp.int32, (bh, bw), 1)
        g_r = rows + (r0 - HALO) + row0
        g_c = cols + (c0 - HW)
        inside = ((g_r >= 0) & (g_r <= H - 1) & (g_c >= 0)
                  & (g_c <= W - 1)).astype(jnp.float32)
        is_top_edge = (g_r == 0).astype(jnp.float32)
        is_bot_edge = (g_r == H - 1).astype(jnp.float32)
        is_left_edge = (g_c == 0).astype(jnp.float32)
        is_right_edge = (g_c == W - 1).astype(jnp.float32)
        top_pad = g_r < 0
        bot_pad = g_r > H - 1
        left_pad = g_c < 0
        right_pad = g_c > W - 1
        touches_edge = ((r0 + row0 - HALO < 0) | (r0 + row0 + TH + HALO > H)
                        | (c0 - HW < 0) | (c0 + TW + HW > W))

        def shifted(x, dy, dx):
            rolled = x
            if dy:
                rolled = pltpu.roll(rolled, (-dy) % bh, axis=0)
            if dx:
                rolled = pltpu.roll(rolled, (-dx) % bw, axis=1)
            return rolled

        def blur(x):
            """Separable 5-tap Gaussian: row (width) pass then column pass.
            Accumulation order matches ops.conv.conv1d term-by-term so the
            fused kernel is bit-identical to the XLA path.  Rim garbage."""
            def pass1d(v, dy, dx):
                acc = taps[0] * shifted(v, -2 * dy, -2 * dx)
                acc = acc + taps[1] * shifted(v, -dy, -dx)
                acc = acc + taps[2] * v
                acc = acc + taps[1] * shifted(v, dy, dx)
                acc = acc + taps[0] * shifted(v, 2 * dy, 2 * dx)
                return acc
            return pass1d(pass1d(x, 0, 1), 1, 0)

        def reclamp(x):
            def fixed():
                tv = jnp.sum(x * is_top_edge, axis=0, keepdims=True)
                bv = jnp.sum(x * is_bot_edge, axis=0, keepdims=True)
                y = jnp.where(top_pad, tv, x)
                y = jnp.where(bot_pad, bv, y)
                lv = jnp.sum(y * is_left_edge, axis=1, keepdims=True)
                rv = jnp.sum(y * is_right_edge, axis=1, keepdims=True)
                y = jnp.where(left_pad, lv, y)
                y = jnp.where(right_pad, rv, y)
                return y
            return jax.lax.cond(touches_edge, fixed, lambda: x)

        # Blurred warped energy (clamp boundary), re-clamped so the +-1
        # shifted denominator read matches clamp addressing exactly.
        bw2 = [reclamp(blur(wbuf[c] * wbuf[c])) for c in range(3)]

        def zero_mask(x):
            # zero-pad boundary: `inside` is 1.0 everywhere on interior
            # tiles, so the 15 per-iteration mask multiplies only run on
            # tiles that actually touch the image edge (x*1.0 is an exact
            # identity — skipping it is bit-identical)
            return jax.lax.cond(touches_edge, lambda: x * inside,
                                lambda: x)

        dirs = []
        for (dx, dy) in MOVES:
            acc = None
            for c in range(3):
                cross = lbuf[c] * shifted(wbuf[c], dy, dx)
                cross = zero_mask(cross)        # zero-pad boundary
                bcross = blur(cross)
                num = bcross * bcross
                den = bl2_ref[c] * lax_slice_center(
                    shifted(bw2[c], dy, dx), TH, TW)
                ratio = num[HALO:HALO + TH, HW:HW + TW] / den
                ratio = jnp.where(ratio > 1.0, 1.0, ratio)
                ratio = jnp.where(ratio < 0.0, 0.0, ratio)
                acc = ratio if acc is None else acc + ratio
            dirs.append(acc * (1.0 / 3.0))
        dir_l, dir_r, dir_u, dir_d, dir_c = dirs

        thr = thr_ref[0, 0]
        no_peak, aff_scale, aff_bias, w_new, w_old = consts
        inc_h, conf_h = parabola_fit(dir_l, dir_c, dir_r, thr,
                                     no_peak, aff_scale, aff_bias)
        inc_v, conf_v = parabola_fit(dir_u, dir_c, dir_d, thr,
                                     no_peak, aff_scale, aff_bias)
        conf_new = conf_h * conf_v

        out_ref[0, :, :] = inc_h + disp_ref[0]
        out_ref[1, :, :] = inc_v + disp_ref[1]
        blended = blend_confidence(conf_new, disp_ref[2], w_new, w_old)
        out_ref[2, :, :] = jnp.where(replace_ref[0, 0] > 0, conf_new,
                                     blended)

    body()


def lax_slice_center(x, TH, TW):
    return x[HALO:HALO + TH, HW:HW + TW]


@functools.partial(jax.jit, static_argnames=("tile_rows", "tile_cols",
                                             "interpret", "consts",
                                             "row_halo", "global_h"))
def fused_direction_update(left: jnp.ndarray, warped: jnp.ndarray,
                           blurred_l2: jnp.ndarray, disp: jnp.ndarray,
                           threshold, replace_conf,
                           tile_rows: int = 64, tile_cols: int = 512,
                           consts=(0.4, 0.3, 0.7, 0.75, 0.25),
                           interpret: bool = False, row_halo: bool = False,
                           row0=None, global_h: int = None) -> jnp.ndarray:
    """One fused correlate->parabola->update step.

    left/warped/blurred_l2: (3, H, W); disp: (3, H, W) state; threshold:
    scalar clamp; replace_conf: scalar bool-ish (1 on the coarsest level's
    first iteration -> confidence replaced instead of blended); consts:
    (conf_no_peak, conf_affine_scale, conf_affine_bias, conf_blend_new,
    conf_blend_old) from MatcherConfig.
    Returns the updated (3, H, W) state (pre-smoothing).

    Row-sharded mode (``row_halo=True``): left/warped are local row blocks
    with HALO REAL rows attached above and below (neighbour rows via
    ``ppermute``, boundary rows already in clamp/edge form);
    blurred_l2/disp are the plain (3, Hl, W) local blocks; ``row0`` is the
    block's global first row (traced) and ``global_h`` the image height.
    Boundary masks then resolve in global coordinates, making each shard's
    output exactly the matching row slice of the unsharded kernel."""
    Hl = disp.shape[-2]
    W = disp.shape[-1]
    H = int(global_h) if row_halo else Hl
    TH = tile_rows
    TW = balanced_tile_cols(W, tile_cols)
    Hp = _ceil_to(Hl, TH)
    Wp = _ceil_to(W, TW)
    ni, nj = Hp // TH, Wp // TW

    if row_halo:
        def pad_halo(x):   # vertical halo already real; align + widen only
            return jnp.pad(x, ((0, 0), (0, Hp - Hl), (HW, HW + (Wp - W))),
                           mode="edge")
        r0v = jnp.asarray(row0, jnp.int32).reshape(1, 1)
    else:
        def pad_halo(x):
            return jnp.pad(x, ((0, 0), (HALO, HALO + (Hp - Hl)),
                               (HW, HW + (Wp - W))), mode="edge")
        r0v = jnp.zeros((1, 1), jnp.int32)

    def pad_tile(x):
        return jnp.pad(x, ((0, 0), (0, Hp - Hl), (0, Wp - W)))

    thr = jnp.full((1, 1), threshold, jnp.float32)
    rep = jnp.full((1, 1), replace_conf, jnp.int32)
    k = gaussian_kernel()
    taps = (float(k[0]), float(k[1]), float(k[2]))  # (outer, inner, centre)

    kernel = functools.partial(_direction_kernel, H=H, W=W, TH=TH, TW=TW,
                               taps=taps, ni=ni, nj=nj, consts=consts)
    out = pl.pallas_call(
        kernel,
        grid=(ni * nj,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),   # left (padded)
            pl.BlockSpec(memory_space=pl.ANY),   # warped (padded)
            pl.BlockSpec((3, TH, TW), lambda g: (0, g // nj, g % nj),
                         memory_space=pltpu.VMEM),  # blurred_l2
            pl.BlockSpec((3, TH, TW), lambda g: (0, g // nj, g % nj),
                         memory_space=pltpu.VMEM),  # disp state
            pl.BlockSpec(memory_space=pltpu.SMEM),  # threshold
            pl.BlockSpec(memory_space=pltpu.SMEM),  # replace flag
            pl.BlockSpec(memory_space=pltpu.SMEM),  # global row offset
        ],
        out_specs=pl.BlockSpec((3, TH, TW), lambda g: (0, g // nj, g % nj),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((3, Hp, Wp), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((2, 3, TH + 2 * HALO, TW + 2 * HW), jnp.float32),
            pltpu.VMEM((2, 3, TH + 2 * HALO, TW + 2 * HW), jnp.float32),
            pltpu.SemaphoreType.DMA((2, 2)),
        ],
        interpret=interpret,
    )(pad_halo(left), pad_halo(warped), pad_tile(blurred_l2),
      pad_tile(disp), thr, rep, r0v)
    return out[:, :Hl, :W]
