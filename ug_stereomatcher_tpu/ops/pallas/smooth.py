"""Fused confidence-weighted smoothing chain as one Pallas TPU kernel.

One iteration of the reference matcher runs `n` plus-stencil smoothing
passes over (disp_h, disp_v, conf) followed by a separable 3-tap average
filter (MatchGPULib.cpp:2257-2412).  The XLA path launches ~12 stencil
kernels per iteration and streams ~36 full-map HBM traversals; this kernel
does the whole chain in VMEM with a single read and write of the three
planes — beating both the HBM bandwidth cost and the ~0.2 ms/kernel
dispatch floor that dominates small pyramid levels.

Semantics are identical to ops.smooth.weighted_smooth +
ops.conv.blur_average_clamp:

* plus-stencil weighted mean with clamp addressing at image edges;
* global row 0 / column 0 keep their values each smoothing pass
  (MatchLib.cu:1106);
* all three planes are smoothed against the same pre-pass confidence;
* final separable average with taps [0, 1/3, 1/3, 1/3, 0] (literal 0.3333)
  and clamp addressing.

Implementation: 2-D tiles with halo n+1 (vertical) / 64 (horizontal,
DMA-alignment driven), double-buffered input DMA (overlapping the next
tile's HBM loads with the current tile's compute), and edge-predicated
pad re-clamping so multi-pass boundary behaviour matches the unfused ops
exactly.  Edge rows/columns are recovered with masked reductions — dynamic
lane indexing is not available on TPU.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ug_stereomatcher_tpu.ops.pallas.blur import balanced_tile_cols

_AVG_TAP = 0.3333
HW = 64  # horizontal halo (keeps DMA widths 128-aligned)


def _ceil_to(x: int, m: int) -> int:
    return -(-x // m) * m


def _smooth_kernel(inp_ref, row0_ref, out_ref, bufs2, sems, *, H, W, TH, TW,
                   HALO, n_passes, ni, nj):
    g = pl.program_id(0)
    # global row of this tile's first output row (0 unsharded; the shard
    # offset in row-sharded mode) — boundary masks resolve globally
    row0 = row0_ref[0, 0]
    n_tiles = ni * nj
    bh = TH + 2 * HALO
    bw = TW + 2 * HW
    slot = g % 2

    def dma(slot_idx, tile_idx):
        i = tile_idx // nj
        j = tile_idx % nj
        return pltpu.make_async_copy(
            inp_ref.at[:, pl.ds(i * TH, bh), pl.ds(j * TW, bw)],
            bufs2.at[slot_idx], sems.at[slot_idx])

    @pl.when(g == 0)
    def _():
        dma(0, 0).start()

    @pl.when(g + 1 < n_tiles)
    def _():
        dma((g + 1) % 2, g + 1).start()

    dma(slot, g).wait()

    i = g // nj
    j = g % nj
    r0 = i * TH
    c0 = j * TW

    rows = jax.lax.broadcasted_iota(jnp.int32, (bh, bw), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (bh, bw), 1)
    g_r = rows + (r0 - HALO) + row0
    g_c = cols + (c0 - HW)
    keep = (g_r == 0) | (g_c == 0)
    top_pad = g_r < 0
    bot_pad = g_r > H - 1
    left_pad = g_c < 0
    right_pad = g_c > W - 1
    is_top_edge = (g_r == 0).astype(jnp.float32)
    is_bot_edge = (g_r == H - 1).astype(jnp.float32)
    is_left_edge = (g_c == 0).astype(jnp.float32)
    is_right_edge = (g_c == W - 1).astype(jnp.float32)
    # Does this tile's buffer contain any out-of-image pad cells?
    touches_edge = ((r0 + row0 - HALO < 0) | (r0 + row0 + TH + HALO > H)
                    | (c0 - HW < 0) | (c0 + TW + HW > W))
    touches_origin = (r0 + row0 == 0) | (c0 == 0)

    def reclamp(x):
        """Rewrite pad cells with the current edge values (clamp semantics
        for the next stencil pass)."""
        tv = jnp.sum(x * is_top_edge, axis=0, keepdims=True)
        bv = jnp.sum(x * is_bot_edge, axis=0, keepdims=True)
        x = jnp.where(top_pad, tv, x)
        x = jnp.where(bot_pad, bv, x)
        lv = jnp.sum(x * is_left_edge, axis=1, keepdims=True)
        rv = jnp.sum(x * is_right_edge, axis=1, keepdims=True)
        x = jnp.where(left_pad, lv, x)
        x = jnp.where(right_pad, rv, x)
        return x

    def maybe_fix_edges(x, with_keep, x_prev=None):
        """Apply keep-row0/col0 and pad re-clamping — edge tiles only."""
        def fixed():
            y = x
            if with_keep and x_prev is not None:
                y = jnp.where(keep, x_prev, y)
            return reclamp(y)
        return jax.lax.cond(
            touches_edge | (with_keep & touches_origin), fixed, lambda: x)

    def shifted(x, dy, dx):
        """x shifted so out[r,c] = x[r+dy, c+dx]; rim cells garbage.
        (pltpu.roll needs non-negative shifts: roll by -k == size-k.)"""
        rolled = x
        if dy:
            rolled = pltpu.roll(rolled, (-dy) % bh, axis=0)
        if dx:
            rolled = pltpu.roll(rolled, (-dx) % bw, axis=1)
        return rolled

    dh = bufs2[slot, 0]
    dv = bufs2[slot, 1]
    cf = bufs2[slot, 2]

    for _ in range(n_passes):
        cu = shifted(cf, -1, 0)
        cd = shifted(cf, 1, 0)
        cl = shifted(cf, 0, -1)
        cr = shifted(cf, 0, 1)
        recip = 1.0 / (cf + cu + cd + cl + cr)
        new = []
        for x in (dh, dv, cf):
            num = (x * cf + shifted(x, -1, 0) * cu + shifted(x, 1, 0) * cd
                   + shifted(x, 0, -1) * cl + shifted(x, 0, 1) * cr)
            new.append(maybe_fix_edges(num * recip, True, x))
        dh, dv, cf = new

    # separable 3-tap average (row pass then column pass), clamp boundary
    for c, x in ((0, dh), (1, dv), (2, cf)):
        r = maybe_fix_edges(
            _AVG_TAP * (shifted(x, 0, -1) + x + shifted(x, 0, 1)), False)
        y = _AVG_TAP * (shifted(r, -1, 0) + r + shifted(r, 1, 0))
        out_ref[c, :, :] = y[HALO:HALO + TH, HW:HW + TW]


def smooth_halo_rows(n_passes: int) -> int:
    """Vertical halo rows the fused smoother needs for ``n_passes``."""
    return _ceil_to(n_passes + 1, 4)   # keep DMA slice height 8-aligned


@functools.partial(jax.jit, static_argnames=("n_passes", "tile_rows",
                                             "tile_cols", "interpret",
                                             "row_halo", "global_h"))
def fused_smooth_average(state: jnp.ndarray, n_passes: int,
                         tile_rows: int = 64, tile_cols: int = 1024,
                         interpret: bool = False, row_halo: bool = False,
                         row0=None, global_h: int = None) -> jnp.ndarray:
    """Apply n_passes weighted smoothing passes + the 3-tap average filter
    to a (3, H, W) [disp_h, disp_v, conf] stack in one fused kernel.

    Row-sharded mode (``row_halo=True``): ``state`` is a local row block
    with smooth_halo_rows(n_passes) REAL halo rows attached above and below
    (neighbour rows via ``ppermute``; global boundary rows already in
    clamp/edge form); ``row0`` is the block's global first row (traced)
    and ``global_h`` the image height.  Output is the (3, Hl, W) local
    block — exactly the matching row slice of the unsharded kernel."""
    HALO = smooth_halo_rows(n_passes)
    if HALO > HW:
        raise ValueError(
            f"n_passes={n_passes} needs a {HALO}-wide halo but the fixed "
            f"horizontal halo is {HW}; use the unfused smoothing chain")
    if row_halo:
        Hl = state.shape[-2] - 2 * HALO
    else:
        Hl = state.shape[-2]
    W = state.shape[-1]
    H = int(global_h) if row_halo else Hl
    TH = tile_rows
    TW = balanced_tile_cols(W, tile_cols)
    Hp = _ceil_to(Hl, TH)
    Wp = _ceil_to(W, TW)
    ni, nj = Hp // TH, Wp // TW
    if row_halo:
        inp = jnp.pad(state, ((0, 0), (0, Hp - Hl), (HW, HW + (Wp - W))),
                      mode="edge")
        r0v = jnp.asarray(row0, jnp.int32).reshape(1, 1)
    else:
        inp = jnp.pad(
            state, ((0, 0), (HALO, HALO + (Hp - Hl)), (HW, HW + (Wp - W))),
            mode="edge")
        r0v = jnp.zeros((1, 1), jnp.int32)
    kernel = functools.partial(_smooth_kernel, H=H, W=W, TH=TH, TW=TW,
                               HALO=HALO, n_passes=n_passes, ni=ni, nj=nj)
    out = pl.pallas_call(
        kernel,
        grid=(ni * nj,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY),
                  pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=pl.BlockSpec((3, TH, TW),
                               lambda g: (0, g // nj, g % nj),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((3, Hp, Wp), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((2, 3, TH + 2 * HALO, TW + 2 * HW), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(inp, r0v)
    return out[:, :Hl, :W]
