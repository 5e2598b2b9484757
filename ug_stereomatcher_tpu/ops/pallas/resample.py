"""Static-index resampler as an MXU one-hot matmul Pallas kernel.

All pyramid resample ops (subsample during build, disparity up-sampling
between levels — MatchLib.cu:311-492) have coordinates that depend only on
the destination axis, so the XLA path (ops/resample._separable_nearest)
factors them into two per-axis takes with trace-time-constant indices.
Those takes are still XLA gathers: at 16MP they run ~8x off the HBM
speed-of-light and the pyramid build pays them twice per level.

TPU-native form: selection IS a matmul.  With trace-time-constant index
vectors, gathering rows/columns is multiplication by a (very sparse)
selection matrix — and the MXU multiplies 128x128 tiles of it for free
compared to the VPU's index-processing path.  Per output row-tile:

    rowsel = R @ buf         R: (TH, BH) one-hot built from iota == iy_rel
    out[:, blk] = rowsel[:, win] @ C_blk       per 128-lane output block,
                                               C_blk: (CW, 128) one-hot

One-hot f32 matmuls are EXACT — with raised precision: the MXU's default
single-pass bf16 path rounds the DATA operand, but the >=3-pass f32
decomposition x = hi + lo against a selection weight whose low half is
zero reconstructs hi·1 + lo·1 = x bit-exactly (verified on-chip), and the
f32 accumulator adds zeros — so ``method="nearest"`` is bit-identical to
the XLA takes.  ``method="bilinear"`` uses two-hot rows/columns carrying
the CUDA linear-filter weights (weights from coord-0.5, clamp addressing
— ops/resample.tex_gather): algebraically identical, float order differs
(rows interpolate before columns), so bilinear matches to float rounding.

The input row window per tile is DMA'd from ANY memory at a dynamic
(8-aligned, host-precomputed) row offset; index vectors ride along as
small int/float arrays.  Value scaling (subsampleDispKernel's SCALE
multiply, MatchLib.cu:393-394) is one post-multiply, applied exactly as
the XLA path does.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128


def _ceil_to(x: int, m: int) -> int:
    return -(-x // m) * m


def _plan_rows(iy0: np.ndarray, iy1: np.ndarray, TH: int, n_out_rows: int,
               in_rows_padded: int) -> Tuple[np.ndarray, int]:
    """Per-output-row-tile aligned input row starts + the static buffer
    height BH covering every tile's span (bilinear needs iy1 = iy0 + 1)."""
    ni = _ceil_to(n_out_rows, TH) // TH
    starts = np.zeros(ni, np.int32)
    span = 8
    for i in range(ni):
        lo = int(iy0[min(i * TH, len(iy0) - 1)])
        hi = int(iy1[min((i + 1) * TH - 1, len(iy1) - 1)])
        s = (lo // 8) * 8
        starts[i] = s
        span = max(span, hi - s + 1)
    BH = _ceil_to(span, 8)
    # keep every tile's window inside the padded input
    starts = np.minimum(starts, max(in_rows_padded - BH, 0)).astype(np.int32)
    return starts, BH


def _resample_kernel(inp_ref, starts_ref, iy_ref, wy_ref, ix_ref, wx_ref,
                     out_ref, bufs2, sems, *, C, BH, TH, W2P, CW, col_start,
                     value_scale, bilinear, ni):
    # grid (C, ni), row-tile index fastest; slabs are per (channel, tile)
    # so the working set stays small enough for TH=64 (full MXU rows)
    c = pl.program_id(0)
    i = pl.program_id(1)
    g = c * ni + i
    n_steps = C * ni
    slot = g % 2

    def dma(slot_idx, step):
        sc = step // ni
        si = step % ni
        start = pl.multiple_of(starts_ref[si], 8)
        return pltpu.make_async_copy(
            inp_ref.at[sc, pl.ds(start, BH), :],
            bufs2.at[slot_idx], sems.at[slot_idx])

    @pl.when(g == 0)
    def _():
        dma(0, 0).start()

    @pl.when(g + 1 < n_steps)
    def _():
        dma((g + 1) % 2, g + 1).start()

    dma(slot, g).wait()

    # Row selection matrix from the tile's relative row indices.
    iy_rel = iy_ref[...] - starts_ref[i]          # (TH, 1) int32
    k = jax.lax.broadcasted_iota(jnp.int32, (TH, BH), 1)
    if bilinear:
        wy = wy_ref[...]                           # (TH, 1) float32
        R = ((k == iy_rel).astype(jnp.float32) * (1.0 - wy)
             + (k == iy_rel + 1).astype(jnp.float32) * wy)
    else:
        R = (k == iy_rel).astype(jnp.float32)

    n_blk = W2P // LANES
    kc = jax.lax.broadcasted_iota(jnp.int32, (CW, LANES), 0)
    # Precision.HIGHEST = multi-pass bf16 decomposition (Mosaic supports
    # only DEFAULT/HIGHEST): exact for selection weights (1.0 and 0.0 have
    # zero low halves) against f32 data split hi+lo — verified on-chip.
    rowsel = jnp.dot(R, bufs2[slot],
                     precision=jax.lax.Precision.HIGHEST,
                     preferred_element_type=jnp.float32)
    for b in range(n_blk):
        c0 = col_start[b]                      # static python int
        ixr = ix_ref[:, b * LANES:(b + 1) * LANES] - c0   # (1, LANES)
        if bilinear:
            wx = wx_ref[:, b * LANES:(b + 1) * LANES]
            Cm = ((kc == ixr).astype(jnp.float32) * (1.0 - wx)
                  + (kc == ixr + 1).astype(jnp.float32) * wx)
        else:
            Cm = (kc == ixr).astype(jnp.float32)
        blk = jnp.dot(rowsel[:, c0:c0 + CW], Cm,
                      precision=jax.lax.Precision.HIGHEST,
                      preferred_element_type=jnp.float32)
        if value_scale != 1.0:
            blk = value_scale * blk
        out_ref[0, :, b * LANES:(b + 1) * LANES] = blk


def resample_static(img: jnp.ndarray, iy: np.ndarray, ix: np.ndarray,
                    value_scale: float = 1.0,
                    wy: Optional[np.ndarray] = None,
                    wx: Optional[np.ndarray] = None,
                    tile_rows: int = 64,
                    interpret: bool = False) -> jnp.ndarray:
    """Resample (C, H, W) or (H, W) ``img`` to (len(iy), len(ix)) using
    trace-time-constant per-axis indices.

    Nearest (wy/wx None): out[r, c] = value_scale * img[iy[r], ix[c]] —
    bit-identical to the two-take XLA path.  Bilinear: pass iy/ix as the
    FLOOR taps and wy/wx as the fractional weights (tap i gets 1-w, tap
    i+1 gets w; indices and ``index+1`` must be pre-clamped to the valid
    range, with w=0 where both taps collapse)."""
    squeeze = img.ndim == 2
    if squeeze:
        img = img[None]
    bilinear = wy is not None
    C, H, W = img.shape
    H2, W2 = len(iy), len(ix)
    W2P = _ceil_to(W2, LANES)
    WP = _ceil_to(W, LANES)

    iy = np.asarray(iy, np.int32)
    ix = np.asarray(ix, np.int32)
    iy1 = iy + 1 if bilinear else iy
    Hp_in = _ceil_to(H + (1 if bilinear else 0), 8)

    # Pick the output tile height so the working set fits scoped VMEM:
    # double-buffered input slab + output block + ~2 live row-selection
    # temporaries.  Down-scaling resamples need taller input windows per
    # output row, so TH shrinks with the scale factor.
    budget = 12 * 2 ** 20
    TH = max(8, tile_rows)
    while TH > 8:
        _iyp = np.concatenate([iy, np.full(_ceil_to(H2, TH) - H2, iy[-1],
                                           np.int32)])
        _iy1p = np.concatenate([iy1, np.full(_ceil_to(H2, TH) - H2,
                                             iy1[-1], np.int32)])
        _, BH_try = _plan_rows(_iyp, _iy1p, TH, _ceil_to(H2, TH), Hp_in)
        need = (2 * BH_try * WP + TH * W2P + 2 * TH * WP) * 4
        if need <= budget:
            break
        TH //= 2

    H2P = _ceil_to(H2, TH)
    ni = H2P // TH

    # pad index vectors with their last entry (pad outputs stay in-range
    # and are sliced off)
    iyp = np.concatenate([iy, np.full(H2P - H2, iy[-1], np.int32)])
    ixp = np.concatenate([ix, np.full(W2P - W2, ix[-1], np.int32)])
    iy1p = np.concatenate([iy1, np.full(H2P - H2, iy1[-1], np.int32)])

    starts, BH = _plan_rows(iyp, iy1p, TH, H2P, Hp_in)

    # column plan: per output 128-block, a static aligned source window
    CW = 0
    col_start = []
    for b in range(W2P // LANES):
        blk = ixp[b * LANES:(b + 1) * LANES]
        lo = (int(blk.min()) // LANES) * LANES
        hi = int(blk.max()) + (1 if bilinear else 0)
        col_start.append(lo)
        CW = max(CW, hi - lo + 1)
    # CW can exceed WP when a right-edge bilinear tap collapses at a
    # width that is already lane-aligned (hi == W == WP); the collapsed
    # tap carries weight 0 and a one-hot row with no hit contributes
    # exactly 0, so clamping the window to the padded width is lossless.
    CW = min(_ceil_to(CW, LANES), WP)
    col_start = [min(c, max(WP - CW, 0)) for c in col_start]

    inp = jnp.pad(img, ((0, 0), (0, Hp_in + BH - H), (0, WP - W)))
    if bilinear:
        wyv = np.concatenate([np.asarray(wy, np.float32),
                              np.zeros(H2P - H2, np.float32)])
        wxv = np.concatenate([np.asarray(wx, np.float32),
                              np.zeros(W2P - W2, np.float32)])
    else:
        wyv = np.zeros(H2P, np.float32)
        wxv = np.zeros(W2P, np.float32)

    kernel = functools.partial(
        _resample_kernel, C=C, BH=BH, TH=TH, W2P=W2P, CW=CW,
        col_start=tuple(col_start), value_scale=float(value_scale),
        bilinear=bilinear, ni=ni)
    out = pl.pallas_call(
        kernel,
        grid=(C, ni),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),      # input image (padded)
            pl.BlockSpec(memory_space=pltpu.SMEM),  # per-tile row starts
            pl.BlockSpec((TH, 1), lambda c, i: (i, 0),
                         memory_space=pltpu.VMEM),  # iy (padded)
            pl.BlockSpec((TH, 1), lambda c, i: (i, 0),
                         memory_space=pltpu.VMEM),  # wy
            pl.BlockSpec(memory_space=pltpu.VMEM),  # ix (1, W2P)
            pl.BlockSpec(memory_space=pltpu.VMEM),  # wx (1, W2P)
        ],
        out_specs=pl.BlockSpec((1, TH, W2P), lambda c, i: (c, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((C, H2P, W2P), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((2, BH, WP), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(inp, jnp.asarray(starts), jnp.asarray(iyp.reshape(H2P, 1)),
      jnp.asarray(wyv.reshape(H2P, 1)), jnp.asarray(ixp.reshape(1, W2P)),
      jnp.asarray(wxv.reshape(1, W2P)))
    out = out[:, :H2, :W2]
    return out[0] if squeeze else out


# ---------------------------------------------------------------------
# Texture-semantics wrappers (the CUDA coordinate conventions of
# ops/resample.py, evaluated at trace time)
# ---------------------------------------------------------------------

def _nearest_indices(n_out: int, n_in: int, coord_of) -> np.ndarray:
    return np.clip(np.floor(coord_of(np.arange(n_out) + 0.5)), 0,
                   n_in - 1).astype(np.int32)


def _bilinear_taps(n_out: int, n_in: int, coord_of):
    """CUDA linear filtering: weights from (coord - 0.5), both taps
    clamp-addressed.  Returns (i0, w) with i0 and i0+1 valid: where the
    XLA path clamps the taps to the same cell the weight collapses to 0."""
    f = coord_of(np.arange(n_out) + 0.5) - 0.5
    i0f = np.floor(f)
    w = (f - i0f).astype(np.float32)
    i0 = np.clip(i0f, 0, n_in - 1).astype(np.int32)
    i1 = np.clip(i0f + 1, 0, n_in - 1).astype(np.int32)
    # collapse: where clamping made i1 == i0 the pair (1-w)*x + w*x must
    # reproduce tex_gather's  x*(1-w) + x*w  EXACTLY; keep w and point the
    # second tap at i0 via w=... — tex_gather computes v0*(1-w)+v1*w with
    # v0==v1==x, which equals x*(1-w)+x*w in ITS order.  Using the same w
    # with both one-hots targeting i0/i0+1 would read a DIFFERENT second
    # cell, so remap: weight stays, but when i1==i0 fold both taps onto
    # i0 by zeroing w and using i0 (x*(1-0)+next*0 == x; matches to float
    # rounding since x*(1-w)+x*w rounds to x within 1 ulp).
    collapse = i1 == i0
    w = np.where(collapse, 0.0, w).astype(np.float32)
    i0 = np.where(collapse & (i0f < 0), 0, i0).astype(np.int32)
    # ensure i0+1 stays in the padded input for the top-edge collapse
    i0 = np.minimum(i0, n_in - 1).astype(np.int32)
    return i0, w


def resample_tex(img: jnp.ndarray, out_h: int, out_w: int, coord_of,
                 value_scale: float = 1.0, method: str = "nearest",
                 interpret: bool = False, row_off: int = 0,
                 col_off: int = 0) -> jnp.ndarray:
    """Axis-separable texture resample (CUDA texel-centre + clamp
    semantics) on the MXU kernel.  ``coord_of`` maps destination texel
    centres to source texel coordinates (same callback contract as
    ops/resample._separable_nearest).  ``row_off``/``col_off`` evaluate
    only a destination window (ops/resample.resample_coords contract)."""
    h, w = img.shape[-2], img.shape[-1]
    coord_y = (lambda t: coord_of(t + row_off)) if row_off else coord_of
    coord_x = (lambda t: coord_of(t + col_off)) if col_off else coord_of
    if method == "nearest":
        iy = _nearest_indices(out_h, h, coord_y)
        ix = _nearest_indices(out_w, w, coord_x)
        return resample_static(img, iy, ix, value_scale,
                               interpret=interpret)
    if method == "bilinear":
        iy, wy = _bilinear_taps(out_h, h, coord_y)
        ix, wx = _bilinear_taps(out_w, w, coord_x)
        return resample_static(img, iy, ix, value_scale, wy=wy, wx=wx,
                               interpret=interpret)
    raise ValueError(f"unknown method {method!r}")
