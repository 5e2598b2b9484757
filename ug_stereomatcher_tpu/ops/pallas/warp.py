"""Windowed warp (nearest + bilinear) as a Pallas TPU kernel.

Replaces the XLA per-element gather in ops.resample.warp_by_disparity
(itself the TPU-native form of warpAbyB, MatchLib.cu:499-549) for large
pyramid levels.  XLA's gather executes at ~10 ns/element on TPU — ~80% of
the whole iteration cost at 16MP — because element gathers are
index-processing bound.  Mosaic has no general 2-D vector gather ("Cannot
do int indexing"), but it DOES support dynamic lane gathers within a single
128-lane vector register (jnp.take_along_axis(..., axis=-1) over a
(rows, 128) block).

The kernel therefore evaluates the warp as an exact joint one-hot over a
bounded search window:

    out[r, c] = src[iy[r, c], ix[r, c]]
      with  iy = clamp(floor(r + 0.5 + dv), 0, H-1), clamped into r +- VH
            ix = clamp(floor(c + 0.5 + dh), 0, W-1), clamped into a
                 +-HBLK 128-lane-block window around c's block

    for each 8-row candidate band b the block's offsets span (DYNAMIC
    fori_loop — Mosaic needs dynamic sublane offsets provably 8-aligned,
    so candidates sweep in bands of 8):
      for each 128-wide source block s in [-HBLK, HBLK] the block's
      column targets span (lax.cond skip):
        slab = vmem[8b : 8b+TH+8, s0 : s0+128]        # aligned slice
        for r in 0..7:                                 # static unroll
          g = take_along_axis(slab[r:r+TH], ix - s0, axis=1)
          out = where((iy - row == 8b-VH+r) & (ix in block), g, out)

Both sweeps are range-adaptive: disparity fields are smooth, so almost
every (32, 128) block touches one band and one or two source blocks —
wide windows cost VMEM + DMA rows, not sweep time.  That is what lets the
default window be wide enough that natural scenes' outlier offsets stay
inside it and the overflow guard (match.warp_for_level) almost never has
to take the slow exact path.

Selection is overwrite (not add), so duplicate candidates from clamped
block starts at the image edge are harmless.  Within the window the result
is bit-identical to the XLA gather (bilinear: identical op order, see
below); per-element offsets beyond the window clamp to the window edge.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128
BAND = 8  # candidate band height = Mosaic's sublane alignment unit


def _ceil_to(x: int, m: int) -> int:
    return -(-x // m) * m


def warp_halo_rows(max_dy: int) -> int:
    """Vertical halo rows (VH) the windowed kernel uses for ``max_dy`` —
    row-sharded callers must attach exactly this many real neighbour rows."""
    return _ceil_to(int(max_dy), BAND)


def window_reach(max_dy: int, max_dx: int) -> Tuple[float, float]:
    """Largest |row offset| and |column offset| (in pixels) that
    :func:`warp_windowed` resolves exactly for *every* pixel with the
    given window parameters.

    Vertical: candidates span +-VH rows, and ``floor(0.5 + dv)`` stays in
    [-VH, VH] for |dv| <= VH - 1 (conservative by half a pixel; bilinear's
    +1 tap row is covered by the same bound).  Horizontal: the
    source-block window spans +-HBLK 128-lane blocks around each pixel's
    own block, so any |dh| <= HBLK*128 - 1 lands in a candidate block for
    every lane position within the block.  Offsets beyond the reach CLAMP
    to the window edge — callers that need the exact unbounded gather
    (warpAbyB's texture fetch, MatchLib.cu:499-549) must detect
    ``max|disp| > reach`` and fall back (see match.warp_for_level)."""
    vh = warp_halo_rows(max_dy)
    hblk = max(1, -(-int(max_dx) // LANES))
    return float(vh - 1), float(hblk * LANES - 1)


def sweep_nearest(buf, dvb, dhb, c0, lo, hi, out_row0, *, H, W, TH, VH,
                  HBLK, voff=None, vcap=None, dyn_cols=0, row_hi=None):
    """Banded one-hot nearest sweep for one 128-lane column block.

    Static mode (``voff is None``): buf is a VMEM ref whose row 0 holds
    source row ``out_row0 - VH`` (edge-clamped) and which extends at least
    ``TH + 2*VH + BAND`` rows at full padded width.  dvb/dhb: (TH, LANES)
    disparity values for output rows [out_row0, out_row0+TH), columns
    [c0, c0+LANES).  c0/lo/hi may be Python ints or traced lane-aligned
    scalars.  Returns the (TH, LANES) warped block.  Shared by the tiled
    warp kernel and the level-resident kernel (ops/pallas/level.py).

    Dynamic mode (``voff`` given, a traced BAND-aligned scalar): buf row 0
    holds source row ``out_row0 - voff`` and extends ``vcap`` rows; the
    caller (plan_dyn_warp) guarantees every gather row of the block lands
    in [out_row0 - voff, out_row0 - voff + vcap) — the safety clips below
    only engage on caller error and produce in-bounds garbage, never OOB.
    With ``dyn_cols = NB > 0`` the horizontal candidate blocks are NB
    lane-blocks upward from align128(min ix) instead of the static
    ±HBLK window around c0 — removing the absolute column-offset limit
    (spread-bounded instead, guarded by the caller)."""
    rloc = jax.lax.broadcasted_iota(jnp.int32, (TH, LANES), 0)
    cloc = jax.lax.broadcasted_iota(jnp.int32, (TH, LANES), 1)
    ys = (rloc + out_row0).astype(jnp.float32) + 0.5 + dvb
    xs = (cloc + c0).astype(jnp.float32) + 0.5 + dhb
    iyb = jnp.clip(jnp.floor(ys), 0, H - 1).astype(jnp.int32)
    ixb = jnp.clip(jnp.floor(xs), 0, W - 1).astype(jnp.int32)
    dyn = voff is not None
    if dyn:
        voff_ = voff
        kb = jnp.clip(iyb - (out_row0 + rloc), -voff_,
                      vcap - TH - BAND - voff_)
    else:
        voff_ = VH
        kb = jnp.clip(iyb - (out_row0 + rloc), -VH, VH)
        # clamp the horizontal read into the reachable window so every
        # pixel hits exactly one (band, s) candidate — offsets beyond the
        # window clamp to its edge (the documented contract) instead of
        # falling to the zero init
        ixb = jnp.clip(ixb, lo, hi + LANES - 1)
    if dyn and row_hi is not None:
        # exclude tile-pad rows (zero disparity, coords unrelated to the
        # real field, outputs discarded) from the base/range decisions —
        # the plan excludes them too, and a pad pixel pulling the block's
        # column base away from the real field would break coverage
        vmask = (rloc + out_row0) < row_hi
        # substitute must itself be in the clip window (0 may not be,
        # e.g. strictly-downward fields have voff < 0)
        ksub = jnp.clip(jnp.int32(0), -voff_, vcap - TH - BAND - voff_)
        ixmin = jnp.min(jnp.where(vmask, ixb, 2 ** 30))
        ixmax = jnp.max(jnp.where(vmask, ixb, -1))
        kmin = jnp.min(jnp.where(vmask, kb, ksub))
        kmax = jnp.max(jnp.where(vmask, kb, ksub))
    else:
        ixmin = jnp.min(ixb)
        ixmax = jnp.max(ixb)
        kmin = jnp.min(kb)
        kmax = jnp.max(kb)
    # band index of candidate kk is (kk + voff) // BAND
    bmin = (kmin + voff_) // BAND
    bmax = (kmax + voff_) // BAND
    acc = jnp.zeros((TH, LANES), jnp.float32)

    if dyn_cols:
        cbase = pl.multiple_of((ixmin // LANES) * LANES, LANES)
        col_starts = [pl.multiple_of(cbase + s * LANES, LANES)
                      for s in range(dyn_cols)]
    else:
        col_starts = [pl.multiple_of(jnp.clip(c0 + s * LANES, lo, hi),
                                     LANES)
                      for s in range(-HBLK, HBLK + 1)]

    def band_body(b, a):
        roff = pl.multiple_of(b * BAND, BAND)
        for s0 in col_starts:

            def use(a2, s0=s0):
                slab = buf[pl.ds(roff, TH + BAND),
                           pl.ds(s0, LANES)]
                ixr = jnp.clip(ixb - s0, 0, LANES - 1)
                inb = (ixb >= s0) & (ixb < s0 + LANES)
                for r in range(BAND):
                    kk = b * BAND + r - voff_

                    # per-candidate skip: smooth fields span 1-2 distinct
                    # kk per block, so most of the band's 8 gathers are
                    # skipped (the round-1 2.6x win, kept under the
                    # banded alignment structure)
                    def hit(a3, r=r, kk=kk):
                        g = jnp.take_along_axis(
                            slab[r:r + TH], ixr, axis=1)
                        return jnp.where((kb == kk) & inb,
                                         g, a3)
                    a2 = jax.lax.cond(
                        (kmin <= kk) & (kk <= kmax),
                        hit, lambda a3: a3, a2)
                return a2
            a = jax.lax.cond(
                (s0 <= ixmax) & (s0 + LANES > ixmin),
                use, lambda a2: a2, a)
        return a
    return jax.lax.fori_loop(bmin, bmax + 1, band_body, acc)


def sweep_bilinear(buf, dvb, dhb, c0, lo, hi, out_row0, *, H, W, TH, VH,
                   HBLK, voff=None, vcap=None, dyn_cols=0, row_hi=None):
    """Bilinear variant of :func:`sweep_nearest` (CUDA tex linear
    filtering: weights from coord-0.5, each of the 4 taps clamp-addressed).
    Four one-hot tap accumulators share the same band sweep; tap rows
    (iy0, iy1) and columns (ix0, ix1) each carry their own hit condition,
    so cross-block / cross-band neighbours resolve exactly.  Op order
    matches tex_gather exactly: (coord + 0.5 + d) - 0.5, NOT coord + d —
    the intermediate rounding differs and the tap weights (hence output
    bits) with it.  ``voff``/``vcap``/``dyn_cols`` select the dynamic
    window mode exactly as in :func:`sweep_nearest` (spans computed over
    both tap rows/columns)."""
    rloc = jax.lax.broadcasted_iota(jnp.int32, (TH, LANES), 0)
    cloc = jax.lax.broadcasted_iota(jnp.int32, (TH, LANES), 1)
    yf = ((rloc + out_row0).astype(jnp.float32) + 0.5 + dvb) - 0.5
    xf = ((cloc + c0).astype(jnp.float32) + 0.5 + dhb) - 0.5
    y0f = jnp.floor(yf)
    x0f = jnp.floor(xf)
    ay = yf - y0f
    ax = xf - x0f
    iy0 = jnp.clip(y0f, 0, H - 1).astype(jnp.int32)
    iy1 = jnp.clip(y0f + 1.0, 0, H - 1).astype(jnp.int32)
    ix0 = jnp.clip(x0f, 0, W - 1).astype(jnp.int32)
    ix1 = jnp.clip(x0f + 1.0, 0, W - 1).astype(jnp.int32)
    dyn = voff is not None
    if dyn:
        voff_ = voff
        klo, khi = -voff_, vcap - TH - BAND - voff_
    else:
        voff_ = VH
        klo, khi = -VH, VH
        ix0 = jnp.clip(ix0, lo, hi + LANES - 1)
        ix1 = jnp.clip(ix1, lo, hi + LANES - 1)
    kb0 = jnp.clip(iy0 - (out_row0 + rloc), klo, khi)
    kb1 = jnp.clip(iy1 - (out_row0 + rloc), klo, khi)
    if dyn and row_hi is not None:
        # tile-pad rows excluded from base/range decisions (see
        # sweep_nearest); substitute must be inside the clip window
        vmask = (rloc + out_row0) < row_hi
        ksub = jnp.clip(jnp.int32(0), klo, khi)
        ixmin = jnp.min(jnp.where(vmask, ix0, 2 ** 30))
        ixmax = jnp.max(jnp.where(vmask, ix1, -1))
        kmin0 = jnp.min(jnp.where(vmask, kb0, ksub))
        kmax0 = jnp.max(jnp.where(vmask, kb0, ksub))
        kmin1 = jnp.min(jnp.where(vmask, kb1, ksub))
        kmax1 = jnp.max(jnp.where(vmask, kb1, ksub))
    else:
        ixmin = jnp.min(ix0)
        ixmax = jnp.max(ix1)
        kmin0 = jnp.min(kb0)
        kmax0 = jnp.max(kb0)
        kmin1 = jnp.min(kb1)
        kmax1 = jnp.max(kb1)
    bmin = (kmin0 + voff_) // BAND
    bmax = (kmax1 + voff_) // BAND
    zero = jnp.zeros((TH, LANES), jnp.float32)

    if dyn_cols:
        cbase = pl.multiple_of((ixmin // LANES) * LANES, LANES)
        col_starts = [pl.multiple_of(cbase + s * LANES, LANES)
                      for s in range(dyn_cols)]
    else:
        col_starts = [pl.multiple_of(jnp.clip(c0 + s * LANES, lo, hi),
                                     LANES)
                      for s in range(-HBLK, HBLK + 1)]

    def band_body(b, a4):
        roff = pl.multiple_of(b * BAND, BAND)
        for s0 in col_starts:

            def use(a4i, s0=s0):
                a00, a01, a10, a11 = a4i
                slab = buf[pl.ds(roff, TH + BAND),
                           pl.ds(s0, LANES)]
                ixr0 = jnp.clip(ix0 - s0, 0, LANES - 1)
                ixr1 = jnp.clip(ix1 - s0, 0, LANES - 1)
                in0 = (ix0 >= s0) & (ix0 < s0 + LANES)
                in1 = (ix1 >= s0) & (ix1 < s0 + LANES)
                for r in range(BAND):
                    kk = b * BAND + r - voff_

                    # per-candidate skip, as in the nearest path: only kk
                    # values some tap row actually targets pay for their
                    # two gathers
                    def hit(a3, r=r, kk=kk):
                        b00, b01, b10, b11 = a3
                        seg = slab[r:r + TH]
                        g0 = jnp.take_along_axis(seg, ixr0, axis=1)
                        g1 = jnp.take_along_axis(seg, ixr1, axis=1)
                        b00 = jnp.where((kb0 == kk) & in0, g0, b00)
                        b01 = jnp.where((kb0 == kk) & in1, g1, b01)
                        b10 = jnp.where((kb1 == kk) & in0, g0, b10)
                        b11 = jnp.where((kb1 == kk) & in1, g1, b11)
                        return (b00, b01, b10, b11)
                    a4i = jax.lax.cond(
                        ((kmin0 <= kk) & (kk <= kmax0))
                        | ((kmin1 <= kk) & (kk <= kmax1)),
                        hit, lambda a3: a3, a4i)
                return a4i
            a4 = jax.lax.cond(
                (s0 <= ixmax) & (s0 + LANES > ixmin),
                use, lambda a4i: a4i, a4)
        return a4
    accs = jax.lax.fori_loop(bmin, bmax + 1, band_body,
                             (zero, zero, zero, zero))
    a00, a01, a10, a11 = accs
    top = a00 * (1.0 - ax) + a01 * ax
    bot = a10 * (1.0 - ax) + a11 * ax
    return top * (1.0 - ay) + bot * ay


def _warp_kernel(imgp_ref, dh_ref, dv_ref, row0_ref, out_ref, *, H, W, Wp,
                 TH, VH, HBLK, n_cblk, bilinear):
    c = pl.program_id(0)   # channel (grid = (C, Hp/TH))
    i = pl.program_id(1)   # row-tile index
    r0 = i * TH
    # global row of this block's first output row: 0 for the unsharded
    # path; the shard's row offset when the caller row-shards the image
    # (the buffer stays locally indexed — only the gather target row and
    # the clamp range are global)
    row0 = row0_ref[0, 0]
    bh = TH + 2 * VH + BAND   # buffer rows (last band reads BAND past 2VH)
    sweep = sweep_bilinear if bilinear else sweep_nearest

    def body(buf, sem):
        cp = pltpu.make_async_copy(
            imgp_ref.at[c, pl.ds(r0, bh), :], buf, sem)
        cp.start()
        cp.wait()

        def col_block(cblk, carry):
            c0 = pl.multiple_of(cblk * LANES, LANES)
            dvb = dv_ref[:, pl.ds(c0, LANES)]
            dhb = dh_ref[:, pl.ds(c0, LANES)]
            lo = jnp.maximum(c0 - HBLK * LANES, 0)
            hi = jnp.minimum(c0 + HBLK * LANES, Wp - LANES)
            out_ref[0, :, pl.ds(c0, LANES)] = sweep(
                buf, dvb, dhb, c0, lo, hi, r0 + row0,
                H=H, W=W, TH=TH, VH=VH, HBLK=HBLK)
            return carry

        jax.lax.fori_loop(0, n_cblk, col_block, 0)

    pl.run_scoped(body, pltpu.VMEM((TH + 2 * VH + BAND, Wp), jnp.float32),
                  pltpu.SemaphoreType.DMA)


@functools.partial(jax.jit, static_argnames=("max_dy", "max_dx", "tile_rows",
                                             "interpret", "row_halo",
                                             "global_h", "method"))
def warp_windowed(img: jnp.ndarray, disp_x: jnp.ndarray,
                  disp_y: jnp.ndarray, max_dy: int = 8,
                  max_dx: int = 256, tile_rows: int = 64,
                  interpret: bool = False, row_halo: bool = False,
                  row0=None, global_h: int = None,
                  method: str = "nearest") -> jnp.ndarray:
    """Windowed warp.  img: (C, H, W) or (H, W); disp_x/disp_y: (H, W).
    Exact vs the XLA gather (``ops.resample.warp_by_disparity`` with the
    same ``method``) for |row offset| <= max_dy and column offsets within
    the +-ceil(max_dx/128) source-block window; larger offsets clamp to
    the window edge.  ``method="bilinear"`` evaluates CUDA linear
    filtering (weights from coord-0.5, 4 clamp-addressed taps) with four
    one-hot tap accumulators sharing one candidate sweep — the window
    reach is identical to nearest.

    Row-sharded mode (``row_halo=True``): ``img`` is a local row block with
    VH = warp_halo_rows(max_dy) REAL halo rows already attached above and
    below (neighbour rows from a prior ``ppermute``), disp_x/disp_y are the
    local (Hl, W) block, ``row0`` is the block's global first row (traced)
    and ``global_h`` the full image height.  Gather targets and clamps then
    use global coordinates, so each shard's output is exactly the matching
    row slice of the unsharded warp."""
    squeeze = img.ndim == 2
    if squeeze:
        img = img[None]
    TH = tile_rows
    VH = warp_halo_rows(max_dy)
    HBLK = max(1, -(-int(max_dx) // LANES))
    C = img.shape[0]
    Hl = disp_x.shape[0]          # output rows (local block in halo mode)
    W = disp_x.shape[1]
    H = int(global_h) if row_halo else Hl   # clamp range = global image
    Hp = _ceil_to(Hl, TH)
    Wp = _ceil_to(W, LANES)
    n_cblk = Wp // LANES

    if row_halo:
        # halo rows are real data; add band slack + tile/lane alignment
        imgp = jnp.pad(img, ((0, 0), (0, BAND + (Hp - Hl)), (0, Wp - W)),
                       mode="edge")
        r0v = jnp.asarray(row0, jnp.int32).reshape(1, 1)
    else:
        imgp = jnp.pad(img, ((0, 0), (VH, VH + BAND + (Hp - Hl)),
                             (0, Wp - W)), mode="edge")
        r0v = jnp.zeros((1, 1), jnp.int32)
    dhp = jnp.pad(disp_x, ((0, Hp - Hl), (0, Wp - W)))
    dvp = jnp.pad(disp_y, ((0, Hp - Hl), (0, Wp - W)))

    if method not in ("nearest", "bilinear"):
        raise ValueError(f"unknown warp method {method!r}")
    kernel = functools.partial(_warp_kernel, H=H, W=W, Wp=Wp, TH=TH, VH=VH,
                               HBLK=HBLK, n_cblk=n_cblk,
                               bilinear=(method == "bilinear"))
    out = pl.pallas_call(
        kernel,
        grid=(C, Hp // TH),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((TH, Wp), lambda c, i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TH, Wp), lambda c, i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((1, TH, Wp), lambda c, i: (c, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((C, Hp, Wp), jnp.float32),
        interpret=interpret,
    )(imgp, dhp, dvp, r0v)
    out = out[:, :Hl, :W]
    return out[0] if squeeze else out


def warp_nearest_windowed(img, disp_x, disp_y, **kw):
    """Nearest-mode alias of :func:`warp_windowed` (original entry point)."""
    return warp_windowed(img, disp_x, disp_y, method="nearest", **kw)


# ---------------------------------------------------------------------------
# Dynamic-window warp: per-row-tile source windows + double-buffered DMA.
#
# The static kernel above DMAs TH + 2*VH + BAND source rows per tile —
# VH = 160 at level 0, i.e. ~1.2 GB of slab traffic per 16MP warp, waited on
# serially (double-buffering two 7.8 MB slabs would blow the 16 MB scoped
# VMEM).  But disparity fields are SMOOTH: each 64-row tile's gather span is
# tile height + field spread, a few dozen rows.  The dynamic path measures
# the live field once (plan_dyn_warp — the same full-plane pass the static
# path already spends on its overflow guard), positions a fixed-capacity
# window per tile, and double-buffers the now-small slabs across grid steps.
# Absolute offsets become unbounded (the window follows the field); only the
# per-tile SPREAD is capacity-limited, with the planner's ok flag routing
# out-of-budget fields to the exact XLA gather (same fallback contract as
# match.warp_for_level).  Horizontal candidates are likewise based at
# align128(min ix) per (tile, lane-block) in-kernel — NB blocks upward —
# instead of a +-HBLK window around the output block.
# ---------------------------------------------------------------------------

# Capacity rows beyond the tile (CR = tile_rows + this): bounds the
# per-row-tile vertical gather SPREAD at CR - tile_rows - 15.  Sized from
# the measured free-running 16MP bench fields (tools/probe_spreads.py):
# worst per-tile span 103 at L0 (73 at L1, 52 at L2 — per-pixel outliers
# land in a few tiles; the p95 tile spans only ~28), so 128 gives a 113
# budget with ~10% margin.  Over-budget fields tier down to the static
# windowed kernel (match.warp_for_level), not the slow exact gather.
DYN_CAP_SLACK = 128
DYN_COL_BLOCKS = 3     # NB: per-block horizontal window = NB * 128 lanes
DYN_VMEM_BUDGET = 15 * 2 ** 20 + 2 ** 19


def dyn_vmem_bytes(width: int, tile_rows: int = 64,
                   cap_rows: int = None) -> int:
    """Rough VMEM footprint of the dynamic kernel (slab double-buffer +
    pipelined dh/dv/out blocks) for gating against DYN_VMEM_BUDGET."""
    Wp = _ceil_to(width, LANES)
    CR = cap_rows or tile_rows + DYN_CAP_SLACK
    return 4 * Wp * (2 * CR + 6 * tile_rows)


def plan_dyn_warp(disp_x: jnp.ndarray, disp_y: jnp.ndarray, H: int, W: int,
                  tile_rows: int = 64, cap_rows: int = None,
                  n_col_blocks: int = DYN_COL_BLOCKS,
                  method: str = "nearest", row0=None,
                  halo_rows: int = 0):
    """Per-row-tile dynamic window plan for :func:`warp_windowed_dyn`.

    Returns ``(voffs, ok)``: ``voffs`` is an (ni,) int32 array of
    BAND-aligned vertical window offsets (tile i's slab starts voffs[i]
    rows above its first output row), and ``ok`` is a scalar bool — True
    iff every tile's vertical gather span fits ``cap_rows`` AND every
    (tile, 128-lane block)'s horizontal span fits ``n_col_blocks`` lane
    blocks.  When ok is False the dynamic kernel's safety clips would
    produce in-bounds garbage; callers MUST route to an exact path
    instead (match.warp_for_level tiers dyn -> static windowed ->
    unbounded gather).  This planning pass plays the role of the static
    path's absolute-reach overflow guard — same cost (one fused pass
    over the disparity planes), spread-bounded instead of
    magnitude-bounded.

    Row-sharded mode (``row0`` given, a traced scalar): disp_x/disp_y are
    a shard's local (Hl, W) blocks, ``H`` is the GLOBAL image height, and
    the source buffer is the local image block with ``halo_rows`` REAL
    neighbour rows attached above and below (the same halo-exchange
    contract as warp_windowed's row_halo mode).  Windows must then also
    fit inside the exchanged halo — tiles whose field reaches beyond it
    flip ok to False (the caller tiers down), so exactness never depends
    on rows a shard does not hold."""
    TH = tile_rows
    CR = cap_rows or TH + DYN_CAP_SLACK
    NB = n_col_blocks
    Hl = disp_x.shape[0]
    sharded = row0 is not None
    r0g = jnp.asarray(row0 if sharded else 0, jnp.int32)
    Hp = _ceil_to(Hl, TH)
    Wp = _ceil_to(W, LANES)
    ni = Hp // TH
    ncb = Wp // LANES
    dhp = jnp.pad(disp_x, ((0, Hp - Hl), (0, Wp - W)))
    dvp = jnp.pad(disp_y, ((0, Hp - Hl), (0, Wp - W)))
    r = jax.lax.broadcasted_iota(jnp.int32, (Hp, Wp), 0)
    c = jax.lax.broadcasted_iota(jnp.int32, (Hp, Wp), 1)
    rg = r + r0g                      # global output row
    rf = rg.astype(jnp.float32)
    cf = c.astype(jnp.float32)
    if method == "nearest":
        iylo = iyhi = jnp.clip(jnp.floor(rf + 0.5 + dvp), 0,
                               H - 1).astype(jnp.int32)
        ixlo = ixhi = jnp.clip(jnp.floor(cf + 0.5 + dhp), 0,
                               W - 1).astype(jnp.int32)
    elif method == "bilinear":
        y0 = jnp.floor((rf + 0.5 + dvp) - 0.5)
        x0 = jnp.floor((cf + 0.5 + dhp) - 0.5)
        iylo = jnp.clip(y0, 0, H - 1).astype(jnp.int32)
        iyhi = jnp.clip(y0 + 1.0, 0, H - 1).astype(jnp.int32)
        ixlo = jnp.clip(x0, 0, W - 1).astype(jnp.int32)
        ixhi = jnp.clip(x0 + 1.0, 0, W - 1).astype(jnp.int32)
    else:
        raise ValueError(f"unknown warp method {method!r}")
    klo = iylo - rg
    khi = iyhi - rg
    # Tile-pad rows (local rows >= Hl up to the TH multiple) and lane-pad
    # columns (>= W) carry zero disparity and clip against the image
    # edges, producing coordinates unrelated to the real field; their
    # outputs are discarded by the final slice, and the kernel's safety
    # clips keep their reads in-bounds — so exclude them from EVERY plan
    # reduction (vertical spans, the sharded halo check, AND the
    # per-block horizontal spans; leaving them in any one check silently
    # disables the dynamic path for shapes with padded tiles).
    pad_row = r >= Hl
    pad_any = pad_row | (c >= W)
    klo = jnp.where(pad_row, 0, klo)
    khi = jnp.where(pad_row, 0, khi)
    kmin = klo.reshape(ni, TH, Wp).min(axis=(1, 2))
    kmax = khi.reshape(ni, TH, Wp).max(axis=(1, 2))
    voffs = (-jnp.floor_divide(kmin, BAND) * BAND).astype(jnp.int32)
    ok_v = jnp.all(kmax + voffs + TH + BAND <= CR)
    if sharded:
        # windows must stay inside the exchanged halo: buffer rows span
        # global [row0 - halo_rows, row0 + Hl + halo_rows)
        iymin = jnp.where(pad_row, r0g, iylo).reshape(ni, TH, Wp).min()
        iymax = jnp.where(pad_row, r0g, iyhi).reshape(ni, TH, Wp).max()
        tile_r0 = jnp.arange(ni, dtype=jnp.int32) * TH
        ok_v = (ok_v
                & (iymin >= r0g - halo_rows)
                & (iymax <= r0g + Hl + halo_rows - 1)
                # slab start must not run off the buffer top
                & jnp.all(voffs <= tile_r0 + halo_rows))
    big = jnp.int32(2 ** 30)
    ixmin = (jnp.where(pad_any, big, ixlo)
             .reshape(ni, TH, ncb, LANES).min(axis=(1, 3)))
    ixmax = (jnp.where(pad_any, -1, ixhi)
             .reshape(ni, TH, ncb, LANES).max(axis=(1, 3)))
    # exact coverage criterion: the kernel bases its NB blocks at
    # align128(min ix), so the last covered column is that + NB*128 - 1.
    # A (tile, block) whose lanes are ALL pad keeps (big, -1) and passes
    # vacuously — its outputs are discarded either way.
    ok_h = jnp.all(ixmax - jnp.floor_divide(ixmin, LANES) * LANES
                   <= NB * LANES - 1)
    return voffs, ok_v & ok_h


def _warp_kernel_dyn(imgp_ref, dh_ref, dv_ref, voff_ref, row0_ref, out_ref,
                     bufs, sems, *, H, W, Hl, Wp, TH, PT, CR, NB, n_cblk,
                     ni, nsteps, bilinear):
    g = pl.program_id(0)        # flattened (channel, row-tile) step
    i = g % ni
    r0 = i * TH
    # global row of this tile's first output row (0 unsharded; the shard
    # offset in row-sharded mode — gather coords are global, the buffer
    # stays locally indexed)
    row0 = row0_ref[0, 0]
    sweep = sweep_bilinear if bilinear else sweep_nearest

    def dma(slot, g2):
        c2 = g2 // ni
        i2 = g2 % ni
        base = pl.multiple_of(i2 * TH + PT - voff_ref[0, i2], BAND)
        return pltpu.make_async_copy(
            imgp_ref.at[c2, pl.ds(base, CR), :], bufs.at[slot],
            sems.at[slot])

    # Double-buffered slabs: tile g+1's copy runs behind tile g's sweep,
    # so the (now small) slab DMA never lands on the critical path — the
    # static kernel's big slabs preclude this (2 slots would blow VMEM).
    @pl.when(g == 0)
    def _():
        dma(0, 0).start()

    @pl.when(g + 1 < nsteps)
    def _():
        dma((g + 1) % 2, g + 1).start()

    slot = g % 2
    dma(slot, g).wait()
    voff = voff_ref[0, i]

    def col_block(cblk, carry):
        c0 = pl.multiple_of(cblk * LANES, LANES)
        dvb = dv_ref[:, pl.ds(c0, LANES)]
        dhb = dh_ref[:, pl.ds(c0, LANES)]
        out_ref[0, :, pl.ds(c0, LANES)] = sweep(
            bufs.at[slot], dvb, dhb, c0, 0, 0, r0 + row0,
            H=H, W=W, TH=TH, VH=0, HBLK=0, voff=voff, vcap=CR,
            dyn_cols=NB, row_hi=row0 + Hl)
        return carry

    jax.lax.fori_loop(0, n_cblk, col_block, 0)


@functools.partial(jax.jit, static_argnames=("tile_rows", "cap_rows",
                                             "n_col_blocks", "interpret",
                                             "method", "row_halo",
                                             "global_h", "halo_rows"))
def warp_windowed_dyn(img: jnp.ndarray, disp_x: jnp.ndarray,
                      disp_y: jnp.ndarray, voffs: jnp.ndarray,
                      tile_rows: int = 64, cap_rows: int = None,
                      n_col_blocks: int = DYN_COL_BLOCKS,
                      interpret: bool = False,
                      method: str = "nearest", row_halo: bool = False,
                      row0=None, global_h: int = None,
                      halo_rows: int = 0) -> jnp.ndarray:
    """Dynamic-window warp.  img: (C, H, W) or (H, W); disp_x/disp_y:
    (H, W); voffs: the (ni,) plan from :func:`plan_dyn_warp` (same
    tile_rows/cap_rows/n_col_blocks/method — capacities are part of the
    plan).  Exact vs the XLA gather (``ops.resample.warp_by_disparity``)
    whenever the plan's ok flag is True, for ANY absolute offset; callers
    must not use the output when ok was False (in-bounds garbage).  Same
    sweep maths as :func:`warp_windowed` — only the window placement and
    slab pipelining differ (warpAbyB parity contract unchanged,
    MatchLib.cu:499-549).

    Row-sharded mode (``row_halo=True``): ``img`` is a local row block
    with ``halo_rows`` REAL halo rows attached above and below
    (neighbour rows from a prior ``ppermute``), disp_x/disp_y are the
    local (Hl, W) blocks, ``row0`` the block's global first row (traced)
    and ``global_h`` the image height — the same contract as
    :func:`warp_windowed`'s row_halo mode, with the plan (row0 passed to
    plan_dyn_warp) guaranteeing every window fits the exchanged halo."""
    squeeze = img.ndim == 2
    if squeeze:
        img = img[None]
    TH = tile_rows
    CR = cap_rows or TH + DYN_CAP_SLACK
    NB = n_col_blocks
    C = img.shape[0]
    Hl, W = disp_x.shape
    H = int(global_h) if row_halo else Hl
    Hp = _ceil_to(Hl, TH)
    Wp = _ceil_to(W, LANES)
    ni = Hp // TH
    n_cblk = Wp // LANES
    if row_halo:
        if halo_rows % BAND:
            raise ValueError(f"halo_rows must be BAND-aligned, got "
                             f"{halo_rows}")
        PT = halo_rows   # real halo rows play the top-pad role
        r0v = jnp.asarray(row0, jnp.int32).reshape(1, 1)
    else:
        PT = TH + BAND   # top pad: worst-case window start is base >= 2
        r0v = jnp.zeros((1, 1), jnp.int32)
    PB = CR          # bottom pad: base always leaves CR in-bounds rows
    if method not in ("nearest", "bilinear"):
        raise ValueError(f"unknown warp method {method!r}")

    if row_halo:
        imgp = jnp.pad(img, ((0, 0), (0, PB + (Hp - Hl)), (0, Wp - W)),
                       mode="edge")
    else:
        imgp = jnp.pad(img, ((0, 0), (PT, PB + (Hp - Hl)), (0, Wp - W)),
                       mode="edge")
    dhp = jnp.pad(disp_x, ((0, Hp - Hl), (0, Wp - W)))
    dvp = jnp.pad(disp_y, ((0, Hp - Hl), (0, Wp - W)))
    voffs2 = jnp.asarray(voffs, jnp.int32).reshape(1, ni)

    kernel = functools.partial(
        _warp_kernel_dyn, H=H, W=W, Hl=Hl, Wp=Wp, TH=TH, PT=PT, CR=CR,
        NB=NB, n_cblk=n_cblk, ni=ni, nsteps=C * ni,
        bilinear=(method == "bilinear"))
    out = pl.pallas_call(
        kernel,
        grid=(C * ni,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((TH, Wp), lambda g: (g % ni, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TH, Wp), lambda g: (g % ni, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((1, TH, Wp), lambda g: (g // ni, g % ni, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((C, Hp, Wp), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((2, CR, Wp), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(imgp, dhp, dvp, voffs2, r0v)
    out = out[:, :Hl, :W]
    return out[0] if squeeze else out
