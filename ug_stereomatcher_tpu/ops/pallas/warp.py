"""Windowed nearest-neighbour warp as a Pallas TPU kernel.

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

    for each vertical candidate kk in [-VH, VH]:
      for each 128-wide source block s in [-HBLK, HBLK]:
        seg = vmem[VH+kk : VH+kk+TH, s0 : s0+128]     # slice, no gather
        g   = take_along_axis(seg, ix - s0, axis=1)   # in-vreg gather
        out = where((iy - r == kk) & (ix in block), g, out)

Selection is overwrite (not add), so duplicate candidates from clamped
block starts at the image edge are harmless.  Within the window the result
is bit-identical to the XLA gather; per-element offsets beyond the window
clamp to the window edge (the caller scales the window by
(1/sqrt(2))^level to track how scene disparity shrinks up the pyramid).
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


def _ceil_to(x: int, m: int) -> int:
    return -(-x // m) * m


def warp_halo_rows(max_dy: int) -> int:
    """Vertical halo rows (VH) the windowed kernel uses for ``max_dy`` —
    row-sharded callers must attach exactly this many real neighbour rows."""
    return _ceil_to(int(max_dy), 4)


def window_reach(max_dy: int, max_dx: int) -> Tuple[float, float]:
    """Largest |row offset| and |column offset| (in pixels) that
    :func:`warp_nearest_windowed` resolves exactly for *every* pixel with
    the given window parameters.

    Vertical: candidates span +-VH rows, and ``floor(0.5 + dv)`` stays in
    [-VH, VH] for |dv| <= VH - 1 (conservative by half a pixel).
    Horizontal: the source-block window spans +-HBLK 128-lane blocks
    around each pixel's own block, so any |dh| <= HBLK*128 - 1 lands in a
    candidate block for every lane position within the block.  Offsets
    beyond the reach CLAMP to the window edge — callers that need the
    exact unbounded gather (warpAbyB's texture fetch, MatchLib.cu:499-549)
    must detect ``max|disp| > reach`` and fall back (see
    match.warp_for_level)."""
    vh = _ceil_to(int(max_dy), 4)
    hblk = max(1, -(-int(max_dx) // LANES))
    return float(vh - 1), float(hblk * LANES - 1)


def _warp_kernel(imgp_ref, dh_ref, dv_ref, row0_ref, out_ref, *, H, W, Wp,
                 TH, VH, HBLK, n_cblk):
    c = pl.program_id(0)   # channel (grid = (C, Hp/TH))
    i = pl.program_id(1)   # row-tile index
    r0 = i * TH
    # global row of this block's first output row: 0 for the unsharded
    # path; the shard's row offset when the caller row-shards the image
    # (the buffer stays locally indexed — only the gather target row and
    # the clamp range are global)
    row0 = row0_ref[0, 0]

    def body(buf, sem):
        cp = pltpu.make_async_copy(
            imgp_ref.at[c, pl.ds(r0, TH + 2 * VH), :], buf, sem)
        cp.start()
        cp.wait()

        rloc = jax.lax.broadcasted_iota(jnp.int32, (TH, LANES), 0)
        cloc = jax.lax.broadcasted_iota(jnp.int32, (TH, LANES), 1)

        def col_block(cblk, carry):
            c0 = pl.multiple_of(cblk * LANES, LANES)
            dvb = dv_ref[:, pl.ds(c0, LANES)]
            dhb = dh_ref[:, pl.ds(c0, LANES)]
            ys = (rloc + row0).astype(jnp.float32) + (r0 + 0.5) + dvb
            xs = (cloc + c0).astype(jnp.float32) + 0.5 + dhb
            iyb = jnp.clip(jnp.floor(ys), 0, H - 1).astype(jnp.int32)
            ixb = jnp.clip(jnp.floor(xs), 0, W - 1).astype(jnp.int32)
            kb = jnp.clip(iyb - (r0 + row0 + rloc), -VH, VH)
            lo = jnp.maximum(c0 - HBLK * LANES, 0)
            hi = jnp.minimum(c0 + HBLK * LANES, Wp - LANES)
            # clamp the horizontal read into the reachable window so every
            # pixel hits exactly one (kk, s) candidate — offsets beyond the
            # window clamp to its edge (the documented contract), instead
            # of falling through to the zero init
            ixb = jnp.clip(ixb, lo, hi + LANES - 1)
            kmin = jnp.min(kb)
            kmax = jnp.max(kb)
            acc = jnp.zeros((TH, LANES), jnp.float32)
            # Each vertical candidate is wrapped in a *functional* lax.cond
            # keyed on the block's actual offset range — disparity fields
            # are smooth, so most of the (2VH+1) candidates are skipped
            # (~2.6x on realistic fields).  The accumulator stays in
            # registers; a pl.when + VMEM read-modify-write variant was
            # tried first and cost more than the skipped work.
            for kk in range(-VH, VH + 1):
                def fold(a, kk=kk):
                    for s in range(-HBLK, HBLK + 1):
                        s0 = pl.multiple_of(jnp.clip(c0 + s * LANES, lo, hi),
                                            LANES)
                        seg = buf[pl.ds(VH + kk, TH), pl.ds(s0, LANES)]
                        ixr = jnp.clip(ixb - s0, 0, LANES - 1)
                        g = jnp.take_along_axis(seg, ixr, axis=1)
                        hit = (kb == kk) & (ixb >= s0) & (ixb < s0 + LANES)
                        a = jnp.where(hit, g, a)
                    return a
                acc = jax.lax.cond((kmin <= kk) & (kk <= kmax), fold,
                                   lambda a: a, acc)
            out_ref[0, :, pl.ds(c0, LANES)] = acc
            return carry

        jax.lax.fori_loop(0, n_cblk, col_block, 0)

    pl.run_scoped(body, pltpu.VMEM((TH + 2 * VH, Wp), jnp.float32),
                  pltpu.SemaphoreType.DMA)


@functools.partial(jax.jit, static_argnames=("max_dy", "max_dx", "tile_rows",
                                             "interpret", "row_halo",
                                             "global_h"))
def warp_nearest_windowed(img: jnp.ndarray, disp_x: jnp.ndarray,
                          disp_y: jnp.ndarray, max_dy: int = 8,
                          max_dx: int = 256, tile_rows: int = 32,
                          interpret: bool = False, row_halo: bool = False,
                          row0=None, global_h: int = None) -> jnp.ndarray:
    """Windowed nearest warp.  img: (C, H, W) or (H, W); disp_x/disp_y:
    (H, W).  Exact vs the XLA gather for |row offset| <= max_dy and column
    offsets within the +-ceil(max_dx/128) source-block window; larger
    offsets clamp to the window edge.

    Row-sharded mode (``row_halo=True``): ``img`` is a local row block with
    VH = ceil4(max_dy) REAL halo rows already attached above and below
    (neighbour rows from a prior ``ppermute``), disp_x/disp_y are the local
    (Hl, W) block, ``row0`` is the block's global first row (traced) and
    ``global_h`` the full image height.  Gather targets and clamps then use
    global coordinates, so each shard's output is exactly the matching row
    slice of the unsharded warp."""
    squeeze = img.ndim == 2
    if squeeze:
        img = img[None]
    TH = tile_rows
    # TH + 2*VH (the DMA slice height) must stay sublane-aligned (8 rows)
    VH = _ceil_to(int(max_dy), 4)
    HBLK = max(1, -(-int(max_dx) // LANES))
    C = img.shape[0]
    Hl = disp_x.shape[0]          # output rows (local block in halo mode)
    W = disp_x.shape[1]
    H = int(global_h) if row_halo else Hl   # clamp range = global image
    Hp = _ceil_to(Hl, TH)
    Wp = _ceil_to(W, LANES)
    n_cblk = Wp // LANES

    if row_halo:
        # halo rows are real data; only add tile alignment + lane padding
        imgp = jnp.pad(img, ((0, 0), (0, Hp - Hl), (0, Wp - W)),
                       mode="edge")
        r0v = jnp.asarray(row0, jnp.int32).reshape(1, 1)
    else:
        imgp = jnp.pad(img, ((0, 0), (VH, VH + (Hp - Hl)), (0, Wp - W)),
                       mode="edge")
        r0v = jnp.zeros((1, 1), jnp.int32)
    dhp = jnp.pad(disp_x, ((0, Hp - Hl), (0, Wp - W)))
    dvp = jnp.pad(disp_y, ((0, Hp - Hl), (0, Wp - W)))

    kernel = functools.partial(_warp_kernel, H=H, W=W, Wp=Wp, TH=TH, VH=VH,
                               HBLK=HBLK, n_cblk=n_cblk)
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
