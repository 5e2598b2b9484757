"""Fused separable 5-tap blur as one Pallas TPU kernel.

The XLA shift-slice convolution (ops/conv.py) is correct and fusible, but
at 16MP it materialises the padded array and the row-pass intermediate in
HBM — several extra full-map traversals per blur.  The pyramid build runs
one zero-boundary blur per level (CreatePyramidFromImage,
MatchGPULib.cpp:1063-1077) and the level engine hoists one clamp-boundary
energy blur per level (G(L^2), MatchGPULib.cpp:1809-1880), so those calls
sit directly on the mode-1 critical path.

This kernel performs both passes in VMEM with a single HBM read and write
per plane.  Exactness contract: identical term order to ops.conv.conv1d
(row pass then column pass; per pass
``t0*x[-2] + t1*x[-1] + t2*x[0] + t1*x[+1] + t0*x[+2]`` with taps indexed
``kernel[radius - k]``), boundary produced by pre-padding the input (zero
or edge-replicate) exactly as jnp.pad does.  Outputs match the XLA blur
to float rounding (<= 1 ulp — FMA contraction differs between the two
lowerings), the same tolerance contract as the other fused stencils.

Structure mirrors ops/pallas/smooth.py: 2-D tiles with an 8-row vertical /
64-lane horizontal halo (DMA alignment), double-buffered input DMA, rim
garbage from the wrap-around rolls confined to halo cells that are never
written out.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ug_stereomatcher_tpu.config import gaussian_kernel

HALO = 8   # vertical halo (blur radius 2, rounded up for 8-row DMA slices)
HW = 64    # horizontal halo (keeps DMA widths 128-aligned)


def _ceil_to(x: int, m: int) -> int:
    return -(-x // m) * m


def balanced_tile_cols(width: int, max_cols: int) -> int:
    """Largest 128-aligned tile width <= max_cols that divides the
    lane-padded image width into equal panels — so column padding never
    exceeds one vreg (ops/pallas kernels previously padded W up to a
    multiple of the full tile width, computing up to ~25% dead lanes on
    some pyramid levels)."""
    wp = _ceil_to(width, 128)
    nj = -(-wp // max_cols)
    return _ceil_to(-(-wp // nj), 128)


def _blur_kernel(inp_ref, out_ref, bufs2, sems, *, C, TH, TW, taps, ni, nj):
    g = pl.program_id(0)
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

    def shifted(x, dy, dx):
        """x shifted so out[r,c] = x[r+dy, c+dx]; rim cells garbage (they
        stay inside the halo, never written out)."""
        rolled = x
        if dy:
            rolled = pltpu.roll(rolled, (-dy) % bh, axis=0)
        if dx:
            rolled = pltpu.roll(rolled, (-dx) % bw, axis=1)
        return rolled

    def pass1d(v, dy, dx):
        # exact ops.conv.conv1d term order: k = -2..2, weight kernel[2-k]
        acc = taps[0] * shifted(v, -2 * dy, -2 * dx)
        acc = acc + taps[1] * shifted(v, -dy, -dx)
        acc = acc + taps[2] * v
        acc = acc + taps[1] * shifted(v, dy, dx)
        acc = acc + taps[0] * shifted(v, 2 * dy, 2 * dx)
        return acc

    for c in range(C):
        y = pass1d(pass1d(bufs2[slot, c], 0, 1), 1, 0)
        out_ref[c, :, :] = y[HALO:HALO + TH, HW:HW + TW]


def use_fused_blur(cfg, height: int, width: int) -> bool:
    """Gate: fused blur on TPU backends for levels large enough that tile
    padding doesn't dominate (same policy as the other fused stencils —
    ``cfg.warp_backend`` is the master Pallas switch).  Non-float32
    pipelines stay on XLA: every Pallas kernel here is f32-only (Mosaic
    cannot rotate non-32-bit data, and an f32 kernel branch under the
    overflow-guard lax.cond would type-mismatch a bf16 XLA branch)."""
    if cfg.warp_backend == "xla" or cfg.dtype != "float32":
        return False
    if height * width < cfg.stencil_min_pixels:
        return False
    return jax.default_backend() not in ("cpu",)


@functools.partial(jax.jit, static_argnames=("boundary", "tile_rows",
                                             "tile_cols", "interpret"))
def fused_blur_gaussian(x: jnp.ndarray, boundary: str = "zero",
                        tile_rows: int = 128, tile_cols: int = 1024,
                        interpret: bool = False) -> jnp.ndarray:
    """5-tap separable Gaussian blur of a (C, H, W) or (H, W) array in one
    fused kernel; matches ops.conv.blur_gaussian_zero / blur_gaussian_clamp
    to float rounding (``boundary``: "zero" | "clamp")."""
    if boundary not in ("zero", "clamp"):
        raise ValueError(f"unknown boundary {boundary!r}")
    squeeze = x.ndim == 2
    if squeeze:
        x = x[None]
    C, Hl, W = x.shape
    TH = tile_rows
    TW = balanced_tile_cols(W, tile_cols)
    Hp = _ceil_to(Hl, TH)
    Wp = _ceil_to(W, TW)
    ni, nj = Hp // TH, Wp // TW

    # boundary pre-pad (the exact jnp.pad semantics of ops.conv.conv1d) +
    # tile/alignment slack.  Zero boundary: image pads are zero but the
    # alignment slack must be edge-safe too — zeros there are fine since
    # rim garbage never reaches the output window.
    mode = "constant" if boundary == "zero" else "edge"
    inp = jnp.pad(x, ((0, 0), (HALO, HALO + (Hp - Hl)), (HW, HW + (Wp - W))),
                  mode=mode)

    k = gaussian_kernel()
    taps = (float(k[0]), float(k[1]), float(k[2]))
    kernel = functools.partial(_blur_kernel, C=C, TH=TH, TW=TW, taps=taps,
                               ni=ni, nj=nj)
    out = pl.pallas_call(
        kernel,
        grid=(ni * nj,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((C, TH, TW), lambda g: (0, g // nj, g % nj),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((C, Hp, Wp), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((2, C, TH + 2 * HALO, TW + 2 * HW), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(inp)
    out = out[:, :Hl, :W]
    return out[0] if squeeze else out
