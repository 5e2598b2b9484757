"""Spatial (row-tile) sharding of the match engine with explicit halo
exchange — the ring-attention-style stencil pattern of SURVEY.md §5.

Design: each pyramid level's (C, H, W) arrays are padded to a multiple of
the row-axis size and row-sharded.  Inside ``shard_map``:

* stencil ops (blurs, ±1 shifts, plus-smoothing) exchange fixed halos with
  ``lax.ppermute`` (radius 2 for the 5-tap blurs, 1 for shifts/smoothing);
* the disparity-driven warp uses a tiled row ``all_gather`` of the right
  image (vertical disparity is unbounded in general, and coarse levels are
  tiny — SURVEY.md §2.5's 'row all-gathers' option);
* global image edges keep the reference's boundary semantics (zero for the
  cross-correlation blurs, clamp for texture convs/shifts) via a pad-region
  refresh before each stencil: the bottom pad rows are rewritten to the
  exact boundary extension (zeros or edge-row replicate).  Sharded results
  match the single-device engine to float rounding per level (fused-multiply
  contraction differs across partitions, and the nearest-warp feedback is
  chaotic over iterations) — compare with tolerances, per level or in
  lockstep, never bitwise (see the NOTE in sharded_match_level and
  tests/test_sharding.py).

Pyramid levels smaller than ``min_rows_per_shard *  n_shards`` run
replicated — the reference's coarse levels are a few dozen pixels and not
worth a collective (SURVEY.md §2.5 'replicate small levels').
"""

from __future__ import annotations

import warnings
from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P
def shard_map(f, *, mesh, in_specs, out_specs):
    """Version-portable shard_map (check_rep/check_vma renamed across jax)."""
    import inspect
    params = inspect.signature(jax.shard_map).parameters
    kw = {"mesh": mesh, "in_specs": in_specs, "out_specs": out_specs}
    if "check_vma" in params:
        kw["check_vma"] = False
    else:  # pragma: no cover
        kw["check_rep"] = False
    return jax.shard_map(f, **kw)

from ug_stereomatcher_tpu.config import MatcherConfig
from ug_stereomatcher_tpu.ops.conv import _AVG, _GAUSS, conv1d
from ug_stereomatcher_tpu.ops.pointwise import (
    blend_confidence,
    correlation_ratio,
    parabola_fit,
)
from ug_stereomatcher_tpu.ops.resample import shift_image, tex_gather
from ug_stereomatcher_tpu import match as match_mod
from ug_stereomatcher_tpu import pyramid as pyr


# ----------------------------------------------------------------------
# Halo / boundary primitives (row axis = -2, sharded; width axis local)
# ----------------------------------------------------------------------

def _refresh_pad(x: jnp.ndarray, true_h: int, axis_name: str,
                 boundary: str) -> jnp.ndarray:
    """Rewrite the bottom pad rows (global rows >= true_h) with the exact
    boundary extension the next stencil op expects."""
    n = lax.axis_size(axis_name)
    hl = x.shape[-2]
    if hl * n == true_h:
        return x
    row_global = (lax.axis_index(axis_name) * hl
                  + jnp.arange(hl))[:, None]
    mask = row_global >= true_h
    if boundary == "zero":
        fill = jnp.zeros_like(x[..., :1, :])
    else:
        # the true edge row lives in the last shard (pad < hl is guaranteed
        # by ceil-division); other shards never hit the mask.
        local_edge = max(0, min(hl - 1, true_h - 1 - (n - 1) * hl))
        fill = x[..., local_edge:local_edge + 1, :]
    return jnp.where(mask, fill, x)


def halo_pad_rows(x: jnp.ndarray, halo: int, axis_name: str,
                  boundary: str) -> jnp.ndarray:
    """Extend the local row block with ``halo`` rows from each neighbour
    shard; global top/bottom edges get clamp (edge-replicate) or zero
    extension.  x: (..., Hl, W) -> (..., Hl+2*halo, W)."""
    n = lax.axis_size(axis_name)
    idx = lax.axis_index(axis_name)
    top_rows = x[..., :halo, :]
    bot_rows = x[..., -halo:, :]
    # bottom halo of shard i <- top rows of shard i+1 ; ppermute fills
    # shards with no source with zeros (the zero-boundary case for free).
    from_below = lax.ppermute(top_rows, axis_name,
                              [(i, i - 1) for i in range(1, n)])
    from_above = lax.ppermute(bot_rows, axis_name,
                              [(i, i + 1) for i in range(n - 1)])
    if boundary == "clamp":
        edge_top = jnp.broadcast_to(x[..., :1, :], top_rows.shape)
        edge_bot = jnp.broadcast_to(x[..., -1:, :], bot_rows.shape)
        from_above = jnp.where(idx == 0, edge_top, from_above)
        from_below = jnp.where(idx == n - 1, edge_bot, from_below)
    return jnp.concatenate([from_above, x, from_below], axis=-2)


def _conv_rows_halo(x: jnp.ndarray, kernel, axis_name: str,
                    boundary: str, true_h: int) -> jnp.ndarray:
    """Row-axis (height) 1-D conv of a row-sharded array."""
    kernel = np.asarray(kernel)
    radius = len(kernel) // 2
    x = _refresh_pad(x, true_h, axis_name, boundary)
    xp = halo_pad_rows(x, radius, axis_name, boundary)
    hl = x.shape[-2]
    out = None
    for k in range(-radius, radius + 1):
        w = float(kernel[radius - k])
        if w == 0.0:
            continue
        term = w * xp[..., radius + k: radius + k + hl, :]
        out = term if out is None else out + term
    return out


def sharded_conv_separable(x: jnp.ndarray, kernel, axis_name: str,
                           boundary: str, true_h: int) -> jnp.ndarray:
    """Separable conv of a row-sharded (..., Hl, W) block: width pass is
    local, height pass exchanges halos (order matches ops.conv: rows/width
    first, then columns/height)."""
    x = conv1d(x, kernel, axis=-1, boundary=boundary)
    return _conv_rows_halo(x, kernel, axis_name, boundary, true_h)


def _shift_rows_halo(x: jnp.ndarray, dy: int, axis_name: str,
                     true_h: int) -> jnp.ndarray:
    """Vertical ±1 clamp shift of a row-sharded block."""
    if dy == 0:
        return x
    x = _refresh_pad(x, true_h, axis_name, "clamp")
    xp = halo_pad_rows(x, 1, axis_name, "clamp")
    hl = x.shape[-2]
    return xp[..., 1 + dy: 1 + dy + hl, :]


def _sharded_shift(x: jnp.ndarray, dx: int, dy: int, axis_name: str,
                   true_h: int) -> jnp.ndarray:
    if dx != 0:
        x = shift_image(x, dx, 0)
    return _shift_rows_halo(x, dy, axis_name, true_h)


def _sharded_smooth(disp: jnp.ndarray, conf: jnp.ndarray, axis_name: str,
                    true_h: int) -> jnp.ndarray:
    """Row-sharded confidence-weighted plus-smoothing (ops.smooth)."""
    disp = _refresh_pad(disp, true_h, axis_name, "clamp")
    conf = _refresh_pad(conf, true_h, axis_name, "clamp")
    num = disp * conf
    den = conf
    for (dx, dy) in ((-1, 0), (1, 0), (0, -1), (0, 1)):
        cs = _sharded_shift(conf, dx, dy, axis_name, true_h)
        num = num + _sharded_shift(disp, dx, dy, axis_name, true_h) * cs
        den = den + cs
    out = num / den
    hl = disp.shape[-2]
    row_global = (lax.axis_index(axis_name) * hl + jnp.arange(hl))[:, None]
    col = jnp.arange(disp.shape[-1])[None, :]
    keep = (row_global == 0) | (col == 0)
    return jnp.where(keep, disp, out)


def _sharded_warp(right: jnp.ndarray, disp_x: jnp.ndarray,
                  disp_y: jnp.ndarray, axis_name: str, true_h: int,
                  method: str) -> jnp.ndarray:
    """Row-sharded backward warp: tiled all-gather of the right image, then
    a local gather with global row coordinates (clamped to the true image)."""
    hl = right.shape[-2]
    w = right.shape[-1]
    full = lax.all_gather(right, axis_name, axis=-2, tiled=True)
    row0 = lax.axis_index(axis_name) * hl
    ys = (jnp.arange(hl, dtype=disp_y.dtype) + 0.5)[:, None] + row0 + disp_y
    xs = (jnp.arange(w, dtype=disp_x.dtype) + 0.5)[None, :] + disp_x
    # clamp vertical reads to the true image, not the padded one
    if method == "nearest":
        ix = jnp.clip(jnp.floor(xs), 0, w - 1).astype(jnp.int32)
        iy = jnp.clip(jnp.floor(ys), 0, true_h - 1).astype(jnp.int32)
        flat = full.reshape(full.shape[:-2] + (-1,))
        idx = (iy * w + ix).reshape(-1)
        out = jnp.take(flat, idx, axis=-1)
        return out.reshape(full.shape[:-2] + (hl, w))
    ys = jnp.clip(ys, 0.5, true_h - 0.5)
    return tex_gather(full, xs, ys, method)


# ----------------------------------------------------------------------
# Row-sharded level engine — fused (Pallas) body
# ----------------------------------------------------------------------

def _fused_level_body(left, right, disp0, *, cfg: MatcherConfig,
                      level_index: int, is_coarsest: bool, true_h: int,
                      axis_name: str, interpret: bool):
    """shard_map body running the FUSED Pallas kernels on row blocks.

    The kernels' row-sharded mode (``row_halo=True``) takes pre-haloed
    local blocks plus the shard's global row offset, so every boundary
    mask resolves in global coordinates: halo exchange (``ppermute`` via
    halo_pad_rows) feeds each kernel exactly the rows its stencil reaches,
    and the per-shard output is the matching row slice of the single-device
    fused engine.  This keeps multi-chip at single-chip per-pixel speed —
    the round-1 sharded path re-derived the *unfused* XLA chain here and
    scaled the slow engine."""
    from ug_stereomatcher_tpu.ops.pallas.direction import (
        HALO as DIR_HALO, fused_direction_update)
    from ug_stereomatcher_tpu.ops.pallas.smooth import (
        fused_smooth_average, smooth_halo_rows)
    from ug_stereomatcher_tpu.ops.pallas.warp import (
        DYN_VMEM_BUDGET, dyn_vmem_bytes, plan_dyn_warp, warp_halo_rows,
        warp_windowed, warp_windowed_dyn, window_reach)

    mi = cfg.iters_for_level(level_index)
    n_smooth = cfg.smooth_passes_for_level(level_index)
    thresholds = jnp.asarray(cfg.threshold_schedule(mi), dtype=left.dtype)
    hl = left.shape[-2]
    row0 = lax.axis_index(axis_name) * hl

    dy, dx = _effective_warp_window(cfg, level_index, hl)
    vh = warp_halo_rows(dy)
    v_reach, h_reach = window_reach(dy, dx)
    sm_halo = smooth_halo_rows(n_smooth)

    # Iteration-invariant: blurred left energy + the left image's halo'd
    # block (the kernels re-read it every iteration; the halo doesn't move).
    blurred_l2 = sharded_conv_separable(left * left, _GAUSS, axis_name,
                                        "clamp", true_h)
    left_r = _refresh_pad(left, true_h, axis_name, "clamp")
    left_h = halo_pad_rows(left_r, DIR_HALO, axis_name, "clamp")
    right_r = _refresh_pad(right, true_h, axis_name, "clamp")
    right_h = halo_pad_rows(right_r, vh, axis_name, "clamp")

    consts = (cfg.conf_no_peak, cfg.conf_affine_scale,
              cfg.conf_affine_bias, cfg.conf_blend_new, cfg.conf_blend_old)

    use_dyn = (cfg.warp_dynamic and cfg.warp_overflow_guard
               and dyn_vmem_bytes(left.shape[-1]) <= DYN_VMEM_BUDGET)

    def body(carry, inputs):
        disp_h, disp_v, conf = carry
        m, threshold = inputs

        def windowed():
            return warp_windowed(
                right_h, disp_h, disp_v, max_dy=dy, max_dx=dx,
                interpret=interpret, row_halo=True, row0=row0,
                global_h=true_h, method=cfg.interp)

        if cfg.warp_overflow_guard:
            # every guard decision must be GLOBALLY uniform (pmax/pmin):
            # the exact-warp fallback contains collectives, and a cond
            # whose branches hold collectives deadlocks unless all shards
            # take the same branch
            mv = lax.pmax(jnp.max(jnp.abs(disp_v)), axis_name)
            mh = lax.pmax(jnp.max(jnp.abs(disp_h)), axis_name)
            safe = (mv <= v_reach) & (mh <= h_reach)

            def static_tier():
                return lax.cond(
                    safe, windowed,
                    lambda: _sharded_warp(right, disp_h, disp_v, axis_name,
                                          true_h, cfg.interp))

            if use_dyn:
                # dynamic windows on the local block: the plan confines
                # every window to the exchanged halo, so the kernel stays
                # collective-free; over-budget/over-halo fields tier down
                # exactly as the unsharded engine does
                voffs, okl = plan_dyn_warp(
                    disp_h, disp_v, H=true_h, W=disp_h.shape[-1],
                    method=cfg.interp, row0=row0, halo_rows=vh)
                ok_all = lax.pmax(
                    1 - okl.astype(jnp.int32), axis_name) == 0
                warped = lax.cond(
                    ok_all,
                    lambda: warp_windowed_dyn(
                        right_h, disp_h, disp_v, voffs,
                        interpret=interpret, method=cfg.interp,
                        row_halo=True, row0=row0, global_h=true_h,
                        halo_rows=vh),
                    static_tier)
            else:
                warped = static_tier()
        else:
            warped = windowed()

        warped_r = _refresh_pad(warped, true_h, axis_name, "clamp")
        warped_h = halo_pad_rows(warped_r, DIR_HALO, axis_name, "clamp")
        replace = (m == 0) if is_coarsest else jnp.int32(0)
        state = fused_direction_update(
            left_h, warped_h, blurred_l2,
            jnp.stack([disp_h, disp_v, conf]), threshold, replace,
            consts=consts, interpret=interpret, row_halo=True, row0=row0,
            global_h=true_h)

        state = _refresh_pad(state, true_h, axis_name, "clamp")
        state_h = halo_pad_rows(state, sm_halo, axis_name, "clamp")
        state = fused_smooth_average(
            state_h, n_passes=n_smooth, interpret=interpret, row_halo=True,
            row0=row0, global_h=true_h)
        return (state[0], state[1], state[2]), None

    init = (disp0[0], disp0[1], disp0[2])
    ms = jnp.arange(mi)
    (dh, dv, cf), _ = jax.lax.scan(body, init, (ms, thresholds))
    return jnp.stack([dh, dv, cf])


def _effective_warp_window(cfg: MatcherConfig, level_index: int,
                           hl: int):
    """The sharded warp's vertical halo must fit in one neighbour block,
    so the window shrinks to the block height when shards are small
    (e.g. 16MP level 0 over 32 shards).  Exactness is unchanged: the
    fused body's GLOBAL overflow guard falls back to the exact all-gather
    warp whenever the live field exceeds the (smaller) window's reach —
    a narrower window only raises the fallback probability."""
    dy, dx = cfg.warp_window_for_level(level_index)
    return min(int(dy), max(8, (hl // 8) * 8)), dx


def _fused_shardable(cfg: MatcherConfig, level_index: int, hl: int) -> bool:
    """The fused body's halo exchanges need each halo to fit in one
    neighbour block.  The warp window self-shrinks to the block height
    (_effective_warp_window), so only the minimum 8-row warp halo and the
    fixed direction/smooth halos constrain shardability."""
    from ug_stereomatcher_tpu.ops.pallas.smooth import smooth_halo_rows
    from ug_stereomatcher_tpu.ops.pallas.direction import HALO as DIR_HALO
    need = max(8, DIR_HALO,
               smooth_halo_rows(cfg.smooth_passes_for_level(level_index)))
    return hl >= need


# ----------------------------------------------------------------------
# Row-sharded level engine — unfused (pure-XLA) body
# ----------------------------------------------------------------------

def _level_body(left, right, disp0, *, cfg: MatcherConfig, level_index: int,
                is_coarsest: bool, true_h: int, axis_name: str):
    """shard_map body: identical math to match.match_level on row blocks."""
    mi = cfg.iters_for_level(level_index)
    n_smooth = cfg.smooth_passes_for_level(level_index)
    thresholds = jnp.asarray(cfg.threshold_schedule(mi), dtype=left.dtype)

    def conv_clamp(x):
        return sharded_conv_separable(x, _GAUSS, axis_name, "clamp", true_h)

    def conv_zero(x):
        return sharded_conv_separable(x, _GAUSS, axis_name, "zero", true_h)

    def conv_avg(x):
        return sharded_conv_separable(x, _AVG, axis_name, "clamp", true_h)

    blurred_l2 = conv_clamp(left * left)

    def body(carry, inputs):
        disp_h, disp_v, conf = carry
        m, threshold = inputs

        warped = _sharded_warp(right, disp_h, disp_v, axis_name, true_h,
                               cfg.interp)
        blurred_w2 = conv_clamp(warped * warped)
        dirs = []
        for (dx, dy) in match_mod.MOVES:
            cross = left * _sharded_shift(warped, dx, dy, axis_name, true_h)
            bcross = conv_zero(cross)
            corr = correlation_ratio(
                bcross, blurred_l2,
                _sharded_shift(blurred_w2, dx, dy, axis_name, true_h))
            dirs.append(jnp.mean(corr, axis=0))
        dir_l, dir_r, dir_u, dir_d, dir_c = dirs

        inc_h, conf_h = parabola_fit(
            dir_l, dir_c, dir_r, threshold, cfg.conf_no_peak,
            cfg.conf_affine_scale, cfg.conf_affine_bias)
        inc_v, conf_v = parabola_fit(
            dir_u, dir_c, dir_d, threshold, cfg.conf_no_peak,
            cfg.conf_affine_scale, cfg.conf_affine_bias)
        conf_new = conf_h * conf_v

        disp_h = inc_h + disp_h
        disp_v = inc_v + disp_v
        blended = blend_confidence(conf_new, conf,
                                   cfg.conf_blend_new, cfg.conf_blend_old)
        if is_coarsest:
            conf = jnp.where(m == 0, conf_new, blended)
        else:
            conf = blended

        for _ in range(n_smooth):
            c0 = conf
            disp_h = _sharded_smooth(disp_h, c0, axis_name, true_h)
            disp_v = _sharded_smooth(disp_v, c0, axis_name, true_h)
            conf = _sharded_smooth(conf, c0, axis_name, true_h)

        disp_h = conv_avg(disp_h)
        disp_v = conv_avg(disp_v)
        conf = conv_avg(conf)
        return (disp_h, disp_v, conf), None

    init = (disp0[0], disp0[1], disp0[2])
    ms = jnp.arange(mi)
    (dh, dv, cf), _ = jax.lax.scan(body, init, (ms, thresholds))
    return jnp.stack([dh, dv, cf])


def _use_fused_body(cfg: MatcherConfig, level_index: int, true_h: int,
                    w: int, hl: int, use_fused: Optional[bool]) -> bool:
    """Resolve whether the shard_map body runs the fused Pallas kernels.

    Auto (None) mirrors the single-device gates (match._use_pallas_stencil
    / _use_pallas_warp on the GLOBAL level size — per-pixel work is what
    the kernels accelerate) plus the halo-fits-in-neighbour constraint."""
    if not _fused_shardable(cfg, level_index, hl):
        return False
    if use_fused is not None:
        return use_fused
    return (match_mod._use_pallas_stencil(cfg, true_h, w)
            and match_mod._use_pallas_warp(cfg, true_h, w))


def _pad_rows_to(x: jnp.ndarray, total: int) -> jnp.ndarray:
    """Zero-pad the row axis (-2) up to ``total`` rows."""
    pad = total - x.shape[-2]
    if pad == 0:
        return x
    cfgpad = [(0, 0)] * (x.ndim - 2) + [(0, pad), (0, 0)]
    return jnp.pad(x, cfgpad)


def _wrap_pairs(body, pairs_axis: Optional[str], n_out: int = 1):
    """Adapt a (3, H, W)-shaped stage body to arrays carrying a leading
    pairs-sharded batch axis (local batch must be exactly 1: the hybrid
    DP x SP matcher feeds one pair per pairs-group per step)."""
    if pairs_axis is None:
        return body

    def wrapped(*xs):
        out = body(*[x[0] for x in xs])
        if n_out == 1:
            return out[None]
        return tuple(o[None] for o in out)

    return wrapped


def _spec_for(ndim: int, axis_name: Optional[str],
              pairs_axis: Optional[str]) -> P:
    """PartitionSpec for a (..., H, W) array: rows over ``axis_name`` (None
    = replicated rows), leading batch over ``pairs_axis`` when present."""
    parts = [None] * ndim
    if axis_name is not None:
        parts[-2] = axis_name
    if pairs_axis is not None:
        parts[0] = pairs_axis
    return P(*parts)


def sharded_match_level(left: jnp.ndarray, right: jnp.ndarray,
                        disp: jnp.ndarray, level_index: int,
                        cfg: MatcherConfig, is_coarsest: bool,
                        mesh: Mesh, axis_name: str = "rows",
                        use_fused: Optional[bool] = None,
                        interpret: bool = False,
                        pairs_axis: Optional[str] = None) -> jnp.ndarray:
    """Row-sharded match_level.  Pads H to a multiple of the row-axis size,
    runs the shard_map level engine, and slices the true rows back out.

    ``use_fused``: None = auto (fused Pallas body on TPU for levels the
    single-device engine would also run fused); True/False force.
    ``interpret`` runs the Pallas kernels in interpreter mode (CPU tests).
    ``pairs_axis``: arrays carry a leading batch axis sharded over that
    mesh axis (hybrid DP x SP; one pair per pairs-group).
    Results match match.match_level exactly up to float rounding."""
    n = mesh.shape[axis_name]
    true_h, w = left.shape[-2], left.shape[-1]
    hl = -(-true_h // n)
    pad = hl * n - true_h
    if pad >= hl:
        # _refresh_pad assumes all pad rows live in the last shard (its
        # clamp fill reads the true edge row locally); with pad >= hl the
        # padding would span multiple shards and silently corrupt clamp
        # boundaries.  Needs true_h > hl * (n - 1).
        raise ValueError(
            f"cannot row-shard H={true_h} over {n} shards exactly "
            f"(padding {pad} >= local rows {hl}); use fewer shards or the "
            f"unsharded match_level")

    # NOTE on equivalence: results match the single-device engine to float
    # noise (collective data movement reorders nothing, but fused-multiply
    # contraction differs), and the nearest-warp feedback amplifies that
    # noise chaotically over many iterations — compare per level with
    # tolerances, not bitwise (see tests/test_sharding.py).
    if _use_fused_body(cfg, level_index, true_h, w, hl, use_fused):
        body = partial(_fused_level_body, cfg=cfg, level_index=level_index,
                       is_coarsest=is_coarsest, true_h=true_h,
                       axis_name=axis_name, interpret=interpret)
    else:
        body = partial(_level_body, cfg=cfg, level_index=level_index,
                       is_coarsest=is_coarsest, true_h=true_h,
                       axis_name=axis_name)
    spec = _spec_for(left.ndim, axis_name, pairs_axis)
    fn = shard_map(_wrap_pairs(body, pairs_axis), mesh=mesh,
                   in_specs=(spec, spec, spec), out_specs=spec)
    out = fn(_pad_rows_to(left, hl * n), _pad_rows_to(right, hl * n),
             _pad_rows_to(disp, hl * n))
    return out[..., :true_h, :]


# ----------------------------------------------------------------------
# Sharded pyramid-build / resample stages (round 3)
#
# Round 2 ran the pyramid build, inter-level upsamples and sub-threshold
# levels replicated with every Pallas kernel force-disabled (`cfg_rep`):
# correct, but each device redid those stages as unfused XLA at the full
# image size — a replicated-work latency floor independent of shard count.
# Each stage below is its own shard_map: large stages row-shard with
# explicit halos/windows (1/n work per device, fused Pallas blur riding
# inside), and small stages run replicated INSIDE shard_map — every device
# redundantly computes the full (tiny) array, which keeps Pallas legal
# (a Pallas custom call outside shard_map cannot be SPMD-partitioned by
# GSPMD) and keeps the level-resident kernel's dispatch-floor win live on
# coarse levels.  Reference scope: CreatePyramidFromImage / subsampleDisp
# (MatchGPULib.cpp:1033-1125, :1526-1590) at multi-chip scale.
# ----------------------------------------------------------------------


def _row_ok(true_h: int, n: int, min_rows: int) -> bool:
    """Row-shard a stage?  Needs even-ish division (pad < local rows, the
    _refresh_pad invariant) and enough rows to be worth a collective."""
    hl = -(-true_h // n)
    return (hl * n - true_h) < hl and true_h >= min_rows * n


def replicated_stage(fn, mesh: Mesh, pairs_axis: Optional[str], *arrays):
    """Run ``fn(*arrays)`` replicated inside shard_map: every device
    computes the full result (identical inputs -> identical outputs).  The
    fn may contain Pallas calls / lax.cond — they execute per-device as
    local code, which plain GSPMD partitioning cannot do for custom
    calls."""
    specs = tuple(_spec_for(a.ndim, None, pairs_axis) for a in arrays)
    shaped = jax.eval_shape(fn, *[
        jax.ShapeDtypeStruct(a.shape[1:] if pairs_axis else a.shape,
                             a.dtype) for a in arrays])
    out_spec = _spec_for(len(shaped.shape) + (1 if pairs_axis else 0),
                         None, pairs_axis)
    wrapped = shard_map(_wrap_pairs(fn, pairs_axis), mesh=mesh,
                        in_specs=specs, out_specs=out_spec)
    return wrapped(*arrays)


def sharded_blur(x: jnp.ndarray, boundary: str, cfg: MatcherConfig,
                 mesh: Mesh, axis_name: str = "rows",
                 pairs_axis: Optional[str] = None,
                 min_rows_per_shard: int = 16,
                 use_fused: Optional[bool] = None,
                 interpret: bool = False) -> jnp.ndarray:
    """Row-sharded 5-tap Gaussian blur of a global (..., H, W) array.

    Large inputs: shard_map body exchanges a 2-row halo and runs the fused
    Pallas blur on the local block (the kernel's own vertical padding only
    touches rows outside the sliced-out window, so pre-haloed blocks give
    the exact global-boundary result); the XLA halo conv is the small/CPU
    body.  Small inputs run replicated inside shard_map with the
    single-device gates (pyramid._use_fused_blur) intact."""
    from ug_stereomatcher_tpu.ops.conv import blur_gaussian_clamp
    from ug_stereomatcher_tpu.ops.conv import blur_gaussian_zero
    from ug_stereomatcher_tpu.ops.pallas.blur import (fused_blur_gaussian,
                                                      use_fused_blur)

    n = mesh.shape[axis_name]
    true_h, w = x.shape[-2], x.shape[-1]
    if _row_ok(true_h, n, min_rows_per_shard):
        hl = -(-true_h // n)
        fused = (use_fused if use_fused is not None
                 else use_fused_blur(cfg, hl, w))

        def body(xl):
            if fused:
                xr = _refresh_pad(xl, true_h, axis_name, boundary)
                xe = halo_pad_rows(xr, 2, axis_name, boundary)
                out = fused_blur_gaussian(xe, boundary=boundary,
                                          interpret=interpret)
                return out[..., 2:2 + hl, :]
            return sharded_conv_separable(xl, _GAUSS, axis_name, boundary,
                                          true_h)

        spec = _spec_for(x.ndim, axis_name, pairs_axis)
        fn = shard_map(_wrap_pairs(body, pairs_axis), mesh=mesh,
                       in_specs=(spec,), out_specs=spec)
        return fn(_pad_rows_to(x, hl * n))[..., :true_h, :]

    def rep(xl):
        fused = (use_fused if use_fused is not None
                 else use_fused_blur(cfg, true_h, w))
        if fused:
            return fused_blur_gaussian(xl, boundary=boundary,
                                       interpret=interpret)
        return (blur_gaussian_zero(xl) if boundary == "zero"
                else blur_gaussian_clamp(xl))

    return replicated_stage(rep, mesh, pairs_axis, x)


def _resample_taps(n_out: int, n_in: int, coord_of, method: str):
    """Static per-axis taps: (i0, i1, w) int32/float32 numpy arrays; w is
    None for nearest.  Same float64 host arithmetic as the single-device
    planners (ops/resample._separable_nearest, ops/pallas/resample)."""
    from ug_stereomatcher_tpu.ops.pallas.resample import (_bilinear_taps,
                                                          _nearest_indices)
    if method == "nearest":
        i0 = _nearest_indices(n_out, n_in, coord_of)
        return i0, i0, None
    i0, w = _bilinear_taps(n_out, n_in, coord_of)
    i1 = np.minimum(i0 + 1, n_in - 1).astype(np.int32)
    return i0, i1, w


def _width_resample(x, ix0, ix1, wx):
    if wx is None:
        return jnp.take(x, jnp.asarray(ix0), axis=-1)
    g0 = jnp.take(x, jnp.asarray(ix0), axis=-1)
    g1 = jnp.take(x, jnp.asarray(ix1), axis=-1)
    w = jnp.asarray(wx)
    return g0 * (1.0 - w) + g1 * w


def sharded_resample(x: jnp.ndarray, out_h: int, out_w: int, coord_of,
                     value_scale: float, cfg: MatcherConfig, mesh: Mesh,
                     axis_name: str = "rows",
                     pairs_axis: Optional[str] = None,
                     min_rows_per_shard: int = 16,
                     use_fused: Optional[bool] = None,
                     interpret: bool = False) -> jnp.ndarray:
    """Row-sharded separable texture resample of a global (..., H, W)
    array (ops/resample.resample_coords semantics: texel-centre coords via
    ``coord_of``, clamp addressing, value scaling after the gather).

    Sharded height pass: output shard k's source rows form a bounded,
    host-precomputed window; a ``ppermute`` halo attaches the out-of-block
    rows and a dynamic per-shard row-take (static (n, hl_out) index matrix
    selected by axis_index) gathers them.  Width pass is local with static
    indices.  Nearest is bit-identical to the single-device takes;
    bilinear interpolates width-then-height, tex_gather's exact order.
    Small outputs run replicated with the single-device dispatch gates
    (MXU one-hot kernel on TPU) intact."""
    from ug_stereomatcher_tpu.ops.pallas.blur import use_fused_blur
    from ug_stereomatcher_tpu.ops.pallas.resample import resample_tex
    from ug_stereomatcher_tpu.ops.resample import resample_coords

    n = mesh.shape[axis_name]
    in_h, in_w = x.shape[-2], x.shape[-1]
    method = cfg.interp

    if not _row_ok(out_h, n, min_rows_per_shard):
        def rep(xl):
            fused = (use_fused if use_fused is not None
                     else use_fused_blur(cfg, max(in_h, out_h),
                                         max(in_w, out_w)))
            if fused:
                return resample_tex(xl, out_h, out_w, coord_of,
                                    value_scale, method,
                                    interpret=interpret)
            return resample_coords(xl, out_h, out_w, coord_of,
                                   value_scale, method)

        return replicated_stage(rep, mesh, pairs_axis, x)

    ix0, ix1, wx = _resample_taps(out_w, in_w, coord_of, method)
    iy0, iy1, wy = _resample_taps(out_h, in_h, coord_of, method)
    hl_out = -(-out_h // n)
    out_pad = hl_out * n - out_h

    def pad_idx(v, fill):
        return np.concatenate([v, np.full(out_pad, fill, v.dtype)])

    iy0m = pad_idx(iy0, iy0[-1]).reshape(n, hl_out)
    iy1m = pad_idx(iy1, iy1[-1]).reshape(n, hl_out)
    wym = (pad_idx(wy, 0.0).reshape(n, hl_out)
           if wy is not None else None)

    in_sharded = _row_ok(in_h, n, min_rows_per_shard)
    halo = 0
    hl_in = in_h
    if in_sharded:
        hl_in = -(-in_h // n)
        base = np.arange(n) * hl_in
        halo_up = int(np.maximum(base - iy0m.min(axis=1), 0).max())
        halo_dn = int(np.maximum(iy1m.max(axis=1)
                                 - (base + hl_in - 1), 0).max())
        halo = max(halo_up, halo_dn)
        if halo > hl_in:
            # window spans beyond one neighbour block (extreme scale
            # factor for this mesh) — fall back to a replicated input
            in_sharded = False
            halo = 0
            hl_in = in_h
        else:
            # The one-hot height pass below maps an out-of-range index to
            # an all-zero selection row, NOT a clamped read like the
            # jnp.take it replaced — a planner regression past this point
            # would zero output rows silently.  Assert the contract at
            # planning time (host numpy, zero device cost): every shard's
            # tap indices, rebased into its haloed block, must land in
            # [0, hl_in + 2*halo).
            base_k = np.arange(n)[:, None] * hl_in - halo
            for taps in (iy0m, iy1m) if wym is not None else (iy0m,):
                rel = taps - base_k
                if rel.min() < 0 or rel.max() >= hl_in + 2 * halo:
                    # a real raise, not `assert` — python -O must not
                    # strip the guard whose whole point is preventing
                    # silent zeroed rows
                    raise ValueError(
                        f"sharded_resample halo planner bug: rebased "
                        f"tap indices [{rel.min()}, {rel.max()}] fall "
                        f"outside the haloed block "
                        f"[0, {hl_in + 2 * halo}) — the one-hot height "
                        f"pass would silently zero rows")

    def body(xl):
        xw = _width_resample(xl, ix0, ix1, wx)
        k = lax.axis_index(axis_name)
        iy0v = jnp.asarray(iy0m)[k]
        if in_sharded:
            xe = (halo_pad_rows(xw, halo, axis_name, "clamp")
                  if halo else xw)
            base_k = k * hl_in - halo
        else:
            xe = xw
            base_k = 0
        # Height pass as a selection MATMUL, not a row gather: the
        # per-shard indices are traced (selected by axis_index), and
        # traced-index gathers are the op class whose ~10 ns/element cost
        # motivated the single-device MXU one-hot resampler
        # (ops/pallas/resample.py; docs/PERF.md "selection IS a matmul").
        # A broadcast compare builds the per-shard one-hot (nearest) /
        # two-hot (bilinear, CUDA linear-filter weights) row-selection
        # matrix from those indices with pure vector ops, and the MXU
        # contracts it against the shard block.  One-hot f32 matmuls at
        # precision=HIGHEST are bit-exact (verified on-chip for the
        # single-device kernel), so nearest stays bit-identical to the
        # unsharded takes; bilinear matches to float rounding, as before.
        src = jnp.arange(xe.shape[-2], dtype=jnp.int32)
        sel = ((iy0v - base_k)[:, None] == src[None, :]).astype(xe.dtype)
        if wym is not None:
            iy1v = jnp.asarray(iy1m)[k]
            wv = jnp.asarray(wym)[k][:, None]
            sel1 = ((iy1v - base_k)[:, None]
                    == src[None, :]).astype(xe.dtype)
            sel = sel * (1.0 - wv) + sel1 * wv
        g = jnp.einsum("oi,...iw->...ow", sel, xe,
                       precision=lax.Precision.HIGHEST)
        return g if value_scale == 1.0 else value_scale * g

    in_spec = _spec_for(x.ndim, axis_name if in_sharded else None,
                        pairs_axis)
    out_spec = _spec_for(x.ndim, axis_name, pairs_axis)
    fn = shard_map(_wrap_pairs(body, pairs_axis), mesh=mesh,
                   in_specs=(in_spec,), out_specs=out_spec)
    xin = _pad_rows_to(x, hl_in * n) if in_sharded else x
    return fn(xin)[..., :out_h, :]


def sharded_upsample_to_level(disp: jnp.ndarray, out_h: int, out_w: int,
                              cfg: MatcherConfig, mesh: Mesh, **kw
                              ) -> jnp.ndarray:
    """Sharded pyramid.upsample_to_level: values x SCALE, with the
    confidence-plane quirk handled exactly as the single-device op."""
    inv = 1.0 / cfg.scale
    up = sharded_resample(disp, out_h, out_w, lambda t: t * inv,
                          cfg.scale, cfg, mesh, **kw)
    if not cfg.scale_conf_on_upsample:
        conf = sharded_resample(disp[..., 2:3, :, :], out_h, out_w,
                                lambda t: t * inv, 1.0, cfg, mesh, **kw)
        up = jnp.concatenate([up[..., :2, :, :], conf], axis=-3)
    return up


def sharded_build_pyramid(image: jnp.ndarray, cfg: MatcherConfig, n: int,
                          mesh: Mesh, axis_name: str = "rows",
                          pairs_axis: Optional[str] = None,
                          min_rows_per_shard: int = 16,
                          use_fused: Optional[bool] = None,
                          interpret: bool = False):
    """Row-sharded pyramid.build_pyramid: per level one sharded blur and
    the even/odd factor-2 resample chain, large stages at 1/n work per
    device.  Nearest interp is bit-identical to the single-device build."""
    h, w = image.shape[-2], image.shape[-1]
    dims = cfg.dims_chain(h, w)
    kw = dict(axis_name=axis_name, pairs_axis=pairs_axis,
              min_rows_per_shard=min_rows_per_shard, use_fused=use_fused,
              interpret=interpret)
    levels = [None] * n
    levels[0] = image
    scale2 = float(int(cfg.scale * cfg.scale + 0.5))  # == 2.0
    for i in range(n):
        targets = []
        if i == 0 and n > 1:
            targets.append((1, cfg.scale))
        if i + 2 < n:
            targets.append((i + 2, scale2))
        if not targets:
            continue
        blurred = sharded_blur(levels[i], "zero", cfg, mesh, **kw)
        for (j, s) in targets:
            h2, w2 = dims[j]
            levels[j] = sharded_resample(
                blurred, h2, w2, lambda t, s=s: t * s, 1.0, cfg, mesh,
                **kw)
    return levels


def sharded_match_pair(left: jnp.ndarray, right: jnp.ndarray,
                       cfg: MatcherConfig, mesh: Mesh,
                       axis_name: str = "rows",
                       min_rows_per_shard: int = 16,
                       foveated: bool = False,
                       use_fused: Optional[bool] = None,
                       interpret: bool = False,
                       pairs_axis: Optional[str] = None
                       ) -> match_mod.PyramidMatchResult:
    """Full coarse-to-fine match with EVERY stage under shard_map: pyramid
    build, level refinement and inter-level upsamples row-shard when large
    (explicit ppermute halos; fused Pallas kernels live in the sharded
    bodies), and run replicated inside shard_map when small — so no stage
    replicates large unfused XLA work, and no Pallas call sits in plain
    GSPMD land.  In foveated mode the fixed-size fovea levels follow the
    same size rule (they are usually below the sharding threshold).

    With ``pairs_axis``, inputs carry a leading batch axis (one pair per
    pairs-group) and the whole graph composes DP x SP over the 2-D mesh."""
    if cfg.early_exit_delta is not None:
        # The row-sharded level bodies run the fixed iteration schedule: an
        # early exit would need a cross-shard convergence collective every
        # iteration.  Only the small replicated levels (full match_level
        # per device) honor the flag here — warn so a user enabling it on
        # a mesh does not silently wait for a speedup that never comes
        # (config.MatcherConfig.early_exit_delta scope note).
        warnings.warn(
            "early_exit_delta is ignored by row-sharded level bodies; "
            "sharded_match_pair runs the fixed iteration schedule on "
            "sharded levels", stacklevel=2)
    h, w = left.shape[-2:]
    n = cfg.num_levels(h, w)
    kw = dict(axis_name=axis_name, pairs_axis=pairs_axis,
              min_rows_per_shard=min_rows_per_shard, use_fused=use_fused,
              interpret=interpret)
    if pairs_axis is not None and left.shape[0] != mesh.shape[pairs_axis]:
        raise ValueError(
            f"pairs_axis mode needs batch == mesh '{pairs_axis}' size "
            f"({mesh.shape[pairs_axis]}); got {left.shape[0]} — chunk the "
            f"batch (parallel.batch.make_batch_matcher does)")

    # both images' pyramids in one stacked pass (pyramid.build_pyramid_pair
    # rationale: the chain is channel-agnostic; halves sharded stage count)
    c = left.shape[-3]
    stacked = sharded_build_pyramid(
        jnp.concatenate([left, right], axis=-3), cfg, n, mesh, **kw)
    lp = [lv[..., :c, :, :] for lv in stacked]
    rp = [lv[..., c:, :, :] for lv in stacked]
    if foveated:
        lp = pyr.foveate_pyramid(lp, cfg, (h, w))
        rp = pyr.foveate_pyramid(rp, cfg, (h, w))
    dims = match_mod.level_dims_for_matching(cfg, h, w, n, foveated)
    full_chain = cfg.dims_chain(h, w)
    n_shards = mesh.shape[axis_name]

    results = [None] * n
    hh, ww = dims[n - 1]
    bshape = (left.shape[0],) if pairs_axis is not None else ()
    disp = jnp.zeros(bshape + (3, hh, ww), dtype=left.dtype)
    for i in range(n - 1, -1, -1):
        is_coarsest = i == n - 1
        if _row_ok(dims[i][0], n_shards, min_rows_per_shard):
            disp = sharded_match_level(lp[i], rp[i], disp, i, cfg,
                                       is_coarsest, mesh, axis_name,
                                       use_fused=use_fused,
                                       interpret=interpret,
                                       pairs_axis=pairs_axis)
        else:
            disp = replicated_stage(
                partial(match_mod.match_level, level_index=i, cfg=cfg,
                        is_coarsest=is_coarsest),
                mesh, pairs_axis, lp[i], rp[i], disp)
        results[i] = disp
        if i > 0:
            if (not foveated) or i >= cfg.fovea_level:
                h2, w2 = dims[i - 1]
                disp = sharded_upsample_to_level(disp, h2, w2, cfg, mesh,
                                                 **kw)
            else:
                big_h, big_w = full_chain[cfg.fovea_level - 2]
                disp = replicated_stage(
                    partial(pyr.foveated_upsample, big_h=big_h,
                            big_w=big_w, cfg=cfg),
                    mesh, pairs_axis, disp)
    return match_mod.PyramidMatchResult(levels=tuple(results))
