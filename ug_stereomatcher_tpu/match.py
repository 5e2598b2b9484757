"""Coarse-to-fine iterative matching engine.

``match_level`` is the hot loop — the TPU-native re-design of the reference's
``matchlevel`` (MatchGPULib.cpp:1662-2489).  Where the reference launches
~25 CUDA kernels per (iteration, channel) with device-to-device copies
between each, this implementation is a single ``lax.scan`` over iterations
whose body is one fused XLA computation: channels are a batched axis, the
five correlation shifts are vectorised, and iteration-invariant terms
(the blurred left-energy map) are hoisted out of the loop.

``match_pyramid`` is the coarse-to-fine scheduler (reference ``matching``,
MatchGPULib.cpp:1196-1318) including the foveated level-size overrides and
the two disparity up-sampling paths.
"""

from __future__ import annotations

from typing import List, NamedTuple, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ug_stereomatcher_tpu.config import MOVES, MatcherConfig
from ug_stereomatcher_tpu.ops.conv import (
    blur_average_clamp,
    blur_gaussian_clamp,
    blur_gaussian_zero,
)
from ug_stereomatcher_tpu.ops.pointwise import (
    blend_confidence,
    correlation_ratio,
    parabola_fit,
)
from ug_stereomatcher_tpu.ops.resample import shift_image, warp_by_disparity
from ug_stereomatcher_tpu.ops.smooth import weighted_smooth
from ug_stereomatcher_tpu import pyramid as pyr


def _use_pallas_stencil(cfg: MatcherConfig, height: int, width: int) -> bool:
    """Fused Pallas stencil kernels: on for TPU backends on levels large
    enough that tile padding doesn't dominate (small levels are dispatch-
    floor bound either way and XLA's fused elementwise chain is leaner).
    One shared predicate (ops/pallas/blur.use_fused_blur) gates every
    fused stencil so the blur can never desynchronize from the rest."""
    from ug_stereomatcher_tpu.ops.pallas.blur import use_fused_blur
    return use_fused_blur(cfg, height, width)


def _use_level_resident(cfg: MatcherConfig, channels: int, height: int,
                        width: int, level_index: int) -> bool:
    """Whole-level resident kernel gate (ops/pallas/level.py).  Forced
    modes ("pallas"/"interpret") always take it; "auto" requires a TPU
    backend, the Pallas warp enabled, and the level's peak VMEM footprint
    under budget (coarse sub-256k-pixel levels — exactly the
    dispatch-floor-bound tail the kernel exists to cut)."""
    if cfg.level_backend == "xla" or channels != 3:
        return False
    if cfg.dtype != "float32":
        return False   # Pallas kernels are f32-only (see use_fused_blur)
    if cfg.level_backend in ("pallas", "interpret"):
        return True
    if cfg.level_backend != "auto":
        raise ValueError(f"unknown level_backend {cfg.level_backend!r}")
    if cfg.warp_backend == "xla":
        return False
    if jax.default_backend() in ("cpu",):
        return False
    from ug_stereomatcher_tpu.ops.pallas.level import (
        LEVEL_VMEM_BUDGET, level_resident_vmem_bytes)
    dy, _ = cfg.warp_window_for_level(level_index)
    return level_resident_vmem_bytes(height, width, dy) <= LEVEL_VMEM_BUDGET


def _use_pallas_warp(cfg: MatcherConfig, height: int, width: int) -> bool:
    """Resolve the warp backend at trace time.  The Pallas windowed kernel
    only pays off on TPU backends and on levels big enough to amortise its
    tiling; the XLA gather stays the exact reference path elsewhere.
    Both interp modes ride the windowed kernel (bilinear = 4-tap one-hot
    variant), so the 10x-accuracy quality mode keeps the fast path."""
    if cfg.warp_backend == "xla" or cfg.dtype != "float32":
        return False
    if cfg.warp_backend == "pallas":
        return True
    if height < 64 or width < 256:
        return False
    return jax.default_backend() not in ("cpu",)


# Warp-tier codes (instrumentation): which engine actually produced a
# given warp.  Surfaced per level through StereoEngine(instrument_tiers=
# True).metrics so the exactness fallbacks' cost is observable in
# production instead of switching silently inside jit.
TIER_DYN = 0             # dynamic windowed kernel (field-following slabs)
TIER_STATIC = 1          # static windowed kernel (absolute-reach bounded)
TIER_EXACT = 2           # exact unbounded XLA gather (overflow fallback)
TIER_XLA_DEFAULT = 3     # XLA gather by dispatch gate (CPU / small level)
TIER_NAMES = ("dyn", "static_windowed", "exact_gather", "xla_default",
              "level_resident_iters", "overflow_recompute")


def warp_for_level(right, disp_h, disp_v, cfg: MatcherConfig,
                   level_index: int, interpret: bool = False,
                   with_tier: bool = False):
    """Windowed Pallas warp with the overflow guard.

    The windowed kernel clamps gather offsets beyond its search window —
    for scenes whose true disparity exceeds the window the clamped result
    would silently diverge from warpAbyB's unbounded texture gather
    (MatchLib.cu:499-549).  With ``cfg.warp_overflow_guard`` (default) one
    cheap max-reduction per call checks the live disparity field against
    the window's exact reach and a ``lax.cond`` falls back to the exact
    XLA gather whenever any offset would clamp, so the auto path is exact
    for *all* scenes and fast for in-window ones.

    ``with_tier=True`` additionally returns the int32 TIER_* code of the
    branch the tiered dispatch took (computed from the same ``ok``/``safe``
    predicates the conds switch on, so it cannot desynchronise from the
    dispatch).  Instrumentation only — it adds the static guard's two max
    reductions to the dynamic path, so the serving path leaves it off."""
    from ug_stereomatcher_tpu.ops.pallas.warp import (
        DYN_VMEM_BUDGET, dyn_vmem_bytes, plan_dyn_warp, warp_windowed,
        warp_windowed_dyn, window_reach)
    dy, dx = cfg.warp_window_for_level(level_index)
    H, W = disp_h.shape[-2:]

    def windowed():
        return warp_windowed(right, disp_h, disp_v,
                             max_dy=dy, max_dx=dx,
                             interpret=interpret, method=cfg.interp)

    def static_safe():
        """Absolute-reach predicate of the static windowed kernel."""
        v_reach, h_reach = window_reach(dy, dx)
        return ((jnp.max(jnp.abs(disp_v)) <= v_reach)
                & (jnp.max(jnp.abs(disp_h)) <= h_reach))

    def static_guarded():
        """Static windowed kernel behind its absolute-reach guard (the
        round-1/2 contract: exact in-window, exact gather beyond)."""
        return jax.lax.cond(
            static_safe(), windowed,
            lambda: warp_by_disparity(right, disp_h, disp_v, cfg.interp))

    if (cfg.warp_dynamic and cfg.warp_overflow_guard
            and dyn_vmem_bytes(W) <= DYN_VMEM_BUDGET):
        # Dynamic windows: the planning pass replaces the static guard's
        # reductions (same full-plane traversal), the window follows the
        # field (no absolute-reach limit), and the small slabs pipeline
        # behind the sweeps.  TIERED fallback: a field whose per-tile
        # spread exceeds capacity (a few outlier-dense tiles on
        # free-running scenes) tiers down to the static windowed kernel,
        # which bounds ABSOLUTE offsets instead — only a field beyond
        # both contracts pays for the exact unbounded gather.
        voffs, ok = plan_dyn_warp(disp_h, disp_v, H=H, W=W,
                                  method=cfg.interp)
        out = jax.lax.cond(
            ok,
            lambda: warp_windowed_dyn(right, disp_h, disp_v, voffs,
                                      interpret=interpret,
                                      method=cfg.interp),
            static_guarded)
        if with_tier:
            tier = jnp.where(ok, TIER_DYN,
                             jnp.where(static_safe(), TIER_STATIC,
                                       TIER_EXACT)).astype(jnp.int32)
            return out, tier
        return out

    if not cfg.warp_overflow_guard:
        out = windowed()
        return (out, jnp.int32(TIER_STATIC)) if with_tier else out
    out = static_guarded()
    if with_tier:
        tier = jnp.where(static_safe(), TIER_STATIC,
                         TIER_EXACT).astype(jnp.int32)
        return out, tier
    return out


def _warp(right, disp_h, disp_v, cfg: MatcherConfig, level_index: int,
          with_tier: bool = False):
    h, w = right.shape[-2:]
    if _use_pallas_warp(cfg, h, w):
        return warp_for_level(right, disp_h, disp_v, cfg, level_index,
                              with_tier=with_tier)
    out = warp_by_disparity(right, disp_h, disp_v, cfg.interp)
    return (out, jnp.int32(TIER_XLA_DEFAULT)) if with_tier else out



def direction_maps(left: jnp.ndarray, warped: jnp.ndarray,
                   blurred_l2: jnp.ndarray) -> List[jnp.ndarray]:
    """Five channel-mean correlation maps for the current warp.

    left, warped: (C, H, W); blurred_l2: (C, H, W) precomputed
    G(left^2) with clamp boundary.  Returns [dir_l, dir_r, dir_u, dir_d,
    dir_c], each (H, W).

    Per move d: corr_d = clip(G(L*W_d)^2 / (G(L^2) * G(W^2)(x+d)), 0, 1)
    averaged over channels — the reference's per-channel accumulate/rescale
    chain (MatchGPULib.cpp:1910-2079).  All five moves' cross-products are
    stacked into one (5, C, H, W) batch so the blur runs as a single
    batched stencil instead of five kernel launches."""
    blurred_w2 = blur_gaussian_clamp(warped * warped)
    crosses = jnp.stack(
        [left * shift_image(warped, dx, dy) for (dx, dy) in MOVES])
    bcross = blur_gaussian_zero(crosses)
    out = []
    for k, (dx, dy) in enumerate(MOVES):
        corr = correlation_ratio(bcross[k], blurred_l2,
                                 shift_image(blurred_w2, dx, dy))
        out.append(jnp.mean(corr, axis=0))
    return out


def match_level(left: jnp.ndarray, right: jnp.ndarray, disp: jnp.ndarray,
                level_index: int, cfg: MatcherConfig,
                is_coarsest: bool, instrument: bool = False) -> jnp.ndarray:
    """Iteratively refine the disparity triplet at one pyramid level.

    left, right: (C, H, W) images at this level.
    disp: (3, H, W) state [disp_h, disp_v, confidence].
    level_index: pyramid index i (0 = finest) — sets the iteration count
    mi = 22 for i > 5 else (i+1)*2 and the smoothing repetitions
    (10 for the two finest levels, else 5).
    is_coarsest: the confidence blend is skipped on the very first iteration
    of the coarsest level (MatchGPULib.cpp:2223-2225).

    Returns the refined (3, H, W) triplet; with ``instrument=True``,
    ``(triplet, counts)`` where counts is a (6,) int32 vector indexed by
    TIER_NAMES — per-iteration warp-tier decisions plus level-resident
    iteration and overflow-recompute counters.  The instrumented graph is
    numerically identical; it only adds the tier predicates and counters.
    """
    mi = cfg.iters_for_level(level_index)
    n_smooth = cfg.smooth_passes_for_level(level_index)
    thresholds = jnp.asarray(cfg.threshold_schedule(mi), dtype=left.dtype)

    def scan_path():
        return _match_level_scan(left, right, disp, level_index, cfg,
                                 is_coarsest, mi, n_smooth, thresholds,
                                 instrument=instrument)

    if _use_level_resident(cfg, left.shape[0], left.shape[-2],
                           left.shape[-1], level_index):
        from ug_stereomatcher_tpu.ops.pallas.level import (
            level_resident_match)
        dy, dx = cfg.warp_window_for_level(level_index)
        state, ovf = level_resident_match(
            left, right, disp, thresholds, mi=mi, n_smooth=n_smooth,
            replace_first=is_coarsest, max_dy=dy, max_dx=dx,
            consts=(cfg.conf_no_peak, cfg.conf_affine_scale,
                    cfg.conf_affine_bias, cfg.conf_blend_new,
                    cfg.conf_blend_old),
            method=cfg.interp,
            interpret=(cfg.level_backend == "interpret"))
        if not cfg.warp_overflow_guard:
            if instrument:
                counts = jnp.zeros(6, jnp.int32).at[4].set(mi)
                return state, counts
            return state
        # Same auto-exactness contract as warp_for_level: if any
        # iteration's field exceeded the window's exact reach the kernel's
        # clamped result may diverge from the unbounded gather — recompute
        # the whole level on the exact path.
        if instrument:
            def recompute():
                s, c = scan_path()
                return s, c.at[5].set(1)  # overflow_recompute

            def resident():
                return state, jnp.zeros(6, jnp.int32).at[4].set(mi)

            return jax.lax.cond(ovf > 0.0, recompute, resident)
        return jax.lax.cond(ovf > 0.0, scan_path, lambda: state)
    return scan_path()


def _make_level_body(left, right, blurred_l2, cfg: MatcherConfig,
                     level_index, is_coarsest, n_smooth, use_pallas,
                     instrument: bool):
    """One refinement iteration as a scan/while-compatible body closure:
    ``body(carry, (m, threshold))`` with carry (disp_h, disp_v, conf[,
    counts]).  Shared by the lax.scan loop, the early-exit while_loop and
    the convergence trace so all three run the IDENTICAL per-iteration
    graph (reference matchlevel body, MatchGPULib.cpp:1743-2412)."""
    def body(carry, inputs):
        if instrument:
            disp_h, disp_v, conf, counts = carry
        else:
            disp_h, disp_v, conf = carry
            counts = None
        m, threshold = inputs

        if instrument:
            warped, tier = _warp(right, disp_h, disp_v, cfg, level_index,
                                 with_tier=True)
            counts = counts.at[tier].add(1)
        else:
            warped = _warp(right, disp_h, disp_v, cfg, level_index)

        if use_pallas:
            # One fused kernel: correlate -> parabola -> update -> blend
            # (bit-identical to the unfused chain below).
            from ug_stereomatcher_tpu.ops.pallas.direction import (
                fused_direction_update)
            replace = (m == 0) if is_coarsest else jnp.int32(0)
            state = fused_direction_update(
                left, warped, blurred_l2,
                jnp.stack([disp_h, disp_v, conf]), threshold, replace,
                consts=(cfg.conf_no_peak, cfg.conf_affine_scale,
                        cfg.conf_affine_bias, cfg.conf_blend_new,
                        cfg.conf_blend_old))
        else:
            dir_l, dir_r, dir_u, dir_d, dir_c = direction_maps(
                left, warped, blurred_l2)

            inc_h, conf_h = parabola_fit(
                dir_l, dir_c, dir_r, threshold, cfg.conf_no_peak,
                cfg.conf_affine_scale, cfg.conf_affine_bias)
            inc_v, conf_v = parabola_fit(
                dir_u, dir_c, dir_d, threshold, cfg.conf_no_peak,
                cfg.conf_affine_scale, cfg.conf_affine_bias)
            conf_new = conf_h * conf_v  # compCorrelation (MatchLib.cu:884)

            disp_h = inc_h + disp_h  # step scaling is int(1.0)=1
            disp_v = inc_v + disp_v  # (scaleDisparity, MatchGPULib.cpp:2175)

            blended = blend_confidence(conf_new, conf,
                                       cfg.conf_blend_new, cfg.conf_blend_old)
            if is_coarsest:
                conf = jnp.where(m == 0, conf_new, blended)
            else:
                conf = blended
            state = jnp.stack([disp_h, disp_v, conf])

        # Confidence-weighted plus-smoothing: all three maps smoothed against
        # the same pre-pass confidence snapshot (MatchGPULib.cpp:2262-2292),
        # then the 3-tap average filter (:2361-2412).  Stacked so each pass
        # is one batched stencil; on TPU the whole chain runs as one fused
        # Pallas kernel.
        if use_pallas:
            from ug_stereomatcher_tpu.ops.pallas.smooth import (
                fused_smooth_average)
            state = fused_smooth_average(state, n_passes=n_smooth)
        else:
            for _ in range(n_smooth):
                state = weighted_smooth(state, state[2])
            state = blur_average_clamp(state)
        if instrument:
            return (state[0], state[1], state[2], counts), None
        return (state[0], state[1], state[2]), None

    return body


def _level_blurred_l2(left, cfg: MatcherConfig):
    """Iteration-invariant blurred left energy (the reference recomputes
    this every iteration/channel — MatchGPULib.cpp:1809-1880 — pure
    waste)."""
    from ug_stereomatcher_tpu.ops.pallas.blur import fused_blur_gaussian
    if _use_pallas_stencil(cfg, left.shape[-2], left.shape[-1]):
        return fused_blur_gaussian(left * left, boundary="clamp")
    return blur_gaussian_clamp(left * left)


def _match_level_scan(left, right, disp, level_index, cfg: MatcherConfig,
                      is_coarsest, mi, n_smooth, thresholds,
                      instrument: bool = False) -> jnp.ndarray:
    """The lax.scan level loop (one fused XLA/Pallas-stencil iteration per
    step) — the exact path `match_level` scans when the level-resident
    kernel is gated off or its overflow guard fires.

    With ``cfg.early_exit_delta`` set (opt-in, NON-parity: the reference
    always runs its fixed iteration schedule) the scan becomes a
    ``lax.while_loop`` that stops once the confidence-weighted mean
    absolute disparity change of an iteration drops below the threshold
    on both axes — the reference's own dormant convergence test
    (differenceIterations, MatchGPULib.cpp:1323-1334) finally driving the
    loop it was written for.  Instrumented runs keep the full scan so
    tier counts stay schedule-shaped.  The while body runs the identical
    iteration graph, but XLA may fuse across the loop construct
    differently than in the scan, so outputs can differ at the ~1-ulp
    level even at a threshold of 0 (measured 6e-8 on one level; the
    usual gather-flip chaos amplifies that across a full pyramid)."""
    use_pallas = _use_pallas_stencil(cfg, left.shape[-2], left.shape[-1])
    blurred_l2 = _level_blurred_l2(left, cfg)
    body = _make_level_body(left, right, blurred_l2, cfg, level_index,
                            is_coarsest, n_smooth, use_pallas, instrument)

    if cfg.early_exit_delta is not None and not instrument and mi > 1:
        from ug_stereomatcher_tpu.ops.convergence import weighted_difference
        thr = jnp.asarray(cfg.early_exit_delta, left.dtype)
        big = jnp.asarray(jnp.inf, left.dtype)

        def cond(carry):
            m, _, _, _, delta = carry
            return (m < mi) & (delta >= thr)

        def wbody(carry):
            m, disp_h, disp_v, conf, _ = carry
            (nh, nv, nc), _ = body((disp_h, disp_v, conf),
                                   (m, thresholds[m]))
            delta = jnp.maximum(weighted_difference(nh, disp_h, nc),
                                weighted_difference(nv, disp_v, nc))
            return (m + 1, nh, nv, nc, delta)

        _, disp_h, disp_v, conf, _ = jax.lax.while_loop(
            cond, wbody, (jnp.int32(0), disp[0], disp[1], disp[2], big))
        return jnp.stack([disp_h, disp_v, conf])

    ms = jnp.arange(mi)
    if instrument:
        init = (disp[0], disp[1], disp[2], jnp.zeros(6, jnp.int32))
        (disp_h, disp_v, conf, counts), _ = jax.lax.scan(
            body, init, (ms, thresholds))
        return jnp.stack([disp_h, disp_v, conf]), counts
    init = (disp[0], disp[1], disp[2])
    (disp_h, disp_v, conf), _ = jax.lax.scan(body, init, (ms, thresholds))
    return jnp.stack([disp_h, disp_v, conf])


def level_convergence_trace(left, right, disp, level_index,
                            cfg: MatcherConfig, is_coarsest):
    """Run one level's full iteration schedule and return
    ``(triplet, deltas)`` where deltas is a (mi, 2) array of per-iteration
    confidence-weighted mean |change| for (disp_h, disp_v) — the
    reference's weightedDifference metric (MatchGPULib.cpp:1336-1437)
    traced through the live loop.  Observability/tuning aid for
    ``cfg.early_exit_delta``; runs the identical body as the serving
    scan."""
    from ug_stereomatcher_tpu.ops.convergence import weighted_difference
    mi = cfg.iters_for_level(level_index)
    n_smooth = cfg.smooth_passes_for_level(level_index)
    thresholds = jnp.asarray(cfg.threshold_schedule(mi), dtype=left.dtype)
    use_pallas = _use_pallas_stencil(cfg, left.shape[-2], left.shape[-1])
    blurred_l2 = _level_blurred_l2(left, cfg)
    body = _make_level_body(left, right, blurred_l2, cfg, level_index,
                            is_coarsest, n_smooth, use_pallas,
                            instrument=False)

    def traced(carry, inputs):
        disp_h, disp_v, conf = carry
        (nh, nv, nc), _ = body(carry, inputs)
        dh = weighted_difference(nh, disp_h, nc)
        dv = weighted_difference(nv, disp_v, nc)
        return (nh, nv, nc), jnp.stack([dh, dv])

    init = (disp[0], disp[1], disp[2])
    (disp_h, disp_v, conf), deltas = jax.lax.scan(
        traced, init, (jnp.arange(mi), thresholds))
    return jnp.stack([disp_h, disp_v, conf]), deltas



class PyramidMatchResult(NamedTuple):
    """Per-level disparity triplets, index 0 = finest level processed.

    ``tier_counts`` (instrumented runs only): per-level (6,) int32 vectors
    indexed by TIER_NAMES — warp-tier decisions, level-resident iterations,
    overflow recomputes."""
    levels: Tuple[jnp.ndarray, ...]
    tier_counts: Optional[Tuple[jnp.ndarray, ...]] = None


def level_dims_for_matching(cfg: MatcherConfig, height: int, width: int,
                            num_levels: int, foveated: bool
                            ) -> List[Tuple[int, int]]:
    """Per-level match dimensions.  In foveated mode, levels finer than
    fovea_level-1 are forced to the fixed fovea size
    (MatchGPULib.cpp:1230-1240)."""
    dims = list(cfg.dims_chain(height, width)[:num_levels])
    if foveated:
        fov = dims[cfg.fovea_level - 1]
        for i in range(cfg.fovea_level - 1):
            dims[i] = fov
    return dims


def match_pyramid(left_levels: Sequence[jnp.ndarray],
                  right_levels: Sequence[jnp.ndarray],
                  cfg: MatcherConfig,
                  full_dims: Tuple[int, int],
                  foveated: bool = False,
                  instrument: bool = False) -> PyramidMatchResult:
    """Coarse-to-fine driver over a (possibly foveated) pyramid.

    left_levels/right_levels: per-level (C, h, w) images, index 0 = finest.
    full_dims: (H, W) of the original image (defines the dimension chain).
    Returns every level's refined triplet (the foveated stack needs them
    all; non-foveated mode uses index 0).

    Reference: matching (MatchGPULib.cpp:1196-1318).  The initial disparity
    at the coarsest level is zero (the reference reads freshly-malloc'd —
    effectively zero-page — memory)."""
    n = len(left_levels)
    height, width = full_dims
    dims = level_dims_for_matching(cfg, height, width, n, foveated)
    full_chain = cfg.dims_chain(height, width)

    results: List[jnp.ndarray] = [None] * n  # type: ignore[list-item]
    counts: List[jnp.ndarray] = [None] * n  # type: ignore[list-item]
    h, w = dims[n - 1]
    disp = jnp.zeros((3, h, w), dtype=left_levels[0].dtype)

    for i in range(n - 1, -1, -1):
        out = match_level(left_levels[i], right_levels[i], disp, i,
                          cfg, is_coarsest=(i == n - 1),
                          instrument=instrument)
        disp, counts[i] = out if instrument else (out, None)
        results[i] = disp
        if i > 0:
            if (not foveated) or i >= cfg.fovea_level:
                h2, w2 = dims[i - 1]
                disp = pyr.upsample_to_level(disp, h2, w2, cfg)
            else:
                # Fovea-to-fovea transition: upsample onto the next full-size
                # grid then crop the centred window (MatchGPULib.cpp:1288-1293;
                # target dims captured *before* the fovea override, :1231-1232).
                big_h, big_w = full_chain[cfg.fovea_level - 2]
                disp = pyr.foveated_upsample(disp, big_h, big_w, cfg)

    return PyramidMatchResult(
        levels=tuple(results),
        tier_counts=tuple(counts) if instrument else None)
