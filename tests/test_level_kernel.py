"""Level-resident kernel parity (interpreter mode, CPU).

ops/pallas/level.py runs a whole pyramid level's mi-iteration refinement
in one Pallas call.  Its contract is the fused kernels' tolerance contract
(same op set / term order as the unfused scan, ~1e-5 free-running drift
from the mask-algebra boundary terms), plus warp_for_level's overflow
semantics: the emitted flag must fire whenever any iteration's field
exceeds the window's exact reach, and the match_level wiring must then
fall back to the exact scan path.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ug_stereomatcher_tpu import match as match_mod
from ug_stereomatcher_tpu import pyramid as pyr
from ug_stereomatcher_tpu.config import MatcherConfig
from ug_stereomatcher_tpu.ops.pallas.level import (
    LEVEL_VMEM_BUDGET,
    level_resident_match,
    level_resident_vmem_bytes,
)

RNG = np.random.RandomState(7)


def smooth_scene(h, w, shift=1.5, seed=3):
    """A correlated random pair (left, right ~ left shifted by `shift`)."""
    rng = np.random.RandomState(seed)
    base = rng.rand(3, h + 8, w + 8).astype(np.float32)
    for axis in (1, 2):  # crude blur for spatial correlation
        base = 0.25 * np.roll(base, 1, axis) + 0.5 * base \
            + 0.25 * np.roll(base, -1, axis)
    left = base[:, 4:4 + h, 4:4 + w]
    s = int(round(shift))
    right = base[:, 4:4 + h, 4 + s:4 + s + w]
    return jnp.asarray(left), jnp.asarray(right)


def exact_cfg(**kw):
    return MatcherConfig(warp_backend="xla", level_backend="xla", **kw)


def kernel_cfg(**kw):
    kw.setdefault("level_tail", True)
    return MatcherConfig(level_backend="interpret", **kw)


def assert_lockstep_close(out, ref, *, q99=2e-3, cap=0.05):
    """Per-level comparison under the repo chaos rule: nearest-warp index
    flips amplify float noise at isolated pixels, so bound the bulk with a
    quantile and the outliers with a loose cap."""
    d = np.abs(out - ref)
    assert np.quantile(d, 0.99) <= q99, (np.quantile(d, 0.99), d.max())
    assert d.max() <= cap, d.max()


class TestLevelKernelParity:
    @pytest.mark.parametrize("method", ["nearest", "bilinear"])
    @pytest.mark.parametrize("is_coarsest", [True, False])
    def test_matches_scan_path(self, method, is_coarsest):
        h, w = 36, 52
        left, right = smooth_scene(h, w)
        disp = jnp.zeros((3, h, w), jnp.float32)
        if not is_coarsest:
            disp = disp.at[2].set(0.5)  # non-trivial confidence carry-in
        level_index = 6  # mi = 22-cut schedule; use a shorter cutoff
        cfg_x = exact_cfg(interp=method, level_cutoff=6)
        cfg_k = kernel_cfg(interp=method, level_cutoff=6)
        ref = np.asarray(match_mod.match_level(
            left, right, disp, level_index, cfg_x, is_coarsest))
        out = np.asarray(match_mod.match_level(
            left, right, disp, level_index, cfg_k, is_coarsest))
        if method == "bilinear":
            np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-4)
        else:
            assert_lockstep_close(out, ref)

    def test_direct_call_multi_iteration(self):
        """Direct kernel call, full 22-iteration coarse schedule."""
        h, w = 24, 40
        left, right = smooth_scene(h, w, seed=11)
        disp = jnp.zeros((3, h, w), jnp.float32)
        cfg = exact_cfg()
        mi = cfg.iters_for_level(8)
        thr = jnp.asarray(cfg.threshold_schedule(mi), jnp.float32)
        dy, dx = cfg.warp_window_for_level(8)
        state, ovf = level_resident_match(
            left, right, disp, thr, mi=mi, n_smooth=5, replace_first=True,
            max_dy=dy, max_dx=dx, interpret=True)
        ref = np.asarray(match_mod.match_level(
            left, right, disp, 8, cfg, is_coarsest=True))
        assert float(ovf) == 0.0
        assert_lockstep_close(np.asarray(state), ref)


class TestOverflowFallback:
    def test_flag_fires_beyond_reach(self):
        h, w = 16, 40
        left, right = smooth_scene(h, w, seed=5)
        # carry-in disparity far beyond the horizontal window reach
        disp = jnp.zeros((3, h, w), jnp.float32).at[0].set(300.0)
        thr = jnp.asarray((1.0, 1.0), jnp.float32)
        _, ovf = level_resident_match(
            left, right, disp, thr, mi=2, n_smooth=5, replace_first=True,
            max_dy=16, max_dx=128, interpret=True)
        assert float(ovf) > 0.0

    def test_wiring_falls_back_to_exact_path(self):
        """match_level with the kernel enabled must return the exact scan
        result when the field overflows the window.  The cond takes the
        scan branch; compiling that same graph inside a cond branch changes
        XLA's fusion/contraction order slightly, so compare with a tight
        float tolerance rather than bit equality."""
        h, w = 16, 40
        left, right = smooth_scene(h, w, seed=5)
        disp = jnp.zeros((3, h, w), jnp.float32).at[0].set(300.0)
        cfg_x = exact_cfg(level_cutoff=2)
        cfg_k = kernel_cfg(level_cutoff=2, warp_backend="xla")
        ref = np.asarray(match_mod.match_level(
            left, right, disp, 6, cfg_x, is_coarsest=True))
        out = np.asarray(match_mod.match_level(
            left, right, disp, 6, cfg_k, is_coarsest=True))
        np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-3)

    def test_guard_off_pins_kernel(self):
        """warp_overflow_guard=False must not trace the fallback branch —
        the clamped kernel result comes back as-is."""
        h, w = 16, 40
        left, right = smooth_scene(h, w, seed=5)
        disp = jnp.zeros((3, h, w), jnp.float32).at[0].set(300.0)
        cfg_k = kernel_cfg(level_cutoff=2, warp_overflow_guard=False)
        out = np.asarray(match_mod.match_level(
            left, right, disp, 6, cfg_k, is_coarsest=True))
        assert np.all(np.isfinite(out[2]))


class TestGate:
    def test_auto_gate_off_on_cpu(self):
        cfg = MatcherConfig()
        assert not match_mod._use_level_resident(cfg, 3, 100, 100, 8)

    def test_forced_modes(self):
        assert match_mod._use_level_resident(
            MatcherConfig(level_backend="interpret"), 3, 100, 100, 8)
        assert match_mod._use_level_resident(
            MatcherConfig(level_backend="pallas"), 3, 100, 100, 8)
        assert not match_mod._use_level_resident(
            MatcherConfig(level_backend="xla"), 3, 100, 100, 8)
        with pytest.raises(ValueError):
            match_mod._use_level_resident(
                MatcherConfig(level_backend="bogus"), 3, 100, 100, 8)

    def test_vmem_estimate_16mp_chain(self):
        """On the 16MP chain the coarse tail fits the budget; the big
        mid-levels must not (they'd blow VMEM)."""
        cfg = MatcherConfig()
        dims = cfg.dims_chain(3264, 4928)
        dy8, _ = cfg.warp_window_for_level(8)
        assert level_resident_vmem_bytes(dims[8][0], dims[8][1],
                                         dy8) <= LEVEL_VMEM_BUDGET
        dy5, _ = cfg.warp_window_for_level(5)
        assert level_resident_vmem_bytes(dims[5][0], dims[5][1],
                                         dy5) > LEVEL_VMEM_BUDGET


class TestTailKernel:
    """Coarse-tail kernel: several levels + their upsamples in one Pallas
    program (match._tail_match / ops/pallas/level.tail_resident_match)."""

    def _pyramids(self, h, w, cfg):
        from ug_stereomatcher_tpu import pyramid as pyr
        left, right = smooth_scene(h, w)
        n = cfg.num_levels(h, w)
        return (pyr.build_pyramid(left, cfg, n),
                pyr.build_pyramid(right, cfg, n), n)

    @pytest.mark.parametrize("method", ["nearest", "bilinear"])
    def test_matches_per_level_chain(self, method):
        """The tail program must reproduce the per-level kernel chain
        (same mask-algebra level runner, so the only residuals are the
        upsample backend — exact for nearest, ~1e-6 for bilinear — and
        compilation-context fusion noise, chaos-amplified for nearest)."""
        h, w = 48, 68
        cfg_k = kernel_cfg(interp=method, level_cutoff=2, min_dim=16)
        lp, rp, n = self._pyramids(h, w, cfg_k)
        dims = match_mod.level_dims_for_matching(cfg_k, h, w, n, False)
        span = match_mod._tail_span(cfg_k, dims, n, False, 3)
        assert span and span[0] == n - 1 and len(span) >= 2

        out = match_mod.match_pyramid(lp, rp, cfg_k, (h, w))  # tail path

        # reference: the same levels through the SINGLE-level kernel
        # path, with the SAME upsample backend (the tail's MXU two-hot
        # carries float64 trace-time weights; the XLA bilinear gather
        # computes them in float32 on-device — a documented ~1e-5 gap
        # that discrete parabola branches would amplify over the chain)
        from ug_stereomatcher_tpu.ops.pallas.resample import resample_tex
        inv = 1.0 / cfg_k.scale
        d = jnp.zeros((3,) + dims[n - 1], jnp.float32)
        refs = [None] * n
        for i in range(n - 1, -1, -1):
            d = match_mod.match_level(lp[i], rp[i], d, i, cfg_k,
                                      is_coarsest=(i == n - 1))
            refs[i] = d
            if i > 0:
                h2, w2 = dims[i - 1]
                d = resample_tex(d, h2, w2, lambda t: t * inv,
                                 cfg_k.scale, method, interpret=True)
        q99, cap = (1e-3, 0.05) if method == "nearest" else (1e-4, 2e-2)
        for i in range(n):
            assert_lockstep_close(np.asarray(out.levels[i]),
                                  np.asarray(refs[i]), q99=q99, cap=cap)

    def test_tail_overflow_falls_back_to_exact(self):
        """A field beyond the vertical window reach must fire the tail's
        flags; the cond then returns the exact scan chain (compare with a
        tight float tolerance on a NON-degenerate scene — the same graph
        inside a cond branch fuses slightly differently)."""
        h, w = 64, 96
        cfg_k = kernel_cfg(level_cutoff=2, min_dim=16,
                           warp_max_dy=8, warp_max_dx=128)
        left, right = smooth_scene(h, w)
        n = cfg_k.num_levels(h, w)
        lp = pyr.build_pyramid(left, cfg_k, n)
        rp = pyr.build_pyramid(right, cfg_k, n)
        dims = match_mod.level_dims_for_matching(cfg_k, h, w, n, False)
        span = match_mod._tail_span(cfg_k, dims, n, False, 3)
        assert span and len(span) >= 2
        hh, ww = dims[n - 1]
        # |dv| = 20 > v_reach = 15 at every level: vertical overflow
        # without saturating the tiny coarse grids
        disp = jnp.stack([jnp.zeros((hh, ww), jnp.float32),
                          jnp.full((hh, ww), 20.0, jnp.float32),
                          jnp.full((hh, ww), 0.5, jnp.float32)])
        out = match_mod._tail_match(lp, rp, span, disp, cfg_k, dims)

        # pinning the kernel (guard off) must give a DIFFERENT result —
        # proof the guard actually switched branches
        import dataclasses
        cfg_ng = dataclasses.replace(cfg_k, warp_overflow_guard=False)
        out_ng = match_mod._tail_match(lp, rp, span, disp, cfg_ng, dims)
        assert any(
            float(jnp.max(jnp.abs(a - b))) > 1e-3
            for a, b in zip(out, out_ng))

        # exact reference chain (scan path)
        d = disp
        refs = []
        for k, i in enumerate(span):
            mi = cfg_k.iters_for_level(i)
            ns = cfg_k.smooth_passes_for_level(i)
            ths = jnp.asarray(cfg_k.threshold_schedule(mi), jnp.float32)
            d = match_mod._match_level_scan(lp[i], rp[i], d, i, cfg_k,
                                            is_coarsest=(k == 0), mi=mi,
                                            n_smooth=ns, thresholds=ths)
            refs.append(d)
            if k + 1 < len(span):
                d = pyr.upsample_to_level(d, *dims[span[k + 1]], cfg=cfg_k)
        # Mechanism assertion: both the guard-on output and `refs` run the
        # exact scan math (cond-traced vs eager — context noise that the
        # chaotic chain amplifies at isolated pixels), while the pinned
        # kernel CLAMPED the out-of-window field.  The guard-on output
        # must therefore sit overwhelmingly closer to the exact chain
        # than the pinned-kernel output does, at every level.
        # ...at the finest level: at tiny coarse levels BOTH warps are
        # fully edge-clamped (|dv| exceeds the level height), so exact
        # and clamped read the same data there and only fine levels
        # separate them
        d_exact = float(jnp.median(jnp.abs(out[-1] - refs[-1])))
        d_clamp = float(jnp.median(jnp.abs(out_ng[-1] - refs[-1])))
        assert d_clamp > 5 * max(d_exact, 1e-6), (d_exact, d_clamp)

    def test_span_respects_fovea_boundary(self):
        cfg = kernel_cfg(fovea_level=3, min_dim=8)
        dims = [(10 * (i + 1), 12 * (i + 1)) for i in range(6)]
        span = match_mod._tail_span(cfg, dims, 6, True, 3)
        assert span is not None
        assert min(span) >= cfg.fovea_level - 1

    def test_span_none_on_cpu_auto(self):
        cfg = MatcherConfig(level_tail=True)  # auto gates off on CPU
        dims = [(100, 100)] * 5
        assert match_mod._tail_span(cfg, dims, 5, False, 3) is None

    def test_span_none_when_tail_disabled(self):
        cfg = MatcherConfig(level_backend="interpret")  # default: off
        dims = [(100, 100)] * 5
        assert match_mod._tail_span(cfg, dims, 5, False, 3) is None
