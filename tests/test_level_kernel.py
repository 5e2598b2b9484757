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
