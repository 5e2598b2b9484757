"""Pallas kernel parity tests (interpreter mode, CPU).

The fused TPU kernels claim (windowed-)exact equivalence with their XLA
twins; these tests enforce it in CI via interpret=True so drift — like a
hard-coded constant diverging from MatcherConfig — is caught without TPU
hardware.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ug_stereomatcher_tpu import ops
from ug_stereomatcher_tpu import match as match_mod
from ug_stereomatcher_tpu.ops.pallas.direction import fused_direction_update
from ug_stereomatcher_tpu.ops.pallas.smooth import fused_smooth_average
from ug_stereomatcher_tpu.ops.pallas.warp import warp_nearest_windowed
from ug_stereomatcher_tpu.ops.pointwise import blend_confidence, parabola_fit

RNG = np.random.RandomState(0)


class TestWarpKernel:
    def test_in_window_exact(self):
        h, w = 40, 160
        img = jnp.asarray(RNG.rand(3, h, w).astype(np.float32))
        dh = jnp.asarray((RNG.rand(h, w).astype(np.float32) - 0.5) * 40)
        dv = jnp.asarray((RNG.rand(h, w).astype(np.float32) - 0.5) * 6)
        ref = np.asarray(ops.warp_by_disparity(img, dh, dv))
        out = np.asarray(warp_nearest_windowed(img, dh, dv, max_dy=4,
                                               max_dx=128, tile_rows=8,
                                               interpret=True))
        np.testing.assert_array_equal(out, ref)

    def test_out_of_window_clamps_not_zero(self):
        """Out-of-window offsets must clamp to the window edge (the
        documented contract) — not fall through to zeros."""
        h, w = 16, 512
        img = jnp.asarray(RNG.rand(h, w).astype(np.float32) + 1.0)  # no 0s
        dh = jnp.full((h, w), -400.0, jnp.float32)  # far beyond +-128 window
        dv = jnp.zeros((h, w), jnp.float32)
        out = np.asarray(warp_nearest_windowed(img, dh, dv, max_dy=4,
                                               max_dx=128, tile_rows=8,
                                               interpret=True))
        assert np.all(out >= 1.0), "zero fill leaked through the window"

    def test_2d_and_3d_inputs(self):
        h, w = 24, 128
        img = jnp.asarray(RNG.rand(h, w).astype(np.float32))
        z = jnp.zeros((h, w), jnp.float32)
        out = np.asarray(warp_nearest_windowed(img, z, z, max_dy=4,
                                               max_dx=128, tile_rows=8,
                                               interpret=True))
        np.testing.assert_array_equal(out, np.asarray(img))


class TestBilinearWarpKernel:
    """The windowed kernel's bilinear mode (4 one-hot taps) must equal the
    XLA bilinear gather — the 10x-accuracy quality mode keeps the fast
    path (CUDA linear-filtering convention: weights from coord-0.5)."""

    def test_in_window_matches_xla_bilinear(self):
        from ug_stereomatcher_tpu.ops.pallas.warp import warp_windowed
        h, w = 40, 160
        img = jnp.asarray(RNG.rand(3, h, w).astype(np.float32))
        dh = jnp.asarray((RNG.rand(h, w).astype(np.float32) - 0.5) * 40)
        dv = jnp.asarray((RNG.rand(h, w).astype(np.float32) - 0.5) * 6)
        ref = np.asarray(ops.warp_by_disparity(img, dh, dv, "bilinear"))
        out = np.asarray(warp_windowed(img, dh, dv, max_dy=4, max_dx=128,
                                       tile_rows=8, interpret=True,
                                       method="bilinear"))
        np.testing.assert_allclose(out, ref, rtol=1e-6, atol=1e-6)

    def test_integer_offsets_hit_single_tap(self):
        from ug_stereomatcher_tpu.ops.pallas.warp import warp_windowed
        h, w = 24, 256
        img = jnp.asarray(RNG.rand(h, w).astype(np.float32))
        dh = jnp.full((h, w), 3.0, jnp.float32)
        dv = jnp.full((h, w), -2.0, jnp.float32)
        out = np.asarray(warp_windowed(img, dh, dv, max_dy=4, max_dx=128,
                                       tile_rows=8, interpret=True,
                                       method="bilinear"))
        ref = np.asarray(ops.warp_by_disparity(img, dh, dv, "bilinear"))
        np.testing.assert_allclose(out, ref, rtol=1e-6, atol=1e-6)

    def test_reach_boundary_bilinear(self):
        from ug_stereomatcher_tpu.ops.pallas.warp import (
            warp_windowed, window_reach)
        v_reach, h_reach = window_reach(8, 256)
        h, w = 32, 1024
        img = jnp.asarray(RNG.rand(h, w).astype(np.float32))
        for dh_v, dv_v in ((h_reach - 0.25, 0.0), (-h_reach + 0.25, 0.0),
                           (0.0, v_reach - 0.25), (0.0, -v_reach + 0.25)):
            dh = jnp.full((h, w), dh_v, jnp.float32)
            dv = jnp.full((h, w), dv_v, jnp.float32)
            out = np.asarray(warp_windowed(img, dh, dv, max_dy=8,
                                           max_dx=256, tile_rows=8,
                                           interpret=True,
                                           method="bilinear"))
            ref = np.asarray(ops.warp_by_disparity(img, dh, dv, "bilinear"))
            np.testing.assert_allclose(out, ref, rtol=1e-6, atol=1e-6)

    def test_guarded_level_warp_bilinear_fallback(self):
        from ug_stereomatcher_tpu.config import MatcherConfig
        h, w = 32, 384
        img = jnp.asarray(RNG.rand(3, h, w).astype(np.float32))
        dh = jnp.full((h, w), 500.0, jnp.float32)   # way out of window
        dv = jnp.zeros((h, w), jnp.float32)
        cfg = MatcherConfig(interp="bilinear")
        out = np.asarray(match_mod.warp_for_level(img, dh, dv, cfg, 0,
                                                  interpret=True))
        ref = np.asarray(ops.warp_by_disparity(img, dh, dv, "bilinear"))
        np.testing.assert_allclose(out, ref, rtol=1e-6, atol=1e-6)


class TestWarpOverflowGuard:
    """The auto path must be exact even when the scene's disparity exceeds
    the kernel window (match.warp_for_level's lax.cond fallback to the
    unbounded XLA gather — warpAbyB parity, MatchLib.cu:499-549)."""

    def _cfg(self, **kw):
        from ug_stereomatcher_tpu.config import MatcherConfig
        return MatcherConfig(**kw)

    def test_over_window_scene_falls_back_exact(self):
        h, w = 32, 512
        img = jnp.asarray(RNG.rand(3, h, w).astype(np.float32))
        # worst case: offsets far beyond both window axes
        dh = jnp.asarray((RNG.rand(h, w).astype(np.float32)) * 80 + 300)
        dv = jnp.asarray((RNG.rand(h, w).astype(np.float32)) * 10 + 12)
        cfg = self._cfg(warp_max_dy=8, warp_max_dx=256)
        out = np.asarray(match_mod.warp_for_level(img, dh, dv, cfg, 0,
                                                  interpret=True))
        ref = np.asarray(ops.warp_by_disparity(img, dh, dv))
        np.testing.assert_array_equal(out, ref)

    def test_vertical_only_overflow_detected(self):
        h, w = 64, 256
        img = jnp.asarray(RNG.rand(3, h, w).astype(np.float32))
        dh = jnp.zeros((h, w), jnp.float32)
        dv = jnp.full((h, w), 40.0, jnp.float32)  # > level-0 reach
        cfg = self._cfg(warp_max_dy=8, warp_max_dx=256)
        out = np.asarray(match_mod.warp_for_level(img, dh, dv, cfg, 0,
                                                  interpret=True))
        ref = np.asarray(ops.warp_by_disparity(img, dh, dv))
        np.testing.assert_array_equal(out, ref)

    def test_in_window_scene_still_windowed_and_exact(self):
        h, w = 32, 384
        img = jnp.asarray(RNG.rand(3, h, w).astype(np.float32))
        dh = jnp.asarray((RNG.rand(h, w).astype(np.float32) - 0.5) * 60)
        dv = jnp.asarray((RNG.rand(h, w).astype(np.float32) - 0.5) * 6)
        cfg = self._cfg()
        out = np.asarray(match_mod.warp_for_level(img, dh, dv, cfg, 0,
                                                  interpret=True))
        ref = np.asarray(ops.warp_by_disparity(img, dh, dv))
        np.testing.assert_array_equal(out, ref)

    def test_guard_disabled_clamps(self):
        h, w = 16, 512
        img = jnp.asarray(RNG.rand(h, w).astype(np.float32) + 1.0)
        dh = jnp.full((h, w), -400.0, jnp.float32)
        dv = jnp.zeros((h, w), jnp.float32)
        cfg = self._cfg(warp_overflow_guard=False, warp_max_dy=4,
                        warp_max_dx=128)
        out = np.asarray(match_mod.warp_for_level(img[None], dh, dv, cfg, 0,
                                                  interpret=True))[0]
        ref = np.asarray(ops.warp_by_disparity(img, dh, dv))
        assert not np.array_equal(out, ref)  # clamped, not exact
        assert np.all(out >= 1.0)            # but clamps, never zero-fills

    def test_window_reach_is_exact_boundary(self):
        """At exactly the reach the windowed kernel must still be exact
        (the guard's <= comparison leans on this)."""
        from ug_stereomatcher_tpu.ops.pallas.warp import (
            warp_nearest_windowed, window_reach)
        v_reach, h_reach = window_reach(8, 256)
        h, w = 32, 1024
        img = jnp.asarray(RNG.rand(h, w).astype(np.float32))
        for dh_v, dv_v in ((h_reach, 0.0), (-h_reach, 0.0),
                           (0.0, v_reach), (0.0, -v_reach)):
            dh = jnp.full((h, w), dh_v, jnp.float32)
            dv = jnp.full((h, w), dv_v, jnp.float32)
            out = np.asarray(warp_nearest_windowed(
                img, dh, dv, max_dy=8, max_dx=256, tile_rows=8,
                interpret=True))
            ref = np.asarray(ops.warp_by_disparity(img, dh, dv))
            np.testing.assert_array_equal(out, ref)


class TestDynamicWarp:
    """Dynamic-window warp (warp_windowed_dyn + plan_dyn_warp): exact vs
    the unbounded XLA gather for ANY absolute offset whenever the plan's
    ok flag is True; ok=False routes callers to the exact gather.  The
    window follows the live field, so the static path's absolute-reach
    limits (warp_max_dy/dx) don't apply — only per-tile spread."""

    def _field(self, h, w, amp_v, amp_h, bias_h=0.0, bias_v=0.0):
        yy = np.linspace(0, 1, h)[:, None]
        xx = np.linspace(0, 1, w)[None, :]
        dh = (bias_h + amp_h * np.sin(2 * np.pi * yy)
              * np.cos(2 * np.pi * xx)).astype(np.float32)
        dv = (bias_v + amp_v * np.cos(2 * np.pi * xx)
              + 0.0 * yy).astype(np.float32)
        return jnp.asarray(dh), jnp.asarray(dv)

    # NB edge-clamp compression: a vertical bias near the image height
    # makes iy clip to H-1 across whole tiles, stretching the per-tile k
    # spread past capacity — the planner must then say ok=False (covered
    # by the overflow tests below).  These biases keep spreads in budget
    # while exceeding the static window's absolute reach by far.
    @pytest.mark.parametrize("method", ["nearest", "bilinear"])
    @pytest.mark.parametrize("bias_h,bias_v", [(0.0, 0.0), (700.0, 30.0),
                                               (-650.0, -25.0)])
    def test_exact_any_absolute_offset(self, method, bias_h, bias_v):
        from ug_stereomatcher_tpu.ops.pallas.warp import (
            plan_dyn_warp, warp_windowed_dyn)
        h, w = 100, 300
        img = jnp.asarray(RNG.rand(3, h, w).astype(np.float32))
        dh, dv = self._field(h, w, 3.0, 10.0, bias_h, bias_v)
        voffs, ok = plan_dyn_warp(dh, dv, H=h, W=w, method=method)
        assert bool(ok)
        out = np.asarray(warp_windowed_dyn(img, dh, dv, voffs,
                                           interpret=True, method=method))
        ref = np.asarray(ops.warp_by_disparity(img, dh, dv, method))
        if method == "nearest":
            np.testing.assert_array_equal(out, ref)
        else:
            np.testing.assert_allclose(out, ref, rtol=1e-6, atol=1e-6)

    @staticmethod
    def _two_sided_dv(h, w, amp):
        """±amp in one 64-row tile, rows chosen so no gather row clips
        (clipping compresses k spans and would legitimately re-enable the
        dyn window — the planner is span-exact, so overflow scenes must
        have real unclipped spans)."""
        dv = np.zeros((h, w), np.float32)
        dv[64:96] = amp
        dv[96:128] = -amp
        return jnp.asarray(dv)

    def test_vertical_spread_overflow_flags(self):
        from ug_stereomatcher_tpu.ops.pallas.warp import plan_dyn_warp
        h, w = 256, 300
        dv = self._two_sided_dv(h, w, 80.0)   # tile-1 span 160 > budget
        dh = jnp.zeros((h, w), jnp.float32)
        _, ok = plan_dyn_warp(dh, dv, H=h, W=w)
        assert not bool(ok)

    def test_horizontal_spread_overflow_flags(self):
        from ug_stereomatcher_tpu.ops.pallas.warp import plan_dyn_warp
        h, w = 64, 1024
        xx = np.linspace(0, 1, w)[None, :]
        dh = jnp.asarray((500.0 * np.sin(40 * np.pi * xx)
                          + np.zeros((h, 1))).astype(np.float32))
        dv = jnp.zeros((h, w), jnp.float32)
        _, ok = plan_dyn_warp(dh, dv, H=h, W=w)
        assert not bool(ok)

    def test_both_tiers_exceeded_falls_back_to_gather_exact(self):
        """A field beyond BOTH the dyn spread budget and the static
        absolute window must still come out exact (innermost tier: the
        unbounded XLA gather)."""
        from ug_stereomatcher_tpu.config import MatcherConfig
        from ug_stereomatcher_tpu.ops.pallas.warp import (plan_dyn_warp,
                                                          window_reach)
        h, w = 512, 300
        img = jnp.asarray(RNG.rand(3, h, w).astype(np.float32))
        dv = self._two_sided_dv(h, w, 200.0)
        dh = jnp.zeros((h, w), jnp.float32)
        cfg = MatcherConfig()
        assert cfg.warp_dynamic
        _, ok = plan_dyn_warp(dh, dv, H=h, W=w)
        v_reach, _ = window_reach(*cfg.warp_window_for_level(0))
        assert not bool(ok) and float(jnp.max(jnp.abs(dv))) > v_reach
        out = np.asarray(match_mod.warp_for_level(img, dh, dv, cfg, 0,
                                                  interpret=True))
        ref = np.asarray(ops.warp_by_disparity(img, dh, dv))
        np.testing.assert_array_equal(out, ref)

    def test_tiered_fallback_dyn_to_static_windowed(self):
        """A field whose per-tile SPREAD exceeds dyn capacity but whose
        ABSOLUTE offsets fit the static window must still be exact (tier
        down to the static windowed kernel, not the slow gather — and
        either way, bit-equal to the gather)."""
        from ug_stereomatcher_tpu.config import MatcherConfig
        from ug_stereomatcher_tpu.ops.pallas.warp import (plan_dyn_warp,
                                                          window_reach)
        h, w = 256, 256
        img = jnp.asarray(RNG.rand(3, h, w).astype(np.float32))
        dv = self._two_sided_dv(h, w, 80.0)
        dh = jnp.zeros((h, w), jnp.float32)
        cfg = MatcherConfig()
        # per-tile spread 160 > the dyn budget...
        _, ok = plan_dyn_warp(dh, dv, H=h, W=w, method="nearest")
        assert not bool(ok)
        # ...but max|dv| = 80 fits the level-0 static window
        v_reach, _ = window_reach(*cfg.warp_window_for_level(0))
        assert float(jnp.max(jnp.abs(dv))) <= v_reach
        out = np.asarray(match_mod.warp_for_level(img, dh, dv, cfg, 0,
                                                  interpret=True))
        ref = np.asarray(ops.warp_by_disparity(img, dh, dv))
        np.testing.assert_array_equal(out, ref)

    def test_warp_dynamic_off_keeps_static_window_path(self):
        """warp_dynamic=False preserves the static windowed kernel and its
        absolute-reach guard semantics."""
        from ug_stereomatcher_tpu.config import MatcherConfig
        h, w = 64, 384
        img = jnp.asarray(RNG.rand(3, h, w).astype(np.float32))
        dh, dv = self._field(h, w, 2.0, 8.0)
        cfg = MatcherConfig(warp_dynamic=False)
        out = np.asarray(match_mod.warp_for_level(img, dh, dv, cfg, 0,
                                                  interpret=True))
        ref = np.asarray(ops.warp_by_disparity(img, dh, dv))
        np.testing.assert_array_equal(out, ref)

    @pytest.mark.parametrize("method", ["nearest", "bilinear"])
    def test_padded_tile_large_offset_engages_and_exact(self, method):
        """Tile-pad rows (H % 64 != 0) carry zero disparity; they must be
        excluded from BOTH the plan's span checks and the kernel's
        per-block column-base decision.  Regression: with a large uniform
        offset the pad pixels used to (a) flip the plan to not-ok
        spuriously, and (b) — once the plan ignored them — pull the
        kernel's block base away from the real field, zeroing real
        outputs."""
        from ug_stereomatcher_tpu.ops.pallas.warp import (
            plan_dyn_warp, warp_windowed_dyn)
        h, w = 100, 2048            # Hp = 128: 28 pad rows in the last tile
        img = jnp.asarray(RNG.rand(3, h, w).astype(np.float32))
        dh = jnp.full((h, w), 500.0, jnp.float32)
        dv = jnp.full((h, w), -40.0, jnp.float32)
        voffs, ok = plan_dyn_warp(dh, dv, H=h, W=w, method=method)
        assert bool(ok)
        out = np.asarray(warp_windowed_dyn(img, dh, dv, voffs,
                                           interpret=True, method=method))
        ref = np.asarray(ops.warp_by_disparity(img, dh, dv, method))
        if method == "nearest":
            np.testing.assert_array_equal(out, ref)
        else:
            np.testing.assert_allclose(out, ref, rtol=1e-6, atol=1e-6)

    def test_sharded_plan_ok_with_padded_tiles(self):
        """Sharded shards whose hl % 64 != 0 must still engage the dyn
        path for benign fields (regression: pad rows' raw coordinates
        poisoned the halo containment check)."""
        from ug_stereomatcher_tpu.ops.pallas.warp import plan_dyn_warp
        for hl, vh, row0 in ((65, 8, 0), (408, 16, 408), (100, 24, 200)):
            dh = jnp.zeros((hl, 256), jnp.float32)
            dv = jnp.zeros((hl, 256), jnp.float32)
            _, ok = plan_dyn_warp(dh, dv, H=1000, W=256, row0=row0,
                                  halo_rows=vh)
            assert bool(ok), (hl, vh, row0)

    @pytest.mark.parametrize("method", ["nearest", "bilinear"])
    def test_row_halo_mode_matches_global_gather(self, method):
        """Sharded mode: a local row block with real halo rows + global
        row offset must produce exactly the matching row slice of the
        unsharded gather (same contract as warp_windowed's row_halo)."""
        from ug_stereomatcher_tpu.ops.pallas.warp import (
            plan_dyn_warp, warp_windowed_dyn)
        H, w = 192, 256
        hl, vh = 64, 16                      # shard rows, exchanged halo
        img = jnp.asarray(RNG.rand(3, H, w).astype(np.float32))
        yy = np.linspace(0, 1, H)[:, None]
        xx = np.linspace(0, 1, w)[None, :]
        dh_full = (40.0 * np.sin(2 * np.pi * yy)
                   * np.cos(2 * np.pi * xx)).astype(np.float32)
        dv_full = (5.0 * np.cos(2 * np.pi * xx)
                   + 0.0 * yy).astype(np.float32)
        ref = np.asarray(ops.warp_by_disparity(
            img, jnp.asarray(dh_full), jnp.asarray(dv_full), method))
        for row0 in (0, 64, 128):            # incl. image-edge shards
            lo = max(row0 - vh, 0)
            hi = min(row0 + hl + vh, H)
            blk = np.asarray(img)[:, lo:hi]
            # edge shards: replicate the boundary row into the halo (the
            # halo-exchange layer's clamp form)
            blk = np.concatenate(
                [np.repeat(blk[:, :1], vh - (row0 - lo), axis=1), blk,
                 np.repeat(blk[:, -1:], vh - (hi - row0 - hl), axis=1)],
                axis=1)
            dh = jnp.asarray(dh_full[row0:row0 + hl])
            dv = jnp.asarray(dv_full[row0:row0 + hl])
            voffs, ok = plan_dyn_warp(dh, dv, H=H, W=w, method=method,
                                      row0=row0, halo_rows=vh)
            assert bool(ok), row0
            out = np.asarray(warp_windowed_dyn(
                jnp.asarray(blk), dh, dv, voffs, interpret=True,
                method=method, row_halo=True, row0=row0, global_h=H,
                halo_rows=vh))
            if method == "nearest":
                np.testing.assert_array_equal(out, ref[:, row0:row0 + hl])
            else:
                np.testing.assert_allclose(out, ref[:, row0:row0 + hl],
                                           rtol=1e-6, atol=1e-6)

    def test_row_halo_plan_rejects_beyond_halo(self):
        """A field gathering past the exchanged halo must flip ok=False —
        the shard does not hold those rows."""
        from ug_stereomatcher_tpu.ops.pallas.warp import plan_dyn_warp
        H, w = 192, 256
        hl, vh, row0 = 64, 16, 64
        dh = jnp.zeros((hl, w), jnp.float32)
        dv = jnp.full((hl, w), 30.0, jnp.float32)   # 30 > vh = 16
        _, ok = plan_dyn_warp(dh, dv, H=H, W=w, row0=row0, halo_rows=vh)
        assert not bool(ok)
        dv_in = jnp.full((hl, w), 10.0, jnp.float32)  # 10 < 16: fits
        _, ok = plan_dyn_warp(dh, dv_in, H=H, W=w, row0=row0,
                              halo_rows=vh)
        assert bool(ok)

    def test_tile_capacity_is_per_tile_not_global(self):
        """Two distant tiles with very different absolute offsets but small
        local spreads must both be exact (the static window could not
        resolve both without a huge VH)."""
        from ug_stereomatcher_tpu.ops.pallas.warp import (
            plan_dyn_warp, warp_windowed_dyn)
        h, w = 128, 256
        img = jnp.asarray(RNG.rand(h, w).astype(np.float32))
        dv_np = np.zeros((h, w), np.float32)
        dv_np[:64] = 60.0    # top tile gathers far below
        dv_np[64:] = -60.0   # bottom tile gathers far above
        dv = jnp.asarray(dv_np)
        dh = jnp.zeros((h, w), jnp.float32)
        voffs, ok = plan_dyn_warp(dh, dv, H=h, W=w)
        assert bool(ok)
        out = np.asarray(warp_windowed_dyn(img, dh, dv, voffs,
                                           interpret=True))
        ref = np.asarray(ops.warp_by_disparity(img, dh, dv))
        np.testing.assert_array_equal(out, ref)


class TestWarpTierObservability:
    """warp_for_level(with_tier=True) must report the SAME branch the
    tiered dispatch executed (VERDICT r3 item 6: the exactness fallbacks'
    cost must be visible, not silent inside jit)."""

    def _tier(self, dh, dv, cfg=None, level=0):
        from ug_stereomatcher_tpu.config import MatcherConfig
        cfg = cfg or MatcherConfig()
        h, w = dh.shape
        img = jnp.asarray(RNG.rand(3, h, w).astype(np.float32))
        out, tier = match_mod.warp_for_level(img, dh, dv, cfg, level,
                                             interpret=True, with_tier=True)
        # the tier code never changes the warp itself
        ref = np.asarray(ops.warp_by_disparity(img, dh, dv, cfg.interp))
        np.testing.assert_array_equal(np.asarray(out), ref)
        return int(tier)

    def test_smooth_field_reports_dyn(self):
        h, w = 128, 256
        z = jnp.zeros((h, w), jnp.float32)
        dv = jnp.asarray(np.full((h, w), 3.25, np.float32))
        assert self._tier(z, dv) == match_mod.TIER_DYN

    def test_spread_overflow_reports_static(self):
        """Per-tile spread beyond dyn capacity, absolute offsets within
        the static window -> static tier."""
        h, w = 256, 256
        dv = TestDynamicWarp._two_sided_dv(h, w, 80.0)
        dh = jnp.zeros((h, w), jnp.float32)
        assert self._tier(dh, dv) == match_mod.TIER_STATIC

    def test_double_overflow_reports_exact(self):
        """Spread beyond dyn capacity AND absolute offsets beyond the
        static reach -> exact-gather tier."""
        h, w = 512, 256
        dv = TestDynamicWarp._two_sided_dv(h, w, 200.0)
        dh = jnp.zeros((h, w), jnp.float32)
        assert self._tier(dh, dv) == match_mod.TIER_EXACT

    def test_dynamic_off_reports_static(self):
        from ug_stereomatcher_tpu.config import MatcherConfig
        h, w = 128, 256
        z = jnp.zeros((h, w), jnp.float32)
        cfg = MatcherConfig(warp_dynamic=False)
        assert self._tier(z, z, cfg=cfg) == match_mod.TIER_STATIC

    def test_engine_metrics_count_iterations(self):
        """StereoEngine(instrument_tiers=True) surfaces per-level counts in
        metrics['warp_tiers']; on the CPU dispatch gate every iteration is
        the default XLA gather and the totals equal the iteration
        schedule.  The instrumented result is identical to the plain one."""
        from ug_stereomatcher_tpu import MatcherConfig, StereoEngine
        img = (RNG.rand(96, 128, 3) * 255).astype(np.uint8)
        right = np.roll(img, 2, axis=1)
        eng = StereoEngine(MatcherConfig(), instrument_tiers=True)
        res = eng.match(img, right)
        tiers = eng.metrics["warp_tiers"]
        cfg = eng.config
        n = cfg.num_levels(96, 128)
        assert len(tiers) == n
        for i in range(n):
            row = tiers[f"level_{i:02d}"]
            assert sum(row[k] for k in ("dyn", "static_windowed",
                                        "exact_gather", "xla_default")
                       ) == cfg.iters_for_level(i)
            assert row["xla_default"] == cfg.iters_for_level(i)
        plain = StereoEngine(MatcherConfig()).match(img, right)
        np.testing.assert_array_equal(np.asarray(res.disparity_h),
                                      np.asarray(plain.disparity_h))

    def test_level_resident_overflow_recompute_counted(self):
        """An out-of-window scene through the level-resident kernel must
        count one overflow recompute and report the scan path's tiers."""
        from ug_stereomatcher_tpu.config import MatcherConfig
        cfg = MatcherConfig(level_backend="interpret", warp_backend="xla")
        h, w = 24, 64
        rng = np.random.RandomState(3)
        left = jnp.asarray(rng.rand(3, h, w).astype(np.float32))
        # a right image shifted far beyond the coarse window's reach makes
        # the refined field's magnitude irrelevant — instead, seed the
        # initial disparity beyond the window reach so iteration 0's warp
        # overflows deterministically
        dy, dx = cfg.warp_window_for_level(9)
        from ug_stereomatcher_tpu.ops.pallas.warp import window_reach
        v_reach, _ = window_reach(dy, dx)
        disp = jnp.zeros((3, h, w), jnp.float32).at[1].set(v_reach + 40.0)
        out, counts = match_mod.match_level(left, left, disp, 9, cfg,
                                            is_coarsest=True,
                                            instrument=True)
        counts = np.asarray(counts)
        assert counts[5] == 1, counts          # overflow_recompute
        assert counts[4] == 0, counts          # resident iters discarded
        # recompute ran the scan path (warp_backend=xla -> default tier)
        assert counts[3] == cfg.iters_for_level(9), counts


class TestSmoothKernel:
    @pytest.mark.parametrize("n", [1, 5])
    def test_matches_xla_chain(self, n):
        h, w = 40, 150
        st = jnp.asarray(RNG.rand(3, h, w).astype(np.float32) + 0.05)
        ref = st
        for _ in range(n):
            ref = ops.weighted_smooth(ref, ref[2])
        ref = np.asarray(ops.blur_average_clamp(ref))
        out = np.asarray(fused_smooth_average(st, n_passes=n, tile_rows=16,
                                              tile_cols=128, interpret=True))
        np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-5)

    def test_halo_limit_guarded(self):
        st = jnp.ones((3, 16, 32), jnp.float32)
        with pytest.raises(ValueError):
            fused_smooth_average(st, n_passes=80, interpret=True)


class TestDirectionKernel:
    def test_matches_xla_chain_with_custom_config_constants(self):
        """Exercises the full correlate->parabola->update chain INCLUDING
        non-default confidence constants (guards against hard-coded
        literals drifting from MatcherConfig)."""
        h, w = 36, 140
        left = jnp.asarray(RNG.rand(3, h, w).astype(np.float32) * 255)
        warped = jnp.asarray(RNG.rand(3, h, w).astype(np.float32) * 255)
        bl2 = ops.blur_gaussian_clamp(left * left)
        disp = jnp.asarray((RNG.rand(3, h, w).astype(np.float32) - 0.5))
        consts = (0.3, 0.2, 0.8, 0.9, 0.1)  # non-default on purpose
        no_peak, aff_s, aff_b, w_new, w_old = consts
        for thr, rep in ((1.0, 0), (0.55, 1)):
            dirs = match_mod.direction_maps(left, warped, bl2)
            ih, ch = parabola_fit(dirs[0], dirs[4], dirs[1], thr,
                                  no_peak, aff_s, aff_b)
            iv, cv = parabola_fit(dirs[2], dirs[4], dirs[3], thr,
                                  no_peak, aff_s, aff_b)
            cn = ch * cv
            blend = blend_confidence(cn, disp[2], w_new, w_old)
            ref = np.asarray(jnp.stack([
                ih + disp[0], iv + disp[1],
                jnp.where(rep > 0, cn, blend)]))
            out = np.asarray(fused_direction_update(
                left, warped, bl2, disp, thr, rep, tile_rows=16,
                tile_cols=128, consts=consts, interpret=True))
            # Tolerance guards constant drift (a wrong literal shifts the
            # field by O(1)), not bit-exactness: the fused and XLA lowerings
            # are not guaranteed the same code — FMA contraction differs by
            # host/codegen (a cross-host AOT cache measurably produced a
            # 1.02e-4 max diff on 255-scale inputs), so the gate must sit
            # above that ulp-amplified noise floor.
            np.testing.assert_allclose(out, ref, rtol=5e-4, atol=5e-4)


class TestFusedBlurKernel:
    """fused_blur_gaussian must match the XLA shift-slice blur to float
    rounding (<= 1 ulp: FMA contraction differs between the two lowerings)
    in both boundary modes.  It swaps in underneath the pyramid build and
    the level engine's blurred-energy hoist — the same tolerance contract
    as the other fused stencils."""

    @pytest.mark.parametrize("boundary", ["zero", "clamp"])
    def test_bit_exact_vs_xla(self, boundary):
        from ug_stereomatcher_tpu.ops.pallas.blur import fused_blur_gaussian
        h, w = 37, 210   # odd sizes force tile padding on both axes
        x = jnp.asarray(RNG.rand(3, h, w).astype(np.float32))
        ref_fn = (ops.blur_gaussian_zero if boundary == "zero"
                  else ops.blur_gaussian_clamp)
        ref = np.asarray(ref_fn(x))
        out = np.asarray(fused_blur_gaussian(
            x, boundary=boundary, tile_rows=16, tile_cols=128,
            interpret=True))
        np.testing.assert_allclose(out, ref, rtol=3e-7, atol=1e-7)

    def test_2d_input(self):
        from ug_stereomatcher_tpu.ops.pallas.blur import fused_blur_gaussian
        h, w = 24, 140
        x = jnp.asarray(RNG.rand(h, w).astype(np.float32))
        ref = np.asarray(ops.blur_gaussian_zero(x))
        out = np.asarray(fused_blur_gaussian(
            x, boundary="zero", tile_rows=8, tile_cols=128, interpret=True))
        assert out.shape == (h, w)
        np.testing.assert_allclose(out, ref, rtol=3e-7, atol=1e-7)

    def test_multi_tile_grid(self):
        from ug_stereomatcher_tpu.ops.pallas.blur import fused_blur_gaussian
        h, w = 70, 300   # 2x2+ tile grid with ragged edges
        x = jnp.asarray(RNG.rand(3, h, w).astype(np.float32))
        ref = np.asarray(ops.blur_gaussian_clamp(x))
        out = np.asarray(fused_blur_gaussian(
            x, boundary="clamp", tile_rows=32, tile_cols=128,
            interpret=True))
        np.testing.assert_allclose(out, ref, rtol=3e-7, atol=1e-7)


class TestMXUResampler:
    """ops/pallas/resample.py: one-hot MXU selection must be bit-identical
    to the XLA static-take path for nearest (1.0 is exact in every MXU
    input format; the accumulator adds zeros), and match the float32
    tex_gather to ~1e-5 for bilinear (trace-time float64 tap weights)."""

    SCALE = 1.41421356

    def _tex(self, img, out_h, out_w, coord_of, vs, method):
        from ug_stereomatcher_tpu.ops.pallas.resample import resample_tex
        return np.asarray(resample_tex(img, out_h, out_w, coord_of, vs,
                                       method, interpret=True))

    def test_nearest_bit_exact_all_shapes(self):
        rng = np.random.RandomState(3)
        img = jnp.asarray(rng.rand(3, 97, 211).astype(np.float32))
        d = jnp.asarray(rng.rand(3, 68, 149).astype(np.float32))
        s = self.SCALE
        cases = [
            (img, int(97 / s), int(211 / s), lambda t: t * s, 1.0,
             ops.subsample(img, int(97 / s), int(211 / s), s, "nearest")),
            (img, 48, 105, lambda t: t * 2.0, 1.0,
             ops.subsample(img, 48, 105, 2.0, "nearest")),
            (d, 97, 211, lambda t: t / s, s,
             ops.upsample_disp(d, 97, 211, 1.0 / s, s, "nearest")),
            (d, 97, 211, lambda t: t / s, s,
             ops.part_upsample_disp(d, 97, 211, s, "nearest")),
        ]
        for src, h2, w2, coord, vs, ref in cases:
            out = self._tex(src, h2, w2, coord, vs, "nearest")
            np.testing.assert_array_equal(out, np.asarray(ref))

    def test_bilinear_close(self):
        rng = np.random.RandomState(4)
        img = jnp.asarray(rng.rand(3, 97, 211).astype(np.float32))
        s = self.SCALE
        h2, w2 = int(97 / s), int(211 / s)
        ref = np.asarray(ops.subsample(img, h2, w2, s, "bilinear"))
        out = self._tex(img, h2, w2, lambda t: t * s, 1.0, "bilinear")
        np.testing.assert_allclose(out, ref, rtol=5e-5, atol=5e-5)
        d = jnp.asarray(rng.rand(3, 68, 149).astype(np.float32))
        ref = np.asarray(ops.upsample_disp(d, 97, 211, 1.0 / s, s,
                                           "bilinear"))
        out = self._tex(d, 97, 211, lambda t: t / s, s, "bilinear")
        np.testing.assert_allclose(out, ref, rtol=5e-5, atol=5e-5)

    def test_2d_input(self):
        rng = np.random.RandomState(5)
        img2 = jnp.asarray(rng.rand(50, 130).astype(np.float32))
        ref = np.asarray(ops.subsample(img2, 35, 91, self.SCALE, "nearest"))
        out = self._tex(img2, 35, 91, lambda t: t * self.SCALE, 1.0,
                        "nearest")
        assert out.shape == (35, 91)
        np.testing.assert_array_equal(out, ref)


class TestMXUResamplerEdges:
    """Boundary geometries of the MXU resampler: widths that are exact
    vreg multiples (no lane padding exists for the bilinear +1 tap),
    outputs shorter than one row tile, and strong downscales that force
    the adaptive tile-height planner."""

    def test_width_multiple_of_128_bilinear(self):
        from ug_stereomatcher_tpu.ops.pallas.resample import resample_tex
        rng = np.random.RandomState(9)
        img = jnp.asarray(rng.rand(3, 64, 256).astype(np.float32))
        s = 1.41421356
        h2, w2 = 45, 181
        ref = np.asarray(ops.subsample(img, h2, w2, s, "bilinear"))
        out = np.asarray(resample_tex(img, h2, w2, lambda t: t * s, 1.0,
                                      "bilinear", interpret=True))
        np.testing.assert_allclose(out, ref, rtol=5e-5, atol=5e-5)

    def test_output_shorter_than_tile(self):
        from ug_stereomatcher_tpu.ops.pallas.resample import resample_tex
        rng = np.random.RandomState(10)
        img = jnp.asarray(rng.rand(3, 200, 300).astype(np.float32))
        ref = np.asarray(ops.subsample(img, 7, 11, 27.0, "nearest"))
        out = np.asarray(resample_tex(img, 7, 11, lambda t: t * 27.0, 1.0,
                                      "nearest", interpret=True))
        np.testing.assert_array_equal(out, ref)

    def test_strong_downscale_shrinks_tile(self):
        from ug_stereomatcher_tpu.ops.pallas.resample import resample_static
        rng = np.random.RandomState(11)
        img = jnp.asarray(rng.rand(1500, 700).astype(np.float32))
        iy = np.clip(np.floor((np.arange(100) + 0.5) * 15.0), 0,
                     1499).astype(np.int32)
        ix = np.clip(np.floor((np.arange(120) + 0.5) * 5.0), 0,
                     699).astype(np.int32)
        ref = np.asarray(img)[iy][:, ix] * 2.5
        out = np.asarray(resample_static(img, iy, ix, value_scale=2.5,
                                         interpret=True))
        np.testing.assert_array_equal(out, ref)

    def test_bilinear_lane_aligned_width_edge_collapse(self):
        """Regression: a right-edge bilinear tap collapse at a width that
        is already a 128 multiple used to make the column window CW
        exceed the padded width and crash the dot at trace time."""
        from ug_stereomatcher_tpu.ops.pallas.resample import resample_tex
        rng = np.random.RandomState(12)
        img = jnp.asarray(rng.rand(3, 1200, 256).astype(np.float32))
        ref = np.asarray(ops.subsample(img, 460, 100, 2.6, "bilinear"))
        out = np.asarray(resample_tex(img, 460, 100, lambda t: t * 2.6,
                                      1.0, "bilinear", interpret=True))
        np.testing.assert_allclose(out, ref, rtol=2e-4, atol=2e-4)
