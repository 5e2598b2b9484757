"""Micro-profile the mode-1 hot loop on the live chip.

Two sections:

1. ``profile_match`` per-level table (same as docs/PERF.md's residual
   breakdown) on a 16MP octave-texture pair.
2. Component timings for one L0-sized iteration — warp kernel, overflow
   guard, guard+cond composition, fused direction, fused smooth, and the
   whole composed iteration — each chained N times through a
   ``lax.fori_loop`` inside one jit so the relay's ~29 ms per-call floor
   amortises (CLAUDE.md: chained measurements use fori_loop).  An empty
   chained loop measures the floor itself for subtraction.

Usage:  python tools/profile_hotloop.py [H W] [LEVEL]
        (defaults 3264 4928 0 — L0 of the Glasgow-resolution chain)
"""

import sys

sys.path.insert(0, "/root/repo")
from bench import _make_pair, _setup_jax  # noqa: E402

jax = _setup_jax()
import jax.numpy as jnp  # noqa: E402
from jax import lax  # noqa: E402

from ug_stereomatcher_tpu import MatcherConfig, StereoEngine  # noqa: E402
from ug_stereomatcher_tpu import match as match_mod  # noqa: E402
from ug_stereomatcher_tpu import pyramid as pyr  # noqa: E402

_pos = [a for a in sys.argv[1:] if not a.startswith("--")]
H = int(_pos[0]) if len(_pos) > 0 else 3264
W = int(_pos[1]) if len(_pos) > 1 else 4928
LEVEL = int(_pos[2]) if len(_pos) > 2 else 0
N = 8          # chained iterations per measurement
REPEATS = 3

cfg = MatcherConfig()


from tools._timing import (sync, timed as _timed,  # noqa: E402
                           chained as _chained, dep,
                           representative_field)


def timed(fn, *args):
    return _timed(fn, *args, repeats=REPEATS)


def chained(body, init, *consts):
    return _chained(body, init, *consts, n=N, repeats=REPEATS)


def main():
    left_np, right_np = _make_pair(H, W)
    eng = StereoEngine(cfg)
    left = jnp.asarray(left_np)
    right = jnp.asarray(right_np)

    if "--components-only" not in sys.argv:
        # ---- section 1: per-level profile ---------------------------
        _, prof = eng.profile_match(left, right)
        print("== profile_match (second run, warm) ==")
        _, prof = eng.profile_match(left, right)
        print(f"pyramid_build_s {prof['pyramid_build_s']:.4f}")
        for k in sorted(prof["levels"]):
            v = prof["levels"][k]
            print(f"{k} {v['height']}x{v['width']} it={v['iterations']} "
                  f"match={v['match_s']:.4f} up={v.get('upsample_s', 0):.4f}")
        print(f"match_total_s {prof['match_total_s']:.4f} "
              f"total_s {prof['total_s']:.4f}")

    # ---- section 2: L0 component micro-times ------------------------
    n = cfg.num_levels(H, W)
    li = LEVEL
    lp = pyr.build_pyramid(left.astype(jnp.float32).transpose(2, 0, 1)
                           if left.ndim == 3 and left.shape[-1] == 3
                           else left, cfg, n)
    rp = pyr.build_pyramid(right.astype(jnp.float32).transpose(2, 0, 1)
                           if right.ndim == 3 and right.shape[-1] == 3
                           else right, cfg, n)
    L = lp[li]
    R = rp[li]
    h, w = L.shape[-2:]
    print(f"\n== L{li} components ({h}x{w}), N={N} chained, floor-corrected ==")

    # representative disparity state (shared with tools/roofline.py so
    # both tools measure the same call shape)
    dh, dv, conf = representative_field(h, w)

    floor = chained(lambda x: x + 1.0, jnp.zeros((8, 128), jnp.float32))
    print(f"empty_loop total={floor*1e3:.2f} ms")

    from ug_stereomatcher_tpu.ops.pallas.warp import (warp_windowed,
                                                      window_reach)
    from ug_stereomatcher_tpu.ops.pallas.direction import (
        fused_direction_update)
    from ug_stereomatcher_tpu.ops.pallas.smooth import fused_smooth_average
    from ug_stereomatcher_tpu.ops.pallas.blur import fused_blur_gaussian

    dy, dx = cfg.warp_window_for_level(li)
    v_reach, h_reach = window_reach(dy, dx)

    rows = {}

    # warp kernel alone
    def warp_body(c, R, dh, dv):
        return warp_windowed(R, dep(c, dh), dv, max_dy=dy, max_dx=dx,
                             method=cfg.interp)
    rows["warp_windowed"] = chained(warp_body, jnp.zeros_like(R), R, dh, dv)

    # guard reductions alone
    def guard_body(c, dh, dv):
        dh2 = dep(c, dh)
        safe = ((jnp.max(jnp.abs(dv)) <= v_reach)
                & (jnp.max(jnp.abs(dh2)) <= h_reach))
        return c + safe.astype(jnp.float32)
    rows["guard_reduce"] = chained(guard_body,
                                   jnp.zeros((8, 128), jnp.float32), dh, dv)

    # guard + cond + warp (the real warp_for_level path)
    def wfl_body(c, R, dh, dv):
        return match_mod.warp_for_level(R, dep(c, dh), dv, cfg, li)
    rows["warp_for_level"] = chained(wfl_body, jnp.zeros_like(R), R, dh, dv)

    # fused direction alone
    bl2 = fused_blur_gaussian(L * L, boundary="clamp")
    warped0 = warp_windowed(R, dh, dv, max_dy=dy, max_dx=dx,
                            method=cfg.interp)
    state0 = jnp.stack([dh, dv, conf])
    dconsts = (cfg.conf_no_peak, cfg.conf_affine_scale,
               cfg.conf_affine_bias, cfg.conf_blend_new, cfg.conf_blend_old)

    def dir_body(c, L, warped0, bl2):
        return fused_direction_update(L, dep(c, warped0), bl2,
                                      c, jnp.float32(0.5), jnp.int32(0),
                                      consts=dconsts)
    rows["fused_direction"] = chained(dir_body, state0, L, warped0, bl2)

    # fused smooth alone
    n_smooth = cfg.smooth_passes_for_level(li)

    def smooth_body(c):
        return fused_smooth_average(c, n_passes=n_smooth)
    rows["fused_smooth"] = chained(smooth_body, state0)

    # whole composed iteration (exactly the scan body)
    def iter_body(c, L, R, bl2):
        warped = match_mod._warp(R, c[0], c[1], cfg, li)
        state = fused_direction_update(
            L, warped, bl2, c, jnp.float32(0.5), jnp.int32(0),
            consts=dconsts)
        return fused_smooth_average(state, n_passes=n_smooth)
    rows["composed_iteration"] = chained(iter_body, state0, L, R, bl2)

    for k, v in rows.items():
        per = (v - floor) / N * 1e3
        print(f"{k:22s} total={v*1e3:8.2f} ms  per-iter={per:7.3f} ms")

    parts = (rows["warp_for_level"] + rows["fused_direction"]
             + rows["fused_smooth"] - 3 * floor) / N * 1e3
    whole = (rows["composed_iteration"] - floor) / N * 1e3
    print(f"\nsum-of-parts {parts:.3f} ms vs composed {whole:.3f} ms "
          f"(glue = {whole - parts:+.3f} ms)")

    if "--stages" in sys.argv:
        stage_table(left, right)


def stage_table(left, right):
    """Chained (noise-free) per-stage costs: pyramid build, every
    upsample, every level's match_level — the decomposition of the whole
    mode-1 latency with the relay's per-call floor amortised out."""
    n = cfg.num_levels(H, W)
    dims = match_mod.level_dims_for_matching(cfg, H, W, n, False)
    lchw = jnp.moveaxis(left.astype(jnp.float32), -1, 0)
    rchw = jnp.moveaxis(right.astype(jnp.float32), -1, 0)
    floor = chained(lambda x: x + 1.0, jnp.zeros((8, 128), jnp.float32))
    print(f"\n== chained stage table (N={N}, floor {floor/N*1e3:.2f} "
          f"ms/call subtracted) ==")

    def scal(x):
        return x[(0,) * (x.ndim - 2)][0, 0] * 0.0

    # pyramid build (one image)
    def build_body(c, img):
        levs = pyr.build_pyramid(img + scal(c), cfg, n)
        out = c
        for p in levs:
            out = out + scal(p)
        return out
    t = chained(build_body, jnp.zeros((8, 128), jnp.float32), lchw)
    print(f"build_pyramid(1 img)   per-call={(t - floor)/N*1e3:8.3f} ms")
    total = 2 * (t - floor) / N * 1e3

    lp = pyr.build_pyramid(lchw, cfg, n)
    rp = pyr.build_pyramid(rchw, cfg, n)

    # per-level match + upsample
    h, w = dims[n - 1]
    disp = jnp.zeros((3, h, w), jnp.float32)
    for i in range(n - 1, -1, -1):
        def lvl_body(c, L, R):
            return match_mod.match_level(L, R, c, i, cfg,
                                         is_coarsest=(i == n - 1))
        t = chained(lvl_body, disp, lp[i], rp[i])
        ms = (t - floor) / N * 1e3
        total += ms
        disp = match_mod.match_level(lp[i], rp[i], disp, i, cfg,
                                     is_coarsest=(i == n - 1))
        upms = ""
        if i > 0:
            h2, w2 = dims[i - 1]

            def up_body(c, d):
                out = pyr.upsample_to_level(d + scal(c), h2, w2, cfg)
                return c + scal(out)
            t = chained(up_body, jnp.zeros((8, 128), jnp.float32), disp)
            upms = f"  up={(t - floor)/N*1e3:8.3f} ms"
            total += (t - floor) / N * 1e3
            disp = pyr.upsample_to_level(disp, h2, w2, cfg)
        print(f"L{i:02d} {dims[i][0]}x{dims[i][1]} "
              f"it={cfg.iters_for_level(i)} "
              f"match={ms:8.3f} ms{upms}")
    print(f"stage-sum total = {total:.1f} ms")


if __name__ == "__main__":
    main()
