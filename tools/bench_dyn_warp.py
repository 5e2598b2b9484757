"""A/B the dynamic-window warp vs the static windowed kernel on the live
chip at L0/L1/L2 sizes (chained fori_loop timing, floor-subtracted)."""

import os
import sys

sys.path.insert(0, "/root/repo")
from bench import _setup_jax  # noqa: E402

jax = _setup_jax()
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from ug_stereomatcher_tpu import MatcherConfig  # noqa: E402
from ug_stereomatcher_tpu import match as match_mod  # noqa: E402

N = 8
REPEATS = 3
cfg_dyn = MatcherConfig()
cfg_static = MatcherConfig(warp_dynamic=False)


from tools._timing import sync, timed as _timed, chained as _chained  # noqa: E402


def timed(fn, *args):
    return _timed(fn, *args, repeats=REPEATS)


def chained(body, init, *consts):
    return _chained(body, init, *consts, n=N, repeats=REPEATS)


def main():
    rng = np.random.RandomState(0)
    floor = chained(lambda x: x + 1.0, jnp.zeros((8, 128), jnp.float32))
    print(f"floor {floor/N*1e3:.2f} ms/iter")
    for li, (h, w) in enumerate([(3264, 4928), (2307, 3484), (1631, 2463)]):
        img = jnp.asarray(rng.rand(3, h, w).astype(np.float32))
        yy = np.linspace(0, 1, h)[:, None]
        xx = np.linspace(0, 1, w)[None, :]
        dh_np = (3.0 + 0.5 * np.sin(2 * np.pi * yy)
                 * np.cos(2 * np.pi * xx)).astype(np.float32)
        dv_np = (0.3 * np.sin(2 * np.pi * xx)
                 + 0.0 * yy).astype(np.float32)
        # salt with per-pixel outliers like the free-running bench fields
        # (tools/probe_spreads.py: |dv| outliers ~100 at L0, worst per-tile
        # span 103) so the dyn plan is stressed realistically
        k = max(1, h * w // 5000)
        idx = rng.choice(h * w, k, replace=False)
        amp = 100.0 / (1.41421356 ** li)
        # region-coherent outlier signs (the measured fields' worst tile
        # span is ~|outlier|, not 2x — outliers are locally one-sided);
        # MIXED_SIGNS=1 flips to per-pixel random signs, which blows every
        # tile's span and exercises the tier-down-to-static path instead
        if os.environ.get("MIXED_SIGNS"):
            sgn = np.sign(rng.rand(k) - 0.5)
        else:
            sgn = np.where((idx // w) < h // 2, 1.0, -1.0)
        dv_np.ravel()[idx] = amp * sgn
        dh_np.ravel()[idx] += 1.2 * amp * sgn
        dh = jnp.asarray(dh_np)
        dv = jnp.asarray(dv_np)

        for name, cfg in (("static", cfg_static), ("dyn", cfg_dyn)):
            def body(c, img, dh, dv, cfg=cfg, li=li):
                dh2 = dh + c[(0,)][0, 0] * 0.0
                return match_mod.warp_for_level(img, dh2, dv, cfg, li)
            t = chained(body, jnp.zeros_like(img), img, dh, dv)
            print(f"L{li} {h}x{w} {name:7s} {(t - floor)/N*1e3:8.3f} "
                  f"ms/warp")


if __name__ == "__main__":
    main()
