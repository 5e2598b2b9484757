"""A/B the foveated (mode-2) graph: XLA stencils at fovea size (current
gate) vs fused Pallas stencils (stencil_min_pixels lowered), on the live
chip.  Round 2 measured the fused variant SLOWER pre-dynamic-warp
(88.7 -> 103.6 ms); this re-checks after the round-3 warp changes.

Also times one fovea-sized match_level (22 iterations) chained, per
config, to localise any difference.
"""

import sys
import time

sys.path.insert(0, "/root/repo")
from bench import _make_pair, _setup_jax  # noqa: E402

jax = _setup_jax()
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402
from jax import lax  # noqa: E402

from ug_stereomatcher_tpu import MatcherConfig, StereoEngine  # noqa: E402
from ug_stereomatcher_tpu import match as match_mod  # noqa: E402

H, W = 3264, 4928
N = 6
REPEATS = 4


def sync(x):
    return float(jnp.sum(x))


def main():
    left_np, right_np = _make_pair(H, W)
    left = jnp.asarray(left_np)
    right = jnp.asarray(right_np)
    sync(left), sync(right)

    for name, cfg in (("gate-256k (current)", MatcherConfig()),
                      ("gate-200k (fused at fovea)",
                       MatcherConfig(stencil_min_pixels=200 * 1000))):
        eng = StereoEngine(cfg)
        res = eng.match_foveated(left, right)   # compile
        sync(res.stack_c)
        best = 1e9
        for _ in range(REPEATS):
            t0 = time.perf_counter()
            res = eng.match_foveated(left, right)
            sync(res.stack_c)
            best = min(best, time.perf_counter() - t0)
        print(f"mode2 {name:28s} {best*1e3:8.2f} ms")

    # localise: one fovea-sized level (22 iters), chained
    rng = np.random.RandomState(0)
    fh, fw = 407, 615
    L = jnp.asarray(rng.rand(3, fh, fw).astype(np.float32))
    R = jnp.asarray(rng.rand(3, fh, fw).astype(np.float32))
    d0 = jnp.zeros((3, fh, fw), jnp.float32)

    for name, cfg in (("xla-stencils", MatcherConfig()),
                      ("fused-stencils",
                       MatcherConfig(stencil_min_pixels=200 * 1000))):
        def lvl(c, L, R, cfg=cfg):
            return match_mod.match_level(L, R, c, 6, cfg,
                                         is_coarsest=False)

        def loop(x, L, R):
            return lax.fori_loop(0, N, lambda i, c: lvl(c, L, R), x)
        f = jax.jit(loop)
        sync(f(d0, L, R))
        best = 1e9
        for _ in range(REPEATS):
            t0 = time.perf_counter()
            out = f(d0, L, R)
            sync(out)
            best = min(best, time.perf_counter() - t0)
        print(f"fovea level (22 it) {name:16s} {best/N*1e3:8.2f} ms/level")


if __name__ == "__main__":
    main()
