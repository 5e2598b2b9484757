"""A/B direction-kernel variants on the live chip at L0 size.

Env:
  DIR_HW   — override direction.HW (horizontal halo; default module value)
  DIR_TR/DIR_TC — tile_rows/tile_cols (defaults 64/512)
Prints per-call ms and max|diff| vs the unfused XLA chain.
"""

import os
import sys

sys.path.insert(0, "/root/repo")
from bench import _setup_jax  # noqa: E402

jax = _setup_jax()
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from ug_stereomatcher_tpu.ops.pallas import direction as dmod  # noqa: E402

if os.environ.get("DIR_HW"):
    dmod.HW = int(os.environ["DIR_HW"])
TR = int(os.environ.get("DIR_TR", 64))
TC = int(os.environ.get("DIR_TC", 512))

from ug_stereomatcher_tpu import MatcherConfig  # noqa: E402
from ug_stereomatcher_tpu import match as match_mod  # noqa: E402
from ug_stereomatcher_tpu.ops.conv import blur_gaussian_clamp  # noqa: E402
from ug_stereomatcher_tpu.ops.pointwise import (  # noqa: E402
    blend_confidence, parabola_fit)

N = 8
REPEATS = 3
cfg = MatcherConfig()
H, W = (int(sys.argv[1]), int(sys.argv[2])) if len(sys.argv) > 2 \
    else (3264, 4928)


from tools._timing import sync, timed as _timed, chained as _chained  # noqa: E402


def timed(fn, *args):
    return _timed(fn, *args, repeats=REPEATS)


def chained(body, init, *consts):
    return _chained(body, init, *consts, n=N, repeats=REPEATS)


def main():
    rng = np.random.RandomState(0)
    L = jnp.asarray(rng.rand(3, H, W).astype(np.float32))
    Wd = jnp.asarray(rng.rand(3, H, W).astype(np.float32))
    state = jnp.asarray(rng.rand(3, H, W).astype(np.float32) * 0.5)
    bl2 = blur_gaussian_clamp(L * L)
    dconsts = (cfg.conf_no_peak, cfg.conf_affine_scale,
               cfg.conf_affine_bias, cfg.conf_blend_new, cfg.conf_blend_old)

    def fused(c, L, Wd, bl2):
        x = Wd + c[(0,)][0, 0] * 0.0
        return dmod.fused_direction_update(L, x, bl2, c, jnp.float32(0.5),
                                           jnp.int32(0), tile_rows=TR,
                                           tile_cols=TC, consts=dconsts)

    # correctness vs the unfused chain
    out = dmod.fused_direction_update(L, Wd, bl2, state, jnp.float32(0.5),
                                      jnp.int32(0), tile_rows=TR,
                                      tile_cols=TC, consts=dconsts)
    dir_l, dir_r, dir_u, dir_d, dir_c = match_mod.direction_maps(L, Wd, bl2)
    inc_h, conf_h = parabola_fit(dir_l, dir_c, dir_r, 0.5, *dconsts[:3])
    inc_v, conf_v = parabola_fit(dir_u, dir_c, dir_d, 0.5, *dconsts[:3])
    ref = jnp.stack([inc_h + state[0], inc_v + state[1],
                     blend_confidence(conf_h * conf_v, state[2],
                                      dconsts[3], dconsts[4])])
    err = float(jnp.max(jnp.abs(out - ref)))
    print(f"HW={dmod.HW} TR={TR} TC={TC} {H}x{W} maxerr={err:.3e}")

    floor = chained(lambda x: x + 1.0, jnp.zeros((8, 128), jnp.float32))
    t = chained(fused, state, L, Wd, bl2)
    print(f"fused_direction {(t - floor)/N*1e3:8.3f} ms/call "
          f"(floor {floor/N*1e3:.2f})")


if __name__ == "__main__":
    main()
