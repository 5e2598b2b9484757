"""A/B fused_smooth_average tile sizes on the live chip (L0 size).

Env: SM_TR / SM_TC (defaults 64 / 1024), SM_N (passes, default 10).
"""

import os
import sys

sys.path.insert(0, "/root/repo")
from bench import _setup_jax  # noqa: E402

jax = _setup_jax()
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from ug_stereomatcher_tpu import ops  # noqa: E402
from ug_stereomatcher_tpu.ops.pallas.smooth import (  # noqa: E402
    fused_smooth_average)

TR = int(os.environ.get("SM_TR", 64))
TC = int(os.environ.get("SM_TC", 1024))
NP_ = int(os.environ.get("SM_N", 10))
N = 8
REPEATS = 3
H, W = (int(sys.argv[1]), int(sys.argv[2])) if len(sys.argv) > 2 \
    else (3264, 4928)


from tools._timing import sync, timed as _timed, chained as _chained  # noqa: E402


def timed(fn, *args):
    return _timed(fn, *args, repeats=REPEATS)


def chained(body, init, *consts):
    return _chained(body, init, *consts, n=N, repeats=REPEATS)


def main():
    rng = np.random.RandomState(0)
    st = jnp.asarray(rng.rand(3, H, W).astype(np.float32) + 0.05)

    out = fused_smooth_average(st, n_passes=NP_, tile_rows=TR, tile_cols=TC)
    ref = st
    for _ in range(NP_):
        ref = ops.weighted_smooth(ref, ref[2])
    ref = ops.blur_average_clamp(ref)
    err = float(jnp.max(jnp.abs(out - ref)))
    print(f"TR={TR} TC={TC} n={NP_} {H}x{W} maxerr={err:.3e}")

    floor = chained(lambda x: x + 1.0, jnp.zeros((8, 128), jnp.float32))

    def body(c):
        return fused_smooth_average(c, n_passes=NP_, tile_rows=TR,
                                    tile_cols=TC)
    t = chained(body, st)
    print(f"fused_smooth {(t - floor)/N*1e3:8.3f} ms/call "
          f"(floor {floor/N*1e3:.2f})")


if __name__ == "__main__":
    main()
