"""Measure per-tile gather spreads of the REAL pipeline's disparity fields.

Runs the mode-1 pipeline level by level on the bench scene (16MP octave
texture) and, for each level's INPUT field (the upsampled state entering
it) plus its OUTPUT field (after its iterations), reports the dyn-warp
plan verdict and the worst per-tile vertical span / per-block horizontal
span — the quantities that size warp_windowed_dyn's capacities.  The
free-running field evolves within a level, so input/output bracket the
per-iteration states (both ends of the level's trajectory).
"""

import sys

sys.path.insert(0, "/root/repo")
from bench import _make_pair, _setup_jax  # noqa: E402

jax = _setup_jax()
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from ug_stereomatcher_tpu import MatcherConfig  # noqa: E402
from ug_stereomatcher_tpu import match as match_mod  # noqa: E402
from ug_stereomatcher_tpu import pyramid as pyr  # noqa: E402
from ug_stereomatcher_tpu.ops.pallas.warp import BAND, LANES  # noqa: E402

H = int(sys.argv[1]) if len(sys.argv) > 1 else 3264
W = int(sys.argv[2]) if len(sys.argv) > 2 else 4928
cfg = MatcherConfig(warp_dynamic=False)   # measure the round-3-start path
TH = 64


def spreads(dh, dv, h, w):
    Hp = -(-h // TH) * TH
    Wp = -(-w // LANES) * LANES
    ni, ncb = Hp // TH, Wp // LANES
    dhp = jnp.pad(dh, ((0, Hp - h), (0, Wp - w)))
    dvp = jnp.pad(dv, ((0, Hp - h), (0, Wp - w)))
    r = jax.lax.broadcasted_iota(jnp.int32, (Hp, Wp), 0)
    c = jax.lax.broadcasted_iota(jnp.int32, (Hp, Wp), 1)
    iy = jnp.clip(jnp.floor(r.astype(jnp.float32) + 0.5 + dvp), 0,
                  h - 1).astype(jnp.int32)
    ix = jnp.clip(jnp.floor(c.astype(jnp.float32) + 0.5 + dhp), 0,
                  w - 1).astype(jnp.int32)
    k = jnp.where(r >= h, 0, iy - r)
    kmin = k.reshape(ni, TH, Wp).min(axis=(1, 2))
    kmax = k.reshape(ni, TH, Wp).max(axis=(1, 2))
    vspan = kmax - kmin
    ixm = ix.reshape(ni, TH, ncb, LANES)
    hspan = ixm.max(axis=(1, 3)) - ixm.min(axis=(1, 3))
    vs = np.asarray(vspan)
    hs = np.asarray(hspan).ravel()
    return (float(np.max(vs)), float(np.percentile(vs, 95)),
            float(np.max(hs)), float(np.percentile(hs, 95)),
            float(jnp.max(jnp.abs(dv))), float(jnp.max(jnp.abs(dh))))


def main():
    left_np, right_np = _make_pair(H, W)
    lchw = jnp.moveaxis(jnp.asarray(left_np).astype(jnp.float32), -1, 0)
    rchw = jnp.moveaxis(jnp.asarray(right_np).astype(jnp.float32), -1, 0)
    n = cfg.num_levels(H, W)
    dims = match_mod.level_dims_for_matching(cfg, H, W, n, False)
    lp = pyr.build_pyramid(lchw, cfg, n)
    rp = pyr.build_pyramid(rchw, cfg, n)
    h, w = dims[n - 1]
    disp = jnp.zeros((3, h, w), jnp.float32)
    print("level  h x w      where   vspan_max vspan_p95 hspan_max "
          "hspan_p95  max|dv| max|dh|")
    for i in range(n - 1, -1, -1):
        for tag, d in (("in", disp),):
            v, v95, hh, h95, mdv, mdh = spreads(d[0], d[1], dims[i][0],
                                                dims[i][1])
            print(f"L{i:02d} {dims[i][0]}x{dims[i][1]:5d} {tag:5s} "
                  f"{v:9.0f} {v95:9.0f} {hh:9.0f} {h95:9.0f} "
                  f"{mdv:8.1f} {mdh:8.1f}")
        disp = match_mod.match_level(lp[i], rp[i], disp, i, cfg,
                                     is_coarsest=(i == n - 1))
        v, v95, hh, h95, mdv, mdh = spreads(disp[0], disp[1], dims[i][0],
                                            dims[i][1])
        print(f"L{i:02d} {dims[i][0]}x{dims[i][1]:5d} out   "
              f"{v:9.0f} {v95:9.0f} {hh:9.0f} {h95:9.0f} "
              f"{mdv:8.1f} {mdh:8.1f}")
        if i > 0:
            disp = pyr.upsample_to_level(disp, dims[i - 1][0],
                                         dims[i - 1][1], cfg)


if __name__ == "__main__":
    main()
