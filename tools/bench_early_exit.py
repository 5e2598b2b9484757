"""Measure the convergence early exit where it claims to pay.

docs/PERF.md's convergence section honestly shows the reference's fixed
iteration schedule is TIGHT on natural textures; the mode's claimed
habitat is easy scenes (low texture, small true disparity) and
throughput pipelines that tolerate latency variance.  This tool prices
that claim (VERDICT r4 item 7): 16MP mode-1 latency with and without
``early_exit_delta`` on

* ``natural`` — the bench scene (multi-octave texture, 3 px shift):
  structure at every scale, the hard case;
* ``easy``    — the same construction low-pass filtered to a smooth,
  low-texture scene with a 1 px shift: the easy case.

For each (scene, config): best-of-N device-resident latency (16MP calls
run ~300 ms >> the relay's per-call floor, so plain timing is clean) and
the median |disp_h - gt| so the speed/quality trade is visible in one
table.  Results go in docs/PERF.md "Convergence early exit".

Usage: python tools/bench_early_exit.py [thr] [--interp bilinear]
       (default thr 0.05, interp nearest)
"""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")
from bench import _make_pair, _octave_texture, _setup_jax  # noqa: E402

jax = _setup_jax()
import jax.numpy as jnp  # noqa: E402

from ug_stereomatcher_tpu import MatcherConfig, StereoEngine  # noqa: E402

H, W = 3264, 4928
REPEATS = 4


def _parse_args(argv):
    """(thr, interp) from e.g. ['0.02', '--interp', 'bilinear'] — flag
    VALUES must not be mistaken for the positional threshold."""
    thr, interp = 0.05, "nearest"
    it = iter(argv)
    for a in it:
        if a == "--interp":
            try:
                interp = next(it)
            except StopIteration:
                raise SystemExit("--interp needs a value")
        elif a.startswith("--"):
            raise SystemExit(f"unknown flag {a!r}")
        else:
            thr = float(a)
    return thr, interp


THR, INTERP = _parse_args(sys.argv[1:])


def easy_pair(h, w):
    """Low-texture scene: the octave texture with its fine octaves
    suppressed (heavy separable box smoothing), 1 px constant shift."""
    tex = _octave_texture(h, w + 8).astype(np.float32)
    for _ in range(6):
        tex[1:-1] = (tex[:-2] + tex[1:-1] + tex[2:]) / 3
        tex[:, 1:-1] = (tex[:, :-2] + tex[:, 1:-1] + tex[:, 2:]) / 3
    return tex[:, 3:w + 3].astype(np.uint8), tex[:, 2:w + 2].astype(
        np.uint8), 1.0


def main():
    scenes = {}
    l, r = _make_pair(H, W)
    scenes["natural_3px"] = (l, r, 3.0)
    scenes["easy_1px"] = easy_pair(H, W)

    # one engine per config, shared across scenes: the per-shape jit cache
    # lives on the engine, so the second scene reuses the traced 16MP graph
    # and its relay-loaded executable instead of re-paying both
    engines = {"baseline": StereoEngine(MatcherConfig(interp=INTERP)),
               f"early_exit_{THR}": StereoEngine(MatcherConfig(
                   interp=INTERP, early_exit_delta=THR))}
    print(f"interp={INTERP}")

    print(f"{'scene':14s} {'config':18s} {'s/pair':>8s} {'pairs/s':>8s} "
          f"{'median|err|':>11s}")
    for sname, (left, right, gt) in scenes.items():
        ld = jnp.asarray(left)
        rd = jnp.asarray(right)
        for cname, eng in engines.items():

            def once():
                t0 = time.perf_counter()
                res = eng.match(ld, rd)
                float(jnp.sum(res.confidence))
                return time.perf_counter() - t0, res

            once()  # compile/load
            best, res = 1e9, None
            for _ in range(REPEATS):
                t, res = once()
                best = min(best, t)
            err = float(jnp.median(jnp.abs(
                res.disparity_h[64:-64, 64:-64] - gt)))
            print(f"{sname:14s} {cname:18s} {best:8.4f} {1 / best:8.2f} "
                  f"{err:11.4f}")


if __name__ == "__main__":
    main()
