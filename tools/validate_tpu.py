"""On-chip value check of the certified 16MP mode-1 path.

bench.py times the default graph but never checks what it computes; the
test suite checks values but runs on CPU.  This tool closes the gap: it
runs the REAL bench scene (known 3 px constant shift, bench._make_pair)
through the default engine on the attached TPU and asserts the
recovered field on-device with PER-MODE gates — free-running nearest
outputs are chaotic per-pixel, so quantile gates, not maxima
(CLAUDE.md):

  nearest : med|dh-3| < 0.5 px (quantisation floor ~0.27), mean|dv| < 0.5
  bilinear: med|dh-3| < 0.1 px (documented floor ~0.014 — a gate at the
            nearest threshold would wave through a 20x regression of
            the quality mode's whole point), mean|dv| < 0.1

plus frac(|err| < 1 px) > 0.9 in both modes.  Refuses to certify a
non-TPU backend (BENCH_PLATFORM=cpu left exported in the shell would
otherwise print an "on-chip OK" that never touched the chip).

Reuses the persistent compile cache; a warm run costs only the
per-process relay overhead (~1-3 min) plus one tiny stats program.
``first_call_s`` times ONLY the engine's first call (the stats program
compiles outside it); judge cache state from bench.py's cache_warm
fields, never from wall time (docs/PERF.md BENCH_r04 root-cause).

Round-5 reference runs (warm cache):
  nearest : mean|dh-3|=0.2799 frac(<1px)=0.9991 med|dh-3|=0.2690 -> OK
  bilinear: mean|dh-3|=0.0212 frac(<1px)=0.9997 med|dh-3|=0.0141 -> OK
(the quality mode's ~20x accuracy edge, confirmed on the chip at 16MP).

Usage: python tools/validate_tpu.py [--interp {nearest,bilinear}]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from bench import _make_pair, _setup_jax  # noqa: E402

jax = _setup_jax()
import jax.numpy as jnp  # noqa: E402

from ug_stereomatcher_tpu import MatcherConfig, StereoEngine  # noqa: E402

H, W = 3264, 4928
GATES = {  # interp -> (max median |dh-3|, max mean |dv|)
    "nearest": (0.5, 0.5),
    "bilinear": (0.1, 0.1),
}


def main():
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--interp", choices=sorted(GATES), default="nearest")
    args = ap.parse_args()

    dev = jax.devices()[0]
    if dev.platform.lower() not in ("tpu", "axon"):
        print(f"REFUSING: backend is {dev.platform!r} ({dev}), not a TPU — "
              f"an on-chip certificate from a CPU run would be a lie "
              f"(unset BENCH_PLATFORM?)")
        return 2

    @jax.jit
    def stats(dh, dv):
        errh = jnp.abs(dh[64:-64, 64:-64] - 3.0)
        return (jnp.mean(errh), jnp.mean(errh < 1.0),
                jnp.mean(jnp.abs(dv[64:-64, 64:-64])),
                # strided subsample keeps the on-device sort small
                jnp.quantile(errh.ravel()[::97], 0.5))

    left, right = _make_pair(H, W)   # right[:, x+3] == left[:, x]
    eng = StereoEngine(MatcherConfig(interp=args.interp))
    ld, rd = jnp.asarray(left), jnp.asarray(right)
    float(jnp.sum(ld))  # force uploads out of the timed region

    t0 = time.perf_counter()
    res = eng.match(ld, rd)
    float(jnp.sum(res.confidence))   # scalar readback = real completion
    first_call_s = time.perf_counter() - t0

    mh, frac, mv, medh = [float(x)
                          for x in stats(res.disparity_h, res.disparity_v)]
    print(f"interp={args.interp} first_call_s={first_call_s:.1f} "
          f"device={dev}")
    print(f"mean|dh-3|={mh:.4f}  frac(|err|<1px)={frac:.4f}  "
          f"mean|dv|={mv:.4f}  med|dh-3|={medh:.4f}")
    med_max, mv_max = GATES[args.interp]
    if not (frac > 0.9 and medh < med_max and mv < mv_max):
        print(f"TPU 16MP value check FAILED (gates: frac>0.9, "
              f"med<{med_max}, mean|dv|<{mv_max})")
        return 1
    print("TPU 16MP value check OK")
    return 0


if __name__ == "__main__":
    sys.exit(main())
