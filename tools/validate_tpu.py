"""On-chip value check of the certified 16MP mode-1 path.

bench.py times the default graph but never checks what it computes; the
test suite checks values but runs on CPU.  This tool closes the gap: it
runs the REAL bench scene (known 3 px constant shift, bench._make_pair)
through the default engine on the attached TPU and asserts the
recovered field on-device — interior median |disp_h - 3| under the
nearest-mode quantisation floor's headroom (0.5 px) and >90% of pixels
within 1 px (free-running nearest outputs are chaotic per-pixel, so
quantile gates, not maxima — CLAUDE.md).

Reuses the persistent compile cache; a warm run costs only the
per-process relay overhead (~1-3 min) plus one tiny stats program.

Round-5 reference runs (warm cache):
  nearest : mean|dh-3|=0.2799 frac(<1px)=0.9991 med|dh-3|=0.2690 -> OK
  bilinear: mean|dh-3|=0.0212 frac(<1px)=0.9997 med|dh-3|=0.0141 -> OK
(the quality mode's ~20x accuracy edge, confirmed on the chip at 16MP).

Usage: python tools/validate_tpu.py [--interp bilinear]
"""

import sys
import time

sys.path.insert(0, "/root/repo")
from bench import _make_pair, _setup_jax  # noqa: E402

jax = _setup_jax()
import jax.numpy as jnp  # noqa: E402

from ug_stereomatcher_tpu import MatcherConfig, StereoEngine  # noqa: E402

H, W = 3264, 4928
INTERP = "bilinear" if "--interp" in sys.argv and "bilinear" in sys.argv \
    else "nearest"


def main():
    left, right = _make_pair(H, W)   # right[:, x+3] == left[:, x]
    eng = StereoEngine(MatcherConfig(interp=INTERP))
    t0 = time.perf_counter()
    res = eng.match(jnp.asarray(left), jnp.asarray(right))

    @jax.jit
    def stats(dh, dv):
        ih = dh[64:-64, 64:-64]
        errh = jnp.abs(ih - 3.0)
        return (jnp.mean(errh), jnp.mean(errh < 1.0),
                jnp.mean(jnp.abs(dv[64:-64, 64:-64])),
                # strided subsample keeps the on-device sort small
                jnp.quantile(errh.ravel()[::97], 0.5))

    mh, frac, mv, medh = [float(x)
                          for x in stats(res.disparity_h, res.disparity_v)]
    print(f"interp={INTERP} first_call_s={time.perf_counter() - t0:.1f} "
          f"device={jax.devices()[0]}")
    print(f"mean|dh-3|={mh:.4f}  frac(|err|<1px)={frac:.4f}  "
          f"mean|dv|={mv:.4f}  med|dh-3|={medh:.4f}")
    if not (frac > 0.9 and medh < 0.5):
        print("TPU 16MP value check FAILED")
        return 1
    print("TPU 16MP value check OK")
    return 0


if __name__ == "__main__":
    sys.exit(main())
