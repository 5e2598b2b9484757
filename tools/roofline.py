"""Roofline audit: the three L0 hot kernels vs the chip's measured peaks.

Answers "is it actually fast, or just faster than a 2016 GPU?" with
arithmetic (VERDICT r4 weak item 3 / next-round item 1):

1. **Measured ceilings** — microbenchmarks on the live chip, not
   datasheet numbers:
   * ``vpu_fma``: M inline dependent FMAs per element per pass over a
     VMEM-tileable f32 array, chained through a fori_loop — the VPU's
     sustained FMA-instruction rate (each `x*a+b` is one VPU op).
   * ``vpu_mul``: same with bare multiplies — confirms the instr rate is
     op-type independent (it is; rolls also cost like FMAs, measured
     round 3, docs/PERF.md).
   * ``hbm``: one `x + 1` pass over a 256 MB array, chained — streams
     read+write HBM traffic with trivial compute.
2. **Contract-derived instruction counts** per output pixel for the
   fused direction and smooth kernels (counting convention: every
   elementwise VPU op = 1 instruction — an `acc + t*x` FMA is 1, a
   `pltpu.roll` is 1, compare/select 1, divide 1 with a footnote; tile
   halo overhead enters as the buffer/output area ratio).  The counts
   are pure functions of the parity contract (5 moves x 3 channels x
   5-tap separable Gaussian; n smoothing passes + 3-tap average) and the
   tile geometry — they cannot drift from the kernels without the gold
   tests catching the behaviour change first.
3. **The table**: per kernel, measured ms/call (chained fori, relay
   floor subtracted — tools/_timing methodology), achieved Ginstr/s,
   percent of the measured VPU ceiling, implied HBM traffic and percent
   of the measured HBM ceiling.

The warp kernel's sweep work is data-dependent (band candidates follow
the live field; per-candidate lax.cond skips) so it has no closed-form
instruction count; it is reported against the HBM ceiling with its
contract-fixed DMA traffic (192-row slabs per 64-row tile, planned
dynamically) plus a setup-instruction estimate, and its field-dependent
term is bounded by the measured per-tile spread stats
(tools/probe_spreads.py).

Usage:  python tools/roofline.py [H W] [--json]
        (defaults 3264 4928 — L0 of the Glasgow-resolution chain)
"""

import json
import sys

sys.path.insert(0, "/root/repo")
from bench import _make_pair, _setup_jax  # noqa: E402

jax = _setup_jax()
import jax.numpy as jnp  # noqa: E402

from ug_stereomatcher_tpu import MatcherConfig  # noqa: E402
from ug_stereomatcher_tpu import match as match_mod  # noqa: E402
from ug_stereomatcher_tpu import pyramid as pyr  # noqa: E402
from tools._timing import (chained, dep,  # noqa: E402
                           representative_field)

N = 8
REPEATS = 3

_pos = [a for a in sys.argv[1:] if not a.startswith("--")]
H = int(_pos[0]) if len(_pos) > 0 else 3264
W = int(_pos[1]) if len(_pos) > 1 else 4928

cfg = MatcherConfig()


# ----------------------------------------------------------------------
# Contract-derived instruction counts (per element; see module docstring
# for the counting convention).  Each term cites the kernel source it
# prices; the gold tests pin the underlying math, so these counts only
# change if the contract does.
# ----------------------------------------------------------------------

FMA = 2  # an f32 multiply-add occupies 2 VPU issue slots: the measured
#          mul-chain rate is 2.017x the FMA-chain rate (6.24 vs 3.09
#          Tinstr/s on this chip), so slots — mul/add/cmp/select = 1,
#          FMA = 2 — are the unit in which one ceiling describes both.
#          Rolls are priced by their own microbench (measure_roll_cost).


def blur_slots():
    """ops/pallas/direction._direction_kernel blur(): two separable
    5-tap passes; per pass 1 mul + 4 FMA (term-by-term ops.conv order)
    + 4 rolls (the centre tap needs none)."""
    arith = 2 * (1 + 4 * FMA)
    rolls = 2 * 4
    return arith, rolls


def parabola_slots():
    """ops/pointwise.parabola_fit: b1 sub+mul (2), c1 add+sub (2),
    has_peak cmp (1), off mul+div (2), clamp min+max (2), cstar 2 FMA
    (4), over cmp (1), d sub (1), off_over sub+div+mul+cmp+select (5),
    conf_in FMA+select (3), three final selects (3)."""
    return 26


def direction_counts(TH=64, TW=512, HALO=4, HW=64, roll_cost=1.0):
    """Slot counts for fused_direction_update (defaults = the
    production tile, ops/pallas/direction.py:42-43, 207-208)."""
    b_arith, b_roll = blur_slots()
    # bw2 = reclamp(blur(w*w)) per channel: square + blur (reclamp is
    # edge-tile-only, lax.cond-skipped on interior tiles -> amortized 0)
    buf_arith = 3 * (1 + b_arith)
    buf_roll = 3 * b_roll
    # 5 moves x 3 channels: cross mul, cross blur, num square (all on
    # the halo buffer); shifted() of warped and bw2 cost 1 roll for the
    # four non-centre moves
    buf_arith += 15 * (1 + b_arith + 1)
    buf_roll += 15 * b_roll + 2 * (4 * 3)
    # output-sized tail: den mul, ratio div, 2 clips, acc add (x15),
    # mean x(1/3) (x5), two parabola fits, conf mul, 2 disp adds,
    # blend mul+FMA, replace select
    out = 15 * 5 + 5 + 2 * parabola_slots() + 1 + 2 + 3 + 1
    buffer_factor = ((TH + 2 * HALO) * (TW + 2 * HW)) / (TH * TW)
    per_px = (buf_arith + buf_roll * roll_cost) * buffer_factor + out
    return {"buffer_arith": buf_arith, "buffer_roll": buf_roll,
            "out": out, "buffer_factor": round(buffer_factor, 4),
            "instr_per_px": round(per_px, 1)}


def smooth_counts(n_passes=10, TH=64, TW=1024, HW=64, roll_cost=1.0):
    """Slot counts for fused_smooth_average (production tile,
    ops/pallas/smooth.py:41, 166-167); HALO = smooth_halo_rows."""
    HALO = -(-(n_passes + 1) // 4) * 4
    # per pass: 4 rolls of conf; denominator 4 adds + 1 reciprocal;
    # per plane (x3): 4 rolls + mul + 4 FMA + mul-by-recip
    pass_roll = 4 + 12
    pass_arith = 5 + 3 * (2 + 4 * FMA)
    # 3-tap average, per plane: 2 passes x (2 rolls + 2 add + 1 mul)
    avg_roll = 3 * 2 * 2
    avg_arith = 3 * 2 * 3
    buf_arith = n_passes * pass_arith + avg_arith
    buf_roll = n_passes * pass_roll + avg_roll
    buffer_factor = ((TH + 2 * HALO) * (TW + 2 * HW)) / (TH * TW)
    per_px = (buf_arith + buf_roll * roll_cost) * buffer_factor
    return {"buffer_arith": buf_arith, "buffer_roll": buf_roll,
            "halo": HALO, "buffer_factor": round(buffer_factor, 4),
            "instr_per_px": round(per_px, 1)}


def warp_bytes_per_px():
    """Contract-fixed HBM traffic of the dynamic windowed warp, bytes
    per output pixel: the planner positions a 192-row source slab per
    64-row tile (3x source amplification, ops/pallas/warp.py DYN slab
    capacity), x3 channels x4 B; plan_dyn_warp reads both disparity
    planes once; the kernel reads both again as blocks and writes 3
    output channels."""
    slab = (192 / 64) * 3 * 4
    plan = 2 * 4
    disp = 2 * 4
    out = 3 * 4
    return slab + plan + disp + out


# ----------------------------------------------------------------------
# Measured ceilings
# ----------------------------------------------------------------------

def measure_ceilings():
    """Sustained VPU instruction rate and HBM stream bandwidth.

    Pitfalls engineered around (the first attempt hit all three):
    * the multiplier/addend ride in as TRACED jit arguments — as closure
      constants XLA folds a 32-deep affine chain into one FMA and the
      'ceiling' reads 2x the VPU's physical limit (and the mul chain
      collapses below the call floor, going negative after subtraction);
    * chain depth x trip count sized so compute is ~100x the relay's
      ~30 ms per-call floor and ~10x the array's own HBM streaming time
      (8.4M elements cannot sit in VMEM across fori iterations);
    * growth bounded: a = 1 + 1e-7 over 131k steps moves x by ~1.3%.
    """
    from tools._timing import timed
    from jax import lax

    floor = timed(lambda x: x + 1.0, jnp.zeros((8, 128), jnp.float32),
                  repeats=REPEATS)

    M, TRIPS = 256, 512
    a = jnp.float32(1.0000001)
    b = jnp.float32(1e-7)
    x0 = jnp.ones((2048, 4096), jnp.float32)

    def fma_loop(x, a, b):
        def body(i, x):
            for _ in range(M):
                x = x * a + b
            return x
        return lax.fori_loop(0, TRIPS, body, x)

    def mul_loop(x, a):
        def body(i, x):
            for _ in range(M):
                x = x * a
            return x
        return lax.fori_loop(0, TRIPS, body, x)

    t_fma = timed(fma_loop, x0, a, b, repeats=REPEATS)
    t_mul = timed(mul_loop, x0, a, repeats=REPEATS)
    instrs = M * TRIPS * x0.size
    fma_rate = instrs / (t_fma - floor)
    mul_rate = instrs / (t_mul - floor)

    big = jnp.ones((8192, 8192), jnp.float32)  # 256 MB
    HB_TRIPS = 128

    def hbm_loop(x, a):
        return lax.fori_loop(0, HB_TRIPS, lambda i, x: x * a, x)

    t_hbm = timed(hbm_loop, big, a, repeats=REPEATS)
    hbm_rate = 2 * big.size * 4 * HB_TRIPS / (t_hbm - floor)

    return {"floor_s": floor,
            "vpu_fma_instr_per_s": fma_rate,
            "vpu_mul_instr_per_s": mul_rate,
            "hbm_bytes_per_s": hbm_rate}


def measure_roll_cost(ceil):
    """Price ``pltpu.roll`` in VPU slots, per axis.

    Two Pallas kernels whose per-rep bodies differ ONLY in four ops —
    ``roll(acc, r, axis)`` vs ``minimum(acc, c_r)`` (min is a known
    1-slot op; both are fold-proof: min because acc is data, roll
    because it moves data).  The slot cost of a roll is then
    1 + dt * ceiling / (4 * reps * elems).  Rolls appear ~170x per
    pixel in the direction kernel and ~170x in smooth, so their true
    cost decides whether those kernels sit near their op-mix ceiling."""
    import functools
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    from tools._timing import timed

    REPS = 2048
    THB, TWB = 256, 1024
    x0 = jnp.ones((2048, 4096), jnp.float32) * 0.7
    ni, nj = x0.shape[0] // THB, x0.shape[1] // TWB

    def make_kernel(use_roll, axis):
        def kern(x_ref, o_ref):
            acc = x_ref[...]

            def body(i, acc):
                y = acc * 0.2
                for r in range(1, 5):
                    if use_roll:
                        y = y + pltpu.roll(acc, r, axis=axis)
                    else:
                        y = y + jnp.minimum(acc, 0.5 + 0.1 * r)
                return y * jnp.float32(1.0 / 4.2)

            o_ref[...] = jax.lax.fori_loop(0, REPS, body, acc)
        return kern

    def run(use_roll, axis):
        fn = pl.pallas_call(
            make_kernel(use_roll, axis),
            grid=(ni, nj),
            in_specs=[pl.BlockSpec((THB, TWB), lambda i, j: (i, j),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((THB, TWB), lambda i, j: (i, j),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct(x0.shape, jnp.float32))
        return timed(fn, x0, repeats=REPEATS)

    slot = ceil["vpu_mul_instr_per_s"]
    base = run(False, 1)
    out = {}
    for axis, name in ((1, "lane"), (0, "sublane")):
        t = run(True, axis)
        cost = 1.0 + (t - base) * slot / (4 * REPS * x0.size)
        out[f"roll_{name}_slots"] = cost
    out["roll_baseline_s"] = base
    return out


# ----------------------------------------------------------------------
# Kernel latencies (chained, floor-corrected) — profile_hotloop bodies
# ----------------------------------------------------------------------

def measure_kernels(ceil):
    from ug_stereomatcher_tpu.ops.pallas.blur import fused_blur_gaussian
    from ug_stereomatcher_tpu.ops.pallas.direction import (
        fused_direction_update)
    from ug_stereomatcher_tpu.ops.pallas.smooth import fused_smooth_average
    from ug_stereomatcher_tpu.ops.pallas.warp import warp_windowed

    left_np, right_np = _make_pair(H, W)
    n = cfg.num_levels(H, W)
    lp = pyr.build_pyramid(
        jnp.moveaxis(jnp.asarray(left_np, jnp.float32), -1, 0), cfg, n)
    rp = pyr.build_pyramid(
        jnp.moveaxis(jnp.asarray(right_np, jnp.float32), -1, 0), cfg, n)
    L, R = lp[0], rp[0]
    h, w = L.shape[-2:]

    dh, dv, conf = representative_field(h, w)
    state0 = jnp.stack([dh, dv, conf])
    floor = ceil["floor_s"]

    def warp_body(c, R, dh, dv):
        return match_mod.warp_for_level(R, dep(c, dh), dv, cfg, 0)

    t_warp = (chained(warp_body, jnp.zeros_like(R), R, dh, dv,
                      n=N, repeats=REPEATS) - floor) / N

    bl2 = fused_blur_gaussian(L * L, boundary="clamp")
    dy0, dx0 = cfg.warp_window_for_level(0)
    warped0 = warp_windowed(R, dh, dv, max_dy=dy0, max_dx=dx0,
                            method=cfg.interp)
    dconsts = (cfg.conf_no_peak, cfg.conf_affine_scale,
               cfg.conf_affine_bias, cfg.conf_blend_new, cfg.conf_blend_old)

    def dir_body(c, L, warped0, bl2):
        return fused_direction_update(L, dep(c, warped0), bl2, c,
                                      jnp.float32(0.5), jnp.int32(0),
                                      consts=dconsts)

    t_dir = (chained(dir_body, state0, L, warped0, bl2,
                     n=N, repeats=REPEATS) - floor) / N

    n_smooth = cfg.smooth_passes_for_level(0)

    def smooth_body(c):
        return fused_smooth_average(c, n_passes=n_smooth)

    t_smooth = (chained(smooth_body, state0, n=N, repeats=REPEATS)
                - floor) / N
    return {"px": h * w, "warp_s": t_warp, "direction_s": t_dir,
            "smooth_s": t_smooth, "n_smooth": n_smooth}


def build_report(ceil, kern, roll_cost=1.0):
    px = kern["px"]
    vpu = ceil["vpu_mul_instr_per_s"]  # slots/s; FMA counted as 2
    hbm = ceil["hbm_bytes_per_s"]
    rows = []

    dc = direction_counts(roll_cost=roll_cost)
    rate = px * dc["instr_per_px"] / kern["direction_s"]
    # direction HBM: read left+warped via halo slabs (buffer_factor x 3ch),
    # bl2 + disp blocks, write 3 planes
    dir_bytes = (2 * 3 * 4 * dc["buffer_factor"] + 6 * 4 + 3 * 4)
    rows.append({
        "kernel": "fused_direction", "ms": kern["direction_s"] * 1e3,
        "instr_per_px": dc["instr_per_px"],
        "ginstr_s": rate / 1e9, "pct_vpu": 100 * rate / vpu,
        "bytes_per_px": dir_bytes,
        "pct_hbm": 100 * px * dir_bytes / kern["direction_s"] / hbm})

    sc = smooth_counts(kern["n_smooth"], roll_cost=roll_cost)
    rate = px * sc["instr_per_px"] / kern["smooth_s"]
    sm_bytes = (3 * 4 * sc["buffer_factor"] + 3 * 4)  # 3-plane read + write
    rows.append({
        "kernel": f"fused_smooth({kern['n_smooth']})",
        "ms": kern["smooth_s"] * 1e3,
        "instr_per_px": sc["instr_per_px"],
        "ginstr_s": rate / 1e9, "pct_vpu": 100 * rate / vpu,
        "bytes_per_px": sm_bytes,
        "pct_hbm": 100 * px * sm_bytes / kern["smooth_s"] / hbm})

    wb = warp_bytes_per_px()
    # setup estimate: coords/indices/clips ~20 + guard/plan reductions ~6
    # + ~4 instrs per executed candidate, ~3 candidates on natural fields
    warp_instr = 26 + 4 * 3
    rate = px * warp_instr / kern["warp_s"]
    rows.append({
        "kernel": "warp (dyn, plan+sweep)", "ms": kern["warp_s"] * 1e3,
        "instr_per_px": warp_instr,
        "ginstr_s": rate / 1e9, "pct_vpu": 100 * rate / vpu,
        "bytes_per_px": wb,
        "pct_hbm": 100 * px * wb / kern["warp_s"] / hbm})
    return rows


def main():
    print(f"== measured ceilings ({H}x{W} chain, device "
          f"{jax.devices()[0]}) ==")
    ceil = measure_ceilings()
    print(f"vpu_fma  {ceil['vpu_fma_instr_per_s'] / 1e12:.3f} Tinstr/s "
          f"(= {2 * ceil['vpu_fma_instr_per_s'] / 1e12:.3f} Tflop/s f32)")
    print(f"vpu_mul  {ceil['vpu_mul_instr_per_s'] / 1e12:.3f} Tinstr/s "
          f"(the slot ceiling; FMA occupies "
          f"{ceil['vpu_mul_instr_per_s'] / ceil['vpu_fma_instr_per_s']:.2f}"
          f" slots)")
    print(f"hbm      {ceil['hbm_bytes_per_s'] / 1e9:.1f} GB/s")

    rc = measure_roll_cost(ceil)
    print(f"roll     lane {rc['roll_lane_slots']:.2f} slots, "
          f"sublane {rc['roll_sublane_slots']:.2f} slots")
    # the kernels roll both axes; horizontal (lane) rolls dominate the
    # blur passes 1:1 with vertical, so use the mean as the mix price
    roll_cost = (rc["roll_lane_slots"] + rc["roll_sublane_slots"]) / 2

    kern = measure_kernels(ceil)
    rows = build_report(ceil, kern, roll_cost=roll_cost)
    print(f"\n== L0 kernels at {H}x{W} ({kern['px'] / 1e6:.2f} Mpx), "
          f"chained N={N}, floor-corrected ==")
    hdr = (f"{'kernel':24s} {'ms':>7s} {'slots/px':>9s} {'Gslot/s':>9s} "
           f"{'%VPU':>6s} {'B/px':>6s} {'%HBM':>6s}")
    print(hdr)
    for r in rows:
        print(f"{r['kernel']:24s} {r['ms']:7.2f} {r['instr_per_px']:9.0f} "
              f"{r['ginstr_s']:9.1f} {r['pct_vpu']:6.1f} "
              f"{r['bytes_per_px']:6.1f} {r['pct_hbm']:6.1f}")

    if "--json" in sys.argv:
        print(json.dumps({"ceilings": ceil, "roll": rc,
                          "roll_cost_used": roll_cost, "kernels": kern,
                          "rows": rows}, default=float))


if __name__ == "__main__":
    main()
