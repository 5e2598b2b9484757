"""Shared chained-timing helpers for the tools/ benchmarks.

Import AFTER ``bench._setup_jax()`` so platform/env/compile-cache config
is applied first.  Timing methodology (see CLAUDE.md):

* ``jax.block_until_ready`` does not synchronise on this relayed
  backend — every measurement forces a scalar readback instead.
* The relay has a ~3-30 ms per-call floor, so per-op costs are measured
  by chaining N applications through a ``lax.fori_loop`` inside ONE jit
  and dividing out; callers subtract a ``chained``-measured empty loop.
* Large arrays MUST ride in as jit ARGUMENTS — closure captures inline
  as literals and the relay's compile endpoint rejects the program
  (HTTP 413).
"""

import time

import jax
import jax.numpy as jnp
from jax import lax


def sync(x):
    return float(jnp.sum(x))


def timed(fn, *args, repeats=3):
    """Best-of-`repeats` wall time of one jitted call (compile + one warm
    run excluded)."""
    fn_j = jax.jit(fn)
    out = fn_j(*args)
    sync(jax.tree_util.tree_leaves(out)[0])
    best = 1e9
    for _ in range(repeats):
        t0 = time.perf_counter()
        out = fn_j(*args)
        sync(jax.tree_util.tree_leaves(out)[0])
        best = min(best, time.perf_counter() - t0)
    return best


def chained(body, init, *consts, n=8, repeats=3):
    """Time ``n`` chained applications of ``body(carry, *consts)`` inside
    one jit (the relay per-call floor amortises across the chain)."""
    def loop(x, *cs):
        return lax.fori_loop(0, n, lambda i, c: body(c, *cs), x)
    return timed(loop, init, *consts, repeats=repeats)


def dep(x, y):
    """Cheap data dependence: fold a scalar of x into y, so a chained
    loop body cannot be dead-code-eliminated or hoisted."""
    return y + x[(0,) * (x.ndim - 2)][0, 0] * 0.0


def representative_field(h, w):
    """The shared kernel-benchmark disparity state: a smooth ~3 px
    horizontal field with mild vertical warp and mid confidence — the
    kind of field the matcher carries mid-refinement (used by
    profile_hotloop and roofline so both tools measure the same call
    shape)."""
    yy = jnp.linspace(0.0, 1.0, h)[:, None]
    xx = jnp.linspace(0.0, 1.0, w)[None, :]
    dh = (3.0 + 0.5 * jnp.sin(2 * jnp.pi * yy) * jnp.cos(2 * jnp.pi * xx)
          ).astype(jnp.float32)
    dv = (0.3 * jnp.sin(2 * jnp.pi * xx) + 0.0 * yy).astype(jnp.float32)
    conf = jnp.full((h, w), 0.5, jnp.float32)
    return dh, dv, conf
