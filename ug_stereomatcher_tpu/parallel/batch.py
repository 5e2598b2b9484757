"""Pair-batch data parallelism.

Shards a batch of stereo pairs across the 'pairs' mesh axis — the TPU-native
counterpart of running the Glasgow 80-pair database through the matcher
(SURVEY.md §2.5 'pair-batch data parallelism').  The per-pair pipeline is
vmapped; GSPMD partitions the batch axis, so no cross-pair communication is
needed (embarrassingly parallel over ICI/DCN).
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ug_stereomatcher_tpu.config import MatcherConfig
from ug_stereomatcher_tpu import match as match_mod
from ug_stereomatcher_tpu import pyramid as pyr


def _single_pair(left, right, cfg: MatcherConfig, height: int, width: int):
    # The Pallas kernels use ANY-memory-space inputs with manual DMA, which
    # Pallas cannot auto-batch under vmap — the batched path runs the
    # (vmap-compatible) XLA ops instead.
    import dataclasses
    cfg = dataclasses.replace(cfg, warp_backend="xla")
    n = cfg.num_levels(height, width)
    lp = pyr.build_pyramid(left, cfg, n)
    rp = pyr.build_pyramid(right, cfg, n)
    res = match_mod.match_pyramid(lp, rp, cfg, (height, width), foveated=False)
    return res.levels[0]


def make_batch_matcher(cfg: MatcherConfig, height: int, width: int,
                       mesh: Optional[Mesh] = None):
    """Build a reusable jitted batch matcher: (B,3,H,W) x2 -> (B,3,H,W).

    Build it once and call it per batch — a fresh jax.jit wrapper per call
    would re-trace the whole pyramid each time."""
    fn = jax.vmap(partial(_single_pair, cfg=cfg, height=height, width=width))
    if mesh is not None:
        spec = NamedSharding(mesh, P("pairs"))
        return jax.jit(fn, in_shardings=(spec, spec), out_shardings=spec)
    return jax.jit(fn)


def batch_match(left_batch, right_batch, cfg: Optional[MatcherConfig] = None,
                mesh: Optional[Mesh] = None):
    """Match a batch of pairs, sharded over the mesh 'pairs' axis.

    left_batch/right_batch: (B, 3, H, W) float arrays.
    Returns (B, 3, H, W) disparity triplets.  One-shot convenience —
    long-lived callers should hold a make_batch_matcher (or use
    StereoEngine.match_batch, which caches per shape)."""
    cfg = cfg or MatcherConfig()
    b, _, h, w = left_batch.shape
    fn = make_batch_matcher(cfg, h, w, mesh)
    return fn(jnp.asarray(left_batch), jnp.asarray(right_batch))
