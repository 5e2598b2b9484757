"""Pallas TPU kernels for the hot ops.

The XLA path is the reference implementation; these kernels exist to kill
the two measured bottlenecks on real hardware (see bench notes in
docs/PERF.md):

* the disparity-driven warp — XLA's per-element gather runs at ~10 ns/elem
  on TPU; the Pallas kernel replaces it with an in-VMEM windowed
  select-gather (vertical one-hot x per-128-lane-block dynamic gather);
* the per-iteration stencil chain — fused into few kernels to beat the
  ~0.2 ms/kernel dispatch floor that dominates small pyramid levels.
"""

from ug_stereomatcher_tpu.ops.pallas.warp import warp_nearest_windowed

__all__ = ["warp_nearest_windowed"]
