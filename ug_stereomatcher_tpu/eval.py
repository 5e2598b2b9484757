"""Accuracy evaluation harness: end-point-error metrics + synthetic scenes.

The reference is evaluated on the Glasgow 80-pair stereo database
(README.md:32-36) by visual inspection; this module adds the quantitative
harness the reference lacks:

* ``epe_metrics`` — sub-pixel end-point error statistics between a
  disparity result and ground truth (or a second engine's result);
* ``synthetic_scene`` — procedurally generated stereo pairs with exact
  dense two-axis ground truth (textured fronto-parallel planes, slanted
  planes, and sinusoidal warps), standing in for the external database in
  an offline environment;
* ``evaluate_engine`` — run an engine over a scene suite and report EPE.

Use with the real Glasgow database by pointing ``evaluate_pairs`` at a
manifest; ground-truth-free A/B comparison between two configurations
(e.g. nearest vs bilinear, xla vs pallas) uses one engine's output as the
reference field.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Dict, List, Optional, Sequence, Tuple

import numpy as np


@dataclasses.dataclass
class EpeReport:
    """End-point-error statistics over the evaluated region."""
    mean_epe: float
    median_epe: float
    rms_epe: float
    bad_0_5: float     # fraction with EPE > 0.5 px
    bad_1_0: float
    bad_3_0: float
    mean_abs_h: float
    mean_abs_v: float
    pixels: int

    def as_dict(self) -> Dict[str, float]:
        return dataclasses.asdict(self)


def epe_metrics(disp_h, disp_v, gt_h, gt_v, margin: int = 12,
                mask=None) -> EpeReport:
    """Sub-pixel end-point error of a two-axis disparity field.

    margin crops image borders (the reference algorithm's boundary drift
    region); mask optionally selects evaluated pixels."""
    dh = np.asarray(disp_h, dtype=np.float64)
    dv = np.asarray(disp_v, dtype=np.float64)
    gh = np.asarray(gt_h, dtype=np.float64)
    gv = np.asarray(gt_v, dtype=np.float64)
    sl = (slice(margin, -margin or None), slice(margin, -margin or None))
    eh = dh[sl] - gh[sl]
    ev = dv[sl] - gv[sl]
    if mask is not None:
        m = np.asarray(mask)[sl].astype(bool)
        eh, ev = eh[m], ev[m]
    epe = np.sqrt(eh ** 2 + ev ** 2)
    if epe.size == 0:
        # NaN stats make automated gates direction-dependent (nan < x is
        # always False) — fail loudly instead
        raise ValueError(
            "epe_metrics: no pixels to evaluate (margin crop and/or mask "
            "selected an empty region)")
    return EpeReport(
        mean_epe=float(epe.mean()),
        median_epe=float(np.median(epe)),
        rms_epe=float(np.sqrt((epe ** 2).mean())),
        bad_0_5=float((epe > 0.5).mean()),
        bad_1_0=float((epe > 1.0).mean()),
        bad_3_0=float((epe > 3.0).mean()),
        mean_abs_h=float(np.abs(eh).mean()),
        mean_abs_v=float(np.abs(ev).mean()),
        pixels=int(epe.size),
    )


# ----------------------------------------------------------------------
# Synthetic scenes with dense exact ground truth
# ----------------------------------------------------------------------

def _textured_base(h: int, w: int, rng: np.random.RandomState,
                   smooth: int = 3) -> np.ndarray:
    tex = rng.rand(h, w, 3).astype(np.float32) * 255
    for _ in range(smooth):
        tex[1:-1] = (tex[:-2] + tex[1:-1] + tex[2:]) / 3
        tex[:, 1:-1] = (tex[:, :-2] + tex[:, 1:-1] + tex[:, 2:]) / 3
    return tex


def synthetic_scene(kind: str, height: int, width: int,
                    seed: int = 0, magnitude: float = 4.0
                    ) -> Tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Generate (left, right, gt_h, gt_v) with EXACT dense ground truth:
    right(x + d(x)) == left(x) for the returned d at every left pixel.

    kinds: 'constant' (fronto-parallel plane), 'slant' (disparity ramp),
    'sine' (smooth two-axis warp), 'vertical' (pure vertical shift),
    'step' (fronto-parallel depth discontinuity: d jumps from
    magnitude/4 to magnitude at mid-width — the hardest case for a
    smoothing-regularised matcher; the correspondence construction below
    keeps the ground truth exact even across the jump, so epe_metrics
    scores it directly and callers can mask the +-few-px band around the
    discontinuity where the plus-shaped smoothing necessarily blurs)."""
    rng = np.random.RandomState(seed)
    pad = int(np.ceil(abs(magnitude))) + 4
    base = _textured_base(height + 2 * pad, width + 2 * pad, rng)
    ys, xs = np.mgrid[0:height, 0:width].astype(np.float32)

    if kind == "constant":
        gt_h = np.full((height, width), magnitude, np.float32)
        gt_v = np.zeros((height, width), np.float32)
    elif kind == "vertical":
        gt_h = np.zeros((height, width), np.float32)
        gt_v = np.full((height, width), magnitude / 2, np.float32)
    elif kind == "slant":
        gt_h = (magnitude * xs / max(1, width - 1)).astype(np.float32)
        gt_v = np.zeros((height, width), np.float32)
    elif kind == "sine":
        gt_h = (magnitude / 2 * (1 + np.sin(2 * np.pi * xs / width))
                ).astype(np.float32)
        gt_v = (magnitude / 4 * np.sin(2 * np.pi * ys / height)
                ).astype(np.float32)
    elif kind == "step":
        gt_h = np.where(xs < width // 2, magnitude / 4, magnitude
                        ).astype(np.float32)
        gt_v = np.zeros((height, width), np.float32)
    else:
        raise ValueError(f"unknown scene kind {kind!r}")

    # EXACT ground truth: build LEFT by warping the base at (x + d(x)),
    # keep RIGHT as a plain crop — then right(x + d(x)) == left(x) holds
    # with d evaluated at the left pixel, which is precisely what
    # epe_metrics scores.  (The previous construction sampled d at the
    # destination pixel, biasing the "exact" gt by O(d * grad d): up to
    # 0.13 px on the sine scene — at the scale the harness measures.)
    right = base[pad:pad + height, pad:pad + width]
    sx = xs + pad + gt_h
    sy = ys + pad + gt_v
    x0 = np.floor(sx).astype(int)
    y0 = np.floor(sy).astype(int)
    ax = (sx - x0)[..., None]
    ay = (sy - y0)[..., None]
    b = base
    left = ((1 - ax) * (1 - ay) * b[y0, x0]
            + ax * (1 - ay) * b[y0, x0 + 1]
            + (1 - ax) * ay * b[y0 + 1, x0]
            + ax * ay * b[y0 + 1, x0 + 1])
    return (left.astype(np.uint8), right.astype(np.uint8),
            gt_h, gt_v)


DEFAULT_SUITE = (
    ("constant", 3.0), ("vertical", 2.0), ("slant", 4.0), ("sine", 4.0),
    ("step", 4.0),
)


def evaluate_engine(engine, height: int = 192, width: int = 256,
                    suite: Sequence[Tuple[str, float]] = DEFAULT_SUITE,
                    seed: int = 0, margin: int = 16
                    ) -> Dict[str, EpeReport]:
    """Run an engine over the synthetic suite; returns per-scene EPE."""
    out: Dict[str, EpeReport] = {}
    for kind, mag in suite:
        left, right, gt_h, gt_v = synthetic_scene(kind, height, width,
                                                  seed=seed, magnitude=mag)
        res = engine.match(left, right)
        out[kind] = epe_metrics(res.disparity_h, res.disparity_v,
                                gt_h, gt_v, margin=margin)
    return out


def accuracy_table(height: int = 192, width: int = 256,
                   interps: Sequence[str] = ("nearest", "bilinear"),
                   suite: Sequence[Tuple[str, float]] = DEFAULT_SUITE,
                   seed: int = 0, margin: int = 16,
                   ) -> Dict[str, Dict[str, EpeReport]]:
    """The nearest-vs-bilinear A/B table of docs/ACCURACY.md, reproducibly:
    one engine per interp mode over the full synthetic suite.  Regenerate the
    doc with ``python -m ug_stereomatcher_tpu eval --markdown``; the CI gates
    in tests/test_eval_cli.py enforce per-scene thresholds on exactly these
    numbers."""
    from ug_stereomatcher_tpu.config import MatcherConfig
    from ug_stereomatcher_tpu.engine import StereoEngine
    out: Dict[str, Dict[str, EpeReport]] = {}
    for interp in interps:
        eng = StereoEngine(MatcherConfig(interp=interp))
        out[interp] = evaluate_engine(eng, height=height, width=width,
                                      suite=suite, seed=seed, margin=margin)
    return out


_SCENE_LABEL = {
    "constant": "constant 3px shift", "vertical": "vertical 1px shift",
    "slant": "slanted ramp 0-4px", "sine": "sinusoidal 2-axis warp",
}


def format_accuracy_markdown(tables: Dict[str, Dict[str, EpeReport]]) -> str:
    """Render :func:`accuracy_table` output as the ACCURACY.md tables."""
    lines: List[str] = []
    for interp, reports in tables.items():
        lines.append(f"## interp=\"{interp}\"")
        lines.append("")
        lines.append("| scene | median EPE (px) | mean EPE | >1px |")
        lines.append("|---|---|---|---|")
        for kind, r in reports.items():
            lines.append(f"| {_SCENE_LABEL.get(kind, kind)} | "
                         f"{r.median_epe:.3f} | {r.mean_epe:.3f} | "
                         f"{100 * r.bad_1_0:.1f}% |")
        lines.append("")
    return "\n".join(lines)


def evaluate_pairs(engine, manifest_path: str, gt_loader: Callable[[int],
                   Tuple[np.ndarray, np.ndarray]],
                   margin: int = 16) -> List[EpeReport]:
    """Evaluate over a real stereo-pair manifest (e.g. the Glasgow 80-pair
    database) given a ground-truth loader ``gt_loader(pair_index) ->
    (gt_h, gt_v)``."""
    from ug_stereomatcher_tpu.io.manifest import load_image_list
    from ug_stereomatcher_tpu.io.image import load_image
    reports = []
    for idx, (lp, rp) in enumerate(load_image_list(manifest_path).pairs()):
        res = engine.match(load_image(lp), load_image(rp))
        gt_h, gt_v = gt_loader(idx)
        reports.append(epe_metrics(res.disparity_h, res.disparity_v,
                                   gt_h, gt_v, margin=margin))
    return reports
