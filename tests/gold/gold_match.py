"""NumPy gold model of the full matching pipeline.

Composes the scalar op golds (gold_ops) following the reference call
structure (MatchGPULib.cpp: CreatePyramidFromImage:1033, CreateFoveatedPyramid
:1128, matching:1196, matchlevel:1662, hierarchicalDisparity:2589) so the JAX
pipeline can be checked end-to-end on small images.
"""

from __future__ import annotations

import numpy as np

from tests.gold import gold_ops as g

SCALE = g.SCALE


def dims_chain(h, w, max_level=14):
    out = [(h, w)]
    for _ in range(max_level - 1):
        h = int(h / SCALE)
        w = int(w / SCALE)
        out.append((h, w))
    return out


def num_levels(h, w, min_dim=8, max_level=14):
    n = 0
    for (hh, ww) in dims_chain(h, w, max_level):
        if hh < min_dim or ww < min_dim:
            break
        n += 1
    return max(1, n)


def build_pyramid(image, n, h, w):
    """image: (C, H, W).  Mirrors CreatePyramidFromImage's even/odd factor-2
    chain with one blur per level."""
    dims = dims_chain(h, w)
    levels = [None] * n
    levels[0] = image
    for i in range(n):
        blurred = np.stack([g.conv_sep_zero(c, g.GAUSS) for c in levels[i]])
        if i == 0 and n > 1:
            h2, w2 = dims[1]
            levels[1] = np.stack([g.subsample(c, h2, w2, SCALE) for c in blurred])
        if i + 2 < n:
            h2, w2 = dims[i + 2]
            levels[i + 2] = np.stack([g.subsample(c, h2, w2, 2.0) for c in blurred])
    return levels


def foveate(levels, fovea_level, h, w):
    dims = dims_chain(h, w)
    fov_h, fov_w = dims[fovea_level - 1]
    x1, y1 = fov_w // 2, fov_h // 2
    out = []
    for lvl, img in enumerate(levels):
        if lvl >= fovea_level - 1:
            out.append(img)
        else:
            hh, ww = dims[lvl]
            left = ww // 2 - x1
            up = hh // 2 - y1
            out.append(img[:, up:up + fov_h, left:left + fov_w])
    return out


def iters_for_level(i):
    return 22 if i > 5 else (i + 1) * 2


def threshold_schedule(mi):
    th = 1.0
    sched = []
    half = mi // 2
    for m in range(1, mi + 1):
        sched.append(th)
        if m % 2 == 0 and m < mi:
            rem = half - m // 2
            if rem < 7:
                th = (rem - 1) * ((1.0 - 0.1) / (half - 1.0)) + 0.1
            else:
                th = 1.0
    return sched


MOVES = ((-1, 0), (1, 0), (0, -1), (0, 1), (0, 0))


def match_level(left, right, disp, level_index, is_coarsest,
                smooth_fine_levels=2):
    """left/right: (C,h,w); disp: (3,h,w).  Mirrors matchlevel."""
    mi = iters_for_level(level_index)
    sched = threshold_schedule(mi)
    n_smooth = 10 if level_index < smooth_fine_levels else 5
    dh, dv, conf = disp[0].copy(), disp[1].copy(), disp[2].copy()
    C = left.shape[0]

    bl2 = np.stack([g.conv_sep_clamp(c * c, g.GAUSS) for c in left])

    for m in range(1, mi + 1):
        thr = sched[m - 1]
        warped = np.stack([g.warp(c, dh, dv) for c in right])
        bw2 = np.stack([g.conv_sep_clamp(c * c, g.GAUSS) for c in warped])

        dirs = []
        for (dx, dy) in MOVES:
            acc = None
            for ch in range(C):
                cross = left[ch] * g.shift(warped[ch], dx, dy)
                bc = g.conv_sep_zero(cross, g.GAUSS)
                corr = g.correlation_ratio(bc, bl2[ch], bw2[ch], dx, dy)
                acc = corr if acc is None else acc + corr
            dirs.append(acc / C)
        dir_l, dir_r, dir_u, dir_d, dir_c = dirs

        inc_h, conf_h = g.parabola_fit(dir_l, dir_c, dir_r, thr)
        inc_v, conf_v = g.parabola_fit(dir_u, dir_c, dir_d, thr)
        conf_new = conf_h * conf_v

        dh = dh + inc_h
        dv = dv + inc_v
        if is_coarsest and m == 1:
            conf = conf_new
        else:
            conf = g.blend_confidence(conf_new, conf)

        for _ in range(n_smooth):
            c0 = conf.copy()
            dh = g.weighted_smooth(dh, c0)
            dv = g.weighted_smooth(dv, c0)
            conf = g.weighted_smooth(conf, c0)

        dh = g.conv_sep_clamp(dh, g.AVG)
        dv = g.conv_sep_clamp(dv, g.AVG)
        conf = g.conv_sep_clamp(conf, g.AVG)

    return np.stack([dh, dv, conf])


def matching(left_levels, right_levels, h, w, foveated=False, fovea_level=7):
    """Coarse-to-fine driver; mirrors matching (MatchGPULib.cpp:1196)."""
    n = len(left_levels)
    dims = dims_chain(h, w)[:n]
    full_chain = dims_chain(h, w)
    if foveated:
        big = dims[fovea_level - 2]
        fov = dims[fovea_level - 1]
        dims = [fov if i < fovea_level - 1 else dims[i] for i in range(n)]
    results = [None] * n
    hh, ww = dims[n - 1]
    disp = np.zeros((3, hh, ww), dtype=np.float32)
    for i in range(n - 1, -1, -1):
        disp = match_level(left_levels[i], right_levels[i], disp, i,
                           is_coarsest=(i == n - 1))
        results[i] = disp
        if i > 0:
            if (not foveated) or i >= fovea_level:
                h2, w2 = dims[i - 1]
                disp = np.stack([
                    g.upsample_disp(p, h2, w2, 1.0 / SCALE) for p in disp])
            else:
                big_h, big_w = full_chain[fovea_level - 2]
                up = np.stack([
                    g.upsample_disp(p, big_h, big_w, 1.0 / SCALE) for p in disp])
                fov_h, fov_w = disp.shape[-2:]
                left_m = big_w // 2 - fov_w // 2
                up_m = big_h // 2 - fov_h // 2
                disp = up[:, up_m:up_m + fov_h, left_m:left_m + fov_w]
    return results


def hierarchical(stack, fovea_level, h, w):
    dims = dims_chain(h, w)
    fov_h, fov_w = dims[fovea_level - 1]
    xs, ys = fov_w // 2, fov_h // 2
    current = stack[fovea_level - 1]
    for level in range(fovea_level - 1, 0, -1):
        big_h, big_w = dims[level - 1]
        up = np.stack([
            g.part_upsample_disp(p, big_h, big_w, SCALE) for p in current])
        left = big_w // 2 - xs
        upper = big_h // 2 - ys
        up[:, upper:upper + fov_h, left:left + fov_w] = stack[level - 1]
        current = up
    return current
