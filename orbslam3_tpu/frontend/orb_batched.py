"""Batched-pyramid ORB detection: all levels in one stacked tensor.

The per-level Python loop in frontend/orb.py emits ~30 XLA kernels x 8
levels; on hardware the front-end becomes kernel-launch-bound (~16 ms).
Here every stage runs ONCE over a (L, H0, W0) zero-padded level stack —
identical semantics (per-level quotas, border masking, grid top-k,
orientation, steered BRIEF), ~8x fewer kernel launches.

Padding correctness: levels are zero-padded to the level-0 canvas and a
static per-level border mask zeroes FAST responses outside each level's
valid region, so padded pixels can never become keypoints.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from orbslam3_tpu.ops import brief as brief_ops
from orbslam3_tpu.ops import fast as fast_ops
from orbslam3_tpu.ops import pyramid as pyr_ops
from orbslam3_tpu.frontend.orb import BORDER, Features, OrbConfig, level_quotas


def _shift3d(img, dy, dx):
    """out[l, y, x] = img[l, y+dy, x+dx] with edge clamping."""
    _, h, w = img.shape
    ys = jnp.clip(jnp.arange(h) + dy, 0, h - 1)
    xs = jnp.clip(jnp.arange(w) + dx, 0, w - 1)
    return img[:, ys][:, :, xs]


def _fast_score_batched(img, threshold):
    """(L, H, W) FAST-16-9 score."""
    ring = jnp.stack(
        [_shift3d(img, int(dy), int(dx)) for dy, dx in fast_ops.CIRCLE]
    )  # (16, L, H, W)
    diff = ring - img[None]
    brighter = diff > threshold
    darker = diff < -threshold

    def seg9(mask16):
        bits = jnp.zeros(img.shape, jnp.int32)
        for i in range(16):
            bits = bits | (mask16[i].astype(jnp.int32) << i)
        acc = bits
        for k in range(1, 9):
            rot = ((bits << k) | (bits >> (16 - k))) & 0xFFFF
            acc = acc & rot
        return acc != 0

    is_corner = seg9(brighter) | seg9(darker)
    sad_b = jnp.sum(jnp.maximum(diff - threshold, 0.0), axis=0)
    sad_d = jnp.sum(jnp.maximum(-diff - threshold, 0.0), axis=0)
    return jnp.where(is_corner, jnp.maximum(sad_b, sad_d), 0.0)


def _nms3x3_batched(score):
    mx = jax.lax.reduce_window(
        score, -jnp.inf, jax.lax.max, (1, 3, 3), (1, 1, 1), "SAME"
    )
    return jnp.where(score >= mx, score, 0.0)


def _blur_batched(img, sigma=2.0, radius=3):
    k = pyr_ops.gaussian_kernel_1d(sigma, radius)
    x = img[:, None]  # (L, 1, H, W)
    kh = k.reshape(1, 1, -1, 1)
    kw = k.reshape(1, 1, 1, -1)
    x = jax.lax.conv_general_dilated(x, kh, (1, 1), [(radius, radius), (0, 0)])
    x = jax.lax.conv_general_dilated(x, kw, (1, 1), [(0, 0), (radius, radius)])
    return x[:, 0]


def _gather_patches_3d(stack, lv, ys, xs, size):
    """Patches from the level stack: (B,) indices -> (B, size, size)."""
    L, h, w = stack.shape
    half = size // 2
    y0 = jnp.clip(ys - half, 0, h - size)
    x0 = jnp.clip(xs - half, 0, w - size)

    def one(l, y, x):
        return jax.lax.dynamic_slice(stack, (l, y, x), (1, size, size))[0]

    return jax.vmap(one)(lv, y0.astype(jnp.int32), x0.astype(jnp.int32))


def _corner_subpix_3d(stack, lv, ys, xs, win=4):
    size = 2 * win + 3
    P = _gather_patches_3d(stack, lv, ys, xs, size)
    gx = 0.5 * (P[:, 1:-1, 2:] - P[:, 1:-1, :-2])
    gy = 0.5 * (P[:, 2:, 1:-1] - P[:, :-2, 1:-1])
    r = jnp.arange(-win, win + 1, dtype=jnp.float32)
    Y, X = jnp.meshgrid(r, r, indexing="ij")
    wgt = jnp.exp(-(X**2 + Y**2) / (2.0 * (win / 1.5) ** 2))
    gxx = jnp.sum(wgt * gx * gx, axis=(1, 2))
    gxy = jnp.sum(wgt * gx * gy, axis=(1, 2))
    gyy = jnp.sum(wgt * gy * gy, axis=(1, 2))
    bx = jnp.sum(wgt * (gx * gx * X + gx * gy * Y), axis=(1, 2))
    by = jnp.sum(wgt * (gx * gy * X + gy * gy * Y), axis=(1, 2))
    det = gxx * gyy - gxy * gxy
    det_safe = jnp.where(jnp.abs(det) > 1e-6, det, 1e-6)
    dx = jnp.where(jnp.abs(det) > 1e-6, jnp.clip((gyy * bx - gxy * by) / det_safe, -win, win), 0.0)
    dy = jnp.where(jnp.abs(det) > 1e-6, jnp.clip((gxx * by - gxy * bx) / det_safe, -win, win), 0.0)
    return dy, dx


@partial(jax.jit, static_argnames=("cfg",))
def detect_orb_batched(img, cfg: OrbConfig = OrbConfig()) -> Features:
    """(H, W) f32 -> Features; one fused pass over the stacked pyramid."""
    h0, w0 = img.shape
    L = cfg.n_levels
    shapes = pyr_ops.level_shapes(h0, w0, L, cfg.scale_factor)
    levels = pyr_ops.build_pyramid(img, L, cfg.scale_factor)
    stack = jnp.stack(
        [
            jnp.pad(lv_img, ((0, h0 - s[0]), (0, w0 - s[1])))
            for lv_img, s in zip(levels, shapes)
        ]
    )  # (L, H0, W0)

    # static per-level valid-region mask (excludes border + padding)
    mask_np = np.zeros((L, h0, w0), np.float32)
    for lv, (hh, ww) in enumerate(shapes):
        mask_np[lv, BORDER : hh - BORDER, BORDER : ww - BORDER] = 1.0
    border_mask = jnp.asarray(mask_np)

    score = _fast_score_batched(stack, cfg.fast_threshold)
    score_lo = _fast_score_batched(stack, cfg.fast_threshold_min) * 1e-3
    score = jnp.maximum(score, score_lo)
    score = _nms3x3_batched(score) * border_mask

    # grid top-k per level on the shared canvas
    cell = cfg.cell
    ph = (-h0) % cell
    pw = (-w0) % cell
    s = jnp.pad(score, ((0, 0), (0, ph), (0, pw)))
    hh, ww = h0 + ph, w0 + pw
    gy, gx = hh // cell, ww // cell
    cells = (
        s.reshape(L, gy, cell, gx, cell)
        .transpose(0, 1, 3, 2, 4)
        .reshape(L, gy * gx, cell * cell)
    )
    cv, ci = jax.lax.top_k(cells, cfg.k_cell)  # (L, ncells, k)
    cell_y = (jnp.arange(gy * gx) // gx) * cell
    cell_x = (jnp.arange(gy * gx) % gx) * cell
    ys_all = cell_y[None, :, None] + ci // cell  # (L, ncells, k)
    xs_all = cell_x[None, :, None] + ci % cell
    flat_v = cv.reshape(L, -1)
    flat_y = ys_all.reshape(L, -1)
    flat_x = xs_all.reshape(L, -1)

    quotas = level_quotas(cfg)
    n_out = max(quotas)
    top_v, top_i = jax.lax.top_k(flat_v, n_out)  # (L, n_out)
    ys = jnp.take_along_axis(flat_y, top_i, axis=1)
    xs = jnp.take_along_axis(flat_x, top_i, axis=1)
    # per-level quota mask
    quota_arr = jnp.asarray(quotas)[:, None]  # (L, 1)
    rank = jnp.broadcast_to(jnp.arange(n_out)[None], (L, n_out))
    lvl_valid = (rank < quota_arr) & (top_v > 0)

    # flatten all levels
    B = L * n_out
    lv_idx = jnp.repeat(jnp.arange(L, dtype=jnp.int32), n_out)
    ys_f = ys.reshape(B)
    xs_f = xs.reshape(B)
    resp_f = top_v.reshape(B)
    valid_f = lvl_valid.reshape(B)

    dy, dx = _corner_subpix_3d(stack, lv_idx, ys_f, xs_f)
    blurred = _blur_batched(stack)
    patches = _gather_patches_3d(blurred, lv_idx, ys_f, xs_f, brief_ops.GATHER)
    ang = brief_ops.orientations_from_patches(patches)
    desc = brief_ops.descriptors_from_patches(patches, ang)

    scale = (cfg.scale_factor ** lv_idx.astype(jnp.float32))[:, None]
    uv = jnp.stack([xs_f.astype(jnp.float32) + dx, ys_f.astype(jnp.float32) + dy], -1) * scale

    # compact to n_features slots: valid first (per-level quotas sum to N)
    prio = valid_f.astype(jnp.float32) * 1e6 + resp_f
    _, sel = jax.lax.top_k(prio, cfg.n_features)
    return Features(
        uv=uv[sel],
        response=resp_f[sel],
        octave=lv_idx[sel],
        angle=ang[sel],
        desc=desc[sel],
        valid=valid_f[sel],
    )
