"""Sim3 estimation: weighted Horn closed form + batched-hypothesis RANSAC.

Capability parity with /root/reference/src/loop_closing/sim3_solver.rs:
Horn's absolute orientation (centroids -> SVD of cross-covariance ->
reflection fix -> t = c2 - sRc1; sim3_solver.rs:157-227) inside RANSAC —
but the reference's adaptive sequential loop becomes a fixed batch of
vmapped hypotheses + argmax (SURVEY.md §7.1 item 3).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from orbslam3_tpu.geometry import quat
from orbslam3_tpu.geometry.sim3 import Sim3
from orbslam3_tpu.utils.precision import matmul_hp as mm


def horn_weighted(pa, pb, w, fix_scale: bool = True) -> Sim3:
    """Closed-form S minimizing sum w_i ||pb_i - S(pa_i)||^2.

    pa, pb: (N, 3); w: (N,) nonnegative weights.
    """
    wsum = jnp.maximum(jnp.sum(w), 1e-9)
    ca = jnp.sum(pa * w[:, None], 0) / wsum
    cb = jnp.sum(pb * w[:, None], 0) / wsum
    xa = pa - ca
    xb = pb - cb
    cov = mm((xb * w[:, None]).T, xa) / wsum  # (3, 3) = sum w b a^T
    U, D, Vt = jnp.linalg.svd(cov)
    S = jnp.eye(3, dtype=cov.dtype)
    det = jnp.linalg.det(U) * jnp.linalg.det(Vt)
    S = S.at[2, 2].set(jnp.where(det < 0, -1.0, 1.0))
    R = mm(mm(U, S), Vt)
    if fix_scale:
        s = jnp.ones((), cov.dtype)
    else:
        var_a = jnp.sum(w[:, None] * xa * xa) / wsum
        s = jnp.sum(D * jnp.diag(S)) / jnp.maximum(var_a, 1e-9)
    t = cb - s * mm(R, ca)
    return Sim3(quat.from_matrix(R), t, s)


@partial(jax.jit, static_argnames=("n_hyp", "fix_scale"))
def sim3_ransac(
    pa,
    pb,
    valid,
    key,
    n_hyp: int = 256,
    inlier_thr: float = 0.2,
    fix_scale: bool = True,
):
    """RANSAC Sim3 from 3D-3D correspondences (pa -> pb).

    Returns (Sim3 best, inlier_mask (N,), n_inliers).
    (reference: compute_sim3_ransac, sim3_solver.rs:63 — 3-pt samples,
    inlier threshold, all-inlier refinement)
    """
    N = pa.shape[0]
    logits = jnp.where(valid, 0.0, -1e9)
    samples = jax.random.categorical(key, logits, shape=(n_hyp, 3))  # (H, 3)

    def hyp(sample):
        w = jnp.zeros((N,)).at[sample].add(1.0)
        return horn_weighted(pa, pb, w, fix_scale)

    Ss = jax.vmap(hyp)(samples)  # batched Sim3

    def count(S: Sim3):
        pred = S.apply(pa)
        err = jnp.linalg.norm(pred - pb, axis=-1)
        inl = (err < inlier_thr) & valid
        return jnp.sum(inl.astype(jnp.int32)), inl

    counts, inls = jax.vmap(count)(Ss)
    best = jnp.argmax(counts)
    S_best = jax.tree.map(lambda a: a[best], Ss)
    inl_best = inls[best]

    # refine on all inliers (weighted Horn), then re-classify
    S_ref = horn_weighted(pa, pb, inl_best.astype(jnp.float32), fix_scale)
    n_ref, inl_ref = count(S_ref)
    better = n_ref >= counts[best]
    S_out = jax.tree.map(lambda a, b: jnp.where(better, a, b), S_ref, S_best)
    inl_out = jnp.where(better, inl_ref, inl_best)
    return S_out, inl_out, jnp.sum(inl_out.astype(jnp.int32))


@partial(jax.jit, static_argnames=("n_hyp", "fix_scale"))
def sim3_ransac_reproj(
    pa,
    pb,
    uv_a,
    uv_b,
    sig_a,
    sig_b,
    valid,
    key,
    cam,
    n_hyp: int = 256,
    chi2: float = 9.21,
    fix_scale: bool = True,
):
    """RANSAC Sim3 scored by TWO-WAY pixel reprojection.

    Hypotheses come from Horn on 3-point 3D samples, but inliers are
    classified in PIXELS: S(pa_i) must reproject within a chi^2 gate of
    the observed uv_b_i in keyframe B, and S^-1(pb_i) within the gate of
    uv_a_i in A (reference: sim3_solver.rs check_inliers — the reference
    never thresholds 3D-3D distance, and for good reason: stereo depth
    error grows ~z^2/(f b) per pixel of disparity error, ~0.5 m at 5 m
    range, so any 3D threshold either rejects correct far matches or
    accepts everything nearby. Pixel error is depth-robust.)

    pa, pb: (N, 3) body-frame points in A resp. B; uv_a, uv_b: (N, 2)
    observed pixels of the matched features; sig_a, sig_b: (N,) pixel
    sigma (1.2^octave). Returns (Sim3 best, inlier_mask, n_inliers).
    """
    N = pa.shape[0]
    logits = jnp.where(valid, 0.0, -1e9)
    samples = jax.random.categorical(key, logits, shape=(n_hyp, 3))

    def hyp(sample):
        w = jnp.zeros((N,)).at[sample].add(1.0)
        return horn_weighted(pa, pb, w, fix_scale)

    Ss = jax.vmap(hyp)(samples)

    def count(S: Sim3):
        uv_b_pred, zb = cam.project_body(S.apply(pa))
        uv_a_pred, za = cam.project_body(S.inverse().apply(pb))
        e_b = jnp.sum((uv_b_pred - uv_b) ** 2, -1) / (sig_b * sig_b)
        e_a = jnp.sum((uv_a_pred - uv_a) ** 2, -1) / (sig_a * sig_a)
        inl = (e_b < chi2) & (e_a < chi2) & (za > 0.0) & (zb > 0.0) & valid
        return jnp.sum(inl.astype(jnp.int32)), inl

    counts, inls = jax.vmap(count)(Ss)
    best = jnp.argmax(counts)
    S_best = jax.tree.map(lambda a: a[best], Ss)
    inl_best = inls[best]

    S_ref = horn_weighted(pa, pb, inl_best.astype(jnp.float32), fix_scale)
    n_ref, inl_ref = count(S_ref)
    better = n_ref >= counts[best]
    S_out = jax.tree.map(lambda a, b: jnp.where(better, a, b), S_ref, S_best)
    inl_out = jnp.where(better, inl_ref, inl_best)
    return S_out, inl_out, jnp.sum(inl_out.astype(jnp.int32))
