"""Visual-inertial local bundle adjustment (15-dof keyframe states).

Capability parity with /root/reference/src/optimizer/local_inertial_ba.rs
(temporal-window BA: pose 6 + velocity 3 + gyro/accel bias 6 per keyframe,
visual edges + 9D IMU edges + bias random-walk edges, oldest keyframe
fixed) — with jacfwd-exact IMU Jacobians (the reference differentiates
numerically, local_inertial_ba.rs:806-884) and the same Schur-complement
point elimination as the visual solver (optim/local_ba.py): the reduced
camera system is (15C, 15C), still tiny for a temporal window.

Convention: the IMU edge stored on keyframe c preintegrates c-1 -> c.
Gravity is the world-frame vector from IMU initialization.
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from orbslam3_tpu.frontend.camera import Camera
from orbslam3_tpu.imu import preintegration as pre
from orbslam3_tpu.optim import robust
from orbslam3_tpu.optim.pose_only import _retract, _visual_residual
from orbslam3_tpu.utils.precision import matmul_hp as mm

D = 15  # per-keyframe state dim


class VIBAProblem(NamedTuple):
    q: jnp.ndarray  # (C, 4)
    p: jnp.ndarray  # (C, 3)
    v: jnp.ndarray  # (C, 3)
    bg: jnp.ndarray  # (C, 3)
    ba: jnp.ndarray  # (C, 3)
    opt_cam: jnp.ndarray  # (C,)
    cam_valid: jnp.ndarray  # (C,)
    Xw: jnp.ndarray  # (P, 3)
    pt_valid: jnp.ndarray  # (P,)
    obs_uv: jnp.ndarray  # (C, N, 2)
    obs_ur: jnp.ndarray  # (C, N)
    obs_oct: jnp.ndarray  # (C, N)
    obs_pt: jnp.ndarray  # (C, N)
    preint: pre.PreintState  # batched (C,) — edge c-1 -> c
    imu_edge_valid: jnp.ndarray  # (C,)
    gravity_w: jnp.ndarray  # (3,)


class VIBAResult(NamedTuple):
    q: jnp.ndarray
    p: jnp.ndarray
    v: jnp.ndarray
    bg: jnp.ndarray
    ba: jnp.ndarray
    Xw: jnp.ndarray
    cost0: jnp.ndarray
    cost1: jnp.ndarray


def _apply_delta(q, p, v, bg, ba, dx):
    """dx: (15,) = [pose 6, dv 3, dbg 3, dba 3]."""
    q2, p2 = _retract(q, p, dx[0:6])
    return q2, p2, v + dx[6:9], bg + dx[9:12], ba + dx[12:15]


@partial(jax.jit, static_argnames=("iters",))
def solve_vi_ba(prob: VIBAProblem, cam: Camera, iters: int = 8,
                init_damping: float = 1e-4,
                bias_walk_weight: float = 1e2) -> VIBAResult:
    C, N = prob.obs_pt.shape
    P = prob.Xw.shape[0]
    E = C * N

    e_cam = jnp.repeat(jnp.arange(C, dtype=jnp.int32), N)
    e_pt = prob.obs_pt.reshape(-1)
    e_uv = prob.obs_uv.reshape(E, 2)
    e_ur = prob.obs_ur.reshape(E)
    e_oct = prob.obs_oct.reshape(E)
    e_valid = (
        (e_pt >= 0) & prob.cam_valid[e_cam] & prob.pt_valid[jnp.clip(e_pt, 0, P - 1)]
    )
    e_pt_safe = jnp.where(e_valid, e_pt, 0)
    s2inv = robust.octave_sigma2_inv(e_oct)
    delta2 = jnp.where(e_ur >= 0, robust.CHI2_STEREO, robust.CHI2_MONO)
    cutoff_mults = jnp.maximum(16.0, 1e4 * 0.3 ** jnp.arange(iters, dtype=jnp.float32))

    # IMU edge whitening (same reference-state floor as pose_only.py)
    def edge_L(st):
        cov9 = st.cov[0:9, 0:9]
        cov9 = 0.5 * (cov9 + cov9.T) + jnp.diag(
            jnp.concatenate(
                [jnp.full(3, 5e-3**2), jnp.full(3, 0.05**2), jnp.full(3, 0.02**2)]
            )
        )
        return jnp.linalg.cholesky(jnp.linalg.inv(cov9) + jnp.eye(9) * 1e-8)

    Ls = jax.vmap(edge_L)(prob.preint)  # (C, 9, 9)
    imu_ok = prob.imu_edge_valid & (jnp.arange(C) >= 1)
    imu_ok = imu_ok & prob.cam_valid & jnp.roll(prob.cam_valid, 1)

    def vis_edge(xi, dxp, qc, pc, X0, uv, ur):
        q2, p2 = _retract(qc, pc, xi[0:6])
        return _visual_residual(jnp.zeros(6), q2, p2, cam, X0 + dxp, uv, ur)

    def imu_edge(xi_i, xi_j, c, q, p, v, bg, ba):
        """Whitened 9D preintegration residual between cams c-1 and c."""
        i = jnp.clip(c - 1, 0, C - 1)
        st = jax.tree.map(lambda a: a[c], prob.preint)
        L = Ls[c]
        qi, pi, vi, bgi, bai = _apply_delta(q[i], p[i], v[i], bg[i], ba[i], xi_i)
        qj, pj, vj, _, _ = _apply_delta(q[c], p[c], v[c], bg[c], ba[c], xi_j)
        # edge uses the bias of the OLDER keyframe (standard convention)
        r9 = pre.imu_residual(
            st, qi, vi, pi, qj, vj, pj, bgi, bai, gravity=prob.gravity_w
        )
        # info = L @ L.T, so the whitened residual is L.T @ r (then
        # ||w||^2 = r^T L L^T r = r^T info r) — matches pose_only.py
        return mm(L.T, r9)

    def bias_edge(xi_i, xi_j, c, bg, ba):
        i = jnp.clip(c - 1, 0, C - 1)
        bgi = bg[i] + xi_i[9:12]
        bai = ba[i] + xi_i[12:15]
        bgj = bg[c] + xi_j[9:12]
        baj = ba[c] + xi_j[12:15]
        return jnp.concatenate([bgj - bgi, baj - bai]) * jnp.sqrt(bias_walk_weight)

    zero15 = jnp.zeros(D, jnp.float32)
    zero3 = jnp.zeros(3, jnp.float32)

    def state_cost(q, p, v, bg, ba, Xw, cutoff_mult):
        qe, pe, Xe = q[e_cam], p[e_cam], Xw[e_pt_safe]
        r = jax.vmap(vis_edge, in_axes=(None, None, 0, 0, 0, 0, 0))(
            zero15, zero3, qe, pe, Xe, e_uv, e_ur
        )
        chi2 = jnp.sum(r * r, -1) * s2inv
        hub = jnp.where(
            chi2 <= delta2, chi2, 2.0 * jnp.sqrt(delta2 * jnp.maximum(chi2, 1e-12)) - delta2
        )
        cap = 2.0 * jnp.sqrt(delta2 * cutoff_mult * delta2) - delta2
        c_vis = jnp.sum(jnp.minimum(hub, cap) * e_valid)
        ri = jax.vmap(
            lambda c: imu_edge(zero15, zero15, c, q, p, v, bg, ba)
        )(jnp.arange(C))
        c_imu = jnp.sum(jnp.sum(ri * ri, -1) * imu_ok)
        rb = jax.vmap(lambda c: bias_edge(zero15, zero15, c, bg, ba))(jnp.arange(C))
        c_b = jnp.sum(jnp.sum(rb * rb, -1) * imu_ok)
        return c_vis + c_imu + c_b

    def gn_step(carry, cutoff_mult):
        q, p, v, bg, ba, Xw, damping, cost = carry
        cutoff2 = cutoff_mult * delta2

        # ---- visual residuals + jacobians
        qe, pe, Xe = q[e_cam], p[e_cam], Xw[e_pt_safe]
        r = jax.vmap(vis_edge, in_axes=(None, None, 0, 0, 0, 0, 0))(
            zero15, zero3, qe, pe, Xe, e_uv, e_ur
        )
        Jc = jax.vmap(jax.jacfwd(vis_edge, 0), in_axes=(None, None, 0, 0, 0, 0, 0))(
            zero15, zero3, qe, pe, Xe, e_uv, e_ur
        )  # (E, 3, 15)
        Jp = jax.vmap(jax.jacfwd(vis_edge, 1), in_axes=(None, None, 0, 0, 0, 0, 0))(
            zero15, zero3, qe, pe, Xe, e_uv, e_ur
        )  # (E, 3, 3)
        chi2 = jnp.sum(r * r, -1) * s2inv
        # visual part of the CURRENT cost from residuals already in hand
        # (the IMU/bias parts complete it below — saves re-running the full
        # residual stack just to price the current state)
        hub = jnp.where(
            chi2 <= delta2, chi2, 2.0 * jnp.sqrt(delta2 * jnp.maximum(chi2, 1e-12)) - delta2
        )
        hub_cap = 2.0 * jnp.sqrt(delta2 * cutoff2) - delta2
        old_cost_vis = jnp.sum(jnp.minimum(hub, hub_cap) * e_valid)
        w = (
            robust.huber_weight(chi2, delta2)
            * (chi2 <= cutoff2).astype(jnp.float32)
            * s2inv
            * e_valid
        )
        Jc = Jc * prob.opt_cam[e_cam].astype(jnp.float32)[:, None, None]
        Jc_w = Jc * w[:, None, None]
        Jp_w = Jp * w[:, None, None]

        Hcc = jnp.zeros((C, D, D)).at[e_cam].add(
            jnp.einsum("eij,eik->ejk", Jc_w, Jc, precision="highest")
        )
        bc = jnp.zeros((C, D)).at[e_cam].add(
            jnp.einsum("eij,ei->ej", Jc_w, r, precision="highest")
        )
        Hpp = jnp.zeros((P, 3, 3)).at[e_pt_safe].add(
            jnp.einsum("eij,eik->ejk", Jp_w, Jp, precision="highest")
        )
        bp = jnp.zeros((P, 3)).at[e_pt_safe].add(
            jnp.einsum("eij,ei->ej", Jp_w, r, precision="highest")
        )
        Wcp = jnp.einsum("eij,eik->ejk", Jc_w, Jp, precision="highest")
        Wstack = jnp.zeros((P, C, D, 3)).at[e_pt_safe, e_cam].add(Wcp)
        Wstack = Wstack.reshape(P, C * D, 3)

        pt_has = jnp.zeros((P,)).at[e_pt_safe].add(e_valid.astype(jnp.float32)) > 0
        # scale-relative damping keeps rank-deficient point blocks f32-invertible
        tr = (Hpp[:, 0, 0] + Hpp[:, 1, 1] + Hpp[:, 2, 2]) / 3.0
        Hpp_inv = jnp.linalg.inv(
            Hpp + jnp.eye(3)[None] * (damping + jnp.maximum(damping, 1e-5) * tr + 1e-6)[:, None, None]
        )
        Hpp_inv = jnp.where(pt_has[:, None, None], Hpp_inv, 0.0)

        Hcc_full = (
            jnp.zeros((C, D, C, D))
            .at[jnp.arange(C), :, jnp.arange(C), :]
            .set(Hcc)
            .reshape(C * D, C * D)
        )
        S = Hcc_full - jnp.einsum(
            "pik,pkl,pjl->ij", Wstack, Hpp_inv, Wstack, precision="highest"
        )
        b = bc.reshape(C * D) - jnp.einsum(
            "pik,pkl,pl->i", Wstack, Hpp_inv, bp, precision="highest"
        )

        # ---- IMU + bias edges straight into S (cam-cam blocks)
        cs = jnp.arange(C)
        ri = jax.vmap(lambda c: imu_edge(zero15, zero15, c, q, p, v, bg, ba))(cs)
        Ji = jax.vmap(lambda c: jax.jacfwd(imu_edge, 0)(zero15, zero15, c, q, p, v, bg, ba))(cs)
        Jj = jax.vmap(lambda c: jax.jacfwd(imu_edge, 1)(zero15, zero15, c, q, p, v, bg, ba))(cs)
        rb = jax.vmap(lambda c: bias_edge(zero15, zero15, c, bg, ba))(cs)
        Jbi = jax.vmap(lambda c: jax.jacfwd(bias_edge, 0)(zero15, zero15, c, bg, ba))(cs)
        Jbj = jax.vmap(lambda c: jax.jacfwd(bias_edge, 1)(zero15, zero15, c, bg, ba))(cs)

        wI = imu_ok.astype(jnp.float32)
        opt_i = prob.opt_cam[jnp.clip(cs - 1, 0, C - 1)].astype(jnp.float32)
        opt_j = prob.opt_cam.astype(jnp.float32)
        Ji = Ji * (wI * opt_i)[:, None, None]
        Jj = Jj * (wI * opt_j)[:, None, None]
        Jbi = Jbi * (wI * opt_i)[:, None, None]
        Jbj = Jbj * (wI * opt_j)[:, None, None]

        i_idx = jnp.clip(cs - 1, 0, C - 1)
        S = S.reshape(C, D, C, D)

        def add_block(S, ia, Ja, ib, Jb):
            blocks = jnp.einsum("eri,erj->eij", Ja, Jb, precision="highest")
            return S.at[ia, :, ib, :].add(blocks)

        for Ja, ia in [(Ji, i_idx), (Jj, cs)]:
            for Jb, ib in [(Ji, i_idx), (Jj, cs)]:
                S = add_block(S, ia, Ja, ib, Jb)
        for Ja, ia in [(Jbi, i_idx), (Jbj, cs)]:
            for Jb, ib in [(Jbi, i_idx), (Jbj, cs)]:
                S = add_block(S, ia, Ja, ib, Jb)
        S = S.reshape(C * D, C * D)

        b = b.reshape(C, D)
        b = b.at[i_idx].add(jnp.einsum("eri,er->ei", Ji, ri, precision="highest"))
        b = b.at[cs].add(jnp.einsum("eri,er->ei", Jj, ri, precision="highest"))
        b = b.at[i_idx].add(jnp.einsum("eri,er->ei", Jbi, rb, precision="highest"))
        b = b.at[cs].add(jnp.einsum("eri,er->ei", Jbj, rb, precision="highest"))
        b = b.reshape(C * D)

        # ---- gauge + solve
        free = (prob.opt_cam & prob.cam_valid).astype(jnp.float32)
        freeD = jnp.repeat(free, D)
        S = S * freeD[:, None] * freeD[None, :] + jnp.diag(1.0 - freeD)
        S = S + jnp.eye(C * D) * damping
        dscale = jnp.sqrt(jnp.clip(jnp.diag(S), 1e-8, None))
        dxc = -jnp.linalg.solve(S / dscale[:, None] / dscale[None, :], b / dscale) / dscale

        Wt_dxc = jnp.einsum("pik,i->pk", Wstack, dxc, precision="highest")
        dxp = -jnp.einsum("pkl,pl->pk", Hpp_inv, bp + Wt_dxc, precision="highest")

        dxc = dxc.reshape(C, D)
        q2, p2, v2, bg2, ba2 = jax.vmap(_apply_delta)(q, p, v, bg, ba, dxc)
        Xw2 = jnp.where((prob.pt_valid & pt_has)[:, None], Xw + dxp, Xw)

        old_cost = (
            old_cost_vis
            + jnp.sum(jnp.sum(ri * ri, -1) * imu_ok)
            + jnp.sum(jnp.sum(rb * rb, -1) * imu_ok)
        )
        new_cost = state_cost(q2, p2, v2, bg2, ba2, Xw2, cutoff_mult)
        accept = new_cost < old_cost
        pick = lambda a, b_: jax.tree.map(lambda x, y: jnp.where(accept, y, x), a, b_)
        q, p, v, bg, ba, Xw = pick((q, p, v, bg, ba, Xw), (q2, p2, v2, bg2, ba2, Xw2))
        damping = jnp.where(accept, jnp.maximum(damping * 0.5, 1e-6), damping * 4.0)
        return (q, p, v, bg, ba, Xw, damping, jnp.where(accept, new_cost, old_cost)), None

    cost0 = state_cost(prob.q, prob.p, prob.v, prob.bg, prob.ba, prob.Xw, jnp.float32(16.0))
    (q, p, v, bg, ba, Xw, _, cost1), _ = jax.lax.scan(
        gn_step,
        (prob.q, prob.p, prob.v, prob.bg, prob.ba, prob.Xw, jnp.float32(init_damping), cost0),
        cutoff_mults,
    )
    return VIBAResult(q, p, v, bg, ba, Xw, cost0, cost1)
