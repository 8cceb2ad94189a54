"""Map compaction: reclaim rows of culled keyframes / map points.

The reference map is unbounded (map.rs:30-41 HashMaps grow forever); the
SoA map (slam_map.py) is fixed-capacity with rows never reused — culling
only flips validity masks, so a long sequence exhausts capacity even when
the live map is small (SURVEY §7.3-1 names mask+compaction as THE hard
part of the dynamic-map-on-static-shapes design).

`compact_map` stable-partitions valid rows to the front of every array and
remaps every index column (kf_mp values, mp_obs_kf, kf_prev, mp_first_kf,
covisibility rows/cols) in ONE jitted program. Row ids stay monotonic in
insertion order (stable partition), preserving the "earlier id == older
keyframe" invariant the loop detector relies on. Hosts must remap any
keyframe ids they hold (TrackState.last_kf, LoopCloser.bow rows) using the
returned old->new tables.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from orbslam3_tpu.map.slam_map import MapState


@jax.jit
def compact_map(st: MapState):
    """Stable-compact keyframe and map-point rows.

    Returns (MapState, kf_old_to_new (K,) int32, mp_old_to_new (M,) int32)
    where invalid old rows map to -1. After the call, rows [n_kf:] / [n_mp:]
    are pristine free slots and n_kf/n_mp equal the live counts.
    """
    K, N = st.kf_mp.shape
    M, O = st.mp_obs_kf.shape

    # stable partition orders: valid rows first, original order preserved
    kf_order = jnp.argsort(
        jnp.where(st.kf_valid, jnp.arange(K), K + jnp.arange(K))
    )
    mp_order = jnp.argsort(
        jnp.where(st.mp_valid, jnp.arange(M), M + jnp.arange(M))
    )
    kf_map = jnp.where(
        st.kf_valid, jnp.cumsum(st.kf_valid.astype(jnp.int32)) - 1, -1
    )
    mp_map = jnp.where(
        st.mp_valid, jnp.cumsum(st.mp_valid.astype(jnp.int32)) - 1, -1
    )
    n_kf = jnp.sum(st.kf_valid.astype(jnp.int32))
    n_mp = jnp.sum(st.mp_valid.astype(jnp.int32))

    live_kf = st.kf_valid[kf_order]  # (K,) True for rows < n_kf
    live_mp = st.mp_valid[mp_order]

    def remap_kf_ids(a):
        return jnp.where(a >= 0, kf_map[jnp.clip(a, 0, K - 1)], -1)

    def remap_mp_ids(a):
        return jnp.where(a >= 0, mp_map[jnp.clip(a, 0, M - 1)], -1)

    def gk(a, fill=None):
        """Gather keyframe-axis array; reset freed rows to `fill`."""
        out = a[kf_order]
        if fill is not None:
            mask = live_kf.reshape((K,) + (1,) * (out.ndim - 1))
            out = jnp.where(mask, out, fill)
        return out

    def gm(a, fill=None):
        out = a[mp_order]
        if fill is not None:
            mask = live_mp.reshape((M,) + (1,) * (out.ndim - 1))
            out = jnp.where(mask, out, fill)
        return out

    covis = st.covis[kf_order][:, kf_order]
    covis = jnp.where(live_kf[:, None] & live_kf[None, :], covis, 0)

    st = st._replace(
        kf_q=gk(st.kf_q),
        kf_p=gk(st.kf_p),
        kf_v=gk(st.kf_v),
        kf_bg=gk(st.kf_bg),
        kf_ba=gk(st.kf_ba),
        kf_time=gk(st.kf_time),
        kf_valid=live_kf,
        kf_map_id=gk(st.kf_map_id, -1),
        kf_prev=gk(remap_kf_ids(st.kf_prev), -1),
        kf_inliers=gk(st.kf_inliers, 0),
        kf_uv=gk(st.kf_uv),
        kf_ur=gk(st.kf_ur),
        kf_depth=gk(st.kf_depth),
        kf_octave=gk(st.kf_octave),
        kf_desc=gk(st.kf_desc),
        kf_mp=gk(remap_mp_ids(st.kf_mp), -1),
        kf_feat_valid=gk(st.kf_feat_valid, False),
        kf_preint=jax.tree.map(lambda a: a[kf_order], st.kf_preint),
        mp_pos=gm(st.mp_pos),
        mp_desc=gm(st.mp_desc),
        mp_normal=gm(st.mp_normal),
        mp_min_dist=gm(st.mp_min_dist),
        mp_max_dist=gm(st.mp_max_dist),
        mp_valid=live_mp,
        mp_map_id=gm(st.mp_map_id, -1),
        mp_first_kf=gm(remap_kf_ids(st.mp_first_kf), -1),
        mp_visible=gm(st.mp_visible, 1),
        mp_found=gm(st.mp_found, 1),
        mp_obs_kf=gm(remap_kf_ids(st.mp_obs_kf), -1),
        mp_obs_feat=gm(st.mp_obs_feat, -1),
        mp_obs_n=gm(st.mp_obs_n, 0),
        covis=covis,
        n_kf=n_kf,
        n_mp=n_mp,
    )
    return st, kf_map, mp_map


def concat_maps(a: MapState, b: MapState):
    """Concatenate two SoA maps into one state (multi-session welding).

    Both are compacted first; b's rows land at offsets [n_kf_a, n_mp_a) with
    every index column shifted and b's atlas map ids relabeled past a's
    `next_map_id`, so the result is a valid multi-map Atlas state whose
    maps can then be folded together by the cross-map loop-closing path
    (loop/closer.py::_merge_maps). Host-driven (concrete offsets) — session
    merging is a rare offline operation, not a per-frame program.

    Returns (MapState, kf_offset, mp_offset): b's old row i is now
    kf_offset + i / mp_offset + i.

    No reference analog: the reference is single-process single-sequence
    (SURVEY §2.3); multi-session merging follows the ORB-SLAM3 Atlas paper.
    """
    a, _, _ = compact_map(a)
    b, _, _ = compact_map(b)
    K, N = a.kf_mp.shape
    M, O = a.mp_obs_kf.shape
    if b.kf_mp.shape != (K, N) or b.mp_obs_kf.shape != (M, O):
        raise ValueError("concat_maps requires identical capacities")
    na, nma = int(a.n_kf), int(a.n_mp)
    nb, nmb = int(b.n_kf), int(b.n_mp)
    if na + nb > K or nma + nmb > M:
        raise ValueError(
            f"merged map exceeds capacity: {na}+{nb} kfs (cap {K}), "
            f"{nma}+{nmb} points (cap {M})"
        )
    mofs = int(a.next_map_id)

    kf_rows = jnp.arange(na, na + nb)
    mp_rows = jnp.arange(nma, nma + nmb)

    def put_kf(xa, xb, shift=None):
        rows = xb[:nb] if shift is None else shift(xb[:nb])
        return xa.at[kf_rows].set(rows)

    def put_mp(xa, xb, shift=None):
        rows = xb[:nmb] if shift is None else shift(xb[:nmb])
        return xa.at[mp_rows].set(rows)

    sh_kf = lambda x: jnp.where(x >= 0, x + na, -1)
    sh_mp = lambda x: jnp.where(x >= 0, x + nma, -1)
    sh_map = lambda x: jnp.where(x >= 0, x + mofs, -1)

    covis = a.covis.at[na:na + nb, na:na + nb].set(b.covis[:nb, :nb])

    return a._replace(
        kf_q=put_kf(a.kf_q, b.kf_q),
        kf_p=put_kf(a.kf_p, b.kf_p),
        kf_v=put_kf(a.kf_v, b.kf_v),
        kf_bg=put_kf(a.kf_bg, b.kf_bg),
        kf_ba=put_kf(a.kf_ba, b.kf_ba),
        kf_time=put_kf(a.kf_time, b.kf_time),
        kf_valid=put_kf(a.kf_valid, b.kf_valid),
        kf_map_id=put_kf(a.kf_map_id, b.kf_map_id, sh_map),
        kf_prev=put_kf(a.kf_prev, b.kf_prev, sh_kf),
        kf_inliers=put_kf(a.kf_inliers, b.kf_inliers),
        kf_uv=put_kf(a.kf_uv, b.kf_uv),
        kf_ur=put_kf(a.kf_ur, b.kf_ur),
        kf_depth=put_kf(a.kf_depth, b.kf_depth),
        kf_octave=put_kf(a.kf_octave, b.kf_octave),
        kf_desc=put_kf(a.kf_desc, b.kf_desc),
        kf_mp=put_kf(a.kf_mp, b.kf_mp, sh_mp),
        kf_feat_valid=put_kf(a.kf_feat_valid, b.kf_feat_valid),
        kf_preint=jax.tree.map(
            lambda xa, xb: xa.at[kf_rows].set(xb[:nb]), a.kf_preint, b.kf_preint
        ),
        mp_pos=put_mp(a.mp_pos, b.mp_pos),
        mp_desc=put_mp(a.mp_desc, b.mp_desc),
        mp_normal=put_mp(a.mp_normal, b.mp_normal),
        mp_min_dist=put_mp(a.mp_min_dist, b.mp_min_dist),
        mp_max_dist=put_mp(a.mp_max_dist, b.mp_max_dist),
        mp_valid=put_mp(a.mp_valid, b.mp_valid),
        mp_map_id=put_mp(a.mp_map_id, b.mp_map_id, sh_map),
        mp_first_kf=put_mp(a.mp_first_kf, b.mp_first_kf, sh_kf),
        mp_visible=put_mp(a.mp_visible, b.mp_visible),
        mp_found=put_mp(a.mp_found, b.mp_found),
        mp_obs_kf=put_mp(a.mp_obs_kf, b.mp_obs_kf, sh_kf),
        mp_obs_feat=put_mp(a.mp_obs_feat, b.mp_obs_feat),
        mp_obs_n=put_mp(a.mp_obs_n, b.mp_obs_n),
        covis=covis,
        n_kf=jnp.int32(na + nb),
        n_mp=jnp.int32(nma + nmb),
        active_map=b.active_map + mofs,
        next_map_id=b.next_map_id + mofs,
        n_obs_dropped=a.n_obs_dropped + b.n_obs_dropped,
    ), na, nma
