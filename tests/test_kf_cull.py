"""Broadened keyframe culling (reference local_mapper.rs:487-571): every
covisible keyframe is a cull candidate, so a hovering camera — which makes
almost every new keyframe redundant — keeps the keyframe count bounded
instead of accumulating one surviving KF per insertion."""
import jax.numpy as jnp
import numpy as np
import pytest

from orbslam3_tpu.frontend.orb import OrbConfig
from orbslam3_tpu.io.synthetic import SyntheticConfig, SyntheticWorld
from orbslam3_tpu.map.mapping_ops import select_cull_candidate
from orbslam3_tpu.map.slam_map import MapCapacity
from orbslam3_tpu.models.fused import MODE_OK, FusedSlam
from orbslam3_tpu.models.slam import SlamConfig
from orbslam3_tpu.models.tracker import TrackConfig


def test_select_cull_candidate_prefers_most_redundant():
    """Unit semantics on a hand-built map: the candidate must be covisible,
    non-root, non-newest, above threshold — and the MOST redundant one."""
    from orbslam3_tpu.geometry import quat
    from orbslam3_tpu.imu.preintegration import PreintState
    from orbslam3_tpu.map.slam_map import empty_map, insert_keyframe

    cap = MapCapacity(max_kf=8, n_feat=64, max_mp=512, max_obs=8)
    st = empty_map(cap)
    L = 48
    rng = np.random.default_rng(3)
    lm = np.stack(
        [rng.uniform(-3, 3, L), rng.uniform(-2, 2, L), np.full(L, 6.0)], -1
    ).astype(np.float32)
    desc = rng.integers(0, 256, (L, 32)).astype(np.uint8)

    def make_kf(p, matched, t, n_feat=L):
        xc = lm - p
        z = xc[:, 2]
        uv = np.stack([240 * xc[:, 0] / z + 192, 240 * xc[:, 1] / z + 128], -1)
        n = cap.n_feat
        mm = np.full(n, -1, np.int32)
        ok = np.zeros(n, bool)
        ok[:n_feat] = True
        if matched is not None:
            mm[:n_feat] = matched[:n_feat]
        return dict(
            time=jnp.float32(t), q_wb=quat.identity(), p_w=jnp.asarray(p),
            vel=jnp.zeros(3), bias_g=jnp.zeros(3), bias_a=jnp.zeros(3),
            uv=jnp.zeros((n, 2)).at[:L].set(jnp.asarray(uv.astype(np.float32))),
            u_right=jnp.full((n,), -1.0),
            depth=jnp.full((n,), -1.0).at[:L].set(jnp.asarray(z)),
            octave=jnp.zeros((n,), jnp.int32),
            desc=jnp.zeros((n, 32), jnp.uint8).at[:L].set(jnp.asarray(desc)),
            points_body=jnp.zeros((n, 3)).at[:L].set(jnp.asarray(xc)),
            feat_valid=jnp.asarray(ok),
            matched_mp=jnp.asarray(mm),
            preint=PreintState.identity(),
        )

    ids = np.arange(L, dtype=np.int32)
    p0 = np.zeros(3, np.float32)
    st, kid = insert_keyframe(st, **make_kf(p0, None, 0.0), prev_kf=-1,
                              new_mp_budget=64)
    # 4 more keyframes all observing the same wall -> every point has 5 obs
    for k in range(1, 5):
        st, kid = insert_keyframe(
            st, **make_kf(p0 + 0.05 * k, ids, 0.4 * k), prev_kf=kid,
            new_mp_budget=0,
        )
    cand = int(select_cull_candidate(st, jnp.int32(4), jnp.float32(0.9),
                                     jnp.float32(3.0)))
    # kf 0 is root (never culled); kf 4 is current; kf 1..3 are all fully
    # redundant -> a valid candidate among them must be returned
    assert cand in (1, 2, 3), cand
    # with an impossible threshold nothing qualifies
    none = int(select_cull_candidate(st, jnp.int32(4), jnp.float32(1.1),
                                     jnp.float32(3.0)))
    assert none == -1
    # with a zero max gap the preintegration-gap guard blocks every cull
    gap = int(select_cull_candidate(st, jnp.int32(4), jnp.float32(0.9),
                                    jnp.float32(0.1)))
    assert gap == -1


@pytest.mark.slow
def test_hover_bounds_keyframe_count():
    """A near-stationary (hover) sequence with forced frequent insertions
    must not accumulate keyframes: redundancy culling keeps the live count
    well under the insertion count (reference behavior: cull_keyframes
    removes >90%-redundant keyframes every local-mapping pass)."""
    cfg = SyntheticConfig(
        width=384, height=256, fx=240.0, fy=240.0, n_landmarks=500,
        duration=8.0, cam_hz=10.0,
        pos_amp=(0.08, 0.06, 0.03),  # centimeters of drift — a hover
        yaw_amp=0.05, rp_amp=0.02,
    )
    world = SyntheticWorld(cfg)
    slam_cfg = SlamConfig(
        orb=OrbConfig(n_features=384, n_levels=4),
        cap=MapCapacity(max_kf=64, n_feat=384, max_mp=8192, max_obs=8),
        track=TrackConfig(p_local=2048),
        ba_points=1024,
        use_imu=False,
        kf_max_frames=2,  # force a keyframe attempt every other frame
    )
    slam = FusedSlam(world.cam, slam_cfg, service_every=4)
    times = world.frame_times()
    for t in times:
        left, right = world.render_frame(t)
        slam.process_frame(left, right, np.zeros((0, 3)), np.zeros((0, 3)),
                           np.zeros(0), float(t))
    slam.flush()

    modes = slam.modes()
    assert (modes == MODE_OK).mean() > 0.9
    n_live = int(np.asarray(slam.map.kf_valid).sum())
    n_inserted = int(slam.map.n_kf)
    # ~40 insertion opportunities over 80 frames; a hover must stay compact
    assert n_live <= 16, (n_live, n_inserted)
    assert n_inserted > n_live, "culling never fired"
