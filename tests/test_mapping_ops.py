"""Fusion + keyframe-culling tests on constructed maps."""
import jax
import jax.numpy as jnp
import numpy as np

from orbslam3_tpu.frontend.camera import Camera
from orbslam3_tpu.geometry import quat
from orbslam3_tpu.imu import preintegration as pre
from orbslam3_tpu.imu.preintegration import PreintState
from orbslam3_tpu.map.mapping_ops import (
    fuse_map_points,
    keyframe_redundancy,
    remove_keyframe,
)
from orbslam3_tpu.map.slam_map import MapCapacity, empty_map, insert_keyframe

RNG = np.random.default_rng(41)
CAM = Camera.create(240.0, 240.0, 192.0, 128.0, 0.11, 384, 256)
CAP = MapCapacity(max_kf=8, n_feat=64, max_mp=512, max_obs=8)


def make_two_kf_map_with_duplicates():
    """KF0 creates landmarks; KF1 observes the SAME physical landmarks but
    creates its own duplicates (no matches passed)."""
    st = empty_map(CAP)
    L = 32
    lm = np.stack(
        [RNG.uniform(-2, 2, L), RNG.uniform(-1.5, 1.5, L), np.full(L, 5.0)], -1
    ).astype(np.float32)
    desc = RNG.integers(0, 256, (L, 32)).astype(np.uint8)

    def kf_inputs(p_w):
        xc = lm - p_w
        z = xc[:, 2]
        uv = np.stack([240 * xc[:, 0] / z + 192, 240 * xc[:, 1] / z + 128], -1)
        n = CAP.n_feat
        out = dict(
            time=jnp.float32(0.0), q_wb=quat.identity(), p_w=jnp.asarray(p_w),
            vel=jnp.zeros(3), bias_g=jnp.zeros(3), bias_a=jnp.zeros(3),
            uv=jnp.zeros((n, 2)).at[:L].set(jnp.asarray(uv.astype(np.float32))),
            u_right=jnp.full((n,), -1.0),
            depth=jnp.full((n,), -1.0).at[:L].set(jnp.asarray(z)),
            octave=jnp.zeros((n,), jnp.int32),
            desc=jnp.zeros((n, 32), jnp.uint8).at[:L].set(jnp.asarray(desc)),
            points_body=jnp.zeros((n, 3)).at[:L].set(jnp.asarray(xc)),
            feat_valid=jnp.zeros((n,), bool).at[:L].set(True),
            matched_mp=jnp.full((n,), -1, jnp.int32),
            preint=PreintState.identity(),
        )
        return out

    st, k0 = insert_keyframe(st, **kf_inputs(np.zeros(3, np.float32)),
                             prev_kf=jnp.int32(-1), new_mp_budget=64)
    st, k1 = insert_keyframe(st, **kf_inputs(np.array([0.3, 0, 0], np.float32)),
                             prev_kf=jnp.int32(0), new_mp_budget=64)
    # give them covisibility through a couple of shared associations so the
    # window finds the neighbor
    from orbslam3_tpu.map.slam_map import associate_batch

    st = associate_batch(
        st, jnp.int32(1), jnp.asarray([60, 61]), jnp.asarray([0, 1]),
        jnp.asarray([False, False]),
    )
    st = st._replace(covis=st.covis.at[0, 1].set(5).at[1, 0].set(5))
    return st, L


class TestFusion:
    def test_duplicates_removed(self):
        st, L = make_two_kf_map_with_duplicates()
        n_before = int(jnp.sum(st.mp_valid))
        assert n_before >= 2 * L - 2  # duplicates exist
        st2 = fuse_map_points(st, jnp.int32(1), CAM, window=3)
        n_after = int(jnp.sum(st2.mp_valid))
        # most duplicates fused away
        assert n_after < n_before - L // 2, (n_before, n_after)
        # surviving points gained second observations
        obs = np.asarray(st2.mp_obs_n)[np.asarray(st2.mp_valid)]
        assert (obs >= 2).mean() > 0.4

    def test_covisibility_grows(self):
        st, L = make_two_kf_map_with_duplicates()
        st2 = fuse_map_points(st, jnp.int32(1), CAM, window=3)
        assert int(st2.covis[0, 1]) > int(st.covis[0, 1])


class TestKeyframeCull:
    def test_remove_keyframe_repairs_chain_and_preint(self):
        st = empty_map(CAP)
        z3 = jnp.zeros(3)
        ins = lambda prev: dict(
            time=jnp.float32(0.0), q_wb=quat.identity(), p_w=z3, vel=z3,
            bias_g=z3, bias_a=z3, uv=jnp.zeros((64, 2)),
            u_right=jnp.full((64,), -1.0), depth=jnp.full((64,), -1.0),
            octave=jnp.zeros((64,), jnp.int32),
            desc=jnp.zeros((64, 32), jnp.uint8), points_body=jnp.zeros((64, 3)),
            feat_valid=jnp.zeros((64,), bool),
            matched_mp=jnp.full((64,), -1, jnp.int32),
            prev_kf=jnp.int32(prev),
        )
        # three keyframes with distinct preintegrations
        gyro = jnp.tile(jnp.asarray([[0.1, 0.0, 0.0]]), (20, 1))
        acc = jnp.tile(jnp.asarray([[0.0, 0.0, 9.81]]), (20, 1))
        dts = jnp.full((20,), 0.01)
        m = jnp.ones((20,), bool)
        p1 = pre.integrate(gyro, acc, dts, m, z3, z3)
        p2 = pre.integrate(2 * gyro, acc, dts, m, z3, z3)
        st, _ = insert_keyframe(st, **ins(-1), preint=PreintState.identity(), new_mp_budget=0)
        st, _ = insert_keyframe(st, **ins(0), preint=p1, new_mp_budget=0)
        st, _ = insert_keyframe(st, **ins(1), preint=p2, new_mp_budget=0)

        st2 = remove_keyframe(st, jnp.int32(1))
        assert not bool(st2.kf_valid[1])
        assert int(st2.kf_prev[2]) == 0
        # merged preintegration spans both intervals
        merged = jax.tree.map(lambda a: a[2], st2.kf_preint)
        expected = pre.merge(p1, p2)
        np.testing.assert_allclose(np.asarray(merged.dt), 0.4, atol=1e-6)
        np.testing.assert_allclose(
            np.asarray(merged.dq), np.asarray(expected.dq), atol=1e-6
        )

    def test_redundancy_metric(self):
        st, L = make_two_kf_map_with_duplicates()
        st2 = fuse_map_points(st, jnp.int32(1), CAM, window=3)
        r0 = float(keyframe_redundancy(st2, jnp.int32(0), min_other_obs=1))
        assert 0.0 <= r0 <= 1.0


class TestPointStats:
    def test_medoid_and_normal_update(self):
        """update_point_stats must match a numpy reference: min-max-Hamming
        medoid descriptor (map.rs:880-944) and mean-ray normal + depth
        bounds (map_point.rs:173-203)."""
        from orbslam3_tpu.map.mapping_ops import update_point_stats
        from tests.test_map import make_kf_inputs

        st = empty_map(MapCapacity(max_kf=8, n_feat=32, max_mp=128, max_obs=8))
        # 3 keyframes at different positions observing shared points
        for k, px in enumerate([0.0, 0.4, 0.8]):
            inputs = make_kf_inputs(seed=k)
            inputs["p_w"] = jnp.asarray([px, 0.0, 0.0])
            inputs["prev_kf"] = jnp.int32(k - 1)
            if k > 0:
                m = np.full(32, -1, np.int32)
                m[:8] = np.arange(8)
                inputs["matched_mp"] = jnp.asarray(m)
            st, _ = insert_keyframe(st, **inputs, new_mp_budget=16)

        st2 = update_point_stats(st, jnp.int32(2))

        # numpy reference for point 0 (observed by kf0 feat0, kf1 f0, kf2 f0)
        obs_kf = np.asarray(st.mp_obs_kf[0])
        obs_ft = np.asarray(st.mp_obs_feat[0])
        sel = obs_kf >= 0
        descs = np.stack(
            [np.asarray(st.kf_desc[k_][f_]) for k_, f_ in zip(obs_kf[sel], obs_ft[sel])]
        )
        n_obs = len(descs)
        assert n_obs == 3
        bits = np.unpackbits(descs, axis=-1)
        dd = (bits[:, None] != bits[None, :]).sum(-1)
        maxd = np.where(np.eye(n_obs, dtype=bool), 0, dd).max(1)
        medoid = descs[maxd.argmin()]
        np.testing.assert_array_equal(np.asarray(st2.mp_desc[0]), medoid)

        # normal: normalized sum of unit rays from observer positions
        pos = np.asarray(st.mp_pos[0])
        kps = np.stack([np.asarray(st.kf_p[k_]) for k_ in obs_kf[sel]])
        rays = pos[None] - kps
        units = rays / np.linalg.norm(rays, axis=-1, keepdims=True)
        nref = units.sum(0)
        nref /= np.linalg.norm(nref)
        np.testing.assert_allclose(np.asarray(st2.mp_normal[0]), nref, atol=1e-5)

        dists = np.linalg.norm(rays, axis=-1)
        np.testing.assert_allclose(
            float(st2.mp_min_dist[0]), dists.min() / 1.2**7, rtol=1e-5
        )
        np.testing.assert_allclose(
            float(st2.mp_max_dist[0]), dists.max() * 1.2**7, rtol=1e-5
        )

    def test_untouched_points_unchanged(self):
        from orbslam3_tpu.map.mapping_ops import update_point_stats
        from tests.test_map import make_kf_inputs

        st = empty_map(MapCapacity(max_kf=8, n_feat=32, max_mp=128, max_obs=8))
        st, _ = insert_keyframe(st, **make_kf_inputs(seed=0), new_mp_budget=16)
        inputs = make_kf_inputs(seed=1)
        inputs["prev_kf"] = jnp.int32(0)
        st, _ = insert_keyframe(st, **inputs, new_mp_budget=16)
        # kf1 matched nothing -> updating around kf1 touches only ITS points
        st2 = update_point_stats(st, jnp.int32(1))
        np.testing.assert_array_equal(
            np.asarray(st2.mp_desc[:16]), np.asarray(st.mp_desc[:16])
        )
