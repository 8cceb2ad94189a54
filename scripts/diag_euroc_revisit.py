"""Debug the EuRoC-format revisit fixture run (CPU): per-frame mode /
inliers / velocity / position-error profile to localize divergence."""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "scripts"))
os.environ.pop("JAX_PLATFORMS", None)
import jax
jax.config.update("jax_platforms", "cpu")

import numpy as np
import jax.numpy as jnp

from make_euroc_fixture import write_fixture
from orbslam3_tpu.eval.metrics import ate_rmse
from orbslam3_tpu.io.euroc import EurocDataset
from orbslam3_tpu.io.rectify import (body_from_rect_cam, remap_bilinear,
                                     stereo_rectify_maps)
from orbslam3_tpu.frontend.camera import Camera
from orbslam3_tpu.frontend.orb import OrbConfig
from orbslam3_tpu.map.slam_map import MapCapacity
from orbslam3_tpu.models.fused import FusedSlam
from orbslam3_tpu.models.slam import SlamConfig
from orbslam3_tpu.models.tracker import TrackConfig

FIX = "/tmp/euroc_revisit_fix"
if not os.path.exists(os.path.join(FIX, "mav0")):
    write_fixture(FIX, duration=24.0, hz=10.0, scale=0.5, seed=7,
                  revisit=True)
    print("# fixture written", flush=True)

ds = EurocDataset(FIX)
w, h = ds.cam0.resolution
maps = stereo_rectify_maps(ds.cam0.K, ds.cam0.dist, ds.cam0.T_BS,
                           ds.cam1.K, ds.cam1.dist, ds.cam1.T_BS, (w, h))
Kn = maps.K_new
q_bc, p_bc = body_from_rect_cam(ds.cam0.T_BS, maps.R_rect0)
cam = Camera.create(Kn[0, 0], Kn[1, 1], Kn[0, 2], Kn[1, 2], maps.baseline,
                    w, h, q_bc=q_bc, p_bc=p_bc)
slam_cfg = SlamConfig(
    orb=OrbConfig(n_features=384, n_levels=4),
    cap=MapCapacity(max_kf=64, n_feat=384, max_mp=8192, max_obs=8),
    track=TrackConfig(p_local=2048),
    ba_points=1024, kf_max_frames=4, imu_init_kfs=8,
    imu_noise=ds.imu_calib.noise, lost_timeout=5.0,
)
VOC = "/tmp/euroc_fix_voc.txt"
vocab = None
if os.path.exists(VOC) and "--loop" in sys.argv:
    from orbslam3_tpu.loop.vocab import load_dbow2_text
    vocab = load_dbow2_text(VOC)
    print("# vocab loaded", flush=True)
from orbslam3_tpu.loop.closer import LoopConfig
slam = FusedSlam(cam, slam_cfg, vocabulary=vocab, warmup=vocab is not None,
                 loop_cfg=LoopConfig(bow_min_score_gate=False))

if slam.loop_closer is not None:
    lc = slam.loop_closer
    orig_correct = lc._correct
    orig_merge = lc._merge_maps

    def log_correct(st, kf_id, cand, S_rel, cam_, record=True):
        from orbslam3_tpu.geometry.sim3 import Sim3 as S3
        T_cand = S3(st.kf_q[cand], st.kf_p[cand], jnp.ones(()))
        T_cur = S3(st.kf_q[kf_id], st.kf_p[kf_id], jnp.ones(()))
        T_corr = T_cand.compose(S_rel).compose(T_cur.inverse())
        seam = float(np.linalg.norm(
            np.asarray(jax.device_get(T_corr.apply(st.kf_p[kf_id])))
            - np.asarray(st.kf_p[kf_id])))
        print(f"# CORRECT kf={int(kf_id)}(t={float(st.kf_time[kf_id]):.2f}) "
              f"cand={int(cand)}(t={float(st.kf_time[cand]):.2f}) "
              f"seam={seam:.2f}m", flush=True)
        return orig_correct(st, kf_id, cand, S_rel, cam_, record=record)

    def log_merge(st, kf_id, cand, S_rel):
        print(f"# MERGE kf={int(kf_id)} cand={int(cand)}", flush=True)
        return orig_merge(st, kf_id, cand, S_rel)

    lc._correct = log_correct
    lc._merge_maps = log_merge
mx0, my0 = jnp.asarray(maps.map_x0), jnp.asarray(maps.map_y0)
mx1, my1 = jnp.asarray(maps.map_x1), jnp.asarray(maps.map_y1)

n = len(ds)
for i in range(n):
    t = ds.frame_time(i)
    t_prev = ds.frame_time(i - 1) if i > 0 else t
    left, right = ds.stereo_pair(i)
    g, a, d = ds.imu_between(t_prev, t)
    lr = np.asarray(remap_bilinear(jnp.asarray(left, jnp.float32), mx0, my0), np.uint8)
    rr = np.asarray(remap_bilinear(jnp.asarray(right, jnp.float32), mx1, my1), np.uint8)
    slam.process_frame(lr, rr, g, a, d, t)
slam.finalize()

ts_, outs, _ = slam._flat_outs()
gt = ds.groundtruth_at_frames()
_, ps, _ = slam.trajectory_arrays(corrected=False)
_, pc, _ = slam.trajectory_arrays(corrected=True)
t0 = ds.frame_time(0)
for i in range(0, len(outs), 5):
    o = outs[i]
    v = np.linalg.norm(np.asarray(o.v))
    err = np.linalg.norm(ps[i] - ps[0] - (gt[i] - gt[0]))
    errc = np.linalg.norm(pc[i] - pc[0] - (gt[i] - gt[0]))
    print(f"f{i:3d} t={ts_[i]-t0:6.2f} mode={int(o.mode)} m={int(o.n_matches):4d} "
          f"in={int(o.n_inliers):4d} nf={int(o.n_features):4d} st={int(o.n_stereo):4d} "
          f"|v|={v:7.2f} kf={int(o.is_kf)} err={err:8.2f} errc={errc:8.2f}")
print("imu_init:", slam.imu_initialized, "n_kf:", int(slam.map.n_kf),
      "maps:", int(slam.map.next_map_id))
if slam.loop_closer is not None:
    print("stats:", slam.loop_closer.stats)
print("ATE raw:", ate_rmse(ps - ps[0], gt[:len(ps)]),
      "cor:", ate_rmse(pc - pc[0], gt[:len(pc)]))
