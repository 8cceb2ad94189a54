"""Run the full SLAM pipeline on a synthetic sequence and export artifacts.

Usage: python scripts/run_synthetic.py [seconds] [outdir]
Exports TUM trajectory, ground truth, and a PLY map; prints ATE/RPE.
"""
import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import json

import numpy as np


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from orbslam3_tpu.eval.metrics import ate_rmse, rpe_rmse
    from orbslam3_tpu.io.synthetic import SyntheticConfig, SyntheticWorld
    from orbslam3_tpu.map.checkpoint import save_map
    from orbslam3_tpu.models.fused import FusedSlam
    from orbslam3_tpu.models.slam import SlamConfig
    from orbslam3_tpu.viz.export import save_map_ply, save_trajectory_tum

    seconds = float(sys.argv[1]) if len(sys.argv) > 1 else 6.0
    outdir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/orbslam3_tpu_run"
    os.makedirs(outdir, exist_ok=True)

    world = SyntheticWorld(SyntheticConfig(duration=seconds))
    slam = FusedSlam(world.cam, SlamConfig(kf_max_frames=4))
    times = world.frame_times()
    for i, t in enumerate(times):
        left, right = world.render_frame(t)
        t_prev = times[i - 1] if i > 0 else t
        g, a, d = world.imu_window(t_prev, t)
        slam.process_frame(left.astype(np.uint8), right.astype(np.uint8), g, a, d, float(t))

    ts, ps, qs = slam.trajectory_arrays()
    gt_p, gt_q = world.gt_trajectory()
    save_trajectory_tum(os.path.join(outdir, "trajectory.tum"), ts, ps, qs)
    save_trajectory_tum(os.path.join(outdir, "groundtruth.tum"), times, gt_p, gt_q)
    save_map_ply(os.path.join(outdir, "map.ply"), slam.map)
    save_map(os.path.join(outdir, "checkpoint.npz"), slam.map, slam.ts)

    print(json.dumps({
        "frames": len(times),
        "keyframes": int(slam.map.n_kf),
        "map_points": int(np.asarray(slam.map.mp_valid).sum()),
        "imu_initialized": slam.imu_initialized,
        "ate_m": round(ate_rmse(ps, gt_p[: len(ps)]), 4),
        "rpe_m": round(
            rpe_rmse(ps, gt_p[: len(ps)], qs, gt_q[: len(ps)])[0], 4
        ),
        "outdir": outdir,
    }))


if __name__ == "__main__":
    main()
