"""Run the SLAM pipeline on a real EuRoC sequence (when data is available).

Usage: python scripts/run_euroc.py /path/to/MH_01_easy [outdir]

Uses the native C++ prefetcher when built (make -C native), PIL otherwise.
Prints ATE vs the sequence ground truth and exports a TUM trajectory.

Frames are undistorted + stereo-rectified (io/rectify.py) before the SLAM
pipeline — unlike the reference, which feeds raw distorted EuRoC frames
(euroc.rs loads images as-is).
"""
import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import json

import numpy as np


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from orbslam3_tpu.eval.metrics import ate_rmse
    from orbslam3_tpu.frontend.camera import Camera
    from orbslam3_tpu.io import native
    from orbslam3_tpu.io.euroc import EurocDataset
    from orbslam3_tpu.models.fused import FusedSlam
    from orbslam3_tpu.models.slam import SlamConfig
    from orbslam3_tpu.viz.export import save_trajectory_tum

    if len(sys.argv) < 2:
        print("usage: run_euroc.py <sequence_dir> [outdir]")
        return 1
    ds = EurocDataset(sys.argv[1])
    outdir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/orbslam3_tpu_euroc"
    os.makedirs(outdir, exist_ok=True)

    import jax.numpy as jnp

    from orbslam3_tpu.io.rectify import (
        body_from_rect_cam,
        remap_bilinear,
        stereo_rectify_maps,
    )

    w, h = ds.cam0.resolution
    maps = stereo_rectify_maps(
        ds.cam0.K, ds.cam0.dist, ds.cam0.T_BS,
        ds.cam1.K, ds.cam1.dist, ds.cam1.T_BS, (w, h),
    )
    Kn = maps.K_new
    # body-IMU extrinsics for the rectified camera: states stay body-frame,
    # raw body-frame IMU feeds the pipeline directly
    q_bc, p_bc = body_from_rect_cam(ds.cam0.T_BS, maps.R_rect0)
    cam = Camera.create(Kn[0, 0], Kn[1, 1], Kn[0, 2], Kn[1, 2], maps.baseline, w, h,
                        q_bc=q_bc, p_bc=p_bc)
    slam = FusedSlam(cam, SlamConfig(kf_max_frames=6))
    mx0, my0 = jnp.asarray(maps.map_x0), jnp.asarray(maps.map_y0)
    mx1, my1 = jnp.asarray(maps.map_x1), jnp.asarray(maps.map_y1)

    prefetch = None
    if native.available():
        paths = [
            os.path.join(ds.root, "cam0", "data", f) for f in ds.image_files
        ]
        prefetch = native.ImagePrefetcher(paths, w, h, threads=3)

    n = len(ds)
    for i in range(n):
        t = ds.frame_time(i)
        t_prev = ds.frame_time(i - 1) if i > 0 else t
        if prefetch is not None:
            left = prefetch.get(i)
            _, right = ds.stereo_pair(i)
        else:
            left, right = ds.stereo_pair(i)
        g, a, d = ds.imu_between(t_prev, t)
        left_r = np.asarray(remap_bilinear(jnp.asarray(left, jnp.float32), mx0, my0), np.uint8)
        right_r = np.asarray(remap_bilinear(jnp.asarray(right, jnp.float32), mx1, my1), np.uint8)
        slam.process_frame(left_r, right_r, g, a, d, t)
        if i % 100 == 0:
            print(f"frame {i}/{n}")

    ts, ps, qs = slam.trajectory_arrays()
    save_trajectory_tum(os.path.join(outdir, "trajectory.tum"), ts, ps, qs)
    gt = ds.groundtruth_at_frames()
    result = {
        "frames": n,
        "keyframes": int(slam.map.n_kf),
        "imu_initialized": slam.imu_initialized,
        "outdir": outdir,
    }
    if gt is not None:
        result["ate_m"] = round(ate_rmse(ps - ps[0], gt[: len(ps)]), 4)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
