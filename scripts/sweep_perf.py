"""Throughput sweep over pipeline configurations on the real TPU.

One JSON line per variant: fps + ATE on the standard 8 s synthetic
EuRoC-scale sequence (odometry path, same method as bench.py — untimed
warmup pass, then a timed fresh run). Use to pick the config that closes
the 32 -> 40 fps gap without giving up accuracy; every variant change
recompiles the fused program (slam_step's cfg is jit-static), so the
compile cache (.jax_cache) makes re-sweeps cheap but the FIRST sweep
through the tunnel pays minutes per variant.

Usage:
    python scripts/sweep_perf.py              # default grid
    python scripts/sweep_perf.py quick        # chunk sweep only

Tunnel-variance note (BASELINE.md): bench-to-bench fps varies +-20% on the
shared tunnel; rank variants within one process run, not across sessions.
"""
import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import json


def main():
    os.makedirs("/root/repo/.jax_cache", exist_ok=True)
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from bench import build_world, run_pipeline
    from orbslam3_tpu.eval.metrics import ate_rmse
    from orbslam3_tpu.models.slam import SlamConfig

    quick = len(sys.argv) > 1 and sys.argv[1] == "quick"

    base = dict(use_imu=True, kf_max_frames=4, lost_timeout=5.0)
    # (name, cfg overrides, chunk)
    variants = [
        ("baseline c4", {}, 4),
        ("chunk 8", {}, 8),
        ("chunk 16", {}, 16),
    ]
    if not quick:
        variants += [
            ("kf every 6", {"kf_max_frames": 6}, 8),
            ("ba_iters 3", {"ba_iters": 3}, 8),
            ("ba_window 6", {"ba_window": 6}, 8),
            ("ba_points 1536", {"ba_points": 1536}, 8),
            ("lean kf6+it3+w6", {"kf_max_frames": 6, "ba_iters": 3,
                                 "ba_window": 6}, 8),
        ]

    world, times, frames, imu = build_world(8.0)
    gt_p, _ = world.gt_trajectory()
    results = []
    for name, over, chunk in variants:
        cfg = SlamConfig(**{**base, **over})
        # warmup pass compiles this variant's programs; second run is timed
        run_pipeline(world, times, frames, imu, cfg, chunk=chunk)
        slam, fps, _ = run_pipeline(world, times, frames, imu, cfg,
                                    chunk=chunk)
        _, ps, _ = slam.trajectory_arrays()
        row = {
            "variant": name,
            "chunk": chunk,
            **over,
            "fps": round(fps, 2),
            "ate_m": round(ate_rmse(ps, gt_p[: len(ps)]), 4),
            "n_kf": int(slam.map.n_kf),
        }
        results.append(row)
        print(json.dumps(row), flush=True)

    best = max(results, key=lambda r: r["fps"])
    print(json.dumps({"best": best["variant"], "fps": best["fps"],
                      "vs_target": round(best["fps"] / 40.0, 3)}))


if __name__ == "__main__":
    main()
