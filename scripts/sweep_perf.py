"""Accuracy-first sweep over pipeline configurations on the real TPU.

Round-3's sweep optimized fps past an already-met 40-fps target and paid
2x ATE for it (VERDICT r3 weak #2: MFU 0.21% — compute for accuracy is
free). This sweep inverts the objective: minimize ATE on the ADVERSARIAL
textured 8 s sequence subject to fps >= 40 (the 2x-real-time bar), using
the idle chip on more features / BA iterations / wider windows.

One JSON line per variant (fps + ATE + RPE, method identical to
bench.py: untimed warmup pass, then a timed fresh run). Every variant
change recompiles the fused program (slam_step's cfg is jit-static); the
compile cache (.jax_cache) makes re-sweeps cheap but the FIRST sweep
through the tunnel pays minutes per variant.

Usage:
    python scripts/sweep_perf.py              # default grid
    python scripts/sweep_perf.py quick        # 3 variants only

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
    from orbslam3_tpu.eval.metrics import ate_rmse, rpe_rmse
    from orbslam3_tpu.frontend.orb import OrbConfig
    from orbslam3_tpu.models.slam import SlamConfig

    quick = len(sys.argv) > 1 and sys.argv[1] == "quick"

    base = dict(use_imu=True, kf_max_frames=6, ba_iters=3, ba_window=6,
                lost_timeout=5.0)
    feat1280 = OrbConfig(n_features=1280)
    # (name, cfg overrides, chunk)
    variants = [
        ("r3 production", {}, 8),
        ("it5 w10", {"ba_iters": 5, "ba_window": 10}, 8),
        ("feat1280 it5 w10", {"orb": feat1280, "ba_iters": 5,
                              "ba_window": 10}, 8),
    ]
    if not quick:
        variants += [
            ("it5", {"ba_iters": 5}, 8),
            ("w10", {"ba_window": 10}, 8),
            ("feat1280", {"orb": feat1280}, 8),
            ("kf4 it5 w10", {"kf_max_frames": 4, "ba_iters": 5,
                             "ba_window": 10}, 8),
            ("feat1280 kf4 it5 w10", {"orb": feat1280, "kf_max_frames": 4,
                                      "ba_iters": 5, "ba_window": 10}, 8),
            ("feat1280 it5 w10 mp512", {"orb": feat1280, "ba_iters": 5,
                                        "ba_window": 10,
                                        "new_mp_budget": 512}, 8),
        ]

    world, times, frames, imu = build_world(8.0)
    gt_p, gt_q = world.gt_trajectory()
    results = []
    for name, over, chunk in variants:
        cfg = SlamConfig(**{**base, **over})
        # warmup pass compiles this variant's programs; second run is timed
        run_pipeline(world, times, frames, imu, cfg, chunk=chunk)
        slam, fps, _ = run_pipeline(world, times, frames, imu, cfg,
                                    chunk=chunk)
        _, ps, qs = slam.trajectory_arrays()
        ate = ate_rmse(ps, gt_p[: len(ps)])
        rpe_t, _ = rpe_rmse(ps, gt_p[: len(ps)], qs, gt_q[: len(ps)],
                            delta=20)
        row = {
            "variant": name,
            "chunk": chunk,
            "fps": round(fps, 2),
            "ate_m": round(ate, 4),
            "rpe_m": round(rpe_t, 4),
            "n_kf": int(slam.map.n_kf),
            "n_mp": int(slam.map.n_mp),
        }
        results.append(row)
        print(json.dumps(row), flush=True)

    ok = [r for r in results if r["fps"] >= 40.0]
    pool = ok if ok else results
    best = min(pool, key=lambda r: r["ate_m"])
    print(json.dumps({"best": best["variant"], "ate_m": best["ate_m"],
                      "fps": best["fps"],
                      "constraint": "fps>=40" if ok else
                      "NONE met fps>=40 (best ATE overall)"}))


if __name__ == "__main__":
    main()
