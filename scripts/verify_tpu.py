"""End-to-end verification drive on the real TPU chip (the /verify recipe).

Covers, in order:
  1. geometry + IMU library surface (precision on hardware),
  2. a short full-pipeline FusedSlam run (frame in -> trajectory out),
  3. the driver entry points (entry compile-check).

Run from the repo root: `timeout 580 python scripts/verify_tpu.py`.
"""
import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    print("devices:", jax.devices(), flush=True)

    # ---- 1. library surface
    from orbslam3_tpu.geometry import quat, SE3, Sim3
    from orbslam3_tpu import imu as I

    w = np.array([0.4, 0.1, -0.3], np.float32)
    a_w = np.array([0.5, -0.2, 0.3], np.float32)
    G = np.array([0, 0, -9.81], np.float32)
    q0 = quat.from_axis_angle(jnp.asarray([0.2, -0.1, 0.3]))
    n, dt = 200, 1.0 / 200.0
    acc = []
    for i in range(n):
        qt = quat.mul(q0, quat.from_axis_angle(jnp.asarray(w) * (i * dt + dt / 2)))
        Rt = np.asarray(quat.to_matrix(qt))
        acc.append(Rt.T @ (a_w - G))
    st = I.integrate(
        jnp.tile(jnp.asarray(w), (n, 1)), jnp.asarray(np.stack(acc)),
        jnp.full((n,), dt), jnp.ones((n,), bool), jnp.zeros(3), jnp.zeros(3),
    )
    v0 = jnp.asarray([0.3, 0.1, -0.2])
    qj, vj, pj = I.propagate(st, q0, v0, jnp.zeros(3))
    v_err = float(jnp.abs(vj - (v0 + jnp.asarray(a_w))).max())
    print(f"preintegration v_err: {v_err:.2e}")
    assert v_err < 1e-3

    xi = jnp.asarray(np.random.default_rng(1).normal(size=(8, 7)) * 0.4, jnp.float32)
    sim_err = float(jnp.abs(jax.jit(lambda x: Sim3.exp(x).log())(xi) - xi).max())
    print(f"Sim3 exp/log err: {sim_err:.2e}")
    assert sim_err < 1e-4

    # ---- 2. short full-pipeline run
    from orbslam3_tpu.eval.metrics import ate_rmse
    from orbslam3_tpu.io.synthetic import SyntheticConfig, SyntheticWorld
    from orbslam3_tpu.models.fused import FusedSlam
    from orbslam3_tpu.models.slam import SlamConfig

    world = SyntheticWorld(SyntheticConfig(duration=2.0, n_landmarks=1200))
    slam = FusedSlam(world.cam, SlamConfig(kf_max_frames=4))
    times = world.frame_times()
    t0 = time.perf_counter()
    for i, t in enumerate(times):
        left, right = world.render_frame(t)
        tp = times[i - 1] if i else t
        g, a, d = world.imu_window(tp, t)
        slam.process_frame(left.astype(np.uint8), right.astype(np.uint8), g, a, d, float(t))
    slam.flush()
    jax.block_until_ready(slam.ts.q)
    el = time.perf_counter() - t0
    ts, ps, qs = slam.trajectory_arrays()
    gt_p, _ = world.gt_trajectory()
    ate = ate_rmse(ps, gt_p[: len(ps)])
    print(f"pipeline: {len(times)} frames in {el:.1f}s, ATE {ate:.4f} m, "
          f"{int(slam.map.n_kf)} KFs")
    assert ate < 0.1
    assert not np.isnan(ps).any()

    # ---- 3. driver entry
    import __graft_entry__ as ge

    fn, args = ge.entry()
    out = jax.jit(fn)(*args)
    jax.block_until_ready(out)
    print("entry() OK")
    print("VERIFY_DONE")


if __name__ == "__main__":
    main()
