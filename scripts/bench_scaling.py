"""Distributed global-BA sharding validation across mesh sizes.

Runs the landmark-sharded solver on 1/2/4/8 virtual CPU devices on a
synthetic global-BA problem (driver config #5 scenario).

IMPORTANT CAVEAT on the timings: virtual CPU "devices"
(xla_force_host_platform_device_count) are threads on the SAME physical
cores, so wall-clock does not improve with mesh size here — total compute
is fixed. What this script demonstrates is (a) the sharded program
compiles+runs at every mesh size, (b) results are shard-count invariant,
and (c) the per-device FLOP share drops as 1/n (the quantity that becomes
real speedup on a pod slice, where each mesh coordinate is its own chip
and the psum rides ICI). Real multi-chip hardware is not available in this
environment (single tunneled chip).
"""
import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.pop("JAX_PLATFORMS", None)
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import json
import time

import numpy as np


def main():
    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from jax.sharding import Mesh

    from orbslam3_tpu.frontend.camera import Camera
    from orbslam3_tpu.parallel.distributed_ba import GlobalBAPoints, distributed_global_ba

    cam = Camera.create(458.0, 458.0, 376.0, 240.0, 0.11)
    rng = np.random.default_rng(3)
    K, P, O = 64, 16384, 8
    p_gt = np.stack([np.linspace(0, 10, K), np.sin(np.linspace(0, 6, K)), np.zeros(K)], -1).astype(np.float32)
    q_gt = np.tile(np.array([1.0, 0, 0, 0], np.float32), (K, 1))
    Xw = np.stack([rng.uniform(-5, 15, P), rng.uniform(-5, 5, P), rng.uniform(3, 20, P)], -1).astype(np.float32)
    obs_kf = np.full((P, O), -1, np.int32)
    obs_uv = np.zeros((P, O, 2), np.float32)
    obs_ur = np.full((P, O), -1.0, np.float32)
    for i in range(P):
        for j, k in enumerate(rng.choice(K, 4, replace=False)):
            xc = Xw[i] - p_gt[k]
            if xc[2] < 0.5:
                continue
            obs_kf[i, j] = k
            obs_uv[i, j] = (458 * xc[0] / xc[2] + 376, 458 * xc[1] / xc[2] + 240)
    pts = GlobalBAPoints(
        Xw=jnp.asarray(Xw + rng.normal(0, 0.05, (P, 3)).astype(np.float32)),
        pt_valid=jnp.ones(P, bool),
        obs_kf=jnp.asarray(obs_kf),
        obs_uv=jnp.asarray(obs_uv),
        obs_ur=jnp.asarray(obs_ur),
        obs_oct=jnp.zeros((P, O), jnp.int32),
    )
    opt = jnp.asarray([False] + [True] * (K - 1))
    devs = jax.devices()

    results = {}
    for n in [1, 2, 4, 8]:
        if n > len(devs):
            continue
        mesh = Mesh(np.array(devs[:n]), ("pt",))
        # warm (compile)
        out = distributed_global_ba(mesh, pts, jnp.asarray(q_gt), jnp.asarray(p_gt), opt, cam, iters=2)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        out = distributed_global_ba(mesh, pts, jnp.asarray(q_gt), jnp.asarray(p_gt), opt, cam, iters=10)
        jax.block_until_ready(out)
        dt = time.perf_counter() - t0
        results[n] = (dt, out)
        base = results[1][0]
        # shard-count invariance vs the 1-device reference
        ref_p = np.asarray(results[1][1][1])
        max_dev = float(np.abs(np.asarray(out[1]) - ref_p).max())
        print(json.dumps({
            "mesh_devices": n,
            "gba_10it_wall_s": round(dt, 3),
            "per_device_flop_share": round(1.0 / n, 3),
            "max_pose_deviation_vs_1dev": max_dev,
            "note": "virtual CPU devices share cores; wall time is not the scaling signal",
        }))


if __name__ == "__main__":
    main()
