"""Device-throughput profiling: enqueue N reps back-to-back, sync once.
Separates true device compute from tunnel round-trip latency."""
import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time
import numpy as np
import jax, jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from orbslam3_tpu.io.synthetic import SyntheticConfig, SyntheticWorld
from orbslam3_tpu.models.slam import SlamConfig
from orbslam3_tpu.models.fused import FusedSlam, slam_step
from orbslam3_tpu.frontend.orb import detect_orb
from orbslam3_tpu.frontend.stereo import match_stereo
from orbslam3_tpu.models.tracker import match_local_map
from orbslam3_tpu.optim.pose_only import pose_optimize, pose_inertial_optimize
from orbslam3_tpu.imu import preintegration as pre

cfg = SyntheticConfig(duration=2.0, n_landmarks=1500)
world = SyntheticWorld(cfg)
slam_cfg = SlamConfig(use_imu=True, kf_max_frames=4)
slam = FusedSlam(world.cam, slam_cfg)
times_ = world.frame_times()
frames = [tuple(x.astype(np.uint8) for x in world.render_frame(t)) for t in times_[:24]]

def pipeline_time(name, fn, n=20):
    out = fn()
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    outs = [fn() for _ in range(n)]
    jax.block_until_ready(outs[-1])
    dt = (time.perf_counter() - t0) / n * 1e3
    print(f"{name}: {dt:.1f} ms/iter (pipelined x{n})")
    return dt

l = jnp.asarray(frames[0][0].astype(np.float32))
r = jnp.asarray(frames[0][1].astype(np.float32))
pipeline_time("detect_orb", lambda: detect_orb(l, slam_cfg.orb))
featL = detect_orb(l, slam_cfg.orb)
featR = detect_orb(r, slam_cfg.orb)
pipeline_time("match_stereo", lambda: match_stereo(featL, featR, world.cam, slam_cfg.stereo))

# warm up the system for map state
for i in range(10):
    t_prev = times_[i-1] if i else times_[i]
    g, a, d = world.imu_window(t_prev, times_[i])
    slam.process_frame(*frames[i], g, a, d, float(times_[i]))

pipeline_time("match_local_map", lambda: match_local_map(
    slam.map, world.cam, featL.uv, featL.desc, featL.octave, featL.valid,
    slam.ts.q, slam.ts.p, slam_cfg.track))
matched, mp_w, vi, vo = match_local_map(
    slam.map, world.cam, featL.uv, featL.desc, featL.octave, featL.valid,
    slam.ts.q, slam.ts.p, slam_cfg.track)
ur = jnp.full_like(matched, -1.0, dtype=jnp.float32)
pipeline_time("pose_optimize (16 it)", lambda: pose_optimize(
    slam.ts.q, slam.ts.p, world.cam, mp_w, featL.uv, ur, featL.octave, matched >= 0))
pipeline_time("pose_inertial (8 it)", lambda: pose_inertial_optimize(
    slam.ts.q, slam.ts.p, slam.ts.v, slam.ts.bg, slam.ts.ba, world.cam,
    mp_w, featL.uv, ur, featL.octave, (matched >= 0).astype(jnp.float32),
    slam.ts.kf_preint, slam.ts.q, slam.ts.p, slam.ts.v, slam.ts.bg, slam.ts.ba))

g32 = jnp.zeros((32, 3)); d32 = jnp.full((32,), 0.005); m32 = jnp.ones((32,), bool)
pipeline_time("preintegrate 32", lambda: pre.integrate(g32, g32, d32, m32, slam.ts.bg, slam.ts.ba))

# full fused step, pipelined (sequential dependency through map/ts)
def run_full(i):
    t_prev = times_[i-1] if i else times_[i]
    g, a, d = world.imu_window(t_prev, times_[i])
    return slam.process_frame(*frames[i], g, a, d, float(times_[i]))
run_full(10); jax.block_until_ready(slam.ts.q)
t0 = time.perf_counter()
for i in range(11, 23):
    run_full(i)
jax.block_until_ready(slam.ts.q)
print(f"fused slam_step: {(time.perf_counter()-t0)/12*1e3:.1f} ms/frame (sequential)")
