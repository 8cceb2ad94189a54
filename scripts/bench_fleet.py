"""Fleet-mapping throughput: D=8 concurrent sessions on the CPU mesh.

Reports AGGREGATE tracked frames/s for `parallel/multi_session.py`
(VERDICT r2 item 8: un-lockstepped multi-session + a D=8 aggregate
number). Sessions are fed RAGGED streams — session 0 gets only half the
frames — to exercise the valid-mask path: short/slow streams ride along
as valid=False slots and never stall the mesh.

CAVEAT (same as bench_scaling.py): the 8 "devices" are threads on the
same physical cores, so aggregate fps here is a correctness/orchestration
number, not a hardware one — on a real 8-chip slice each session owns a
chip and the aggregate scales ~linearly (sessions share no collectives).

Usage: python scripts/bench_fleet.py [duration_s]
"""
import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.pop("JAX_PLATFORMS", None)
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import json
import time

import numpy as np


def main():
    import jax

    jax.config.update("jax_platforms", "cpu")

    from orbslam3_tpu.io.synthetic import SyntheticConfig, SyntheticWorld
    from orbslam3_tpu.models.slam import SlamConfig
    from orbslam3_tpu.parallel.multi_session import MultiSessionSlam

    duration = float(sys.argv[1]) if len(sys.argv) > 1 else 2.0
    D = 8
    worlds = [SyntheticWorld(SyntheticConfig(duration=duration, seed=s,
                                             n_landmarks=800))
              for s in range(D)]
    cam = worlds[0].cam
    cfg = SlamConfig(use_imu=True, kf_max_frames=6, ba_iters=3, ba_window=6)
    fleet = MultiSessionSlam(cam, cfg, n_sessions=D, chunk=4)

    # pre-render all frames (host work, untimed)
    streams = []
    for si, w in enumerate(worlds):
        times = w.frame_times()
        if si == 0:  # ragged: session 0's stream is half length
            times = times[: len(times) // 2]
        frames = [tuple(x.astype(np.uint8) for x in w.render_frame(t))
                  for t in times]
        imu = []
        for i, t in enumerate(times):
            t_prev = times[i - 1] if i > 0 else t
            imu.append(w.imu_window(t_prev, t))
        streams.append((times, frames, imu))

    n_steps = max(len(s[0]) for s in streams)

    def run():
        for i in range(n_steps):
            for si, (times, frames, imu) in enumerate(streams):
                if i >= len(times):
                    continue
                g, a, d = imu[i]
                fleet.process_frame(si, frames[i][0], frames[i][1],
                                    g, a, d, float(times[i]))
        fleet.finalize()
        jax.block_until_ready(fleet.tss.q)

    run()  # warmup pass (compiles)
    total = sum(len(s[0]) for s in streams)
    fleet2 = MultiSessionSlam(cam, cfg, n_sessions=D, chunk=4)
    # reuse the WARMED jitted step: make_multi_session_step returns a fresh
    # jax.jit whose cache is empty, so a fresh instance would recompile the
    # whole mesh program inside the timed window (measured: 85 s first
    # dispatch vs 1.3 s warmed — the timed number was compile time, not
    # throughput; ADVICE r3). mesh/cam/cfg are identical, so the executable
    # is directly reusable.
    fleet2._step = fleet._step
    fleet = fleet2
    t0 = time.perf_counter()
    run()
    dt = time.perf_counter() - t0
    n_kfs = [int(jax.tree.map(lambda a: a[s], fleet.maps.n_kf))
             for s in range(D)]
    print(json.dumps({
        "metric": "fleet_aggregate_fps",
        "value": round(total / dt, 2),
        "unit": "frames/s (8 sessions, virtual CPU mesh)",
        "sessions": D,
        "frames_total": total,
        "ragged_session0_frames": len(streams[0][0]),
        "keyframes_per_session": n_kfs,
        "elapsed_s": round(dt, 2),
    }))


if __name__ == "__main__":
    main()
