"""ATE/RPE metric correctness (Sturm formulation — r1's RPE was a drift
magnitude proxy that missed all lateral/rotational error)."""
import numpy as np
import pytest

from orbslam3_tpu.eval.metrics import ate_rmse, rpe_rmse


def _circle_traj(T=100, r=2.0):
    th = np.linspace(0, 2 * np.pi, T)
    p = np.stack([r * np.cos(th), r * np.sin(th), 0 * th], -1)
    # yaw tangent to the circle: quaternion about z by angle th + pi/2
    half = (th + np.pi / 2) / 2
    q = np.stack([np.cos(half), 0 * th, 0 * th, np.sin(half)], -1)
    return p, q


def test_rpe_zero_on_identical():
    p, q = _circle_traj()
    t, r = rpe_rmse(p, p, q, q, delta=10)
    assert t == pytest.approx(0.0, abs=1e-9)
    assert r == pytest.approx(0.0, abs=1e-6)


def test_rpe_invariant_to_global_transform():
    """A rigidly transformed estimate has ZERO relative error."""
    p, q = _circle_traj()
    # global rotation by 90 deg about x + offset, applied to the est world
    Rg = np.array([[1.0, 0, 0], [0, 0, -1.0], [0, 1.0, 0]])
    qg = np.array([np.cos(np.pi / 4), np.sin(np.pi / 4), 0, 0])

    def qmul(a, b):
        w1, x1, y1, z1 = a.T
        w2, x2, y2, z2 = b.T
        return np.stack(
            [
                w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2,
                w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
                w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2,
                w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2,
            ],
            -1,
        )

    p2 = p @ Rg.T + np.array([5.0, -3.0, 1.0])
    q2 = qmul(np.tile(qg, (len(q), 1)), q)
    t, r = rpe_rmse(p2, p, q2, q, delta=10)
    assert t == pytest.approx(0.0, abs=1e-6)
    assert r == pytest.approx(0.0, abs=1e-5)


def test_rpe_catches_lateral_error():
    """The r1 proxy compared |de| - |dg|: a lateral error of equal
    magnitude was invisible. The Sturm form must catch it."""
    T, delta = 60, 10
    gt_p = np.stack([np.linspace(0, 10, T), np.zeros(T), np.zeros(T)], -1)
    gt_q = np.tile(np.array([1.0, 0, 0, 0]), (T, 1))
    # estimate moves the same DISTANCE per step but drifts sideways
    step = 10 / (T - 1)
    est_p = np.stack(
        [
            np.arange(T) * step * np.cos(0.05),
            np.arange(T) * step * np.sin(0.05),
            np.zeros(T),
        ],
        -1,
    )
    # old proxy: |de| == |dg| -> error 0. New metric: nonzero.
    t, _ = rpe_rmse(est_p, gt_p, gt_q, gt_q, delta=delta)
    expected = np.linalg.norm(
        est_p[delta] - est_p[0] - (gt_p[delta] - gt_p[0])
    )
    assert t == pytest.approx(expected, rel=0.05)
    assert t > 0.02


def test_rpe_rotation_error():
    p, q = _circle_traj()
    # estimate: same positions, orientations frozen at identity
    q_frozen = np.tile(np.array([1.0, 0, 0, 0]), (len(q), 1))
    _, r = rpe_rmse(p, p, q_frozen, q, delta=10)
    # gt rotates 2*pi over 100 steps -> 10 steps = 0.628 rad relative
    assert r == pytest.approx(2 * np.pi * 10 / 99, rel=0.05)


def test_ate_alignment():
    p, _ = _circle_traj()
    Rg = np.array([[0, -1.0, 0], [1.0, 0, 0], [0, 0, 1.0]])
    p2 = p @ Rg.T + 7.0
    assert ate_rmse(p2, p) == pytest.approx(0.0, abs=1e-6)
