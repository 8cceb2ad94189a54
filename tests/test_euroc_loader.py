"""EuRoC loader tests against a generated miniature fixture tree (no real
dataset ships in this environment)."""
import os

import numpy as np
import pytest

from orbslam3_tpu.io.euroc import EurocDataset

SENSOR_YAML = """# camera sensor
sensor_type: camera
T_BS:
  cols: 4
  rows: 4
  data: [0.0148655429818, -0.999880929698, 0.00414029679422, -0.0216401454975,
         0.999557249008, 0.0149672133247, 0.025715529948, -0.064676986768,
         -0.0257744366974, 0.00375618835797, 0.999660727178, 0.00981073058949,
         0.0, 0.0, 0.0, 1.0]
rate_hz: 20
resolution: [752, 480]
camera_model: pinhole
intrinsics: [458.654, 457.296, 367.215, 248.375]
distortion_model: radial-tangential
distortion_coefficients: [-0.28340811, 0.07395907, 0.00019359, 1.76187114e-05]
"""

SENSOR_YAML_CAM1 = SENSOR_YAML.replace("-0.0216401454975", "-0.0216401454975").replace(
    "-0.064676986768", "0.0453689425024"
)


@pytest.fixture()
def euroc_dir(tmp_path):
    root = tmp_path / "MH_test" / "mav0"
    for cam, yaml_text in [("cam0", SENSOR_YAML), ("cam1", SENSOR_YAML_CAM1)]:
        d = root / cam / "data"
        d.mkdir(parents=True)
        (root / cam / "sensor.yaml").write_text(yaml_text)
        rows = ["#timestamp [ns],filename"]
        for i in range(3):
            ts = 1403636579763555584 + i * 50_000_000
            fn = f"{ts}.png"
            rows.append(f"{ts},{fn}")
            # tiny real PNG via PIL
            from PIL import Image

            Image.fromarray(
                (np.random.default_rng(i).uniform(0, 255, (48, 64))).astype(np.uint8)
            ).save(d / fn)
        (root / cam / "data.csv").write_text("\n".join(rows))

    imu = root / "imu0"
    imu.mkdir()
    # genuine EuRoC imu0/sensor.yaml layout (ADIS16448 values)
    (imu / "sensor.yaml").write_text(
        """sensor_type: imu
comment: VI-Sensor IMU (ADIS16448)
T_BS:
  cols: 4
  rows: 4
  data: [1.0, 0.0, 0.0, 0.0,
         0.0, 1.0, 0.0, 0.0,
         0.0, 0.0, 1.0, 0.0,
         0.0, 0.0, 0.0, 1.0]
rate_hz: 200
gyroscope_noise_density: 1.6968e-04     # [ rad / s / sqrt(Hz) ]
gyroscope_random_walk: 1.9393e-05       # [ rad / s^2 / sqrt(Hz) ]
accelerometer_noise_density: 2.0000e-3  # [ m / s^2 / sqrt(Hz) ]
accelerometer_random_walk: 3.0000e-3    # [ m / s^3 / sqrt(Hz) ]
"""
    )
    rows = ["#timestamp,wx,wy,wz,ax,ay,az"]
    t0 = 1403636579763555584 - 5_000_000
    for i in range(40):
        rows.append(f"{t0 + i * 5_000_000},0.01,0.02,-0.01,0.1,0.2,9.7")
    (imu / "data.csv").write_text("\n".join(rows))

    gt = root / "state_groundtruth_estimate0"
    gt.mkdir()
    rows = ["#ts,px,py,pz,qw,qx,qy,qz,vx,vy,vz,bwx,bwy,bwz,bax,bay,baz"]
    for i in range(10):
        rows.append(
            f"{t0 + i * 20_000_000},{0.1*i},{0.05*i},0.0,1,0,0,0,0.5,0.25,0,0.001,0.001,0.001,0.01,0.01,0.01"
        )
    (gt / "data.csv").write_text("\n".join(rows))
    return str(root)


class TestEurocLoader:
    def test_load(self, euroc_dir):
        ds = EurocDataset(euroc_dir)
        assert len(ds) == 3
        assert ds.cam0.K[0, 0] == pytest.approx(458.654)
        assert ds.cam0.resolution == (752, 480)
        # baseline ~ 0.11 m for EuRoC (cam1 fixture differs only in y)
        assert 0.05 < ds.baseline < 0.2

    def test_stereo_pair(self, euroc_dir):
        ds = EurocDataset(euroc_dir)
        l, r = ds.stereo_pair(0)
        assert l.shape == (48, 64)
        assert l.dtype == np.float32
        assert 0 <= l.min() and l.max() <= 255

    def test_imu_between(self, euroc_dir):
        ds = EurocDataset(euroc_dir)
        t0 = ds.frame_time(0)
        t1 = ds.frame_time(1)
        g, a, d = ds.imu_between(t0, t1)
        assert len(g) == 10  # 50 ms window at 200 Hz
        assert d.sum() == pytest.approx(0.05, abs=0.01)

    def test_groundtruth(self, euroc_dir):
        ds = EurocDataset(euroc_dir)
        pos = ds.groundtruth_at_frames()
        assert pos.shape == (3, 3)
        np.testing.assert_allclose(pos[0], 0.0, atol=1e-6)

    def test_imu_calib(self, euroc_dir):
        """Noise densities come from imu0/sensor.yaml, not hard-coded
        constants (the reference hard-codes them — sample.rs:24-33)."""
        ds = EurocDataset(euroc_dir)
        assert ds.imu_calib is not None
        n = ds.imu_calib.noise
        assert n.sigma_g == pytest.approx(1.6968e-4)
        assert n.sigma_bg == pytest.approx(1.9393e-5)
        assert n.sigma_a == pytest.approx(2.0e-3)
        assert n.sigma_ba == pytest.approx(3.0e-3)
        assert ds.imu_calib.rate_hz == 200.0
        np.testing.assert_allclose(ds.imu_calib.T_BS, np.eye(4))
