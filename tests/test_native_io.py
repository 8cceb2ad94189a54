"""Native C++ data-loader tests: PNG decode parity with PIL, IMU CSV
parsing, threaded prefetcher ordering."""
import numpy as np
import pytest

from orbslam3_tpu.io import native

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native library not built (make -C native)"
)


@pytest.fixture()
def pngs(tmp_path):
    from PIL import Image

    rng = np.random.default_rng(0)
    paths = []
    arrays = []
    for i, mode in enumerate(["L", "RGB", "RGBA"]):
        a = rng.integers(0, 255, (37, 53, {"L": 1, "RGB": 3, "RGBA": 4}[mode]))
        a = a.astype(np.uint8).squeeze()
        img = Image.fromarray(a, mode)
        p = tmp_path / f"img{i}_{mode}.png"
        img.save(p)
        arrays.append(np.asarray(img.convert("L"), np.uint8))
        paths.append(str(p))
    return paths, arrays


class TestPngDecode:
    def test_grayscale_exact(self, pngs):
        paths, arrays = pngs
        out = native.png_decode_gray(paths[0])
        np.testing.assert_array_equal(out, arrays[0])

    def test_rgb_close(self, pngs):
        paths, arrays = pngs
        out = native.png_decode_gray(paths[1])
        assert out.shape == arrays[1].shape
        # integer luma rounding may differ by 1
        assert np.abs(out.astype(int) - arrays[1].astype(int)).max() <= 1

    def test_rgba(self, pngs):
        paths, arrays = pngs
        out = native.png_decode_gray(paths[2])
        assert np.abs(out.astype(int) - arrays[2].astype(int)).max() <= 1


def test_imu_csv(tmp_path):
    p = tmp_path / "data.csv"
    rows = ["#timestamp,wx,wy,wz,ax,ay,az"]
    for i in range(50):
        rows.append(f"{1000+i*5},{0.1*i},{-0.2},{0.3},{1.0},{2.0},{9.8}")
    p.write_text("\n".join(rows))
    ts, gyro, acc = native.imu_csv_parse(str(p))
    assert len(ts) == 50
    assert ts[0] == 1000
    np.testing.assert_allclose(gyro[3], [0.3, -0.2, 0.3], atol=1e-6)
    np.testing.assert_allclose(acc[0], [1.0, 2.0, 9.8], atol=1e-6)


def test_prefetcher(tmp_path):
    from PIL import Image

    rng = np.random.default_rng(1)
    paths = []
    truth = []
    for i in range(12):
        a = rng.integers(0, 255, (24, 32)).astype(np.uint8)
        p = tmp_path / f"{i}.png"
        Image.fromarray(a, "L").save(p)
        paths.append(str(p))
        truth.append(a)
    pf = native.ImagePrefetcher(paths, 32, 24, threads=3)
    for i in range(12):
        np.testing.assert_array_equal(pf.get(i), truth[i])
    pf.close()
