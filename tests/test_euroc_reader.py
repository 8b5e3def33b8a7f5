"""EuRoC folder reader test on a synthetic fixture."""

import os

import numpy as np

from uvio_tpu.utils.euroc import EurocDataset


def make_fixture(tmp_path):
    base = tmp_path / "seq" / "mav0"
    (base / "imu0").mkdir(parents=True)
    (base / "cam0" / "data").mkdir(parents=True)
    (base / "state_groundtruth_estimate0").mkdir(parents=True)
    with open(base / "imu0" / "data.csv", "w") as f:
        f.write("#timestamp [ns],w_x,w_y,w_z,a_x,a_y,a_z\n")
        for i in range(10):
            f.write(f"{1403636579758555392 + i * 5_000_000},0.1,0.2,0.3,0.0,0.0,9.81\n")
    with open(base / "cam0" / "data.csv", "w") as f:
        f.write("#timestamp [ns],filename\n")
        f.write("1403636579763555584,1403636579763555584.png\n")
    with open(base / "state_groundtruth_estimate0" / "data.csv", "w") as f:
        f.write("#timestamp, p_RS_R_x ...\n")
        f.write(
            "1403636579758555392,4.68,-1.78,0.77,0.53,-0.15,-0.82,-0.16,"
            "-0.02,0.02,0.05,-0.002,0.021,0.076,-0.025,0.136,0.075\n"
        )
    return str(tmp_path / "seq")


def test_euroc_reader(tmp_path):
    root = make_fixture(tmp_path)
    ds = EurocDataset(root)
    imu = list(ds.imu())
    assert len(imu) == 10
    t0, w0, a0 = imu[0]
    np.testing.assert_allclose(t0, 1403636579.758555392, rtol=0, atol=1e-6)
    np.testing.assert_allclose(w0, [0.1, 0.2, 0.3])
    np.testing.assert_allclose(a0, [0.0, 0.0, 9.81])
    imgs = list(ds.images("cam0"))
    assert len(imgs) == 1 and imgs[0][1].endswith(".png")
    gt = ds.groundtruth()
    np.testing.assert_allclose(gt["p"][0], [4.68, -1.78, 0.77])
    # Hamilton (w,x,y,z) -> JPL (x,y,z,w)
    np.testing.assert_allclose(gt["q_GtoI"][0], [-0.15, -0.82, -0.16, 0.53])
    np.testing.assert_allclose(gt["bg"][0], [-0.002, 0.021, 0.076])
