"""Deterministic recorded-stream regression on VENDORED data.

The committed stand-in for the reference's serial-bag dataset regression
(`ov_msckf/src/ros1_serial_msckf.cpp`): replay the vendored mono
head-to-head streams (data/streams/mono, generated once by the
head-to-head driver) through the full manager and gate the ATE against
the simulator groundtruth — and against the reference estimator's own
recorded output on the identical streams. Needs NO /root/reference
mount.
"""

import dataclasses
import os

import numpy as np
import pytest

DATA = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                    "data", "streams", "mono")


@pytest.mark.slow
def test_vendored_mono_stream_replay():
    from uvio_tpu.eval.traj import ate, load_tum
    from uvio_tpu.manager import VioManager
    from uvio_tpu.utils.config import load_config

    cfg, extras = load_config(os.path.join(DATA, "config"))
    cfg = dataclasses.replace(cfg, use_static_init=False, use_dynamic_init=False)
    mgr = VioManager(cfg)
    init = np.loadtxt(os.path.join(DATA, "init.txt"))
    mgr.initialize_with_gt(init[0], init[1:5], init[5:8], init[8:11],
                           init[11:14], init[14:17])

    imu = np.loadtxt(os.path.join(DATA, "imu.csv.gz"), delimiter=",")
    cam = np.loadtxt(os.path.join(DATA, "cam.csv.gz"), delimiter=",")
    frames = []
    tv, idx = np.unique(cam[:, 0], return_index=True)
    for t in tv[np.argsort(idx)]:
        rc = cam[cam[:, 0] == t]
        frames.append((float(t), [(rc[:, 2].astype(np.int64), rc[:, 3:5])]))
    frames.sort(key=lambda f: f[0])

    est_t, est_q, est_p = [], [], []
    fi = 0
    for k in range(imu.shape[0]):
        t = float(imu[k, 0])
        mgr.feed_imu(t, imu[k, 1:4], imu[k, 4:7])
        while fi + 1 < len(frames) and frames[fi + 1][0] <= t:
            ti, obs = frames[fi]
            if ti > float(init[0]):
                mgr.feed_features(ti, obs)
                est_t.append(float(mgr.state.time))
                est_q.append(np.asarray(mgr.state.q))
                est_p.append(np.asarray(mgr.state.p))
            fi += 1

    assert len(est_t) > 400
    tg, qg, pg = load_tum(os.path.join(DATA, "gt.txt"))
    ours = ate(np.asarray(est_t), np.asarray(est_q), np.asarray(est_p),
               tg, qg, pg, method="se3")
    tr, qr, pr = load_tum(os.path.join(DATA, "ref_est.txt"))
    ref = ate(tr, qr, pr, tg, qg, pg, method="se3")
    # parity gate: within 20% of the reference's own result on these
    # exact streams (r3/r4 measured ~10% BETTER; the slack absorbs
    # platform jitter without letting a real regression through)
    assert ours["rmse_pos"] <= 1.2 * ref["rmse_pos"], (ours, ref)
    assert ours["rmse_ori_deg"] <= 1.2 * ref["rmse_ori_deg"], (ours, ref)
