#!/usr/bin/env python
"""Trace seed-7 own-sim per-frame error with and without SLAM."""
import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import importlib.util  # noqa: E402

import numpy as np  # noqa: E402

spec = importlib.util.spec_from_file_location(
    "t", os.path.join(REPO, "tests", "test_sim_e2e.py")
)
t = importlib.util.module_from_spec(spec)
spec.loader.exec_module(t)

seed = int(sys.argv[1]) if len(sys.argv) > 1 else 7
e0, g0 = t.run_sim(max_slam=0, seed=seed)
e1, g1 = t.run_sim(max_slam=20, seed=seed)
err0 = np.linalg.norm(e0["p"] - g0["p"], axis=1)
err1 = np.linalg.norm(e1["p"] - g1["p"], axis=1)
n = min(len(err0), len(err1))
for i in range(0, n, 5):
    bar0 = "#" * int(err0[i] * 200)
    bar1 = "*" * int(err1[i] * 200)
    print(f"{e0['t'][i]:.2f}  noslam {err0[i]:.4f} {bar0:<30}  slam {err1[i]:.4f} {bar1}")
print(f"final: noslam {err0[-1]:.4f} slam {err1[-1]:.4f}")
