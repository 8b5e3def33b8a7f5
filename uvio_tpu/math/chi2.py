"""Chi-squared 95% gating table.

The reference builds `boost::math::chi_squared` quantiles on the fly
(`UpdaterMSCKF.cpp:47-55`, up to 500 dof); here the table is
precomputed once at import (scipy) into a device constant so the gate
is a dynamic lookup inside jit.
"""

import jax.numpy as jnp
import numpy as np
from scipy import stats

MAX_DOF = 1024

_table = stats.chi2.ppf(0.95, np.arange(1, MAX_DOF + 1))
# dof index 0 unused; clamp lookups into [1, MAX_DOF]
CHI2_95 = jnp.asarray(np.concatenate([[_table[0]], _table]))


def chi2_95(dof):
    """95% chi2 quantile for (possibly traced) integer dof."""
    idx = jnp.clip(dof, 1, MAX_DOF)
    return CHI2_95[idx]
