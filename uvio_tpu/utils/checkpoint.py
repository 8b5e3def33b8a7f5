"""Filter-state checkpoint / resume.

The reference has NO estimator checkpointing (SURVEY.md §5: output-side
text streams only; `initialize_with_gt` is the closest thing to a warm
start). Here the entire estimator is one pytree + a tiny host mirror,
so save/resume is a single npz — useful for long-sequence restarts and
fault recovery that the reference cannot do.
"""

from __future__ import annotations

import json

import jax.numpy as jnp
import numpy as np


def save_state(path: str, state, host_meta: dict) -> None:
    """Write a FilterState pytree + host bookkeeping to one .npz."""
    from flax import serialization

    sd = serialization.to_state_dict(state)
    flat = {f"state/{k}": np.asarray(v) for k, v in sd.items()}
    flat["__meta__"] = np.frombuffer(
        json.dumps(host_meta).encode(), dtype=np.uint8
    )
    np.savez(path, **flat)


def load_state(path: str, template):
    """Read back (FilterState, host_meta). `template` supplies the
    pytree structure and dtypes (build it with the same config)."""
    from flax import serialization

    with np.load(path) as z:
        meta = json.loads(bytes(z["__meta__"].tobytes()).decode())
        sd = serialization.to_state_dict(template)
        restored = {}
        for k, tv in sd.items():
            arr = z[f"state/{k}"]
            restored[k] = jnp.asarray(arr, jnp.asarray(tv).dtype)
    state = serialization.from_state_dict(template, restored)
    return state, meta
