"""Pallas TPU kernels for the vision frontend.

`fast_score_pallas` — FAST-9 corner scoring as a halo'd row-tile
kernel: the image stays in HBM; the kernel DMAs one (TILE+8, Wp) slab
at a time into a VMEM scratch, encodes the 16 Bresenham-ring
comparisons as BITS of one int32 map, and tests the contiguous >=9 arc
with 16 shift+mask ops. One image read + one score write vs the XLA
path's 16 rolled image copies (reference hot spot: `cv::FAST` inside
`Grider_GRID::perform_griding`, `TrackKLT.cpp:494`).

NOTE: the tile loop lives INSIDE one kernel program (`fori_loop` +
manual DMA) rather than a `grid=`: gridded pallas_calls currently fail
to legalize through this environment's remote-compile service.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

from .klt import _CIRCLE  # identical ring order as the XLA path

_TILE = 64


def _fast_kernel(
    img_hbm, out_ref, slab, sem, *, thresh: float, n: int, TILE: int, W: int, Wp: int
):
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    h, w = TILE, W - 6

    # static python unroll over tiles: row offsets become compile-time
    # constants (x64 fori_loop indices currently mis-lower in Mosaic)
    for ti in range(n):
        row0 = ti * TILE
        cp = pltpu.make_async_copy(
            img_hbm.at[pl.ds(row0, TILE + 8), :], slab, sem
        )
        cp.start()
        cp.wait()
        img = slab[:]
        # full-width compute: column shifts via lane rolls (no unaligned
        # slices — Mosaic rejects offset-mismatched concats/stores);
        # wrapped border columns are junk and zeroed by the wrapper
        c = img[3 : 3 + h, :]
        maskb = jnp.zeros((h, Wp), jnp.int32)
        maskd = jnp.zeros((h, Wp), jnp.int32)
        mag = jnp.zeros((h, Wp), jnp.float32)
        for s_, (dy, dx) in enumerate(_CIRCLE):
            rows = img[3 + dy : 3 + dy + h, :]
            p = pltpu.roll(rows, shift=np.int32((-dx) % Wp), axis=1) if dx else rows
            d = p - c
            b = d > thresh
            dk = d < -thresh
            maskb = maskb | (b.astype(jnp.int32) << s_)
            maskd = maskd | (dk.astype(jnp.int32) << s_)
            mag = mag + jnp.where(b | dk, jnp.abs(d) - thresh, 0.0)
        # circular arc of >= 9 consecutive set bits: duplicate the
        # 16-bit ring into the upper half, test every 9-bit window
        mb = maskb | (maskb << 16)
        md = maskd | (maskd << 16)
        corner = jnp.zeros((h, Wp), bool)
        for s_ in range(16):
            corner = (
                corner
                | (((mb >> s_) & 0x1FF) == 0x1FF)
                | (((md >> s_) & 0x1FF) == 0x1FF)
            )
        out_ref[pl.ds(row0, TILE), :] = jnp.where(corner, mag, 0.0)


@functools.partial(jax.jit, static_argnames=("thresh", "interpret"))
def fast_score_pallas(img: jnp.ndarray, thresh: float = 20.0, interpret: bool = False):
    """FAST-9 corner score map, same output contract as `klt.fast_score`
    (zeroed 3-px borders, OpenCV-like |d|-t arc magnitude)."""
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    H, W = img.shape
    n = -(-H // _TILE)
    Wp = -(-W // 128) * 128  # DMA lane tiling: width multiple of 128
    # pad: 3 halo rows on top, halo+tile remainder at the bottom, so
    # slab i covers padded rows [i*TILE, i*TILE + TILE+6) exactly
    img_p = jnp.zeros((n * _TILE + 8, Wp), jnp.float32)
    img_p = jax.lax.dynamic_update_slice(img_p, img.astype(jnp.float32), (3, 0))

    kern = functools.partial(
        _fast_kernel, thresh=float(thresh), n=n, TILE=_TILE, W=W, Wp=Wp
    )
    out = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((n * _TILE, Wp), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((_TILE + 8, Wp), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(img_p)
    out = out[:H, :W]
    # zero 3-px borders like the XLA path (rows near the padding already
    # see zeros, but the contract is exact zeros)
    out = out.at[:3, :].set(0.0).at[-3:, :].set(0.0)
    out = out.at[:, :3].set(0.0).at[:, -3:].set(0.0)
    return out


def use_pallas_fast(img_shape) -> bool:
    """Whether to take the Pallas path (TPU backend only)."""
    return jax.default_backend() == "tpu"
