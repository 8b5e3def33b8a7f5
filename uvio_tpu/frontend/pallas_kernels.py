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
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
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


# ---------------------------------------------------------------------------
# pyramidal Lucas-Kanade level kernel
# ---------------------------------------------------------------------------
#
# The XLA path (`klt.lk_level`) vmaps a per-feature dynamic-slice patch
# gather: N features x iters bilinear windows lower to gathers, the
# weakest op class on TPU (reference hot loop: `cv::calcOpticalFlowPyrLK`,
# `TrackKLT.cpp:858`). Kernel strategy: per feature, DMA ONE template
# slab from img_prev and ONE search slab (patch + margin) from img_next
# into VMEM, then run all LK iterations against the in-VMEM search slab
# with dynamic sublane/lane offsets — 2 DMAs per feature total instead
# of a gather per iteration.

_LK_MARGIN = 6  # search-slab half-margin (px) the iterations may roam
_LK_SLAB_W = 256  # DMA slab lane width: 128-aligned base + <128 residual + patch
_LK_TSLAB_H = 24  # template slab rows: 8-aligned base residual (<8) + patch
_LK_NSLAB_H = 40  # search slab rows: residual (<8) + patch + 2*margin, 8-multiple


def _lk_kernel(
    uv_ref, guess_ref, valid_ref, imgp_hbm, imgn_hbm,
    out_uv, out_ok, tslab, nslab, sem, sem2,
    *, N, half, iters, min_eig, H, W, H_pad, W_pad,
):
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    P = 2 * half + 1     # patch size
    P2 = P + 1           # +1 row/col for bilinear blending
    M = _LK_MARGIN
    S = P2 + 2 * M       # search slab side
    TW = _LK_SLAB_W      # lane width of the DMA slabs (2 x 128)

    def aligned_base(x0c):
        # Mosaic requires HBM DMA lane offsets provably 128-aligned:
        # DMA a 2x128-wide slab starting at the aligned floor of the
        # wanted offset; the residual (< 128) becomes an in-VMEM lane
        # offset. The wrapper pads the image width to a 128 multiple so
        # the clamped base stays aligned.
        # clamp FIRST, align LAST: the mosaic divisibility prover
        # recognizes (expr // k) * k as a k-multiple only when it is the
        # outermost expression (a trailing min() defeats it)
        c128 = jnp.int32(128)
        return (jnp.minimum(x0c, jnp.int32(W_pad - TW)) // c128) * c128

    def aligned_base_row(y0c, slab_h):
        # sublane (dim 0) DMA offsets must be 8-aligned likewise. Clamp
        # against the 8-multiple PADDED height (H_pad >= slab_h by
        # construction in the wrapper): with the raw H the base went
        # negative whenever a pyramid level was shorter than the slab
        # (OOB HBM DMA), and for H % 8 >= 2 the sub-slab residual could
        # exceed slab_h - patch and overrun the slab for bottom-edge
        # features. H_pad % 8 == 0 and slab_h % 8 == 0 keep the clamped
        # base exact, non-negative, and the residual < 8.
        c8 = jnp.int32(8)
        return (jnp.minimum(y0c, jnp.int32(H_pad - slab_h)) // c8) * c8

    def bilinear(slab, oy, ox, fy, fx, size, ph, pw):
        # (size+1, size+1) corner block at integer offset (oy, ox).
        # Mosaic cannot do unaligned dynamic slicing (lane offsets must
        # be 128 multiples, sublanes 8), so rotate the whole slab value
        # by (-oy, -ox) with tpu.dynamic_rotate (any shift allowed) and
        # take a STATIC corner slice. Wraparound columns land beyond the
        # slice as long as off + size + 1 <= period (guaranteed by the
        # slab sizing).
        # rows via one-hot matmul (dynamic sublane rotates don't lower
        # here either: "tile index divisible by 8"); lanes via rotate
        sel = (
            jax.lax.broadcasted_iota(jnp.int32, (size + 1, ph), 1)
            == jax.lax.broadcasted_iota(jnp.int32, (size + 1, ph), 0) + oy
        ).astype(jnp.float32)
        rows = jax.lax.dot_general(
            sel, slab[:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (size+1, pw)
        sx = jnp.where(ox == 0, jnp.int32(0), jnp.int32(pw) - ox)
        r = pltpu.roll(rows, shift=sx, axis=1)
        blk = r[:, 0 : size + 1]
        top = blk[:-1, :-1] * (1.0 - fx) + blk[:-1, 1:] * fx
        bot = blk[1:, :-1] * (1.0 - fx) + blk[1:, 1:] * fx
        return top * (1.0 - fy) + bot * fy

    def body(i, carry):
        px = uv_ref[i, 0]
        py = uv_ref[i, 1]
        gx0 = guess_ref[i, 0]
        gy0 = guess_ref[i, 1]

        # ---- template slab from img_prev ----
        tx0 = jnp.floor(px).astype(jnp.int32) - half
        ty0 = jnp.floor(py).astype(jnp.int32) - half
        tin = (tx0 >= 0) & (ty0 >= 0) & (tx0 + P2 < W) & (ty0 + P2 < H)
        # NOTE: jnp.clip with python-int bounds lowers to a closed_call
        # whose x64-weak f64 converts send the mosaic lowering into
        # infinite recursion on this backend; explicit int32 min/max
        # lowers cleanly
        tx0c = jnp.maximum(jnp.minimum(tx0, jnp.int32(W - P2 - 1)), jnp.int32(0))
        ty0c = jnp.maximum(jnp.minimum(ty0, jnp.int32(H - P2 - 1)), jnp.int32(0))
        tx_base = aligned_base(tx0c)
        tdx = tx0c - tx_base
        ty_base = aligned_base_row(ty0c, _LK_TSLAB_H)
        tdy = ty0c - ty_base
        cp = pltpu.make_async_copy(
            imgp_hbm.at[pl.ds(ty_base, _LK_TSLAB_H), pl.ds(tx_base, TW)],
            tslab, sem,
        )
        cp.start()

        # ---- search slab from img_next around the guess ----
        sx0 = jnp.floor(gx0).astype(jnp.int32) - half - M
        sy0 = jnp.floor(gy0).astype(jnp.int32) - half - M
        sx0c = jnp.maximum(jnp.minimum(sx0, jnp.int32(W - S - 1)), jnp.int32(0))
        sy0c = jnp.maximum(jnp.minimum(sy0, jnp.int32(H - S - 1)), jnp.int32(0))
        sx_base = aligned_base(sx0c)
        sdx = sx0c - sx_base
        sy_base = aligned_base_row(sy0c, _LK_NSLAB_H)
        sdy = sy0c - sy_base
        cp2 = pltpu.make_async_copy(
            imgn_hbm.at[pl.ds(sy_base, _LK_NSLAB_H), pl.ds(sx_base, TW)],
            nslab, sem2,
        )
        cp2.start()
        cp.wait()

        fx = px - jnp.floor(px)
        fy = py - jnp.floor(py)
        tmpl = bilinear(tslab, tdy, tdx, fy, fx, P, _LK_TSLAB_H, TW)
        # shifts must be 32-bit for tpu.dynamic_rotate (x64 mode would
        # trace python ints as s64)
        s1 = jnp.int32(1)
        sP = jnp.int32(P - 1)
        gxg = 0.5 * (
            pltpu.roll(tmpl, shift=sP, axis=1) - pltpu.roll(tmpl, shift=s1, axis=1)
        )
        gyg = 0.5 * (
            pltpu.roll(tmpl, shift=sP, axis=0) - pltpu.roll(tmpl, shift=s1, axis=0)
        )
        edge_r = jax.lax.broadcasted_iota(jnp.int32, (P, P), 0)
        edge_c = jax.lax.broadcasted_iota(jnp.int32, (P, P), 1)
        gxg = jnp.where((edge_c == 0) | (edge_c == P - 1), 0.0, gxg)
        gyg = jnp.where((edge_r == 0) | (edge_r == P - 1), 0.0, gyg)
        Gxx = jnp.sum(gxg * gxg)
        Gxy = jnp.sum(gxg * gyg)
        Gyy = jnp.sum(gyg * gyg)
        det = Gxx * Gyy - Gxy * Gxy
        eig = 0.5 * (Gxx + Gyy - jnp.sqrt((Gxx - Gyy) ** 2 + 4.0 * Gxy * Gxy))
        good = det > 1e-6

        cp2.wait()

        def it(_, st):
            qx, qy, okc = st
            # integer offset of the iteration window inside the slab
            ox = jnp.floor(qx).astype(jnp.int32) - half - sx0c
            oy = jnp.floor(qy).astype(jnp.int32) - half - sy0c
            okp = (ox >= 0) & (oy >= 0) & (ox + P2 <= S) & (oy + P2 <= S)
            oxc = jnp.maximum(jnp.minimum(ox, jnp.int32(S - P2)), jnp.int32(0))
            oyc = jnp.maximum(jnp.minimum(oy, jnp.int32(S - P2)), jnp.int32(0))
            cur = bilinear(
                nslab, oyc + sdy, oxc + sdx,
                qy - jnp.floor(qy), qx - jnp.floor(qx),
                P, _LK_NSLAB_H, TW,
            )
            err = cur - tmpl
            bx = jnp.sum(gxg * err)
            by = jnp.sum(gyg * err)
            safe_det = jnp.where(good, det, 1.0)
            dx = (Gyy * bx - Gxy * by) / safe_det
            dy = (Gxx * by - Gxy * bx) / safe_det
            step_ok = good & okp
            qx = jnp.where(step_ok, qx - dx, qx)
            qy = jnp.where(step_ok, qy - dy, qy)
            return qx, qy, okc & okp

        qx, qy, ok_iter = jax.lax.fori_loop(0, iters, it, (gx0, gy0, tin))
        ok = (valid_ref[i] != 0) & tin & ok_iter & good & (eig >= min_eig)
        out_uv[i, 0] = qx
        out_uv[i, 1] = qy
        out_ok[i] = ok.astype(jnp.int32)
        return carry

    # int32 bounds: python ints under x64 make the loop index s64,
    # and s64->s32 converts cycle forever in the mosaic lowering
    jax.lax.fori_loop(jnp.int32(0), jnp.int32(N), body, jnp.int32(0))


@functools.partial(
    jax.jit, static_argnames=("half", "iters", "min_eig", "interpret")
)
def lk_level_pallas(
    img_prev, img_next, uv_prev, uv_guess, valid,
    half: int = 7, iters: int = 10, min_eig: float = 25.0,
    interpret: bool = False,
):
    """Pallas LK level. Same contract as `klt.lk_level` EXCEPT iteration
    windows are confined to a (patch + 2*{margin}) search slab around the
    initial guess — displacements beyond the margin per level mark the
    track failed (the coarse-to-fine pyramid keeps per-level motion
    small, so real tracks stay inside).
    """.format(margin=_LK_MARGIN)
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    H, W = img_prev.shape
    N = uv_prev.shape[0]
    P2 = 2 * half + 2
    S = P2 + 2 * _LK_MARGIN
    # pad width to a 128 multiple plus one extra slab so the aligned DMA
    # bases stay in range (Mosaic: dynamic lane offsets must be provably
    # 128-aligned)
    W_pad = ((W + 127) // 128) * 128 + 128
    # pad height to an 8 multiple, never below the tallest slab, so the
    # aligned sublane DMA bases stay in [0, H_pad - slab_h] even for
    # pyramid levels shorter than the slab (e.g. 30-row top level of a
    # 240-row image) and for H % 8 != 0 bottom-edge features
    H_pad = max(((H + 7) // 8) * 8, _LK_NSLAB_H)
    pad = W_pad - W
    img_prev = jnp.pad(img_prev, ((0, H_pad - H), (0, pad)))
    img_next = jnp.pad(img_next, ((0, H_pad - H), (0, pad)))

    kern = functools.partial(
        _lk_kernel, N=N, half=half, iters=iters, min_eig=float(min_eig),
        H=H, W=W, H_pad=H_pad, W_pad=W_pad,
    )
    out_uv, out_ok = pl.pallas_call(
        kern,
        out_shape=(
            jax.ShapeDtypeStruct((N, 2), jnp.float32),
            jax.ShapeDtypeStruct((N,), jnp.int32),
        ),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((_LK_TSLAB_H, _LK_SLAB_W), jnp.float32),
            pltpu.VMEM((_LK_NSLAB_H, _LK_SLAB_W), jnp.float32),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(
        uv_prev.astype(jnp.float32),
        uv_guess.astype(jnp.float32),
        valid.astype(jnp.int32),
        img_prev.astype(jnp.float32),
        img_next.astype(jnp.float32),
    )
    return out_uv, out_ok != 0
