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


_LK_B = 8  # features per batched group (injection where-chains scale ~B^2; 16 measured slower)


def _lk_kernel_batched(
    uv_ref, guess_ref, valid_ref, imgp_hbm, imgn_hbm,
    out_uv, out_ok, tslabA, nslabA, tslabB, nslabB, semTA, semNA, semTB, semNB,
    *, N, half, iters, min_eig, H, W, H_pad, W_pad,
):
    """Feature-BATCHED, double-buffered LK level.

    Groups of _LK_B features are DMA'd into a 3D (B, slab_h, 256) VMEM
    scratch and iterated together, so the per-feature one-hot row /
    column selections become batched MXU dot_generals instead of B
    sequential tiny ones. Two buffer pairs (A/B) pipeline the group
    loop: group g+1's 16 DMAs are issued before group g's compute, so
    HBM latency hides behind the LK iterations (the un-prefetched
    version spent ~60% of its time waiting on DMAs).

    Mosaic survival notes (each constraint cost a failed lowering):
      * the scratch is natively 3D — 2D<->3D reshapes of tiled dims
        fail infer-vector-layout;
      * NO 1D vectors anywhere: per-feature quantities stay SCALARS,
        injected into 3D tensors by where-chains over a batch-index
        iota, and reduced back by masked full-sums (axis reductions to
        (B,1,1) hit 'Invalid input layout');
      * constant matrices are built from iotas inside the kernel
        (captured array constants are rejected), and the row-derivative
        uses a batched dot (a plain contraction would need a 3D
        transpose);
      * cross-iteration DMA waits reconstruct the copy descriptor from
        the same deterministic offsets (only the semaphore count
        matters);
      * scratch leading-index must be int32 (python ints become i64
        memref indices under x64); all scalar arithmetic in explicit
        int32 (weak-s64 converts recurse); bools cast before scalar
        extraction.
    """
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B = _LK_B
    P = 2 * half + 1
    P2 = P + 1
    M = _LK_MARGIN
    S = P2 + 2 * M
    TW = _LK_SLAB_W
    TH, NH = _LK_TSLAB_H, _LK_NSLAB_H
    G = N // B  # wrapper pads N to a multiple of B
    f32 = jnp.float32

    def aligned_base(x0c):
        c128 = jnp.int32(128)
        return (jnp.minimum(x0c, jnp.int32(W_pad - TW)) // c128) * c128

    def aligned_base_row(y0c, slab_h):
        c8 = jnp.int32(8)
        return (jnp.minimum(y0c, jnp.int32(H_pad - slab_h)) // c8) * c8

    # central-difference operators from iotas (D_row3 @ x = row
    # derivative, x @ D_col = lane derivative; exact-zero edges)
    half_p, half_n, zf = jnp.float32(0.5), jnp.float32(-0.5), jnp.float32(0.0)
    ri = jax.lax.broadcasted_iota(jnp.int32, (P, P), 0)
    ci = jax.lax.broadcasted_iota(jnp.int32, (P, P), 1)
    int_c = (ci >= 1) & (ci <= P - 2)
    D_col = jnp.where(int_c & (ri == ci + 1), half_p, zf) + jnp.where(
        int_c & (ri == ci - 1), half_n, zf
    )
    ri3 = jax.lax.broadcasted_iota(jnp.int32, (B, P, P), 1)
    ci3 = jax.lax.broadcasted_iota(jnp.int32, (B, P, P), 2)
    int_r3 = (ri3 >= 1) & (ri3 <= P - 2)
    D_row3 = jnp.where(int_r3 & (ci3 == ri3 + 1), half_p, zf) + jnp.where(
        int_r3 & (ci3 == ri3 - 1), half_n, zf
    )

    NW = 32  # narrowed search-slab lane width (max window ox 12+16 <= 32)
    fP = jax.lax.broadcasted_iota(jnp.int32, (B, P, P), 0)
    fRS = jax.lax.broadcasted_iota(jnp.int32, (B, P2, TH), 0)
    fRS_n = jax.lax.broadcasted_iota(jnp.int32, (B, P2, NH), 0)
    fCS = jax.lax.broadcasted_iota(jnp.int32, (B, TW, P2), 0)
    fCS0 = jax.lax.broadcasted_iota(jnp.int32, (B, TW, NW), 0)
    fCSn = jax.lax.broadcasted_iota(jnp.int32, (B, NW, P2), 0)

    def inject(fi, scalars, dtype):
        out = jnp.zeros(fi.shape, dtype)
        for b in range(B):
            out = jnp.where(fi == jnp.int32(b), scalars[b], out)
        return out

    def batched_blk(slab3, slab_h, lanes, fR, fC, oy_s, ox_s):
        r2 = jax.lax.broadcasted_iota(jnp.int32, (B, P2, slab_h), 1)
        s2 = jax.lax.broadcasted_iota(jnp.int32, (B, P2, slab_h), 2)
        rowsel = (s2 == inject(fR, oy_s, jnp.int32) + r2).astype(f32)
        rows3 = jax.lax.dot_general(
            rowsel, slab3, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=f32,
        )
        c2 = jax.lax.broadcasted_iota(jnp.int32, (B, lanes, P2), 1)
        j2 = jax.lax.broadcasted_iota(jnp.int32, (B, lanes, P2), 2)
        colsel = (c2 == inject(fC, ox_s, jnp.int32) + j2).astype(f32)
        return jax.lax.dot_general(
            rows3, colsel, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=f32,
        )

    def bilinear_b(slab3, slab_h, lanes, fR, fC, oy_s, ox_s, fy_s, fx_s):
        blk = batched_blk(slab3, slab_h, lanes, fR, fC, oy_s, ox_s)
        fx3 = inject(fP, fx_s, f32)
        fy3 = inject(fP, fy_s, f32)
        top = blk[:, :-1, :-1] * (1.0 - fx3) + blk[:, :-1, 1:] * fx3
        bot = blk[:, 1:, :-1] * (1.0 - fx3) + blk[:, 1:, 1:] * fx3
        return top * (1.0 - fy3) + bot * fy3

    def bsums(x):
        return [
            jnp.sum(jnp.where(fP == jnp.int32(b), x, zf)) for b in range(B)
        ]

    def offsets(g):
        """Deterministic per-group scalars (recomputed identically by
        the issue and compute phases)."""
        base = g * jnp.int32(B)
        o = {k: [] for k in (
            "px", "py", "vld", "tin", "tdx", "tdy", "sdx", "sdy",
            "sx0c", "sy0c", "tx_base", "ty_base", "sx_base", "sy_base",
            "gx0", "gy0",
        )}
        for b in range(B):
            i = base + jnp.int32(b)
            px = uv_ref[i, 0]
            py = uv_ref[i, 1]
            gx0 = guess_ref[i, 0]
            gy0 = guess_ref[i, 1]
            o["px"].append(px)
            o["py"].append(py)
            o["gx0"].append(gx0)
            o["gy0"].append(gy0)
            o["vld"].append(valid_ref[i])
            tx0 = jnp.floor(px).astype(jnp.int32) - half
            ty0 = jnp.floor(py).astype(jnp.int32) - half
            o["tin"].append(
                (tx0 >= 0) & (ty0 >= 0) & (tx0 + P2 < W) & (ty0 + P2 < H)
            )
            tx0c = jnp.maximum(jnp.minimum(tx0, jnp.int32(W - P2 - 1)), jnp.int32(0))
            ty0c = jnp.maximum(jnp.minimum(ty0, jnp.int32(H - P2 - 1)), jnp.int32(0))
            o["tx_base"].append(aligned_base(tx0c))
            o["ty_base"].append(aligned_base_row(ty0c, TH))
            o["tdx"].append(tx0c - o["tx_base"][b])
            o["tdy"].append(ty0c - o["ty_base"][b])
            sx0 = jnp.floor(gx0).astype(jnp.int32) - half - M
            sy0 = jnp.floor(gy0).astype(jnp.int32) - half - M
            sx0c = jnp.maximum(jnp.minimum(sx0, jnp.int32(W - S - 1)), jnp.int32(0))
            sy0c = jnp.maximum(jnp.minimum(sy0, jnp.int32(H - S - 1)), jnp.int32(0))
            o["sx0c"].append(sx0c)
            o["sy0c"].append(sy0c)
            o["sx_base"].append(aligned_base(sx0c))
            o["sy_base"].append(aligned_base_row(sy0c, NH))
            o["sdx"].append(sx0c - o["sx_base"][b])
            o["sdy"].append(sy0c - o["sy_base"][b])
        return o

    def copies(o, ts, ns, semT, semN):
        tc = [
            pltpu.make_async_copy(
                imgp_hbm.at[pl.ds(o["ty_base"][b], TH), pl.ds(o["tx_base"][b], TW)],
                ts.at[jnp.int32(b)], semT,
            )
            for b in range(B)
        ]
        nc = [
            pltpu.make_async_copy(
                imgn_hbm.at[pl.ds(o["sy_base"][b], NH), pl.ds(o["sx_base"][b], TW)],
                ns.at[jnp.int32(b)], semN,
            )
            for b in range(B)
        ]
        return tc, nc

    def issue(g, ts, ns, semT, semN):
        tc, nc = copies(offsets(g), ts, ns, semT, semN)
        for cp in tc:
            cp.start()
        for cp in nc:
            cp.start()

    def compute(g, ts, ns, semT, semN):
        o = offsets(g)
        tc, nc = copies(o, ts, ns, semT, semN)
        for cp in tc:
            cp.wait()
        fx_s = [o["px"][b] - jnp.floor(o["px"][b]) for b in range(B)]
        fy_s = [o["py"][b] - jnp.floor(o["py"][b]) for b in range(B)]
        tmpl = bilinear_b(ts[:], TH, TW, fRS, fCS, o["tdy"], o["tdx"], fy_s, fx_s)

        gxg = jax.lax.dot_general(
            tmpl, D_col, (((2,), (0,)), ((), ())), preferred_element_type=f32
        )
        gyg = jax.lax.dot_general(
            D_row3, tmpl, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=f32,
        )
        Gxx = bsums(gxg * gxg)
        Gxy = bsums(gxg * gyg)
        Gyy = bsums(gyg * gyg)
        det, good, safe_det, eig_ok = [], [], [], []
        for b in range(B):
            det.append(Gxx[b] * Gyy[b] - Gxy[b] * Gxy[b])
            good.append(det[b] > 1e-6)
            safe_det.append(jnp.where(good[b], det[b], f32(1.0)))
            eig = 0.5 * (
                Gxx[b] + Gyy[b]
                - jnp.sqrt((Gxx[b] - Gyy[b]) ** 2 + 4.0 * Gxy[b] * Gxy[b])
            )
            eig_ok.append(eig >= min_eig)
        for cp in nc:
            cp.wait()

        # narrow the search slab to NW lanes at each feature's residual
        # lane offset ONCE per group (the one-hot construction on the
        # VPU dominates the per-iteration cost, and it scales with the
        # lane span)
        c0 = jax.lax.broadcasted_iota(jnp.int32, (B, TW, NW), 1)
        j0 = jax.lax.broadcasted_iota(jnp.int32, (B, TW, NW), 2)
        colsel0 = (c0 == inject(fCS0, o["sdx"], jnp.int32) + j0).astype(f32)
        nsmall = jax.lax.dot_general(
            ns[:], colsel0, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=f32,
        )

        sx0c_l, sy0c_l, sdy = o["sx0c"], o["sy0c"], o["sdy"]

        def it(_, st):
            qx = st[0:B]
            qy = st[B : 2 * B]
            okc = st[2 * B : 3 * B]
            oy_s, ox_s, fxs, fys, okp = [], [], [], [], []
            for b in range(B):
                ox = jnp.floor(qx[b]).astype(jnp.int32) - half - sx0c_l[b]
                oy = jnp.floor(qy[b]).astype(jnp.int32) - half - sy0c_l[b]
                okp.append(
                    (ox >= 0) & (oy >= 0) & (ox + P2 <= S) & (oy + P2 <= S)
                )
                oxc = jnp.maximum(jnp.minimum(ox, jnp.int32(S - P2)), jnp.int32(0))
                oyc = jnp.maximum(jnp.minimum(oy, jnp.int32(S - P2)), jnp.int32(0))
                ox_s.append(oxc)  # lane residual folded into nsmall
                oy_s.append(oyc + sdy[b])
                fxs.append(qx[b] - jnp.floor(qx[b]))
                fys.append(qy[b] - jnp.floor(qy[b]))
            cur = bilinear_b(nsmall, NH, NW, fRS_n, fCSn, oy_s, ox_s, fys, fxs)
            err = cur - tmpl
            bx_l = bsums(gxg * err)
            by_l = bsums(gyg * err)
            out = []
            for b in range(B):
                dx = (Gyy[b] * bx_l[b] - Gxy[b] * by_l[b]) / safe_det[b]
                step_ok = good[b] & okp[b]
                out.append(jnp.where(step_ok, qx[b] - dx, qx[b]))
            for b in range(B):
                dy = (Gxx[b] * by_l[b] - Gxy[b] * bx_l[b]) / safe_det[b]
                step_ok = good[b] & okp[b]
                out.append(jnp.where(step_ok, qy[b] - dy, qy[b]))
            for b in range(B):
                out.append(okc[b] & okp[b].astype(jnp.int32))
            return tuple(out)

        init = tuple(
            list(o["gx0"]) + list(o["gy0"])
            + [t.astype(jnp.int32) for t in o["tin"]]
        )
        res = jax.lax.fori_loop(0, iters, it, init)
        base = g * jnp.int32(B)
        for b in range(B):
            okb = (
                (o["vld"][b] != 0)
                & (res[2 * B + b] != 0)
                & o["tin"][b]
                & good[b]
                & eig_ok[b]
            ).astype(jnp.int32)
            out_uv[base + jnp.int32(b), 0] = res[b]
            out_uv[base + jnp.int32(b), 1] = res[B + b]
            out_ok[base + jnp.int32(b)] = okb

    # ---- double-buffered group pipeline ------------------------------
    # prologue: group 0 -> A. pair k: issue(2k+1)->B, compute(2k)<-A,
    # issue(2k+2)->A, compute(2k+1)<-B. Clamped indices keep issue/wait
    # counts balanced when G is odd (duplicate computes write identical
    # values). epilogue: drain the final pending A issue.
    gmax = jnp.int32(G - 1)
    issue(jnp.int32(0), tslabA, nslabA, semTA, semNA)

    def pair(k, carry):
        g0 = jnp.int32(2) * k
        issue(jnp.minimum(g0 + 1, gmax), tslabB, nslabB, semTB, semNB)
        compute(g0, tslabA, nslabA, semTA, semNA)
        issue(jnp.minimum(g0 + 2, gmax), tslabA, nslabA, semTA, semNA)
        compute(jnp.minimum(g0 + 1, gmax), tslabB, nslabB, semTB, semNB)
        return carry

    K = (G + 1) // 2
    jax.lax.fori_loop(jnp.int32(0), jnp.int32(K), pair, jnp.int32(0))
    # drain the last issue into A (group index min(2K, G-1))
    o_last = offsets(jnp.minimum(jnp.int32(2 * K), gmax))
    tc, nc = copies(o_last, tslabA, nslabA, semTA, semNA)
    for cp in tc:
        cp.wait()
    for cp in nc:
        cp.wait()


@functools.partial(
    jax.jit, static_argnames=("half", "iters", "min_eig", "interpret", "batched")
)
def lk_level_pallas(
    img_prev, img_next, uv_prev, uv_guess, valid,
    half: int = 7, iters: int = 10, min_eig: float = 25.0,
    interpret: bool = False, batched: bool = True,
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

    # feature-batched kernel: pad N to a multiple of the group size
    # (padding rows are valid=False and clamped to safe coordinates)
    Np = N
    if batched:
        Np = -(-N // _LK_B) * _LK_B
        if Np != N:
            padn = Np - N
            safe = jnp.full((padn, 2), float(half + 8), jnp.float32)
            uv_prev = jnp.concatenate([uv_prev.astype(jnp.float32), safe])
            uv_guess = jnp.concatenate([uv_guess.astype(jnp.float32), safe])
            valid = jnp.concatenate([valid, jnp.zeros((padn,), bool)])

    kern = functools.partial(
        _lk_kernel_batched if batched else _lk_kernel,
        N=Np, half=half, iters=iters, min_eig=float(min_eig),
        H=H, W=W, H_pad=H_pad, W_pad=W_pad,
    )
    out_uv, out_ok = pl.pallas_call(
        kern,
        out_shape=(
            jax.ShapeDtypeStruct((Np, 2), jnp.float32),
            jax.ShapeDtypeStruct((Np,), jnp.int32),
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
        scratch_shapes=(
            [
                # batched kernel: TWO natively-3D buffer pairs (A/B) for
                # the double-buffered group prefetch (2D<->3D reshapes
                # of tiled dims fail mosaic's infer-vector-layout, hence
                # 3D scratch rather than stacked 2D)
                pltpu.VMEM((_LK_B, _LK_TSLAB_H, _LK_SLAB_W), jnp.float32),
                pltpu.VMEM((_LK_B, _LK_NSLAB_H, _LK_SLAB_W), jnp.float32),
                pltpu.VMEM((_LK_B, _LK_TSLAB_H, _LK_SLAB_W), jnp.float32),
                pltpu.VMEM((_LK_B, _LK_NSLAB_H, _LK_SLAB_W), jnp.float32),
                pltpu.SemaphoreType.DMA,
                pltpu.SemaphoreType.DMA,
                pltpu.SemaphoreType.DMA,
                pltpu.SemaphoreType.DMA,
            ]
            if batched
            else [
                pltpu.VMEM((_LK_TSLAB_H, _LK_SLAB_W), jnp.float32),
                pltpu.VMEM((_LK_NSLAB_H, _LK_SLAB_W), jnp.float32),
                pltpu.SemaphoreType.DMA,
                pltpu.SemaphoreType.DMA,
            ]
        ),
        interpret=interpret,
    )(
        uv_prev.astype(jnp.float32),
        uv_guess.astype(jnp.float32),
        valid.astype(jnp.int32),
        img_prev.astype(jnp.float32),
        img_next.astype(jnp.float32),
    )
    return out_uv[:N], out_ok[:N] != 0
