"""Pallas fused dense-frontend kernel: Gaussian blur + dual-threshold FAST-9 +
3x3 NMS in a single VMEM pass over row tiles. (Orientation moments moved to
the batched per-keypoint patch contraction in ops/descriptors — dense
per-pixel moment maps were ~40% of this kernel's work for ~1000 used pixels.)

The XLA lowering of this stage materializes every intermediate ((16, H, W)
ring stacks, blur passes, pooled maps) to HBM — measured ~3.2 ms per 640x480
level where the memory-bound roof is ~30 us. This kernel DMAs one overlapping
row window (tile + 2*PAD halo) from HBM to VMEM per grid step and keeps the
whole computation in vector registers: the FAST corner test computes the
max-sustaining-threshold response V once (ops/orb.fast_response — circular
sliding-window minima by ring-index doubling) and derives both threshold
maps from it with two compares.

Semantics match ops/orb._separable_blur + _fast_maps + _nms3 on the interior
(border handling differs inside the excluded margin); ORBExtractor uses this
kernel on TPU and keeps the XLA path as fallback.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from orbslam2commentedbyxcm_tpu.ops.orb import _RING, _gauss_kernel

_PAD = 8  # halo: max stencil reach is 4 (blur radius 4; FAST ring 3 + NMS 1)


def _shift(x, dy, dx):
    """out[i, j] = x[i + dy, j + dx] (circular; borders are masked upstream)."""
    out = x
    if dy:
        out = pltpu.roll(out, (-dy) % out.shape[0], axis=0)
    if dx:
        out = pltpu.roll(out, (-dx) % out.shape[1], axis=1)
    return out


def _kernel(
    img_hbm, blur_ref, shi_ref, slo_ref, scratch, sem,
    *, taps, th_hi, th_lo, tile_h, height, width,
):
    i = pl.program_id(0)
    win = tile_h + 2 * _PAD
    cp = pltpu.make_async_copy(img_hbm.at[pl.ds(i * tile_h, win)], scratch, sem)
    cp.start()
    cp.wait()
    x = scratch[:]
    r = len(taps) // 2

    # --- separable Gaussian blur -----------------------------------------
    acc = jnp.zeros_like(x)
    for k in range(len(taps)):
        acc = acc + float(taps[k]) * _shift(x, 0, k - r)
    bl = jnp.zeros_like(x)
    for k in range(len(taps)):
        bl = bl + float(taps[k]) * _shift(acc, k - r, 0)
    blur_ref[:] = bl[_PAD : _PAD + tile_h, :]

    # --- FAST-9 response V, both thresholds from ONE plane ----------------
    # Lane rolls dominate the diff computation: the 16 ring positions share
    # only 7 distinct column offsets, so do 6 lane rolls once (dx = +-1, +-2,
    # +-3) and give each ring position a cheap sublane roll of the shared
    # copy. The corner test + score then use the max-sustaining-threshold
    # response (ops/orb.fast_response): circular sliding-window minima by
    # ring-index doubling, where every "roll" over the ring axis is Python
    # list reindexing of the 16 planes — ~3x fewer VPU ops than the previous
    # per-threshold run-length counters, and th_hi/th_lo become two compares
    # against the same V plane. Everything stays f32: Mosaic on this target
    # supports neither rotates nor comparisons on 16-bit data (both tried).
    from orbslam2commentedbyxcm_tpu.ops.orb import fast_response

    lane = {
        dx: (pltpu.roll(x, (-dx) % x.shape[1], axis=1) if dx else x)
        for dx in (-3, -2, -1, 0, 1, 2, 3)
    }

    def ring_shift(dx, dy):
        v = lane[dx]
        if dy:
            v = pltpu.roll(v, (-dy) % v.shape[0], axis=0)
        return v

    ups = [ring_shift(int(dx), int(dy)) - x for dx, dy in _RING]
    v = fast_response(ups)
    s_hi = jnp.where(v > th_hi, v, 0.0)
    s_lo = jnp.where(v > th_lo, v, 0.0)
    corner_hi = s_hi > 0.0
    corner_lo = s_lo > 0.0

    # interior mask in full-image coordinates
    rows = i * tile_h - _PAD + jax.lax.broadcasted_iota(jnp.int32, x.shape, 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1) - _PAD
    interior = (rows >= 3) & (rows < height - 3) & (cols >= 3) & (cols < width - 3)
    s_hi = jnp.where(corner_hi & interior, s_hi, 0.0)
    s_lo = jnp.where(corner_lo & interior, s_lo, 0.0)

    def nms(s):
        # separable 3x3 max (4 rolls instead of 8; max is separable so the
        # result is identical): pool includes self, s >= pool <=> s is a peak
        m = jnp.maximum(s, jnp.maximum(_shift(s, 0, -1), _shift(s, 0, 1)))
        m = jnp.maximum(m, jnp.maximum(_shift(m, -1, 0), _shift(m, 1, 0)))
        return jnp.where((s >= m) & (s > 0.0), s, 0.0)

    shi_ref[:] = nms(s_hi)[_PAD : _PAD + tile_h, :]
    slo_ref[:] = nms(s_lo)[_PAD : _PAD + tile_h, :]


@functools.partial(jax.jit, static_argnames=("th_hi", "th_lo", "tile_h", "interpret"))
def fused_frontend(
    img: jnp.ndarray, th_hi: float, th_lo: float, tile_h: int | None = None,
    interpret: bool = False,
):
    """(H, W) image -> (blurred, nms_hi, nms_lo), each (H, W)."""
    h, w = img.shape
    if tile_h is None:
        # larger tiles amortize the halo but the kernel's live set scales with
        # tile_h * padded width; stay well under the ~16MB VMEM scoped limit
        # (the shared lane-rolled ring copies raised the live set: 64-row
        # tiles at 768 lanes now overflow the 16M scoped stack)
        tile_h = 64 if w <= 384 else 32
    taps = _gauss_kernel(9, 3.0)
    n_tiles = -(-h // tile_h)
    # rows: _PAD halo on top, bottom padded to n_tiles*tile_h + _PAD
    # cols: _PAD left + right-pad to a 128-lane multiple (DMA slice alignment)
    wp = -(-(w + 2 * _PAD) // 128) * 128
    img_p = jnp.pad(
        img, ((_PAD, n_tiles * tile_h - h + _PAD), (_PAD, wp - w - _PAD)), mode="edge"
    )

    kernel = functools.partial(
        _kernel, taps=taps,
        th_hi=th_hi, th_lo=th_lo, tile_h=tile_h, height=h, width=w,
    )
    blur, s_hi, s_lo = pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=[
            pl.BlockSpec((tile_h, wp), lambda i: (i, 0), memory_space=pltpu.VMEM)
            for _ in range(3)
        ],
        out_shape=[jax.ShapeDtypeStruct((n_tiles * tile_h, wp), jnp.float32)] * 3,
        scratch_shapes=[
            pltpu.VMEM((tile_h + 2 * _PAD, wp), jnp.float32),
            pltpu.SemaphoreType.DMA(()),
        ],
        interpret=interpret,
    )(img_p)
    sl = slice(0, h), slice(_PAD, _PAD + w)
    return blur[sl], s_hi[sl], s_lo[sl]