"""Pallas TPU kernel: fused FAST-16-9 corner score + 3x3 NMS.

One VMEM-resident pass computes, per row-tile: the 16 ring differences,
segment-of-9 contiguity (16-bit rotate/AND trick), dual-threshold SAD
response, and 3x3 non-max suppression — without materializing any of the
17 intermediate (H, W) images in HBM that the XLA formulation round-trips.

Layout: the caller pads the image by HALO=4 on every side (circle radius 3
+ 1 NMS ring) and pads width to a lane multiple; the grid tiles rows, each
program reading an overlapping (TILE+8, W) block and writing (TILE, W).

Numerics match ops/fast.py exactly (same formulas); the equivalence test
runs both paths. Falls back to the XLA path off-TPU (interpret mode is too
slow for tests, and XLA-CPU fuses this fine anyway).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from orbslam3_tpu.ops.fast import CIRCLE

HALO = 4  # 3 px Bresenham circle + 1 px NMS ring


def _kernel(hbm_ref, out_ref, *, thr_hi: float, thr_lo: float, tile: int):
    TH = tile
    W = out_ref.shape[1]

    def body(scratch, sem):
        i = pl.program_id(0)
        # overlapping halo read: rows [i*tile, i*tile + tile + 2*HALO)
        dma = pltpu.make_async_copy(
            hbm_ref.at[pl.ds(i * TH, TH + 2 * HALO), :], scratch, sem
        )
        dma.start()
        dma.wait()
        out_ref[:] = _compute(scratch[:], thr_hi, thr_lo, TH, W)

    pl.run_scoped(
        body,
        scratch=pltpu.VMEM((TH + 2 * HALO, W), jnp.float32),
        sem=pltpu.SemaphoreType.DMA(()),
    )


def _kernel_batched(hbm_ref, out_ref, *, thr_hi: float, thr_lo: float,
                    tile: int):
    """Grid (B, rows): same as _kernel with a leading batch coordinate.
    Needed because pl.BlockSpec in ANY memory space cannot be vmapped —
    the stereo pair (and any batched caller) runs this variant instead."""
    TH = tile
    W = out_ref.shape[2]

    def body(scratch, sem):
        b = pl.program_id(0)
        i = pl.program_id(1)
        dma = pltpu.make_async_copy(
            hbm_ref.at[b, pl.ds(i * TH, TH + 2 * HALO), :], scratch, sem
        )
        dma.start()
        dma.wait()
        out_ref[0] = _compute(scratch[:], thr_hi, thr_lo, TH, W)

    pl.run_scoped(
        body,
        scratch=pltpu.VMEM((TH + 2 * HALO, W), jnp.float32),
        sem=pltpu.SemaphoreType.DMA(()),
    )


def _compute(img, thr_hi, thr_lo, TH, W):

    def score_at(thr):
        # score for rows [HALO-1, HALO+TH+1) x full width: the +-1 ring the
        # NMS needs. Static slices only.
        ctr = img[HALO - 1 : HALO + TH + 1, :]
        bright_bits = jnp.zeros(ctr.shape, jnp.int32)
        dark_bits = jnp.zeros(ctr.shape, jnp.int32)
        sad_b = jnp.zeros(ctr.shape, jnp.float32)
        sad_d = jnp.zeros(ctr.shape, jnp.float32)
        for i, (dy, dx) in enumerate(CIRCLE):
            dy, dx = int(dy), int(dx)
            # shifted ring sample: rows offset by dy, cols by dx (clamped to
            # the block edge in x; the caller's x-halo makes interior exact)
            rows = img[HALO - 1 + dy : HALO + TH + 1 + dy, :]
            # column shift via circular roll: the wrapped columns land in
            # the HALO margin, which the caller crops away
            sh = pltpu.roll(rows, (-dx) % rows.shape[1], 1) if dx else rows
            diff = sh - ctr
            bright_bits |= (diff > thr).astype(jnp.int32) << i
            dark_bits |= (diff < -thr).astype(jnp.int32) << i
            sad_b += jnp.maximum(diff - thr, 0.0)
            sad_d += jnp.maximum(-diff - thr, 0.0)

        def seg9(bits):
            acc = bits
            for k in range(1, 9):
                acc &= ((bits << k) | (bits >> (16 - k))) & 0xFFFF
            return acc != 0

        corner = seg9(bright_bits) | seg9(dark_bits)
        return jnp.where(corner, jnp.maximum(sad_b, sad_d), 0.0)

    s = jnp.maximum(score_at(thr_hi), score_at(thr_lo) * 1e-3)  # (TH+2, W)

    # 3x3 NMS on the interior rows
    ctr = s[1 : TH + 1, :]
    mx = ctr
    for dy in (-1, 0, 1):
        rows = s[1 + dy : TH + 1 + dy, :]
        for dx in (-1, 0, 1):
            sh = pltpu.roll(rows, (-dx) % rows.shape[1], 1) if dx else rows
            mx = jnp.maximum(mx, sh)
    return jnp.where(ctr >= mx, ctr, 0.0)


@partial(jax.jit, static_argnames=("thr_hi", "thr_lo", "tile"))
def fast_nms_pallas(img, thr_hi: float = 20.0, thr_lo: float = 7.0, tile: int = 64):
    """(H, W) f32 -> (H, W) NMS'd dual-threshold FAST score (TPU Pallas).

    H is padded internally to a tile multiple, W to a lane multiple of 128.
    """
    h, w = img.shape
    hp = (-h) % tile
    # total width (halo included) must be lane-aligned for the DMA slices
    WT = -(-(w + 2 * HALO) // 128) * 128
    padded = jnp.pad(img, ((HALO, HALO + hp), (HALO, WT - w - HALO)), mode="edge")
    Hp = h + hp

    grid = (Hp // tile,)
    out = pl.pallas_call(
        partial(_kernel, thr_hi=thr_hi, thr_lo=thr_lo, tile=tile),
        out_shape=jax.ShapeDtypeStruct((Hp, WT), jnp.float32),
        grid=grid,
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],  # stays in HBM; halo DMA'd
        out_specs=pl.BlockSpec((tile, WT), lambda i: (i, 0), memory_space=pltpu.VMEM),
    )(padded)
    return out[:h, HALO : HALO + w]


@partial(jax.jit, static_argnames=("thr_hi", "thr_lo", "tile"))
def fast_nms_pallas_batch(imgs, thr_hi: float = 20.0, thr_lo: float = 7.0,
                          tile: int = 64):
    """(B, H, W) f32 -> (B, H, W) batched variant of fast_nms_pallas.

    One pallas_call with grid (B, rows) — the ANY-memory-space input spec
    is incompatible with vmap, so batching is explicit here."""
    b, h, w = imgs.shape
    hp = (-h) % tile
    WT = -(-(w + 2 * HALO) // 128) * 128
    padded = jnp.pad(
        imgs, ((0, 0), (HALO, HALO + hp), (HALO, WT - w - HALO)), mode="edge"
    )
    Hp = h + hp

    out = pl.pallas_call(
        partial(_kernel_batched, thr_hi=thr_hi, thr_lo=thr_lo, tile=tile),
        out_shape=jax.ShapeDtypeStruct((b, Hp, WT), jnp.float32),
        grid=(b, Hp // tile),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec(
            (1, tile, WT), lambda bi, i: (bi, i, 0), memory_space=pltpu.VMEM
        ),
    )(padded)
    return out[:, :h, HALO : HALO + w]
