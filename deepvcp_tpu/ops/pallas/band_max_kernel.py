"""Pallas TPU kernel: banded masked max-pool with dynamic slab bounds.

The inner loop of the banded SA stage (models/fused_sa.py):

    pooled[q, c] = max over in-radius n (|x_n - x_q|^2 <= r^2)
                   of u[n, c],  candidates drawn from the sorted-axis slab

The XLA banded path must take a WORST-CASE static band (safety x expected
slab occupancy, models/fused_sa.py band_of) because XLA shapes are static;
with window_safety=4 that is ~4x more candidate pairs than the true slab.
This kernel instead computes each query tile's exact slab bounds
[first x >= x_lo, last x <= x_hi] with a searchsorted OUTSIDE the kernel,
prefetches them as scalars (PrefetchScalarGridSpec), and runs a
dynamic-trip-count loop over only the occupied 128-point chunks — the
band is a VMEM view of the resident sorted arrays, never a rolled copy,
and the work is N x slab x C instead of N x band x C.

Layout: features are pre-transposed to [B, C, N] so each chunk read
[C, 128] and the pair tensor [w, C, 128] keep 128 on the minor (lane)
axis; the chunk max reduces over lanes.

Coverage note: the XLA path caps candidates at +-half sorted positions;
this kernel covers the FULL in-radius slab (a superset — exact cap-free
in-radius semantics). Results are identical whenever the static band
covers the slab, which window_for guarantees at the configured extent.

Grid: (B, T) — one program per query tile of `tile` points.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG = -1e30  # plain float: jnp scalars become captured tracers in kernels


def _band_max_kernel(
    lo_ref, n_ref, clip_ref, xyz_ref, ut_ref, q_ref, out_ref,
    *, radius2, w, Np, chunk
):
    """Block shapes:
        lo_ref [B, T] int32 (SMEM, scalar-prefetch): 128-aligned slab start;
        n_ref [B, T] int32: number of 128-point chunks in the slab;
        clip_ref [B, 2*T] int32: per-tile [position-clip lo | hi) pairs,
        interleaved as (lo at 2i, hi at 2i+1) — candidates outside the
        clip range are masked out (used for static-band parity);
        xyz_ref [1, Np, 3] (full sorted cloud), ut_ref [1, C, Np]
        (features, channel-major), q_ref [1, w, 3] (this tile's queries),
        out_ref [1, w, C].
    """
    b = pl.program_id(0)
    i = pl.program_id(1)
    C = ut_ref.shape[1]
    start = lo_ref[b, i]
    clip_lo = clip_ref[b, 2 * i]
    clip_hi = clip_ref[b, 2 * i + 1]
    q = q_ref[0]                                        # [w, 3]

    def chunk_max(off):
        # start is host-aligned to 128 and Np is a multiple of chunk, but
        # Mosaic needs the proof for lane-dim dynamic slices
        off = pl.multiple_of(jnp.minimum(off, Np - chunk), 128)
        bx = xyz_ref[0, pl.ds(off, chunk), :]           # [chunk, 3]
        bu = ut_ref[0, :, pl.ds(off, chunk)]            # [C, chunk]
        d2 = (
            jnp.square(q[:, 0:1] - bx[:, 0][None, :])
            + jnp.square(q[:, 1:2] - bx[:, 1][None, :])
            + jnp.square(q[:, 2:3] - bx[:, 2][None, :])
        )                                               # [w, chunk]
        pos = off + jax.lax.broadcasted_iota(jnp.int32, (1, chunk), 1)
        in_clip = (pos >= clip_lo) & (pos < clip_hi)    # [1, chunk]
        # additive f32 mask: Mosaic only supports minor-dim broadcast
        # insertion for 32-bit types (bool masks fail to lower)
        pen = jnp.where(
            (d2 <= radius2) & in_clip, 0.0, _NEG
        ).astype(jnp.float32)
        cand = bu[None, :, :] + pen[:, None, :]         # [w, C, chunk]
        return jnp.max(cand, axis=-1)

    def body(j, acc):
        # single accumulator chain: a 2-wide unrolled variant measured
        # SLOWER (sa1 0.56 vs 0.45 ms, sa2 1.18 vs 1.09) and its second
        # live [w, C, chunk] block overflows VMEM at C=64 — the loop is
        # not issue-rate-bound.
        return jnp.maximum(acc, chunk_max(start + j * chunk))

    acc0 = jnp.full((w, C), _NEG, jnp.float32)
    n_chunks = (n_ref[b, i] * 128 + chunk - 1) // chunk
    out_ref[0] = jax.lax.fori_loop(0, n_chunks, body, acc0)


@functools.partial(
    jax.jit, static_argnames=("radius", "half", "tile", "chunk", "interpret", "clip_band")
)
def banded_masked_max(
    sorted_xyz: jax.Array,
    u: jax.Array,
    radius: float,
    half: int = 0,
    tile: int = 128,
    chunk: int = 128,
    interpret: bool = False,
    clip_band: Optional[Tuple[int, int]] = None,
) -> jax.Array:
    """pooled[b, q, c] = max over n with |x_n - x_q| <= radius of u[b, n, c].

    sorted_xyz [B, N, 3] (sorted along axis 0 of the coordinate), u
    [B, N, C]. `half` is accepted for API compatibility with the static-band
    XLA path but ignored: slab bounds are computed exactly per query tile
    (see module docstring). Returns [B, N, C] float32.

    clip_band: optional (band_tile, half_tiles) — additionally restrict
    each query's candidates to the STATIC band of the XLA formula
    (fused_sa.xla_banded_max with that tile geometry): positions within
    [band_tile*floor(q/band_tile) - half_tiles*band_tile,
     band_tile*(floor(q/band_tile)+1) + half_tiles*band_tile).
    With it, the result is exactly the XLA static-band function (same
    radius mask over the same candidate range) at kernel speed — used by
    the training forward so the custom-VJP backward (which sweeps that
    static band) sees every forward argmax.
    """
    from deepvcp_tpu.ops.neighbors import searchsorted_batched

    B, N, _ = sorted_xyz.shape
    C = u.shape[-1]
    w = tile
    # CPU has no Mosaic backend; fall back to the interpreter so the same
    # model config runs everywhere (perf only matters on TPU anyway)
    interpret = interpret or jax.default_backend() == "cpu"
    pad = (-N) % w
    if pad:
        sorted_xyz = jnp.pad(
            sorted_xyz, [(0, 0), (0, pad), (0, 0)], constant_values=1e7
        )
        u = jnp.pad(u, [(0, 0), (0, pad), (0, 0)])
    Np = N + pad
    if Np < chunk:  # kernel reads `chunk`-point slabs
        extra = chunk - Np
        sorted_xyz = jnp.pad(
            sorted_xyz, [(0, 0), (0, extra), (0, 0)], constant_values=1e7
        )
        u = jnp.pad(u, [(0, 0), (0, extra), (0, 0)])
        Np += extra
    T = Np // w

    # exact per-tile slab bounds (keys are the sort coordinate, ascending;
    # padding keys are +1e7 so they never extend a real tile's slab)
    key = sorted_xyz[..., 0]                               # [B, Np]
    first = key[:, ::w]                                    # [B, T] tile mins
    last = key[:, w - 1 :: w]                              # [B, T] tile maxs
    lo = searchsorted_batched(key, first - radius)         # [B, T]
    hi = searchsorted_batched(key, last + radius)          # [B, T]
    if clip_band is not None:
        band_tile, half_tiles = clip_band
        # intersect the slab with the static band of each query tile
        # (wrap-around band candidates are out-of-radius by the extent>2r
        # assumption, so clamping to the array range matches XLA's mask);
        # the exact [clip_lo, clip_hi) range is also enforced inside the
        # kernel by a positional mask — the loop bounds alone are 128-
        # aligned and slack-padded, so they can overshoot by <256 points
        xt = (jnp.arange(T, dtype=jnp.int32) * w) // band_tile
        clip_lo = jnp.maximum((xt - half_tiles) * band_tile, 0)
        clip_hi = jnp.minimum((xt + 1 + half_tiles) * band_tile, Np)
        lo = jnp.maximum(lo, clip_lo[None, :])
        hi = jnp.minimum(hi, clip_hi[None, :])
        hi = jnp.maximum(hi, lo)
        clip_lo = jnp.broadcast_to(clip_lo, (B, T))
        clip_hi = jnp.broadcast_to(clip_hi, (B, T))
    else:
        clip_lo = jnp.zeros((B, T), jnp.int32)
        clip_hi = jnp.full((B, T), Np, jnp.int32)
    clip = jnp.stack([clip_lo, clip_hi], axis=-1).reshape(B, 2 * T)
    lo = (lo // 128) * 128
    # +1 chunk of slack against boundary-equal keys; clamp into range
    n128 = jnp.clip((hi - lo + 255) // 128, 1, Np // 128 - lo // 128)

    kernel = functools.partial(
        _band_max_kernel, radius2=float(radius) ** 2, w=w, Np=Np, chunk=chunk
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(B, T),
        in_specs=[
            pl.BlockSpec((1, Np, 3), lambda b, i, *_: (b, 0, 0)),
            pl.BlockSpec((1, C, Np), lambda b, i, *_: (b, 0, 0)),
            pl.BlockSpec((1, w, 3), lambda b, i, *_: (b, i, 0)),
        ],
        out_specs=pl.BlockSpec((1, w, C), lambda b, i, *_: (b, i, 0)),
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, Np, C), jnp.float32),
        interpret=interpret,
    )(
        lo.astype(jnp.int32),
        n128.astype(jnp.int32),
        clip.astype(jnp.int32),
        sorted_xyz.astype(jnp.float32),
        jnp.swapaxes(u.astype(jnp.float32), -1, -2),
        sorted_xyz.astype(jnp.float32),
    )
    return out[:, :N]
