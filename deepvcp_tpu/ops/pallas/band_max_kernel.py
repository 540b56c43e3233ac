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

`banded_masked_max_grad` is the matching backward: because the in-radius
relation is symmetric along the sort axis, the gradient receivers' slab
bounds are the same searchsorted pass, and the transpose is the same
dynamic-trip sweep accumulating an argmax-indicator sum instead of a max.
Training therefore runs the exact-slab kernel in BOTH directions — no
static-band clipping anywhere (the round-1 design clipped the training
forward so the XLA static-band backward saw every argmax).

Grid: (B, T) — one program per query tile of `tile` points.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG = -1e30  # plain float: jnp scalars become captured tracers in kernels


def _band_max_kernel(
    lo_ref, n_ref, xyz_ref, ut_ref, q_ref, out_ref,
    *, radius2, w, Np, chunk
):
    """Block shapes:
        lo_ref [B, T] int32 (SMEM, scalar-prefetch): 128-aligned slab start;
        n_ref [B, T] int32: number of 128-point chunks in the slab;
        xyz_ref [1, Np, 3] (full sorted cloud), ut_ref [1, C, Np]
        (features, channel-major), q_ref [1, w, 3] (this tile's queries),
        out_ref [1, w, C].
    """
    b = pl.program_id(0)
    i = pl.program_id(1)
    C = ut_ref.shape[1]
    start = lo_ref[b, i]
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
        # additive f32 mask: Mosaic only supports minor-dim broadcast
        # insertion for 32-bit types (bool masks fail to lower)
        pen = jnp.where(d2 <= radius2, 0.0, _NEG).astype(jnp.float32)
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


def _slab_bounds(key: jax.Array, radius: float, w: int) -> Tuple[jax.Array, jax.Array]:
    """Per-tile exact slab bounds over a sorted key array.

    key [B, Np] ascending (padding = +1e7). Returns (lo [B, T] 128-aligned
    slab starts, n128 [B, T] slab length in 128-point units). The upper
    bound uses nextafter(last + radius) so boundary-equal keys (points at
    distance exactly r along the sort axis) are included — lower_bound of
    last + radius itself would exclude them (review finding)."""
    from deepvcp_tpu.ops.neighbors import searchsorted_batched

    Np = key.shape[-1]
    first = key[:, ::w]                                    # [B, T] tile mins
    last = key[:, w - 1 :: w]                              # [B, T] tile maxs
    lo = searchsorted_batched(key, first - radius)         # [B, T]
    hi = searchsorted_batched(
        key, jnp.nextafter(last + radius, jnp.inf)
    )                                                      # [B, T]
    lo = (lo // 128) * 128
    n128 = jnp.clip((hi - lo + 127) // 128, 1, Np // 128 - lo // 128)
    return lo.astype(jnp.int32), n128.astype(jnp.int32)


def _pad_sorted(arrays, N: int, w: int, chunk: int):
    """Pad [B, N, *] arrays to Np = the next multiple of lcm(w, 128) that
    is >= chunk: a multiple of w so tiles divide evenly, of 128 so the
    kernel's clamped chunk offsets (min(off, Np - chunk), chunk a multiple
    of 128) keep their 128-alignment proof, and >= chunk so slab reads are
    in range. The first array is the sorted cloud (padding key +1e7, never
    extends a real slab); the rest pad with zeros. Returns (list, Np)."""
    import math

    align = math.lcm(w, 128)
    Np = max(-(-N // align) * align, -(-chunk // align) * align)
    pad = Np - N
    if pad == 0:
        return list(arrays), Np
    out = []
    for j, a in enumerate(arrays):
        out.append(
            jnp.pad(
                a,
                [(0, 0), (0, pad), (0, 0)],
                constant_values=1e7 if j == 0 else 0.0,
            )
        )
    return out, Np


@functools.partial(
    jax.jit, static_argnames=("radius", "half", "tile", "chunk", "interpret")
)
def banded_masked_max(
    sorted_xyz: jax.Array,
    u: jax.Array,
    radius: float,
    half: int = 0,
    tile: int = 128,
    chunk: int = 128,
    interpret: bool = False,
) -> jax.Array:
    """pooled[b, q, c] = max over n with |x_n - x_q| <= radius of u[b, n, c].

    sorted_xyz [B, N, 3] (sorted along axis 0 of the coordinate), u
    [B, N, C]. `half` is accepted for API compatibility with the static-band
    XLA path but ignored: slab bounds are computed exactly per query tile
    (see module docstring). Returns [B, N, C] float32.
    """
    B, N, _ = sorted_xyz.shape
    C = u.shape[-1]
    w = tile
    # CPU has no Mosaic backend; fall back to the interpreter so the same
    # model config runs everywhere (perf only matters on TPU anyway)
    interpret = interpret or jax.default_backend() == "cpu"
    (sorted_xyz, u), Np = _pad_sorted((sorted_xyz, u), N, w, chunk)
    T = Np // w

    # exact per-tile slab bounds (keys are the sort coordinate, ascending)
    lo, n128 = _slab_bounds(sorted_xyz[..., 0], radius, w)

    kernel = functools.partial(
        _band_max_kernel, radius2=float(radius) ** 2, w=w, Np=Np, chunk=chunk
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
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
        lo,
        n128,
        sorted_xyz.astype(jnp.float32),
        jnp.swapaxes(u.astype(jnp.float32), -1, -2),
        sorted_xyz.astype(jnp.float32),
    )
    return out[:, :N]


def _band_max_grad_kernel(
    lo_ref, n_ref, xyz_ref, gt_ref, outt_ref, nxyz_ref, nu_ref, grad_ref,
    *, radius2, w, Np, chunk
):
    """Transpose sweep of _band_max_kernel. For each point tile (the
    gradient RECEIVERS n), sweep the slab of queries q that can see it —
    the in-radius relation is symmetric along the sort axis, so the bounds
    are the same _slab_bounds — and accumulate

        grad_u[n, c] = sum_q g[q, c] * [d2(n, q) <= r2][u[n, c] == out[q, c]]

    Block shapes: lo_ref/n_ref [B, T] int32 scalar-prefetch; xyz_ref
    [1, Np, 3] (resident; chunk reads give query positions); gt_ref /
    outt_ref [1, C, Np] (cotangent g and forward output, channel-major);
    nxyz_ref [1, w, 3] and nu_ref [1, w, C] (this tile's points);
    grad_ref [1, w, C] output."""
    b = pl.program_id(0)
    i = pl.program_id(1)
    C = gt_ref.shape[1]
    start = lo_ref[b, i]
    nx = nxyz_ref[0]                                    # [w, 3]
    nu = nu_ref[0]                                      # [w, C]

    def chunk_grad(loff):
        # Clamping the last overflowing chunk back to Np - chunk re-reads
        # queries the previous chunk already summed. The forward's max is
        # idempotent under re-reads; this sum is NOT — zero the re-read
        # columns (logical position < the unclamped offset) so each query
        # contributes exactly once (round-2 advisor finding: chunk=256
        # double-counted the overlap whenever a slab ended at Np with an
        # odd number of 128-point units).
        off = pl.multiple_of(jnp.minimum(loff, Np - chunk), 128)
        col = jax.lax.broadcasted_iota(jnp.int32, (1, chunk), 1)
        fresh = jnp.where(col + off >= loff, 1.0, 0.0).astype(jnp.float32)
        qx = xyz_ref[0, pl.ds(off, chunk), :]           # [chunk, 3]
        qg = gt_ref[0, :, pl.ds(off, chunk)]            # [C, chunk]
        qo = outt_ref[0, :, pl.ds(off, chunk)]          # [C, chunk]
        d2 = (
            jnp.square(nx[:, 0:1] - qx[:, 0][None, :])
            + jnp.square(nx[:, 1:2] - qx[:, 1][None, :])
            + jnp.square(nx[:, 2:3] - qx[:, 2][None, :])
        )                                               # [w, chunk]
        # f32 indicator masks (bool broadcast insertion does not lower)
        inr = jnp.where(d2 <= radius2, 1.0, 0.0).astype(jnp.float32)
        inr = inr * fresh                               # [w, chunk]
        took = jnp.where(
            nu[:, :, None] == qo[None, :, :], 1.0, 0.0
        ).astype(jnp.float32)                           # [w, C, chunk]
        # ties (several n at the query's max) each receive the full
        # cotangent — identical to the XLA indicator sweep's convention
        return jnp.sum(qg[None, :, :] * took * inr[:, None, :], axis=-1)

    def body(j, acc):
        return acc + chunk_grad(start + j * chunk)

    acc0 = jnp.zeros((w, C), jnp.float32)
    n_chunks = (n_ref[b, i] * 128 + chunk - 1) // chunk
    grad_ref[0] = jax.lax.fori_loop(0, n_chunks, body, acc0)


@functools.partial(
    jax.jit, static_argnames=("radius", "tile", "chunk", "interpret")
)
def banded_masked_max_grad(
    sorted_xyz: jax.Array,
    u: jax.Array,
    out: jax.Array,
    g: jax.Array,
    radius: float,
    tile: int = 128,
    chunk: int = 256,
    interpret: bool = False,
) -> jax.Array:
    """VJP of banded_masked_max w.r.t. u (the pooled max's transpose).

    sorted_xyz [B, N, 3], u [B, N, C] (forward input), out [B, N, C]
    (forward output), g [B, N, C] (cotangent). Returns grad_u [B, N, C]
    float32. The default chunk is half the forward's: the inner sweep keeps
    one more [w, C, chunk] block live (indicator + product) than the
    forward's single masked-max block, and VMEM is the binding constraint
    at C=64.
    """
    B, N, _ = sorted_xyz.shape
    C = u.shape[-1]
    w = tile
    interpret = interpret or jax.default_backend() == "cpu"
    (sorted_xyz, u, out, g), Np = _pad_sorted(
        (sorted_xyz, u, out, g), N, w, chunk
    )
    T = Np // w

    lo, n128 = _slab_bounds(sorted_xyz[..., 0], radius, w)

    kernel = functools.partial(
        _band_max_grad_kernel,
        radius2=float(radius) ** 2, w=w, Np=Np, chunk=chunk,
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(B, T),
        in_specs=[
            pl.BlockSpec((1, Np, 3), lambda b, i, *_: (b, 0, 0)),
            pl.BlockSpec((1, C, Np), lambda b, i, *_: (b, 0, 0)),
            pl.BlockSpec((1, C, Np), lambda b, i, *_: (b, 0, 0)),
            pl.BlockSpec((1, w, 3), lambda b, i, *_: (b, i, 0)),
            pl.BlockSpec((1, w, C), lambda b, i, *_: (b, i, 0)),
        ],
        out_specs=pl.BlockSpec((1, w, C), lambda b, i, *_: (b, i, 0)),
    )
    grad = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, Np, C), jnp.float32),
        interpret=interpret,
    )(
        lo,
        n128,
        sorted_xyz.astype(jnp.float32),
        jnp.swapaxes(g.astype(jnp.float32), -1, -2),
        jnp.swapaxes(out.astype(jnp.float32), -1, -2),
        sorted_xyz.astype(jnp.float32),
        u.astype(jnp.float32),
    )
    return grad[:, :N]
