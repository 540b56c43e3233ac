"""Pallas TPU kernel: banded masked max-pool.

The inner loop of the banded SA stage (models/fused_sa.py):

    pooled[q, c] = max over n in [q's band] of (|x_n - x_q|^2 <= r^2
                                                ?  u[n, c] : -inf)

The XLA version builds the band by roll+concat in HBM ([T, bw, c] copies)
and trusts fusion for the select+reduce. This kernel instead walks the
sorted arrays directly: for query tile i it reads the contiguous slab
[i*w - half : (i+1)*w + half] of xyz and u straight from the inputs (the
band is a VIEW, never a copy), computes the distance mask on the VPU, and
reduces in VMEM. HBM traffic drops from (2*Kb+1)x to ~2x of the point data.

Grid: (B, T) — one program per query tile.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

_NEG = -1e30  # plain float: jnp scalars become captured tracers in kernels


def _band_max_kernel(xyz_ref, u_ref, q_ref, out_ref, *, radius2, half, w, N):
    """Block shapes:
        xyz_ref [1, N, 3] (full sorted cloud), u_ref [1, N, C],
        q_ref [1, w, 3] (this tile's queries), out_ref [1, w, C].
    """
    i = pl.program_id(1)
    C = u_ref.shape[2]
    bw = w + 2 * half
    # clamp the band window inside [0, N - bw]
    start = jnp.clip(i * w - half, 0, N - bw)
    q = q_ref[0]                                        # [w, 3]

    def body(j, acc):
        # read one 128-row band chunk straight from the refs (Mosaic
        # supports dynamic slices on refs, not on computed arrays)
        off = start + j * 128
        bx = xyz_ref[0, pl.ds(off, 128), :]             # [128, 3]
        bu = u_ref[0, pl.ds(off, 128), :]               # [128, C]
        d2 = (
            jnp.square(q[:, 0:1] - bx[:, 0][None, :])
            + jnp.square(q[:, 1:2] - bx[:, 1][None, :])
            + jnp.square(q[:, 2:3] - bx[:, 2][None, :])
        )                                               # [w, 128]
        # additive f32 mask: Mosaic only supports minor-dim broadcast
        # insertion for 32-bit types (bool masks fail to lower)
        pen = jnp.where(d2 <= radius2, 0.0, _NEG).astype(jnp.float32)
        cand = bu[None, :, :] + pen[:, :, None]         # [w, 128, C]
        return jnp.maximum(acc, jnp.max(cand, axis=1))

    acc0 = jnp.full((w, C), _NEG, jnp.float32)
    acc = jax.lax.fori_loop(0, bw // 128, body, acc0)
    out_ref[0] = acc


@functools.partial(
    jax.jit, static_argnames=("radius", "half", "tile", "interpret")
)
def banded_masked_max(
    sorted_xyz: jax.Array,
    u: jax.Array,
    radius: float,
    half: int,
    tile: int = 128,
    interpret: bool = False,
) -> jax.Array:
    """pooled[b, q, c] = max over n with |x_n - x_q| <= radius (within
    +-half sorted positions) of u[b, n, c].

    sorted_xyz [B, N, 3] (sorted along one axis), u [B, N, C].
    N must... is padded internally to a multiple of tile; half is rounded
    up to a multiple of 128. Returns [B, N, C].
    """
    B, N, _ = sorted_xyz.shape
    C = u.shape[-1]
    w = tile
    # CPU has no Mosaic backend; fall back to the interpreter so the same
    # model config runs everywhere (perf only matters on TPU anyway)
    interpret = interpret or jax.default_backend() == "cpu"
    half = -(-half // 128) * 128
    pad = (-N) % w
    if pad:
        sorted_xyz = jnp.pad(
            sorted_xyz, [(0, 0), (0, pad), (0, 0)], constant_values=1e7
        )
        u = jnp.pad(u, [(0, 0), (0, pad), (0, 0)])
    Np = N + pad
    # the kernel reads a [w + 2*half] slab; make sure it fits
    if Np < w + 2 * half:
        extra = w + 2 * half - Np
        sorted_xyz = jnp.pad(
            sorted_xyz, [(0, 0), (0, extra), (0, 0)], constant_values=1e7
        )
        u = jnp.pad(u, [(0, 0), (0, extra), (0, 0)])
        Np += extra
    T = -(-N // w)

    kernel = functools.partial(
        _band_max_kernel,
        radius2=float(radius) ** 2,
        half=half,
        w=w,
        N=Np,
    )
    out = pl.pallas_call(
        kernel,
        grid=(B, T),
        in_specs=[
            pl.BlockSpec((1, Np, 3), lambda b, i: (b, 0, 0)),
            pl.BlockSpec((1, Np, C), lambda b, i: (b, 0, 0)),
            pl.BlockSpec((1, w, 3), lambda b, i: (b, i, 0)),
        ],
        out_specs=pl.BlockSpec((1, w, C), lambda b, i: (b, i, 0)),
        out_shape=jax.ShapeDtypeStruct((B, T * w, C), jnp.float32),
        interpret=interpret,
    )(
        sorted_xyz.astype(jnp.float32),
        u.astype(jnp.float32),
        sorted_xyz.astype(jnp.float32)[:, : T * w],
    )
    return out[:, :N]
