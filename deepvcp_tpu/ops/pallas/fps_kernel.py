"""Pallas TPU kernel: farthest-point sampling.

The reference's FPS is a Python loop of npoint dependent argmax iterations
(pointnet2_utils.py:63-84). The jnp version (ops/sampling.py) already
compiles it to one on-chip loop; this kernel additionally pins the running
min-distance vector and the cloud in VMEM for the whole loop, so each of
the npoint iterations is pure VPU work with no HBM traffic at all
(N=10k: xyz 120 KB + dist 40 KB, far under the ~16 MB VMEM budget).

Grid: one program per batch element.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _fps_kernel(xyz_ref, out_ref, dist_ref, *, npoint: int, start_idx: int):
    # block shapes: xyz_ref [1, N, 3], out_ref [1, npoint, 1]
    N = xyz_ref.shape[1]
    dist_ref[...] = jnp.full((1, N), jnp.inf, jnp.float32)

    def body(i, far):
        out_ref[0, i, 0] = far
        c = xyz_ref[0, far, :]                                # [3]
        d = (
            (xyz_ref[0, :, 0] - c[0]) ** 2
            + (xyz_ref[0, :, 1] - c[1]) ** 2
            + (xyz_ref[0, :, 2] - c[2]) ** 2
        )                                                     # [N]
        nd = jnp.minimum(dist_ref[0, :], d)
        dist_ref[0, :] = nd
        return jnp.argmax(nd).astype(jnp.int32)

    jax.lax.fori_loop(0, npoint, body, jnp.int32(start_idx))


@functools.partial(jax.jit, static_argnames=("npoint", "start_idx", "interpret"))
def farthest_point_sample_pallas(
    xyz: jax.Array,
    npoint: int,
    start_idx: int = 0,
    interpret: bool = False,
) -> jax.Array:
    """xyz [B, N, 3] -> centroids [B, npoint] int32.

    Matches ops.farthest_point_sample exactly (deterministic start)."""
    B, N, _ = xyz.shape
    # CPU has no Mosaic backend; use the interpreter there
    interpret = interpret or jax.default_backend() == "cpu"

    kernel = functools.partial(
        _fps_kernel, npoint=npoint, start_idx=start_idx
    )
    out = pl.pallas_call(
        kernel,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, N, 3), lambda b: (b, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, npoint, 1), lambda b: (b, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B, npoint, 1), jnp.int32),
        scratch_shapes=[pltpu.VMEM((1, N), jnp.float32)],
        interpret=interpret,
    )(xyz.astype(jnp.float32))
    return out[..., 0]
