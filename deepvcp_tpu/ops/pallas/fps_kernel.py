"""Pallas TPU kernel: farthest-point sampling.

The reference's FPS is a Python loop of npoint dependent argmax iterations
(pointnet2_utils.py:63-84). The jnp version (ops/sampling.py) already
compiles it to one on-chip loop; this kernel additionally pins the cloud
and the running min-distance vector in VMEM for the whole loop, so each of
the npoint iterations is pure VPU work with no HBM traffic at all
(N=10k: xyz [8, N] lane-major ~320 KB + dist [8, N] ~320 KB, far under
the ~16 MB VMEM budget). This is the product path of
ops.farthest_point_sample on TPU (auto-dispatch; DEEPVCP_FPS_PALLAS=0
env kills it), which the model's salient_fps keypoint selection uses.

Mosaic lowering constraints shape the implementation (earlier versions
stored scalars to VMEM, did data-dependent row gathers, and used
non-(8,128)-aligned blocks, all of which the TPU lowering rejects):

- every block is (8, 128)-aligned: xyz rides as [8, Npad] (rows 0-2 =
  x/y/z, rest zero; a [N, 3] block would also pad the 3-wide minor dim
  to 128 lanes — the layout hazard documented in CLAUDE.md), the index
  output as [8, Kpad] (row 0 read back);
- the selected index is written as a one-hot vector merge into the
  output tile (vector store), not a scalar store;
- the new centroid's coordinates are read with a masked lane reduction
  (sum of onehot * row), not a dynamic gather;
- argmax is two full-tile reductions (max, then min index at the max) —
  first-max tie-breaking, identical to jnp.argmax.

Grid: one program per batch element.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _fps_kernel(xyz_ref, out_ref, dist_ref, *, npoint: int, n_valid: int,
                start_idx: int):
    # block shapes: xyz_ref [1, 8, Npad], out_ref [1, 8, Kpad],
    # dist_ref [8, Npad] (all rows carry the same values)
    Npad = xyz_ref.shape[2]
    Kpad = out_ref.shape[2]
    x = xyz_ref[0, 0:1, :]                                   # [1, Npad]
    y = xyz_ref[0, 1:2, :]
    z = xyz_ref[0, 2:3, :]
    iota_n = jax.lax.broadcasted_iota(jnp.int32, (1, Npad), 1)
    iota_n8 = jax.lax.broadcasted_iota(jnp.int32, (8, Npad), 1)
    valid8 = iota_n8 < n_valid
    iota_k8 = jax.lax.broadcasted_iota(jnp.int32, (8, Kpad), 1)
    dist_ref[...] = jnp.full((8, Npad), jnp.inf, jnp.float32)
    out_ref[0] = jnp.zeros((8, Kpad), jnp.int32)

    def body(i, far):
        out_ref[0] = jnp.where(iota_k8 == i, far, out_ref[0])
        sel = jnp.where(iota_n == far, 1.0, 0.0)             # one-hot
        cx = jnp.sum(sel * x)
        cy = jnp.sum(sel * y)
        cz = jnp.sum(sel * z)
        d = (x - cx) ** 2 + (y - cy) ** 2 + (z - cz) ** 2    # [1, Npad]
        nd = jnp.minimum(dist_ref[...], jnp.broadcast_to(d, (8, Npad)))
        dist_ref[...] = nd
        scored = jnp.where(valid8, nd, -jnp.inf)
        m = jnp.max(scored)
        # first index attaining the max == jnp.argmax tie semantics
        return jnp.min(
            jnp.where(scored == m, iota_n8, Npad)
        ).astype(jnp.int32)

    jax.lax.fori_loop(0, npoint, body, jnp.int32(start_idx))


def _ceil_to(v: int, m: int) -> int:
    return (v + m - 1) // m * m


@functools.partial(jax.jit, static_argnames=("npoint", "start_idx", "interpret"))
def farthest_point_sample_pallas(
    xyz: jax.Array,
    npoint: int,
    start_idx: int = 0,
    interpret: bool = False,
) -> jax.Array:
    """xyz [B, N, 3] -> centroids [B, npoint] int32.

    Matches ops.farthest_point_sample exactly (deterministic start, same
    first-max tie-breaking)."""
    B, N, _ = xyz.shape
    # CPU has no Mosaic backend; use the interpreter there
    interpret = interpret or jax.default_backend() == "cpu"
    Npad = _ceil_to(N, 128)
    Kpad = _ceil_to(npoint, 128)

    kernel = functools.partial(
        _fps_kernel, npoint=npoint, n_valid=N, start_idx=start_idx
    )
    xyz_t = jnp.swapaxes(xyz.astype(jnp.float32), 1, 2)      # [B, 3, N]
    xyz_p = jnp.zeros((B, 8, Npad), jnp.float32)
    xyz_p = xyz_p.at[:, :3, :N].set(xyz_t)
    out = pl.pallas_call(
        kernel,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, 8, Npad), lambda b: (b, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, 8, Kpad), lambda b: (b, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B, 8, Kpad), jnp.int32),
        scratch_shapes=[pltpu.VMEM((8, Npad), jnp.float32)],
        interpret=interpret,
    )(xyz_p)
    return out[:, 0, :npoint]
