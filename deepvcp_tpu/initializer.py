"""Global SO(3) initializer: coarse alignment for unrestricted rotations.

The DeepVCP network is a LOCAL refiner — its candidate grid reaches
+/-search_radius around the warm-started keypoints, and the Siamese
matching is canonicalized by the init rotation (D14), so a full-SO(3)
pair with identity init is unanswerable by construction (measured:
GT-free RRE ~136 deg on the full_so3 held set, campaign_r4 R1). The
reference shares the limitation (it evaluates from the ground-truth
pose, train.py:104-105, so the question never arises there). This
module finishes the "works on unlabeled cloud pairs" contract
(registration.py:1-10): bring any pair into the refiner's basin.

TPU-first design — no RANSAC hypothesis loops or data-dependent
control flow; everything is a dense batched scoring problem:

  1. subsample both clouds (FPS for coverage, ops/sampling.py);
  2. center both (the rotation search runs about the centroids —
     for overlapping clouds the centroid difference absorbs most of
     the translation);
  3. score a FIXED super-Fibonacci rotation grid (Alexa, CVPR 2022:
     near-optimal SO(3) covering; ~25 deg covering radius at 512
     samples) by the trimmed mean nearest-neighbor distance of the
     rotated source subsample into the target subsample — one
     [G*S, T] distance tile that rides the MXU;
  4. take the top-P rotations and run a few trimmed-NN Kabsch (ICP)
     iterations from each — `lax.scan` over a static iteration count,
     every hypothesis batched together;
  5. return the hypothesis with the best final trimmed score.

The returned pose feeds Registrar / CascadeRegistrar as (R_init,
t_init); their guard then scores it as column 0, so a pathological
init can never worsen the cascade's output.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from deepvcp_tpu.ops.distance import square_distance
from deepvcp_tpu.ops.kabsch import kabsch
from deepvcp_tpu.ops.sampling import farthest_point_sample


class GlobalInit(NamedTuple):
    R: jax.Array       # [B, 3, 3] coarse rotation
    t: jax.Array       # [B, 3] coarse translation
    score: jax.Array   # [B] final trimmed-NN score of the chosen pose


def super_fibonacci_rotations(n: int, dtype=jnp.float32) -> jax.Array:
    """n near-uniformly covering rotations [n, 3, 3] (super-Fibonacci
    spirals, Alexa CVPR 2022 — the S^3 analogue of the golden-ratio
    sphere spiral; deterministic, no RNG)."""
    import numpy as np

    # host-side f64 (the grid is a jit-closed constant; device f32
    # would wobble the quaternion normalization at large n)
    s = np.arange(n, dtype=np.float64) + 0.5
    phi = 1.533751168755204288118041  # psi: the positive root of x^4=x+4
    r = np.sqrt(s / n)
    rr = np.sqrt(1.0 - s / n)
    alpha = 2.0 * np.pi * s / np.sqrt(2.0)
    beta = 2.0 * np.pi * s / phi
    q = np.stack([r * np.sin(alpha), r * np.cos(alpha),
                  rr * np.sin(beta), rr * np.cos(beta)], axis=-1)
    q = q / np.linalg.norm(q, axis=-1, keepdims=True)
    w, x, y, z = q[:, 0], q[:, 1], q[:, 2], q[:, 3]
    R = np.stack([
        1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y),
        2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x),
        2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y),
    ], axis=-1).reshape(n, 3, 3)
    return jnp.asarray(R, dtype=dtype)


def _trimmed_score(d2_min: jax.Array, keep: int) -> jax.Array:
    """Mean of the `keep` smallest per-row squared NN distances
    (robust to partial overlap). d2_min: [..., S] -> [...]."""
    neg, _ = jax.lax.top_k(-d2_min, keep)
    return jnp.mean(jnp.maximum(-neg, 0.0), axis=-1)


@functools.partial(
    jax.jit,
    static_argnames=("n_rotations", "n_src", "n_tgt", "top_p",
                     "icp_iters", "inlier_ratio", "sweep_chunk"),
)
def so3_global_init(
    src: jax.Array,
    tgt: jax.Array,
    n_rotations: int = 2048,
    n_src: int = 96,
    n_tgt: int = 4096,
    top_p: int = 16,
    icp_iters: int = 6,
    inlier_ratio: float = 0.7,
    sweep_chunk: int = 64,
) -> GlobalInit:
    """Coarse global alignment of [B, N, 3(+C)] cloud pairs.

    Grid sizing: ICP's basin on structure-poor (near-isotropic) clouds
    is roughly the rotation that displaces points by one NN spacing —
    ~25 deg at 512 subsampled points of a unit cloud — so the sweep
    must cover SO(3) to at least that radius. 2048 super-Fibonacci
    samples cover to ~17 deg (measured by the basin test); anisotropic
    real clouds are easier. The sweep is chunked (`sweep_chunk`
    rotations per lax.map step) to bound the [B, cg*S, T] distance
    tile; total MXU work at the defaults is ~2.4 GFLOP per batch
    element — milliseconds on a v5e, comparable to one FE pass.

    TARGET-DENSITY CONTRACT (round-5 campaign W4 failure, fixed): the
    score's noise floor is the target subsample's own NN spacing
    ~ (cloud_volume / n_tgt)^(1/3), and the rotation signal at the
    grid's covering radius is ~ 2 sin(8.5 deg) * cloud_rms. With the
    old default n_tgt=1024 on an N=10k cloud the floor matched the
    signal and the sweep returned noise (114 deg on the held
    full-SO(3) protocol); n_tgt must stay >= ~4096 — only lower it
    for small clouds (it is clamped to N anyway).
    """
    src_xyz = src[..., :3]
    tgt_xyz = tgt[..., :3]
    B = src_xyz.shape[0]
    n_src = min(n_src, src_xyz.shape[-2])
    n_tgt = min(n_tgt, tgt_xyz.shape[-2])

    # 1-2: subsample (FPS: coverage beats uniform for scoring) + center
    s_idx = farthest_point_sample(src_xyz, n_src)           # [B, S]
    t_idx = farthest_point_sample(tgt_xyz, n_tgt)           # [B, T]
    s_sub = jnp.take_along_axis(src_xyz, s_idx[..., None], axis=-2)
    t_sub = jnp.take_along_axis(tgt_xyz, t_idx[..., None], axis=-2)
    s_mean = jnp.mean(src_xyz, axis=-2, keepdims=True)      # full-cloud
    t_mean = jnp.mean(tgt_xyz, axis=-2, keepdims=True)      # centroids
    s_c = s_sub - s_mean
    t_c = t_sub - t_mean

    # 3: rotation sweep, chunked over the grid
    grid = super_fibonacci_rotations(n_rotations, src_xyz.dtype)
    keep = max(int(n_src * inlier_ratio), 3)
    cg = min(sweep_chunk, n_rotations)
    n_chunks = -(-n_rotations // cg)
    pad = n_chunks * cg - n_rotations
    grid_p = jnp.concatenate(
        [grid, jnp.broadcast_to(jnp.eye(3, dtype=grid.dtype),
                                (pad, 3, 3))], axis=0) if pad else grid

    def sweep(g):                                           # [cg, 3, 3]
        rs = jnp.einsum("bsj,gij->bgsi", s_c, g)
        d2 = square_distance(
            rs.reshape(B, cg * n_src, 3), t_c
        ).reshape(B, cg, n_src, -1)
        return _trimmed_score(jnp.min(d2, axis=-1), keep)   # [B, cg]

    scores = jax.lax.map(
        sweep, grid_p.reshape(n_chunks, cg, 3, 3)
    )                                                       # [nc, B, cg]
    scores = jnp.moveaxis(scores, 1, 0).reshape(B, n_chunks * cg)
    scores = scores[:, :n_rotations]                        # [B, G]
    _, best_g = jax.lax.top_k(-scores, top_p)               # [B, P]
    R0 = grid[best_g]                                       # [B, P, 3, 3]

    # 4: trimmed-NN Kabsch (ICP) from each hypothesis, all batched.
    # State: R [B, P, 3, 3], t [B, P, 3] mapping centered-src ->
    # centered-tgt frames.
    t0 = jnp.zeros((B, top_p, 3), src_xyz.dtype)
    s_bc = jnp.broadcast_to(s_c[:, None], (B, top_p) + s_c.shape[1:])

    def icp_step(carry, _):
        R, t = carry
        y = jnp.einsum("bpsj,bpij->bpsi", s_bc, R) + t[..., None, :]
        d2 = square_distance(
            y.reshape(B * top_p, n_src, 3),
            jnp.repeat(t_c, top_p, axis=0),
        ).reshape(B, top_p, n_src, -1)
        nn_d2 = jnp.min(d2, axis=-1)
        nn_ix = jnp.argmin(d2, axis=-1)                     # [B, P, S]
        corr = jnp.take_along_axis(
            jnp.broadcast_to(t_c[:, None], d2.shape[:2] + t_c.shape[1:]),
            nn_ix[..., None], axis=-2)                      # [B, P, S, 3]
        # trimmed weights: keep the closest `keep` correspondences
        thresh = -jax.lax.top_k(-nn_d2, keep)[0][..., -1:]
        w = (nn_d2 <= thresh).astype(src_xyz.dtype)
        Rn, tn = kabsch(
            s_bc.reshape(B * top_p, n_src, 3),
            corr.reshape(B * top_p, n_src, 3),
            weights=w.reshape(B * top_p, n_src),
        )
        return (Rn.reshape(B, top_p, 3, 3),
                tn.reshape(B, top_p, 3)), None

    (Rf, tf), _ = jax.lax.scan(icp_step, (R0, t0), None, length=icp_iters)

    # 5: final scoring and hypothesis selection
    y = jnp.einsum("bpsj,bpij->bpsi", s_bc, Rf) + tf[..., None, :]
    d2 = square_distance(
        y.reshape(B * top_p, n_src, 3), jnp.repeat(t_c, top_p, axis=0)
    ).reshape(B, top_p, n_src, -1)
    final = _trimmed_score(jnp.min(d2, axis=-1), keep)      # [B, P]
    pick = jnp.argmin(final, axis=-1)                       # [B]
    Rb = jnp.take_along_axis(
        Rf, pick[:, None, None, None].repeat(3, -2).repeat(3, -1), axis=1
    )[:, 0]
    tb = jnp.take_along_axis(tf, pick[:, None, None].repeat(3, -1),
                             axis=1)[:, 0]
    sb = jnp.take_along_axis(final, pick[:, None], axis=1)[:, 0]

    # un-center: x_tgt = R (x_src - s_mean) + t + t_mean
    t_full = (tb + t_mean[:, 0]
              - jnp.einsum("bj,bij->bi", s_mean[:, 0], Rb))
    return GlobalInit(R=Rb, t=t_full,
                      score=jnp.sqrt(jnp.maximum(sb, 0.0)))
