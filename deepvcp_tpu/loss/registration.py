"""Two-pass weighted-SVD registration loss (L4 replacement; ref
deepVCP_loss.py:57-121).

Pipeline: Kabsch solve #1 on (keypoints, predicted VCPs) -> re-transform ->
nearest-neighbor inlier scoring against the ground-truth-transformed
keypoints -> keep the best `inlier_ratio` -> Kabsch solve #2 on inliers ->
alpha-blended L1 + mean-residual loss. Gradients flow through both SVDs and
the top-k gathers, exactly as in the reference.

The reflection fix the reference computes but never applies (D5) is applied
inside ops.kabsch.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from deepvcp_tpu.ops import apply_rigid, kabsch, square_distance


class RegistrationResult(NamedTuple):
    loss: jax.Array        # scalar
    R: jax.Array           # [B, 3, 3] refined rotation
    t: jax.Array           # [B, 3] refined translation
    l1: jax.Array          # scalar: alpha term
    mean_residual: jax.Array  # scalar: (1 - alpha) term


def svd_refine(
    x: jax.Array,
    y_pred: jax.Array,
    y_true: jax.Array,
    inlier_ratio: float = 0.8,
    weights: Optional[jax.Array] = None,
):
    """Two-pass solve with outlier rejection (ref deepVCP_loss.py:57-90).

    Args:
        x: [B, N, 3] source keypoints.
        y_pred: [B, N, 3] predicted corresponding points.
        y_true: [B, N, 3] ground-truth-transformed keypoints.
        weights: optional per-point saliency for weighted Kabsch (paper's
            weighted solve; the reference is unweighted).
    Returns:
        (R2 [B,3,3], t2 [B,3], x_in [B,N',3], y2 [B,N',3], y_true_in [B,N',3])
    """
    N = x.shape[-2]
    R1, t1 = kabsch(x, y_pred, weights)
    y1 = apply_rigid(x, R1, t1)

    # Inlier score: distance from each ground-truth point to its nearest
    # first-pass prediction (ref deepVCP_loss.py:70-72, knn_cuda k=1).
    d = jnp.min(square_distance(y_true, y1), axis=-1)       # [B, N]
    num_in = max(int(N * inlier_ratio), 3)
    _, in_idx = jax.lax.top_k(-d, num_in)                   # [B, N']

    take = lambda a: jnp.take_along_axis(a, in_idx[..., None], axis=-2)
    x_in, y1_in, y_true_in = take(x), take(y1), take(y_true)
    w_in = (
        jnp.take_along_axis(weights, in_idx, axis=-1)
        if weights is not None
        else None
    )

    R2, t2 = kabsch(x_in, y1_in, w_in)
    y2 = apply_rigid(x_in, R2, t2)
    return R2, t2, x_in, y2, y_true_in


def deepvcp_loss(
    x: jax.Array,
    y_pred: jax.Array,
    R_true: jax.Array,
    t_true: jax.Array,
    alpha: float = 0.5,
    inlier_ratio: float = 0.8,
    weights: Optional[jax.Array] = None,
) -> RegistrationResult:
    """alpha * L1(y_true_in, y2) + (1 - alpha) * |mean(y2 - y_true_in)|
    (ref deepVCP_loss.py:105-121).

    Args:
        x: [B, N, 3] source keypoints.
        y_pred: [B, N, 3] predicted VCPs.
        R_true: [B, 3, 3]; t_true: [B, 3] ground-truth pose.
    """
    y_true = apply_rigid(x, R_true, t_true)
    R2, t2, _, y2, y_true_in = svd_refine(
        x, y_pred, y_true, inlier_ratio, weights
    )
    l1 = jnp.mean(jnp.abs(y_true_in - y2))
    mean_res = jnp.abs(jnp.mean(y2 - y_true_in))
    loss = alpha * l1 + (1.0 - alpha) * mean_res
    return RegistrationResult(loss=loss, R=R2, t=t2, l1=l1, mean_residual=mean_res)
