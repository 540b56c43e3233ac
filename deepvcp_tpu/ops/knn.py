"""Brute-force K-nearest-neighbors.

This is the TPU replacement for the reference's single native component, the
`knn_cuda` CUDA extension (used at get_cat_feat_tgt.py:45-52 with k=32 and
deepVCP_loss.py:70-72 with k=1). The distance matrix rides the MXU as one
matmul per query tile and a chunked driver bounds memory to one [chunk, N]
tile. `knn` extracts the k smallest with exact `lax.top_k`; `approx_knn`
uses the TPU-native `lax.approx_min_k` partial reduction (the model's hot
path). Clouds too large for one chip shard over the mesh's point axis via
ops.distributed.ring_knn.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from deepvcp_tpu.ops.distance import map_query_chunks, square_distance


def knn(
    ref: jax.Array,
    query: jax.Array,
    k: int,
    chunk: Optional[int] = None,
) -> Tuple[jax.Array, jax.Array]:
    """K nearest neighbors of each query point among the reference points.

    Args:
        ref: [B, N, 3] reference points.
        query: [B, M, 3] query points.
        k: neighbors per query.
        chunk: optional query-block size for memory tiling.
    Returns:
        (dist [B, M, k] euclidean distances ascending,
         idx [B, M, k] int32 indices into N).
    """

    def run(q):
        sqr = square_distance(q, ref)                      # [B, m, N]
        neg, idx = jax.lax.top_k(-sqr, k)                  # ascending distance
        dist = jnp.sqrt(jnp.maximum(-neg, 0.0))
        return dist, idx.astype(jnp.int32)

    if chunk is None:
        return run(query)
    return map_query_chunks(run, query, chunk)


def approx_knn(
    ref: jax.Array,
    query: jax.Array,
    k: int,
    chunk: Optional[int] = None,
    recall_target: float = 0.95,
    select_dtype: Optional[str] = None,
) -> Tuple[jax.Array, jax.Array]:
    """K nearest neighbors via the TPU-native partial reduction
    `jax.lax.approx_min_k` (the SoC-accelerated ScaNN-style reduction;
    exact top_k on non-TPU backends).

    Measured on v5e at the model's operating point (13824 queries x 10000
    refs, k=32): 2.7 ms at recall 0.978 vs 129 ms for exact chunked top_k
    and 25 ms / recall 0.42 for a 512-wide sorted-window search — the
    matmul distance tile rides the MXU and the reduction never sorts.

    Args:
        ref: [B, N, 3] reference points.
        query: [B, M, 3] query points.
        k: neighbors per query.
        chunk: optional query-block size bounding the [chunk, N] tile.
        recall_target: approx_min_k quality knob (per-row expected recall).
        select_dtype: optional reduced dtype (e.g. "bfloat16") for the
            SELECTION tile — the [chunk, N] tile is the op's HBM cost and
            selection only needs relative order. Numerics (review finding:
            the previous all-bf16 expansion lost tens of m^2 to
            catastrophic cancellation at KITTI-scale coordinates): the
            coordinates are centered on the reference cloud's mean first
            (distances are translation-invariant, so the absolute offset
            never enters), the matmul runs with reduced-dtype INPUTS but
            f32 MXU accumulation, s2 + r2 and the subtraction stay in f32,
            and only the final d^2 tile is cast down — which costs pure
            RELATIVE precision, flipping near-ties only. Residual ranking
            error scales as 2^-9 * (half_extent)^2 from the input
            rounding, so callers with very large clouds should fall back
            to f32 (the model does above
            DeepVCPConfig.knn_select_f32_extent). Returned distances are
            reduced precision — recompute from gathered coordinates where
            exact values matter (the model does).
    Returns:
        (dist [B, M, k] euclidean distances ascending,
         idx [B, M, k] int32 indices into N).
    """
    sel = jnp.dtype(select_dtype) if select_dtype else None
    if sel is not None:
        center = jnp.mean(ref, axis=-2, keepdims=True)
        ref = ref - center
        query = query - center
    r2 = jnp.sum(jnp.square(ref), axis=-1)

    def run(q):
        if sel is not None:
            s2 = jnp.sum(jnp.square(q), axis=-1)
            cross = jnp.einsum(
                "...nc,...mc->...nm",
                q.astype(sel),
                ref.astype(sel),
                preferred_element_type=jnp.float32,
            )
            sqr = (
                s2[..., :, None] + r2[..., None, :] - 2.0 * cross
            ).astype(sel)                                  # [B, m, N] (sel)
        else:
            sqr = square_distance(q, ref)                  # [B, m, N] (MXU)
        d2, idx = jax.lax.approx_min_k(
            sqr, k, recall_target=recall_target
        )
        return (
            jnp.sqrt(jnp.maximum(d2, 0.0).astype(jnp.float32)),
            idx.astype(jnp.int32),
        )

    if chunk is None:
        return run(query)
    return map_query_chunks(run, query, chunk)


def nearest_neighbor_dist(
    ref: jax.Array, query: jax.Array, chunk: Optional[int] = None
) -> jax.Array:
    """Squared distance from each query to its nearest reference point.

    Used by the loss's outlier rejection (ref deepVCP_loss.py:70-72, k=1).
    Returns [B, M].
    """

    def run(q):
        sqr = square_distance(q, ref)
        return jnp.min(sqr, axis=-1)

    if chunk is None:
        return run(query)
    return map_query_chunks(run, query, chunk)
