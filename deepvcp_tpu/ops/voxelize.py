"""Voxel-grid candidate generation.

The reference builds the candidate grid with a Python loop over every one of
the B*K transformed keypoints, constructing a meshgrid per point
(voxelize.py:19-83 — its top Python-level hot spot). The grid offsets are
identical for every point, so here they are computed once (statically, at
trace time) and broadcast-added: the whole op is a single fused add.

Grid semantics match the reference exactly: per axis,
`arange(c - r - s/2, c + r, s)` (voxelize.py:62-64), i.e. grid_size =
round(2r/s) + 1 points at offsets -r - s/2 + s*j. The sphere-rejection step
is commented out in the reference (voxelize.py:74-77), so the full cube is
kept — CPG's C == grid_size^3 contract (cpg.py:29-30) depends on this.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=None)
def _offsets_np(
    search_radius: float, voxel_len: float, centered: bool
) -> np.ndarray:
    gs = int(round(2.0 * search_radius / voxel_len)) + 1
    if centered:
        # defect D12 fix: symmetric offsets (j - (gs-1)/2) * s — the grid
        # mean is exactly the queried point, so a uniform softmax over the
        # candidates carries zero positional bias
        ax = voxel_len * (np.arange(gs) - (gs - 1) / 2.0)
    else:
        # reference parity: arange(c - r - s/2, c + r, s) spans
        # [-r - s/2, r - s/2] — mean offset -s/2 per axis (voxelize.py:62-71)
        ax = -search_radius - voxel_len / 2.0 + voxel_len * np.arange(gs)
    gx, gy, gz = np.meshgrid(ax, ax, ax, indexing="ij")
    return np.stack([gx, gy, gz], axis=-1).reshape(-1, 3).astype(np.float32)


def candidate_offsets(
    search_radius: float, voxel_len: float, centered: bool = False
) -> jax.Array:
    """[C, 3] grid offsets around the origin, C = grid_size^3.

    centered=False reproduces the reference's asymmetric grid (defect D12);
    True centers the grid on the origin."""
    return jnp.asarray(_offsets_np(search_radius, voxel_len, centered))


def voxelize(
    points: jax.Array,
    search_radius: float,
    voxel_len: float,
    centered: bool = False,
) -> jax.Array:
    """Candidate grid around each point.

    Args:
        points: [..., 3]
        centered: symmetric grid (D12 fix) instead of reference parity.
    Returns:
        [..., C, 3] candidates, C = (round(2r/s)+1)^3.
    """
    offsets = candidate_offsets(
        search_radius, voxel_len, centered
    ).astype(points.dtype)
    return points[..., None, :] + offsets
