"""Ring KNN on the 8-device CPU mesh vs exact single-device KNN."""

import jax.numpy as jnp
import numpy as np
import pytest

from deepvcp_tpu import ops
from deepvcp_tpu.ops.distributed import ring_knn
from deepvcp_tpu.parallel import make_mesh


@pytest.mark.parametrize("point_shards", [8, 4, 2])
def test_matches_exact(point_shards):
    rng = np.random.default_rng(0)
    ref = jnp.asarray(rng.uniform(-5, 5, (2, 256, 3)).astype(np.float32))
    query = jnp.asarray(rng.uniform(-5, 5, (2, 64, 3)).astype(np.float32))
    mesh = make_mesh(data=8 // point_shards, point=point_shards)

    d_ring, i_ring = ring_knn(mesh, ref, query, k=8)
    d_exact, i_exact = ops.knn(ref, query, k=8)

    np.testing.assert_allclose(
        np.asarray(d_ring), np.asarray(d_exact), atol=1e-4
    )
    # indices may differ under exact distance ties; distances-by-index must
    # agree
    d = np.sqrt(
        np.sum(
            (np.asarray(query)[:, :, None] - np.asarray(ref)[:, None]) ** 2,
            -1,
        )
    )
    got = np.take_along_axis(d, np.asarray(i_ring, np.int64), -1)
    np.testing.assert_allclose(got, np.asarray(d_exact), atol=1e-4)


def test_self_query_finds_self():
    rng = np.random.default_rng(1)
    pts = jnp.asarray(rng.uniform(-3, 3, (1, 128, 3)).astype(np.float32))
    mesh = make_mesh(data=1, point=8)
    d, i = ring_knn(mesh, pts, pts, k=4)
    np.testing.assert_array_equal(
        np.asarray(i)[0, :, 0], np.arange(128)
    )
    np.testing.assert_allclose(np.asarray(d)[0, :, 0], 0.0, atol=1e-5)
