"""Tests for the spatially-sorted windowed neighbor engine."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deepvcp_tpu import ops
from deepvcp_tpu.ops import neighbors as nb


def _rand(shape, seed=0, scale=1.0):
    rng = np.random.default_rng(seed)
    return (scale * rng.standard_normal(shape)).astype(np.float32)


class TestSortCloud:
    def test_sorted_and_permutation(self):
        xyz = _rand((2, 50, 3), 1, scale=5.0)
        cloud = nb.sort_cloud(jnp.asarray(xyz))
        key = np.asarray(cloud.key)
        assert (np.diff(key, axis=-1) >= 0).all()
        # perm maps sorted -> original
        for b in range(2):
            np.testing.assert_allclose(
                np.asarray(cloud.xyz)[b], xyz[b][np.asarray(cloud.perm)[b]]
            )


class TestSearchsorted:
    def test_matches_numpy(self):
        rng = np.random.default_rng(2)
        vals = np.sort(rng.standard_normal((3, 40)), axis=-1).astype(np.float32)
        queries = rng.standard_normal((3, 17)).astype(np.float32)
        got = np.asarray(
            nb.searchsorted_batched(jnp.asarray(vals), jnp.asarray(queries))
        )
        for b in range(3):
            want = np.searchsorted(vals[b], queries[b], side="left")
            np.testing.assert_array_equal(got[b], want)

    def test_duplicates(self):
        vals = jnp.asarray([[0.0, 1.0, 1.0, 1.0, 2.0]])
        q = jnp.asarray([[1.0, 0.5, 3.0, -1.0]])
        got = np.asarray(nb.searchsorted_batched(vals, q))
        np.testing.assert_array_equal(got[0], [1, 1, 5, 0])


class TestSelectFirstK:
    def test_oracle(self):
        rng = np.random.default_rng(3)
        mask = rng.random((4, 33)) < 0.3
        pos, count = nb.select_first_k(jnp.asarray(mask), 5)
        pos, count = np.asarray(pos), np.asarray(count)
        for r in range(4):
            hits = np.nonzero(mask[r])[0]
            np.testing.assert_array_equal(count[r], len(hits))
            if len(hits) == 0:
                continue
            expect = list(hits[:5]) + [hits[0]] * max(0, 5 - len(hits))
            np.testing.assert_array_equal(pos[r], expect)


class TestWindowedBallQuery:
    def test_full_window_matches_dense(self):
        """With window == N, windowed ball query must equal the dense
        reference-semantics ball query (after mapping through perm)."""
        xyz = _rand((2, 64, 3), 4, scale=2.0)
        q = xyz[:, :20]
        radius, ns = 1.0, 8
        cloud = nb.sort_cloud(jnp.asarray(xyz))
        idx_sorted = nb.windowed_ball_query(
            cloud, jnp.asarray(q), radius, ns, window=64
        )
        # map to original indices
        idx_orig = np.take_along_axis(
            np.asarray(cloud.perm), np.asarray(idx_sorted).reshape(2, -1), -1
        ).reshape(2, 20, ns)
        # oracle: in-radius sets must match (selection order differs because
        # "first by sorted index" != "first by original index")
        d = np.sum((q[:, :, None] - xyz[:, None]) ** 2, -1)
        for b in range(2):
            for s in range(20):
                hits = set(np.nonzero(d[b, s] <= radius**2)[0][:64].tolist())
                got = set(idx_orig[b, s].tolist())
                assert got <= hits
                # all neighbors found when fewer than ns hits
                if len(hits) <= ns:
                    assert got == hits

    def test_narrow_window_still_in_radius(self):
        xyz = _rand((1, 256, 3), 5, scale=10.0)
        cloud = nb.sort_cloud(jnp.asarray(xyz))
        idx = nb.windowed_ball_query(cloud, cloud.xyz, 1.0, 4, window=128)
        gathered = np.take_along_axis(
            np.asarray(cloud.xyz), np.asarray(idx).reshape(1, -1, 1), 1
        ).reshape(1, 256, 4, 3)
        d = np.sum(
            (gathered - np.asarray(cloud.xyz)[:, :, None]) ** 2, -1
        )
        # each point is its own neighbor; all selected are within radius
        assert (d.min(-1) < 1e-9).all()
        assert (d <= 1.0 + 1e-5).all()


class TestWindowedKNN:
    def test_full_window_exact(self):
        xyz = _rand((2, 80, 3), 6, scale=3.0)
        q = _rand((2, 15, 3), 7, scale=3.0)
        cloud = nb.sort_cloud(jnp.asarray(xyz))
        dist, idx = nb.windowed_knn(cloud, jnp.asarray(q), k=5, window=80)
        d_exact, _ = ops.knn(jnp.asarray(xyz), jnp.asarray(q), k=5)
        np.testing.assert_allclose(
            np.asarray(dist), np.asarray(d_exact), atol=1e-4
        )

    def test_windowed_recall(self):
        """With a reasonable window on uniform data, windowed KNN recalls
        nearly all true neighbors."""
        rng = np.random.default_rng(8)
        xyz = rng.uniform(-10, 10, (1, 2048, 3)).astype(np.float32)
        q = rng.uniform(-10, 10, (1, 256, 3)).astype(np.float32)
        cloud = nb.sort_cloud(jnp.asarray(xyz))
        dist, idx = nb.windowed_knn(cloud, jnp.asarray(q), k=8, window=512)
        d_exact, _ = ops.knn(jnp.asarray(xyz), jnp.asarray(q), k=8)
        # compare distance profiles: windowed ~= exact for most entries
        close = np.isclose(
            np.asarray(dist), np.asarray(d_exact), atol=1e-3
        ).mean()
        assert close > 0.97, close


class TestWindowFor:
    def test_bounds(self):
        w = nb.window_for(10000, 0.1, 80.0)
        assert 128 <= w <= 10000 and w % 128 == 0
        assert nb.window_for(64, 1.0, 2.0) == 64
