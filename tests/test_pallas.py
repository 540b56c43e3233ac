"""Pallas kernels vs their jnp reference implementations (interpret mode,
so these run on the CPU CI mesh)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deepvcp_tpu import ops
from deepvcp_tpu.ops.pallas import banded_masked_max, farthest_point_sample_pallas


class TestFPSKernel:
    @pytest.mark.parametrize("B,N,npoint", [(1, 64, 8), (2, 128, 16)])
    def test_matches_jnp(self, B, N, npoint):
        rng = np.random.default_rng(0)
        xyz = jnp.asarray(rng.standard_normal((B, N, 3)).astype(np.float32))
        got = farthest_point_sample_pallas(xyz, npoint, interpret=True)
        want = ops.farthest_point_sample(xyz, npoint)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


class TestBandMaxKernel:
    def _oracle(self, xyz, u, radius, half):
        B, N, C = u.shape
        out = np.full((B, N, C), -np.inf, np.float32)
        for b in range(B):
            for q in range(N):
                lo, hi = max(0, q - half), min(N, q + half + 1)
                for n in range(lo, hi):
                    d2 = np.sum((xyz[b, n] - xyz[b, q]) ** 2)
                    if d2 <= radius * radius:
                        out[b, q] = np.maximum(out[b, q], u[b, n])
        return out

    def test_matches_oracle(self):
        rng = np.random.default_rng(1)
        B, N, C = 2, 200, 8
        xyz = np.sort(
            rng.uniform(-5, 5, (B, N, 1)).astype(np.float32), axis=1
        )
        xyz = np.concatenate(
            [xyz, rng.uniform(-5, 5, (B, N, 2)).astype(np.float32)], -1
        )
        u = rng.standard_normal((B, N, C)).astype(np.float32)
        radius, half = 1.0, 128
        got = np.asarray(
            banded_masked_max(
                jnp.asarray(xyz), jnp.asarray(u), radius, half,
                tile=128, interpret=True,
            )
        )
        want = self._oracle(xyz, u, radius, half)
        # rows where the oracle found nothing (impossible in SA usage since
        # each point is its own neighbor) stay at the kernel's -1e30
        valid = np.isfinite(want).all(-1)
        np.testing.assert_allclose(got[valid], want[valid], atol=1e-5)

    def test_self_neighbor_always_included(self):
        rng = np.random.default_rng(2)
        xyz = np.sort(rng.uniform(-3, 3, (1, 150, 3)).astype(np.float32), axis=1)
        u = rng.standard_normal((1, 150, 4)).astype(np.float32)
        got = np.asarray(
            banded_masked_max(
                jnp.asarray(xyz), jnp.asarray(u), 1e-4, 128,
                tile=128, interpret=True,
            )
        )
        # with a tiny radius every point's pool >= its own u
        assert (got >= u - 1e-5).all()


class TestBandedMaxPoolVJP:
    def test_custom_bwd_matches_autodiff(self):
        """The indicator backward must equal XLA autodiff of the static-
        band formula (random floats: no exact ties)."""
        from deepvcp_tpu.models.fused_sa import banded_max_pool, xla_banded_max

        rng = np.random.default_rng(3)
        B, N, C = 2, 300, 8
        radius, window, tile = 1.0, 64, 64
        xyz = np.sort(rng.uniform(-4, 4, (B, N, 1)).astype(np.float32), axis=1)
        xyz = np.concatenate(
            [xyz, rng.uniform(-4, 4, (B, N, 2)).astype(np.float32)], -1
        )
        u = rng.standard_normal((B, N, C)).astype(np.float32)
        xyz, u = jnp.asarray(xyz), jnp.asarray(u)

        def loss_custom(uu):
            out = banded_max_pool(xyz, uu, radius, window, tile, False)
            return jnp.sum(jnp.sin(out) * jnp.cos(out * 0.5))

        def loss_ref(uu):
            out = xla_banded_max(xyz, uu, radius, window, tile)
            return jnp.sum(jnp.sin(out) * jnp.cos(out * 0.5))

        g_custom = np.asarray(jax.grad(loss_custom)(u))
        g_ref = np.asarray(jax.grad(loss_ref)(u))
        np.testing.assert_allclose(g_custom, g_ref, atol=1e-5)

    def test_forward_value_unchanged(self):
        from deepvcp_tpu.models.fused_sa import banded_max_pool, xla_banded_max

        rng = np.random.default_rng(4)
        xyz = np.sort(rng.uniform(-3, 3, (1, 200, 1)).astype(np.float32), axis=1)
        xyz = np.concatenate(
            [xyz, rng.uniform(-3, 3, (1, 200, 2)).astype(np.float32)], -1
        )
        u = rng.standard_normal((1, 200, 4)).astype(np.float32)
        a = banded_max_pool(jnp.asarray(xyz), jnp.asarray(u), 0.8, 64, 64, False)
        b = xla_banded_max(jnp.asarray(xyz), jnp.asarray(u), 0.8, 64, 64)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


class TestClipBand:
    def test_clipped_kernel_matches_xla_band_under_undercoverage(self):
        """Regression (review finding): with a dense cluster the in-radius
        slab EXCEEDS the static band; the training forward must clip the
        kernel to the band so the result equals xla_banded_max exactly —
        otherwise the indicator backward silently drops the gradients of
        queries whose max came from outside the band."""
        from deepvcp_tpu.models.fused_sa import xla_banded_max

        rng = np.random.default_rng(7)
        B, N, C = 1, 512, 8
        # dense along x (slab ~ half the cloud) but extent_x > 2r so the
        # XLA band's torus wrap-around stays out of radius (the documented
        # band_of assumption); band is only +-1 tile of 64
        xyz = np.sort(
            rng.uniform(-1.0, 1.0, (B, N, 1)).astype(np.float32), axis=1
        )
        xyz = np.concatenate(
            [xyz, rng.uniform(-0.05, 0.05, (B, N, 2)).astype(np.float32)],
            -1,
        )
        u = rng.standard_normal((B, N, C)).astype(np.float32)
        radius, window, tile = 0.5, 64, 64  # band = +-1 tile of 64
        want = np.asarray(
            xla_banded_max(jnp.asarray(xyz), jnp.asarray(u), radius,
                           window, tile)
        )
        got = np.asarray(
            banded_masked_max(
                jnp.asarray(xyz), jnp.asarray(u), radius, half=window,
                tile=64, chunk=128, interpret=True,
                clip_band=(tile, -(-window // tile)),
            )
        )
        np.testing.assert_array_equal(got, want)
        # sanity: the unclipped kernel DOES differ here (slab >> band)
        unclipped = np.asarray(
            banded_masked_max(
                jnp.asarray(xyz), jnp.asarray(u), radius, half=window,
                tile=64, chunk=128, interpret=True,
            )
        )
        assert np.abs(unclipped - want).max() > 0
