"""Model-level tests: shapes, determinism, differentiability, and the
self-supervised-pair oracle (SURVEY.md §4)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deepvcp_tpu import DeepVCPConfig
from deepvcp_tpu.loss import deepvcp_loss
from deepvcp_tpu.models import DeepVCP
from deepvcp_tpu.utils import random_rotation


@pytest.fixture(scope="module")
def tiny_setup():
    cfg = DeepVCPConfig.tiny(num_points=96)
    model = DeepVCP(cfg=cfg)
    rng = np.random.default_rng(0)
    B, N = 2, cfg.num_points
    src = jnp.asarray(rng.uniform(-1, 1, (B, N, 6)).astype(np.float32))
    R = jnp.asarray(
        np.stack([random_rotation(rng) for _ in range(B)]).astype(np.float32)
    )
    t = jnp.asarray(rng.uniform(-1, 1, (B, 3)).astype(np.float32))
    variables = model.init(jax.random.key(0), src, src, R, t, train=False)
    return cfg, model, variables, src, R, t


class TestForward:
    def test_shapes(self, tiny_setup):
        cfg, model, variables, src, R, t = tiny_setup
        kp, vcp, aux = model.apply(variables, src, src, R, t, train=False)
        B = src.shape[0]
        assert kp.shape == (B, cfg.num_keypoints, 3)
        assert vcp.shape == (B, cfg.num_keypoints, 3)
        assert aux["saliency"].shape == (B, cfg.num_points)
        assert aux["candidate_weights"].shape == (
            B, cfg.num_keypoints, cfg.num_candidates,
        )
        assert np.isfinite(np.asarray(vcp)).all()

    def test_jit_and_deterministic(self, tiny_setup):
        cfg, model, variables, src, R, t = tiny_setup
        f = jax.jit(lambda v, a, b: model.apply(v, a, b, R, t, train=False))
        kp1, vcp1, _ = f(variables, src, src)
        kp2, vcp2, _ = f(variables, src, src)
        np.testing.assert_array_equal(np.asarray(vcp1), np.asarray(vcp2))

    def test_batch_consistency(self, tiny_setup):
        """Batched forward == per-sample forward (the reference's defect D1
        made this impossible; here it is a hard invariant)."""
        cfg, model, variables, src, R, t = tiny_setup
        kp, vcp, _ = model.apply(variables, src, src, R, t, train=False)
        for b in range(src.shape[0]):
            kp_b, vcp_b, _ = model.apply(
                variables, src[b : b + 1], src[b : b + 1],
                R[b : b + 1], t[b : b + 1], train=False,
            )
            np.testing.assert_allclose(
                np.asarray(vcp_b[0]), np.asarray(vcp[b]), atol=2e-5
            )

    def test_no_normals(self):
        cfg = DeepVCPConfig.tiny(num_points=64, use_normal=False)
        model = DeepVCP(cfg=cfg)
        rng = np.random.default_rng(1)
        src = jnp.asarray(rng.uniform(-1, 1, (1, 64, 3)).astype(np.float32))
        R = jnp.eye(3)[None]
        t = jnp.zeros((1, 3))
        variables = model.init(jax.random.key(0), src, src, R, t)
        kp, vcp, _ = model.apply(variables, src, src, R, t)
        assert vcp.shape == (1, cfg.num_keypoints, 3)

    def test_vcp_near_candidate_region(self, tiny_setup):
        """VCPs are convex combinations of candidates, so they must lie in
        the candidate bounding box around the warm-started keypoints."""
        cfg, model, variables, src, R, t = tiny_setup
        kp, vcp, _ = model.apply(variables, src, src, R, t, train=False)
        from deepvcp_tpu.ops import apply_rigid

        kp_warm = apply_rigid(kp, R, t)
        extent = cfg.search_radius + cfg.voxel_len
        assert float(jnp.max(jnp.abs(vcp - kp_warm))) <= extent + 1e-5


class TestLossIntegration:
    def test_loss_and_grads_finite(self, tiny_setup):
        cfg, model, variables, src, R, t = tiny_setup
        from deepvcp_tpu.ops import apply_rigid

        tgt = apply_rigid(src[..., :3], R, t)
        tgt = jnp.concatenate([tgt, src[..., 3:]], axis=-1)
        params = variables["params"]
        other = {k: v for k, v in variables.items() if k != "params"}

        def loss_fn(p):
            kp, vcp, _ = model.apply({"params": p, **other}, src, tgt, R, t)
            return deepvcp_loss(kp, vcp, R, t, alpha=0.5).loss

        loss, grads = jax.value_and_grad(loss_fn)(params)
        assert np.isfinite(float(loss))
        leaves = jax.tree_util.tree_leaves(grads)
        assert all(np.isfinite(np.asarray(g)).all() for g in leaves)
        # the FE/CPG/DFE weights must actually receive gradient
        gnorm = sum(float(jnp.sum(jnp.abs(g))) for g in leaves)
        assert gnorm > 0

    def test_oracle_perfect_prediction(self, tiny_setup):
        """The dataset construction IS an oracle: if predicted VCPs equal the
        ground-truth-transformed keypoints, loss ~ 0 and the solved pose
        matches (R_true, t_true) (SURVEY.md §4)."""
        cfg, model, variables, src, R, t = tiny_setup
        from deepvcp_tpu.ops import apply_rigid
        from deepvcp_tpu.utils import rotation_geodesic_deg, translation_error

        kp, _, _ = model.apply(variables, src, src, R, t, train=False)
        y_perfect = apply_rigid(kp, R, t)
        res = deepvcp_loss(kp, y_perfect, R, t, alpha=0.5)
        assert float(res.loss) < 1e-4
        assert float(jnp.max(rotation_geodesic_deg(res.R, R))) < 0.1
        assert float(jnp.max(translation_error(res.t, t))) < 1e-3


class TestLossRobustness:
    def test_outlier_rejection_recovers_pose(self):
        """Corrupt 15% of correspondences; the two-pass solve must still
        recover the pose (ref deepVCP_loss.py:57-90 capability)."""
        from deepvcp_tpu.loss import deepvcp_loss
        from deepvcp_tpu.ops import apply_rigid
        from deepvcp_tpu.utils import (
            random_rotation,
            rotation_geodesic_deg,
            translation_error,
        )

        from deepvcp_tpu.ops import kabsch

        rng = np.random.default_rng(2)
        x = jnp.asarray(rng.uniform(-2, 2, (1, 64, 3)).astype(np.float32))
        R = jnp.asarray(random_rotation(rng).astype(np.float32))[None]
        t = jnp.asarray(rng.uniform(-1, 1, (1, 3)).astype(np.float32))
        y = apply_rigid(x, R, t)
        y_noisy = np.asarray(y).copy()
        y_noisy[:, :6] += rng.uniform(1.0, 2.0, (1, 6, 3))  # ~9% mild outliers
        res = deepvcp_loss(x, jnp.asarray(y_noisy), R, t, alpha=0.5)

        # two-pass refined pose beats the single naive solve...
        R1, t1 = kabsch(x, jnp.asarray(y_noisy))
        err2 = float(rotation_geodesic_deg(res.R, R)[0])
        err1 = float(rotation_geodesic_deg(R1, R)[0])
        assert err2 < err1
        # ...and recovers the pose to a few degrees / decimeters
        assert err2 < 3.0
        assert float(translation_error(res.t, t)[0]) < 0.3


class TestNeighborMethods:
    @pytest.mark.parametrize("method", ["banded", "windowed", "dense"])
    def test_forward_all_methods(self, method):
        """Every neighbor engine (banded gather-free, sorted-window,
        dense exact-oracle) runs the full forward with finite outputs and
        the right shapes — the engines differ in neighbor selection by
        design, so parity is architectural, not numerical."""
        import dataclasses

        cfg = dataclasses.replace(
            DeepVCPConfig.tiny(num_points=96, use_normal=False),
            neighbor_method=method,
        )
        model = DeepVCP(cfg=cfg)
        rng = np.random.default_rng(1)
        src = jnp.asarray(rng.uniform(-2, 2, (1, 96, 3)).astype(np.float32))
        tgt = jnp.asarray(rng.uniform(-2, 2, (1, 96, 3)).astype(np.float32))
        R = jnp.eye(3, dtype=jnp.float32)[None]
        t = jnp.zeros((1, 3), jnp.float32)
        variables = model.init(jax.random.key(0), src, tgt, R, t, train=False)
        kp, vcp, aux = jax.jit(
            lambda v, s, tg: model.apply(v, s, tg, R, t, train=False)
        )(variables, src, tgt)
        assert kp.shape == (1, cfg.num_keypoints, 3)
        assert vcp.shape == (1, cfg.num_keypoints, 3)
        assert np.isfinite(np.asarray(kp)).all()
        assert np.isfinite(np.asarray(vcp)).all()
