"""Rotation helpers (ref utils.py:8-26) and pose-error metrics.

Pure numpy/jnp — no scipy dependency in the library (the reference pulls in
scipy just for Euler conversion, train.py:113-116).
"""

from __future__ import annotations


import jax
import jax.numpy as jnp
import numpy as np


def rot_x(theta: float) -> np.ndarray:
    c, s = np.cos(theta), np.sin(theta)
    return np.array([[1, 0, 0], [0, c, -s], [0, s, c]], dtype=np.float64)


def rot_y(theta: float) -> np.ndarray:
    c, s = np.cos(theta), np.sin(theta)
    return np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]], dtype=np.float64)


def rot_z(theta: float) -> np.ndarray:
    c, s = np.cos(theta), np.sin(theta)
    return np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]], dtype=np.float64)


def euler_to_matrix(tx: float, ty: float, tz: float) -> np.ndarray:
    """R = Rx @ Ry @ Rz — the composition both reference datasets use
    (ModelNet40Dataset.py:73-76, KITTIDataset.py:78-81)."""
    return rot_x(tx) @ rot_y(ty) @ rot_z(tz)


def random_rotation(rng: np.random.Generator) -> np.ndarray:
    """Random rotation from three uniform Euler angles in [0, 2pi), matching
    the reference's augmentation distribution (ModelNet40Dataset.py:62-76)."""
    tx, ty, tz = rng.uniform(0.0, 2.0 * np.pi, size=3)
    return euler_to_matrix(tx, ty, tz)


def axis_angle_to_matrix(axis: np.ndarray, angle: float) -> np.ndarray:
    """Rodrigues' formula: rotation by `angle` (radians) about unit `axis`."""
    axis = np.asarray(axis, dtype=np.float64)
    axis = axis / (np.linalg.norm(axis) + 1e-30)
    kx, ky, kz = axis
    K = np.array(
        [[0.0, -kz, ky], [kz, 0.0, -kx], [-ky, kx, 0.0]], dtype=np.float64
    )
    return np.eye(3) + np.sin(angle) * K + (1.0 - np.cos(angle)) * (K @ K)


def random_bounded_rotation(
    rng: np.random.Generator, max_angle_deg: float
) -> np.ndarray:
    """Random rotation with geodesic angle uniform in [0, max_angle_deg]
    about a uniform random axis — the small-motion pair distribution for
    identity-init (GT-free) registration, where the candidate grid's reach
    (cfg.search_radius + grid slack) bounds the recoverable motion."""
    axis = rng.standard_normal(3)
    angle = rng.uniform(0.0, np.radians(max_angle_deg))
    return axis_angle_to_matrix(axis, angle)


def rotation_geodesic_deg(R_pred: jax.Array, R_true: jax.Array) -> jax.Array:
    """Relative rotation error in degrees: angle of R_pred^T R_true.

    The standard RRE metric (the reference instead L2-norms Euler-angle
    differences, train.py:113-120 — see `euler_xyz_deg` for that parity
    metric).
    """
    rel = jnp.einsum("...ji,...jk->...ik", R_pred, R_true)
    tr = rel[..., 0, 0] + rel[..., 1, 1] + rel[..., 2, 2]
    cos = jnp.clip((tr - 1.0) / 2.0, -1.0, 1.0)
    return jnp.degrees(jnp.arccos(cos))


def translation_error(t_pred: jax.Array, t_true: jax.Array) -> jax.Array:
    """RTE: euclidean norm of the translation residual, [...]."""
    return jnp.linalg.norm(t_pred - t_true, axis=-1)


def euler_xyz_deg(R: jax.Array) -> jax.Array:
    """Extrinsic x-y-z Euler angles in degrees (scipy `as_euler('xyz')`
    convention, as used by the reference's error prints, train.py:113-116).

    For extrinsic xyz, R = Rz(c) @ Ry(b) @ Ra(a); angles recovered from the
    matrix elements. Returns [..., 3].
    """
    b = jnp.arcsin(jnp.clip(-R[..., 2, 0], -1.0, 1.0))
    a = jnp.arctan2(R[..., 2, 1], R[..., 2, 2])
    c = jnp.arctan2(R[..., 1, 0], R[..., 0, 0])
    return jnp.degrees(jnp.stack([a, b, c], axis=-1))


def euler_error_deg(R_pred: jax.Array, R_true: jax.Array) -> jax.Array:
    """The reference's rotation-error metric: L2 norm of the difference of
    extrinsic-xyz Euler-angle vectors in degrees (train.py:113-119)."""
    return jnp.linalg.norm(euler_xyz_deg(R_pred) - euler_xyz_deg(R_true), axis=-1)


def random_small_rotation(
    key: jax.Array, batch: int, max_angle_rad: float
) -> jax.Array:
    """[batch, 3, 3] rotations with uniform random axis and angle
    ~ U[0, max_angle_rad] — the warm-start jitter for residual-mode
    training (TrainConfig.init_rot_jitter_deg). Traceable (pure jnp
    Rodrigues), unlike the numpy samplers above."""
    k_axis, k_ang = jax.random.split(key)
    axis = jax.random.normal(k_axis, (batch, 3))
    axis = axis / (jnp.linalg.norm(axis, axis=-1, keepdims=True) + 1e-12)
    ang = jax.random.uniform(k_ang, (batch,), maxval=max_angle_rad)
    zeros = jnp.zeros((batch,), axis.dtype)
    kx, ky, kz = axis[:, 0], axis[:, 1], axis[:, 2]
    K = jnp.stack(
        [
            jnp.stack([zeros, -kz, ky], axis=-1),
            jnp.stack([kz, zeros, -kx], axis=-1),
            jnp.stack([-ky, kx, zeros], axis=-1),
        ],
        axis=-2,
    )                                                     # [B, 3, 3]
    s = jnp.sin(ang)[:, None, None]
    c = jnp.cos(ang)[:, None, None]
    eye = jnp.broadcast_to(jnp.eye(3, dtype=axis.dtype), (batch, 3, 3))
    return eye + s * K + (1.0 - c) * (K @ K)
