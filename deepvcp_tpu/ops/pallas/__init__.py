"""Pallas TPU kernels for the hot ops. Each kernel has a jnp reference
implementation elsewhere in ops/ or models/; tests compare them in
interpret mode so CI runs without a TPU."""

from deepvcp_tpu.ops.pallas.band_max_kernel import (
    banded_masked_max,
    banded_masked_max_grad,
)
from deepvcp_tpu.ops.pallas.fps_kernel import farthest_point_sample_pallas

__all__ = [
    "farthest_point_sample_pallas",
    "banded_masked_max",
    "banded_masked_max_grad",
]
