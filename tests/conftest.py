"""Test environment: run on a virtual 8-device CPU mesh.

Two quirks of this sandbox:
- a baked sitecustomize registers the axon TPU PJRT plugin in EVERY python
  process and force-selects it via jax.config (env JAX_PLATFORMS is
  overridden), so we must update the config after import;
- the TPU tunnel serves one client at a time, so tests must stay off the TPU
  to avoid deadlocking against benchmarks/other sessions.

CPU with 8 virtual devices is the fake-backend pod slice the sharded-path
tests run on (SURVEY.md §4).
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402
from jax._src import xla_bridge as _xb  # noqa: E402

# sitecustomize's axon register() runs before us and sets
# jax_platforms="axon,cpu"; claw it back to cpu-only.
jax.config.update("jax_platforms", "cpu")
if _xb.backends_are_initialized():  # pragma: no cover
    from jax.extend.backend import clear_backends

    clear_backends()

assert jax.devices()[0].platform == "cpu"
assert jax.device_count() == 8, jax.devices()
