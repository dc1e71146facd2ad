"""Test configuration: force a deterministic 8-device CPU mesh.

All unit tests run on CPU (xla_force_host_platform_device_count=8) so the
multi-chip sharding paths can be exercised without TPU hardware; the real
TPU is only used by bench.py. The env vars alone are not enough if
anything imported jax before this conftest ran, so we also force the
platform through jax.config.

Set NTSYNT_TEST_PLATFORM=tpu (or axon) to run the suite on real hardware.
"""

import os

_platform = os.environ.get("NTSYNT_TEST_PLATFORM", "cpu")
os.environ["JAX_PLATFORMS"] = _platform
xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", _platform)

assert jax.default_backend() == ("cpu" if _platform == "cpu" else jax.default_backend()), (
    f"tests must run on {_platform}, got {jax.default_backend()}"
)
