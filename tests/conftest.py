"""Test configuration: run the suite on a virtual 8-device CPU mesh with
float64 enabled, so the sharded code paths are exercised without a TPU pod
(SURVEY.md §4 'implications for the TPU build's test plan').

Note: the environment pre-imports jax (with a TPU platform plugin) at
interpreter startup, so env vars are too late — the platform must be
forced through jax.config before any backend is initialized.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
