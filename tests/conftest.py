"""Test configuration.

Force the CPU backend with 8 virtual devices so multi-chip sharding tests run
hermetically and deterministically (the driver dry-runs the real multi-chip
path separately via __graft_entry__.dryrun_multichip, and bench.py exercises
the real TPU).

The environment's sitecustomize registers the axon TPU plugin and overrides
``jax_platforms`` at interpreter start, so plain env vars are not enough —
reconfigure jax post-import and drop any already-initialized backends.
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
try:
    from jax.extend.backend import clear_backends

    clear_backends()
except Exception:  # pragma: no cover
    pass

assert jax.devices()[0].platform == "cpu"
