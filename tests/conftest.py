"""Test config: run on a virtual 8-device CPU mesh (sharding-testable without
TPU hardware); must set env before jax initializes."""

import os

# Detach from the axon TPU relay entirely: with these set, even the CPU
# backend routes first-compiles through the remote helper (~80 s stalls).
for _v in list(os.environ):
    if "AXON" in _v or _v in ("PJRT_LIBRARY_PATH", "PALLAS_AXON_REMOTE_COMPILE"):
        os.environ.pop(_v, None)
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)

import jax  # noqa: E402

jax.config.update("jax_enable_x64", True)
