"""Test config: run on a virtual 8-device CPU mesh (sharding-testable without
TPU hardware); must set env before jax initializes."""

import os
import sys

# Detach from the axon TPU relay entirely: with these set, even the CPU
# backend routes first-compiles through the remote helper (~80 s stalls).
for _v in list(os.environ):
    if "AXON" in _v or _v in ("PJRT_LIBRARY_PATH", "PALLAS_AXON_REMOTE_COMPILE"):
        os.environ.pop(_v, None)
# The axon jax-plugin (on sys.path via PYTHONPATH=~/.axon_site) forces
# jax_platforms="axon,cpu" at PJRT plugin discovery, overriding the env
# selection below and failing hard without relay credentials — drop it
# from sys.path so discovery never imports it.
sys.path[:] = [p for p in sys.path if "axon" not in p]
os.environ["PYTHONPATH"] = ":".join(
    p for p in os.environ.get("PYTHONPATH", "").split(":") if p and "axon" not in p
)
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)

import jax  # noqa: E402

# sitecustomize (~/.axon_site) imports axon.register at interpreter startup,
# which pins jax_platforms="axon,cpu" via config.update — env JAX_PLATFORMS
# is only the *default* and is ignored after that. Pin it back.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
