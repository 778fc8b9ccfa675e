"""ddpca_admm_tpu — TPU-native Domain-Decomposition Parallel Contact Analysis by ADMM.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of the reference
C++/OpenMP code QuanchengP/DDPCA-ADMM (3-D linear-elastic multibody frictional
contact on adaptively refined octree hex meshes, solved by an ADMM domain
decomposition with geometric-multigrid preconditioned Krylov subdomain solvers,
plus a dual-mortar monolithic comparison solver).

Architecture (TPU-first, not a port):
  * setup phase  — host NumPy/SciPy float64: meshing, octree refinement,
    contact search / mortar clipping, operator assembly.  Output: frozen,
    padded arrays (static shapes for XLA).
  * solve phase  — pure JAX, jitted: batched per-subdomain multigrid-
    preconditioned Krylov (Chebyshev smoother instead of the reference's
    row-sequential symmetric Gauss-Seidel, which cannot vectorize), ADMM
    consensus loop as ``lax.while_loop``, interface collectives via
    ``shard_map`` over a device mesh.

Contact analysis needs 1e-12-scale tolerances (reference MCONTACT.h:2733),
so float64 is enabled globally; hot kernels may internally drop to f32/bf16
with f64 residual correction.
"""

import os

import jax

jax.config.update("jax_enable_x64", True)
# Full-precision matmuls everywhere: TPU MXU defaults to bfloat16 passes for
# f32 operands (~1e-3 relative error), which would break the solver precision
# policy — CG residual floors of ~40*eps(f32) and the (100*eps)^2 convergence
# criterion (utils/precision.py) are unreachable with bf16 matvecs.  All
# einsum/matmul in this package are solver algebra (SpMV tiles, coarse
# inverse applies, element stiffness); none can tolerate bf16.  SpMV is
# HBM-bound, so the extra MXU passes are essentially free.
jax.config.update("jax_default_matmul_precision", "highest")

# NOTE: jax's persistent compilation cache deadlocks under this image's
# runtime (even on the CPU backend) — do not enable it here.  Opt in
# explicitly via DDPCA_JAX_CACHE at your own risk.
_cache_dir = os.environ.get("DDPCA_JAX_CACHE")
if _cache_dir:
    os.makedirs(_cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", _cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

__version__ = "0.1.0"
