"""Precision policy for TPU vs CPU execution.

The reference (rgcgithub/regenie) computes everything in float64 via Eigen.
TPUs have no native f64, so we run a dtype policy:

- On CPU (parity tests, small cohorts): enable jax x64 and compute in f64,
  matching the reference's numerics closely.
- On TPU: f32 storage with `precision=HIGHEST` matmuls (6-pass bf16 on the
  MXU, ~f32 accuracy) for Gram matrices and score statistics; the tiny
  per-block eigendecompositions stay in f32.

Scalar tail-probability code (Davies, log-p conversions down to 1e-300)
always runs on host in numpy f64/long-double — per-variant-set, not
per-sample, so it is never a throughput concern.
"""

from __future__ import annotations

import os
import jax
import jax.numpy as jnp
import numpy as np

# Matmul precision: always request HIGHEST so f32 matmuls on TPU use the
# error-compensated multi-pass path instead of raw bf16.
MATMUL_PRECISION = jax.lax.Precision.HIGHEST


def _on_cpu() -> bool:
    try:
        return jax.default_backend() == "cpu"
    except Exception:
        return True


_X64_ENABLED = False
_CACHE_SET = False


def enable_compile_cache() -> None:
    """Enable the JAX persistent compilation cache (on by default;
    REGENIE_TPU_COMPILE_CACHE=0 disables, _DIR overrides the path).

    The reference pays zero compile cost (ahead-of-time C++); under
    XLA a cold CLI run otherwise pays 10-40 s of jit compiles per
    distinct block shape — on remote-compile backends that dominates
    short runs (the gene-based set loop measured 78% stats-stage time,
    mostly two group-shape compiles).  The cache persists executables
    across processes (verified on the axon tunnel: 1.1 s -> 17 ms in a
    fresh interpreter), which is the deployment posture anyway."""
    global _CACHE_SET
    if _CACHE_SET or os.environ.get("REGENIE_TPU_COMPILE_CACHE", "1") == "0":
        return
    d = os.environ.get(
        "REGENIE_TPU_COMPILE_CACHE_DIR",
        os.path.join(os.path.expanduser("~"), ".cache", "regenie_tpu", "xla"))
    try:
        os.makedirs(d, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", d)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
        _CACHE_SET = True
    except Exception:
        pass  # cache is an optimization; never fail a run over it


def enable_x64_if_cpu() -> bool:
    """Select platform/precision.

    REGENIE_TPU_PLATFORM=cpu forces the CPU backend (parity mode) even in
    environments that pin JAX_PLATFORMS to a TPU plugin. On CPU we enable
    x64 to match the reference's float64 numerics.
    """
    global _X64_ENABLED
    plat = os.environ.get("REGENIE_TPU_PLATFORM")
    if plat:
        jax.config.update("jax_platforms", plat)
    enable_compile_cache()
    if os.environ.get("REGENIE_TPU_FORCE_F32"):
        return False
    if _on_cpu():
        jax.config.update("jax_enable_x64", True)
        _X64_ENABLED = True
    return _X64_ENABLED


def compute_dtype():
    """dtype for device linear algebra."""
    if jax.config.jax_enable_x64 and _on_cpu():
        return jnp.float64
    return jnp.float32


# Host-side dtype is always float64.
HOST_DTYPE = np.float64


def matmul(a, b):
    """Device matmul at the policy precision."""
    return jnp.matmul(a, b, precision=MATMUL_PRECISION)
