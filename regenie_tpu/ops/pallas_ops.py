"""Pallas TPU kernels for the genotype hot path.

decode_bed_planes: PLINK 2-bit decode as a VPU kernel. Instead of the
interleaved sample order (byte k holds samples 4k..4k+3), the kernel
emits a BIT-PLANE layout — plane j holds every 4th sample starting at j
— so each output tile is a pure shift/mask/select of the input tile
with no cross-lane shuffles. Per-sample auxiliary arrays (residuals,
masks, covariates) are permuted ONCE per run into plane order with
`plane_aux_order`; every downstream reduction over samples is
permutation-invariant, so the score pipeline is unchanged.

Falls back transparently to the XLA decode (ops.geno_ops) when Pallas
is unavailable on the current backend.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

_TB, _TC = 32, 128  # uint8 min tile (sublane x lane)


def _decode_kernel(raw_ref, out0, out1, out2, out3):
    r = raw_ref[:].astype(jnp.int32)
    for j, out in enumerate((out0, out1, out2, out3)):
        codes = (r >> (2 * j)) & 3
        out[:] = jnp.where(
            codes == 0, 2.0,
            jnp.where(codes == 1, -3.0, jnp.where(codes == 2, 1.0, 0.0)),
        ).astype(jnp.float32)


@partial(jax.jit, static_argnames=("interpret",))
def decode_bed_planes(raw, interpret=False):
    """[B, nb] packed uint8 -> [B, 4*nb] float32 in bit-plane order:
    column p*nb + c holds the genotype of file-order sample 4c + p."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, nb = raw.shape
    grid = (pl.cdiv(B, _TB), pl.cdiv(nb, _TC))
    outs = pl.pallas_call(
        _decode_kernel,
        out_shape=[jax.ShapeDtypeStruct((B, nb), jnp.float32)] * 4,
        grid=grid,
        in_specs=[pl.BlockSpec((_TB, _TC), lambda i, j: (i, j),
                               memory_space=pltpu.VMEM)],
        out_specs=[pl.BlockSpec((_TB, _TC), lambda i, j: (i, j),
                                memory_space=pltpu.VMEM)] * 4,
        interpret=interpret,
    )(raw)
    return jnp.concatenate(outs, axis=1)


def plane_aux_order(n_samples: int, nb: int):
    """Indices mapping file-order per-sample arrays into plane order.

    Returns (idx [4*nb] int32 clipped to valid range, valid [4*nb] bool):
    aux_planes = where(valid, aux[idx], 0) aligns with decode_bed_planes
    columns; invalid slots (padding samples) must be masked to 0."""
    i = np.arange(4 * nb)
    src = 4 * (i % nb) + i // nb
    valid = src < n_samples
    return np.where(valid, src, 0).astype(np.int32), valid


def pallas_available() -> bool:
    """Pallas TPU kernels need a real TPU backend (the axon tunnel
    and CPU run them only in interpret mode)."""
    try:
        return jax.default_backend() not in ("cpu",)
    except Exception:
        return False
