"""Step 2 association score tests — TPU-native batched kernels.

Re-implements Step2_Models.cpp score tests with the SNP axis as a tensor
dimension: where the reference runs an OpenMP loop with per-SNP scratch
(compute_tests_mt, Data.cpp:2476), we run whole-[B, N] blocks through
MXU matmuls. Citations: compute_score_qt (Step2_Models.cpp:343),
compute_score_bt (:470), residualize_geno (Geno.cpp:3242).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..utils.dtypes import MATMUL_PRECISION as _PREC


def mm(a, b):
    return jnp.matmul(a, b, precision=_PREC)


@jax.jit
def residualize_scale_block(G, cov, scale_denom):
    """Project covariate basis out of each SNP column and scale
    (residualize_geno, Geno.cpp:3242-3262). G: [B, N]; cov: [N, K].
    Returns (G_res, scale_fac [B], low_var [B] bool)."""
    beta = mm(G, cov)  # [B,K]
    G = G - mm(beta, cov.T)
    scale_fac = jnp.linalg.norm(G, axis=1) / jnp.sqrt(scale_denom)
    low = scale_fac < 1e-8
    G = G / jnp.where(low, 1.0, scale_fac)[:, None]
    return G, scale_fac, low


@partial(jax.jit, static_argnames=("strict",))
def score_qt_block(G_res, res, maskf, n_analyzed_m_ncov, strict):
    """Linear score test for a block, all SNPs x phenos at once
    (compute_score_qt, Step2_Models.cpp:343-460).

    G_res: [B, N] residualized+scaled genotypes; res: [N, P] scaled
    phenotype residuals; maskf: [N, P] float mask; strict: python bool.
    Returns (stats [B,P], denum [B,P]) where denum excludes the gsc^2
    factor (stats = num_scaled/sqrt(denum)).
    """
    num = mm(G_res, res)  # [B,P]  (res' g per pheno)
    if strict:
        denum = jnp.broadcast_to(n_analyzed_m_ncov, num.shape)
    else:
        denum = mm(G_res**2, maskf)  # [B,P] per-trait masked sum of g^2
    stats = num / jnp.sqrt(denum)
    return stats, denum


def finalize_qt(stats, denum, scale_fac, scf_sv, flipped=None):
    """Host-side: effect sizes/SE/chisq on the raw genotype scale
    (compute_score_qt tail, Step2_Models.cpp:440-460).

    stats, denum: [B,P]; scale_fac: [B] (gsc); scf_sv: [P].
    Returns (bhat, se, chisq) each [B,P].
    """
    stats = np.asarray(stats)
    denum = np.asarray(denum)
    gsc = np.asarray(scale_fac)[:, None]
    bhat = stats * scf_sv[None, :] / (np.sqrt(denum) * gsc)
    if flipped is not None:
        bhat = np.where(flipped[:, None], -bhat, bhat)
    se = np.abs(bhat / stats)
    chisq = stats**2
    return bhat, se, chisq
