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


@jax.jit
def score_qt_block_onepass(G, cov, res, maskf, CM, Mmat, covt_res, scale_denom):
    """Single-HBM-pass QT score test (the fused form of
    residualize_scale_block + score_qt_block): G is consumed by one
    matmul set and the covariate projection is applied algebraically.

    With A = G cov and orthonormal cov:
      ||G_res||^2       = ||G||^2 - ||A||^2
      (G_res' res)_p    = (G res)_p - A (cov' res)_p
      (G_res^2' m_p)    = (G^2' m_p) - 2 A.T_p + A M_p A'
    where T[b,k,p] = G (cov_k * m_p) and M_p = cov' diag(m_p) cov.

    G: [B,N] finalized genotypes; cov: [N,K] orthonormal; res: [N,P];
    maskf: [N,P]; CM: [N, K*P] = cov[:,k]*maskf[:,p] (k-major);
    Mmat: [P,K,K]; covt_res: [K,P].
    Returns (stats, denum, scale_fac, low_var) matching the two-step
    kernels' contract (denum on the scaled-G convention).
    """
    B = G.shape[0]
    K = cov.shape[1]
    P = res.shape[1]
    W = jnp.concatenate([cov, res, CM], axis=1)  # [N, K+P+K*P]
    S1 = mm(G, W)
    A = S1[:, :K]
    numY = S1[:, K : K + P]
    T = S1[:, K + P :].reshape(B, K, P)
    ones = jnp.ones((maskf.shape[0], 1), G.dtype)
    S2 = mm(G**2, jnp.concatenate([maskf, ones], axis=1))
    g2m = S2[:, :P]
    g2 = S2[:, P]
    scale2 = (g2 - (A**2).sum(axis=1)) / scale_denom
    scale_fac = jnp.sqrt(jnp.maximum(scale2, 0.0))
    low = scale_fac < 1e-8
    num_raw = numY - mm(A, covt_res)
    denum_raw = (
        g2m
        - 2.0 * jnp.einsum("bk,bkp->bp", A, T, precision=_PREC)
        + jnp.einsum("bk,pkl,bl->bp", A, Mmat, A, precision=_PREC)
    )
    denum_raw = jnp.maximum(denum_raw, 1e-30)
    stats = num_raw / jnp.sqrt(denum_raw)
    denum = denum_raw / jnp.where(low, 1.0, scale2)[:, None]
    return stats, denum, scale_fac, low


def onepass_constants(cov, maskf, res):
    """Host-side precomputation for score_qt_block_onepass: CM [N, K*P]
    (per run), Mmat [P,K,K] (per run), covt_res [K,P] (per chromosome)."""
    N, K = cov.shape
    P = maskf.shape[1]
    CM = (cov[:, :, None] * maskf[:, None, :]).reshape(N, K * P)
    Mmat = np.einsum("nk,np,nl->pkl", cov, maskf, cov)
    covt_res = cov.T @ res
    return CM, Mmat, covt_res


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
