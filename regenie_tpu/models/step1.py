"""Step 1: stacked block ridge regression — TPU-native kernels.

Re-implements the math of the reference's Step1_Models.cpp as batched
JAX/XLA operations:

- level-0 K-fold ridge (ridge_level_0, Step1_Models.cpp:458): per-block
  Gram matrices as MXU matmuls, a BATCHED eigendecomposition over the K
  leave-fold-out Gram matrices, and a joint solve for all (lambda, pheno)
  at once.
- level-0 LOOCV (ridge_level_0_loocv, :615): single eigendecomposition +
  closed-form leave-one-out predictions, fully vectorized over samples.
- level-1 linear ridge, K-fold (:772) and LOOCV (:875).

The reference loops over folds/ridge-params/samples in C++; here every
loop is a tensor axis so XLA can tile it onto the MXU. Folds are padded
to a common size so a single vmap'd program covers all folds.
"""

from __future__ import annotations

from functools import partial
from typing import List, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..utils.dtypes import MATMUL_PRECISION as _PREC


def mm(a, b):
    return jnp.matmul(a, b, precision=_PREC)


# ---------------------------------------------------------------------------
# fold layout
# ---------------------------------------------------------------------------

def compute_fold_sizes(ind_in_analysis: np.ndarray, cv_folds: int) -> np.ndarray:
    """Contiguous fold sizes in SAMPLE coordinates (reference set_folds,
    Data.cpp:401): walk samples in file order, close a fold every
    floor(n_analyzed/K) analyzed samples; the last fold takes the rest."""
    n_samples = len(ind_in_analysis)
    n_analyzed = int(ind_in_analysis.sum())
    target = n_analyzed // cv_folds
    if target < 1:
        raise ValueError(f"not enough samples for {cv_folds}-fold CV")
    sizes = np.ones(cv_folds, dtype=np.int64)
    n_non_miss = 0
    cum = 0
    cur = 0
    for i in range(n_samples):
        if ind_in_analysis[i]:
            n_non_miss += 1
        if n_non_miss == target:
            sizes[cur] = i - cum + 1
            cum += sizes[cur]
            n_non_miss = 0
            cur += 1
        elif cur == cv_folds - 1:
            sizes[cur] = n_samples - i
            break
    return sizes


def pad_folds(arr: np.ndarray, sizes: np.ndarray, axis: int = 0) -> Tuple[np.ndarray, np.ndarray]:
    """Split `arr` along `axis` into contiguous folds, pad to max size.

    Returns (stacked [K, nmax, ...], valid [K, nmax] bool).
    """
    K = len(sizes)
    nmax = int(sizes.max())
    bounds = np.concatenate([[0], np.cumsum(sizes)])
    pieces = []
    valid = np.zeros((K, nmax), dtype=bool)
    for k in range(K):
        sl = [slice(None)] * arr.ndim
        sl[axis] = slice(bounds[k], bounds[k + 1])
        piece = arr[tuple(sl)]
        pad_width = [(0, 0)] * arr.ndim
        pad_width[axis] = (0, nmax - int(sizes[k]))
        pieces.append(np.pad(piece, pad_width))
        valid[k, : int(sizes[k])] = True
    return np.stack(pieces), valid


# ---------------------------------------------------------------------------
# genotype residualization (step 1)
# ---------------------------------------------------------------------------

@jax.jit
def residualize_geno_block(G, cov, scale_denom):
    """Project covariate basis out of each SNP row and scale to unit
    variance (reference residualize_genotypes, Data.cpp:190-222).

    G: [B, N] (already masked to in-analysis samples), cov: [N, K]
    orthonormal basis, scale_denom: n_analyzed - ncov.
    Returns (G_res [B, N], scale_G [B]).
    """
    beta = mm(G, cov)  # [B, K]
    G = G - mm(beta, cov.T)
    scale_G = jnp.linalg.norm(G, axis=1) / jnp.sqrt(scale_denom)
    G = G / scale_G[:, None]
    return G, scale_G


# ---------------------------------------------------------------------------
# level 0
# ---------------------------------------------------------------------------

class Level0Result(NamedTuple):
    W: jax.Array  # [N, J] centered+scaled level-0 predictions per pheno -> [P, N, J]


@partial(jax.jit, static_argnames=())
def level0_kfold_block(G_folds, Y_folds, mask_folds, valid, lambdas, Neff):
    """Level-0 K-fold ridge for one genotype block, all folds/params/phenos
    batched (reference ridge_level_0, Step1_Models.cpp:458-560).

    G_folds: [K, B, nmax]  genotypes split by fold (zero-padded)
    Y_folds: [K, nmax, P]  residualized phenotypes by fold
    mask_folds: [K, nmax, P] per-trait masks by fold (float 0/1)
    valid: [K, nmax] padding mask (float 0/1)
    lambdas: [J] ridge penalties
    Neff: [P] per-trait sample counts
    Returns W: [K, nmax, J, P] centered/scaled out-of-fold predictions
    (padded rows hold -mean*invsd, exactly like the reference's dense
    test_mat after centering).
    """
    # per-fold Gram + cross products (MXU hot spot; Data.cpp:729-767)
    G_folds = G_folds * valid[:, None, :]
    GGt_f = jnp.einsum("kbn,kcn->kbc", G_folds, G_folds, precision=_PREC)  # [K,B,B]
    GtY_f = jnp.einsum("kbn,knp->kbp", G_folds, Y_folds, precision=_PREC)  # [K,B,P]
    GGt = GGt_f.sum(axis=0)
    GTY = GtY_f.sum(axis=0)

    # leave-fold-out eigendecomposition, batched over K
    ww1 = GGt[None] - GGt_f  # [K,B,B]
    d, V = jnp.linalg.eigh(ww1)  # [K,B], [K,B,B]
    ww2 = jnp.einsum("kbc,kbp->kcp", V, GTY[None] - GtY_f, precision=_PREC)  # [K,B,P]

    # beta for all lambdas at once: [K,J,B,P]
    inv = 1.0 / (d[:, None, :] + lambdas[None, :, None])  # [K,J,B]
    beta = jnp.einsum("kbc,kjc,kcp->kjbp", V, inv, ww2, precision=_PREC)

    # out-of-fold predictions on the held fold, masked per trait
    pred = jnp.einsum("kjbp,kbn->knjp", beta, G_folds, precision=_PREC)  # [K,nmax,J,P]
    pred = pred * mask_folds[:, :, None, :]

    # center + scale over the whole sample (Step1_Models.cpp:539-560)
    p_sum = pred.sum(axis=(0, 1))  # [J,P]
    p_sum2 = (pred**2).sum(axis=(0, 1))  # [J,P]
    p_mean = p_sum / Neff[None, :]
    p_invsd = jnp.sqrt((Neff[None, :] - 1.0) / (p_sum2 - Neff[None, :] * p_mean**2))
    W = (pred - p_mean[None, None]) * p_invsd[None, None]
    return W


@jax.jit
def level0_loocv_block(G, Y, mask, lambdas, Neff):
    """Level-0 LOOCV ridge for one block (ridge_level_0_loocv,
    Step1_Models.cpp:615-723), vectorized over samples/params/phenos.

    G: [B, N] residualized genotypes; Y: [N, P]; mask: [N, P] float;
    Returns W: [N, J, P] centered/scaled within-block predictions.
    """
    GGt = mm(G, G.T)  # [B,B]
    GTY = mm(G, Y)  # [B,P]
    d, V = jnp.linalg.eigh(GGt)
    Wmat = mm(V.T, GTY)  # [B,P]
    DL_inv = 1.0 / (d[:, None] + lambdas[None, :])  # [B,J]

    VtG = mm(V.T, G)  # [B,N]
    # gvec[n,j] = sum_b VtG[b,n]^2 / (d_b + lambda_j)
    gvec = mm((VtG**2).T, DL_inv)  # [N,J]
    # z2t[n,j,p] = sum_b VtG[b,n] * DL_inv[b,j] * Wmat[b,p]
    z2t = jnp.einsum("bn,bj,bp->njp", VtG, DL_inv, Wmat, precision=_PREC)
    pred = (z2t - gvec[:, :, None] * Y[:, None, :]) / (1.0 - gvec)[:, :, None]

    # center and scale within the block (mask first)
    pred = pred * mask[:, None, :]
    p_mean = pred.sum(axis=0) / Neff[None, :]  # [J,P]
    pred = (pred - p_mean[None]) * mask[:, None, :]
    p_sd = jnp.sqrt((pred**2).sum(axis=0) / (Neff[None, :] - 1.0))
    return pred / p_sd[None]


@jax.jit
def level0_loocv_blocks(G3, Y, mask, lambdas, Neff):
    """level0_loocv_block over a stacked [nblk, B, N] group of blocks:
    ONE batched [nblk, B, B] eigh + batched matmuls per dispatch
    instead of nblk serialized solves.  The serialized eigh was 37% of
    per-block time (reference hot spot: per-block eigendecomposition,
    Step1_Models.cpp:494); batching keeps the MXU busy across blocks.
    Per-slice results carry no cross-block data dependence, so each
    block's W is the same computation regardless of group size
    (byte-identity with the per-block path is pinned by
    test_step1_kernels/test_split_l0)."""
    return jax.vmap(
        lambda g: level0_loocv_block(g, Y, mask, lambdas, Neff))(G3)


@jax.jit
def level0_loocv_block_betas(G, Y, mask, lambdas, Neff):
    """level0_loocv_block + per-SNP level-0 betas for --print (first
    trait only; beta_snp_step1 capture, Step1_Models.cpp:644 and W-scale
    adjustment :713). Returns (W [N,J,P], beta_snp [B,J] on the
    scaled-genotype scale, standardized like W)."""
    GGt = mm(G, G.T)
    GTY = mm(G, Y)
    d, V = jnp.linalg.eigh(GGt)
    Wmat = mm(V.T, GTY)
    DL_inv = 1.0 / (d[:, None] + lambdas[None, :])  # [B,J]
    beta_snp = mm(V, DL_inv * Wmat[:, :1])  # [B,J]

    VtG = mm(V.T, G)
    gvec = mm((VtG**2).T, DL_inv)
    z2t = jnp.einsum("bn,bj,bp->njp", VtG, DL_inv, Wmat, precision=_PREC)
    pred = (z2t - gvec[:, :, None] * Y[:, None, :]) / (1.0 - gvec)[:, :, None]
    pred = pred * mask[:, None, :]
    p_mean = pred.sum(axis=0) / Neff[None, :]
    pred = (pred - p_mean[None]) * mask[:, None, :]
    p_sd = jnp.sqrt((pred**2).sum(axis=0) / (Neff[None, :] - 1.0))
    beta_snp = beta_snp / p_sd[None, :, 0]
    return pred / p_sd[None], beta_snp


# ---------------------------------------------------------------------------
# level 1 (linear / QT)
# ---------------------------------------------------------------------------

@jax.jit
def level1_linear_kfold(W_folds, Y_folds, valid, taus, pgs_folds=None,
                        ridge_mult=None):
    """Level-1 linear ridge with K-fold CV for ONE phenotype
    (ridge_level_1, Step1_Models.cpp:772-870).

    W_folds: [K, nmax, F]  level-0 predictions by fold (F = blocks*J)
    Y_folds: [K, nmax]     residualized phenotype by fold
    valid:   [K, nmax]     padding mask
    taus:    [T] ridge penalties
    pgs_folds: [K, nmax] --test-l0 top-SNP PGS, removed from the response
    ridge_mult: [F] per-column penalty multiplier (--select-l0; matches
      the reference's eigenvalue-aligned shortcut, Step1_Models.cpp:833)
    Returns (beta [K, T, F] per-fold solutions, cumsum [5, T] CV metrics
    Sx, Sy, Sx2, Sy2, Sxy over held-out folds[, cumsum_full [5, T] with
    the PGS added back, vs the original response]).
    """
    Wv = W_folds * valid[:, :, None]
    Yv_orig = Y_folds * valid
    Yv = (Y_folds - pgs_folds) * valid if pgs_folds is not None else Yv_orig
    XtX_f = jnp.einsum("knf,kng->kfg", Wv, Wv, precision=_PREC)  # [K,F,F]
    XtY_f = jnp.einsum("knf,kn->kf", Wv, Yv, precision=_PREC)  # [K,F]
    XtX = XtX_f.sum(axis=0)
    XtY = XtY_f.sum(axis=0)

    X1 = XtX[None] - XtX_f  # [K,F,F]
    X2 = XtY[None] - XtY_f  # [K,F]
    d, V = jnp.linalg.eigh(X1)  # [K,F]
    VtX2 = jnp.einsum("kfg,kf->kg", V, X2, precision=_PREC)  # [K,F]
    if ridge_mult is None:
        inv = 1.0 / (d[:, None, :] + taus[None, :, None])  # [K,T,F]
    else:
        inv = 1.0 / (d[:, None, :] + taus[None, :, None] * ridge_mult[None, None, :])
    beta = jnp.einsum("kfg,ktg,kg->ktf", V, inv, VtX2, precision=_PREC)  # [K,T,F]

    # held-out predictions and CV metrics
    p1 = jnp.einsum("knf,ktf->knt", Wv, beta, precision=_PREC)  # [K,nmax,T]
    Sx = p1.sum(axis=(0, 1))  # [T]
    Sy = jnp.broadcast_to(Yv.sum(), Sx.shape)
    Sx2 = (p1**2).sum(axis=(0, 1))
    Sy2 = jnp.broadcast_to((Yv**2).sum(), Sx.shape)
    Sxy = (p1 * Yv[:, :, None]).sum(axis=(0, 1))
    cs = jnp.stack([Sx, Sy, Sx2, Sy2, Sxy])
    if pgs_folds is None:
        return beta, cs
    pf = p1 + (pgs_folds * valid)[:, :, None]
    fSx = pf.sum(axis=(0, 1))
    fSy = jnp.broadcast_to(Yv_orig.sum(), Sx.shape)
    fSx2 = (pf**2).sum(axis=(0, 1))
    fSy2 = jnp.broadcast_to((Yv_orig**2).sum(), Sx.shape)
    fSxy = (pf * Yv_orig[:, :, None]).sum(axis=(0, 1))
    return beta, cs, jnp.stack([fSx, fSy, fSx2, fSy2, fSxy])


@jax.jit
def level1_linear_loocv(W, Y, taus, neff_m_ncov, pgs=None, ridge_mult=None):
    """Level-1 linear ridge LOOCV for ONE phenotype
    (ridge_level_1_loocv, Step1_Models.cpp:875-962).

    W: [N, F]; Y: [N]; taus: [T]; neff_m_ncov: Neff - ncov (for Sy2).
    pgs: [N] --test-l0 top-SNP PGS removed from the response
    (Step1_Models.cpp:914); ridge_mult: [F] per-column penalty multiplier
    (--select-l0, eigenvalue-aligned as in Step1_Models.cpp:934).
    Returns cumsum [5, T] metrics (Sy=0 by centering; Sy2 = neff-ncov),
    plus cumsum_full [5, T] when pgs is given.
    """
    Yfit = Y - pgs if pgs is not None else Y
    xtx = mm(W.T, W)
    d, V = jnp.linalg.eigh(xtx)
    zvec = mm(V.T, mm(W.T, Yfit[:, None]))[:, 0]  # [F]
    tmp = mm(W, V)  # [N,F]
    if ridge_mult is None:
        inv = 1.0 / (d[None, :] + taus[:, None])  # [T,F]
    else:
        inv = 1.0 / (d[None, :] + taus[:, None] * ridge_mult[None, :])
    cal = mm(tmp**2, inv.T)  # [N,T]
    pred = mm(tmp, (inv * zvec[None, :]).T)  # [N,T]
    pred = (pred - cal * Yfit[:, None]) / (1.0 - cal)
    Sx = pred.sum(axis=0)
    Sy = jnp.zeros_like(Sx)
    Sx2 = (pred**2).sum(axis=0)
    if pgs is not None:
        # (Y-PGS) is no longer standardized (Step1_Models.cpp:946)
        Sy2 = jnp.broadcast_to((Yfit**2).sum(), Sx.shape)
    else:
        Sy2 = jnp.broadcast_to(neff_m_ncov, Sx.shape)
    Sxy = (pred * Yfit[:, None]).sum(axis=0)
    cs = jnp.stack([Sx, Sy, Sx2, Sy2, Sxy])
    if pgs is None:
        return cs
    pf = pred + pgs[:, None]
    fSx = pf.sum(axis=0)
    fSy = jnp.broadcast_to(Y.sum(), Sx.shape)
    fSx2 = (pf**2).sum(axis=0)
    fSy2 = jnp.broadcast_to((Y**2).sum(), Sx.shape)
    fSxy = (pf * Y[:, None]).sum(axis=0)
    return cs, jnp.stack([fSx, fSy, fSx2, fSy2, fSxy])


@jax.jit
def level1_linear_full_fit_loocv(W, Y, tau, ridge_mult=None):
    """Whole-data ridge refit + per-sample LOO betas for LOCO predictions
    (make_predictions_loocv, Data.cpp:1269-1345; per-column penalty
    diagonal when --select-l0 is active, Data.cpp:1297).

    Returns b0: [F, N] per-left-out-sample coefficient vectors.
    """
    F = W.shape[1]
    if ridge_mult is None:
        xtx = mm(W.T, W) + tau * jnp.eye(F, dtype=W.dtype)
    else:
        xtx = mm(W.T, W) + jnp.diag(tau * ridge_mult)
    d, V = jnp.linalg.eigh(xtx)
    tmpMat = mm(V / d[None, :], V.T)  # (X'X+tau I)^-1
    zvec = mm(W.T, Y[:, None])[:, 0]
    bvec = mm(tmpMat, zvec[:, None])[:, 0]  # [F]
    yres = Y - mm(W, bvec[:, None])[:, 0]  # [N]
    HX = mm(tmpMat, W.T)  # [F,N]
    cal = (W.T * HX).sum(axis=0)  # [N]
    b0 = bvec[:, None] - HX * (yres / (1.0 - cal))[None, :]
    return b0, bvec


def select_best_tau_qt(cumsum: np.ndarray, neff: float) -> int:
    """Pick ridge parameter minimizing CV MSE (Data.cpp:1023-1037)."""
    sse = cumsum[2] + cumsum[3] - 2 * cumsum[4]
    return int(np.argmin(sse / neff))


def cv_rsq(cumsum: np.ndarray, neff: float) -> np.ndarray:
    """CV R^2 per tau (Data.cpp:1058-1062)."""
    Sx, Sy, Sx2, Sy2, Sxy = cumsum[:5]
    num = Sxy - Sx * Sy / neff
    den = (Sx2 - Sx**2 / neff) * (Sy2 - Sy**2 / neff)
    return num**2 / den


def check_l0_selection(params, pv, log, silent=False):
    """--select-l0 / --rm-l0-pct level-0 block selection for one trait
    (check_l0, Step1_Models.cpp:1989-2065).

    pv: [NB] -log10 p per level-0 block (larger = stronger association).
    Returns (colkeep [NB*J] bool, ridge_mult [NB*J]): with --rm-l0-pct
    the least significant x% of blocks lose all their J predictors;
    otherwise strongly-associated blocks (Beta order-statistic outliers)
    keep only their min-shrinkage column, unpenalized (mult=0).
    """
    J = params.n_ridge_l0
    NB = len(pv)
    colkeep = np.ones(NB * J, dtype=bool)
    mult = np.ones(NB * J)
    qv = np.sort(np.asarray(pv, dtype=np.float64))
    if not silent:
        log("   -checking level 0 predictors for strength of associations "
            "with phenotype...")
    if params.rm_l0_pct != 0:
        n_rm = int(NB * (params.rm_l0_pct / 100.0))
        if n_rm >= NB:
            raise ValueError("invalid proportion specified for --rm-l0-pct")
        if not silent:
            log(f"   -removing the least {params.rm_l0_pct}% significant "
                "block level 0 predictors...")
        if n_rm >= 1:
            thr = qv[n_rm - 1]
            for i in range(NB):
                if pv[i] <= thr:
                    colkeep[i * J : (i + 1) * J] = False
        return colkeep, mult

    # adaptive: kth order statistic of U(0,1) p-values is Beta(k, NB-k)
    from scipy.stats import beta as _beta

    conf_alpha = 0.05 / NB
    thr = qv[NB - 1] + 1e-6
    for i in range(NB - 1):
        beta_q = -np.log10(_beta.ppf(conf_alpha / 2.0, i + 1, NB - i - 1))
        if (qv[NB - i - 1] < beta_q) or (i == NB - 2):
            if i > 0:
                thr = qv[NB - i]
            break
    ntop = int(np.ceil(0.05 * NB))
    q1, q2 = NB // 4, NB // 2
    q3 = q1 + q2
    if (pv >= thr).sum() >= ntop:
        iqr = qv[q3] - qv[q1]
        thr = max(thr, qv[q3] + 3 * iqr)
    if (pv >= thr).sum() >= ntop:
        thr = qv[NB - ntop]
    if not silent:
        log(f"   -{int((pv >= thr).sum())}/{NB} blocks selected "
            f"(Upper bound = {thr:.6g})...")
    for i in range(NB):
        if pv[i] >= thr:  # keep only the last (min shrinkage) ridge column
            colkeep[i * J : (i + 1) * J - 1] = False
            mult[(i + 1) * J - 1] = 0.0
    return colkeep, mult


def test_l0_block(params, Gn, Y, nspns_prev, log):
    """--test-l0 pre-screen (test_assoc_block + apply_iter_cond,
    Step1_Models.cpp:1868/2133): per phenotype, iteratively pick the top
    marginally-associated SNP of the block while p < --l0-pval-thr,
    conditioning subsequent tests on the picked set and dropping SNPs in
    high LD (r^2 > 0.9) with each pick. SNPs picked for EVERY phenotype
    are removed from the level-0 ridge.

    Gn: [B, N] residualized+scaled genotypes (GtG diag = N - K);
    Y: [N, P] residualized+scaled phenotypes.
    Returns (picked [B, P] bool, n_picked [P], pgs [N, P]) where pgs is
    the block's top-SNP polygenic score per trait (block_top_pgs,
    Step1_Models.cpp:2143/2171), later added back to the LOCO
    predictions and removed from the level-1 response."""
    from scipy.stats import chi2 as _chi2

    B = Gn.shape[0]
    P = Y.shape[1]
    picked = np.zeros((B, P), dtype=bool)
    n_picked = np.zeros(P, dtype=int)
    pgs = np.zeros((Gn.shape[1], P))
    if params.l0_snp_pval_thr <= 0 or B == 1:
        return picked, n_picked, pgs
    thr = _chi2.isf(params.l0_snp_pval_thr, df=1)
    GGt = Gn @ Gn.T
    GtY = Gn @ Y  # [B, P]
    ggt = GGt[0, 0]  # = N - K by construction
    LD = (GGt / (params.n_analyzed - params.ncov_analyzed)) ** 2

    for ph in range(P):
        gty = GtY[:, ph]
        ss_y = float(Y[:, ph] @ Y[:, ph])
        bstart = gty / ggt
        bvec = bstart.copy()
        nprev = nspns_prev[ph]
        v_y = (ss_y - bvec * gty) / (ggt - nprev - 1)
        v_beta = np.full(B, 1.0 / ggt)
        cand = np.arange(B)
        top: list = []
        for _ in range(1, B):
            if (~picked[:, ph]).sum() == 1:
                break
            chisq_v = bvec**2 / v_beta / np.maximum(v_y, 1e-300)
            k = int(np.argmax(chisq_v))
            if chisq_v[k] < thr:
                break
            idx = cand[k]
            top.append(idx)
            picked[idx, ph] = True
            n_picked[ph] += 1
            pgs[:, ph] += Gn[idx] * bvec[k]  # conditional beta at pick time
            # drop high-LD partners of the pick
            picked[:, ph] |= LD[:, idx] > 0.9
            cand = np.flatnonzero(~picked[:, ph])
            A = GGt[np.ix_(top, top)]
            try:
                A_inv = np.linalg.inv(A)
            except np.linalg.LinAlgError:
                break
            X21 = GGt[np.ix_(cand, top)] @ A_inv
            ss_x1 = float(gty[top] @ A_inv @ gty[top])
            bvec = bstart[cand] - (X21 @ gty[top]) / ggt
            v_y = (ss_y - ss_x1 - bvec * gty[cand]) / (
                ggt - nprev - n_picked[ph] - 1
            )
            v_beta = (ggt - (X21 * GGt[np.ix_(cand, top)]).sum(axis=1)) / ggt**2
    return picked, n_picked, pgs
