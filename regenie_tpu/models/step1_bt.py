"""Step 1 level-1 ridge for non-QT traits (logistic / Poisson).

Re-implements ridge_logistic_level_1_loocv + run_log_ridge_loocv
(Step1_Models.cpp:1159-1377) and make_predictions_binary_loocv
(Data.cpp:1484): penalized logistic Newton fit with step-halving on the
penalized deviance, then closed-form leave-one-out estimates.

Host f64 implementation; the [N, F] matmuls are the hot ops and move to
device in the large-N path.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import numpy as np

from ..config import BT, CT, Params
from .glm import get_pvec, get_logist_dev

L1_RIDGE_EPS = 1e-5
L1_RIDGE_TOL = 1e-4

_L1_DEV = {}


def _l1_dev():
    """Device kernels for the level-1 [N, F] products (the step-1 BT hot
    matmuls; replaces the reference's MKL-backed Eigen products)."""
    if _L1_DEV:
        return _L1_DEV
    import jax
    import jax.numpy as jnp

    from ..utils.dtypes import MATMUL_PRECISION as _PREC

    @jax.jit
    def xb(Xj, b):
        return jnp.matmul(Xj, b[:, None], precision=_PREC)[:, 0]

    @jax.jit
    def xtv(Xj, v):
        return jnp.matmul(Xj.T, v[:, None], precision=_PREC)[:, 0]

    @jax.jit
    def wgram(Xj, w):
        return jnp.einsum("nf,n,ng->fg", Xj, w, Xj, precision=_PREC)

    @jax.jit
    def lev(Xj, Ainv):
        # h[n] = x_n' A^-1 x_n
        return jnp.einsum("nf,fg,ng->n", Xj, Ainv, Xj, precision=_PREC)

    @jax.jit
    def lev_span(Xs, Ainv_rows, Xj):
        # q[n] = x_n[span]' (A^-1[span, :] x_n)
        return jnp.einsum("nf,fg,ng->n", Xs, Ainv_rows, Xj, precision=_PREC)

    _L1_DEV.update(xb=xb, xtv=xtv, wgram=wgram, lev=lev, lev_span=lev_span)
    return _L1_DEV


def _place_design(X):
    """[N, F] level-1 design on the accelerator. On an active mesh the
    rows are zero-padded to the mesh size and sharded so GSPMD
    partitions every downstream product across chips (psum'd
    N-reductions) — the level-1 analog of the level-0 shard_map kernels
    and the TPU replacement for the reference's --l1-phenoList
    trait-split of the level-1 solve (Regenie.hpp:239)."""
    import jax.numpy as jnp

    from ..parallel.mesh import place_rows_padded

    Xj, _np_rows = place_rows_padded(np.asarray(X), 0)
    return Xj


def _dev_ops(Xj, N: int):
    """Product closures over a (possibly row-padded, sharded) design:
    [N] vector args zero-padded to the design rows, per-sample outputs
    sliced back to N. Zero rows are exact (they contribute nothing to
    Grams or cross-products)."""
    import jax.numpy as jnp

    from ..parallel.mesh import to_host as _th

    k = _l1_dev()
    Np = int(Xj.shape[0])
    if Np == N:
        pad = lambda v: np.asarray(v)
    else:
        pad = lambda v: np.pad(np.asarray(v), (0, Np - N))
    return dict(
        xb=lambda b: _th(k["xb"](Xj, jnp.asarray(b)))[:N],
        xtv=lambda v: _th(k["xtv"](Xj, jnp.asarray(pad(v)))),
        wgram=lambda w_: _th(k["wgram"](Xj, jnp.asarray(pad(w_)))),
        lev=lambda Ainv_j: _th(k["lev"](Xj, Ainv_j))[:N],
        xb_cols=lambda sl, b: _th(
            k["xb"](Xj[:, sl], jnp.asarray(b)))[:N],
        lev_span=lambda sl, Ainv_j: _th(
            k["lev_span"](Xj[:, sl], Ainv_j[sl, :], Xj))[:N],
    )


def run_log_ridge(
    y: np.ndarray,
    X: np.ndarray,
    offset: np.ndarray,
    mask: np.ndarray,
    tau: float,
    beta0: np.ndarray,
    niter_max: int = 100,
    niter_line_search: int = 5,
    numtol: float = 1e-6,
    Xj=None,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray, bool]:
    """Penalized logistic Newton fit (run_log_ridge_loocv,
    Step1_Models.cpp:1288-1377). Returns (beta, pivec, wvec, converged).
    Xj: optional device copy of X — the [N, F] products then run on the
    accelerator."""
    maskf = mask.astype(np.float64)
    if Xj is not None:
        ops = _dev_ops(Xj, len(y))
        _xb, _xtv, _wgram = ops["xb"], ops["xtv"], ops["wgram"]
    else:
        _xb = lambda b: X @ b
        _xtv = lambda v: X.T @ v
        _wgram = lambda w_: (X.T * w_) @ X
    beta = beta0.copy()
    eta = offset + _xb(beta)
    pi = get_pvec(eta)
    fn_start = get_logist_dev(y, pi, mask) + float(np.sum(tau * beta**2))
    w = np.where(mask, pi * (1 - pi), 1.0)
    w = np.where(mask & ((pi < L1_RIDGE_EPS) | (pi > 1 - L1_RIDGE_EPS)), w, w)
    score = _xtv(np.where(mask, y - pi, 0.0)) - tau * beta

    niter_cur = 0
    dev_conv = False
    betanew = beta
    fn_end = fn_start
    F = X.shape[1]
    while niter_cur < niter_max:
        niter_cur += 1
        XtWX = np.diag(tau * np.ones(F)) + _wgram(maskf * w)
        try:
            step = np.linalg.solve(XtWX, score)
        except np.linalg.LinAlgError:
            return beta, pi, w, False
        for ls in range(niter_line_search):
            betanew = beta + step
            eta = offset + _xb(betanew)
            pi = get_pvec(eta)
            fn_end = get_logist_dev(y, pi, mask) + float(np.sum(tau * betanew**2))
            w = np.where(mask, pi * (1 - pi), 1.0)
            if fn_end < fn_start + numtol:
                break
            step = step / 2
        score = _xtv(np.where(mask, y - pi, 0.0)) - tau * betanew
        dev_conv = abs(fn_end - fn_start) / (0.01 + abs(fn_end)) < numtol
        if np.abs(score).max() < L1_RIDGE_TOL:
            beta = betanew
            return beta, pi, w, True
        beta = betanew
        fn_start = fn_end
    return beta, pi, w, dev_conv


def _loo_betas(X, y, pi, w, mask, beta, tau):
    """Closed-form LOO coefficient matrix b_loo [F, N]
    (ridge_logistic_level_1_loocv, Step1_Models.cpp:1238-1262)."""
    maskf = mask.astype(np.float64)
    F = X.shape[1]
    XtWX = np.diag(tau * np.ones(F)) + (X.T * (maskf * w)) @ X
    V1 = np.linalg.solve(XtWX, X.T)  # [F,N]
    v2 = (X * V1.T).sum(axis=1) * w  # [N]
    b_loo = beta[:, None] - V1 * ((y - pi) / (1 - v2))[None, :]
    return b_loo


def run_ct_ridge(
    y: np.ndarray,
    X: np.ndarray,
    offset: np.ndarray,
    mask: np.ndarray,
    tau: float,
    beta0: np.ndarray,
    niter_max: int = 100,
    Xj=None,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray, bool]:
    """Penalized Poisson IRLS (run_ct_ridge_loocv, Step1_Models.cpp:1680).
    Returns (beta, mu, w, converged) with w = mu."""
    maskf = mask.astype(np.float64)
    if Xj is not None:
        ops = _dev_ops(Xj, len(y))
        _xb, _xtv, _wgram = ops["xb"], ops["xtv"], ops["wgram"]
    else:
        _xb = lambda b: X @ b
        _xtv = lambda v: X.T @ v
        _wgram = lambda w_: (X.T * w_) @ X
    beta = beta0.copy()
    F = X.shape[1]
    for _ in range(niter_max):
        eta = offset + _xb(beta)
        mu = np.where(mask, np.exp(np.clip(eta, -30, 30)), 0.0)
        if (mu[mask] == 0).any():
            return beta, mu, mu, False
        z = np.where(mask, (eta - offset) + (y - mu) / mu, 0.0)
        XtWX = np.diag(tau * np.ones(F)) + _wgram(maskf * mu)
        try:
            betanew = np.linalg.solve(XtWX, _xtv(maskf * mu * z))
        except np.linalg.LinAlgError:
            return beta, mu, mu, False
        eta = offset + _xb(betanew)
        mu = np.where(mask, np.exp(np.clip(eta, -30, 30)), 0.0)
        score = _xtv(np.where(mask, y - mu, 0.0)) - tau * betanew
        beta = betanew
        if np.abs(score).max() < L1_RIDGE_TOL:
            return beta, mu, mu, True
    return beta, mu, mu, False


def level1_nonqt(params: Params, pd, W_all, offsets, taus, ph, chr_order, spans,
                 fold_sizes, log, ridge_mult=None):
    """Level-1 ridge for one non-QT trait; returns (predictions [N, C],
    converged). ridge_mult: [F] per-column penalty multiplier
    (--select-l0 adaptive selection; BT LOOCV only)."""
    if params.trait_mode == CT:
        return _level1_ct(params, pd, W_all, offsets, ph, chr_order, spans,
                          fold_sizes, log, ridge_mult=ridge_mult)
    from ..config import T2E

    if params.trait_mode == T2E:
        if ridge_mult is not None:
            # the reference's Cox level 1 ignores ridge_param_mult (only the
            # column subset from check_l0 applies; Step1_Models.cpp:2228+)
            log("   -note: --select-l0 penalty multipliers are not applied "
                "in the Cox level-1 fit (matches reference behavior)")
        return _level1_t2e(params, pd, W_all, offsets, taus, ph, chr_order, spans, fold_sizes, log)
    if params.trait_mode != BT:
        raise NotImplementedError("only BT/CT level-1 implemented so far")
    if fold_sizes is not None:
        return _level1_glm_kfold(
            params, pd, W_all, offsets, np.asarray(taus, dtype=np.float64), ph,
            chr_order, spans, fold_sizes, log, poisson=False,
            ridge_mult=ridge_mult,
        )

    y = pd.phenotypes_raw[:, ph]
    mask = pd.masked_indivs[:, ph]
    offset = offsets[:, ph]
    X = W_all[:, :, ph]  # [N, F]
    N, F = X.shape
    neff = pd.Neff[ph]

    def tau_eff(tau):
        return float(tau) if ridge_mult is None else float(tau) * ridge_mult

    # CV over tau grid: warm-started penalized fits + closed-form LOO.
    # The [N, F] products run on the accelerator; the LOO predictions use
    # the leverage identity eta_loo = eta - h*(y-pi)/(1-h*w) with
    # h = x'(X'WX + tau I)^-1 x, avoiding the [F, N] b_loo matrix.
    import jax.numpy as jnp

    Xj = _place_design(X)
    ops = _dev_ops(Xj, N)
    maskf = mask.astype(np.float64)

    def loo_quants(beta, pi, w, tau):
        A = np.diag(tau * np.ones(F)) + ops["wgram"](maskf * w)
        Ainv = np.linalg.inv(A)
        h = ops["lev"](np.asarray(Ainv))
        v2 = h * w
        s = (y - pi) / (1.0 - v2)
        eta_lin = ops["xb"](beta)
        return Ainv, h, s, eta_lin

    cumsum = np.zeros((6, len(taus)))
    beta = np.zeros(F)
    not_converged = False
    for j, tau in enumerate(taus):
        b_start = beta
        if params.use_adam:
            # --use-adam: ADAM pre-pass before every Newton solve
            # (use_adam, Step1_Models.cpp:1304-1310); --adam-mini
            # samples 128-row batches instead of the full gradient
            b_start = _adam_log_ridge(
                y, X, offset, mask, tau_eff(tau), beta, Xj=Xj,
                mini=params.adam_mini, seed=params.seed,
            )
        beta, pi, w, ok = run_log_ridge(
            y, X, offset, mask, tau_eff(tau), b_start, params.niter_max_ridge,
            params.niter_max_line_search, params.numtol, Xj=Xj,
        )
        if not ok:
            # ADAM pre-pass fallback (run_log_ridge_loocv_adam,
            # Step1_Models.cpp:1377) then retry Newton
            b_adam = _adam_log_ridge(y, X, offset, mask, tau_eff(tau), beta, Xj=Xj)
            beta, pi, w, ok = run_log_ridge(
                y, X, offset, mask, tau_eff(tau), b_adam, params.niter_max_ridge,
                params.niter_max_line_search, params.numtol, Xj=Xj,
            )
        if not ok:
            log("WARNING: ridge logistic regression did not converge! (Increase --niter)")
            not_converged = True
            break
        _, h, s, eta_lin = loo_quants(beta, pi, w, tau_eff(tau))
        eta_loo = eta_lin - h * s + offset
        p1 = 1.0 - 1.0 / (np.exp(np.clip(eta_loo, -30, 30)) + 1.0)
        p1 = np.clip(p1, L1_RIDGE_EPS, 1 - L1_RIDGE_EPS)
        m = mask
        cumsum[0, j] = p1[m].sum()
        cumsum[1, j] = y[m].sum()
        cumsum[2, j] = (p1[m] ** 2).sum()
        cumsum[3, j] = (y[m] ** 2).sum()
        cumsum[4, j] = (p1[m] * y[m]).sum()
        with np.errstate(divide="ignore"):
            nll = np.where(y == 0, -np.log(1 - p1), -np.log(p1))
        cumsum[5, j] = nll[m].sum()

    if not_converged:
        return None, False

    best = int(np.argmin(cumsum[5] / neff))
    _log_bt_tau_table(log, params, taus, cumsum, best, neff, F)
    if params.debug:
        log(f"  (selected tau = {taus[best]})")

    # final fit at best tau + LOO predictions per chromosome
    beta = np.zeros(F)
    beta, pi, w, ok = run_log_ridge(
        y, X, offset, mask, tau_eff(taus[best]), beta, params.niter_max_ridge,
        params.niter_max_line_search, params.numtol, Xj=Xj,
    )
    if not ok:
        return None, False
    predictions = np.zeros((N, len(chr_order)))
    if params.l1_full_samples:
        # --l1-full: use the full-sample fit directly instead of LOO betas
        # (make_predictions_binary_loocv_full, Data.cpp:1429)
        log("  * making predictions (using all samples)...")
        for ci, c in enumerate(chr_order):
            st_, nn = spans[c]
            sl = slice(st_, st_ + nn)
            predictions[:, ci] = ops["xb_cols"](sl, beta[sl])
        return predictions, True
    Ainv, h, s, _ = loo_quants(beta, pi, w, tau_eff(taus[best]))
    Ainv_j = np.asarray(Ainv)
    for ci, c in enumerate(chr_order):
        st_, nn = spans[c]
        sl = slice(st_, st_ + nn)
        pred_lin = ops["xb_cols"](sl, beta[sl])
        q_c = ops["lev_span"](sl, Ainv_j)
        predictions[:, ci] = pred_lin - q_c * s
    return predictions, True


def _level1_glm_kfold(params, pd, W_all, offsets, taus_vec, ph, chr_order,
                      spans, fold_sizes, log, poisson=False, ridge_mult=None):
    """K-fold level-1 penalized GLM ridge (ridge_logistic_level_1,
    Step1_Models.cpp:966; ridge_poisson_level_1 :1429): per held-out
    fold, warm-started IRLS over the tau grid on the training folds,
    honest held-out predictions accumulate the CV metrics, and the
    per-fold betas at the best tau build the LOCO predictions.

    W_all: [K, nmax, F, P] fold-major level-0 predictions."""
    K = params.cv_folds
    bounds = np.concatenate([[0], np.cumsum(fold_sizes)]).astype(int)
    F = W_all.shape[2]
    y_all = pd.phenotypes_raw[:, ph]
    mask_all = pd.masked_indivs[:, ph]
    off_all = offsets[:, ph]
    neff = pd.Neff[ph]
    N = y_all.shape[0]
    n_tau = len(taus_vec)
    l1_tol = 1e-4  # l1_ridge_tol (Regenie.hpp:289)
    # --select-l0 per-column penalty multiplier (ridge_logistic_level_1 /
    # ridge_poisson_level_1 apply tau * ridge_param_mult on the diagonal,
    # Step1_Models.cpp:1031-1041, 1476)
    mult = np.ones(F) if ridge_mult is None else np.asarray(ridge_mult, dtype=np.float64)

    Xf, yf, mf, of = [], [], [], []
    for k in range(K):
        nk = int(fold_sizes[k])
        rows = slice(bounds[k], bounds[k + 1])
        Xf.append(W_all[k, :nk, :, ph])
        yf.append(y_all[rows])
        mf.append(mask_all[rows].astype(np.float64))
        of.append(off_all[rows])

    def link(eta):
        eta = np.clip(eta, -30, 30)
        if poisson:
            mu = np.exp(eta)
            return mu, mu
        pi = 1.0 / (1.0 + np.exp(-eta))
        return pi, pi * (1.0 - pi)

    import jax.numpy as jnp

    cumsum = np.zeros((6, n_tau))
    beta_hat = np.zeros((K, F, n_tau))
    for i in range(K):
        train = [k for k in range(K) if k != i]
        Xt = np.vstack([Xf[k] for k in train])
        yt = np.concatenate([yf[k] for k in train])
        mt = np.concatenate([mf[k] for k in train])
        ot = np.concatenate([of[k] for k in train])
        # training design on the accelerator; sample-sharded on a mesh
        ops = _dev_ops(_place_design(Xt), len(yt))
        beta = np.zeros(F)
        for j, tau in enumerate(taus_vec):
            for _ in range(params.niter_max_ridge):
                eta = ot + ops["xb"](beta)
                mu, w = link(eta)
                z = np.where(mt > 0, (eta - ot) + (yt - mu) / np.maximum(w, 1e-12), 0.0)
                A = ops["wgram"](w * mt) + np.diag(float(tau) * mult)
                try:
                    beta_new = np.linalg.solve(A, ops["xtv"]((w * mt) * z))
                except np.linalg.LinAlgError:
                    log("WARNING: singular system in level-1 K-fold ridge")
                    return None, False
                mu2, _w2 = link(ot + ops["xb"](beta_new))
                score = ops["xtv"](mt * (yt - mu2)) - float(tau) * mult * beta_new
                beta = beta_new
                if np.abs(score).max() < l1_tol:
                    break
            else:
                log("WARNING: penalized regression did not converge! (Increase --niter)")
                return None, False
            beta_hat[i, :, j] = beta

            # held-out fold metrics
            p1, _ = link(of[i] + Xf[i] @ beta)
            m = mf[i] > 0
            if not poisson:
                p1 = np.clip(p1, L1_RIDGE_EPS, 1 - L1_RIDGE_EPS)
            yi = yf[i]
            cumsum[0, j] += p1[m].sum()
            cumsum[1, j] += yi[m].sum()
            cumsum[2, j] += (p1[m] ** 2).sum()
            cumsum[3, j] += (yi[m] ** 2).sum()
            cumsum[4, j] += (p1[m] * yi[m]).sum()
            if poisson:
                cumsum[5, j] += (
                    -(yi[m] * np.log(np.maximum(p1[m], 1e-300)) - p1[m])
                ).sum()
            else:
                with np.errstate(divide="ignore"):
                    nll = np.where(yi == 0, -np.log(1 - p1), -np.log(p1))
                cumsum[5, j] += nll[m].sum()

    best = int(np.argmin(cumsum[5] / neff))
    if poisson:
        from ..prep import fmt

        for j in range(n_tau):
            line = f"  tau[{j}] : -logLik/N = {fmt(cumsum[5, j] / neff)}"
            if j == best:
                line += "<- min value"
            log(line)
    else:
        _log_bt_tau_table(log, params, taus_vec, cumsum, best, neff, F)

    predictions = np.zeros((N, len(chr_order)))
    for k in range(K):
        rows = slice(bounds[k], bounds[k + 1])
        for ci, c in enumerate(chr_order):
            st_, nn = spans[c]
            predictions[rows, ci] = Xf[k][:, st_ : st_ + nn] @ beta_hat[k, st_ : st_ + nn, best]
    return predictions, True


def _log_bt_tau_table(log, params, taus, cumsum, best, neff, n_feats):
    """CV metric table per ridge parameter (Data::output, Data.cpp:1043-1077)."""
    from ..prep import fmt

    Sx, Sy, Sx2, Sy2, Sxy, nLL = cumsum
    for j in range(len(taus)):
        h_eff = n_feats / (n_feats + (np.pi**2 / 3) * taus[j])
        rsq_num = Sxy[j] - Sx[j] * Sy[j] / neff
        rsq = rsq_num**2 / ((Sx2[j] - Sx[j] ** 2 / neff) * (Sy2[j] - Sy[j] ** 2 / neff))
        line = (
            f"  {fmt(h_eff):>5} : Rsq = {fmt(rsq)}, MSE = "
            f"{fmt((Sx2[j] + Sy2[j] - 2 * Sxy[j]) / neff)}, -logLik/N = {fmt(nLL[j] / neff)}"
        )
        if j == best:
            line += "<- min value"
        log(line)


def _level1_ct(params, pd, W_all, offsets, ph, chr_order, spans, fold_sizes,
               log, ridge_mult=None):
    """Level-1 Poisson ridge LOOCV (ridge_poisson_level_1_loocv,
    Step1_Models.cpp:1585) or K-fold (ridge_poisson_level_1 :1429)."""
    if fold_sizes is not None:
        from ..config import ridge_h2_grid

        F = W_all.shape[2]
        mask = pd.masked_indivs[:, ph]
        rate = pd.phenotypes_raw[mask, ph].sum() / pd.Neff[ph]
        h = ridge_h2_grid(params.n_ridge_l1)
        taus_ct = F / np.log1p(h / (rate * (1 - h)))
        return _level1_glm_kfold(
            params, pd, W_all, offsets, taus_ct, ph, chr_order, spans,
            fold_sizes, log, poisson=True, ridge_mult=ridge_mult,
        )
    y = pd.phenotypes_raw[:, ph]
    mask = pd.masked_indivs[:, ph]
    offset = offsets[:, ph]
    X = W_all[:, :, ph]
    N, F = X.shape
    neff = pd.Neff[ph]
    rate = y[mask].sum() / neff

    # CT tau: K / log(1 + h/(rate(1-h))) (Step1_Models.cpp:2103)
    from ..config import ridge_h2_grid

    h = ridge_h2_grid(params.n_ridge_l1)
    taus_ct = F / np.log1p(h / (rate * (1 - h)))

    cumsum = np.zeros((6, len(taus_ct)))
    beta = np.zeros(F)
    maskf = mask.astype(np.float64)
    # --select-l0 per-column penalty (run_ct_ridge_loocv applies
    # lambda * ridge_param_mult, Step1_Models.cpp:1719-1745)
    mult = np.ones(F) if ridge_mult is None else np.asarray(ridge_mult, dtype=np.float64)
    import jax.numpy as jnp

    Xj = _place_design(X)
    ops = _dev_ops(Xj, N)

    def loo_quants(beta, mu, w, tau):
        A = np.diag(tau * np.ones(F)) + ops["wgram"](maskf * w)
        Ainv = np.linalg.inv(A)
        h = ops["lev"](np.asarray(Ainv))
        s = (y - mu) / (1.0 - h * w)
        eta_lin = ops["xb"](beta)
        return Ainv, h, s, eta_lin

    for j, tau in enumerate(taus_ct):
        beta, mu, w, ok = run_ct_ridge(y, X, offset, mask, float(tau) * mult, beta,
                                       params.niter_max_ridge, Xj=Xj)
        if not ok:
            log("WARNING: ridge poisson regression did not converge! (Increase --niter)")
            return None, False
        _, h, s, eta_lin = loo_quants(beta, mu, w, float(tau) * mult)
        eta_loo = eta_lin - h * s + offset
        p1 = np.exp(np.clip(eta_loo, -30, 30))
        m = mask
        cumsum[0, j] = p1[m].sum()
        cumsum[1, j] = y[m].sum()
        cumsum[2, j] = (p1[m] ** 2).sum()
        cumsum[3, j] = (y[m] ** 2).sum()
        cumsum[4, j] = (p1[m] * y[m]).sum()
        cumsum[5, j] = (-(y[m] * np.log(np.maximum(p1[m], 1e-300)) - p1[m])).sum()

    best = int(np.argmin(cumsum[5] / neff))
    from ..prep import fmt

    for j in range(len(taus_ct)):
        zv = np.exp(F / taus_ct[j]) - 1
        h_eff = rate * zv / (1 + rate * zv)
        line = f"  {fmt(h_eff):>5} : -logLik/N = {fmt(cumsum[5, j] / neff)}"
        if j == best:
            line += "<- min value"
        log(line)

    beta = np.zeros(F)
    beta, mu, w, ok = run_ct_ridge(y, X, offset, mask, float(taus_ct[best]) * mult, beta,
                                   params.niter_max_ridge, Xj=Xj)
    if not ok:
        return None, False
    Ainv, h, s, _ = loo_quants(beta, mu, w, float(taus_ct[best]) * mult)
    Ainv_j = np.asarray(Ainv)
    predictions = np.zeros((N, len(chr_order)))
    for ci, c in enumerate(chr_order):
        st_, nn = spans[c]
        sl = slice(st_, st_ + nn)
        pred_lin = ops["xb_cols"](sl, beta[sl])
        q_c = ops["lev_span"](sl, Ainv_j)
        predictions[:, ci] = pred_lin - q_c * s
    return predictions, True


def _level1_t2e(params, pd, W_all, offsets, taus, ph, chr_order, spans, fold_sizes, log):
    """Level-1 Cox ridge with K-fold CV (ridge_cox_level_1,
    Step1_Models.cpp:2228): per-fold lambda-path fits with warm starts,
    deviance evaluated on the held-out fold, per-fold predictions."""
    from ..config import ridge_h2_grid
    from .survival import CoxRidge, SurvivalData

    ename = params.t2e_map[pd.pheno_names[ph]]
    ei = pd.pheno_names.index(ename)
    # --t2e-event-l0: the event column's level-0 predictions feed level 1
    # (l0_idx = event_index, Step1_Models.cpp:2259)
    l0_idx = ei if params.t2e_event_l0 else ph
    time = pd.phenotypes_raw[:, ph]
    status = pd.phenotypes_raw[:, ei]
    mask = pd.masked_indivs[:, ph]
    offset = offsets[:, ph]
    N = len(time)
    K = params.cv_folds
    ntau = params.n_ridge_l1

    # sample-major W
    if W_all.ndim == 4:
        pieces = [W_all[k, : int(fold_sizes[k]), :, l0_idx] for k in range(K)]
        X = np.concatenate(pieces, axis=0)
    else:
        X = W_all[:, :, l0_idx]
    F = X.shape[1]

    if params.t2e_l1_pi6:
        # --t2e-l1-pi6: heritability-based penalty grid F*(1-h)/h * 6/pi^2
        # (Step1_Models.cpp:2106-2110)
        taus_t2e = np.asarray(taus, dtype=np.float64) * 6.0 / (np.pi**2)
    else:
        # lambda_max from gradient at beta=0 (getCoxLambdaMax, Step1_Models.cpp:446)
        sd_all = SurvivalData()
        sd_all.setup(time, status, mask, norm_weights=True)
        cr0 = CoxRidge(sd_all, X, offset, mask, 0.0, params.niter_max,
                       params.niter_max_line_search, 2.5e-4)
        grad, _ = cr0._grad(cr0.eta, sd_all.to_order(cr0.eta))
        lambda_max = np.abs(X.T @ grad).max() / 1e-3
        # tau grid: exp-spaced from lambda_max down by 1e-6 (Step1_Models.cpp:2112)
        idx = np.arange(ntau, dtype=np.float64)
        taus_t2e = np.exp(idx / (ntau - 1) * np.log(1e-6) + np.log(lambda_max))

    # fold ids (contiguous sample ranges)
    fold_id = np.zeros(N, dtype=int)
    bounds = np.concatenate([[0], np.cumsum(fold_sizes)])
    for k in range(K):
        fold_id[bounds[k] : bounds[k + 1]] = k

    dev = np.zeros(ntau)
    beta_folds = np.zeros((K, ntau, F))
    not_conv = False
    for k in range(K):
        train = (fold_id != k) & mask
        test = (fold_id == k) & mask
        sd_tr = SurvivalData()
        sd_tr.setup(time, status, train, norm_weights=True)
        beta_init = np.zeros(F)
        for l, tau in enumerate(taus_t2e):  # path with warm starts
            cr = CoxRidge(sd_tr, X, offset, train, float(tau),
                          params.niter_max_ridge, params.niter_max_line_search,
                          1e-4, beta_init=beta_init)
            cr.fit()
            if not cr.converge:
                not_conv = True
            beta_init = cr.beta.copy()
            beta_folds[k, l] = cr.beta
            # held-out deviance at the trained beta
            sd_te = SurvivalData()
            sd_te.setup(time, status, test, norm_weights=True)
            cr_te = CoxRidge(sd_te, X, offset, test, float(tau),
                             beta_init=cr.beta)
            eta_te = np.where(test, X @ cr.beta + offset, 0.0)
            dev[l] += cr_te._deviance(sd_te.to_order(eta_te))

    if not_conv:
        log("WARNING: Cox ridge did not fully converge across folds")
    best = int(np.argmin(dev))
    from ..prep import fmt

    for l in range(ntau):
        line = f"  {fmt(taus_t2e[l]):>9} : Deviance = {fmt(dev[l])}"
        if l == best:
            line += "<- min value"
        log(line)

    predictions = np.zeros((N, len(chr_order)))
    for k in range(K):
        rows = slice(bounds[k], bounds[k + 1])
        for ci, c in enumerate(chr_order):
            st_, nn = spans[c]
            predictions[rows, ci] = X[rows, st_ : st_ + nn] @ beta_folds[k, best, st_ : st_ + nn]
    return predictions, True


def _adam_log_ridge(y, X, offset, mask, tau, beta0, niter=500, alpha=0.01,
                    b1=0.9, b2=0.999, eps=1e-7, tol=1e-4, Xj=None,
                    mini=False, batch_size=128, seed=0):
    """ADAM on the penalized logistic score — pre-pass / fallback
    optimizer for level-1 ridge (run_log_ridge_loocv_adam,
    Step1_Models.cpp:1377). Full-batch deterministic by default;
    `mini` samples `batch_size` analyzed rows per step (the reference's
    --adam-mini path, adam_batch_size=128 Regenie.hpp:243) with the
    whole gradient (penalty included) scaled by the batch size and a
    step-size stopping rule."""
    maskf = mask.astype(np.float64)
    if mini:
        rng = np.random.default_rng(seed)
        rows = np.flatnonzero(mask)
        beta = beta0.copy()
        mt = np.zeros_like(beta)
        vt = np.zeros_like(beta)
        for it in range(1, niter + 1):
            bidx = rows[rng.integers(0, len(rows), size=batch_size)]
            eta = np.clip(offset[bidx] + X[bidx] @ beta, -30, 30)
            pi = 1.0 / (1.0 + np.exp(-eta))
            grad = (tau * beta - X[bidx].T @ (y[bidx] - pi)) / batch_size
            mt = b1 * mt + (1 - b1) * grad
            vt = b2 * vt + (1 - b2) * grad**2
            a_t = alpha * np.sqrt(1 - b2**it) / (1 - b1**it)
            step = a_t * mt / (np.sqrt(vt) + eps)
            if np.abs(step).max() < tol:
                break
            beta -= step
        return beta
    if Xj is not None:
        ops = _dev_ops(Xj, len(y))
        _xb, _xtv = ops["xb"], ops["xtv"]
    else:
        _xb = lambda b: X @ b
        _xtv = lambda v: X.T @ v
    beta = beta0.copy()
    mt = np.zeros_like(beta)
    vt = np.zeros_like(beta)
    for it in range(1, niter + 1):
        eta = np.clip(offset + _xb(beta), -30, 30)
        pi = 1.0 / (1.0 + np.exp(-eta))
        grad = -(_xtv(maskf * (y - pi)) - tau * beta)
        if np.abs(grad).max() < tol:
            break
        mt = b1 * mt + (1 - b1) * grad
        vt = b2 * vt + (1 - b2) * grad**2
        a_t = alpha * np.sqrt(1 - b2**it) / (1 - b1**it)
        beta -= a_t * mt / (np.sqrt(vt) + eps)
    return beta
