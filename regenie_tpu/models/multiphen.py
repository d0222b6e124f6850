"""MultiPhen test (--multiphen): reverse ordinal regression of genotype
on multiple traits.

Re-implements the reference's Ordinal.cpp machinery (MultiPhen::run
:169, run_test_add_offset :~400, FitOrdinal POM fitting, score test
test_score_*): the hardcall genotype (0/1/2) is regressed on the LOCO
phenotype residuals with a proportional-odds model (3 categories) or
logistic model (2 categories); the default test is a fast score test at
the no-covariate null, escalating to a likelihood-ratio test with the
full model when p < --multiphen-thr.

Design differences from the reference (behavior-preserving): the POM
log-likelihood is differentiated with JAX autodiff and solved by a
damped Newton loop instead of 3k lines of hand-written Fisher-scoring
updates. The LRT refits the exact full model by default (the reference
default); --multiphen-approx-offset enables the reference's optional
offset-frozen approximation (covariate effects fixed at the null fit).
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Optional, Tuple

import numpy as np
from scipy.stats import chi2

import jax
import jax.numpy as jnp


# ---------------------------------------------------------------------------
# Proportional-odds model via autodiff
# ---------------------------------------------------------------------------

_CPU_DEV = None


def _cpu():
    """The host-CPU jax device: MultiPhen's per-SNP Newton solves are
    tiny host-side f64 problems — never ship them to the accelerator."""
    global _CPU_DEV
    if _CPU_DEV is None:
        # local_devices, NOT devices: under the multi-host runtime the
        # global list starts with process 0's devices — default_device
        # to a non-addressable remote device breaks every float() fetch
        _CPU_DEV = jax.local_devices(backend="cpu")[0]
    return _CPU_DEV


@partial(jax.jit, static_argnames=("K",))
def _pom_negll(par, Xf, Yoh, maskf, K):
    """Negative log-likelihood of the cumulative-logit POM.

    par = [theta_0..theta_{K-2}, beta...]; Xf [N, C]; Yoh [N, K] one-hot.
    Monotone intercepts via cumulative softplus-free direct values (the
    optimum has ordered thetas automatically for identified data)."""
    theta = par[: K - 1]
    beta = par[K - 1 :]
    eta = Xf @ beta  # [N]
    cum = jax.nn.sigmoid(theta[None, :] - eta[:, None])  # P(g<=k) [N, K-1]
    cum1 = jnp.concatenate([cum, jnp.ones((Xf.shape[0], 1))], axis=1)
    cum0 = jnp.concatenate([jnp.zeros((Xf.shape[0], 1)), cum], axis=1)
    pi = jnp.clip(cum1 - cum0, 1e-12, 1.0)
    ll = (Yoh * jnp.log(pi)).sum(axis=1) * maskf
    return -ll.sum()


_pom_grad = jax.jit(jax.grad(_pom_negll), static_argnames=("K",))
_pom_hess = jax.jit(jax.hessian(_pom_negll), static_argnames=("K",))


def _pom_funcs(par, Xf, Yoh, maskf, K, want_hess=False):
    """Evaluate negll/grad(/hess) on CPU in float64 regardless of the
    session's default device or x64 flag."""
    with jax.enable_x64(True), jax.default_device(_cpu()):
        a = [jnp.asarray(np.asarray(x, dtype=np.float64))
             for x in (par, Xf, Yoh, maskf)]
        f = float(_pom_negll(*a, K))
        g = np.asarray(_pom_grad(*a, K))
        H = np.asarray(_pom_hess(*a, K)) if want_hess else None
    return f, g, H


def _fit_pom(X, Yoh, maskf, K, theta0=None, maxit=150, tol=2.5e-4,
             max_step=200.0):
    """Damped-Newton POM fit. Returns (par, negll, niter, converged)."""
    N, C = X.shape
    par = np.zeros(K - 1 + C)
    if theta0 is None:
        # start intercepts at marginal cumulative logits
        cnt = (Yoh * maskf[:, None]).sum(axis=0)
        cf = np.cumsum(cnt)[:-1] / cnt.sum()
        par[: K - 1] = np.log(cf / (1 - cf))
    else:
        par[: K - 1] = theta0
    f, _g, _ = _pom_funcs(par, X, Yoh, maskf, K)
    it = 0
    for it in range(1, maxit + 1):
        _f, g, H = _pom_funcs(par, X, Yoh, maskf, K, want_hess=True)
        try:
            step = np.linalg.solve(H, g)
        except np.linalg.LinAlgError:
            return par, f, it, False
        mx = np.abs(step).max()
        if mx > max_step:
            step *= max_step / mx
        ok = False
        for _ in range(8):
            cand = par - step
            fc, _gc, _ = _pom_funcs(cand, X, Yoh, maskf, K)
            if np.isfinite(fc) and fc <= f + 1e-12:
                ok = True
                break
            step /= 2
        if not ok:
            return par, f, it, False
        done = np.abs(g).max() < tol
        par, f = cand, fc
        if done:
            return par, f, it, True
    return par, f, it, False


def _fit_pom_offset(Y_add, theta, off, Yoh, maskf, K, maxit=150,
                    tol=2.5e-4, max_step=200.0):
    """Offset-approximation full-model POM fit (--multiphen-approx-offset,
    Ordinal.cpp:773-812): intercepts and the covariate linear predictor
    are frozen at the null fit (passed as `theta` and `off`), only the
    phenotype coefficients are free. Implemented as a damped Newton on
    the free sub-block of the existing autodiff grad/hessian, with the
    offset as a pinned-coefficient column.

    Returns (beta, negll, niter, converged)."""
    N, P = Y_add.shape
    Xf = np.concatenate([off[:, None], Y_add], axis=1)
    nfix = K - 1 + 1  # theta block + pinned offset coefficient

    def pack(beta):
        return np.concatenate([theta, [1.0], beta])

    beta = np.zeros(P)
    f, _g, _ = _pom_funcs(pack(beta), Xf, Yoh, maskf, K)
    it = 0
    for it in range(1, maxit + 1):
        _f, g, H = _pom_funcs(pack(beta), Xf, Yoh, maskf, K, want_hess=True)
        gf = g[nfix:]
        Hf = H[nfix:, nfix:]
        try:
            step = np.linalg.solve(Hf, gf)
        except np.linalg.LinAlgError:
            return beta, f, it, False
        mx = np.abs(step).max()
        if mx > max_step:
            step *= max_step / mx
        ok = False
        for _ in range(8):
            cand = beta - step
            fc, _gc, _ = _pom_funcs(pack(cand), Xf, Yoh, maskf, K)
            if np.isfinite(fc) and fc <= f + 1e-12:
                ok = True
                break
            step /= 2
        if not ok:
            return beta, f, it, False
        done = np.abs(gf).max() < tol
        beta, f = cand, fc
        if done:
            return beta, f, it, True
    return beta, f, it, False


def _pom_score_test(par_null, X_null, Y_add, Yoh, maskf, K):
    """Efficient score test for adding Y_add columns to a fitted POM:
    evaluate grad/hessian of the FULL model at (par_null, 0) and form
    U' V^-1 U with V the efficient information of the added block."""
    C0 = X_null.shape[1]
    P = Y_add.shape[1]
    Xf = np.concatenate([X_null, Y_add], axis=1) if C0 else Y_add
    par = np.concatenate([par_null, np.zeros(P)])
    _f, g, H = _pom_funcs(par, Xf, Yoh, maskf, K, want_hess=True)
    U = -g[-P:]  # score of the loglik (negll grad is -score); null part ~0
    I_aa = H[:-P, :-P]
    I_ab = H[:-P, -P:]
    I_bb = H[-P:, -P:]
    try:
        V = I_bb - I_ab.T @ np.linalg.solve(I_aa, I_ab)
        stat = float(U @ np.linalg.solve(V, U))
    except np.linalg.LinAlgError:
        return -1.0
    if stat < 0:
        return -1.0
    return float(chi2.sf(stat, P))


# ---------------------------------------------------------------------------
# Binomial path (2 genotype categories)
# ---------------------------------------------------------------------------

def _fit_logistic(X, y, maskf, firth_mult=0.0, maxit=150, tol=2.5e-4,
                  max_step=200.0, offset=None, X_pen=None):
    """Logistic fit with optional Firth penalty (FitOrdinal::fit_binom).
    `offset` freezes a linear-predictor component (the --multiphen-
    approx-offset full-model fit, Ordinal.cpp:726-771). `X_pen` computes
    the Firth determinant over a wider design than the free columns (the
    reference's null-fit convention for the Firth LRT: the penalty uses
    the full-model information at the null, inc_phen_null
    Ordinal.cpp:263, so the det terms cancel in the LRT).
    Returns (beta, penalized_loglik, niter, converged)."""
    N, C = X.shape
    beta = np.zeros(C)
    off = np.zeros(N) if offset is None else offset
    Xp = X if X_pen is None else X_pen

    def negll(b):
        eta = np.clip(off + X @ b, -30, 30)
        pi = 1 / (1 + np.exp(-eta))
        ll = (y * np.log(pi) + (1 - y) * np.log1p(-pi)) * maskf
        val = -ll.sum()
        if firth_mult > 0:
            w = pi * (1 - pi) * maskf
            Ii = Xp.T @ (Xp * w[:, None])
            s, ld = np.linalg.slogdet(Ii)
            val -= 0.5 * firth_mult * ld
        return val

    f = negll(beta)
    it = 0
    for it in range(1, maxit + 1):
        eta = np.clip(off + X @ beta, -30, 30)
        pi = 1 / (1 + np.exp(-eta))
        w = pi * (1 - pi) * maskf
        Ii = X.T @ (X * w[:, None])
        resid = (y - pi) * maskf
        if firth_mult > 0:
            # hat values of the penalty design drive the score correction
            Ip = Xp.T @ (Xp * w[:, None])
            try:
                solp = np.linalg.solve(Ip, Xp.T)
            except np.linalg.LinAlgError:
                return beta, -f, it, False
            h = (solp.T * (Xp * w[:, None])).sum(axis=1)
            resid = resid + firth_mult * h * (0.5 - pi) * maskf
        g = X.T @ resid
        try:
            step = np.linalg.solve(Ii, g)
        except np.linalg.LinAlgError:
            return beta, -f, it, False
        mx = np.abs(step).max()
        if mx > max_step:
            step *= max_step / mx
        ok = False
        for _ in range(8):
            cand = beta + step
            fc = negll(cand)
            if np.isfinite(fc) and fc <= f + 1e-12:
                ok = True
                break
            step /= 2
        if not ok:
            return beta, -f, it, np.abs(g).max() < tol
        done = np.abs(g).max() < tol
        beta, f = cand, fc
        if done:
            return beta, -f, it, True
    return beta, -f, it, False


def _binom_score_test(X_null, beta_null, Y_add, y, maskf):
    eta = np.clip(X_null @ beta_null, -30, 30)
    pi = 1 / (1 + np.exp(-eta))
    w = pi * (1 - pi) * maskf
    U = Y_add.T @ ((y - pi) * maskf)
    I_aa = X_null.T @ (X_null * w[:, None])
    I_ab = X_null.T @ (Y_add * w[:, None])
    I_bb = Y_add.T @ (Y_add * w[:, None])
    try:
        V = I_bb - I_ab.T @ np.linalg.solve(I_aa, I_ab)
        stat = float(U @ np.linalg.solve(V, U))
    except np.linalg.LinAlgError:
        return -1.0
    if stat < 0:
        return -1.0
    return float(chi2.sf(stat, Y_add.shape[1]))


# ---------------------------------------------------------------------------
# Per-SNP driver
# ---------------------------------------------------------------------------

@dataclass
class MPhenResult:
    pval: float = -1.0  # raw p; -1 = failed/NA
    is_multinom: bool = False
    niter: int = 0
    n_updates: int = 0
    used_firth: bool = False


def multiphen_snp(params, g_raw, Xcov, Yres, mask) -> MPhenResult:
    """MultiPhen for one variant (MultiPhen::run + run_test_add_offset).

    g_raw: [N] genotypes (missing=-3; dosages rounded to hardcalls);
    Xcov: [N, C] covariates (orthonormal basis incl. intercept);
    Yres: [N, P] LOCO phenotype residuals; mask: [N] bool."""
    r = MPhenResult()
    gi = np.round(np.asarray(g_raw, dtype=np.float64)).astype(np.int64)
    m = mask & (np.asarray(g_raw) != -3)
    maskf = m.astype(np.float64)
    cats = np.unique(gi[m])
    if len(cats) < 2:
        return r
    K = len(cats)
    r.is_multinom = K > 2
    code = np.searchsorted(cats, np.where(m, gi, cats[0]))
    Ym = Yres * maskf[:, None]
    ones = np.ones((len(gi), 1))

    tol = params.multiphen_tol
    maxit = params.multiphen_maxit
    mstep = params.multiphen_maxstep
    fm = params.multiphen_firth_mult

    # --multiphen-approx-offset gate (setup_approx_offset,
    # Ordinal.cpp:856-868): 0/-1 disabled, 1 always, >1 when the minor
    # genotype-category count exceeds the threshold
    mao = getattr(params, "multiphen_approx_offset", -1)
    ncat_minor = int(np.bincount(code[m]).min())
    use_off = (mao == 1) or (mao > 1 and ncat_minor > mao)

    # --multiphen-test strategy (MultiPhen::run dispatch,
    # Ordinal.cpp:184-206). Aliases map to the same computation here:
    # cov_score_it1 -> cov_score; nocov_score_addcov / offset ->
    # nocov_score_offset (the default score-then-LRT escalation).
    mode = getattr(params, "multiphen_test", None) or "nocov_score_offset"
    mode = {"cov_score_it1": "cov_score", "nocov_score_addcov":
            "nocov_score_offset", "offset": "nocov_score_offset"}.get(mode, mode)
    if mode == "none":
        return r
    if mode not in ("nocov_score", "cov_score", "nocov_lrt", "cov_lrt",
                    "nocov_score_offset"):
        raise ValueError(f"unknown --multiphen-test mode: {mode}")
    score_stage = mode in ("nocov_score", "cov_score", "nocov_score_offset")
    lrt_stage = mode in ("nocov_lrt", "cov_lrt", "nocov_score_offset")
    lrt_cov = mode != "nocov_lrt"

    if K == 2:
        y = code.astype(np.float64) * maskf
        Xn = Xcov * maskf[:, None]
        if score_stage:
            # score test at the no-covariate or covariate null
            Xnull = Xn if mode == "cov_score" else ones
            b0, _ll, it0, ok = _fit_logistic(Xnull, y, maskf, 0.0, maxit,
                                             tol, mstep)
            if not ok:
                return r
            r.niter += it0
            pv = _binom_score_test(Xnull, b0, Ym, y, maskf)
            r.pval = pv
            if not lrt_stage or pv < 0 or pv >= params.multiphen_thr:
                return r
        # LRT stage (+Firth)
        r.used_firth = fm > 0
        if not lrt_cov:
            Xn = ones
        if use_off:
            # offset approximation (Ordinal.cpp:726-771): covariate
            # effects frozen at the null fit; phenotypes weighted-
            # residualized against covariates; only P betas refit
            b_n, ll0, it1, ok0 = _fit_logistic(Xn, y, maskf, 0.0, maxit,
                                               tol, mstep)
            if not ok0:
                return r
            eta0 = np.clip(Xn @ b_n, -30, 30)
            pi0 = 1 / (1 + np.exp(-eta0))
            w0 = pi0 * (1 - pi0) * maskf
            A = Xn.T @ (Xn * w0[:, None])
            try:
                Yres0 = Ym - Xn @ np.linalg.solve(A, Xn.T @ (Ym * w0[:, None]))
            except np.linalg.LinAlgError:
                return r
            b_f, ll1, it2, ok1 = _fit_logistic(Yres0, y, maskf, fm, maxit,
                                               tol, mstep, offset=eta0)
            r.niter += it1 + it2
            if not ok1:
                return r
            if fm > 0:
                # Firth det term of the null on the residualized design
                # (Ordinal.cpp:747-751)
                _s, ld = np.linalg.slogdet(Yres0.T @ (Yres0 * w0[:, None]))
                ll0 = ll0 + 0.5 * fm * ld
            stat = 2 * (ll1 - ll0)
            r.pval = 1.0 if stat < 0 else float(chi2.sf(stat, Ym.shape[1]))
            return r
        Xf = np.concatenate([Xn, Ym], axis=1)
        # null penalized by the full-design information (inc_phen_null,
        # Ordinal.cpp:263) so the Firth det terms cancel in the LRT
        b_n, ll0, it1, ok0 = _fit_logistic(Xn, y, maskf, fm, maxit, tol,
                                           mstep, X_pen=Xf)
        b_f, ll1, it2, ok1 = _fit_logistic(Xf, y, maskf, fm, maxit, tol, mstep)
        r.niter += it1 + it2
        if not (ok0 and ok1):
            return r
        stat = 2 * (ll1 - ll0)
        r.pval = 1.0 if stat < 0 else float(chi2.sf(stat, Ym.shape[1]))
        return r

    # K == 3: proportional-odds model. The POM's cut-points span the
    # intercept, so constant covariate columns are dropped to keep the
    # fits identified (the reference fits "covariates X without
    # Intercept", Ordinal.cpp:535)
    Yoh = np.zeros((len(gi), K))
    Yoh[np.arange(len(gi)), code] = 1.0
    Yoh *= maskf[:, None]
    empty = np.zeros((len(gi), 0))
    mu = (Xcov * maskf[:, None]).sum(axis=0) / maskf.sum()
    sd = np.sqrt((((Xcov - mu) * maskf[:, None]) ** 2).sum(axis=0) / maskf.sum())
    Xn = (Xcov - mu)[:, sd > 1e-12] * maskf[:, None]
    par0, _f, it0, ok = _fit_pom(
        Xn if mode == "cov_score" else empty, Yoh, maskf, K,
        maxit=maxit, tol=tol, max_step=mstep)
    if not ok:
        return r
    r.niter += it0
    if score_stage:
        pv = _pom_score_test(par0, Xn if mode == "cov_score" else empty,
                             Ym, Yoh, maskf, K)
        r.pval = pv
        if not lrt_stage or pv < 0 or pv >= params.multiphen_thr:
            return r
    if not lrt_cov:
        Xn = empty
    p_n, f0, it1, ok0 = _fit_pom(Xn, Yoh, maskf, K, theta0=par0[: K - 1],
                                 maxit=maxit, tol=tol, max_step=mstep)
    if use_off:
        # offset approximation (multinomial path, Ordinal.cpp:773-812):
        # intercepts + covariate predictor frozen at the null fit
        if not ok0:
            return r
        theta = p_n[: K - 1]
        off = Xn @ p_n[K - 1 :]
        _b, f1, it2, ok1 = _fit_pom_offset(Ym, theta, off, Yoh, maskf, K,
                                           maxit=maxit, tol=tol,
                                           max_step=mstep)
        r.niter += it1 + it2
        if not ok1:
            return r
        stat = 2 * (f0 - f1)  # negll difference; nested, so >= 0
        r.pval = 1.0 if stat < 0 else float(chi2.sf(stat, Ym.shape[1]))
        return r
    Xf = np.concatenate([Xn, Ym], axis=1)
    p_f, f1, it2, ok1 = _fit_pom(Xf, Yoh, maskf, K, theta0=p_n[: K - 1],
                                 maxit=maxit, tol=tol, max_step=mstep)
    r.niter += it1 + it2
    if not (ok0 and ok1):
        return r
    stat = 2 * (f0 - f1)  # negll difference
    r.pval = 1.0 if stat < 0 else float(chi2.sf(stat, Ym.shape[1]))
    return r


def multiphen_header() -> str:
    """print_header_output_all_multiphen (Step2_Models.cpp:2319)."""
    return "CHROM GENPOS ID ALLELE0 ALLELE1 MAC A1FREQ N LOG10P MULTINOM IT UP FIRTH\n"


def multiphen_line(snp, mac1, af1, ns1, r: MPhenResult) -> str:
    """One output row (MultiPhen::print_sumstats, Ordinal.cpp)."""
    from ..prep import fmt

    parts = [str(snp.chrom), str(snp.physpos), snp.ID, snp.allele1, snp.allele2,
             fmt(mac1), fmt(af1), str(int(ns1))]
    if r.pval < 0:
        parts.append("NA")
    else:
        parts.append(fmt(-np.log10(max(r.pval, 5e-324))))
    parts.append("1" if r.is_multinom else "0")
    parts += [str(r.niter), str(r.n_updates), "1" if r.used_firth else "0"]
    return " ".join(parts) + "\n"
