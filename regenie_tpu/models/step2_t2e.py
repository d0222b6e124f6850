"""Step 2 time-to-event (Cox) path.

Reference: compute_res_cox (Data.cpp:2471), fit_null_cox
(Step1_Models.cpp:353), compute_score_cox (Step2_Models.cpp:632),
fit_null_firth_cox (:702), fit_firth_cox_snp_fast (:850).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, List, Optional

import numpy as np

from ..config import Params
from ..io.pheno import PhenoData
from ..utils.stats import chisq_neglog10
from .survival import CoxFirth, CoxMLE, CoxRidge, SurvivalData


@dataclass
class T2EChromState:
    res: np.ndarray = None  # [N, P] martingale-ish residuals (cox_mle.residual)
    surv: Dict[int, SurvivalData] = field(default_factory=dict)
    mle: Dict[int, CoxMLE] = field(default_factory=dict)
    firth_offset: np.ndarray = None  # [N, P] cov+loco eta from null firth cox
    blups: np.ndarray = None
    allow_correction: bool = True
    time_cols: List[int] = field(default_factory=list)


def prep_chromosome(params: Params, pd: PhenoData, blups: np.ndarray, log) -> T2EChromState:
    N, P = pd.phenotypes_raw.shape
    st = T2EChromState()
    st.blups = blups
    st.res = np.zeros((N, P))
    st.firth_offset = np.zeros((N, P))

    t2e_map = params.t2e_map  # time_name -> event_name
    name_to_idx = {nm: i for i, nm in enumerate(pd.pheno_names)}
    for time_name, event_name in t2e_map.items():
        ti = name_to_idx[time_name]
        ei = name_to_idx[event_name]
        st.time_cols.append(ti)
        if not pd.pheno_pass[ti]:
            continue
        time = pd.phenotypes_raw[:, ti]
        status = pd.phenotypes_raw[:, ei]
        mask = pd.masked_indivs[:, ti]
        offset = blups[:, ti] * mask

        sd = SurvivalData()
        sd.setup(time, status, mask, norm_weights=False)

        ridge0 = CoxRidge(sd, pd.new_cov, offset, mask, 0.0, params.niter_max,
                          params.niter_max_line_search, 2.5e-4)
        ridge0.fit()

        mle = CoxMLE(params.niter_max, params.niter_max_line_search, 2.5e-4)
        mle.fit(sd, pd.new_cov, offset, mask, ridge0.beta, ridge0.eta)
        if not mle.converge:
            fx = CoxFirth(sd, pd.new_cov, offset, pd.new_cov.shape[1],
                          params.niter_max, params.niter_max_line_search,
                          2.5e-4, 2.5e-4, 1e-8, params.maxstep_null, False)
            fx.fit()
            mle.fit(sd, pd.new_cov, offset, mask, fx.beta, fx.eta)
        if not mle.converge:
            log(f"WARNING: cox null regression did not converge for '{time_name}'")
            pd.pheno_pass[ti] = False
            continue
        mle.test_prep(sd, pd.new_cov, offset, mask)
        st.surv[ti] = sd
        st.mle[ti] = mle
        st.res[:, ti] = mle.residual

        if params.firth and params.firth_approx:
            fnull = CoxFirth(sd, pd.new_cov, offset, pd.new_cov.shape[1],
                             params.niter_max_firth_null, params.niter_max_line_search,
                             2.5e-4, 2.5e-4, 1e-8, params.maxstep_null,
                             not params.cox_nofirth, beta_init=mle.beta)
            fnull.fit()
            if not fnull.converge:
                log(f"WARNING: null Firth cox failed for '{time_name}'")
                pd.pheno_pass[ti] = False
                continue
            st.firth_offset[:, ti] = fnull.eta
    return st


def score_block(params: Params, pd: PhenoData, st: T2EChromState, G, flipped,
                ignored, ignored_trait, log, mesh=None):
    """Batched Cox score test + Firth correction (compute_score_cox).

    With a device mesh, the three score matmuls run variant-sharded
    (parallel.mesh.sharded_score_t2e); Gres rows for the Firth subset
    rebuild on host. --coxscore-exact keeps the single-device path
    (per-SNP risk-set variance needs the full Gres block)."""
    G = np.asarray(G)
    B, N = G.shape
    if params.coxscore_exact:
        mesh = None
    G_mesh = None
    if mesh is not None:
        import jax.numpy as _jnp

        from ..parallel import mesh as pm

        ndev = len(mesh.devices.flat)
        pad = (-B) % ndev
        Gp = np.concatenate([G, np.zeros((pad, N), G.dtype)]) if pad else G
        G_mesh = pm.shard_array(mesh, _jnp.asarray(Gp), 0)
    P = params.n_pheno
    bhat = np.zeros((B, P))
    se = np.zeros((B, P))
    chisq = np.full((B, P), -1.0)
    logp = np.full((B, P), np.nan)
    test_fail = np.zeros((B, P), dtype=bool)
    n_corrected = 0
    n_failed = 0
    from scipy.stats import chi2 as _chi2

    z_thr = np.sqrt(_chi2.isf(params.alpha_pvalue, df=1))

    for ph in st.time_cols:
        if not pd.pheno_pass[ph]:
            continue
        mle = st.mle[ph]
        sd = st.surv[ph]
        mask = pd.masked_indivs[:, ph].astype(np.float64)
        # Gres = G - X1_X1WX1inv (WX1' g)  batched on device (MXU)
        import jax.numpy as jnp

        from .step2 import mm as _mm

        Gres_d = None
        if G_mesh is not None:
            from ..parallel import mesh as pm

            ops = getattr(mle, "_mesh_ops", None)
            if ops is None:
                ops = mle._mesh_ops = (
                    pm.replicate(mesh, jnp.asarray(mle.WX1)),
                    pm.replicate(mesh, jnp.asarray(mle.X1_X1WX1inv.T)),
                    pm.replicate(
                        mesh, jnp.asarray((mle.residual * mask))[:, None]),
                )
            T_sh, d_sh = pm.sharded_score_t2e(mesh, G_mesh, *ops)
            T = pm.to_host(T_sh)[:B]
            denum = mle.res_var * pm.to_host(d_sh)[:B]
        else:
            G_j = jnp.asarray(G)
            GW = _mm(G_j, jnp.asarray(mle.WX1))  # [B, p+1]
            Gres_d = G_j - _mm(GW, jnp.asarray(mle.X1_X1WX1inv.T))  # [B, N]
            T = np.asarray(_mm(Gres_d, jnp.asarray((mle.residual * mask))[:, None]))[:, 0]
            denum = mle.res_var * np.asarray((Gres_d**2).sum(axis=1))
        Gres = None
        if params.coxscore_exact:
            Gres = np.asarray(Gres_d)  # host copy for the per-SNP variance
            for b in range(B):
                denum[b] = _exact_denum(sd, mle, Gres[b], mask)
        low = denum < params.numtol
        ignored_trait[:, ph] |= low
        with np.errstate(divide="ignore", invalid="ignore"):
            stats = T / np.sqrt(np.where(low, 1.0, denum))

        se_ph = 1.0 / np.sqrt(np.where(low, 1.0, denum))
        bhat_ph = stats * se_ph
        chisq_ph = stats**2
        logp_ph = chisq_neglog10(chisq_ph)
        fail_ph = np.zeros(B, dtype=bool)

        if params.firth:
            corr = (~ignored) & (~ignored_trait[:, ph]) & (np.abs(stats) > z_thr)
            n_corrected += int(corr.sum())
            if corr.any() and Gres is None:
                Gres = np.zeros((B, N))
                cidx = np.flatnonzero(corr)
                if Gres_d is not None:
                    Gres[cidx] = np.asarray(Gres_d[jnp.asarray(cidx)])
                else:
                    # mesh path: rebuild the correction rows on host
                    rows = G[cidx]
                    Gres[cidx] = rows - (rows @ mle.WX1) @ mle.X1_X1WX1inv.T
            for b in np.flatnonzero(corr):
                ok, beta1, se1, lrt = _firth_snp(params, st, sd, ph, Gres[b])
                if not ok:
                    fail_ph[b] = True
                    n_failed += 1
                    continue
                bhat_ph[b] = beta1
                chisq_ph[b] = lrt
                logp_ph[b] = float(chisq_neglog10(np.array([lrt]))[0])
                if params.firth_se and lrt > 0:
                    se_ph[b] = abs(beta1) / np.sqrt(lrt)
                else:
                    se_ph[b] = se1

        bhat_ph = np.where(flipped, -bhat_ph, bhat_ph)
        bhat[:, ph] = bhat_ph
        se[:, ph] = se_ph
        chisq[:, ph] = chisq_ph
        logp[:, ph] = logp_ph
        test_fail[:, ph] = fail_ph

    return bhat, se, chisq, logp, test_fail, n_corrected, n_failed


def passing_traits(pd: PhenoData, st: T2EChromState):
    """T2E traits in operand order (the fused path's trait axis)."""
    return [ph for ph in st.time_cols if pd.pheno_pass[ph] and ph in st.mle]


def score_block_fused(params: Params, pd: PhenoData, st: T2EChromState,
                      Tnum, denum, flipped, gres_rows, ignored,
                      ignored_trait, log):
    """Host tail of the fused Cox path (compute_score_cox tail,
    Step2_Models.cpp:658-700): per-trait low-variance gating, score
    stats from the device-computed T/denum, Firth corrections on
    lazily-decoded Gres rows.

    Tnum/denum: [B, Tt] in passing_traits order; flipped: [B] bool;
    gres_rows(idx) -> finalized (imputed/flipped, ind-zeroed) G rows
    [len(idx), N] on the kept sample axis."""
    B = Tnum.shape[0]
    P = params.n_pheno
    bhat = np.zeros((B, P))
    se = np.zeros((B, P))
    chisq = np.full((B, P), -1.0)
    logp = np.full((B, P), np.nan)
    test_fail = np.zeros((B, P), dtype=bool)
    n_corrected = 0
    n_failed = 0
    from scipy.stats import chi2 as _chi2

    z_thr = np.sqrt(_chi2.isf(params.alpha_pvalue, df=1))
    G_cache = {}  # decoded correction rows, shared across traits

    for ti, ph in enumerate(passing_traits(pd, st)):
        mle = st.mle[ph]
        sd = st.surv[ph]
        T = np.asarray(Tnum[:, ti], np.float64)
        dn = np.asarray(denum[:, ti], np.float64)
        low = dn < params.numtol
        ignored_trait[:, ph] |= low
        with np.errstate(divide="ignore", invalid="ignore"):
            stats = T / np.sqrt(np.where(low, 1.0, dn))
        se_ph = 1.0 / np.sqrt(np.where(low, 1.0, dn))
        bhat_ph = stats * se_ph
        chisq_ph = stats**2
        logp_ph = chisq_neglog10(chisq_ph)
        fail_ph = np.zeros(B, dtype=bool)

        if params.firth:
            corr = (~ignored) & (~ignored_trait[:, ph]) & (np.abs(stats) > z_thr)
            n_corrected += int(corr.sum())
            for b in np.flatnonzero(corr):
                if b not in G_cache:
                    # decode in one batch for all corrected rows of this
                    # trait not yet cached
                    need = [i for i in np.flatnonzero(corr) if i not in G_cache]
                    rows = gres_rows(np.asarray(need))
                    for i, r in zip(need, rows):
                        G_cache[i] = r
                g = G_cache[b]
                gres = g - (g @ mle.WX1) @ mle.X1_X1WX1inv.T
                ok, beta1, se1, lrt = _firth_snp(params, st, sd, ph, gres)
                if not ok:
                    fail_ph[b] = True
                    n_failed += 1
                    continue
                bhat_ph[b] = beta1
                chisq_ph[b] = lrt
                logp_ph[b] = float(chisq_neglog10(np.array([lrt]))[0])
                if params.firth_se and lrt > 0:
                    se_ph[b] = abs(beta1) / np.sqrt(lrt)
                else:
                    se_ph[b] = se1

        bhat_ph = np.where(flipped, -bhat_ph, bhat_ph)
        bhat[:, ph] = bhat_ph
        se[:, ph] = se_ph
        chisq[:, ph] = chisq_ph
        logp[:, ph] = logp_ph
        test_fail[:, ph] = fail_ph

    return bhat, se, chisq, logp, test_fail, n_corrected, n_failed


def _firth_snp(params, st, sd, ph, gres):
    """Approx-Firth Cox single-SNP LRT (fit_firth_cox_snp_fast)."""
    offset = st.firth_offset[:, ph]
    cf = CoxFirth(sd, gres[:, None], offset, 1, params.niter_max_firth,
                  params.niter_max_line_search, 2.5e-4, 2.5e-4, 1e-8,
                  params.maxstep, not params.cox_nofirth)
    cf.fit_1(gres)
    if not cf.converge:
        cf = CoxFirth(sd, gres[:, None], offset, 1, params.niter_max_firth * 5,
                      params.niter_max_line_search, 2.5e-4, 0.0, 1e-8,
                      params.maxstep / 5, not params.cox_nofirth)
        cf.fit_1(gres)
    if not cf.converge:
        return False, 0.0, 0.0, 0.0
    lrt = 2 * (cf.loglike[-1] - cf.loglike[0])
    if lrt < 0:
        return False, 0.0, 0.0, 0.0
    se1 = np.sqrt(1.0 / cf.second_der_1) if cf.second_der_1 > 0 else 0.0
    return True, cf.beta1, se1, lrt


def _exact_denum(sd, mle, gres, mask):
    """Exact score variance (--coxscore-exact, Step2_Models.cpp:672)."""
    sqrtWG = gres * np.sqrt(np.maximum(mle.mu, 0)) * mask
    g_ord = sd.to_order(gres)
    from .survival import _cumsum_rev

    RGammaG = _cumsum_rev(sd.seg_sum(mle.w_exp_eta * g_ord))
    UhalfG = mle.Dhalf * RGammaG
    XtWG = mle.sqrtWX.T @ sqrtWG
    XtUG = mle.UhalfX.T @ UhalfG
    XtVG = XtWG - XtUG
    return (sqrtWG**2).sum() - (UhalfG**2).sum() - XtVG @ (mle.cov_inv @ XtVG)
