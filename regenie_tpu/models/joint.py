"""Joint tests over burden masks of a set: MINP / ACAT / F-test / GATES
(+ SBAT/NNLS and GENE_P in a later pass).

Reference: Joint_Tests.cpp apply_joint_test (:131), compute_minp (:246),
compute_acat (:257), compute_qr_G (:398), compute_ftest (:448),
compute_gates (:580), get_me (:668).
"""

from __future__ import annotations

from typing import Dict, List

import numpy as np
from scipy.stats import beta as beta_dist
from scipy.stats import f as f_dist

from ..config import QT, Params
from ..io.bed import SnpInfo
from ..io.output import sumstat_line_single
from ..prep import fmt
from .skat import get_acat
from ..utils.stats import neglog10_to_chisq

TEST_NAMES = {"minp": "MINP", "ftest": "F", "gates": "GATES", "acat": "ACAT"}
ACAT_A1, ACAT_A2 = 1.0, 25.0


def run_joint_tests(params: Params, eng, vset, built, writers, log):
    """Run requested joint tests for one set and write per-pheno rows."""
    from .masks import BuiltMask

    pd = eng.pd
    P = params.n_pheno
    r = getattr(eng, "_last_mask_result", None)
    if r is None or not built:
        return
    B = len(built)

    # mask genotype matrix, residualized+scaled for QT (compute_qr_G input;
    # the engine stashes the residualized block after testing)
    G = eng.last_G_res.T  # [N, B]
    qr_tests = [t for t in params.joint_tests if t in ("ftest", "gates", "sbat")]

    for ph in range(P):
        if not pd.pheno_pass[ph]:
            continue
        good = (~r.ignored) & (~r.ignored_trait[:, ph]) & (~r.test_fail[:, ph])
        logpv = np.where(good, r.logp[:, ph], 0.0)
        nvars = int(good.sum())
        if nvars == 0:
            continue
        yres = eng.res[:, ph]
        mask = pd.masked_indivs[:, ph]
        rows = []

        if "minp" in params.joint_tests:
            lp = logpv[good].max()
            # Sidak-style: p = min pv (reference get_pv on min)
            pv_min = 10.0 ** (-lp)
            rows.append(("MINP", -np.log10(max(pv_min, 5e-324)), nvars))

        if "acat" in params.joint_tests:
            wts = np.zeros(B)
            for b in range(B):
                if not good[b]:
                    continue
                if params.mask_rule == "max":
                    maf = min(built[b].af_t[ph], 1 - built[b].af_t[ph])
                    w = beta_dist.pdf(maf, ACAT_A1, ACAT_A2)
                    wts[b] = maf * (1 - maf) * w * w
                else:
                    wts[b] = 1.0
            lp = get_acat(logpv, wts)
            if lp >= 0:
                rows.append(("ACAT", lp, nvars))

        if qr_tests:
            # keep linearly independent mask columns (compute_qr_G)
            Gm = G[:, good] * mask[:, None]
            keep_idx = np.flatnonzero(good)
            q, rr, piv = _qr_colperm(Gm, params.qr_tol)
            df_test = len(piv)
            Gt = Gm[:, piv]
            kept_logpv = logpv[keep_idx[piv]]

            if "ftest" in params.joint_tests and params.trait_mode == QT and df_test > 0:
                ns = int(mask.sum()) - params.ncov_analyzed
                df_ur = ns - df_test
                if df_ur > 0:
                    y_t = yres * mask
                    GtG = Gt.T @ Gt
                    try:
                        bhat = np.linalg.solve(GtG, Gt.T @ y_t)
                        yhat = Gt @ bhat
                        ss_m = (yhat**2).sum()
                        ss_r = ns - ss_m
                        zval = (ss_m / df_test) / (ss_r / df_ur)
                        if zval >= 0:
                            pv = f_dist.sf(zval, df_test, df_ur)
                            rows.append(
                                ("F", -np.log10(max(pv, 5e-324)), df_test, zval)
                            )
                    except np.linalg.LinAlgError:
                        pass

            if "gates" in params.joint_tests and df_test > 0:
                lp = _gates(Gt, kept_logpv, float(params.n_analyzed - params.ncov_analyzed))
                if lp >= 0:
                    rows.append(("GATES", lp, df_test))

            if "sbat" in params.joint_tests and params.trait_mode == QT and df_test > 0:
                ns = int(mask.sum()) - params.ncov_analyzed
                df_ur = ns - df_test
                if df_ur > 0:
                    out = _sbat(Gt, yres * mask, df_ur, rng_seed=params.seed)
                    if out is not None:
                        lp_pos, lp_neg = out
                        lp = get_acat(np.array([lp_pos, lp_neg]))
                        if lp >= 0:
                            rows.append(("SBAT", lp, df_test))

        for row in rows:
            name, lp, df = row[0], row[1], row[2]
            zval = row[3] if len(row) > 3 else float(neglog10_to_chisq(np.array([lp]))[0])
            writers[ph].write(
                _joint_line(params, vset, name, lp, zval, df, int(pd.Neff[ph]))
            )


def _qr_colperm(G, tol):
    """Column-pivoted QR rank selection (ColPivHouseholderQR semantics)."""
    from scipy.linalg import qr as scipy_qr

    if G.shape[1] == 0:
        return None, None, []
    Q, R, piv = scipy_qr(G, mode="economic", pivoting=True)
    diag = np.abs(np.diag(R))
    if diag[0] == 0:
        return Q, R, []
    rank = int((diag > diag[0] * tol).sum())
    return Q, R, list(piv[:rank])


def _gates(Gt, logpv, scale_denum):
    """GATES extended Simes (compute_gates, Joint_Tests.cpp:580)."""
    df = Gt.shape[1]
    if df == 0:
        return -1.0
    if df == 1:
        return float(logpv[0])
    pvals = 10.0 ** (-logpv)
    order = np.argsort(pvals, kind="stable")
    sorted_pv = pvals[order]
    tmpG = Gt[:, order]
    GtG = tmpG.T @ tmpG / scale_denum
    corP = (
        0.7723 * GtG**6 - 1.5659 * GtG**5 + 1.201 * GtG**4
        - 0.2355 * GtG**3 + 0.2184 * GtG**2 + 0.6086 * GtG
    )
    m_e = _me(corP)
    p_gates = 1.0
    for i in range(df):
        m_ei = _me(corP[: i + 1, : i + 1])
        p_i = m_e * sorted_pv[i] / m_ei
        p_gates = min(p_gates, p_i)
    if p_gates < 0:
        return -1.0
    return float(-np.log10(max(p_gates, 5e-324)))


def _me(ldmat):
    """Effective number of tests (get_me, Joint_Tests.cpp:668)."""
    n = ldmat.shape[1]
    if n == 1:
        return 1.0
    D = np.linalg.eigvalsh(ldmat)
    return n - np.where(D > 1, D - 1, 0).sum()


def _joint_line(params, vset, tname, logp, zval, df, n):
    """One joint-test row (print_sum_stats, Joint_Tests.cpp:880)."""
    parts = [str(vset.chrom), str(vset.physpos), vset.ID, "NA", "NA", "NA"]
    if params.dosage_mode:
        parts.append("NA")
    parts.append(str(n))
    test_pfx = "ADD-" if params.skip_blups else "ADD-"
    parts.append(f"ADD-BURDEN-{tname}")
    parts += ["NA", "NA"]
    parts.append(fmt(zval) if zval >= 0 else "NA")
    parts.append(fmt(logp) if logp >= 0 else "NA")
    parts.append(f"DF={df}")
    return " ".join(parts) + "\n"



def _nnls_kkt(XtX, Xty, tol=1e-10, maxit=1000):
    """Active-set NNLS on normal equations; returns bhat >= 0."""
    from scipy.optimize import nnls as scipy_nnls

    # use a Cholesky square root so scipy.nnls works on the summary form
    L = np.linalg.cholesky(XtX + 1e-12 * np.eye(XtX.shape[0]))
    # solve min ||L^T b - z||^2 with z = L^-1 Xty
    z = np.linalg.solve(L, Xty)
    b, _ = scipy_nnls(L.T, z)
    return b


def _chibar_weights_mc(V, n_sims=5000, seed=1):
    """Chi-bar-square weights by Monte Carlo: simulate z ~ N(0, V), count
    positive components of the NNLS projection (the MC analog of
    jburden_wts_adapt, NNLS.cpp:864)."""
    p = V.shape[0]
    rng = np.random.default_rng(seed)
    Vinv = np.linalg.pinv(V)
    L = np.linalg.cholesky(V + 1e-12 * np.eye(p))
    counts = np.zeros(p + 1)
    Z = rng.standard_normal((n_sims, p)) @ L.T
    for z in Z:
        b = _nnls_kkt(Vinv, Vinv @ z)
        counts[(b > 1e-12).sum()] += 1
    return counts / n_sims


def _sbat(Gt, y, df_ur, rng_seed=1):
    """SBAT / NNLS joint burden test (compute_nnls, Joint_Tests.cpp:495;
    NNLS.cpp fit_nnls_sign + jburden_pchisq_bar).

    Returns (-log10 p_pos, -log10 p_neg) or None on failure."""
    from scipy.stats import chi2 as _chi2

    n, p = Gt.shape
    XtX = Gt.T @ Gt
    Xty = Gt.T @ y
    try:
        bhat_ols = np.linalg.solve(XtX, Xty)
    except np.linalg.LinAlgError:
        return None
    rss = ((y - Gt @ bhat_ols) ** 2).sum()
    sigma2 = rss / df_ur
    V = sigma2 * np.linalg.pinv(XtX)

    wts = _chibar_weights_mc(V, seed=rng_seed)

    def one_sided(sign):
        b = _nnls_kkt(XtX, sign * Xty)
        stat = b @ (XtX @ b) / sigma2
        # P(chibar > stat) = sum_k w_k P(chi2_k > stat), chi2_0 has mass at 0
        pv = sum(
            wts[k] * _chi2.sf(stat, k) for k in range(1, p + 1) if wts[k] > 0
        )
        return max(pv, 5e-324)

    p_pos = one_sided(+1)
    p_neg = one_sided(-1)
    return -np.log10(p_pos), -np.log10(p_neg)
