"""Step 2 binary-trait path: null refits per chromosome, batched score
tests, approximate/exact Firth and SPA corrections.

Reference: compute_res_bin (Data.cpp:2440), fit_null_logistic
(Step1_Models.cpp:54), fit_null_firth (Step2_Models.cpp:985),
compute_score_bt (Step2_Models.cpp:470), check_pval_snp (:1988).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import List, Optional

import numpy as np

from ..config import Params
from ..io.pheno import PhenoData, get_basis
from ..utils.stats import chisq_neglog10
from . import firth as firth_mod
from . import spa as spa_mod
from .glm import fit_logistic_irls, get_pvec


def _score_bt_kernel_factory():
    """Device (MXU) BT score kernels, ALL traits in one matmul set
    (compute_score_bt, Step2_Models.cpp:470-520; the trait-vectorized
    form of the reference's v2.2 BT rework, docs/performance.md:94-97).
    With A_p = GW_p XW_p and orthonormal XW_p, per trait p:
      num_p   = GW_p res_p - A_p (XW_p' res_p)
      denum_p = ||GW_p||^2 - ||A_p||^2 = G^2 gsm_p^2 - ||A_p||^2
    Concatenating W_p = [gsm_p*XW_p | gsm_p*res_p] over traits, G is
    consumed by exactly TWO matmuls per block (G Wcat and G^2 gsm^2) —
    instead of one set per trait — and G_res is only rebuilt for the
    Firth/SPA correction subset. Lazy so module import stays jax-free."""
    import jax
    import jax.numpy as jnp

    from functools import partial

    from ..utils.dtypes import MATMUL_PRECISION as _PREC
    from .step2 import mm

    @partial(jax.jit, static_argnames=("Pn", "Kp1"))
    def _allpass(G, Wcat, xwt, gsm2, Pn, Kp1):
        S1 = mm(G, Wcat).reshape(G.shape[0], Pn, Kp1)
        A = S1[..., :-1]  # [B, Pn, Kmax]
        q = S1[..., -1]  # [B, Pn]
        num = q - jnp.einsum("bpk,pk->bp", A, xwt, precision=_PREC)
        g2w = mm(G**2, gsm2)  # [B, Pn]
        denum = g2w - (A**2).sum(-1)
        return num, denum, S1

    @jax.jit
    def _gres_rows(G_rows, gsm, XW, A_rows):
        # G_res for the correction subset only
        return G_rows * gsm[None, :] - mm(A_rows, XW.T)

    return _allpass, _gres_rows


_SCORE_BT_KERNEL = None


def _get_bt_kernels():
    global _SCORE_BT_KERNEL
    if _SCORE_BT_KERNEL is None:
        _SCORE_BT_KERNEL = _score_bt_kernel_factory()
    return _SCORE_BT_KERNEL


class _FusedConsts:
    """Per-chromosome device constants for the all-trait BT scorer."""

    def __init__(self, pd, st):
        import jax.numpy as jnp

        P = st.res.shape[1]
        self.cols = [ph for ph in range(P) if pd.pheno_pass[ph] and st.X_gamma[ph] is not None]
        self.j_of = {ph: j for j, ph in enumerate(self.cols)}
        if not self.cols:
            return
        N = st.res.shape[0]
        Kmax = max(st.X_gamma[ph].shape[1] for ph in self.cols)
        self.Kmax = Kmax
        Wcat = np.zeros((N, len(self.cols) * (Kmax + 1)))
        xwt = np.zeros((len(self.cols), Kmax))
        for j, ph in enumerate(self.cols):
            gsm = st.gamma_sqrt_mask[:, ph]
            XW = st.X_gamma[ph]
            K = XW.shape[1]
            c0 = j * (Kmax + 1)
            Wcat[:, c0 : c0 + K] = gsm[:, None] * XW
            Wcat[:, c0 + Kmax] = gsm * st.res[:, ph]
            xwt[j, :K] = XW.T @ st.res[:, ph]
        self.Wcat_j = jnp.asarray(Wcat)
        self.xwt_j = jnp.asarray(xwt)
        self.gsm2_j = jnp.asarray(st.gamma_sqrt_mask[:, self.cols] ** 2)


def _score_bt_all_device(G_j, fc: "_FusedConsts"):
    """num/denum for all passing traits: [B, Pn], [B, Pn], S1 [B,Pn,Kmax+1]."""
    return _get_bt_kernels()[0](
        G_j, fc.Wcat_j, fc.xwt_j, fc.gsm2_j, len(fc.cols), fc.Kmax + 1
    )


def _gres_rows_device(G_rows, gsm, XW, A_rows):
    import jax.numpy as jnp

    return _get_bt_kernels()[1](
        G_rows, jnp.asarray(gsm), jnp.asarray(XW), A_rows
    )


@dataclass
class BTChromState:
    """Per-chromosome null-model state (reference `ests` + `f_ests`)."""

    res: np.ndarray = None  # [N, P] (Y - pi)/sqrt(w) masked
    Y_hat: np.ndarray = None  # [N, P]
    gamma_sqrt: np.ndarray = None  # [N, P]
    gamma_sqrt_mask: np.ndarray = None  # [N, P]
    X_gamma: List[np.ndarray] = field(default_factory=list)  # per-pheno [N, K] orthonormal
    firth_offset: np.ndarray = None  # [N, P] cov effects + LOCO (approx firth)
    blups: np.ndarray = None  # [N, P]
    bhat_start: np.ndarray = None  # [K, P] null logistic betas
    eta_null: np.ndarray = None  # [N, P] null eta (offset_nullreg)
    allow_correction: bool = True  # Firth/SPA only for BT


def _load_null_firth_start(files_map, pheno_name, chrom, K):
    """Starting values from a _firth.list checkpoint (get_beta_start_firth,
    Step2_Models.cpp:1893)."""
    import numpy as _np

    path = files_map.get(pheno_name)
    if path is None:
        return None
    from ..io.files import iter_lines

    for toks in iter_lines(path):
        if int(toks[0]) == chrom:
            vals = _np.array([float(x) for x in toks[1:]])
            if len(vals) >= K:
                return vals[:K]
    return None


def prep_chromosome(params: Params, pd: PhenoData, blups: np.ndarray, log,
                    null_firth_files=None, chrom=None) -> BTChromState:
    """Refit null logistic with LOCO offset per trait + null Firth
    (compute_res_bin, Data.cpp:2440-2460)."""
    N, P = pd.phenotypes_raw.shape
    st = BTChromState()
    st.blups = blups
    st.res = np.zeros((N, P))
    st.Y_hat = np.zeros((N, P))
    st.gamma_sqrt = np.ones((N, P))
    st.gamma_sqrt_mask = np.zeros((N, P))
    st.X_gamma = [None] * P
    st.firth_offset = np.zeros((N, P))
    st.eta_null = np.zeros((N, P))
    K = pd.new_cov.shape[1]
    st.bhat_start = np.zeros((K, P))
    l1_ridge_eps = 1e-5

    for ph in range(P):
        if not pd.pheno_pass[ph]:
            continue
        y = pd.phenotypes_raw[:, ph]
        mask = pd.masked_indivs[:, ph]
        if params.blup_cov:
            # --prs-cov: the LOCO PRS fills the reserved covariate column
            # and the offset is dropped (fit_null_logistic,
            # Step1_Models.cpp:73-76)
            pd.new_cov[:, -1] = blups[:, ph] * mask
            offset = np.zeros(N)
        else:
            offset = blups[:, ph] * mask

        beta, ok = fit_logistic_irls(
            y, pd.new_cov, offset, mask, params.niter_max, params.numtol, True
        )
        if not ok:
            beta, ok = fit_logistic_irls(
                y, pd.new_cov, offset, mask, params.niter_max, params.numtol, False
            )
        if not ok:
            # retry with starting values from model without LOCO offset
            # (fit_null_logistic, Step1_Models.cpp:88-105)
            zero = np.zeros(N)
            b0, ok0 = fit_logistic_irls(
                y, pd.new_cov, zero, mask, params.niter_max, params.numtol, True
            )
            if ok0:
                beta, ok = fit_logistic_irls(
                    y, pd.new_cov, offset, mask, params.niter_max, params.numtol, True,
                    beta0=b0,
                )
        if not ok:
            log(f"WARNING: logistic regression did not converge for '{pd.pheno_names[ph]}'")
            pd.pheno_pass[ph] = False
            continue

        st.bhat_start[:, ph] = beta
        eta = offset + pd.new_cov @ beta
        st.eta_null[:, ph] = eta
        pi = get_pvec(eta)
        w = np.where(mask, pi * (1 - pi), 1.0)
        gs = np.sqrt(w)
        st.Y_hat[:, ph] = pi
        st.gamma_sqrt[:, ph] = gs
        st.gamma_sqrt_mask[:, ph] = gs * mask
        XW = pd.new_cov * st.gamma_sqrt_mask[:, ph][:, None]
        XW, _ = get_basis(XW, params)
        st.X_gamma[ph] = XW
        st.res[:, ph] = np.where(mask, (y - pi) / gs, 0.0)

        if params.firth_approx:
            bvec = beta.copy()
            if null_firth_files is not None and chrom is not None:
                saved = _load_null_firth_start(null_firth_files, pd.pheno_names[ph], chrom, K)
                if saved is not None:
                    bvec = saved
            bnull, okf = firth_mod.fit_firth_null(
                y, pd.new_cov, offset, mask, bvec,
                maxstep=params.maxstep_null, niter=params.niter_max_firth_null,
                tol=50 * params.numtol,
            )
            if not okf:
                # reference retries from 0 with smaller steps (fit_approx_firth_null)
                b2 = np.zeros(K)
                b2[0] = -offset[mask].mean()
                bnull, okf = firth_mod.fit_firth_null(
                    y, pd.new_cov, offset, mask, b2,
                    maxstep=params.maxstep_null // 5,
                    niter=params.niter_max_firth_null * 5,
                    tol=50 * params.numtol,
                )
            if not okf:
                log(f"WARNING: null Firth failed for '{pd.pheno_names[ph]}'")
                pd.pheno_pass[ph] = False
                continue
            st.firth_offset[:, ph] = pd.new_cov @ bnull
            if not params.blup_cov:  # PRS already inside new_cov otherwise
                st.firth_offset[:, ph] += blups[:, ph]

            # --write-null-firth in step 2: persist the per-chromosome
            # null coefficients (Data.cpp:2200-2215)
            fh_map = getattr(params, "_null_firth_out", None)
            if fh_map is not None and chrom is not None and ph in fh_map:
                from ..prep import fmt as _fmt

                seen = getattr(params, "_null_firth_written", None)
                if seen is None:
                    seen = params._null_firth_written = set()
                if (ph, chrom) not in seen:
                    seen.add((ph, chrom))
                    fh_map[ph].write(
                        f"{chrom} " + " ".join(_fmt(b) for b in bnull) + "\n"
                    )
                    fh_map[ph].flush()

    return st


class DenseGSource:
    """Score-block genotype access backed by a materialized [B, N] G
    (the standard decode->finalize path)."""

    def __init__(self, G):
        import jax.numpy as jnp

        self.G_j = jnp.asarray(G)
        self._G = None

    @property
    def n_snps(self):
        return self.G_j.shape[0]

    def allpass(self, fc):
        return _score_bt_all_device(self.G_j, fc)

    def rows_device(self, idx_j):
        return self.G_j[idx_j]

    def rows_host(self, idx):
        if self._G is None:
            self._G = np.asarray(self.G_j)
        return self._G[idx]


class MeshGSource(DenseGSource):
    """DenseGSource whose all-trait score products run variant-sharded
    over a device mesh (parallel.mesh.sharded_score_bt; operands
    replicated once per chromosome, no collectives — the TPU analog of
    the reference's per-machine chromosome jobs)."""

    def __init__(self, G, mesh):
        import jax.numpy as jnp

        from ..parallel import mesh as pm

        self.mesh = mesh
        ndev = len(mesh.devices.flat)
        Gj = jnp.asarray(G)
        self._B = int(Gj.shape[0])
        pad = (-self._B) % ndev
        if pad:
            Gj = jnp.concatenate(
                [Gj, jnp.zeros((pad, Gj.shape[1]), Gj.dtype)])
        self.G_j = pm.shard_array(mesh, Gj, 0)
        self._G = None

    @property
    def n_snps(self):
        return self._B

    def allpass(self, fc):
        from ..parallel import mesh as pm

        if getattr(fc, "_mesh_ops", None) is None:
            fc._mesh_ops = (
                pm.replicate(self.mesh, fc.Wcat_j),
                pm.replicate(self.mesh, fc.xwt_j),
                pm.replicate(self.mesh, fc.gsm2_j),
            )
        W, x, g2 = fc._mesh_ops
        num, denum, S1 = pm.sharded_score_bt(
            self.mesh, self.G_j, W, x, g2, len(fc.cols), fc.Kmax + 1)
        if not self.G_j.is_fully_addressable:  # multi-host: gather once
            return (pm.to_host(num)[: self._B], pm.to_host(denum)[: self._B],
                    pm.to_host(S1)[: self._B])
        return num[: self._B], denum[: self._B], S1[: self._B]

    def rows_host(self, idx):
        if self._G is None:
            from ..parallel import mesh as pm

            self._G = pm.to_host(self.G_j)[: self._B]
        return self._G[idx]


def score_block(
    params: Params,
    pd: PhenoData,
    st: BTChromState,
    G,
    flipped: np.ndarray,
    ignored: np.ndarray,
    ignored_trait: np.ndarray,
    log,
):
    """Batched BT score test + Firth/SPA corrections for one [B, N] block.

    Follows compute_score_bt (Step2_Models.cpp:470) per trait, batched
    over SNPs. G may be a [B, N] array or a GSource-like object (e.g.
    the fused packed-bytes source in run_step2) exposing
    allpass/rows_device/rows_host. Returns (bhat, se, chisq, logp,
    test_fail, n_corrected, n_failed)."""
    import jax.numpy as jnp

    src = G if hasattr(G, "allpass") else DenseGSource(G)
    B = src.n_snps
    P = params.n_pheno
    bhat = np.zeros((B, P))
    se = np.zeros((B, P))
    chisq = np.full((B, P), -1.0)
    logp = np.full((B, P), np.nan)
    test_fail = np.zeros((B, P), dtype=bool)
    n_corrected = 0
    n_failed = 0
    z_thr = np.sqrt(_chisq_thr(params.alpha_pvalue))
    fc = getattr(st, "_fused", None)
    if fc is None or [ph for ph in range(P) if pd.pheno_pass[ph] and st.X_gamma[ph] is not None] != fc.cols:
        fc = st._fused = _FusedConsts(pd, st)
    if not fc.cols:
        return bhat, se, chisq, logp, test_fail, n_corrected, n_failed
    num_all, denum_all, S1_all = src.allpass(fc)
    num_all = np.asarray(num_all)
    denum_all = np.asarray(denum_all)

    for ph in fc.cols:
        j = fc.j_of[ph]
        mask = pd.masked_indivs[:, ph]
        gsm = st.gamma_sqrt_mask[:, ph]
        XW = st.X_gamma[ph]
        num = num_all[:, j]
        denum = denum_all[:, j]
        sqrt_denum = np.sqrt(np.maximum(denum, 0))
        low = sqrt_denum < params.numtol
        ignored_trait[:, ph] |= low
        with np.errstate(divide="ignore", invalid="ignore"):
            stats = num / np.where(low, 1.0, sqrt_denum)

        # default (uncorrected) sum stats
        se_ph = 1.0 / np.where(low, 1.0, sqrt_denum)
        bhat_ph = stats * se_ph
        chisq_ph = stats**2
        logp_ph = chisq_neglog10(chisq_ph)
        fail_ph = np.zeros(B, dtype=bool)

        # correction set: firth/spa enabled AND |stat| > z_thr (check_pval_snp)
        if (params.firth or params.use_spa) and st.allow_correction:
            corr = (~ignored) & (~ignored_trait[:, ph]) & (np.abs(stats) > z_thr)
            n_corrected += int(corr.sum())
            if corr.any():
                idx = np.flatnonzero(corr)
                idx_j = jnp.asarray(idx)
                use_dev = False
                if not (params.firth and not params.firth_approx):
                    from . import corrections_device as cdev

                    use_dev = cdev.enabled()
                if params.firth or params.use_spa:
                    # rebuild G_res only for the corrected rows; the
                    # device-corrections path keeps them ON DEVICE
                    A_rows = S1_all[idx_j, j, : XW.shape[1]]
                    Gres_rows_dev = _gres_rows_device(
                        src.rows_device(idx_j), gsm, XW, A_rows)
                    Gres_rows = (None if use_dev
                                 else np.asarray(Gres_rows_dev))
                if params.firth and not params.firth_approx:
                    # exact Firth: full covariate+SNP penalized fit per SNP
                    # (fit_firth_logistic_snp, Step2_Models.cpp:1062)
                    y = pd.phenotypes_raw[:, ph]
                    offset = st.blups[:, ph] * mask
                    G_host_rows = src.rows_host(idx)
                    for bi, b in enumerate(idx):
                        ok, beta1, se1, lrt = _exact_firth_snp(
                            params, pd, y, G_host_rows[bi], offset, mask, st, ph
                        )
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
                elif params.firth:
                    y = pd.phenotypes_raw[:, ph]
                    if use_dev:
                        dc = _dev_consts(st, pd, ph)
                        Gv = Gres_rows_dev / dc["gamma_sqrt"][None, :]
                        beta_f, se_f, lrt, conv = cdev.firth_snp_batch_dev(
                            dc["y"], Gv, dc["firth_offset"], dc["mask"],
                            maxstep=params.maxstep,
                            niter=params.niter_max_firth, tol=2.5e-4,
                        )
                    else:
                        Gv = Gres_rows / st.gamma_sqrt[:, ph][None, :]
                        beta_f, se_f, lrt, conv = firth_mod.firth_snp_batch(
                            y, Gv, st.firth_offset[:, ph], mask,
                            maxstep=params.maxstep,
                            niter=params.niter_max_firth, tol=2.5e-4,
                        )
                    fail_ph[idx] = ~conv
                    # on failure keep score-based beta/se (get_sumstats(true))
                    bhat_ph[idx] = np.where(conv, beta_f, bhat_ph[idx])
                    se_sel = np.where(conv, se_f, se_ph[idx])
                    chisq_ph[idx] = np.where(conv, lrt, chisq_ph[idx])
                    lp = chisq_neglog10(np.where(conv, lrt, 0.0))
                    logp_ph[idx] = np.where(conv, lp, logp_ph[idx])
                    if params.firth_se:
                        with np.errstate(divide="ignore", invalid="ignore"):
                            se_sel = np.where(
                                conv & (lrt > 0), np.abs(beta_f) / np.sqrt(np.maximum(lrt, 1e-300)), se_sel
                            )
                    se_ph[idx] = se_sel
                    n_failed += int((~conv).sum())
                else:  # SPA
                    if use_dev:
                        dc = _dev_consts(st, pd, ph)
                        chisq_s, logp_s, fail_s = cdev.spa_batch_dev(
                            stats[idx], denum[idx], Gres_rows_dev,
                            dc["Y_hat"], dc["gamma_sqrt"], dc["mask"],
                            tol=params.tol_spa,
                            niter_max=params.niter_max_spa,
                        )
                    else:
                        chisq_s, logp_s, fail_s = spa_mod.spa_batch(
                            stats[idx], denum[idx], Gres_rows,
                            st.Y_hat[:, ph],
                            st.gamma_sqrt[:, ph], mask,
                            tol=params.tol_spa,
                            niter_max=params.niter_max_spa,
                        )
                    fail_ph[idx] = fail_s
                    chisq_ph[idx] = np.where(~fail_s, chisq_s, chisq_ph[idx])
                    logp_ph[idx] = np.where(~fail_s, logp_s, logp_ph[idx])
                    se_ph[idx] = 1.0 / sqrt_denum[idx]
                    bhat_ph[idx] = np.where(
                        ~fail_s,
                        np.sign(stats[idx]) * np.sqrt(np.maximum(chisq_s, 0)) * se_ph[idx],
                        bhat_ph[idx],
                    )
                    n_failed += int(fail_s.sum())

        # flip sign of effect for flipped (minor-allele) variants
        bhat_ph = np.where(flipped, -bhat_ph, bhat_ph)
        bhat[:, ph] = bhat_ph
        se[:, ph] = se_ph
        chisq[:, ph] = chisq_ph
        logp[:, ph] = logp_ph
        test_fail[:, ph] = fail_ph

    return bhat, se, chisq, logp, test_fail, n_corrected, n_failed


def _dev_consts(st, pd, ph):
    """Per-trait [N] null-model vectors uploaded once per chromosome and
    reused by every block's device correction call."""
    import jax.numpy as jnp

    from ..utils.dtypes import compute_dtype

    cache = getattr(st, "_dev_consts_cache", None)
    if cache is None:
        cache = st._dev_consts_cache = {}
    dc = cache.get(ph)
    if dc is None:
        dt = compute_dtype()
        dc = cache[ph] = {
            "y": jnp.asarray(pd.phenotypes_raw[:, ph], dt),
            "mask": jnp.asarray(pd.masked_indivs[:, ph].astype(np.float64), dt),
            "gamma_sqrt": jnp.asarray(st.gamma_sqrt[:, ph], dt),
            "firth_offset": jnp.asarray(st.firth_offset[:, ph], dt),
            "Y_hat": jnp.asarray(st.Y_hat[:, ph], dt),
        }
    return dc


def _exact_firth_snp(params, pd, y, g, offset, mask, st, ph):
    """Exact Firth LRT for one SNP: penalized null (SNP coef fixed at 0)
    then full fit started from the null estimates."""
    X1 = np.column_stack([pd.new_cov, g])
    K = pd.new_cov.shape[1]
    b0 = np.zeros(K + 1)
    b0[:K] = st.bhat_start[:, ph]
    bn, _se, dev_null, _d0, ok = firth_mod.fit_firth_multi(
        y, X1, offset, mask, b0, K, params.maxstep_null,
        params.niter_max_firth_null, 10 * params.numtol,
    )
    if not ok:
        return False, 0.0, 0.0, 0.0
    bf, se, dev_full, dev0, ok = firth_mod.fit_firth_multi(
        y, X1, offset, mask, bn, None, params.maxstep,
        params.niter_max_firth, 2.5e-4, comp_lrt=True,
    )
    if not ok:
        return False, 0.0, 0.0, 0.0
    lrt = dev0 - dev_full
    if lrt < 0:
        return False, 0.0, 0.0, 0.0
    return True, bf[-1], se[-1], lrt


def _chisq_thr(alpha: float) -> float:
    from scipy.stats import chi2

    return float(chi2.isf(alpha, df=1))
