"""GxE / GxG interaction tests (QT path: HC3/HC4 robust sandwich or HLM
for rare variants) — reference Interaction.cpp (get_interaction_terms
:44, apply_interaction_tests_qt :109, apply_interaction_tests_HLM :289)
and HLM.cpp (heteroskedastic linear model Var(y)=sigma^2 exp(Vb)).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import List, Optional

import numpy as np
from scipy.optimize import minimize

from ..config import QT, Params
from ..utils.stats import chisq_neglog10, chisq_neglog10_df
from ..prep import fmt


@dataclass
class HLMNull:
    """Null heteroskedastic LM per trait (HLM.cpp)."""

    V: np.ndarray = None  # [N, 1+K] variance covariates (1, E...)
    Vlin: np.ndarray = None  # [N, 1+K] (1, E) un-normalized
    X: np.ndarray = None  # [N, C(+1)] mean covariates (+ blup)
    Dinv_sqrt: np.ndarray = None  # [N, P]
    Px: List[np.ndarray] = field(default_factory=list)
    yres: np.ndarray = None  # [N, P]


@dataclass
class InteractionState:
    evar_name: str = ""
    E: np.ndarray = None  # [N, K] interaction variable(s)
    E_res: np.ndarray = None  # [N, K] residualized+scaled
    scl_E: np.ndarray = None  # [K]
    lvl_names: List[str] = field(default_factory=list)
    is_cat: bool = False
    hlm: Optional[HLMNull] = None
    interaction_snp_name: Optional[str] = None


def add_square_term(E: np.ndarray) -> bool:
    """Whether an E^2 term accompanies E (add_square_term,
    Pheno.cpp:1030): single-column E that is not dichotomous, or
    dichotomous without a 0 level."""
    if E.shape[1] > 1:  # categorical
        return False
    vals = np.unique(E[:, 0])
    if len(vals) > 2:
        return True
    return not np.any(vals == 0)


def residualize_matrix(mat, X, n, numtol=1e-6):
    """Project X out of mat columns and scale (residualize_matrix,
    Pheno.cpp:1843). Returns (mat_res, scf) or (None, None) if sd=0."""
    beta = mat.T @ X
    m = mat - X @ beta.T
    scf = np.linalg.norm(m, axis=0) / np.sqrt(n - X.shape[1])
    if scf.min() < numtol:
        return None, None
    return m / scf[None, :], scf


def extract_interaction_E(params: Params, pd, gd, log) -> np.ndarray:
    """Build E for GxG/GxPRS and stash it on pd (extract_interaction_snp /
    extract_interaction_prs, Pheno.cpp:86-90, 927, 1393). Returns a keep
    mask: individuals with a missing interaction genotype are dropped from
    the analysis (read_snp mean_impute=false, Geno.cpp:3990-3994)."""
    N = params.n_samples
    keep = np.ones(N, dtype=bool)

    if params.interaction_prs:
        # GxPRS: full PRS recovered from the LOCO file
        # (extract_interaction_prs + read_prs, Pheno.cpp:1393-1460)
        from ..run_step2 import read_pred_list
        from ..io.files import open_read, string_split

        if params.n_pheno > 1:
            raise ValueError("option '--interaction-prs' only works with a single phenotype")
        blup_files = read_pred_list(params.pred_list)
        name = pd.pheno_names[0]
        prs = np.zeros(N)
        nchr = 0
        with open_read(blup_files[name]) as fh:
            header = string_split(fh.readline())
            id_to_ind = {s.key: i for i, s in enumerate(gd.samples)}
            for line in fh:
                toks = string_split(line)
                if not toks:
                    continue
                for col in range(1, len(header)):
                    k = id_to_ind.get(header[col])
                    if k is not None and toks[col] != "NA":
                        prs[k] += float(toks[col])
                nchr += 1
        if nchr > 1:
            prs /= nchr - 1  # sum of loco rows = (nchr-1) * PRS
        pd.interaction_cov = prs[:, None]
        pd.interaction_lvl_names = ["PRS"]
    else:
        # GxG: extract the SNP from the main file or an external one
        # (--interaction-file FORMAT,FILE; extract_from_genofile,
        # Geno.hpp:265)
        if params.interaction_file:
            from ..config import Params as _Params
            from ..io.geno import open_geno as _open_geno

            fmt_name, path = params.interaction_file.split(",", 1)
            sub = _Params(
                step=params.step, pheno_file=params.pheno_file,
                bed_prefix=path if fmt_name == "bed" else None,
                bgen_file=path if fmt_name == "bgen" else None,
                pgen_prefix=path if fmt_name == "pgen" else None,
                n_chrom=params.n_chrom,
                ref_first=params.interaction_file_reffirst,
                sample_file=params.interaction_file_sample,
            )
            gd2 = _open_geno(sub)
            snps2 = [s for s in gd2.snps if s.ID == params.interaction_var]
            if not snps2:
                raise ValueError(
                    f"interaction SNP '{params.interaction_var}' not found in "
                    f"--interaction-file"
                )
            G_ext = gd2.read_block_scattered(snps2).astype(np.float64)[0]
            idx_ext = gd2.sample_index()
            G = np.full(gd.n_samples, -3.0)
            for j, smp in enumerate(gd.samples):
                k = idx_ext.get(smp.key)
                if k is not None:
                    G[j] = G_ext[k]
            gd2.close()
        else:
            idx = [i for i, s in enumerate(gd.snps) if s.ID == params.interaction_var]
            if not idx:
                raise ValueError(f"interaction SNP '{params.interaction_var}' not found")
            G = gd.read_block_scattered([gd.snps[idx[0]]]).astype(np.float64)[0]
        miss = G == -3
        keep = ~miss
        G = np.where(miss, 0.0, G)  # dropped below; no mean imputation
        pd.interaction_cov = G[:, None]
        pd.interaction_snp_name = params.interaction_var
        pd.interaction_lvl_names = [params.interaction_var]
        # GxG automatically uses LTCO with the interaction SNP's
        # chromosome (Regenie.cpp:622 w_ltco; Geno.cpp:4251)
        if params.ltco_chr <= 0 and not params.skip_blups:
            snp_chr = next(
                (s.chrom for s in gd.snps if s.ID == params.interaction_var),
                -1,
            )
            if snp_chr > 0:
                params.ltco_chr = snp_chr
                log(f"   -using LTCO scheme for chr {snp_chr} (interaction SNP)")
    pd.interaction_is_cat = False
    return keep


def prep_interaction(params: Params, pd, gd, log) -> InteractionState:
    """Load the interaction variable and residualize it (prep_run
    interaction section, Pheno.cpp:1126-1165). E itself was built earlier
    in prepare() (covariate read for GxE; extract_interaction_E for
    GxG/GxPRS) so that --force-condtl can add it to the covariates."""
    st = InteractionState()
    st.evar_name = params.interaction_var
    st.E = pd.interaction_cov
    st.is_cat = getattr(pd, "interaction_is_cat", False)
    st.lvl_names = getattr(pd, "interaction_lvl_names", [params.interaction_var])
    st.interaction_snp_name = getattr(pd, "interaction_snp_name", None)

    ncov_i = st.E.shape[1]
    params.ncov_interaction = ncov_i
    params.int_add_extra_term = not st.is_cat and add_square_term(st.E)
    if params.gwas_condtl:
        # E already conditioned on as a covariate: no E main-effect
        # columns in the interaction model (get_interaction_terms,
        # Interaction.cpp:87-91)
        st.E_res = np.zeros((params.n_samples, 0))
        st.scl_E = np.ones(0)
        params.interaction_istart = 0
    else:
        # BT with a non-dichotomous E carries an E^2 main-effect column
        # (int_add_esq, Pheno.cpp:1137-1142)
        from ..config import BT

        params.int_add_esq = (
            params.trait_mode == BT and params.int_add_extra_term
        )
        main = (
            np.column_stack([st.E, st.E**2]) if params.int_add_esq else st.E
        )
        # residualize E (and E^2) on the covariate basis
        E_res, scf = residualize_matrix(main, pd.new_cov, params.n_analyzed, params.numtol)
        if E_res is None:
            raise ValueError("Var=0 for the interaction risk factor")
        st.E_res = E_res
        st.scl_E = scf
        params.interaction_istart = main.shape[1]  # main-effect columns in M

    if params.trait_mode == QT and not params.no_robust and not params.force_robust:
        st.hlm = _hlm_prep(params, pd, st)
    return st


# ---------------------------------------------------------------------------
# HLM null model
# ---------------------------------------------------------------------------

def _qr_prune(mat: np.ndarray, qr_tol: float = 1e-7) -> np.ndarray:
    """Keep a linearly independent subset of columns in pivot order
    (apply_QR, Pheno.cpp:1861 via ColPivHouseholderQR)."""
    from scipy.linalg import qr as _qr

    _, R, piv = _qr(mat, mode="economic", pivoting=True)
    diag = np.abs(np.diag(R))
    rank = int((diag > diag[0] * qr_tol).sum()) if diag.size else 0
    if rank == 0:
        raise ValueError("rank of matrix is 0")
    return mat[:, sorted(piv[:rank])] if rank < mat.shape[1] else mat


def _center_scale(V: np.ndarray, N: int) -> np.ndarray:
    out = V.copy()
    for k in range(out.shape[1]):
        mu = out[:, k].sum() / N
        out[:, k] = out[:, k] - mu
        sc = np.linalg.norm(out[:, k]) / np.sqrt(N - 1)
        out[:, k] /= sc
    return out


def _hlm_prep(params, pd, st) -> HLMNull:
    """HLM null-model design (HLM::prep_run, HLM.cpp:49-93): the variance
    model gets an E^2 column for non-dichotomous E (unless --hlm-novquad)
    and the mean model gets E^2 as an extra covariate."""
    h = HLMNull()
    N = params.n_samples
    h.Vlin = np.column_stack([np.ones(N), st.E])
    if params.hlm_vquad and params.int_add_extra_term:
        # V = (1, QR(E, E^2) centered+scaled) (HLM.cpp:55-64)
        U = _qr_prune(np.column_stack([st.E, st.E**2]))
        h.V = np.column_stack([np.ones(N), _center_scale(U, N)])
    else:
        # V = (1, centered+scaled E)
        h.V = np.column_stack(
            [np.ones(N), _center_scale(np.asarray(st.E, dtype=np.float64), N)]
        )
    if params.int_add_extra_term:
        # X = QR(covs, E^2) (HLM.cpp:76-81)
        h.X = _qr_prune(np.column_stack([pd.new_cov, st.E**2]))
    else:
        h.X = pd.new_cov.copy()
    return h


def hlm_fit_null(params, pd, st, blups, log):
    """Fit the null HLM per trait (HLM_fitNull, HLM.cpp:100)."""
    h = st.hlm
    N, P = pd.phenotypes.shape
    X = h.X if params.skip_blups else np.column_stack([h.X, np.zeros(N)])
    h.Dinv_sqrt = np.zeros((N, P))
    h.Px = [None] * P
    h.yres = np.zeros((N, P))

    for ph in range(P):
        if not pd.pheno_pass[ph]:
            continue
        mask = pd.masked_indivs[:, ph]
        maskf = mask.astype(np.float64)
        y = pd.phenotypes[:, ph]  # QT: residualized+scaled (phenotypes_raw alias)
        if not params.skip_blups:
            X[:, -1] = blups[:, ph]
        n = pd.Neff[ph]

        def get_alpha(beta):
            Vb = h.V @ beta
            Dinv = np.exp(-Vb) * maskf
            Xd = (X * Dinv[:, None]).T
            alpha = np.linalg.lstsq(Xd @ X, Xd @ y, rcond=None)[0]
            return Vb, Dinv, alpha

        def obj(beta):
            Vb, Dinv, alpha = get_alpha(beta)
            esq = (y - X @ alpha) ** 2
            fval = ((Vb + Dinv * esq) * maskf).sum() / n
            grad = h.V.T @ (((1 - esq * Dinv) * maskf) / n)
            return fval, grad

        beta0 = np.zeros(h.V.shape[1])
        _, _, alpha = get_alpha(beta0)
        esq = ((y - X @ alpha) * maskf) ** 2
        try:
            beta0 = np.linalg.lstsq(
                h.V.T @ (h.V * esq[:, None]), h.V.T @ ((esq - 1) * maskf), rcond=None
            )[0]
        except np.linalg.LinAlgError:
            pass
        res = minimize(obj, beta0, jac=True, method="L-BFGS-B",
                       options={"maxiter": 100})
        beta = res.x
        Vb, Dinv, alpha = get_alpha(beta)
        h.Dinv_sqrt[:, ph] = np.sqrt(Dinv)
        Xd = X * h.Dinv_sqrt[:, ph][:, None]
        D, Vv = np.linalg.eigh(Xd.T @ Xd)
        nz = D > D[-1] * 1e-12
        h.Px[ph] = (Xd @ Vv[:, nz]) / np.sqrt(D[nz])[None, :]
        ym = y * h.Dinv_sqrt[:, ph]
        h.yres[:, ph] = ym - h.Px[ph] @ (h.Px[ph].T @ ym)


# ---------------------------------------------------------------------------
# per-block interaction tests
# ---------------------------------------------------------------------------

def apply_interaction_block(params, eng, bsnps, G_raw, G_res, result, writers, test_name):
    """Run interaction tests for every SNP in a tested block (QT).

    G_raw: [B, N] imputed unresidualized genotypes; G_res: [B, N]
    residualized+scaled (engine stash). result: BlockResult for stats.
    """
    from ..config import BT

    import os

    st = eng.interaction
    pd = eng.pd
    P = params.n_pheno
    B = len(bsnps)

    # multi-host: the interaction refits are host-bound — each process
    # takes a CONTIGUOUS chunk of the block's SNPs (so buffered rows
    # merge in process order = SNP order) and the rendered rows are
    # allgathered before host 0 writes them
    from ..parallel.dist import allgather_py, process_count, process_index

    nproc, ppid = process_count(), process_index()
    lo_b, hi_b = 0, B
    real_writers = None
    uniq_w: list = []
    if nproc > 1:
        chunk = -(-B // nproc)
        lo_b, hi_b = ppid * chunk, min((ppid + 1) * chunk, B)

        class _Buf:
            __slots__ = ("parts",)

            def __init__(self):
                self.parts = []

            def write(self, s):
                self.parts.append(s)

        real_writers = writers
        bufs = {}
        seen = set()
        for w in real_writers:
            if w is not None and id(w) not in seen:
                seen.add(id(w))
                bufs[id(w)] = _Buf()
                uniq_w.append(w)
        writers = [None if w is None else bufs[id(w)] for w in real_writers]

    robust_idx = []
    bt_idx = []
    hlm_idx = []
    # loop-invariant routing decisions (hoisted from the per-SNP loop)
    no_batch = bool(os.environ.get("REGENIE_TPU_NO_BATCH_INT"))
    if params.trait_mode == BT:
        # batched device IRLS on accelerator backends; the adaptive
        # per-SNP solver wins on CPU (early-exit per element).
        # REGENIE_TPU_BATCH_INT=1 / REGENIE_TPU_NO_BATCH_INT force.
        import jax as _jax

        bt_use_batched = not no_batch and (
            os.environ.get("REGENIE_TPU_BATCH_INT")
            or _jax.default_backend() != "cpu"
        )
    for b in range(lo_b, hi_b):
        if result.ignored[b]:
            continue
        if st.interaction_snp_name and bsnps[b].ID == st.interaction_snp_name:
            continue
        if params.trait_mode == BT:
            if bt_use_batched:
                bt_idx.append(b)
            else:
                g_raw = np.asarray(G_raw[b], dtype=np.float64)
                _test_snp_bt(params, eng, bsnps[b], b, g_raw, result,
                             writers, test_name)
            continue
        g_raw = np.asarray(G_raw[b], dtype=np.float64)
        mac_b = result.af_t[b] * 2 * result.ns_t[b]
        mac_b = np.minimum(mac_b, 2 * result.ns_t[b] - mac_b)
        use_hlm = (
            st.hlm is not None
            and (mac_b < params.rare_mac_inter).any()
        )
        if use_hlm:
            if no_batch:
                _test_snp_hlm(params, eng, bsnps[b], b, g_raw, result,
                              writers, test_name)
            else:
                hlm_idx.append(b)
        elif no_batch:
            _test_snp_robust(params, eng, bsnps[b], b, g_raw, G_res[b], result,
                             writers, test_name)
        else:
            robust_idx.append(b)
    # shared block-level stat buffers: HLM and robust SNPs of a mixed
    # block render in ONE call so the file keeps the per-SNP row order
    out = None
    if hlm_idx and robust_idx:
        from ..io.output import native_formatter

        tmpl = _int_row_templates(
            params, st, params.interaction_istart,
            params.ncov_interaction, test_name)
        if (tmpl is not None and not params.print_vcov
                and native_formatter("format_sumstat_single") is not None):
            T = len(tmpl[1])
            out = {
                "tests": tmpl[1],
                "beta": np.full((B, P, T), -1.0),
                "se": np.full((B, P, T), -1.0),
                "chisq": np.full((B, P, T), -1.0),
                "logp": np.full((B, P, T), -1.0),
                "emit": np.zeros((B, P), bool),
            }
    if hlm_idx:
        if not _hlm_block_batched(params, eng, bsnps, hlm_idx, G_raw, result,
                                  writers, test_name, out):
            for b in hlm_idx:
                _test_snp_hlm(params, eng, bsnps[b], b,
                              np.asarray(G_raw[b], dtype=np.float64), result,
                              writers, test_name)
    if bt_idx:
        if not _bt_block_batched(params, eng, bsnps, bt_idx, G_raw, result,
                                 writers, test_name):
            for b in bt_idx:
                _test_snp_bt(params, eng, bsnps[b], b,
                             np.asarray(G_raw[b], dtype=np.float64), result,
                             writers, test_name)
    if robust_idx:
        _robust_block_batched(
            params, eng, bsnps, robust_idx, G_raw, G_res, result, writers,
            test_name, out
        )
    if out is not None and out["emit"].any():
        _render_int_rows(params, eng, writers, bsnps, list(range(B)),
                         out["emit"], out["tests"], out["beta"], out["se"],
                         out["chisq"], out["logp"], result)

    if real_writers is not None:
        # ordered multi-host merge (process order == SNP order)
        payload = ["".join(bufs[id(w)].parts) for w in uniq_w]
        for part in allgather_py(payload):
            for k, w in enumerate(uniq_w):
                if part[k]:
                    w.write(part[k])


def _robust_block_batched(params, eng, bsnps, idx, G_raw, G_res, result,
                          writers, test_name, out=None):
    """Device-batched HC3/HC4 sandwich tests for all robust-eligible SNPs
    of a block (same math as _test_snp_robust, per-SNP loop replaced by
    einsum batches)."""
    import jax.numpy as jnp

    st, pd = eng.interaction, eng.pd
    K = params.ncov_interaction
    beg = params.interaction_istart
    want_hc4 = bool(params.force_hc4)
    kern = _robust_batch_kernel(want_hc4)
    N = pd.new_cov.shape[0]
    P = params.n_pheno
    scf_denom = float(params.n_analyzed - pd.new_cov.shape[1])
    # chunk so the [S, N, P] residual tensor stays ~200MB
    S_max = max(1, int(2.5e7 / max(1, N * P / 8)))
    E_j = jnp.asarray(st.E)
    E_res_j = jnp.asarray(st.E_res)
    cov_j = jnp.asarray(pd.new_cov)
    res_j = jnp.asarray(eng.res)
    maskf_j = jnp.asarray(pd.masked_indivs.astype(np.float64))
    G_raw_np = np.asarray(G_raw, dtype=np.float64)
    G_res_np = np.asarray(G_res)
    scale_fac = getattr(result, "scale_fac", None)

    for c0 in range(0, len(idx), S_max):
        chunk = idx[c0 : c0 + S_max]
        outs = kern(
            jnp.asarray(G_raw_np[chunk]), jnp.asarray(G_res_np[chunk]),
            E_j, E_res_j, cov_j, res_j, maskf_j, scf_denom,
        )
        if want_hc4:
            scf_i, Dmin, Z, tau, V3, s2, V4 = (np.asarray(o) for o in outs)
        else:
            scf_i, Dmin, Z, tau, V3, s2 = (np.asarray(o) for o in outs)
            V4 = None
        nc = Z.shape[1]
        if not params.print_vcov and _write_int_rows_block(
            params, eng, writers, bsnps, chunk, scf_i, Dmin, Z, tau, V3, s2,
            V4, result, test_name, beg, K, scale_fac, out,
        ):
            continue
        for si, b in enumerate(chunk):
            if scf_i[si].min() < params.numtol or Dmin[si] < params.numtol:
                continue
            snp = bsnps[b]
            for ph in range(P):
                if (not pd.pheno_pass[ph] or result.ignored_trait[b, ph]
                        or writers[ph] is None):
                    continue
                bhat = tau[si, :, ph]
                gscale = pd.scale_Y[ph] * eng.p_sd_yres[ph] / (
                    scale_fac[b] if scale_fac is not None else 1.0
                )
                iscale = pd.scale_Y[ph] * eng.p_sd_yres[ph] / scf_i[si]
                cscale = pd.scale_Y[ph] * eng.p_sd_yres[ph] / st.scl_E
                if params.no_robust:
                    s2v = s2[si, ph] / (pd.Neff[ph] - params.ncov_analyzed - nc)
                    Vmat = s2v * Z[si]
                else:
                    mac_ph = (result.mac_t[b, ph] if result.mac_t is not None
                              else np.inf)
                    Vmat = (V4[si, ph]
                            if (params.force_hc4 and mac_ph <= params.rare_mac_inter)
                            else V3[si, ph])
                _write_int_rows(params, eng, writers, snp, b, ph, bhat, Vmat,
                                beg, K, gscale, iscale, cscale, result, test_name)


_ROBUST_KERNELS = {}


def _robust_batch_kernel(want_hc4):
    """Batched device form of the HC3/HC4 sandwich quantities for S SNPs
    at once (apply_interaction_tests_qt, Interaction.cpp:109-220): the
    per-SNP [N, ncols] design solves become einsum batches on the MXU."""
    if want_hc4 in _ROBUST_KERNELS:
        return _ROBUST_KERNELS[want_hc4]
    from functools import partial as _partial

    import jax
    import jax.numpy as jnp

    from ..utils.dtypes import MATMUL_PRECISION as _PREC

    @_partial(jax.jit, static_argnames=("scf_denom",))
    def _kern(g_raw, g_res, E, E_res, cov, res, maskf, scf_denom):
        # g_raw/g_res: [S,N]; E: [N,Ki]; E_res: [N,beg]; cov: [N,C];
        # res: [N,P]; maskf: [N,P]; scf_denom = n_analyzed - ncov
        S, N = g_raw.shape
        iMat = E[None, :, :] * g_raw[:, :, None]  # [S,N,Ki]
        beta = jnp.einsum("sni,nc->sic", iMat, cov, precision=_PREC)
        iR = iMat - jnp.einsum("nc,sic->sni", cov, beta, precision=_PREC)
        scf_i = jnp.linalg.norm(iR, axis=1) / jnp.sqrt(scf_denom)  # [S,Ki]
        iR = iR / jnp.where(scf_i > 0, scf_i, 1.0)[:, None, :]
        M = jnp.concatenate(
            [jnp.broadcast_to(E_res[None], (S,) + E_res.shape),
             g_res[:, :, None], iR], axis=2,
        )  # [S,N,nc]
        nc = M.shape[2]
        MtM = jnp.einsum("sni,snj->sij", M, M, precision=_PREC)
        D, V = jnp.linalg.eigh(MtM)
        Z = jnp.einsum("sik,sk,sjk->sij", V, 1.0 / D, V, precision=_PREC)
        MZ = jnp.einsum("sni,sij->snj", M, Z, precision=_PREC)
        hvec = (MZ * M).sum(axis=2)  # [S,N]
        Mtres = jnp.einsum("sni,np->sip", M, res, precision=_PREC)
        tau = jnp.einsum("sij,sjp->sip", Z, Mtres, precision=_PREC)
        fit = jnp.einsum("sni,sip->snp", M, tau, precision=_PREC)
        e_sq = ((res[None] - fit) * maskf[None]) ** 2  # [S,N,P]
        hc3 = (1.0 - hvec) ** 2
        core3 = jnp.einsum(
            "sni,snp,snj->spij", M, e_sq / hc3[:, :, None], M, precision=_PREC
        )
        V3 = jnp.einsum("sik,spkl,slj->spij", Z, core3, Z, precision=_PREC)
        s2 = e_sq.sum(axis=1)  # [S,P] (model-based numerator)
        outs = (scf_i, D.min(axis=1), Z, tau, V3, s2)
        if want_hc4:
            hc4 = (1.0 - hvec) ** jnp.minimum(N * hvec / nc, 4.0)
            core4 = jnp.einsum(
                "sni,snp,snj->spij", M, e_sq / hc4[:, :, None], M, precision=_PREC
            )
            V4 = jnp.einsum("sik,spkl,slj->spij", Z, core4, Z, precision=_PREC)
            outs = outs + (V4,)
        return outs

    _ROBUST_KERNELS[want_hc4] = _kern
    return _kern


def _test_snp_robust(params, eng, snp, b, g_raw, g_res, result, writers, test_name):
    """HC3/model-based sandwich test (apply_interaction_tests_qt)."""
    st, pd = eng.interaction, eng.pd
    K = params.ncov_interaction
    beg = params.interaction_istart
    iMat = st.E * g_raw[:, None]
    iMat_res, scf_i = residualize_matrix(iMat, pd.new_cov, params.n_analyzed, params.numtol)
    if iMat_res is None:
        return
    M = np.column_stack([st.E_res, g_res, iMat_res])
    MtM = M.T @ M
    D, V = np.linalg.eigh(MtM)
    if D.min() < params.numtol:
        return
    Z = (V / D[None, :]) @ V.T
    hvec = ((M @ Z) * M).sum(axis=1)
    res = eng.res  # [N, P]
    tau = Z @ (M.T @ res)  # [ncols, P]
    e_sq = ((res - M @ tau) ** 2) * pd.masked_indivs
    hc3 = (1 - hvec) ** 2
    # HC4 divisor for rare variants (--force-hc4, Interaction.cpp:132)
    hc4 = (1 - hvec) ** np.minimum(
        M.shape[0] * hvec / M.shape[1], 4.0
    )

    scale_fac = getattr(result, "scale_fac", None)
    for ph in range(params.n_pheno):
        if not pd.pheno_pass[ph] or result.ignored_trait[b, ph] or writers[ph] is None:
            continue
        bhat = tau[:, ph]
        gscale = pd.scale_Y[ph] * eng.p_sd_yres[ph] / (scale_fac[b] if scale_fac is not None else 1.0)
        iscale = pd.scale_Y[ph] * eng.p_sd_yres[ph] / scf_i
        cscale = pd.scale_Y[ph] * eng.p_sd_yres[ph] / st.scl_E
        if params.no_robust:
            s2 = e_sq[:, ph].sum() / (pd.Neff[ph] - params.ncov_analyzed - M.shape[1])
            Vmat = s2 * Z
        else:
            mac_ph = result.mac_t[b, ph] if result.mac_t is not None else np.inf
            div = hc4 if (params.force_hc4 and mac_ph <= params.rare_mac_inter) else hc3
            Vmat = Z @ (M.T * (e_sq[:, ph] / div)[None, :]) @ M @ Z
        _write_int_rows(params, eng, writers, snp, b, ph, bhat, Vmat, beg, K,
                        gscale, iscale, cscale, result, test_name)


def _test_snp_hlm(params, eng, snp, b, g_raw, result, writers, test_name):
    """HLM-based test for rare variants (apply_interaction_tests_HLM)."""
    st, pd = eng.interaction, eng.pd
    h = st.hlm
    K = params.ncov_interaction
    beg = params.interaction_istart
    # M = [E, G*Vlin] = [E, G, G*E]; E mains dropped in conditional mode
    # (get_interaction_terms HLM branch, Interaction.cpp:66-72)
    parts = ([] if params.gwas_condtl else [st.E]) + [h.Vlin * g_raw[:, None]]
    M = np.column_stack(parts)
    for ph in range(params.n_pheno):
        if not pd.pheno_pass[ph] or result.ignored_trait[b, ph] or writers[ph] is None:
            continue
        Ds = h.Dinv_sqrt[:, ph]
        Mm = M * Ds[:, None]
        Xres = Mm - h.Px[ph] @ (h.Px[ph].T @ Mm)
        D, V = np.linalg.eigh(Xres.T @ Xres)
        if D.min() < params.numtol:
            return
        Vmat = (V / D[None, :]) @ V.T
        bhat = Vmat @ (Xres.T @ h.yres[:, ph])
        ones = np.ones(M.shape[1])
        _write_int_rows(params, eng, writers, snp, b, ph, bhat, Vmat, beg, K,
                        1.0, ones[:K], ones[:K], result, test_name)


def _hlm_block_batched(params, eng, bsnps, idx, G_raw, result, writers,
                       test_name, out=None) -> bool:
    import jax

    # f64 on device like the scalar path it replaces (TPU: XLA f64
    # emulation; without this the [S,N,C] Gram sums over biobank N
    # would silently run f32/bf16)
    with jax.enable_x64(True):
        return _hlm_block_batched_x64(params, eng, bsnps, idx, G_raw,
                                      result, writers, test_name, out)


def _hlm_block_batched_x64(params, eng, bsnps, idx, G_raw, result, writers,
                           test_name, out=None) -> bool:
    """Batched twin of _test_snp_hlm: the per-(SNP, trait) whitened
    projections/eigh solves become [S, N, C] einsum batches; rows render
    columnar. Replicates the scalar path's abort semantics (a
    low-eigenvalue design stops that SNP's remaining traits).

    Returns False to fall back to the per-SNP loop."""
    import jax.numpy as jnp

    from ..io.output import native_formatter

    st, pd = eng.interaction, eng.pd
    if params.print_vcov or native_formatter("format_sumstat_single") is None:
        return False
    h = st.hlm
    K = params.ncov_interaction
    beg = params.interaction_istart
    tmpl = _int_row_templates(params, st, beg, K, test_name)
    if tmpl is None:
        return False
    term, tests = tmpl
    T = len(tests)
    P = params.n_pheno
    N = h.Vlin.shape[0]
    C = (0 if params.gwas_condtl else st.E.shape[1]) + h.Vlin.shape[1]
    G_np = np.asarray(G_raw, dtype=np.float64)
    E_j = None if params.gwas_condtl else jnp.asarray(st.E)
    Vlin_j = jnp.asarray(h.Vlin)
    yres_j = jnp.asarray(h.yres)
    Ds_j = jnp.asarray(h.Dinv_sqrt)
    S_max = max(1, int(2.0e8 / max(1, 8 * N * C)))

    for c0 in range(0, len(idx), S_max):
        chunk = list(idx[c0 : c0 + S_max])
        real_S = len(chunk)
        S_pad = min(S_max, -(-real_S // 64) * 64)  # shape buckets of 64
        if real_S < S_pad:
            chunk = chunk + [chunk[-1]] * (S_pad - real_S)
        S = len(chunk)
        g = jnp.asarray(G_np[chunk])  # [S, N]
        parts = [] if E_j is None else [jnp.broadcast_to(
            E_j, (S, N, E_j.shape[1]))]
        parts.append(Vlin_j[None, :, :] * g[:, :, None])
        M = jnp.concatenate(parts, axis=2)  # [S, N, C]

        beta_o = np.full((S, P, T), -1.0)
        se_o = np.full((S, P, T), -1.0)
        tstat = np.full((S, P, T), -1.0)
        lp = np.full((S, P, T), -1.0)
        emit = np.zeros((S, P), bool)
        alive = np.ones(S, bool)
        alive[real_S:] = False
        ig = np.asarray(result.ignored_trait)[chunk][:, :P]
        for ph in range(P):
            if not pd.pheno_pass[ph] or writers[ph] is None:
                continue
            if not alive.any():
                break
            Mm = M * Ds_j[None, :, ph, None]
            Px = jnp.asarray(h.Px[ph])
            t1 = jnp.einsum("nq,snc->sqc", Px, Mm)
            Xres = Mm - jnp.einsum("nq,sqc->snc", Px, t1)
            A = jnp.einsum("snc,snd->scd", Xres, Xres)
            D, V = jnp.linalg.eigh(A)
            Dmin = np.asarray(D.min(axis=1))
            Vmat = np.asarray(jnp.einsum("sik,sk,sjk->sij", V, 1.0 / D, V))
            Xty = jnp.einsum("snj,n->sj", Xres, yres_j[:, ph])
            bhat = np.asarray(jnp.einsum(
                "sij,sj->si", jnp.asarray(Vmat), Xty))
            dfail = Dmin < params.numtol
            # an ignored trait is skipped before the eigh in the scalar
            # path, so it cannot abort that SNP
            dfail = dfail & ~ig[:, ph]
            this = alive & ~dfail & ~ig[:, ph]
            alive = alive & ~dfail
            emit[:, ph] = this
            dg = np.einsum("sjj->sj", Vmat)
            for t in range(T):
                j = term[t]
                if j < 0:
                    continue
                tt = bhat[:, j] ** 2 / dg[:, j]
                tstat[:, ph, t] = tt
                lp[:, ph, t] = chisq_neglog10(tt)
                beta_o[:, ph, t] = bhat[:, j]
                se_o[:, ph, t] = np.sqrt(dg[:, j])
            if K > 1:
                sub = Vmat[:, beg + 1 : beg + 1 + K, beg + 1 : beg + 1 + K]
                bi = bhat[:, beg + 1 : beg + 1 + K]
                tt = np.abs(np.einsum(
                    "sk,skl,sl->s", bi, np.linalg.inv(sub), bi))
                tstat[:, ph, T - 2] = tt
                lp[:, ph, T - 2] = chisq_neglog10_df(tt, K)
            sub = Vmat[:, beg : beg + 1 + K, beg : beg + 1 + K]
            bj = bhat[:, beg : beg + 1 + K]
            tt = np.abs(np.einsum(
                "sk,skl,sl->s", bj, np.linalg.inv(sub), bj))
            tstat[:, ph, T - 1] = tt
            lp[:, ph, T - 1] = chisq_neglog10_df(tt, 1 + K)
        if out is not None:
            rs = slice(None, real_S)
            rows = chunk[:real_S]
            out["beta"][rows] = beta_o[rs]
            out["se"][rows] = se_o[rs]
            out["chisq"][rows] = tstat[rs]
            out["logp"][rows] = lp[rs]
            out["emit"][rows] = emit[rs]
        elif emit.any():
            if not _render_int_rows(params, eng, writers, bsnps, chunk,
                                    emit, tests, beta_o, se_o, tstat, lp,
                                    result):
                return False
    return True


def _pvec_jnp(eta):
    """Device twin of glm.get_pvec (same clamping constants)."""
    import jax.numpy as jnp

    ETA_MIN, ETA_MAX = -30.0, 30.0
    eps = float(10 * np.finfo(np.float64).eps)
    pi = 1.0 - 1.0 / (jnp.exp(jnp.clip(eta, ETA_MIN, ETA_MAX)) + 1.0)
    pi = jnp.where(eta > ETA_MAX, 1.0 / (1.0 + eps), pi)
    pi = jnp.where(eta < ETA_MIN, eps / (1.0 + eps), pi)
    return pi


_BT_IRLS_KERNELS = {}


def _bt_irls_kernel(C, niter_max, check_hs_dev, tol):
    """Device-batched twin of glm.fit_logistic_irls for Q refit designs
    sharing (y, offset, mask): the same Newton-from-working-response /
    5-step deviance line search / score-stop / divergence-abort state
    machine, per-element masks instead of early returns
    (apply_interaction_tests_bt refits, Interaction.cpp:441-664).

    Float64 on-device (TPU runs f64 via XLA software emulation — the
    score-based stopping at tol=1e-6 is not reachable in f32 at biobank
    N). Returns (beta [Q, C], ok [Q])."""
    key = (C, niter_max, check_hs_dev, float(tol))
    if key in _BT_IRLS_KERNELS:
        return _BT_IRLS_KERNELS[key]
    import jax
    import jax.numpy as jnp

    ETA_MIN, ETA_MAX = -30.0, 30.0
    eps = float(10 * np.finfo(np.float64).eps)

    def pvec(eta):
        pi = 1.0 - 1.0 / (jnp.exp(jnp.clip(eta, ETA_MIN, ETA_MAX)) + 1.0)
        pi = jnp.where(eta > ETA_MAX, 1.0 / (1.0 + eps), pi)
        pi = jnp.where(eta < ETA_MIN, eps / (1.0 + eps), pi)
        return pi

    def dev_of(y, pi, maskf):
        nll = jnp.where(y == 0, -jnp.log(1.0 - pi), -jnp.log(pi))
        return 2.0 * jnp.sum(nll * maskf, axis=-1)

    @jax.jit
    def run(H, y, offset, maskf):
        # H [Q, N, C]; y/offset/maskf [N]
        Q = H.shape[0]
        maskb = maskf > 0
        beta = jnp.zeros((Q, C), jnp.float64)
        betanew = beta
        eta = jnp.broadcast_to(offset, H.shape[:2]).astype(jnp.float64)
        pi = pvec(eta)
        dev_old = dev_of(y, pi, maskf)
        done = jnp.zeros(Q, bool)
        conv = jnp.zeros(Q, bool)
        small = jnp.zeros(Q, bool)
        diff_dev = jnp.full(Q, jnp.inf)

        def body(i, st):
            beta, betanew, eta, pi, dev_old, done, conv, small, diff_dev = st
            active = ~done
            niter_cur = i + 1
            w = jnp.where(maskb, pi * (1.0 - pi), 1.0)
            wzero = (w == 0).any(axis=-1)
            done = done | (active & wzero)  # fail, result = beta
            active = active & ~wzero
            z = jnp.where(maskb, eta - offset + (y - pi) / w, 0.0)
            mw = maskf * w
            A = jnp.einsum("qnc,qn,qnd->qcd", H, mw, H)
            rhs = jnp.einsum("qnc,qn->qc", H, mw * z)
            # pinv (min-norm) rather than solve: the scalar path's
            # np.linalg.lstsq survives singular designs
            bn = jnp.einsum("qcd,qd->qc", jnp.linalg.pinv(A), rhs)

            # 5-step halving line search (freeze each element's first
            # accepted point); early-exits once every element accepted
            def ls_body(ls_st):
                t, bcur, ls_ok, eta_a, pi_a, dev_a = ls_st
                eta_t = offset + jnp.einsum("qnc,qc->qn", H, bcur)
                pi_t = pvec(eta_t)
                dev_t = dev_of(y, pi_t, maskf)
                valid = jnp.all(
                    ((pi_t > 0) & (pi_t < 1)) | ~maskb, axis=-1
                ) & jnp.isfinite(dev_t)
                cond = valid & ((dev_t < dev_old) if check_hs_dev else True)
                newly = cond & ~ls_ok
                eta_a = jnp.where(newly[:, None], eta_t, eta_a)
                pi_a = jnp.where(newly[:, None], pi_t, pi_a)
                dev_a = jnp.where(newly, dev_t, dev_a)
                bfix = jnp.where(ls_ok[:, None] | newly[:, None],
                                 bcur, (beta + bcur) / 2.0)
                return (t + 1, bfix, ls_ok | cond, eta_a, pi_a, dev_a)

            def ls_cond(ls_st):
                t, _b, ls_ok, *_ = ls_st
                return (t < 5) & ~jnp.all(ls_ok | ~active)

            ls_st = (0, bn, jnp.zeros_like(done), eta, pi, dev_old)
            _t, bcur, ls_ok, eta_a, pi_a, dev_a = jax.lax.while_loop(
                ls_cond, ls_body, ls_st)
            done = done | (active & ~ls_ok)  # fail, result = beta
            active = active & ls_ok

            score = jnp.einsum(
                "qnc,qn->qc", H, maskf * (y - pi_a))
            smax = jnp.abs(score).max(axis=-1)
            conv_now = active & (smax < tol)
            conv = conv | conv_now
            done = done | conv_now
            # conv elements keep betanew = bcur as the result
            betanew = jnp.where(active[:, None], bcur, betanew)
            active = active & ~conv_now
            small = small | (active & (niter_cur < 20) & (smax < 1.0))
            diverged = active & small & (niter_cur > 20) & (smax > 5.0)
            done = done | diverged  # fail, result = beta
            active = active & ~diverged
            dd = jnp.abs(dev_a - dev_old) / (0.1 + jnp.abs(dev_a))
            diff_dev = jnp.where(active, dd, diff_dev)
            beta = jnp.where(active[:, None], bcur, beta)
            dev_old = jnp.where(active, dev_a, dev_old)
            eta = jnp.where(active[:, None], eta_a, eta)
            pi = jnp.where(active[:, None], pi_a, pi)
            return (beta, betanew, eta, pi, dev_old, done, conv, small,
                    diff_dev)

        def outer_cond(ist):
            i, st = ist
            return (i < niter_max) & ~jnp.all(st[5])  # st[5] = done

        def outer_body(ist):
            i, st = ist
            return i + 1, body(i, st)

        st = (beta, betanew, eta, pi, dev_old, done, conv, small, diff_dev)
        _i, st = jax.lax.while_loop(outer_cond, outer_body, (0, st))
        beta, betanew, _eta, _pi, _dev, done, conv, _small, diff_dev = st
        # not-done elements: converged iff diff_dev in (0, tol)
        tail_ok = (~done) & (diff_dev != 0) & (diff_dev < tol)
        ok = conv | tail_ok
        # scalar returns betanew on convergence AND on tail exhaustion;
        # mid-loop failures return the last accepted beta (callers only
        # use it when ok)
        out = jnp.where((conv | ~done)[:, None], betanew, beta)
        return out, ok

    _BT_IRLS_KERNELS[key] = run
    return run


def _bt_block_batched(params, eng, bsnps, idx, G_raw, result, writers,
                      test_name) -> bool:
    """Device-batched BT interaction tests for the eligible SNPs of a
    block: the per-(SNP, trait) logistic refits of _test_snp_bt become
    two masked batched IRLS passes (+ batched eigh/sandwich algebra) on
    the accelerator, rows render columnar. Control flow, skip
    semantics, and row order match the scalar path; traits with Firth
    LRT fallbacks keep the per-SNP writer for exact row interleaving.

    Returns False to fall back entirely (--print-vcov / no native
    formatter / oversized TEST strings)."""
    import jax

    # f64 everywhere (TPU: XLA software emulation) — the IRLS stopping
    # contract (score tol 1e-6 at biobank N) is unreachable in f32
    with jax.enable_x64(True):
        return _bt_block_batched_x64(params, eng, bsnps, idx, G_raw,
                                     result, writers, test_name)


def _bt_block_batched_x64(params, eng, bsnps, idx, G_raw, result, writers,
                          test_name) -> bool:
    import jax.numpy as jnp

    from ..io.output import native_formatter

    st, pd, bt = eng.interaction, eng.pd, eng.bt_state
    if params.print_vcov or native_formatter("format_sumstat_single") is None:
        return False
    beg = params.interaction_istart
    K = params.ncov_interaction
    tmpl = _int_row_templates(params, st, beg, K, test_name)
    if tmpl is None:
        return False
    term, tests = tmpl
    T = len(tests)
    np_ = 1 + K
    lpfirth = -np.log10(params.alpha_pvalue)
    lpbase = -np.log10(0.05)
    P = params.n_pheno
    cov = pd.new_cov
    N, ncov = cov.shape
    Ke = st.E_res.shape[1]
    C = Ke + 1 + K
    denom = float(params.n_analyzed - ncov)
    flipped = np.asarray(
        getattr(eng, "last_flipped", np.zeros(len(bsnps), bool)))
    G_np = np.asarray(G_raw, dtype=np.float64)
    run_t = _bt_irls_kernel(C, params.niter_max, True, params.numtol)
    run_f = _bt_irls_kernel(C, params.niter_max, False, params.numtol)
    cov_j = jnp.asarray(cov, jnp.float64)
    E_j = jnp.asarray(st.E, jnp.float64)
    Er_j = jnp.asarray(st.E_res, jnp.float64)
    ncs = len(st.scl_E)
    # chunk so the [S, N, C] f64 design stays ~200MB
    S_max = max(1, int(2.0e8 / max(1, 8 * N * C)))

    for c0 in range(0, len(idx), S_max):
        chunk = list(idx[c0 : c0 + S_max])
        real_S = len(chunk)
        # pad to 64-wide shape buckets: eligible-SNP counts vary per
        # block and each distinct S would recompile the IRLS kernels
        S_pad = min(S_max, -(-real_S // 64) * 64)
        if real_S < S_pad:
            chunk = chunk + [chunk[-1]] * (S_pad - real_S)
        S = len(chunk)
        g = jnp.asarray(G_np[chunk])  # [S, N]
        # batched residualize_matrix (orthonormal covariate basis)
        gres = g - (g @ cov_j) @ cov_j.T
        scf_g = np.asarray(
            jnp.sqrt((gres**2).sum(axis=1)) / np.sqrt(denom))
        iMat = E_j[None, :, :] * g[:, :, None]  # [S, N, K]
        bsk = jnp.einsum("snk,nc->skc", iMat, cov_j)
        ires = iMat - jnp.einsum("nc,skc->snk", cov_j, bsk)
        scf_i = np.asarray(
            jnp.sqrt((ires**2).sum(axis=1)) / np.sqrt(denom))
        skip_s = (scf_g < params.numtol) | (scf_i.min(axis=1) < params.numtol)
        H = jnp.concatenate(
            [jnp.broadcast_to(Er_j, (S, N, Ke)),
             (gres / jnp.maximum(jnp.asarray(scf_g), 1e-300)[:, None])[:, :, None],
             ires / jnp.maximum(jnp.asarray(scf_i), 1e-300)[:, None, :]],
            axis=2,
        )
        bsign = np.where(flipped[chunk], -1.0, 1.0)

        beta_o = np.full((S, P, T), -1.0)
        se_o = np.full((S, P, T), -1.0)
        tstat = np.full((S, P, T), -1.0)
        lp = np.full((S, P, T), -1.0)
        emit = np.zeros((S, P), bool)
        scalar_ph = []  # traits with Firth fallbacks -> per-SNP writes
        H_np = None
        per_ph = {}
        for ph in range(P):
            if not pd.pheno_pass[ph] or writers[ph] is None:
                continue
            y_j = jnp.asarray(pd.phenotypes_raw[:, ph], jnp.float64)
            maskf = pd.masked_indivs[:, ph].astype(np.float64)
            mf_j = jnp.asarray(maskf)
            off_j = jnp.asarray(bt.eta_null[:, ph], jnp.float64)
            b1, o1 = run_t(H, y_j, off_j, mf_j)
            ok = np.asarray(o1)
            beta = np.asarray(b1)
            if (~ok).any():
                b2, o2 = run_f(H, y_j, off_j, mf_j)
                ok2 = np.asarray(o2)
                beta = np.where(ok[:, None], beta, np.asarray(b2))
                ok = ok | ok2
            beta_j = jnp.asarray(beta)
            eta = off_j + jnp.einsum("snc,sc->sn", H, beta_j)
            pi = _pvec_jnp(eta)
            w = jnp.where(jnp.asarray(maskf > 0), pi * (1.0 - pi), 0.0)
            A = jnp.einsum("snc,sn,snd->scd", H, w, H)
            D, V = jnp.linalg.eigh(A)
            Dmin = np.asarray(D.min(axis=1))
            Vmat = jnp.einsum("sik,sk,sjk->sij", V, 1.0 / D, V)
            Vm = np.asarray(Vmat)
            dg = np.einsum("sjj->sj", Vm)
            tb = beta**2 / dg
            lp_w = chisq_neglog10(tb[:, beg : beg + np_])
            mac_b = (np.asarray(result.mac_t)[chunk, ph]
                     if result.mac_t is not None else np.full(S, np.inf))
            use_rob = np.full(S, bool(params.force_robust))
            if not params.no_robust:
                use_rob |= (mac_b > params.rare_mac_inter) & (
                    lp_w > lpbase).any(axis=1)
            bad = np.zeros(S, bool)
            Vfin = Vm
            if use_rob.any():
                WX = H * jnp.sqrt(w)[:, :, None]
                hvec = jnp.einsum("snc,scd,snd->sn", WX, Vmat, WX)
                r = jnp.where(jnp.asarray(maskf > 0),
                              (y_j - pi) / (1.0 - hvec), 0.0)
                Vr = jnp.einsum("snc,sn,snd->scd", H, r**2, H)
                VmR = np.asarray(Vmat @ Vr @ Vmat)
                dgR = np.einsum("sjj->sj", VmR)
                bad = use_rob & (dgR.min(axis=1) < 0)
                Vfin = np.where(use_rob[:, None, None], VmR, Vm)
                dg = np.where(use_rob[:, None], dgR, dg)
            bhat = beta * bsign[:, None]
            firth_m = np.zeros(S, bool)
            if params.firth:
                tf = np.abs(beta[:, beg + 1 : beg + 1 + K] ** 2
                            / dg[:, beg + 1 : beg + 1 + K])
                firth_m = (chisq_neglog10(tf) >= lpfirth).any(axis=1)
            usable = (ok & ~skip_s & (Dmin >= params.numtol) & ~bad
                      & ~np.asarray(result.ignored_trait)[chunk, ph])
            usable[real_S:] = False  # padded rows
            per_ph[ph] = (bhat, Vfin, dg, usable, firth_m)
            if (usable & firth_m).any():
                scalar_ph.append(ph)
                continue
            rows_ok = usable & ~firth_m
            if not rows_ok.any():
                continue
            emit[:, ph] = rows_ok
            # per-row scales: E mains 1/scl_E, G 1/scf_g, inter 1/scf_i
            for t in range(T):
                j = term[t]
                if j < 0:
                    continue
                if j < beg:
                    scl = np.full(S, 1.0 / st.scl_E[min(t, ncs - 1)])
                elif j == beg:
                    scl = 1.0 / scf_g
                else:
                    scl = 1.0 / scf_i[:, j - (beg + 1)]
                tt = bhat[:, j] ** 2 / dg[:, j]
                tstat[:, ph, t] = tt
                lp[:, ph, t] = chisq_neglog10(tt)
                beta_o[:, ph, t] = bhat[:, j] * scl
                se_o[:, ph, t] = np.sqrt(dg[:, j]) * scl
            if K > 1:
                sub = Vfin[:, beg + 1 : beg + 1 + K, beg + 1 : beg + 1 + K]
                bi = bhat[:, beg + 1 : beg + 1 + K]
                tt = np.abs(np.einsum(
                    "sk,skl,sl->s", bi, np.linalg.inv(sub), bi))
                tstat[:, ph, T - 2] = tt
                lp[:, ph, T - 2] = chisq_neglog10_df(tt, K)
            sub = Vfin[:, beg : beg + 1 + K, beg : beg + 1 + K]
            bj = bhat[:, beg : beg + 1 + K]
            tt = np.abs(np.einsum(
                "sk,skl,sl->s", bj, np.linalg.inv(sub), bj))
            tstat[:, ph, T - 1] = tt
            lp[:, ph, T - 1] = chisq_neglog10_df(tt, 1 + K)

        if emit.any():
            if not _render_int_rows(params, eng, writers, bsnps, chunk,
                                    emit, tests, beta_o, se_o, tstat, lp,
                                    result):
                return False
        for ph in scalar_ph:
            # exact row interleaving: per-SNP writes for traits with
            # Firth LRT fallback rows (batched fit results reused)
            bhat, Vfin, dg, usable, firth_m = per_ph[ph]
            if H_np is None:
                H_np = np.asarray(H)
            y = pd.phenotypes_raw[:, ph]
            mask = pd.masked_indivs[:, ph]
            for si in range(S):
                if not usable[si]:
                    continue
                b = chunk[si]
                if firth_m[si]:
                    _bt_firth_rows(params, eng, writers, bsnps[b], b, ph,
                                   H_np[si], y, mask, beg, K, scf_g[si],
                                   scf_i[si], result, test_name,
                                   float(bsign[si]))
                else:
                    _write_int_rows(params, eng, writers, bsnps[b], b, ph,
                                    bhat[si], Vfin[si], beg, K,
                                    1.0 / scf_g[si], 1.0 / scf_i[si],
                                    1.0 / st.scl_E, result, test_name)
    return True


def _test_snp_bt(params, eng, snp, b, g_raw, result, writers, test_name):
    """BT interaction tests: full logistic refit of [E, G, GxE] with the
    null eta as offset, model-based or HC3-robust covariance, Firth LRT
    fallback for significant interactions (apply_interaction_tests_bt,
    Interaction.cpp:441-664)."""
    from .glm import fit_logistic_irls, get_pvec

    st, pd, bt = eng.interaction, eng.pd, eng.bt_state
    K = params.ncov_interaction
    beg = params.interaction_istart
    np_ = 1 + K
    flipped = bool(getattr(eng, "last_flipped", np.zeros(1, dtype=bool))[b])

    g_res, scale_g = residualize_matrix(
        g_raw[:, None], pd.new_cov, params.n_analyzed, params.numtol
    )
    if g_res is None:
        return
    iMat = st.E * g_raw[:, None]
    iMat_res, scf_i = residualize_matrix(iMat, pd.new_cov, params.n_analyzed, params.numtol)
    if iMat_res is None:
        return
    H = np.column_stack([st.E_res, g_res[:, 0], iMat_res])
    lpfirth = -np.log10(params.alpha_pvalue)
    lpbase = -np.log10(0.05)
    bsign = -1.0 if flipped else 1.0

    for ph in range(params.n_pheno):
        if not pd.pheno_pass[ph] or result.ignored_trait[b, ph] or writers[ph] is None:
            continue
        y = pd.phenotypes_raw[:, ph]
        mask = pd.masked_indivs[:, ph]
        offset = bt.eta_null[:, ph]

        beta, ok = fit_logistic_irls(
            y, H, offset, mask, params.niter_max, params.numtol, True
        )
        if not ok:
            beta, ok = fit_logistic_irls(
                y, H, offset, mask, params.niter_max, params.numtol, False
            )
        if not ok:
            continue
        pi = get_pvec(offset + H @ beta)
        w = np.where(mask, pi * (1 - pi), 0.0)
        WX = H * np.sqrt(w)[:, None]
        D, V = np.linalg.eigh(WX.T @ WX)
        if D.min() < params.numtol:
            continue
        Vmat = (V / D[None, :]) @ V.T

        # robust sandwich when a main/interaction effect is significant
        # and the variant is not too rare (Interaction.cpp:506-521)
        mac_b = result.mac_t[b, ph] if result.mac_t is not None else np.inf
        use_robust = params.force_robust
        if not params.no_robust and mac_b > params.rare_mac_inter:
            for j in range(beg, beg + np_):
                t = beta[j] ** 2 / Vmat[j, j]
                if chisq_neglog10(np.array([t]))[0] > lpbase:
                    use_robust = True
        if use_robust:
            hvec = ((WX @ Vmat) * WX).sum(axis=1)
            r = np.where(mask, (y - pi) / (1 - hvec), 0.0)
            Vr = H.T @ (H * (r**2)[:, None])
            Vmat = Vmat @ Vr @ Vmat
            if np.diag(Vmat).min() < 0:
                continue
        bhat = beta * bsign

        # Firth gate: any interaction Wald p below alpha threshold
        use_firth = False
        if params.firth:
            for j in range(beg + 1, beg + 1 + K):
                t = abs(beta[j] ** 2 / Vmat[j, j])
                if chisq_neglog10(np.array([t]))[0] >= lpfirth:
                    use_firth = True
        if use_firth:
            _bt_firth_rows(params, eng, writers, snp, b, ph, H, y, mask,
                           beg, K, scale_g[0], scf_i, result, test_name, bsign)
            continue

        gscale = 1.0 / scale_g[0]
        iscale = 1.0 / scf_i
        cscale = 1.0 / st.scl_E
        _write_int_rows(params, eng, writers, snp, b, ph, bhat, Vmat, beg, K,
                        gscale, iscale, cscale, result, test_name)


def _bt_firth_rows(params, eng, writers, snp, b, ph, H, y, mask, beg, K,
                   scale_g, scf_i, result, test_name, bsign):
    """Firth LRT fallback (apply_interaction_tests_firth,
    Interaction.cpp:664-864): full fit + one reduced fit per test."""
    from ..io.output import sumstat_line_single
    from . import firth as firth_mod

    st, pd, bt = eng.interaction, eng.pd, eng.bt_state
    np_ = 1 + K
    ncols = H.shape[1]
    offset = (
        bt.firth_offset[:, ph] if params.firth_approx else bt.eta_null[:, ph]
    )

    # full model
    beta_f, se_f, dev, dev0, okf = firth_mod.fit_firth_multi(
        y, H, offset, mask, None, None, params.maxstep,
        params.niter_max_firth, 2.5e-4, comp_lrt=True,
    )
    if not okf:
        return

    def reduced_drop(j, warm):
        """LRT fit excluding column j (swap-to-last trick,
        Interaction.cpp:769-780): penalty keeps all columns."""
        order = [c for c in range(ncols) if c != j] + [j]
        b0 = warm[order].copy()
        b0[-1] = 0.0
        _b, _s, dev_s, _d0, ok = firth_mod.fit_firth_multi(
            y, H[:, order], offset, mask, b0, ncols - 1, params.maxstep,
            params.niter_max_firth, 2.5e-4,
        )
        return dev_s, ok

    rows = []
    evar = st.evar_name
    # E main effects (betas from the full fit, no p-value)
    for j in range(beg):
        if st.is_cat:
            sfx = f"-INT_{evar}={st.lvl_names[j]}"
        elif params.int_add_esq and j != 0:
            sfx = f"-INT_{evar}^2"  # E^2 main effect (Interaction.cpp:738)
        else:
            sfx = f"-INT_{evar}"
        rows.append((sfx, beta_f[j] / st.scl_E[j], se_f[j] / st.scl_E[j], -1.0, -1.0))

    # joint (1+K df): null = E-only (or penalized dev at 0 when beg==0)
    if beg > 0:
        _b, _s, dev_j, _d0, okj = firth_mod.fit_firth_multi(
            y, H, offset, mask, None, beg, params.maxstep_null,
            params.niter_max_firth_null, 2.5e-4,
        )
        t_joint = (dev_j - dev) if okj else -1.0
    else:
        t_joint = dev0 - dev
    joint_row = None
    if t_joint >= 0:
        lp = float(chisq_neglog10_df(np.array([t_joint]), np_)[0])
        joint_row = (f"-INT_{np_}DF", None, None, t_joint, lp)

    # marginal G LRT
    dev_m, okm = reduced_drop(beg, beta_f)
    if not okm:
        return
    t = dev_m - dev
    if t < 0:
        return
    se_val = abs(beta_f[beg]) / np.sqrt(t) if (params.firth_se and t > 0) else se_f[beg]
    lp = float(chisq_neglog10(np.array([t]))[0])
    rows.append(("-INT_SNP", bsign * beta_f[beg] / scale_g, se_val / scale_g, t, lp))

    if K > 1:
        for j in range(K):
            jj = beg + 1 + j
            rows.append((f"-INT_SNPx{evar}={st.lvl_names[j]}",
                         bsign * beta_f[jj] / scf_i[j], se_f[jj] / scf_i[j],
                         -1.0, -1.0))
        b0 = beta_f.copy()
        b0[beg + 1 :] = 0.0
        _b, _s, dev_i, _d0, oki = firth_mod.fit_firth_multi(
            y, H, offset, mask, b0, beg + 1, params.maxstep,
            params.niter_max_firth, 2.5e-4,
        )
        if not oki:
            return
        t = dev_i - dev
        if t < 0:
            return
        lp = float(chisq_neglog10_df(np.array([t]), np_ - 1)[0])
        rows.append((f"-INT_SNPx{evar}", None, None, t, lp))
    else:
        dev_i, oki = reduced_drop(ncols - 1, beta_f)
        if not oki:
            return
        t = dev_i - dev
        if t < 0:
            return
        jj = beg + 1
        se_val = abs(beta_f[jj]) / np.sqrt(t) if (params.firth_se and t > 0) else se_f[jj]
        lp = float(chisq_neglog10(np.array([t]))[0])
        sfx = f"-INT_SNPx{evar}" + (f"={st.lvl_names[0]}" if st.is_cat else "")
        rows.append((sfx, bsign * beta_f[jj] / scf_i[0], se_val / scf_i[0], t, lp))
    if joint_row is not None:
        rows.append(joint_row)

    for sfx, beta, se, chisq, lp in rows:
        writers[ph].write(
            sumstat_line_single(
                params, snp, test_name + sfx,
                result.af_t[b, ph],
                (result.info_t[b, ph] if result.info_t is not None else 1.0)
                if params.dosage_mode else None,
                int(result.ns_t[b, ph]),
                beta if beta is not None else -1.0,
                se if se is not None else -1.0,
                chisq, lp, True,
            )
        )


def _int_row_templates(params, st, beg, K, test_name):
    """The fixed per-SNP row-template list of _write_int_rows:
    (term indices, TEST strings). term -1 = K-df joint, -2 = (1+K)-df
    joint. None when a TEST string exceeds the native byte budget."""
    evar = st.evar_name
    sfx, term = [], []
    for j in range(beg):
        if st.is_cat:
            sfx.append(f"-INT_{evar}={st.lvl_names[j]}")
        elif params.int_add_esq and j != 0:
            sfx.append(f"-INT_{evar}^2")
        else:
            sfx.append(f"-INT_{evar}")
        term.append(j)
    sfx.append("-INT_SNP")
    term.append(beg)
    if K > 1:
        for j in range(K):
            sfx.append(f"-INT_SNPx{evar}={st.lvl_names[j]}")
            term.append(beg + 1 + j)
        sfx.append(f"-INT_SNPx{evar}")
        term.append(-1)  # joint over the K interaction terms
    else:
        sfx.append(f"-INT_SNPx{evar}")
        term.append(beg + 1)
    sfx.append(f"-INT_{1+K}DF")
    term.append(-2)  # joint df=1+K
    tests = [test_name + s for s in sfx]
    if max(len(t) for t in tests) > 40:
        return None
    return term, tests


def _write_int_rows_block(params, eng, writers, bsnps, chunk, scf_i, Dmin,
                          Z, tau, V3, s2, V4, result, test_name, beg, K,
                          scale_fac, out=None) -> bool:
    """Columnar twin of the per-(SNP, trait) _write_int_rows loop for
    the batched robust path: row statistics vectorized over
    (SNP, trait, row-template) and rendered through the native batch
    formatter with per-row TEST strings — exact per-file row order
    (SNP-major, template-minor) and the same %g byte formatting.

    Returns False (caller falls back to the scalar loop) when the
    native formatter is unavailable or a TEST string exceeds its byte
    budget; nothing is written in that case."""
    from ..io.output import (block_prefixes, format_block_single,
                             native_formatter)

    if native_formatter("format_sumstat_single") is None:
        return False
    st, pd = eng.interaction, eng.pd
    P = params.n_pheno
    S = len(chunk)
    keep_s = ~((scf_i.min(axis=1) < params.numtol)
               | (Dmin < params.numtol))
    if not keep_s.any():
        return True
    # Vsel [S, P, nc, nc]: model-based / HC3 / HC4 per (SNP, trait),
    # mirroring the scalar selection
    nc = Z.shape[1]
    if params.no_robust:
        denom = pd.Neff - params.ncov_analyzed - nc  # [P]
        Vsel = (s2 / denom[None, :])[:, :, None, None] * Z[:, None, :, :]
    else:
        Vsel = V3
        if params.force_hc4 and V4 is not None:
            mac = (result.mac_t[chunk]
                   if result.mac_t is not None else np.full((S, P), np.inf))
            rare = mac <= params.rare_mac_inter
            Vsel = np.where(rare[:, :, None, None], V4, V3)
    diag = np.einsum("spjj->spj", Vsel)  # [S, P, nc]

    tmpl = _int_row_templates(params, st, beg, K, test_name)
    if tmpl is None:
        return False
    term, tests = tmpl
    T = len(tests)

    # scales [S, P, T] (joint rows carry the -1 NA sentinels)
    scale_Yp = np.asarray(pd.scale_Y) * np.asarray(eng.p_sd_yres)  # [P]
    sf_g = (np.asarray(scale_fac)[chunk]
            if scale_fac is not None else np.ones(S))
    beta_o = np.full((S, P, T), -1.0)
    se_o = np.full((S, P, T), -1.0)
    tstat = np.full((S, P, T), -1.0)
    lp = np.full((S, P, T), -1.0)
    ncs = len(st.scl_E)
    for t in range(T):
        j = term[t]
        if j < 0:
            continue
        if j < beg:
            scl = (scale_Yp / st.scl_E[min(t, ncs - 1)])[None, :]
        elif j == beg:
            scl = scale_Yp[None, :] / sf_g[:, None]
        else:
            scl = scale_Yp[None, :] / scf_i[:, j - (beg + 1)][:, None]
        tt = tau[:, j, :] ** 2 / diag[:, :, j]
        tstat[:, :, t] = tt
        lp[:, :, t] = chisq_neglog10(tt)
        beta_o[:, :, t] = tau[:, j, :] * scl
        se_o[:, :, t] = np.sqrt(diag[:, :, j]) * scl
    if K > 1:
        sub = Vsel[:, :, beg + 1 : beg + 1 + K, beg + 1 : beg + 1 + K]
        bi = tau[:, beg + 1 : beg + 1 + K, :].transpose(0, 2, 1)  # [S,P,K]
        tt = np.abs(np.einsum(
            "spk,spkl,spl->sp", bi, np.linalg.inv(sub), bi))
        tstat[:, :, T - 2] = tt
        lp[:, :, T - 2] = chisq_neglog10_df(tt, K)
    sub = Vsel[:, :, beg : beg + 1 + K, beg : beg + 1 + K]
    bj = tau[:, beg : beg + 1 + K, :].transpose(0, 2, 1)
    tt = np.abs(np.einsum("spk,spkl,spl->sp", bj, np.linalg.inv(sub), bj))
    tstat[:, :, T - 1] = tt
    lp[:, :, T - 1] = chisq_neglog10_df(tt, 1 + K)

    emit = keep_s[:, None] & ~np.asarray(
        result.ignored_trait[chunk][:, :P], bool)
    if out is not None:
        out["beta"][chunk] = beta_o
        out["se"][chunk] = se_o
        out["chisq"][chunk] = tstat
        out["logp"][chunk] = lp
        out["emit"][chunk] = emit
        return True
    return _render_int_rows(params, eng, writers, bsnps, chunk, emit, tests,
                            beta_o, se_o, tstat, lp, result)


def _render_int_rows(params, eng, writers, bsnps, chunk, emit, tests,
                     beta_o, se_o, tstat, lp, result) -> bool:
    """Pack + natively render precomputed interaction row stats.

    emit: [S, P] bool — which (SNP, trait) row groups to write;
    beta_o/se_o/tstat/lp: [S, P, T] (NA sentinels = -1); tests: the T
    per-template TEST strings. Rows per trait file emit SNP-major,
    template-minor (the scalar loop's order)."""
    from ..io.output import format_block_single

    pd = eng.pd
    S, P, T = beta_o.shape
    pref_seg = {}
    buf_cache = {}  # emit-column pattern -> (pb_rows, off); traits
    #                 usually share the same selected-SNP set
    tbytes = [t.encode() for t in tests]
    tseg = b"".join(tbytes)
    tlens = np.array([len(t) for t in tbytes], np.int64)

    payloads = []
    for ph in range(P):
        if not pd.pheno_pass[ph] or writers[ph] is None:
            payloads.append(None)
            continue
        sel = np.flatnonzero(emit[:, ph])
        if not len(sel):
            payloads.append("")
            continue
        nsel = len(sel)
        ckey = emit[:, ph].tobytes()
        cached = buf_cache.get(ckey)
        if cached is not None:
            pb_rows, off = cached
        else:
            buf = bytearray()
            off = np.empty(nsel * T + 1, np.int64)
            off[0] = 0
            k = 0
            for si in sel:
                seg = pref_seg.get(si)
                if seg is None:
                    s = bsnps[chunk[si]]
                    seg = (f"{s.chrom} {s.physpos} {s.ID} "
                           f"{s.allele1} {s.allele2}").encode()
                    pref_seg[si] = seg
                for _ in range(T):
                    buf += seg
                    k += 1
                    off[k] = len(buf)
            pb_rows = np.frombuffer(bytes(buf), np.uint8)
            buf_cache[ckey] = (pb_rows, off)
        toff = np.zeros(nsel * T + 1, np.int64)
        toff[1:] = np.tile(tlens, nsel).cumsum()
        af_r = np.repeat(result.af_t[chunk][sel, ph], T)
        n_r = np.repeat(result.ns_t[chunk][sel, ph], T)
        if params.dosage_mode:
            iv = (result.info_t[chunk][sel, ph]
                  if result.info_t is not None else np.ones(nsel))
            info_r = np.repeat(iv, T)
        else:
            info_r = None
        payload = format_block_single(
            params, pb_rows, off, "",
            skip=np.zeros(nsel * T, np.uint8),
            af=af_r, info=info_r, n=n_r,
            beta=beta_o[sel, ph, :].reshape(-1),
            se=se_o[sel, ph, :].reshape(-1),
            chisq=tstat[sel, ph, :].reshape(-1),
            logp=lp[sel, ph, :].reshape(-1),
            test_fail=np.zeros(nsel * T, np.uint8),
            tests=(np.frombuffer(tseg * nsel, np.uint8), toff),
        )
        if payload is None:
            return False
        payloads.append(payload)
    for ph, payload in enumerate(payloads):
        if payload:
            writers[ph].write(payload)
    return True


def _write_int_rows(params, eng, writers, snp, b, ph, bhat, Vmat, beg, K,
                    gscale, iscale, cscale, result, test_name):
    from ..io.output import sumstat_line_single

    pd = eng.pd
    iscale = np.atleast_1d(iscale)
    cscale = np.atleast_1d(cscale)

    # --print-vcov: coefficient covariance on the output scale
    # (apply_interaction_tests_*, Interaction.cpp:604-615)
    if params.print_vcov:
        sc = np.concatenate([
            np.broadcast_to(cscale, (beg,)), [np.atleast_1d(gscale)[0]],
            np.broadcast_to(iscale, (K,)),
        ])
        Vout = Vmat[: beg + 1 + K, : beg + 1 + K] * sc[:, None] * sc[None, :]
        path = (f"{params.out_prefix}_{pd.pheno_names[ph]}_"
                f"{eng.interaction.evar_name}_{snp.ID}.vcov")
        with open(path, "w") as fh:
            for row in Vout:
                fh.write(" ".join(f"{v:.6g}" for v in row) + "\n")
    rows = []
    evar = eng.interaction.evar_name
    # main effect(s) of E
    for j in range(beg):
        t = bhat[j] ** 2 / Vmat[j, j]
        se = np.sqrt(Vmat[j, j]) * cscale[min(j, len(cscale) - 1)]
        lp = float(chisq_neglog10(np.array([t]))[0])
        if eng.interaction.is_cat:
            sfx = f"-INT_{evar}={eng.interaction.lvl_names[j]}"
        elif params.int_add_esq and j != 0:
            sfx = f"-INT_{evar}^2"  # E^2 main effect (Interaction.cpp:624)
        else:
            sfx = f"-INT_{evar}"
        rows.append((sfx, bhat[j] * cscale[min(j, len(cscale) - 1)], se, t, lp))
    # marginal G
    t = bhat[beg] ** 2 / Vmat[beg, beg]
    se = np.sqrt(Vmat[beg, beg]) * gscale
    rows.append(("-INT_SNP", bhat[beg] * gscale, se, t,
                 float(chisq_neglog10(np.array([t]))[0])))
    # interaction terms
    if K > 1:
        for j in range(K):
            jj = beg + 1 + j
            t = bhat[jj] ** 2 / Vmat[jj, jj]
            se = np.sqrt(Vmat[jj, jj]) * iscale[j]
            rows.append((f"-INT_SNPx{evar}={eng.interaction.lvl_names[j]}",
                         bhat[jj] * iscale[j], se, t,
                         float(chisq_neglog10(np.array([t]))[0])))
        Vinv = np.linalg.inv(Vmat[beg + 1 :, beg + 1 :][:K, :K])
        bi = bhat[beg + 1 : beg + 1 + K]
        t = abs(bi @ Vinv @ bi)
        lp = float(chisq_neglog10_df(np.array([t]), K)[0])
        rows.append((f"-INT_SNPx{evar}", None, None, t, lp))
    else:
        jj = beg + 1
        t = bhat[jj] ** 2 / Vmat[jj, jj]
        se = np.sqrt(Vmat[jj, jj]) * iscale[0]
        rows.append((f"-INT_SNPx{evar}", bhat[jj] * iscale[0], se, t,
                     float(chisq_neglog10(np.array([t]))[0])))
    # joint df=1+K
    sub = Vmat[beg : beg + 1 + K, beg : beg + 1 + K]
    Vinv = np.linalg.inv(sub)
    bj = bhat[beg : beg + 1 + K]
    t = abs(bj @ Vinv @ bj)
    lp = float(chisq_neglog10_df(np.array([t]), 1 + K)[0])
    rows.append((f"-INT_{1+K}DF", None, None, t, lp))

    for sfx, beta, se, chisq, lp in rows:
        writers[ph].write(
            sumstat_line_single(
                params, snp, test_name + sfx,
                result.af_t[b, ph],
                (result.info_t[b, ph] if result.info_t is not None else 1.0)
                if params.dosage_mode else None,
                int(result.ns_t[b, ph]),
                beta if beta is not None else -1.0,
                se if se is not None else -1.0,
                chisq, lp, True,
            )
        )
