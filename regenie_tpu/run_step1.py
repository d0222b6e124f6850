"""Step 1 orchestrator: whole-genome block ridge -> LOCO predictions.

Replaces the reference's Data::run_step1 (Data.cpp:95-133),
level_0_calculations (:594), ridge_level_1* (Step1_Models.cpp:772+) and
output/make_predictions/write_predictions (Data.cpp:956-1930).
"""

from __future__ import annotations

import os
import time
from typing import Dict, List

import jax.numpy as jnp
import numpy as np

from .config import BT, CT, QT, Params, ridge_h2_grid
from .io.files import open_write
from .io.geno import GenoData, make_blocks
from .io.pheno import PhenoData
from .models import step1 as m1
from .models import glm
from .ops.geno_ops import prepare_block_step1
from .prep import RunData, fmt, prepare
from .utils.dtypes import enable_x64_if_cpu


def run_step1(params: Params, log=print) -> None:
    enable_x64_if_cpu()
    params.test_mode = False
    rd = prepare(params)
    gd, pd = rd.geno, rd.pheno

    if params.n_variants > 1_000_000 and not params.force_step1:
        raise ValueError(
            "too many variants for step 1 (> 1M); use --force-step1 to override"
        )

    blocks = make_blocks(gd, params.block_size)
    params.total_n_block = len(blocks)

    # BT small-sample check: force LOOCV below 5000 samples (Data.cpp:353)
    if params.trait_mode == BT and not params.use_loocv and params.n_analyzed < 5000:
        log("   -WARNING: sample size below 5,000: using LOOCV instead of K-fold CV.")
        params.use_loocv = True

    # ridge penalty grids (Regenie.cpp:1497, Data.cpp:607, Step1_Models.cpp:2099)
    h_l0 = params.user_lambda if params.user_lambda is not None else ridge_h2_grid(params.n_ridge_l0)
    lambdas = params.n_variants * (1.0 - h_l0) / h_l0
    h_l1 = params.user_tau if params.user_tau is not None else ridge_h2_grid(params.n_ridge_l1)
    n_l0_feats = params.total_n_block * params.n_ridge_l0
    taus = n_l0_feats * (1.0 - h_l1) / h_l1
    if params.trait_mode == BT:
        taus = taus * 3.0 / (np.pi**2)

    log(f" * block size: [{params.block_size}]")
    log(f" * # blocks: [{params.total_n_block}] for {params.n_variants} variants")
    log(f" * # CV folds: [{params.n_analyzed if params.use_loocv else params.cv_folds}]")
    log(f" * ridge data_l0: [ {params.n_ridge_l0} : " + " ".join(fmt(x) for x in h_l0) + " ]")
    log(f" * ridge data_l1: [ {params.n_ridge_l1} : " + " ".join(fmt(x) for x in h_l1) + " ]")

    # null model offsets for non-QT traits (fit_null_models, Step1_Models.cpp:54+)
    offsets = None
    if params.trait_mode != QT:
        offsets = glm.fit_null_offsets(params, pd)

    # ---- level 0 ----
    J, P, N = params.n_ridge_l0, params.n_pheno, params.n_samples
    ind = pd.ind_in_analysis
    maskf = pd.masked_indivs.astype(np.float64)
    lambdas_j = jnp.asarray(lambdas)
    Neff_j = jnp.asarray(pd.Neff)

    if params.use_loocv:
        W_all = np.zeros((N, params.total_n_block * J, P), dtype=np.float64)
    else:
        fold_sizes = m1.compute_fold_sizes(ind, params.cv_folds)
        Y_folds, valid = m1.pad_folds(pd.phenotypes, fold_sizes)
        mask_folds, _ = m1.pad_folds(maskf, fold_sizes)
        Y_folds_j = jnp.asarray(Y_folds)
        mask_folds_j = jnp.asarray(mask_folds)
        valid_j = jnp.asarray(valid.astype(np.float64))
        K = params.cv_folds
        nmax = int(fold_sizes.max())
        W_all = np.zeros((K, nmax, params.total_n_block * J, P), dtype=np.float64)

    ind_j = jnp.asarray(ind)
    cov_j = jnp.asarray(pd.new_cov)
    Y_j = jnp.asarray(pd.phenotypes)
    scale_denom = float(params.n_analyzed - params.ncov)
    chr_nblocks: Dict[int, int] = {}

    t0 = time.time()
    for bidx, (chrom, bsnps) in enumerate(blocks):
        chr_nblocks[chrom] = chr_nblocks.get(chrom, 0) + 1
        G_raw = gd.read_block(bsnps)  # [B, N] int8
        G = prepare_block_step1(jnp.asarray(G_raw), ind_j)
        G, scale_G = m1.residualize_geno_block(G, cov_j, scale_denom)
        if not np.all(np.asarray(scale_G) > params.numtol):
            bad = bsnps[int(np.argmin(np.asarray(scale_G)))].ID
            raise ValueError(f"SNP {bad} has low variance in step 1 block")
        if params.use_loocv:
            Wb = m1.level0_loocv_block(G, Y_j, jnp.asarray(maskf), lambdas_j, Neff_j)
            W_all[:, bidx * J : (bidx + 1) * J, :] = np.asarray(Wb)
        else:
            Gf, _ = m1.pad_folds(np.asarray(G), fold_sizes, axis=1)
            Wb = m1.level0_kfold_block(
                jnp.asarray(Gf), Y_folds_j, mask_folds_j, valid_j, lambdas_j, Neff_j
            )
            W_all[:, :, bidx * J : (bidx + 1) * J, :] = np.asarray(Wb)
    log(f" * level 0 done ({time.time()-t0:.1f}s, {len(blocks)} blocks)")

    # ---- level 1 + outputs ----
    pred_list_path = params.out_prefix + "_pred.list"
    loco_written: List[str] = []

    # per-chromosome feature spans in W (chromosome order = file order)
    chr_order = [c for c in gd.chr_read if chr_nblocks.get(c, 0) > 0]
    spans = {}
    ctr = 0
    for c in chr_order:
        nn = chr_nblocks[c] * J
        spans[c] = (ctr, nn)
        ctr += nn

    sample_ids = [s.key for s in gd.samples]
    order = sorted(range(N), key=lambda i: sample_ids[i])
    id_order = [i for i in order if ind[i]]
    header = "FID_IID " + " ".join(sample_ids[i] for i in id_order) + " \n"

    taus_j = jnp.asarray(taus)
    t0 = time.time()
    with open_write(pred_list_path) as plist:
        for ph in range(P):
            name = pd.pheno_names[ph]
            loco_path = params.out_prefix + f"_{ph+1}.loco" + (".gz" if params.gz_out else "")
            log(f"phenotype {ph+1} ({name}):")

            if params.trait_mode == QT:
                if params.use_loocv:
                    cumsum = np.asarray(
                        m1.level1_linear_loocv(
                            jnp.asarray(W_all[:, :, ph]), Y_j[:, ph], taus_j,
                            float(pd.Neff[ph] - params.ncov),
                        )
                    )
                    best = m1.select_best_tau_qt(cumsum, pd.Neff[ph])
                    _log_tau_table(log, params, h_l1, cumsum, best, pd.Neff[ph])
                    b0 = np.asarray(
                        m1.level1_linear_full_fit_loocv(
                            jnp.asarray(W_all[:, :, ph]), Y_j[:, ph], float(taus[best])
                        )
                    )  # [F, N]
                    # per-chrom predictions with per-sample LOO betas
                    predictions = np.zeros((N, len(chr_order)))
                    for ci, c in enumerate(chr_order):
                        st, nn = spans[c]
                        predictions[:, ci] = np.einsum(
                            "nf,fn->n", W_all[:, st : st + nn, ph], b0[st : st + nn, :]
                        )
                else:
                    Wph = jnp.asarray(W_all[:, :, :, ph])
                    Yf = Y_folds_j[:, :, ph]
                    beta, cumsum = m1.level1_linear_kfold(Wph, Yf, valid_j, taus_j)
                    beta, cumsum = np.asarray(beta), np.asarray(cumsum)
                    best = m1.select_best_tau_qt(cumsum, pd.Neff[ph])
                    _log_tau_table(log, params, h_l1, cumsum, best, pd.Neff[ph])
                    # per-chrom predictions per fold (make_predictions, Data.cpp:1239)
                    predictions = np.zeros((N, len(chr_order)))
                    bounds = np.concatenate([[0], np.cumsum(fold_sizes)])
                    for k in range(params.cv_folds):
                        rows = slice(bounds[k], bounds[k + 1])
                        nk = int(fold_sizes[k])
                        for ci, c in enumerate(chr_order):
                            st, nn = spans[c]
                            predictions[rows, ci] = (
                                W_all[k, :nk, st : st + nn, ph] @ beta[k, best, st : st + nn]
                            )
            else:
                predictions, converged = glm.level1_nonqt(
                    params, pd, W_all, offsets, taus, ph, chr_order, spans,
                    None if params.use_loocv else fold_sizes, log,
                )
                if not converged:
                    log("Level 1 model did not converge. LOCO predictions skipped.")
                    continue

            # LOCO: total PRS minus each chromosome's contribution
            total = predictions.sum(axis=1)
            _write_loco(
                loco_path, header, params, pd, ph, predictions, total, chr_order, id_order
            )
            plist.write(f"{name} {os.path.abspath(loco_path)}\n")
            loco_written.append(loco_path)
            log(f"  wrote {loco_path}")
    log(f" * level 1 + predictions done ({time.time()-t0:.1f}s)")
    log(f"List of blup files written to: [{pred_list_path}]")


def _log_tau_table(log, params: Params, h_l1, cumsum, best, neff):
    rsq = m1.cv_rsq(cumsum, neff)
    sse = (cumsum[2] + cumsum[3] - 2 * cumsum[4]) / neff
    for j in range(len(h_l1)):
        line = f"  {fmt(h_l1[j]):>5} : Rsq = {fmt(rsq[j])}, MSE = {fmt(sse[j])}"
        if j == best:
            line += "<- min value"
        log(line)


def _write_loco(path, header, params: Params, pd: PhenoData, ph, predictions, total, chr_order, id_order):
    """Write per-chromosome LOCO predictions (write_predictions, Data.cpp:1795)."""
    mask = pd.masked_indivs[:, ph]
    with open_write(path, gz=params.gz_out) as fh:
        fh.write(header)
        chr_idx = {c: i for i, c in enumerate(chr_order)}
        for chrom in range(1, params.n_chrom + 1):
            vals = total.copy()
            if chrom in chr_idx:
                vals = vals - predictions[:, chr_idx[chrom]]
            row = [str(chrom)]
            for i in id_order:
                row.append(fmt(vals[i]) if mask[i] else "NA")
            fh.write(" ".join(row) + " \n")
