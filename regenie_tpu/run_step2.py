"""Step 2 orchestrator: per-chromosome LOCO residuals + block score tests.

Replaces the reference's Data::test_snps_fast (Data.cpp:2230),
compute_res* (:2386-2475), analyze_block/compute_tests_mt (:2363-2551)
and the .regenie writers. The per-SNP OpenMP loop becomes whole-block
batched device computation.
"""

from __future__ import annotations

import time
from typing import Dict, List, Optional, Tuple

import jax.numpy as jnp
import numpy as np

from .config import BT, CT, QT, T2E, MISSING, Params
from .io.files import iter_lines, open_read, open_write, string_split
from .io.geno import make_blocks
from .io.output import header_single, sumstat_line_single
from .models import step2 as m2
from .ops.geno_ops import snp_stats_block, finalize_block_step2
from .prep import fmt, prepare
from .utils.dtypes import enable_x64_if_cpu
from .utils.stats import chisq_neglog10


def read_pred_list(path: str) -> Dict[str, str]:
    """_pred.list: 'phenoname locopath' per line (check_blup, Pheno.cpp:1204)."""
    out = {}
    for toks in iter_lines(path):
        if len(toks) != 2:
            raise ValueError("wrongly formatted blup list file")
        if toks[0] in out:
            raise ValueError(f"phenotype '{toks[0]}' appears twice in blup list")
        out[toks[0]] = toks[1]
    return out


def read_loco_chr(
    path: str, chrom: int, id_to_ind: Dict[str, int], n_samples: int,
    mask: np.ndarray,
) -> np.ndarray:
    """Read one chromosome row from a .loco file (blup_read_chr,
    Step2_Models.cpp:51-150). Returns [N] blup vector (0 where masked)."""
    blup = np.zeros(n_samples)
    with open_read(path) as fh:
        header = string_split(fh.readline())
        if header[0] != "FID_IID":
            raise ValueError("header of blup file must start with FID_IID")
        for _ in range(chrom - 1):
            fh.readline()
        toks = string_split(fh.readline())
        if len(toks) != len(header):
            raise ValueError("blup file row length mismatch")
        if int(toks[0]) != chrom:
            raise ValueError(f"blup file row starts with {toks[0]} instead of {chrom}")
        for col in range(1, len(header)):
            key = header[col]
            if key not in id_to_ind:
                continue
            idx = id_to_ind[key]
            if not mask[idx]:
                continue
            v = toks[col]
            if v == "NA":
                raise ValueError(
                    f"individual {key} has missing predictions for chr {chrom}"
                )
            blup[idx] = float(v)
    return blup


def mask_samples_missing_loco(params, pd, blup_files, id_to_ind):
    """Mask samples absent (or NA) in each trait's .loco file
    (blup_read, Pheno.cpp:1241-1330)."""
    for ph, name in enumerate(pd.pheno_names):
        path = blup_files[name]
        with open_read(path) as fh:
            header = string_split(fh.readline())
            vals = string_split(fh.readline())
        present = np.zeros(params.n_samples, dtype=bool)
        for col in range(1, len(header)):
            key = header[col]
            if key in id_to_ind and vals[col] != "NA":
                present[id_to_ind[key]] = True
        n_prior = pd.masked_indivs[:, ph].sum()
        pd.masked_indivs[:, ph] &= present
        n_post = pd.masked_indivs[:, ph].sum()
        if n_post < 1:
            pd.pheno_pass[ph] = False


def run_step2(params: Params, log=print) -> None:
    enable_x64_if_cpu()
    params.test_mode = True

    blup_files = None
    blup_names = None
    if not params.skip_blups:
        blup_files = read_pred_list(params.pred_list)
        blup_names = list(blup_files.keys())

    rd = prepare(params, blup_pheno_names=blup_names)
    gd, pd = rd.geno, rd.pheno
    N, P = params.n_samples, params.n_pheno

    id_to_ind = {s.key: i for i, s in enumerate(gd.samples)}
    if blup_files is not None:
        mask_samples_missing_loco(params, pd, blup_files, id_to_ind)
        pd.Neff = pd.masked_indivs.sum(axis=0).astype(np.float64)

    blocks = make_blocks(gd, params.block_size)
    params.total_n_block = len(blocks)
    log(f" * # threads: [jax/{params.threads or 'auto'}]")
    log(f" * block size: [{params.block_size}]")
    log(f" * # blocks: [{params.total_n_block}]")
    log(f" * # tested variants: [{params.n_variants}]")

    # output files (setup_output; split by pheno is the reference default)
    test_name = {0: "ADD", 1: "DOM", 2: "REC"}[params.test_type]
    writers = []
    out_paths = []
    if params.split_by_pheno:
        for ph in range(P):
            path = f"{params.out_prefix}_{pd.pheno_names[ph]}.regenie"
            if params.gz_out:
                path += ".gz"
            fh = open_write(path, gz=params.gz_out)
            fh.write(header_single(params))
            writers.append(fh)
            out_paths.append(path)
    else:
        raise NotImplementedError("--no-split merged output not yet implemented")

    ind_j = jnp.asarray(pd.ind_in_analysis)
    cov_j = jnp.asarray(pd.new_cov)
    maskf = pd.masked_indivs.astype(np.float64)
    maskf_j = jnp.asarray(maskf)
    strict = bool(params.strict_mode)
    scale_denom = float(params.n_analyzed - params.ncov)

    n_ignored = 0
    n_corrected = 0
    n_failed = 0
    t0 = time.time()

    # group blocks by chromosome preserving order
    from .models import glm
    cur_chrom = None
    res = None
    p_sd_yres = None
    scf_sv = None
    bt_state = None

    for chrom, bsnps in blocks:
        if chrom != cur_chrom:
            cur_chrom = chrom
            # load LOCO predictions for this chromosome
            blups = np.zeros((N, P))
            if blup_files is not None:
                for ph, name in enumerate(pd.pheno_names):
                    if not pd.pheno_pass[ph]:
                        continue
                    blups[:, ph] = read_loco_chr(
                        blup_files[name], chrom, id_to_ind, N, pd.masked_indivs[:, ph]
                    )
            if params.trait_mode == QT:
                # compute_res (Data.cpp:2386)
                res = (pd.phenotypes - blups) * pd.masked_indivs
                p_sd_yres = np.linalg.norm(res, axis=0) / np.sqrt(
                    pd.Neff - params.ncov_analyzed
                )
                res = res / p_sd_yres[None, :]
                scf_sv = pd.scale_Y * p_sd_yres
            elif params.trait_mode == BT:
                from .models import step2_bt

                bt_state = step2_bt.prep_chromosome(params, pd, blups, log)
                res = bt_state.res
            else:
                raise NotImplementedError("trait mode not yet implemented in step 2")

        B = len(bsnps)
        G_raw = gd.read_block(bsnps)  # [B,N] int8 hardcalls or f64 dosages
        G_j = jnp.asarray(G_raw)
        stats_blk = snp_stats_block(G_j, ind_j, jnp.asarray(pd.masked_indivs))
        total = np.asarray(stats_blk["total"])
        ns = np.asarray(stats_blk["ns"])
        af1 = np.asarray(stats_blk["af1"])
        af_t = np.asarray(stats_blk["af"])
        mac_t = np.asarray(stats_blk["mac"])
        ns_t = np.asarray(stats_blk["ns_t"])

        # MAC filter (compute_mac, Geno.cpp:2955): all-trait MAC
        mac1 = np.minimum(total, 2 * ns - total)
        ignored = mac1 < params.min_mac
        ignored_trait = mac_t < params.min_mac  # [B,P]
        n_ignored += int(ignored.sum())

        # INFO score for dosage input (compute_aaf_info, Geno.cpp:2987)
        info_t = None
        if gd.last_info_num is not None:
            ival = gd.last_info_num * pd.ind_in_analysis[None, :]
            info_num_t = ival @ maskf  # [B,P]
            with np.errstate(divide="ignore", invalid="ignore"):
                info_t = 1.0 - info_num_t / (2 * ns_t * af_t * (1 - af_t))
            info_t = np.where((af_t == 0) | (af_t == 1), 1.0, info_t)
            if params.set_min_info:
                ignored_trait |= info_t < params.min_info

        # flip to minor allele for non-QT additive tests (Data.cpp:2108)
        with_flip = params.trait_mode != QT and params.test_type == 0
        mean_g = total / ns
        flipped = (mean_g > 1.0) & with_flip
        af1 = np.where(flipped, 1 - af1, af1)  # af reported post-flip? (no: kept raw)
        af1 = np.asarray(stats_blk["af1"])  # A1FREQ is pre-flip alt freq

        G = finalize_block_step2(G_j, ind_j, jnp.asarray(flipped))

        # dominant/recessive recoding (parseSnpfromBed tail, Geno.cpp:2515)
        if params.test_type == 1:
            G = jnp.where(G == 2.0, 1.0, G)
        elif params.test_type == 2:
            G = jnp.where(G >= 1.0, G - 1.0, G)

        if params.trait_mode == QT:
            G_res, scale_fac, low_var = m2.residualize_scale_block(G, cov_j, scale_denom)
            stats, denum = m2.score_qt_block(
                G_res, jnp.asarray(res), maskf_j, scale_denom, strict
            )
            bhat, se, chisq = m2.finalize_qt(stats, denum, scale_fac, scf_sv, flipped)
            logp = chisq_neglog10(chisq)
            test_fail = np.zeros((B, P), dtype=bool)
            ignored = ignored | np.asarray(low_var)
        else:
            from .models import step2_bt

            bhat, se, chisq, logp, test_fail, ncorr, nfail = step2_bt.score_block(
                params, pd, bt_state, G, np.asarray(flipped), ignored, ignored_trait, log
            )
            n_corrected += ncorr
            n_failed += nfail

        # write rows
        for b in range(B):
            if ignored[b]:
                continue
            for ph in range(P):
                if not pd.pheno_pass[ph] or ignored_trait[b, ph]:
                    n_ignored += 0
                    continue
                writers[ph].write(
                    sumstat_line_single(
                        params,
                        bsnps[b],
                        test_name,
                        af_t[b, ph],
                        (info_t[b, ph] if info_t is not None else 1.0)
                        if params.dosage_mode
                        else None,
                        int(ns_t[b, ph]),
                        bhat[b, ph],
                        se[b, ph],
                        chisq[b, ph],
                        logp[b, ph],
                        test_pass=not test_fail[b, ph],
                    )
                )

    for fh in writers:
        fh.close()
    log("\nAssociation results stored separately for each trait in files:")
    for p_ in out_paths:
        log(f"* [{p_}]")
    if params.firth or params.use_spa:
        log(f"Number of tests with {'Firth' if params.firth else 'SPA'} correction : {n_corrected}")
        log(f"Number of failed tests : ({n_failed}/{n_corrected})")
    log(f"Number of ignored tests due to low MAC : {n_ignored * P}")
    log(f" * done ({time.time()-t0:.1f}s)")
