"""Step 2 orchestrator: per-chromosome LOCO residuals + block score tests.

Replaces the reference's Data::test_snps_fast (Data.cpp:2230),
compute_res* (:2386-2475), analyze_block/compute_tests_mt (:2363-2551)
and the .regenie writers. The per-SNP OpenMP loop becomes whole-block
batched device computation. The gene-based driver (test_joint,
Data.cpp:2629) shares this engine via Step2Engine.
"""

from __future__ import annotations

import os
import time
from dataclasses import dataclass, field
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .config import BT, CT, QT, T2E, MISSING, Params
from .io.files import iter_lines, open_read, open_write, string_split
from .io.geno import make_blocks
from .io.output import header_single, sumstat_line_single
from .models import step2 as m2
from .ops.geno_ops import snp_stats_block, finalize_block_step2
from .parallel.mesh import to_host as _th
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
    mask: np.ndarray, use_prs: bool = False,
) -> np.ndarray:
    """Read one chromosome row from a .loco file (blup_read_chr,
    Step2_Models.cpp:51-150). Returns [N] blup vector (0 where masked).

    With use_prs (--use-prs), the file is a whole-genome .prs written by
    --print-prs: a single row labeled 0 used for every chromosome
    (blup_read, Pheno.cpp:1297-1312; blup_read_chr skips per-chromosome
    reads, Step2_Models.cpp:60)."""
    blup = np.zeros(n_samples)
    with open_read(path) as fh:
        header = string_split(fh.readline())
        if header[0] != "FID_IID":
            raise ValueError("header of blup file must start with FID_IID")
        if not use_prs:
            for _ in range(chrom - 1):
                fh.readline()
        toks = string_split(fh.readline())
        if len(toks) != len(header):
            raise ValueError("blup file row length mismatch")
        expect = 0 if use_prs else chrom
        if int(toks[0]) != expect:
            raise ValueError(f"blup file row starts with {toks[0]} instead of {expect}")
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


def read_ltco_prs(path, ltco_chr, id_to_ind, n_samples, mask, n_chrom):
    """Per-chromosome contribution of ltco_chr recovered from a .loco
    file (blup_read w_ltco branch, Pheno.cpp:1341-1381):
    sum_c loco_c / (nchr-1) - loco_ltco = perchr_ltco."""
    full = np.zeros(n_samples)
    ltco = np.zeros(n_samples)
    nchr = 0
    with open_read(path) as fh:
        header = string_split(fh.readline())
        for line in fh:
            toks = string_split(line)
            if not toks:
                continue
            is_ltco = int(toks[0]) == ltco_chr
            for col in range(1, len(header)):
                key = header[col]
                if key not in id_to_ind:
                    continue
                idx = id_to_ind[key]
                if not mask[idx] or toks[col] == "NA":
                    continue
                ds = float(toks[col])
                full[idx] += ds
                if is_ltco:
                    ltco[idx] = -ds
            nchr += 1
    if nchr != n_chrom:
        raise ValueError("incorrectly formatted LOCO file for LTCO")
    return ltco + full / (nchr - 1)


def mask_samples_missing_loco(params, pd, blup_files, id_to_ind):
    """Mask samples absent (or NA) in each trait's .loco file
    (blup_read, Pheno.cpp:1241-1330)."""
    for ph, name in enumerate(pd.pheno_names):
        if name not in blup_files:
            continue  # T2E event columns have no predictions
        path = blup_files[name]
        with open_read(path) as fh:
            header = string_split(fh.readline())
            vals = string_split(fh.readline())
        if params.use_prs and vals[0] != "0":
            # --use-prs expects whole-genome .prs files (blup_read,
            # Pheno.cpp:1297)
            raise ValueError(f"second line must start with 0 (={vals[0]})")
        present = np.zeros(params.n_samples, dtype=bool)
        for col in range(1, len(header)):
            key = header[col]
            if key in id_to_ind and vals[col] != "NA":
                present[id_to_ind[key]] = True
        pd.masked_indivs[:, ph] &= present
        if pd.masked_indivs[:, ph].sum() < 1:
            pd.pheno_pass[ph] = False


@dataclass
class _FusedBTConsts:
    """Per-chromosome constants for the fused BT path: the plane-packed
    Wext operand [Wcat | gsm^2 | maskf | case | ind] plus its column
    layout (see Step2Engine._ensure_fused_consts)."""

    fc: object  # step2_bt._FusedConsts (Wcat layout + xwt)
    Wp: object  # [4, nbp, C'] kernel operand
    usum: np.ndarray
    ncat: int
    Pn: int
    Kp1: int
    sl_mask: slice
    sl_case: slice
    icol: int
    C_used: int
    n_ind: float
    nb: int


class _FusedBTSource:
    """step2_bt.score_block genotype source backed by fused products;
    correction rows are decoded lazily from the on-device packed bytes
    (the analog of the reference's per-SNP G_res rebuild,
    Step2_Models.cpp:520-540)."""

    def __init__(self, eng, raw_j, flip_j, num, denum, S1_all):
        self.eng = eng
        self.raw_j = raw_j  # may carry mesh pad rows past n_snps
        self.flip_j = flip_j
        self._num = num
        self._denum = denum
        self._S1 = S1_all
        self.n_snps = int(num.shape[0])

    def allpass(self, fc):
        return self._num, self._denum, self._S1

    def rows_device(self, idx_j):
        from .ops.geno_ops import decode_bed_packed, finalize_block_step2

        eng = self.eng
        gd = eng.gd
        if gd._bgen is not None:
            # reconstruct dosages for the correction subset from the
            # device-resident probability byte planes
            Nf = gd._bgen.n_samples_file
            pl = self.raw_j[idx_j]
            k0 = pl[:, 0, :Nf].astype(jnp.float32)
            k1 = pl[:, 1, :Nf].astype(jnp.float32)
            miss = (k0 + k1) > 255.0
            ds = (2.0 * jnp.where(miss, 0.0, k0)
                  + jnp.where(miss, 0.0, k1)) / 255.0
            if eng.params.ref_first:
                ds = 2.0 - ds
            ds = jnp.where(miss, -3.0, ds)
            if not gd._keep_all_samples:
                ds = ds[:, jnp.asarray(gd.sample_keep_idx)]
            return finalize_block_step2(ds, eng.ind_j, self.flip_j[idx_j])
        nb = eng._fused_nb
        is_bed = gd._bed is not None
        nsrc = gd._bed.n_samples if is_bed else eng.params.n_samples
        Graw = decode_bed_packed(self.raw_j[idx_j][:, :nb], nsrc)
        if is_bed and eng.params.ref_first:
            Graw = jnp.where(Graw == -3, Graw, 2 - Graw).astype(jnp.int8)
        if is_bed and not gd._keep_all_samples:
            Graw = Graw[:, jnp.asarray(gd.sample_keep_idx)]
        G = finalize_block_step2(Graw, eng.ind_j, self.flip_j[idx_j])
        if eng.params.test_type == 1:
            G = jnp.where(G == 2.0, 1.0, G)
        elif eng.params.test_type == 2:
            G = jnp.where(G >= 1.0, G - 1.0, G)
        return G

    def rows_host(self, idx):
        return np.asarray(self.rows_device(jnp.asarray(idx)))


def _fetch_dict_packed(blk: dict) -> dict:
    """Fetch a dict of [B]/[B, X] device arrays in ONE device->host
    transfer: concatenate on device in the compute dtype, pull the
    packed block, split and cast back to each key's original dtype
    (exact — every value is either already the compute dtype or an
    integer count far below its mantissa limit).  On a remote-tunneled
    backend the per-key np.asarray round trips otherwise multiply the
    tunnel RTT by the key count (the gene-based set loop's measured
    hot spot)."""
    names = list(blk)
    vals = [jnp.asarray(blk[k]) for k in names]
    if not vals or vals[0].ndim == 0:
        return {k: np.asarray(v) for k, v in blk.items()}
    fdt = jnp.float64 if jax.config.jax_enable_x64 else jnp.float32
    parts = [(v[:, None] if v.ndim == 1 else v).astype(fdt) for v in vals]
    widths = [p.shape[1] for p in parts]
    packed = np.asarray(jnp.concatenate(parts, axis=1))
    out, o = {}, 0
    for k, v, w in zip(names, vals, widths):
        sl = packed[:, o : o + w]
        o += w
        a = sl[:, 0] if v.ndim == 1 else sl
        out[k] = np.ascontiguousarray(a).astype(np.dtype(v.dtype), copy=False)
    return out


@dataclass
class BlockResult:
    """Per-variant test outputs for a block, all phenos."""

    bhat: np.ndarray
    se: np.ndarray
    chisq: np.ndarray
    logp: np.ndarray
    test_fail: np.ndarray
    ignored: np.ndarray
    ignored_trait: np.ndarray
    af_t: np.ndarray
    ns_t: np.ndarray
    info_t: Optional[np.ndarray]
    scale_fac: Optional[np.ndarray] = None  # QT per-SNP scaling (gsc)
    mac_t: Optional[np.ndarray] = None  # [B, P]
    genocounts: Optional[np.ndarray] = None  # [B, 6, P] (htp mode)
    af1: Optional[np.ndarray] = None
    info1: Optional[np.ndarray] = None
    ns1: Optional[np.ndarray] = None
    n_rr: Optional[np.ndarray] = None
    n_aa: Optional[np.ndarray] = None
    af_case: Optional[np.ndarray] = None  # [B, P] (--af-cc)
    af_control: Optional[np.ndarray] = None
    ns_case: Optional[np.ndarray] = None
    ns_control: Optional[np.ndarray] = None

    def slice_rows(self, lo: int, hi: int) -> "BlockResult":
        """Row window [lo:hi) of every per-variant field — splits a
        result scored as one concatenated block (the gene-based bucket
        batches many sets' masks through one test_prepared_block call)
        back into per-set results."""
        import dataclasses

        kw = {}
        for f in dataclasses.fields(self):
            v = getattr(self, f.name)
            kw[f.name] = v[lo:hi] if isinstance(v, np.ndarray) else v
        return BlockResult(**kw)


class Step2Engine:
    """Shared association-test state and per-block scoring for single
    variants and burden masks."""

    def __init__(self, params: Params, gd, pd, blup_files, log):
        self.params = params
        self.gd = gd
        self.pd = pd
        self.blup_files = blup_files
        self.log = log
        self.id_to_ind = {s.key: i for i, s in enumerate(gd.samples)}
        self.ind_j = jnp.asarray(pd.ind_in_analysis)
        self.cov_j = jnp.asarray(pd.new_cov)
        self.maskf = pd.masked_indivs.astype(np.float64)
        self.maskf_j = jnp.asarray(self.maskf)
        self.strict = bool(params.strict_mode)
        self.scale_denom = float(params.n_analyzed - params.ncov)
        self.cur_chrom = None
        self.res = None
        self.p_sd_yres = None
        self.scf_sv = None
        self.bt_state = None
        self.n_ignored = 0
        self.n_corrected = 0
        self.n_failed = 0
        self.interaction = None
        self.null_firth_files = None
        # multi-chip: shard the variant axis of each block over the mesh
        # (§2.3.5 — replaces the reference's manual per-chromosome
        # machine sharding with XLA collectives)
        self.mesh = None
        if params.trait_mode in (QT, BT, CT, T2E) and not params.strict_mode:
            from .parallel.mesh import maybe_mesh

            self.mesh = maybe_mesh()
            if self.mesh is not None:
                log(f" * multi-chip mesh: {len(self.mesh.devices.flat)} "
                    "devices (variant-axis sharding)")
        # REGENIE_TPU_MESH_2D: tile the fused scorer's mesh as
        # variants x samples — the plane-packed operand's sample rows
        # shard over `smp` with psum'd [B, C] products, so each chip
        # holds only its window of the multi-GB Wext (SURVEY §5.7;
        # N-scaling budget in README). Single-process, hardcall fused
        # paths only; everything else keeps the 1-D variant mesh.
        self.mesh2d = None
        self._mesh2d_rects = None
        if self.mesh is not None and os.environ.get("REGENIE_TPU_MESH_2D"):
            from .parallel import mesh as pm
            from .parallel.dist import process_count

            ndev = len(self.mesh.devices.flat)
            nv2, ns2 = pm.mesh_2d_shape(ndev)
            if ns2 > 1 and process_count() == 1:
                self.mesh2d = pm.make_mesh_2d(ndev)
                log(f" * 2-D mesh for the fused scorer: {nv2} x {ns2} "
                    "(variant x sample tiling)")
            elif ns2 > 1:
                # multi-host 2-D: allowed when every process's devices
                # tile a contiguous grid rectangle (locality ordering
                # guarantees this whenever the per-process device count
                # divides, or is a multiple of, the smp axis) — each
                # process then owns a (variant-rows x byte-columns) slab
                m2 = pm.make_mesh_2d(ndev)
                rects = pm.all_process_rects(m2, process_count())
                if rects is not None:
                    self.mesh2d = m2
                    self._mesh2d_rects = rects
                    log(f" * 2-D mesh for the fused scorer: {nv2} x {ns2} "
                        f"(variant x sample tiling, {process_count()} "
                        "processes x rectangular slabs)")
        if params.interaction_var:
            from .models.interaction import prep_interaction

            self.interaction = prep_interaction(params, pd, gd, log)

    def refresh_masks(self):
        """Re-derive cached per-trait mask arrays after pd.masked_indivs
        changed (e.g. mask_samples_missing_loco runs post-construction)."""
        self.maskf = self.pd.masked_indivs.astype(np.float64)
        self.maskf_j = jnp.asarray(self.maskf)
        self._op_cm = None  # onepass constants embed maskf
        self._fused_chrom = None
        self._fused_static = None

    def prep_chrom(self, chrom: int):
        if chrom == self.cur_chrom:
            return
        self.cur_chrom = chrom
        params, pd, N, P = self.params, self.pd, self.params.n_samples, self.params.n_pheno
        blups = np.zeros((N, P))
        if self.blup_files is not None:
            for ph, name in enumerate(pd.pheno_names):
                if not pd.pheno_pass[ph] or name not in self.blup_files:
                    continue
                blups[:, ph] = read_loco_chr(
                    self.blup_files[name], chrom, self.id_to_ind, N,
                    pd.masked_indivs[:, ph], use_prs=params.use_prs,
                )
                # LTCO: also remove the extra chromosome's contribution
                # (blup_read_chr, Step2_Models.cpp:121)
                if params.ltco_chr > 0 and chrom != params.ltco_chr:
                    if not hasattr(self, "_ltco_prs"):
                        self._ltco_prs = {}
                    if ph not in self._ltco_prs:
                        self._ltco_prs[ph] = read_ltco_prs(
                            self.blup_files[name], params.ltco_chr,
                            self.id_to_ind, N, pd.masked_indivs[:, ph],
                            params.n_chrom,
                        )
                    blups[:, ph] -= self._ltco_prs[ph]
        if params.trait_mode == QT:
            if params.blup_cov:
                # --prs-cov: project the PRS out by a per-trait LM fit
                # instead of the unit-slope offset (get_lm_resid,
                # Pheno.cpp:1854)
                denom = (blups**2).sum(axis=0)
                beta_lm = np.where(
                    denom > 0, (blups * pd.phenotypes).sum(axis=0) / np.where(denom > 0, denom, 1.0), 0.0
                )
                res = (pd.phenotypes - blups * beta_lm[None, :]) * pd.masked_indivs
            else:
                res = (pd.phenotypes - blups) * pd.masked_indivs
            # two-stage RINT of residuals (Sofer et al. 2020;
            # residualize_res, Data.cpp:2408-2425)
            if params.rerint or params.rerint_cov:
                from .io.pheno import rint_values

                for ph in range(P):
                    if pd.pheno_pass[ph]:
                        m = pd.masked_indivs[:, ph]
                        res[:, ph] = rint_values(res[:, ph], m) * m
                if params.rerint_cov:
                    beta = res.T @ pd.new_cov
                    res = (res - pd.new_cov @ beta.T) * pd.masked_indivs
            self.p_sd_yres = np.linalg.norm(res, axis=0) / np.sqrt(
                pd.Neff - params.ncov_analyzed
            )
            self.res = res / self.p_sd_yres[None, :]
            self.scf_sv = pd.scale_Y * self.p_sd_yres
            if self.interaction is not None and self.interaction.hlm is not None:
                from .models.interaction import hlm_fit_null

                hlm_fit_null(params, pd, self.interaction, blups, self.log)
        elif params.trait_mode == BT:
            from .models import step2_bt

            self.bt_state = step2_bt.prep_chromosome(
                params, pd, blups, self.log, self.null_firth_files, chrom
            )
            self.res = self.bt_state.res
        elif params.trait_mode == CT:
            from .models import step2_ct

            self.bt_state = step2_ct.prep_chromosome(params, pd, blups, self.log)
            self.res = self.bt_state.res
        elif params.trait_mode == T2E:
            from .models import step2_t2e

            self.bt_state = step2_t2e.prep_chromosome(params, pd, blups, self.log)
            self.res = self.bt_state.res
        else:
            raise NotImplementedError("trait mode not yet implemented in step 2")

    def read_block_device(self, bsnps, force_packed: bool = False):
        """Packed-bytes device decode for BED (io/geno.py
        GenoData.read_block_device); host decode otherwise."""
        return self.gd.read_block_device(bsnps, force_packed)

    def pheno_counts(self, ph):
        """(n_cases_or_total, n_controls_or_None) for HTP gene rows."""
        if self.params.trait_mode == BT:
            cases = int(
                ((self.pd.phenotypes_raw[:, ph] == 1)
                 & self.pd.masked_indivs[:, ph]).sum()
            )
            return cases, int(self.pd.Neff[ph]) - cases
        return int(self.pd.Neff[ph]), None

    def non_par_flags(self, bsnps) -> np.ndarray:
        """[B] bool: variant on chrX outside PAR1/PAR2 (in_non_par,
        Geno.cpp:2802)."""
        p = self.params
        return np.array([
            (s.chrom == p.n_chrom)
            and (p.par1_max_bound < s.physpos < p.par2_min_bound)
            for s in bsnps
        ])

    def block_stats(self, G_raw, bsnps=None) -> dict:
        """Per-variant stats for a raw block (hardcalls or dosages).

        Host-side blocks get two upload/compile optimizations (both
        exact, so CPU-f64 parity is unchanged):
        - the variant axis pads up to a power-of-two bucket so repeated
          calls with ragged group sizes (the gene-based set loop, the
          trailing block of each chromosome) share ONE compiled
          executable instead of recompiling per shape — padded rows are
          all-MISSING and sliced off after the packed fetch;
        - integral hardcall blocks ship as int8 (8x less H2D traffic
          than the f64 dense block; the kernel casts to the compute
          dtype on device, exactly).
        """
        kw = {}
        if bsnps is not None and self.gd.sex is not None and self.params.test_mode:
            non_par = self.non_par_flags(bsnps)
            if non_par.any():
                kw = dict(
                    non_par=jnp.asarray(non_par),
                    sex=jnp.asarray(self.gd.sex),
                    skip_comp=bool(self.params.skip_dosage_comp),
                )
        B0 = int(G_raw.shape[0])
        arr = G_raw
        packed = False
        if isinstance(arr, np.ndarray) and B0:
            if arr.dtype != np.int8:
                with np.errstate(invalid="ignore"):
                    if (np.abs(arr) <= 127).all() and (arr == np.rint(arr)).all():
                        arr = arr.astype(np.int8)
            from .ops.geno_ops import MISSING as HC_MISSING

            # pad fill + eligibility use the HARDCALL missing code (-3,
            # geno_ops.MISSING) — config.MISSING (-999) is the pheno
            # code and wraps to 25 in int8, which both corrupted pad
            # rows and made the packed 2-bit H2D path unreachable for
            # real blocks with missing genotypes
            Bp = 1 << max(6, (B0 - 1).bit_length())
            if Bp != B0:
                arr = np.concatenate([
                    arr,
                    np.full((Bp - B0, arr.shape[1]), HC_MISSING, arr.dtype),
                ])
                if "non_par" in kw:
                    kw["non_par"] = jnp.asarray(np.concatenate(
                        [np.asarray(kw["non_par"]),
                         np.zeros(Bp - B0, bool)]))
            if arr.dtype == np.int8 and (
                    (arr >= 0) | (arr == HC_MISSING)).all() and (arr <= 2).all():
                from .ops.geno_ops import pack_hardcalls, snp_stats_block_packed

                n_smp = arr.shape[1]
                blk = snp_stats_block_packed(
                    jnp.asarray(pack_hardcalls(arr)), n_smp, self.ind_j,
                    jnp.asarray(self.pd.masked_indivs), **kw)
                packed = True
        if not packed:
            blk = snp_stats_block(
                jnp.asarray(arr), self.ind_j, jnp.asarray(self.pd.masked_indivs),
                **kw
            )
        out = _fetch_dict_packed(blk)
        if out and next(iter(out.values())).shape[0] != B0:
            out = {k: v[:B0] for k, v in out.items()}
        return out

    def model_type(self) -> str:
        """HTP Model string (Data.cpp:2093-2102)."""
        params = self.params
        test = {0: "ADD", 1: "DOM", 2: "REC"}[params.test_type]
        wgr = "" if params.skip_blups else "-WGR"
        if params.trait_mode == BT and params.firth:
            corr = "-FIRTH"
        elif params.trait_mode == BT and params.use_spa:
            corr = "-SPA"
        elif params.trait_mode == BT:
            corr = "-LOG"
        elif params.trait_mode == CT:
            corr = "-POISSON"
        elif params.trait_mode == T2E:
            corr = "-COX-FIRTH" if params.firth else "-COX"
        else:
            corr = "-LR"
        return test + wgr + corr

    def compute_genocounts(self, G_raw, bsnps=None) -> np.ndarray:
        """[B, 6, P] genotype counts (compute_genocounts, Geno.cpp:2898):
        rows 0-2 = cases (or all samples for QT) RR/RA/AA, 3-5 controls.
        Non-PAR chrX males are hemizygous: g>=1 counts as hom
        (update_genocounts, Geno.cpp:2922)."""
        params, pd = self.params, self.pd
        G = np.asarray(G_raw, dtype=np.float64)
        B, N = G.shape
        P = params.n_pheno
        valid = (G != -3) & pd.ind_in_analysis[None, :]
        lo, hi = np.full((B, N), 0.5), np.full((B, N), 1.5)
        if bsnps is not None and self.gd.sex is not None and not params.skip_dosage_comp:
            non_par = self.non_par_flags(bsnps)
            hemi = non_par[:, None] & (self.gd.sex == 1)[None, :]
            lo = np.where(hemi, 1.0, lo)
            hi = np.where(hemi, 1.0, hi)
        hc = [
            (G < lo) & valid,
            (G >= lo) & (G < hi) & valid,
            (G >= hi) & valid,
        ]
        out = np.zeros((B, 6, P))
        if params.trait_mode in (BT, T2E):
            if params.trait_mode == BT:
                ymat = pd.phenotypes_raw
                case = (ymat == 1) & pd.masked_indivs
                ctrl = (ymat == 0) & pd.masked_indivs
            else:
                case = np.zeros_like(pd.masked_indivs)
                ctrl = np.zeros_like(pd.masked_indivs)
                for tname, ename in params.t2e_map.items():
                    ti = pd.pheno_names.index(tname)
                    ei = pd.pheno_names.index(ename)
                    case[:, ti] = (pd.phenotypes_raw[:, ei] == 1) & pd.masked_indivs[:, ti]
                    ctrl[:, ti] = (pd.phenotypes_raw[:, ei] == 0) & pd.masked_indivs[:, ti]
            for k in range(3):
                out[:, k, :] = hc[k] @ case.astype(np.float64)
                out[:, 3 + k, :] = hc[k] @ ctrl.astype(np.float64)
        else:
            for k in range(3):
                out[:, k, :] = hc[k] @ pd.masked_indivs.astype(np.float64)
        return out.astype(np.int64)

    def test_prepared_block(
        self, G, af_t, ns_t, mac_t, ignored, ignored_trait, flipped, info_t=None,
        is_mask: bool = False,
    ) -> BlockResult:
        """Score a block whose genotypes are already imputed/encoded.

        G: [B, N] float (jnp or np); flipped: [B] bool.
        """
        params, pd = self.params, self.pd
        B = G.shape[0]
        P = params.n_pheno
        self.n_ignored += int(ignored.sum())

        if params.trait_mode == QT:
            if params.skip_cov_res:
                # --nocov-approx: keep G unadjusted, scale_fac=1
                # (residualize_geno skipped, Data.cpp:2513)
                G_res = jnp.asarray(G)
                scale_fac = np.ones(B)
                low_var = np.zeros(B, dtype=bool)
                stats, denum = m2.score_qt_block(
                    G_res, jnp.asarray(self.res), self.maskf_j, self.scale_denom,
                    self.strict,
                )
            elif self.mesh is not None:
                # variant-sharded scoring over the device mesh
                from .parallel import mesh as pm

                ndev = len(self.mesh.devices.flat)
                Gp, B0 = pm.pad_to(np.asarray(G), ndev, 0)
                G_sh = pm.shard_array(self.mesh, jnp.asarray(Gp), 0)
                if getattr(self, "_mesh_res_chrom", None) != self.cur_chrom:
                    self._mesh_res = pm.replicate(self.mesh, jnp.asarray(self.res))
                    self._mesh_maskf = pm.replicate(self.mesh, self.maskf_j)
                    self._mesh_cov = pm.replicate(self.mesh, self.cov_j)
                    self._mesh_res_chrom = self.cur_chrom
                stats, denum, scale_fac = pm.sharded_score_qt(
                    self.mesh, G_sh, self._mesh_res, self._mesh_maskf,
                    self._mesh_cov, self.scale_denom,
                )
                stats = pm.to_host(stats)[:B0]
                denum = pm.to_host(denum)[:B0]
                scale_fac = pm.to_host(scale_fac)[:B0]
                low_var = scale_fac < 1e-8
                G_res = None  # recomputed below only if a host copy is needed
            elif not self.strict:
                # fused single-pass scorer: G is consumed by one matmul
                # set; G_res is only rebuilt on demand for host consumers
                if getattr(self, "_op_cm", None) is None:
                    CM, Mmat, _ = m2.onepass_constants(
                        pd.new_cov, self.maskf, self.res
                    )
                    self._op_cm = jnp.asarray(CM)
                    self._op_M = jnp.asarray(Mmat)
                if getattr(self, "_op_ctr_chrom", None) != self.cur_chrom:
                    self._op_ctr = jnp.asarray(pd.new_cov.T @ self.res)
                    self._op_ctr_chrom = self.cur_chrom
                stats, denum, scale_fac, low_var = m2.score_qt_block_onepass(
                    jnp.asarray(G), self.cov_j, jnp.asarray(self.res),
                    self.maskf_j, self._op_cm, self._op_M, self._op_ctr,
                    self.scale_denom,
                )
                G_res = None
            else:
                G_res, scale_fac, low_var = m2.residualize_scale_block(
                    jnp.asarray(G), self.cov_j, self.scale_denom
                )
                stats, denum = m2.score_qt_block(
                    G_res, jnp.asarray(self.res), self.maskf_j, self.scale_denom,
                    self.strict,
                )
            # mask blocks only need the host G_res when a joint test /
            # GENE_P will consume it (joint.py reads eng.last_G_res);
            # plain burden+VC runs skip the [rows, N] fetch — on a
            # tunneled backend that transfer was a visible share of the
            # gene loop's burden:dev stage
            need_host = (is_mask and (params.joint_tests
                                      or params.apply_gene_pval_strategy)
                         ) or self.interaction is not None
            if self.mesh is None:
                # ONE packed device->host transfer for the four score
                # outputs (4 np.asarray round trips otherwise — the
                # remote-tunnel RTT multiplies by the fetch count);
                # host consumers' G_res rides the same transfer
                fd = dict(s=stats, d=denum, g=scale_fac, l=low_var)
                if G_res is None and (params.mcc_test or need_host):
                    G_res, _, _ = m2.residualize_scale_block(
                        jnp.asarray(G), self.cov_j, self.scale_denom
                    )
                if ((params.mcc_test or need_host)
                        and not isinstance(G_res, np.ndarray)):
                    fd["G"] = G_res
                f = _fetch_dict_packed(fd)
                stats, denum, scale_fac = f["s"], f["d"], f["g"]
                low_var = f["l"].astype(bool)
                if "G" in f:
                    G_res = f["G"]
            bhat, se, chisq, logp = self._qt_post(stats, denum, scale_fac, flipped)
            test_fail = np.zeros((B, P), dtype=bool)
            if G_res is None and (params.mcc_test or need_host):
                # mesh path skipped the replicated residualization; redo
                # it locally for host consumers (MCC / joint / interaction)
                G_res, _, _ = m2.residualize_scale_block(
                    jnp.asarray(G), self.cov_j, self.scale_denom
                )
            if params.mcc_test:
                from .models.mcc import apply_mcc_qt

                bhat, se, chisq = np.array(bhat), np.array(se), np.array(chisq)
                test_fail = apply_mcc_qt(
                    params, pd, np.asarray(G_res), self.res, logp, se, chisq
                )
            ignored = ignored | np.asarray(low_var)
            # host copy only when downstream host consumers need it
            # (joint tests / interaction); plain scans stay on device
            self.last_G_res = np.asarray(G_res) if need_host else G_res
            self.last_scale_fac = np.asarray(scale_fac)
        elif params.trait_mode == T2E:
            from .models import step2_t2e

            bhat, se, chisq, logp, test_fail, ncorr, nfail = step2_t2e.score_block(
                params, pd, self.bt_state, np.asarray(G), flipped, ignored,
                ignored_trait, self.log, mesh=self.mesh,
            )
            self.n_corrected += ncorr
            self.n_failed += nfail
            self.last_G_res = np.asarray(G)
        else:
            from .models import step2_bt

            src = G
            if (self.mesh is not None and params.trait_mode in (BT, CT)
                    and not hasattr(G, "allpass")):
                # variant-sharded all-trait score products over the mesh
                src = step2_bt.MeshGSource(G, self.mesh)
            bhat, se, chisq, logp, test_fail, ncorr, nfail = step2_bt.score_block(
                params, pd, self.bt_state, src, flipped, ignored, ignored_trait, self.log
            )
            self.n_corrected += ncorr
            self.n_failed += nfail
            self.last_G_res = np.asarray(G)

        return BlockResult(
            bhat=bhat, se=se, chisq=chisq, logp=logp, test_fail=test_fail,
            ignored=ignored, ignored_trait=ignored_trait, af_t=af_t, ns_t=ns_t,
            info_t=info_t,
            scale_fac=getattr(self, "last_scale_fac", None) if params.trait_mode == QT else None,
            mac_t=mac_t,
        )

    def _qt_post(self, stats, denum, scale_fac, flipped):
        """Shared QT tail: effect sizes + --mse-full + --t-test + logp
        (compute_score_qt tail, Step2_Models.cpp:434-460)."""
        params, pd = self.params, self.pd
        bhat, se, chisq = m2.finalize_qt(stats, denum, scale_fac, self.scf_sv, flipped)
        if params.mse_full:
            # full-model MSE: Var(y|g) shrinks by the SNP's own fit
            nk = params.n_analyzed - params.ncov_analyzed
            adj = (nk - np.asarray(stats) ** 2) / (nk - 1.0)
            adj = np.maximum(adj, 1e-12)
            stats = np.asarray(stats) / np.sqrt(adj)
            chisq = chisq / adj
            se = se * np.sqrt(adj)
        if params.t_test:
            # --t-test: p from the t distribution with Neff-K-1 df
            # (get_logp_ttest, Regenie.cpp:1827)
            from .utils.stats import ttest_neglog10

            df_t = pd.Neff - params.ncov_analyzed - 1
            logp = ttest_neglog10(np.asarray(stats), df_t[None, :])
        else:
            logp = chisq_neglog10(chisq)
        return bhat, se, chisq, logp

    def fused_ok(self) -> bool:
        """Whether the fully fused packed-bytes scorer (ops/fused_score)
        can replace decode->finalize->score for this run: QT or BT, BED
        hardcalls, additive coding, no consumer that needs a
        materialized genotype matrix (Firth/SPA correction rows are
        decoded lazily from the on-device bytes). REGENIE_TPU_FUSED=1/0
        forces on (XLA twin on CPU) / off."""
        import os

        env = os.environ.get("REGENIE_TPU_FUSED")
        if env == "0":
            return False
        params = self.params
        hardcall_src = self.gd._bed is not None or (
            self.gd._pgen is not None and not params.dosage_mode
        )
        bgen_src = False
        if self.gd._bgen is not None and params.test_type == 0:
            from .io.native import get_lib

            lib = get_lib()
            # dosage products need the inflate-only native extractor;
            # HTP / merged output want hardcall-threshold counts that
            # are nonlinear in dosages
            bgen_src = (
                lib is not None
                and hasattr(lib, "bgen12_extract_planes")
                and not params.htp_out
                and params.split_by_pheno
            )
        ok = (
            params.trait_mode in (QT, BT, CT, T2E)
            and (hardcall_src or bgen_src)
            and self.interaction is None
        )
        if ok and params.trait_mode == T2E:
            # Cox rides the fused products for hardcall sources; the
            # exact per-SNP risk-set variance (--coxscore-exact) needs
            # the full dense Gres block (compute_score_cox exact branch,
            # Step2_Models.cpp:672)
            ok = hardcall_src and not params.coxscore_exact
        if ok and params.trait_mode == QT:
            # strict mode (incl. forced single-pheno strict) is the
            # all-complete-traits case with a constant denominator —
            # handled by the epilogue's strict branch
            ok = not params.skip_cov_res and not params.mcc_test
        if not ok:
            return False
        if env == "1":
            return True
        return jax.default_backend() != "cpu"

    _PACK_LUT = None

    @staticmethod
    def _hemizygous_adjust(npb, S1h, SQh, SMh, usum_h, mcol, mm_sl,
                           total1, ns1, mac1, total_t, ns_t, mac_t,
                           with_classes):
        """Shared chrX male-tail stat algebra for the fused paths:
        MAC with 0.5*g males and min(mac, 2*ns - nmales - mac)
        (compute_mac non-auto branch, Geno.cpp:3095); optional
        hemizygous class counts (n1m = 2*S1m - SQm: males with g=1 move
        het -> hom-alt; g=0 males stay hom-ref).
        Returns (mac1, mac_t, n1m or None, n1m_t or None)."""
        male_tot1 = S1h[:, mcol]
        nmales1 = usum_h[mcol] - SMh[:, mcol]
        macx = total1 - 0.5 * male_tot1
        mac1 = np.where(
            npb, np.minimum(macx, 2.0 * ns1 - nmales1 - macx), mac1)
        male_tot_t = S1h[:, mm_sl]
        nmales_t = usum_h[None, mm_sl] - SMh[:, mm_sl]
        macx_t = total_t - 0.5 * male_tot_t
        mac_t = np.where(
            npb[:, None],
            np.minimum(macx_t, 2.0 * ns_t - nmales_t - macx_t), mac_t)
        n1m = n1m_t = None
        if with_classes:
            n1m = np.where(npb, 2.0 * male_tot1 - SQh[:, mcol], 0.0)
            n1m_t = np.where(
                npb[:, None], 2.0 * male_tot_t - SQh[:, mm_sl], 0.0)
        return mac1, mac_t, n1m, n1m_t

    def _fused_chrx_ok(self) -> bool:
        """chrX non-PAR blocks may ride the QT fused path when the male
        tail columns are in the operand: hardcall sources, default
        dosage compensation (males diploid-coded — scoring unchanged),
        ADD test, no --af-cc (case/control chrX adj stays on the dense
        path)."""
        p, gd = self.params, self.gd
        common = (
            gd.sex is not None and p.test_mode
            and not p.skip_dosage_comp and not p.af_cc
            and p.test_type == 0
        )
        if p.trait_mode == QT:
            # BGEN dosage sources carry no male SQ column (narrow Wq
            # operand): fine for MAC, but HTP genocounts need it — HTP
            # BGEN chrX keeps the dense fallback
            return common and (gd._bgen is None or not p.htp_out)
        if p.trait_mode == T2E:
            # hardcall-only fused Cox; genocounts are all-sample
            # (CT-style), so the QT male tail algebra carries over
            return common and gd._bgen is None
        # BT/CT: HTP genotype counts ride the case*male product columns
        # (appended to the male tail). BGEN dosage sources carry the
        # male S1 columns for the hemizygous MAC; hardcall class counts
        # are nonlinear in dosages, but fused_ok already keeps BGEN HTP
        # on the dense path
        return common and p.trait_mode in (BT, CT)

    def _fused_local_rows(self, B: int):
        """Multi-host QT: the contiguous variant rows THIS process's
        devices own under the global row sharding, so each host reads
        only its own byte ranges (VERDICT r1 #2 per-host decode; the
        runtime form of the reference's per-machine chromosome reads).
        None when single-process / BT (corrections need the full raw)."""
        if self.mesh is None or self.params.trait_mode != QT:
            return None
        if self._fused_local_rect(B) is not None:
            return None  # 2-D slab decode supersedes the 1-D row window
        from .parallel.dist import process_count, process_index

        nproc = process_count()
        if nproc <= 1:
            return None
        ndev = len(self.mesh.devices.flat)
        Bpad = -(-B // ndev) * ndev
        rpp = Bpad // nproc
        pid = process_index()
        lo = pid * rpp
        hi = min(lo + rpp, B)
        if not getattr(self, "_partial_logged", False):
            self._partial_logged = True
            self.log(f" * per-host decode: each of {nproc} processes "
                     "reads only its own variant byte ranges")
        return lo, max(hi, lo), Bpad

    def _fused_local_rect(self, B: int):
        """Multi-host 2-D mesh: the (variant-row window, byte-column
        window) of a packed block THIS process owns under the
        (var, smp) grid — 2-D process-local slab decode (the 2-D twin
        of _fused_local_rows: disk reads divide by the grid's variant
        rows, H2D transfer additionally by its sample columns). QT
        hardcall sources only (BT/T2E corrections need full rows; BGEN
        keeps the 1-D mesh). Returns (lo, hi, Bpad, (c0, nc, ns))."""
        if (self.mesh2d is None or self._mesh2d_rects is None
                or self.params.trait_mode != QT
                or self.gd._bgen is not None):
            return None
        from .parallel.dist import process_index

        nv, ns = self.mesh2d.devices.shape
        Bpad = -(-B // nv) * nv
        (r0, nr), (c0, nc) = self._mesh2d_rects[process_index()]
        rpg = Bpad // nv
        lo = r0 * rpg
        hi = min((r0 + nr) * rpg, B)
        if not getattr(self, "_partial_logged", False):
            self._partial_logged = True
            self.log(" * per-host 2-D slab decode: each process reads "
                     f"only its own {nr}x{nc} grid rectangle of variant "
                     "rows x byte columns")
        return lo, max(hi, lo), Bpad, (c0, nc, ns)

    def read_block_raw(self, bsnps) -> np.ndarray:
        """[B, nbp] packed 2-bit genotype bytes for a block, zero-padded
        to the fused kernel's byte-tile multiple.

        BED: the raw file bytes (file sample axis). PGEN hardcalls: the
        decoded int8 block repacked into BED codes on the kept sample
        axis — 32x less host->device traffic than shipping float64.

        Multi-host QT: returns ("partial", local_rows, (lo, hi, Bpad)) —
        only this process's variant rows are read from disk.

        Single-chip BED: returns the UNPADDED mmap view — zero host
        copies; byte-tile padding happens on device in _fused_upload."""
        from .ops import fused_score as fsc

        gd = self.gd
        rect = self._fused_local_rect(len(bsnps))
        rng_loc = rect if rect is not None else self._fused_local_rows(
            len(bsnps))
        tag = "partial2d" if rect is not None else "partial"
        if rng_loc is not None:
            lo, hi = rng_loc[0], rng_loc[1]
            bsnps = bsnps[lo:hi]
            if not bsnps:
                # this process owns only pad rows of the block
                nfile = self._fused_nfile()
                if gd._bgen is not None:
                    Np = -(-nfile // fsc._TC) * fsc._TC
                    empty = np.zeros((0, 2, Np), np.uint8)
                else:
                    empty = fsc.pad_raw(
                        np.zeros((0, (nfile + 3) // 4), np.uint8))
                return (tag, empty, rng_loc)
        if gd._bgen is not None:
            from .io.bgen import extract_planes_block

            if getattr(self, "_fused_bgen_failed", False):
                return None
            planes = extract_planes_block(gd._bgen, [s.offset for s in bsnps])
            if planes is None:
                # exotic layout (non-8-bit / phased / clipped): latch the
                # failure so later blocks skip the doubled decompression
                self._fused_bgen_failed = True
                return None
            Nf = gd._bgen.n_samples_file
            Np = -(-Nf // fsc._TC) * fsc._TC
            if Np != Nf:
                out = np.zeros((planes.shape[0], 2, Np), np.uint8)
                out[:, :, :Nf] = planes
                planes = out
            if rng_loc is not None:
                return (tag, planes, rng_loc)
            return planes
        if gd._bed is not None:
            offsets = np.array([s.offset for s in bsnps])
            start, stop = int(offsets[0]), int(offsets[-1]) + 1
            raw = gd._bed.read_block_bytes(start, stop - start)
            if len(offsets) != stop - start:
                raw = raw[offsets - start]
            if rng_loc is not None:
                raw = fsc.pad_raw(np.ascontiguousarray(raw))
                return (tag, raw, rng_loc)
            if getattr(self, "_fused_mesh", self.mesh) is None:
                # single-chip: hand the (contiguous) view to the device
                # transfer as-is; byte padding runs on device
                return np.ascontiguousarray(raw)
            return fsc.pad_raw(np.ascontiguousarray(raw))
        # PGEN hardcalls -> BED 2-bit codes (0->3, 1->2, 2->0, miss->1)
        if Step2Engine._PACK_LUT is None:
            lut = np.zeros(256, np.uint8)
            lut[0], lut[1], lut[2] = 3, 2, 0
            lut[np.int8(-3).view(np.uint8)] = 1
            Step2Engine._PACK_LUT = lut
        G = gd.read_block(bsnps)
        B, N = G.shape
        c = Step2Engine._PACK_LUT[G.astype(np.int8).view(np.uint8)]
        nb = (N + 3) // 4
        if N != 4 * nb:
            c = np.concatenate(
                [c, np.zeros((B, 4 * nb - N), np.uint8)], axis=1
            )
        c = c.reshape(B, nb, 4)
        raw = (
            c[:, :, 0] | (c[:, :, 1] << 2) | (c[:, :, 2] << 4)
            | (c[:, :, 3] << 6)
        ).astype(np.uint8)
        raw = fsc.pad_raw(np.ascontiguousarray(raw))
        if rng_loc is not None:
            return (tag, raw, rng_loc)
        return raw

    def _fused_nfile(self) -> int:
        """Sample count on the fused byte-source's axis: the FILE axis
        for BED bytes / BGEN planes, the kept axis for repacked PGEN."""
        gd = self.gd
        if gd._bed is not None:
            return gd._bed.n_samples
        if gd._bgen is not None:
            return gd._bgen.n_samples_file
        return self.params.n_samples

    def _scatter_file(self, x):
        """Map a kept-sample-axis array onto the genotype file's sample
        axis (zeros at dropped samples). PGEN packed blocks are already
        on the kept axis — identity."""
        gd = self.gd
        if gd._pgen is not None or gd._keep_all_samples:
            return x
        nfile = self._fused_nfile()
        idx = np.asarray(gd.sample_keep_idx)
        out = np.zeros((nfile,) + x.shape[1:], dtype=np.float64)
        out[idx] = x
        return out

    def _ensure_fused_consts(self):
        """(Re)build the fused-scorer constants; res (QT) / the null
        refit state (BT) change per chromosome, so keyed on cur_chrom."""
        if getattr(self, "_fused_chrom", None) == self.cur_chrom:
            return
        from .ops import fused_score as fsc

        gd, pd, params = self.gd, self.pd, self.params
        is_bgen = gd._bgen is not None
        nfile = self._fused_nfile()
        nb = (nfile + 3) // 4
        on_tpu = jax.default_backend() != "cpu"
        # 2-D (var x smp) mesh applies to the plane-packed hardcall
        # paths; BGEN byte planes keep the 1-D variant mesh
        mesh_f = (self.mesh2d
                  if self.mesh2d is not None and not is_bgen else self.mesh)
        nbp_tile = None
        if mesh_f is not None and len(mesh_f.axis_names) > 1:
            nbp_tile = fsc._TC * mesh_f.devices.shape[1]
        dtype = np.float64 if jax.config.jax_enable_x64 else np.float32
        # PGEN bytes are repacked post allele-handling on the kept axis;
        # only raw BED file bytes still need the --ref-first transform
        rf = bool(getattr(params, "ref_first", False)) and gd._bed is not None
        if params.trait_mode == QT:
            res_f = self._scatter_file(self.res)
            static = getattr(self, "_fused_static", None)
            if static is None:
                # chromosome-independent part packed ONCE: cov/CM/mask/
                # ind columns; residual columns start zero and are
                # patched per chromosome on device (at UKB scale the
                # full operand is GBs — rebuilding it 23x would dominate
                # step-2 prep)
                cov_f = self._scatter_file(pd.new_cov)
                mask_f = self._scatter_file(self.maskf)
                ind_f = self._scatter_file(
                    pd.ind_in_analysis.astype(np.float64)
                ).astype(bool)
                male_f = None
                if self._fused_chrx_ok():
                    male_f = self._scatter_file(
                        (gd.sex == 1).astype(np.float64))
                base = fsc.build_consts(
                    cov_f, np.zeros_like(res_f), mask_f, ind_f,
                    self.scale_denom, nb=nb, dtype=dtype,
                    split=fsc.split_mode(on_tpu, is_bgen),
                    pack="sample" if is_bgen else "plane", male=male_f,
                    nbp_tile=nbp_tile,
                )
                covz_f = cov_f * ind_f.astype(np.float64)[:, None]
                Cp = -(-base.layout_C() // 128) * 128
                self._fused_static = (
                    base, covz_f, np.asarray(base.usum, dtype=np.float64), Cp,
                )
                if is_bgen:
                    tailz = np.concatenate(
                        [mask_f * ind_f.astype(np.float64)[:, None],
                         ind_f.astype(np.float64)[:, None]], axis=1,
                    )
                    self._fused_qt_Wq, _ = fsc.sample_pack(
                        tailz, split=fsc.split_mode(on_tpu, True),
                        dtype=dtype,
                    )
            base, covz_f, usum_static, Cp = self._fused_static
            K, P = base.K, base.P
            if is_bgen:
                Np = fsc.op_nbp(base.Wp)
                res_pl = np.zeros((Np, P), np.float64)
                res_pl[: res_f.shape[0]] = res_f
            else:
                res_pl = fsc.plane_order_rows(res_f, nb, nbp_tile=nbp_tile)
            Wp = fsc.patch_res_columns(
                base.Wp, res_pl.astype(np.float32) if on_tpu else res_pl,
                K, P, Cp, on_tpu,
            )
            u = usum_static.copy()
            u[K : K + P] = res_f.sum(axis=0)
            self._fused_consts = fsc.FusedConsts(
                Wp=Wp, usum=jnp.asarray(u.astype(dtype)),
                covt_res=jnp.asarray((covz_f.T @ res_f).astype(dtype)),
                Mmat=base.Mmat, n_ind=base.n_ind, K=K, P=P,
                scale_denom=base.scale_denom, split=base.split,
                inc=base.inc, has_male=base.has_male,
            )
            if is_bgen:
                # qs = start of the [maskf | ind] tail, BEFORE any
                # chrX male columns (the narrow Wq SQ operand covers
                # maskf+ind only; male SQ is not needed for dosages)
                base_C = self._fused_consts.layout_C() - (
                    (P + 1) if self._fused_consts.has_male else 0)
                self._fused_fn = fsc.make_qt_bgen_fn(
                    self._fused_consts, on_tpu,
                    bool(getattr(params, "ref_first", False)),
                    Wq=self._fused_qt_Wq,
                    qs=base_C - (P + 1),
                    mesh=self.mesh, strict=self.strict,
                )
            else:
                self._fused_fn = fsc.make_qt_block_fn(
                    self._fused_consts, on_tpu, params.test_type, rf,
                    mesh=mesh_f, strict=self.strict,
                )
        elif params.trait_mode == T2E:
            # fused Cox operand: per-trait [WX1 | R*ind | v] blocks +
            # shared [maskf | ind] tail (+ chrX male tail). R columns
            # are ind-zeroed so A' = G.R matches the dense path's
            # ind-zeroed G; RtR keeps the FULL kept rows because the
            # dense ||Gres||^2 includes (A R^T)^2 at non-analyzed kept
            # samples (G there is zero, Gres is -A R^T).
            from .models import step2_t2e
            from types import SimpleNamespace

            st = self.bt_state
            P = params.n_pheno
            passing = step2_t2e.passing_traits(pd, st)
            q = pd.new_cov.shape[1] + 1
            ind = pd.ind_in_analysis
            indf = ind.astype(np.float64)
            cols = []
            for ph in passing:
                mle = st.mle[ph]
                mask = pd.masked_indivs[:, ph].astype(np.float64)
                cols += [
                    mle.WX1 * indf[:, None],
                    mle.X1_X1WX1inv * indf[:, None],
                    (mle.residual * mask)[:, None],
                ]
            # event case indicator per trait (HTP genotype counts split
            # cases = events, compute_genocounts trait_mode==3 branch)
            case = np.zeros_like(pd.masked_indivs, dtype=np.float64)
            for tname, ename in params.t2e_map.items():
                ti = pd.pheno_names.index(tname)
                ei = pd.pheno_names.index(ename)
                case[:, ti] = (
                    (pd.phenotypes_raw[:, ei] == 1) & pd.masked_indivs[:, ti]
                )
            cols += [case, self.maskf, indf[:, None]]
            has_male = self._fused_chrx_ok()
            Wext = np.concatenate(cols, axis=1)
            Wext_f = self._scatter_file(Wext)
            nt = len(passing) * (2 * q + 1)
            if has_male:
                malez = self._scatter_file(
                    (self.gd.sex == 1).astype(np.float64) * indf)
                maskf_f = Wext_f[:, nt + P : nt + 2 * P]
                case_f = Wext_f[:, nt : nt + P]
                Wext_f = np.concatenate(
                    [Wext_f, malez[:, None], maskf_f * malez[:, None],
                     case_f * malez[:, None]],
                    axis=1,
                )
            Wp, usum = fsc.plane_pack(
                Wext_f, nb, split=fsc.split_mode(on_tpu), dtype=dtype,
                nbp_tile=nbp_tile)
            icol = nt + 2 * P
            C_used = icol + 1 + ((2 * P + 1) if has_male else 0)
            Rtv = np.stack([
                st.mle[ph].X1_X1WX1inv.T
                @ (st.mle[ph].residual * pd.masked_indivs[:, ph])
                for ph in passing
            ]) if passing else np.zeros((0, q))
            RtR = np.stack([
                st.mle[ph].X1_X1WX1inv.T @ st.mle[ph].X1_X1WX1inv
                for ph in passing
            ]) if passing else np.zeros((0, q, q))
            rv = np.array([st.mle[ph].res_var for ph in passing])
            self._fused_t2e = SimpleNamespace(
                passing=passing, q=q, icol=icol, C_used=C_used, Wp=Wp,
                usum=usum, sl_case=slice(nt, nt + P),
                sl_mask=slice(nt + P, nt + 2 * P),
                case_n=case.sum(axis=0),
                n_ind=float(indf.sum()), has_male=has_male,
            )
            self._fused_fn = fsc.make_t2e_block_fn(
                Wp, usum, Rtv, RtR, rv, C_used, icol, float(indf.sum()),
                len(passing), q, on_tpu, params.test_type, rf,
                mesh=mesh_f,
            )
        else:  # BT
            from .models import step2_bt

            st = self.bt_state
            P = params.n_pheno
            cols_ok = [
                ph for ph in range(P)
                if pd.pheno_pass[ph] and st.X_gamma[ph] is not None
            ]
            fc = getattr(st, "_fused", None)
            if fc is None or cols_ok != fc.cols:
                fc = st._fused = step2_bt._FusedConsts(pd, st)
            Pn, Kp1 = len(fc.cols), fc.Kmax + 1
            ncat = Pn * Kp1
            Wcat = np.asarray(fc.Wcat_j, dtype=np.float64)
            gsm2 = st.gamma_sqrt_mask[:, fc.cols] ** 2
            case = (
                (pd.phenotypes_raw == 1) & pd.masked_indivs
            ).astype(np.float64)
            ind = pd.ind_in_analysis
            cols = [Wcat, gsm2, self.maskf, case,
                    ind.astype(np.float64)[:, None]]
            has_male = self._fused_chrx_ok()
            if has_male:
                # chrX male tail (see FusedConsts.layout_C): hemizygous
                # MAC/class-count stats from the male product columns
                malez = (self.gd.sex == 1).astype(np.float64)
                malez = self._scatter_file(malez)
                indf_f = self._scatter_file(ind.astype(np.float64))
                malez = malez * indf_f
            Wext = np.concatenate(cols, axis=1)
            Wext_f = self._scatter_file(Wext)
            if has_male:
                maskf_f = Wext_f[:, ncat + Pn : ncat + Pn + P]
                case_f = Wext_f[:, ncat + Pn + P : ncat + Pn + 2 * P]
                Wext_f = np.concatenate(
                    [Wext_f, malez[:, None], maskf_f * malez[:, None],
                     case_f * malez[:, None]],  # hemizygous HTP case counts
                    axis=1,
                )
            if is_bgen:
                Wp, usum = fsc.sample_pack(
                    Wext_f, split=fsc.split_mode(on_tpu, True), dtype=dtype)
            else:
                Wp, usum = fsc.plane_pack(
                    Wext_f, nb, split=fsc.split_mode(on_tpu), dtype=dtype,
                    nbp_tile=nbp_tile)
            ind_col = ncat + Pn + P + P
            C_used = ind_col + 1 + ((2 * P + 1) if has_male else 0)
            self._fused_bt = _FusedBTConsts(
                fc=fc, Wp=Wp, usum=usum, ncat=ncat, Pn=Pn, Kp1=Kp1,
                sl_mask=slice(ncat + Pn, ncat + Pn + P),
                sl_case=slice(ncat + Pn + P, ncat + Pn + 2 * P),
                icol=ind_col, C_used=C_used,
                n_ind=float(ind.sum()), nb=nb,
            )
            self._fused_bt_has_male = has_male
            if is_bgen:
                Wq, _ = fsc.sample_pack(
                    Wext_f[:, ncat:], split=fsc.split_mode(on_tpu, True),
                    dtype=dtype,
                )
                self._fused_fn = fsc.make_bt_bgen_fn(
                    Wp, usum, np.asarray(fc.xwt_j), C_used, ind_col,
                    float(ind.sum()), ncat, Pn, Kp1, on_tpu,
                    bool(getattr(params, "ref_first", False)),
                    Wq=Wq, qs=ncat, mesh=self.mesh,
                )
            else:
                self._fused_fn = fsc.make_bt_block_fn(
                    Wp, usum, np.asarray(fc.xwt_j), C_used, ind_col,
                    float(ind.sum()), ncat, Pn, Kp1, on_tpu, params.test_type, rf,
                    mesh=mesh_f,
                )
        self._fused_is_bgen = is_bgen
        self._fused_nb = nb
        self._fused_mesh = mesh_f
        if is_bgen:
            self._fused_op_nbp = None
        else:
            wp_act = (self._fused_consts.Wp if params.trait_mode == QT
                      else self._fused_t2e.Wp if params.trait_mode == T2E
                      else self._fused_bt.Wp)
            self._fused_op_nbp = fsc.op_nbp(wp_act)
        self._fused_chrom = self.cur_chrom

    @staticmethod
    def _mac_filters(params, bsnps, mac1, mac_t, B):
        """Shared MAC gating (compute_mac, Geno.cpp:3100-3107)."""
        mac_gate = np.array([s.mac_fail_if_checked for s in bsnps])
        mac_thr = np.array([
            params.forced_mac if s.forced_mac_filter and params.forced_mac > 0
            else params.min_mac
            for s in bsnps
        ])
        mac_ignored = (mac1 < mac_thr) & mac_gate
        ignored_trait = (mac_t < mac_thr[:, None]) & mac_gate[:, None]
        return mac_ignored, ignored_trait

    def _fused_info_t(self, ILh, SQh, SMh, msl, ns_t, af_t):
        """Per-trait MACH INFO from the product columns: the per-sample
        info numerator 4*ph + p1 - ds^2 sums to IL - SQ over each trait
        mask (compute_aaf_info, Geno.cpp:3110-3142)."""
        info_num_t = ILh[:, msl] - SQh[:, msl]
        with np.errstate(divide="ignore", invalid="ignore"):
            info_t = 1.0 - info_num_t / (2.0 * ns_t * af_t * (1.0 - af_t))
        return np.where((af_t == 0) | (af_t == 1), 1.0, info_t)

    def _rec_min_homs(self, S1h, SQh, SMh, icol, total1, ns1):
        """--minHOMs recessive hom-carrier filter from the raw product
        columns (parseSnpfromBed, Geno.cpp:2518): positive entries of the
        REC-coded finalized G sum to hom_count + v*nmiss."""
        with np.errstate(divide="ignore", invalid="ignore"):
            m_b = np.where(ns1 > 0, total1 / np.maximum(ns1, 1.0), 0.0)
        v = np.where(m_b >= 1.0, m_b - 1.0, m_b)
        H1 = (SQh[:, icol] - total1) / 2.0
        return (H1 + v * SMh[:, icol]) < self.params.min_homs

    def _fused_dispatched(self, rawp):
        """(raw_j, outs) for a fused block: consume a prefetch-thread
        predispatch when its fn stamp matches the engine's CURRENT
        per-chrom fused fn, else upload+dispatch here.  The stamp is the
        fn object itself — prep_chrom rebuilds `_fused_fn` on a
        chromosome switch, so a predispatch made under the previous
        chromosome's LOCO consts can never be consumed."""
        if isinstance(rawp, tuple) and rawp and rawp[0] == "predispatched":
            _tag, raw_j, fn, outs = rawp
            if fn is self._fused_fn:
                return raw_j, outs
            rawp = raw_j  # stale (chrom switched): dispatch fresh
        raw_j = self._fused_upload(rawp)
        return raw_j, self._fused_fn(raw_j)

    def _fused_upload(self, rawp):
        """Device placement of a packed block for the fused block fn:
        plain upload single-chip; variant-sharded over the mesh (rows
        zero-padded to the mesh size — the callers slice the pad rows
        back off every output, so they never reach the host stats).
        ("partial", local, (lo, hi, Bpad)) carries only THIS process's
        rows (per-host decode): assemble the global array directly from
        the process-local slab.

        Idempotent: an already-device-placed block passes through, so
        the prefetch worker can upload block k+1 WHILE the device scores
        block k (H2D/compute overlap; the reference overlaps its chunk
        reads with OpenMP scoring the same way, Data.cpp:2944)."""
        from .parallel import mesh as pm

        if isinstance(rawp, jax.Array):
            return rawp
        if isinstance(rawp, tuple) and rawp[0] == "partial":
            from jax.sharding import NamedSharding, PartitionSpec as P

            _tag, local, (lo, hi, Bpad) = rawp
            from .parallel.dist import process_count

            rpp = Bpad // process_count()
            slab = np.zeros((rpp,) + local.shape[1:], np.uint8)
            slab[: hi - lo] = local
            sharding = NamedSharding(
                self.mesh, P(self.mesh.axis_names[0],
                             *([None] * (slab.ndim - 1))))
            return jax.make_array_from_process_local_data(
                sharding, slab, (Bpad,) + local.shape[1:])
        if isinstance(rawp, tuple) and rawp[0] == "partial2d":
            # 2-D process-local slab: this process decoded only its own
            # variant rows; ship only its own byte columns of them
            from jax.sharding import NamedSharding
            from jax.sharding import PartitionSpec as SP

            _tag, local, (lo, hi, _Bpad, (c0, nc, ns)) = rawp
            mesh_f = self.mesh2d
            nv = mesh_f.devices.shape[0]
            nbp = self._fused_op_nbp
            local = np.asarray(local)
            if local.shape[1] != nbp:
                ext = np.zeros((local.shape[0], nbp), np.uint8)
                ext[:, : local.shape[1]] = local
                local = ext
            Bpad = _Bpad
            rpg = Bpad // nv
            (r0, nr), _ = self._mesh2d_rects[jax.process_index()]
            cpb = nbp // ns
            slab = np.zeros((nr * rpg, nc * cpb), np.uint8)
            slab[: hi - lo] = local[:, c0 * cpb : (c0 + nc) * cpb]
            sharding = NamedSharding(
                mesh_f, SP(pm.VAR_AXIS, pm.SMP_AXIS))
            return jax.make_array_from_process_local_data(
                sharding, slab, (Bpad, nbp))
        mesh_f = getattr(self, "_fused_mesh", self.mesh)
        if mesh_f is None:
            raw_j = jnp.asarray(rawp)
            nbp = getattr(self, "_fused_op_nbp", None)
            if (nbp is not None and raw_j.ndim == 2
                    and raw_j.shape[1] < nbp):
                # byte-tile padding on device (HBM-rate, frees the host)
                raw_j = jnp.pad(raw_j, ((0, 0), (0, nbp - raw_j.shape[1])))
            return raw_j
        if len(mesh_f.axis_names) > 1:
            # 2-D (var x smp): rows padded to the variant axis, byte
            # columns (already padded to n_smp * tile by the operand
            # packing) sharded over the sample axis
            from jax.sharding import NamedSharding
            from jax.sharding import PartitionSpec as SP

            from .parallel import mesh as pm2

            raw_np = np.asarray(rawp)
            if (self._fused_op_nbp is not None
                    and raw_np.shape[1] != self._fused_op_nbp):
                ext = np.zeros(
                    (raw_np.shape[0], self._fused_op_nbp), np.uint8)
                ext[:, : raw_np.shape[1]] = raw_np
                raw_np = ext
            nv = mesh_f.devices.shape[0]
            raw_np, _ = pm.pad_to(raw_np, nv, 0)
            # pm._put: device_put single-host; per-process slice assembly
            # when the 2-D mesh spans hosts (BT/T2E full-decode paths)
            return pm._put(
                np.asarray(raw_np),
                NamedSharding(mesh_f, SP(pm2.VAR_AXIS, pm2.SMP_AXIS)))
        ndev = len(mesh_f.devices.flat)
        rawp, _ = pm.pad_to(np.asarray(rawp), ndev, 0)
        return pm.shard_array(mesh_f, jnp.asarray(rawp), 0)

    def test_raw_block_fused(self, rawp, bsnps) -> Tuple[BlockResult, np.ndarray]:
        """Fused pipeline for a packed BED block: three MXU products over
        the raw bytes replace decode/impute/residualize/score AND the
        per-variant stat pass (snp_stats_block) — AF/MAC/genotype counts
        all come from the same product columns."""
        from .ops import fused_score as fsc

        params, pd = self.params, self.pd
        self._ensure_fused_consts()
        if params.trait_mode in (BT, CT):
            return self._fused_block_bt(rawp, bsnps)
        if params.trait_mode == T2E:
            return self._fused_block_t2e(rawp, bsnps)
        consts = self._fused_consts
        B, P, K = len(bsnps), consts.P, consts.K
        raw_j, _outs = self._fused_dispatched(rawp)
        flipped = np.zeros(B, dtype=bool)  # QT never flips (with_flip=False)
        IL = None
        if getattr(self, "_fused_is_bgen", False):
            (stats, denum, scale_fac, low_var,
             S1, SQ, SM, IL) = _outs
        else:
            stats, denum, scale_fac, low_var, S1, SQ, SM = _outs
        if self._fused_mesh is None:
            # single-device: ALL per-block outputs ride ONE packed
            # device->host transfer (7-8 separate fetches = 7-8 WAN RTTs
            # per block on a tunneled backend)
            fd = dict(s1=S1, sq=SQ, sm=SM, st=stats, d=denum,
                      g=scale_fac, l=low_var)
            if IL is not None:
                fd["il"] = IL
            f = _fetch_dict_packed(fd)
            S1h, SQh, SMh = f["s1"][:B], f["sq"][:B], f["sm"][:B]
            stats, denum = f["st"][:B], f["d"][:B]
            scale_fac = f["g"][:B]
            low_var = f["l"].astype(bool)[:B]
            ILh = f["il"][:B] if IL is not None else None
        else:  # sharded outputs: to_host gathers per array
            ILh = _th(IL)[:B] if IL is not None else None
            S1h, SQh, SMh = _th(S1)[:B], _th(SQ)[:B], _th(SM)[:B]
            stats = _th(stats)[:B]
            denum = _th(denum)[:B]
            scale_fac = _th(scale_fac)[:B]
            low_var = _th(low_var)[:B]

        # per-variant stats from the raw (pre-imputation) products
        C_used = consts.layout_C()
        male_off = (P + 1) if consts.has_male else 0
        icol = C_used - 1 - male_off
        msl = slice(icol - P, icol)
        total1 = S1h[:, icol]
        ns1 = consts.n_ind - SMh[:, icol]
        with np.errstate(divide="ignore", invalid="ignore"):
            af1 = total1 / (2.0 * ns1)
        mac1 = np.minimum(total1, 2.0 * ns1 - total1)
        total_t = S1h[:, msl]
        ns_t = pd.Neff[None, :] - SMh[:, msl]
        with np.errstate(divide="ignore", invalid="ignore"):
            af_t = total_t / (2.0 * ns_t)
        mac_t = np.minimum(total_t, 2.0 * ns_t - total_t)
        n_aa1 = (SQh[:, icol] - total1) / 2.0
        n_rr1 = ns1 - total1 + n_aa1
        n1m_t = None
        if consts.has_male:
            non_par = self.non_par_flags(bsnps)
            if non_par.any():
                # hemizygous MAC (+ class counts for hardcalls; BGEN's
                # narrow Wq carries no male SQ and emits no class rows)
                mac1, mac_t, n1m, n1m_t = self._hemizygous_adjust(
                    non_par, S1h, SQh, SMh,
                    np.asarray(consts.usum, np.float64),
                    C_used - 1 - P, slice(C_used - P, C_used),
                    total1, ns1, mac1, total_t, ns_t, mac_t,
                    with_classes=not getattr(self, "_fused_is_bgen", False),
                )
                if n1m is not None:
                    n_aa1 = n_aa1 + n1m

        mac_ignored, ignored_trait = self._mac_filters(params, bsnps, mac1, mac_t, B)
        if params.test_type == 2 and params.min_homs > 0:
            mac_ignored = mac_ignored | self._rec_min_homs(
                S1h, SQh, SMh, icol, total1, ns1
            )
        # low_var excluded from the tally (as in test_prepared_block:
        # it counts MAC/minHOMs filtering only)
        self.n_ignored += int(mac_ignored.sum())
        ignored = mac_ignored | low_var
        info_t = None
        if ILh is not None:
            info_t = self._fused_info_t(ILh, SQh, SMh, msl, ns_t, af_t)
            if params.set_min_info:
                ignored_trait = ignored_trait | (info_t < params.min_info)

        bhat, se, chisq, logp = self._qt_post(stats, denum, scale_fac, flipped)
        self.last_scale_fac = scale_fac
        result = BlockResult(
            bhat=bhat, se=se, chisq=chisq, logp=logp,
            test_fail=np.zeros((B, P), dtype=bool),
            ignored=ignored, ignored_trait=ignored_trait,
            af_t=af_t, ns_t=ns_t, info_t=info_t, scale_fac=scale_fac,
            mac_t=mac_t,
        )
        result.af1 = af1
        result.ns1 = np.round(ns1).astype(np.int64)
        if not getattr(self, "_fused_is_bgen", False):
            # hardcall class counts (nonlinear for dosages)
            result.n_rr = np.round(n_rr1).astype(np.int64)
            result.n_aa = np.round(n_aa1).astype(np.int64)
        if params.htp_out:
            a_t = (SQh[:, msl] - total_t) / 2.0
            het_t = total_t - 2.0 * a_t
            if n1m_t is not None:
                a_t = a_t + n1m_t
                het_t = het_t - n1m_t
            rr_t = ns_t - het_t - a_t
            gc = np.zeros((B, 6, P))
            gc[:, 0, :] = rr_t
            gc[:, 1, :] = het_t
            gc[:, 2, :] = a_t
            result.genocounts = np.round(gc).astype(np.int64)
        return result, flipped

    def _fused_block_bt(self, rawp, bsnps) -> Tuple[BlockResult, np.ndarray]:
        """Fused BT pipeline: products against [Wcat | gsm^2 | maskf |
        case | ind] give the all-trait score num/denum, every per-variant
        statistic (incl. --af-cc and HTP case/control genotype counts),
        and the imputation/flip corrections — Firth/SPA rows are decoded
        lazily from the device-resident bytes via _FusedBTSource."""
        from .models import step2_bt

        params, pd = self.params, self.pd
        fb = self._fused_bt
        fc = fb.fc
        B, P = len(bsnps), params.n_pheno
        raw_j, _outs = self._fused_dispatched(rawp)
        ILh = IL = None
        if getattr(self, "_fused_is_bgen", False):
            (S1, SQ, SM, IL, flip_j,
             num, denum, S1_all) = _outs
        else:
            S1, SQ, SM, flip_j, num, denum, S1_all = _outs
        if not getattr(raw_j, "is_fully_addressable", True):
            # multi-host: gather the per-variant outputs once; keep a
            # process-local raw copy for the correction-row rebuilds
            flip_j = jnp.asarray(_th(flip_j)[:B])
            num, denum, S1_all = (
                jnp.asarray(_th(x)[:B]) for x in (num, denum, S1_all))
            raw_j = jnp.asarray(rawp)
        elif num.shape[0] != B:  # mesh pad rows: drop before scoring
            flip_j = flip_j[:B]
            num, denum, S1_all = num[:B], denum[:B], S1_all[:B]
            # drop the pad rows of the product slices ON DEVICE too so
            # every output shares the one packed fetch below (the
            # leading-dim guard otherwise pushed flip/num/denum onto 3
            # separate fetch RTTs for padded blocks)
            S1, SQ, SM = S1[:B], SQ[:B], SM[:B]
            if IL is not None:
                IL = IL[:B]
        fetched_nd = None
        if self._fused_mesh is None:
            # one packed transfer for ALL host-side per-block outputs:
            # product slices + the flip/num/denum that score_block and
            # the output path would otherwise fetch one RTT at a time
            # (S1_all stays DEVICE for the correction-row rebuilds)
            fd = dict(s1=S1, sq=SQ, sm=SM)
            if int(num.shape[0]) == int(S1.shape[0]):
                fd.update(fl=flip_j, num=num, den=denum)
            if IL is not None:
                fd["il"] = IL
            f = _fetch_dict_packed(fd)
            S1h, SQh, SMh = f["s1"][:B], f["sq"][:B], f["sm"][:B]
            ILh = f["il"][:B] if IL is not None else None
            flip_h = f["fl"].astype(bool)[:B] if "fl" in f else None
            if "num" in f:
                fetched_nd = (f["num"][:B], f["den"][:B])
        else:
            ILh = _th(IL)[:B] if IL is not None else None
            S1h, SQh, SMh = _th(S1)[:B], _th(SQ)[:B], _th(SM)[:B]
            flip_h = None

        icol, msl, csl = fb.icol, fb.sl_mask, fb.sl_case
        total1 = S1h[:, icol]
        ns1 = fb.n_ind - SMh[:, icol]
        with np.errstate(divide="ignore", invalid="ignore"):
            af1 = total1 / (2.0 * ns1)
        mac1 = np.minimum(total1, 2.0 * ns1 - total1)
        total_t = S1h[:, msl]
        ns_t = pd.Neff[None, :] - SMh[:, msl]
        with np.errstate(divide="ignore", invalid="ignore"):
            af_t = total_t / (2.0 * ns_t)
        mac_t = np.minimum(total_t, 2.0 * ns_t - total_t)
        n_aa1 = (SQh[:, icol] - total1) / 2.0
        n_rr1 = ns1 - total1 + n_aa1
        n1m_t = n1m_case = None
        if getattr(self, "_fused_bt_has_male", False):
            non_par = self.non_par_flags(bsnps)
            if non_par.any():
                mac1, mac_t, n1m, n1m_t = self._hemizygous_adjust(
                    non_par, S1h, SQh, SMh,
                    np.asarray(fb.usum, np.float64),
                    fb.icol + 1, slice(fb.icol + 2, fb.icol + 2 + P),
                    total1, ns1, mac1, total_t, ns_t, mac_t,
                    # hardcall class counts are nonlinear in dosages
                    with_classes=not getattr(self, "_fused_is_bgen", False),
                )
                if n1m is not None:
                    n_aa1 = n_aa1 + n1m
                    # case-side hemizygous class moves (case*male cols)
                    cm_sl = slice(fb.icol + 2 + P, fb.icol + 2 + 2 * P)
                    n1m_case = np.where(
                        non_par[:, None],
                        2.0 * S1h[:, cm_sl] - SQh[:, cm_sl], 0.0)

        # minor-allele flip (with_flip: BT + additive) was decided on
        # device inside the fused block fn
        flipped = flip_h if flip_h is not None else np.asarray(flip_j)
        if fetched_nd is not None:
            num, denum = fetched_nd  # numpy — score_block's fetch is free
        source = _FusedBTSource(self, raw_j, flip_j, num, denum, S1_all)

        mac_ignored, ignored_trait = self._mac_filters(params, bsnps, mac1, mac_t, B)
        if params.test_type == 2 and params.min_homs > 0:
            mac_ignored = mac_ignored | self._rec_min_homs(
                S1h, SQh, SMh, icol, total1, ns1
            )
        self.n_ignored += int(mac_ignored.sum())
        ignored = mac_ignored
        info_t = None
        if ILh is not None:
            info_t = self._fused_info_t(ILh, SQh, SMh, msl, ns_t, af_t)
            if params.set_min_info:
                ignored_trait = ignored_trait | (info_t < params.min_info)

        bhat, se, chisq, logp, test_fail, ncorr, nfail = step2_bt.score_block(
            params, pd, self.bt_state, source, flipped, ignored,
            ignored_trait, self.log,
        )
        self.n_corrected += ncorr
        self.n_failed += nfail
        result = BlockResult(
            bhat=bhat, se=se, chisq=chisq, logp=logp, test_fail=test_fail,
            ignored=ignored, ignored_trait=ignored_trait,
            af_t=af_t, ns_t=ns_t, info_t=info_t, scale_fac=None, mac_t=mac_t,
        )
        result.af1 = af1
        result.ns1 = np.round(ns1).astype(np.int64)
        if not getattr(self, "_fused_is_bgen", False):
            result.n_rr = np.round(n_rr1).astype(np.int64)
            result.n_aa = np.round(n_aa1).astype(np.int64)

        # case-side raw products (pre-flip, matching update_af_cc /
        # compute_genocounts semantics on G_raw)
        if (params.af_cc or params.htp_out) and params.trait_mode == BT:
            tot_case = S1h[:, csl]
            case_mask = (pd.phenotypes_raw == 1) & pd.masked_indivs
            case_n = case_mask.sum(axis=0).astype(np.float64)
            ns_case = case_n[None, :] - SMh[:, csl]
        if params.af_cc and params.trait_mode == BT:
            with np.errstate(divide="ignore", invalid="ignore"):
                result.af_case = tot_case / (2.0 * ns_case)
                result.af_control = (total_t - tot_case) / (
                    2.0 * (ns_t - ns_case)
                )
            result.ns_case = np.round(ns_case).astype(np.int64)
            result.ns_control = np.round(ns_t - ns_case).astype(np.int64)
        if params.htp_out:
            # class counts: H = (SQ - S1)/2, E = 2*S1 - SQ per column set
            a_t = (SQh[:, msl] - total_t) / 2.0
            het_t = total_t - 2.0 * a_t
            if n1m_t is not None:
                # chrX non-PAR males with g>=1 count as hom
                # (update_genocounts hemizygous branch, Geno.cpp:2922)
                a_t = a_t + n1m_t
                het_t = het_t - n1m_t
            rr_t = ns_t - het_t - a_t
            gc = np.zeros((B, 6, P))
            if params.trait_mode == BT:
                a_case = (SQh[:, csl] - tot_case) / 2.0
                het_case = tot_case - 2.0 * a_case
                if n1m_case is not None:
                    a_case = a_case + n1m_case
                    het_case = het_case - n1m_case
                rr_case = ns_case - het_case - a_case
                gc[:, 0, :] = rr_case
                gc[:, 1, :] = het_case
                gc[:, 2, :] = a_case
                gc[:, 3, :] = rr_t - rr_case
                gc[:, 4, :] = het_t - het_case
                gc[:, 5, :] = a_t - a_case
            else:  # CT: all-sample counts (compute_genocounts else-branch)
                gc[:, 0, :] = rr_t
                gc[:, 1, :] = het_t
                gc[:, 2, :] = a_t
            result.genocounts = np.round(gc).astype(np.int64)
        return result, flipped

    def _fused_block_t2e(self, rawp, bsnps) -> Tuple[BlockResult, np.ndarray]:
        """Fused Cox pipeline: products against the per-trait
        [WX1 | R | v] blocks give T = Gres.v and res_var*||Gres||^2 on
        device (compute_score_cox, Step2_Models.cpp:632); Firth
        correction rows are decoded lazily from the packed bytes."""
        from .models import step2_t2e

        params, pd = self.params, self.pd
        ft = self._fused_t2e
        B, P = len(bsnps), params.n_pheno
        raw_j, _outs = self._fused_dispatched(rawp)
        S1, SQ, SM, flip_j, Tnum, denum = _outs
        if not getattr(raw_j, "is_fully_addressable", True):
            flip_j = jnp.asarray(_th(flip_j)[:B])
            Tnum, denum = (jnp.asarray(_th(x)[:B]) for x in (Tnum, denum))
            raw_j = jnp.asarray(rawp)
        elif Tnum.shape[0] != B:  # mesh pad rows
            flip_j = flip_j[:B]
            Tnum, denum = Tnum[:B], denum[:B]
            # device-slice the product rows as well: one packed fetch
            # for all outputs (see _fused_block_bt)
            S1, SQ, SM = S1[:B], SQ[:B], SM[:B]
        fetched_nd = None
        if self._fused_mesh is None:
            fd = dict(s1=S1, sq=SQ, sm=SM)
            if int(Tnum.shape[0]) == int(S1.shape[0]):
                fd.update(fl=flip_j, num=Tnum, den=denum)
            f = _fetch_dict_packed(fd)
            S1h, SQh, SMh = f["s1"][:B], f["sq"][:B], f["sm"][:B]
            flip_h = f["fl"].astype(bool)[:B] if "fl" in f else None
            if "num" in f:
                fetched_nd = (f["num"][:B], f["den"][:B])
        else:
            S1h, SQh, SMh = _th(S1)[:B], _th(SQ)[:B], _th(SM)[:B]
            flip_h = None

        icol, msl, csl = ft.icol, ft.sl_mask, ft.sl_case
        total1 = S1h[:, icol]
        ns1 = ft.n_ind - SMh[:, icol]
        with np.errstate(divide="ignore", invalid="ignore"):
            af1 = total1 / (2.0 * ns1)
        mac1 = np.minimum(total1, 2.0 * ns1 - total1)
        total_t = S1h[:, msl]
        ns_t = pd.Neff[None, :] - SMh[:, msl]
        with np.errstate(divide="ignore", invalid="ignore"):
            af_t = total_t / (2.0 * ns_t)
        mac_t = np.minimum(total_t, 2.0 * ns_t - total_t)
        n_aa1 = (SQh[:, icol] - total1) / 2.0
        n_rr1 = ns1 - total1 + n_aa1
        n1m_t = n1m_case = None
        if ft.has_male:
            non_par = self.non_par_flags(bsnps)
            if non_par.any():
                mac1, mac_t, n1m, n1m_t = self._hemizygous_adjust(
                    non_par, S1h, SQh, SMh,
                    np.asarray(ft.usum, np.float64),
                    icol + 1, slice(icol + 2, icol + 2 + P),
                    total1, ns1, mac1, total_t, ns_t, mac_t,
                    with_classes=True,  # T2E fused is hardcall-only
                )
                n_aa1 = n_aa1 + n1m
                # event-side hemizygous class moves (case*male columns)
                cm_sl = slice(icol + 2 + P, icol + 2 + 2 * P)
                n1m_case = np.where(
                    non_par[:, None],
                    2.0 * S1h[:, cm_sl] - SQh[:, cm_sl], 0.0)

        flipped = flip_h if flip_h is not None else np.asarray(flip_j)
        if fetched_nd is not None:
            Tnum, denum = fetched_nd  # numpy — the score fetch is free
        source = _FusedBTSource(self, raw_j, flip_j, Tnum, denum, None)

        mac_ignored, ignored_trait = self._mac_filters(
            params, bsnps, mac1, mac_t, B)
        if params.test_type == 2 and params.min_homs > 0:
            mac_ignored = mac_ignored | self._rec_min_homs(
                S1h, SQh, SMh, icol, total1, ns1
            )
        self.n_ignored += int(mac_ignored.sum())
        ignored = mac_ignored

        bhat, se, chisq, logp, test_fail, ncorr, nfail = (
            step2_t2e.score_block_fused(
                params, pd, self.bt_state, np.asarray(Tnum),
                np.asarray(denum), flipped, source.rows_host,
                ignored, ignored_trait, self.log,
            ))
        self.n_corrected += ncorr
        self.n_failed += nfail
        result = BlockResult(
            bhat=bhat, se=se, chisq=chisq, logp=logp, test_fail=test_fail,
            ignored=ignored, ignored_trait=ignored_trait,
            af_t=af_t, ns_t=ns_t, info_t=None, scale_fac=None, mac_t=mac_t,
        )
        result.af1 = af1
        result.ns1 = np.round(ns1).astype(np.int64)
        result.n_rr = np.round(n_rr1).astype(np.int64)
        result.n_aa = np.round(n_aa1).astype(np.int64)
        if params.htp_out:
            # event-split genotype counts: cases = events (compute_
            # genocounts trait_mode==3 branch, Geno.cpp:2079)
            a_t = (SQh[:, msl] - total_t) / 2.0
            het_t = total_t - 2.0 * a_t
            tot_case = S1h[:, csl]
            ns_case = ft.case_n[None, :] - SMh[:, csl]
            a_case = (SQh[:, csl] - tot_case) / 2.0
            het_case = tot_case - 2.0 * a_case
            if n1m_t is not None:
                a_t = a_t + n1m_t
                het_t = het_t - n1m_t
                a_case = a_case + n1m_case
                het_case = het_case - n1m_case
            rr_t = ns_t - het_t - a_t
            rr_case = ns_case - het_case - a_case
            gc = np.zeros((B, 6, P))
            gc[:, 0, :] = rr_case
            gc[:, 1, :] = het_case
            gc[:, 2, :] = a_case
            gc[:, 3, :] = rr_t - rr_case
            gc[:, 4, :] = het_t - het_case
            gc[:, 5, :] = a_t - a_case
            result.genocounts = np.round(gc).astype(np.int64)
        return result, flipped

    def test_raw_block(self, G_raw, bsnps) -> Tuple[BlockResult, np.ndarray]:
        """Full pipeline for a raw genotype block (stats, filters, flip,
        imputation, encoding, scoring). Returns (result, flipped)."""
        params = self.params
        # --skip-dosage-comp: non-PAR chrX males (diploid-coded) become
        # 0/1 before any statistics (parseSnpfromBed, Geno.cpp:2459)
        if params.skip_dosage_comp and self.gd.sex is not None:
            non_par = self.non_par_flags(bsnps)
            if non_par.any():
                Gf = np.asarray(G_raw, dtype=np.float64)
                hemi = non_par[:, None] & (self.gd.sex == 1)[None, :] & (Gf != -3)
                G_raw = np.where(hemi, Gf / 2.0, Gf)
        sb = self.block_stats(G_raw, bsnps)
        total, ns = sb["total"], sb["ns"]
        mac1 = sb["mac1"]
        # --extract-or/--exclude-or: MAC filter only where the gate is set;
        # --force-mac-filter: separate threshold for flagged variants
        # (compute_mac, Geno.cpp:3100-3107)
        ignored, ignored_trait = self._mac_filters(
            params, bsnps, mac1, sb["mac"], len(bsnps)
        )

        # the prefetch thread mutates gd.last_info_num for the NEXT block;
        # the loop pins this block's numerators on the engine instead
        info_num_blk = getattr(self, "_info_num_override", self.gd.last_info_num)
        info_t = None
        if info_num_blk is not None:
            ival = info_num_blk * self.pd.ind_in_analysis[None, :]
            info_num_t = ival @ self.maskf
            with np.errstate(divide="ignore", invalid="ignore"):
                info_t = 1.0 - info_num_t / (2 * sb["ns_t"] * sb["af"] * (1 - sb["af"]))
            info_t = np.where((sb["af"] == 0) | (sb["af"] == 1), 1.0, info_t)
            if params.set_min_info:
                ignored_trait |= info_t < params.min_info
        elif params.dosage_mode and params.file_type == "pgen":
            # PGEN dosages: MACH r2 info = (E[g^2]-E[g]^2)/(2p(1-p))
            # (compute_aaf_info, Geno.cpp:3137-3142)
            Gd = np.asarray(G_raw, dtype=np.float64)
            g2 = np.where(Gd == -3, 0.0, Gd**2) * self.pd.ind_in_analysis[None, :]
            info_num_t = g2 @ self.maskf
            with np.errstate(divide="ignore", invalid="ignore"):
                info_t = (info_num_t / sb["ns_t"] - 4 * sb["af"] ** 2) / (
                    2 * sb["af"] * (1 - sb["af"])
                )
            info_t = np.where((sb["af"] == 0) | (sb["af"] == 1), 1.0, info_t)
            if params.set_min_info:
                ignored_trait |= info_t < params.min_info

        with_flip = params.trait_mode != QT and params.test_type == 0
        mean_g = total / ns
        flipped = (mean_g > 1.0) & with_flip

        G = finalize_block_step2(jnp.asarray(G_raw), self.ind_j, jnp.asarray(flipped))
        if params.test_type == 1:
            G = jnp.where(G == 2.0, 1.0, G)
        elif params.test_type == 2:
            G = jnp.where(G >= 1.0, G - 1.0, G)
            if params.min_homs > 0:
                # --minHOMs: recessive filter on hom-ALT carrier count
                # (parseSnpfromBed, Geno.cpp:2518)
                sum_pos = np.asarray(jnp.where(G > 0, G, 0.0).sum(axis=1))
                ignored = ignored | (sum_pos < params.min_homs)

        # host copy only needed by the interaction hook
        self.last_G_imputed = np.asarray(G) if self.interaction is not None else G
        self.last_flipped = flipped
        result = self.test_prepared_block(
            G, sb["af"], sb["ns_t"], sb["mac"], ignored, ignored_trait, flipped, info_t
        )
        result.af1 = sb["af1"]
        result.ns1 = ns.astype(np.int64)
        # --af-cc: case/control AF + counts (update_af_cc Geno.cpp:3069,
        # compute_aaf_info :3119-3126)
        if params.af_cc and params.trait_mode == BT:
            Gf = np.asarray(G_raw, dtype=np.float64)
            validf = ((Gf != -3) & self.pd.ind_in_analysis[None, :]).astype(np.float64)
            Gv = np.where(Gf == -3, 0.0, Gf) * self.pd.ind_in_analysis[None, :]
            case = (self.pd.phenotypes_raw == 1) & self.pd.masked_indivs
            casef = case.astype(np.float64)
            tot_case = Gv @ casef
            ns_case = validf @ casef
            tot_t = Gv @ self.maskf
            ns_t = sb["ns_t"]
            with np.errstate(divide="ignore", invalid="ignore"):
                result.af_case = tot_case / (2 * ns_case)
                result.af_control = (tot_t - tot_case) / (2 * (ns_t - ns_case))
            result.ns_case = ns_case.astype(np.int64)
            result.ns_control = (ns_t - ns_case).astype(np.int64)
        result.n_rr = sb["n_rr"].astype(np.int64)
        result.n_aa = sb["n_aa"].astype(np.int64)
        if params.htp_out:
            result.genocounts = self.compute_genocounts(G_raw, bsnps)
        return result, flipped


def setup_writers(params: Params, pheno_names: List[str], pheno_pass=None,
                  pre_header: str = ""):
    writers, out_paths = [], []
    if not params.split_by_pheno and not params.htp_out:
        from .io.output import header_all

        path = f"{params.out_prefix}.regenie" + (".gz" if params.gz_out else "")
        fh = open_write(path, gz=params.gz_out, parallel_gz=True)
        if pre_header:
            fh.write(pre_header)
        fh.write(header_all(params))
        # Ydict maps trait numbers to names (print_summary, Step2_Models.cpp:2655)
        with open_write(params.out_prefix + ".regenie.Ydict") as yd:
            for ip, name in enumerate(pheno_names):
                yd.write(f"Y{ip+1} {name}\n")
        return [fh] * len(pheno_names), [path]
    if params.htp_out:
        from .io.output import header_htp

        hdr = header_htp()
    else:
        hdr = header_single(params)
    for ip, name in enumerate(pheno_names):
        if pheno_pass is not None and not pheno_pass[ip]:
            writers.append(None)
            continue
        suffix = ".regenie" + (".gz" if params.gz_out else "")
        path = f"{params.out_prefix}_{name}{suffix}"
        fh = open_write(path, gz=params.gz_out, parallel_gz=True)
        if pre_header:
            fh.write(pre_header)
        fh.write(hdr)
        writers.append(fh)
        out_paths.append(path)
    return writers, out_paths


def write_block_rows(params, pd, writers, bsnps, r: BlockResult, test_name="ADD",
                     model_type=None):
    B = len(bsnps)
    if params.htp_out:
        from .io.output import (format_block_htp, htp_prefixes,
                                native_formatter, sumstat_line_htp)

        # hot path: whole-column native rendering, one call per trait
        # (capability probed before any per-block operand prep)
        if native_formatter("format_sumstat_htp") is not None:
            prefix = None
            for ph in range(params.n_pheno):
                if not pd.pheno_pass[ph] or writers[ph] is None:
                    continue
                if prefix is None:
                    prefix = htp_prefixes(bsnps)
                tname_out = pd.pheno_names[ph]
                if params.htp_use_eventname and params.t2e_map:
                    tname_out = params.t2e_map.get(tname_out, tname_out)
                writers[ph].write(format_block_htp(
                    params, prefix[0], prefix[1], tname_out,
                    model_type or test_name,
                    skip=r.ignored | r.ignored_trait[:, ph],
                    beta=r.bhat[:, ph], se=r.se[:, ph], chisq=r.chisq[:, ph],
                    logp=r.logp[:, ph], af=r.af_t[:, ph],
                    info=(r.info_t[:, ph] if r.info_t is not None
                          else np.ones(B))
                    if params.dosage_mode else None,
                    mac=r.mac_t[:, ph] if r.mac_t is not None else None,
                    genocounts=r.genocounts[:, :, ph]
                    if r.genocounts is not None else None,
                    neff=pd.Neff[ph], test_fail=r.test_fail[:, ph],
                ))
            return
        for b in range(B):
            if r.ignored[b]:
                continue
            for ph in range(params.n_pheno):
                if not pd.pheno_pass[ph] or r.ignored_trait[b, ph] or writers[ph] is None:
                    continue
                # --htp-with-event: T2E Trait column shows the event name
                tname_out = pd.pheno_names[ph]
                if params.htp_use_eventname and params.t2e_map:
                    tname_out = params.t2e_map.get(tname_out, tname_out)
                writers[ph].write(
                    sumstat_line_htp(
                        params, bsnps[b], tname_out,
                        model_type or test_name,
                        r.bhat[b, ph], r.se[b, ph], r.chisq[b, ph], r.logp[b, ph],
                        r.af_t[b, ph],
                        (r.info_t[b, ph] if r.info_t is not None else 1.0)
                        if params.dosage_mode else None,
                        r.mac_t[b, ph] if r.mac_t is not None else -1,
                        r.genocounts[b, :, ph] if r.genocounts is not None else None,
                        test_pass=not r.test_fail[b, ph],
                        neff=pd.Neff[ph],
                    )
                )
        return
    if not params.split_by_pheno:
        from .io.output import (block_prefixes, format_block_all,
                                native_formatter, sumstat_line_all)

        # hot path: whole-block native rendering; unusable traits are
        # pre-masked to the (-1,-1,-1,-1,fail) tuple the Python loop
        # uses (capability probed before any per-block operand prep)
        if (native_formatter("format_sumstat_all") is not None
                and len(test_name) <= 40):
            P = params.n_pheno
            bad = np.zeros((B, P), bool)
            for ph in range(P):
                if not pd.pheno_pass[ph]:
                    bad[:, ph] = True
            bad |= r.ignored_trait[:, :P].astype(bool)
            pre = block_prefixes(bsnps)
            writers[0].write(format_block_all(
                params, pre[0], pre[1], test_name,
                skip=r.ignored,
                af1=r.af1 if r.af1 is not None else np.full(B, -1.0),
                info1=r.info1 if r.info1 is not None else None,
                ns1=r.ns1 if r.ns1 is not None else np.zeros(B),
                n_rr=r.n_rr if r.n_rr is not None else np.full(B, -1),
                n_aa=r.n_aa if r.n_aa is not None else np.full(B, -1),
                beta=np.where(bad, -1.0, r.bhat[:, :P]),
                se=np.where(bad, -1.0, r.se[:, :P]),
                chisq=np.where(bad, -1.0, r.chisq[:, :P]),
                logp=np.where(bad, -1.0, r.logp[:, :P]),
                fail=bad | r.test_fail[:, :P].astype(bool),
            ))
            return
        for b in range(B):
            if r.ignored[b]:
                continue
            per_pheno = []
            for ph in range(params.n_pheno):
                bad = not pd.pheno_pass[ph] or r.ignored_trait[b, ph]
                per_pheno.append(
                    (-1.0, -1.0, -1.0, -1.0, False) if bad else (
                        r.bhat[b, ph], r.se[b, ph], r.chisq[b, ph], r.logp[b, ph],
                        not r.test_fail[b, ph],
                    )
                )
            writers[0].write(
                sumstat_line_all(
                    params, bsnps[b], test_name,
                    r.af1[b] if r.af1 is not None else -1.0,
                    (r.info1[b] if r.info1 is not None else 1.0)
                    if params.dosage_mode else None,
                    int(r.ns1[b]) if r.ns1 is not None else 0,
                    int(r.n_rr[b]) if r.n_rr is not None else -1,
                    int(r.n_aa[b]) if r.n_aa is not None else -1,
                    per_pheno,
                )
            )
        return
    # hot path: whole-column native rendering (OpenMP snprintf), one
    # call per trait; byte-identical to the per-row loop below
    # (capability probed before any per-block operand prep)
    from .io.output import block_prefixes, format_block_single, native_formatter

    if (native_formatter("format_sumstat_single") is not None
            and len(test_name) <= 40):
        prefix = None
        for ph in range(params.n_pheno):
            if not pd.pheno_pass[ph] or writers[ph] is None:
                continue
            if prefix is None:
                prefix = block_prefixes(bsnps)
            writers[ph].write(format_block_single(
                params, prefix[0], prefix[1], test_name,
                skip=r.ignored | r.ignored_trait[:, ph],
                af=r.af_t[:, ph],
                info=r.info_t[:, ph] if r.info_t is not None else None,
                n=r.ns_t[:, ph], beta=r.bhat[:, ph], se=r.se[:, ph],
                chisq=r.chisq[:, ph], logp=r.logp[:, ph],
                test_fail=r.test_fail[:, ph],
                af_case=r.af_case[:, ph] if r.af_case is not None else None,
                af_control=(r.af_control[:, ph]
                            if r.af_control is not None else None),
                ns_case=r.ns_case[:, ph] if r.ns_case is not None else None,
                ns_control=(r.ns_control[:, ph]
                            if r.ns_control is not None else None),
            ))
        return
    for b in range(B):
        if r.ignored[b]:
            continue
        for ph in range(params.n_pheno):
            if not pd.pheno_pass[ph] or r.ignored_trait[b, ph] or writers[ph] is None:
                continue
            writers[ph].write(
                sumstat_line_single(
                    params,
                    bsnps[b],
                    test_name,
                    r.af_t[b, ph],
                    (r.info_t[b, ph] if r.info_t is not None else 1.0)
                    if params.dosage_mode
                    else None,
                    int(r.ns_t[b, ph]),
                    r.bhat[b, ph],
                    r.se[b, ph],
                    r.chisq[b, ph],
                    r.logp[b, ph],
                    test_pass=not r.test_fail[b, ph],
                    af_case=r.af_case[b, ph] if r.af_case is not None else -1,
                    af_control=r.af_control[b, ph] if r.af_control is not None else -1,
                    ns_case=int(r.ns_case[b, ph]) if r.ns_case is not None else -1,
                    ns_control=int(r.ns_control[b, ph]) if r.ns_control is not None else -1,
                )
            )


def run_step2(params: Params, log=print) -> None:
    enable_x64_if_cpu()
    params.test_mode = True

    blup_files = None
    blup_names = None
    if not params.skip_blups:
        blup_files = read_pred_list(params.pred_list)
        blup_names = list(blup_files.keys())

    rd = prepare(params, blup_pheno_names=blup_names, log=log)
    gd, pd = rd.geno, rd.pheno

    eng = Step2Engine(params, gd, pd, blup_files, log)
    if blup_files is not None:
        mask_samples_missing_loco(params, pd, blup_files, eng.id_to_ind)
        pd.Neff = pd.masked_indivs.sum(axis=0).astype(np.float64)
        eng.refresh_masks()
    if params.debug:
        # dump model inputs (write_inputs, Data.cpp:2294/911); non-QT
        # offsets are per-chromosome LOCO refits here, so only Y/X dump
        from .prep import write_debug_inputs

        write_debug_inputs(params, pd)

    if params.write_samples:
        # per-trait analyzed-sample lists (write_ids, Pheno.cpp:1539)
        log(" * user specified to write sample IDs for each trait")
        for ph, name in enumerate(pd.pheno_names):
            if not pd.pheno_pass[ph]:
                continue
            with open_write(f"{params.out_prefix}_{name}.regenie.ids") as fh:
                if params.print_pheno_name:
                    # 1st line = pheno name (write_ids, Pheno.cpp:1557)
                    fh.write(f"{name}\tNA\n")
                rows = [
                    f"{s.FID}\t{s.IID}"
                    for i, s in enumerate(gd.samples)
                    if pd.masked_indivs[i, ph]
                ]
                fh.write("\n".join(rows))

    if params.use_null_firth:
        eng.null_firth_files = read_pred_list(params.use_null_firth)

    # step-2 --write-null-firth: stream null Firth coefficients per
    # chromosome so later runs can reuse them (Data.cpp:2200-2215)
    if params.write_null_firth and params.trait_mode == BT and params.firth_approx:
        import os as _os

        fh_map = {}
        with open_write(params.out_prefix + "_firth.list") as fl:
            for ph, name in enumerate(pd.pheno_names):
                if not pd.pheno_pass[ph]:
                    continue
                fpath = params.out_prefix + f"_{ph+1}.firth"
                fh_map[ph] = open_write(fpath)
                fl.write(f"{name} {fpath if params.use_rel_path else _os.path.abspath(fpath)}\n")
        params._null_firth_out = fh_map
        if params.compute_all_chr:
            # --compute-all: prefit null Firth for every chromosome
            # (get_firth_est_allChr, Data.cpp:2209)
            for c in range(1, params.n_chrom + 1):
                try:
                    eng.prep_chrom(c)
                except Exception as e:
                    log(f"WARNING: null fit failed for chr {c}: {e}")
            eng.cur_chrom = None  # force refit during the test loop

    if params.get_cor_mat:
        return run_ldcomp(params, eng, log)

    if getattr(params, "set_list", None):
        from .run_genebased import run_genebased

        return run_genebased(params, eng, log)

    if params.trait_set:
        return run_multitrait(params, eng, log)

    if params.multiphen:
        return run_multiphen(params, eng, log)

    blocks = make_blocks(gd, params.block_size)
    params.total_n_block = len(blocks)
    log(f" * block size: [{params.block_size}]")
    from .utils.stats import usage_info_line
    log(usage_info_line(params))
    log(f" * # blocks: [{params.total_n_block}]")
    log(f" * # tested variants: [{params.n_variants}]")

    test_name = {0: "ADD", 1: "DOM", 2: "REC"}[params.test_type]
    # conditional-GWAS suffix on the marginal rows (Data.cpp:2106)
    condtl = "-CONDTL" if params.gwas_condtl else ""
    writers, out_paths = setup_writers(params, pd.pheno_names, pd.pheno_pass)

    t0 = time.time()
    # --starting-block / --nb window (Data.cpp:2275)
    todo = []
    for block_idx, (chrom, bsnps) in enumerate(blocks, start=1):
        if block_idx < params.starting_block:
            continue
        if params.nb is not None and block_idx >= params.starting_block + params.nb:
            break
        todo.append((chrom, bsnps))

    # one-block lookahead: decode+upload of block k+1 overlaps the device
    # compute and host output of block k (the TPU-era analog of the
    # reference's multithreaded readChunk, Data.cpp:2944)
    from concurrent.futures import ThreadPoolExecutor

    fused = eng.fused_ok()
    if fused:
        mode_name = {QT: "QT", BT: "BT", CT: "CT", T2E: "T2E"}[params.trait_mode]
        src_name = ("BED" if eng.gd._bed is not None
                    else "BGEN" if eng.gd._bgen is not None else "PGEN")
        log(f" * fused packed-bytes scorer active ({mode_name}/{src_name} fast path)")

    def _fetch(bsnps):
        if fused and not (
            eng.gd.sex is not None and eng.non_par_flags(bsnps).any()
            and not eng._fused_chrx_ok()
        ):
            raw = eng.read_block_raw(bsnps)
            if raw is not None:
                # pre-upload on the prefetch thread so H2D of block k+1
                # overlaps the device scoring of block k (idempotent in
                # _fused_upload); first block waits for the consts so
                # the byte-pad width is known
                if getattr(eng, "_fused_chrom", None) is not None:
                    raw = eng._fused_upload(raw)
                    # pre-DISPATCH block k+1's fused score from the
                    # prefetch thread (async device execution): the
                    # device then computes k+1 WHILE the main thread
                    # does block k's host stats/render — without this
                    # the device idles between fetch k and dispatch k+1
                    # (measured ~0.55 pipeline efficiency on the cpu
                    # backend; the reference's decode/compute overlap
                    # has no analog for this gap).  Stamped with the fn
                    # object; a chromosome switch rebuilds the fn and
                    # invalidates the predispatch.
                    fn = getattr(eng, "_fused_fn", None)
                    if (fn is not None and isinstance(raw, jax.Array)
                            and getattr(eng, "_fused_mesh", None) is None
                            and eng._fused_chrom == bsnps[0].chrom):
                        try:
                            outs = fn(raw)
                            return ("raw",
                                    ("predispatched", raw, fn, outs)), None
                        except Exception:  # noqa: BLE001 — fall back
                            pass
                return ("raw", raw), None
        G = eng.read_block_device(bsnps)
        return ("g", G), eng.gd.last_info_num

    pool = ThreadPoolExecutor(max_workers=1)
    # ordered async output: a single writer worker renders + writes
    # block k's rows (native snprintf path releases the GIL) while the
    # device scores block k+1; bounded queue caps buffered results.
    # Interaction runs keep synchronous writes (they interleave extra
    # rows into the same files).
    wpool = ThreadPoolExecutor(max_workers=1)
    wpending: list = []
    try:
        fut = pool.submit(_fetch, todo[0][1]) if todo else None
        tblk = time.time()
        for i, (chrom, bsnps) in enumerate(todo):
            (kind, data), info_num = fut.result()
            if i + 1 < len(todo):
                fut = pool.submit(_fetch, todo[i + 1][1])
            eng._info_num_override = info_num
            eng.prep_chrom(chrom)
            if params.verbose or params.debug:
                # per-block progress + live RSS (the reference's
                # " block N : M snps" + print_mem debug trail,
                # Data.cpp:2311/3007)
                from .utils.stats import rss_line

                now = time.time()
                log(f"   -block {i + 1}/{len(todo)} chr{chrom} "
                    f"[{len(bsnps)} snps, {now - tblk:.2f}s]"
                    + (f" {rss_line()}" if params.debug else ""))
                tblk = now
            if kind == "raw":
                result, _ = eng.test_raw_block_fused(data, bsnps)
            else:
                # standard pipeline (non-fused run, chrX non-PAR dosage
                # compensation, or exotic BGEN layout fallback)
                result, _ = eng.test_raw_block(data, bsnps)
            if eng.interaction is None:
                while len(wpending) > 4:
                    wpending.pop(0).result()
                wpending.append(wpool.submit(
                    write_block_rows, params, pd, writers, bsnps, result,
                    test_name + condtl, eng.model_type() + condtl,
                ))
            else:
                write_block_rows(params, pd, writers, bsnps, result,
                                 test_name + condtl,
                                 eng.model_type() + condtl)
                from .models.interaction import apply_interaction_block

                apply_interaction_block(
                    params, eng, bsnps, eng.last_G_imputed, eng.last_G_res,
                    result, writers, test_name,
                )
    finally:
        # drain + surface writer errors even when scoring raised, so
        # output files close deterministically and a disk-full from the
        # async writer isn't swallowed behind the compute exception
        pool.shutdown(wait=False)
        werr = None
        for w in wpending:
            try:
                w.result()
            except BaseException as e:  # noqa: BLE001 — re-raised below
                werr = werr or e
        wpool.shutdown(wait=True)
        import sys as _sys

        if werr is not None and _sys.exc_info()[0] is None:
            raise werr  # no compute exception in flight to preserve
    if hasattr(eng, "_info_num_override"):
        del eng._info_num_override
    closed = set()
    for fh in writers:
        if fh is not None and id(fh) not in closed:
            fh.close()
            closed.add(id(fh))
    log("\nAssociation results stored separately for each trait in files:")
    for p_ in out_paths:
        log(f"* [{p_}]")
    if params.firth or params.use_spa:
        log(
            f"Number of tests with {'Firth' if params.firth else 'SPA'} correction : {eng.n_corrected}"
        )
        log(f"Number of failed tests : ({eng.n_failed}/{eng.n_corrected})")
    log(f"Number of ignored tests due to low MAC : {eng.n_ignored * params.n_pheno}")
    log(f" * done ({time.time()-t0:.1f}s)")


def run_multitrait(params: Params, eng: Step2Engine, log=print) -> None:
    """Multi-trait testing mode (--mt): 14 joint tests per variant
    (test_multitrait, Data.cpp:3289; compute_tests_mt_multitrait :3436).
    QT only; one merged output file."""
    from .models import step2 as _m2
    from .models.multitrait import mt_header, mt_line, run_mt_block, setup_mt

    if params.trait_mode != QT:
        raise ValueError("multi-trait tests are only supported for QTs")
    gd, pd = eng.gd, eng.pd
    blocks = make_blocks(gd, params.block_size)
    params.total_n_block = len(blocks)
    log(f"Association testing mode (multi-trait tests): {params.n_pheno} traits")
    log(f" * # blocks: [{params.total_n_block}]")

    path = f"{params.out_prefix}.regenie" + (".gz" if params.gz_out else "")
    fh = open_write(path, gz=params.gz_out, parallel_gz=True)
    fh.write(mt_header(params.n_pheno))

    # multi-host: the host-bound per-SNP test kernels shard across
    # processes (rows round-robin; results allgathered and merged in
    # order — the runtime form of the reference's per-machine jobs)
    from .parallel.dist import allgather_py, process_count, process_index

    nproc, ppid = process_count(), process_index()
    if nproc > 1:
        log(f" * multi-host multi-trait: {nproc} processes, SNPs sharded")

    t0 = time.time()
    mt_state = None
    cur_chrom = None
    n_ignored = 0
    for chrom, bsnps in blocks:
        eng.prep_chrom(chrom)
        if chrom != cur_chrom:
            cur_chrom = chrom
            mt_state = setup_mt(eng.res, pd.masked_indivs)
        G_raw = gd.read_block(bsnps)
        sb = eng.block_stats(G_raw)
        total, ns = sb["total"], sb["ns"]
        mac1 = np.minimum(total, 2 * ns - total)
        ignored = mac1 < params.min_mac
        G = finalize_block_step2(
            jnp.asarray(G_raw), eng.ind_j, jnp.zeros(len(bsnps), dtype=bool)
        )
        G_res, scale_fac, low_var = m2.residualize_scale_block(
            G, eng.cov_j, eng.scale_denom
        )
        ignored = ignored | np.asarray(low_var)
        if nproc > 1:
            B_all = len(bsnps)
            sel = np.flatnonzero(np.arange(B_all) % nproc == ppid)
            r_sub = run_mt_block(
                mt_state, np.asarray(G_res)[sel], params)
            parts = allgather_py(
                (sel.tolist(), {k: np.asarray(v) for k, v in r_sub.items()}))
            r = {}
            for idxs, rs in parts:
                for k, v in rs.items():
                    if k not in r:
                        r[k] = np.full((B_all,) + v.shape[1:], np.nan,
                                       dtype=np.asarray(v).dtype)
                    r[k][idxs] = v
        else:
            r = run_mt_block(mt_state, np.asarray(G_res), params)
        n_ignored += int(np.asarray(ignored).sum())
        # columnar native rendering: after the 5-string prefix every
        # mt_line field is %g, so rows render as one prefixed float
        # matrix (per-row Python fallback below)
        from .io.output import block_prefixes, format_float_rows

        Bn = len(bsnps)
        V = np.column_stack(
            [sb["mac"][:, 0], sb["af"][:, 0],
             np.full(Bn, mt_state.neff0), r["minp"], r["minq"], r["logp"],
             r["qnnls"][:, None], r["z_uni"], r["z_pc"], r["z_rpc"],
             r["z_apc"]]
        )
        pre = block_prefixes(bsnps)
        payload = format_float_rows(pre[0], pre[1], V, skip=ignored)
        if payload is not None:
            fh.write(payload)
            continue
        for b in range(Bn):
            if ignored[b]:
                continue
            fh.write(
                mt_line(bsnps[b], sb["mac"][b, 0], sb["af"][b, 0],
                        mt_state.neff0, r, b)
            )
    fh.close()
    log(f"Results written to [{path}]")
    log(f"Number of ignored tests due to low MAC : {n_ignored}")
    log(f" * done ({time.time()-t0:.1f}s)")


def run_multiphen(params: Params, eng: Step2Engine, log=print) -> None:
    """MultiPhen testing mode (--multiphen): reverse ordinal regression
    of genotype on all traits (test_multiphen, Data.cpp:3505). QT only;
    one merged output file."""
    from .models.multiphen import (multiphen_block, multiphen_header,
                                   multiphen_line, multiphen_snp)

    if params.trait_mode != QT:
        raise ValueError("MultiPhen test for QTs only")
    gd, pd = eng.gd, eng.pd
    blocks = make_blocks(gd, params.block_size)
    params.total_n_block = len(blocks)
    log(f"Association testing mode (MultiPhen): {params.n_pheno} traits")
    log(f" * # blocks: [{params.total_n_block}]")

    path = f"{params.out_prefix}.regenie" + (".gz" if params.gz_out else "")
    fh = open_write(path, gz=params.gz_out, parallel_gz=True)
    fh.write(multiphen_header())
    mask0 = pd.masked_indivs[:, 0]

    # multi-host: the POM fits are host-bound — shard SNPs across
    # processes, allgather the rendered lines, write in order
    from .parallel.dist import allgather_py, process_count, process_index

    nproc, ppid = process_count(), process_index()
    if nproc > 1:
        log(f" * multi-host MultiPhen: {nproc} processes, SNPs sharded")

    t0 = time.time()
    n_ignored = 0
    for chrom, bsnps in blocks:
        eng.prep_chrom(chrom)
        G_raw = gd.read_block(bsnps)
        sb = eng.block_stats(G_raw, bsnps)
        ignored = sb["mac1"] < params.min_mac
        Gf = np.asarray(G_raw, dtype=np.float64)
        lines = {}
        n_ignored += int(ignored.sum())
        local = [b for b in range(len(bsnps)) if not ignored[b]
                 and (nproc == 1 or b % nproc == ppid)]
        if os.environ.get("REGENIE_TPU_NO_BATCH_MPHEN"):
            results = {b: multiphen_snp(params, Gf[b], pd.new_cov,
                                        eng.res, mask0) for b in local}
        else:
            # batched score stage over the block; per-SNP path only for
            # LRT escalations / non-default modes (multiphen_block)
            results = multiphen_block(params, Gf, pd.new_cov, eng.res,
                                      mask0, local)
        for b, r in results.items():
            lines[b] = multiphen_line(bsnps[b], sb["mac1"][b], sb["af1"][b],
                                      sb["ns"][b], r)
        if nproc > 1:
            for part in allgather_py(lines):
                lines.update(part)
        for b in sorted(lines):
            fh.write(lines[b])
    fh.close()
    log(f"Results written to [{path}]")
    log(f"Number of ignored tests due to low MAC : {n_ignored}")
    log(f" * done ({time.time()-t0:.1f}s)")


def run_ldcomp(params: Params, eng: Step2Engine, log=print) -> None:
    """LD-matrix mode (--compute-corr): scaled G'G over the extracted
    variant list (ld_comp, Data.cpp:3807; print_ld :4350)."""
    gd, pd = eng.gd, eng.pd
    ind = pd.ind_in_analysis

    # --ld-extract: ordered list of single variants and burden masks
    # (check_ld_list, Geno.cpp:1442-1495)
    names: List[str] = []
    cols: List[np.ndarray] = []
    absent: List[str] = []  # --forcein-vars: kept as zero vectors
    if params.ld_list_file:
        id_to_snp = {s.ID: s for s in gd.snps}
        want_masks: Dict[str, List[str]] = {}
        order = []
        for toks in iter_lines(params.ld_list_file):
            if len(toks) < 2:
                raise ValueError("incorrectly formatted --ld-extract file")
            if toks[0] == "sv":
                order.append(("sv", toks[1]))
            elif toks[0] == "mask":
                if len(toks) < 3:
                    raise ValueError("mask rows need 3 entries in --ld-extract")
                order.append(("mask", toks[1]))
                want_masks.setdefault(toks[2], []).append(toks[1])
            else:
                raise ValueError(f"unrecognized --ld-extract entry '{toks[0]}'")
        mask_vecs: Dict[str, np.ndarray] = {}
        if want_masks:
            from .run_genebased import build_requested_masks

            mask_vecs = build_requested_masks(params, eng, want_masks, log)
        zero = np.zeros(params.n_samples)
        for kind, name in order:
            if kind == "sv":
                if name not in id_to_snp:
                    # forced-in absent variant: zero column in the LD
                    # matrix (get_G_indices, Data.cpp:3850-3860)
                    names.append(name)
                    cols.append(zero)
                    absent.append(name)
                    continue
                g = gd.read_block_scattered([id_to_snp[name]]).astype(np.float64)[0]
                names.append(name)
                cols.append(g)
            else:
                if name in mask_vecs:
                    names.append(name)
                    cols.append(mask_vecs[name])
                else:
                    names.append(name)
                    cols.append(zero)
                    absent.append(name)
        G = np.stack(cols) if cols else np.zeros((0, params.n_samples))
    elif params.cormat_force_vars and params.extract_files:
        # --forcein-vars + --extract: LD matrix follows the extract-file
        # order; listed variants absent from the genotype data stay in as
        # zero vectors (check_in_map_from_files, Geno.cpp:1343-1380)
        id_to_snp = {s.ID: s for s in gd.snps}
        seen = set()
        order_ids: List[str] = []
        for toks in iter_lines(params.extract_files[0]):
            if not toks or toks[0] in seen:
                continue
            seen.add(toks[0])
            order_ids.append(toks[0])
        present = [n for n in order_ids if n in id_to_snp]
        Gp = gd.read_block_scattered([id_to_snp[n] for n in present]).astype(np.float64)
        prow = {n: i for i, n in enumerate(present)}
        G = np.zeros((len(order_ids), params.n_samples))
        for i, n in enumerate(order_ids):
            if n in prow:
                G[i] = Gp[prow[n]]
            else:
                absent.append(n)
        names = order_ids
    else:
        snps = gd.snps
        names = [s.ID for s in snps]
        G = gd.read_block_scattered(snps).astype(np.float64)

    M = len(names)
    log(f"** Computing LD matrix ** ({M} variants)")
    # mean-impute, mask, residualize on covariates (no scaling if skip_scaleG)
    for k in range(M):
        m = (G[k] != -3) & ind
        mu = G[k][m].mean() if m.any() else 0.0
        G[k] = np.where((G[k] == -3) | ~ind, np.where(~ind, 0.0, mu), G[k])
        G[k] = np.where(~ind, 0.0, np.where(G[k] == -3, mu, G[k]))
    # covariate projection + Gram on the accelerator (MXU)
    G_j = jnp.asarray(G)
    cov_j = jnp.asarray(pd.new_cov)
    G_j = G_j - m2.mm(m2.mm(G_j, cov_j), cov_j.T)
    LD = np.array(m2.mm(G_j, G_j.T))  # writable host copy (diag edits below)
    G = np.asarray(G_j)

    # snplist
    with open_write(params.out_prefix + ".corr.snplist") as fh:
        for nm in names:
            fh.write(nm + "\n")
    if absent:
        log(" WARNING: there were variants/masks not found in the data; "
            "these were kept in the LD matrix.\n  + list is written to "
            f"[{params.out_prefix}.corr.forcedIn.snplist]")
        with open_write(params.out_prefix + ".corr.forcedIn.snplist") as fh:
            for nm in absent:
                fh.write(nm + "\n")

    # negative but numerically-zero diagonal entries (rounding error):
    # zero those rows/cols (ld_comp, Data.cpp:4104-4108; params.tol=1e-8)
    dvec = np.diag(LD)
    bad = (dvec < 0) & (np.abs(dvec) < 1e-8)
    if bad.any():
        LD[bad, :] = 0.0
        LD[:, bad] = 0.0

    if not params.skip_scaleG:
        d = np.diag(LD)
        sds = np.sqrt(np.where(d <= 0, params.numtol, d))
        np.fill_diagonal(LD, sds**2)  # Data.cpp:4112-4113
        LD = LD / sds[:, None] / sds[None, :]
    else:
        # keep covariance; clamp the diagonal (Data.cpp:4117)
        np.fill_diagonal(LD, np.maximum(np.diag(LD), params.numtol))

    if params.ld_sparse_thr > 0:
        # sparse text format (Data.cpp:4123-4140): "M N" header (implied
        # by --skip-scaleG, setup_output Data.cpp:1993), one line of
        # per-variant SDs, then 1-based "i j corr" rows for the upper
        # triangle where |corr| >= thr
        with open_write(params.out_prefix + ".corr") as fh:
            fh.write(f"{M} {params.n_samples}\n")
            sds = np.sqrt(np.diag(LD))
            fh.write(" ".join(fmt(s) for s in sds) + "\n")
            C = LD / sds[:, None] / sds[None, :]
            iu_i, iu_j = np.triu_indices(M, k=1)
            keep = np.abs(C[iu_i, iu_j]) >= params.ld_sparse_thr
            fh.write("".join(
                f"{i+1} {j+1} {fmt(C[i, j])}\n"
                for i, j in zip(iu_i[keep], iu_j[keep])
            ))
    elif params.cor_out_txt:
        with open_write(params.out_prefix + ".corr") as fh:
            if params.skip_scaleG:
                # "M N" header precedes the matrix (setup_output,
                # Data.cpp:1993)
                fh.write(f"{M} {params.n_samples}\n")
            from .io.output import format_float_rows

            payload = None
            if M > 0:
                # first column renders as the row "prefix", the rest as
                # the %g float matrix; rows join with single newlines
                buf = bytearray()
                off = np.zeros(M + 1, np.int64)
                for i in range(M):
                    buf += fmt(LD[i, 0]).encode()
                    off[i + 1] = len(buf)
                payload = format_float_rows(
                    np.frombuffer(bytes(buf), np.uint8), off, LD[:, 1:]
                )
            if payload is not None:
                fh.write(payload[:-1])  # newline separates, not ends
            else:
                for i in range(M):
                    fh.write(" ".join(fmt(LD[i, j]) for j in range(M)))
                    if i < M - 1:
                        fh.write("\n")
    else:
        # binary: int32 [n_samples, M] header (setup_output,
        # Data.cpp:1996-2000) then uint16-quantized r^2 upper triangle
        # (print_ld, Data.cpp:4440)
        mult = (1 << 16) - 1
        iu = np.triu_indices(M, k=1)
        vals = (LD[iu] ** 2 * mult + 0.5).astype(np.uint16)
        with open(params.out_prefix + ".corr", "wb") as fh:
            fh.write(np.array([params.n_samples, M], dtype=np.int32).tobytes())
            fh.write(vals.tobytes())
    log(f" * wrote [{params.out_prefix}.corr]")
