"""Gene-based testing driver: burden masks (+ SKAT/ACAT family and joint
tests) per variant set.

Replaces the reference's Data::test_joint (Data.cpp:2629),
set_groups_for_testing (:2819), get_sum_stats/getMask (:2906/:2975).
"""

from __future__ import annotations

import time
from typing import Dict, List, Optional

import numpy as np

from .config import QT, Params
from .io.bed import SnpInfo, chr_to_int
from .io.files import open_write
from .io.setfiles import (
    read_anno_labels,
    read_annotations,
    read_mask_defs,
    read_setlist,
)
from .models.masks import BuiltMask, aaf_bin_values, build_masks_for_set
from .run_step2 import Step2Engine, setup_writers, write_block_rows, BlockResult


def run_genebased(params: Params, eng: Step2Engine, log=print) -> None:
    gd, pd = eng.gd, eng.pd
    t0 = time.time()

    snp_id_to_idx = {s.ID: i for i, s in enumerate(gd.snps)}
    snp_chroms = np.array([s.chrom for s in gd.snps])

    cat_bit, cat_disp = (read_anno_labels(params.anno_labels_file)
                     if params.anno_labels_file else (None, None))
    anno, cat_bit, with_domains, domains, region_names = read_annotations(
        params.anno_file, snp_id_to_idx, cat_bit,
        weight_col=params.vc_weight_col if params.vc_with_weights else 0,
    )
    eng._set_weights = getattr(read_annotations, "set_weights", {})
    if with_domains:
        n_dom = sum(len(v) for v in region_names.values())
        log(f"   +number of domains across all sets = {n_dom}")
    mask_defs = read_mask_defs(params.mask_def, cat_bit, log, display=cat_disp)
    all_bits = 0
    for md in mask_defs:
        all_bits |= md.bits

    chr_filter = None
    if params.chr_list:
        chr_filter = {chr_to_int(c, params.n_chrom) for c in params.chr_list}
    sets = read_setlist(
        params, params.set_list, snp_id_to_idx, snp_chroms, anno, all_bits,
        chr_filter, log,
    )
    aafs = aaf_bin_values(params)

    # LODO mode: restrict to the named set/mask, single AAF bin
    # (mask_loo_set/mask_loo_name/mbins, Regenie.cpp:988-992; sets with a
    # different name are skipped, Geno.cpp:3680/3913)
    if params.mask_lodo:
        lodo_toks = params.mask_lodo.split(",")
        if not with_domains:
            raise ValueError(
                "--mask-lodo requires 4-column annotations with domains"
            )
        sets = [s for s in sets if s.ID == lodo_toks[0]]
        if not sets:
            raise ValueError(
                f"set '{lodo_toks[0]}' not found for LODO (or set name "
                "does not match the annotation file)"
            )
        mask_defs = [m for m in mask_defs if m.name == lodo_toks[1]]
        if not mask_defs:
            raise ValueError(f"mask '{lodo_toks[1]}' not found for LODO")
        if lodo_toks[2] == "singleton":
            aafs = []
        else:
            aafs = [1.0 if lodo_toks[2] == "all" else float(lodo_toks[2])]

    # user-given AAFs (--aaf-file, read_aafs Geno.cpp:3790)
    file_aaf, force_singleton = None, None
    if params.set_aaf_file:
        from .io.setfiles import read_aaf_file

        file_aaf, force_singleton = read_aaf_file(
            params.set_aaf_file, snp_id_to_idx, len(gd.snps),
            params.aaf_file_wSingletons,
        )
        log(f" * user-given AAFs: [{params.set_aaf_file}]")
    log(f" * set file: [{params.set_list}] n_sets = {len(sets)}")
    log(f" * masks: {[m.name for m in mask_defs]}")
    log(f" * aaf cutoffs: [ {len(aafs)} : " + " ".join(str(a) for a in aafs) + " ] + singletons")

    # ##MASKS=<M1="cats";...> meta line (build_header, Masks.cpp:1245)
    mask_hdr = "##MASKS=<" + ";".join(
        f'{md.name}="{",".join(md.cats)}"' for md in mask_defs
    ) + ">\n"
    writers, out_paths = setup_writers(params, pd.pheno_names, pre_header=mask_hdr)
    vc_writers = None
    if params.vc_tests:
        from .models import skat as skat_mod

        skat_mod.check_tests(params.vc_tests)

    if params.remeta_save_ld:
        from .io.remeta import RegenieLDMatrixWriter

        log(" * saving SKAT LD matrices for REMETA")
        eng.remeta_writers = [
            RegenieLDMatrixWriter(
                f"{params.out_prefix}_{name}", int(pd.Neff[ph])
            ) if pd.pheno_pass[ph] else None
            for ph, name in enumerate(pd.pheno_names)
        ]

    # --check-burden-files: consistency report across set/anno/mask files
    # (check_sets..., Geno.cpp via --check-burden-files, Regenie.cpp:250)
    if params.check_burden_files:
        rpt = params.out_prefix + "_masks_report.txt"
        with open_write(rpt) as fh:
            fh.write("##Checking annotation/set-list/mask files\n")
            known_cats = set(cat_bit)
            for md in mask_defs:
                fh.write(f"Mask {md.name}: OK\n")
            for vs_ in sets:
                miss = [
                    i for i in vs_.snp_indices if (i, vs_.ID) not in anno
                ]
                if miss:
                    ids_ = ",".join(gd.snps[i].ID for i in miss[:10])
                    fh.write(
                        f"Set {vs_.ID}: {len(miss)} variants without annotation "
                        f"(assigned NULL): {ids_}\n"
                    )
        log(f" * burden file check written to [{rpt}]")

    # --write-setlist: group written masks into new set lists
    # (prep_setlists/make_setlist, Masks.cpp:1270/1361)
    setlist_groups = None
    if params.write_masks and params.write_setlist:
        from .io.files import iter_lines as _il

        setlist_groups = []  # (suffix, set of mask names, fh)
        for toks in _il(params.write_setlist):
            if len(toks) < 2:
                raise ValueError("write-setlist line has too few entries")
            names = set()
            for t in toks[1:]:
                names |= set(t.split(","))
            fh = open_write(f"{params.out_prefix}_{toks[0]}.setlist")
            setlist_groups.append((toks[0], names, fh))

    mask_bed = _MaskBedWriter(params, gd) if params.write_masks else None
    snplist_fh = (
        open_write(params.out_prefix + "_masks.snplist")
        if params.write_mask_snplist
        else None
    )

    # LOVO mode: restrict to the specified set/mask/bin (mask_loo,
    # Geno.cpp:3913; computeMasks_loo)
    lovo_spec = None
    if params.mask_lovo:
        toks = params.mask_lovo.split(",")
        if len(toks) < 3:
            raise ValueError("--mask-lovo expects SET,MASK,AAF_BIN")
        lovo_spec = toks
        sets = [s for s in sets if s.ID == toks[0]]
        if not sets:
            raise ValueError(f"set '{toks[0]}' not found for LOVO")
        mask_defs = [m for m in mask_defs if m.name == toks[1]]
        if not mask_defs:
            raise ValueError(f"mask '{toks[1]}' not found for LOVO")

    # order sets by chromosome (file order), then set position
    sets.sort(key=lambda s: (s.chrom, s.physpos))

    # Sets process in BUCKETS of consecutive sets (global order): stage 1
    # runs the per-set host work (IO, stats, mask building, burden test,
    # VC prep), then ONE batched device call computes every set's VC
    # score products (ops.vc_batch — 2-bit codes ship instead of dense
    # f64, the decode/impute/weight chain runs on-chip), then stage 3
    # renders rows per set in order. Bucket composition is a pure
    # function of the global set list, and the batched kernel is
    # composition-invariant per slot, so bucketed == per-set bytes.
    #
    # multi-host: shard BUCKETS across processes (sets are independent —
    # the TPU-runtime form of the reference's per-machine gene jobs).
    # Each process reads + tests only its buckets on its LOCAL devices
    # (no global-mesh collectives, which would deadlock on divergent
    # per-process work), buffers its rendered rows, and the ordered
    # merge all-gathers them so host 0 writes in set order.
    import os as _os

    from .parallel.dist import allgather_py, process_count, process_index

    nproc, pid = process_count(), process_index()
    shard_sets = (
        nproc > 1 and not params.write_masks
        and not params.write_mask_snplist and not params.remeta_save_ld
    )
    if shard_sets:
        eng.mesh = None  # local compute only (see above)
        log(f" * multi-host gene-based: {nproc} processes, set buckets "
            "(sets sharded round-robin)")
    uniq_writers: List = []
    seen = set()
    for w in writers:
        if w is not None and id(w) not in seen:
            seen.add(id(w))
            uniq_writers.append(w)
    buffered = []  # (set_idx, [payload per unique writer])

    class _RowBuffer:
        __slots__ = ("parts",)

        def __init__(self):
            self.parts = []

        def write(self, s):
            self.parts.append(s)

        def value(self):
            return "".join(self.parts)

    bucket_size = max(1, int(_os.environ.get("REGENIE_TPU_GENE_BUCKET", "32")))
    n_buckets = -(-len(sets) // bucket_size) if sets else 0

    # stage attribution (REGENIE_TPU_GENE_PROFILE=1): seconds per loop
    # stage, logged as a table at the end of the run
    _prof_on = bool(_os.environ.get("REGENIE_TPU_GENE_PROFILE"))
    _prof: Dict[str, float] = {}

    class _stage:
        __slots__ = ("k", "t0")

        def __init__(self, k):
            self.k = k

        def __enter__(self):
            self.t0 = time.perf_counter()

        def __exit__(self, *exc):
            _prof[self.k] = _prof.get(self.k, 0.0) + (
                time.perf_counter() - self.t0)

    def _stage1_prepare(set_idx, vset, snps, G, sb):
        """Host-side stage-1 work for one set: mask building plus the
        aux mask writers.  Device calls (block_stats, the burden mask
        test) are hoisted to the GROUP level so one batched call and
        one packed fetch serve many sets — on a remote-tunneled TPU
        the per-set round trips were the measured set-loop hot spot.
        Returns (bufs, writers_set, built, ignored)."""
        bufs = {id(w): _RowBuffer() for w in uniq_writers}
        writers_set = [None if w is None else bufs[id(w)] for w in writers]
        total, ns = sb["total"], sb["ns"]
        mac1 = np.minimum(total, 2 * ns - total)
        ignored = mac1 < params.min_mac  # 0.5 in mask mode: drops monomorphic
        af1 = total / (2.0 * ns)

        anno_bits = np.array(
            [anno.get((i, vset.ID), 1) for i in vset.snp_indices], dtype=np.uint64
        )

        # 4-column annotations: expand masks per domain + all-domain mask
        # (GenoMask::setBins w_regions branch, Masks.cpp:134-155)
        set_mask_defs = mask_defs
        region_bits = None
        if with_domains and vset.ID in region_names:
            from .io.setfiles import MaskDef

            rnames = region_names[vset.ID]
            allbits = (1 << len(rnames)) - 1
            set_mask_defs = []
            for md in mask_defs:
                for k, rn in enumerate(rnames):
                    if params.mask_lodo:
                        set_mask_defs.append(MaskDef(
                            md.name, md.bits, f"LODO_{rn}.", allbits & ~(1 << k)
                        ))
                    else:
                        set_mask_defs.append(
                            MaskDef(md.name, md.bits, f"{rn}.", 1 << k)
                        )
                set_mask_defs.append(MaskDef(md.name, md.bits, "", allbits))
            region_bits = np.array(
                [domains.get((i, vset.ID), 0) for i in vset.snp_indices],
                dtype=np.uint64,
            )

        if lovo_spec is not None:
            from .models.masks import build_lovo_masks

            built = build_lovo_masks(
                params, vset, G.astype(np.float64), af1, mac1, ignored,
                anno_bits, mask_defs[0], lovo_spec[2],
                [s.ID for s in snps], pd.masked_indivs, pd.ind_in_analysis,
            )
        else:
            aaf_custom = None
            singleton_custom = None
            if file_aaf is not None:
                fa = file_aaf[vset.snp_indices]
                aaf_custom = np.where(fa >= 0, fa, af1)
                if force_singleton is not None:
                    singleton_custom = force_singleton[vset.snp_indices]
            built, _ = build_masks_for_set(
                params, vset, G.astype(np.float64), af1, mac1, ignored, anno_bits,
                set_mask_defs, aafs, pd.masked_indivs, pd.ind_in_analysis,
                aaf_custom=aaf_custom, singleton_custom=singleton_custom,
                region_bits=region_bits,
            )

        if mask_bed is not None:
            for bm in built:
                mask_bed.add(bm)
        if setlist_groups is not None:
            for _sfx, names, fh in setlist_groups:
                ids = [
                    bm.snp.ID for bm in built
                    if bm.mask_name in names
                    or f"{bm.mask_name}.{bm.bin_name}" in names
                ]
                if ids:
                    fh.write(
                        f"{vset.ID} {vset.chrom} {vset.physpos} " + ",".join(ids) + "\n"
                    )
        if snplist_fh is not None:
            # maskID chrom pos v1,v2,... (make_snplist, Masks.cpp:1350)
            for bm in built:
                sel_ids = [snps[k].ID for k in bm.sel_idx]
                snplist_fh.write(
                    f"{bm.snp.ID}\t{bm.snp.chrom}\t{bm.snp.physpos}\t" + ",".join(sel_ids) + "\n"
                )
        return bufs, writers_set, built, ignored

    # group size for the batched stats / mask-test calls: the dense
    # concatenated [sum(M), N] G of one group is bounded by this many
    # megabytes (f64)
    group_cap = float(
        _os.environ.get("REGENIE_TPU_GENE_GROUP_MB", "1024")) * 1e6

    for b_idx in range(n_buckets):
        if shard_sets and b_idx % nproc != pid:
            continue
        staged = []  # (set_idx, vset, built, burden_result, bufs, vc_prep)
        b_lo = b_idx * bucket_size
        b_hi = min((b_idx + 1) * bucket_size, len(sets))
        groups, cur, cur_b = [], [], 0.0
        for set_idx in range(b_lo, b_hi):
            m_b = len(sets[set_idx].snp_indices) * float(params.n_samples) * 8.0
            if cur and cur_b + m_b > group_cap:
                groups.append(cur)
                cur, cur_b = [], 0.0
            cur.append(set_idx)
            cur_b += m_b
        if cur:
            groups.append(cur)
        for group in groups:
            # pass A: read every set's raw block, then ONE batched stats
            # call for the whole group (block_stats takes no bsnps here,
            # so it is chromosome-free and the concat may span chroms);
            # per-set stats are row slices of the single packed fetch
            reads = []
            with _stage("read"):
                for set_idx in group:
                    vset = sets[set_idx]
                    snps = [gd.snps[i] for i in vset.snp_indices]
                    G = gd.read_block_scattered(snps)  # [M, N], missing=-3
                    reads.append((set_idx, vset, snps, G))
            with _stage("stats:dev"):
                if len(reads) > 1:
                    sb_all = eng.block_stats(
                        np.concatenate([t[3] for t in reads], axis=0))
                else:
                    sb_all = eng.block_stats(reads[0][3])
            sb_slices = []
            off = 0
            for t in reads:
                m = t[3].shape[0]
                sb_slices.append(
                    {k: v[off : off + m] for k, v in sb_all.items()})
                off += m
            # pass B: per-set host mask building + aux mask writers
            pend = []
            for (set_idx, vset, snps, G), sb in zip(reads, sb_slices):
                with _stage("masks:host"):
                    bufs, writers_set, built, ignored = _stage1_prepare(
                        set_idx, vset, snps, G, sb)
                pend.append(dict(
                    set_idx=set_idx, vset=vset, snps=snps, G=G, sb=sb,
                    built=built, ignored=ignored, bufs=bufs,
                    writers_set=writers_set, r=None))
            if params.skip_test:
                continue  # --skip-test: masks written, no association
            # pass C: ONE batched burden-mask test per chromosome run
            # (test_prepared_block scores each pseudo-variant row
            # independently against the chromosome's LOCO residuals, so
            # concatenated sets == per-set calls, row for row)
            i = 0
            while i < len(pend):
                j = i
                while (j < len(pend)
                       and pend[j]["vset"].chrom == pend[i]["vset"].chrom):
                    j += 1
                run = [e for e in pend[i:j] if e["built"]]
                if run:
                    with _stage("burden:dev"):
                        eng.prep_chrom(pend[i]["vset"].chrom)
                        all_built = [bm for e in run for bm in e["built"]]
                        r_all = _test_masks(eng, all_built)
                    off = 0
                    for e in run:
                        m = len(e["built"])
                        e["r"] = r_all.slice_rows(off, off + m)
                        off += m
                i = j
            # pass D: per-set burden rows + VC prep + staging (set order)
            for e in pend:
                set_idx, vset, built = e["set_idx"], e["vset"], e["built"]
                eng.prep_chrom(vset.chrom)
                r = e["r"]
                if built and r is not None and not params.p_joint_only:
                    write_block_rows(
                        params, pd, e["writers_set"],
                        [bm.snp for bm in built], r,
                        model_type=eng.model_type())
                prep = None
                if params.vc_tests:
                    from .models import skat as skat_mod

                    with _stage("vcprep:host"):
                        prep = skat_mod.vc_prep(
                            params, eng, vset, e["snps"], e["G"], e["sb"],
                            e["ignored"], built, log)
                staged.append((set_idx, vset, built, r, e["bufs"], prep))

        # stage 2: ONE batched device call for the bucket's VC products
        if params.vc_tests and any(t[5] is not None for t in staged):
            from .models import skat as skat_mod

            with _stage("vcprod:dev"):
                skat_mod.vc_products_batched(
                    params, eng, [t[5] for t in staged if t[5] is not None]
                )

        # stage 3: per-set host tails + row rendering, in set order.
        # The QT VC tails (Davies/Kuonen/SKATO sweeps) are PURE per set
        # (vc_compute_qt), so they fan out over a host thread pool —
        # numpy's transcendental kernels release the GIL — while row
        # rendering stays sequential in set order (the reference threads
        # its set chunks with OpenMP the same way, SKAT.cpp loops).
        vc_futs = {}
        pool = None
        if params.vc_tests and staged:
            from .models import skat as skat_mod

            # opt-in: on the 4-core dev box the pool LOSES (the SKATO
            # glue is GIL-bound python between the GIL-releasing numpy
            # sweeps; measured 13.3s vs 11.3s sequential on the 60-set
            # fixture) — hosts with many cores and many phenotypes can
            # enable it, where the per-call numpy work is long enough
            # to overlap
            nthr = int(_os.environ.get("REGENIE_TPU_GENE_THREADS", "1"))
            qt_preps = [
                (si, t[5]) for si, t in enumerate(staged)
                if t[5] is not None and not t[5].is_bt
            ]
            if nthr > 1 and len(qt_preps) > 1:
                from concurrent.futures import ThreadPoolExecutor

                pool = ThreadPoolExecutor(max_workers=nthr)
                vc_futs = {
                    si: pool.submit(skat_mod.vc_compute_qt, params, p)
                    for si, p in qt_preps
                }
        try:
            for si, (set_idx, vset, built, r, bufs, prep) in enumerate(staged):
              writers_set = [None if w is None else bufs[id(w)] for w in writers]
              eng.prep_chrom(vset.chrom)
              if params.verbose or params.debug:
                  # per-set debug trail (getMask print_mem, Data.cpp:3007)
                  from .utils.stats import rss_line

                  log(f"   -set {vset.ID} [chr {vset.chrom}]"
                      + (f" {rss_line()}" if params.debug else ""))
              eng._last_mask_result = r
              if params.vc_tests:
                  from .models import skat as skat_mod

                  eng._last_vc_results = {}
                  if prep is not None:
                      with _stage("vctails:host"):
                          skat_mod.vc_finish(
                              params, eng, vset, prep, writers_set, log,
                              computed=(vc_futs[si].result()
                                        if si in vc_futs else None))

              # joint tests on burden p-values
              if params.apply_gene_pval_strategy:
                  from .models import joint as joint_mod

                  joint_mod.run_gene_p(params, eng, vset, built, writers_set, log)
              elif params.joint_tests:
                  from .models import joint as joint_mod

                  joint_mod.run_joint_tests(params, eng, vset, built, writers_set, log)

              if shard_sets:
                  buffered.append(
                      (set_idx, [bufs[id(w)].value() for w in uniq_writers])
                  )
              else:
                  for w in uniq_writers:
                      payload = bufs[id(w)].value()
                      if payload:
                          w.write(payload)
        finally:
            # reap worker threads even when the render loop raises so an
            # error can't leave unconsumed vc futures running behind us
            if pool is not None:
                pool.shutdown(wait=False, cancel_futures=True)

    if shard_sets:
        # ordered multi-host merge: all processes exchange their rows,
        # host 0's real writers render them in set order (non-output
        # hosts hold null sinks, so the replay is a no-op there)
        merged = sorted(
            (item for part in allgather_py(buffered) for item in part),
            key=lambda t: t[0],
        )
        for _si, payloads in merged:
            for k, w in enumerate(uniq_writers):
                if payloads[k]:
                    w.write(payloads[k])

    for fh in writers:
        fh.close()
    if getattr(eng, "remeta_writers", None):
        for wr in eng.remeta_writers:
            if wr is not None:
                wr.close()
    if setlist_groups is not None:
        for _sfx, _names, fh in setlist_groups:
            fh.close()
    if mask_bed is not None:
        mask_bed.close()
    if snplist_fh is not None:
        snplist_fh.close()
    log("\nAssociation results stored separately for each trait in files:")
    for p_ in out_paths:
        log(f"* [{p_}]")
    if mask_bed is not None:
        log(f"Masks written to : [{params.out_prefix}_masks.{{bed,bim,fam}}]")
    if _prof_on and _prof:
        tot = sum(_prof.values()) or 1.0
        log(" * gene-based stage attribution (s):")
        for k, v in sorted(_prof.items(), key=lambda t: -t[1]):
            log(f"     {k:12s} {v:8.2f}  ({100 * v / tot:.0f}%)")
    log(f" * done ({time.time()-t0:.1f}s)")


def _test_masks(eng: Step2Engine, built: List[BuiltMask]) -> BlockResult:
    """Run the association engine on built masks as pseudo-variants.

    The mask-row axis pads up to a power-of-two bucket (floor 16) so the
    group-batched calls — whose row counts vary per group — reuse ONE
    compiled score executable instead of recompiling per shape.  Padded
    rows are zero-G, ignored, all-trait-masked pseudo-variants; they are
    sliced off before any consumer sees them and rolled back out of the
    engine's n_ignored tally."""
    P = eng.params.n_pheno
    B = len(built)
    Bp = 1 << max(4, (B - 1).bit_length())
    npad = Bp - B
    G = np.stack([bm.G for bm in built] + [
        np.zeros_like(built[0].G) for _ in range(npad)])
    af_t = np.stack([bm.af_t for bm in built] + [
        np.zeros_like(built[0].af_t) for _ in range(npad)])
    ns_t = np.stack([bm.ns_t for bm in built] + [
        np.zeros_like(built[0].ns_t) for _ in range(npad)])
    mac_t = np.stack([bm.mac_t for bm in built] + [
        np.zeros_like(built[0].mac_t) for _ in range(npad)])
    ignored = np.arange(Bp) >= B
    ignored_trait = np.stack([bm.ignored_trait for bm in built] + [
        np.ones_like(built[0].ignored_trait) for _ in range(npad)])
    flipped = np.array([bm.flipped for bm in built] + [False] * npad)
    r = eng.test_prepared_block(
        G, af_t, ns_t, mac_t, ignored, ignored_trait, flipped, is_mask=True
    )
    if npad:
        eng.n_ignored -= npad  # padding rows are not real tests
        r = r.slice_rows(0, B)
        if eng.last_G_res is not None:
            eng.last_G_res = eng.last_G_res[:B]
        if getattr(eng, "last_scale_fac", None) is not None:
            eng.last_scale_fac = eng.last_scale_fac[:B]
    if eng.params.htp_out:
        # genotype class counts from the pre-imputation mask vectors
        # (update_genocounts on the collapsed mask, Masks.cpp path)
        raw = np.stack([
            bm.raw_vec if bm.raw_vec is not None else bm.G for bm in built
        ])
        r.genocounts = eng.compute_genocounts(raw, [bm.snp for bm in built])
    return r


class _MaskBedWriter:
    """Write built masks as PLINK bed/bim/fam (make_genovec/write_genovec/
    write_genobim, Masks.cpp:1177-1349)."""

    def __init__(self, params: Params, gd):
        self.params = params
        self.n = params.n_samples
        self.bed = open(params.out_prefix + "_masks.bed", "wb")
        self.bed.write(b"\x6c\x1b\x01")
        self.bim = open_write(params.out_prefix + "_masks.bim")
        with open_write(params.out_prefix + "_masks.fam") as fam:
            for s in gd.samples:
                fam.write(f"{s.FID}\t{s.IID}\t0\t0\t{s.sex}\t0\n")

    def add(self, bm: BuiltMask):
        v = bm.raw_vec
        hc = np.where(v < 0, -3, np.round(np.clip(v, 0, 2))).astype(np.int8)
        # plink 2-bit codes, ref-last: 2->00, missing->01, 1->10, 0->11
        codes = np.where(hc == 2, 0, np.where(hc == -3, 1, np.where(hc == 1, 2, 3))).astype(
            np.uint8
        )
        pad = (-len(codes)) % 4
        if pad:
            codes = np.concatenate([codes, np.zeros(pad, dtype=np.uint8)])
        codes = codes.reshape(-1, 4)
        byts = (
            codes[:, 0] | (codes[:, 1] << 2) | (codes[:, 2] << 4) | (codes[:, 3] << 6)
        ).astype(np.uint8)
        self.bed.write(byts.tobytes())
        s = bm.snp
        self.bim.write(f"{s.chrom}\t{s.ID}\t0\t{s.physpos}\t{s.allele2}\t{s.allele1}\n")

    def close(self):
        self.bed.close()
        self.bim.close()


def build_requested_masks(params, eng, want: Dict[str, List[str]], log):
    """Build specific burden masks for the LD-extract mode
    (--ld-extract mask rows; check_ld_list Geno.cpp:1475-1485).

    want: {set_id: [mask IDs like 'SET1.M1.0.01']}. Returns
    {mask_id: [N] genotype vector (missing=-3)}."""
    gd, pd = eng.gd, eng.pd
    snp_id_to_idx = {s.ID: i for i, s in enumerate(gd.snps)}
    snp_chroms = np.array([s.chrom for s in gd.snps])
    cat_bit, cat_disp = (read_anno_labels(params.anno_labels_file)
                     if params.anno_labels_file else (None, None))
    anno, cat_bit, _wd, _dom, _rn = read_annotations(
        params.anno_file, snp_id_to_idx, cat_bit
    )
    mask_defs = read_mask_defs(params.mask_def, cat_bit, log, display=cat_disp)
    all_bits = 0
    for md in mask_defs:
        all_bits |= md.bits
    sets = read_setlist(
        params, params.set_list, snp_id_to_idx, snp_chroms, anno, all_bits,
        None, log,
    )
    aafs = aaf_bin_values(params)
    out: Dict[str, np.ndarray] = {}
    for vset in sets:
        if vset.ID not in want:
            continue
        snps = [gd.snps[i] for i in vset.snp_indices]
        G = gd.read_block_scattered(snps)
        sb = eng.block_stats(G)
        total, ns = sb["total"], sb["ns"]
        mac1 = np.minimum(total, 2 * ns - total)
        ignored = mac1 < 0.5
        af1 = total / (2.0 * ns)
        anno_bits = np.array(
            [anno.get((i, vset.ID), 1) for i in vset.snp_indices], dtype=np.uint64
        )
        built, _ = build_masks_for_set(
            params, vset, G.astype(np.float64), af1, mac1, ignored, anno_bits,
            mask_defs, aafs, pd.masked_indivs, pd.ind_in_analysis,
        )
        for bm in built:
            if bm.snp.ID in want[vset.ID]:
                out[bm.snp.ID] = (
                    bm.raw_vec if bm.raw_vec is not None else bm.G
                )
    return out
