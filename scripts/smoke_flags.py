"""Long-tail CLI flag smoke: every flag that the main test suite does
not drive through the CLI gets at least one end-to-end run here on the
reference example data. Any non-zero exit is a bug (either in the
wiring or in this script's understanding of the flag contract).

Not part of the pytest suite (runtime); run manually:
    python scripts/smoke_flags.py [filter-substring]
"""

import os
import subprocess
import sys
import tempfile

import numpy as np

EX = "/root/reference/example"
PY = sys.executable


def run(tag, args, outdir, expect_fail=False, check=None):
    env = dict(os.environ)
    env["REGENIE_TPU_PLATFORM"] = "cpu"
    env["PYTHONPATH"] = "/root/repo"
    r = subprocess.run(
        [PY, "-m", "regenie_tpu"] + [str(a) for a in args],
        capture_output=True, text=True, cwd=outdir, env=env, timeout=900,
    )
    ok = (r.returncode != 0) if expect_fail else (r.returncode == 0)
    why = ""
    if ok and check is not None:
        try:
            ok = bool(check(outdir))
            why = "post-check failed"
        except Exception as e:  # missing output file etc.
            ok, why = False, f"post-check raised: {e}"
    if not ok:
        print(f"FAIL [{tag}]: {' '.join(str(a) for a in args)}  {why}")
        print((r.stdout + r.stderr)[-2000:])
    else:
        print(f"ok   [{tag}]")
    return ok


def main():
    filt = sys.argv[1] if len(sys.argv) > 1 else ""
    outdir = tempfile.mkdtemp(prefix="smokeflags_")
    os.chdir(outdir)

    # ---- synthesized inputs -------------------------------------------
    ids = [l.split()[:2] for l in open(f"{EX}/example.fam")]
    rng = np.random.default_rng(7)
    with open("pheno_t2e.txt", "w") as fh:
        fh.write("FID IID T1 E1\n")
        for fid, iid in ids:
            fh.write(f"{fid} {iid} {rng.exponential(10.0):.4f} "
                     f"{int(rng.random() < 0.7)}\n")
    with open("pheno_cc12.txt", "w") as fh:
        # 1/2/NA coding of phenotype_bin.txt (for --1/--cc12)
        lines = open(f"{EX}/phenotype_bin.txt").read().splitlines()
        fh.write(lines[0] + "\n")
        for l in lines[1:]:
            p = l.split()
            fh.write(" ".join(p[:2] + [
                "NA" if v == "NA" else str(int(float(v)) + 1) for v in p[2:]
            ]) + "\n")
    with open("cond.txt", "w") as fh:
        fh.write("1\n2\n")
    with open("keep.txt", "w") as fh:
        for fid, iid in ids[:400]:
            fh.write(f"{fid} {iid}\n")
    with open("extract_a.txt", "w") as fh:
        fh.write("\n".join(str(i) for i in range(1, 400)) + "\n")
    with open("extract_b.txt", "w") as fh:
        fh.write("\n".join(str(i) for i in range(300, 700)) + "\n")
    with open("macfilter.txt", "w") as fh:
        fh.write("\n".join(str(i) for i in range(1, 50)) + "\n")
    with open("setnames.txt", "w") as fh:
        fh.write("SET1\n")
    with open("ld_list.txt", "w") as fh:
        # 'sv <id>' / 'mask <maskname> <set>' rows (run_ldcomp contract)
        fh.write("sv mog_0\nsv mog_1\nmask SET1.M1.all SET1\n")
    # numeric-category annotations + labels mapping numbers to names
    # (read_anno_labels contract: '<number> <name>' per line)
    with open("anno_labels.txt", "w") as fh:
        fh.write("1 pLof\n2 missense\n")
    with open("anno_num.txt", "w") as fh:
        num = {"pLof": "1", "missense": "2"}
        for l in open(f"{EX}/example_3chr.annotations"):
            p = l.split()
            if p[2] in num:
                fh.write(f"{p[0]}\t{p[1]}\t{num[p[2]]}\n")
    with open("masks_lab.txt", "w") as fh:
        # mask-def references the same numeric tokens; display names come
        # from the labels file (anno_map keyed by number, Geno.cpp:3598)
        fh.write("M1\t1\nM2\t1,2\n")
    with open("lovo_snps.txt", "w") as fh:
        fh.write("mog_0\nmog_2\n")
    with open("wsl_config.txt", "w") as fh:
        # real mask names so grouping is exercised (write_sets example)
        fh.write("grp1 M1\ngrp2 M1,M2\n")

    cov = ["--covarFile", f"{EX}/covariates.txt"]
    bed = ["--bed", f"{EX}/example"]
    bed3 = ["--bed", f"{EX}/example_3chr"]
    qt = ["--phenoFile", f"{EX}/phenotype.txt"]
    bt = ["--phenoFile", f"{EX}/phenotype_bin.txt", "--bt"]
    gb = ["--set-list", f"{EX}/example_3chr.setlist",
          "--anno-file", f"{EX}/example_3chr.annotations",
          "--mask-def", f"{EX}/example_3chr.masks"]

    scen = []

    # ---- step 1 -------------------------------------------------------
    scen += [
        ("s1-qt-tuning", ["--step", 1, "--qt", *bed, *cov, *qt,
                          "--bsize", 100, "--cv", 3, "--l0", 4, "--l1", 6,
                          "--niter", 20, "--maxiter-null", 100,
                          "--maxstep-null", 3, "--force-step1", "--verbose",
                          "--threads", 4, "--seed", 7,
                          "--mse-full", "--out", "fit_qt_tune"]),
        # --print requires a single trait (run_step1.py:89)
        ("s1-print-betas", ["--step", 1, *bed, *cov, "--phenoFile",
                            f"{EX}/phenotype.txt", "--phenoColList", "Y1",
                            "--bsize", 100, "--print", "--out", "fit_pb"]),
        ("s1-qt-grid", ["--step", 1, *bed, *cov, *qt, "--bsize", 100,
                        "--setl0", "0.1,0.5,0.9", "--setl1", "0.2,0.8",
                        "--nauto", 22, "--out", "fit_qt_grid"]),
        ("s1-qt-lowmem", ["--step", 1, *bed, *cov, *qt, "--bsize", 100,
                          "--lowmem", "--lowmem-prefix", "lmp",
                          "--out", "fit_qt_lm"]),
        ("s1-bt-adam", ["--step", 1, *bed, *cov, *bt, "--bsize", 100,
                        "--use-adam", "--out", "fit_bt_adam"]),
        ("s1-early-exit", ["--step", 1, *bed, *cov, *qt, "--bsize", 100,
                           "--early-exit", "--out", "fit_early"]),
        ("s1-excludes", ["--step", 1, *bed, *cov, *qt, "--bsize", 100,
                         "--phenoExcludeList", "Y2",
                         "--covarExcludeList", "V3", "--maxCatLevels", 10,
                         "--keep", "keep.txt", "--out", "fit_excl"]),
        ("s1-noops", ["--step", 1, *bed, *cov, *qt, "--bsize", 100,
                      "--within", "--nostream", "--debug",
                      "--out", "fit_noop"]),
        ("s1-testl0", ["--step", 1, *bed, *cov, *qt, "--bsize", 100,
                       "--test-l0", "--l0-pval-thr", 0.5,
                       "--out", "fit_testl0"]),
        ("s1-t2e", ["--step", 1, *bed, *cov, "--bsize", 100, "--t2e",
                    "--phenoFile", "pheno_t2e.txt", "--phenoColList", "T1",
                    "--eventColList", "E1", "--t2e-event-l0",
                    "--t2e-l1-pi6", "--l0-event", "--out", "fit_t2e"]),
        ("s1-l1full", ["--step", 1, *bed, *cov, *qt, "--bsize", 100,
                       "--l1-full", "--out", "fit_l1full"]),
    ]

    # split-l0 long-tail: --keep-l0, --l1-phenoList, --use-relative-path
    scen += [
        ("s1-split-master", ["--step", 1, *bed, *cov, *qt, "--bsize", 100,
                             "--split-l0", "spl,2", "--out", "sp_m"]),
        ("s1-split-j1", ["--step", 1, *bed, *cov, *qt, "--bsize", 100,
                         "--run-l0", "spl.master,1", "--keep-l0",
                         "--out", "sp_1"]),
        ("s1-split-j2", ["--step", 1, *bed, *cov, *qt, "--bsize", 100,
                         "--run-l0", "spl.master,2", "--keep-l0",
                         "--out", "sp_2"]),
        ("s1-split-l1", ["--step", 1, *bed, *cov, *qt, "--bsize", 100,
                         "--run-l1", "spl.master", "--l1-phenoList", "Y1",
                         "--keep-l0", "--use-relative-path",
                         "--out", "sp_l1"]),
    ]

    # ---- step 2: single-variant long tail ------------------------------
    base2q = ["--step", 2, *bed, *cov, *qt, "--bsize", 200,
              "--pred", "fit_qt_tune_pred.list"]
    base2b = ["--step", 2, *bed, *cov, *bt, "--bsize", 200, "--ignore-pred"]
    scen += [
        ("s2-blocks", [*base2q, "--chr", 1, "--starting-block", 2, "--nb", 2,
                       "--out", "o_blocks"]),
        ("s2-ttest-rerint", [*base2q, "--t-test", "--apply-rerint",
                             "--out", "o_tt"]),
        ("s2-rerint-cov", [*base2q, "--apply-rerint-cov", "--out", "o_ttc"]),
        ("s2-firth-se", [*base2b, "--firth", "--approx", "--firth-se",
                         "--compute-all", "--pThresh", 0.9,
                         "--out", "o_fse"]),
        ("s2-exactp-htp", [*base2b, "--firth", "--approx", "--htp", "SMOKE",
                           "--exact-p", "--pThresh", 0.9, "--out", "o_htp"]),
        ("s2-cc12", ["--step", 2, *bed, *cov, "--phenoFile", "pheno_cc12.txt",
                     "--bt", "--1", "--bsize", 200, "--ignore-pred",
                     "--minCaseCount", 10, "--out", "o_cc12"]),
        ("s2-force-impute", [*base2q, "--force-impute", "--out", "o_fimp"]),
        ("s2-nocov-approx", [*base2q, "--nocov-approx", "--out", "o_nca"]),
        ("s2-prs-cov", [*base2q, "--prs-cov", "--out", "o_prscov"]),
        ("s2-extract-or", [*base2q, "--extract", "extract_a.txt",
                           "--extract-or", "extract_b.txt",
                           "--out", "o_exor"]),
        ("s2-exclude-or", [*base2q, "--exclude", "extract_a.txt",
                           "--exclude-or", "extract_b.txt",
                           "--out", "o_excor"]),
        ("s2-force-mac", [*base2q, "--force-mac-filter", "macfilter.txt,20",
                          "--out", "o_fmac"]),
        ("s2-cond-max", [*base2q, "--condition-list", "cond.txt",
                         "--max-condition-vars", 5, "--out", "o_cond"]),
        # reference THROWS when the list exceeds the max (Geno.cpp:385)
        ("xfail-cond-max", [*base2q, "--condition-list", "cond.txt",
                            "--max-condition-vars", 1, "--out", "o_cx"],
         {"expect_fail": True}),
        ("s2-bgen-sample", ["--step", 2, "--bgen", f"{EX}/example_3chr.bgen",
                            "--sample", f"{EX}/example_3chr.sample",
                            *cov, *qt, "--bsize", 200, "--ignore-pred",
                            "--out", "o_bsam"]),
        ("s2-par-region", [*base2q, "--par-region", "b38", "--out", "o_par"]),
        ("s2-seed-gz", [*base2q, "--seed", 99, "--gz", "--out", "o_gz"]),
    ]

    # interaction long tail
    scen += [
        ("s2-int-frobust", [*base2q, "--interaction", "V1", "--force-robust",
                            "--out", "o_ifr"]),
        ("s2-int-hc4", [*base2q, "--interaction", "V1", "--force-robust-hc4",
                        "--out", "o_ihc4"]),
        ("s2-int-norobust", [*base2q, "--interaction", "V1", "--no-robust",
                             "--out", "o_inr"]),
        ("s2-int-hlm", [*base2q, "--interaction", "V1", "--rare-mac", 100000,
                        "--hlm-novquad", "--out", "o_ihlm"]),
        ("s2-int-vcov", [*base2q, "--interaction", "V1", "--print-vcov",
                         "--out", "o_ivc"]),
        # --interaction-prs only works with a single phenotype
        ("s2-int-prs", ["--step", 2, *bed, *cov, *qt, "--bsize", 200,
                        "--pred", "fit_qt_tune_pred.list", "--phenoCol",
                        "Y1", "--interaction-prs", "--out", "o_iprs"]),
    ]

    # T2E step 2 long tail
    scen += [
        ("s2-t2e-exact", ["--step", 2, *bed, *cov, "--bsize", 150, "--t2e",
                          "--phenoFile", "pheno_t2e.txt",
                          "--phenoColList", "T1", "--eventColList", "E1",
                          "--pred", "fit_t2e_pred.list", "--coxscore-exact",
                          "--out", "o_t2ex"]),
        ("s2-t2e-nofirth", ["--step", 2, *bed, *cov, "--bsize", 150, "--t2e",
                            "--phenoFile", "pheno_t2e.txt",
                            "--phenoColList", "T1", "--eventColList", "E1",
                            "--ignore-pred", "--coxnofirth",
                            "--htp", "TRIAL", "--htp-with-event",
                            "--out", "o_t2nf"]),
    ]

    # multiphen / mcc long tail
    scen += [
        ("s2-multiphen-opts", [*base2q, "--strict", "--multiphen",
                               "--multiphen-optim", "WeightHalvingPseudo",
                               "--multiphen-maxit", 100,
                               "--multiphen-maxit2", 3,
                               "--multiphen-thr", 0.1,
                               "--multiphen-tol", "1e-6",
                               "--multiphen-maxstep", 5,
                               "--multiphen-firth-mult", 0.5,
                               "--multiphen-reset-start",
                               "--multiphen-pseudo-stophalf", 0,
                               "--multiphen-offset", "offset_int",
                               "--multiphen-strict", "--multiphen-trace",
                               "--multiphen-verbose", 1,
                               "--out", "o_mph"]),
        ("s2-mcc-skew", [*base2q, "--mcc", "--mcc-skew", 0.1,
                         "--out", "o_mcc"]),
    ]

    # gene-based long tail
    base2g = ["--step", 2, *bed3, *cov, *qt, "--bsize", 200,
              "--ignore-pred", *gb, "--aaf-bins", "0.2"]
    scen += [
        ("gb-build-sum", [*base2g, "--build-mask", "sum",
                          "--check-burden-files", "--strict-check-burden",
                          "--out", "g_sum"]),
        ("gb-write-setlist", [*base2g, "--write-mask",
                              "--write-setlist", "wsl_config.txt",
                              "--out", "g_wsl"],
         {"check": lambda d: all(
             os.path.getsize(os.path.join(d, f"g_wsl_{g}.setlist")) > 0
             for g in ("grp1", "grp2"))}),
        ("gb-singletons", [*base2g, "--set-singletons", "--out", "g_sing"]),
        ("gb-anno-labels", ["--step", 2, *bed3, *cov, *qt, "--bsize", 200,
                            "--ignore-pred", "--set-list",
                            f"{EX}/example_3chr.setlist",
                            "--anno-file", "anno_num.txt",
                            "--mask-def", "masks_lab.txt",
                            "--anno-labels", "anno_labels.txt",
                            "--aaf-bins", "0.2", "--out", "g_alab"]),
        ("gb-skat-params", [*base2g, "--vc-tests", "skato,acatv",
                            "--skat-params", "1,25",
                            "--skato-rho", "0,0.5,1",
                            "--vc-maxAAF", 0.5, "--out", "g_skp"]),
        ("gb-acat-beta", [*base2g, "--joint", "acat", "--acat-beta", "1,25",
                          "--joint-only", "--out", "g_acb"]),
        ("gb-sbat-opts", [*base2g, "--joint", "sbat", "--sbat-napprox", 100,
                          "--sbat-verbose", "--out", "g_sbo"]),
        ("gb-skip-sbat", [*base2g, "--rgc-gene-p", "--skip-sbat",
                          "--out", "g_ssb"]),
        ("gb-sets-file", [*base2g, "--extract-sets", "setnames.txt",
                          "--out", "g_exs"]),
        ("gb-sets-list", [*base2g, "--extract-setlist", "SET1,SET2",
                          "--out", "g_exsl"]),
        ("gb-sets-excl", [*base2g, "--exclude-sets", "setnames.txt",
                          "--out", "g_exse"]),
        ("gb-sets-excl-list", [*base2g, "--exclude-setlist", "SET4",
                               "--out", "g_exsel"]),
        ("gb-mult-weights", [*base2g, "--vc-tests", "skat",
                             "--multiply-weights", "--out", "g_mw"]),
        # LODO needs 4-column annotations (domains); reference contract is
        # --mask-lodo <set>,<mask>,<aaf_cutoff> (Regenie.cpp:248,982-992)
        ("gb-lodo", ["--step", 2, *bed3, *cov, *qt, "--bsize", 200,
                     "--ignore-pred", "--set-list",
                     f"{EX}/example_3chr.setlist",
                     "--anno-file", f"{EX}/example_3chr.annotationsV2",
                     "--mask-def", f"{EX}/example_3chr.masks",
                     "--mask-lodo", "SET1,M1,0.2", "--out", "g_lodo"],
         {"check": lambda d: "LODO_" in open(
             os.path.join(d, "g_lodo_Y1.regenie")).read()}),
        ("gb-lovo-snplist", [*base2g, "--mask-lovo", "SET1,M1,0.2",
                             "--lovo-snplist", "lovo_snps.txt",
                             "--out", "g_lovs"]),
        ("gb-skip-test", [*base2g, "--write-mask", "--skip-test",
                          "--out", "g_skt"]),
        # negative path: LOVO and LODO are mutually exclusive
        # (Regenie.cpp:987)
        ("xfail-lovo-lodo", [*base2g, "--mask-lovo", "SET1,M1,0.2",
                             "--mask-lodo", "SET1,M1,0.2",
                             "--out", "g_xf"], {"expect_fail": True}),
    ]

    # LD-matrix long tail
    scen += [
        ("ld-extract", ["--step", 2, *bed3, *cov, *qt, "--bsize", 200,
                        "--ignore-pred", *gb, "--aaf-bins", "0.2",
                        "--compute-corr", "--ld-extract", "ld_list.txt",
                        "--forcein-vars", "--out", "ld_ex"]),
        ("ld-remeta-spr", ["--step", 2, *bed3, *cov, *bt, "--bsize", 200,
                           "--ignore-pred", *gb, "--aaf-bins", "0.2",
                           "--vc-tests", "skato", "--remeta-save-ld",
                           "--vc-MACthr", 0,
                           "--remeta-ld-spr", 0.05, "--out", "ld_rm"]),
    ]

    # transposed pheno long tail
    with open("tpheno.txt", "w") as fh:
        lines = open(f"{EX}/phenotype.txt").read().splitlines()
        hdr = lines[0].split()
        rows = [l.split() for l in lines[1:]]
        fh.write(" ".join(["TRAIT", "DUMMY"] + [r[1] for r in rows]) + "\n")
        for j, name in enumerate(hdr[2:], start=2):
            fh.write(" ".join([name, "x"] + [r[j] for r in rows]) + "\n")
    scen += [
        ("s2-tpheno-ign", ["--step", 2, *bed, *cov, "--bsize", 200,
                           "--ignore-pred", "--tpheno-file", "tpheno.txt",
                           "--tpheno-indexCol", 1, "--tpheno-ignoreCols", 2,
                           "--iid-only", "--out", "o_tph"]),
        ("version", ["--version"]),
    ]

    scen = [s if len(s) == 3 else (*s, {}) for s in scen]

    # step-2 scenarios consume step-1 artifacts produced earlier in the
    # list; when a filter selects only consumers, auto-run the producers
    # first so filtered runs don't fail spuriously on missing pred files
    producers = {
        "fit_qt_tune_pred.list": "s1-qt-tuning",
        "fit_t2e_pred.list": "s1-t2e",
        "spl.master": "s1-split-master",
    }
    extra_deps = {
        "s1-split-j1": ["s1-split-master"],
        "s1-split-j2": ["s1-split-master"],
        "s1-split-l1": ["s1-split-master", "s1-split-j1", "s1-split-j2"],
    }

    def deps_of(tag, args):
        out = list(extra_deps.get(tag, []))
        for a in args:
            d = producers.get(str(a))
            if d and d != tag:
                out.append(d)
        return out

    selected = {t for t, a, _k in scen if not filt or filt in t}
    changed = True
    while changed:  # transitive closure over dependencies
        changed = False
        for t, a, _k in scen:
            if t in selected:
                for d in deps_of(t, a):
                    if d not in selected:
                        selected.add(d)
                        changed = True

    fails = 0
    total = 0
    for tag, args, kw in scen:
        if tag not in selected:
            continue
        total += 1
        if not run(tag, args, outdir, **kw):
            fails += 1
    print(f"{total - fails}/{total} passed (outputs in {outdir})")
    sys.exit(1 if fails else 0)


if __name__ == "__main__":
    main()
