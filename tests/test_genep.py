"""GENE_P strategy (--rgc-gene-p): output structure and the ACAT
combination identity over its component tests."""

import os
import subprocess
import sys

import numpy as np
import pytest

from regenie_tpu.models.skat import get_acat

EX = "/root/reference/example"


def _run_cli(args):
    env = dict(os.environ)
    env["REGENIE_TPU_PLATFORM"] = "cpu"
    r = subprocess.run(
        [sys.executable, "-m", "regenie_tpu"] + args,
        capture_output=True, text=True, cwd="/root/repo", env=env, timeout=900,
    )
    assert r.returncode == 0, r.stdout + r.stderr


@pytest.fixture(scope="module")
def genep_out(tmp_path_factory):
    d = tmp_path_factory.mktemp("genep")
    out = str(d / "genep")
    env = dict(os.environ)
    env["REGENIE_TPU_PLATFORM"] = "cpu"
    r = subprocess.run(
        [sys.executable, "-m", "regenie_tpu", "--step", "2",
         "--bed", f"{EX}/example_3chr", "--covarFile", f"{EX}/covariates.txt",
         "--phenoFile", f"{EX}/phenotype.txt", "--bsize", "200",
         "--ignore-pred", "--set-list", f"{EX}/example_3chr.setlist",
         "--anno-file", f"{EX}/example_3chr.annotations",
         "--mask-def", f"{EX}/example_3chr.masks",
         "--rgc-gene-p", "--aaf-bins", "0.2,0.5", "--vc-maxAAF", "0.5",
         "--out", out],
        capture_output=True, text=True, cwd="/root/repo", env=env, timeout=900,
    )
    assert r.returncode == 0, r.stdout + r.stderr
    rows = {}
    for line in open(out + "_Y1.regenie"):
        t = line.split()
        if t[0] == "CHROM" or t[0].startswith("##"):
            continue
        rows.setdefault(t[2], {})[t[7]] = t
    return rows


def test_genep_is_acat_of_components(genep_out):
    for set_id in ("SET1", "SET2"):
        r = genep_out[set_id]
        comp = []
        for name in ("ADD-BURDEN-ACAT", "ADD-BURDEN-SBAT", "ADD-ACATV-ACAT",
                     "ADD-SKATO-ACAT"):
            if name in r and r[name][11] != "NA":
                comp.append(float(r[name][11]))
        assert len(comp) >= 3, set_id
        lp = get_acat(np.array(comp))
        assert abs(float(r["GENE_P"][11]) - lp) < 2e-5, set_id
        assert "STRONGEST_MASK=" in r["GENE_P"][12]


def test_genep_class_routes_present(genep_out):
    """Default classes: M1 exists among the masks -> per-class rows."""
    r = genep_out["SET1"]
    assert "GENE_P_M1" in r
    assert "ADD-BURDEN-ACAT_M1" in r
    # class DF smaller than overall DF
    df_all = int(r["GENE_P"][12].split(";")[0].split("=")[1])
    df_m1 = int(r["GENE_P_M1"][12].split(";")[0].split("=")[1])
    assert df_all >= df_m1


def test_genep_sbat_pos_neg_combination(genep_out):
    """SBAT = ACAT(pos, neg) one-sided p-values."""
    r = genep_out["SET2"]
    lp = get_acat(np.array([
        float(r["ADD-BURDEN-SBAT_POS"][11]), float(r["ADD-BURDEN-SBAT_NEG"][11])
    ]))
    assert abs(float(r["ADD-BURDEN-SBAT"][11]) - lp) < 2e-5


def test_custom_vc_weights(tmp_path):
    """--weights-col replaces Beta(1,25) SKAT weights with normalized
    user weights from the annotation file (get_custom_weights)."""
    anno = str(tmp_path / "anno_w.txt")
    with open(anno, "w") as fh:
        for i, l in enumerate(open(f"{EX}/example_3chr.annotations")):
            fh.write(l.rstrip("\n") + f"\t{1.0 + (i % 3)}\n")
    base = ["--step", "2", "--bed", f"{EX}/example_3chr",
            "--phenoFile", f"{EX}/phenotype.txt", "--bsize", "200",
            "--ignore-pred", "--set-list", f"{EX}/example_3chr.setlist",
            "--mask-def", f"{EX}/example_3chr.masks", "--aaf-bins", "0.5",
            "--vc-tests", "skat", "--vc-maxAAF", "0.5", "--vc-MACthr", "0"]
    _run_cli(base + ["--anno-file", anno, "--weights-col", "4",
                     "--out", str(tmp_path / "w")])
    _run_cli(base + ["--anno-file", f"{EX}/example_3chr.annotations",
                     "--out", str(tmp_path / "b")])
    pw = {l.split()[2]: l.split()[11] for l in open(tmp_path / "w_Y1.regenie")
          if "ADD-SKAT" in l}
    pb = {l.split()[2]: l.split()[11] for l in open(tmp_path / "b_Y1.regenie")
          if "ADD-SKAT" in l}
    assert pw.keys() == pb.keys() and len(pw) >= 4
    assert any(pw[k] != pb[k] for k in pw)  # weights actually applied


def test_aaf_file_overrides_binning(tmp_path):
    """--aaf-file AAFs replace computed frequencies for mask bins
    (read_aafs, Geno.cpp:3790)."""
    ids = open(f"{EX}/example_3chr.setlist").readline().split()[3].split(",")
    aaff = str(tmp_path / "aafs.txt")
    with open(aaff, "w") as fh:
        for v in ids:
            fh.write(f"{v} 0.01\n")
    base = ["--step", "2", "--bed", f"{EX}/example_3chr",
            "--phenoFile", f"{EX}/phenotype.txt", "--bsize", "200",
            "--ignore-pred", "--set-list", f"{EX}/example_3chr.setlist",
            "--anno-file", f"{EX}/example_3chr.annotations",
            "--mask-def", f"{EX}/example_3chr.masks", "--aaf-bins", "0.1"]
    _run_cli(base + ["--aaf-file", aaff, "--out", str(tmp_path / "c")])
    _run_cli(base + ["--out", str(tmp_path / "d")])

    def af_of(path, mid):
        for l in open(path):
            t = l.split()
            if len(t) > 5 and t[2] == mid:
                return float(t[5])

    # forcing all SET1 AAFs to 0.01 puts every variant in the 0.1 bin
    # -> much larger mask AF than the computed-frequency run
    assert af_of(tmp_path / "c_Y1.regenie", "SET1.M1.0.1") > af_of(
        tmp_path / "d_Y1.regenie", "SET1.M1.0.1"
    )


def test_htp_gene_rows_consistent(tmp_path):
    """--htp with gene-based tests: every row has the 22 HTPv4 columns."""
    out = str(tmp_path / "htp")
    _run_cli(["--step", "2", "--bed", f"{EX}/example_3chr",
              "--phenoFile", f"{EX}/phenotype.txt", "--bsize", "200",
              "--ignore-pred", "--set-list", f"{EX}/example_3chr.setlist",
              "--anno-file", f"{EX}/example_3chr.annotations",
              "--mask-def", f"{EX}/example_3chr.masks",
              "--rgc-gene-p", "--aaf-bins", "0.2,0.5", "--vc-maxAAF", "0.5",
              "--htp", "study1", "--out", out])
    lines = open(out + "_Y1.regenie").read().splitlines()
    assert lines[0].startswith("##MASKS=<")
    assert all(len(l.split("\t")) == 22 for l in lines[1:])
    assert any("GENE_P" in l for l in lines)
    assert any("ADD-SKATO-ACAT" in l and "LOG10P=" in l for l in lines)


def test_lovo_row_count_docker_scenario(tmp_path):
    """test_docker.sh LOVO check: 21 lines incl. ##MASKS meta line and
    18 leave-one-variant-out rows."""
    ids = open(f"{EX}/example_3chr.setlist").readline().split()[3]
    snpl = str(tmp_path / "tmp1.txt")
    open(snpl, "w").write(ids.replace(",", "\n") + "\n")
    out = str(tmp_path / "loo")
    _run_cli(["--step", "2", "--ignore-pred", "--bed", f"{EX}/example_3chr",
              "--extract", snpl, "--covarFile", f"{EX}/covariates.txt",
              "--phenoFile", f"{EX}/phenotype_bin.txt",
              "--set-list", f"{EX}/example_3chr.setlist",
              "--anno-file", f"{EX}/example_3chr.annotations",
              "--mask-def", f"{EX}/example_3chr.masks",
              "--mask-lovo", "SET1,M1,0.2", "--htp", "TEST", "--force-qt",
              "--out", out])
    lines = open(out + "_Y1.regenie").read().splitlines()
    assert len(lines) == 21
    assert lines[0].startswith("##MASKS=<")
    assert sum(1 for l in lines if "_mog" in l) == 18


def test_docker_prebuilt_mask_parity(tmp_path):
    """test_docker.sh V1/V2: building masks (--write-mask, HTP) matches
    scoring the committed pre-built mask bed, modulo Ref/Alt columns."""
    ids = []
    for l in open(f"{EX}/example_3chr.setlist"):
        ids += l.split()[3].split(",")
    snpl = str(tmp_path / "tmp1.txt")
    open(snpl, "w").write("\n".join(ids) + "\n")
    _run_cli(["--step", "2", "--bed", f"{EX}/example_3chr_masks",
              "--covarFile", f"{EX}/covariates.txt",
              "--phenoFile", f"{EX}/phenotype_bin.txt",
              "--remove", f"{EX}/fid_iid_to_remove.txt",
              "--bsize", "10", "--ignore-pred", "--htp", "TEST", "--force-qt",
              "--out", str(tmp_path / "v1")])
    _run_cli(["--step", "2", "--ignore-pred", "--bed", f"{EX}/example_3chr",
              "--extract", snpl, "--covarFile", f"{EX}/covariates.txt",
              "--phenoFile", f"{EX}/phenotype_bin.txt",
              "--remove", f"{EX}/fid_iid_to_remove.txt",
              "--set-list", f"{EX}/example_3chr.setlist",
              "--anno-file", f"{EX}/example_3chr.annotations",
              "--mask-def", f"{EX}/example_3chr.masks",
              "--write-mask", "--bsize", "15", "--aaf-bins", "0.2",
              "--chrList", "1,3", "--htp", "TEST", "--force-qt",
              "--out", str(tmp_path / "v2")])

    def cut(line):
        t = line.rstrip("\n").split("\t")
        return "\t".join(t[:3] + t[5:])

    v1 = open(tmp_path / "v1_Y1.regenie").readlines()
    v2 = open(tmp_path / "v2_Y1.regenie").readlines()
    assert [cut(v2[1]), cut(v2[2]), cut(v2[-1])] == [cut(x) for x in v1[:3]]
    # written mask bed valid with 4 masks over 494 samples
    assert open(tmp_path / "v2_masks.bed", "rb").read(3) == b"\x6c\x1b\x01"
    assert sum(1 for _ in open(tmp_path / "v2_masks.bim")) == 4
    assert sum(1 for _ in open(tmp_path / "v2_masks.fam")) == 494


def test_skip_cf_burden_disables_calibration(tmp_path):
    """--skip-cf-burden turns off the per-mask burden calibration factor
    in the BT SKAT correction path (SKAT.cpp:827,1003,1343). With a
    heavily imbalanced phenotype the Firth-corrected burden chi-square is
    smaller than the score chi-square, so rfrac>1 inflates the kernel and
    the two runs must differ; the factor never deflates (max(1,.))."""
    import numpy as np

    rng = np.random.default_rng(7)
    lines = open(f"{EX}/phenotype_bin.txt").readlines()
    ph = str(tmp_path / "pheno_rare.txt")
    with open(ph, "w") as fh:
        fh.write("FID IID Y1\n")
        n = len(lines) - 1
        cases = set(rng.choice(n, size=12, replace=False))
        for i, l in enumerate(lines[1:]):
            f, s = l.split()[:2]
            fh.write(f"{f} {s} {1 if i in cases else 0}\n")
    base = ["--step", "2", "--bed", f"{EX}/example_3chr",
            "--phenoFile", ph, "--bt", "--firth",
            "--pThresh", "0.9", "--bsize", "200", "--ignore-pred",
            "--set-list", f"{EX}/example_3chr.setlist",
            "--anno-file", f"{EX}/example_3chr.annotations",
            "--mask-def", f"{EX}/example_3chr.masks", "--aaf-bins", "0.5",
            "--vc-tests", "skat,skato", "--vc-maxAAF", "0.5",
            "--vc-MACthr", "0"]
    _run_cli(base + ["--out", str(tmp_path / "cal")])
    _run_cli(base + ["--skip-cf-burden", "--out", str(tmp_path / "nocal")])

    def skat_rows(p):
        return {l.split()[2] + l.split()[7]: float(l.split()[11])
                for l in open(p) if "-SKAT" in l}

    a = skat_rows(tmp_path / "cal_Y1.regenie")
    b = skat_rows(tmp_path / "nocal_Y1.regenie")
    assert a.keys() == b.keys() and len(a) >= 4
    assert any(abs(a[k] - b[k]) > 1e-10 for k in a)
    # inflation only: calibrated p is never smaller (logp never larger)
    assert all(a[k] <= b[k] + 1e-12 for k in a)


def test_lovo_collapse_matches_naive():
    """The O(M*N) LOVO collapse (top-2 for max, totals-minus-row for
    sum/comphet) must equal the naive per-variant recollapse, incl.
    missing (-3) handling and singleton bins."""
    from regenie_tpu.cli import build_parser, args_to_params
    from regenie_tpu.models.masks import build_lovo_masks
    from regenie_tpu.io.setfiles import VariantSet

    rng = np.random.default_rng(5)
    N, M = 80, 12
    for rule in ("max", "sum", "comphet"):
        G = rng.binomial(2, 0.12, size=(M, N)).astype(np.int8)
        G[rng.random((M, N)) < 0.1] = -3
        ind = np.ones(N, dtype=bool)
        ns = (G >= 0).sum(axis=1)
        total = np.where(G >= 0, G, 0).sum(axis=1)
        af1 = total / np.maximum(2 * ns, 1)
        mac1 = np.minimum(total, 2 * ns - total)

        parser = build_parser()
        args = parser.parse_args(
            ["--step", "2", "--bed", "x", "--phenoFile", "y", "--out", "z",
             "--set-list", "s", "--anno-file", "a", "--mask-def", "m",
             "--ignore-pred", "--minMAC", "0.5", "--mask-lovo",
             "SET1,M1,all"])
        params = args_to_params(args)
        params.n_pheno = 1
        params.mask_rule = rule

        class MD:
            name = "M1"
            bits = np.uint64(1)
            region = -1
            region_name = ""

        vset = VariantSet(ID="SET1", chrom=1, physpos=1,
                          snp_indices=np.arange(M))
        built = build_lovo_masks(
            params, vset, G, af1, mac1, np.zeros(M, bool),
            np.ones(M, np.uint64), MD(), "all",
            [f"v{i}" for i in range(M)], np.ones((N, 1), bool), ind)
        assert len(built) == M + 1

        Gf = G.astype(np.float64)

        def naive(rows):
            sub = Gf[rows]
            if rule == "max":
                return sub.max(axis=0)
            nm = (sub >= 0).any(axis=0)
            sm = np.where(sub >= 0, sub, 0.0).sum(axis=0)
            mv = np.where(nm, sm, -3.0)
            return np.minimum(mv, 2.0) if rule == "comphet" else mv

        # recover raw collapse values from the finalized mask stats via
        # an independent rebuild of each leave-out
        for k, bm in enumerate(built):
            rows = list(range(M)) if k == 0 else [r for r in range(M) if r != k - 1]
            mv = naive(rows)
            # raw_vec is the collapse result before imputation (no flip
            # at these rare AFs, default additive test)
            assert np.array_equal(bm.raw_vec, mv), (rule, k)


def test_chibar_weights_genz_vs_mc_oracle():
    """The Kudo/Genz subset-decomposition chi-bar weights
    (_chibar_weights_genz, mirroring jburden_wts_adapt NNLS.cpp:864)
    match a 40K-draw Monte-Carlo simulation of the NNLS active-set
    count, and the exact p=2 cone weights."""
    from regenie_tpu.models.joint import (
        _chibar_weights_genz, _chibar_weights_mc, _orthant_prob)

    rng = np.random.default_rng(0)
    for p in (2, 3, 5):
        A = rng.normal(size=(p, p))
        V = A @ A.T + p * np.eye(p)
        w = _chibar_weights_genz(V, 0, rng)  # napprox=0 -> all subsets
        assert abs(w.sum() - 1.0) < 1e-9
        wmc = _chibar_weights_mc(V, n_sims=40000, seed=3)
        assert np.abs(w - wmc).max() < 0.01

    # independent components: exact cone weights (.25, .5, .25)
    w = _chibar_weights_genz(np.eye(2), 0, rng)
    assert np.allclose(w, [0.25, 0.5, 0.25], atol=1e-12)
    # orthant probability closed form for p=2
    R = np.array([[1.0, 0.3], [0.3, 1.0]])
    assert abs(_orthant_prob(R) - (0.25 + np.arcsin(0.3) / (2 * np.pi))) < 1e-12

    # sampled approximation stays close to exact and keeps the exact
    # w_0/w_n anchors untouched before renormalization
    A = rng.normal(size=(6, 6))
    V = A @ A.T + 6 * np.eye(6)
    we = _chibar_weights_genz(V, 0, rng)
    wa = _chibar_weights_genz(V, 10, rng)
    assert abs(wa.sum() - 1.0) < 1e-9
    assert np.abs(we - wa).max() < 0.05


def test_sbat_adapt_and_mtw(tmp_path):
    """--sbat-adapt upgrades weights only below the 1e-3 threshold (at
    DF=2 the k=2 pass is already exact, so output is unchanged);
    --sbat-mtw reuses first-computed weights across sets/traits."""
    import subprocess, sys

    EXD = "/root/reference/example"
    base = [sys.executable, "-m", "regenie_tpu", "--step", "2",
            "--bed", f"{EXD}/example_3chr",
            "--phenoFile", f"{EXD}/phenotype.txt",
            "--covarFile", f"{EXD}/covariates.txt",
            "--set-list", f"{EXD}/example_3chr.setlist",
            "--anno-file", f"{EXD}/example_3chr.annotations",
            "--mask-def", f"{EXD}/example_3chr.masks",
            "--aaf-bins", "0.2", "--joint", "sbat",
            "--ignore-pred", "--bsize", "100"]
    outs = {}
    for name, extra in (("base", []), ("adapt", ["--sbat-adapt"]),
                        ("mtw", ["--sbat-mtw"])):
        out = str(tmp_path / name)
        r = subprocess.run(base + extra + ["--out", out],
                           capture_output=True, text=True)
        assert r.returncode == 0, r.stderr[-2000:]
        outs[name] = {
            l.split()[2]: l.split() for l in open(out + "_Y1.regenie")
            if "ADD-BURDEN-SBAT " in l or "-SBAT\t" in l or " ADD-BURDEN-SBAT " in l
        }
    assert outs["base"] and set(outs["base"]) == set(outs["adapt"])
    # DF=2: adaptive k=2 weights are exact -> identical rows
    for k in outs["base"]:
        assert outs["base"][k] == outs["adapt"][k], k
    # mtw: the first set computes weights, later sets reuse them
    first = sorted(outs["base"])[0]
    assert outs["mtw"][first] == outs["base"][first]
