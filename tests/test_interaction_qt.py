"""QT GxE robust interaction tests: batched-kernel equivalence and a
from-scratch HC3 sandwich oracle (apply_interaction_tests_qt,
Interaction.cpp:109-220)."""

import os
import subprocess
import sys

import numpy as np
import pytest

EX = "/root/reference/example"

BASE = ["--step", "2", "--bed", f"{EX}/example",
        "--covarFile", f"{EX}/covariates.txt",
        "--phenoFile", f"{EX}/phenotype.txt", "--bsize", "250",
        "--ignore-pred", "--interaction", "V1", "--no-condtl",
        "--rare-mac", "5"]  # MAC>=5 common -> HC3 robust path


def _run(out, extra_env=None):
    env = dict(os.environ)
    env["REGENIE_TPU_PLATFORM"] = "cpu"
    if extra_env:
        env.update(extra_env)
    r = subprocess.run(
        [sys.executable, "-m", "regenie_tpu"] + BASE + ["--out", out],
        capture_output=True, text=True, cwd="/root/repo", env=env, timeout=900,
    )
    assert r.returncode == 0, r.stdout + r.stderr


@pytest.fixture(scope="module")
def qt_int_out(tmp_path_factory):
    d = tmp_path_factory.mktemp("iqt")
    out = str(d / "int_qt")
    _run(out)
    return out


def test_qt_robust_batched_equals_scalar(qt_int_out, tmp_path):
    """The einsum-batched HC3 kernel must produce byte-identical output
    to the per-SNP host path (REGENIE_TPU_NO_BATCH_INT=1)."""
    out2 = str(tmp_path / "scalar")
    _run(out2, {"REGENIE_TPU_NO_BATCH_INT": "1"})
    for ph in ("Y1", "Y2"):
        a = open(f"{qt_int_out}_{ph}.regenie").read()
        b = open(f"{out2}_{ph}.regenie").read()
        assert a == b, ph


def test_qt_robust_rows_vs_oracle(qt_int_out):
    """First SNP's -INT rows match a from-scratch FWL + HC3 sandwich:
    residualize [E, G, GxE] on the covariate basis, OLS against the
    residualized phenotype, leverage from the 3-column design only
    (Interaction.cpp:125), HC3 = (1-h)^2 weights. All column/trait
    scalings cancel when computed in raw units."""
    rows = {}
    for line in open(qt_int_out + "_Y1.regenie"):
        t = line.split()
        if t[2] == "1" and "INT" in t[7]:
            rows[t[7]] = t

    from regenie_tpu.cli import args_to_params, build_parser
    from regenie_tpu.prep import prepare

    p = build_parser().parse_args(BASE + ["--out", "/tmp/x"])
    params = args_to_params(p)
    rd = prepare(params)
    gd, pd = rd.geno, rd.pheno

    G = gd.read_block([gd.snps[0]]).astype(float)[0]
    miss = G == -3
    ind = pd.ind_in_analysis
    af = G[~miss & ind].mean() / 2
    g = np.where(miss, 2 * af, G)
    sign = 1.0
    if af > 0.5:
        g, sign = 2 - g, -1.0
    g = g * ind
    E = pd.interaction_cov[:, 0]

    X = pd.new_cov  # orthonormal covariate basis
    cols = np.column_stack([E, g, E * g])
    M = cols - X @ (X.T @ cols)
    y = pd.phenotypes[:, 0] * pd.scale_Y[0]  # residualized, raw units
    mask = pd.masked_indivs[:, 0].astype(float)

    Z = np.linalg.inv(M.T @ M)
    h = ((M @ Z) * M).sum(axis=1)
    tau = Z @ (M.T @ y)
    e_sq = ((y - M @ tau) ** 2) * mask
    V = Z @ (M.T * (e_sq / (1 - h) ** 2)[None, :]) @ M @ Z

    exp = {
        "ADD-INT_V1": (tau[0], np.sqrt(V[0, 0])),
        "ADD-INT_SNP": (sign * tau[1], np.sqrt(V[1, 1])),
        "ADD-INT_SNPxV1": (sign * tau[2], np.sqrt(V[2, 2])),
    }
    for key, (beta, se) in exp.items():
        got_b, got_se = float(rows[key][8]), float(rows[key][9])
        assert abs(got_b - beta) < 5e-5 * max(1, abs(beta)), key
        assert abs(got_se - se) < 5e-5 * max(1, se), key
    # joint 2-df chi-square: [G, GxE] block of the sandwich
    chisq2 = tau[1:] @ np.linalg.inv(V[1:, 1:]) @ tau[1:]
    assert abs(float(rows["ADD-INT_2DF"][10]) - chisq2) < 1e-3


def test_qt_hlm_path_used_for_rare(tmp_path):
    """With the default --rare-mac 1000 every example SNP is rare
    (N=500), so the HLM path is used: rows still come out and differ
    from the robust-path run."""
    out = str(tmp_path / "hlm")
    env = dict(os.environ)
    env["REGENIE_TPU_PLATFORM"] = "cpu"
    args = [a for a in BASE if a not in ("--rare-mac", "5")]
    r = subprocess.run(
        [sys.executable, "-m", "regenie_tpu"] + args + ["--out", out],
        capture_output=True, text=True, cwd="/root/repo", env=env, timeout=900,
    )
    assert r.returncode == 0, r.stdout + r.stderr
    hlm_rows = [l for l in open(out + "_Y1.regenie") if "INT_SNPxV1" in l]
    assert len(hlm_rows) == 1000


@pytest.mark.parametrize("rare_mac,label", [(100000, "all_hlm"),
                                            (200, "mixed")])
def test_hlm_batched_matches_scalar(tmp_path, rare_mac, label):
    """Batched HLM interaction rows (and mixed HLM/robust blocks) are
    byte-identical to the per-SNP path, including per-SNP row order in
    mixed blocks."""
    outs = {}
    for mode, extra in (("bat", {}),
                        ("sca", {"REGENIE_TPU_NO_BATCH_INT": "1"})):
        out = str(tmp_path / f"{label}_{mode}")
        env = dict(os.environ)
        env["REGENIE_TPU_PLATFORM"] = "cpu"
        env.update(extra)
        r = subprocess.run(
            [sys.executable, "-m", "regenie_tpu", "--step", "2",
             "--bed", f"{EX}/example", "--covarFile", f"{EX}/covariates.txt",
             "--phenoFile", f"{EX}/phenotype.txt",
             "--remove", f"{EX}/fid_iid_to_remove.txt", "--bsize", "200",
             "--ignore-pred", "--interaction", "V1",
             "--rare-mac", str(rare_mac), "--out", out],
            capture_output=True, text=True, cwd="/root/repo", env=env,
            timeout=900,
        )
        assert r.returncode == 0, r.stdout + r.stderr
        outs[mode] = out
    for t in ("Y1", "Y2"):
        a = open(outs["bat"] + f"_{t}.regenie").read()
        b = open(outs["sca"] + f"_{t}.regenie").read()
        assert a == b, f"{label} {t}: batched != scalar"
