"""BT GxE interaction tests vs an independent Newton-IRLS oracle."""

import os
import subprocess
import sys

import numpy as np
import pytest

EX = "/root/reference/example"


@pytest.fixture(scope="module")
def bt_int_out(tmp_path_factory):
    d = tmp_path_factory.mktemp("ibt")
    out = str(d / "int_bt")
    env = dict(os.environ)
    env["REGENIE_TPU_PLATFORM"] = "cpu"
    r = subprocess.run(
        [sys.executable, "-m", "regenie_tpu", "--step", "2",
         "--bed", f"{EX}/example", "--covarFile", f"{EX}/covariates.txt",
         "--phenoFile", f"{EX}/phenotype_bin.txt", "--bt", "--bsize", "250",
         "--ignore-pred", "--interaction", "V1", "--no-condtl", "--firth", "--approx",
         "--out", out],
        capture_output=True, text=True, cwd="/root/repo", env=env, timeout=900,
    )
    assert r.returncode == 0, r.stdout + r.stderr
    return out


def test_bt_interaction_rows_vs_oracle(bt_int_out):
    """First SNP's four -INT rows match a from-scratch logistic refit of
    [E, G, GxE] with the null eta offset (apply_interaction_tests_bt)."""
    rows = {}
    for line in open(bt_int_out + "_Y1.regenie"):
        t = line.split()
        if t[2] == "1" and "INT" in t[7]:
            rows[t[7]] = t

    from regenie_tpu.cli import args_to_params, build_parser
    from regenie_tpu.models import step2_bt
    from regenie_tpu.prep import prepare

    p = build_parser().parse_args(
        ["--step", "2", "--bed", f"{EX}/example",
         "--covarFile", f"{EX}/covariates.txt",
         "--phenoFile", f"{EX}/phenotype_bin.txt", "--bt", "--bsize", "250",
         "--ignore-pred", "--interaction", "V1", "--no-condtl", "--out", "/tmp/x"]
    )
    params = args_to_params(p)
    rd = prepare(params)
    gd, pd = rd.geno, rd.pheno
    bt = step2_bt.prep_chromosome(
        params, pd, np.zeros((params.n_samples, params.n_pheno)), lambda *a: None
    )
    G = gd.read_block([gd.snps[0]]).astype(float)[0]
    miss = G == -3
    af = G[~miss & pd.ind_in_analysis].mean() / 2
    flip = af > 0.5
    g = np.where(miss, 2 * af, G)
    if flip:
        g = 2 - g
    g = g * pd.ind_in_analysis
    E = pd.interaction_cov

    def resid(m, X, n):
        r = m - X @ (m.T @ X).T
        sc = np.linalg.norm(r, axis=0) / np.sqrt(n - X.shape[1])
        return r / sc, sc

    gr, sg = resid(g[:, None], pd.new_cov, params.n_analyzed)
    im, si = resid(E * g[:, None], pd.new_cov, params.n_analyzed)
    # BT with non-dichotomous E: main-effect block is [E, E^2]
    # (int_add_esq, Pheno.cpp:1137-1142)
    Er, sE = resid(np.column_stack([E, E**2]), pd.new_cov, params.n_analyzed)
    H = np.column_stack([Er, gr[:, 0], im])
    y = pd.phenotypes_raw[:, 0]
    mask = pd.masked_indivs[:, 0]
    off = bt.eta_null[:, 0]
    b = np.zeros(4)
    for _ in range(50):
        pi = 1 / (1 + np.exp(-(off + H @ b)))
        w = np.where(mask, pi * (1 - pi), 0)
        grad = H.T @ np.where(mask, y - pi, 0)
        Hs = H.T @ (H * w[:, None])
        b = b + np.linalg.solve(Hs, grad)
        if np.abs(grad).max() < 1e-10:
            break
    V = np.linalg.inv(Hs)
    sign = -1 if flip else 1

    exp = {
        "ADD-INT_V1": (b[0] / sE[0], np.sqrt(V[0, 0]) / sE[0]),
        "ADD-INT_V1^2": (b[1] / sE[1], np.sqrt(V[1, 1]) / sE[1]),
        "ADD-INT_SNP": (sign * b[2] / sg[0], np.sqrt(V[2, 2]) / sg[0]),
        "ADD-INT_SNPxV1": (sign * b[3] / si[0], np.sqrt(V[3, 3]) / si[0]),
    }
    for key, (beta, se) in exp.items():
        got_b, got_se = float(rows[key][8]), float(rows[key][9])
        assert abs(got_b - beta) < 5e-5, key
        assert abs(got_se - se) < 5e-5, key
    chisq2 = b[2:] @ np.linalg.inv(V[2:, 2:]) @ b[2:]
    assert abs(float(rows["ADD-INT_2DF"][10]) - chisq2) < 1e-4


def test_bt_interaction_row_count(bt_int_out):
    n = sum(1 for l in open(bt_int_out + "_Y2.regenie") if "INT" in l)
    assert n == 5000  # 5 interaction rows per SNP (incl. the E^2 main)


def test_condtl_categorical_docker_scenario(tmp_path):
    """test_docker.sh interaction check: --interaction V5 (categorical)
    in the default conditional mode gives 5 ADD-INT rows per SNP and a
    -CONDTL marginal row."""
    out = str(tmp_path / "iv5")
    env = dict(os.environ)
    env["REGENIE_TPU_PLATFORM"] = "cpu"
    r = subprocess.run(
        [sys.executable, "-m", "regenie_tpu", "--step", "2",
         "--bed", f"{EX}/example", "--covarFile", f"{EX}/covariates_wBin.txt",
         "--phenoFile", f"{EX}/phenotype_bin.txt", "--bsize", "200",
         "--force-qt", "--ignore-pred", "--covarColList", "V1,V5",
         "--catCovarList", "V5", "--interaction", "V5", "--out", out],
        capture_output=True, text=True, cwd="/root/repo", env=env, timeout=900,
    )
    assert r.returncode == 0, r.stdout + r.stderr
    rows = [l for l in open(out + "_Y1.regenie") if l.startswith("1 1 ")]
    assert sum("ADD-INT" in l for l in rows) == 5
    assert any(l.split()[7] == "ADD-CONDTL" for l in rows)


def test_bt_batched_matches_scalar(tmp_path):
    """The device-batched BT interaction path (REGENIE_TPU_BATCH_INT=1)
    reproduces the per-SNP solver: identical row structure, numeric
    fields within IRLS-tolerance drift (the two paths stop along
    ulp-different trajectories at the same 1e-6 score tolerance)."""
    outs = {}
    for mode, extra in (("bat", {"REGENIE_TPU_BATCH_INT": "1"}),
                        ("sca", {"REGENIE_TPU_NO_BATCH_INT": "1"})):
        out = str(tmp_path / mode)
        env = dict(os.environ)
        env["REGENIE_TPU_PLATFORM"] = "cpu"
        env.update(extra)
        r = subprocess.run(
            [sys.executable, "-m", "regenie_tpu", "--step", "2",
             "--bed", f"{EX}/example", "--covarFile", f"{EX}/covariates.txt",
             "--phenoFile", f"{EX}/phenotype_bin.txt", "--bt",
             "--remove", f"{EX}/fid_iid_to_remove.txt", "--bsize", "200",
             "--ignore-pred", "--firth", "--approx", "--pThresh", "0.9",
             "--interaction", "V1", "--out", out],
            capture_output=True, text=True, cwd="/root/repo", env=env,
            timeout=900,
        )
        assert r.returncode == 0, r.stdout + r.stderr
        outs[mode] = out
    for t in ("Y1", "Y2"):
        a = open(outs["bat"] + f"_{t}.regenie").read().splitlines()
        b = open(outs["sca"] + f"_{t}.regenie").read().splitlines()
        assert len(a) == len(b)
        ndiff = 0
        for la, lb in zip(a, b):
            if la == lb:
                continue
            ndiff += 1
            ta, tb = la.split(), lb.split()
            assert len(ta) == len(tb)
            for xa, xb in zip(ta, tb):
                if xa == xb:
                    continue
                fa, fb = float(xa), float(xb)  # raises on NA-pattern diff
                assert abs(fa - fb) <= 1e-4 * max(abs(fa), abs(fb), 1e-2), (
                    la, lb)
        # structural identity: the vast majority of rows byte-match
        assert ndiff <= len(a) * 0.01, f"{t}: {ndiff} rows differ"
