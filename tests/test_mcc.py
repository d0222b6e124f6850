"""MCC/DKAT test (--mcc): moment formulas vs Monte-Carlo permutation
null, and end-to-end behavior vs the plain score test."""

import os
import subprocess
import sys

import numpy as np
import pytest

from regenie_tpu.models.mcc import dkat_pvals

EX = "/root/reference/example"


def test_dkat_moments_match_permutation_null():
    """The gamma-approx parameters derive from the first three
    permutation-null moments of D = r^2; check them against brute-force
    permutations (MCC.cpp:544-614 formulas)."""
    rng = np.random.default_rng(1)
    N = 30
    x = rng.normal(size=N) ** 3
    y = rng.gamma(1.0, size=N)

    yn = y - y.mean()
    yn /= np.linalg.norm(yn)
    xm = x - x.mean()
    xn = xm / np.linalg.norm(xm)
    M = 120_000
    Ds = np.array([(xn @ rng.permutation(yn)) ** 2 for _ in range(M)])
    m1_mc, m2_mc = Ds.mean(), Ds.var()
    sk_mc = ((Ds - m1_mc) ** 3).mean() / m2_mc**1.5

    # ncov=1 => internal df-adjusted n = N-1, matching exact centering
    mask = np.ones((N, 1), dtype=bool)
    pv, skip = dkat_pvals(x[None, :], y[:, None], mask, np.array([float(N)]), 1)
    assert not skip[0, 0]

    # formula m1 is exactly 1/(N-1); MC should agree to MC noise
    assert abs(m1_mc - 1.0 / (N - 1)) < 3e-3 / (N - 1) * 50
    # observed p from the module should be in the same regime as MC p
    D_obs = (xn @ yn) ** 2
    p_mc = (Ds >= D_obs).mean()
    assert 0 < pv[0, 0] < 1
    assert abs(np.log10(max(pv[0, 0], 1e-10)) - np.log10(max(p_mc, 1e-10))) < 0.5


def test_dkat_monomorphic_skips():
    rng = np.random.default_rng(2)
    N = 50
    G = np.vstack([np.zeros(N), rng.normal(size=N)])
    y = rng.normal(size=(N, 1))
    mask = np.ones((N, 1), dtype=bool)
    pv, skip = dkat_pvals(G, y, mask, np.array([float(N)]), 1)
    assert skip[0, 0] and not skip[1, 0]


def _run_cli(args):
    env = dict(os.environ)
    env["REGENIE_TPU_PLATFORM"] = "cpu"
    r = subprocess.run(
        [sys.executable, "-m", "regenie_tpu"] + args,
        capture_output=True, text=True, cwd="/root/repo", env=env, timeout=900,
    )
    assert r.returncode == 0, r.stdout + r.stderr


def _load(path):
    rows = {}
    with open(path) as fh:
        for line in fh:
            t = line.split()
            if t[0] == "CHROM":
                continue
            rows[t[2]] = t
    return rows


@pytest.fixture(scope="module")
def mcc_outputs(tmp_path_factory):
    d = tmp_path_factory.mktemp("mcc")
    base = [
        "--step", "2", "--bed", f"{EX}/example",
        "--covarFile", f"{EX}/covariates.txt",
        "--phenoFile", f"{EX}/phenotype.txt",
        "--bsize", "400", "--ignore-pred",
    ]
    _run_cli(base + ["--mcc", "--mcc-thr", "1", "--out", str(d / "mcc")])
    _run_cli(base + ["--out", str(d / "score")])
    _run_cli(base + ["--mcc", "--out", str(d / "thr")])  # default thr 0.01
    return d


def test_mcc_close_to_score_for_normal_traits(mcc_outputs):
    """For non-skewed phenotypes MCC ~ score test: same betas, nearly
    identical -log10 p."""
    a = _load(mcc_outputs / "mcc_Y1.regenie")
    b = _load(mcc_outputs / "score_Y1.regenie")
    assert len(a) == len(b) == 1000
    lp = np.array([
        [float(a[k][11]), float(b[k][11])]
        for k in a if a[k][11] != "NA" and b[k][11] != "NA"
    ])
    assert np.corrcoef(lp.T)[0, 1] > 0.999
    assert np.abs(lp[:, 0] - lp[:, 1]).max() < 0.2
    assert all(a[k][8] == b[k][8] for k in a)  # betas untouched


def test_mcc_thr_gates_low_pvalues(mcc_outputs):
    """With --mcc-thr 0.01 only rows whose score -log10 p > 2 switch to
    the MCC p-value (compute_score_qt_mcc regime 2)."""
    thr = _load(mcc_outputs / "thr_Y1.regenie")
    score = _load(mcc_outputs / "score_Y1.regenie")
    mcc = _load(mcc_outputs / "mcc_Y1.regenie")
    n_changed = 0
    for k in thr:
        if thr[k][11] == "NA":
            continue
        lp_s = float(score[k][11])
        if lp_s <= 2.0:
            assert thr[k][11] == score[k][11], k
        else:
            assert thr[k][11] == mcc[k][11], k
            n_changed += 1
    assert n_changed > 0
