"""MultiPhen (--multiphen) reverse-ordinal regression: POM fit vs a
scipy oracle and CLI end-to-end."""

import os
import subprocess
import sys
from types import SimpleNamespace

import numpy as np
import pytest
from scipy.optimize import minimize
from scipy.stats import chi2

from regenie_tpu.models.multiphen import (
    _fit_logistic, _fit_pom, _pom_score_test, multiphen_snp,
)

EX = "/root/reference/example"


def _oracle_negll(par, X, gi, K):
    th, be = par[: K - 1], par[K - 1 :]
    eta = X @ be if X.shape[1] else np.zeros(len(gi))
    cum = 1 / (1 + np.exp(-(th[None, :] - eta[:, None])))
    cum1 = np.column_stack([cum, np.ones(len(gi))])
    cum0 = np.column_stack([np.zeros(len(gi)), cum])
    pi = np.clip(cum1 - cum0, 1e-12, 1)
    return -np.log(pi[np.arange(len(gi)), gi.astype(int)]).sum()


@pytest.fixture(scope="module")
def pom_data():
    rng = np.random.default_rng(5)
    N, P = 300, 2
    Y = rng.normal(size=(N, P))
    lin = 0.8 * Y[:, 0] + rng.logistic(size=N)
    g = np.digitize(lin, [-1.0, 1.5]).astype(float)
    return g, Y


def test_pom_fit_matches_scipy_oracle(pom_data):
    g, Y = pom_data
    N, P = Y.shape
    K = 3
    maskf = np.ones(N)
    Yoh = np.zeros((N, K))
    Yoh[np.arange(N), g.astype(int)] = 1
    empty = np.zeros((N, 0))
    r0 = minimize(_oracle_negll, np.array([-0.5, 0.5]), args=(empty, g, K),
                  method="Nelder-Mead",
                  options={"xatol": 1e-12, "fatol": 1e-14, "maxiter": 9000})
    r1 = minimize(_oracle_negll, np.concatenate([r0.x, np.zeros(P)]),
                  args=(Y, g, K), method="BFGS", options={"gtol": 1e-11})
    p0, f0, _, ok0 = _fit_pom(empty, Yoh, maskf, K)
    pf, f1, _, ok1 = _fit_pom(Y, Yoh, maskf, K)
    assert ok0 and ok1
    assert abs(f0 - r0.fun) < 1e-6
    assert abs(f1 - r1.fun) < 1e-6
    # score p ~ LRT p for this strong signal
    pv = _pom_score_test(p0, empty, Y, Yoh, maskf, K)
    p_lrt = chi2.sf(2 * (f0 - f1), P)
    assert abs(np.log10(pv) - np.log10(p_lrt)) < 0.35


def test_multiphen_snp_binom_matches_logistic_lrt():
    rng = np.random.default_rng(8)
    N, P = 400, 2
    Y = rng.normal(size=(N, P))
    g = (0.9 * Y[:, 1] + rng.logistic(size=N) > 0.5).astype(float) * 2  # 0/2
    params = SimpleNamespace(
        multiphen_tol=2.5e-4, multiphen_maxit=150, multiphen_maxstep=200.0,
        multiphen_firth_mult=0.0, multiphen_thr=1.0,  # always LRT
    )
    Xcov = np.ones((N, 1))
    r = multiphen_snp(params, g, Xcov, Y, np.ones(N, bool))
    assert not r.is_multinom
    y = (g > 0).astype(float)
    b0, ll0, _, _ = _fit_logistic(Xcov, y, np.ones(N), 0.0)
    b1, ll1, _, _ = _fit_logistic(np.column_stack([Xcov, Y]), y, np.ones(N), 0.0)
    p_lrt = chi2.sf(2 * (ll1 - ll0), P)
    assert r.pval == pytest.approx(p_lrt, rel=1e-6)


def test_multiphen_cli(tmp_path):
    out = str(tmp_path / "mphen")
    env = dict(os.environ)
    env["REGENIE_TPU_PLATFORM"] = "cpu"
    r = subprocess.run(
        [sys.executable, "-m", "regenie_tpu", "--step", "2",
         "--bed", f"{EX}/example", "--covarFile", f"{EX}/covariates.txt",
         "--phenoFile", f"{EX}/phenotype.txt", "--bsize", "500",
         "--ignore-pred", "--multiphen", "--strict", "--out", out],
        capture_output=True, text=True, cwd="/root/repo", env=env, timeout=900,
    )
    assert r.returncode == 0, r.stdout + r.stderr
    lines = open(out + ".regenie").read().splitlines()
    assert lines[0].split() == [
        "CHROM", "GENPOS", "ID", "ALLELE0", "ALLELE1", "MAC", "A1FREQ", "N",
        "LOG10P", "MULTINOM", "IT", "UP", "FIRTH",
    ]
    assert len(lines) == 1001
    lp = np.array([float(l.split()[8]) for l in lines[1:] if l.split()[8] != "NA"])
    assert len(lp) > 990 and np.isfinite(lp).all()
    mult = {l.split()[9] for l in lines[1:]}
    assert "1" in mult  # common variants use the 3-category POM


def test_multiphen_approx_offset():
    """--multiphen-approx-offset freezes covariate effects as a null-fit
    offset in the LRT full model (Ordinal.cpp:726-812): p-values stay
    close to the exact refit for both the binomial and POM paths, and
    the LRT statistic is non-negative (nested models)."""
    from regenie_tpu.models.multiphen import multiphen_snp

    class P:
        multiphen_thr = 1.0  # force the LRT stage for every variant
        multiphen_tol = 2.5e-4
        multiphen_firth_mult = 1.0
        multiphen_maxstep = 200.0
        multiphen_maxit = 150
        multiphen_approx_offset = -1

    rng = np.random.default_rng(11)
    N = 800
    Xcov = np.concatenate([np.ones((N, 1)), rng.normal(size=(N, 2))], axis=1)
    Yres = rng.normal(size=(N, 3))
    mask = np.ones(N, dtype=bool)

    # 3-category POM path and 2-category binomial path
    g3 = rng.choice([0, 1, 2], size=N, p=[0.64, 0.32, 0.04]).astype(float)
    g2 = rng.choice([0, 1], size=N, p=[0.95, 0.05]).astype(float)
    for g in (g3, g2):
        P.multiphen_approx_offset = -1
        exact = multiphen_snp(P, g, Xcov, Yres, mask)
        P.multiphen_approx_offset = 1
        approx = multiphen_snp(P, g, Xcov, Yres, mask)
        assert exact.pval > 0 and approx.pval > 0
        # same decision scale: log10 p within 15%
        l0, l1 = -np.log10(exact.pval), -np.log10(approx.pval)
        assert abs(l0 - l1) < 0.15 * max(l0, l1, 1.0), (l0, l1)

    # MAC gate: threshold above the minor-category count -> exact path
    P.multiphen_approx_offset = 10_000
    gated = multiphen_snp(P, g3, Xcov, Yres, mask)
    P.multiphen_approx_offset = -1
    exact3 = multiphen_snp(P, g3, Xcov, Yres, mask)
    assert gated.pval == exact3.pval


def test_multiphen_test_modes():
    """--multiphen-test strategies (MultiPhen::run dispatch,
    Ordinal.cpp:184-206): score-only modes never run the LRT, LRT modes
    always do, the default escalates, `none` reports NA, and the
    cov_score_it1 alias maps to cov_score."""
    from regenie_tpu.models.multiphen import multiphen_snp

    class P:
        multiphen_thr = 0.001
        multiphen_tol = 2.5e-4
        multiphen_firth_mult = 1.0
        multiphen_maxstep = 200.0
        multiphen_maxit = 150
        multiphen_approx_offset = -1
        multiphen_test = "nocov_score_offset"

    rng = np.random.default_rng(5)
    N = 600
    Xcov = np.concatenate([np.ones((N, 1)), rng.normal(size=(N, 2))], axis=1)
    Yres = rng.normal(size=(N, 3))
    mask = np.ones(N, dtype=bool)
    g3 = rng.choice([0, 1, 2], size=N, p=[0.6, 0.3, 0.1]).astype(float)
    Yres[:, 0] += 0.4 * g3  # signal so the default escalates to the LRT

    res = {}
    for mode in ("nocov_score", "cov_score", "nocov_lrt", "cov_lrt",
                 "nocov_score_offset", "none", "cov_score_it1"):
        P.multiphen_test = mode
        res[mode] = multiphen_snp(P, g3, Xcov, Yres, mask).pval

    assert res["none"] == -1.0
    assert res["cov_score_it1"] == res["cov_score"]
    # default escalation ends at the covariate LRT
    assert res["nocov_score_offset"] == res["cov_lrt"]
    # all test modes detect the injected signal
    for mode in ("nocov_score", "cov_score", "nocov_lrt", "cov_lrt"):
        assert 0 < res[mode] < 1e-6, (mode, res[mode])
    # score-only mode differs from its LRT counterpart
    assert res["cov_score"] != res["cov_lrt"]


def test_multiphen_batched_matches_per_snp(tmp_path):
    """The batched block score stage (multiphen_block: per-category
    derivative scalars x masked Yres matmuls, vectorized intercept-only
    nulls) reproduces the per-SNP multiphen_snp output byte-for-byte on
    the example cohort, including the IT column and LRT escalations
    (which rerun the per-SNP path). Both default and pure-score modes."""
    import time as _t

    for extra, name in (([], "def"), (["--multiphen-thr", "0.5"], "esc"),
                        (["--multiphen-test", "nocov_score"], "score")):
        outs = {}
        times = {}
        for tag, env_extra in (("bat", {}),
                               ("snp", {"REGENIE_TPU_NO_BATCH_MPHEN": "1"})):
            out = str(tmp_path / f"m_{name}_{tag}")
            env = dict(os.environ)
            env["REGENIE_TPU_PLATFORM"] = "cpu"
            env.update(env_extra)
            t0 = _t.time()
            r = subprocess.run(
                [sys.executable, "-m", "regenie_tpu", "--step", "2",
                 "--bed", f"{EX}/example", "--covarFile",
                 f"{EX}/covariates.txt", "--phenoFile",
                 f"{EX}/phenotype.txt", "--bsize", "250",
                 "--ignore-pred", "--multiphen", "--strict", "--out", out],
                capture_output=True, text=True, cwd="/root/repo", env=env,
                timeout=900,
            )
            times[tag] = _t.time() - t0
            assert r.returncode == 0, r.stdout + r.stderr
            outs[tag] = open(out + ".regenie", "rb").read()
        assert outs["bat"] == outs["snp"], name
        print(f"[{name}] batched {times['bat']:.1f}s vs per-snp "
              f"{times['snp']:.1f}s")
