"""Step-1 K-fold level-1 for BT (logistic ridge) and CT (Poisson ridge):
K-fold is the default above 5k samples for BT; predictions must agree
closely with the LOOCV scheme."""

import os
import subprocess
import sys

import numpy as np
import pytest

EX = "/root/reference/example"


def _write_bed(prefix, G):
    N, M = G.shape
    codes = np.where(G.T == 2, 0, np.where(G.T == 1, 2, 3)).astype(np.uint8)
    pad = (-N) % 4
    codes = np.concatenate([codes, np.zeros((M, pad), np.uint8)], axis=1)
    c = codes.reshape(M, -1, 4)
    byts = (c[:, :, 0] | (c[:, :, 1] << 2) | (c[:, :, 2] << 4) | (c[:, :, 3] << 6))
    with open(prefix + ".bed", "wb") as fh:
        fh.write(b"\x6c\x1b\x01")
        fh.write(byts.astype(np.uint8).tobytes())
    with open(prefix + ".bim", "w") as fh:
        for m in range(M):
            fh.write(f"{1 + m // (M // 3)} snp{m} 0 {m+1} A B\n")
    with open(prefix + ".fam", "w") as fh:
        for i in range(N):
            fh.write(f"F{i} I{i} 0 0 0 0\n")


def _run(args):
    env = dict(os.environ)
    env["REGENIE_TPU_PLATFORM"] = "cpu"
    r = subprocess.run(
        [sys.executable, "-m", "regenie_tpu"] + args,
        capture_output=True, text=True, cwd="/root/repo", env=env, timeout=1200,
    )
    assert r.returncode == 0, r.stdout[-3000:] + r.stderr[-2000:]
    return r.stdout


def _loco(path):
    lines = open(path).read().splitlines()
    return np.array([[float(x) for x in l.split()[1:]] for l in lines[1:]])


def test_bt_kfold_default_above_5k(tmp_path):
    rng = np.random.default_rng(21)
    N, M = 5200, 90
    maf = rng.uniform(0.1, 0.5, M)
    G = rng.binomial(2, np.broadcast_to(maf, (N, M)))
    eta = (G - 2 * maf).astype(float) @ rng.normal(0, 0.1, M) - 0.4
    y = rng.binomial(1, 1 / (1 + np.exp(-eta)))
    pref = str(tmp_path / "bt5k")
    _write_bed(pref, G)
    with open(pref + "_ph.txt", "w") as fh:
        fh.write("FID IID Y1\n")
        for i in range(N):
            fh.write(f"F{i} I{i} {y[i]}\n")
    base = ["--step", "1", "--bed", pref, "--phenoFile", pref + "_ph.txt",
            "--bt", "--bsize", "45"]
    out1 = _run(base + ["--out", str(tmp_path / "kf")])
    assert "using LOOCV instead" not in out1  # K-fold is the default here
    assert "min value" in out1
    _run(base + ["--loocv", "--out", str(tmp_path / "loo")])
    a = _loco(str(tmp_path / "kf_1.loco"))
    b = _loco(str(tmp_path / "loo_1.loco"))
    assert np.isfinite(a).all()
    for c in range(a.shape[0]):
        if a[c].std() > 0 and b[c].std() > 0:
            assert np.corrcoef(a[c], b[c])[0, 1] > 0.9


def test_ct_kfold(tmp_path):
    rng = np.random.default_rng(3)
    rows = [l.split() for l in
            open(f"{EX}/phenotype.txt").read().splitlines()[1:]]
    ph = str(tmp_path / "pheno_ct.txt")
    with open(ph, "w") as fh:
        fh.write("FID IID Y1\n")
        for r in rows:
            fh.write(f"{r[0]} {r[1]} {rng.poisson(np.exp(0.3 * rng.normal()))}\n")
    out = _run(["--step", "1", "--bed", f"{EX}/example",
                "--covarFile", f"{EX}/covariates.txt", "--phenoFile", ph,
                "--ct", "--bsize", "100", "--out", str(tmp_path / "ct")])
    assert "min value" in out
    v = _loco(str(tmp_path / "ct_1.loco"))
    assert np.isfinite(v).all() and v.std() > 0


def _pv_file(path, n_block, hot, P=1):
    """-log10 p per block table (rows CHROM BLOCK pv..): uniform noise with
    one strongly associated block -> adaptive --select-l0 keeps only its
    min-shrinkage column with a zero penalty multiplier."""
    rng = np.random.default_rng(11)
    with open(path, "w") as fh:
        for b in range(n_block):
            pvs = [9.0 if b == hot else float(-np.log10(rng.uniform()))
                   for _ in range(P)]
            fh.write("1 " + str(b + 1) + " " + " ".join(f"{p:.4f}" for p in pvs) + "\n")


def test_select_l0_adaptive_bt_kfold(tmp_path):
    """Adaptive --select-l0 in the BT K-fold level 1 applies the
    per-column tau * ridge_param_mult penalty (ridge_logistic_level_1,
    Step1_Models.cpp:1031-1041) instead of erroring out."""
    rng = np.random.default_rng(5)
    N, M = 5200, 180
    maf = rng.uniform(0.1, 0.5, M)
    G = rng.binomial(2, np.broadcast_to(maf, (N, M)))
    eta = (G - 2 * maf).astype(float) @ rng.normal(0, 0.1, M) - 0.4
    y = rng.binomial(1, 1 / (1 + np.exp(-eta)))
    pref = str(tmp_path / "sel")
    _write_bed(pref, G)
    with open(pref + "_ph.txt", "w") as fh:
        fh.write("FID IID Y1\n")
        for i in range(N):
            fh.write(f"F{i} I{i} {y[i]}\n")
    _pv_file(pref + "_pv.txt", 9, hot=4)
    out = _run(["--step", "1", "--bed", pref, "--phenoFile", pref + "_ph.txt",
                "--bt", "--bsize", "20", "--select-l0", pref + "_pv.txt",
                "--out", str(tmp_path / "selo")])
    assert "using LOOCV instead" not in out  # K-fold path exercised
    assert "blocks selected" in out
    v = _loco(str(tmp_path / "selo_1.loco"))
    assert np.isfinite(v).all() and v.std() > 0


def test_select_l0_adaptive_ct_loocv(tmp_path):
    """Adaptive --select-l0 in the Poisson LOOCV level 1 applies
    lambda * ridge_param_mult (run_ct_ridge_loocv, Step1_Models.cpp:1719)."""
    rng = np.random.default_rng(3)
    rows = [l.split() for l in
            open(f"{EX}/phenotype.txt").read().splitlines()[1:]]
    ph = str(tmp_path / "pheno_ct.txt")
    with open(ph, "w") as fh:
        fh.write("FID IID Y1\n")
        for r in rows:
            fh.write(f"{r[0]} {r[1]} {rng.poisson(np.exp(0.3 * rng.normal()))}\n")
    _pv_file(str(tmp_path / "pv.txt"), 10, hot=2)
    base = ["--step", "1", "--bed", f"{EX}/example",
            "--covarFile", f"{EX}/covariates.txt", "--phenoFile", ph,
            "--ct", "--bsize", "100"]
    out = _run(base + ["--select-l0", str(tmp_path / "pv.txt"),
                       "--out", str(tmp_path / "ctsel")])
    assert "blocks selected" in out and "min value" in out
    v = _loco(str(tmp_path / "ctsel_1.loco"))
    assert np.isfinite(v).all() and v.std() > 0
    # selection must actually change the model vs the unselected run
    _run(base + ["--out", str(tmp_path / "ct0")])
    v0 = _loco(str(tmp_path / "ct0_1.loco"))
    assert not np.allclose(v, v0)


def test_adam_mini_batch_optimizer():
    """Mini-batch ADAM (--adam-mini path of _adam_log_ridge,
    run_log_ridge_loocv_adam Step1_Models.cpp:1395-1404) approaches the
    penalized-logistic optimum found by the exact Newton solver."""
    from regenie_tpu.models.step1_bt import _adam_log_ridge

    rng = np.random.default_rng(7)
    N, F = 2000, 8
    X = rng.normal(size=(N, F))
    beta_true = rng.normal(size=F) * 0.5
    pi = 1 / (1 + np.exp(-(X @ beta_true)))
    y = (rng.random(N) < pi).astype(np.float64)
    mask = np.ones(N, dtype=bool)
    offset = np.zeros(N)
    tau = 5.0

    # exact optimum via scipy on the penalized deviance
    from scipy.optimize import minimize

    def negll(b):
        eta = X @ b
        return (np.logaddexp(0, eta) - y * eta).sum() + 0.5 * tau * (b @ b)

    bstar = minimize(negll, np.zeros(F), method="BFGS").x

    b_mini = _adam_log_ridge(y, X, offset, mask, tau, np.zeros(F),
                             niter=4000, tol=1e-7, mini=True,
                             batch_size=256, seed=1)
    # stochastic optimizer: close to the optimum, not exact
    assert np.abs(b_mini - bstar).max() < 0.12
    assert negll(b_mini) < negll(np.zeros(F))
    # full-batch variant converges tighter
    b_full = _adam_log_ridge(y, X, offset, mask, tau, np.zeros(F),
                             niter=4000, tol=1e-7)
    assert np.abs(b_full - bstar).max() < 0.01
