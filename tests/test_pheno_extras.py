"""Transposed phenotype input (--tpheno-file) and covariate-effect
output (--print-cov-betas)."""

import os
import subprocess
import sys

import numpy as np
import pytest

EX = "/root/reference/example"


def _run(args):
    env = dict(os.environ)
    env["REGENIE_TPU_PLATFORM"] = "cpu"
    r = subprocess.run(
        [sys.executable, "-m", "regenie_tpu"] + args,
        capture_output=True, text=True, cwd="/root/repo", env=env, timeout=600,
    )
    assert r.returncode == 0, r.stdout + r.stderr


BASE = ["--step", "2", "--bed", f"{EX}/example",
        "--covarFile", f"{EX}/covariates.txt", "--bsize", "500",
        "--ignore-pred"]


def test_tpheno_identical_to_standard(tmp_path):
    lines = open(f"{EX}/phenotype.txt").read().splitlines()
    hdr = lines[0].split()
    rows = [l.split() for l in lines[1:]]
    tp = str(tmp_path / "tpheno.txt")
    with open(tp, "w") as fh:
        fh.write("TRAIT " + " ".join(f"{r[0]}_{r[1]}" for r in rows) + "\n")
        for j, name in enumerate(hdr[2:]):
            fh.write(name + " " + " ".join(r[2 + j] for r in rows) + "\n")
    _run(BASE + ["--phenoFile", f"{EX}/phenotype.txt", "--out", str(tmp_path / "s")])
    _run(BASE + ["--tpheno-file", tp, "--tpheno-indexCol", "1",
                 "--out", str(tmp_path / "t")])
    for ph in ("Y1", "Y2"):
        assert (
            open(tmp_path / f"s_{ph}.regenie").read()
            == open(tmp_path / f"t_{ph}.regenie").read()
        )


def test_print_cov_betas_matches_ols(tmp_path):
    _run(BASE + ["--phenoFile", f"{EX}/phenotype.txt", "--print-cov-betas",
                 "--out", str(tmp_path / "cb")])
    got = {}
    for line in open(tmp_path / "cb_cov_betas.txt"):
        t = line.rstrip().split("\t")
        if t[0] == "COVAR":
            continue
        got[(t[0], t[1])] = t

    # oracle OLS on complete cases
    cov, ph = {}, {}
    for l in open(f"{EX}/covariates.txt"):
        t = l.split()
        if t[0] != "FID":
            cov[f"{t[0]}_{t[1]}"] = [float(x) for x in t[2:]]
    for l in open(f"{EX}/phenotype.txt"):
        t = l.split()
        if t[0] != "FID":
            ph[f"{t[0]}_{t[1]}"] = t[2]
    keys = [k for k in cov if k in ph and ph[k] != "NA"]
    X = np.array([[1.0] + cov[k] for k in keys])
    y = np.array([float(ph[k]) for k in keys])
    XtXi = np.linalg.inv(X.T @ X)
    b = XtXi @ X.T @ y
    res = y - X @ b
    se = np.sqrt(np.diag(XtXi) * (res @ res) / (len(y) - X.shape[1]))
    for i, nm in enumerate(["V1", "V2", "V3"]):
        row = got[(nm, "Y1")]
        assert float(row[2]) == pytest.approx(b[i + 1], abs=2e-3)
        assert float(row[3]) == pytest.approx(se[i + 1], rel=2e-2)
