"""End-to-end --t2e (Cox) CLI runs: step-1 ridge + step-2 score/Firth
on a synthetic time/event phenotype over the example cohort, plus
8-device mesh byte-identity for the variant-sharded Cox scorer."""

import os
import subprocess
import sys

import numpy as np
import pytest

EX = "/root/reference/example"


def _run(args, extra_env=None):
    env = dict(os.environ)
    env["REGENIE_TPU_PLATFORM"] = "cpu"
    if extra_env:
        env.update(extra_env)
    r = subprocess.run(
        [sys.executable, "-m", "regenie_tpu"] + args,
        capture_output=True, text=True, cwd="/root/repo", env=env, timeout=900,
    )
    assert r.returncode == 0, r.stdout[-3000:] + r.stderr[-2000:]
    return r.stdout


@pytest.fixture(scope="module")
def t2e_pheno(tmp_path_factory):
    d = tmp_path_factory.mktemp("t2e")
    ids = [l.split()[:2] for l in open(f"{EX}/example.fam")]
    rng = np.random.default_rng(7)
    path = str(d / "pheno_t2e.txt")
    with open(path, "w") as fh:
        fh.write("FID IID T1 E1\n")
        for fid, iid in ids:
            t = rng.exponential(10.0)
            e = int(rng.random() < 0.7)
            fh.write(f"{fid} {iid} {t:.4f} {e}\n")
    return d, path


def _step2_args(pheno, out, pred=None):
    args = ["--step", "2", "--bed", f"{EX}/example",
            "--covarFile", f"{EX}/covariates.txt",
            "--phenoFile", pheno, "--bsize", "150", "--t2e",
            "--phenoColList", "T1", "--eventColList", "E1",
            "--firth", "--approx", "--pThresh", "0.9", "--out", out]
    if pred:
        args += ["--pred", pred]
    else:
        args += ["--ignore-pred"]
    return args


def test_t2e_step1_step2_run(t2e_pheno):
    d, pheno = t2e_pheno
    fit = str(d / "fit")
    log = _run(["--step", "1", "--bed", f"{EX}/example",
                "--covarFile", f"{EX}/covariates.txt",
                "--phenoFile", pheno, "--bsize", "100", "--t2e",
                "--phenoColList", "T1", "--eventColList", "E1",
                "--out", fit])
    assert os.path.isfile(fit + "_pred.list"), log
    _run(_step2_args(pheno, str(d / "assoc"), fit + "_pred.list"))
    lines = open(str(d / "assoc_T1.regenie")).read().splitlines()
    assert len(lines) == 1001  # header + 1000 variants
    hdr = lines[0].split()
    ichi, ilog = hdr.index("CHISQ"), hdr.index("LOG10P")
    from scipy.stats import chi2

    checked = 0
    for l in lines[1:]:
        t = l.split()
        if t[ichi] == "NA" or t[ilog] == "NA":
            continue
        lp = -np.log10(max(chi2.sf(float(t[ichi]), df=1), 5e-324))
        assert abs(lp - float(t[ilog])) < 2e-4 * max(1.0, lp)
        checked += 1
    assert checked > 900


def test_t2e_mesh_byte_identical(t2e_pheno):
    d, pheno = t2e_pheno
    _run(_step2_args(pheno, str(d / "mesh")), extra_env={
        "JAX_PLATFORMS": "cpu",
        "XLA_FLAGS": "--xla_force_host_platform_device_count=8",
        "REGENIE_TPU_MESH": "1",
    })
    _run(_step2_args(pheno, str(d / "plain")))
    a = open(str(d / "mesh_T1.regenie"), "rb").read()
    b = open(str(d / "plain_T1.regenie"), "rb").read()
    assert a == b
