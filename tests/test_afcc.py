"""--af-cc: case/control allele frequencies and counts for BTs."""

import os
import subprocess
import sys

import numpy as np
import pytest

EX = "/root/reference/example"


def test_af_cc_columns(tmp_path):
    out = str(tmp_path / "afcc")
    env = dict(os.environ)
    env["REGENIE_TPU_PLATFORM"] = "cpu"
    r = subprocess.run(
        [sys.executable, "-m", "regenie_tpu", "--step", "2",
         "--bed", f"{EX}/example", "--covarFile", f"{EX}/covariates.txt",
         "--phenoFile", f"{EX}/phenotype_bin.txt", "--bt", "--bsize", "500",
         "--ignore-pred", "--af-cc", "--out", out],
        capture_output=True, text=True, cwd="/root/repo", env=env, timeout=600,
    )
    assert r.returncode == 0, r.stdout + r.stderr
    lines = open(out + "_Y1.regenie").read().splitlines()
    hdr = lines[0].split()
    assert hdr[:12] == ["CHROM", "GENPOS", "ID", "ALLELE0", "ALLELE1", "A1FREQ",
                       "A1FREQ_CASES", "A1FREQ_CONTROLS", "N", "N_CASES",
                       "N_CONTROLS", "TEST"]
    for l in lines[1:50]:
        t = l.split()
        af, afca, afco = float(t[5]), float(t[6]), float(t[7])
        n, nca, nco = int(t[8]), int(t[9]), int(t[10])
        assert n == nca + nco
        # overall AF is the count-weighted mix of case/control AF
        assert af == pytest.approx((afca * nca + afco * nco) / n, abs=5e-4)
