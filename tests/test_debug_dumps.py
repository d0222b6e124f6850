"""--debug observability surface (write_inputs/get_mem analogs,
Data.cpp:911 / Regenie.cpp:1942): input dumps, per-block progress with
an RSS trail, and the peak-RSS exit line."""

import os
import subprocess
import sys

import numpy as np

EX = "/root/reference/example"


def test_step2_debug_dumps_and_rss(tmp_path):
    env = dict(os.environ)
    env["REGENIE_TPU_PLATFORM"] = "cpu"
    out = tmp_path / "dbg"
    r = subprocess.run(
        [sys.executable, "-m", "regenie_tpu", "--step", "2",
         "--bed", f"{EX}/example", "--covarFile", f"{EX}/covariates.txt",
         "--phenoFile", f"{EX}/phenotype.txt",
         "--remove", f"{EX}/fid_iid_to_remove.txt",
         "--bsize", "500", "--ignore-pred", "--debug", "--out", str(out)],
        capture_output=True, text=True, env=env, timeout=300)
    assert r.returncode == 0, r.stderr[-500:]
    # write_inputs analog: Y + covariate basis dumps (QT: residualized)
    y = np.loadtxt(f"{out}_y.txt")
    x = np.loadtxt(f"{out}_x.txt")
    assert y.ndim == 2 and x.ndim == 2 and y.shape[0] == x.shape[0]
    # per-block progress + live RSS trail + peak RSS at exit
    assert "-block 1/" in r.stdout
    assert "memory usage=" in r.stdout
    assert "peak memory usage" in r.stdout


def test_step1_debug_offset_dump(tmp_path):
    env = dict(os.environ)
    env["REGENIE_TPU_PLATFORM"] = "cpu"
    out = tmp_path / "d1"
    r = subprocess.run(
        [sys.executable, "-m", "regenie_tpu", "--step", "1",
         "--bed", f"{EX}/example", "--exclude", f"{EX}/snplist_rm.txt",
         "--covarFile", f"{EX}/covariates.txt",
         "--phenoFile", f"{EX}/phenotype_bin.txt",
         "--remove", f"{EX}/fid_iid_to_remove.txt",
         "--bsize", "100", "--bt", "--debug", "--out", str(out)],
        capture_output=True, text=True, env=env, timeout=600)
    assert r.returncode == 0, r.stderr[-500:]
    # BT: raw Y + the null-model offsets dump
    y = np.loadtxt(f"{out}_y.txt")
    off = np.loadtxt(f"{out}_offset.txt")
    assert set(np.unique(y)).issubset({0.0, 1.0, -999.0})
    assert off.shape[0] == y.shape[0]
    assert "-level 0 block 1/" in r.stdout
