"""chrX non-PAR male dosage handling: MAC/AF stats and
--skip-dosage-comp genotype halving."""

import os
import subprocess
import sys

import numpy as np
import pytest

np_mod = np


def _stats(G, non_par, sex, skip=False):
    import jax.numpy as jnp

    from regenie_tpu.ops.geno_ops import snp_stats_block

    N = G.shape[1]
    ind = np.ones(N, dtype=bool)
    mask = np.ones((N, 1), dtype=bool)
    out = snp_stats_block(
        jnp.asarray(G), jnp.asarray(ind), jnp.asarray(mask),
        non_par=jnp.asarray(non_par), sex=jnp.asarray(sex),
        skip_comp=skip,
    )
    return {k: np.asarray(v) for k, v in out.items()}


def test_nonpar_mac_counts_males_hemizygous():
    # 3 males (diploid-coded 0/2), 3 females
    sex = np.array([1, 1, 1, 0, 0, 0], dtype=np.int32)
    G = np.array([[2, 2, 0, 1, 1, 0]], dtype=np.int8)
    non_par = np.array([True])
    sb = _stats(G, non_par, sex)
    # male allele count = g/2: 1+1+0; females: 1+1+0 => mac raw 4... minor
    # mirror = 2*6 - 3 males - 4 = 5 -> mac=4
    assert sb["mac"][0, 0] == pytest.approx(4.0)
    assert sb["mac1"][0] == pytest.approx(4.0)
    # AF still diploid denominator without skip_comp
    assert sb["af"][0, 0] == pytest.approx(6 / 12)
    # males never counted as het: g=2 males are hom, g=0 male is RR
    assert sb["n_rr"][0] == 2  # 1 male g=0 + 1 female g=0
    assert sb["n_aa"][0] == 2  # 2 males g=2


def test_autosomal_rows_unchanged():
    sex = np.array([1, 1, 0, 0], dtype=np.int32)
    G = np.array([[2, 1, 1, 0]], dtype=np.int8)
    sb_x = _stats(G, np.array([False]), sex)
    assert sb_x["mac"][0, 0] == pytest.approx(4.0)
    assert sb_x["af"][0, 0] == pytest.approx(0.5)
    assert sb_x["n_rr"][0] == 1 and sb_x["n_aa"][0] == 1


def test_skip_dosage_comp_af():
    """With --skip-dosage-comp the caller halves male genotypes and the
    AF denominator drops one allele per male (compute_aaf_info,
    Geno.cpp:3117)."""
    sex = np.array([1, 1, 1, 0, 0, 0], dtype=np.int32)
    G = np.array([[2.0, 2.0, 0.0, 1.0, 1.0, 0.0]])
    halved = G.copy()
    halved[0, :3] /= 2  # caller-side halving
    sb = _stats(halved, np.array([True]), sex, skip=True)
    # total = 1+1+0+1+1 = 4; alleles = 2*6 - 3 = 9
    assert sb["af"][0, 0] == pytest.approx(4 / 9)
    assert sb["mac1"][0] == pytest.approx(4.0)


def test_chrx_end_to_end(tmp_path):
    """Full CLI run on a synthetic chrX dataset: A1FREQ uses the
    male-adjusted denominator only under --skip-dosage-comp."""
    rng = np.random.default_rng(3)
    N = 60
    sex = np.array([1] * 30 + [2] * 30)  # fam coding 1=male 2=female
    male = sex == 1
    g_f = rng.integers(0, 3, size=N)
    g = np.where(male, 2 * rng.integers(0, 2, size=N), g_f)  # males 0/2

    prefix = str(tmp_path / "xdat")
    codes = np.where(g == 2, 0, np.where(g == 1, 2, 3)).astype(np.uint8)
    pad = (-N) % 4
    codes = np.concatenate([codes, np.zeros(pad, dtype=np.uint8)]).reshape(-1, 4)
    byts = (codes[:, 0] | (codes[:, 1] << 2) | (codes[:, 2] << 4) | (codes[:, 3] << 6))
    with open(prefix + ".bed", "wb") as fh:
        fh.write(b"\x6c\x1b\x01")
        fh.write(byts.astype(np.uint8).tobytes())
    with open(prefix + ".bim", "w") as fh:
        fh.write("23 snpX 0 30000000 A B\n")  # non-PAR chrX
    with open(prefix + ".fam", "w") as fh:
        for i in range(N):
            fh.write(f"F{i} I{i} 0 0 {sex[i]} 0\n")
    with open(str(tmp_path / "pheno.txt"), "w") as fh:
        fh.write("FID IID Y1\n")
        y = g * 0.2 + rng.normal(size=N)
        for i in range(N):
            fh.write(f"F{i} I{i} {y[i]:.5f}\n")

    env = dict(os.environ)
    env["REGENIE_TPU_PLATFORM"] = "cpu"
    base = [sys.executable, "-m", "regenie_tpu", "--step", "2",
            "--bed", prefix, "--phenoFile", str(tmp_path / "pheno.txt"),
            "--bsize", "10", "--ignore-pred", "--minMAC", "1"]
    r1 = subprocess.run(base + ["--out", str(tmp_path / "dflt")],
                        capture_output=True, text=True, cwd="/root/repo",
                        env=env, timeout=600)
    assert r1.returncode == 0, r1.stdout + r1.stderr
    r2 = subprocess.run(base + ["--skip-dosage-comp", "--out", str(tmp_path / "skip")],
                        capture_output=True, text=True, cwd="/root/repo",
                        env=env, timeout=600)
    assert r2.returncode == 0, r2.stdout + r2.stderr

    row1 = open(str(tmp_path / "dflt_Y1.regenie")).readlines()[1].split()
    row2 = open(str(tmp_path / "skip_Y1.regenie")).readlines()[1].split()
    n_male = int(male.sum())
    af_dflt = g.sum() / (2 * N)
    af_skip = (np.where(male, g / 2, g)).sum() / (2 * N - n_male)
    assert float(row1[5]) == pytest.approx(af_dflt, abs=5e-4)
    assert float(row2[5]) == pytest.approx(af_skip, abs=5e-4)


def test_sex_specific_and_range(tmp_path):
    """--sex-specific restricts samples; --range restricts variants."""
    rng = np_mod.random.default_rng(9)
    N = 40
    sex = np_mod.array([1] * 25 + [2] * 15)
    g = rng.integers(0, 3, size=N)
    prefix = str(tmp_path / "sx")
    codes = np_mod.where(g == 2, 0, np_mod.where(g == 1, 2, 3)).astype(np_mod.uint8)
    pad = (-N) % 4
    codes = np_mod.concatenate([codes, np_mod.zeros(pad, dtype=np_mod.uint8)]).reshape(-1, 4)
    byts = (codes[:, 0] | (codes[:, 1] << 2) | (codes[:, 2] << 4) | (codes[:, 3] << 6))
    with open(prefix + ".bed", "wb") as fh:
        fh.write(b"\x6c\x1b\x01")
        fh.write(byts.astype(np_mod.uint8).tobytes())
        fh.write(byts.astype(np_mod.uint8).tobytes())  # second variant
    with open(prefix + ".bim", "w") as fh:
        fh.write("1 v1 0 100 A B\n1 v2 0 900 A B\n")
    with open(prefix + ".fam", "w") as fh:
        for i in range(N):
            fh.write(f"F{i} I{i} 0 0 {sex[i]} 0\n")
    with open(str(tmp_path / "ph.txt"), "w") as fh:
        fh.write("FID IID Y1\n")
        y = rng.normal(size=N)
        for i in range(N):
            fh.write(f"F{i} I{i} {y[i]:.4f}\n")
    env = dict(os.environ)
    env["REGENIE_TPU_PLATFORM"] = "cpu"
    r = subprocess.run(
        [sys.executable, "-m", "regenie_tpu", "--step", "2", "--bed", prefix,
         "--phenoFile", str(tmp_path / "ph.txt"), "--bsize", "10",
         "--ignore-pred", "--minMAC", "1", "--sex-specific", "male",
         "--range", "1:500-1000", "--out", str(tmp_path / "o")],
        capture_output=True, text=True, cwd="/root/repo", env=env, timeout=600,
    )
    assert r.returncode == 0, r.stdout + r.stderr
    lines = open(str(tmp_path / "o_Y1.regenie")).read().splitlines()
    assert len(lines) == 2  # header + only v2 (range filter)
    t = lines[1].split()
    assert t[2] == "v2" and int(t[6]) == 25  # male-only N
