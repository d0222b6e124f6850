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


def test_t2e_fused_byte_identical(t2e_pheno):
    """The fused packed-bytes Cox path (per-trait [WX1 | R | v] operand
    blocks, T = Gres.v and res_var*||Gres||^2 recovered in product
    space, Firth rows decoded lazily — compute_score_cox,
    Step2_Models.cpp:632) is byte-identical to the dense pipeline,
    including approx-Firth corrections and HTP output."""
    d, pheno = t2e_pheno
    for htp in (False, True):
        sfx = "_htp" if htp else ""
        extra = ["--htp", "XT"] if htp else []
        out_f = _run(_step2_args(pheno, str(d / f"fus{sfx}")) + extra,
                     extra_env={"REGENIE_TPU_FUSED": "1"})
        assert "fast path" in out_f and "T2E" in out_f
        _run(_step2_args(pheno, str(d / f"den{sfx}")) + extra,
             extra_env={"REGENIE_TPU_FUSED": "0"})
        a = open(str(d / f"fus{sfx}_T1.regenie"), "rb").read()
        b = open(str(d / f"den{sfx}_T1.regenie"), "rb").read()
        assert a == b, htp


def test_t2e_fused_mesh_byte_identical(t2e_pheno):
    """Fused Cox under the 8-device variant-sharded mesh (shard_map,
    bsize not divisible by the mesh size exercises pad rows)."""
    d, pheno = t2e_pheno
    args = _step2_args(pheno, str(d / "fmesh"))
    args[args.index("--bsize") + 1] = "170"
    out = _run(args, extra_env={
        "JAX_PLATFORMS": "cpu",
        "XLA_FLAGS": "--xla_force_host_platform_device_count=8",
        "REGENIE_TPU_MESH": "1", "REGENIE_TPU_FUSED": "1",
    })
    assert "fast path" in out
    args1 = _step2_args(pheno, str(d / "fone"))
    args1[args1.index("--bsize") + 1] = "170"
    _run(args1, extra_env={"REGENIE_TPU_FUSED": "1"})
    a = open(str(d / "fmesh_T1.regenie"), "rb").read()
    b = open(str(d / "fone_T1.regenie"), "rb").read()
    assert a == b


def test_t2e_fused_chrx_byte_identical(tmp_path):
    """chrX non-PAR on the fused Cox path: male tail columns reproduce
    the hemizygous MAC/genotype classes; byte-identical to dense on a
    mixed autosome+chrX dataset with sample removal."""
    rng = np.random.default_rng(11)
    N, M = 160, 50
    sex = np.array([1] * 75 + [2] * 85)
    male = sex == 1
    G = rng.integers(0, 3, size=(M, N))
    for v in range(M // 2, M):
        G[v] = np.where(male, 2 * rng.integers(0, 2, size=N), G[v])
    miss = rng.random((M, N)) < 0.03
    codes = np.where(G == 2, 0, np.where(G == 1, 2, 3)).astype(np.uint8)
    codes[miss] = 1
    pad = (-N) % 4
    codes = np.concatenate(
        [codes, np.zeros((M, pad), np.uint8)], axis=1).reshape(M, -1, 4)
    byts = (codes[:, :, 0] | (codes[:, :, 1] << 2)
            | (codes[:, :, 2] << 4) | (codes[:, :, 3] << 6))
    prefix = str(tmp_path / "xmix")
    with open(prefix + ".bed", "wb") as fh:
        fh.write(b"\x6c\x1b\x01" + byts.astype(np.uint8).tobytes())
    with open(prefix + ".bim", "w") as fh:
        for v in range(M // 2):
            fh.write(f"1 a{v} 0 {v + 1} A B\n")
        for v in range(M // 2, M):
            fh.write(f"23 x{v} 0 {30000000 + v} A B\n")
    with open(prefix + ".fam", "w") as fh:
        for i in range(N):
            fh.write(f"F{i} I{i} 0 0 {sex[i]} 0\n")
    with open(str(tmp_path / "ph.txt"), "w") as fh:
        fh.write("FID IID T1 E1\n")
        for i in range(N):
            fh.write(f"F{i} I{i} {rng.exponential(8.0):.4f} "
                     f"{int(rng.random() < 0.7)}\n")
    with open(str(tmp_path / "rm.txt"), "w") as fh:
        for i in (5, 33, 100):
            fh.write(f"F{i} I{i}\n")

    args = ["--step", "2", "--bed", prefix,
            "--phenoFile", str(tmp_path / "ph.txt"),
            "--remove", str(tmp_path / "rm.txt"),
            "--bsize", "20", "--ignore-pred", "--minMAC", "1",
            "--t2e", "--phenoColList", "T1", "--eventColList", "E1",
            "--firth", "--approx", "--pThresh", "0.9"]
    out_f = _run(args + ["--out", str(tmp_path / "fus")],
                 extra_env={"REGENIE_TPU_FUSED": "1"})
    assert "fast path" in out_f
    _run(args + ["--out", str(tmp_path / "den")],
         extra_env={"REGENIE_TPU_FUSED": "0"})
    a = open(str(tmp_path / "fus_T1.regenie"), "rb").read()
    b = open(str(tmp_path / "den_T1.regenie"), "rb").read()
    assert a == b
