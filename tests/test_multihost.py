"""Multi-host distributed runtime (parallel/dist.py): the full CLI run
as N cooperating processes over jax.distributed with Gloo CPU
collectives — the TPU-native replacement for the reference's
shared-filesystem split-L0 protocol (Data.cpp:244-309) and manual
per-chromosome step-2 sharding (docs/recommendations.md:128).

Each test launches the SAME CLI invocation in 2 processes (2 virtual
CPU devices each -> a 4-device global mesh), and asserts the host-0
output is byte-identical to a single-process 4-device mesh run."""

import os
import socket
import subprocess
import sys

import pytest

EX = "/root/reference/example"
REPO = "/root/repo"


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _run_single(args, out, n_devices=4, env_extra=None):
    env = dict(os.environ)
    env.update({
        "REGENIE_TPU_PLATFORM": "cpu",
        "JAX_PLATFORMS": "cpu",
        "XLA_FLAGS": f"--xla_force_host_platform_device_count={n_devices}",
        "REGENIE_TPU_MESH": "1",
        "REGENIE_TPU_FUSED": "1",
    })
    env.update(env_extra or {})
    r = subprocess.run(
        [sys.executable, "-m", "regenie_tpu"] + args + ["--out", out],
        capture_output=True, text=True, cwd=REPO, env=env, timeout=900,
    )
    assert r.returncode == 0, r.stdout + r.stderr
    return r.stdout


def _run_multihost(args, out, nproc=2, local_devices=2, env_extra=None):
    port = _free_port()
    procs = []
    for pid in range(nproc):
        env = dict(os.environ)
        env.update({
            "REGENIE_TPU_PLATFORM": "cpu",
            "JAX_PLATFORMS": "cpu",
            "XLA_FLAGS":
                f"--xla_force_host_platform_device_count={local_devices}",
            "REGENIE_TPU_MESH": "1",
            "REGENIE_TPU_FUSED": "1",
            "REGENIE_TPU_COORDINATOR": f"127.0.0.1:{port}",
            "REGENIE_TPU_NUM_PROCESSES": str(nproc),
            "REGENIE_TPU_PROCESS_ID": str(pid),
        })
        env.update(env_extra or {})
        procs.append(subprocess.Popen(
            [sys.executable, "-m", "regenie_tpu"] + args + ["--out", out],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            cwd=REPO, env=env,
        ))
    outs = []
    for p in procs:
        try:
            o, _ = p.communicate(timeout=900)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(o)
        assert p.returncode == 0, "\n".join(outs)
    return outs[0]


@pytest.mark.skipif(os.environ.get("REGENIE_TPU_SKIP_MULTIHOST") == "1",
                    reason="multihost disabled")
def test_multihost_step2_qt_fused_byte_identical(tmp_path):
    """2-process step-2 QT over the fused packed-bytes scorer: host 0
    writes output byte-identical to a single-process 4-device mesh run
    (same global mesh semantics); the other host writes nothing."""
    fit = str(tmp_path / "fit")
    _run_single([
        "--step", "1", "--bed", f"{EX}/example",
        "--exclude", f"{EX}/snplist_rm.txt",
        "--covarFile", f"{EX}/covariates.txt",
        "--phenoFile", f"{EX}/phenotype.txt",
        "--bsize", "100"], fit, n_devices=1)
    common = ["--step", "2", "--bed", f"{EX}/example",
              "--covarFile", f"{EX}/covariates.txt",
              "--phenoFile", f"{EX}/phenotype.txt",
              # bsize not divisible by 4: exercises mesh pad rows
              "--bsize", "170", "--pred", fit + "_pred.list"]
    one = str(tmp_path / "one")
    mh = str(tmp_path / "mh")
    out1 = _run_single(common, one)
    assert "fast path" in out1
    out2 = _run_multihost(common, mh)
    assert "distributed: process 0 of 2" in out2
    assert "multi-chip mesh: 4" in out2
    assert "per-host decode" in out2  # each host read only its rows
    for ph in ("Y1", "Y2"):
        a = open(f"{one}_{ph}.regenie", "rb").read()
        b = open(f"{mh}_{ph}.regenie", "rb").read()
        assert a == b, ph


@pytest.mark.skipif(os.environ.get("REGENIE_TPU_SKIP_MULTIHOST") == "1",
                    reason="multihost disabled")
def test_multihost_step1_loocv_byte_identical(tmp_path):
    """2-process step-1 (sample-sharded level-0 LOOCV + GSPMD level-1):
    host-0 .loco files byte-identical to the single-process mesh run."""
    args = ["--step", "1", "--bed", f"{EX}/example",
            "--exclude", f"{EX}/snplist_rm.txt",
            "--covarFile", f"{EX}/covariates.txt",
            "--phenoFile", f"{EX}/phenotype.txt",
            "--bsize", "100", "--loocv"]
    one = str(tmp_path / "one")
    mh = str(tmp_path / "mh")
    _run_single(args, one)
    out = _run_multihost(args, mh)
    assert "distributed: process 0 of 2" in out
    # per-host sample-window decode: each process unpacks only its own
    # byte columns (the sample-axis analog of step 2's per-host rows)
    assert "per-host decode" in out
    for ph in (1, 2):
        a = open(f"{one}_{ph}.loco", "rb").read()
        b = open(f"{mh}_{ph}.loco", "rb").read()
        assert a == b, ph
    # only host 0 wrote outputs
    assert not os.path.exists(f"{mh}_pred.list.1")


@pytest.mark.skipif(os.environ.get("REGENIE_TPU_SKIP_MULTIHOST") == "1",
                    reason="multihost disabled")
def test_multihost_step2_bt_firth_byte_identical(tmp_path):
    """2-process BT step-2 with approx Firth over the fused path: the
    multi-host branch gathers the per-variant products and rebuilds
    correction rows from the process-local raw copy."""
    fit = str(tmp_path / "fitb")
    _run_single([
        "--step", "1", "--bed", f"{EX}/example",
        "--exclude", f"{EX}/snplist_rm.txt",
        "--covarFile", f"{EX}/covariates.txt",
        "--phenoFile", f"{EX}/phenotype_bin.txt", "--bt",
        "--bsize", "100"], fit, n_devices=1)
    common = ["--step", "2", "--bed", f"{EX}/example",
              "--covarFile", f"{EX}/covariates.txt",
              "--phenoFile", f"{EX}/phenotype_bin.txt", "--bt",
              "--firth", "--approx", "--pThresh", "0.1",
              "--bsize", "170", "--pred", fit + "_pred.list"]
    one = str(tmp_path / "one")
    mh = str(tmp_path / "mh")
    _run_single(common, one)
    out = _run_multihost(common, mh)
    assert "distributed: process 0 of 2" in out
    for ph in ("Y1", "Y2"):
        a = open(f"{one}_{ph}.regenie", "rb").read()
        b = open(f"{mh}_{ph}.regenie", "rb").read()
        assert a == b, ph


@pytest.mark.skipif(os.environ.get("REGENIE_TPU_SKIP_MULTIHOST") == "1",
                    reason="multihost disabled")
def test_multihost_genebased_sets_sharded_byte_identical(tmp_path):
    """VERDICT r1 #6: gene-based testing sharded over SETS across
    processes — each process reads+tests only its sets locally; the
    ordered merge reassembles host-0 output byte-identical to the
    single-process run (burden + SKAT/ACAT + joint tests)."""
    common = ["--step", "2", "--bed", f"{EX}/example_3chr",
              "--covarFile", f"{EX}/covariates.txt",
              "--phenoFile", f"{EX}/phenotype.txt",
              "--bsize", "200", "--ignore-pred",
              "--set-list", f"{EX}/example_3chr.setlist",
              "--anno-file", f"{EX}/example_3chr.annotations",
              "--mask-def", f"{EX}/example_3chr.masks",
              "--aaf-bins", "0.2", "--vc-tests", "skato,acatv",
              "--joint", "acat"]
    one = str(tmp_path / "one")
    mh = str(tmp_path / "mh")
    _run_single(common, one, n_devices=1)
    out = _run_multihost(common, mh)
    assert "sets sharded round-robin" in out
    for ph in ("Y1", "Y2"):
        a = open(f"{one}_{ph}.regenie", "rb").read()
        b = open(f"{mh}_{ph}.regenie", "rb").read()
        assert a == b, ph


@pytest.mark.skipif(os.environ.get("REGENIE_TPU_SKIP_MULTIHOST") == "1",
                    reason="multihost disabled")
def test_multihost_mt_and_multiphen_byte_identical(tmp_path):
    """Host-bound per-SNP modes sharded across processes: --mt (14
    joint tests) and --multiphen (POM fits) 2-process runs byte-
    identical to single-process."""
    for mode, flag in (("mt", "--mt"), ("mph", "--multiphen")):
        common = ["--step", "2", "--bed", f"{EX}/example",
                  "--covarFile", f"{EX}/covariates.txt",
                  "--phenoFile", f"{EX}/phenotype.txt",
                  "--bsize", "250", "--ignore-pred", "--strict",
                  "--no-split", flag]
        one = str(tmp_path / f"one_{mode}")
        mh = str(tmp_path / f"mh_{mode}")
        _run_single(common, one, n_devices=1)
        out = _run_multihost(common, mh)
        assert "SNPs sharded" in out, out
        a = open(f"{one}.regenie", "rb").read()
        b = open(f"{mh}.regenie", "rb").read()
        assert a == b, mode


@pytest.mark.skipif(os.environ.get("REGENIE_TPU_SKIP_MULTIHOST") == "1",
                    reason="multihost disabled")
def test_multihost_interaction_byte_identical(tmp_path):
    """Interaction refits sharded across processes (contiguous SNP
    chunks, rows merged in process order): QT GxE and BT GxE 2-process
    runs byte-identical to single-process."""
    for tag, extra in (
        ("qt", ["--phenoFile", f"{EX}/phenotype.txt"]),
        ("bt", ["--phenoFile", f"{EX}/phenotype_bin.txt", "--bt"]),
    ):
        common = ["--step", "2", "--bed", f"{EX}/example",
                  "--covarFile", f"{EX}/covariates.txt",
                  "--bsize", "250", "--ignore-pred",
                  "--interaction", "V1"] + extra
        one = str(tmp_path / f"one_{tag}")
        mh = str(tmp_path / f"mh_{tag}")
        _run_single(common, one, n_devices=1)
        _run_multihost(common, mh)
        for ph in ("Y1", "Y2"):
            a = open(f"{one}_{ph}.regenie", "rb").read()
            b = open(f"{mh}_{ph}.regenie", "rb").read()
            assert a == b, (tag, ph)


@pytest.mark.skipif(os.environ.get("REGENIE_TPU_SKIP_MULTIHOST") == "1",
                    reason="multihost disabled")
def test_multihost_three_processes_uneven(tmp_path):
    """Uneven process counts: 3 processes x 1 device (blocks and sets
    not divisible by 3) — gene-based ordered merge and the step-2 QT
    fused path stay byte-identical."""
    # gene-based (3 sets round-robin over 3 procs)
    common = ["--step", "2", "--bed", f"{EX}/example_3chr",
              "--covarFile", f"{EX}/covariates.txt",
              "--phenoFile", f"{EX}/phenotype.txt",
              "--bsize", "200", "--ignore-pred",
              "--set-list", f"{EX}/example_3chr.setlist",
              "--anno-file", f"{EX}/example_3chr.annotations",
              "--mask-def", f"{EX}/example_3chr.masks",
              "--aaf-bins", "0.2", "--joint", "acat"]
    one = str(tmp_path / "one")
    mh = str(tmp_path / "mh")
    _run_single(common, one, n_devices=1)
    _run_multihost(common, mh, nproc=3, local_devices=1)
    for ph in ("Y1", "Y2"):
        a = open(f"{one}_{ph}.regenie", "rb").read()
        b = open(f"{mh}_{ph}.regenie", "rb").read()
        assert a == b, ph
    # step-2 QT fused (bsize 170 not divisible by 3 devices)
    common2 = ["--step", "2", "--bed", f"{EX}/example",
               "--covarFile", f"{EX}/covariates.txt",
               "--phenoFile", f"{EX}/phenotype.txt",
               "--bsize", "170", "--ignore-pred"]
    one2 = str(tmp_path / "one2")
    mh2 = str(tmp_path / "mh2")
    _run_single(common2, one2, n_devices=3)
    _run_multihost(common2, mh2, nproc=3, local_devices=1)
    for ph in ("Y1", "Y2"):
        a = open(f"{one2}_{ph}.regenie", "rb").read()
        b = open(f"{mh2}_{ph}.regenie", "rb").read()
        assert a == b, ph


@pytest.mark.skipif(os.environ.get("REGENIE_TPU_SKIP_MULTIHOST") == "1",
                    reason="multihost disabled")
def test_multihost_mesh2d_qt_slab_byte_identical(tmp_path):
    """Multi-host 2-D fused mesh (variant x sample tiling across
    processes): 2 processes x 1 device -> a (1, 2) grid where each
    process owns a byte-COLUMN window (per-host 2-D slab decode), byte-
    identical to the single-process 2-device 2-D mesh run."""
    fit = str(tmp_path / "fit")
    _run_single([
        "--step", "1", "--bed", f"{EX}/example",
        "--exclude", f"{EX}/snplist_rm.txt",
        "--covarFile", f"{EX}/covariates.txt",
        "--phenoFile", f"{EX}/phenotype.txt",
        "--bsize", "100"], fit, n_devices=1)
    common = ["--step", "2", "--bed", f"{EX}/example",
              "--covarFile", f"{EX}/covariates.txt",
              "--phenoFile", f"{EX}/phenotype.txt",
              "--bsize", "170", "--pred", fit + "_pred.list"]
    m2d = {"REGENIE_TPU_MESH_2D": "1"}
    one = str(tmp_path / "one")
    mh = str(tmp_path / "mh")
    out1 = _run_single(common, one, n_devices=2, env_extra=m2d)
    assert "2-D mesh for the fused scorer: 1 x 2" in out1
    out2 = _run_multihost(common, mh, nproc=2, local_devices=1,
                          env_extra=m2d)
    assert "2-D mesh for the fused scorer: 1 x 2" in out2
    assert "2 processes x rectangular slabs" in out2
    assert "per-host 2-D slab decode" in out2
    for ph in ("Y1", "Y2"):
        a = open(f"{one}_{ph}.regenie", "rb").read()
        b = open(f"{mh}_{ph}.regenie", "rb").read()
        assert a == b, ph


@pytest.mark.skipif(os.environ.get("REGENIE_TPU_SKIP_MULTIHOST") == "1",
                    reason="multihost disabled")
def test_multihost_mesh2d_bt_firth_byte_identical(tmp_path):
    """Multi-host 2-D mesh on the BT-Firth fused path: 2 processes x 2
    devices -> a (2, 2) grid (each process one variant row; full-decode
    upload assembles per-process slices), byte-identical to the
    single-process 4-device 2-D run."""
    fit = str(tmp_path / "fit")
    _run_single([
        "--step", "1", "--bed", f"{EX}/example",
        "--exclude", f"{EX}/snplist_rm.txt",
        "--covarFile", f"{EX}/covariates.txt",
        "--phenoFile", f"{EX}/phenotype_bin.txt", "--bt",
        "--bsize", "100"], fit, n_devices=1)
    common = ["--step", "2", "--bed", f"{EX}/example",
              "--covarFile", f"{EX}/covariates.txt",
              "--phenoFile", f"{EX}/phenotype_bin.txt", "--bt",
              "--firth", "--approx", "--pThresh", "0.1",
              "--bsize", "170", "--pred", fit + "_pred.list"]
    m2d = {"REGENIE_TPU_MESH_2D": "1"}
    one = str(tmp_path / "one")
    mh = str(tmp_path / "mh")
    out1 = _run_single(common, one, n_devices=4, env_extra=m2d)
    assert "2-D mesh for the fused scorer: 2 x 2" in out1
    out2 = _run_multihost(common, mh, nproc=2, local_devices=2,
                          env_extra=m2d)
    assert "2 processes x rectangular slabs" in out2
    for ph in ("Y1", "Y2"):
        a = open(f"{one}_{ph}.regenie", "rb").read()
        b = open(f"{mh}_{ph}.regenie", "rb").read()
        assert a == b, ph
