"""Multi-host scaling benchmark (BASELINE.json north star: near-linear
scaling at 1 host / >=2 hosts).

Builds a synthetic exome (sets x rare variants x samples), runs the
gene-based SKAT+burden pipeline as 1 process and as N cooperating
jax.distributed processes (Gloo CPU collectives — the same runtime that
drives TPU pods), verifies byte-identical output, and reports the
wall-clock speedup of the host-bound per-set work.

    python scripts/bench_scaling.py [n_procs=2] [n_sets=120]
"""

import os
import socket
import subprocess
import sys
import tempfile
import time

import numpy as np

REPO = "/root/repo"
PY = sys.executable


def build_exome(d, n_sets, m_per_set, n_samples, rng):
    M = n_sets * m_per_set
    nb = (n_samples + 3) // 4
    # rare variants: expected MAF ~0.5-2%
    g = (rng.random((M, n_samples)) < 0.01).astype(np.uint8) + (
        rng.random((M, n_samples)) < 0.005
    ).astype(np.uint8)
    codes = np.array([3, 2, 0], np.uint8)[g]  # BED 2-bit coding
    pad = (-n_samples) % 4
    if pad:
        codes = np.concatenate(
            [codes, np.zeros((M, pad), np.uint8)], axis=1)
    codes = codes.reshape(M, nb, 4)
    packed = (codes[:, :, 0] | (codes[:, :, 1] << 2)
              | (codes[:, :, 2] << 4) | (codes[:, :, 3] << 6))
    with open(f"{d}/g.bed", "wb") as fh:
        fh.write(b"\x6c\x1b\x01" + packed.astype(np.uint8).tobytes())
    with open(f"{d}/g.bim", "w") as fh:
        for i in range(M):
            fh.write(f"1\tv{i}\t0\t{i + 1}\tA\tC\n")
    ids = [f"F{i} I{i}" for i in range(n_samples)]
    with open(f"{d}/g.fam", "w") as fh:
        for s in ids:
            fh.write(f"{s} 0 0 1 -9\n")
    ph = rng.normal(size=n_samples)
    with open(f"{d}/ph.txt", "w") as fh:
        fh.write("FID IID Y1\n")
        for i, s in enumerate(ids):
            fh.write(f"{s} {ph[i]:.5f}\n")
    with open(f"{d}/sets.txt", "w") as fh:
        for s in range(n_sets):
            vids = ",".join(f"v{s * m_per_set + j}" for j in range(m_per_set))
            fh.write(f"GENE{s} 1 {s * m_per_set + 1} {vids}\n")
    with open(f"{d}/anno.txt", "w") as fh:
        for s in range(n_sets):
            for j in range(m_per_set):
                cat = "pLof" if j % 3 == 0 else "missense"
                fh.write(f"v{s * m_per_set + j}\tGENE{s}\t{cat}\n")
    with open(f"{d}/masks.txt", "w") as fh:
        fh.write("M1\tpLof\nM2\tpLof,missense\n")


def args_for(d, out):
    return ["--step", "2", "--bed", f"{d}/g", "--phenoFile", f"{d}/ph.txt",
            "--ignore-pred", "--bsize", "400",
            "--set-list", f"{d}/sets.txt", "--anno-file", f"{d}/anno.txt",
            "--mask-def", f"{d}/masks.txt", "--aaf-bins", "0.05",
            "--vc-tests", "skato,acatv", "--out", out]


THREADS = {"OMP_NUM_THREADS": "2", "OPENBLAS_NUM_THREADS": "2",
           "XLA_FLAGS": "--xla_cpu_multi_thread_eigen=false "
                        "intra_op_parallelism_threads=2"}
# pin per-process threads so the measurement reflects the SET SHARDING,
# not core contention on this small box (on a real deployment each host
# has its own cores/chips)


def _loop_time(stdout):
    for line in stdout.splitlines():
        if "* done (" in line:
            return float(line.split("(")[1].split("s")[0])
    return None


def run_single(d, out):
    env = dict(os.environ)
    env.update({"REGENIE_TPU_PLATFORM": "cpu", "PYTHONPATH": REPO})
    env.update(THREADS)
    t0 = time.perf_counter()
    r = subprocess.run([PY, "-m", "regenie_tpu"] + args_for(d, out),
                       capture_output=True, text=True, env=env, timeout=3600)
    dt = time.perf_counter() - t0
    assert r.returncode == 0, (r.stdout + r.stderr)[-2000:]
    return dt, _loop_time(r.stdout)


def run_multi(d, out, nproc):
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    procs = []
    t0 = time.perf_counter()
    for pid in range(nproc):
        env = dict(os.environ)
        env.update({
            "REGENIE_TPU_PLATFORM": "cpu", "PYTHONPATH": REPO,
            "JAX_PLATFORMS": "cpu",
            "REGENIE_TPU_COORDINATOR": f"127.0.0.1:{port}",
            "REGENIE_TPU_NUM_PROCESSES": str(nproc),
            "REGENIE_TPU_PROCESS_ID": str(pid),
        })
        env.update(THREADS)
        procs.append(subprocess.Popen(
            [PY, "-m", "regenie_tpu"] + args_for(d, out),
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            env=env))
    out0 = None
    for pid, p in enumerate(procs):
        o, _ = p.communicate(timeout=3600)
        if pid == 0:
            out0 = o
        assert p.returncode == 0
    return time.perf_counter() - t0, _loop_time(out0)


def main():
    nproc = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    n_sets = int(sys.argv[2]) if len(sys.argv) > 2 else 120
    d = tempfile.mkdtemp(prefix="bench_scale_")
    rng = np.random.default_rng(11)
    build_exome(d, n_sets, 40, 20_000, rng)
    t1, l1 = run_single(d, f"{d}/one")
    tn, ln = run_multi(d, f"{d}/multi", nproc)
    a = open(f"{d}/one_Y1.regenie", "rb").read()
    b = open(f"{d}/multi_Y1.regenie", "rb").read()
    ident = a == b
    print(f"sets={n_sets} wall: single={t1:.1f}s {nproc}proc={tn:.1f}s "
          f"({t1 / tn:.2f}x) | set-loop: single={l1:.1f}s "
          f"{nproc}proc={ln:.1f}s ({l1 / ln:.2f}x) "
          f"byte_identical={ident}")
    sys.exit(0 if ident else 1)


if __name__ == "__main__":
    main()
