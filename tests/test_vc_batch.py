"""Batched gene-based VC engine (ops.vc_batch + the bucketed driver).

The numeric contract: each set's score products are computed in its own
padded slot with a fixed scan chunk, so bucket composition (bucket size,
which sets share a kernel call, single- vs multi-process sharding) must
not change a single output byte.
"""

import os
import subprocess
import sys

import numpy as np
import pytest

EX = "/root/reference/example"


def _run_cli(args, bucket=None):
    env = dict(os.environ)
    env["REGENIE_TPU_PLATFORM"] = "cpu"
    if bucket is not None:
        env["REGENIE_TPU_GENE_BUCKET"] = str(bucket)
    r = subprocess.run(
        [sys.executable, "-m", "regenie_tpu"] + args,
        capture_output=True, text=True, cwd="/root/repo", env=env, timeout=900,
    )
    assert r.returncode == 0, r.stdout + r.stderr
    return r.stdout


GENE_ARGS = [
    "--step", "2", "--bed", f"{EX}/example_3chr",
    "--covarFile", f"{EX}/covariates.txt",
    "--phenoFile", f"{EX}/phenotype.txt",
    "--bsize", "200", "--ignore-pred",
    "--set-list", f"{EX}/example_3chr.setlist",
    "--anno-file", f"{EX}/example_3chr.annotations",
    "--mask-def", f"{EX}/example_3chr.masks",
]


def test_bucket_composition_byte_invariance(tmp_path):
    """Bucket size 1 (pure per-set) vs 32 (both sets in one kernel call)
    must emit byte-identical association output — the contract that lets
    the multi-host round-robin shards match the single-process run."""
    outs = {}
    for bucket in (1, 32):
        out = str(tmp_path / f"b{bucket}")
        _run_cli(GENE_ARGS + [
            "--aaf-bins", "0.2", "--vc-tests", "skato,acatv,skat",
            "--joint", "acat", "--out", out,
        ], bucket=bucket)
        outs[bucket] = {
            ph: open(f"{out}_{ph}.regenie", "rb").read() for ph in ("Y1", "Y2")
        }
    assert outs[1] == outs[32]


def test_bucket_invariance_bt_firth(tmp_path):
    """BT keeps the host GW path inside the bucketed driver — bucketing
    must still leave the output byte-identical."""
    outs = {}
    for bucket in (1, 16):
        out = str(tmp_path / f"bt{bucket}")
        _run_cli([a if a != f"{EX}/phenotype.txt" else f"{EX}/phenotype_bin.txt"
                  for a in GENE_ARGS] + [
            "--phenoCol", "Y1", "--bt", "--firth", "--approx",
            "--aaf-bins", "0.2", "--vc-tests", "skato,acatv",
            "--out", out,
        ], bucket=bucket)
        outs[bucket] = open(f"{out}_Y1.regenie", "rb").read()
    assert outs[1] == outs[16]


def test_lovo_bucket_invariance(tmp_path):
    """LOVO (one set, many leave-one-out masks) rides the same staged
    driver; bucket size must not matter."""
    outs = {}
    for bucket in (1, 8):
        out = str(tmp_path / f"lovo{bucket}")
        _run_cli(GENE_ARGS + [
            "--mask-lovo", "SET1,M1,0.2", "--vc-tests", "skat",
            "--out", out,
        ], bucket=bucket)
        outs[bucket] = open(f"{out}_Y1.regenie", "rb").read()
    assert outs[1] == outs[8]


def test_packed_kernel_matches_dense_products():
    """The on-device decode/impute/weight chain + chunked scan must
    reproduce the host dense f64 products to near machine precision
    (CPU x64 run: same dtype, different reduction order)."""
    from regenie_tpu.io.bed import encode_bed_bytes
    from regenie_tpu.ops import vc_batch

    rng = np.random.default_rng(7)
    N, M, K, P, U = 1000, 13, 3, 2, 2
    G = rng.integers(0, 3, size=(M, N)).astype(np.int8)
    G[rng.random((M, N)) < 0.05] = -3
    ind = rng.random(N) > 0.1
    X = rng.standard_normal((N, K))
    Y = rng.standard_normal((N, P))
    af1 = np.array([
        np.where(G[i][ind & (G[i] >= 0)] >= 0, G[i][ind & (G[i] >= 0)], 0).sum()
        / (2.0 * (ind & (G[i] >= 0)).sum()) for i in range(M)
    ])
    maf = np.minimum(af1, 1 - af1)
    w = rng.random(M) + 0.5
    ur = rng.random((N, U)) * ind[:, None]

    # host dense reference (the exact chain in models.skat.vc_prep)
    Gs = G.astype(np.float64)
    miss = Gs == -3
    Gs = np.where((af1 > 0.5)[:, None], 2.0 - Gs, Gs)
    Gs = np.where(miss, (2.0 * maf)[:, None], Gs)
    Gs *= ind[None, :]
    GW = np.concatenate([(Gs * w[:, None]).T, ur], axis=1)  # [N, M+U]
    gtg_ref = GW.T @ GW
    gtx_ref = GW.T @ X
    gty_ref = GW.T @ Y

    cache = vc_batch.VCDeviceCache(X, ind)
    cache.set_residuals(1, Y, X)
    codes = encode_bed_bytes(G)
    gtg, gtx, gty = vc_batch.bucket_products(
        cache, [codes], [ur], [af1 > 0.5], [2.0 * maf], [w],
    )[0]
    assert np.allclose(gtg, gtg_ref, rtol=1e-10, atol=1e-8)
    assert np.allclose(gtx, gtx_ref, rtol=1e-10, atol=1e-8)
    assert np.allclose(gty, gty_ref, rtol=1e-10, atol=1e-8)


def test_packed_slot_bitwise_batch_invariance():
    """A set's products must be BITWISE identical whether its bucket has
    1 set or 8 — the core composition-invariance claim."""
    from regenie_tpu.io.bed import encode_bed_bytes
    from regenie_tpu.ops import vc_batch

    rng = np.random.default_rng(11)
    N, K, P = 700, 2, 3
    ind = rng.random(N) > 0.05
    X = rng.standard_normal((N, K))
    Y = rng.standard_normal((N, P))
    cache = vc_batch.VCDeviceCache(X, ind)
    cache.set_residuals(2, Y, X)

    sets = []
    for s in range(8):
        m = int(rng.integers(3, 12))
        G = rng.integers(0, 3, size=(m, N)).astype(np.int8)
        G[rng.random((m, N)) < 0.03] = -3
        sets.append((
            encode_bed_bytes(G),
            rng.random((N, int(rng.integers(0, 2)))),
            rng.random(m) > 0.7,
            rng.random(m) * 0.4,
            rng.random(m) + 0.1,
        ))

    # group as the driver does: by (padded main dim, padded ur dim)
    def key(t):
        u = t[1].shape[1]
        return (vc_batch._pad_dim(t[0].shape[0]),
                0 if u == 0 else vc_batch._pad_dim(u, 1))

    groups = {}
    for t in sets:
        groups.setdefault(key(t), []).append(t)
    for _k, grp in groups.items():
        batched = vc_batch.bucket_products(
            cache, *[[t[i] for t in grp] for i in range(5)]
        )
        for t, b in zip(grp, batched):
            single = vc_batch.bucket_products(
                cache, *[[t[i]] for i in range(5)]
            )[0]
            for a, c in zip(single, b):
                assert a.tobytes() == c.tobytes()
