"""Device Firth / SPA correction solvers vs the host-f64 parity twins.

The host solvers (models/firth.py, models/spa.py) are the byte-exact
re-implementations of the reference's per-SNP loops (fit_firth
Step2_Models.cpp:1649, run_SPA_test_snp :2072).  The device kernels
(models/corrections_device.py) must match them:
  * exactly-to-fp-roundoff when run in f64 (CPU backend), and
  * within a documented drift bound in f32 (the TPU production dtype).
"""

import numpy as np
import pytest

from regenie_tpu.models import firth as firth_mod
from regenie_tpu.models import spa as spa_mod
from regenie_tpu.models import corrections_device as cdev
from regenie_tpu.models.glm import get_pvec


def _make_bt_problem(seed=0, N=4000, S=13, prev=0.12):
    rng = np.random.default_rng(seed)
    X = np.column_stack([np.ones(N), rng.normal(size=(N, 3))])
    beta_true = np.array([np.log(prev / (1 - prev)), 0.3, -0.2, 0.1])
    eta = X @ beta_true
    y = (rng.random(N) < get_pvec(eta)).astype(np.float64)
    mask = rng.random(N) > 0.03
    # genotype rows across the MAF spectrum (incl. very rare)
    mafs = np.concatenate([
        np.full(S // 3, 0.001), np.full(S // 3, 0.01),
        np.full(S - 2 * (S // 3), 0.2)])
    G = rng.binomial(2, mafs[:, None], size=(S, N)).astype(np.float64)
    # spike a few carriers into cases so some effects are real
    for s in range(0, S, 3):
        carriers = np.flatnonzero(G[s] > 0)
        y[carriers[: len(carriers) // 2]] = 1.0
    # residualize against X (as the production path does)
    Xq, _ = np.linalg.qr(X * mask[:, None])
    Gm = G * mask[None, :]
    Gres = Gm - (Gm @ Xq) @ Xq.T
    offset = np.where(mask, eta, 0.0)
    return y, Gres, offset, mask


def test_firth_device_matches_host_f64():
    y, Gres, offset, mask = _make_bt_problem()
    b_h, se_h, lrt_h, conv_h = firth_mod.firth_snp_batch(
        y, Gres, offset, mask, maxstep=5, niter=250, tol=2.5e-4)
    b_d, se_d, lrt_d, conv_d = cdev.firth_snp_batch_dev(
        y, Gres, offset, mask, maxstep=5, niter=250, tol=2.5e-4)
    assert conv_h.any()
    np.testing.assert_array_equal(conv_h, conv_d)
    ok = conv_h
    np.testing.assert_allclose(b_d[ok], b_h[ok], rtol=1e-6, atol=1e-9)
    np.testing.assert_allclose(se_d[ok], se_h[ok], rtol=1e-6)
    np.testing.assert_allclose(lrt_d[ok], lrt_h[ok], rtol=1e-6, atol=1e-8)


def test_firth_device_f32_bounded_drift():
    y, Gres, offset, mask = _make_bt_problem(seed=1, N=20000, S=11)
    b_h, se_h, lrt_h, conv_h = firth_mod.firth_snp_batch(
        y, Gres, offset, mask, maxstep=5, niter=250, tol=2.5e-4)
    import jax.numpy as jnp

    b_d, se_d, lrt_d, conv_d = cdev.firth_snp_batch_dev(
        y, Gres, offset, mask, maxstep=5, niter=250, tol=2.5e-4,
        dtype=jnp.float32)
    ok = conv_h & conv_d
    assert ok.sum() >= conv_h.sum() - 1  # f32 may drop at most a straggler
    # drift bound: LRT to ~1e-3 relative, beta to 1e-3 relative
    np.testing.assert_allclose(lrt_d[ok], lrt_h[ok], rtol=2e-3, atol=2e-3)
    np.testing.assert_allclose(b_d[ok], b_h[ok], rtol=2e-3, atol=2e-4)


def _make_spa_problem(seed=3, N=6000, S=12, prev=0.05):
    rng = np.random.default_rng(seed)
    X = np.column_stack([np.ones(N), rng.normal(size=(N, 2))])
    eta = X @ np.array([np.log(prev / (1 - prev)), 0.2, -0.1])
    y = (rng.random(N) < get_pvec(eta)).astype(np.float64)
    mask = rng.random(N) > 0.02
    phat = get_pvec(eta)
    w = np.where(mask, phat * (1 - phat), 1.0)
    gamma_sqrt = np.sqrt(w)
    mafs = np.concatenate([np.full(S // 2, 0.002),
                           np.full(S - S // 2, 0.05)])
    G = rng.binomial(2, mafs[:, None], size=(S, N)).astype(np.float64)
    for s in range(0, S, 2):  # enrich carriers in cases -> big stats
        carriers = np.flatnonzero(G[s] > 0)
        y[carriers[: max(2, len(carriers) // 3)]] = 1.0
    GW = G * (gamma_sqrt * mask)[None, :]
    Xq, _ = np.linalg.qr(X * (gamma_sqrt * mask)[:, None])
    Gres = GW - (GW @ Xq) @ Xq.T
    res = np.where(mask, (y - phat) / gamma_sqrt, 0.0)
    num = Gres @ res
    denum = (Gres**2).sum(axis=1)
    stats = num / np.sqrt(denum)
    return stats, denum, Gres, phat, gamma_sqrt, mask


def test_spa_device_matches_host_f64():
    stats, denum, Gres, phat, gamma_sqrt, mask = _make_spa_problem()
    ch_h, lp_h, fail_h = spa_mod.spa_batch(
        stats, denum, Gres, phat, gamma_sqrt, mask)
    ch_d, lp_d, fail_d = cdev.spa_batch_dev(
        stats, denum, Gres, phat, gamma_sqrt, mask)
    assert (~fail_h).any()
    np.testing.assert_array_equal(fail_h, fail_d)
    ok = ~fail_h
    np.testing.assert_allclose(lp_d[ok], lp_h[ok], rtol=1e-5, atol=1e-7)
    np.testing.assert_allclose(ch_d[ok], ch_h[ok], rtol=1e-5, atol=1e-7)


def test_spa_device_f32_bounded_drift():
    stats, denum, Gres, phat, gamma_sqrt, mask = _make_spa_problem(
        seed=5, N=20000)
    ch_h, lp_h, fail_h = spa_mod.spa_batch(
        stats, denum, Gres, phat, gamma_sqrt, mask)
    import jax.numpy as jnp

    ch_d, lp_d, fail_d = cdev.spa_batch_dev(
        stats, denum, Gres, phat, gamma_sqrt, mask, dtype=jnp.float32)
    ok = ~fail_h & ~fail_d
    assert ok.sum() >= (~fail_h).sum() - 1
    np.testing.assert_allclose(lp_d[ok], lp_h[ok], rtol=5e-3, atol=5e-3)


def test_firth_device_cli_gate(monkeypatch):
    """REGENIE_TPU_DEVICE_CORR forces the gate on/off regardless of
    backend."""
    monkeypatch.setenv("REGENIE_TPU_DEVICE_CORR", "0")
    assert not cdev.enabled()
    monkeypatch.setenv("REGENIE_TPU_DEVICE_CORR", "1")
    assert cdev.enabled()


@pytest.mark.parametrize("corr_args", [
    ["--firth", "--approx", "--pThresh", "0.05"],
    ["--spa", "--pThresh", "0.05"],
], ids=["firth", "spa"])
def test_cli_device_corr_matches_host(tmp_path, corr_args):
    """The full step-2 BT CLI with REGENIE_TPU_DEVICE_CORR=1 (f64 device
    twin on the CPU backend) matches the host-solver run."""
    import os
    import subprocess
    import sys

    EX = "/root/reference/example"
    outs = {}
    for tag, env_val in (("host", "0"), ("dev", "1")):
        out = str(tmp_path / f"o_{tag}")
        env = dict(os.environ)
        env["REGENIE_TPU_PLATFORM"] = "cpu"
        env["REGENIE_TPU_DEVICE_CORR"] = env_val
        r = subprocess.run(
            [sys.executable, "-m", "regenie_tpu", "--step", "2",
             "--bed", f"{EX}/example",
             "--covarFile", f"{EX}/covariates.txt",
             "--phenoFile", f"{EX}/phenotype_bin.txt",
             "--bsize", "200", "--bt", *corr_args,
             "--ignore-pred", "--out", out],
            capture_output=True, text=True, cwd="/root/repo", env=env,
            timeout=900)
        assert r.returncode == 0, r.stdout + r.stderr
        outs[tag] = {}
        for ph in ("Y1", "Y2"):
            with open(f"{out}_{ph}.regenie") as fh:
                outs[tag][ph] = fh.read()
    for ph in ("Y1", "Y2"):
        h, d = outs["host"][ph], outs["dev"][ph]
        if h == d:
            continue
        # f64 twin may differ in the last printed digit; compare fields
        hl, dl = h.splitlines(), d.splitlines()
        assert len(hl) == len(dl)
        n_diff = 0
        for a, b in zip(hl[1:], dl[1:]):
            ta, tb = a.split(), b.split()
            assert ta[:6] == tb[:6]
            for va, vb in zip(ta[6:], tb[6:]):
                if va == vb or va == "NA" or vb == "NA":
                    continue
                assert abs(float(va) - float(vb)) <= 2e-4 * max(
                    1.0, abs(float(va))), (a, b)
                n_diff += 1
        assert n_diff < len(hl)  # mostly identical
