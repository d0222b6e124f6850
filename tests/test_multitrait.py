"""Multi-trait tests (--mt): block-vectorized statistics vs naive
per-SNP oracles, plus an end-to-end CLI smoke run."""

import os
import subprocess
import sys

import numpy as np
import pytest
from scipy.stats import chi2

from regenie_tpu.models.multitrait import (
    N_MT_TESTS, mt_header, run_mt_block, setup_mt,
)

EX = "/root/reference/example"


@pytest.fixture(scope="module")
def data():
    rng = np.random.default_rng(7)
    N, q, B = 200, 3, 8
    res = rng.normal(size=(N, q))
    res[:, 1] += 0.5 * res[:, 0]
    res /= np.linalg.norm(res, axis=0) / np.sqrt(N - 1)
    mask = np.ones((N, q), dtype=bool)
    G = rng.normal(size=(B, N))
    G[0] += 0.4 * res[:, 0]  # one causal SNP
    # residualize-free scaling (intercept-free synthetic setup)
    G = G - G.mean(axis=1, keepdims=True)
    G = G / (np.linalg.norm(G, axis=1, keepdims=True) / np.sqrt(N - 1))
    st = setup_mt(res, mask)
    r = run_mt_block(st, G, None)
    return st, G, res, r


def test_manova_matches_naive_wilks(data):
    """Determinant-lemma MANOVA equals the naive logdet(E1)-logdet(E0)
    (assoc_manova, MultiTrait_Tests.cpp:316-329)."""
    st, G, res, r = data
    q = res.shape[1]
    N0 = st.neff0
    YtY = st.Y0.T @ st.Y0
    _s, ld0 = np.linalg.slogdet(YtY)
    for i in range(G.shape[0]):
        g = G[i]
        G2 = g @ g
        b = (st.Y0.T @ g) / G2
        E = YtY - np.outer(b, b) * G2
        _s, ld1 = np.linalg.slogdet(E)
        stat = (q / 2.0 - N0 + 1.0) * (ld1 - ld0)
        lp = -np.log10(max(chi2.sf(stat, q), 5e-324))
        assert abs(r["logp"][i, 0] - lp) < 1e-6, i


def test_omnibus_matches_naive(data):
    """z' Syy^-1 z with per-trait OLS z-scores."""
    st, G, res, r = data
    N0 = st.neff0
    for i in range(G.shape[0]):
        g = G[i]
        G2 = g @ g
        z = np.empty(res.shape[1])
        for j in range(res.shape[1]):
            b = (st.Y0[:, j] @ g) / G2
            s2 = ((st.Y0[:, j] - b * g) ** 2).sum() / (N0 - 1.0)
            z[j] = b * np.sqrt(G2 / s2)
        stat = z @ st.Syy_inv @ z
        lp = -np.log10(max(chi2.sf(stat, res.shape[1]), 5e-324))
        assert abs(r["logp"][i, 1] - lp) < 1e-6, i
        np.testing.assert_allclose(r["z_uni"][i], z, rtol=1e-10)


def test_bayes_matches_naive_logdet(data):
    """Rank-one determinant identity equals the naive per-SNP slogdet of
    Q1 = Q1_common - scalar (assoc_bayes, MultiTrait_Tests.cpp:836-843)."""
    st, G, res, r = data
    q = res.shape[1]
    N0 = st.neff0
    YtY = st.Y0.T @ st.Y0
    Q1c = st.prior_Q0 * np.eye(q) + YtY
    for i in range(G.shape[0]):
        g = G[i]
        G2 = g @ g
        Vb1 = 1.0 / (G2 + 1.0 / st.prior_Vbeta0)
        Mb1 = (st.Y0.T @ g) * Vb1
        Q1 = Q1c - (Mb1 @ Mb1) / Vb1  # scalar from every entry
        _s, ld = np.linalg.slogdet(Q1)
        LL_M1 = 0.5 * q * np.log(Vb1) - 0.5 * (N0 + st.prior_a0 + q - 1.0) * ld
        log10bf = (LL_M1 - st.LL_M0) / np.log(10.0)
        assert abs(r["logp"][i, 2] - log10bf) < 1e-6, i


def test_cpc_sums_pc_chisq(data):
    st, G, res, r = data
    q = res.shape[1]
    stat = (r["z_pc"] ** 2).sum(axis=1)
    lp = -np.log10(np.maximum(chi2.sf(stat, q), 5e-324))
    np.testing.assert_allclose(r["logp"][:, 7], lp, atol=1e-6)


def test_causal_snp_strongest(data):
    st, G, res, r = data
    assert r["logp"][0, 0] == r["logp"][:, 0].max()  # MANOVA
    assert r["logp"][0, 1] == r["logp"][:, 1].max()  # Omnibus
    assert r["logp"][0, 2] == r["logp"][:, 2].max()  # BF


def test_mt_cli_end_to_end(tmp_path):
    env = dict(os.environ)
    env["REGENIE_TPU_PLATFORM"] = "cpu"
    out = str(tmp_path / "mt")
    rr = subprocess.run(
        [sys.executable, "-m", "regenie_tpu", "--step", "2",
         "--bed", f"{EX}/example", "--covarFile", f"{EX}/covariates.txt",
         "--phenoFile", f"{EX}/phenotype.txt", "--bsize", "500",
         "--ignore-pred", "--mt", "--strict", "--no-split", "--out", out],
        capture_output=True, text=True, cwd="/root/repo", env=env, timeout=900,
    )
    assert rr.returncode == 0, rr.stdout + rr.stderr
    lines = open(out + ".regenie").read().splitlines()
    ncol = len(mt_header(2).split())
    assert lines[0] == mt_header(2).strip()
    assert len(lines) == 1001
    body = np.array([l.split()[8:] for l in lines[1:]], dtype=float)
    assert np.isfinite(body).all()
    assert len(lines[1].split()) == ncol
    # Omnibus0 and CPC0 agree closely (orthogonal rotation of traits)
    hdr = lines[0].split()
    omni = body[:, hdr.index("LOG10P.OMNIBUS0") - 8]
    cpc = body[:, hdr.index("LOG10P.CPC0") - 8]
    assert np.corrcoef(omni, cpc)[0, 1] > 0.99


def test_mt_batched_tails_match_scalar():
    """The batched --mt tail helpers (chi-bar, Kuonen mixture, Fisher)
    are bitwise-identical to their scalar per-SNP originals."""
    import numpy as np

    from regenie_tpu.models.multitrait import (
        _chibar_logp, _chibar_logp_batch, _fisher_robust,
        _fisher_robust_batch, _mix_logp, _mix_logp_batch)

    rng = np.random.default_rng(5)
    wts = rng.random(6)
    wts /= wts.sum()
    stats = rng.exponential(4.0, size=200)
    bb = _chibar_logp_batch(stats, wts)
    ss = np.array([_chibar_logp(float(s), wts) for s in stats])
    np.testing.assert_array_equal(bb, ss)

    lam = np.sort(rng.random(8))[::-1]
    mb = _mix_logp_batch(stats, lam)
    ms = np.array([_mix_logp(float(s), lam) for s in stats])
    np.testing.assert_array_equal(mb, ms)

    lp = rng.exponential(1.0, size=(50, 5))
    fb = _fisher_robust_batch(lp)
    fs = np.array([_fisher_robust(r) for r in lp])
    np.testing.assert_array_equal(fb, fs)

def test_get_acat_rows_bitwise_matches_scalar():
    """get_acat_rows reproduces per-row get_acat bitwise across every
    branch of the robust ladder: no-A, A-only, mixed signs of TB,
    cancellation, all-failed and single-p rows."""
    import numpy as np

    from regenie_tpu.models.skat import get_acat, get_acat_rows

    rng = np.random.default_rng(11)
    rows = []
    # generic mixes
    rows += list(rng.exponential(2.0, size=(40, 6)))
    # deep tails (A entries, lp >= 15) mixed with moderate ones
    rows += list(np.column_stack([
        rng.uniform(15, 300, size=(20, 2)), rng.exponential(1.0, (20, 4))]))
    # TB < 0 candidates: small lp (p > 0.5 -> negative tan term)
    rows += list(rng.uniform(0.0, 0.25, size=(20, 6)))
    # A-only rows
    rows += list(rng.uniform(16, 80, size=(10, 6)))
    # failed entries (-9) sprinkled; all-failed; single-ok
    mixed = rng.exponential(2.0, size=(20, 6))
    mixed[rng.random((20, 6)) < 0.3] = -9.0
    rows += list(mixed)
    rows += [np.full(6, -9.0)]
    one = np.full(6, -9.0)
    one[3] = 7.25
    rows += [one]
    lp = np.array(rows)
    batched = get_acat_rows(lp)
    scalar = np.array([get_acat(r) for r in lp])
    np.testing.assert_array_equal(batched, scalar)

    # weighted variant
    w = rng.random(6) + 0.1
    w[1] = 0.0
    batched_w = get_acat_rows(lp, w)
    scalar_w = np.array([get_acat(r, w) for r in lp])
    np.testing.assert_array_equal(batched_w, scalar_w)
