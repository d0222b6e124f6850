"""Pseudo-data Firth IRLS (the reference's default per-SNP algorithm,
fit_firth_pseudo Step2_Models.cpp:1386/:1527) — batched twin +
pseudo->NR fallback chain (run_firth_correction_snp :1215-1223)."""

import numpy as np
import pytest

from regenie_tpu.models.firth import (
    firth_snp_batch,
    firth_snp_batch_auto,
    firth_snp_batch_pseudo,
)


def _data(seed=3, N=3000, S=30):
    rng = np.random.default_rng(seed)
    y = (rng.random(N) < 0.15).astype(float)
    mask = rng.random(N) < 0.97
    offset = np.log(0.15 / 0.85) + rng.normal(0, 0.3, N)
    G = rng.choice([0.0, 1.0, 2.0], size=(S, N), p=[0.9, 0.09, 0.01])
    # near-separation rows: all carriers are cases
    for i in range(3):
        G[i] = 0.0
        G[i, np.flatnonzero(y == 1)[:6]] = 1.0
    return y, G, offset, mask


def test_pseudo_matches_newton_fixed_point():
    """Both algorithms solve modified-score = 0: converged rows must
    agree to solver tolerance."""
    y, G, offset, mask = _data()
    b1, s1, l1, ok1 = firth_snp_batch(y, G, offset, mask,
                                      maxstep=5, niter=250, tol=2.5e-4)
    b2, s2, l2, ok2 = firth_snp_batch_pseudo(y, G, offset, mask,
                                             maxstep=5, niter=250,
                                             tol=2.5e-4)
    both = ok1 & ok2
    assert both.sum() >= G.shape[0] - 5
    assert np.abs(b1 - b2)[both].max() < 1e-4
    assert np.abs(l1 - l2)[both].max() < 1e-6
    assert np.abs(s1 - s2)[both].max() < 1e-4


def test_pseudo_env_chain_covers_all_rows(monkeypatch):
    """REGENIE_TPU_FIRTH_PSEUDO=1: pseudo-failed rows (near-separation)
    fall back to the exact-Newton batch — the chain must converge
    wherever plain Newton does."""
    monkeypatch.setenv("REGENIE_TPU_FIRTH_PSEUDO", "1")
    y, G, offset, mask = _data()
    b, s, l, ok = firth_snp_batch_auto(y, G, offset, mask,
                                       maxstep=5, niter=250, tol=2.5e-4)
    bn, sn, ln, okn = firth_snp_batch(y, G, offset, mask,
                                      maxstep=5, niter=250, tol=2.5e-4)
    assert ok.sum() >= okn.sum()
    both = ok & okn
    assert np.abs(l - ln)[both].max() < 1e-6


def test_pseudo_failure_flags_are_per_row():
    """A monomorphic row fails cleanly without poisoning the batch."""
    y, G, offset, mask = _data(S=8)
    G[5] = 0.0  # xtwx0 == 0
    b, s, l, ok = firth_snp_batch_pseudo(y, G, offset, mask,
                                         maxstep=5, niter=250,
                                         tol=2.5e-4)
    assert not ok[5]
    assert ok[6] and ok[7]


def test_pseudo_matches_scipy_penalized_likelihood_oracle():
    """Independent oracle: the Firth estimate maximizes the penalized
    log-likelihood l(b) + 0.5*log I(b) (I = sum w g^2 for the single
    free coefficient). Maximize it with scipy and compare."""
    from scipy.optimize import minimize_scalar

    y, G, offset, mask = _data(S=10)
    b, s, l, ok = firth_snp_batch_pseudo(y, G, offset, mask,
                                         maxstep=5, niter=250,
                                         tol=2.5e-4)
    maskf = mask.astype(float)
    checked = 0
    for i in range(G.shape[0]):
        if not ok[i]:
            continue

        def negpen(beta, g=G[i] * maskf):
            eta = offset + g * beta
            pi = 1.0 / (1.0 + np.exp(-eta))
            pi = np.clip(pi, 1e-12, 1 - 1e-12)
            ll = (maskf * (y * np.log(pi) + (1 - y) * np.log1p(-pi))).sum()
            info = (g**2 * pi * (1 - pi) * maskf).sum()
            return -(ll + 0.5 * np.log(info))

        r = minimize_scalar(negpen, bounds=(b[i] - 2.0, b[i] + 2.0),
                            method="bounded",
                            options={"xatol": 1e-10})
        assert abs(r.x - b[i]) < 5e-4, (i, r.x, b[i])
        checked += 1
    assert checked >= 7
