"""Unit oracles for the Step-1 ridge kernels vs direct numpy solves.

The reference has no unit tests (SURVEY.md §4); we add the per-kernel
numeric layer it lacks, checking the batched TPU formulations against
naive per-fold numpy ridge regression.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from regenie_tpu.models import step1 as m1


def _naive_level0_kfold(G, Y, mask, sizes, lambdas, Neff):
    """Direct per-fold ridge: beta = (G_out G_out' + lam I)^-1 G_out Y_out."""
    B, N = G.shape
    P = Y.shape[1]
    J = len(lambdas)
    bounds = np.concatenate([[0], np.cumsum(sizes)])
    K = len(sizes)
    pred = np.zeros((N, J, P))
    for k in range(K):
        sl = slice(bounds[k], bounds[k + 1])
        out = np.ones(N, dtype=bool)
        out[sl] = False
        Go, Yo = G[:, out], Y[out]
        GGt, GtY = Go @ Go.T, Go @ Yo
        for j, lam in enumerate(lambdas):
            beta = np.linalg.solve(GGt + lam * np.eye(B), GtY)  # [B,P]
            pred[sl, j, :] = (beta.T @ G[:, sl]).T * mask[sl]
    # center/scale using whole sample
    p_sum = pred.sum(axis=0)
    p_sum2 = (pred**2).sum(axis=0)
    mean = p_sum / Neff
    invsd = np.sqrt((Neff - 1) / (p_sum2 - Neff * mean**2))
    return (pred - mean[None]) * invsd[None]


def test_level0_kfold_matches_naive():
    rng = np.random.default_rng(0)
    B, N, P, K = 8, 50, 3, 5
    G = rng.normal(size=(B, N))
    Y = rng.normal(size=(N, P))
    mask = np.ones((N, P))
    mask[:4, 0] = 0  # one trait has some masked samples
    Neff = mask.sum(axis=0)
    sizes = np.array([10, 10, 10, 10, 10])
    lambdas = np.array([0.5, 3.0, 10.0])

    W_naive = _naive_level0_kfold(G, Y, mask, sizes, lambdas, Neff)

    Gf, valid = m1.pad_folds(G, sizes, axis=1)
    Yf, _ = m1.pad_folds(Y, sizes)
    mf, _ = m1.pad_folds(mask, sizes)
    W = np.asarray(
        m1.level0_kfold_block(
            jnp.asarray(Gf), jnp.asarray(Yf), jnp.asarray(mf),
            jnp.asarray(valid.astype(float)), jnp.asarray(lambdas), jnp.asarray(Neff),
        )
    )
    # unpad: [K,nmax,J,P] -> [N,J,P]
    W_flat = np.concatenate([W[k, : sizes[k]] for k in range(K)], axis=0)
    np.testing.assert_allclose(W_flat, W_naive, rtol=1e-8, atol=1e-10)


def test_level0_kfold_unequal_folds():
    rng = np.random.default_rng(1)
    B, N, P = 5, 47, 2
    G = rng.normal(size=(B, N))
    Y = rng.normal(size=(N, P))
    mask = np.ones((N, P))
    Neff = mask.sum(axis=0)
    sizes = np.array([9, 9, 9, 9, 11])
    lambdas = np.array([1.0, 25.0])

    W_naive = _naive_level0_kfold(G, Y, mask, sizes, lambdas, Neff)
    Gf, valid = m1.pad_folds(G, sizes, axis=1)
    Yf, _ = m1.pad_folds(Y, sizes)
    mf, _ = m1.pad_folds(mask, sizes)
    W = np.asarray(
        m1.level0_kfold_block(
            jnp.asarray(Gf), jnp.asarray(Yf), jnp.asarray(mf),
            jnp.asarray(valid.astype(float)), jnp.asarray(lambdas), jnp.asarray(Neff),
        )
    )
    W_flat = np.concatenate([W[k, : sizes[k]] for k in range(len(sizes))], axis=0)
    np.testing.assert_allclose(W_flat, W_naive, rtol=1e-8, atol=1e-10)


def test_level0_loocv_matches_naive():
    rng = np.random.default_rng(2)
    B, N, P = 6, 40, 2
    G = rng.normal(size=(B, N))
    Y = rng.normal(size=(N, P))
    mask = np.ones((N, P))
    Neff = mask.sum(axis=0)
    lambdas = np.array([2.0, 7.0])

    # naive LOO: for each left-out sample n, fit on the rest
    J = len(lambdas)
    pred = np.zeros((N, J, P))
    for n in range(N):
        keep = np.ones(N, dtype=bool)
        keep[n] = False
        Go, Yo = G[:, keep], Y[keep]
        GGt, GtY = Go @ Go.T, Go @ Yo
        for j, lam in enumerate(lambdas):
            beta = np.linalg.solve(GGt + lam * np.eye(B), GtY)
            pred[n, j] = beta.T @ G[:, n]
    mean = pred.sum(axis=0) / Neff
    cent = (pred - mean[None]) * mask[:, None, :]
    sd = np.sqrt((cent**2).sum(axis=0) / (Neff - 1))
    W_naive = cent / sd[None]

    W = np.asarray(
        m1.level0_loocv_block(
            jnp.asarray(G), jnp.asarray(Y), jnp.asarray(mask),
            jnp.asarray(lambdas), jnp.asarray(Neff),
        )
    )
    np.testing.assert_allclose(W, W_naive, rtol=1e-7, atol=1e-9)


def test_level1_kfold_matches_naive():
    rng = np.random.default_rng(3)
    N, F, T = 60, 10, 3
    W = rng.normal(size=(N, F))
    Y = rng.normal(size=N)
    sizes = np.array([12] * 5)
    taus = np.array([1.0, 10.0, 100.0])
    bounds = np.concatenate([[0], np.cumsum(sizes)])

    beta_naive = np.zeros((5, T, F))
    metrics = np.zeros((5, T))
    for k in range(5):
        sl = slice(bounds[k], bounds[k + 1])
        out = np.ones(N, dtype=bool)
        out[sl] = False
        Wo, Yo = W[out], Y[out]
        for t, tau in enumerate(taus):
            beta_naive[k, t] = np.linalg.solve(Wo.T @ Wo + tau * np.eye(F), Wo.T @ Yo)
            p = W[sl] @ beta_naive[k, t]
            metrics[k, t] = ((p - Y[sl]) ** 2).sum()

    Wf, valid = m1.pad_folds(W, sizes)
    Yf, _ = m1.pad_folds(Y, sizes)
    beta, cumsum = m1.level1_linear_kfold(
        jnp.asarray(Wf), jnp.asarray(Yf), jnp.asarray(valid.astype(float)), jnp.asarray(taus)
    )
    np.testing.assert_allclose(np.asarray(beta), beta_naive, rtol=1e-8, atol=1e-10)
    cs = np.asarray(cumsum)
    sse = cs[2] + cs[3] - 2 * cs[4]
    np.testing.assert_allclose(sse, metrics.sum(axis=0), rtol=1e-8)


def test_level1_loocv_matches_naive():
    rng = np.random.default_rng(4)
    N, F = 30, 6
    W = rng.normal(size=(N, F))
    Y = rng.normal(size=N)
    taus = np.array([5.0, 50.0])

    pred_naive = np.zeros((N, 2))
    for n in range(N):
        keep = np.ones(N, dtype=bool)
        keep[n] = False
        for t, tau in enumerate(taus):
            b = np.linalg.solve(W[keep].T @ W[keep] + tau * np.eye(F), W[keep].T @ Y[keep])
            pred_naive[n, t] = W[n] @ b

    cumsum = np.asarray(
        m1.level1_linear_loocv(jnp.asarray(W), jnp.asarray(Y), jnp.asarray(taus), float(N))
    )
    np.testing.assert_allclose(cumsum[0], pred_naive.sum(axis=0), rtol=1e-8)
    np.testing.assert_allclose(cumsum[2], (pred_naive**2).sum(axis=0), rtol=1e-8)
    np.testing.assert_allclose(cumsum[4], (pred_naive * Y[:, None]).sum(axis=0), rtol=1e-8)


def test_level1_full_fit_loocv_betas():
    rng = np.random.default_rng(5)
    N, F = 25, 5
    W = rng.normal(size=(N, F))
    Y = rng.normal(size=N)
    tau = 3.0
    b0, _ = m1.level1_linear_full_fit_loocv(jnp.asarray(W), jnp.asarray(Y), tau)
    b0 = np.asarray(b0)
    # b0[:, n] should equal ridge fit without sample n
    for n in [0, 7, 24]:
        keep = np.ones(N, dtype=bool)
        keep[n] = False
        b_exp = np.linalg.solve(W[keep].T @ W[keep] + tau * np.eye(F), W[keep].T @ Y[keep])
        np.testing.assert_allclose(b0[:, n], b_exp, rtol=1e-8, atol=1e-10)


def test_fold_sizes_reference_semantics():
    # 10 samples, 2 not in analysis, 4 folds of target size 2 analyzed each
    ind = np.array([1, 1, 0, 1, 1, 1, 1, 0, 1, 1], dtype=bool)
    sizes = m1.compute_fold_sizes(ind, 4)
    assert sizes.sum() == 10
    # walk: fold closes when 2 analyzed seen
    assert list(sizes) == [2, 3, 2, 3]


def test_l0_prescreen_picks_causal_snp(tmp_path):
    """--test-l0 iterative conditional selection finds the strong SNP
    and conditions it out (apply_iter_cond, Step1_Models.cpp:2133)."""
    import numpy as np
    from types import SimpleNamespace
    from regenie_tpu.models.step1 import test_l0_block

    rng = np.random.default_rng(4)
    N, B = 400, 30
    G = rng.normal(size=(B, N))
    G -= G.mean(axis=1, keepdims=True)
    G /= np.linalg.norm(G, axis=1, keepdims=True) / np.sqrt(N - 1)
    y = 0.6 * G[7] + rng.normal(size=N)
    y = (y - y.mean()) / (np.linalg.norm(y - y.mean()) / np.sqrt(N - 1))
    params = SimpleNamespace(l0_snp_pval_thr=1e-6, n_analyzed=N,
                             ncov_analyzed=1)
    picked, n_picked, pgs = test_l0_block(
        params, G, y[:, None], np.zeros(1, dtype=int), print
    )
    assert picked[7, 0]
    assert n_picked[0] >= 1
    # the PGS must be dominated by the causal SNP's contribution
    assert abs(np.corrcoef(pgs[:, 0], G[7])[0, 1]) > 0.5
    # null block: nothing picked
    y0 = rng.normal(size=N)
    y0 = (y0 - y0.mean()) / (np.linalg.norm(y0 - y0.mean()) / np.sqrt(N - 1))
    p0, n0, pgs0 = test_l0_block(params, G, y0[:, None], np.zeros(1, dtype=int), print)
    assert not pgs0.any()
    assert n0[0] == 0


def test_check_l0_selection_rm_pct():
    """--rm-l0-pct drops all J columns of the least significant blocks
    (check_l0, Step1_Models.cpp:2014-2023)."""
    from types import SimpleNamespace

    from regenie_tpu.models.step1 import check_l0_selection

    params = SimpleNamespace(n_ridge_l0=5, rm_l0_pct=20.0)
    pv = np.array([0.2, 0.5, 3.1, 0.9, 0.1, 8.5, 0.4, 1.2, 0.05, 0.6])
    keep, mult = check_l0_selection(params, pv, print)
    # the 2 least significant blocks (pv 0.05, 0.1) lose their columns
    assert keep.sum() == 8 * 5
    for b in (4, 8):
        assert not keep[b * 5 : (b + 1) * 5].any()
    assert (mult == 1).all()


def test_check_l0_selection_adaptive():
    """Adaptive --select-l0 keeps only the min-shrinkage column,
    unpenalized, for outlier blocks (check_l0, Step1_Models.cpp:2035-2060)."""
    from types import SimpleNamespace

    from regenie_tpu.models.step1 import check_l0_selection

    params = SimpleNamespace(n_ridge_l0=5, rm_l0_pct=0.0)
    rng = np.random.default_rng(0)
    pv = -np.log10(rng.uniform(size=30))
    pv[12] = 9.0  # one strongly associated block
    keep, mult = check_l0_selection(params, pv, print)
    sel = slice(12 * 5, 13 * 5)
    assert not keep[sel][:-1].any() and keep[sel][-1]
    assert mult[12 * 5 + 4] == 0.0
    other = np.ones(len(keep), dtype=bool)
    other[sel] = False
    assert keep[other].all() and (mult[other] == 1).all()
