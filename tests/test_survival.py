"""Cox model oracles: CoxMLE vs direct Breslow partial-likelihood
optimization, and score-test internals."""

import numpy as np
import pytest
from scipy.optimize import minimize

from regenie_tpu.models.survival import CoxFirth, CoxMLE, CoxRidge, SurvivalData


def breslow_negloglik(beta, X, time, status):
    eta = X @ beta
    order = np.argsort(time, kind="stable")
    t_s, s_s, e_s = time[order], status[order], eta[order]
    ll = 0.0
    uniq = np.unique(t_s[s_s == 1])
    exp_eta = np.exp(e_s)
    for t in uniq:
        at_risk = t_s >= t
        events = (t_s == t) & (s_s == 1)
        d = events.sum()
        ll += e_s[events].sum() - d * np.log(exp_eta[at_risk].sum())
    return -ll


@pytest.fixture(scope="module")
def surv_sim():
    rng = np.random.default_rng(11)
    N, K = 300, 3
    X = rng.normal(size=(N, K))
    beta_true = np.array([0.5, -0.3, 0.2])
    T = rng.exponential(1 / np.exp(X @ beta_true))
    C = rng.exponential(1.2, size=N)
    time = np.round(np.minimum(T, C), 2)  # rounding creates ties
    status = (T <= C).astype(float)
    return X, time, status


def test_cox_mle_matches_direct_optimum(surv_sim):
    X, time, status = surv_sim
    N = len(time)
    mask = np.ones(N, dtype=bool)
    sd = SurvivalData()
    sd.setup(time, status, mask)
    mle = CoxMLE(tol=1e-10)
    mle.fit(sd, X, np.zeros(N), mask)
    assert mle.converge

    res = minimize(breslow_negloglik, np.zeros(3), args=(X, time, status), method="BFGS")
    np.testing.assert_allclose(mle.beta, res.x, atol=2e-4)


def test_cox_loglik_matches_direct(surv_sim):
    X, time, status = surv_sim
    N = len(time)
    mask = np.ones(N, dtype=bool)
    sd = SurvivalData()
    sd.setup(time, status, mask)
    from regenie_tpu.models.survival import _loglik

    beta = np.array([0.1, 0.2, -0.1])
    eta = X @ beta
    eta_order = sd.to_order(eta)
    ll, _ = _loglik(sd, eta_order)
    assert np.isclose(-ll, breslow_negloglik(beta, X, time, status), rtol=1e-10)


def test_cox_score_test_null_calibration(surv_sim):
    """Score stats for random (null) genotypes should be ~N(0,1)."""
    X, time, status = surv_sim
    N = len(time)
    mask = np.ones(N, dtype=bool)
    sd = SurvivalData()
    sd.setup(time, status, mask)
    mle = CoxMLE()
    mle.fit(sd, X, np.zeros(N), mask)
    mle.test_prep(sd, X, np.zeros(N), mask)

    rng = np.random.default_rng(0)
    stats = []
    for _ in range(200):
        g = rng.binomial(2, 0.3, size=N).astype(float)
        gres = g - mle.X1_X1WX1inv @ (mle.WX1.T @ g)
        T = (gres * mle.residual).sum()
        denum = mle.res_var * (gres**2).sum()
        stats.append(T / np.sqrt(denum))
    stats = np.array(stats)
    # mean ~0, var ~1 within Monte-Carlo error
    assert abs(stats.mean()) < 0.2
    assert 0.6 < stats.var() < 1.5


def test_cox_firth_single_param_shrinks(surv_sim):
    """Firth fit on a separated genotype stays finite."""
    X, time, status = surv_sim
    N = len(time)
    mask = np.ones(N, dtype=bool)
    sd = SurvivalData()
    sd.setup(time, status, mask)
    # pathological: carrier only among earliest events
    g = np.zeros(N)
    ev_first = np.argsort(np.where(status == 1, time, np.inf))[:5]
    g[ev_first] = 1.0
    cf = CoxFirth(sd, g[:, None], np.zeros(N), 1, 250, 5, 2.5e-4, 2.5e-4, 1e-8, 5.0, True)
    cf.fit_1(g)
    assert cf.converge
    assert np.isfinite(cf.beta1) and abs(cf.beta1) < 20
    lrt = 2 * (cf.loglike[-1] - cf.loglike[0])
    assert lrt >= 0
