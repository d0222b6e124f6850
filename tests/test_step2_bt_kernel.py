"""Unit oracle for the trait-vectorized fused BT score kernel
(step2_bt._score_bt_all_device) vs the naive residualize-then-score
math of compute_score_bt (Step2_Models.cpp:470-520), including ragged
per-trait covariate-basis widths (Kmax padding) and skipped traits."""

import numpy as np
import pytest


class _FakePD:
    pass


class _FakeST:
    pass


def _mk_state(N, P, Ks, seed=0, fail=()):
    rng = np.random.default_rng(seed)
    pd = _FakePD()
    st = _FakeST()
    pd.pheno_pass = [ph not in fail for ph in range(P)]
    st.res = rng.normal(size=(N, P))
    st.gamma_sqrt_mask = np.abs(rng.normal(size=(N, P))) + 0.1
    # random per-trait missingness zeroes both weight and residual
    for ph in range(P):
        miss = rng.random(N) < 0.1
        st.gamma_sqrt_mask[miss, ph] = 0.0
        st.res[miss, ph] = 0.0
    st.X_gamma = [
        None if ph in fail else np.linalg.qr(rng.normal(size=(N, Ks[ph])))[0]
        for ph in range(P)
    ]
    return pd, st


def _naive(G, st, ph):
    gsm = st.gamma_sqrt_mask[:, ph]
    XW = st.X_gamma[ph]
    GW = G * gsm[None, :]
    Gres = GW - (GW @ XW) @ XW.T
    num = Gres @ st.res[:, ph]
    denum = (Gres**2).sum(axis=1)
    return num, denum, Gres


@pytest.mark.parametrize("fail", [(), (1,)])
def test_fused_bt_kernel_matches_naive(fail):
    from regenie_tpu.models import step2_bt as m

    N, B, P = 48, 7, 3
    Ks = [3, 2, 4]  # ragged: padding to Kmax must not perturb any trait
    pd, st = _mk_state(N, P, Ks, fail=fail)
    rng = np.random.default_rng(1)
    G = rng.integers(0, 3, size=(B, N)).astype(float)

    import jax.numpy as jnp

    fc = m._FusedConsts(pd, st)
    assert fc.cols == [ph for ph in range(P) if ph not in fail]
    num_all, denum_all, S1 = m._score_bt_all_device(jnp.asarray(G), fc)
    num_all = np.asarray(num_all)
    denum_all = np.asarray(denum_all)

    for ph in fc.cols:
        j = fc.j_of[ph]
        num0, denum0, Gres0 = _naive(G, st, ph)
        np.testing.assert_allclose(num_all[:, j], num0, rtol=1e-8, atol=1e-9)
        np.testing.assert_allclose(denum_all[:, j], denum0, rtol=1e-8, atol=1e-9)
        # correction-row rebuild from the cached first matmul
        idx = np.array([0, B - 1])
        XW = st.X_gamma[ph]
        A_rows = S1[jnp.asarray(idx), j, : XW.shape[1]]
        Gres_rows = np.asarray(
            m._gres_rows_device(
                jnp.asarray(G[idx]), st.gamma_sqrt_mask[:, ph], XW, A_rows
            )
        )
        np.testing.assert_allclose(Gres_rows, Gres0[idx], rtol=1e-8, atol=1e-9)
