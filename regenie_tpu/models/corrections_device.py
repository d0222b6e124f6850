"""TPU-resident Firth / SPA correction solvers.

Device twins of the host-f64 batched solvers in `firth.py` / `spa.py`
(which remain the parity reference, byte-exact vs the C++ per-SNP loops
fit_firth Step2_Models.cpp:1649 and run_SPA_test_snp :2072).  The hot
per-SNP correction stage is the last host-bound piece of the BT path:
these kernels keep the [S, N] residualized-genotype rows ON DEVICE and
run the Newton / Newton-bisection iterations as masked fixed-structure
`lax.while_loop`s, so the corrected fraction rides HBM bandwidth instead
of host numpy.

Numerical design (why f32 is safe here):
  * The penalized deviance is never formed absolutely.  The solver
    tracks drel(b) = dev(b) - dev(0), whose per-sample terms are
      2*[log1p(pi0_i * expm1(g_i b)) - y_i g_i b]
    (softplus(eta0+d)-softplus(eta0) == log1p(sigmoid(eta0)*expm1(d))),
    each O(|g_i b|), so rounding error scales with the LRT itself, not
    with the O(N) absolute deviance.  LRT = -drel(b_final).
  * Convergence tolerances get a noise floor 32*eps*sum|terms| so the
    modified-score check cannot chase below the f32 summation noise of
    a 400K-sample reduction (on the CPU-x64 backend the floor is ~1e-9
    and the host semantics are recovered exactly).
  * SPA tail probabilities are computed in LOG space via log_ndtr —
    p-values far below the f32 denormal range (the whole point of SPA)
    stay representable as -log10 p.

Batch rows are padded to size buckets (powers of two) so block-varying
correction-set sizes reuse compiled executables.
"""

from __future__ import annotations

import os
from functools import partial

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax


def enabled() -> bool:
    """Device corrections on by default off-CPU; REGENIE_TPU_DEVICE_CORR
    forces (1) or disables (0)."""
    env = os.environ.get("REGENIE_TPU_DEVICE_CORR")
    if env is not None:
        return env != "0"
    try:
        return jax.default_backend() != "cpu"
    except Exception:  # noqa: BLE001 — backend probe only
        return False


def _bucket(s: int, floor: int = 8) -> int:
    b = floor
    while b < s:
        b *= 2
    return b


def _dt():
    from ..utils.dtypes import compute_dtype

    return compute_dtype()


def _as_dev(x, dt):
    """To-device cast that does NOT round-trip arrays already on
    device (per-block hot path: [N] null-model vectors are uploaded
    once by the caller and reused)."""
    if isinstance(x, jax.Array):
        return x.astype(dt)
    return jnp.asarray(np.asarray(x), dt)


# ---------------------------------------------------------------------
# Firth single-parameter LRT (device twin of firth.firth_snp_batch)
# ---------------------------------------------------------------------


def _drel_at(b, Gm, y, pi0, logpi0c, r1):
    """drel(b) = 2nll(b) - 2nll(0) per SNP, computed in delta space.

    Gm rows are mask-zeroed, so masked samples contribute exactly 0.
    The d > 20 branch switches to d + log(pi0) + log1p((1-pi0)e^-d/pi0)
    to dodge expm1 overflow (f32 overflows at d ~ 88)."""
    d = Gm * b[:, None]
    big = d > 20.0
    t_small = jnp.log1p(pi0[None, :] * jnp.expm1(jnp.minimum(d, 21.0)))
    t_big = d + logpi0c[None, :] + jnp.log1p(r1[None, :] * jnp.exp(-jnp.maximum(d, 0.0)))
    t = jnp.where(big, t_big, t_small)
    return 2.0 * ((t - y[None, :] * d)).sum(axis=1)


@partial(jax.jit, static_argnames=("maxstep", "niter", "nls"))
def _firth_kernel(Gm, y, offset, tol, maxstep, niter, nls):
    """Batched masked single-param Firth Newton with step-halving.

    Gm: [S, N] mask-zeroed genotype rows on the X scale; y: [N] 0/1
    (mask-zeroed); offset: [N].  Returns (beta, xtwx_final, lrt, conv)."""
    dt = Gm.dtype
    eps = jnp.asarray(jnp.finfo(dt).eps, dt)
    eta0 = jnp.clip(offset, -30.0, 30.0)
    pi0 = jax.nn.sigmoid(eta0)
    pi0c = jnp.maximum(pi0, jnp.asarray(1e-38, dt))
    logpi0c = jnp.log(pi0c)
    r1 = (1.0 - pi0) / pi0c
    G2 = Gm * Gm
    w0 = pi0 * (1.0 - pi0)
    xtwx0 = G2 @ w0
    S = Gm.shape[0]

    def eval_score(beta):
        eta = jnp.clip(offset[None, :] + Gm * beta[:, None], -30.0, 30.0)
        pi = jax.nn.sigmoid(eta)
        w = pi * (1.0 - pi)
        xtwx = (G2 * w).sum(axis=1)
        safe = jnp.maximum(xtwx, jnp.asarray(1e-30, dt))
        h = G2 * w / safe[:, None]
        sterm = Gm * (y[None, :] - pi) + Gm * h * (0.5 - pi)
        ms = sterm.sum(axis=1)
        sumabs = jnp.abs(sterm).sum(axis=1)
        return ms, sumabs, xtwx

    def cond(state):
        _beta, _drel, active, _conv, it, _xtwx = state
        return (it < niter) & active.any()

    def body(state):
        beta, drel_old, active, conv, it, _xtwx_prev = state
        it = it + 1
        ms, sumabs, xtwx = eval_score(beta)
        tol_eff = jnp.maximum(tol, 32.0 * eps * sumabs)
        done = (jnp.abs(ms) < tol_eff) & (it >= 2) & active
        conv = conv | done
        active = active & ~done

        step = ms / jnp.maximum(xtwx, jnp.asarray(1e-30, dt))
        mx = jnp.abs(step) / maxstep
        step = jnp.where(mx > 1.0, step / jnp.where(mx > 1.0, mx, 1.0), step)

        def ls_body(l, carry):
            beta_try, drel_try, improved = carry
            cand = jnp.where(active & ~improved,
                             beta + step / (2.0**l), beta_try)
            drel_c = _drel_at(cand, Gm, y, pi0, logpi0c, r1) - (
                jnp.log(jnp.maximum((G2 * _w_at(cand)).sum(axis=1),
                                    jnp.asarray(1e-30, dt)))
                - jnp.log(jnp.maximum(xtwx0, jnp.asarray(1e-30, dt))))
            better = active & ~improved & (drel_c < drel_old)
            beta_try = jnp.where(better, cand, beta_try)
            drel_try = jnp.where(better, drel_c, drel_try)
            return beta_try, drel_try, improved | better

        def _w_at(b):
            eta = jnp.clip(offset[None, :] + Gm * b[:, None], -30.0, 30.0)
            pi = jax.nn.sigmoid(eta)
            return pi * (1.0 - pi)

        beta_try, drel_try, improved = lax.fori_loop(
            0, nls, ls_body, (beta, drel_old, ~active))

        fail_ls = active & ~improved

        def with_nudge(_):
            cand = beta + step / (2.0 ** (nls - 1)) + 1e-6
            drel_c = _drel_at(cand, Gm, y, pi0, logpi0c, r1) - (
                jnp.log(jnp.maximum((G2 * _w_at(cand)).sum(axis=1),
                                    jnp.asarray(1e-30, dt)))
                - jnp.log(jnp.maximum(xtwx0, jnp.asarray(1e-30, dt))))
            return (jnp.where(fail_ls, cand, beta_try),
                    jnp.where(fail_ls, drel_c, drel_try))

        beta_new, drel_new = lax.cond(
            fail_ls.any(), with_nudge, lambda _: (beta_try, drel_try),
            operand=None)

        beta = jnp.where(active, beta_new, beta)
        drel_old = jnp.where(active, drel_new, drel_old)
        return beta, drel_old, active, conv, it, xtwx

    active0 = xtwx0 > 0
    state0 = (jnp.zeros(S, dt), jnp.zeros(S, dt), active0,
              jnp.zeros(S, bool), jnp.asarray(0, jnp.int32), xtwx0)
    beta, drel, _active, conv, _it, _x = lax.while_loop(cond, body, state0)

    # xtwx at the FINAL beta (the numpy twin's line-search-cached value)
    eta = jnp.clip(offset[None, :] + Gm * beta[:, None], -30.0, 30.0)
    pi = jax.nn.sigmoid(eta)
    xtwx_f = (G2 * (pi * (1.0 - pi))).sum(axis=1)
    lrt = -drel
    conv = conv & (lrt >= 0)
    return beta, xtwx_f, lrt, conv


def firth_snp_batch_dev(y, Gv, offset, mask, maxstep=5, niter=250,
                        tol=2.5e-4, niter_line_search=5, dtype=None):
    """Device twin of firth.firth_snp_batch: same signature/return
    (beta [S], se [S], lrt [S], converged [S] as numpy arrays).

    Gv may be a device array (kept on device) or numpy."""
    dt = dtype or _dt()
    S = int(Gv.shape[0])
    Sp = _bucket(S)
    maskf = _as_dev(mask, dt)
    Gm = _as_dev(Gv, dt) * maskf[None, :]
    if Sp != S:
        Gm = jnp.concatenate(
            [Gm, jnp.zeros((Sp - S, Gm.shape[1]), dt)], axis=0)
    ym = _as_dev(y, dt) * maskf
    off_j = _as_dev(offset, dt)
    beta, xtwx, lrt, conv = _firth_kernel(
        Gm, ym, off_j, jnp.asarray(tol, dt), float(maxstep), int(niter),
        int(niter_line_search))
    # ONE device->host transfer (4 fetches = 4 WAN RTTs on a tunneled
    # backend; the per-block correction path is latency-bound otherwise)
    packed = np.asarray(
        jnp.stack([beta, xtwx, lrt, conv.astype(dt)]), np.float64)
    beta, xtwx, lrt = packed[0, :S], packed[1, :S], packed[2, :S]
    conv = packed[3, :S] != 0.0
    se = np.sqrt(1.0 / np.maximum(xtwx, 1e-300))
    return beta, se, lrt, conv


# ---------------------------------------------------------------------
# SPA (device twin of spa.spa_batch)
# ---------------------------------------------------------------------

# The CGF terms are computed in STABLE LOG FORM (logaddexp) instead of
# the host twin's clamped-exp form, so the f32 path handles the extreme
# exponents SPA exists for.  The host's overflow-failure semantics
# (MAX_EXP_LIM = 708 in _K2) are replicated with the same threshold in
# every dtype so fail flags match the f64 twin exactly.
_OVER_LIM = 708.0


def _K_dev(t, Gmod, lphat, l1mphat, val_a, val_c):
    # log(1 - phat + phat e^arg) = logaddexp(log1p(-phat), log(phat)+arg)
    arg = t[:, None] / val_c[:, None] * Gmod
    val = jnp.logaddexp(l1mphat[None, :], lphat[None, :] + arg).sum(axis=1)
    return val - t * val_a / val_c


def _K1_dev(t, Gmod, lphat, l1mphat, val_a, val_c):
    # term = Gmod/val_c * exp(log(phat) - log(phat + (1-phat) e^arg))
    arg = -t[:, None] / val_c[:, None] * Gmod
    L = jnp.logaddexp(lphat[None, :], l1mphat[None, :] + arg)
    term = (Gmod / val_c[:, None]) * jnp.exp(lphat[None, :] - L)
    return term.sum(axis=1) - val_a / val_c, jnp.abs(term).sum(axis=1)


def _K2_dev(t, Gmod, lphat, l1mphat, gamma2, val_c):
    # summand = Gmod^2 gamma^2 / c^2 * exp(arg - 2 log(phat + (1-phat)e^arg))
    arg = -t[:, None] / val_c[:, None] * Gmod
    over = ((arg > _OVER_LIM) & (Gmod != 0)).any(axis=1)
    L = jnp.logaddexp(lphat[None, :], l1mphat[None, :] + arg)
    val = (Gmod**2 * gamma2[None, :] / val_c[:, None] ** 2
           * jnp.exp(arg - 2.0 * L)).sum(axis=1)
    return jnp.where(over, 0.0, val)


@partial(jax.jit, static_argnames=("niter_max",))
def _spa_kernel(Gmod, stats, denum, phat, gamma2, tol, niter_max):
    """Vectorized SPA correction.  Gmod: [S, N] mask-zeroed Gres /
    gamma_sqrt rows; returns (neglog10p [S], fail [S])."""
    dt = Gmod.dtype
    eps = jnp.asarray(jnp.finfo(dt).eps, dt)
    big = jnp.asarray(jnp.finfo(dt).max, dt)
    val_c = jnp.sqrt(denum)
    val_a = (Gmod * phat[None, :]).sum(axis=1)
    score_num = stats * val_c
    limK1_low = jnp.where(Gmod < 0, Gmod, 0.0).sum(axis=1) - val_a
    limK1_high = jnp.where(Gmod > 0, Gmod, 0.0).sum(axis=1) - val_a
    fail = (score_num < limK1_low) | (score_num > limK1_high)
    tval = -jnp.abs(stats)
    S = Gmod.shape[0]
    lphat = jnp.log(phat)
    l1mphat = jnp.log1p(-phat)

    def solve(lam):
        min_x = jnp.where(tval >= 0, 0.0, -big)
        max_x = jnp.where(tval >= 0, big, 0.0)
        t_old = jnp.zeros(S, dt)
        f_old, _sa = _K1_dev(lam * t_old, Gmod, lphat, l1mphat, val_a, val_c)
        f_old = lam * f_old - tval
        active = jnp.ones(S, bool)
        ok = jnp.zeros(S, bool)
        t_new = jnp.full(S, -1.0, dt)

        def cond(st):
            return st[0].any() & (st[6] < niter_max)

        def body(st):
            active, ok, t_old, f_old, min_x, max_x, it, t_new = st
            it = it + 1
            hess = _K2_dev(lam * t_old, Gmod, lphat, l1mphat, gamma2, val_c)
            bad = active & (hess == 0)
            active = active & ~bad
            cand = t_old - f_old / jnp.where(hess == 0, 1.0, hess)
            cand = jnp.where(active, cand, t_old)
            f_new, sa = _K1_dev(lam * cand, Gmod, lphat, l1mphat, val_a, val_c)
            f_new = lam * f_new - tval
            tol_eff = jnp.maximum(tol, 32.0 * eps * sa)

            done = active & (jnp.abs(f_new) < tol_eff)
            t_new = jnp.where(active, cand, t_new)
            ok = ok | done
            active2 = active & ~done

            in_b = (cand != 0) & (cand > min_x) & (cand < max_x)
            max_x = jnp.where(active2 & in_b & (f_new > 0), cand, max_x)
            min_x = jnp.where(active2 & in_b & (f_new <= 0), cand, min_x)

            bis = active2 & ~in_b

            def with_bis(_):
                cand_b = (min_x + max_x) / 2
                f_b, _sb = _K1_dev(lam * cand_b, Gmod, lphat, l1mphat, val_a, val_c)
                f_b = lam * f_b - tval
                return (jnp.where(bis, cand_b, cand),
                        jnp.where(bis, f_b, f_new),
                        jnp.where(bis & (f_b <= 0), cand_b, min_x),
                        jnp.where(bis & (f_b > 0), cand_b, max_x))

            cand, f_new, min_x, max_x = lax.cond(
                bis.any(), with_bis,
                lambda _: (cand, f_new, min_x, max_x), operand=None)

            t_old = jnp.where(active2, cand, t_old)
            f_old = jnp.where(active2, f_new, f_old)
            return active2, ok, t_old, f_old, min_x, max_x, it, t_new

        st = (active, ok, t_old, f_old, min_x, max_x,
              jnp.asarray(0, jnp.int32), t_new)
        st = lax.while_loop(cond, body, st)
        return st[7], st[1]

    def log_tail(root, lam):
        """log of the one-sided tail probability at the root (log-space
        twin of get_SPA_pvalue_snp)."""
        kval = _K_dev(lam * root, Gmod, lphat, l1mphat, val_a, val_c)
        k2val = _K2_dev(lam * root, Gmod, lphat, l1mphat, gamma2, val_c)
        okt = k2val != 0
        wval = jnp.sign(root) * jnp.sqrt(
            jnp.maximum(2.0 * (root * tval - kval), 0.0))
        vval = root * jnp.sqrt(k2val)
        wsafe = jnp.where(wval == 0, 1.0, wval)
        rval = wval + jnp.log(jnp.abs(vval / wsafe)) / wsafe
        logpv = jax.scipy.special.log_ndtr(rval)
        logpv = jnp.where(vval == 0, jnp.log(0.5), logpv)
        return logpv, okt

    # lam=+1 and lam=-1 tails; roots of lam*K1(lam*t) = tval
    r1, ok1 = solve(jnp.asarray(1.0, dt))
    r2, ok2 = solve(jnp.asarray(-1.0, dt))
    fail = fail | ~ok1 | ~ok2
    lp1, okt1 = log_tail(r1, jnp.asarray(1.0, dt))
    lp2, okt2 = log_tail(r2, jnp.asarray(-1.0, dt))
    fail = fail | ~okt1 | ~okt2
    log_pv = jnp.logaddexp(lp1, lp2)
    fail = fail | (log_pv > 0)
    log_pv = jnp.minimum(log_pv, 0.0)
    neglog10p = jnp.minimum(-log_pv / jnp.log(jnp.asarray(10.0, dt)),
                            jnp.asarray(323.306, dt))
    return neglog10p, fail


def spa_batch_dev(stats, denum, Gres, phat, gamma_sqrt, mask,
                  tol=5e-5, niter_max=1000, dtype=None):
    """Device twin of spa.spa_batch: same signature/return
    (chisq [S], neglog10p [S], test_fail [S] as numpy).  Gres may stay
    on device; the [S]-scalar chisq inversion runs on host."""
    from ..utils.stats import neglog10_to_chisq

    dt = dtype or _dt()
    S = int(Gres.shape[0])
    Sp = _bucket(S)
    maskf = _as_dev(mask, dt)
    gs = _as_dev(gamma_sqrt, dt)
    Gmod = _as_dev(Gres, dt) / gs[None, :] * maskf[None, :]
    stats_j = _as_dev(stats, dt)
    denum_j = _as_dev(denum, dt)
    if Sp != S:
        pad = Sp - S
        Gmod = jnp.concatenate([Gmod, jnp.zeros((pad, Gmod.shape[1]), dt)])
        stats_j = jnp.concatenate([stats_j, jnp.zeros(pad, dt)])
        denum_j = jnp.concatenate([denum_j, jnp.ones(pad, dt)])
    phat_j = _as_dev(phat, dt) * maskf
    gamma2 = gs * gs
    logp, fail = _spa_kernel(Gmod, stats_j, denum_j, phat_j, gamma2,
                             jnp.asarray(tol, dt), int(niter_max))
    packed = np.asarray(jnp.stack([logp, fail.astype(dt)]), np.float64)
    logp = packed[0, :S]
    fail = packed[1, :S] != 0.0
    chisq = neglog10_to_chisq(logp)
    return chisq, logp, fail
