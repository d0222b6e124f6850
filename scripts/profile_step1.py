"""Honest-sync stage attribution for the step-1 level-0 LOOCV chain
(VERDICT r3 #6): where do the ms go at UKB shape?

Stages (models/step1.py level0_loocv_block + feeders):
  decode    decode_bed_packed + prepare_block_step1
  resid     residualize_geno_block (2 matmuls vs cov basis)
  gram      GGt = G G^T                   [B,N]x[N,B]
  gty       GTY = G Y                     [B,N]x[N,P]
  eigh      jnp.linalg.eigh(GGt)          [B,B]
  vtg       V^T G                         [B,B]x[B,N]
  z2t       VtG x (DL_inv*Wmat)           [N,B]x[B,J*P]
  epilogue  gvec matmul + LOOCV epilogue  elementwise [N,J,P]

Measurement model: on the tunneled rig every dispatch AND every fetch
costs one WAN round trip (block_until_ready is a no-op), so a naive
per-stage (dispatch, fetch-scalar) pair measures ~2 RTTs, not the
kernel (first capture: sum-of-stages 765 ms vs 195 ms for the whole
fused chain).  Each stage therefore runs INNER times inside one jitted
lax.scan whose carry perturbs the input by a dynamic zero (c*eps with
c a runtime value the compiler cannot fold), so XLA can neither hoist
the loop-invariant body nor DCE it; one scalar fetch closes the timing.
Per-iteration cost = (t_scan - t_overhead) / INNER.

Usage: python scripts/profile_step1.py [B] [N] [P] [INNER]
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from regenie_tpu.models import step1 as m1
from regenie_tpu.ops.geno_ops import decode_bed_packed, prepare_block_step1

_PREC = jax.lax.Precision.HIGHEST


def _sync(outs):
    leaves = [x for x in jax.tree_util.tree_leaves(outs) if hasattr(x, "dtype")]
    jax.block_until_ready(leaves)
    acc = jnp.zeros((), jnp.float32)
    for x in leaves:
        acc = acc + x.ravel()[:1].astype(jnp.float32).sum()
    return float(acc)


def make_scan_timer(stage_fn, perturb_arg, inner):
    """Jit a scan running stage_fn inner times; the carry scalar (a
    runtime 0.0) perturbs `perturb_arg` each iteration so the body is
    loop-variant.  Returns fn(args, c0) -> scalar."""

    def scanned(args, c0):
        def body(c, _):
            new_args = list(args)
            a = new_args[perturb_arg]
            new_args[perturb_arg] = a + c.astype(a.dtype)
            out = stage_fn(*new_args)
            leaves = jax.tree_util.tree_leaves(out)
            s = jnp.zeros((), jnp.float32)
            for x in leaves:
                s = s + x.ravel()[:1].astype(jnp.float32).sum()
            return s * jnp.float32(1e-30), None

        c, _ = jax.lax.scan(body, c0, None, length=inner)
        return c

    return jax.jit(scanned, static_argnums=())


def timeit_scan(fn, args, inner, rounds=3):
    c0 = jnp.zeros((), jnp.float32)
    _sync(fn(args, c0))  # compile
    best = 1e30
    for _ in range(rounds):
        t0 = time.perf_counter()
        _sync(fn(args, c0))
        best = min(best, time.perf_counter() - t0)
    return best * 1e3 / inner


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 1000
    N = int(sys.argv[2]) if len(sys.argv) > 2 else 400_000
    P = int(sys.argv[3]) if len(sys.argv) > 3 else 50
    inner = int(sys.argv[4]) if len(sys.argv) > 4 else 8
    K, J = 20, 5
    rng = np.random.default_rng(0)
    nb = (N + 3) // 4
    raw = jnp.asarray(rng.integers(0, 256, size=(B, nb), dtype=np.uint8))
    ind = jnp.asarray(np.ones(N, dtype=bool))
    cov = jnp.asarray(np.linalg.qr(rng.normal(size=(N, K)))[0].astype(np.float32))
    Y = jnp.asarray(rng.normal(size=(N, P)).astype(np.float32))
    mask = jnp.asarray(np.ones((N, P), np.float32))
    Neff = jnp.asarray(np.full(P, float(N), np.float32))
    lam = jnp.asarray(np.full(J, float(N)) * np.linspace(0.5, 4.0, J))

    backend = jax.default_backend()
    print(f"backend={backend} B={B} N={N} P={P} K={K} J={J} inner={inner}")

    # materialize stage inputs once (device-resident, passed by handle)
    def st_decode(rawf):
        return prepare_block_step1(decode_bed_packed(rawf.astype(jnp.uint8), N), ind)

    G0 = jax.jit(lambda r: st_decode(r))(raw)
    _sync(G0)

    def st_resid(G, covm):
        return m1.residualize_geno_block(G, covm, float(N - K))

    G, _sc = jax.jit(st_resid)(G0, cov)
    _sync(G)

    def st_gram(G):
        return jnp.matmul(G, G.T, precision=_PREC)

    def st_gty(G, Ym):
        return jnp.matmul(G, Ym, precision=_PREC)

    def st_eigh(A):
        return jnp.linalg.eigh(A)

    def st_vtg(V, G):
        return jnp.matmul(V.T, G, precision=_PREC)

    GGt = jax.jit(st_gram)(G)
    GTY = jax.jit(st_gty)(G, Y)
    d, V = jax.jit(st_eigh)(GGt)
    VtG = jax.jit(st_vtg)(V, G)
    _sync((GGt, GTY, d, V, VtG))

    def st_z2t(VtG, V, d, GTY):
        Wmat = jnp.matmul(V.T, GTY, precision=_PREC)
        DL_inv = 1.0 / (d[:, None] + lam[None, :])
        return jnp.einsum("bn,bj,bp->njp", VtG, DL_inv, Wmat, precision=_PREC)

    z2t = jax.jit(st_z2t)(VtG, V, d, GTY)
    _sync(z2t)

    def st_epi(VtG, d, z2t, Ym, maskm):
        DL_inv = 1.0 / (d[:, None] + lam[None, :])
        gvec = jnp.matmul((VtG**2).T, DL_inv, precision=_PREC)
        pred = (z2t - gvec[:, :, None] * Ym[:, None, :]) / (1.0 - gvec)[:, :, None]
        pred = pred * maskm[:, None, :]
        p_mean = pred.sum(axis=0) / Neff[None, :]
        pred = (pred - p_mean[None]) * maskm[:, None, :]
        p_sd = jnp.sqrt((pred**2).sum(axis=0) / (Neff[None, :] - 1.0))
        return pred / p_sd[None]

    def st_full(rawf, covm, Ym, maskm):
        Gf = prepare_block_step1(decode_bed_packed(rawf.astype(jnp.uint8), N), ind)
        Gf, _ = m1.residualize_geno_block(Gf, covm, float(N - K))
        return m1.level0_loocv_block(Gf, Ym, maskm, lam, Neff)

    # decode/full perturb a float view of raw (uint8 + f32 carry would
    # dtype-clash inside the scan body)
    raw_f = raw.astype(jnp.float32)

    stages = [
        ("decode", st_decode, [raw_f], 0),
        ("resid", st_resid, [G0, cov], 0),
        ("gram", st_gram, [G], 0),
        ("gty", st_gty, [G, Y], 0),
        ("eigh", st_eigh, [GGt], 0),
        ("vtg", st_vtg, [V, G], 0),
        ("z2t", st_z2t, [VtG, V, d, GTY], 0),
        ("epilogue", st_epi, [VtG, d, z2t, Y, mask], 0),
        ("FULL", st_full, [raw_f, cov, Y, mask], 0),
    ]
    total = 0.0
    for name, fn, args, parg in stages:
        timer = make_scan_timer(fn, parg, inner)
        ms = timeit_scan(timer, args, inner)
        if name != "FULL":
            total += ms
        print(f"  {name:9s} {ms:8.1f} ms")
    print(f"  sum-of-stages {total:8.1f} ms")
    full_timer = make_scan_timer(st_full, 0, inner)
    full_ms = timeit_scan(full_timer, [raw_f, cov, Y, mask], inner)
    print(f"  fused chain   {full_ms:8.1f} ms -> {B / full_ms * 1e3:.0f} SNPs/s"
          f"  (per-iter, RTT amortized over inner={inner})")


if __name__ == "__main__":
    main()
