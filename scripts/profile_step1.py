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
  gvec+epi  gvec matmul + LOOCV epilogue  elementwise [N,J,P]

Every stage is timed with the device-scalar-fetch sync (bench.py _sync
rationale: block_until_ready is a no-op on this rig's tunnel).

Usage: python scripts/profile_step1.py [B] [N] [P]
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


def timeit(fn, *args, rounds=3):
    _sync(fn(*args))
    best = 1e30
    for _ in range(rounds):
        t0 = time.perf_counter()
        _sync(fn(*args))
        best = min(best, time.perf_counter() - t0)
    return best * 1e3


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 1000
    N = int(sys.argv[2]) if len(sys.argv) > 2 else 400_000
    P = int(sys.argv[3]) if len(sys.argv) > 3 else 50
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
    print(f"backend={backend} B={B} N={N} P={P} K={K} J={J}")

    @jax.jit
    def f_decode(raw):
        return prepare_block_step1(decode_bed_packed(raw, N), ind)

    G0 = f_decode(raw)
    _sync(G0)

    @jax.jit
    def f_resid(G):
        return m1.residualize_geno_block(G, cov, float(N - K))

    G, _sc = f_resid(G0)
    _sync(G)

    f_gram = jax.jit(lambda G: jnp.matmul(G, G.T, precision=_PREC))
    GGt = f_gram(G); _sync(GGt)
    f_gty = jax.jit(lambda G: jnp.matmul(G, Y, precision=_PREC))
    GTY = f_gty(G); _sync(GTY)
    f_eigh = jax.jit(lambda A: jnp.linalg.eigh(A))
    d, V = f_eigh(GGt); _sync((d, V))
    f_vtg = jax.jit(lambda V, G: jnp.matmul(V.T, G, precision=_PREC))
    VtG = f_vtg(V, G); _sync(VtG)

    @jax.jit
    def f_z2t(VtG, d, GTY):
        Wmat = jnp.matmul(V.T, GTY, precision=_PREC)
        DL_inv = 1.0 / (d[:, None] + lam[None, :])
        z2t = jnp.einsum("bn,bj,bp->njp", VtG, DL_inv, Wmat, precision=_PREC)
        return z2t

    z2t = f_z2t(VtG, d, GTY); _sync(z2t)

    @jax.jit
    def f_epi(VtG, d, z2t):
        DL_inv = 1.0 / (d[:, None] + lam[None, :])
        gvec = jnp.matmul((VtG**2).T, DL_inv, precision=_PREC)
        pred = (z2t - gvec[:, :, None] * Y[:, None, :]) / (1.0 - gvec)[:, :, None]
        pred = pred * mask[:, None, :]
        p_mean = pred.sum(axis=0) / Neff[None, :]
        pred = (pred - p_mean[None]) * mask[:, None, :]
        p_sd = jnp.sqrt((pred**2).sum(axis=0) / (Neff[None, :] - 1.0))
        return pred / p_sd[None]

    _sync(f_epi(VtG, d, z2t))

    @jax.jit
    def f_full(raw):
        G = prepare_block_step1(decode_bed_packed(raw, N), ind)
        G, _sc = m1.residualize_geno_block(G, cov, float(N - K))
        return m1.level0_loocv_block(G, Y, mask, lam, Neff)

    stages = [
        ("decode", lambda: timeit(f_decode, raw)),
        ("resid", lambda: timeit(f_resid, G0)),
        ("gram", lambda: timeit(f_gram, G)),
        ("gty", lambda: timeit(f_gty, G)),
        ("eigh", lambda: timeit(f_eigh, GGt)),
        ("vtg", lambda: timeit(f_vtg, V, G)),
        ("z2t", lambda: timeit(f_z2t, VtG, d, GTY)),
        ("epilogue", lambda: timeit(f_epi, VtG, d, z2t)),
        ("FULL", lambda: timeit(f_full, raw)),
    ]
    total = 0.0
    for name, fn in stages:
        ms = fn()
        if name != "FULL":
            total += ms
        print(f"  {name:9s} {ms:8.1f} ms")
    print(f"  sum-of-stages {total:8.1f} ms")
    full_ms = timeit(f_full, raw)
    print(f"  end-to-end    {full_ms:8.1f} ms -> {B / full_ms * 1e3:.0f} SNPs/s")


if __name__ == "__main__":
    main()
