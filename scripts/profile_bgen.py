"""Tile sweep + stage attribution for the BGEN sample-packed fused
kernel (bench leg step2_bgen_resident — 13.1K SNPs/s in the first r4
capture vs ~80K for packed hardcalls; 8x the HBM bytes/SNP explains
part, this script attributes the rest).

Sweeps (tb, tc) for bgen_fused_products at UKB shape and times the
dots-only vs full kernel to split MXU vs VPU-plane-math cost.

Usage: python scripts/profile_bgen.py [B] [N] [P]
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from regenie_tpu.ops import fused_score as fsc


def _sync(outs):
    leaves = [x for x in jax.tree_util.tree_leaves(outs) if hasattr(x, "dtype")]
    jax.block_until_ready(leaves)
    acc = jnp.zeros((), jnp.float32)
    for x in leaves:
        acc = acc + x.ravel()[:1].astype(jnp.float32).sum()
    return float(acc)


def timeit(fn, *args, rounds=3, inner=4):
    _sync(fn(*args))
    best = 1e30
    for _ in range(rounds):
        t0 = time.perf_counter()
        outs = [fn(*args) for _ in range(inner)]
        _sync(outs)
        best = min(best, (time.perf_counter() - t0) / inner)
    return best * 1e3


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
    N = int(sys.argv[2]) if len(sys.argv) > 2 else 400_000
    P = int(sys.argv[3]) if len(sys.argv) > 3 else 50
    K = 20
    rng = np.random.default_rng(0)
    backend = jax.default_backend()
    on_tpu = backend != "cpu"
    print(f"backend={backend} B={B} N={N} P={P} K={K}")

    cov = np.linalg.qr(rng.normal(size=(N, K)))[0]
    res = rng.normal(size=(N, P))
    maskf = np.ones((N, P))
    ind = np.ones(N, bool)
    split = fsc.split_mode(on_tpu, sample_layout=True)
    consts = fsc.build_consts(cov, res, maskf, ind, float(N - K),
                              split=split, pack="sample", dtype=np.float32)
    tailz = np.concatenate(
        [maskf * ind.astype(np.float64)[:, None],
         ind.astype(np.float64)[:, None]], axis=1)
    Wq, _ = fsc.sample_pack(tailz, split=split, dtype=np.float32)
    qs = consts.layout_C() - (P + 1)
    Np = fsc.op_nbp(consts.Wp)

    k0 = rng.integers(0, 200, size=(B, N)).astype(np.uint8)
    k1 = np.minimum(rng.integers(0, 200, size=(B, N)),
                    255 - k0.astype(np.int64)).astype(np.uint8)
    miss = rng.random(size=(B, N)) < 0.02
    pl_h = np.zeros((B, 2, Np), np.uint8)
    pl_h[:, 0, :N] = np.where(miss, 255, k0)
    pl_h[:, 1, :N] = np.where(miss, 255, k1)
    planes = jax.device_put(pl_h)
    _sync(planes)

    Cw = fsc.op_nbp(Wq) and (Wq.limbs.shape[1] if isinstance(Wq, fsc.I8Operand) else Wq.shape[1])
    print(f"operand: Np={Np} Cw4={consts.Wp.limbs.shape[1] if isinstance(consts.Wp, fsc.I8Operand) else consts.Wp.shape[1]} Cwq4={Cw} split={split}")

    for tb in (256, 512, 1024):
        for tc in (256, 512, 1024):
            if tb * tc > 1024 * 1024:
                continue
            try:
                fn = jax.jit(lambda p, _tb=tb, _tc=tc: fsc.bgen_fused_products(
                    p, consts.Wp, Wq=Wq, qs=qs, C_used=consts.layout_C(),
                    tb=_tb, tc=_tc))
                ms = timeit(fn, planes)
                print(f"  tb={tb:5d} tc={tc:5d}  {ms:8.1f} ms  "
                      f"-> {B / ms * 1e3:8.0f} SNPs/s")
            except Exception as e:  # tiling limits
                print(f"  tb={tb:5d} tc={tc:5d}  FAILED: {str(e)[:100]}")


if __name__ == "__main__":
    main()
