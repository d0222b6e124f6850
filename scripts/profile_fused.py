"""Roofline attribution + tuning experiments for the fused BED scorer.

Runs the production kernel and several perf variants at the UKB bench
shape on the live chip, printing SNPs/s and TFLOP/s for each:

  prod        the shipped _fused_kernel_split (4 planes x 3 class dots)
  stacked     plane-stacked variant: concat the 4 decoded class planes
              along the contraction axis and reshape the Wp tile to
              [4*tc, 3C] -> 3 dots/tile with a 4x longer contraction
  nodecode    comparisons replaced by raw casts (measures decode cost)
  dots2       stacked with the M dot dropped (dot-count scaling)
  tile sweep  stacked at (tb, tc) in a small grid

Useful FLOPs/SNP = 3 products x N x 3C x 2 (the roofline convention of
BENCH_NOTES.md).
"""

import functools
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from regenie_tpu.ops import fused_score as fsc

N = int(os.environ.get("BENCH_N", 400_000))
P = int(os.environ.get("BENCH_P", 50))
K = int(os.environ.get("BENCH_K", 20))
B = int(os.environ.get("BENCH_B", 2048))
ROUNDS = int(os.environ.get("BENCH_ROUNDS", 5))
NBLK = int(os.environ.get("BENCH_BLOCKS", 4))

PEAK_TFLOPS = 197.0  # v5e bf16 (394 is the int8 figure)


def _sync(outs):
    """block_until_ready is a no-op on the axon tunnel; force the work
    by reducing one element of every output on device and fetching the
    scalar (see bench.py)."""
    leaves = [x for x in jax.tree_util.tree_leaves(outs)
              if hasattr(x, "dtype")]
    jax.block_until_ready(leaves)
    acc = jnp.zeros((), jnp.float32)
    for x in leaves:
        acc = acc + x.ravel()[:1].astype(jnp.float32).sum()
    return float(acc)


def _stacked_kernel(raw_ref, wp_ref, h_ref, e_ref, m_ref, *, with_m=True):
    @pl.when(pl.program_id(1) == 0)
    def _init():
        h_ref[:] = jnp.zeros_like(h_ref)
        e_ref[:] = jnp.zeros_like(e_ref)
        m_ref[:] = jnp.zeros_like(m_ref)

    r = raw_ref[:].astype(jnp.int32)
    dn = (((1,), (0,)), ((), ()))
    hs, es, ms = [], [], []
    for p in range(4):
        codes = (r >> (2 * p)) & 3
        hs.append((codes == 0).astype(jnp.bfloat16))
        es.append((codes == 2).astype(jnp.bfloat16))
        ms.append((codes == 1).astype(jnp.bfloat16))
    h = jnp.concatenate(hs, axis=1)
    e = jnp.concatenate(es, axis=1)
    m = jnp.concatenate(ms, axis=1)
    w = wp_ref[:].reshape(-1, wp_ref.shape[-1])  # [4*tc, 3C], p-major rows
    h_ref[:] += jax.lax.dot_general(h, w, dn, preferred_element_type=jnp.float32)
    e_ref[:] += jax.lax.dot_general(e, w, dn, preferred_element_type=jnp.float32)
    if with_m:
        m_ref[:] += jax.lax.dot_general(m, w, dn, preferred_element_type=jnp.float32)


def _nodecode_kernel(raw_ref, wp_ref, h_ref, e_ref, m_ref):
    @pl.when(pl.program_id(1) == 0)
    def _init():
        h_ref[:] = jnp.zeros_like(h_ref)
        e_ref[:] = jnp.zeros_like(e_ref)
        m_ref[:] = jnp.zeros_like(m_ref)

    r = raw_ref[:].astype(jnp.int32).astype(jnp.bfloat16)  # decode cost ~removed (one cast chain vs 4x shift+cmp)
    dn = (((1,), (0,)), ((), ()))
    w = wp_ref[:].reshape(-1, wp_ref.shape[-1])
    h = jnp.concatenate([r, r, r, r], axis=1)
    h_ref[:] += jax.lax.dot_general(h, w, dn, preferred_element_type=jnp.float32)
    e_ref[:] += jax.lax.dot_general(h, w, dn, preferred_element_type=jnp.float32)
    m_ref[:] += jax.lax.dot_general(h, w, dn, preferred_element_type=jnp.float32)


def _decode_only_kernel(raw_ref, wp_ref, h_ref, e_ref, m_ref):
    @pl.when(pl.program_id(1) == 0)
    def _init():
        h_ref[:] = jnp.zeros_like(h_ref)
        e_ref[:] = jnp.zeros_like(e_ref)
        m_ref[:] = jnp.zeros_like(m_ref)

    r = raw_ref[:].astype(jnp.int32)
    hs, es, ms = [], [], []
    for p in range(4):
        codes = (r >> (2 * p)) & 3
        hs.append((codes == 0).astype(jnp.bfloat16))
        es.append((codes == 2).astype(jnp.bfloat16))
        ms.append((codes == 1).astype(jnp.bfloat16))
    h = jnp.concatenate(hs, axis=1)
    e = jnp.concatenate(es, axis=1)
    m = jnp.concatenate(ms, axis=1)
    # reduce to keep the decode alive without a dot: one narrow column sum
    cw = h_ref.shape[-1]
    h_ref[:, :1] += h.sum(axis=1, keepdims=True).astype(jnp.float32)
    e_ref[:, :1] += e.sum(axis=1, keepdims=True).astype(jnp.float32)
    m_ref[:, :1] += m.sum(axis=1, keepdims=True).astype(jnp.float32)
    del cw


def _pipelined_kernel(raw_ref, wp_ref, h_ref, e_ref, m_ref, sh, se, sm):
    """Overlap VPU decode of contraction-tile j with the MXU dots of
    tile j-1 (double-buffered VMEM scratch). Grid has ONE extra drain
    step along axis 1."""
    j = pl.program_id(1)
    nC = pl.num_programs(1) - 1
    dn = (((1,), (0,)), ((), ()))

    @pl.when(j == 0)
    def _init():
        h_ref[:] = jnp.zeros_like(h_ref)
        e_ref[:] = jnp.zeros_like(e_ref)
        m_ref[:] = jnp.zeros_like(m_ref)

    @pl.when(j < nC)
    def _decode():
        slot = jax.lax.rem(j, 2)
        r = raw_ref[:].astype(jnp.int32)
        hs, es, ms = [], [], []
        for p in range(4):
            codes = (r >> (2 * p)) & 3
            hs.append((codes == 0).astype(jnp.bfloat16))
            es.append((codes == 2).astype(jnp.bfloat16))
            ms.append((codes == 1).astype(jnp.bfloat16))
        sh[slot] = jnp.concatenate(hs, axis=1)
        se[slot] = jnp.concatenate(es, axis=1)
        sm[slot] = jnp.concatenate(ms, axis=1)

    @pl.when(j > 0)
    def _dot():
        slot = jax.lax.rem(j - 1, 2)
        w = wp_ref[:].reshape(-1, wp_ref.shape[-1])
        h_ref[:] += jax.lax.dot_general(
            sh[slot], w, dn, preferred_element_type=jnp.float32)
        e_ref[:] += jax.lax.dot_general(
            se[slot], w, dn, preferred_element_type=jnp.float32)
        m_ref[:] += jax.lax.dot_general(
            sm[slot], w, dn, preferred_element_type=jnp.float32)


@functools.partial(jax.jit, static_argnames=("tb", "tc"))
def run_pipelined(raw, Wp, tb, tc):
    Bq, nbp = raw.shape
    Cw = Wp.shape[2]
    nC = pl.cdiv(nbp, tc)
    grid = (pl.cdiv(Bq, tb), nC + 1)
    return pl.pallas_call(
        _pipelined_kernel,
        out_shape=[jax.ShapeDtypeStruct((Bq, Cw), jnp.float32)] * 3,
        grid=grid,
        in_specs=[
            pl.BlockSpec((tb, tc),
                         lambda i, j: (i, jnp.minimum(j, nC - 1)),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((4, tc, Cw),
                         lambda i, j: (0, jnp.maximum(j - 1, 0), 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((tb, Cw), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM)
        ] * 3,
        scratch_shapes=[pltpu.VMEM((2, tb, 4 * tc), jnp.bfloat16)] * 3,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024),
    )(raw, Wp)


@functools.partial(jax.jit, static_argnames=("kernel", "tb", "tc", "kw"))
def run_variant(raw, Wp, kernel, tb, tc, kw=()):
    Bq, nbp = raw.shape
    Cw = Wp.shape[2]
    grid = (pl.cdiv(Bq, tb), pl.cdiv(nbp, tc))
    return pl.pallas_call(
        functools.partial(kernel, **dict(kw)),
        out_shape=[jax.ShapeDtypeStruct((Bq, Cw), jnp.float32)] * 3,
        grid=grid,
        in_specs=[
            pl.BlockSpec((tb, tc), lambda i, j: (i, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((4, tc, Cw), lambda i, j: (0, j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((tb, Cw), lambda i, j: (i, 0), memory_space=pltpu.VMEM)
        ] * 3,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(raw, Wp)


def main():
    rng = np.random.default_rng(0)
    nb = (N + 3) // 4
    raws = [rng.integers(0, 256, size=(B, nb), dtype=np.uint8)
            for _ in range(NBLK)]
    raw = raws[0]

    ind = np.ones(N, dtype=bool)
    res = rng.normal(size=(N, P))
    maskf = np.ones((N, P))
    n_inc = max(1, P // 5)
    for p in range(n_inc):
        missing = rng.random(N) < 0.05
        maskf[missing, p] = 0.0
        res[missing, p] = 0.0
    cov = np.linalg.qr(rng.normal(size=(N, K)))[0]

    consts = fsc.build_consts(cov, res, maskf, ind, float(N - K), split=True)
    nbp = consts.Wp.shape[1]
    rawps = [jnp.asarray(fsc.pad_raw(r, nbp)) for r in raws]
    _sync(rawps)
    rawp = rawps[0]
    Wp = consts.Wp
    C3 = Wp.shape[2]
    flops_per_snp = 3 * N * C3 / 3 * 3 * 2  # 3 products x N x (3C) x 2
    # NOTE: useful-FLOPs convention counts the 3C split columns (the split
    # itself is the work the MXU must do for f32-exact products)
    flops_per_snp = 3 * N * C3 * 2

    print(f"N={N} P={P} K={K} B={B} nbp={nbp} Cw={C3} "
          f"flops/snp={flops_per_snp/1e9:.3f} GF", flush=True)

    def timeit(name, fn):
        # fn(block) -> outputs; timed over NBLK DISTINCT blocks per round
        # with a single scalar-fetch sync (per-op fetches would measure
        # the WAN RTT; block_until_ready measures nothing — see _sync)
        try:
            _sync(fn(rawp))
        except Exception as exc:  # noqa: BLE001
            print(f"{name:30s} FAILED: {exc}", flush=True)
            return None
        best = np.inf
        for _ in range(ROUNDS):
            t0 = time.perf_counter()
            outs = [fn(r) for r in rawps]
            _sync(outs)
            best = min(best, (time.perf_counter() - t0) / NBLK)
        snps = B / best
        tf = snps * flops_per_snp / 1e12
        print(f"{name:30s} {best*1e3:8.2f} ms  {snps:9.0f} SNPs/s  "
              f"{tf:6.1f} TF/s ({100*tf/PEAK_TFLOPS:.0f}% peak)", flush=True)
        return snps

    timeit("prod kernel (tb1024,tc256)",
           lambda r: fsc.fused_products(r, Wp))
    timeit("stacked (tb1024,tc256)",
           lambda r: run_variant(r, Wp, _stacked_kernel, 1024, 256))
    timeit("nodecode (tb1024,tc256)",
           lambda r: run_variant(r, Wp, _nodecode_kernel, 1024, 256))
    timeit("stacked-2dots",
           lambda r: run_variant(r, Wp, _stacked_kernel, 1024, 256,
                               kw=(("with_m", False),)))
    timeit("decode-only",
           lambda r: run_variant(r, Wp, _decode_only_kernel, 1024, 256))
    for tb in (512, 1024):
        for tc in (128, 256):
            timeit(f"pipelined (tb{tb},tc{tc})",
                   lambda r, tb=tb, tc=tc: run_pipelined(r, Wp, tb, tc))
    if os.environ.get("BENCH_SWEEP"):
        for tb in (512, 1024, 2048):
            for tc in (128, 256, 512):
                if tb == 1024 and tc == 256:
                    continue
                timeit(f"stacked (tb{tb},tc{tc})",
                       lambda r, tb=tb, tc=tc: run_variant(
                           r, Wp, _stacked_kernel, tb, tc))
    # correctness of the pipelined kernel vs prod
    a = fsc.fused_products(rawp, Wp)
    Hs, Es, Ms = run_pipelined(rawp, Wp, 1024, 256)
    Cq = Wp.shape[2] // 3
    foldq = lambda d: d[:, :Cq] + d[:, Cq:2 * Cq] + d[:, 2 * Cq:]
    for x, y, nm in zip(a, (2 * foldq(Hs) + foldq(Es),
                            4 * foldq(Hs) + foldq(Es), foldq(Ms)),
                        ("S1", "SQ", "SM")):
        d = float(jnp.max(jnp.abs(x - y)))
        print(f"pipelined vs prod max|d| {nm}: {d:g}", flush=True)
    # correctness of the stacked layout vs prod
    a = fsc.fused_products(rawp, Wp)
    Hs, Es, Ms = run_variant(rawp, Wp, _stacked_kernel, 1024, 256)
    C = C3 // 3
    fold = lambda d: d[:, :C] + d[:, C:2 * C] + d[:, 2 * C:]
    s1 = 2 * fold(Hs) + fold(Es)
    sq = 4 * fold(Hs) + fold(Es)
    sm = fold(Ms)
    for x, y, nm in zip(a, (s1, sq, sm), ("S1", "SQ", "SM")):
        d = float(jnp.max(jnp.abs(x - y)))
        print(f"stacked vs prod max|d| {nm}: {d:g}", flush=True)


if __name__ == "__main__":
    main()
