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
                # operands as ARGUMENTS — closed-over device constants
                # get baked into the remote-compile payload (HTTP 413)
                fn = jax.jit(lambda p, wp, wq, _tb=tb, _tc=tc:
                             fsc.bgen_fused_products(
                                 p, wp, Wq=wq, qs=qs,
                                 C_used=consts.layout_C(),
                                 tb=_tb, tc=_tc))
                ms = timeit(fn, planes, consts.Wp, Wq)
                print(f"  tb={tb:5d} tc={tc:5d}  {ms:8.1f} ms  "
                      f"-> {B / ms * 1e3:8.0f} SNPs/s")
            except Exception as e:  # tiling limits
                print(f"  tb={tb:5d} tc={tc:5d}  FAILED: {str(e)[:100]}")




# ---------------------------------------------------------------------------
# kernel-variant attribution (run with: ... variants)
# ---------------------------------------------------------------------------

def variants_main():
    import jax
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B = int(sys.argv[2]) if len(sys.argv) > 2 else 1024
    N = int(sys.argv[3]) if len(sys.argv) > 3 else 400_000
    P = 50
    K = 20
    tb, tc = 512, 512
    rng = np.random.default_rng(0)
    on_tpu = jax.default_backend() != "cpu"
    print(f"backend={jax.default_backend()} B={B} N={N} variants tb={tb} tc={tc}")

    cov = np.linalg.qr(rng.normal(size=(N, K)))[0]
    res = rng.normal(size=(N, P))
    maskf = np.ones((N, P))
    ind = np.ones(N, bool)
    consts = fsc.build_consts(cov, res, maskf, ind, float(N - K),
                              split="i8", pack="sample", dtype=np.float32)
    tailz = np.concatenate(
        [maskf * ind.astype(np.float64)[:, None],
         ind.astype(np.float64)[:, None]], axis=1)
    Wq, _ = fsc.sample_pack(tailz, split="i8", dtype=np.float32)
    Np = fsc.op_nbp(consts.Wp)
    Cw4 = consts.Wp.limbs.shape[1]
    Cwq4 = Wq.limbs.shape[1]

    k0 = rng.integers(0, 200, size=(B, N)).astype(np.uint8)
    k1 = np.minimum(rng.integers(0, 200, size=(B, N)),
                    255 - k0.astype(np.int64)).astype(np.uint8)
    pl_h = np.zeros((B, 2, Np), np.uint8)
    pl_h[:, 0, :N] = k0
    pl_h[:, 1, :N] = k1
    planes = jax.device_put(pl_h)
    _sync(planes)

    def make_call(kernel, n_out_w=3, n_out_q=3):
        grid = (pl.cdiv(B, tb), pl.cdiv(Np, tc))

        def f(p, wl, ql):
            return pl.pallas_call(
                kernel,
                out_shape=[jax.ShapeDtypeStruct((B, Cw4), jnp.float32)] * n_out_w
                + [jax.ShapeDtypeStruct((B, Cwq4), jnp.float32)] * n_out_q,
                grid=grid,
                in_specs=[
                    pl.BlockSpec((tb, 2, tc), lambda i, j: (i, 0, j),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((tc, Cw4), lambda i, j: (j, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((tc, Cwq4), lambda i, j: (j, 0),
                                 memory_space=pltpu.VMEM),
                ],
                out_specs=[pl.BlockSpec((tb, Cw4), lambda i, j: (i, 0),
                                        memory_space=pltpu.VMEM)] * n_out_w
                + [pl.BlockSpec((tb, Cwq4), lambda i, j: (i, 0),
                                memory_space=pltpu.VMEM)] * n_out_q,
                compiler_params=pltpu.CompilerParams(
                    vmem_limit_bytes=100 * 1024 * 1024),
            )(p, wl, ql)

        return jax.jit(f)

    dn = (((1,), (0,)), ((), ()))

    def kern_base(pl_ref, wp_ref, wq_ref, d0, d1, m, q0, q1, q2):
        @pl.when(pl.program_id(1) == 0)
        def _init():
            for ref in (d0, d1, m, q0, q1, q2):
                ref[:] = jnp.zeros_like(ref)
        k0 = pl_ref[:, 0, :].astype(jnp.int32)
        k1 = pl_ref[:, 1, :].astype(jnp.int32)
        miss = (k0 + k1) > 255
        k0 = jnp.where(miss, 0, k0)
        k1 = jnp.where(miss, 0, k1)
        d2 = (2 * k0 + k1) ** 2
        w, wq = wp_ref[:], wq_ref[:]
        def dot8(x, wref):
            xs = (x - 128).astype(jnp.int8)
            return jax.lax.dot_general(xs, wref, dn,
                preferred_element_type=jnp.int32).astype(jnp.float32)
        d0[:] += dot8(k0, w)
        d1[:] += dot8(k1, w)
        m[:] += dot8(miss.astype(jnp.int32), w)
        q0[:] += dot8(d2 & 255, wq)
        q1[:] += dot8((d2 >> 8) & 255, wq)
        q2[:] += dot8(d2 >> 16, wq)

    def kern_noq(pl_ref, wp_ref, wq_ref, d0, d1, m, q0, q1, q2):
        @pl.when(pl.program_id(1) == 0)
        def _init():
            for ref in (d0, d1, m, q0, q1, q2):
                ref[:] = jnp.zeros_like(ref)
        k0 = pl_ref[:, 0, :].astype(jnp.int32)
        k1 = pl_ref[:, 1, :].astype(jnp.int32)
        miss = (k0 + k1) > 255
        k0 = jnp.where(miss, 0, k0)
        k1 = jnp.where(miss, 0, k1)
        w = wp_ref[:]
        def dot8(x, wref):
            xs = (x - 128).astype(jnp.int8)
            return jax.lax.dot_general(xs, wref, dn,
                preferred_element_type=jnp.int32).astype(jnp.float32)
        d0[:] += dot8(k0, w)
        d1[:] += dot8(k1, w)
        m[:] += dot8(miss.astype(jnp.int32), w)

    def kern_u8(pl_ref, wp_ref, wq_ref, d0, d1, m, q0, q1, q2):
        """u8 xor-bitcast for the three w-dots (no width relayout);
        d2 bytes keep the i32 path."""
        @pl.when(pl.program_id(1) == 0)
        def _init():
            for ref in (d0, d1, m, q0, q1, q2):
                ref[:] = jnp.zeros_like(ref)
        k0u = pl_ref[:, 0, :]
        k1u = pl_ref[:, 1, :]
        missu = (k0u.astype(jnp.int32) + k1u.astype(jnp.int32)) > 255
        k0u = jnp.where(missu, jnp.uint8(0), k0u)
        k1u = jnp.where(missu, jnp.uint8(0), k1u)
        w, wq = wp_ref[:], wq_ref[:]
        def dot_u8(xu, wref):
            xs = jax.lax.bitcast_convert_type(xu ^ jnp.uint8(0x80), jnp.int8)
            return jax.lax.dot_general(xs, wref, dn,
                preferred_element_type=jnp.int32).astype(jnp.float32)
        d0[:] += dot_u8(k0u, w)
        d1[:] += dot_u8(k1u, w)
        m[:] += dot_u8(missu.astype(jnp.uint8), w)
        k0 = k0u.astype(jnp.int32)
        k1 = k1u.astype(jnp.int32)
        d2 = (2 * k0 + k1) ** 2
        def dot8(x, wref):
            xs = (x - 128).astype(jnp.int8)
            return jax.lax.dot_general(xs, wref, dn,
                preferred_element_type=jnp.int32).astype(jnp.float32)
        q0[:] += dot8(d2 & 255, wq)
        q1[:] += dot8((d2 >> 8) & 255, wq)
        q2[:] += dot8(d2 >> 16, wq)

    wl, ql = consts.Wp.limbs, Wq.limbs
    for name, kern in (("base(=prod)", kern_base), ("no-q", kern_noq),
                       ("u8-xor-wdots", kern_u8)):
        try:
            fn = make_call(kern)
            ms = timeit(fn, planes, wl, ql)
            print(f"  {name:14s} {ms:8.1f} ms -> {B / ms * 1e3:8.0f} SNPs/s")
        except Exception as e:
            print(f"  {name:14s} FAILED: {str(e)[:140]}")






def variants2_main():
    """Separate k0/k1 [B, Np] inputs vs the [B, 2, Np] packed layout —
    the size-2 middle dim sits in the sublane position of the VMEM tile
    and every pl_ref[:, i, :] slice is a relayout."""
    import jax
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B = int(sys.argv[2]) if len(sys.argv) > 2 else 1024
    N = int(sys.argv[3]) if len(sys.argv) > 3 else 400_000
    P, K = 50, 20
    tb, tc = 512, 512
    rng = np.random.default_rng(0)
    print(f"backend={jax.default_backend()} B={B} N={N} split-planes tb={tb} tc={tc}")

    cov = np.linalg.qr(rng.normal(size=(N, K)))[0]
    res = rng.normal(size=(N, P))
    maskf = np.ones((N, P))
    ind = np.ones(N, bool)
    consts = fsc.build_consts(cov, res, maskf, ind, float(N - K),
                              split="i8", pack="sample", dtype=np.float32)
    tailz = np.concatenate(
        [maskf * ind.astype(np.float64)[:, None],
         ind.astype(np.float64)[:, None]], axis=1)
    Wq, _ = fsc.sample_pack(tailz, split="i8", dtype=np.float32)
    Np = fsc.op_nbp(consts.Wp)
    Cw4 = consts.Wp.limbs.shape[1]
    Cwq4 = Wq.limbs.shape[1]

    k0h = rng.integers(0, 200, size=(B, N)).astype(np.uint8)
    k1h = np.minimum(rng.integers(0, 200, size=(B, N)),
                     255 - k0h.astype(np.int64)).astype(np.uint8)
    k0p = np.zeros((B, Np), np.uint8); k0p[:, :N] = k0h
    k1p = np.zeros((B, Np), np.uint8); k1p[:, :N] = k1h
    k0d = jax.device_put(k0p); k1d = jax.device_put(k1p)
    _sync((k0d, k1d))
    dn = (((1,), (0,)), ((), ()))

    def kern_sep(k0_ref, k1_ref, wp_ref, wq_ref, d0, d1, m, q0, q1, q2):
        @pl.when(pl.program_id(1) == 0)
        def _init():
            for ref in (d0, d1, m, q0, q1, q2):
                ref[:] = jnp.zeros_like(ref)
        k0 = k0_ref[:].astype(jnp.int32)
        k1 = k1_ref[:].astype(jnp.int32)
        miss = (k0 + k1) > 255
        k0 = jnp.where(miss, 0, k0)
        k1 = jnp.where(miss, 0, k1)
        d2 = (2 * k0 + k1) ** 2
        w, wq = wp_ref[:], wq_ref[:]
        def dot8(x, wref):
            xs = (x - 128).astype(jnp.int8)
            return jax.lax.dot_general(xs, wref, dn,
                preferred_element_type=jnp.int32).astype(jnp.float32)
        d0[:] += dot8(k0, w)
        d1[:] += dot8(k1, w)
        m[:] += dot8(miss.astype(jnp.int32), w)
        q0[:] += dot8(d2 & 255, wq)
        q1[:] += dot8((d2 >> 8) & 255, wq)
        q2[:] += dot8(d2 >> 16, wq)

    def kern_sep_noq(k0_ref, k1_ref, wp_ref, wq_ref, d0, d1, m, q0, q1, q2):
        @pl.when(pl.program_id(1) == 0)
        def _init():
            for ref in (d0, d1, m, q0, q1, q2):
                ref[:] = jnp.zeros_like(ref)
        k0 = k0_ref[:].astype(jnp.int32)
        k1 = k1_ref[:].astype(jnp.int32)
        miss = (k0 + k1) > 255
        k0 = jnp.where(miss, 0, k0)
        k1 = jnp.where(miss, 0, k1)
        w = wp_ref[:]
        def dot8(x, wref):
            xs = (x - 128).astype(jnp.int8)
            return jax.lax.dot_general(xs, wref, dn,
                preferred_element_type=jnp.int32).astype(jnp.float32)
        d0[:] += dot8(k0, w)
        d1[:] += dot8(k1, w)
        m[:] += dot8(miss.astype(jnp.int32), w)


    def kern_sep_merge(k0_ref, k1_ref, wp_ref, wq_ref, d0, d1, m, q0, q1, q2):
        """2 row-stacked dots instead of 6: [3*tb, tc] x operand."""
        @pl.when(pl.program_id(1) == 0)
        def _init():
            for ref in (d0, d1, m, q0, q1, q2):
                ref[:] = jnp.zeros_like(ref)
        k0u = k0_ref[:]
        k1u = k1_ref[:]
        missu = (k0u.astype(jnp.int32) + k1u.astype(jnp.int32)) > 255
        k0u = jnp.where(missu, jnp.uint8(0), k0u)
        k1u = jnp.where(missu, jnp.uint8(0), k1u)
        def bc(xu):
            return jax.lax.bitcast_convert_type(xu ^ jnp.uint8(0x80), jnp.int8)
        lhs_w = jnp.concatenate(
            [bc(k0u), bc(k1u), missu.astype(jnp.int8)], axis=0)
        rw = jax.lax.dot_general(lhs_w, wp_ref[:], dn,
                                 preferred_element_type=jnp.int32
                                 ).astype(jnp.float32)
        n = k0u.shape[0]
        d0[:] += rw[:n]
        d1[:] += rw[n:2 * n]
        m[:] += rw[2 * n:]
        k0 = k0u.astype(jnp.int32)
        k1 = k1u.astype(jnp.int32)
        d2 = (2 * k0 + k1) ** 2
        lhs_q = jnp.concatenate([
            ((d2 & 255) - 128).astype(jnp.int8),
            (((d2 >> 8) & 255) - 128).astype(jnp.int8),
            ((d2 >> 16) - 128).astype(jnp.int8)], axis=0)
        rq = jax.lax.dot_general(lhs_q, wq_ref[:], dn,
                                 preferred_element_type=jnp.int32
                                 ).astype(jnp.float32)
        q0[:] += rq[:n]
        q1[:] += rq[n:2 * n]
        q2[:] += rq[2 * n:]

    def make_call2(kernel):
        grid = (pl.cdiv(B, tb), pl.cdiv(Np, tc))

        def f(a, b, wl, ql):
            return pl.pallas_call(
                kernel,
                out_shape=[jax.ShapeDtypeStruct((B, Cw4), jnp.float32)] * 3
                + [jax.ShapeDtypeStruct((B, Cwq4), jnp.float32)] * 3,
                grid=grid,
                in_specs=[
                    pl.BlockSpec((tb, tc), lambda i, j: (i, j),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((tb, tc), lambda i, j: (i, j),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((tc, Cw4), lambda i, j: (j, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((tc, Cwq4), lambda i, j: (j, 0),
                                 memory_space=pltpu.VMEM),
                ],
                out_specs=[pl.BlockSpec((tb, Cw4), lambda i, j: (i, 0),
                                        memory_space=pltpu.VMEM)] * 3
                + [pl.BlockSpec((tb, Cwq4), lambda i, j: (i, 0),
                                memory_space=pltpu.VMEM)] * 3,
                compiler_params=pltpu.CompilerParams(
                    vmem_limit_bytes=100 * 1024 * 1024),
            )(a, b, wl, ql)

        return jax.jit(f)

    wl, ql = consts.Wp.limbs, Wq.limbs
    for name, kern in (("sep-planes", kern_sep), ("sep-noq", kern_sep_noq), ("sep-merge2dot", kern_sep_merge)):
        try:
            fn = make_call2(kern)
            ms = timeit(fn, k0d, k1d, wl, ql)
            print(f"  {name:14s} {ms:8.1f} ms -> {B / ms * 1e3:8.0f} SNPs/s")
        except Exception as e:
            print(f"  {name:14s} FAILED: {str(e)[:140]}")



def variants3_main():
    """r5 VPU-reduction candidates for the i8 BGEN kernel, all on the
    separate-plane layout (the production layout since the r4 relayout
    fix):
      base      — the production kernel body (u8-xor d0/d1, 3 q-limbs)
      e2        — (2k0+k1-255)^2 decomposition: e^2 <= 65025 needs TWO
                  i8 limbs instead of three; the linear 510*e and
                  constant 65025 terms recombine in the epilogue from
                  the d0/d1 dots and operand column sums (exact)
      u8miss    — miss test as k0u > ~k1u in u8 (255-k1 == bitwise NOT)
                  instead of widening both planes to i32
      e2+u8miss — both
    """
    import jax
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B = int(sys.argv[2]) if len(sys.argv) > 2 else 1024
    N = int(sys.argv[3]) if len(sys.argv) > 3 else 400_000
    P, K = 50, 20
    tb = int(sys.argv[4]) if len(sys.argv) > 4 else 512
    tc = int(sys.argv[5]) if len(sys.argv) > 5 else 512
    rng = np.random.default_rng(0)
    print(f"backend={jax.default_backend()} B={B} N={N} variants3 tb={tb} tc={tc}")

    cov = np.linalg.qr(rng.normal(size=(N, K)))[0]
    res = rng.normal(size=(N, P))
    maskf = np.ones((N, P))
    ind = np.ones(N, bool)
    consts = fsc.build_consts(cov, res, maskf, ind, float(N - K),
                              split="i8", pack="sample", dtype=np.float32)
    tailz = np.concatenate(
        [maskf * ind.astype(np.float64)[:, None],
         ind.astype(np.float64)[:, None]], axis=1)
    Wq, _ = fsc.sample_pack(tailz, split="i8", dtype=np.float32)
    Np = fsc.op_nbp(consts.Wp)
    Cw4 = consts.Wp.limbs.shape[1]
    Cwq4 = Wq.limbs.shape[1]

    k0h = rng.integers(0, 200, size=(B, N)).astype(np.uint8)
    k1h = np.minimum(rng.integers(0, 200, size=(B, N)),
                     255 - k0h.astype(np.int64)).astype(np.uint8)
    k0p = np.zeros((B, Np), np.uint8); k0p[:, :N] = k0h
    k1p = np.zeros((B, Np), np.uint8); k1p[:, :N] = k1h
    k0d = jax.device_put(k0p); k1d = jax.device_put(k1p)
    _sync((k0d, k1d))
    dn = (((1,), (0,)), ((), ()))

    def bc(xu):
        return jax.lax.bitcast_convert_type(xu ^ jnp.uint8(0x80), jnp.int8)

    def miss_i32(k0u, k1u):
        return (k0u.astype(jnp.int32) + k1u.astype(jnp.int32)) > 255

    def miss_u8(k0u, k1u):
        return k0u > ~k1u  # 255 - k1 == bitwise NOT in u8

    def make_base(missf, n_q):
        def kern(k0_ref, k1_ref, wp_ref, wq_ref, d0, d1, m, q0, q1, q2):
            @pl.when(pl.program_id(1) == 0)
            def _init():
                for ref in (d0, d1, m, q0, q1, q2):
                    ref[:] = jnp.zeros_like(ref)
            k0u = k0_ref[:]
            k1u = k1_ref[:]
            missu = missf(k0u, k1u)
            k0u = jnp.where(missu, jnp.uint8(0), k0u)
            k1u = jnp.where(missu, jnp.uint8(0), k1u)
            w, wq = wp_ref[:], wq_ref[:]

            def dotw(xs, wref):
                return jax.lax.dot_general(
                    xs, wref, dn,
                    preferred_element_type=jnp.int32).astype(jnp.float32)

            d0[:] += dotw(bc(k0u), w)
            d1[:] += dotw(bc(k1u), w)
            m[:] += jax.lax.dot_general(
                missu.astype(jnp.int8), w, dn,
                preferred_element_type=jnp.int32).astype(jnp.float32)
            k0 = k0u.astype(jnp.int32)
            k1 = k1u.astype(jnp.int32)
            if n_q == 3:
                d2 = (2 * k0 + k1) ** 2
                q0[:] += dotw(((d2 & 255) - 128).astype(jnp.int8), wq)
                q1[:] += dotw((((d2 >> 8) & 255) - 128).astype(jnp.int8), wq)
                q2[:] += dotw(((d2 >> 16) - 128).astype(jnp.int8), wq)
            elif n_q == 2:  # e2: (d - 255)^2 fits 16 bits -> two limbs
                e = 2 * k0 + k1 - 255
                e2 = e * e
                q0[:] += dotw(((e2 & 255) - 128).astype(jnp.int8), wq)
                q1[:] += dotw(((e2 >> 8) - 128).astype(jnp.int8), wq)
            else:  # dhl: d = dlo + 256*dhi (dhi in {0,1});
                # d^2 = dlo^2 + dhi*(512*dlo + 65536) — nonneg terms,
                # no cancellation in the epilogue recombination
                d = 2 * k0 + k1
                dlo = d & 255
                dhi = d >> 8
                dl2 = dlo * dlo
                q0[:] += dotw(((dl2 & 255) - 128).astype(jnp.int8), wq)
                q1[:] += dotw(((dl2 >> 8) - 128).astype(jnp.int8), wq)
                # the two extra 1-byte dots both land in q2's slot —
                # timing-faithful (real dots, not DCE-able); the
                # production wrapper keeps them separate
                q2[:] += dotw(((dhi * dlo) - 128).astype(jnp.int8), wq)
                q2[:] += dotw((dhi - 128).astype(jnp.int8), wq)
        return kern

    def make_call3(kernel):
        grid = (pl.cdiv(B, tb), pl.cdiv(Np, tc))

        def f(a, b, wl, ql):
            return pl.pallas_call(
                kernel,
                out_shape=[jax.ShapeDtypeStruct((B, Cw4), jnp.float32)] * 3
                + [jax.ShapeDtypeStruct((B, Cwq4), jnp.float32)] * 3,
                grid=grid,
                in_specs=[
                    pl.BlockSpec((tb, tc), lambda i, j: (i, j),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((tb, tc), lambda i, j: (i, j),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((tc, Cw4), lambda i, j: (j, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((tc, Cwq4), lambda i, j: (j, 0),
                                 memory_space=pltpu.VMEM),
                ],
                out_specs=[pl.BlockSpec((tb, Cw4), lambda i, j: (i, 0),
                                        memory_space=pltpu.VMEM)] * 3
                + [pl.BlockSpec((tb, Cwq4), lambda i, j: (i, 0),
                                memory_space=pltpu.VMEM)] * 3,
                compiler_params=pltpu.CompilerParams(
                    vmem_limit_bytes=100 * 1024 * 1024),
            )(a, b, wl, ql)

        return jax.jit(f)

    wl, ql = consts.Wp.limbs, Wq.limbs
    for name, missf, n_q in (
        ("base-i32miss-3q", miss_i32, 3),
        ("e2-2q", miss_i32, 2),
        ("dhl-2q+2tiny", miss_i32, 4),
    ):
        try:
            fn = make_call3(make_base(missf, n_q))
            ms = timeit(fn, k0d, k1d, wl, ql)
            print(f"  {name:16s} {ms:8.1f} ms -> {B / ms * 1e3:8.0f} SNPs/s")
        except Exception as e:
            print(f"  {name:16s} FAILED: {str(e)[:140]}")


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "variants":
        variants_main()
    elif len(sys.argv) > 1 and sys.argv[1] == "variants2":
        variants2_main()
    elif len(sys.argv) > 1 and sys.argv[1] == "variants3":
        variants3_main()
    else:
        main()
