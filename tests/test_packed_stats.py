"""pack_hardcalls / snp_stats_block_packed: the gene-based + trailing
block stats path ships packed 2-bit codes and decodes on device
(run_step2.block_stats r4).  Contract: exact round trip and stat
equality with the dense int8 kernel, incl. chrX non-PAR."""

import numpy as np

from regenie_tpu.ops.geno_ops import (
    decode_bed_packed,
    pack_hardcalls,
    snp_stats_block,
    snp_stats_block_packed,
)


def test_pack_roundtrip_and_stats_match():
    rng = np.random.default_rng(0)
    for N in (17, 64, 101, 400):
        G = rng.choice(np.array([0, 1, 2, -3], np.int8), size=(13, N))
        raw = pack_hardcalls(G)
        assert raw.shape == (13, (N + 3) // 4)
        assert (np.asarray(decode_bed_packed(raw, N)) == G).all()

        ind = rng.random(N) < 0.9
        maskf = rng.random((N, 3)) < 0.8
        a = snp_stats_block(G, ind, maskf)
        b = snp_stats_block_packed(raw, N, ind, maskf)
        for k in a:
            assert (np.asarray(a[k]) == np.asarray(b[k])).all(), (N, k)


def test_pack_stats_match_chrx_nonpar():
    rng = np.random.default_rng(1)
    N = 211
    G = rng.choice(np.array([0, 1, 2, -3], np.int8), size=(9, N))
    raw = pack_hardcalls(G)
    ind = rng.random(N) < 0.95
    maskf = rng.random((N, 2)) < 0.9
    sex = (rng.random(N) < 0.5).astype(int)
    non_par = rng.random(9) < 0.6
    for skip_comp in (False, True):
        a = snp_stats_block(G, ind, maskf, non_par=non_par, sex=sex,
                            skip_comp=skip_comp)
        b = snp_stats_block_packed(raw, N, ind, maskf, non_par=non_par,
                                   sex=sex, skip_comp=skip_comp)
        for k in a:
            assert (np.asarray(a[k]) == np.asarray(b[k])).all(), (skip_comp, k)


def test_block_stats_bucket_padding_and_packed_path():
    """Step2Engine.block_stats must return identical stats regardless of
    the pow2 row padding / packed-ship path (sliced back to B0)."""
    from regenie_tpu.ops import geno_ops

    rng = np.random.default_rng(2)
    N = 333
    for B in (5, 64, 97):
        G = rng.choice(np.array([0, 1, 2, -3], np.int8), size=(B, N))
        ind = np.ones(N, bool)
        maskf = np.ones((N, 2), bool)
        ref = {k: np.asarray(v)
               for k, v in geno_ops.snp_stats_block(G, ind, maskf).items()}

        class _PD:
            masked_indivs = maskf

        class _Eng:
            pd = _PD()
            gd = type("GD", (), {"sex": None})()
            params = type("P", (), {"test_mode": True})()
            import jax.numpy as jnp
            ind_j = jnp.asarray(ind)

        from regenie_tpu.run_step2 import Step2Engine

        # prove the packed 2-bit ship branch actually runs for eligible
        # hardcall blocks (incl. -3 missing — regression for the
        # config.MISSING/-3 eligibility bug): spy on the packed kernel
        calls = []
        orig = geno_ops.snp_stats_block_packed

        def spy(*a, **kw):
            calls.append(1)
            return orig(*a, **kw)

        import regenie_tpu.ops.geno_ops as gmod

        gmod.snp_stats_block_packed, saved = spy, orig
        try:
            out = Step2Engine.block_stats(_Eng(), G.astype(np.float64))
        finally:
            gmod.snp_stats_block_packed = saved
        assert calls, "packed 2-bit branch was not exercised"
        for k in ref:
            assert out[k].shape[0] == B
            assert np.allclose(out[k], ref[k], rtol=0, atol=0), (B, k)
