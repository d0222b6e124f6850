"""Pallas decode kernel (interpret mode) and multi-device sharding
equality on the virtual CPU mesh."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp


def test_pallas_plane_decode_matches_xla():
    from regenie_tpu.ops.geno_ops import decode_bed_packed
    from regenie_tpu.ops.pallas_ops import decode_bed_planes, plane_aux_order

    rng = np.random.default_rng(0)
    B, N = 64, 997  # non-multiple of 4
    nb = (N + 3) // 4
    raw = rng.integers(0, 256, size=(B, nb), dtype=np.uint8)
    ref = np.asarray(decode_bed_packed(jnp.asarray(raw), N)).astype(np.float32)
    planes = np.asarray(decode_bed_planes(jnp.asarray(raw), interpret=True))
    s = np.arange(N)
    back = planes[:, (s % 4) * nb + s // 4]
    np.testing.assert_array_equal(back, ref)

    # permuted auxiliary arrays give identical sample reductions
    idx, valid = plane_aux_order(N, nb)
    aux = rng.normal(size=N).astype(np.float32)
    aux_p = np.where(valid, aux[idx], 0.0)
    lhs = np.where(ref == -3, 0, ref) @ aux
    rhs = np.where(planes == -3, 0, planes) @ aux_p
    np.testing.assert_allclose(lhs, rhs, rtol=2e-5)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_sharded_score_matches_single_device():
    from regenie_tpu.parallel.mesh import (
        make_mesh, replicate, shard_array, sharded_gram, sharded_score_qt,
    )

    rng = np.random.default_rng(1)
    B, N, P, K = 64, 512, 3, 4
    G = rng.normal(size=(B, N))
    res = rng.normal(size=(N, P))
    maskf = np.ones((N, P))
    cov = np.linalg.qr(rng.normal(size=(N, K)))[0]

    mesh = make_mesh(8)
    stats, denum, sf = sharded_score_qt(
        mesh, shard_array(mesh, G, 0), replicate(mesh, res),
        replicate(mesh, maskf), replicate(mesh, cov), float(N - K),
    )
    # single-device reference
    beta = G @ cov
    Gr = G - beta @ cov.T
    sf0 = np.linalg.norm(Gr, axis=1) / np.sqrt(N - K)
    Gr = Gr / sf0[:, None]
    stats0 = (Gr @ res) / np.sqrt((Gr**2) @ maskf)
    np.testing.assert_allclose(np.asarray(stats), stats0, rtol=1e-8)
    np.testing.assert_allclose(np.asarray(sf), sf0, rtol=1e-8)

    # sample-sharded Gram: psum partial sums == full matmuls
    GGt, GTY = sharded_gram(
        mesh, shard_array(mesh, G, 1), shard_array(mesh, res, 0)
    )
    np.testing.assert_allclose(np.asarray(GGt), G @ G.T, rtol=1e-8)
    np.testing.assert_allclose(np.asarray(GTY), G @ res, rtol=1e-8)
