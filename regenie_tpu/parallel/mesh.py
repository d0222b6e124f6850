"""Device-mesh sharding for multi-chip execution.

Replaces the reference's file-based multi-node protocols (split-L0
master files, Data.cpp:244-309; manual per-chromosome step-2 sharding,
docs/recommendations.md:128) with jax.sharding collectives:

- Step 1: shard the SAMPLE axis. Per-block Gram matrices G G' and G'Y
  are computed as partial sums on each chip's sample shard and reduced
  with psum over ICI — the B x B eigen-solve then runs replicated.
- Step 2: shard the VARIANT axis. Each chip scores its SNP shard
  against the replicated residuals: embarrassingly parallel, outputs
  concatenated in order.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..utils.dtypes import MATMUL_PRECISION as _PREC


def make_mesh(n_devices: int | None = None, axis: str = "shard") -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    # locality order (slice, process, id): neighbouring shard indices are
    # ICI-neighbours, so the ppermute/psum ring crosses DCN the minimum
    # number of times (SURVEY §5.8)
    devs = sorted(devs, key=_locality_key)
    return Mesh(np.array(devs), (axis,))


def sharded_gram(mesh: Mesh, G, Y):
    """Sample-sharded Gram matrices for step-1 level 0.

    G: [B, N] (sharded over N), Y: [N, P] (sharded over N).
    Returns (GGt [B, B], GTY [B, P]) replicated — partial sums reduced
    over the mesh's ICI links (the TPU-native replacement for the
    reference's calc_cv_matrices, Data.cpp:729).
    """
    axis = mesh.axis_names[0]

    @partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P(None, axis), P(axis, None)),
        out_specs=(P(None, None), P(None, None)),
    )
    def _gram(G_loc, Y_loc):
        GGt = jax.lax.psum(
            jnp.matmul(G_loc, G_loc.T, precision=_PREC), axis
        )
        GTY = jax.lax.psum(jnp.matmul(G_loc, Y_loc, precision=_PREC), axis)
        return GGt, GTY

    return _gram(G, Y)


def sharded_score_qt(mesh: Mesh, G, res, maskf, cov, scale_denom):
    """Variant-sharded step-2 QT score test.

    G: [B, N] sharded over B (variants); res/maskf/cov replicated.
    Each device residualizes and scores its SNP shard locally —
    no collectives needed (reference analog: per-machine chromosome
    jobs, docs/recommendations.md:128).
    Returns (stats [B, P], denum [B, P], scale_fac [B]).
    """
    axis = mesh.axis_names[0]

    @partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P(axis, None), P(None, None), P(None, None), P(None, None)),
        out_specs=(P(axis, None), P(axis, None), P(axis)),
    )
    def _score(G_loc, res_loc, maskf_loc, cov_loc):
        beta = jnp.matmul(G_loc, cov_loc, precision=_PREC)
        Gr = G_loc - jnp.matmul(beta, cov_loc.T, precision=_PREC)
        scale_fac = jnp.linalg.norm(Gr, axis=1) / jnp.sqrt(scale_denom)
        Gr = Gr / jnp.where(scale_fac < 1e-12, 1.0, scale_fac)[:, None]
        num = jnp.matmul(Gr, res_loc, precision=_PREC)
        denum = jnp.matmul(Gr**2, maskf_loc, precision=_PREC)
        stats = num / jnp.sqrt(denum)
        return stats, denum, scale_fac

    return _score(G, res, maskf, cov)


def sharded_score_bt(mesh: Mesh, G, Wcat, xwt, gsm2, Pn: int, Kp1: int):
    """Variant-sharded all-trait BT score products — the mesh twin of
    the single-device _allpass kernel (step2_bt._score_bt_kernel_factory;
    compute_score_bt, Step2_Models.cpp:470-520).

    G: [B, N] sharded over B (variants); Wcat [N, Pn*Kp1] / xwt
    [Pn, Kp1-1] / gsm2 [N, Pn] replicated. Each device scores its SNP
    shard locally — no collectives. Returns (num [B, Pn],
    denum [B, Pn], S1 [B, Pn, Kp1]) sharded over B."""
    axis = mesh.axis_names[0]

    @partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P(axis, None), P(None, None), P(None, None), P(None, None)),
        out_specs=(P(axis, None), P(axis, None), P(axis, None, None)),
    )
    def _score(G_loc, Wcat_loc, xwt_loc, gsm2_loc):
        S1 = jnp.matmul(G_loc, Wcat_loc, precision=_PREC).reshape(
            G_loc.shape[0], Pn, Kp1)
        A = S1[..., :-1]
        q = S1[..., -1]
        num = q - jnp.einsum("bpk,pk->bp", A, xwt_loc, precision=_PREC)
        g2w = jnp.matmul(G_loc**2, gsm2_loc, precision=_PREC)
        denum = g2w - (A**2).sum(-1)
        return num, denum, S1

    return _score(G, Wcat, xwt, gsm2)


def sharded_score_t2e(mesh: Mesh, G, WX1, Xinv_t, resmask):
    """Variant-sharded Cox score products (compute_score_cox,
    Step2_Models.cpp:632): per shard Gres = G - (G WX1) Xinv',
    T = Gres (res*mask), denum_raw = ||Gres||^2 row sums. Operands
    replicated, no collectives. Returns (T [B], denum_raw [B])."""
    axis = mesh.axis_names[0]

    @partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P(axis, None), P(None, None), P(None, None), P(None, None)),
        out_specs=(P(axis), P(axis)),
    )
    def _score(G_loc, WX1_loc, Xinv_loc, rm_loc):
        GW = jnp.matmul(G_loc, WX1_loc, precision=_PREC)
        Gres = G_loc - jnp.matmul(GW, Xinv_loc, precision=_PREC)
        T = jnp.matmul(Gres, rm_loc, precision=_PREC)[:, 0]
        d = (Gres**2).sum(axis=1)
        return T, d

    return _score(G, WX1, Xinv_t, resmask)


def maybe_mesh() -> Mesh | None:
    """Mesh for the current process, or None in single-chip mode.

    Auto-enabled on multi-chip TPU backends; on CPU (e.g. an
    --xla_force_host_platform_device_count test mesh) it must be forced
    with REGENIE_TPU_MESH=1 so ordinary single-host runs stay fast."""
    import os

    n = jax.device_count()
    if n <= 1:
        return None
    if jax.default_backend() == "cpu" and not os.environ.get("REGENIE_TPU_MESH"):
        return None
    return make_mesh(n)


def place_rows_padded(x, axis: int = 0):
    """Place an array on the active mesh sharded along `axis`, zero-
    padding that axis to the mesh size first. Downstream jitted products
    are auto-partitioned by GSPMD — XLA splits the [N, F] matmuls across
    chips and inserts all-reduces for the N-reductions (the level-1
    analog of the explicit shard_map level-0 kernels; replaces the
    reference's --l1-phenoList trait-split of the level-1 solve,
    Regenie.hpp:239). Returns (array, padded_len) — plain device
    placement single-chip. Zero rows are exact for the level-1 products
    (they contribute nothing to Grams, cross-products or moments)."""
    mesh = maybe_mesh()
    if mesh is None:
        xj = jnp.asarray(x)
        return xj, x.shape[axis]
    ndev = len(mesh.devices.flat)
    xp, _ = pad_to(np.asarray(x), ndev, axis)
    return shard_array(mesh, jnp.asarray(xp), axis), xp.shape[axis]


def pad_to(x: np.ndarray, mult: int, axis: int):
    """Zero-pad an axis up to a multiple of the mesh size."""
    n = x.shape[axis]
    rem = (-n) % mult
    if rem == 0:
        return x, n
    pad = [(0, 0)] * x.ndim
    pad[axis] = (0, rem)
    return jnp.pad(x, pad) if isinstance(x, jax.Array) else np.pad(x, pad), n


def sharded_level0_loocv(mesh: Mesh, G, Y, maskf, lambdas, Neff):
    """Sample-sharded step-1 level-0 LOOCV ridge (the multi-chip form of
    level0_loocv_block, models/step1.py): per-shard Gram partial sums
    reduced with psum over ICI, replicated B x B eigendecomposition,
    per-shard LOO predictions, and psum'd center/scale moments.

    G: [B, N] sharded over N; Y/maskf: [N, P] sharded over N (rows past
    the true N zero-padded with maskf=0); lambdas [J], Neff [P]
    replicated. Returns W: [N, J, P] sharded over N.
    """
    axis = mesh.axis_names[0]

    @partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P(None, axis), P(axis, None), P(axis, None), P(None), P(None)),
        out_specs=P(axis, None, None),
    )
    def _l0(G_loc, Y_loc, m_loc, lam, neff):
        GGt = jax.lax.psum(jnp.matmul(G_loc, G_loc.T, precision=_PREC), axis)
        GTY = jax.lax.psum(jnp.matmul(G_loc, Y_loc, precision=_PREC), axis)
        d, V = jnp.linalg.eigh(GGt)
        Wmat = jnp.matmul(V.T, GTY, precision=_PREC)
        DL_inv = 1.0 / (d[:, None] + lam[None, :])  # [B,J]
        VtG = jnp.matmul(V.T, G_loc, precision=_PREC)  # [B,n_loc]
        gvec = jnp.matmul((VtG**2).T, DL_inv, precision=_PREC)  # [n_loc,J]
        z2t = jnp.einsum("bn,bj,bp->njp", VtG, DL_inv, Wmat, precision=_PREC)
        pred = (z2t - gvec[:, :, None] * Y_loc[:, None, :]) / (1.0 - gvec)[:, :, None]
        pred = pred * m_loc[:, None, :]
        p_mean = jax.lax.psum(pred.sum(axis=0), axis) / neff[None, :]  # [J,P]
        pred = (pred - p_mean[None]) * m_loc[:, None, :]
        s2 = jax.lax.psum((pred**2).sum(axis=0), axis)
        p_sd = jnp.sqrt(s2 / (neff[None, :] - 1.0))
        return pred / p_sd[None]

    return _l0(G, Y, maskf, lambdas, Neff)


def sharded_level0_loocv_full(mesh: Mesh, G8, ind, cov, Y, maskf, lambdas,
                              Neff, scale_denom):
    """Per-host-decode form of the step-1 level-0 LOOCV pipeline: the
    int8 genotype block arrives ALREADY SHARDED on the (file) sample
    axis — each process decoded only its own byte window — and the
    whole prepare -> residualize -> LOOCV chain runs inside one
    shard_map, with every cross-sample reduction (imputation means,
    covariate projections, scale norms, Grams, prediction moments) a
    psum over the mesh (VERDICT r2 #3; the runtime analog of the
    reference's per-job snplists, Data.cpp:244-309, on the SAMPLE axis).

    G8: [B, Np] int8 sharded over Np (file axis; -3 = missing; dropped
    samples carry ind=0); ind [Np] f; cov [Np, K] orthonormal basis
    rows (zero at dropped/pad); Y/maskf [Np, P] (zero rows at
    dropped/pad); scale_denom = n_analyzed - ncov.
    Returns (W [Np, J, P] sharded, scale_G [B] replicated)."""
    axis = mesh.axis_names[0]
    compute_dtype = (jnp.float64 if jax.config.jax_enable_x64
                     else jnp.float32)

    @partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P(None, axis), P(axis), P(axis, None), P(axis, None),
                  P(axis, None), P(None), P(None)),
        out_specs=(P(axis, None, None), P(None)),
    )
    def _run(G8_loc, ind_loc, cov_loc, Y_loc, m_loc, lam, neff):
        # prepare (geno_ops.prepare_block_step1, psum'd moments)
        G = G8_loc.astype(compute_dtype)
        indf = ind_loc.astype(compute_dtype)[None, :]
        is_missing = G8_loc == -3
        validm = (~is_missing) & (ind_loc > 0)[None, :]
        total = jax.lax.psum(jnp.where(validm, G, 0.0).sum(axis=1), axis)
        ns = jax.lax.psum(
            validm.sum(axis=1).astype(compute_dtype), axis)
        mean = total / ns
        G = jnp.where(is_missing, mean[:, None], G) * indf
        # residualize (models/step1.residualize_geno_block, psum'd)
        beta = jax.lax.psum(jnp.matmul(G, cov_loc, precision=_PREC), axis)
        G = G - jnp.matmul(beta, cov_loc.T, precision=_PREC)
        nrm2 = jax.lax.psum((G**2).sum(axis=1), axis)
        scale_G = jnp.sqrt(nrm2) / jnp.sqrt(
            jnp.asarray(scale_denom, compute_dtype))
        G = G / scale_G[:, None]
        # LOOCV level 0 (sharded_level0_loocv body)
        GGt = jax.lax.psum(jnp.matmul(G, G.T, precision=_PREC), axis)
        GTY = jax.lax.psum(jnp.matmul(G, Y_loc, precision=_PREC), axis)
        d, V = jnp.linalg.eigh(GGt)
        Wmat = jnp.matmul(V.T, GTY, precision=_PREC)
        DL_inv = 1.0 / (d[:, None] + lam[None, :])
        VtG = jnp.matmul(V.T, G, precision=_PREC)
        gvec = jnp.matmul((VtG**2).T, DL_inv, precision=_PREC)
        z2t = jnp.einsum("bn,bj,bp->njp", VtG, DL_inv, Wmat, precision=_PREC)
        pred = (z2t - gvec[:, :, None] * Y_loc[:, None, :]) / (1.0 - gvec)[:, :, None]
        pred = pred * m_loc[:, None, :]
        p_mean = jax.lax.psum(pred.sum(axis=0), axis) / neff[None, :]
        pred = (pred - p_mean[None]) * m_loc[:, None, :]
        s2 = jax.lax.psum((pred**2).sum(axis=0), axis)
        p_sd = jnp.sqrt(s2 / (neff[None, :] - 1.0))
        return pred / p_sd[None], scale_G

    return _run(G8, ind, cov, Y, maskf, lambdas, Neff)


def sharded_level0_kfold(mesh: Mesh, G_folds, Y_folds, mask_folds, valid,
                         lambdas, Neff):
    """Sample-sharded step-1 level-0 K-fold ridge (the multi-chip form of
    level0_kfold_block, models/step1.py; reference ridge_level_0,
    Step1_Models.cpp:458-560): per-shard fold Gram partial sums reduced
    with psum over ICI, replicated [K, B, B] leave-fold-out
    eigendecompositions, per-shard out-of-fold predictions, and psum'd
    center/scale moments.

    G_folds: [K, B, nmax] sharded over nmax; Y_folds/mask_folds:
    [K, nmax, P] sharded over nmax; valid: [K, nmax] sharded over nmax
    (pad slots 0); lambdas [J], Neff [P] replicated.
    Returns W: [K, nmax, J, P] sharded over nmax.
    """
    axis = mesh.axis_names[0]

    @partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P(None, None, axis), P(None, axis, None),
                  P(None, axis, None), P(None, axis), P(None), P(None)),
        out_specs=P(None, axis, None, None),
    )
    def _l0(Gf, Yf, mf, vf, lam, neff):
        Gf = Gf * vf[:, None, :]
        GGt_f = jax.lax.psum(
            jnp.einsum("kbn,kcn->kbc", Gf, Gf, precision=_PREC), axis)
        GtY_f = jax.lax.psum(
            jnp.einsum("kbn,knp->kbp", Gf, Yf, precision=_PREC), axis)
        GGt = GGt_f.sum(axis=0)
        GTY = GtY_f.sum(axis=0)
        ww1 = GGt[None] - GGt_f  # [K,B,B] leave-fold-out Grams
        d, V = jnp.linalg.eigh(ww1)
        ww2 = jnp.einsum("kbc,kbp->kcp", V, GTY[None] - GtY_f,
                         precision=_PREC)
        inv = 1.0 / (d[:, None, :] + lam[None, :, None])  # [K,J,B]
        beta = jnp.einsum("kbc,kjc,kcp->kjbp", V, inv, ww2, precision=_PREC)
        pred = jnp.einsum("kjbp,kbn->knjp", beta, Gf, precision=_PREC)
        pred = pred * mf[:, :, None, :]
        p_sum = jax.lax.psum(pred.sum(axis=(0, 1)), axis)  # [J,P]
        p_sum2 = jax.lax.psum((pred**2).sum(axis=(0, 1)), axis)
        p_mean = p_sum / neff[None, :]
        p_invsd = jnp.sqrt(
            (neff[None, :] - 1.0) / (p_sum2 - neff[None, :] * p_mean**2))
        return (pred - p_mean[None, None]) * p_invsd[None, None]

    return _l0(G_folds, Y_folds, mask_folds, valid, lambdas, Neff)


def _put(x, sharding: NamedSharding):
    """device_put within one process; per-process shard assembly when
    the mesh spans multiple hosts (each host holds the SAME full host
    value and contributes the slices its local devices own — the data
    plane of the multi-host runtime, parallel/dist.py)."""
    if sharding.is_fully_addressable:
        return jax.device_put(x, sharding)
    xj = np.asarray(x)
    return jax.make_array_from_callback(xj.shape, sharding,
                                        lambda idx: xj[idx])


def shard_array(mesh: Mesh, x, axis_index: int):
    """Place a host array on the mesh sharded along one axis."""
    axis = mesh.axis_names[0]
    spec = [None] * x.ndim
    spec[axis_index] = axis
    return _put(x, NamedSharding(mesh, P(*spec)))


def replicate(mesh: Mesh, x):
    return _put(x, NamedSharding(mesh, P(*([None] * np.ndim(x)))))


def to_host(x) -> np.ndarray:
    """np.asarray for possibly non-fully-addressable global arrays:
    multi-host outputs are all-gathered to replicated on device (the
    host-0-ordered merge of the reference's per-machine output files)
    and read from the local copy; plain np.asarray otherwise."""
    if not hasattr(x, "is_fully_addressable") or x.is_fully_addressable:
        return np.asarray(x)
    sharding = NamedSharding(x.sharding.mesh,
                             P(*([None] * x.ndim)))
    y = jax.jit(lambda a: a, out_shardings=sharding)(x)
    return np.asarray(y.addressable_data(0))


# ---------------------------------------------------------------------------
# 2-D mesh: variant(-block) axis x sample axis.
#
# The 1-D forms above shard ONE long dimension; at pod scale both
# dimensions are long (N ~ 500K samples, thousands of step-1 blocks /
# millions of step-2 variants). The 2-D mesh tiles the device grid so
# each device holds a [B_tile, N_tile] patch: sample-axis reductions ride
# psum over the "smp" rows while independent variant work spreads over
# the "var" columns — the TPU analog of running the reference's
# split-l0 jobs AND its per-machine chromosome shards at once.
# ---------------------------------------------------------------------------

VAR_AXIS = "var"
SMP_AXIS = "smp"


def mesh_2d_shape(n_devices: int) -> Tuple[int, int]:
    """(n_var, n_smp) grid: the most-square factorization, biasing extra
    devices to the sample axis (Gram psums ride the faster links)."""
    a = int(np.sqrt(n_devices))
    while n_devices % a:
        a -= 1
    return a, n_devices // a


def _locality_key(d):
    """(slice, process, id) sort key — devices sharing a slice are
    ICI-connected; different slices (or hosts without TPU slices) only
    reach each other over DCN."""
    sl = getattr(d, "slice_index", None)
    if sl is None:
        sl = getattr(d, "process_index", 0)
    return (sl, getattr(d, "process_index", 0), d.id)


def arrange_devices_2d(devs, nv: int, ns: int):
    """ICI/DCN-aware [nv, ns] device grid (SURVEY §5.8: collectives ride
    ICI intra-slice, DCN inter-slice).

    The "smp" axis (the fused scorer's psum axis, mesh.py 2-D kernels)
    carries every Gram/score partial-sum reduction, while "var" rows
    never communicate — so each var-row must be a set of ns
    ICI-neighbours, and slice/host boundaries should fall BETWEEN rows.
    Sorting by (slice, process, id) and filling row-major does exactly
    that whenever ns divides the slice size: consecutive same-slice
    devices fill one smp row, and successive var rows walk across
    slices/hosts. Pure function of the device list — unit-testable
    without hardware."""
    order = sorted(devs, key=_locality_key)
    grid = np.empty((nv, ns), dtype=object)
    grid.ravel()[:] = order
    return grid


def make_mesh_2d(n_devices: int | None = None) -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    nv, ns = mesh_2d_shape(len(devs))
    n_slices = len({_locality_key(d)[0] for d in devs})
    if n_slices == 1 and jax.default_backend() == "tpu":
        # single slice: every pairing is ICI — let mesh_utils map the
        # grid onto the physical torus (minimises psum hop count).
        try:
            from jax.experimental import mesh_utils

            grid = mesh_utils.create_device_mesh(
                (nv, ns), devices=np.array(devs))
            return Mesh(grid, (VAR_AXIS, SMP_AXIS))
        except Exception:
            pass
    return Mesh(arrange_devices_2d(devs, nv, ns), (VAR_AXIS, SMP_AXIS))


def shard_array_2d(mesh: Mesh, x, spec_axes):
    """Place x on a 2-D mesh. spec_axes: tuple of mesh-axis names (or
    None) per array dim, e.g. (VAR_AXIS, SMP_AXIS) for a [B, N] block.
    Multi-host meshes assemble per-process (every host holds the full
    host value and contributes its local devices' slices)."""
    return _put(x, NamedSharding(mesh, P(*spec_axes)))


def process_grid_rect(mesh: Mesh, pid: int):
    """((r0, nr), (c0, nc)): the rectangle of 2-D grid cells whose
    devices live on process `pid`, or None when that process's devices
    do not tile a contiguous rectangle. Deterministic from the mesh
    alone, so every process computes the same answer for every pid —
    the gate for per-host 2-D slab decode (each host reads only its own
    (variant-rows x byte-columns) window of a packed block)."""
    grid = mesh.devices
    pos = np.argwhere(np.array(
        [[getattr(d, "process_index", 0) == pid for d in row]
         for row in grid]))
    if pos.size == 0:
        return None
    r0, c0 = pos.min(axis=0)
    r1, c1 = pos.max(axis=0)
    nr, nc = int(r1 - r0 + 1), int(c1 - c0 + 1)
    if len(pos) != nr * nc:
        return None
    return (int(r0), nr), (int(c0), nc)


def all_process_rects(mesh: Mesh, nproc: int):
    """Per-process grid rectangles, or None if any process is ragged
    (same value on every process — safe to branch on)."""
    rects = [process_grid_rect(mesh, p) for p in range(nproc)]
    return rects if all(r is not None for r in rects) else None


def sharded_level0_blocks_2d(mesh: Mesh, G3, Y, maskf, lambdas, Neff):
    """Step-1 level-0 LOOCV over SEVERAL blocks at once on a 2-D mesh.

    G3: [Bk, B, N] (Bk blocks sharded over "var", N sharded over "smp");
    Y/maskf: [N, P] sharded over "smp"; lambdas [J], Neff [P]
    replicated. Returns W: [Bk, N, J, P] sharded (var, smp).

    Each mesh row psums its blocks' Gram matrices over the sample axis
    only ("smp"), runs the B x B eigendecompositions locally, and emits
    its sample shard of the LOO predictions — different blocks never
    synchronize (reference analog: independent --run-l0 jobs,
    Data.cpp:244-309, without the shared filesystem)."""

    @partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(
            P(VAR_AXIS, None, SMP_AXIS),
            P(SMP_AXIS, None),
            P(SMP_AXIS, None),
            P(None),
            P(None),
        ),
        out_specs=P(VAR_AXIS, SMP_AXIS, None, None),
    )
    def _l0(G_loc, Y_loc, m_loc, lam, neff):
        def one_block(Gb):
            GGt = jax.lax.psum(jnp.matmul(Gb, Gb.T, precision=_PREC), SMP_AXIS)
            GTY = jax.lax.psum(jnp.matmul(Gb, Y_loc, precision=_PREC), SMP_AXIS)
            d, V = jnp.linalg.eigh(GGt)
            Wmat = jnp.matmul(V.T, GTY, precision=_PREC)
            DL_inv = 1.0 / (d[:, None] + lam[None, :])
            VtG = jnp.matmul(V.T, Gb, precision=_PREC)
            gvec = jnp.matmul((VtG**2).T, DL_inv, precision=_PREC)
            z2t = jnp.einsum("bn,bj,bp->njp", VtG, DL_inv, Wmat, precision=_PREC)
            pred = (z2t - gvec[:, :, None] * Y_loc[:, None, :]) / (1.0 - gvec)[:, :, None]
            pred = pred * m_loc[:, None, :]
            p_mean = jax.lax.psum(pred.sum(axis=0), SMP_AXIS) / neff[None, :]
            pred = (pred - p_mean[None]) * m_loc[:, None, :]
            s2 = jax.lax.psum((pred**2).sum(axis=0), SMP_AXIS)
            p_sd = jnp.sqrt(s2 / (neff[None, :] - 1.0))
            return pred / p_sd[None]

        return jax.vmap(one_block)(G_loc)

    return _l0(G3, Y, maskf, lambdas, Neff)


def sharded_score_qt_2d(mesh: Mesh, G, res, maskf, cov, scale_denom):
    """Step-2 QT score test with BOTH axes sharded.

    G: [B, N] sharded (var, smp); res/maskf/cov: [N, *] sharded over
    "smp". Per-device partial matmuls over its sample shard are psum'd
    over "smp"; variants stay independent across "var". Returns
    (stats [B, P], denum [B, P], scale_fac [B]) sharded over "var"."""

    @partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(
            P(VAR_AXIS, SMP_AXIS),
            P(SMP_AXIS, None),
            P(SMP_AXIS, None),
            P(SMP_AXIS, None),
        ),
        out_specs=(P(VAR_AXIS, None), P(VAR_AXIS, None), P(VAR_AXIS)),
    )
    def _score(G_loc, res_loc, maskf_loc, cov_loc):
        beta = jax.lax.psum(jnp.matmul(G_loc, cov_loc, precision=_PREC), SMP_AXIS)
        Gr = G_loc - jnp.matmul(beta, cov_loc.T, precision=_PREC)
        nrm2 = jax.lax.psum((Gr**2).sum(axis=1), SMP_AXIS)
        scale_fac = jnp.sqrt(nrm2 / scale_denom)
        Gr = Gr / jnp.where(scale_fac < 1e-12, 1.0, scale_fac)[:, None]
        num = jax.lax.psum(jnp.matmul(Gr, res_loc, precision=_PREC), SMP_AXIS)
        denum = jax.lax.psum(jnp.matmul(Gr**2, maskf_loc, precision=_PREC), SMP_AXIS)
        stats = num / jnp.sqrt(denum)
        return stats, denum, scale_fac

    return _score(G, res, maskf, cov)
