"""Batched gene-set VC score products (the gene-based device engine).

The reference computes each gene's weighted-genotype score products with
per-gene Eigen matmuls inside an OpenMP loop (update_vc_gmat SKAT.cpp:70,
compute_vc_mats_qt SKAT.cpp:643, driven per set from Data.cpp:2629-2807).
Here the per-set [N, M] weighted matrices of a BUCKET of sets ship to the
device as 2-bit BED codes (16x less host->device traffic than dense f64)
plus a handful of dense ultra-rare collapse columns, and ONE jitted
lax.scan over sample chunks decodes / imputes / weights them on-chip and
accumulates the three products every VC test needs:

    GtG[s] = GW_s^T GW_s      [Mt, Mt]   (kernel)
    GtX[s] = GW_s^T X         [Mt, K]    (covariate projection)
    GtY[s] = GW_s^T Yres      [Mt, P]    (score numerators)

Batching is composition-invariant by construction: each set occupies its
own padded slot (pad columns carry weight 0), the scan chunk size is a
fixed constant, and slots never interact — so a bucket of 1 and a bucket
of 64 produce bitwise-identical per-set products. That is what lets the
bucketed gene-based loop, the single-set CLI path, and the multi-host
round-robin shards all emit byte-identical output.
"""

from __future__ import annotations

from typing import Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from ..utils.dtypes import MATMUL_PRECISION as _PREC

# Samples per scan step. FIXED: the accumulation order over chunks is
# part of the numeric contract (bucket-composition invariance).
CHUNK_SAMPLES = 8192
_CB = CHUNK_SAMPLES // 4  # packed bytes per chunk


def _dt():
    return jnp.float64 if jax.config.jax_enable_x64 else jnp.float32


@jax.jit
def _vc_kernel(codes_c, ur_c, flip, imp, w, ind_c, X_c, Y_c):
    """One bucket's products via a sample-chunk scan.

    codes_c: [nch, S, Mm, CB] uint8 packed 2-bit BED codes
    ur_c:    [nch, S, U, NC] dense ultra-rare collapse columns (weighted)
    flip:    [S, Mm] bool   (af1 > 0.5 -> 2 - g)
    imp:     [S, Mm]        (missing -> 2*maf, post-flip)
    w:       [S, Mm]        (Beta(a1,a2) / user weights; 0 marks padding)
    ind_c:   [nch, NC]      (ind_in_analysis, 0 on sample padding)
    X_c:     [nch, NC, K]; Y_c: [nch, NC, P]
    Returns GtG [S, Mt, Mt], GtX [S, Mt, K], GtY [S, Mt, P], Mt = Mm + U.
    """
    dt = X_c.dtype
    nch, S, Mm, CB = codes_c.shape
    U = ur_c.shape[2]
    K = X_c.shape[2]
    P = Y_c.shape[2]
    Mt = Mm + U
    shifts = jnp.arange(4, dtype=jnp.uint8) * 2

    def body(carry, xs):
        gtg, gtx, gty = carry
        cb, urc, indc, Xc, Yc = xs
        # 2-bit decode (ref-last BED codes: 0->hom-alt 2, 1->missing,
        # 2->het 1, 3->hom-ref 0), matching ops.geno_ops.decode_bed_packed
        c = (cb[..., None] >> shifts) & jnp.uint8(3)  # [S, Mm, CB, 4]
        c = c.reshape(S, Mm, CB * 4)
        g = 2.0 * (c == 0).astype(dt) + (c == 2).astype(dt)
        base = jnp.where(flip[..., None], 2.0 - g, g)
        # identical elementwise chain (and multiply order) to the host
        # dense path in models.skat.vc_prep: flip -> impute -> *ind -> *w
        val = jnp.where(c == 1, imp[..., None], base)
        val = val * indc[None, None, :]
        val = val * w[..., None]
        full = jnp.concatenate([val, urc], axis=1)  # [S, Mt, NC]
        gtg = gtg + jnp.einsum("smn,spn->smp", full, full, precision=_PREC)
        gtx = gtx + jnp.einsum("smn,nk->smk", full, Xc, precision=_PREC)
        gty = gty + jnp.einsum("smn,np->smp", full, Yc, precision=_PREC)
        return (gtg, gtx, gty), None

    init = (
        jnp.zeros((S, Mt, Mt), dt),
        jnp.zeros((S, Mt, K), dt),
        jnp.zeros((S, Mt, P), dt),
    )
    (gtg, gtx, gty), _ = lax.scan(body, init, (codes_c, ur_c, ind_c, X_c, Y_c))
    # ONE packed output [S, Mt, Mt+K+P]: the three products fetch in a
    # single device->host transfer (3 np.asarray = 3 WAN RTTs otherwise)
    return jnp.concatenate([gtg, gtx, gty], axis=2)


class VCDeviceCache:
    """Per-run device-resident operands for the VC kernel: the sample-
    chunked covariate basis / analysis mask (fixed) and the residual
    matrix (per LOCO chromosome). Built once, reused for every bucket."""

    def __init__(self, X: np.ndarray, ind: np.ndarray):
        dt = _dt()
        N, K = X.shape
        self.N = N
        self.nch = max(1, -(-N // CHUNK_SAMPLES))
        self.Np = self.nch * CHUNK_SAMPLES
        padN = self.Np - N
        Xp = np.pad(X, ((0, padN), (0, 0))).astype(dt)
        indp = np.pad(ind.astype(np.float64), (0, padN)).astype(dt)
        self.X_c = jnp.asarray(Xp.reshape(self.nch, CHUNK_SAMPLES, K))
        self.ind_c = jnp.asarray(indp.reshape(self.nch, CHUNK_SAMPLES))
        self.chrom = None
        self.Y_c = None
        self.ytX = None  # host f64 [P, K]

    def set_residuals(self, chrom, yres: np.ndarray, X: np.ndarray):
        if self.chrom == chrom:
            return
        dt = _dt()
        padN = self.Np - self.N
        Yp = np.pad(yres, ((0, padN), (0, 0))).astype(dt)
        self.Y_c = jnp.asarray(Yp.reshape(self.nch, CHUNK_SAMPLES, -1))
        self.ytX = yres.T @ X
        self.chrom = chrom


def _pad_dim(m: int, lo: int = 8) -> int:
    """Per-set deterministic column padding (next power of two, floor
    `lo`) — part of the numeric contract: a set's slot shape must not
    depend on which bucket it lands in."""
    p = lo
    while p < m:
        p *= 2
    return p


def bucket_products(
    cache: VCDeviceCache,
    codes: List[np.ndarray],   # per set [m_i, NB] uint8
    urs: List[np.ndarray],     # per set [N, u_i] f64 (weighted, masked)
    flips: List[np.ndarray],   # per set [m_i] bool
    imps: List[np.ndarray],    # per set [m_i] f64
    ws: List[np.ndarray],      # per set [m_i] f64
) -> List[Tuple[np.ndarray, np.ndarray, np.ndarray]]:
    """Products for one equal-pad bucket of sets (all m_i pad to the same
    Mm, all u_i to the same U — the caller groups by (_pad_dim(m), U)).
    Returns per set (GtG [Mt_i, Mt_i], GtX [Mt_i, K], GtY [Mt_i, P]) with
    padding rows/cols stripped, main columns first then ultra-rare."""
    S = len(codes)
    Mm = _pad_dim(max(c.shape[0] for c in codes))
    U = max((u.shape[1] for u in urs), default=0)
    U = 0 if U == 0 else _pad_dim(U, 1)
    dt = _dt()
    NBp = cache.nch * _CB

    cod = np.zeros((S, Mm, NBp), np.uint8)
    flp = np.zeros((S, Mm), bool)
    imp = np.zeros((S, Mm), np.float64)
    wgt = np.zeros((S, Mm), np.float64)
    urv = np.zeros((S, U, cache.Np), np.float64)
    for s in range(S):
        m = codes[s].shape[0]
        cod[s, :m, : codes[s].shape[1]] = codes[s]
        flp[s, :m] = flips[s]
        imp[s, :m] = imps[s]
        wgt[s, :m] = ws[s]
        u = urs[s].shape[1]
        if u:
            urv[s, :u, : cache.N] = urs[s].T

    codes_c = np.ascontiguousarray(
        cod.reshape(S, Mm, cache.nch, _CB).transpose(2, 0, 1, 3)
    )
    ur_c = np.ascontiguousarray(
        urv.reshape(S, U, cache.nch, CHUNK_SAMPLES).transpose(2, 0, 1, 3)
    ).astype(dt)

    blk = np.asarray(_vc_kernel(
        jnp.asarray(codes_c), jnp.asarray(ur_c), jnp.asarray(flp),
        jnp.asarray(imp.astype(dt)), jnp.asarray(wgt.astype(dt)),
        cache.ind_c, cache.X_c, cache.Y_c,
    ), dtype=np.float64)
    Mt = Mm + U
    K = cache.X_c.shape[2]
    gtg = blk[:, :, :Mt]
    gtx = blk[:, :, Mt : Mt + K]
    gty = blk[:, :, Mt + K :]

    out = []
    for s in range(S):
        m = codes[s].shape[0]
        u = urs[s].shape[1]
        rows = np.concatenate([np.arange(m), Mm + np.arange(u)]).astype(int)
        out.append((
            gtg[s][np.ix_(rows, rows)], gtx[s][rows], gty[s][rows],
        ))
    return out
