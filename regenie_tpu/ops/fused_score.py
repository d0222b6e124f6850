"""Fully fused Step-2 QT scorer: packed 2-bit PLINK bytes -> score stats
in ONE pass over HBM, with the genotype matrix never materialized.

The standard pipeline (decode -> impute -> residualize -> score) writes
and re-reads a [B, N] float32 G three times; at UKB scale the HBM
traffic on G dwarfs the MXU work. This kernel instead streams the raw
packed bytes ([B, N/4] uint8 — 16x smaller than f32 G), decodes each
2-bit plane in VMEM, and accumulates three MXU products against a
combined per-sample operand

    Wext = [cov (K) | res (P) | cov_k*maskf_p (K*nI) | maskf (P) | ind (1)]

(rows of excluded samples zeroed on the host). The CM interaction
columns exist only for the nI traits with missing phenotype values
(`FusedConsts.inc`): a complete trait sees the identity masked Gram, so
its denum collapses to g2m - ||A||^2 and its K columns drop from the
operand — at biobank trait counts (P=50, K~20) this shrinks the
dominant K*P block to K*nI:

    S1[b, :] = sum_n  g0[b, n]      * Wext[n, :]   (missing coded as 0)
    SQ[b, :] = sum_n  g0[b, n]^2    * Wext[n, :]
    SM[b, :] = sum_n  miss[b, n]    * Wext[n, :]

Everything the score test needs is then a tiny [B, C] epilogue:
mean-imputation is the rank-1 update S1 + m_b*SM / SQ + m_b^2*SM
(reference semantics: mean_impute_g, Geno.cpp; imputed slots contribute
m_b to G and m_b^2 to G^2), allele flips G -> 2-G are algebraic in the
same products, and the covariate projection follows the one-pass
algebra of models/step2.score_qt_block_onepass.

Reference behavior covered: parseSnpfromBed decode (Geno.cpp:2414),
mean imputation + minor-allele flip (Geno.cpp:1983-2072),
residualize_geno (Geno.cpp:3242), compute_score_qt
(Step2_Models.cpp:343).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

# tile sizes: TB SNP rows x TC packed bytes (= 4*TC samples) per cell.
# TB large keeps the [4, TC, C] Wext tile re-read count (= B/TB) low;
# VMEM at the defaults (v5e 16MB budget): decoded plane temporaries
# dominate; TC=256 keeps the stack allocation under the limit.
_TB = 1024
_TC = 256


class FusedConsts(NamedTuple):
    """Host-precomputed constants for the fused scorer (one per
    run/chromosome, shapes independent of the SNP block)."""

    Wp: jax.Array  # [4, nbp, C] plane-ordered Wext; with split=True a
    #               bfloat16 [4, nbp, 3*C] (hi|mid|lo splits, see below)
    usum: jax.Array  # [C] column sums of ind-masked Wext (for flips)
    covt_res: jax.Array  # [K, P]
    Mmat: jax.Array  # [P, K, K]
    n_ind: float  # number of included samples
    K: int
    P: int
    scale_denom: float  # n_analyzed - ncov
    split: bool = False  # bf16-split operand layout
    inc: tuple = None  # incomplete-trait indices (None = all P traits
    #                    carry CM interaction columns — legacy layout)
    has_male: bool = False  # chrX male columns appended (see below)

    def n_inc(self) -> int:
        return self.P if self.inc is None else len(self.inc)

    def layout_C(self) -> int:
        """Used columns: [cov K | res P | CM K*n_inc | maskf P | ind
        | male | maskf*male P (chrX only)]. The male tail feeds the
        hemizygous per-variant stats (MAC with 0.5*g males, hemizygous
        genotype counts, compute_mac/Geno.cpp:3077) — the epilogue
        slices its own first K+P+K*nI+P+1 columns, so scoring is
        untouched (males are diploid-coded under default dosage comp)."""
        c = self.K + self.P + self.K * self.n_inc() + self.P + 1
        if self.has_male:
            c += self.P + 1
        return c


class I8Operand(NamedTuple):
    """int8 fixed-point operand for the MXU s8xs8->s32 fused kernel.

    limbs: [..., 4*Cp] int8 — each f32 column quantized as
        w ~= scale * (l0 + l1/128 + l2/128^2 + l3/128^3)
    with a power-of-two per-column `scale` ([Cp] f32), so every value
    carries ~28 fixed-point bits relative to the column max — MORE
    mantissa than f32, and the in-kernel accumulation is EXACT int32
    (no f32 rounding until the single fold at the end). The int8 MXU
    runs at 2x the bf16 rate, so 4 limb column groups beat the 3-group
    bf16 split by ~1.5x end to end (measured on v5e, scripts/
    profile_fused.py).

    Overflow bound: |dot| <= N * 2 * 127 needs N < 8.4M samples for
    int32 — asserted at build time."""

    limbs: jax.Array  # int8, trailing dim 4*Cp: [l0 | l1 | l2 | l3]
    scale: jax.Array  # f32 [Cp] power-of-two column scales


_I8_FOLDW = (1.0, 2.0**-7, 2.0**-14, 2.0**-21)


def _i8_quantize_np(W):
    """Host quantization: f64 [..., Cp] -> (limbs int8 [..., 4*Cp],
    scale f32 [Cp], Wq f64 exact quantized values)."""
    absmax = np.abs(W).reshape(-1, W.shape[-1]).max(axis=0)
    e = np.ceil(np.log2(np.maximum(absmax, 1e-300) / 127.0))
    s = np.exp2(e)
    s[absmax == 0] = 1.0
    q = W / s
    limbs = []
    for _ in range(4):
        l = np.rint(q)
        limbs.append(l.astype(np.int8))
        q = (q - l) * 128.0
    Wq = s * sum(l.astype(np.float64) * w for l, w in zip(limbs, _I8_FOLDW))
    return np.concatenate(limbs, axis=-1), s.astype(np.float32), Wq


def _i8_quantize_jnp(W, s=None):
    """Device-side quantization (per-chromosome residual patches)."""
    if s is None:
        absmax = jnp.abs(W).reshape(-1, W.shape[-1]).max(axis=0)
        e = jnp.ceil(jnp.log2(jnp.maximum(absmax, 1e-30) / 127.0))
        s = jnp.where(absmax == 0, 1.0, jnp.exp2(e)).astype(jnp.float32)
    q = W.astype(jnp.float32) / s
    limbs = []
    for _ in range(4):
        l = jnp.rint(q)
        limbs.append(l.astype(jnp.int8))
        q = (q - l) * 128.0
    return jnp.concatenate(limbs, axis=-1), s


def i8_fold(parts, scale):
    """[..., 4*Cp] int32 limb products -> [..., Cp] f32 values."""
    Cp = parts.shape[-1] // 4
    out = jnp.zeros(parts.shape[:-1] + (Cp,), jnp.float32)
    for k, w in enumerate(_I8_FOLDW):
        out = out + parts[..., k * Cp : (k + 1) * Cp].astype(jnp.float32) * w
    return out * scale


def split_mode(on_tpu, sample_layout=False):
    """Operand encoding for the fused kernels on TPU: int8 limbs ("i8")
    unless REGENIE_TPU_I8=0 (the s8xs8->s32 MXU runs 2x the bf16 rate;
    plane-packed hardcalls accumulate exactly in int32, the BGEN
    sample-packed kernel shifts its byte planes by -128 and corrects
    with operand column sums — see I8Operand / _bgen_kernel_i8); the
    bf16 3-way split (True) is the fallback; full-precision floats
    (False) on CPU."""
    import os

    if not on_tpu:
        return False
    del sample_layout  # i8 covers both layouts since round 3
    return False if os.environ.get("REGENIE_TPU_I8") == "0" else "i8"


def op_nbp(Wp):
    """Contraction length (packed bytes / samples) of a fused operand."""
    return (Wp.limbs if isinstance(Wp, I8Operand) else Wp).shape[-2]


def plane_pack(Wext, nb, split, dtype=np.float32, nbp_tile=None):
    """[N, C] per-sample operand -> plane-ordered kernel operand.

    Returns (Wp, usum): Wp is [4, nbp, Cp] (dtype), the bf16
    [4, nbp, 3*Cp] hi|mid|lo split (split=True), or an I8Operand
    (split="i8"); usum is the padded [Cp] column-sum vector used by the
    flip algebra (for "i8" it sums the QUANTIZED values so the flip
    transform stays exact in the quantized system). Rows must already
    be zeroed for excluded samples. nbp_tile: byte-padding multiple
    (default _TC; a 2-D mesh pads to n_smp*_TC so every sample shard is
    kernel-tile aligned)."""
    N, C = Wext.shape
    Cp = -(-C // 128) * 128  # pad columns to the MXU lane width
    tile = nbp_tile or _TC
    nbp = -(-nb // tile) * tile
    # plane order: plane p, byte c -> file-order sample 4c + p
    Wp = np.zeros((4, nbp, Cp), dtype=np.float64)
    for p in range(4):
        src = 4 * np.arange(nb) + p
        valid = src < N
        Wp[p, np.nonzero(valid)[0], :C] = Wext[src[valid]]
    usum = np.pad(Wext.sum(axis=0), (0, Cp - C))
    if split == "i8":
        assert N < 8_000_000, "int8 fused path: int32 accumulator bound"
        limbs, s, Wq = _i8_quantize_np(Wp)
        usum = Wq.sum(axis=(0, 1))
        return I8Operand(jnp.asarray(limbs), jnp.asarray(s)), usum
    if split:
        # 3-way bf16 decomposition via jnp (numpy has no bfloat16)
        w_j = jnp.asarray(Wp.astype(np.float32))
        hi = w_j.astype(jnp.bfloat16)
        r1 = w_j - hi.astype(jnp.float32)
        mid = r1.astype(jnp.bfloat16)
        lo = (r1 - mid.astype(jnp.float32)).astype(jnp.bfloat16)
        return jnp.concatenate([hi, mid, lo], axis=2), usum
    return jnp.asarray(Wp.astype(dtype)), usum


def plane_order_rows(X, nb, nbp_tile=None):
    """[N, C] -> plane-ordered [4, nbp, C] float64 (the row permutation
    used by plane_pack, without padding columns)."""
    N, C = X.shape
    tile = nbp_tile or _TC
    nbp = -(-nb // tile) * tile
    out = np.zeros((4, nbp, C), dtype=np.float64)
    for p in range(4):
        src = 4 * np.arange(nb) + p
        valid = src < N
        out[p, np.nonzero(valid)[0]] = X[src[valid]]
    return out


def bf16_split3(w_j):
    """f32 device array -> (hi, mid, lo) bf16 split components."""
    hi = w_j.astype(jnp.bfloat16)
    r1 = w_j - hi.astype(jnp.float32)
    mid = r1.astype(jnp.bfloat16)
    lo = (r1 - mid.astype(jnp.float32)).astype(jnp.bfloat16)
    return hi, mid, lo


def patch_res_columns(Wp_dev, res_planes, K, P, Cp, split):
    """Per-chromosome operand update: overwrite the residual columns
    [K:K+P] of a plane-packed Wext (and each bf16 split third) with the
    new LOCO residuals — a device-side slice update instead of
    re-packing and re-uploading the multi-GB operand.

    Wp_dev: [4, nbp, Cp] plane layout or [Np, Cp] sample layout (x3
    columns when split); res_planes: matching leading dims x [P]."""
    if isinstance(Wp_dev, I8Operand):
        # re-quantize the patched columns with their own fresh scales
        r_j = jnp.asarray(res_planes, jnp.float32)
        limbs, s = _i8_quantize_jnp(r_j)
        W = Wp_dev.limbs
        for k in range(4):
            W = W.at[..., k * Cp + K : k * Cp + K + P].set(
                limbs[..., k * P : (k + 1) * P])
        return I8Operand(W, Wp_dev.scale.at[K : K + P].set(s))
    if split:
        r_j = jnp.asarray(res_planes, dtype=jnp.float32)
        hi, mid, lo = bf16_split3(r_j)
        Wp_dev = Wp_dev.at[..., K : K + P].set(hi)
        Wp_dev = Wp_dev.at[..., Cp + K : Cp + K + P].set(mid)
        Wp_dev = Wp_dev.at[..., 2 * Cp + K : 2 * Cp + K + P].set(lo)
        return Wp_dev
    r_j = jnp.asarray(res_planes).astype(Wp_dev.dtype)
    return Wp_dev.at[..., K : K + P].set(r_j)


def build_consts(cov, res, maskf, ind, scale_denom, nb=None, dtype=np.float32,
                 split=False, pack="plane", male=None, nbp_tile=None):
    """Build FusedConsts from per-sample arrays (numpy, float64 in).

    cov: [N, K] orthonormal covariate basis (rows of excluded samples
    arbitrary — zeroed here); res: [N, P] phenotype residuals;
    maskf: [N, P] per-trait inclusion; ind: [N] bool sample inclusion;
    nb: number of packed bytes per SNP (defaults to ceil(N/4)).

    split=True emits Wp as bfloat16 [4, nbp, 3*C] with each f32 value
    decomposed hi+mid+lo (24 mantissa bits): the decoded dosage planes
    are EXACT in bf16 (values 0/1/2/4 and 0/1), so three native bf16
    MXU passes reproduce f32-precision products at ~2x the speed of a
    PRECISION.HIGHEST f32 dot.
    """
    cov = np.asarray(cov, np.float64)
    res = np.asarray(res, np.float64)
    maskf = np.asarray(maskf, np.float64)
    ind = np.asarray(ind)
    N, K = cov.shape
    P = res.shape[1]
    if nb is None:
        nb = (N + 3) // 4
    indf = ind.astype(np.float64)
    covz = cov * indf[:, None]
    resz = res * indf[:, None]
    maskz = maskf * indf[:, None]
    # CM interaction columns exist only for traits with MISSING
    # phenotype values: for a complete trait the masked Gram is the
    # identity (orthonormal cov) and denum collapses to g2m - ||A||^2,
    # so K columns per complete trait drop out of the operand entirely
    # (the dominant width at biobank trait counts)
    inc = tuple(
        int(p) for p in range(P)
        if maskz[:, p].sum() < indf.sum() - 0.5
    )
    CM = (
        covz[:, :, None] * maskz[:, None, list(inc)]
    ).reshape(N, K * len(inc))
    cols = [covz, resz, CM, maskz, indf[:, None]]
    if male is not None:
        # chrX male tail: [male*ind | maskf*male]; its S1/SQ/SM product
        # columns give the male-resolved dosage/square/missing sums the
        # hemizygous stats need (MAC with 0.5*g for males,
        # compute_mac Geno.cpp:3077; male g>=1 counts as hom)
        malez = np.asarray(male, np.float64) * indf
        cols += [malez[:, None], maskz * malez[:, None]]
    Wext = np.concatenate(cols, axis=1)
    if pack == "plane":
        Wp_out, usum = plane_pack(Wext, nb, split, dtype, nbp_tile=nbp_tile)
    else:  # sample-ordered operand (BGEN byte planes)
        Wp_out, usum = sample_pack(Wext, split, dtype)
    Mmat = np.einsum("nk,np,nl->pkl", covz, maskz[:, list(inc)], covz)
    covt_res = covz.T @ resz
    return FusedConsts(
        Wp=Wp_out,
        usum=jnp.asarray(usum.astype(dtype)),
        covt_res=jnp.asarray(covt_res.astype(dtype)),
        Mmat=jnp.asarray(Mmat.astype(dtype)),
        n_ind=float(indf.sum()),
        has_male=male is not None,
        K=K,
        P=P,
        scale_denom=float(scale_denom),
        split=bool(split),
        inc=inc,
    )


def _fused_kernel(raw_ref, wp_ref, s1_ref, sq_ref, sm_ref):
    from jax.experimental import pallas as pl

    @pl.when(pl.program_id(1) == 0)
    def _init():
        s1_ref[:] = jnp.zeros_like(s1_ref)
        sq_ref[:] = jnp.zeros_like(sq_ref)
        sm_ref[:] = jnp.zeros_like(sm_ref)

    r = raw_ref[:].astype(jnp.int32)
    acc1 = jnp.zeros_like(s1_ref)
    accq = jnp.zeros_like(sq_ref)
    accm = jnp.zeros_like(sm_ref)
    for p in range(4):
        codes = (r >> (2 * p)) & 3
        # PLINK bed 2-bit codes: 0->hom alt (2), 1->missing, 2->het (1),
        # 3->hom ref (0)  (buildLookupTable semantics, Geno.cpp:2414)
        g = jnp.where(
            codes == 0, 2.0, jnp.where(codes == 2, 1.0, 0.0)
        ).astype(jnp.float32)
        gq = jnp.where(
            codes == 0, 4.0, jnp.where(codes == 2, 1.0, 0.0)
        ).astype(jnp.float32)
        m = (codes == 1).astype(jnp.float32)
        w = wp_ref[p]
        acc1 += jax.lax.dot(g, w, precision=jax.lax.Precision.HIGHEST)
        accq += jax.lax.dot(gq, w, precision=jax.lax.Precision.HIGHEST)
        accm += jax.lax.dot(m, w, precision=jax.lax.Precision.HIGHEST)
    s1_ref[:] += acc1
    sq_ref[:] += accq
    sm_ref[:] += accm


def _fused_kernel_split(raw_ref, wp_ref, h_ref, e_ref, m_ref):
    """bf16-split variant: wp_ref is [4, tc, 3*C] bfloat16 (hi|mid|lo).

    Two restructurings vs the f32 kernel, each measured on v5e:
    - dot the genotype-CLASS indicators (hom-alt h, het e, missing m)
      instead of dosage values — the caller recovers S1 = 2H + E and
      SQ = 4H + E, so the same three dots yield both moment products
      and the decode needs only equality tests;
    - accumulate the raw [tb, 3C] dot outputs and fold hi+mid+lo once
      in the epilogue, keeping per-plane VPU work to the decode alone.
    """
    from jax.experimental import pallas as pl

    @pl.when(pl.program_id(1) == 0)
    def _init():
        h_ref[:] = jnp.zeros_like(h_ref)
        e_ref[:] = jnp.zeros_like(e_ref)
        m_ref[:] = jnp.zeros_like(m_ref)

    r = raw_ref[:].astype(jnp.int32)
    ah = jnp.zeros_like(h_ref)
    ae = jnp.zeros_like(e_ref)
    am = jnp.zeros_like(m_ref)
    dn = (((1,), (0,)), ((), ()))
    for p in range(4):
        codes = (r >> (2 * p)) & 3
        # PLINK bed 2-bit codes: 0->hom alt, 1->missing, 2->het, 3->hom ref
        h = (codes == 0).astype(jnp.bfloat16)
        e = (codes == 2).astype(jnp.bfloat16)
        m = (codes == 1).astype(jnp.bfloat16)
        w = wp_ref[p]
        ah += jax.lax.dot_general(h, w, dn, preferred_element_type=jnp.float32)
        ae += jax.lax.dot_general(e, w, dn, preferred_element_type=jnp.float32)
        am += jax.lax.dot_general(m, w, dn, preferred_element_type=jnp.float32)
    h_ref[:] += ah
    e_ref[:] += ae
    m_ref[:] += am


def _fused_kernel_i8(raw_ref, wp_ref, h_ref, e_ref, m_ref):
    """int8-limb variant: wp_ref is [4, tc, 4*Cp] int8 (l0|l1|l2|l3),
    class-indicator planes decoded straight to int8, three s8xs8->s32
    MXU dots, EXACT int32 accumulation across byte tiles (i8_fold
    recombines limbs once in the caller)."""
    from jax.experimental import pallas as pl

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
        # PLINK bed 2-bit codes: 0->hom alt, 1->missing, 2->het, 3->hom ref
        hs.append((codes == 0).astype(jnp.int8))
        es.append((codes == 2).astype(jnp.int8))
        ms.append((codes == 1).astype(jnp.int8))
    h = jnp.concatenate(hs, axis=1)
    e = jnp.concatenate(es, axis=1)
    m = jnp.concatenate(ms, axis=1)
    w = wp_ref[:].reshape(-1, wp_ref.shape[-1])  # [4*tc, 4*Cp], p-major
    h_ref[:] += jax.lax.dot_general(h, w, dn, preferred_element_type=jnp.int32)
    e_ref[:] += jax.lax.dot_general(e, w, dn, preferred_element_type=jnp.int32)
    m_ref[:] += jax.lax.dot_general(m, w, dn, preferred_element_type=jnp.int32)


def _i8_products(raw, op: I8Operand, interpret, tb, tc):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, nbp = raw.shape
    Cw4 = op.limbs.shape[2]
    # int32 accumulators are the VMEM hot spot: 3*tb*Cw4*4 bytes
    while tb > 256 and 3 * tb * Cw4 * 4 > 48 * 1024 * 1024:
        tb //= 2
    grid = (pl.cdiv(B, tb), pl.cdiv(nbp, tc))
    H, E, M = pl.pallas_call(
        _fused_kernel_i8,
        out_shape=[jax.ShapeDtypeStruct((B, Cw4), jnp.int32)] * 3,
        grid=grid,
        in_specs=[
            pl.BlockSpec((tb, tc), lambda i, j: (i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((4, tc, Cw4), lambda i, j: (0, j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((tb, Cw4), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM)
        ] * 3,
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=interpret,
    )(raw, op.limbs)
    Hf, Ef, Mf = (i8_fold(x, op.scale) for x in (H, E, M))
    return 2.0 * Hf + Ef, 4.0 * Hf + Ef, Mf


@partial(jax.jit, static_argnames=("interpret", "tb", "tc"))
def fused_products(raw, Wp, interpret=False, tb=_TB, tc=_TC):
    """raw: [B, nbp] packed uint8 (zero-padded rows/cols); Wp: [4, nbp, C]
    (or an I8Operand). Returns (S1, SQ, SM) each [B, C] float32.

    Padding safety: pad bytes decode to code 0 = dosage 2 per plane, but
    the corresponding Wp rows are zero, so padded samples contribute 0
    to every product."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    if isinstance(Wp, I8Operand):
        return _i8_products(raw, Wp, interpret, tb, tc)
    B, nbp = raw.shape
    Cw = Wp.shape[2]
    split = Wp.dtype == jnp.bfloat16
    grid = (pl.cdiv(B, tb), pl.cdiv(nbp, tc))
    if split:
        # class-indicator products in the raw [B, 3C] split layout; the
        # accumulators need ~tb*3C*4*3 bytes, so lift the default 16MB
        # scoped-VMEM cap
        H, E, M = pl.pallas_call(
            _fused_kernel_split,
            out_shape=[jax.ShapeDtypeStruct((B, Cw), jnp.float32)] * 3,
            grid=grid,
            in_specs=[
                pl.BlockSpec((tb, tc), lambda i, j: (i, j), memory_space=pltpu.VMEM),
                pl.BlockSpec((4, tc, Cw), lambda i, j: (0, j, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=[
                pl.BlockSpec((tb, Cw), lambda i, j: (i, 0), memory_space=pltpu.VMEM)
            ]
            * 3,
            compiler_params=None if interpret else pltpu.CompilerParams(
                vmem_limit_bytes=64 * 1024 * 1024
            ),
            interpret=interpret,
        )(raw, Wp)
        C = Cw // 3

        def fold(d):
            return d[:, :C] + d[:, C : 2 * C] + d[:, 2 * C :]

        Hf, Ef, Mf = fold(H), fold(E), fold(M)
        return 2.0 * Hf + Ef, 4.0 * Hf + Ef, Mf
    outs = pl.pallas_call(
        _fused_kernel,
        out_shape=[jax.ShapeDtypeStruct((B, Cw), jnp.float32)] * 3,
        grid=grid,
        in_specs=[
            pl.BlockSpec((tb, tc), lambda i, j: (i, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((4, tc, Cw), lambda i, j: (0, j, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((tb, Cw), lambda i, j: (i, 0), memory_space=pltpu.VMEM)
        ]
        * 3,
        interpret=interpret,
    )(raw, Wp)
    return outs


def fused_products_xla(raw, Wp):
    """XLA reference implementation of fused_products (for CPU runs and
    bit-exactness tests of the pallas kernel). A bf16-split Wp is folded
    back to f32 values first (value-equivalent, not rounding-exact);
    an I8Operand folds its limbs to the exact quantized f32 values."""
    if isinstance(Wp, I8Operand):
        Wp = i8_fold(Wp.limbs.astype(jnp.int32), Wp.scale)
    if Wp.dtype == jnp.bfloat16:
        C = Wp.shape[2] // 3
        Wp = (
            Wp[..., :C].astype(jnp.float32)
            + Wp[..., C : 2 * C].astype(jnp.float32)
            + Wp[..., 2 * C :].astype(jnp.float32)
        )
    B, nbp = raw.shape
    prec = jax.lax.Precision.HIGHEST
    S1 = 0.0
    SQ = 0.0
    SM = 0.0
    dt = Wp.dtype
    r = raw.astype(jnp.int32)
    for p in range(4):
        codes = (r >> (2 * p)) & 3
        g = jnp.where(codes == 0, 2.0, jnp.where(codes == 2, 1.0, 0.0)).astype(dt)
        gq = jnp.where(codes == 0, 4.0, jnp.where(codes == 2, 1.0, 0.0)).astype(dt)
        m = (codes == 1).astype(dt)
        w = Wp[p]
        S1 = S1 + jnp.matmul(g, w, precision=prec)
        SQ = SQ + jnp.matmul(gq, w, precision=prec)
        SM = SM + jnp.matmul(m, w, precision=prec)
    return S1, SQ, SM


@partial(jax.jit, static_argnames=("K", "P", "scale_denom", "n_ind",
                                   "test_type", "inc", "strict"))
def fused_epilogue(S1, SQ, SM, flip, usum, covt_res, Mmat, K, P, scale_denom,
                   n_ind, test_type=0, inc=None, strict=False):
    """[B, C] products -> (stats, denum, scale_fac, low, af_num) on the
    score_qt_block_onepass contract.

    Applies (1) mean imputation as a rank-1 update in product space,
    (2) minor-allele flip G -> 2*ind - G algebraically (ADD) or the
    DOM/REC recoding via the class-product identities, (3) the
    orthonormal-covariate projection identities. Traits NOT in `inc`
    (= complete phenotypes) have no CM columns: their denum is exactly
    g2m - ||A||^2; Mmat covers only the `inc` traits.
    flip: [B] bool. af_num: [B] imputed allele-count sum (for AF/MAC).
    """
    prec = jax.lax.Precision.HIGHEST
    if inc is None:
        inc = tuple(range(P))
    nI = len(inc)
    C_used = K + P + K * nI + P + 1
    S1f, SQf = finalized_products(
        S1[:, :C_used], SQ[:, :C_used], SM[:, :C_used], flip,
        usum[:C_used], C_used - 1, n_ind, test_type,
    )
    icol = C_used - 1
    af_num = S1f[:, icol]

    A = S1f[:, :K]
    numY = S1f[:, K : K + P]
    g2m = SQf[:, K + P + K * nI : K + P + K * nI + P]
    g2 = SQf[:, icol]
    A2 = (A**2).sum(axis=1)
    scale2 = (g2 - A2) / scale_denom
    scale_fac = jnp.sqrt(jnp.maximum(scale2, 0.0))
    low = scale_fac < 1e-8
    num_raw = numY - jnp.matmul(A, covt_res, precision=prec)
    denum_raw = g2m - A2[:, None]  # exact for complete traits
    if nI:
        T = S1f[:, K + P : K + P + K * nI].reshape(-1, K, nI)
        denum_inc = (
            g2m[:, jnp.asarray(inc)]
            - 2.0 * jnp.einsum("bk,bkp->bp", A, T, precision=prec)
            + jnp.einsum("bk,pkl,bl->bp", A, Mmat, A, precision=prec)
        )
        denum_raw = denum_raw.at[:, jnp.asarray(inc)].set(denum_inc)
    denum_raw = jnp.maximum(denum_raw, 1e-30)
    if strict:
        # --strict (and single-pheno runs, Pheno.cpp:201): every trait
        # is complete on ind, so the per-trait masked sum equals
        # ||G_res||^2; the reference shortcuts denum to the CONSTANT
        # n_analyzed - ncov (compute_score_qt strict branch,
        # Step2_Models.cpp:352) — reproduce that convention exactly
        denum = jnp.broadcast_to(
            jnp.asarray(scale_denom, num_raw.dtype), num_raw.shape)
        sf_safe = jnp.where(low, 1.0, scale_fac)
        stats = num_raw / sf_safe[:, None] / jnp.sqrt(
            jnp.asarray(scale_denom, num_raw.dtype))
        return stats, denum, scale_fac, low, af_num
    stats = num_raw / jnp.sqrt(denum_raw)
    denum = denum_raw / jnp.where(low, 1.0, scale2)[:, None]
    return stats, denum, scale_fac, low, af_num


def ref_first_products(S1, SQ, SM, usum):
    """--ref-first: alleles are swapped at decode (G -> 2 - G on
    NONMISSING entries, read_block_device semantics). In product space:
    S1' = 2*(usum - SM) - S1, SQ' = 4*(usum - SM) - 4*S1 + SQ."""
    nm = usum[None, :] - SM  # per-SNP nonmissing-included column sums
    return 2.0 * nm - S1, 4.0 * nm - 4.0 * S1 + SQ


def finalized_products(S1, SQ, SM, flip, usum, icol, n_ind, test_type=0):
    """Products of the TESTED genotype coding, from the raw ADD products.

    test_type 0 (ADD): mean-impute + optional minor-allele flip
    (impute_flip_products). 1 (DOM, G==2 -> 1) and 2 (REC, G>=1 -> G-1):
    the observed part is a linear combination of the class products
    H = (SQ-S1)/2 and E = 2*S1-SQ, and the imputed slots carry the
    transformed mean v (test_raw_block applies the recoding AFTER
    imputation, so v = m unless m==2 for DOM / v = m-1 if m>=1 for REC).
    Flips never combine with DOM/REC (with_flip requires ADD)."""
    if test_type == 0:
        return impute_flip_products(S1, SQ, SM, flip, usum, icol, n_ind)
    n_obs = n_ind - SM[:, icol]
    m_b = S1[:, icol] / jnp.maximum(n_obs, 1.0)
    H = (SQ - S1) / 2.0
    if test_type == 1:
        E = 2.0 * S1 - SQ
        v = jnp.where(m_b == 2.0, 1.0, m_b)
        base = H + E
    else:
        v = jnp.where(m_b >= 1.0, m_b - 1.0, m_b)
        base = H
    S1f = base + v[:, None] * SM
    SQf = base + (v**2)[:, None] * SM
    return S1f, SQf


@partial(jax.jit, static_argnames=("icol", "n_ind"))
def impute_flip_products(S1, SQ, SM, flip, usum, icol, n_ind):
    """Mean imputation + minor-allele flip applied IN PRODUCT SPACE to
    the raw (missing-as-zero) products, for any Wext column layout.

    S1/SQ/SM: [B, C]; flip: [B] bool; usum: [C] ind-masked column sums;
    icol: index of the `ind` column (gives per-SNP dosage total and
    missing count); n_ind: number of included samples. Returns
    (S1f, SQf) — the products of the finalized genotype matrix
    (mean_impute_g + flip_geno semantics, Geno.cpp:1983-2072)."""
    n_obs = n_ind - SM[:, icol]  # included & nonmissing per SNP
    m_b = S1[:, icol] / jnp.maximum(n_obs, 1.0)
    # imputation: G += m_b at missing slots; G^2 += m_b^2 there
    S1i = S1 + m_b[:, None] * SM
    SQi = SQ + (m_b**2)[:, None] * SM
    # flip: G' = 2*ind - G on included samples (flip_geno semantics)
    #   G'@w  = 2*u - G@w ;  G'^2@w = 4*u - 4*G@w + G^2@w
    f = flip[:, None].astype(S1.dtype)
    S1f = (1.0 - f) * S1i + f * (2.0 * usum[None, :] - S1i)
    SQf = (1.0 - f) * SQi + f * (4.0 * usum[None, :] - 4.0 * S1i + SQi)
    return S1f, SQf


def _mesh_row_specs(ranks, axis):
    """PartitionSpecs sharding each output's LEADING (variant) axis."""
    from jax.sharding import PartitionSpec as P

    return tuple(P(axis, *([None] * (r - 1))) for r in ranks)


def _mesh_wrap(body, mesh, in_ranks, out_ranks):
    """shard_map a row-independent fused block fn over the variant axis:
    arg 0 (packed bytes / probability planes) sharded on its leading
    axis, the remaining operands replicated on every chip, every output
    sharded on its leading axis. No collectives — the mesh analog of
    the reference's per-machine chromosome split
    (docs/recommendations.md:128) riding the flagship packed-bytes
    kernel instead of a dense decoded G.

    On a 2-D (var, smp) mesh the byte columns of arg 0 AND the operand's
    contraction (nbp) axis are additionally sharded over `smp`; the body
    must psum its product tensors over that axis (the callers inject the
    psum between products and epilogue). Outputs come back replicated on
    smp, sharded on var."""
    from jax.sharding import PartitionSpec as P

    axes = mesh.axis_names
    axis = axes[0]
    smp = axes[1] if len(axes) > 1 else None

    def _spec(r, i):
        if i == 0:  # the packed block: rows = variants, cols = bytes
            if smp is not None and r >= 2:
                return P(axis, smp, *([None] * (r - 2)))
            return P(axis, *([None] * (r - 1)))
        if smp is not None and r >= 2:
            # operand tensors: contraction (second-to-last) axis sharded
            sp = [None] * r
            sp[r - 2] = smp
            return P(*sp)
        return P(*([None] * r))

    in_specs = tuple(
        jax.tree_util.tree_map(lambda r, i=i: _spec(r, i), rt)
        for i, rt in enumerate(in_ranks)
    )
    return jax.shard_map(
        body, mesh=mesh, in_specs=in_specs,
        out_specs=_mesh_row_specs(out_ranks, axis),
    )


def _mesh_replicate(mesh, x):
    from ..parallel.mesh import replicate

    # multi-host aware (per-process assembly); pytree-safe (I8Operand)
    return jax.tree_util.tree_map(lambda a: replicate(mesh, a), x)


def _mesh_place_operand(mesh, Wp):
    """Place the fused operand on the mesh: replicated on a 1-D
    (variant-only) mesh; contraction (nbp) axis sharded over `smp` on a
    2-D (var, smp) mesh — each chip holds only its sample window of the
    multi-GB Wext (the N-scaling budget lever, SURVEY §5.7)."""
    if len(mesh.axis_names) == 1:
        return _mesh_replicate(mesh, Wp)
    from jax.sharding import NamedSharding
    from jax.sharding import PartitionSpec as P

    from ..parallel.mesh import _put

    smp = mesh.axis_names[1]

    def place(a):
        r = np.ndim(a)
        sp = [None] * r
        if r >= 2:
            sp[r - 2] = smp
        # _put: device_put single-host, per-process slice assembly on a
        # multi-host mesh (each host holds the full operand host-side)
        return _put(np.asarray(a), NamedSharding(mesh, P(*sp)))

    return jax.tree_util.tree_map(place, Wp)


def make_qt_block_fn(consts: "FusedConsts", use_pallas: bool, test_type=0,
                     ref_first=False, mesh=None, strict=False):
    """One-dispatch jitted QT block function: products + epilogue + the
    raw-product slices the host needs for per-variant stats. Built once
    per chromosome — separate jit calls per block would each pay a
    host<->device round trip. With `mesh`, the whole block fn runs
    variant-sharded under shard_map (raw rows padded to the mesh size
    by the caller; operands replicated once)."""
    prod = fused_products if use_pallas else fused_products_xla
    C_used = consts.layout_C()
    psum_ax = (mesh.axis_names[1]
               if mesh is not None and len(mesh.axis_names) > 1 else None)
    # the Wext operand can be GBs at biobank scale (N x 3C bf16): pass
    # it as an argument (device buffer by handle), never as a captured
    # jit constant that would be inlined into the executable
    Wp_dev = (jax.device_put(consts.Wp) if mesh is None
              else _mesh_place_operand(mesh, consts.Wp))

    def _body(raw, Wp):
        S1, SQ, SM = prod(raw, Wp)
        if psum_ax:  # 2-D mesh: sample-sharded partial products
            S1, SQ, SM = (jax.lax.psum(x, psum_ax) for x in (S1, SQ, SM))
        S1c, SQc, SMc = S1[:, :C_used], SQ[:, :C_used], SM[:, :C_used]
        if ref_first:
            S1c, SQc = ref_first_products(
                S1c, SQc, SMc, consts.usum[:C_used].astype(S1c.dtype)
            )
        flip = jnp.zeros(raw.shape[0], bool)  # QT never flips
        stats, denum, scale_fac, low, _af = fused_epilogue(
            S1c, SQc, SMc, flip, consts.usum, consts.covt_res, consts.Mmat,
            consts.K, consts.P, consts.scale_denom, consts.n_ind, test_type,
            consts.inc, strict,
        )
        return stats, denum, scale_fac, low, S1c, SQc, SMc

    if mesh is None:
        _run = jax.jit(_body)
    else:
        _run = jax.jit(_mesh_wrap(
            _body, mesh,
            in_ranks=(2, jax.tree_util.tree_map(np.ndim, consts.Wp)),
            out_ranks=(2, 2, 1, 1, 2, 2, 2),
        ))

    def run(raw):
        return _run(raw, Wp_dev)

    if mesh is None:
        # multi-block runner: ONE dispatch maps a [nb, B, nbp] stack
        # (bench / batch callers amortize per-dispatch RTT on remote
        # backends); the operand stays an argument, not a baked-in
        # constant, so the compile payload stays small
        _run_stack = jax.jit(
            lambda st, Wp: jax.lax.map(lambda r: _body(r, Wp), st))
        run.stack = lambda st: _run_stack(st, Wp_dev)

    return run


def make_bt_block_fn(Wp, usum, xwt, C_used, icol, n_ind, ncat, Pn, Kp1,
                     use_pallas: bool, test_type=0, ref_first=False,
                     mesh=None):
    """One-dispatch jitted BT block function: products -> on-device
    minor-allele flip decision (ADD only) -> imputation/flip or DOM/REC
    recoding in product space -> all-trait score num/denum (the
    product-space twin of step2_bt._allpass_products). Returns the raw
    product slices for host stats plus (flip, num, denum, S1_all).
    With `mesh`, runs variant-sharded under shard_map."""
    prod = fused_products if use_pallas else fused_products_xla
    prec = jax.lax.Precision.HIGHEST
    usum_j = jnp.asarray(usum[:C_used])
    xwt_j = jnp.asarray(xwt)
    psum_ax = (mesh.axis_names[1]
               if mesh is not None and len(mesh.axis_names) > 1 else None)
    Wp_dev = (jax.device_put(Wp) if mesh is None
              else _mesh_place_operand(mesh, Wp))  # by handle, not baked in

    def _body(raw, Wp_a):
        S1, SQ, SM = prod(raw, Wp_a)
        if psum_ax:  # 2-D mesh: sample-sharded partial products
            S1, SQ, SM = (jax.lax.psum(x, psum_ax) for x in (S1, SQ, SM))
        S1c, SQc, SMc = S1[:, :C_used], SQ[:, :C_used], SM[:, :C_used]
        if ref_first:
            S1c, SQc = ref_first_products(
                S1c, SQc, SMc, usum_j.astype(S1c.dtype)
            )
        if test_type == 0:
            ns1 = n_ind - SMc[:, icol]
            flip = S1c[:, icol] / jnp.maximum(ns1, 1.0) > 1.0
        else:
            flip = jnp.zeros(raw.shape[0], bool)
        S1f, SQf = finalized_products(
            S1c, SQc, SMc, flip, usum_j.astype(S1c.dtype), icol, n_ind,
            test_type,
        )
        S1cat = S1f[:, :ncat].reshape(S1f.shape[0], Pn, Kp1)
        A = S1cat[..., :-1]
        q = S1cat[..., -1]
        num = q - jnp.einsum("bpk,pk->bp", A, xwt_j.astype(S1c.dtype), precision=prec)
        denum = SQf[:, ncat : ncat + Pn] - (A**2).sum(-1)
        return S1c, SQc, SMc, flip, num, denum, S1cat

    if mesh is None:
        _run = jax.jit(_body)
    else:
        _run = jax.jit(_mesh_wrap(
            _body, mesh, in_ranks=(2, jax.tree_util.tree_map(np.ndim, Wp)),
            out_ranks=(2, 2, 2, 1, 2, 2, 3),
        ))

    def run(raw):
        return _run(raw, Wp_dev)

    if mesh is None:
        # multi-block runner: ONE dispatch maps a [nb, B, nbp] stack
        # (same RTT-amortization rationale as the QT run.stack; the
        # operand stays an argument so the compile payload stays small)
        _run_stack = jax.jit(
            lambda st, Wp_a: jax.lax.map(lambda r: _body(r, Wp_a), st))
        run.stack = lambda st: _run_stack(st, Wp_dev)

    return run


def make_t2e_block_fn(Wp, usum, Rtv, RtR, res_var, C_used, icol, n_ind,
                      Tt, q, use_pallas: bool, test_type=0, ref_first=False,
                      mesh=None):
    """One-dispatch jitted T2E (Cox) block fn: products -> on-device
    minor-allele flip (ADD) -> imputation/flip or DOM/REC recoding in
    product space -> per-trait approximate Cox score pieces
    (compute_score_cox, Step2_Models.cpp:632-700):

        Gres   = G - A R^T          A = G WX1,  R = X1 (X1' W X1)^-1
        T      = G.v - A (R^T v)    v = residual * mask
      ||Gres||^2 = ||G||^2 - 2 sum_k A'_k A_k + A (R^T R) A^T,  A' = G R
        denum  = res_var * ||Gres||^2

    The operand's first Tt*(2q+1) columns are per-trait [WX1 | R | v]
    blocks; g^2 sums ride the shared `ind` column. Rtv [Tt, q],
    RtR [Tt, q, q], res_var [Tt] are host constants of the null fits.
    Returns (S1c, SQc, SMc, flip, Tnum, denum) — Tnum/denum [B, Tt]."""
    prod = fused_products if use_pallas else fused_products_xla
    prec = jax.lax.Precision.HIGHEST
    usum_j = jnp.asarray(usum[:C_used])
    Rtv_j = jnp.asarray(Rtv)
    RtR_j = jnp.asarray(RtR)
    rv_j = jnp.asarray(res_var)
    psum_ax = (mesh.axis_names[1]
               if mesh is not None and len(mesh.axis_names) > 1 else None)
    Wp_dev = (jax.device_put(Wp) if mesh is None
              else _mesh_place_operand(mesh, Wp))
    nt = Tt * (2 * q + 1)

    def _body(raw, Wp_a):
        S1, SQ, SM = prod(raw, Wp_a)
        if psum_ax:  # 2-D mesh: sample-sharded partial products
            S1, SQ, SM = (jax.lax.psum(x, psum_ax) for x in (S1, SQ, SM))
        S1c, SQc, SMc = S1[:, :C_used], SQ[:, :C_used], SM[:, :C_used]
        if ref_first:
            S1c, SQc = ref_first_products(
                S1c, SQc, SMc, usum_j.astype(S1c.dtype)
            )
        if test_type == 0:
            # with_flip: non-QT + additive (set_blocks_for_testing,
            # Data.cpp:2108)
            ns1 = n_ind - SMc[:, icol]
            flip = S1c[:, icol] / jnp.maximum(ns1, 1.0) > 1.0
        else:
            flip = jnp.zeros(raw.shape[0], bool)
        S1f, SQf = finalized_products(
            S1c, SQc, SMc, flip, usum_j.astype(S1c.dtype), icol, n_ind,
            test_type,
        )
        dt = S1c.dtype
        blk = S1f[:, :nt].reshape(S1f.shape[0], Tt, 2 * q + 1)
        A = blk[..., :q]
        Ap = blk[..., q : 2 * q]
        Gv = blk[..., 2 * q]
        Tnum = Gv - jnp.einsum(
            "btq,tq->bt", A, Rtv_j.astype(dt), precision=prec)
        g2 = SQf[:, icol]
        denum = rv_j.astype(dt)[None, :] * (
            g2[:, None]
            - 2.0 * (A * Ap).sum(-1)
            + jnp.einsum("btk,tkl,btl->bt", A, RtR_j.astype(dt), A,
                         precision=prec)
        )
        return S1c, SQc, SMc, flip, Tnum, denum

    if mesh is None:
        _run = jax.jit(_body)
    else:
        _run = jax.jit(_mesh_wrap(
            _body, mesh, in_ranks=(2, jax.tree_util.tree_map(np.ndim, Wp)),
            out_ranks=(2, 2, 2, 1, 2, 2),
        ))

    def run(raw):
        return _run(raw, Wp_dev)

    return run


def pad_raw(raw: np.ndarray, nbp: int | None = None) -> np.ndarray:
    """Zero-pad packed bytes to the kernel's byte-tile multiple."""
    B, nb = raw.shape
    if nbp is None:
        nbp = -(-nb // _TC) * _TC
    if nbp == nb:
        return raw
    out = np.zeros((B, nbp), dtype=np.uint8)
    out[:, :nb] = raw
    return out


def score_block_fused(raw, flip, consts: FusedConsts, interpret=False, use_pallas=True):
    """End-to-end fused scorer for one packed block.

    raw: [B, nbp] uint8 device/host array (pad with pad_raw);
    flip: [B] bool. Returns (stats, denum, scale_fac, low, af_num)."""
    prod = fused_products if use_pallas else fused_products_xla
    if use_pallas:
        S1, SQ, SM = prod(raw, consts.Wp, interpret=interpret)
    else:
        S1, SQ, SM = prod(raw, consts.Wp)
    return fused_epilogue(
        S1,
        SQ,
        SM,
        flip,
        consts.usum,
        consts.covt_res,
        consts.Mmat,
        consts.K,
        consts.P,
        consts.scale_denom,
        consts.n_ind,
        0,
        consts.inc,
    )


# ---------------------------------------------------------------------------
# BGEN v1.2-8bit fused scorer: the host ships the two per-sample
# probability BYTE planes (k0 = P(hom-first), k1 = P(het); missing =
# 255/255 sentinel — 2 bytes/sample, 16x less transfer than float64
# dosages) and the kernel reconstructs every dosage moment from EXACT
# bf16 byte dots:
#   d*255     = 2*k0 + k1                        (ref-last dosage)
#   (d*255)^2 = 65536*h2 + 256*h1 + h0           (byte-split planes)
#   info num  = (4*k0 + k1)/255 - d^2            (compute_aaf_info)
# Missing samples are masked in-kernel; all downstream imputation /
# flip / ref-first handling reuses the product-space identities above
# (dosages are continuous: DOM/REC recoding is NOT linear here and the
# caller must fall back for test_type != 0).
# ---------------------------------------------------------------------------


def sample_pack(Wext, split, dtype=np.float32, tile=None):
    """[N, C] per-sample operand -> sample-ordered padded kernel operand
    [Np, Cp] (or the bf16 [Np, 3*Cp] hi|mid|lo split) + padded usum.

    Columns pad to 128.  A 64-pad variant for the narrow SQ-consumer
    operand was measured SLOWER on v5e (q-dots 26.3 -> 32.8 ms at
    B=1024/N=400K: Mosaic handles 128-wide int8 output tiles better
    than 64), so the zero pad columns stay — dead MXU work, but the
    layout wins (BENCH_NOTES round 5)."""
    tile = tile or _TC
    N, C = Wext.shape
    Cp = -(-C // 128) * 128
    Np = -(-N // tile) * tile
    W = np.zeros((Np, Cp), dtype=np.float64)
    W[:N, :C] = Wext
    usum = np.pad(Wext.sum(axis=0), (0, Cp - C))
    if split == "i8":
        limbs, s, Wq = _i8_quantize_np(W)
        usum = Wq.sum(axis=0)
        return I8Operand(jnp.asarray(limbs), jnp.asarray(s)), usum
    if split:
        w_j = jnp.asarray(W.astype(np.float32))
        hi = w_j.astype(jnp.bfloat16)
        r1 = w_j - hi.astype(jnp.float32)
        mid = r1.astype(jnp.bfloat16)
        lo = (r1 - mid.astype(jnp.float32)).astype(jnp.bfloat16)
        return jnp.concatenate([hi, mid, lo], axis=1), usum
    return jnp.asarray(W.astype(dtype)), usum


def _bgen_kernel_split(k0_ref, k1_ref, wp_ref, wq_ref, d0_ref, d1_ref, q0_ref,
                       q1_ref, q2_ref, m_ref):
    from jax.experimental import pallas as pl

    @pl.when(pl.program_id(1) == 0)
    def _init():
        for ref in (d0_ref, d1_ref, q0_ref, q1_ref, q2_ref, m_ref):
            ref[:] = jnp.zeros_like(ref)

    # k0/k1 arrive as two clean [tb, tc] byte tiles (two index-mapped
    # views of the reshaped [B, 2*Np] plane buffer).  The previous
    # [tb, 2, tc] block put the size-2 plane axis in the SUBLANE
    # position of the VMEM tile: every pl_ref[:, i, :] slice was a
    # relayout, and the whole kernel ran 2.4x slower (60.8 -> 25.4 ms
    # per 1024x400K block, measured in scripts/profile_bgen.py).
    k0 = k0_ref[:].astype(jnp.int32)
    k1 = k1_ref[:].astype(jnp.int32)
    miss = (k0 + k1) > 255  # sentinel (extractor rejects clipped data)
    k0 = jnp.where(miss, 0, k0)
    k1 = jnp.where(miss, 0, k1)
    d = 2 * k0 + k1
    d2 = d * d
    dn = (((1,), (0,)), ((), ()))
    w = wp_ref[:]
    # the squared-dosage products feed only the SQ-consumer columns
    # ([gsm^2|maskf|case|ind] tail) — dot them against the narrow
    # operand instead of the full width (1.5-1.7x fewer MXU flops at
    # biobank trait counts)
    wq = wq_ref[:]
    dt = w.dtype  # bf16 split operand, or f32 for the unsplit layout
    pe = jnp.float32
    d0_ref[:] += jax.lax.dot_general(k0.astype(dt), w, dn, preferred_element_type=pe)
    d1_ref[:] += jax.lax.dot_general(k1.astype(dt), w, dn, preferred_element_type=pe)
    q0_ref[:] += jax.lax.dot_general((d2 & 255).astype(dt), wq, dn, preferred_element_type=pe)
    q1_ref[:] += jax.lax.dot_general(((d2 >> 8) & 255).astype(dt), wq, dn, preferred_element_type=pe)
    q2_ref[:] += jax.lax.dot_general((d2 >> 16).astype(dt), wq, dn, preferred_element_type=pe)
    m_ref[:] += jax.lax.dot_general(miss.astype(dt), w, dn, preferred_element_type=pe)


def _bgen_kernel_i8(k0_ref, k1_ref, wp_ref, wq_ref, d0_ref, d1_ref, q0_ref,
                    q1_ref, q2_ref, m_ref):
    """int8-limb BGEN variant: byte planes shifted by -128 into int8
    (the caller adds back 128 * operand column sums), s8xs8->s32 MXU
    dots EXACT per tile, f32 cross-tile accumulation (per-tile dots
    stay below 2^24, so the f32 adds are exact until the running sum
    outgrows 24 bits — same accumulation class as the bf16 path).
    k0/k1 arrive as two [tb, tc] byte tiles (see _bgen_kernel_split on
    why the packed [tb, 2, tc] block was a relayout trap)."""
    from jax.experimental import pallas as pl

    @pl.when(pl.program_id(1) == 0)
    def _init():
        for ref in (d0_ref, d1_ref, q0_ref, q1_ref, q2_ref, m_ref):
            ref[:] = jnp.zeros_like(ref)

    k0u = k0_ref[:]
    k1u = k1_ref[:]
    missu = (k0u.astype(jnp.int32) + k1u.astype(jnp.int32)) > 255
    k0u = jnp.where(missu, jnp.uint8(0), k0u)
    k1u = jnp.where(missu, jnp.uint8(0), k1u)
    dn = (((1,), (0,)), ((), ()))
    w = wp_ref[:]
    wq = wq_ref[:]

    def dot8(x, wref):
        xs = (x - 128).astype(jnp.int8)
        return jax.lax.dot_general(
            xs, wref, dn, preferred_element_type=jnp.int32
        ).astype(jnp.float32)

    def dot_u8(xu, wref):
        # (x - 128) as int8 == bitcast(x ^ 0x80) — same MXU operand with
        # no int32->int8 narrowing relayout on the way in
        xs = jax.lax.bitcast_convert_type(xu ^ jnp.uint8(0x80), jnp.int8)
        return jax.lax.dot_general(
            xs, wref, dn, preferred_element_type=jnp.int32
        ).astype(jnp.float32)

    d0_ref[:] += dot_u8(k0u, w)
    d1_ref[:] += dot_u8(k1u, w)
    k0 = k0u.astype(jnp.int32)
    k1 = k1u.astype(jnp.int32)
    d2 = (2 * k0 + k1) ** 2
    q0_ref[:] += dot8(d2 & 255, wq)
    q1_ref[:] += dot8((d2 >> 8) & 255, wq)
    q2_ref[:] += dot8(d2 >> 16, wq)
    m_ref[:] += jax.lax.dot_general(
        missu.astype(jnp.int8), w, dn, preferred_element_type=jnp.int32
    ).astype(jnp.float32)


def _bgen_products_i8(planes, Wp: I8Operand, Wq, qs, C_used, interpret,
                      tb, tc):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B = planes.shape[0]
    Np = planes.shape[2]
    Cw4 = Wp.limbs.shape[1]
    if Wq is None:
        Wq = Wp
        qs = 0
    Cwq4 = Wq.limbs.shape[1]
    if Np % tc:
        tc = _TC  # sample_pack pads Np to _TC multiples
    if Np % tc:
        raise ValueError(
            f"plane operand Np={Np} must be a multiple of {_TC} "
            "(pad via sample_pack) — a partial trailing tile would be "
            "silently dropped")
    npb = Np // tc  # block offset of the k1 half in the flat view
    # free view: [B, 2, Np] row-major == [B, 2*Np] with k0 in columns
    # [0:Np] and k1 in [Np:2*Np] — two index-mapped specs on the same
    # buffer give the kernel clean [tb, tc] byte tiles (the packed
    # 3-D block had the size-2 axis in the sublane slot: 2.4x slower)
    flat = planes.reshape(B, 2 * Np)
    grid = (pl.cdiv(B, tb), npb)
    outs = pl.pallas_call(
        _bgen_kernel_i8,
        out_shape=[jax.ShapeDtypeStruct((B, Cw4), jnp.float32)] * 2
        + [jax.ShapeDtypeStruct((B, Cwq4), jnp.float32)] * 3
        + [jax.ShapeDtypeStruct((B, Cw4), jnp.float32)],
        grid=grid,
        in_specs=[
            pl.BlockSpec((tb, tc), lambda i, j: (i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tb, tc), lambda i, j, _npb=npb: (i, j + _npb),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tc, Cw4), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tc, Cwq4), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((tb, Cw4), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM)
        ] * 2
        + [pl.BlockSpec((tb, Cwq4), lambda i, j: (i, 0),
                        memory_space=pltpu.VMEM)] * 3
        + [pl.BlockSpec((tb, Cw4), lambda i, j: (i, 0),
                        memory_space=pltpu.VMEM)],
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=interpret,
    )(flat, flat, Wp.limbs, Wq.limbs)
    D0p, D1p, Q0p, Q1p, Q2p, Mp = outs
    # undo the -128 shift: S_true = fold(dots) + 128 * fold(colsums)
    # (dtype-int32 reductions — no int32 copy of the operand in HBM)
    csw = 128.0 * i8_fold(
        jnp.sum(Wp.limbs, axis=0, dtype=jnp.int32), Wp.scale)
    csq = 128.0 * i8_fold(
        jnp.sum(Wq.limbs, axis=0, dtype=jnp.int32), Wq.scale)
    D0 = i8_fold(D0p, Wp.scale) + csw[None]
    D1 = i8_fold(D1p, Wp.scale) + csw[None]
    Q0 = i8_fold(Q0p, Wq.scale) + csq[None]
    Q1 = i8_fold(Q1p, Wq.scale) + csq[None]
    Q2 = i8_fold(Q2p, Wq.scale) + csq[None]
    M = i8_fold(Mp, Wp.scale)
    S1, SQn, SM, IL = _bgen_combine((D0, D1, Q0, Q1, Q2, M),
                                    D0.shape[1], False, Q0.shape[1])
    if qs:
        nq = (C_used - qs) if C_used is not None else SQn.shape[1]
        SQ = jnp.zeros_like(S1).at[:, qs : qs + nq].set(SQn[:, :nq])
    else:
        SQ = SQn
    return S1, SQ, SM, IL


@partial(jax.jit, static_argnames=("interpret", "tb", "tc", "qs", "C_used"))
def bgen_fused_products(planes, Wp, Wq=None, qs=0, C_used=None,
                        interpret=False, tb=512, tc=_TC):
    """planes: [B, 2, Np] uint8; Wp: [Np, Cw] (sample_pack); Wq: the
    narrow SQ-consumer operand (sample_pack of Wext[:, qs:]), or None
    to use the full width. Returns (S1, SQ, SM, IL) each [B, C]
    float32 — dosage, squared-dosage, missing, and info-linear (4p0+p1)
    products of the raw (missing-as-zero) dosages. With a narrow Wq,
    SQ's columns outside [qs:C_used] are ZERO."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    if isinstance(Wp, I8Operand):
        return _bgen_products_i8(planes, Wp, Wq, qs, C_used, interpret,
                                 tb, tc)
    B = planes.shape[0]
    Np = planes.shape[2]
    Cw = Wp.shape[1]
    if Wq is None:
        Wq = Wp
        qs = 0
    Cwq = Wq.shape[1]
    split = Wp.dtype == jnp.bfloat16
    if Np % tc:
        tc = _TC  # sample_pack pads Np to _TC multiples
    if Np % tc:
        raise ValueError(
            f"plane operand Np={Np} must be a multiple of {_TC} "
            "(pad via sample_pack) — a partial trailing tile would be "
            "silently dropped")
    npb = Np // tc
    flat = planes.reshape(B, 2 * Np)  # see _bgen_products_i8 layout note
    grid = (pl.cdiv(B, tb), npb)
    outs = pl.pallas_call(
        _bgen_kernel_split,
        out_shape=[jax.ShapeDtypeStruct((B, Cw), jnp.float32)] * 2
        + [jax.ShapeDtypeStruct((B, Cwq), jnp.float32)] * 3
        + [jax.ShapeDtypeStruct((B, Cw), jnp.float32)],
        grid=grid,
        in_specs=[
            pl.BlockSpec((tb, tc), lambda i, j: (i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tb, tc), lambda i, j, _npb=npb: (i, j + _npb),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tc, Cw), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tc, Cwq), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((tb, Cw), lambda i, j: (i, 0), memory_space=pltpu.VMEM)
        ]
        * 2
        + [pl.BlockSpec((tb, Cwq), lambda i, j: (i, 0), memory_space=pltpu.VMEM)]
        * 3
        + [pl.BlockSpec((tb, Cw), lambda i, j: (i, 0), memory_space=pltpu.VMEM)],
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=interpret,
    )(flat, flat, Wp, Wq)
    D0, D1, Q0, Q1, Q2, M = outs
    S1, SQn, SM, IL = _bgen_combine((D0, D1, Q0, Q1, Q2, M), Cw, split, Cwq)
    if qs:
        # scatter the narrow SQ back onto the full column frame (the
        # non-q columns are never consumed downstream)
        C = S1.shape[1]
        nq = (C_used - qs) if C_used is not None else SQn.shape[1]
        SQ = jnp.zeros_like(S1).at[:, qs : qs + nq].set(SQn[:, :nq])
    else:
        SQ = SQn
    return S1, SQ, SM, IL


def _bgen_combine(outs, Cw, split, Cwq=None):
    D0, D1, Q0, Q1, Q2, M = outs
    if split:
        C = Cw // 3
        Cq = (Cwq if Cwq is not None else Cw) // 3

        def fold(d, c):
            return d[:, :c] + d[:, c : 2 * c] + d[:, 2 * c :]

        D0, D1, M = (fold(x, C) for x in (D0, D1, M))
        Q0, Q1, Q2 = (fold(x, Cq) for x in (Q0, Q1, Q2))
    S1 = (2.0 * D0 + D1) / 255.0
    SQ = (65536.0 * Q2 + 256.0 * Q1 + Q0) / (255.0 * 255.0)
    IL = (4.0 * D0 + D1) / 255.0
    return S1, SQ, M, IL


def bgen_fused_products_xla(planes, Wp):
    """XLA twin of bgen_fused_products (CPU runs / kernel tests). Wp may
    be the f32/f64 sample_pack, the bf16 split (folded to values), or an
    I8Operand (limbs folded to the exact quantized values)."""
    if isinstance(Wp, I8Operand):
        Wp = i8_fold(Wp.limbs.astype(jnp.int32), Wp.scale)
    if Wp.dtype == jnp.bfloat16:
        C = Wp.shape[1] // 3
        Wp = (
            Wp[:, :C].astype(jnp.float32)
            + Wp[:, C : 2 * C].astype(jnp.float32)
            + Wp[:, 2 * C :].astype(jnp.float32)
        )
    prec = jax.lax.Precision.HIGHEST
    dt = Wp.dtype
    k0 = planes[:, 0, :].astype(jnp.int32)
    k1 = planes[:, 1, :].astype(jnp.int32)
    miss = (k0 + k1) > 255
    k0 = jnp.where(miss, 0, k0)
    k1 = jnp.where(miss, 0, k1)
    d2 = (2 * k0 + k1) ** 2
    D0 = jnp.matmul(k0.astype(dt), Wp, precision=prec)
    D1 = jnp.matmul(k1.astype(dt), Wp, precision=prec)
    Q0 = jnp.matmul((d2 & 255).astype(dt), Wp, precision=prec)
    Q1 = jnp.matmul(((d2 >> 8) & 255).astype(dt), Wp, precision=prec)
    Q2 = jnp.matmul((d2 >> 16).astype(dt), Wp, precision=prec)
    M = jnp.matmul(miss.astype(dt), Wp, precision=prec)
    return _bgen_combine((D0, D1, Q0, Q1, Q2, M), Wp.shape[1], False)


def _bgen_prepare(S1, SQ, SM, IL, usum_j, C_used, ref_first):
    """Slice + optional --ref-first transform of the BGEN raw products,
    including the info-linear column set: with ds' = 2 - ds and
    ph' = p2 (unclipped), 4*p2 + p1 = 4 - 4*p0 - 3*p1 on nonmissing, so
    IL' = 4*(u - SM) + IL - 4*S1 (from P0 = (IL - S1)/2, P1 = 2*S1 - IL
    given IL = 4*P0 + P1 and S1 = 2*P0 + P1)."""
    S1c, SQc, SMc, ILc = (
        S1[:, :C_used], SQ[:, :C_used], SM[:, :C_used], IL[:, :C_used]
    )
    if ref_first:
        u = usum_j[None, :]
        ILc = 4.0 * (u - SMc) + ILc - 4.0 * S1c
        S1c, SQc = ref_first_products(S1c, SQc, SMc, usum_j)
    return S1c, SQc, SMc, ILc


def make_qt_bgen_fn(consts: "FusedConsts", use_pallas: bool, ref_first=False,
                    Wq=None, qs=0, mesh=None, strict=False):
    """One-dispatch QT block function over BGEN probability byte planes.
    Returns the QT score outputs plus the raw product slices and the
    info-linear products (for the INFO column). Wq/qs: optional narrow
    SQ-consumer operand (sample_pack of Wext[:, qs:]). With `mesh`,
    runs variant-sharded under shard_map."""
    C_used = consts.layout_C()
    put = jax.device_put if mesh is None else partial(_mesh_replicate, mesh)
    Wp_dev = put(consts.Wp)  # by handle, not a constant
    Wq_dev = put(Wq) if (Wq is not None and use_pallas) else None
    use_q = Wq_dev is not None

    def _body(planes, Wp, Wq_a):
        if use_pallas:
            S1, SQ, SM, IL = bgen_fused_products(
                planes, Wp, Wq_a, qs if use_q else 0, C_used
            )
        else:
            S1, SQ, SM, IL = bgen_fused_products_xla(planes, Wp)
        S1c, SQc, SMc, ILc = _bgen_prepare(
            S1, SQ, SM, IL, consts.usum[:C_used].astype(S1.dtype),
            C_used, ref_first,
        )
        flip = jnp.zeros(planes.shape[0], bool)
        stats, denum, scale_fac, low, _af = fused_epilogue(
            S1c, SQc, SMc, flip, consts.usum, consts.covt_res, consts.Mmat,
            consts.K, consts.P, consts.scale_denom, consts.n_ind, 0,
            consts.inc, strict,
        )
        return stats, denum, scale_fac, low, S1c, SQc, SMc, ILc

    if mesh is None:
        _run = jax.jit(_body)
    else:
        _run = jax.jit(_mesh_wrap(
            _body, mesh,
            in_ranks=(3, jax.tree_util.tree_map(np.ndim, consts.Wp),
                      jax.tree_util.tree_map(
                          np.ndim, Wq if use_q else consts.Wp)),
            out_ranks=(2, 2, 1, 1, 2, 2, 2, 2),
        ))

    def run(planes):
        return _run(planes, Wp_dev, Wq_dev if use_q else Wp_dev)

    if mesh is None:
        _run_stack = jax.jit(
            lambda st, Wp, Wq_a: jax.lax.map(
                lambda p: _body(p, Wp, Wq_a), st))
        run.stack = lambda st: _run_stack(
            st, Wp_dev, Wq_dev if use_q else Wp_dev)

    return run


def make_bt_bgen_fn(Wp, usum, xwt, C_used, icol, n_ind, ncat, Pn, Kp1,
                    use_pallas: bool, ref_first=False, Wq=None, qs=0,
                    mesh=None):
    """One-dispatch BT/CT block function over BGEN byte planes (ADD
    coding only): products -> on-device flip -> product-space
    finalization -> all-trait num/denum + info-linear products.
    Wq/qs: optional narrow SQ-consumer operand. With `mesh`, runs
    variant-sharded under shard_map."""
    prec = jax.lax.Precision.HIGHEST
    usum_j = jnp.asarray(usum[:C_used])
    xwt_j = jnp.asarray(xwt)
    put = jax.device_put if mesh is None else partial(_mesh_replicate, mesh)
    Wp_dev = put(Wp)  # by handle, not a constant
    Wq_dev = put(Wq) if (Wq is not None and use_pallas) else None
    use_q = Wq_dev is not None

    def _body(planes, Wp_a, Wq_a):
        if use_pallas:
            S1, SQ, SM, IL = bgen_fused_products(
                planes, Wp_a, Wq_a, qs if use_q else 0, C_used
            )
        else:
            S1, SQ, SM, IL = bgen_fused_products_xla(planes, Wp_a)
        S1c, SQc, SMc, ILc = _bgen_prepare(
            S1, SQ, SM, IL, usum_j.astype(S1.dtype), C_used, ref_first
        )
        ns1 = n_ind - SMc[:, icol]
        flip = S1c[:, icol] / jnp.maximum(ns1, 1.0) > 1.0
        S1f, SQf = impute_flip_products(
            S1c, SQc, SMc, flip, usum_j.astype(S1c.dtype), icol, n_ind
        )
        S1cat = S1f[:, :ncat].reshape(S1f.shape[0], Pn, Kp1)
        A = S1cat[..., :-1]
        q = S1cat[..., -1]
        num = q - jnp.einsum("bpk,pk->bp", A, xwt_j.astype(S1c.dtype), precision=prec)
        denum = SQf[:, ncat : ncat + Pn] - (A**2).sum(-1)
        return S1c, SQc, SMc, ILc, flip, num, denum, S1cat

    if mesh is None:
        _run = jax.jit(_body)
    else:
        _run = jax.jit(_mesh_wrap(
            _body, mesh,
            in_ranks=(3, jax.tree_util.tree_map(np.ndim, Wp),
                      jax.tree_util.tree_map(np.ndim, Wq if use_q else Wp)),
            out_ranks=(2, 2, 2, 2, 1, 2, 2, 3),
        ))

    def run(planes):
        return _run(planes, Wp_dev, Wq_dev if use_q else Wp_dev)

    return run
