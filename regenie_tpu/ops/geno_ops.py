"""Device-side genotype block preparation ops.

The host ships raw int8 genotype blocks [B, N] (values {0,1,2,-3}); all
per-variant statistics and cleanup (missing-mean imputation, masking,
allele flip, per-trait AF/MAC) run batched on device — replacing the
reference's per-SNP OpenMP loops (parseSnpfromBed, Geno.cpp:2414) with
vectorized VPU/MXU work.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..utils.dtypes import MATMUL_PRECISION as _PREC

MISSING = -3


@jax.jit
def prepare_block_step1(G_int8, ind_in_analysis):
    """Step-1 block prep: mask out-of-analysis samples and mean-impute
    missing genotypes (reference get_G -> mean_impute_g path).

    G_int8: [B, N] int8; ind_in_analysis: [N] bool.
    Returns G: [B, N] float, imputed & masked.
    """
    compute_dtype = jnp.float64 if jax.config.jax_enable_x64 else jnp.float32
    G = G_int8.astype(compute_dtype)
    ind = ind_in_analysis.astype(compute_dtype)[None, :]
    is_missing = G == MISSING
    valid = (~is_missing) & ind_in_analysis[None, :]
    total = jnp.where(valid, G, 0.0).sum(axis=1)
    ns = valid.sum(axis=1).astype(compute_dtype)
    mean = total / ns
    G = jnp.where(is_missing, mean[:, None], G) * ind
    return G


@partial(jax.jit, static_argnames=("skip_comp",))
def snp_stats_block(G_int8, ind_in_analysis, masked_indivs, non_par=None,
                    sex=None, skip_comp=False):
    """Batched per-variant statistics for a block (step 2).

    Replaces the per-SNP stat loop in parseSnpfromBed (Geno.cpp:2414-2500)
    and its chrX non-PAR male handling (compute_mac :3077,
    compute_aaf_info :3110): totals / ns over all analyzed samples and
    per-trait versions via one mask matmul. For non-PAR chrX variants
    males (diploid-coded 0/2) count 0.5*g toward MAC and the mirrored
    minor count subtracts the male alleles; with --skip-dosage-comp the
    caller halves male genotypes and the AF denominator drops one allele
    per male.

    G_int8: [B, N]; ind_in_analysis: [N] bool; masked_indivs: [N, P] bool;
    non_par: [B] bool or None; sex: [N] int (1=male) or None.
    Returns dict: total [B], ns [B], af1 [B], af [B,P], mac [B,P], ns_t [B,P],
    n_rr [B], n_aa [B] (counts over analyzed samples).
    """
    compute_dtype = jnp.float64 if jax.config.jax_enable_x64 else jnp.float32
    G = G_int8.astype(compute_dtype)
    is_missing = G == MISSING
    valid = (~is_missing) & ind_in_analysis[None, :]
    validf = valid.astype(compute_dtype)
    Gv = jnp.where(valid, G, 0.0)

    total = Gv.sum(axis=1)  # [B]
    ns = validf.sum(axis=1)  # [B]

    maskf = masked_indivs.astype(compute_dtype)  # [N,P]
    # per-trait: restrict to each trait's mask
    total_t = jnp.matmul(Gv, maskf, precision=_PREC)  # [B,P]
    ns_t = jnp.matmul(validf, maskf, precision=_PREC)  # [B,P]

    if non_par is None or sex is None:
        af1 = total / (2.0 * ns)
        af_t = total_t / (2.0 * ns_t)
        mac_t = jnp.minimum(total_t, 2.0 * ns_t - total_t)
        n_rr = ((G < 0.5) & valid).sum(axis=1)
        n_aa = ((G >= 1.5) & valid).sum(axis=1)
        return dict(
            total=total, ns=ns, af1=af1, af=af_t, mac=mac_t, ns_t=ns_t,
            n_rr=n_rr, n_aa=n_aa,
            mac1=jnp.minimum(total, 2.0 * ns - total),
        )

    male = (sex == 1)[None, :] & valid  # [B, N]
    half = non_par[:, None] & male
    malef = male.astype(compute_dtype)
    nmales = jnp.where(non_par, malef.sum(axis=1), 0.0)  # [B]
    nmales_t = jnp.matmul(malef, maskf, precision=_PREC) * non_par[:, None]

    # male allele count: g/2 unless the caller already halved (skip_comp)
    mval = Gv if skip_comp else jnp.where(half, Gv * 0.5, Gv)
    mac1 = mval.sum(axis=1)
    mac_t_raw = jnp.matmul(mval, maskf, precision=_PREC)

    denom_adj = nmales if skip_comp else jnp.zeros_like(nmales)
    denom_adj_t = nmales_t if skip_comp else jnp.zeros_like(nmales_t)
    af1 = total / (2.0 * ns - denom_adj)
    af_t = total_t / (2.0 * ns_t - denom_adj_t)
    mac_t = jnp.where(
        non_par[:, None],
        jnp.minimum(mac_t_raw, 2.0 * ns_t - nmales_t - mac_t_raw),
        jnp.minimum(total_t, 2.0 * ns_t - total_t),
    )

    # genotype class counts: non-PAR males are hemizygous 0/1; with
    # skip_comp the genotypes were already halved so standard thresholds
    # apply (Geno.cpp:2479-2486)
    hemi = half if not skip_comp else jnp.zeros_like(half)
    thr_rr = jnp.where(hemi, 1.0, 0.5)
    thr_aa = jnp.where(hemi, 1.0 - 1e-9, 1.5)
    n_rr = ((G < thr_rr) & valid).sum(axis=1)
    n_aa = ((G >= thr_aa) & valid).sum(axis=1)
    mac1_m = jnp.where(
        non_par,
        jnp.minimum(mac1, 2.0 * ns - nmales - mac1),
        jnp.minimum(total, 2.0 * ns - total),
    )
    return dict(
        total=total, ns=ns, af1=af1, af=af_t, mac=mac_t, ns_t=ns_t,
        n_rr=n_rr, n_aa=n_aa, mac1=mac1_m,
    )


@partial(jax.jit, static_argnames=("n_samples",))
def decode_bed_packed(raw, n_samples):
    """Device-side PLINK 2-bit decode: [B, ceil(N/4)] uint8 -> [B, N]
    int8 {0,1,2,-3}.

    Ships 4 genotypes per byte over host->device (16x less traffic than
    f32, 4x less than int8) and unpacks with VPU bit ops — replacing the
    reference's host-side 256-entry LUT (buildLookupTable, Geno.cpp:2833).
    ref-last coding: 00->2, 01->-3(missing), 10->1, 11->0.
    """
    B, nb = raw.shape
    codes = jnp.stack(
        [(raw >> (2 * j)) & 3 for j in range(4)], axis=2
    ).reshape(B, nb * 4)[:, :n_samples]
    codes = codes.astype(jnp.int8)
    vals = jnp.where(
        codes == 0, jnp.int8(2),
        jnp.where(codes == 1, jnp.int8(-3), jnp.where(codes == 2, jnp.int8(1), jnp.int8(0))),
    )
    return vals


@partial(jax.jit, static_argnames=("n_samples", "skip_comp"))
def snp_stats_block_packed(raw, n_samples, ind_in_analysis, masked_indivs,
                           non_par=None, sex=None, skip_comp=False):
    """snp_stats_block on host-packed 2-bit codes: ships 4 genotypes per
    byte (4x less H2D than dense int8) and decodes on device.  Exact —
    pack/decode round-trips hardcalls {0,1,2,-3} bit-for-bit."""
    return snp_stats_block(
        decode_bed_packed(raw, n_samples), ind_in_analysis, masked_indivs,
        non_par=non_par, sex=sex, skip_comp=skip_comp)


# host-side inverse of decode_bed_packed's value map (2->00, -3->01,
# 1->10, 0->11), indexed by g+3 over the int8 domain {-3,0,1,2}
_PACK_LUT = np.zeros(6, np.uint8)
_PACK_LUT[-3 + 3] = 1
_PACK_LUT[0 + 3] = 3
_PACK_LUT[1 + 3] = 2
_PACK_LUT[2 + 3] = 0


def pack_hardcalls(arr: np.ndarray) -> np.ndarray:
    """[B, N] int8 hardcalls {0,1,2,-3} -> [B, ceil(N/4)] BED-coded
    bytes (decode_bed_packed inverts exactly)."""
    B, N = arr.shape
    pad = (-N) % 4
    codes = _PACK_LUT[arr.astype(np.int16) + 3]
    if pad:
        codes = np.concatenate(
            [codes, np.ones((B, pad), np.uint8)], axis=1)  # 01 = missing
    codes = codes.reshape(B, -1, 4)
    return (codes[:, :, 0] | (codes[:, :, 1] << 2)
            | (codes[:, :, 2] << 4) | (codes[:, :, 3] << 6)).astype(np.uint8)


@jax.jit
def finalize_block_step2(G_int8, ind_in_analysis, flip):
    """Flip to minor allele (if requested per-variant) and mean-impute.

    flip: [B] bool (reference flip_geno, Geno.cpp:3149).
    Returns G [B, N] float.
    """
    compute_dtype = jnp.float64 if jax.config.jax_enable_x64 else jnp.float32
    G = G_int8.astype(compute_dtype)
    is_missing = G == MISSING
    G = jnp.where(flip[:, None] & ~is_missing, 2.0 - G, G)
    valid = (~is_missing) & ind_in_analysis[None, :]
    total = jnp.where(valid, G, 0.0).sum(axis=1)
    ns = valid.sum(axis=1).astype(compute_dtype)
    mean = total / ns
    G = jnp.where(is_missing, mean[:, None], G)
    G = G * ind_in_analysis[None, :].astype(compute_dtype)
    return G
