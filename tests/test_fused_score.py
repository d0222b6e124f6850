"""Oracle tests for the fully fused packed-bytes step-2 QT scorer
(ops/fused_score.py): the product-space algebra (imputation as rank-1
update, algebraic allele flip, covariate-projection identities) must
reproduce the reference pipeline decode -> finalize -> onepass score,
and the pallas kernel (interpret mode) must match its XLA twin.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from regenie_tpu.io.bed import decode_bed_bytes
from regenie_tpu.models import step2 as m2
from regenie_tpu.ops import fused_score as fs
from regenie_tpu.ops.geno_ops import finalize_block_step2


def _mk_case(seed, B=48, N=601, P=3, K=4, miss_rate=0.05, excl_rate=0.1):
    rng = np.random.default_rng(seed)
    nb = (N + 3) // 4
    # random packed bytes spanning all codes (incl. missing)
    raw = rng.integers(0, 256, size=(B, nb), dtype=np.uint8)
    ind = rng.random(N) > excl_rate
    flip = rng.random(B) < 0.5
    res = rng.normal(size=(N, P))
    maskf = (rng.random(size=(N, P)) > 0.08).astype(np.float64)
    covr = rng.normal(size=(N, K))
    covz = np.linalg.qr(covr * ind[:, None])[0]
    resz = res * ind[:, None]
    maskz = maskf * ind[:, None]
    scale_denom = float(ind.sum() - K)
    return raw, nb, ind, flip, covz, resz, maskz, scale_denom


def _reference(raw, nb, N, ind, flip, covz, resz, maskz, scale_denom):
    G_int8 = np.asarray(decode_bed_bytes(raw[:, :nb], N))
    G = finalize_block_step2(
        jnp.asarray(G_int8), jnp.asarray(ind), jnp.asarray(flip)
    )
    CM, Mmat, ctr = m2.onepass_constants(covz, maskz, resz)
    return m2.score_qt_block_onepass(
        G.astype(jnp.float64),
        jnp.asarray(covz),
        jnp.asarray(resz),
        jnp.asarray(maskz),
        jnp.asarray(CM),
        jnp.asarray(Mmat),
        jnp.asarray(ctr),
        scale_denom,
    )


@pytest.mark.parametrize("seed", [0, 1])
def test_fused_products_algebra_matches_pipeline(seed):
    N, P, K = 601, 3, 4
    raw, nb, ind, flip, covz, resz, maskz, sden = _mk_case(seed, N=N, P=P, K=K)
    exp_stats, exp_denum, exp_sf, exp_low = _reference(
        raw, nb, N, ind, flip, covz, resz, maskz, sden
    )

    consts = fs.build_consts(covz, resz, maskz, ind, sden, nb=nb, dtype=np.float64)
    rawp = fs.pad_raw(raw)
    S1, SQ, SM = fs.fused_products_xla(jnp.asarray(rawp), consts.Wp)
    stats, denum, sf, low, af_num = fs.fused_epilogue(
        S1, SQ, SM, jnp.asarray(flip), consts.usum, consts.covt_res,
        consts.Mmat, consts.K, consts.P, consts.scale_denom, consts.n_ind,
        inc=consts.inc,
    )
    np.testing.assert_allclose(np.asarray(stats), np.asarray(exp_stats),
                               rtol=1e-9, atol=1e-9)
    np.testing.assert_allclose(np.asarray(denum), np.asarray(exp_denum),
                               rtol=1e-9, atol=1e-9)
    np.testing.assert_allclose(np.asarray(sf), np.asarray(exp_sf), rtol=1e-9)
    np.testing.assert_array_equal(np.asarray(low), np.asarray(exp_low))
    # allele-count numerator: sum of final G over included samples
    G_int8 = np.asarray(decode_bed_bytes(raw[:, :nb], N))
    Gfin = np.asarray(
        finalize_block_step2(jnp.asarray(G_int8), jnp.asarray(ind), jnp.asarray(flip))
    )
    np.testing.assert_allclose(np.asarray(af_num), Gfin.sum(axis=1), rtol=1e-9)


@pytest.mark.parametrize("n_complete", [1, 3])
def test_fused_cm_elision_mixed_traits(n_complete):
    """Traits with complete phenotypes carry no CM operand columns
    (denum = g2m - ||A||^2 exactly); mixed complete/incomplete trait
    sets must still match the full reference pipeline."""
    N, P, K = 601, 3, 4
    raw, nb, ind, flip, covz, resz, maskz, sden = _mk_case(11, N=N, P=P, K=K)
    indf = ind.astype(np.float64)
    for p in range(n_complete):  # make trait p complete
        maskz[:, p] = indf
    exp = _reference(raw, nb, N, ind, flip, covz, resz, maskz, sden)

    consts = fs.build_consts(covz, resz, maskz, ind, sden, nb=nb,
                             dtype=np.float64)
    assert len(consts.inc) == P - n_complete
    assert consts.layout_C() == K + P + K * (P - n_complete) + P + 1
    rawp = fs.pad_raw(raw)
    stats, denum, sf, low, _af = fs.score_block_fused(
        jnp.asarray(rawp), jnp.asarray(flip), consts, use_pallas=False
    )
    np.testing.assert_allclose(np.asarray(stats), np.asarray(exp[0]),
                               rtol=1e-9, atol=1e-9)
    np.testing.assert_allclose(np.asarray(denum), np.asarray(exp[1]),
                               rtol=1e-9, atol=1e-9)
    np.testing.assert_allclose(np.asarray(sf), np.asarray(exp[2]), rtol=1e-9)
    np.testing.assert_array_equal(np.asarray(low), np.asarray(exp[3]))


def test_fused_pallas_narrow_operand_complete_traits():
    """All-complete traits shrink the operand to [cov|res|maskf|ind]
    (no CM block) — the pallas kernel (interpret) must match XLA and
    the reference pipeline at the narrow width (the bench.py shape)."""
    N, P, K = 601, 3, 4
    raw, nb, ind, flip, covz, resz, maskz, sden = _mk_case(5, B=16, N=N, P=P, K=K)
    maskz = np.tile(ind.astype(np.float64)[:, None], (1, P))  # complete
    exp = _reference(raw, nb, N, ind, flip, covz, resz, maskz, sden)
    consts = fs.build_consts(covz, resz, maskz, ind, sden, nb=nb,
                             dtype=np.float32)
    assert consts.inc == ()
    rawp = fs.pad_raw(raw)
    S1x, SQx, SMx = fs.fused_products_xla(jnp.asarray(rawp), consts.Wp)
    S1p, SQp, SMp = fs.fused_products(jnp.asarray(rawp), consts.Wp,
                                      interpret=True)
    np.testing.assert_allclose(np.asarray(S1p), np.asarray(S1x), rtol=1e-5,
                               atol=1e-4)
    np.testing.assert_allclose(np.asarray(SQp), np.asarray(SQx), rtol=1e-5,
                               atol=1e-4)
    np.testing.assert_allclose(np.asarray(SMp), np.asarray(SMx), rtol=1e-5,
                               atol=1e-4)
    stats, denum, sf, low, _af = fs.score_block_fused(
        jnp.asarray(rawp), jnp.asarray(flip), consts, use_pallas=False
    )
    np.testing.assert_allclose(np.asarray(stats), np.asarray(exp[0]),
                               rtol=2e-4, atol=2e-4)


def test_fused_products_f32_close():
    """f32 products (the production dtype) stay print-precision close."""
    N = 601
    raw, nb, ind, flip, covz, resz, maskz, sden = _mk_case(7, N=N)
    exp_stats, _, exp_sf, _ = _reference(
        raw, nb, N, ind, flip, covz, resz, maskz, sden
    )
    consts = fs.build_consts(covz, resz, maskz, ind, sden, nb=nb, dtype=np.float32)
    rawp = fs.pad_raw(raw)
    stats, denum, sf, low, _af = fs.score_block_fused(
        jnp.asarray(rawp), jnp.asarray(flip), consts, use_pallas=False
    )
    np.testing.assert_allclose(np.asarray(stats), np.asarray(exp_stats),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(sf), np.asarray(exp_sf), rtol=1e-4)


def test_fused_pallas_interpret_matches_xla():
    """The pallas kernel (interpret mode on CPU) equals the XLA twin."""
    N = 1025
    raw, nb, ind, flip, covz, resz, maskz, sden = _mk_case(3, B=16, N=N)
    consts = fs.build_consts(covz, resz, maskz, ind, sden, nb=nb, dtype=np.float32)
    rawp = fs.pad_raw(raw)
    S1x, SQx, SMx = fs.fused_products_xla(jnp.asarray(rawp), consts.Wp)
    S1p, SQp, SMp = fs.fused_products(jnp.asarray(rawp), consts.Wp, interpret=True)
    np.testing.assert_allclose(np.asarray(S1p), np.asarray(S1x), rtol=1e-5, atol=1e-4)
    np.testing.assert_allclose(np.asarray(SQp), np.asarray(SQx), rtol=1e-5, atol=1e-4)
    np.testing.assert_allclose(np.asarray(SMp), np.asarray(SMx), rtol=1e-5, atol=1e-4)


def _run_cli(args, extra_env=None):
    import os, subprocess, sys

    env = dict(os.environ)
    env["REGENIE_TPU_PLATFORM"] = "cpu"
    if extra_env:
        env.update(extra_env)
    r = subprocess.run(
        [sys.executable, "-m", "regenie_tpu"] + args,
        capture_output=True, text=True, cwd="/root/repo", env=env, timeout=900,
    )
    assert r.returncode == 0, r.stdout + r.stderr
    return r.stdout


def test_fused_cli_byte_identical(tmp_path):
    """REGENIE_TPU_FUSED=1 step-2 QT run (XLA twin of the pallas path,
    f64 on CPU) produces byte-identical .regenie files to the standard
    decode->finalize->onepass pipeline, incl. sample removal (scatter to
    the file sample axis) and the HTP genotype-count columns."""
    EX = "/root/reference/example"
    fit = str(tmp_path / "fit")
    _run_cli([
        "--step", "1", "--bed", f"{EX}/example",
        "--exclude", f"{EX}/snplist_rm.txt",
        "--covarFile", f"{EX}/covariates.txt",
        "--phenoFile", f"{EX}/phenotype.txt",
        "--remove", f"{EX}/fid_iid_to_remove.txt",
        "--bsize", "100", "--out", fit,
    ])
    common = [
        "--step", "2", "--bed", f"{EX}/example",
        "--covarFile", f"{EX}/covariates.txt",
        "--phenoFile", f"{EX}/phenotype.txt",
        "--remove", f"{EX}/fid_iid_to_remove.txt",
        "--bsize", "200", "--pred", fit + "_pred.list",
    ]
    for extra in ([], ["--htp", "COHORT"], ["--minMAC", "20"]):
        std = str(tmp_path / "std")
        fus = str(tmp_path / "fus")
        out = _run_cli(common + extra + ["--out", std])
        assert "fused packed-bytes" not in out
        out = _run_cli(common + extra + ["--out", fus],
                       {"REGENIE_TPU_FUSED": "1"})
        assert "fused packed-bytes scorer active" in out
        import glob, os as _os

        stds = sorted(glob.glob(std + "*_Y*.regenie"))
        assert stds
        for f in stds:
            g = f.replace(std, fus)
            assert open(f, "rb").read() == open(g, "rb").read(), (f, extra)
            _os.remove(f)
            _os.remove(g)


def test_fused_split_bf16_matches_f32():
    """bf16 hi/mid/lo split consts (the TPU fast layout) reproduce the
    f32 products to ~f32 precision in both the XLA fold and the pallas
    split kernel (interpret mode)."""
    N = 1025
    raw, nb, ind, flip, covz, resz, maskz, sden = _mk_case(11, B=16, N=N)
    c32 = fs.build_consts(covz, resz, maskz, ind, sden, nb=nb, dtype=np.float32)
    csp = fs.build_consts(covz, resz, maskz, ind, sden, nb=nb, split=True)
    assert csp.split and csp.Wp.dtype == jnp.bfloat16
    rawp = fs.pad_raw(raw)
    S1a, SQa, SMa = fs.fused_products_xla(jnp.asarray(rawp), c32.Wp)
    S1b, SQb, SMb = fs.fused_products_xla(jnp.asarray(rawp), csp.Wp)
    for a, b in ((S1a, S1b), (SQa, SQb), (SMa, SMb)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), rtol=2e-6, atol=1e-4)
    S1p, SQp, SMp = fs.fused_products(jnp.asarray(rawp), csp.Wp, interpret=True)
    for a, b in ((S1a, S1p), (SQa, SQp), (SMa, SMp)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), rtol=2e-6, atol=1e-4)


def test_fused_i8_matches_f32():
    """int8-limb consts (the production TPU layout: 4 exact fixed-point
    limbs per column, s8xs8->s32 MXU dots, exact int32 accumulation)
    reproduce the f32 products BETTER than f32 precision in both the
    XLA fold and the pallas i8 kernel (interpret mode), including the
    per-chromosome residual-column patch."""
    N = 1025
    raw, nb, ind, flip, covz, resz, maskz, sden = _mk_case(13, B=16, N=N)
    c32 = fs.build_consts(covz, resz, maskz, ind, sden, nb=nb, dtype=np.float32)
    ci8 = fs.build_consts(covz, resz, maskz, ind, sden, nb=nb, split="i8")
    assert isinstance(ci8.Wp, fs.I8Operand)
    assert ci8.Wp.limbs.dtype == jnp.int8
    rawp = fs.pad_raw(raw)
    S1a, SQa, SMa = fs.fused_products_xla(jnp.asarray(rawp), c32.Wp)
    S1b, SQb, SMb = fs.fused_products_xla(jnp.asarray(rawp), ci8.Wp)
    for a, b in ((S1a, S1b), (SQa, SQb), (SMa, SMb)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), rtol=2e-6, atol=1e-4)
    S1p, SQp, SMp = fs.fused_products(jnp.asarray(rawp), ci8.Wp, interpret=True)
    for a, b in ((S1a, S1p), (SQa, SQp), (SMa, SMp)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), rtol=2e-6, atol=1e-4)
    # the interpret kernel accumulates exactly in int32 and folds once;
    # the XLA i8 fold folds first and accumulates in f32 — equal to
    # (better than) f32 rounding
    for a, b in ((S1b, S1p), (SQb, SQp), (SMb, SMp)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-5, atol=5e-5)
    # residual-column patch requantizes with fresh scales
    K, P = covz.shape[1], resz.shape[1]
    res2 = resz * 3.0 + 0.125
    Cp = -(-ci8.Wp.scale.shape[0] // 128) * 128
    res_pl = fs.plane_order_rows(res2 * ind[:, None], nb)
    Wp2 = fs.patch_res_columns(
        ci8.Wp, res_pl.astype(np.float32), K, P, ci8.Wp.scale.shape[0], "i8")
    c32b = fs.build_consts(covz, res2, maskz, ind, sden, nb=nb,
                           dtype=np.float32)
    S1c = fs.fused_products_xla(jnp.asarray(rawp), Wp2)[0]
    S1d = fs.fused_products_xla(jnp.asarray(rawp), c32b.Wp)[0]
    np.testing.assert_allclose(np.asarray(S1c), np.asarray(S1d),
                               rtol=2e-6, atol=1e-4)


def test_fused_bt_cli_byte_identical(tmp_path):
    """Fused BT path (products against [Wcat | gsm^2 | maskf | case |
    ind], Firth/SPA correction rows decoded lazily from the packed
    bytes) is byte-identical to the standard BT pipeline across
    approx-Firth, SPA, exact-Firth + --af-cc, and HTP output."""
    EX = "/root/reference/example"
    fit = str(tmp_path / "fitb")
    _run_cli([
        "--step", "1", "--bed", f"{EX}/example",
        "--exclude", f"{EX}/snplist_rm.txt",
        "--covarFile", f"{EX}/covariates.txt",
        "--phenoFile", f"{EX}/phenotype_bin.txt",
        "--remove", f"{EX}/fid_iid_to_remove.txt",
        "--bsize", "100", "--bt", "--out", fit,
    ])
    common = [
        "--step", "2", "--bed", f"{EX}/example",
        "--covarFile", f"{EX}/covariates.txt",
        "--phenoFile", f"{EX}/phenotype_bin.txt",
        "--remove", f"{EX}/fid_iid_to_remove.txt",
        "--bsize", "200", "--bt", "--pred", fit + "_pred.list",
    ]
    scenarios = [
        ["--firth", "--approx", "--pThresh", "0.01"],
        ["--spa"],
        ["--firth", "--pThresh", "0.05", "--af-cc"],
        ["--htp", "TRIAL", "--firth", "--approx"],
    ]
    import glob, os as _os

    for extra in scenarios:
        std = str(tmp_path / "std")
        fus = str(tmp_path / "fus")
        _run_cli(common + extra + ["--out", std])
        out = _run_cli(common + extra + ["--out", fus],
                       {"REGENIE_TPU_FUSED": "1"})
        assert "BT/BED fast path" in out
        stds = sorted(glob.glob(std + "*_Y*.regenie"))
        assert stds
        for f in stds:
            g = f.replace(std, fus)
            assert open(f, "rb").read() == open(g, "rb").read(), (f, extra)
            _os.remove(f)
            _os.remove(g)


def test_fused_ct_cli_byte_identical(tmp_path):
    """Fused CT (Poisson) path — step2_ct shares BTChromState and
    score_block — byte-identical incl. HTP all-sample genotype counts."""
    EX = "/root/reference/example"
    fit = str(tmp_path / "fitc")
    _run_cli([
        "--step", "1", "--bed", f"{EX}/example",
        "--exclude", f"{EX}/snplist_rm.txt",
        "--covarFile", f"{EX}/covariates.txt",
        "--phenoFile", f"{EX}/phenotype_bin.txt",
        "--remove", f"{EX}/fid_iid_to_remove.txt",
        "--bsize", "100", "--ct", "--out", fit,
    ])
    common = [
        "--step", "2", "--bed", f"{EX}/example",
        "--covarFile", f"{EX}/covariates.txt",
        "--phenoFile", f"{EX}/phenotype_bin.txt",
        "--remove", f"{EX}/fid_iid_to_remove.txt",
        "--bsize", "200", "--ct", "--pred", fit + "_pred.list",
    ]
    import glob, os as _os

    for extra in ([], ["--htp", "TRIAL"]):
        std = str(tmp_path / "std")
        fus = str(tmp_path / "fus")
        _run_cli(common + extra + ["--out", std])
        out = _run_cli(common + extra + ["--out", fus],
                       {"REGENIE_TPU_FUSED": "1"})
        assert "CT/BED fast path" in out
        stds = sorted(glob.glob(std + "*_Y*.regenie"))
        assert stds
        for f in stds:
            g = f.replace(std, fus)
            assert open(f, "rb").read() == open(g, "rb").read(), (f, extra)
            _os.remove(f)
            _os.remove(g)


def test_fused_dom_rec_reffirst_byte_identical(tmp_path):
    """DOM/REC recodings (class-product identities) and --ref-first
    (rank-1 product transform) through the fused path are byte-identical
    to the standard pipeline, incl. REC --minHOMs and BT Firth."""
    EX = "/root/reference/example"
    import glob, os as _os

    fits = {}
    for tag, pheno, extra1 in (
        ("q", "phenotype.txt", []),
        ("b", "phenotype_bin.txt", ["--bt"]),
    ):
        fit = str(tmp_path / f"fit{tag}")
        _run_cli([
            "--step", "1", "--bed", f"{EX}/example",
            "--exclude", f"{EX}/snplist_rm.txt",
            "--covarFile", f"{EX}/covariates.txt",
            "--phenoFile", f"{EX}/{pheno}",
            "--remove", f"{EX}/fid_iid_to_remove.txt",
            "--bsize", "100", *extra1, "--out", fit,
        ])
        fits[tag] = fit
    scenarios = [
        ("q", "phenotype.txt", ["--test", "dominant"]),
        ("q", "phenotype.txt", ["--test", "recessive", "--minHOMs", "5"]),
        ("q", "phenotype.txt", ["--ref-first"]),
        ("b", "phenotype_bin.txt",
         ["--bt", "--test", "dominant", "--firth", "--approx"]),
        ("b", "phenotype_bin.txt",
         ["--bt", "--ref-first", "--firth", "--approx", "--pThresh", "0.02"]),
    ]
    for tag, pheno, extra in scenarios:
        common = [
            "--step", "2", "--bed", f"{EX}/example",
            "--covarFile", f"{EX}/covariates.txt",
            "--phenoFile", f"{EX}/{pheno}",
            "--remove", f"{EX}/fid_iid_to_remove.txt",
            "--bsize", "200", "--pred", fits[tag] + "_pred.list",
        ]
        std = str(tmp_path / "std")
        fus = str(tmp_path / "fus")
        _run_cli(common + extra + ["--out", std])
        out = _run_cli(common + extra + ["--out", fus],
                       {"REGENIE_TPU_FUSED": "1"})
        assert "fast path" in out, extra
        stds = sorted(glob.glob(std + "*_Y*.regenie"))
        assert stds
        for f in stds:
            g = f.replace(std, fus)
            assert open(f, "rb").read() == open(g, "rb").read(), (f, extra)
            _os.remove(f)
            _os.remove(g)


def test_fused_pgen_cli_byte_identical(tmp_path):
    """PGEN hardcall blocks repacked to 2-bit codes on the kept sample
    axis run the same fused path (32x less transfer than float64) —
    byte-identical for QT, DOM, and BT Firth."""
    EX = "/root/reference/example"
    import glob, os as _os

    fits = {}
    for tag, pheno, extra1 in (
        ("q", "phenotype.txt", []),
        ("b", "phenotype_bin.txt", ["--bt"]),
    ):
        fit = str(tmp_path / f"fit{tag}")
        _run_cli([
            "--step", "1", "--pgen", f"{EX}/example",
            "--exclude", f"{EX}/snplist_rm.txt",
            "--covarFile", f"{EX}/covariates.txt",
            "--phenoFile", f"{EX}/{pheno}",
            "--remove", f"{EX}/fid_iid_to_remove.txt",
            "--bsize", "100", *extra1, "--out", fit,
        ])
        fits[tag] = fit
    scenarios = [
        ("q", "phenotype.txt", []),
        ("q", "phenotype.txt", ["--test", "dominant"]),
        ("b", "phenotype_bin.txt",
         ["--bt", "--firth", "--approx", "--pThresh", "0.02"]),
    ]
    for tag, pheno, extra in scenarios:
        common = [
            "--step", "2", "--pgen", f"{EX}/example",
            "--covarFile", f"{EX}/covariates.txt",
            "--phenoFile", f"{EX}/{pheno}",
            "--remove", f"{EX}/fid_iid_to_remove.txt",
            "--bsize", "200", "--pred", fits[tag] + "_pred.list",
        ]
        std = str(tmp_path / "std")
        fus = str(tmp_path / "fus")
        _run_cli(common + extra + ["--out", std])
        out = _run_cli(common + extra + ["--out", fus],
                       {"REGENIE_TPU_FUSED": "1"})
        assert "PGEN fast path" in out, extra
        stds = sorted(glob.glob(std + "*_Y*.regenie"))
        assert stds
        for f in stds:
            g = f.replace(std, fus)
            assert open(f, "rb").read() == open(g, "rb").read(), (f, extra)
            _os.remove(f)
            _os.remove(g)


def _mk_bgen_case(seed, B=32, N=517, P=3, K=4):
    rng = np.random.default_rng(seed)
    k0 = rng.integers(0, 200, size=(B, N)).astype(np.uint8)
    k1 = np.minimum(
        rng.integers(0, 200, size=(B, N)), 255 - k0.astype(np.int64)
    ).astype(np.uint8)
    miss = rng.random(size=(B, N)) < 0.04
    k0 = np.where(miss, 255, k0).astype(np.uint8)
    k1 = np.where(miss, 255, k1).astype(np.uint8)
    ind = rng.random(N) > 0.1
    res = rng.normal(size=(N, P))
    maskf = (rng.random(size=(N, P)) > 0.08).astype(np.float64)
    covz = np.linalg.qr(rng.normal(size=(N, K)) * ind[:, None])[0]
    return k0, k1, miss, ind, res * ind[:, None], maskf * ind[:, None], covz


def test_bgen_fused_products_match_dosage_pipeline():
    """BGEN byte-plane products (dosage / square / missing / info-linear)
    equal the dense dosage-matrix products, and the epilogue reproduces
    the standard finalize+onepass scorer on the dosage matrix."""
    k0, k1, miss, ind, resz, maskz, covz = _mk_bgen_case(0)
    B, N = k0.shape
    P, K = resz.shape[1], covz.shape[1]
    sden = float(ind.sum() - K)

    # dense dosage reference (missing = -3)
    ds = np.where(miss, -3.0, (2.0 * np.where(miss, 0, k0).astype(np.float64)
                               + np.where(miss, 0, k1)) / 255.0)
    Gfin = np.asarray(finalize_block_step2(
        jnp.asarray(ds), jnp.asarray(ind), jnp.asarray(np.zeros(B, bool))
    ))
    CM, Mmat, ctr = m2.onepass_constants(covz, maskz, resz)
    exp = m2.score_qt_block_onepass(
        jnp.asarray(Gfin), jnp.asarray(covz), jnp.asarray(resz),
        jnp.asarray(maskz), jnp.asarray(CM), jnp.asarray(Mmat),
        jnp.asarray(ctr), sden,
    )

    indf = ind.astype(np.float64)
    Wext = np.concatenate(
        [covz, resz, (covz[:, :, None] * maskz[:, None, :]).reshape(N, K * P),
         maskz, indf[:, None]], axis=1,
    )
    Wp, usum = fs.sample_pack(Wext, split=False, dtype=np.float64)
    Np = Wp.shape[0]
    planes = np.zeros((B, 2, Np), np.uint8)
    planes[:, 0, :N] = k0
    planes[:, 1, :N] = k1
    S1, SQ, SM, IL = fs.bgen_fused_products_xla(jnp.asarray(planes), Wp)

    C_used = Wext.shape[1]
    stats, denum, sf, low, _af = fs.fused_epilogue(
        S1[:, :C_used], SQ[:, :C_used], SM[:, :C_used],
        jnp.asarray(np.zeros(B, bool)), jnp.asarray(usum),
        jnp.asarray(covz.T @ resz), jnp.asarray(Mmat), K, P, sden,
        float(indf.sum()),
    )
    np.testing.assert_allclose(np.asarray(stats), np.asarray(exp[0]),
                               rtol=1e-9, atol=1e-9)
    np.testing.assert_allclose(np.asarray(denum), np.asarray(exp[1]),
                               rtol=1e-9, atol=1e-9)
    np.testing.assert_allclose(np.asarray(sf), np.asarray(exp[2]), rtol=1e-9)

    # info-linear product: sum over nonmissing of (4p0+p1)*w
    p0 = np.where(miss, 0, k0).astype(np.float64) / 255.0
    p1v = np.where(miss, 0, k1).astype(np.float64) / 255.0
    exp_il = (4.0 * p0 + p1v) @ Wext
    np.testing.assert_allclose(np.asarray(IL)[:, :C_used], exp_il,
                               rtol=1e-9, atol=1e-9)


def test_bgen_fused_pallas_interpret_matches_xla():
    k0, k1, miss, ind, resz, maskz, covz = _mk_bgen_case(3, B=8, N=300)
    N = k0.shape[1]
    Wext = np.concatenate([covz, resz, maskz, ind.astype(float)[:, None]], axis=1)
    Wp32, _ = fs.sample_pack(Wext, split=False, dtype=np.float32)
    Wpsp, _ = fs.sample_pack(Wext, split=True)
    Np = Wp32.shape[0]
    planes = np.zeros((k0.shape[0], 2, Np), np.uint8)
    planes[:, 0, :N] = k0
    planes[:, 1, :N] = k1
    pj = jnp.asarray(planes)
    ref = fs.bgen_fused_products_xla(pj, Wp32)
    out = fs.bgen_fused_products(pj, Wpsp, interpret=True, tb=8)
    for a, b in zip(ref, out):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=2e-5, atol=2e-3)
    # int8-limb variant: byte planes shifted by -128 into s8 dots with
    # the column-sum correction; the XLA i8 fold is the oracle
    Wpi8, _ = fs.sample_pack(Wext, split="i8")
    assert isinstance(Wpi8, fs.I8Operand)
    ref8 = fs.bgen_fused_products_xla(pj, Wpi8)
    out8 = fs.bgen_fused_products(pj, Wpi8, interpret=True, tb=8)
    for a, b in zip(ref8, out8):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=2e-5, atol=2e-3)
    # and the quantized values themselves track the f32 operand
    for a, b in zip(ref, ref8):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-5, atol=1e-2)
    # narrow-Wq path (the production qs layout)
    qs = covz.shape[1] + resz.shape[1]
    Wq8, _ = fs.sample_pack(Wext[:, qs:], split="i8")
    outq = fs.bgen_fused_products(pj, Wpi8, Wq8, qs=qs,
                                  C_used=Wext.shape[1], interpret=True, tb=8)
    np.testing.assert_allclose(
        np.asarray(outq[1][:, qs:Wext.shape[1]]),
        np.asarray(ref8[1][:, qs:Wext.shape[1]]), rtol=2e-5, atol=2e-3)


def _assert_rows_equiv(f, g, rtol=1e-9, context=None):
    """Rows numerically identical to print precision: same shape, same
    NA pattern, every numeric field equal within rtol. (The BGEN fused
    path sums integer byte products before the /255 scaling; the
    standard path rounds each per-sample dosage first — f64 1e-16
    differences can flip the last printed digit, so byte equality is
    not guaranteed there.)"""
    la = open(f).read().splitlines()
    lb = open(g).read().splitlines()
    assert len(la) == len(lb), (f, context)
    assert la[0] == lb[0]
    for ra, rb in zip(la[1:], lb[1:]):
        ta, tb = ra.split(), rb.split()
        assert len(ta) == len(tb), (ra, rb, context)
        for xa, xb in zip(ta, tb):
            if xa == xb:
                continue
            fa, fb = float(xa), float(xb)  # raises if NA mismatch
            assert abs(fa - fb) <= rtol * max(1.0, abs(fa)), (ra, rb, context)


def test_fused_bgen_cli_byte_identical(tmp_path):
    """BGEN v1.2-8bit fused path (probability byte planes, dosage
    moments from exact-bf16 dots, INFO from the info-linear products,
    correction rows reconstructed on device) matches the standard decode
    pipeline to print precision (byte-identical up to last-digit f64
    rounding-order effects)."""
    EX = "/root/reference/example"
    import glob, os as _os

    fits = {}
    for tag, pheno, extra1 in (
        ("q", "phenotype.txt", []),
        ("b", "phenotype_bin.txt", ["--bt"]),
    ):
        fit = str(tmp_path / f"fit{tag}")
        _run_cli([
            "--step", "1", "--bed", f"{EX}/example",
            "--exclude", f"{EX}/snplist_rm.txt",
            "--covarFile", f"{EX}/covariates.txt",
            "--phenoFile", f"{EX}/{pheno}",
            "--remove", f"{EX}/fid_iid_to_remove.txt",
            "--bsize", "100", *extra1, "--out", fit,
        ])
        fits[tag] = fit
    scenarios = [
        ("q", "phenotype.txt", []),
        ("q", "phenotype.txt", ["--ref-first"]),
        ("q", "phenotype.txt", ["--minINFO", "0.97"]),
        ("b", "phenotype_bin.txt",
         ["--bt", "--firth", "--approx", "--pThresh", "0.02"]),
        ("b", "phenotype_bin.txt", ["--bt", "--spa", "--af-cc"]),
    ]
    for tag, pheno, extra in scenarios:
        common = [
            "--step", "2", "--bgen", f"{EX}/example.bgen",
            "--covarFile", f"{EX}/covariates.txt",
            "--phenoFile", f"{EX}/{pheno}",
            "--remove", f"{EX}/fid_iid_to_remove.txt",
            "--bsize", "200", "--pred", fits[tag] + "_pred.list",
        ]
        std = str(tmp_path / "std")
        fus = str(tmp_path / "fus")
        _run_cli(common + extra + ["--out", std])
        out = _run_cli(common + extra + ["--out", fus],
                       {"REGENIE_TPU_FUSED": "1"})
        assert "BGEN fast path" in out, extra
        stds = sorted(glob.glob(std + "*_Y*.regenie"))
        assert stds
        for f in stds:
            g = f.replace(std, fus)
            _assert_rows_equiv(f, g, context=extra)
            _os.remove(f)
            _os.remove(g)


def test_fused_multichrom_res_patching(tmp_path):
    """3-chromosome run: the per-chromosome residual-column patch of the
    static packed operand reproduces the full-rebuild outputs exactly."""
    EX = "/root/reference/example"
    import glob

    fit = str(tmp_path / "f3")
    _run_cli([
        "--step", "1", "--bed", f"{EX}/example_3chr",
        "--covarFile", f"{EX}/covariates.txt",
        "--phenoFile", f"{EX}/phenotype.txt",
        "--bsize", "100", "--out", fit,
    ])
    common = [
        "--step", "2", "--bed", f"{EX}/example_3chr",
        "--covarFile", f"{EX}/covariates.txt",
        "--phenoFile", f"{EX}/phenotype.txt",
        "--bsize", "150", "--pred", fit + "_pred.list",
    ]
    std = str(tmp_path / "std")
    fus = str(tmp_path / "fus")
    _run_cli(common + ["--out", std])
    out = _run_cli(common + ["--out", fus], {"REGENIE_TPU_FUSED": "1"})
    assert "fast path" in out
    stds = sorted(glob.glob(std + "*_Y*.regenie"))
    assert stds
    for f in stds:
        g = f.replace(std, fus)
        assert open(f, "rb").read() == open(g, "rb").read(), f


def test_fused_mesh_cli_byte_identical(tmp_path):
    """VERDICT r1 #1: the fused packed-bytes scorer composed with the
    variant-sharded device mesh. Step-2 runs under REGENIE_TPU_FUSED=1 +
    REGENIE_TPU_MESH=1 on the 8-device CPU mesh must be byte-identical
    to the single-device fused path for QT (bed), BT (bed, Firth/SPA)
    and QT over BGEN probability planes (rank-3 padded shard)."""
    import glob

    EX = "/root/reference/example"
    mesh_env = {
        "REGENIE_TPU_FUSED": "1",
        "JAX_PLATFORMS": "cpu",
        "XLA_FLAGS": "--xla_force_host_platform_device_count=8",
        "REGENIE_TPU_MESH": "1",
    }
    fit_qt = str(tmp_path / "fq")
    fit_bt = str(tmp_path / "fb")
    _run_cli([
        "--step", "1", "--bed", f"{EX}/example",
        "--exclude", f"{EX}/snplist_rm.txt",
        "--covarFile", f"{EX}/covariates.txt",
        "--phenoFile", f"{EX}/phenotype.txt",
        "--bsize", "100", "--out", fit_qt,
    ])
    _run_cli([
        "--step", "1", "--bed", f"{EX}/example",
        "--exclude", f"{EX}/snplist_rm.txt",
        "--covarFile", f"{EX}/covariates.txt",
        "--phenoFile", f"{EX}/phenotype_bin.txt",
        "--bsize", "100", "--bt", "--out", fit_bt,
    ])
    cases = {
        "qt": ["--bed", f"{EX}/example", "--phenoFile", f"{EX}/phenotype.txt",
               "--pred", fit_qt + "_pred.list"],
        "bt": ["--bed", f"{EX}/example", "--phenoFile",
               f"{EX}/phenotype_bin.txt", "--bt", "--firth", "--approx",
               "--pThresh", "0.1", "--pred", fit_bt + "_pred.list"],
        "bgen": ["--bgen", f"{EX}/example.bgen",
                 "--phenoFile", f"{EX}/phenotype.txt",
                 "--pred", fit_qt + "_pred.list"],
    }
    for name, extra in cases.items():
        common = ["--step", "2", "--covarFile", f"{EX}/covariates.txt",
                  # bsize NOT divisible by 8: exercises the mesh pad rows
                  "--bsize", "170"] + extra
        one = str(tmp_path / f"one_{name}")
        msh = str(tmp_path / f"msh_{name}")
        out1 = _run_cli(common + ["--out", one], {"REGENIE_TPU_FUSED": "1"})
        assert "fast path" in out1, name
        out8 = _run_cli(common + ["--out", msh], mesh_env)
        assert "fast path" in out8 and "multi-chip mesh: 8" in out8, name
        ones = sorted(glob.glob(one + "*_Y*.regenie"))
        assert ones, name
        for f in ones:
            g = f.replace(one, msh)
            assert open(f, "rb").read() == open(g, "rb").read(), (name, f)


def test_fused_chrx_byte_identical(tmp_path):
    """chrX non-PAR blocks on the QT fused path: the male tail columns
    reproduce the hemizygous stats (MAC with 0.5*g males, male g>=1
    counted hom, compute_mac Geno.cpp:3077) — CLI output byte-identical
    to the dense (non-fused) pipeline, on a mixed autosome+chrX dataset
    with missingness, multiple traits and HTP genocounts."""
    import os
    import subprocess
    import sys

    rng = np.random.default_rng(9)
    N, M = 150, 60
    sex = np.array([1] * 70 + [2] * 80)  # fam: 1=male 2=female
    male = sex == 1
    G = rng.integers(0, 3, size=(M, N))
    # chrX rows: males diploid-coded 0/2 (default dosage compensation)
    for v in range(M // 2, M):
        G[v] = np.where(male, 2 * rng.integers(0, 2, size=N), G[v])
    miss = rng.random((M, N)) < 0.03
    codes = np.where(G == 2, 0, np.where(G == 1, 2, 3)).astype(np.uint8)
    codes[miss] = 1
    pad = (-N) % 4
    codes = np.concatenate(
        [codes, np.zeros((M, pad), np.uint8)], axis=1).reshape(M, -1, 4)
    byts = (codes[:, :, 0] | (codes[:, :, 1] << 2)
            | (codes[:, :, 2] << 4) | (codes[:, :, 3] << 6))
    prefix = str(tmp_path / "xmix")
    with open(prefix + ".bed", "wb") as fh:
        fh.write(b"\x6c\x1b\x01" + byts.astype(np.uint8).tobytes())
    with open(prefix + ".bim", "w") as fh:
        for v in range(M // 2):
            fh.write(f"1 a{v} 0 {v + 1} A B\n")
        for v in range(M // 2, M):
            fh.write(f"23 x{v} 0 {30000000 + v} A B\n")  # non-PAR chrX
    with open(prefix + ".fam", "w") as fh:
        for i in range(N):
            fh.write(f"F{i} I{i} 0 0 {sex[i]} 0\n")
    with open(str(tmp_path / "ph.txt"), "w") as fh:
        fh.write("FID IID Y1 Y2\n")
        Y = rng.normal(size=(N, 2))
        Y[rng.random(N) < 0.1, 1] = np.nan  # incomplete trait
        for i in range(N):
            v2 = "NA" if np.isnan(Y[i, 1]) else f"{Y[i, 1]:.5f}"
            fh.write(f"F{i} I{i} {Y[i, 0]:.5f} {v2}\n")

    # sample filtering exercises the kept-axis -> file-axis scatter of
    # the male indicator (dropped males must contribute nothing)
    with open(str(tmp_path / "rm.txt"), "w") as fh:
        for i in (3, 40, 90, 120):
            fh.write(f"F{i} I{i}\n")

    def run(fused, out, htp=False):
        env = dict(os.environ)
        env["REGENIE_TPU_PLATFORM"] = "cpu"
        env["REGENIE_TPU_FUSED"] = "1" if fused else "0"
        args = [sys.executable, "-m", "regenie_tpu", "--step", "2",
                "--bed", prefix, "--phenoFile", str(tmp_path / "ph.txt"),
                "--remove", str(tmp_path / "rm.txt"),
                "--bsize", "25", "--ignore-pred", "--minMAC", "1",
                "--out", out]
        if htp:
            args += ["--htp", "XT"]
        r = subprocess.run(args, capture_output=True, text=True,
                           cwd="/root/repo", env=env, timeout=600)
        assert r.returncode == 0, r.stdout + r.stderr
        return r.stdout

    for htp in (False, True):
        sfx = "_htp" if htp else ""
        out_f = run(True, str(tmp_path / f"fus{sfx}"), htp)
        assert "fast path" in out_f
        run(False, str(tmp_path / f"std{sfx}"), htp)
        for ph in ("Y1", "Y2"):
            a = open(str(tmp_path / f"fus{sfx}_{ph}.regenie"), "rb").read()
            b = open(str(tmp_path / f"std{sfx}_{ph}.regenie"), "rb").read()
            assert a == b, (htp, ph)


@pytest.mark.parametrize("mode", ["bt", "ct"])
def test_fused_chrx_bt_byte_identical(tmp_path, mode):
    """chrX non-PAR on the BT/CT fused path (male tail + case*male
    columns in the BT-family operand — hemizygous HTP genotype counts
    ride the products): approx-Firth BT and Poisson CT CLI output,
    split and HTP formats, byte-identical to the dense pipeline."""
    import os
    import subprocess
    import sys

    rng = np.random.default_rng(13)
    N, M = 200, 40
    sex = np.array([1] * 90 + [2] * 110)
    male = sex == 1
    G = rng.integers(0, 3, size=(M, N))
    for v in range(M // 2, M):
        G[v] = np.where(male, 2 * rng.integers(0, 2, size=N), G[v])
    miss = rng.random((M, N)) < 0.02
    codes = np.where(G == 2, 0, np.where(G == 1, 2, 3)).astype(np.uint8)
    codes[miss] = 1
    pad = (-N) % 4
    codes = np.concatenate(
        [codes, np.zeros((M, pad), np.uint8)], axis=1).reshape(M, -1, 4)
    byts = (codes[:, :, 0] | (codes[:, :, 1] << 2)
            | (codes[:, :, 2] << 4) | (codes[:, :, 3] << 6))
    prefix = str(tmp_path / "xbt")
    with open(prefix + ".bed", "wb") as fh:
        fh.write(b"\x6c\x1b\x01" + byts.astype(np.uint8).tobytes())
    with open(prefix + ".bim", "w") as fh:
        for v in range(M // 2):
            fh.write(f"1 a{v} 0 {v + 1} A B\n")
        for v in range(M // 2, M):
            fh.write(f"23 x{v} 0 {30000000 + v} A B\n")
    with open(prefix + ".fam", "w") as fh:
        for i in range(N):
            fh.write(f"F{i} I{i} 0 0 {sex[i]} 0\n")
    with open(str(tmp_path / "ph.txt"), "w") as fh:
        fh.write("FID IID Y1\n")
        if mode == "bt":
            y = (rng.random(N) < 0.35).astype(int)
        else:
            y = rng.poisson(2.0, size=N)
        for i in range(N):
            fh.write(f"F{i} I{i} {y[i]}\n")
    mode_args = (["--bt", "--firth", "--approx", "--pThresh", "0.2"]
                 if mode == "bt" else ["--ct"])

    def run(fused, out, htp=False):
        env = dict(os.environ)
        env["REGENIE_TPU_PLATFORM"] = "cpu"
        env["REGENIE_TPU_FUSED"] = "1" if fused else "0"
        r = subprocess.run(
            [sys.executable, "-m", "regenie_tpu", "--step", "2",
             "--bed", prefix, "--phenoFile", str(tmp_path / "ph.txt"),
             *mode_args, *(["--htp", "XT"] if htp else []),
             "--bsize", "15", "--ignore-pred", "--minMAC", "1",
             "--out", out],
            capture_output=True, text=True, cwd="/root/repo", env=env,
            timeout=600)
        assert r.returncode == 0, r.stdout + r.stderr
        return r.stdout

    for htp in (False, True):
        sfx = "_htp" if htp else ""
        out_f = run(True, str(tmp_path / f"fus{sfx}"), htp)
        assert "fast path" in out_f, htp
        run(False, str(tmp_path / f"std{sfx}"), htp)
        a = open(str(tmp_path / f"fus{sfx}_Y1.regenie"), "rb").read()
        b = open(str(tmp_path / f"std{sfx}_Y1.regenie"), "rb").read()
        assert a == b, htp


def _write_bgen12(path, ids, chroms, positions, probs8):
    """Minimal BGEN v1.2 (layout 2, zlib, 8-bit, unphased diploid) writer
    for test fixtures. probs8: [M, N, 2] uint8 (p0, p1 scaled by 255)."""
    import struct
    import zlib

    M, N, _ = probs8.shape
    sample_block = struct.pack("<II", 8 + sum(6 + len(s) for s in ids), N)
    for s in ids:
        sample_block += struct.pack("<H", len(s)) + s.encode()
    # LSI actually = 8 + sum(2 + len(s)); fix:
    lsi = 8 + sum(2 + len(s) for s in ids)
    sample_block = struct.pack("<II", lsi, N)
    for s in ids:
        sample_block += struct.pack("<H", len(s)) + s.encode()
    hlen = 20
    flags = 1 | (2 << 2) | (1 << 31)  # zlib, layout2, sample ids
    offset = hlen + lsi
    with open(path, "wb") as fh:
        fh.write(struct.pack("<IIII", offset, hlen, M, N))
        fh.write(b"bgen")
        fh.write(struct.pack("<I", flags))
        fh.write(sample_block)
        for v in range(M):
            rsid = f"s{v}".encode()
            chrom = str(chroms[v]).encode()
            fh.write(struct.pack("<H", len(rsid)) + rsid)
            fh.write(struct.pack("<H", len(rsid)) + rsid)
            fh.write(struct.pack("<H", len(chrom)) + chrom)
            fh.write(struct.pack("<I", int(positions[v])))
            fh.write(struct.pack("<H", 2))
            fh.write(struct.pack("<I", 1) + b"A")
            fh.write(struct.pack("<I", 1) + b"C")
            gblock = (struct.pack("<IHBB", N, 2, 2, 2)
                      + bytes([2] * N) + bytes([0, 8])
                      + probs8[v].tobytes())
            comp = zlib.compress(gblock, 6)
            fh.write(struct.pack("<II", len(comp) + 4, len(gblock)))
            fh.write(comp)


@pytest.mark.parametrize("mode", ["qt", "bt"])
def test_fused_chrx_bgen_byte_identical(tmp_path, mode):
    """chrX non-PAR on the QT and BT fused BGEN paths (dosage data; the
    male tail gives the 0.5*g male MAC; BT skips the hardcall class
    moves, which are nonlinear in dosages): CLI output byte-identical
    to the dense pipeline on a mixed autosome+chrX BGEN."""
    import os
    import subprocess
    import sys

    rng = np.random.default_rng(21)
    N, M = 120, 30
    sex = np.array([1] * 50 + [2] * 70)
    male = sex == 1
    probs8 = np.zeros((M, N, 2), np.uint8)
    for v in range(M):
        g = rng.integers(0, 3, size=N)
        if v >= M // 2:  # chrX: males diploid-coded 0/2
            g = np.where(male, 2 * rng.integers(0, 2, size=N), g)
        # dosage jitter on some samples
        p0 = np.where(g == 0, 255, np.where(g == 1, 0, 0)).astype(np.int64)
        p1 = np.where(g == 1, 255, 0).astype(np.int64)
        jit = rng.integers(0, 12, size=N)
        p0 = np.clip(p0 - jit * (g == 0), 0, 255)
        probs8[v, :, 0] = p0
        probs8[v, :, 1] = p1
    chroms = [1] * (M // 2) + [23] * (M - M // 2)
    positions = list(range(1, M // 2 + 1)) + [
        30000000 + v for v in range(M - M // 2)]
    ids = [f"I{i}" for i in range(N)]
    bg = str(tmp_path / "x.bgen")
    _write_bgen12(bg, ids, chroms, positions, probs8)
    with open(str(tmp_path / "samp.sample"), "w") as fh:
        fh.write("ID_1 ID_2 missing sex\n0 0 0 D\n")
        for i, s in enumerate(ids):
            fh.write(f"{s} {s} 0 {sex[i]}\n")
    with open(str(tmp_path / "ph.txt"), "w") as fh:
        # two traits: single-pheno runs force strict mode (Pheno.cpp:201)
        # which keeps the QT fused path off
        fh.write("FID IID Y1 Y2\n")
        for i, s in enumerate(ids):
            if mode == "bt":
                fh.write(f"{s} {s} {int(rng.random() < 0.4)} "
                         f"{int(rng.random() < 0.35)}\n")
            else:
                fh.write(f"{s} {s} {rng.normal():.5f} {rng.normal():.5f}\n")
    mode_args = (["--bt", "--firth", "--approx", "--pThresh", "0.2"]
                 if mode == "bt" else [])

    def run(fused, out):
        env = dict(os.environ)
        env["REGENIE_TPU_PLATFORM"] = "cpu"
        env["REGENIE_TPU_FUSED"] = "1" if fused else "0"
        r = subprocess.run(
            [sys.executable, "-m", "regenie_tpu", "--step", "2",
             "--bgen", bg, "--sample", str(tmp_path / "samp.sample"),
             "--phenoFile", str(tmp_path / "ph.txt"), *mode_args,
             "--bsize", "12", "--ignore-pred", "--minMAC", "1",
             "--out", out],
            capture_output=True, text=True, cwd="/root/repo", env=env,
            timeout=600)
        assert r.returncode == 0, r.stdout + r.stderr
        return r.stdout

    out_f = run(True, str(tmp_path / "fus"))
    assert "fast path" in out_f
    run(False, str(tmp_path / "std"))
    for ph in ("Y1", "Y2"):
        a = open(str(tmp_path / f"fus_{ph}.regenie"), "rb").read()
        b = open(str(tmp_path / f"std_{ph}.regenie"), "rb").read()
        assert a == b, ph


def test_fused_strict_single_pheno_byte_identical(tmp_path):
    """Strict mode (forced for single-pheno runs, Pheno.cpp:201) rides
    the fused path: the constant-denominator convention of the
    reference's strict score branch (Step2_Models.cpp:352) byte-
    identical to the dense pipeline — BED and BGEN, with covariates
    and NA phenotypes (strict drops those samples)."""
    import glob
    import os
    import subprocess
    import sys

    EX = "/root/reference/example"
    for tag, src_args in (
        ("bed", ["--bed", f"{EX}/example"]),
        ("bgen", ["--bgen", f"{EX}/example.bgen"]),
    ):
        common = ["--step", "2", *src_args,
                  "--covarFile", f"{EX}/covariates.txt",
                  "--phenoFile", f"{EX}/phenotype.txt",
                  "--phenoCol", "Y1",  # single pheno -> strict forced
                  "--bsize", "170", "--ignore-pred"]

        def run(fused, out):
            env = dict(os.environ)
            env["REGENIE_TPU_PLATFORM"] = "cpu"
            env["REGENIE_TPU_FUSED"] = "1" if fused else "0"
            r = subprocess.run(
                [sys.executable, "-m", "regenie_tpu"] + common
                + ["--out", out],
                capture_output=True, text=True, cwd="/root/repo", env=env,
                timeout=600)
            assert r.returncode == 0, r.stdout + r.stderr
            return r.stdout

        out_f = run(True, str(tmp_path / f"fus_{tag}"))
        assert "fast path" in out_f, tag
        run(False, str(tmp_path / f"std_{tag}"))
        a = open(str(tmp_path / f"fus_{tag}_Y1.regenie"), "rb").read()
        b = open(str(tmp_path / f"std_{tag}_Y1.regenie"), "rb").read()
        assert a == b, tag


def test_fused_mesh2d_cli_byte_identical(tmp_path):
    """VERDICT r2 #8: sample-sharded fused step 2. Under
    REGENIE_TPU_MESH_2D=1 on the 8-device CPU mesh the scorer tiles as
    2 variants x 4 samples — the plane-packed operand's nbp rows shard
    over `smp`, partial S1/SQ/SM products psum before the epilogue.
    QT, BT approx-Firth and T2E runs must be byte-identical to the
    single-device fused path."""
    import glob
    import subprocess as sp

    EX = "/root/reference/example"
    mesh2d_env = {
        "REGENIE_TPU_FUSED": "1",
        "JAX_PLATFORMS": "cpu",
        "XLA_FLAGS": "--xla_force_host_platform_device_count=8",
        "REGENIE_TPU_MESH": "1",
        "REGENIE_TPU_MESH_2D": "1",
    }
    # synthetic T2E phenotype over the example cohort
    ids = [l.split()[:2] for l in open(f"{EX}/example.fam")]
    rng = np.random.default_rng(17)
    t2e_ph = str(tmp_path / "ph_t2e.txt")
    with open(t2e_ph, "w") as fh:
        fh.write("FID IID T1 E1\n")
        for fid, iid in ids:
            fh.write(f"{fid} {iid} {rng.exponential(9.0):.4f} "
                     f"{int(rng.random() < 0.7)}\n")
    cases = {
        "qt": ["--bed", f"{EX}/example", "--phenoFile", f"{EX}/phenotype.txt",
               "--ignore-pred"],
        "bt": ["--bed", f"{EX}/example", "--phenoFile",
               f"{EX}/phenotype_bin.txt", "--bt", "--firth", "--approx",
               "--pThresh", "0.1", "--ignore-pred"],
        "t2e": ["--bed", f"{EX}/example", "--phenoFile", t2e_ph, "--t2e",
                "--phenoColList", "T1", "--eventColList", "E1",
                "--firth", "--approx", "--pThresh", "0.9", "--ignore-pred"],
    }
    for name, extra in cases.items():
        common = ["--step", "2", "--covarFile", f"{EX}/covariates.txt",
                  # bsize NOT divisible by 2: exercises var-axis pad rows
                  "--bsize", "171"] + extra
        one = str(tmp_path / f"one_{name}")
        m2d = str(tmp_path / f"m2d_{name}")
        out1 = _run_cli(common + ["--out", one], {"REGENIE_TPU_FUSED": "1"})
        assert "fast path" in out1, name
        out2 = _run_cli(common + ["--out", m2d], mesh2d_env)
        assert "fast path" in out2 and "2-D mesh for the fused scorer: 2 x 4" in out2, name
        ones = sorted(glob.glob(one + "*_*.regenie"))
        assert ones, name
        for f in ones:
            g = f.replace(one, m2d)
            assert open(f, "rb").read() == open(g, "rb").read(), (name, f)
