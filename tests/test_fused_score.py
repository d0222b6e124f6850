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
