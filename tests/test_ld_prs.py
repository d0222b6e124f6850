"""LD-matrix output formats (--compute-corr / --output-corr-text /
--skip-scaleG / --sparse-thr), --use-prs step-2 predictions, and the
--singleton-carrier mask rule.

LD format oracle follows print_ld (Data.cpp:4092-4207) + setup_output
(Data.cpp:1986-2001): binary = int32 [N, M] header + uint16-quantized
r^2 upper triangle; text (--skip-scaleG) = "M N" header + covariance
matrix; sparse (--sparse-thr T) = "M N" header + SD line + 1-based
"i j corr" triplets with |corr| >= T.
"""

import os
import subprocess
import sys

import numpy as np
import pytest

EX = "/root/reference/example"


def _run(args, check=True):
    env = dict(os.environ)
    env["REGENIE_TPU_PLATFORM"] = "cpu"
    r = subprocess.run(
        [sys.executable, "-m", "regenie_tpu"] + args,
        capture_output=True, text=True, cwd="/root/repo", env=env, timeout=900,
    )
    if check:
        assert r.returncode == 0, r.stdout[-3000:] + r.stderr[-2000:]
    return r


def _decode_bed(prefix, snp_rows):
    """[M, N] genotypes (missing=-3) for the given .bim row indices."""
    n = sum(1 for _ in open(prefix + ".fam"))
    nb = (n + 3) // 4
    lut = np.array([2, -3, 1, 0], dtype=np.float64)  # plink 2-bit codes
    out = []
    with open(prefix + ".bed", "rb") as fh:
        for r in snp_rows:
            fh.seek(3 + r * nb)
            byts = np.frombuffer(fh.read(nb), np.uint8)
            codes = (byts[:, None] >> np.array([0, 2, 4, 6])[None, :]) & 3
            out.append(lut[codes.reshape(-1)[:n]])
    return np.stack(out)


@pytest.fixture(scope="module")
def ld_setup(tmp_path_factory):
    d = tmp_path_factory.mktemp("ld")
    ids = [l.split()[1] for l in open(f"{EX}/example.bim")][:25]
    rows = list(range(25))
    ext = str(d / "ids.txt")
    with open(ext, "w") as fh:
        fh.write("\n".join(ids) + "\n")

    # oracle: decode, mean-impute, center (intercept-only covariates)
    G = _decode_bed(f"{EX}/example", rows)
    for k in range(G.shape[0]):
        m = G[k] != -3
        G[k] = np.where(m, G[k], G[k][m].mean())
    G = G - G.mean(axis=1, keepdims=True)
    LD = G @ G.T
    return d, ext, len(ids), LD


def test_ld_binary_format(ld_setup):
    d, ext, M, LD = ld_setup
    out = str(d / "ld_bin")
    _run(["--step", "2", "--bed", f"{EX}/example",
          "--phenoFile", f"{EX}/phenotype.txt",
          "--compute-corr", "--extract", ext, "--out", out])
    raw = open(out + ".corr", "rb").read()
    hdr = np.frombuffer(raw[:8], np.int32)
    assert hdr[0] == 500 and hdr[1] == M  # [n_samples, M] (Data.cpp:1996)
    sds = np.sqrt(np.diag(LD))
    C = LD / sds[:, None] / sds[None, :]
    iu = np.triu_indices(M, k=1)
    expect = (C[iu] ** 2 * 65535 + 0.5).astype(np.uint16)
    got = np.frombuffer(raw[8:], np.uint16)
    assert got.shape == expect.shape
    # formatting/quantization is exact; correlation math to f64 oracle
    assert np.abs(got.astype(int) - expect.astype(int)).max() <= 1
    snplist = [l.strip() for l in open(out + ".corr.snplist")]
    assert len(snplist) == M


def test_ld_text_skip_scaleG(ld_setup):
    d, ext, M, LD = ld_setup
    out = str(d / "ld_txt")
    _run(["--step", "2", "--bed", f"{EX}/example",
          "--phenoFile", f"{EX}/phenotype.txt",
          "--compute-corr", "--output-corr-text", "--skip-scaleG",
          "--extract", ext, "--out", out])
    lines = open(out + ".corr").read().splitlines()
    assert lines[0] == f"{M} 500"  # header (setup_output, Data.cpp:1993)
    vals = np.array([[float(x) for x in l.split()] for l in lines[1:]])
    assert vals.shape == (M, M)
    LDc = LD.copy()
    np.fill_diagonal(LDc, np.maximum(np.diag(LDc), 1e-6))
    assert np.allclose(vals, LDc, rtol=2e-5, atol=1e-4)


def test_ld_sparse_thr(ld_setup):
    d, ext, M, LD = ld_setup
    thr = 0.3
    out = str(d / "ld_sp")
    _run(["--step", "2", "--bed", f"{EX}/example",
          "--phenoFile", f"{EX}/phenotype.txt",
          "--compute-corr", "--skip-scaleG", "--sparse-thr", str(thr),
          "--extract", ext, "--out", out])
    lines = open(out + ".corr").read().splitlines()
    assert lines[0] == f"{M} 500"
    sds_got = np.array([float(x) for x in lines[1].split()])
    LDc = LD.copy()
    np.fill_diagonal(LDc, np.maximum(np.diag(LDc), 1e-6))
    sds = np.sqrt(np.diag(LDc))
    assert np.allclose(sds_got, sds, rtol=2e-5)
    C = LDc / sds[:, None] / sds[None, :]
    got = {}
    for l in lines[2:]:
        i, j, v = l.split()
        got[(int(i), int(j))] = float(v)
    iu = np.triu_indices(M, k=1)
    expect = {
        (int(i) + 1, int(j) + 1): C[i, j]
        for i, j in zip(*iu) if abs(C[i, j]) >= thr
    }
    assert set(got) == set(expect)
    for k in got:
        assert abs(got[k] - expect[k]) < 2e-5


def test_sparse_thr_requires_skip_scaleG(ld_setup):
    d, ext, _, _ = ld_setup
    r = _run(["--step", "2", "--bed", f"{EX}/example",
              "--phenoFile", f"{EX}/phenotype.txt",
              "--compute-corr", "--sparse-thr", "0.3",
              "--extract", ext, "--out", str(d / "x")], check=False)
    assert r.returncode != 0
    assert "skip-scaleG" in (r.stdout + r.stderr)


# ---------------------------------------------------------------------------
# --use-prs


def test_use_prs_matches_constant_loco(tmp_path):
    """Step 2 with --use-prs on --print-prs output must equal a run whose
    .loco files repeat the PRS row for every chromosome (blup_read,
    Pheno.cpp:1297-1312: the PRS offset is chromosome-independent)."""
    d = tmp_path
    fit = str(d / "fit")
    _run(["--step", "1", "--bed", f"{EX}/example_3chr",
          "--phenoFile", f"{EX}/phenotype.txt",
          "--covarFile", f"{EX}/covariates.txt",
          "--bsize", "100", "--print-prs", "--out", fit])
    assert os.path.isfile(fit + "_prs.list")

    # synthetic LOCO: every chromosome row = the whole-genome PRS row
    fake_list = str(d / "fake_pred.list")
    with open(fake_list, "w") as outlist:
        for line in open(fit + "_prs.list"):
            name, path = line.split()
            hdr, row = open(path).read().splitlines()
            vals = row.split()[1:]
            fake = str(d / f"fake_{name}.loco")
            with open(fake, "w") as fh:
                fh.write(hdr + "\n")
                for c in (1, 2, 3):
                    fh.write(" ".join([str(c)] + vals) + "\n")
            outlist.write(f"{name} {fake}\n")

    common = ["--step", "2", "--bed", f"{EX}/example_3chr",
              "--phenoFile", f"{EX}/phenotype.txt",
              "--covarFile", f"{EX}/covariates.txt", "--bsize", "200"]
    _run(common + ["--pred", fit + "_prs.list", "--use-prs",
                   "--out", str(d / "prs")])
    _run(common + ["--pred", fake_list, "--out", str(d / "loco")])
    for ph in ("Y1", "Y2"):
        a = open(str(d / f"prs_{ph}.regenie")).read()
        b = open(str(d / f"loco_{ph}.regenie")).read()
        assert a == b


def test_use_prs_rejects_loco_files(tmp_path):
    d = tmp_path
    fit = str(d / "fit")
    _run(["--step", "1", "--bed", f"{EX}/example_3chr",
          "--phenoFile", f"{EX}/phenotype.txt",
          "--bsize", "100", "--out", fit])
    r = _run(["--step", "2", "--bed", f"{EX}/example_3chr",
              "--phenoFile", f"{EX}/phenotype.txt",
              "--bsize", "200", "--pred", fit + "_pred.list", "--use-prs",
              "--out", str(d / "bad")], check=False)
    assert r.returncode != 0
    assert "must start with 0" in (r.stdout + r.stderr)


# ---------------------------------------------------------------------------
# --singleton-carrier


def test_singleton_carrier_rule():
    """Singletons by carrier count (Geno.cpp:3085): a single homozygous
    carrier (MAC=2) is a singleton only under --singleton-carrier; two
    het carriers (MAC=2) are a singleton under neither rule."""
    from regenie_tpu.cli import build_parser, args_to_params
    from regenie_tpu.models.masks import build_masks_for_set
    from regenie_tpu.io.setfiles import VariantSet

    N, M = 60, 4
    G = np.zeros((M, N))
    G[0, 0] = 1            # MAC 1, carriers 1: singleton both ways
    G[1, 1] = 2            # MAC 2, carriers 1: singleton with the flag
    G[2, 2] = G[2, 3] = 1  # MAC 2, carriers 2: never a singleton
    G[3, :30] = 1          # common; keeps the set non-degenerate
    ind = np.ones(N, dtype=bool)
    ns = np.full(M, N)
    total = G.sum(axis=1)
    af1 = total / (2 * ns)
    mac1 = np.minimum(total, 2 * ns - total)
    ignored = np.zeros(M, dtype=bool)
    anno = np.ones(M, dtype=np.uint64)
    masked = np.ones((N, 1), dtype=bool)

    class MD:
        name = "M1"
        bits = np.uint64(1)
        region = -1
        region_name = ""

    vset = VariantSet(ID="SET1", chrom=1, physpos=1,
                      snp_indices=np.arange(M))

    def singleton_members(flag):
        parser = build_parser()
        args = parser.parse_args(
            ["--step", "2", "--bed", "x", "--phenoFile", "y",
             "--out", "z", "--set-list", "s", "--anno-file", "a",
             "--mask-def", "m", "--aaf-bins", "0.05", "--ignore-pred",
             "--minMAC", "0.5"]
            + (["--singleton-carrier"] if flag else []))
        params = args_to_params(args)
        params.n_pheno = 1
        built, _ = build_masks_for_set(
            params, vset, G, af1, mac1, ignored, anno, [MD()],
            np.array([0.05]), masked, ind)
        for bm in built:
            if "singleton" in bm.snp.ID:
                return set(bm.sel_idx.tolist())
        return set()

    assert singleton_members(False) == {0}
    assert singleton_members(True) == {0, 1}
