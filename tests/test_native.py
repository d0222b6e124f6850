"""Native decoder (native/decoder.cpp) parity vs the pure-python paths.

The native library auto-builds via make on first use; these tests skip
if no toolchain is available (the python fallback is then the prod path).
"""

import numpy as np
import pytest

from regenie_tpu.io import native
from regenie_tpu.io.bed import _LUT, open_bed
from regenie_tpu.io.bgen import decode_block_native, decode_variant, open_bgen

EX = "/root/reference/example"


@pytest.fixture(scope="module")
def lib():
    lib = native.get_lib()
    if lib is None:
        pytest.skip("native library unavailable (no toolchain)")
    return lib


def test_bed_decode_native_matches_lut(lib):
    bf = open_bed(f"{EX}/example")
    raw = bf.read_block_bytes(0, bf.n_variants)
    nat = native.bed_decode_native(raw, bf.n_samples)
    ref = _LUT[raw].reshape(raw.shape[0], -1)[:, : bf.n_samples]
    bf.close()
    assert np.array_equal(nat, ref)


@pytest.mark.parametrize(
    "path", ["example.bgen", "example_3chr.bgen", "example_3chr_zstd.bgen"]
)
def test_bgen_decode_native_matches_python(lib, path):
    bg = open_bgen(f"{EX}/{path}")
    idx = list(range(min(bg.n_variants, 100)))
    res = decode_block_native(bg, idx, None, False)
    assert res is not None
    ds, iv = res
    for k in idx[:20] + idx[-3:]:
        d2, i2 = decode_variant(bg, k, None, False)
        assert np.array_equal(ds[k], d2)
        assert np.array_equal(iv[k], i2)
    bg.close()


def test_bgen_decode_native_sample_subset(lib):
    bg = open_bgen(f"{EX}/example.bgen")
    keep = np.arange(0, bg.n_samples_file, 3)
    ds, iv = decode_block_native(bg, [0, 5, 9], keep, False)
    d2, i2 = decode_variant(bg, 5, keep, False)
    assert np.array_equal(ds[1], d2)
    assert np.array_equal(iv[1], i2)
    bg.close()


def test_bgi_index_identical_to_scan(tmp_path):
    """--bgi uses the sqlite index instead of scanning the BGEN; output
    must be byte-identical (read_bgi_file, Geno.cpp:180)."""
    import subprocess
    import sys
    import os

    env = dict(os.environ)
    env["REGENIE_TPU_PLATFORM"] = "cpu"
    base = [sys.executable, "-m", "regenie_tpu", "--step", "2",
            "--bgen", f"{EX}/example.bgen",
            "--phenoFile", f"{EX}/phenotype.txt", "--bsize", "500",
            "--ignore-pred"]
    for extra, out in (([], "scan"), (["--bgi", f"{EX}/example.bgen.bgi"], "bgi")):
        r = subprocess.run(base + extra + ["--out", str(tmp_path / out)],
                           capture_output=True, text=True, cwd="/root/repo",
                           env=env, timeout=600)
        assert r.returncode == 0, r.stdout + r.stderr
    assert (
        open(tmp_path / "scan_Y1.regenie").read()
        == open(tmp_path / "bgi_Y1.regenie").read()
    )
