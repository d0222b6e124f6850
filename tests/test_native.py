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


def test_pgen_dosage_tracks(tmp_path):
    """Hand-built PGEN with the three unphased dosage track layouts
    (ParseDosage16, pgenlib_read.cc:7185): dense (0x40), bitarray (0x60)
    and deltalist (0x20); values are ALT dosage on the 0..32768 scale."""
    import struct

    from regenie_tpu.io.pgen import PgenDecoder, open_pgen

    N, M = 7, 3
    hc = np.array([0, 1, 2, 3, 0, 1, 2], dtype=np.uint8)  # 3 = missing
    packed = bytearray((N + 3) // 4)
    for i, c in enumerate(hc):
        packed[i // 4] |= int(c) << (2 * (i % 4))
    geno_track = bytes(packed)

    # dense dosage (0x40): one u16 per sample, 65535 = missing
    dense = np.array([0, 16384, 32768, 65535, 8192, 16384, 32768], dtype=np.uint16)
    rec40 = geno_track + dense.tobytes()

    # bitarray dosage (0x60): presence bits + u16 per set bit
    present = np.array([1, 0, 1, 0, 0, 1, 0], dtype=np.uint8)
    bits = np.packbits(present, bitorder="little").tobytes()
    rec60 = geno_track + bits + np.array([4096, 24576, 12288], dtype=np.uint16).tobytes()

    # deltalist dosage (0x20): [vint L][first id][deltas] + u16 values
    # samples 1 and 4 -> L=2, first_id=1, delta=3
    rec20 = geno_track + bytes([2, 1, 3]) + np.array(
        [20480, 28672], dtype=np.uint16).tobytes()

    records = [rec40, rec60, rec20]
    vrtypes = bytes([0x40, 0x60, 0x20])
    vrec_lens = bytes(len(r) for r in records)
    header = b"\x6c\x1b\x10" + struct.pack("<II", M, N) + bytes([0x04])
    first_rec = len(header) + 8 + M + M
    blob = header + struct.pack("<Q", first_rec) + vrtypes + vrec_lens + b"".join(records)
    path = tmp_path / "dos.pgen"
    path.write_bytes(blob)

    dec = PgenDecoder(open_pgen(str(path)))
    # hardcalls unchanged
    assert np.array_equal(dec.decode(0), hc)
    d0 = dec.dosages(0)
    np.testing.assert_allclose(d0, [0, 1, 2, -3, 0.5, 1, 2])
    d1 = dec.dosages(1)
    np.testing.assert_allclose(d1, [0.25, 1, 1.5, -3, 0, 0.75, 2])
    d2 = dec.dosages(2)
    np.testing.assert_allclose(d2, [0, 1.25, 2, -3, 1.75, 1, 2])


def test_pgen_dosage_e2e_step2(tmp_path):
    """Step 2 on a dosage PGEN (dense 16-bit track equal to the
    hardcalls) matches the hardcall-only PGEN run, with the MACH-r2
    INFO column added (Geno.cpp:1795, compute_aaf_info :3137)."""
    import os
    import struct
    import subprocess
    import sys

    rng = np.random.default_rng(5)
    N, M = 120, 24
    hc = rng.integers(0, 3, size=(M, N)).astype(np.uint8)
    hc[rng.random(size=(M, N)) < 0.02] = 3

    def geno_track(row):
        packed = bytearray((N + 3) // 4)
        for i, c in enumerate(row):
            packed[i // 4] |= int(c) << (2 * (i % 4))
        return bytes(packed)

    def write_pgen(path, with_dosage):
        records, vrtypes = [], []
        for j in range(M):
            rec = geno_track(hc[j])
            if with_dosage:
                d = np.where(hc[j] == 3, 65535, hc[j].astype(np.uint32) * 16384)
                rec += d.astype(np.uint16).tobytes()
                vrtypes.append(0x40)
            else:
                vrtypes.append(0)
            records.append(rec)
        header = b"\x6c\x1b\x10" + struct.pack("<II", M, N) + bytes([0x05])
        first = len(header) + 8 + M + 2 * M
        lens = b"".join(struct.pack("<H", len(r)) for r in records)
        blob = (header + struct.pack("<Q", first) + bytes(vrtypes)
                + lens + b"".join(records))
        open(path, "wb").write(blob)

    for tag, wd in (("hc", False), ("dos", True)):
        write_pgen(tmp_path / f"{tag}.pgen", wd)
        with open(tmp_path / f"{tag}.pvar", "w") as fh:
            fh.write("#CHROM\tPOS\tID\tREF\tALT\n")
            for j in range(M):
                fh.write(f"1\t{j+1}\tsnp{j+1}\tA\tC\n")
        with open(tmp_path / f"{tag}.psam", "w") as fh:
            fh.write("#FID\tIID\tSEX\n")
            for i in range(N):
                fh.write(f"F{i}\tI{i}\tNA\n")
    with open(tmp_path / "pheno.txt", "w") as fh:
        fh.write("FID IID Y1\n")
        yv = rng.normal(size=N)
        for i in range(N):
            fh.write(f"F{i} I{i} {yv[i]:.6f}\n")

    env = dict(os.environ)
    env["REGENIE_TPU_PLATFORM"] = "cpu"
    outs = {}
    for tag in ("hc", "dos"):
        r = subprocess.run(
            [sys.executable, "-m", "regenie_tpu", "--step", "2",
             "--pgen", str(tmp_path / tag), "--phenoFile",
             str(tmp_path / "pheno.txt"), "--bsize", "16", "--ignore-pred",
             "--out", str(tmp_path / ("t2_" + tag))],
            capture_output=True, text=True, cwd="/root/repo", env=env, timeout=600,
        )
        assert r.returncode == 0, r.stdout + r.stderr
        outs[tag] = open(tmp_path / f"t2_{tag}_Y1.regenie").read().splitlines()

    hdr_hc = outs["hc"][0].split()
    hdr_dos = outs["dos"][0].split()
    assert "INFO" not in hdr_hc and "INFO" in hdr_dos
    ii = hdr_dos.index("INFO")
    assert len(outs["hc"]) == len(outs["dos"]) == M + 1
    for lh, ld in zip(outs["hc"][1:], outs["dos"][1:]):
        td = ld.split()
        info = float(td.pop(ii))
        assert 0.0 <= info <= 2.0  # MACH r2 can exceed 1 off-HWE
        assert lh.split() == td


def test_pgen_all_vrtypes_native_matches_python(tmp_path):
    """Synthetic PGEN exercising every supported hardcall encoding
    (2-bit direct, onebit+exceptions, difflist-vs-constant 4/5/6/7,
    LD-compressed 2 and inverted 3, and dosage tracks on top): the
    native pgen_decode_block kernel must be bit-identical to the pure
    python decoder, and both match hand-computed codes."""
    import struct

    from regenie_tpu.io.native import get_lib, pgen_decode_block_native
    from regenie_tpu.io.pgen import PgenDecoder, open_pgen

    if get_lib() is None:
        pytest.skip("native lib unavailable")

    N = 13

    def pack2(codes):
        b = bytearray((N + 3) // 4)
        for i, c in enumerate(codes):
            b[i // 4] |= int(c) << (2 * (i % 4))
        return bytes(b)

    def difflist(ids, rare):
        # single group (L<=64), sid_bytes=1 for N=13
        L = len(ids)
        out = bytearray([L])
        if L == 0:
            return bytes(out)
        out.append(ids[0])
        rb = bytearray((L + 3) // 4)
        for k, c in enumerate(rare):
            rb[k // 4] |= int(c) << (2 * (k % 4))
        out += bytes(rb)
        for k in range(1, L):
            out.append(ids[k] - ids[k - 1])
        return bytes(out)

    base = np.array([0, 1, 2, 0, 0, 1, 2, 3, 0, 0, 1, 2, 0], dtype=np.uint8)
    records, vrtypes, expected = [], [], []

    # v0: 2-bit direct (LD base)
    records.append(pack2(base)); vrtypes.append(0x00); expected.append(base.copy())
    # v1: LD diff vs v0 (samples 2,5 -> 0, 7 -> 1)
    e = base.copy(); e[[2, 5]] = 0; e[7] = 1
    records.append(difflist([2, 5, 7], [0, 0, 1])); vrtypes.append(0x02); expected.append(e)
    # v2: LD inverted vs v0 (hom swap) then sample 0 -> 3
    e = base.copy(); e = np.where(e == 0, 2, np.where(e == 2, 0, e)).astype(np.uint8); e[0] = 3
    records.append(difflist([0], [3])); vrtypes.append(0x03); expected.append(e)
    # v3: difflist vs hom-ref (low2=0): samples 3,9 het
    e = np.zeros(N, dtype=np.uint8); e[[3, 9]] = 1
    records.append(difflist([3, 9], [1, 1])); vrtypes.append(0x04); expected.append(e)
    # v4: all hom-ref, no payload
    records.append(b""); vrtypes.append(0x05); expected.append(np.zeros(N, dtype=np.uint8))
    # v5: difflist vs hom-alt (low2=2)
    e = np.full(N, 2, dtype=np.uint8); e[[1, 12]] = [0, 1]
    records.append(difflist([1, 12], [0, 1])); vrtypes.append(0x06); expected.append(e)
    # v6: difflist vs missing (low2=3)
    e = np.full(N, 3, dtype=np.uint8); e[[4, 6, 8]] = [2, 1, 0]
    records.append(difflist([4, 6, 8], [2, 1, 0])); vrtypes.append(0x07); expected.append(e)
    # v7: onebit common pair (0,1), exceptions 11 -> 2
    bits = np.array([0, 1, 0, 1, 1, 0, 0, 0, 1, 0, 1, 0, 0], dtype=np.uint8)
    e = bits.copy().astype(np.uint8); e[11] = 2
    common2 = (0 << 2) | 1  # base=0, delta=1
    rec = bytes([common2]) + np.packbits(bits, bitorder="little").tobytes() + difflist([11], [2])
    records.append(rec); vrtypes.append(0x01); expected.append(e)
    # v8: LD diff + deltalist dosage on samples 1,4; the LD base is the
    # nearest preceding non-LD record = v7 (the onebit variant)
    e = expected[7].copy(); e[10] = 3
    rec = difflist([10], [3]) + bytes([2, 1, 3]) + np.array(
        [20480, 28672], dtype=np.uint16).tobytes()
    records.append(rec); vrtypes.append(0x22)
    ed = e.astype(np.float64); ed[e == 3] = -3.0; ed[1] = 1.25; ed[4] = 1.75
    expected.append(ed)
    # v9: onebit + dense dosage
    rec = bytes([common2]) + np.packbits(bits, bitorder="little").tobytes() + difflist([11], [2])
    dense = (np.arange(N, dtype=np.uint16) * 2048)
    dense[3] = 65535
    rec += dense.tobytes()
    records.append(rec); vrtypes.append(0x41)
    ed = dense.astype(np.float64) / 16384.0; ed[3] = -3.0
    expected.append(ed)

    M = len(records)
    header = b"\x6c\x1b\x10" + struct.pack("<II", M, N) + bytes([0x04])
    first = len(header) + 8 + M + M
    blob = header + struct.pack("<Q", first) + bytes(vrtypes) + bytes(
        len(r) for r in records) + b"".join(records)
    path = tmp_path / "all.pgen"
    path.write_bytes(blob)

    pf = open_pgen(str(path))
    dec = PgenDecoder(pf)
    offs = np.arange(M)
    res = pgen_decode_block_native(pf._data, pf.fpos, pf.vrtypes, offs, N)
    assert res is not None
    for v in range(M):
        exp = np.asarray(expected[v], dtype=np.float64)
        if exp.dtype == np.float64 and (vrtypes[v] & 0x60) == 0:
            exp = np.where(exp == 3, -3.0, exp)
        py = dec.dosages(v)
        np.testing.assert_array_equal(py, exp, err_msg=f"python v{v} vrtype={hex(vrtypes[v])}")
        np.testing.assert_array_equal(res[v], exp, err_msg=f"native v{v} vrtype={hex(vrtypes[v])}")

    # scattered subset incl. repeated LD bases resolves correctly
    sub = np.array([8, 1, 2])
    res2 = pgen_decode_block_native(pf._data, pf.fpos, pf.vrtypes, sub, N)
    for k, v in enumerate(sub):
        np.testing.assert_array_equal(res2[k], dec.dosages(int(v)))


def test_bed_read_indices_run_batching():
    """read_indices batches consecutive runs into single block reads;
    out-of-order, duplicate, and gapped index lists must decode exactly
    like per-variant reads."""
    bf = open_bed(f"{EX}/example")
    idx = np.array([7, 8, 9, 3, 3, 500, 501, 2, 999, 0, 1, 2, 3])
    got = bf.read_indices(idx)
    for k, i in enumerate(idx):
        assert np.array_equal(got[k], bf.read_block(int(i), 1)[0]), i
    bf.close()


def test_phased_bgen_layout2_decode():
    """Phased layout-2 decode (hand-built genotype block): one stored
    probability per haplotype collapses to genotype probabilities by the
    haplotype product; dosage is exact by linearity. The reference
    rejects phased input (Geno.cpp:68) — capability superset."""
    import struct

    import numpy as np

    from regenie_tpu.io.bgen import _decode_layout2

    rng = np.random.default_rng(3)
    Nf = 7
    h = rng.integers(0, 256, size=(Nf, 2)).astype(np.uint8)
    ploidy = np.full(Nf, 2, np.uint8)
    ploidy[4] |= 0x80  # missing sample
    block = (
        struct.pack("<IHBB", Nf, 2, 2, 2) + ploidy.tobytes()
        + bytes([1, 8])  # phased=1, bits=8
        + h.tobytes()
    )
    ds, ival = _decode_layout2(block, Nf, None, ref_first=False)
    h1, h2 = h[:, 0] / 255.0, h[:, 1] / 255.0
    # allele1 dosage = P(hap1=allele1) + P(hap2=allele1), exactly
    np.testing.assert_allclose(
        ds[np.arange(Nf) != 4], (h1 + h2)[np.arange(Nf) != 4], atol=1e-12)
    assert ds[4] == -3.0
    # ref-first counts allele2
    ds_rf, _ = _decode_layout2(block, Nf, None, ref_first=True)
    np.testing.assert_allclose(
        ds_rf[np.arange(Nf) != 4], (2.0 - h1 - h2)[np.arange(Nf) != 4],
        atol=1e-12)
    # unphased block with the product-expanded genotype probabilities
    # gives the identical dosage/INFO numerator
    p0 = h1 * h2
    p1 = np.maximum(1.0 - p0 - (1 - h1) * (1 - h2), 0.0)
    probs8 = np.stack([p0, p1], axis=1)
    q = np.round(probs8 * 255).astype(np.uint8)
    block_u = (
        struct.pack("<IHBB", Nf, 2, 2, 2) + ploidy.tobytes()
        + bytes([0, 8]) + q.tobytes()
    )
    ds_u, _ = _decode_layout2(block_u, Nf, None, ref_first=False)
    np.testing.assert_allclose(ds_u[:4], ds[:4], atol=2 / 255.0)


def test_sample_file_sex_column(tmp_path):
    """The .sample file's 4th column is SEX (read_bgen_sample,
    Geno.cpp:439-443) — it must reach gd.sex for chrX dosage
    compensation and --sex-specific (was silently dropped)."""
    from regenie_tpu.io.bgen import read_sample_file

    p = str(tmp_path / "s.sample")
    with open(p, "w") as fh:
        fh.write("ID_1 ID_2 missing sex\n0 0 0 D\n")
        fh.write("A A 0 1\nB B 0 2\nC C 0 0\nD D 0 NA\n")
    ids, sex = read_sample_file(p)
    assert [i[0] for i in ids] == ["A", "B", "C", "D"]
    assert sex.tolist() == [1, 2, 0, 0]
    import pytest as _pt

    with open(p, "a") as fh:
        fh.write("E E 0 x\n")
    with _pt.raises(ValueError):
        read_sample_file(p)


def test_bgen_sex_specific(tmp_path):
    """--sex-specific over BGEN uses the sample file's sex column
    (Geno.cpp:1287); was a no-op before the sex column was parsed."""
    import os
    import subprocess
    import sys

    sys.path.insert(0, "/root/repo/tests")
    import numpy as np

    from test_fused_score import _write_bgen12

    rng = np.random.default_rng(5)
    N, M = 80, 10
    probs8 = np.zeros((M, N, 2), np.uint8)
    for v in range(M):
        g = rng.integers(0, 3, size=N)
        probs8[v, :, 0] = np.where(g == 0, 255, 0)
        probs8[v, :, 1] = np.where(g == 1, 255, 0)
    ids = [f"I{i}" for i in range(N)]
    bg = str(tmp_path / "g.bgen")
    _write_bgen12(bg, ids, [1] * M, range(1, M + 1), probs8)
    sex = [1] * 30 + [2] * 50
    with open(str(tmp_path / "s.sample"), "w") as fh:
        fh.write("ID_1 ID_2 missing sex\n0 0 0 D\n")
        for i, s in enumerate(ids):
            fh.write(f"{s} {s} 0 {sex[i]}\n")
    with open(str(tmp_path / "ph.txt"), "w") as fh:
        fh.write("FID IID Y1 Y2\n")
        for s in ids:
            fh.write(f"{s} {s} {rng.normal():.4f} {rng.normal():.4f}\n")
    env = dict(os.environ)
    env["REGENIE_TPU_PLATFORM"] = "cpu"
    r = subprocess.run(
        [sys.executable, "-m", "regenie_tpu", "--step", "2",
         "--bgen", bg, "--sample", str(tmp_path / "s.sample"),
         "--phenoFile", str(tmp_path / "ph.txt"), "--bsize", "10",
         "--ignore-pred", "--sex-specific", "male",
         "--out", str(tmp_path / "sx")],
        capture_output=True, text=True, cwd="/root/repo", env=env,
        timeout=600)
    assert r.returncode == 0, r.stdout + r.stderr
    lines = open(str(tmp_path / "sx_Y1.regenie")).readlines()
    hdr = lines[0].split()
    assert lines[1].split()[hdr.index("N")] == "30"
