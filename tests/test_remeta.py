"""remeta LD-matrix writer (--remeta-save-ld): BGZF validity and
round-trip of the sparse matrix format."""

import gzip
import os
import struct
import subprocess
import sys

import numpy as np
import pytest

EX = "/root/reference/example"


def test_bgzf_writer_roundtrip(tmp_path):
    from regenie_tpu.io.bgzf import BgzfWriter

    p = str(tmp_path / "t.gz")
    w = BgzfWriter(p)
    payload = bytes(range(256)) * 1000  # spans multiple blocks
    w.write(payload)
    w.close()
    assert gzip.open(p, "rb").read() == payload
    # BGZF EOF marker present
    assert open(p, "rb").read()[-28:] == bytes.fromhex(
        "1f8b08040000000000ff0600424302001b0003000000000000000000"
    )


def test_remeta_ld_output(tmp_path):
    out = str(tmp_path / "remeta")
    env = dict(os.environ)
    env["REGENIE_TPU_PLATFORM"] = "cpu"
    r = subprocess.run(
        [sys.executable, "-m", "regenie_tpu", "--step", "2",
         "--bed", f"{EX}/example_3chr", "--covarFile", f"{EX}/covariates.txt",
         "--phenoFile", f"{EX}/phenotype.txt", "--bsize", "200",
         "--ignore-pred", "--set-list", f"{EX}/example_3chr.setlist",
         "--anno-file", f"{EX}/example_3chr.annotations",
         "--mask-def", f"{EX}/example_3chr.masks", "--aaf-bins", "0.5",
         "--vc-tests", "skat", "--vc-maxAAF", "0.5", "--vc-MACthr", "0",
         "--remeta-save-ld", "--out", out],
        capture_output=True, text=True, cwd="/root/repo", env=env, timeout=900,
    )
    assert r.returncode == 0, r.stdout + r.stderr

    raw = gzip.open(out + "_Y1.rg.ld", "rb").read()
    idx = gzip.open(out + "_Y1.rg.ld.idx.gz", "rb").read().decode()
    assert struct.unpack("<i", raw[:4])[0] == 500  # sample size
    genes = [l.split("\t")[0] for l in idx.strip().splitlines()]
    assert genes[0] == "SET1"

    off = 4
    n_genes = 0
    while off < len(raw):
        kind = raw[off:off + 1]
        off += 1
        assert kind == b"s"
        n = struct.unpack("<i", raw[off:off + 4])[0]
        off += 4
        thr = struct.unpack("<f", raw[off:off + 4])[0]
        assert thr == pytest.approx(0.01)
        off += 4
        var = np.frombuffer(raw[off:off + 4 * n], dtype="<f4")
        assert (var >= 0).all()
        off += 4 * n
        while True:
            i, j, v = struct.unpack("<iif", raw[off:off + 12])
            off += 12
            if i == -1:
                break
            assert 0 <= j < i < n and -1.001 <= v <= 1.001
        n_genes += 1
    assert n_genes == len(genes) >= 2
