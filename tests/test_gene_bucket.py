"""Gene-based bucket/group staging equivalence (VERDICT r3 #4).

The set loop stages work at three levels (run_genebased.py): buckets
(REGENIE_TPU_GENE_BUCKET sets share one batched VC-products device
call), groups inside a bucket (REGENIE_TPU_GENE_GROUP_MB bounds the
concatenated [sum(M), N] stats/mask-test calls; groups may span
chromosomes), and per-set host tails.  Any bucket/group partition must
produce byte-identical output to the per-set path — including uneven
trailing buckets and single-set groups.
"""

import os
import subprocess
import sys

import pytest

EX = "/root/reference/example"


def _run(out, env_extra):
    env = dict(os.environ)
    env["REGENIE_TPU_PLATFORM"] = "cpu"
    env.update(env_extra)
    r = subprocess.run(
        [sys.executable, "-m", "regenie_tpu", "--step", "2",
         "--bed", f"{EX}/example_3chr",
         "--covarFile", f"{EX}/covariates.txt",
         "--phenoFile", f"{EX}/phenotype.txt", "--bsize", "200",
         "--ignore-pred", "--set-list", f"{EX}/example_3chr.setlist",
         "--anno-file", f"{EX}/example_3chr.annotations",
         "--mask-def", f"{EX}/example_3chr.masks",
         "--vc-tests", "skato,acatv", "--joint", "acat",
         "--aaf-bins", "0.2,0.5", "--vc-maxAAF", "0.5",
         "--out", out],
        capture_output=True, text=True, cwd="/root/repo", env=env,
        timeout=900)
    assert r.returncode == 0, r.stdout + r.stderr
    with open(out + "_Y1.regenie") as fh:
        y1 = fh.read()
    with open(out + "_Y2.regenie") as fh:
        y2 = fh.read()
    # SET4's two variants fall outside the mask bins -> no rows for it,
    # which itself exercises empty-set staging inside a bucket
    assert "SET1" in y1 and "SET2" in y1
    return y1, y2


@pytest.mark.parametrize("bucket_env", [
    {"REGENIE_TPU_GENE_BUCKET": "1"},               # one set per bucket
    {"REGENIE_TPU_GENE_BUCKET": "2"},               # uneven trailing bucket
    {"REGENIE_TPU_GENE_BUCKET": "64",
     "REGENIE_TPU_GENE_GROUP_MB": "1"},             # one bucket, split groups
], ids=["bucket1", "bucket2-uneven", "tiny-groups"])
def test_gene_bucket_partitions_byte_identical(tmp_path, bucket_env):
    ref = _run(str(tmp_path / "ref"), {"REGENIE_TPU_GENE_BUCKET": "32"})
    alt = _run(str(tmp_path / "alt"), bucket_env)
    assert alt == ref
