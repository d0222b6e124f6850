"""4-column annotation domains: per-domain masks + all-domain mask."""

import os
import subprocess
import sys

import pytest

EX = "/root/reference/example"


def _run(out, anno, extra=()):
    env = dict(os.environ)
    env["REGENIE_TPU_PLATFORM"] = "cpu"
    r = subprocess.run(
        [sys.executable, "-m", "regenie_tpu", "--step", "2",
         "--bed", f"{EX}/example_3chr", "--covarFile", f"{EX}/covariates.txt",
         "--phenoFile", f"{EX}/phenotype.txt", "--bsize", "200",
         "--ignore-pred", "--set-list", f"{EX}/example_3chr.setlist",
         "--anno-file", anno, "--mask-def", f"{EX}/example_3chr.masks",
         "--aaf-bins", "0.5", "--out", out, *extra],
        capture_output=True, text=True, cwd="/root/repo", env=env, timeout=900,
    )
    assert r.returncode == 0, r.stdout + r.stderr


@pytest.fixture(scope="module")
def outputs(tmp_path_factory):
    d = tmp_path_factory.mktemp("dom")
    _run(str(d / "dom"), f"{EX}/example_3chr.annotationsV2",
         ["--write-mask-snplist"])
    _run(str(d / "nodom"), f"{EX}/example_3chr.annotations")
    return d


def test_domain_masks_present(outputs):
    ids = [l.split()[2] for l in open(outputs / "dom_Y1.regenie") if "SET1" in l]
    assert "SET1.B-sheet.M1.0.5" in ids
    assert "SET1.Catalytic.M1.0.5" in ids
    assert "SET1.M1.0.5" in ids  # all-domain mask


def test_all_domain_mask_matches_3col_run(outputs):
    def row(path, mid):
        for l in open(path):
            t = l.split()
            if len(t) > 2 and t[2] == mid:
                return l
        return None

    for mid in ("SET1.M1.0.5", "SET1.M2.0.5", "SET2.M1.0.5"):
        assert row(outputs / "dom_Y1.regenie", mid) == row(
            outputs / "nodom_Y1.regenie", mid
        ), mid


def test_domain_snplists_respect_domains(outputs):
    # parse domain membership from the annotation file
    dom_of = {}
    for line in open(f"{EX}/example_3chr.annotationsV2"):
        t = line.split()
        if t[1] == "SET1":
            dom_of.setdefault(t[2], set()).add(t[0])
    snl = {}
    for line in open(outputs / "dom_masks.snplist"):
        t = line.rstrip("\n").split("\t")
        snl[t[0]] = set(t[3].split(","))
    for dom, members in dom_of.items():
        key = f"SET1.{dom}.M2.0.5"  # M2 includes all categories
        if key in snl:
            assert snl[key] <= members, key
