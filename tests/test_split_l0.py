"""Split-L0 multi-job protocol parity (test_bash.sh:91-137): the 3-phase
split run must produce .loco files byte-identical to the monolithic run."""

import filecmp
import os
import subprocess
import sys

EX = "/root/reference/example"

BASE = [
    "--step", "1", "--bed", f"{EX}/example",
    "--exclude", f"{EX}/snplist_rm.txt",
    "--covarFile", f"{EX}/covariates.txt",
    "--phenoFile", f"{EX}/phenotype_bin.txt",
    "--remove", f"{EX}/fid_iid_to_remove.txt",
    "--bsize", "100", "--bt",
]


def run_cli(args):
    env = dict(os.environ)
    env["REGENIE_TPU_PLATFORM"] = "cpu"
    r = subprocess.run(
        [sys.executable, "-m", "regenie_tpu"] + args,
        capture_output=True, text=True, cwd="/root/repo", env=env, timeout=900,
    )
    assert r.returncode == 0, r.stdout + r.stderr
    return r.stdout


def test_split_l0_identical_loco(tmp_path):
    mono = str(tmp_path / "mono")
    run_cli(BASE + ["--out", mono])

    split = str(tmp_path / "split")
    run_cli(BASE + ["--split-l0", f"{split},4", "--out", str(tmp_path / "sl0")])
    assert os.path.isfile(split + ".master")
    for j in range(1, 5):
        run_cli(BASE + ["--run-l0", f"{split}.master,{j}", "--out", str(tmp_path / f"j{j}")])
        assert os.path.isfile(f"{split}_job{j}_l0_Y1")
    run_cli(BASE + ["--run-l1", f"{split}.master", "--out", str(tmp_path / "l1")])

    for ph in (1, 2):
        assert filecmp.cmp(
            f"{mono}_{ph}.loco", str(tmp_path / f"l1_{ph}.loco"), shallow=False
        ), f"loco files differ for pheno {ph}"
