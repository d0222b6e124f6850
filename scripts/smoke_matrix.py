"""Smoke matrix: run the CLI across a grid of flag combinations on the
reference example data; any non-zero exit or missing output is a bug.
Not part of the pytest suite (runtime); run manually:
    python scripts/smoke_matrix.py [--fast]
"""

import itertools
import os
import subprocess
import sys
import tempfile

EX = "/root/reference/example"
PY = sys.executable


def run(args, tag, outdir):
    env = dict(os.environ)
    env["REGENIE_TPU_PLATFORM"] = "cpu"
    env["PYTHONPATH"] = "/root/repo"
    r = subprocess.run(
        [PY, "-m", "regenie_tpu"] + args, capture_output=True, text=True,
        cwd=outdir, env=env, timeout=900,
    )
    if r.returncode != 0:
        print(f"FAIL [{tag}]: {' '.join(args)}")
        print((r.stdout + r.stderr)[-1500:])
        return False
    return True


def main():
    fast = "--fast" in sys.argv
    outdir = tempfile.mkdtemp(prefix="smoke_")
    os.chdir(outdir)
    fails = 0
    total = 0

    # step 1 fits used by step-2 combos
    base1 = ["--step", "1", "--bsize", "100",
             "--covarFile", f"{EX}/covariates.txt"]
    fits = {}
    for trait, pheno in (("qt", "phenotype.txt"), ("bt", "phenotype_bin.txt")):
        out = f"fit_{trait}"
        args = base1 + ["--bed", f"{EX}/example",
                        "--phenoFile", f"{EX}/{pheno}", "--out", out]
        if trait == "bt":
            args += ["--bt"]
        total += 1
        fails += 0 if run(args, f"step1-{trait}", outdir) else 1
        fits[trait] = os.path.join(outdir, out + "_pred.list")

    fmt_args = {
        "bed": ["--bed", f"{EX}/example"],
        "bgen": ["--bgen", f"{EX}/example.bgen"],  # embedded sample IDs
        "pgen": ["--pgen", f"{EX}/example"],
    }
    extras = [
        [],
        ["--firth", "--approx", "--pThresh", "0.9"],
        ["--spa", "--pThresh", "0.9"],
        ["--htp", "smoke"],
        ["--af-cc", "--firth", "--approx"],
        ["--no-split"],
        ["--gz"],
        ["--test", "dominant"],
        ["--test", "recessive"],
        ["--minMAC", "10"],
        ["--write-samples", "--print-pheno"],
        ["--range", "1:100-300"],
        ["--condition-list", "COND"],
        ["--interaction", "V1"],
        ["--interaction-snp", "5"],
        ["--apply-rint"],
        ["--vc-tests", "skato,acatv", "--joint", "acat,sbat",
         "GENEBASED"],
        ["--mcc"],
        ["--force-ltco", "1"],
        ["--mt", "--strict", "--no-split"],
        ["--multiphen", "--strict"],
    ]
    if fast:
        extras = extras[:8]

    # conditioning list file
    cond = os.path.join(outdir, "cond.txt")
    with open(cond, "w") as fh:
        fh.write("1\n2\n")

    n = 0
    for fmt, extra in itertools.product(fmt_args, extras):
        bt_only = any(a in ("--spa",) for a in extra)
        qt_only = any(a in ("--mcc", "--apply-rint", "--mt", "--multiphen")
                      for a in extra)
        genebased = "GENEBASED" in extra
        extra = [a for a in extra if a != "GENEBASED"]
        if "--condition-list" in extra:
            extra = ["--condition-list", cond]
        traits = ["qt", "bt"]
        if bt_only:
            traits = ["bt"]
        if qt_only:
            traits = ["qt"]
        if genebased and fmt != "bed":
            continue
        for trait in traits:
            if trait == "bt" and ("--interaction" in extra):
                extra = extra + ["--firth", "--approx"] \
                    if "--firth" not in extra else extra
            n += 1
            tag = f"{fmt}-{trait}-{n}"
            pheno = "phenotype.txt" if trait == "qt" else "phenotype_bin.txt"
            args = (["--step", "2", "--bsize", "200",
                     "--covarFile", f"{EX}/covariates.txt",
                     "--phenoFile", f"{EX}/{pheno}",
                     "--pred", fits[trait], "--out", f"o{n}"]
                    + fmt_args[fmt] + extra)
            if trait == "bt":
                args += ["--bt"]
            if genebased:
                args = [a for a in args]
                args[args.index(f"{EX}/example")] = f"{EX}/example_3chr"
                args += ["--set-list", f"{EX}/example_3chr.setlist",
                         "--anno-file", f"{EX}/example_3chr.annotations",
                         "--mask-def", f"{EX}/example_3chr.masks",
                         "--aaf-bins", "0.2", "--ignore-pred"]
                args.remove("--pred")
                args.remove(fits[trait])
            if "--htp" in args:
                args += ["--firth", "--approx"] if trait == "bt" and "--firth" not in args else []
            total += 1
            if not run(args, tag, outdir):
                fails += 1

    print(f"{total - fails}/{total} combos passed (outputs in {outdir})")
    sys.exit(1 if fails else 0)


if __name__ == "__main__":
    main()
