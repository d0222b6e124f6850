"""Step-2 summary-statistic writers (.regenie text formats).

Mirrors Step2_Models.cpp print_header_output* (:2306) and
print_sum_stats* (:2410-2646): per-pheno split files (default) or a
single merged file, with C++ default 6-significant-digit formatting.
"""

from __future__ import annotations

from typing import List, Optional

import numpy as np

from ..config import Params
from ..prep import fmt
from .bed import SnpInfo


def header_single(params: Params) -> str:
    cols = ["CHROM", "GENPOS", "ID", "ALLELE0", "ALLELE1", "A1FREQ"]
    if params.af_cc:
        cols += ["A1FREQ_CASES", "A1FREQ_CONTROLS"]
    if params.dosage_mode:
        cols += ["INFO"]
    cols += ["N"]
    if params.af_cc:
        cols += ["N_CASES", "N_CONTROLS"]
    cols += ["TEST", "BETA", "SE", "CHISQ", "LOG10P", "EXTRA"]
    return " ".join(cols) + "\n"


def header_all(params: Params) -> str:
    cols = ["CHROM", "GENPOS", "ID", "ALLELE0", "ALLELE1", "A1FREQ"]
    if params.af_cc:
        cols += ["A1FREQ_CASES", "A1FREQ_CONTROLS"]
    if params.dosage_mode:
        cols += ["INFO"]
    cols += ["N"]
    if params.af_cc:
        cols += ["N_CASES", "N_CONTROLS"]
    cols += ["N_RR", "N_RA", "N_AA", "TEST"]
    for i in range(params.n_pheno):
        cols += [f"BETA.Y{i+1}", f"SE.Y{i+1}", f"CHISQ.Y{i+1}", f"LOG10P.Y{i+1}"]
    cols += ["EXTRA"]
    return " ".join(cols) + "\n"


def sumstat_line_single(
    params: Params,
    snp: SnpInfo,
    test: str,
    af: float,
    info: Optional[float],
    n: int,
    beta: float,
    se: float,
    chisq: float,
    logp: float,
    test_pass: bool = True,
    af_case: float = -1,
    af_control: float = -1,
    ns_case: int = -1,
    ns_control: int = -1,
) -> str:
    """One association row, single-pheno format (print_sum_stats_single,
    Step2_Models.cpp:2505-2544)."""
    parts = [str(snp.chrom), str(snp.physpos), snp.ID, snp.allele1, snp.allele2]
    parts.append(fmt(af) if af >= 0 else "NA")
    if params.af_cc:
        if af >= 0:
            parts += [fmt(af_case), fmt(af_control)]
        else:
            parts += ["NA", "NA"]
    if params.dosage_mode:
        parts.append(fmt(info) if info is not None and info >= 0 else "NA")
    parts.append(str(n))
    if params.af_cc:
        parts += [str(ns_case), str(ns_control)]
    parts.append(test)
    print_se = (se >= 0) and not np.isnan(se)
    print_pv = (chisq >= 0) and test_pass and not np.isnan(logp)
    if print_se:
        parts += [fmt(beta), fmt(se)]
    else:
        parts += ["NA", "NA"]
    if print_pv:
        parts += [fmt(chisq), fmt(logp)]
    else:
        parts += ["NA", "NA"]
    extra = []
    if not test_pass:
        extra.append("TEST_FAIL")
    parts.append(";".join(extra) if extra else "NA")
    return " ".join(parts) + "\n"
