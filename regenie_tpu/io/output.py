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


def format_value_rows(vals, mask, labels) -> Optional[str]:
    """Native renderer for labeled %g value rows with per-sample NA
    masking ("label v_1 .. v_N \\n" — the .loco/.prs prediction format,
    format_loco_rows in native/decoder.cpp). vals: [R, N] float64;
    mask: [N] bool; labels: [R] ints. None if the lib is unavailable."""
    lib = native_formatter("format_loco_rows")
    if lib is None:
        return None
    vals = np.ascontiguousarray(vals, np.float64)
    R, N = vals.shape
    mask = np.ascontiguousarray(mask, np.uint8)
    labels = np.ascontiguousarray(labels, np.int32)
    out = np.empty(R * (16 + 15 * N), np.uint8)
    row_len = np.empty(R, np.int64)
    total = lib.format_loco_rows(
        vals.ctypes.data, R, N, mask.ctypes.data, labels.ctypes.data,
        out.ctypes.data, row_len.ctypes.data,
    )
    return out[:total].tobytes().decode("ascii")


def format_float_rows(prefix_buf, prefix_off, vals, skip=None) -> Optional[str]:
    """Native renderer for "prefix v_1 .. v_K\\n" rows where every
    post-prefix field is %g (multi-trait output style). vals: [R, K]
    float64. None if the native lib is unavailable."""
    lib = native_formatter("format_prefixed_float_rows")
    if lib is None:
        return None
    vals = np.ascontiguousarray(vals, np.float64)
    R, K = vals.shape
    pb = np.ascontiguousarray(prefix_buf, np.uint8)
    po = np.ascontiguousarray(prefix_off, np.int64)
    sk = (np.ascontiguousarray(skip, np.uint8)
          if skip is not None else None)
    out = np.empty(int(po[-1]) + R * (15 * K + 8), np.uint8)
    row_len = np.empty(R, np.int64)
    total = lib.format_prefixed_float_rows(
        pb.ctypes.data, po.ctypes.data, R, K,
        sk.ctypes.data if sk is not None else 0, vals.ctypes.data,
        out.ctypes.data, row_len.ctypes.data,
    )
    return out[:total].tobytes().decode("utf-8")


def block_prefixes(bsnps) -> tuple:
    """Concatenated per-variant row prefixes "CHROM GENPOS ID A0 A1"
    for the native batch formatter (built once per block, reused by
    every trait column)."""
    buf = bytearray()
    off = np.empty(len(bsnps) + 1, np.int64)
    off[0] = 0
    for i, s in enumerate(bsnps):
        buf += f"{s.chrom} {s.physpos} {s.ID} {s.allele1} {s.allele2}".encode()
        off[i + 1] = len(buf)
    return np.frombuffer(bytes(buf), np.uint8), off


def _f64(x):
    return np.ascontiguousarray(x, np.float64)


def _i32(x):
    return np.ascontiguousarray(x, np.int32)


def native_formatter(name: str):
    """The native lib if it exports `name`, else None — callers probe
    this once before building per-block operands so fallback systems
    skip the array prep."""
    from .native import get_lib

    lib = get_lib()
    if lib is None or not hasattr(lib, name):
        return None
    return lib


def format_block_single(params, prefix_buf, prefix_off, test, skip, af,
                        info, n, beta, se, chisq, logp, test_fail,
                        af_case=None, af_control=None, ns_case=None,
                        ns_control=None, tests=None) -> Optional[str]:
    """Native batch renderer for the split single-pheno format: one call
    formats a whole [B] block x trait column (snprintf %g, OpenMP over
    rows in native/decoder.cpp format_sumstat_single) — byte-identical
    to sumstat_line_single, which is the per-row fallback. At biobank
    scale the per-row Python path caps throughput ~150x below the fused
    device scorer; this removes the writer from the critical path.

    Returns the rendered rows as one str, or None when the native lib
    is unavailable (callers fall back to the Python loop)."""
    lib = native_formatter("format_sumstat_single")
    if lib is None or len(test) > 40:
        return None
    B = len(prefix_off) - 1
    test_buf = test_off = None
    if tests is not None:
        # per-row TEST strings (interaction -INT_* suffixes); each must
        # fit the constant-test byte budget
        test_buf, test_off = tests
        if len(test_off) != B + 1 or (np.diff(test_off) > 40).any():
            return None
        test_buf = np.ascontiguousarray(test_buf, np.uint8)
        test_off = np.ascontiguousarray(test_off, np.int64)
    f64, i32 = _f64, _i32
    af = f64(af)
    beta, se = f64(beta), f64(se)
    chisq, logp = f64(chisq), f64(logp)
    n = i32(n)
    skip = np.ascontiguousarray(skip, np.uint8)
    test_fail = np.ascontiguousarray(test_fail, np.uint8)
    af_cc = bool(params.af_cc)
    neg1d = None
    if af_cc:
        neg1d = np.full(B, -1.0)
        af_case = f64(af_case if af_case is not None else neg1d)
        af_control = f64(af_control if af_control is not None else neg1d)
        ns_case = i32(ns_case if ns_case is not None else neg1d)
        ns_control = i32(ns_control if ns_control is not None else neg1d)
    has_info = bool(params.dosage_mode)
    if has_info:
        # reference prints INFO=1 when the format carries no INFO
        info = f64(info if info is not None else np.ones(B))
    budget = int(lib.sumstat_field_budget())
    out = np.empty(int(prefix_off[-1]) + B * budget, np.uint8)
    row_len = np.empty(B, np.int64)
    pb = np.ascontiguousarray(prefix_buf, np.uint8)
    po = np.ascontiguousarray(prefix_off, np.int64)

    def ptr(a):
        return 0 if a is None else a.ctypes.data

    total = lib.format_sumstat_single(
        ptr(pb), ptr(po), B, ptr(skip), test.encode(),
        ptr(test_buf), ptr(test_off),
        int(af_cc), int(has_info), ptr(af),
        ptr(af_case) if af_cc else 0, ptr(af_control) if af_cc else 0,
        ptr(info) if has_info else 0, ptr(n),
        ptr(ns_case) if af_cc else 0, ptr(ns_control) if af_cc else 0,
        ptr(beta), ptr(se), ptr(chisq), ptr(logp), ptr(test_fail),
        ptr(out), ptr(row_len),
    )
    return out[:total].tobytes().decode("utf-8")


def format_block_all(params, prefix_buf, prefix_off, test, skip, af1, info1,
                     ns1, n_rr, n_aa, beta, se, chisq, logp,
                     fail) -> Optional[str]:
    """Native batch renderer for the merged --no-split format
    (format_sumstat_all in native/decoder.cpp), byte-identical to
    sumstat_line_all. beta/se/chisq/logp/fail: [B, P] with unusable
    traits pre-masked to (-1, -1, -1, -1, fail=True). Returns None when
    the native lib is unavailable."""
    lib = native_formatter("format_sumstat_all")
    if lib is None or len(test) > 40:
        return None
    B = len(prefix_off) - 1
    P = beta.shape[1]
    f64, i32 = _f64, _i32
    af1 = f64(af1)
    beta, se = f64(beta), f64(se)
    chisq, logp = f64(chisq), f64(logp)
    ns1, n_rr, n_aa = i32(ns1), i32(n_rr), i32(n_aa)
    skip = np.ascontiguousarray(skip, np.uint8)
    fail = np.ascontiguousarray(fail, np.uint8)
    has_info = bool(params.dosage_mode)
    if has_info:
        info1 = f64(info1 if info1 is not None else np.ones(B))
    out = np.empty(int(prefix_off[-1]) + B * int(lib.all_field_budget(P)),
                   np.uint8)
    row_len = np.empty(B, np.int64)
    pb = np.ascontiguousarray(prefix_buf, np.uint8)
    po = np.ascontiguousarray(prefix_off, np.int64)
    total = lib.format_sumstat_all(
        pb.ctypes.data, po.ctypes.data, B, skip.ctypes.data, test.encode(),
        int(has_info), P, af1.ctypes.data,
        info1.ctypes.data if has_info else 0, ns1.ctypes.data,
        n_rr.ctypes.data, n_aa.ctypes.data, beta.ctypes.data, se.ctypes.data,
        chisq.ctypes.data, logp.ctypes.data, fail.ctypes.data,
        out.ctypes.data, row_len.ctypes.data,
    )
    return out[:total].tobytes().decode("utf-8")


def htp_prefixes(bsnps) -> tuple:
    """Concatenated per-variant HTP row prefixes "Name\\tChr\\tPos\\tRef\\tAlt"."""
    buf = bytearray()
    off = np.empty(len(bsnps) + 1, np.int64)
    off[0] = 0
    for i, s in enumerate(bsnps):
        buf += f"{s.ID}\t{s.chrom}\t{s.physpos}\t{s.allele1}\t{s.allele2}".encode()
        off[i + 1] = len(buf)
    return np.frombuffer(bytes(buf), np.uint8), off


def format_block_htp(params, prefix_buf, prefix_off, pheno_name, model, skip,
                     beta, se, chisq, logp, af, info, mac, genocounts, neff,
                     test_fail) -> Optional[str]:
    """Native batch renderer for the HTPv4 format (format_sumstat_htp in
    native/decoder.cpp), byte-identical to sumstat_line_htp. Returns
    None when the native lib is unavailable."""
    from ..config import BT, CT, T2E

    lib = native_formatter("format_sumstat_htp")
    if lib is None:
        return None
    B = len(prefix_off) - 1
    mid = f"\t{pheno_name}\t{params.cohort_name}\t{model}"

    f64 = _f64
    beta, se = f64(beta), f64(se)
    chisq, logp, af = f64(chisq), f64(logp), f64(af)
    mac = f64(mac if mac is not None else np.full(B, -1.0))
    skip = np.ascontiguousarray(skip, np.uint8)
    test_fail = np.ascontiguousarray(test_fail, np.uint8)
    has_info = bool(params.dosage_mode) and info is not None
    info = f64(info) if has_info else None
    gc = (np.ascontiguousarray(genocounts, np.int64)
          if genocounts is not None else None)
    trait = {BT: 1, CT: 2, T2E: 3}.get(params.trait_mode, 0)
    budget = int(lib.htp_field_budget()) + len(mid.encode())
    out = np.empty(int(prefix_off[-1]) + B * budget, np.uint8)
    row_len = np.empty(B, np.int64)
    pb = np.ascontiguousarray(prefix_buf, np.uint8)
    po = np.ascontiguousarray(prefix_off, np.int64)
    total = lib.format_sumstat_htp(
        pb.ctypes.data, po.ctypes.data, B, skip.ctypes.data, mid.encode(),
        trait, int(bool(params.firth)), int(bool(params.uncapped_pvals)),
        int(has_info), float(params.zcrit),
        beta.ctypes.data, se.ctypes.data, chisq.ctypes.data, logp.ctypes.data,
        af.ctypes.data, info.ctypes.data if has_info else 0, mac.ctypes.data,
        gc.ctypes.data if gc is not None else 0,
        int(neff) if neff is not None else -1,
        test_fail.ctypes.data, out.ctypes.data, row_len.ctypes.data,
    )
    return out[:total].tobytes().decode("utf-8")


def header_htp() -> str:
    """HTPv4 header (print_header_output_htp, Step2_Models.cpp:2400)."""
    cols = [
        "Name", "Chr", "Pos", "Ref", "Alt", "Trait", "Cohort", "Model",
        "Effect", "LCI_Effect", "UCI_Effect", "Pval", "AAF",
        "Num_Cases", "Cases_Ref", "Cases_Het", "Cases_Alt",
        "Num_Controls", "Controls_Ref", "Controls_Het", "Controls_Alt", "Info",
    ]
    return "\t".join(cols) + "\n"


def sumstat_line_htp(
    params: Params,
    snp: SnpInfo,
    pheno_name: str,
    model: str,
    beta: float,
    se: float,
    chisq: float,
    logp: float,
    af: float,
    info: Optional[float],
    mac: float,
    genocounts,  # [6] ints (cases RR/RA/AA, controls RR/RA/AA) or None
    test_pass: bool = True,
    neff=None,
) -> str:
    """One HTPv4 row (print_sum_stats_htp, Step2_Models.cpp:2548-2646)."""
    from ..utils.stats import convert_logp_raw
    from ..config import BT, QT, T2E

    zcrit = params.zcrit
    print_beta = test_pass and se >= 0 and not np.isnan(se)
    print_pv = test_pass and chisq >= 0 and not np.isnan(logp)
    outp = "NA"
    if print_pv:
        cap = 308.0  # -log10(dbl_min)-ish cap
        if not params.uncapped_pvals and logp > cap:
            outp = convert_logp_raw(cap)
        elif logp > 0:
            outp = convert_logp_raw(logp)
        else:
            outp = "0.9999999"

    parts = [snp.ID, str(snp.chrom), str(snp.physpos), snp.allele1, snp.allele2,
             pheno_name, params.cohort_name, model]

    is_bt = params.trait_mode == BT
    if print_pv and not print_beta:
        parts += ["NA", "NA", "NA", outp]
    elif not print_pv and not print_beta:
        parts += ["NA", "NA", "NA", "NA"]
    elif (params.trait_mode != BT) or (is_bt and params.firth and test_pass):
        if params.trait_mode == QT:
            parts += [fmt(beta), fmt(beta - zcrit * se), fmt(beta + zcrit * se)]
        else:
            parts += [fmt(np.exp(beta)), fmt(np.exp(beta - zcrit * se)),
                      fmt(np.exp(beta + zcrit * se))]
        parts.append(outp if print_pv else "NA")
    else:  # BT spa/logistic: allelic OR from genocounts
        if print_pv and genocounts is not None:
            g = genocounts
            eff = (2 * g[3] + g[4] + 0.5) * (2 * g[2] + g[1] + 0.5) / (
                (2 * g[5] + g[4] + 0.5) * (2 * g[0] + g[1] + 0.5)
            )
            outse = abs(np.log(eff)) / np.sqrt(max(chisq, 1e-300))
            parts += [fmt(eff), fmt(eff * np.exp(-zcrit * outse)),
                      fmt(eff * np.exp(zcrit * outse)), outp]
        else:
            parts += ["NA", "NA", "NA", "NA"]

    parts.append(fmt(af) if af >= 0 else "NA")

    if mac > 0 and genocounts is not None:
        g = genocounts
        parts += [str(g[0] + g[1] + g[2]), str(g[0]), str(g[1]), str(g[2])]
        if params.trait_mode in (BT, T2E):
            parts += [str(g[3] + g[4] + g[5]), str(g[3]), str(g[4]), str(g[5])]
        else:
            parts += ["NA", "NA", "NA", "NA"]
    else:
        parts += [str(int(neff)) if neff is not None else "NA", "NA", "NA", "NA",
                  "NA", "NA", "NA", "NA"]

    infoCol = []
    if print_beta:
        if params.trait_mode != QT and test_pass:
            infoCol.append(f"REGENIE_BETA={fmt(beta)}")
            infoCol.append(f"REGENIE_SE={fmt(se)}")
        elif params.trait_mode != QT:
            infoCol.append("REGENIE_BETA=NA")
            infoCol.append("REGENIE_SE=NA")
        else:
            infoCol.append(f"REGENIE_SE={fmt(se)}")
    if params.dosage_mode and info is not None and info >= 0:
        infoCol.append(f"INFO={fmt(info)}")
    if mac >= 0:
        infoCol.append(f"MAC={fmt(mac)}")
    infoCol.append(f"LOG10P={fmt(logp)}" if print_pv else "LOG10P=NA")
    parts.append(";".join(infoCol) if infoCol else "NA")
    return "\t".join(parts) + "\n"


def htp_pvalue_line(
    params: Params,
    snp,
    pheno_name: str,
    model: str,
    logp: float,
    df: int,
    n_cases: int,
    n_controls=None,
    strongest: str = "",
) -> str:
    """HTP row for p-value-only tests — gene-based VC/joint/GENE_P and
    interaction K-df rows (print_sum_stats_htp_gene,
    Joint_Tests.cpp:1025-1067)."""
    from ..utils.stats import convert_logp_raw
    from ..config import BT

    test_pass = logp >= 0 and not np.isnan(logp)
    outp = convert_logp_raw(min(logp, 308.0)) if test_pass else "NA"
    parts = [snp.ID, str(snp.chrom), str(snp.physpos),
             getattr(snp, "allele1", "NA"), getattr(snp, "allele2", "NA"),
             pheno_name, params.cohort_name, model,
             "NA", "NA", "NA", outp,
             "NA", str(int(n_cases)), "NA", "NA", "NA",
             (str(int(n_controls)) if params.trait_mode == BT and n_controls
              is not None else "NA"),
             "NA", "NA", "NA"]
    info = [f"DF={df}" if test_pass else "DF=0"]
    if strongest:
        info.append(f"STRONGEST_MASK={strongest}")
    info.append(f"LOG10P={fmt(logp)}" if test_pass else "LOG10P=NA")
    info.append("NO_BETA")
    parts.append(";".join(info))
    return "\t".join(parts) + "\n"


def sumstat_line_all(
    params: Params,
    snp: SnpInfo,
    test: str,
    af1: float,
    info1: Optional[float],
    ns1: int,
    n_rr: int,
    n_aa: int,
    per_pheno: list,  # [(beta, se, chisq, logp, test_pass)] per pheno
) -> str:
    """One merged-format row, all phenos (print_sum_stats_all,
    Step2_Models.cpp:2457-2500)."""
    parts = [str(snp.chrom), str(snp.physpos), snp.ID, snp.allele1, snp.allele2]
    parts.append(fmt(af1) if af1 >= 0 else "NA")
    if params.dosage_mode:
        parts.append(fmt(info1) if info1 is not None and info1 >= 0 else "NA")
    parts.append(str(ns1))
    if n_rr >= 0:
        parts += [str(n_rr), str(ns1 - n_rr - n_aa), str(n_aa)]
    else:
        parts += ["NA", "NA", "NA"]
    parts.append(test)
    for beta, se, chisq, logp, test_pass in per_pheno:
        print_se = (se >= 0) and not np.isnan(se)
        print_pv = (chisq >= 0) and test_pass and not np.isnan(logp)
        parts += ([fmt(beta), fmt(se)] if print_se else ["NA", "NA"])
        parts += ([fmt(chisq), fmt(logp)] if print_pv else ["NA", "NA"])
    parts.append("NA")
    return " ".join(parts) + "\n"
