"""Byte-equality of the native batch sumstat renderer (OpenMP snprintf
%g, native/decoder.cpp format_sumstat_single) against the per-row
Python formatter sumstat_line_single across NA/fail/af-cc/INFO cases."""

import numpy as np
import pytest

from regenie_tpu.io import output as O
from regenie_tpu.io.bed import SnpInfo
from regenie_tpu.io.native import get_lib


class _P:
    def __init__(self, af_cc=False, dosage_mode=False):
        self.af_cc = af_cc
        self.dosage_mode = dosage_mode


def _snps(B, rng):
    out = []
    for b in range(B):
        out.append(SnpInfo(
            ID=f"rs{rng.integers(1, 10**7)}",
            chrom=int(rng.integers(1, 23)),
            physpos=int(rng.integers(1, 10**8)),
            genpos=0.0,
            allele1="".join(rng.choice(list("ACGT"), rng.integers(1, 12))),
            allele2="".join(rng.choice(list("ACGT"), rng.integers(1, 12))),
            offset=b,
        ))
    return out


@pytest.mark.skipif(get_lib() is None or not hasattr(get_lib(), "format_sumstat_single"),
                    reason="native lib unavailable")
@pytest.mark.parametrize("af_cc,dosage", [(False, False), (True, False),
                                          (False, True), (True, True)])
def test_native_rows_match_python(af_cc, dosage):
    rng = np.random.default_rng(hash((af_cc, dosage)) % 2**31)
    B = 257
    params = _P(af_cc=af_cc, dosage_mode=dosage)
    snps = _snps(B, rng)
    af = np.where(rng.random(B) < 0.1, -1.0, rng.random(B))
    info = rng.random(B)
    n = rng.integers(100, 500000, B)
    beta = rng.normal(size=B) * 10.0 ** rng.integers(-8, 4, B)
    se = np.abs(rng.normal(size=B))
    se[rng.random(B) < 0.07] = np.nan  # -> NA NA
    se[rng.random(B) < 0.05] = -1.0
    chisq = np.abs(rng.normal(size=B)) * 10.0 ** rng.integers(-3, 3, B)
    chisq[rng.random(B) < 0.05] = -1.0
    logp = np.abs(rng.normal(size=B)) * 50
    logp[rng.random(B) < 0.04] = np.nan
    test_fail = rng.random(B) < 0.1
    skip = rng.random(B) < 0.15
    af_case = rng.random(B)
    af_control = rng.random(B)
    ns_case = rng.integers(0, 10000, B)
    ns_control = rng.integers(0, 400000, B)

    pb, po = O.block_prefixes(snps)
    got = O.format_block_single(
        params, pb, po, "ADD", skip=skip, af=af,
        info=info if dosage else None, n=n, beta=beta, se=se,
        chisq=chisq, logp=logp, test_fail=test_fail,
        af_case=af_case if af_cc else None,
        af_control=af_control if af_cc else None,
        ns_case=ns_case if af_cc else None,
        ns_control=ns_control if af_cc else None,
    )
    assert got is not None

    want = []
    for b in range(B):
        if skip[b]:
            continue
        want.append(O.sumstat_line_single(
            params, snps[b], "ADD", af[b],
            (info[b] if dosage else None), int(n[b]),
            beta[b], se[b], chisq[b], logp[b],
            test_pass=not test_fail[b],
            af_case=af_case[b] if af_cc else -1,
            af_control=af_control[b] if af_cc else -1,
            ns_case=int(ns_case[b]) if af_cc else -1,
            ns_control=int(ns_control[b]) if af_cc else -1,
        ))
    assert got == "".join(want)


@pytest.mark.skipif(get_lib() is None or not hasattr(get_lib(), "format_sumstat_single"),
                    reason="native lib unavailable")
def test_native_rows_no_info_matrix_prints_one():
    """dosage_mode with no INFO matrix prints INFO=1 (reference
    behavior), not NA."""
    rng = np.random.default_rng(3)
    params = _P(dosage_mode=True)
    snps = _snps(4, rng)
    pb, po = O.block_prefixes(snps)
    got = O.format_block_single(
        params, pb, po, "ADD", skip=np.zeros(4, bool),
        af=np.full(4, 0.25), info=None, n=np.full(4, 100),
        beta=np.ones(4), se=np.ones(4), chisq=np.ones(4),
        logp=np.ones(4), test_fail=np.zeros(4, bool),
    )
    for line in got.splitlines():
        assert line.split()[6] == "1"


class _PH:
    """Params stand-in for HTP rows."""
    def __init__(self, trait_mode, firth=False, dosage_mode=False,
                 uncapped_pvals=False):
        from regenie_tpu.config import QT
        self.trait_mode = trait_mode
        self.firth = firth
        self.dosage_mode = dosage_mode
        self.uncapped_pvals = uncapped_pvals
        self.cohort_name = "COHORT1"
        self.zcrit = 1.959963984540054
        self.af_cc = False


@pytest.mark.skipif(get_lib() is None or not hasattr(get_lib(), "format_sumstat_htp"),
                    reason="native lib unavailable")
@pytest.mark.parametrize("trait,firth,dosage,gc", [
    ("qt", False, False, True), ("qt", False, True, False),
    ("bt", False, False, True), ("bt", True, True, True),
    ("bt", False, False, False), ("t2e", True, False, True),
])
def test_native_htp_rows_match_python(trait, firth, dosage, gc):
    from regenie_tpu.config import BT, QT, T2E

    tm = {"qt": QT, "bt": BT, "t2e": T2E}[trait]
    rng = np.random.default_rng(abs(hash((trait, firth, dosage, gc))) % 2**31)
    B = 211
    params = _PH(tm, firth=firth, dosage_mode=dosage)
    snps = _snps(B, rng)
    beta = rng.normal(size=B)
    se = np.abs(rng.normal(size=B))
    se[rng.random(B) < 0.08] = np.nan
    se[rng.random(B) < 0.05] = -1.0
    chisq = np.abs(rng.normal(size=B)) * 10.0 ** rng.integers(-2, 3, B)
    chisq[rng.random(B) < 0.05] = -1.0
    logp = np.abs(rng.normal(size=B)) * 10.0 ** rng.integers(-2, 3, B)
    logp[rng.random(B) < 0.05] = 0.0       # -> "0.9999999"
    logp[rng.random(B) < 0.05] = 400.0     # above the 308 cap
    logp[rng.random(B) < 0.04] = np.nan
    af = np.where(rng.random(B) < 0.1, -1.0, rng.random(B))
    info = rng.random(B)
    mac = rng.integers(0, 5000, B).astype(float)
    mac[rng.random(B) < 0.1] = -1.0
    genocounts = rng.integers(0, 3000, (B, 6)) if gc else None
    test_fail = rng.random(B) < 0.1
    skip = rng.random(B) < 0.12
    neff = 123456

    pb, po = O.htp_prefixes(snps)
    got = O.format_block_htp(
        params, pb, po, "Y_one", "ADD", skip=skip, beta=beta, se=se,
        chisq=chisq, logp=logp, af=af, info=info if dosage else None,
        mac=mac, genocounts=genocounts, neff=neff, test_fail=test_fail,
    )
    assert got is not None
    want = []
    for b in range(B):
        if skip[b]:
            continue
        want.append(O.sumstat_line_htp(
            params, snps[b], "Y_one", "ADD", beta[b], se[b], chisq[b],
            logp[b], af[b], info[b] if dosage else None, mac[b],
            genocounts[b] if gc else None,
            test_pass=not test_fail[b], neff=neff,
        ))
    want = "".join(want)
    if got != want:
        ga, wa = got.splitlines(), want.splitlines()
        for i, (x, y) in enumerate(zip(ga, wa)):
            assert x == y, f"row {i}:\nnative: {x}\npython: {y}"
    assert got == want


@pytest.mark.skipif(get_lib() is None or not hasattr(get_lib(), "format_sumstat_all"),
                    reason="native lib unavailable")
@pytest.mark.parametrize("dosage,gc", [(False, True), (True, False)])
def test_native_all_rows_match_python(dosage, gc):
    rng = np.random.default_rng(abs(hash(("all", dosage, gc))) % 2**31)
    B, P = 173, 5
    params = _P(dosage_mode=dosage)
    snps = _snps(B, rng)
    af1 = np.where(rng.random(B) < 0.1, -1.0, rng.random(B))
    info1 = rng.random(B)
    ns1 = rng.integers(100, 500000, B)
    n_rr = rng.integers(0, 1000, B) if gc else np.full(B, -1)
    n_aa = rng.integers(0, 1000, B) if gc else np.full(B, -1)
    beta = rng.normal(size=(B, P))
    se = np.abs(rng.normal(size=(B, P)))
    se[rng.random((B, P)) < 0.07] = np.nan
    se[rng.random((B, P)) < 0.05] = -1.0
    chisq = np.abs(rng.normal(size=(B, P)))
    chisq[rng.random((B, P)) < 0.05] = -1.0
    logp = np.abs(rng.normal(size=(B, P))) * 30
    logp[rng.random((B, P)) < 0.04] = np.nan
    fail = rng.random((B, P)) < 0.1
    skip = rng.random(B) < 0.12

    pb, po = O.block_prefixes(snps)
    got = O.format_block_all(
        params, pb, po, "ADD", skip=skip, af1=af1,
        info1=info1 if dosage else None, ns1=ns1, n_rr=n_rr, n_aa=n_aa,
        beta=beta, se=se, chisq=chisq, logp=logp, fail=fail,
    )
    assert got is not None
    want = []
    for b in range(B):
        if skip[b]:
            continue
        per = [(beta[b, p], se[b, p], chisq[b, p], logp[b, p], not fail[b, p])
               for p in range(P)]
        want.append(O.sumstat_line_all(
            params, snps[b], "ADD", af1[b],
            info1[b] if dosage else None, int(ns1[b]), int(n_rr[b]),
            int(n_aa[b]), per,
        ))
    assert got == "".join(want)
