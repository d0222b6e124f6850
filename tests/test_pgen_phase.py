"""Phased PGEN decode-and-drop (VERDICT r3 #7).

Hand-built fixtures following the byte layout pgenlib parses
(SkipAux2, pgenlib_read.cc:6819: aux2 first part = 1 + het_ct/8 bytes,
bit0 = explicit-phasepresent flag; explicit adds a phaseinfo bitarray
of popcount bits; the 0x80 dphase track trails the dosage values).
Hardcalls/dosages must come out identical to the equivalent unphased
records — phase is dropped, as regenie's tests are unphased.
"""

import struct

import numpy as np
import pytest

from regenie_tpu.io.pgen import PgenDecoder, open_pgen

N = 13


def _pack2(codes):
    b = bytearray((N + 3) // 4)
    for i, c in enumerate(codes):
        b[i // 4] |= int(c) << (2 * (i % 4))
    return bytes(b)


def _phase_track(het_ct, explicit=False, phasepresent=None, phaseinfo=None):
    """aux2 bytes: bit0=explicit, bits 1..het = phaseinfo (implicit) or
    phasepresent (explicit), then ceil(pp_ct/8) phaseinfo bytes."""
    nbits = het_ct + 1
    bits = np.zeros(-(-nbits // 8) * 8, np.uint8)
    if explicit:
        bits[0] = 1
        pp = np.asarray(phasepresent, np.uint8)
        bits[1 : het_ct + 1] = pp
        track = np.packbits(bits, bitorder="little").tobytes()
        pp_ct = int(pp.sum())
        pi = np.zeros(-(-pp_ct // 8) * 8, np.uint8)
        pi[:pp_ct] = (phaseinfo or [1] * pp_ct)[:pp_ct]
        track += np.packbits(pi, bitorder="little").tobytes()
        return track
    bits[1 : het_ct + 1] = (phaseinfo or [1] * het_ct)[:het_ct]
    return np.packbits(bits, bitorder="little").tobytes()


def _pgen(records, vrtypes, tmp_path, name):
    M = len(records)
    header = b"\x6c\x1b\x10" + struct.pack("<II", M, N) + bytes([0x04])
    first = len(header) + 8 + M + M
    blob = header + struct.pack("<Q", first) + bytes(vrtypes) + bytes(
        len(r) for r in records) + b"".join(records)
    path = tmp_path / name
    path.write_bytes(blob)
    return str(path)


@pytest.fixture
def phased_file(tmp_path):
    hc = np.array([0, 1, 2, 3, 0, 1, 2, 1, 0, 1, 2, 1, 0], dtype=np.uint8)
    het_ct = int((hc == 1).sum())  # 5 hets
    geno = _pack2(hc)
    records, vrtypes, exp_hc, exp_ds = [], [], [], []

    # v0: phase only (0x10): hardcalls + implicit-phase aux2, no dosage
    records.append(geno + _phase_track(het_ct))
    vrtypes.append(0x10)
    ds = hc.astype(np.float64); ds[hc == 3] = -3.0
    exp_hc.append(hc); exp_ds.append(ds)

    # v1: phase + dense dosage (0x50); implicit phase (all hets phased)
    dense = (np.arange(N, dtype=np.uint16) * 2048)
    dense[3] = 65535
    records.append(geno + _phase_track(het_ct) + dense.tobytes())
    vrtypes.append(0x50)
    ds = dense.astype(np.float64) / 16384.0; ds[3] = -3.0
    exp_hc.append(hc); exp_ds.append(ds)

    # v2: EXPLICIT phase subset + bitarray dosage (0x70): only hets
    # 0, 2, 4 phased -> phaseinfo has 3 bits
    records.append(
        geno + _phase_track(het_ct, explicit=True,
                            phasepresent=[1, 0, 1, 0, 1])
        + np.packbits(np.array([1, 0, 1, 0, 0, 1, 0, 0, 0, 0, 0, 0, 0],
                               np.uint8), bitorder="little").tobytes()
        + np.array([4096, 24576, 12288], np.uint16).tobytes())
    vrtypes.append(0x70)
    ds = hc.astype(np.float64); ds[hc == 3] = -3.0
    ds[0], ds[2], ds[5] = 0.25, 1.5, 0.75
    exp_hc.append(hc); exp_ds.append(ds)

    # v3: phased dosage (0xB0 = 0x80|0x20|0x10): deltalist dosage on
    # samples 1,4 then a dphase track (present bits + i16 deltas) that
    # must simply never be read
    dphase = np.packbits(np.array([1, 1], np.uint8),
                         bitorder="little").tobytes() + np.array(
        [100, -200], np.int16).tobytes()
    records.append(
        geno + _phase_track(het_ct) + bytes([2, 1, 3])
        + np.array([20480, 28672], np.uint16).tobytes() + dphase)
    vrtypes.append(0xB0)
    ds = hc.astype(np.float64); ds[hc == 3] = -3.0
    ds[1], ds[4] = 1.25, 1.75
    exp_hc.append(hc); exp_ds.append(ds)

    return _pgen(records, vrtypes, tmp_path, "ph.pgen"), exp_hc, exp_ds


def test_phased_pgen_python_decoder(phased_file):
    path, exp_hc, exp_ds = phased_file
    dec = PgenDecoder(open_pgen(path))
    for v in range(len(exp_hc)):
        np.testing.assert_array_equal(dec.decode(v), exp_hc[v])
        np.testing.assert_allclose(dec.dosages(v), exp_ds[v])


def test_phased_pgen_native_decoder(phased_file):
    from regenie_tpu.io.native import get_lib, pgen_decode_block_native

    if get_lib() is None:
        pytest.skip("native lib unavailable")
    path, _exp_hc, exp_ds = phased_file
    pf = open_pgen(path)
    M = len(exp_ds)
    offs = np.arange(M)
    res = pgen_decode_block_native(pf._data, pf.fpos, pf.vrtypes, offs, N)
    assert res is not None
    for v in range(M):
        np.testing.assert_allclose(res[v], exp_ds[v])
