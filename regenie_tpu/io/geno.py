"""Unified genotype data model + block streaming.

TPU-era equivalent of the reference's Geno.{hpp,cpp} front half: file
metadata, sample/variant filters, chromosome map, and a block reader
that yields [B, N] genotype arrays (the universal unit of work both
steps consume; reference get_G, Geno.cpp:1498).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, List, Optional, Tuple

import numpy as np

from ..config import Params
from .bed import BedFile, SampleInfo, SnpInfo, open_bed
from .files import iter_lines


@dataclass
class GenoData:
    """Genotype file handle + metadata after filters."""

    params: Params
    snps: List[SnpInfo] = field(default_factory=list)  # kept variants, file order
    samples: List[SampleInfo] = field(default_factory=list)  # kept samples
    sample_keep_idx: np.ndarray = None  # indices into raw file sample order
    chr_read: List[int] = field(default_factory=list)  # chroms in file order
    chr_counts: Dict[int, int] = field(default_factory=dict)  # chrom -> #snps kept
    sex: np.ndarray = None  # [N] 1=male 0=other
    _bed: Optional[BedFile] = None
    _bgen: Optional[object] = None
    _pgen: Optional[object] = None
    _keep_all_samples: bool = True
    last_info_num: Optional[np.ndarray] = None

    @property
    def n_samples(self) -> int:
        return len(self.samples)

    @property
    def n_variants(self) -> int:
        return len(self.snps)

    def sample_index(self) -> Dict[str, int]:
        """Map "FID_IID" -> row index (reference FID_IID_to_ind)."""
        return {s.key: i for i, s in enumerate(self.samples)}

    def read_block(self, block_snps: List[SnpInfo]) -> np.ndarray:
        """Decode a list of (kept, consecutive-in-file) variants.

        BED: [B, N] int8 hardcalls. BGEN: [B, N] float64 dosages; the
        INFO numerator matrix is stored in .last_info_num."""
        if self._bgen is not None:
            from .bgen import decode_block_native, decode_variant

            keep = None if self._keep_all_samples else self.sample_keep_idx
            ref_first = getattr(self.params, "ref_first", False)
            res = decode_block_native(
                self._bgen, [s.offset for s in block_snps], keep, ref_first
            )
            if res is not None:
                self.last_info_num = res[1]
                return res[0]
            B = len(block_snps)
            G = np.empty((B, self.n_samples), dtype=np.float64)
            ival = np.empty((B, self.n_samples), dtype=np.float64)
            for k, s in enumerate(block_snps):
                G[k], ival[k] = decode_variant(self._bgen, s.offset, keep, ref_first)
            self.last_info_num = ival
            return G
        if self._pgen is not None:
            from .native import pgen_decode_block_native

            pf = self._pgen.pf
            res = pgen_decode_block_native(
                pf._data, pf.fpos, pf.vrtypes,
                np.array([s.offset for s in block_snps]), pf.n_samples_file,
            )
            if res is not None:
                self.last_info_num = None
                return res if self._keep_all_samples else res[:, self.sample_keep_idx]
            B = len(block_snps)
            G = np.empty((B, self.n_samples), dtype=np.float64)
            for k, s in enumerate(block_snps):
                g = self._pgen.dosages(s.offset)
                G[k] = g if self._keep_all_samples else g[self.sample_keep_idx]
            self.last_info_num = None
            return G
        offsets = np.array([s.offset for s in block_snps])
        start, stop = int(offsets[0]), int(offsets[-1]) + 1
        raw = self._bed.read_block(start, stop - start)
        G = raw[offsets - start]
        if not self._keep_all_samples:
            G = G[:, self.sample_keep_idx]
        if getattr(self.params, "ref_first", False):
            # parseSnpfromBed (Geno.cpp:2440): hc = 2 - hc with --ref-first
            G = np.where(G == -3, G, 2 - G)
        self.last_info_num = None
        return G

    def read_block_device(self, block_snps: List[SnpInfo],
                          force_packed: bool = False):
        """Read a genotype block, shipping PACKED 2-bit bytes to the
        accelerator and decoding there when the input is BED and a
        non-CPU backend is active (4x less host->device traffic than
        int8; 16x less than f32; no host-side decode either). Falls
        back to the host decode path otherwise.

        Returns [B, N] int8 (device or host array). Shared by the
        step-1 level-0 loop and step-2 block scoring."""
        import jax

        if self._bed is not None and (force_packed
                                      or jax.default_backend() != "cpu"):
            import jax.numpy as jnp

            from ..ops.geno_ops import decode_bed_packed

            offsets = np.array([s.offset for s in block_snps])
            start, stop = int(offsets[0]), int(offsets[-1]) + 1
            raw = self._bed.read_block_bytes(start, stop - start)
            Gd = decode_bed_packed(jnp.asarray(raw), self._bed.n_samples)
            if getattr(self.params, "ref_first", False):
                Gd = jnp.where(Gd == -3, Gd, 2 - Gd).astype(jnp.int8)
            if len(offsets) != stop - start:
                Gd = Gd[jnp.asarray(offsets - start)]
            if not self._keep_all_samples:
                Gd = Gd[:, jnp.asarray(self.sample_keep_idx)]
            self.last_info_num = None
            return Gd
        return self.read_block(block_snps)

    def read_block_scattered(self, block_snps: List[SnpInfo]) -> np.ndarray:
        """Decode an arbitrary (possibly non-contiguous) variant list.

        Used by the gene-based path (getMask readChunk, Data.cpp:2944)
        and conditional/interaction SNP extraction."""
        if self._bgen is not None or self._pgen is not None:
            return self.read_block(block_snps)
        out = self._bed.read_indices(
            np.array([s.offset for s in block_snps], dtype=np.int64))
        if not self._keep_all_samples:
            out = out[:, self.sample_keep_idx]
        if getattr(self.params, "ref_first", False):
            out = np.where(out == -3, out, 2 - out).astype(np.int8)
        self.last_info_num = None
        return out

    def close(self):
        if self._bed is not None:
            self._bed.close()
        if self._bgen is not None:
            self._bgen.close()


def _read_id_file(path: str) -> set:
    ids = set()
    for toks in iter_lines(path):
        if len(toks) >= 2:
            ids.add(f"{toks[0]}_{toks[1]}")
        else:
            ids.add(f"{toks[0]}_{toks[0]}")
    return ids


def _read_snp_file(path: str) -> set:
    return {toks[0] for toks in iter_lines(path)}


def open_geno(params: Params) -> GenoData:
    """Open genotype files, apply sample/variant filters, build chr map.

    Reference: file_read_initialization (Data.cpp:155) +
    check_snps_include_exclude (Geno.cpp:1128) +
    check_samples_include_exclude (Geno.cpp:1263).
    """
    if params.file_type == "bed":
        bed = open_bed(params.bed_prefix, getattr(params, "ref_first", False))
        raw_snps, raw_samples = bed.snps, bed.samples
    elif params.file_type == "bgen":
        from .bgen import open_bgen_geno

        return open_bgen_geno(params)
    elif params.file_type == "pgen":
        from .pgen import PgenDecoder, open_pgen, read_psam, read_pvar

        pf = open_pgen(params.pgen_prefix + ".pgen")
        raw_snps = read_pvar(params.pgen_prefix + ".pvar", params.n_chrom)
        raw_samples = read_psam(params.pgen_prefix + ".psam")
        if len(raw_snps) != pf.n_variants or len(raw_samples) != pf.n_samples_file:
            raise ValueError("pvar/psam do not match pgen dimensions")
        gd = GenoData(params=params)
        gd._pgen = PgenDecoder(pf)
        params.pgen_dosage_present = bool((pf.vrtypes & 0x60).any())
        _apply_filters(params, gd, raw_snps, raw_samples)
        return gd
    else:
        raise NotImplementedError(f"file type {params.file_type} not yet supported")

    gd = GenoData(params=params)
    gd._bed = bed
    _apply_filters(params, gd, raw_snps, raw_samples)
    return gd


def _apply_filters(params, gd, raw_snps, raw_samples):
    # ---- sample filters (keep/remove) ----
    keep_mask = np.ones(len(raw_samples), dtype=bool)
    if params.keep_files:
        keep_ids = set()
        for f in params.keep_files:
            keep_ids |= _read_id_file(f)
        for i, s in enumerate(raw_samples):
            keep_mask[i] = s.key in keep_ids
    if params.remove_files:
        rm_ids = set()
        for f in params.remove_files:
            rm_ids |= _read_id_file(f)
        for i, s in enumerate(raw_samples):
            if s.key in rm_ids:
                keep_mask[i] = False
    # sex-specific analyses (--sex-specific, Geno.cpp:1287)
    if params.sex_specific:
        for i, s in enumerate(raw_samples):
            if s.sex != params.sex_specific:
                keep_mask[i] = False
    gd.sample_keep_idx = np.flatnonzero(keep_mask)
    gd._keep_all_samples = bool(keep_mask.all())
    gd.samples = [raw_samples[i] for i in gd.sample_keep_idx]
    gd.sex = np.array([1 if s.sex == 1 else 0 for s in gd.samples], dtype=np.int32)

    # ---- variant filters (extract/exclude) ----
    snp_keep = np.ones(len(raw_snps), dtype=bool)
    # --range window (check_snps_include_exclude, Geno.cpp:2790)
    if params.range_chr != -1:
        for i, s in enumerate(raw_snps):
            if (s.chrom != params.range_chr or s.physpos < params.range_min
                    or s.physpos > params.range_max):
                snp_keep[i] = False
    if params.extract_files:
        ids = set()
        for f in params.extract_files:
            ids |= _read_snp_file(f)
        for i, s in enumerate(raw_snps):
            snp_keep[i] = s.ID in ids
    if params.exclude_files:
        ids = set()
        for f in params.exclude_files:
            ids |= _read_snp_file(f)
        for i, s in enumerate(raw_snps):
            if s.ID in ids:
                snp_keep[i] = False
    # chromosome filters (step 2 --chr/--chrList)
    if params.chr_list:
        from .bed import chr_to_int

        chrs = {chr_to_int(c) for c in params.chr_list}
        for i, s in enumerate(raw_snps):
            if s.chrom not in chrs:
                snp_keep[i] = False
    gd.snps = [s for s, k in zip(raw_snps, snp_keep) if k]

    # --extract-or/--exclude-or: gate which variants the MAC filter
    # applies to (check_snps_include_exclude_or, Geno.cpp:1225-1241)
    if params.exclude_or_files:
        ids = set()
        for f in params.exclude_or_files:
            ids |= _read_snp_file(f)
        for s in gd.snps:
            s.mac_fail_if_checked = s.ID in ids
    elif params.extract_or_files:
        ids = set()
        for f in params.extract_or_files:
            ids |= _read_snp_file(f)
        for s in gd.snps:
            s.mac_fail_if_checked = s.ID not in ids

    # --force-mac-filter snpfile,MAC: separate threshold for a subset
    # (check_forced_MAC_file, Geno.cpp:1249)
    if params.forced_mac_snpfile:
        ids = _read_snp_file(params.forced_mac_snpfile)
        for s in gd.snps:
            s.forced_mac_filter = s.ID in ids

    # ---- chromosome map, file order (reference chr_read) ----
    for s in gd.snps:
        if s.chrom not in gd.chr_counts:
            gd.chr_counts[s.chrom] = 0
            gd.chr_read.append(s.chrom)
        gd.chr_counts[s.chrom] += 1

    params.n_samples = gd.n_samples
    params.n_variants = gd.n_variants


def make_blocks(gd: GenoData, block_size: int) -> List[Tuple[int, List[SnpInfo]]]:
    """Split kept variants into per-chromosome blocks of `block_size`
    (reference set_blocks, Data.cpp:311). Returns [(chrom, snps)]."""
    blocks = []
    by_chr: Dict[int, List[SnpInfo]] = {}
    for s in gd.snps:
        by_chr.setdefault(s.chrom, []).append(s)
    for chrom in gd.chr_read:
        snps = by_chr[chrom]
        for i in range(0, len(snps), block_size):
            blocks.append((chrom, snps[i : i + block_size]))
    return blocks
