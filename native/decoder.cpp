// Native genotype decode kernels for regenie_tpu.
//
// TPU-era replacement for the reference's native decode paths
// (parseSnpfromBed Geno.cpp:2414, parseSnpfromBGEN Geno.cpp:2186,
// pgenlib): multi-threaded host-side byte decode feeding the device
// pipeline. Exposed via a C ABI consumed through ctypes
// (regenie_tpu/io/native.py).
//
// Build: make -C native  ->  libregenie_native.so

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <cmath>
#include <locale.h>
#include <zlib.h>
#include <zstd.h>

#if defined(_OPENMP)
#include <omp.h>
#endif

extern "C" {

// ---------------------------------------------------------------------------
// PLINK BED 2-bit decode: ref-last coding 00->2, 01->missing(-3), 10->1, 11->0
// ---------------------------------------------------------------------------
static int8_t BED_LUT[256][4];
static bool bed_lut_init = false;

static void init_bed_lut() {
  static const int8_t map4[4] = {2, -3, 1, 0};
  for (int b = 0; b < 256; b++)
    for (int j = 0; j < 4; j++)
      BED_LUT[b][j] = map4[(b >> (2 * j)) & 3];
  bed_lut_init = true;
}

// raw: [n_snps, n_bytes] packed; out: [n_snps, n_samples] int8
void bed_decode(const uint8_t* raw, int64_t n_snps, int64_t n_bytes,
                int64_t n_samples, int8_t* out) {
  if (!bed_lut_init) init_bed_lut();
#if defined(_OPENMP)
#pragma omp parallel for schedule(static)
#endif
  for (int64_t s = 0; s < n_snps; s++) {
    const uint8_t* src = raw + s * n_bytes;
    int8_t* dst = out + s * n_samples;
    int64_t i = 0;
    const int64_t full = n_samples / 4;
    for (int64_t b = 0; b < full; b++) {
      const int8_t* lut = BED_LUT[src[b]];
      dst[i++] = lut[0];
      dst[i++] = lut[1];
      dst[i++] = lut[2];
      dst[i++] = lut[3];
    }
    if (i < n_samples) {
      const int8_t* lut = BED_LUT[src[full]];
      for (int j = 0; i < n_samples; j++) dst[i++] = lut[j];
    }
  }
}

// ---------------------------------------------------------------------------
// BGEN v1.2 genotype block decode (unphased diploid biallelic, 8/16 bit)
// comp: concatenated compressed blocks; offsets/csizes/usizes per variant.
// dosage: [n_var, n_samples] (missing = -3); info_num: same shape
// (4*p_hom + p_het - ds^2 contribution). ref_last: dosage counts the
// FIRST allele (regenie default); otherwise the last.
// Returns number of failed variants.
// ---------------------------------------------------------------------------
int64_t bgen12_decode(const uint8_t* comp, const int64_t* offsets,
                      const int64_t* csizes, const int64_t* usizes,
                      int64_t n_var, int64_t n_samples, int compression,
                      int ref_last, double* dosage, double* info_num) {
  int64_t n_fail = 0;
#if defined(_OPENMP)
#pragma omp parallel for schedule(dynamic) reduction(+ : n_fail)
#endif
  for (int64_t v = 0; v < n_var; v++) {
    const uint8_t* src = comp + offsets[v];
    int64_t usize = usizes[v];
    uint8_t* buf = new uint8_t[usize];
    bool ok = true;
    if (compression == 1) {
      uLongf dlen = (uLongf)usize;
      ok = (uncompress(buf, &dlen, src, (uLong)csizes[v]) == Z_OK) &&
           ((int64_t)dlen == usize);
    } else if (compression == 2) {
      size_t r = ZSTD_decompress(buf, usize, src, csizes[v]);
      ok = !ZSTD_isError(r) && ((int64_t)r == usize);
    } else {
      memcpy(buf, src, usize);
    }
    double* ds = dosage + v * n_samples;
    double* iv = info_num + v * n_samples;
    if (usize < 10) ok = false;
    if (ok) {
      uint32_t N;
      memcpy(&N, buf, 4);
      uint16_t K;
      memcpy(&K, buf + 4, 2);
      uint8_t minp = buf[6], maxp = buf[7];
      const uint8_t* ploidy = buf + 8;
      // validate the N-dependent extent before dereferencing past the
      // ploidy array (truncated/corrupt block -> fail, not OOB read)
      uint8_t phased = 1, bits = 0;
      if ((int64_t)N == n_samples &&
          usize >= (int64_t)(10 + (uint64_t)N + 2 * (uint64_t)N)) {
        phased = buf[8 + N];
        bits = buf[9 + N];
      }
      if ((int64_t)N != n_samples || K != 2 || minp != 2 || maxp != 2 ||
          phased != 0 || (bits != 8 && bits != 16) ||
          (bits == 16 &&
           usize < (int64_t)(10 + (uint64_t)N + 4 * (uint64_t)N))) {
        ok = false;
      } else {
        const uint8_t* body = buf + 10 + N;
        if (bits == 8) {
          for (int64_t i = 0; i < n_samples; i++) {
            if (ploidy[i] & 0x80) {
              ds[i] = -3.0;
              iv[i] = 0.0;
              continue;
            }
            double p0 = body[2 * i] / 255.0;
            double p1 = body[2 * i + 1] / 255.0;
            double p2 = 1.0 - p0 - p1;
            if (p2 < 0) p2 = 0;
            double d = ref_last ? (p1 + 2.0 * p0) : (p1 + 2.0 * p2);
            double ph = ref_last ? p0 : p2;
            ds[i] = d;
            iv[i] = 4.0 * ph + p1 - d * d;
          }
        } else {  // 16-bit
          const uint16_t* b16 = (const uint16_t*)body;
          for (int64_t i = 0; i < n_samples; i++) {
            if (ploidy[i] & 0x80) {
              ds[i] = -3.0;
              iv[i] = 0.0;
              continue;
            }
            double p0 = b16[2 * i] / 65535.0;
            double p1 = b16[2 * i + 1] / 65535.0;
            double p2 = 1.0 - p0 - p1;
            if (p2 < 0) p2 = 0;
            double d = ref_last ? (p1 + 2.0 * p0) : (p1 + 2.0 * p2);
            double ph = ref_last ? p0 : p2;
            ds[i] = d;
            iv[i] = 4.0 * ph + p1 - d * d;
          }
        }
      }
    }
    if (!ok) {
      n_fail += 1;
      for (int64_t i = 0; i < n_samples; i++) ds[i] = -3.0;
    }
    delete[] buf;
  }
  return n_fail;
}

// ---------------------------------------------------------------------------
// BGEN v1.2-8bit probability-PLANE extraction for the fused TPU scorer:
// inflate only, no parse — emits the two per-sample probability bytes
// de-interleaved (k0 = P(hom first allele), k1 = P(het)), with missing
// samples marked by the impossible sentinel k0 = k1 = 255. The device
// kernel reconstructs dosage = (2*k0 + k1)/255 (ref-last coding) and
// its square from exact-bf16 byte planes.
//
// Fails (returns >0, caller falls back to the parsing decoder) if any
// variant is not unphased diploid biallelic 8-bit, or if any
// NON-missing sample has k0 + k1 > 255 (would clip p2 — the linear
// ref-first identity 2 - ds would break there).
// ---------------------------------------------------------------------------
int64_t bgen12_extract_planes(const uint8_t* comp, const int64_t* offsets,
                              const int64_t* csizes, const int64_t* usizes,
                              int64_t n_var, int64_t n_samples,
                              int compression, uint8_t* planes_out) {
  int64_t n_fail = 0;
#if defined(_OPENMP)
#pragma omp parallel for schedule(dynamic) reduction(+ : n_fail)
#endif
  for (int64_t v = 0; v < n_var; v++) {
    const uint8_t* src = comp + offsets[v];
    int64_t usize = usizes[v];
    uint8_t* buf = new uint8_t[usize];
    bool ok = true;
    if (compression == 1) {
      uLongf dlen = (uLongf)usize;
      ok = (uncompress(buf, &dlen, src, (uLong)csizes[v]) == Z_OK) &&
           ((int64_t)dlen == usize);
    } else if (compression == 2) {
      size_t r = ZSTD_decompress(buf, usize, src, csizes[v]);
      ok = !ZSTD_isError(r) && ((int64_t)r == usize);
    } else {
      memcpy(buf, src, usize);
    }
    uint8_t* k0 = planes_out + v * 2 * n_samples;
    uint8_t* k1 = k0 + n_samples;
    if (ok && usize >= 10) {
      uint32_t N;
      memcpy(&N, buf, 4);
      uint16_t K;
      memcpy(&K, buf + 4, 2);
      uint8_t minp = buf[6], maxp = buf[7];
      // validate the full header+body extent BEFORE dereferencing the
      // N-dependent offsets (a truncated/corrupt block must fail,
      // not read out of bounds)
      if ((int64_t)N != n_samples || K != 2 || minp != 2 || maxp != 2 ||
          usize < (int64_t)(10 + (uint64_t)N + 2 * (uint64_t)N)) {
        ok = false;
      } else {
        const uint8_t* ploidy = buf + 8;
        uint8_t phased = buf[8 + N];
        uint8_t bits = buf[9 + N];
        if (phased != 0 || bits != 8) {
          ok = false;
        } else {
          const uint8_t* body = buf + 10 + N;
          for (int64_t i = 0; i < n_samples; i++) {
            if (ploidy[i] & 0x80) {
              k0[i] = 255;
              k1[i] = 255;
              continue;
            }
            uint8_t a = body[2 * i], b = body[2 * i + 1];
            if ((int)a + (int)b > 255) {
              ok = false;
              break;
            }
            k0[i] = a;
            k1[i] = b;
          }
        }
      }
    } else {
      ok = false;
    }
    if (!ok) n_fail += 1;
    delete[] buf;
  }
  return n_fail;
}

// ---------------------------------------------------------------------------
// PLINK2 PGEN hardcall+dosage block decode (pgenlib replacement,
// SURVEY.md §2.2). Mirrors the tested pure-python decoder in
// regenie_tpu/io/pgen.py bit-for-bit: vrtype 2-bit direct / onebit /
// difflist-vs-constant / LD-compressed hardcalls, then the unphased
// 16-bit dosage tracks (0x20 deltalist, 0x40 dense, 0x60 bitarray).
// Output dosages are ALT counts with missing = -3.
// ---------------------------------------------------------------------------

static inline uint32_t pgen_vint31(const uint8_t* data, uint64_t* pos) {
  uint32_t val = 0;
  int shift = 0;
  for (;;) {
    uint8_t b = data[(*pos)++];
    val |= (uint32_t)(b & 0x7F) << shift;
    if (!(b & 0x80)) return val;
    shift += 7;
  }
}

static inline int pgen_sid_bytes(int64_t n) {
  int bits = 0;
  while (n > 0) { bits++; n >>= 1; }
  return (bits + 7) / 8;
}

// difflist: [vint L][group first-IDs][group fpos bytes][2-bit raregeno]
// [vint deltas]. ids/rare must hold N entries. Returns L.
static int64_t pgen_parse_difflist(const uint8_t* data, uint64_t* ppos,
                                   int64_t N, int64_t* ids, uint8_t* rare) {
  uint64_t pos = *ppos;
  int64_t L = pgen_vint31(data, &pos);
  if (L == 0) { *ppos = pos; return 0; }
  const int sid_bytes = pgen_sid_bytes(N);
  const int64_t group_ct = (L + 63) / 64;
  for (int64_t g = 0; g < group_ct; g++) {
    int64_t v = 0;
    for (int b = 0; b < sid_bytes; b++) v |= (int64_t)data[pos + b] << (8 * b);
    ids[g * 64] = v;
    pos += sid_bytes;
  }
  pos += group_ct - 1;  // per-group fpos offset bytes (sequential skip)
  const int64_t nb = (L + 3) / 4;
  for (int64_t i = 0; i < L; i++)
    rare[i] = (data[pos + (i >> 2)] >> (2 * (i & 3))) & 3;
  pos += nb;
  for (int64_t g = 0; g < group_ct; g++) {
    const int64_t cnt = (L - g * 64 < 64) ? L - g * 64 : 64;
    int64_t cur = ids[g * 64];
    for (int64_t j = 1; j < cnt; j++) {
      cur += pgen_vint31(data, &pos);
      ids[g * 64 + j] = cur;
    }
  }
  *ppos = pos;
  return L;
}

// deltalist = difflist without the raregeno track. Returns L.
static int64_t pgen_parse_deltalist(const uint8_t* data, uint64_t* ppos,
                                    int64_t N, int64_t* ids) {
  uint64_t pos = *ppos;
  int64_t L = pgen_vint31(data, &pos);
  if (L == 0) { *ppos = pos; return 0; }
  const int sid_bytes = pgen_sid_bytes(N);
  const int64_t group_ct = (L + 63) / 64;
  for (int64_t g = 0; g < group_ct; g++) {
    int64_t v = 0;
    for (int b = 0; b < sid_bytes; b++) v |= (int64_t)data[pos + b] << (8 * b);
    ids[g * 64] = v;
    pos += sid_bytes;
  }
  pos += group_ct - 1;
  for (int64_t g = 0; g < group_ct; g++) {
    const int64_t cnt = (L - g * 64 < 64) ? L - g * 64 : 64;
    int64_t cur = ids[g * 64];
    for (int64_t j = 1; j < cnt; j++) {
      cur += pgen_vint31(data, &pos);
      ids[g * 64 + j] = cur;
    }
  }
  *ppos = pos;
  return L;
}

// Decode the non-LD hardcall track of one variant into codes (0..3).
// Sets *end_pos just past the genotype track. Returns false on
// unsupported layouts (multiallelic).
static bool pgen_hardcalls(const uint8_t* data, uint64_t pos, uint8_t vrtype,
                           int64_t N, uint8_t* codes, int64_t* scratch_ids,
                           uint8_t* scratch_rare, uint64_t* end_pos) {
  if (vrtype & 8) return false;  // multiallelic
  if (!(vrtype & 4)) {
    if (vrtype & 1) {
      // onebit: [common2 byte][bitarray][exception difflist]
      const uint8_t common2 = data[pos++];
      const uint8_t base = common2 >> 2, delta = common2 & 3;
      for (int64_t i = 0; i < N; i++)
        codes[i] = base + (((data[pos + (i >> 3)] >> (i & 7)) & 1) ? delta : 0);
      pos += (N + 7) / 8;
      int64_t L = pgen_parse_difflist(data, &pos, N, scratch_ids, scratch_rare);
      for (int64_t k = 0; k < L; k++) codes[scratch_ids[k]] = scratch_rare[k];
    } else {
      for (int64_t i = 0; i < N; i++)
        codes[i] = (data[pos + (i >> 2)] >> (2 * (i & 3))) & 3;
      pos += (N + 3) / 4;
    }
    *end_pos = pos;
    return true;
  }
  const uint8_t low2 = vrtype & 3;
  if (low2 == 1) {  // all hom-ref, no difflist
    memset(codes, 0, N);
    *end_pos = pos;
    return true;
  }
  memset(codes, low2, N);
  int64_t L = pgen_parse_difflist(data, &pos, N, scratch_ids, scratch_rare);
  for (int64_t k = 0; k < L; k++) codes[scratch_ids[k]] = scratch_rare[k];
  *end_pos = pos;
  return true;
}

// Batch decode. uniq[U]: variant indices whose hardcalls are needed
// (requested variants plus LD bases). base_of[U]: index into uniq of the
// LD base row (-1 = non-LD). want[B]: indices into uniq for the output
// rows. out: [B, N] float64 ALT dosages, missing = -3.
// Returns the number of variants that failed (caller falls back to the
// python decoder when > 0).
int64_t pgen_decode_block(const uint8_t* data, const uint64_t* fpos,
                          const uint8_t* vrtypes, const int64_t* uniq,
                          const int64_t* base_of, int64_t U, int64_t N,
                          const int64_t* want, int64_t B, uint8_t* codes_buf,
                          double* out) {
  int64_t n_fail = 0;
  uint64_t* gt_end = new uint64_t[U];

  // phase 1: non-LD variants (independent given fpos)
#if defined(_OPENMP)
#pragma omp parallel
#endif
  {
    int64_t* ids = new int64_t[N > 64 ? N : 64];
    uint8_t* rare = new uint8_t[N > 64 ? N : 64];
#if defined(_OPENMP)
#pragma omp for schedule(dynamic, 16) reduction(+ : n_fail)
#endif
    for (int64_t u = 0; u < U; u++) {
      if (base_of[u] >= 0) continue;
      const int64_t v = uniq[u];
      if (!pgen_hardcalls(data, fpos[v], vrtypes[v], N, codes_buf + u * N,
                          ids, rare, &gt_end[u]))
        n_fail += 1;
    }
    // phase 2: LD-compressed variants (bases decoded above)
#if defined(_OPENMP)
#pragma omp for schedule(dynamic, 16) reduction(+ : n_fail)
#endif
    for (int64_t u = 0; u < U; u++) {
      if (base_of[u] < 0) continue;
      const int64_t v = uniq[u];
      const uint8_t vrtype = vrtypes[v];
      uint8_t* dst = codes_buf + u * N;
      const uint8_t* base = codes_buf + base_of[u] * N;
      if (vrtype & 1) {  // inverted: hom-ref <-> hom-alt
        for (int64_t i = 0; i < N; i++) {
          uint8_t c = base[i];
          dst[i] = (c == 0) ? 2 : ((c == 2) ? 0 : c);
        }
      } else {
        memcpy(dst, base, N);
      }
      uint64_t pos = fpos[v];
      int64_t L = pgen_parse_difflist(data, &pos, N, ids, rare);
      for (int64_t k = 0; k < L; k++) dst[ids[k]] = rare[k];
      gt_end[u] = pos;
    }
    // phase 3: requested rows -> dosages with the 16-bit dosage tracks
#if defined(_OPENMP)
#pragma omp for schedule(dynamic, 16) reduction(+ : n_fail)
#endif
    for (int64_t b = 0; b < B; b++) {
      const int64_t u = want[b];
      const int64_t v = uniq[u];
      const uint8_t vrtype = vrtypes[v];
      const uint8_t* codes = codes_buf + u * N;
      double* ds = out + b * N;
      for (int64_t i = 0; i < N; i++)
        ds[i] = (codes[i] == 3) ? -3.0 : (double)codes[i];
      const uint8_t dbits = vrtype & 0x60;
      if (!dbits) continue;
      if (vrtype & 0x08) {  // multiallelic aux track
        n_fail += 1;
        continue;
      }
      uint64_t pos = gt_end[u];
      if (vrtype & 0x10) {
        // skip aux2 (hardcall phase; SkipAux2, pgenlib_read.cc:6819):
        // first part = 1 + het_ct/8 bytes, bit0 = explicit flag; if
        // set, a phaseinfo bitarray of popcount(bits[1..het]) follows.
        // (The trailing 0x80 dphase track needs no skip — dosage
        // values precede it and phase is dropped.)
        int64_t het_ct = 0;
        for (int64_t i = 0; i < N; i++) het_ct += (codes[i] == 1);
        const uint64_t first_bytes = 1 + (uint64_t)(het_ct / 8);
        if (data[pos] & 1) {
          int64_t pp_ct = 0;
          for (int64_t k = 1; k <= het_ct; k++)
            pp_ct += (data[pos + (k >> 3)] >> (k & 7)) & 1;
          pos += first_bytes + (uint64_t)((pp_ct + 7) / 8);
        } else {
          pos += first_bytes;
        }
      }
      if (dbits == 0x20) {  // dosage deltalist
        int64_t L = pgen_parse_deltalist(data, &pos, N, ids);
        for (int64_t k = 0; k < L; k++) {
          uint16_t val;
          memcpy(&val, data + pos + 2 * k, 2);
          ds[ids[k]] = val / 16384.0;
        }
      } else if (dbits == 0x40) {  // unconditional dense dosage
        for (int64_t i = 0; i < N; i++) {
          uint16_t val;
          memcpy(&val, data + pos + 2 * i, 2);
          ds[i] = (val == 65535) ? -3.0 : val / 16384.0;
        }
      } else {  // 0x60: dosage bitarray
        int64_t k = 0;
        const uint64_t vpos = pos + (N + 7) / 8;
        for (int64_t i = 0; i < N; i++) {
          if ((data[pos + (i >> 3)] >> (i & 7)) & 1) {
            uint16_t val;
            memcpy(&val, data + vpos + 2 * k, 2);
            ds[i] = val / 16384.0;
            k++;
          }
        }
      }
    }
    delete[] ids;
    delete[] rare;
  }
  delete[] gt_end;
  return n_fail;
}

// ---------------------------------------------------------------------------
// Association-row text formatting (print_sum_stats_single,
// Step2_Models.cpp:2505-2544). At biobank scale the sumstat writer is
// 570M+ rows (11.4M variants x 50 traits); per-row Python formatting
// caps the pipeline ~150x below the fused scorer's device throughput,
// so the hot single-pheno format renders here: %g snprintf per field
// (byte-identical to the Python f"{x:g}" path), OpenMP over rows.
//
// prefix_buf/prefix_off: B variant prefixes ("CHROM GENPOS ID A0 A1"),
// concatenated; row b's prefix = prefix_buf[prefix_off[b]:prefix_off[b+1]].
// Rows are first written at disjoint analytic offsets
// (prefix_off[b] + b*FIELD_BUDGET), then compacted front-to-back.
// skip[b] != 0 omits the row. out must hold prefix_off[B] + B*FIELD_BUDGET
// bytes. Returns the total byte length written.
// ---------------------------------------------------------------------------
// Per-row byte budgets for the batched renderers: the Python wrapper
// sizes the output buffer from these getters, so the formulas live in
// exactly one place. HTP carries 576 of field headroom — enough for
// full-width 20-digit int64 genocount fields from a corrupt upstream
// count, which must not overrun into the adjacent row's slot
// mid-render (the merged format's per-pheno groups get 64 bytes each
// on top of its 160-byte head).
static const int64_t SUMSTAT_FIELD_BUDGET = 224;
static const int64_t HTP_FIELD_BUDGET = 576;
static const int64_t ALL_FIELD_BUDGET_HEAD = 160;
static const int64_t ALL_FIELD_BUDGET_PER_PHENO = 64;

int64_t sumstat_field_budget() { return SUMSTAT_FIELD_BUDGET; }
int64_t htp_field_budget() { return HTP_FIELD_BUDGET; }
int64_t all_field_budget(int64_t P) {
  return ALL_FIELD_BUDGET_HEAD + ALL_FIELD_BUDGET_PER_PHENO * P;
}

// %g with NaN always rendered unsigned "nan" (Python f"{x:g}" parity —
// glibc %g prints "-nan" for sign-bit NaNs, a token the reference
// format never emits).
static inline int fmt_g(char* q, size_t n, double x) {
  if (std::isnan(x)) return snprintf(q, n, "nan");
  return snprintf(q, n, "%g", x);
}

// separator + %g in one step
static inline int fmt_sep_g(char* q, char sep, double x) {
  q[0] = sep;
  return 1 + fmt_g(q + 1, 32, x);
}

// LC_NUMERIC-pinned "C" locale: snprintf %g honors the process locale,
// so a comma-decimal LC_NUMERIC set by an unrelated library would
// corrupt every numeric field. Each render thread pins "C" for the
// duration of the row loop (uselocale is per-thread).
static locale_t c_numeric_locale() {
  static locale_t loc = newlocale(LC_NUMERIC_MASK, "C", (locale_t)0);
  return loc;
}

// serial front-to-back compaction of rows written at their disjoint
// analytic offsets (dest <= src throughout); returns total bytes
static int64_t compact_rows(char* out, const int64_t* prefix_off,
                            int64_t budget, const int64_t* row_len,
                            int64_t B) {
  int64_t total = 0;
  for (int64_t b = 0; b < B; b++) {
    if (!row_len[b]) continue;
    const char* src = out + prefix_off[b] + b * budget;
    if (out + total != src) memmove(out + total, src, row_len[b]);
    total += row_len[b];
  }
  return total;
}

// test_buf/test_off: optional per-row TEST strings (interaction rows
// carry distinct -INT_* suffixes); when test_off is null every row uses
// the constant `test`. Per-row tests must be <= 46 bytes (wrapper caps
// at 40, same as the constant-test path).
int64_t format_sumstat_single(const char* prefix_buf, const int64_t* prefix_off,
                              int64_t B, const uint8_t* skip, const char* test,
                              const char* test_buf, const int64_t* test_off,
                              int af_cc, int has_info, const double* af,
                              const double* af_case, const double* af_control,
                              const double* info, const int32_t* n,
                              const int32_t* ns_case, const int32_t* ns_control,
                              const double* beta, const double* se,
                              const double* chisq, const double* logp,
                              const uint8_t* test_fail, char* out,
                              int64_t* row_len) {
#if defined(_OPENMP)
#pragma omp parallel
#endif
  {
    locale_t prev = uselocale(c_numeric_locale());
#if defined(_OPENMP)
#pragma omp for schedule(static)
#endif
    for (int64_t b = 0; b < B; b++) {
      if (skip[b]) {
        row_len[b] = 0;
        continue;
      }
      char* p = out + prefix_off[b] + b * SUMSTAT_FIELD_BUDGET;
      char* q = p;
      const int64_t plen = prefix_off[b + 1] - prefix_off[b];
      memcpy(q, prefix_buf + prefix_off[b], plen);
      q += plen;
      if (af[b] >= 0) {
        q += fmt_sep_g(q, ' ', af[b]);
        if (af_cc) {
          q += fmt_sep_g(q, ' ', af_case[b]);
          q += fmt_sep_g(q, ' ', af_control[b]);
        }
      } else {
        q += snprintf(q, 16, " NA");
        if (af_cc) q += snprintf(q, 16, " NA NA");
      }
      if (has_info) {
        if (info != nullptr && info[b] >= 0)
          q += fmt_sep_g(q, ' ', info[b]);
        else
          q += snprintf(q, 16, " NA");
      }
      q += snprintf(q, 16, " %d", n[b]);
      if (af_cc) q += snprintf(q, 32, " %d %d", ns_case[b], ns_control[b]);
      if (test_off != nullptr) {
        const int64_t tlen = test_off[b + 1] - test_off[b];
        q[0] = ' ';
        memcpy(q + 1, test_buf + test_off[b], tlen);
        q += 1 + tlen;
      } else {
        q += snprintf(q, 48, " %s", test);
      }
      const bool print_se = (se[b] >= 0) && !std::isnan(se[b]);
      const bool print_pv =
          (chisq[b] >= 0) && !test_fail[b] && !std::isnan(logp[b]);
      if (print_se) {
        q += fmt_sep_g(q, ' ', beta[b]);
        q += fmt_sep_g(q, ' ', se[b]);
      } else {
        q += snprintf(q, 16, " NA NA");
      }
      if (print_pv) {
        q += fmt_sep_g(q, ' ', chisq[b]);
        q += fmt_sep_g(q, ' ', logp[b]);
      } else {
        q += snprintf(q, 16, " NA NA");
      }
      q += snprintf(q, 16, test_fail[b] ? " TEST_FAIL\n" : " NA\n");
      row_len[b] = q - p;
    }
    uselocale(prev);
  }
  return compact_rows(out, prefix_off, SUMSTAT_FIELD_BUDGET, row_len, B);
}

// ---------------------------------------------------------------------------
// HTPv4 row formatting (print_sum_stats_htp, Step2_Models.cpp:2548-2646).
// Same batching scheme as format_sumstat_single. prefix rows carry
// "Name\tChr\tPos\tRef\tAlt"; mid is the constant
// "\tTrait\tCohort\tModel" chunk of the call's trait. genocounts:
// [B, 6] int64 (cases RR/RA/AA, controls RR/RA/AA) or null.
// trait codes: 0=QT 1=BT 2=CT 3=T2E (matches regenie_tpu.config).
// ---------------------------------------------------------------------------
static int fmt_pval_raw(char* q, double logp) {
  // convert_logp_raw (Regenie.cpp:1700): %f above 1e-3, %g down to
  // double-min, manual mantissa/exponent split below
  const double log_dbl_min = -log10(2.2250738585072014e-308) - 1.0;
  if (logp <= 3.0) return snprintf(q, 32, "%f", pow(10.0, -logp));
  if (logp <= log_dbl_min) return snprintf(q, 32, "%g", pow(10.0, -logp));
  const double thr = log(9.95) / log(10.0);
  long long base = (long long)ceil(logp);
  double res = (double)base - logp;
  if (res >= thr) {
    res = 0.0;
    base += 1;
  }
  return snprintf(q, 32, "%.1fe-%lld", pow(10.0, res), base);
}

int64_t format_sumstat_htp(
    const char* prefix_buf, const int64_t* prefix_off, int64_t B,
    const uint8_t* skip, const char* mid, int trait, int firth, int uncapped,
    int has_info, double zcrit, const double* beta, const double* se,
    const double* chisq, const double* logp, const double* af,
    const double* info, const double* mac, const int64_t* genocounts,
    int64_t neff, const uint8_t* test_fail, char* out, int64_t* row_len) {
  const int64_t mid_len = (int64_t)strlen(mid);
  const int64_t budget = HTP_FIELD_BUDGET + mid_len;
#if defined(_OPENMP)
#pragma omp parallel
#endif
  {
    locale_t prev = uselocale(c_numeric_locale());
#if defined(_OPENMP)
#pragma omp for schedule(static)
#endif
    for (int64_t b = 0; b < B; b++) {
      if (skip[b]) {
        row_len[b] = 0;
        continue;
      }
      char* p = out + prefix_off[b] + b * budget;
      char* q = p;
      const int64_t plen = prefix_off[b + 1] - prefix_off[b];
      memcpy(q, prefix_buf + prefix_off[b], plen);
      q += plen;
      memcpy(q, mid, mid_len);
      q += mid_len;
      const bool test_pass = !test_fail[b];
      const bool print_beta = test_pass && se[b] >= 0 && !std::isnan(se[b]);
      const bool print_pv =
          test_pass && chisq[b] >= 0 && !std::isnan(logp[b]);
      char outp[36];
      if (print_pv) {
        const double cap = 308.0;
        if (!uncapped && logp[b] > cap)
          fmt_pval_raw(outp, cap);
        else if (logp[b] > 0)
          fmt_pval_raw(outp, logp[b]);
        else
          snprintf(outp, 32, "0.9999999");
      } else {
        snprintf(outp, 32, "NA");
      }
      const int64_t* g = genocounts ? genocounts + b * 6 : nullptr;
      const bool is_bt = trait == 1;
      if (print_pv && !print_beta) {
        q += snprintf(q, 64, "\tNA\tNA\tNA\t%s", outp);
      } else if (!print_pv && !print_beta) {
        q += snprintf(q, 32, "\tNA\tNA\tNA\tNA");
      } else if (!is_bt || (firth && test_pass)) {
        if (trait == 0) {
          q += fmt_sep_g(q, '\t', beta[b]);
          q += fmt_sep_g(q, '\t', beta[b] - zcrit * se[b]);
          q += fmt_sep_g(q, '\t', beta[b] + zcrit * se[b]);
        } else {
          q += fmt_sep_g(q, '\t', exp(beta[b]));
          q += fmt_sep_g(q, '\t', exp(beta[b] - zcrit * se[b]));
          q += fmt_sep_g(q, '\t', exp(beta[b] + zcrit * se[b]));
        }
        q += snprintf(q, 40, "\t%s", print_pv ? outp : "NA");
      } else {  // BT spa/logistic: allelic OR from genotype counts
        if (print_pv && g) {
          const double eff =
              (2.0 * g[3] + g[4] + 0.5) * (2.0 * g[2] + g[1] + 0.5) /
              ((2.0 * g[5] + g[4] + 0.5) * (2.0 * g[0] + g[1] + 0.5));
          const double c = chisq[b] > 1e-300 ? chisq[b] : 1e-300;
          const double outse = fabs(log(eff)) / sqrt(c);
          q += fmt_sep_g(q, '\t', eff);
          q += fmt_sep_g(q, '\t', eff * exp(-zcrit * outse));
          q += fmt_sep_g(q, '\t', eff * exp(zcrit * outse));
          q += snprintf(q, 40, "\t%s", outp);
        } else {
          q += snprintf(q, 32, "\tNA\tNA\tNA\tNA");
        }
      }
      if (af[b] >= 0)
        q += fmt_sep_g(q, '\t', af[b]);
      else
        q += snprintf(q, 16, "\tNA");
      if (mac[b] > 0 && g) {
        q += snprintf(q, 96, "\t%lld\t%lld\t%lld\t%lld",
                      (long long)(g[0] + g[1] + g[2]), (long long)g[0],
                      (long long)g[1], (long long)g[2]);
        if (trait == 1 || trait == 3)
          q += snprintf(q, 96, "\t%lld\t%lld\t%lld\t%lld",
                        (long long)(g[3] + g[4] + g[5]), (long long)g[3],
                        (long long)g[4], (long long)g[5]);
        else
          q += snprintf(q, 32, "\tNA\tNA\tNA\tNA");
      } else {
        if (neff >= 0)
          q += snprintf(q, 32, "\t%lld", (long long)neff);
        else
          q += snprintf(q, 16, "\tNA");
        q += snprintf(q, 48, "\tNA\tNA\tNA\tNA\tNA\tNA\tNA");
      }
      // key=value info column (joined with ';', LOG10P always present).
      // print_beta implies test_pass, so the BT/T2E branch always has
      // values (the Python formatter's REGENIE_BETA=NA arm mirrors the
      // reference's unreachable code, output.py:368).
      q += snprintf(q, 8, "\t");
      if (print_beta) {
        if (trait != 0) {
          q += snprintf(q, 32, "REGENIE_BETA=");
          q += fmt_g(q, 32, beta[b]);
          q += snprintf(q, 32, ";REGENIE_SE=");
          q += fmt_g(q, 32, se[b]);
          q += snprintf(q, 8, ";");
        } else {
          q += snprintf(q, 32, "REGENIE_SE=");
          q += fmt_g(q, 32, se[b]);
          q += snprintf(q, 8, ";");
        }
      }
      if (has_info && info && info[b] >= 0) {
        q += snprintf(q, 16, "INFO=");
        q += fmt_g(q, 32, info[b]);
        q += snprintf(q, 8, ";");
      }
      if (mac[b] >= 0) {
        q += snprintf(q, 16, "MAC=");
        q += fmt_g(q, 32, mac[b]);
        q += snprintf(q, 8, ";");
      }
      if (print_pv) {
        q += snprintf(q, 16, "LOG10P=");
        q += fmt_g(q, 32, logp[b]);
        q += snprintf(q, 8, "\n");
      } else {
        q += snprintf(q, 24, "LOG10P=NA\n");
      }
      row_len[b] = q - p;
    }
    uselocale(prev);
  }
  return compact_rows(out, prefix_off, budget, row_len, B);
}

// ---------------------------------------------------------------------------
// Merged-format row (--no-split; print_sum_stats_all,
// Step2_Models.cpp:2457-2500): one row per variant, P [BETA SE CHISQ
// LOG10P] column groups. beta/se/chisq/logp/fail are [B, P] row-major
// with unusable traits pre-masked to (-1,-1,-1,-1,fail=1) by the caller.
// ---------------------------------------------------------------------------
int64_t format_sumstat_all(const char* prefix_buf, const int64_t* prefix_off,
                           int64_t B, const uint8_t* skip, const char* test,
                           int has_info, int64_t P, const double* af1,
                           const double* info1, const int32_t* ns1,
                           const int32_t* n_rr, const int32_t* n_aa,
                           const double* beta, const double* se,
                           const double* chisq, const double* logp,
                           const uint8_t* fail, char* out, int64_t* row_len) {
  const int64_t budget = all_field_budget(P);
#if defined(_OPENMP)
#pragma omp parallel
#endif
  {
    locale_t prev = uselocale(c_numeric_locale());
#if defined(_OPENMP)
#pragma omp for schedule(static)
#endif
    for (int64_t b = 0; b < B; b++) {
      if (skip[b]) {
        row_len[b] = 0;
        continue;
      }
      char* p = out + prefix_off[b] + b * budget;
      char* q = p;
      const int64_t plen = prefix_off[b + 1] - prefix_off[b];
      memcpy(q, prefix_buf + prefix_off[b], plen);
      q += plen;
      if (af1[b] >= 0)
        q += fmt_sep_g(q, ' ', af1[b]);
      else
        q += snprintf(q, 16, " NA");
      if (has_info) {
        if (info1 != nullptr && info1[b] >= 0)
          q += fmt_sep_g(q, ' ', info1[b]);
        else
          q += snprintf(q, 16, " NA");
      }
      q += snprintf(q, 16, " %d", ns1[b]);
      if (n_rr[b] >= 0)
        q += snprintf(q, 48, " %d %d %d", n_rr[b],
                      ns1[b] - n_rr[b] - n_aa[b], n_aa[b]);
      else
        q += snprintf(q, 16, " NA NA NA");
      q += snprintf(q, 48, " %s", test);
      for (int64_t ph = 0; ph < P; ph++) {
        const int64_t k = b * P + ph;
        const bool print_se = (se[k] >= 0) && !std::isnan(se[k]);
        const bool print_pv =
            (chisq[k] >= 0) && !fail[k] && !std::isnan(logp[k]);
        if (print_se) {
          q += fmt_sep_g(q, ' ', beta[k]);
          q += fmt_sep_g(q, ' ', se[k]);
        } else {
          q += snprintf(q, 16, " NA NA");
        }
        if (print_pv) {
          q += fmt_sep_g(q, ' ', chisq[k]);
          q += fmt_sep_g(q, ' ', logp[k]);
        } else {
          q += snprintf(q, 16, " NA NA");
        }
      }
      q += snprintf(q, 8, " NA\n");
      row_len[b] = q - p;
    }
    uselocale(prev);
  }
  return compact_rows(out, prefix_off, budget, row_len, B);
}

// ---------------------------------------------------------------------------
// LOCO/PRS prediction rows (write_predictions, Data.cpp:1795): R rows
// of "label v_1 .. v_N \n" with %g values and NA for masked samples —
// [23 chromosomes, N samples] per trait is 460M values at biobank
// scale, far too hot for a per-value Python loop.
// out must hold R * (16 + 15*N) bytes.
// ---------------------------------------------------------------------------
int64_t format_loco_rows(const double* vals, int64_t R, int64_t N,
                         const uint8_t* mask, const int32_t* labels,
                         char* out, int64_t* row_len) {
  const int64_t budget = 16 + 15 * N;
#if defined(_OPENMP)
#pragma omp parallel
#endif
  {
    locale_t prev = uselocale(c_numeric_locale());
#if defined(_OPENMP)
#pragma omp for schedule(static)
#endif
    for (int64_t r = 0; r < R; r++) {
      char* p = out + r * budget;
      char* q = p;
      q += snprintf(q, 16, "%d", labels[r]);
      const double* v = vals + r * N;
      for (int64_t i = 0; i < N; i++) {
        if (mask[i])
          q += fmt_sep_g(q, ' ', v[i]);
        else
          q += snprintf(q, 8, " NA");
      }
      q += snprintf(q, 8, " \n");
      row_len[r] = q - p;
    }
    uselocale(prev);
  }
  int64_t total = 0;
  for (int64_t r = 0; r < R; r++) {
    const char* src = out + r * budget;
    if (out + total != src) memmove(out + total, src, row_len[r]);
    total += row_len[r];
  }
  return total;
}

// ---------------------------------------------------------------------------
// Generic prefixed %g rows: "prefix v_1 .. v_K\n" (multi-trait /
// LD-text style outputs where every field after the string prefix is a
// %g double). skip[r] != 0 omits the row.
// out must hold prefix_off[R] + R*(15*K + 8) bytes.
// ---------------------------------------------------------------------------
int64_t format_prefixed_float_rows(const char* prefix_buf,
                                   const int64_t* prefix_off, int64_t R,
                                   int64_t K, const uint8_t* skip,
                                   const double* vals, char* out,
                                   int64_t* row_len) {
  const int64_t budget = 15 * K + 8;
#if defined(_OPENMP)
#pragma omp parallel
#endif
  {
    locale_t prev = uselocale(c_numeric_locale());
#if defined(_OPENMP)
#pragma omp for schedule(static)
#endif
    for (int64_t r = 0; r < R; r++) {
      if (skip != nullptr && skip[r]) {
        row_len[r] = 0;
        continue;
      }
      char* p = out + prefix_off[r] + r * budget;
      char* q = p;
      const int64_t plen = prefix_off[r + 1] - prefix_off[r];
      memcpy(q, prefix_buf + prefix_off[r], plen);
      q += plen;
      const double* v = vals + r * K;
      for (int64_t k = 0; k < K; k++) q += fmt_sep_g(q, ' ', v[k]);
      *q++ = '\n';
      row_len[r] = q - p;
    }
    uselocale(prev);
  }
  return compact_rows(out, prefix_off, budget, row_len, R);
}

// ---------------------------------------------------------------------------
// Parallel gzip: the input splits into ~chunk-byte pieces, each
// deflated as an independent gzip member (RFC 1952 §2.2 — a gzip file
// is a series of members, and every standard reader concatenates
// them), OpenMP over pieces. Single-threaded zlib caps --gz output at
// ~50MB/s — at 570M-row biobank scale that's ~20min of wall-clock the
// reference also pays (Boost gzip); this removes it.
// out must hold n + n/1000 + 64 per chunk (deflateBound-ish).
// Returns compressed size, or -1 on error.
// ---------------------------------------------------------------------------
int64_t gzip_compress_members(const uint8_t* in, int64_t n, int level,
                              int64_t chunk, uint8_t* out, int64_t out_cap) {
  if (chunk <= 0) chunk = 1 << 20;
  const int64_t n_chunks = n > 0 ? (n + chunk - 1) / chunk : 0;
  if (n_chunks == 0) return 0;
  int64_t* csize = new int64_t[n_chunks];
  const int64_t slot = chunk + chunk / 1000 + 64;
  uint8_t* scratch = new uint8_t[n_chunks * slot];
  bool fail = false;
#if defined(_OPENMP)
#pragma omp parallel for schedule(dynamic)
#endif
  for (int64_t c = 0; c < n_chunks; c++) {
    const int64_t beg = c * chunk;
    const int64_t len = (beg + chunk <= n) ? chunk : n - beg;
    z_stream zs;
    memset(&zs, 0, sizeof(zs));
    // windowBits 15+16 = gzip wrapper
    if (deflateInit2(&zs, level, Z_DEFLATED, 15 + 16, 8,
                     Z_DEFAULT_STRATEGY) != Z_OK) {
      fail = true;
      csize[c] = 0;
      continue;
    }
    zs.next_in = const_cast<uint8_t*>(in + beg);
    zs.avail_in = (uInt)len;
    zs.next_out = scratch + c * slot;
    zs.avail_out = (uInt)slot;
    const int ret = deflate(&zs, Z_FINISH);
    csize[c] = (ret == Z_STREAM_END) ? (int64_t)zs.total_out : 0;
    if (ret != Z_STREAM_END) fail = true;
    deflateEnd(&zs);
  }
  int64_t total = 0;
  if (!fail) {
    for (int64_t c = 0; c < n_chunks; c++) {
      if (total + csize[c] > out_cap) {
        fail = true;
        break;
      }
      memcpy(out + total, scratch + c * slot, csize[c]);
      total += csize[c];
    }
  }
  delete[] scratch;
  delete[] csize;
  return fail ? -1 : total;
}

}  // extern "C"
