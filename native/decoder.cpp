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
#include <cstring>
#include <cmath>
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
    if (ok) {
      uint32_t N;
      memcpy(&N, buf, 4);
      uint16_t K;
      memcpy(&K, buf + 4, 2);
      uint8_t minp = buf[6], maxp = buf[7];
      const uint8_t* ploidy = buf + 8;
      uint8_t phased = buf[8 + N];
      uint8_t bits = buf[9 + N];
      if ((int64_t)N != n_samples || K != 2 || minp != 2 || maxp != 2 ||
          phased != 0 || (bits != 8 && bits != 16)) {
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

}  // extern "C"
