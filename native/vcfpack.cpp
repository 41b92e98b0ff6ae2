// Native VCF scanner: streaming parse of phased biallelic genotype tables
// into bitpacked haplotype rows.
//
// This is the framework's native equivalent of the role pysam/htslib plays
// in the reference toolkit (bgzf decompression + VCF record parsing; see
// SURVEY.md §2 component 2).  Contract matches the portable parser in
// ld_tools_tpu/ingest/vcf.py:
//   - only IDs of the form rs[0-9]+ are kept;
//   - records with a MULTI_ALLELIC INFO flag are dropped;
//   - consecutive runs of identical (CHROM, POS, ID) triples are dropped
//     entirely (one-record emission delay);
//   - genotypes must be diploid single-digit 0/1 alleles; anything else
//     fails the scan (the Python layer reports the error).
//
// Genotype bits are packed MSB-first per row (numpy packbits layout) so
// the Python side can hand the buffer straight to np.unpackbits.
//
// Build: g++ -O3 -march=native -shared -fPIC vcfpack.cpp -o libvcfpack.so -lz

#include <zlib.h>

#include <cstdint>
#include <cstring>
#include <string>
#include <vector>

namespace {

// Chunked line reader over gzFile (gzread handles plain files and
// multi-member gzip/bgzf transparently).
class LineReader {
 public:
  explicit LineReader(const char* path) : gz_(gzopen(path, "rb")) {
    if (gz_ != nullptr) gzbuffer(gz_, 1 << 20);
  }
  ~LineReader() {
    if (gz_ != nullptr) gzclose(gz_);
  }
  bool ok() const { return gz_ != nullptr; }

  // Returns false at EOF.  The returned string_view-ish pair is valid
  // until the next call.
  bool next_line(const char** line, size_t* len) {
    line_.clear();
    while (true) {
      if (pos_ == avail_) {
        int n = gzread(gz_, buf_, sizeof(buf_));
        if (n <= 0) {
          if (line_.empty()) return false;
          *line = line_.data();
          *len = line_.size();
          return true;
        }
        avail_ = static_cast<size_t>(n);
        pos_ = 0;
      }
      const char* start = buf_ + pos_;
      const char* nl = static_cast<const char*>(
          memchr(start, '\n', avail_ - pos_));
      if (nl == nullptr) {
        line_.append(start, avail_ - pos_);
        pos_ = avail_;
      } else {
        line_.append(start, static_cast<size_t>(nl - start));
        pos_ += static_cast<size_t>(nl - start) + 1;
        *line = line_.data();
        *len = line_.size();
        return true;
      }
    }
  }

 private:
  gzFile gz_;
  char buf_[1 << 20];
  size_t pos_ = 0, avail_ = 0;
  std::string line_;
};

bool is_rs_id(const char* s, size_t len) {
  if (len < 3 || s[0] != 'r' || s[1] != 's') return false;
  for (size_t i = 2; i < len; ++i) {
    if (s[i] < '0' || s[i] > '9') return false;
  }
  return true;
}

struct PendingRecord {
  std::string chrom, rsid, ref, alt, vt;
  int64_t pos = -1;
  std::vector<uint8_t> packed;  // bitpacked genotype row
  bool valid = false;
};

}  // namespace

extern "C" {

struct VpResult {
  int64_t n_variants = 0;
  int64_t n_haplotypes = 0;
  int64_t row_bytes = 0;
  std::vector<uint8_t> packed;     // n_variants * row_bytes
  std::vector<int64_t> positions;
  std::string rsids;    // '\n'-joined
  std::string refs;
  std::string alts;
  std::string vts;
  std::string samples;  // '\n'-joined
  std::string error;
};

static void emit(VpResult* r, PendingRecord* p) {
  r->packed.insert(r->packed.end(), p->packed.begin(), p->packed.end());
  r->positions.push_back(p->pos);
  r->rsids += p->rsid;
  r->rsids += '\n';
  r->refs += p->ref;
  r->refs += '\n';
  r->alts += p->alt;
  r->alts += '\n';
  r->vts += p->vt;
  r->vts += '\n';
  ++r->n_variants;
}

VpResult* vp_scan(const char* path) {
  VpResult* r = new VpResult();
  LineReader reader(path);
  if (!reader.ok()) {
    r->error = std::string("cannot open ") + path;
    return r;
  }
  const char* line;
  size_t len;
  int64_t n_samples = -1;
  PendingRecord pending;
  bool pending_dup = false;

  while (reader.next_line(&line, &len)) {
    if (len > 0 && line[len - 1] == '\r') --len;
    if (len == 0) continue;
    if (line[0] == '#') {
      if (len >= 6 && memcmp(line, "#CHROM", 6) == 0) {
        // Collect sample names: columns 10+.
        int field = 0;
        size_t start = 0;
        n_samples = 0;
        for (size_t i = 0; i <= len; ++i) {
          if (i == len || line[i] == '\t') {
            if (field >= 9) {
              r->samples.append(line + start, i - start);
              r->samples += '\n';
              ++n_samples;
            }
            start = i + 1;
            ++field;
          }
        }
        r->n_haplotypes = 2 * n_samples;
        r->row_bytes = (r->n_haplotypes + 7) / 8;
      }
      continue;
    }
    if (n_samples < 0) {
      r->error = "no #CHROM header before data lines";
      return r;
    }

    // Split the 9 fixed fields; genotype section follows.
    const char* f[9];
    size_t flen[9];
    int field = 0;
    size_t start = 0;
    size_t gt_start = 0;
    for (size_t i = 0; i <= len && field < 9; ++i) {
      if (i == len || line[i] == '\t') {
        f[field] = line + start;
        flen[field] = i - start;
        start = i + 1;
        ++field;
      }
    }
    if (field < 9) continue;  // malformed / truncated line
    gt_start = start;

    if (!is_rs_id(f[2], flen[2])) continue;

    // INFO: MULTI_ALLELIC flag and VT= value.
    bool multiallelic = false;
    std::string vt;
    {
      const char* info = f[7];
      size_t ilen = flen[7];
      size_t s = 0;
      for (size_t i = 0; i <= ilen; ++i) {
        if (i == ilen || info[i] == ';') {
          size_t l = i - s;
          if (l == 13 && memcmp(info + s, "MULTI_ALLELIC", 13) == 0) {
            multiallelic = true;
          } else if (l > 3 && memcmp(info + s, "VT=", 3) == 0) {
            vt.assign(info + s + 3, l - 3);
          }
          s = i + 1;
        }
      }
    }
    if (multiallelic) continue;

    // FORMAT must lead with GT.
    bool gt_only = (flen[8] == 2 && f[8][0] == 'G' && f[8][1] == 'T');
    if (!gt_only && !(flen[8] > 2 && memcmp(f[8], "GT:", 3) == 0)) {
      r->error = "FORMAT must lead with GT: " + std::string(f[8], flen[8]);
      return r;
    }

    int64_t pos = 0;
    for (size_t i = 0; i < flen[1]; ++i) {
      char c = f[1][i];
      if (c < '0' || c > '9') {
        r->error = "bad POS field";
        return r;
      }
      pos = pos * 10 + (c - '0');
    }

    std::string chrom(f[0], flen[0]);
    std::string rsid(f[2], flen[2]);
    bool same_triple = pending.valid && pending.pos == pos &&
                       pending.chrom == chrom && pending.rsid == rsid;
    if (same_triple) {
      pending_dup = true;
      continue;
    }
    if (pending.valid && !pending_dup) emit(r, &pending);

    // Parse genotypes into a fresh packed row.
    pending.packed.assign(static_cast<size_t>(r->row_bytes), 0);
    int64_t allele_idx = 0;
    const char* g = line + gt_start;
    const char* end = line + len;
    if (gt_only) {
      for (const char* c = g; c < end; ++c) {
        char ch = *c;
        if (ch == '0' || ch == '1') {
          if (allele_idx >= r->n_haplotypes) {
            r->error = "too many alleles at " + rsid;
            return r;
          }
          if (ch == '1') {
            pending.packed[allele_idx >> 3] |=
                static_cast<uint8_t>(0x80u >> (allele_idx & 7));
          }
          ++allele_idx;
        } else if (ch == '|' || ch == '/' || ch == '\t') {
          // separators
        } else {
          r->error = "unsupported genotype char '" +
                     std::string(1, ch) + "' at " + rsid;
          return r;
        }
      }
    } else {
      // FORMAT has extra per-sample fields: take the leading GT of each.
      const char* c = g;
      while (c < end) {
        const char* tab = static_cast<const char*>(
            memchr(c, '\t', static_cast<size_t>(end - c)));
        const char* cell_end = tab != nullptr ? tab : end;
        const char* colon = static_cast<const char*>(
            memchr(c, ':', static_cast<size_t>(cell_end - c)));
        const char* gt_end = colon != nullptr ? colon : cell_end;
        for (const char* q = c; q < gt_end; ++q) {
          char ch = *q;
          if (ch == '0' || ch == '1') {
            if (allele_idx >= r->n_haplotypes) {
              r->error = "too many alleles at " + rsid;
              return r;
            }
            if (ch == '1') {
              pending.packed[allele_idx >> 3] |=
                  static_cast<uint8_t>(0x80u >> (allele_idx & 7));
            }
            ++allele_idx;
          } else if (ch == '|' || ch == '/') {
          } else {
            r->error = "unsupported genotype char in " + rsid;
            return r;
          }
        }
        c = cell_end + 1;
      }
    }
    if (allele_idx != r->n_haplotypes) {
      r->error = "allele count mismatch at " + rsid;
      return r;
    }

    pending.chrom = std::move(chrom);
    pending.rsid = std::move(rsid);
    pending.ref.assign(f[3], flen[3]);
    pending.alt.assign(f[4], flen[4]);
    pending.vt = std::move(vt);
    pending.pos = pos;
    pending.valid = true;
    pending_dup = false;
  }
  if (pending.valid && !pending_dup) emit(r, &pending);
  return r;
}

int64_t vp_n_variants(VpResult* r) { return r->n_variants; }
int64_t vp_n_haplotypes(VpResult* r) { return r->n_haplotypes; }
int64_t vp_row_bytes(VpResult* r) { return r->row_bytes; }
const uint8_t* vp_genotypes_packed(VpResult* r) { return r->packed.data(); }
const int64_t* vp_positions(VpResult* r) { return r->positions.data(); }
const char* vp_rsids(VpResult* r) { return r->rsids.c_str(); }
const char* vp_refs(VpResult* r) { return r->refs.c_str(); }
const char* vp_alts(VpResult* r) { return r->alts.c_str(); }
const char* vp_vts(VpResult* r) { return r->vts.c_str(); }
const char* vp_samples(VpResult* r) { return r->samples.c_str(); }
const char* vp_error(VpResult* r) { return r->error.c_str(); }
void vp_free(VpResult* r) { delete r; }

}  // extern "C"
