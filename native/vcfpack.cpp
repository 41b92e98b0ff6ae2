// Native VCF scanner: streaming parse of phased biallelic genotype tables
// into bitpacked haplotype rows.
//
// This is the framework's native equivalent of the role pysam/htslib plays
// in the reference toolkit (bgzf decompression + VCF record parsing; see
// SURVEY.md §2 component 2).  Contract matches the portable parser in
// ld_tools_tpu/ingest/vcf.py:
//   - only IDs of the form rs[0-9]+ are kept;
//   - records with a MULTI_ALLELIC INFO flag are dropped;
//   - consecutive runs of identical (CHROM, POS, ID) triples AMONG THE
//     KEPT records are dropped entirely (one-record emission delay; the
//     reference filters before its duplicate comparison,
//     prep_intgen_data.py:165-175, and so do both parsers here);
//   - genotypes must be diploid single-digit 0/1 alleles; anything else
//     fails the scan (the Python layer reports the error).
//
// Genotype bits are packed MSB-first per row (numpy packbits layout) so
// the Python side can hand the buffer straight to np.unpackbits.
//
// Two execution modes:
//   vp_scan(path)            — single-threaded gzFile streaming scan.
//   vp_scan_mt(path, n)      — BGZF block-parallel scan: the 1000G files
//     are bgzip-compressed, i.e. a sequence of independent <=64 KiB gzip
//     members whose compressed size is recorded in a "BC" extra subfield,
//     so a reader thread can slice the compressed stream at member
//     boundaries WITHOUT decompressing and hand batches of blocks to
//     worker threads that inflate AND parse them concurrently; a
//     coordinator merges per-batch results in order, parsing the one
//     line per seam that spans a batch boundary and running the
//     duplicate-triple suppression over the ordered record stream.
//     Non-BGZF inputs (plain gzip / raw text) fall back to vp_scan.
//
// GB-scale memory/throughput design (round 5): workers emit column
// ARENAS (one contiguous packed buffer + string arenas + offset tables
// per chunk) instead of per-record heap objects, the reorder buffer is
// BOUNDED so workers can never run unboundedly ahead of the in-order
// coordinator (that lag was the r4 RSS blowup), the coordinator's dedup
// runs over views into the live arena (one deep copy only at each chunk
// seam), and packed output accumulates in fixed 8 MiB blocks drained by
// vp_packed_copy into a caller-allocated buffer — no doubling realloc of
// a near-GiB vector, and peak native RSS ~= the packed output size.
//
// Both modes share one data-line parser with a vectorizable fast path for
// the uniform "a|b\t" cell layout phased 1000G rows have (validate all
// cells with branch-free byte compares, then gather every other byte).
//
// Build: g++ -O3 -march=native -shared -fPIC vcfpack.cpp -o libvcfpack.so
//        -lz -lpthread

#include <zlib.h>

#include <atomic>
#include <condition_variable>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <deque>
#include <map>
#include <memory>
#include <mutex>
#include <string>
#include <thread>
#include <vector>

namespace {

// ---------------------------------------------------------------------------
// Shared line-level parsing
// ---------------------------------------------------------------------------

bool is_rs_id(const char* s, size_t len) {
  if (len < 3 || s[0] != 'r' || s[1] != 's') return false;
  for (size_t i = 2; i < len; ++i) {
    if (s[i] < '0' || s[i] > '9') return false;
  }
  return true;
}

struct Record {
  std::string chrom, rsid, ref, alt, vt;
  int64_t pos = 0;
  std::vector<uint8_t> packed;
  // per-sample allele counts in {1, 2}; EMPTY means all-diploid (the
  // dominant case — autosomes and chrX PAR).  Haploid cells pack their
  // single allele at bit 2*sample with bit 2*sample+1 left zero.
  std::vector<uint8_t> ploidy;
};

// Fast path for the dominant layout: FORMAT == "GT" and every cell is
// exactly "a|b" (or "a/b") with single-digit alleles, i.e. the genotype
// section is 4*n_samples-1 bytes with alleles at even offsets.  Both
// loops are simple byte-wise passes that g++ -O3 autovectorizes; the
// generic fallback below handles everything else (and multi-digit
// alleles, which are a scan error, surface through it).
bool parse_gt_fast(const char* g, const char* end, int64_t n_haplotypes,
                   uint8_t* out_row /* zeroed, (n_haplotypes+7)/8 bytes */) {
  const int64_t n_samples = n_haplotypes / 2;
  if (end - g != n_samples * 4 - 1) return false;
  uint8_t ok = 1;
  for (int64_t s = 0; s < n_samples; ++s) {
    const char* c = g + s * 4;
    // '0'/'1' iff (c & 0xFE) == 0x30; separator '|' or '/'
    ok &= static_cast<uint8_t>((c[0] & 0xFE) == 0x30);
    ok &= static_cast<uint8_t>((c[2] & 0xFE) == 0x30);
    ok &= static_cast<uint8_t>(c[1] == '|' || c[1] == '/');
  }
  for (int64_t s = 0; s + 1 < n_samples; ++s) {
    ok &= static_cast<uint8_t>(g[s * 4 + 3] == '\t');
  }
  if (!ok) return false;
  const int64_t full_bytes = n_haplotypes >> 3;
  for (int64_t b = 0; b < full_bytes; ++b) {
    const char* c = g + b * 16;  // 8 alleles at stride 2
    uint8_t v = 0;
    for (int k = 0; k < 8; ++k) v = static_cast<uint8_t>((v << 1) | (c[2 * k] & 1));
    out_row[b] = v;
  }
  if (n_haplotypes & 7) {
    const char* c = g + full_bytes * 16;
    uint8_t v = 0;
    for (int64_t k = 0; k < (n_haplotypes & 7); ++k) {
      v = static_cast<uint8_t>(v | ((c[2 * k] & 1) << (7 - k)));
    }
    out_row[full_bytes] = v;
  }
  return true;
}

// Generic genotype parse: cell-aware (one cell per sample, split on
// tabs), accepting diploid "a|b" / "a/b" and haploid "a" cells — the
// mixed-ploidy layouts real 1000G chrX/chrY rows have (the reference
// ingests these through pysam's ploidy-agnostic GT tuples,
// ld_area.py:230-235).  Handles FORMAT extras ('GT:...' cells cut at the
// first ':').  Fills per-sample allele counts into *ploidy (sized
// n_samples); callers collapse the all-diploid case to an empty vector.
// Returns false and sets *err on malformed input.
bool parse_gt_generic(const char* g, const char* end, bool gt_only,
                      int64_t n_samples, uint8_t* out_row,
                      std::vector<uint8_t>* ploidy,
                      const std::string& rsid, std::string* err) {
  ploidy->assign(static_cast<size_t>(n_samples), 0);
  if (n_samples == 0) return g >= end;
  int64_t sample = 0;
  const char* c = g;
  while (true) {
    if (sample >= n_samples) {
      *err = "too many genotype cells at " + rsid;
      return false;
    }
    const char* tab = static_cast<const char*>(
        memchr(c, '\t', static_cast<size_t>(end - c)));
    const char* cell_end = tab != nullptr ? tab : end;
    const char* gt_end = cell_end;
    if (!gt_only) {
      const char* colon = static_cast<const char*>(
          memchr(c, ':', static_cast<size_t>(cell_end - c)));
      if (colon != nullptr) gt_end = colon;
    }
    int k = 0;
    for (const char* q = c; q < gt_end; ++q) {
      char ch = *q;
      if (ch == '0' || ch == '1') {
        if (k >= 2) {
          *err = "more than two alleles in a cell at " + rsid;
          return false;
        }
        if (ch == '1') {
          int64_t bit = 2 * sample + k;
          out_row[bit >> 3] |= static_cast<uint8_t>(0x80u >> (bit & 7));
        }
        ++k;
      } else if (ch == '|' || ch == '/') {
        // separators
      } else {
        *err = "unsupported genotype char '" + std::string(1, ch) +
               "' at " + rsid;
        return false;
      }
    }
    if (k == 0) {
      *err = "missing genotype at " + rsid;
      return false;
    }
    (*ploidy)[static_cast<size_t>(sample)] = static_cast<uint8_t>(k);
    ++sample;
    if (tab == nullptr) break;
    c = tab + 1;
  }
  if (sample != n_samples) {
    *err = "genotype cell count mismatch at " + rsid;
    return false;
  }
  return true;
}

// Packed genotype rows accumulated in fixed-size blocks: appending never
// reallocates-and-copies the whole history (a 458 MB vector's doubling
// growth both copied and transiently DOUBLED the largest allocation),
// and the result is drained with one pass into a caller-owned buffer.
class PackedSink {
 public:
  static constexpr size_t kBlock = 8u << 20;

  void append(const uint8_t* src, size_t len) {
    while (len > 0) {
      if (blocks_.empty() || fill_ == kBlock) {
        blocks_.emplace_back(kBlock);
        fill_ = 0;
      }
      size_t take = len < kBlock - fill_ ? len : kBlock - fill_;
      memcpy(blocks_.back().data() + fill_, src, take);
      fill_ += take;
      total_ += take;
      src += take;
      len -= take;
    }
  }

  // DESTRUCTIVE drain: each block is freed as soon as it is copied, so
  // the native copy and the caller's buffer never fully coexist — peak
  // RSS of a scan stays ~one packed copy instead of two.
  void copy_to(uint8_t* dst) {
    size_t left = total_;
    while (!blocks_.empty() && left > 0) {
      auto& b = blocks_.front();
      size_t n = left < b.size() ? left : b.size();
      memcpy(dst, b.data(), n);
      dst += n;
      left -= n;
      blocks_.pop_front();
    }
    blocks_.clear();
    fill_ = 0;
    total_ = 0;
  }

  void clear() {
    blocks_.clear();
    fill_ = 0;
    total_ = 0;
  }

  size_t total() const { return total_; }

 private:
  std::deque<std::vector<uint8_t>> blocks_;
  size_t fill_ = 0;
  size_t total_ = 0;
};

enum class LineVerdict { kKept, kSkipped, kError };

// Parse one data line.  n_haplotypes/row_bytes must be known (header
// already seen).  kSkipped covers the rs-ID and MULTI_ALLELIC filters.
LineVerdict parse_data_line(const char* line, size_t len,
                            int64_t n_haplotypes, int64_t row_bytes,
                            Record* out, std::string* err) {
  if (len > 0 && line[len - 1] == '\r') --len;
  if (len == 0) return LineVerdict::kSkipped;

  const char* f[9];
  size_t flen[9];
  int field = 0;
  size_t start = 0;
  for (size_t i = 0; i <= len && field < 9; ++i) {
    if (i == len || line[i] == '\t') {
      f[field] = line + start;
      flen[field] = i - start;
      start = i + 1;
      ++field;
    }
  }
  // Parity with ingest/vcf.py's operation order: < 5 fields fails the
  // fields[:5] unpack (error); a non-rs ID is filtered BEFORE the
  // INFO/FORMAT accesses (skip); an rs record with < 10 fields then
  // fails the fields[7]/fields[9] accesses (error).  Silently skipping
  // short lines would mask truncated input.
  if (field < 5) {
    *err = "malformed VCF data line (fewer than 5 fields)";
    return LineVerdict::kError;
  }
  if (!is_rs_id(f[2], flen[2])) return LineVerdict::kSkipped;
  if (field < 9 || start > len) {
    *err = "truncated record at " + std::string(f[2], flen[2]);
    return LineVerdict::kError;
  }
  size_t gt_start = start;

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
  if (multiallelic) return LineVerdict::kSkipped;

  bool gt_only = (flen[8] == 2 && f[8][0] == 'G' && f[8][1] == 'T');
  if (!gt_only && !(flen[8] > 2 && memcmp(f[8], "GT:", 3) == 0)) {
    *err = "FORMAT must lead with GT: " + std::string(f[8], flen[8]);
    return LineVerdict::kError;
  }

  if (flen[1] == 0 || flen[1] > 18) {
    // empty POS fails int() in the contract parser; > 18 digits would
    // silently wrap int64
    *err = "bad POS field";
    return LineVerdict::kError;
  }
  int64_t pos = 0;
  for (size_t i = 0; i < flen[1]; ++i) {
    char c = f[1][i];
    if (c < '0' || c > '9') {
      *err = "bad POS field";
      return LineVerdict::kError;
    }
    pos = pos * 10 + (c - '0');
  }

  out->chrom.assign(f[0], flen[0]);
  out->rsid.assign(f[2], flen[2]);
  out->ref.assign(f[3], flen[3]);
  out->alt.assign(f[4], flen[4]);
  out->vt = std::move(vt);
  out->pos = pos;
  out->packed.assign(static_cast<size_t>(row_bytes), 0);
  out->ploidy.clear();

  const char* g = line + gt_start;
  const char* end = line + len;
  if (gt_only && parse_gt_fast(g, end, n_haplotypes, out->packed.data())) {
    return LineVerdict::kKept;
  }
  if (!parse_gt_generic(g, end, gt_only, n_haplotypes / 2,
                        out->packed.data(), &out->ploidy, out->rsid, err)) {
    return LineVerdict::kError;
  }
  bool all_diploid = true;
  for (uint8_t p : out->ploidy) all_diploid &= (p == 2);
  if (all_diploid) out->ploidy.clear();
  return LineVerdict::kKept;
}

}  // namespace

extern "C" {

struct VpResult {
  int64_t n_variants = 0;
  int64_t n_haplotypes = 0;
  int64_t row_bytes = 0;
  PackedSink packed;               // n_variants * row_bytes, in blocks
  std::vector<int64_t> positions;
  std::string rsids;    // '\n'-joined
  std::string refs;
  std::string alts;
  std::string vts;
  std::string samples;  // '\n'-joined
  std::string error;
  // Mixed-ploidy support: per-variant ploidy-profile id (one int16 per
  // emitted variant) and the interned profiles, flattened row-major
  // (n_profiles * n_samples uint8 allele counts).  Profile 0 is always
  // the all-diploid profile; n_profiles == 1 means the whole file is
  // diploid and callers can ignore both arrays.
  int64_t n_profiles = 1;
  std::vector<int16_t> pgroups;
  std::vector<uint8_t> profiles;
};

}  // extern "C"

namespace {

// Borrowed view of one parsed record — pointers into either a chunk
// arena, a live Record, or the emitter's owned copy.
struct RecView {
  const char* chrom = nullptr;
  size_t chrom_len = 0;
  const char* rsid = nullptr;
  size_t rsid_len = 0;
  const char* ref = nullptr;
  size_t ref_len = 0;
  const char* alt = nullptr;
  size_t alt_len = 0;
  const char* vt = nullptr;
  size_t vt_len = 0;
  int64_t pos = 0;
  const uint8_t* packed = nullptr;  // row_bytes
  const uint8_t* ploidy = nullptr;  // nullptr/0-len = all-diploid
  size_t ploidy_len = 0;
};

RecView view_of(const Record& rec) {
  RecView v;
  v.chrom = rec.chrom.data();
  v.chrom_len = rec.chrom.size();
  v.rsid = rec.rsid.data();
  v.rsid_len = rec.rsid.size();
  v.ref = rec.ref.data();
  v.ref_len = rec.ref.size();
  v.alt = rec.alt.data();
  v.alt_len = rec.alt.size();
  v.vt = rec.vt.data();
  v.vt_len = rec.vt.size();
  v.pos = rec.pos;
  v.packed = rec.packed.data();
  v.ploidy = rec.ploidy.empty() ? nullptr : rec.ploidy.data();
  v.ploidy_len = rec.ploidy.size();
  return v;
}

// Column-arena output of one parsed chunk: contiguous packed rows +
// string arenas with offset tables.  Appending reuses capacity — no
// per-record heap objects survive the worker (the r4 profile showed the
// per-record Record allocation/teardown serializing on the coordinator).
struct RecArena {
  std::vector<uint8_t> packed;
  std::vector<int64_t> pos;
  std::string chrom, rsid, ref, alt, vt;
  std::vector<uint32_t> chrom_off{0}, rsid_off{0}, ref_off{0}, alt_off{0},
      vt_off{0};
  std::vector<uint8_t> ploidy;
  std::vector<uint32_t> ploidy_off{0};
  size_t n = 0;

  void append(const Record& rec) {
    packed.insert(packed.end(), rec.packed.begin(), rec.packed.end());
    pos.push_back(rec.pos);
    chrom += rec.chrom;
    chrom_off.push_back(static_cast<uint32_t>(chrom.size()));
    rsid += rec.rsid;
    rsid_off.push_back(static_cast<uint32_t>(rsid.size()));
    ref += rec.ref;
    ref_off.push_back(static_cast<uint32_t>(ref.size()));
    alt += rec.alt;
    alt_off.push_back(static_cast<uint32_t>(alt.size()));
    vt += rec.vt;
    vt_off.push_back(static_cast<uint32_t>(vt.size()));
    ploidy.insert(ploidy.end(), rec.ploidy.begin(), rec.ploidy.end());
    ploidy_off.push_back(static_cast<uint32_t>(ploidy.size()));
    ++n;
  }

  RecView view(size_t k, int64_t row_bytes) const {
    RecView v;
    v.chrom = chrom.data() + chrom_off[k];
    v.chrom_len = chrom_off[k + 1] - chrom_off[k];
    v.rsid = rsid.data() + rsid_off[k];
    v.rsid_len = rsid_off[k + 1] - rsid_off[k];
    v.ref = ref.data() + ref_off[k];
    v.ref_len = ref_off[k + 1] - ref_off[k];
    v.alt = alt.data() + alt_off[k];
    v.alt_len = alt_off[k + 1] - alt_off[k];
    v.vt = vt.data() + vt_off[k];
    v.vt_len = vt_off[k + 1] - vt_off[k];
    v.pos = pos[k];
    v.packed = packed.data() + static_cast<size_t>(k) * row_bytes;
    size_t pl = ploidy_off[k + 1] - ploidy_off[k];
    v.ploidy = pl ? ploidy.data() + ploidy_off[k] : nullptr;
    v.ploidy_len = pl;
    return v;
  }
};

// Consecutive identical (CHROM, POS, ID) triples are dropped ENTIRELY,
// which needs a one-record emission delay (reference
// prep_intgen_data.py:163-176 applies the same run-suppression rule).
// The pending record is held as a VIEW into whatever buffer produced it;
// callers must call own_pending() before that buffer dies (once per
// chunk seam) — the only deep copy in the merge path.
class DedupEmitter {
 public:
  explicit DedupEmitter(VpResult* r) : r_(r) {}

  // Returns true iff the view became the new pending record (a caller
  // double-buffering parse storage must NOT recycle the buffer the
  // pending view aliases; a duplicate push leaves pending unchanged,
  // so ITS buffer stays hot and the pushed one is free again).
  bool push(const RecView& v) {
    if (valid_ && pending_.pos == v.pos &&
        pending_.chrom_len == v.chrom_len &&
        memcmp(pending_.chrom, v.chrom, v.chrom_len) == 0 &&
        pending_.rsid_len == v.rsid_len &&
        memcmp(pending_.rsid, v.rsid, v.rsid_len) == 0) {
      pending_dup_ = true;
      return false;
    }
    if (valid_ && !pending_dup_) emit();
    pending_ = v;
    owns_pending_ = false;
    valid_ = true;
    pending_dup_ = false;
    return true;
  }

  // Deep-copy the pending view into owned buffers (and repoint at them).
  // Idempotent: a second call without an intervening push would
  // self-assign owned_'s buffers from their own data (UB).
  void own_pending() {
    if (!valid_ || owns_pending_) return;
    owned_.chrom.assign(pending_.chrom, pending_.chrom_len);
    owned_.rsid.assign(pending_.rsid, pending_.rsid_len);
    owned_.ref.assign(pending_.ref, pending_.ref_len);
    owned_.alt.assign(pending_.alt, pending_.alt_len);
    owned_.vt.assign(pending_.vt, pending_.vt_len);
    owned_.pos = pending_.pos;
    owned_.packed.assign(pending_.packed, pending_.packed + r_->row_bytes);
    if (pending_.ploidy != nullptr) {
      owned_.ploidy.assign(pending_.ploidy,
                           pending_.ploidy + pending_.ploidy_len);
    } else {
      owned_.ploidy.clear();
    }
    pending_ = view_of(owned_);
    owns_pending_ = true;
  }

  void finish() {
    if (valid_ && !pending_dup_) emit();
    valid_ = false;
  }

 private:
  void emit() {
    r_->packed.append(pending_.packed, static_cast<size_t>(r_->row_bytes));
    r_->positions.push_back(pending_.pos);
    r_->rsids.append(pending_.rsid, pending_.rsid_len);
    r_->rsids += '\n';
    r_->refs.append(pending_.ref, pending_.ref_len);
    r_->refs += '\n';
    r_->alts.append(pending_.alt, pending_.alt_len);
    r_->alts += '\n';
    r_->vts.append(pending_.vt, pending_.vt_len);
    r_->vts += '\n';
    r_->pgroups.push_back(profile_id());
    ++r_->n_variants;
  }

  // Intern the pending record's ploidy profile; no span = profile 0
  // (all-diploid).  Runs only on the single-threaded emit path (scan
  // loop / MT merge coordinator), so a plain map is fine.
  int16_t profile_id() {
    if (pending_.ploidy == nullptr) return 0;
    key_.assign(pending_.ploidy, pending_.ploidy + pending_.ploidy_len);
    auto it = profile_ids_.find(key_);
    if (it != profile_ids_.end()) return it->second;
    if (r_->n_profiles >= 32767) {
      // int16 group ids; real chromosomes have a handful of profiles
      // (PAR bands) — hitting this means corrupt input, not scale
      r_->error = "more than 32767 distinct ploidy profiles";
      return 0;
    }
    int16_t gid = static_cast<int16_t>(r_->n_profiles);
    profile_ids_.emplace(key_, gid);
    r_->profiles.insert(r_->profiles.end(), key_.begin(), key_.end());
    ++r_->n_profiles;
    return gid;
  }

  VpResult* r_;
  RecView pending_;
  Record owned_;
  std::vector<uint8_t> key_;
  std::map<std::vector<uint8_t>, int16_t> profile_ids_;
  bool valid_ = false;
  bool pending_dup_ = false;
  bool owns_pending_ = false;
};

// Parse the #CHROM header line: fill samples / n_haplotypes / row_bytes.
void parse_chrom_header(const char* line, size_t len, VpResult* r) {
  int field = 0;
  size_t start = 0;
  int64_t n_samples = 0;
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
  r->profiles.assign(static_cast<size_t>(n_samples), 2);  // profile 0
}

// ---------------------------------------------------------------------------
// Single-threaded streaming scan (gzread handles raw text, plain gzip,
// and bgzf transparently).
// ---------------------------------------------------------------------------

class LineReader {
 public:
  explicit LineReader(const char* path) : gz_(gzopen(path, "rb")) {
    if (gz_ != nullptr) gzbuffer(gz_, 1 << 20);
  }
  ~LineReader() {
    if (gz_ != nullptr) gzclose(gz_);
  }
  bool ok() const { return gz_ != nullptr; }
  // non-empty after next_line() returns false iff the stream ended badly
  // (truncated/corrupt compressed data must NOT silently read as a
  // shorter file — the reference's htslib layer errors there too)
  const std::string& stream_error() const { return stream_error_; }

  bool next_line(const char** line, size_t* len) {
    line_.clear();
    while (true) {
      if (pos_ == avail_) {
        int n = gzread(gz_, buf_, sizeof(buf_));
        if (n <= 0) {
          int errnum = Z_OK;
          gzerror(gz_, &errnum);
          if (n < 0 || (errnum != Z_OK && errnum != Z_STREAM_END)) {
            stream_error_ = "truncated or corrupt compressed stream";
            return false;
          }
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
  std::string stream_error_;
};

void scan_single_threaded(const char* path, VpResult* r) {
  LineReader reader(path);
  if (!reader.ok()) {
    r->error = std::string("cannot open ") + path;
    return;
  }
  const char* line;
  size_t len;
  bool have_header = false;
  DedupEmitter emitter(r);
  // double buffer: the emitter's pending record is a VIEW of the
  // previous line's Record, so parse the next line into the other one
  Record recs[2];
  int cur = 0;

  while (reader.next_line(&line, &len)) {
    if (len > 0 && line[len - 1] == '\r') --len;
    if (len == 0) continue;
    if (line[0] == '#') {
      if (len >= 6 && memcmp(line, "#CHROM", 6) == 0) {
        parse_chrom_header(line, len, r);
        have_header = true;
      }
      continue;
    }
    if (!have_header) {
      r->error = "no #CHROM header before data lines";
      return;
    }
    switch (parse_data_line(line, len, r->n_haplotypes, r->row_bytes,
                            &recs[cur], &r->error)) {
      case LineVerdict::kKept:
        if (emitter.push(view_of(recs[cur]))) cur ^= 1;
        break;
      case LineVerdict::kSkipped:
        break;
      case LineVerdict::kError:
        return;
    }
  }
  if (!reader.stream_error().empty()) {
    r->error = reader.stream_error();
    return;
  }
  if (!have_header) {
    // contract parser raises on a file with no #CHROM line at all
    // (ingest/vcf.py read_sample_names); silent (0, 0) output would
    // mask a broken input
    r->error = "no #CHROM header line";
    return;
  }
  emitter.finish();
}

// ---------------------------------------------------------------------------
// BGZF block-parallel scan
// ---------------------------------------------------------------------------

// One batch of raw BGZF members sliced off the compressed stream.
struct Batch {
  int64_t seq = 0;
  std::vector<uint8_t> raw;          // concatenated whole gzip members
  std::vector<size_t> offsets;       // member start offsets (+end sentinel)
  std::vector<uint32_t> isizes;      // uncompressed size per member
  bool last = false;
};

// Parsed output of one batch.
struct ChunkOut {
  int64_t seq = 0;
  bool has_newline = false;
  std::string head;                  // text before first '\n'
  std::string tail;                  // text after last '\n' (or all text)
  RecArena recs;                     // complete interior lines, in order
  std::string error;
};

class BoundedQueue {
 public:
  explicit BoundedQueue(size_t cap) : cap_(cap) {}

  void push(std::unique_ptr<Batch> b) {
    std::unique_lock<std::mutex> lk(mu_);
    cv_push_.wait(lk, [&] { return q_.size() < cap_ || closed_; });
    if (closed_) return;
    q_.push_back(std::move(b));
    cv_pop_.notify_one();
  }

  std::unique_ptr<Batch> pop() {
    std::unique_lock<std::mutex> lk(mu_);
    cv_pop_.wait(lk, [&] { return !q_.empty() || done_ || closed_; });
    if (q_.empty()) return nullptr;
    auto b = std::move(q_.front());
    q_.pop_front();
    cv_push_.notify_one();
    return b;
  }

  void set_done() {
    std::lock_guard<std::mutex> lk(mu_);
    done_ = true;
    cv_pop_.notify_all();
  }

  void close() {  // abort: unblock everyone, drop queued work
    std::lock_guard<std::mutex> lk(mu_);
    closed_ = true;
    q_.clear();
    cv_pop_.notify_all();
    cv_push_.notify_all();
  }

 private:
  std::mutex mu_;
  std::condition_variable cv_push_, cv_pop_;
  std::deque<std::unique_ptr<Batch>> q_;
  size_t cap_;
  bool done_ = false;
  bool closed_ = false;
};

// Reorder buffer: workers deposit ChunkOuts by sequence number, the
// coordinator consumes them strictly in order.  BOUNDED: a put of any
// chunk other than the one the coordinator needs next blocks while
// `cap` chunks are already parked, so workers can never run unboundedly
// ahead of the in-order merge (at GB scale that lag was the RSS blowup
// and the cache-thrash behind the r4 thread-scaling collapse).  The
// chunk the coordinator is waiting for is always admitted — no deadlock.
class ReorderBuffer {
 public:
  explicit ReorderBuffer(size_t cap) : cap_(cap) {}

  void put(std::unique_ptr<ChunkOut> c) {
    std::unique_lock<std::mutex> lk(mu_);
    cv_put_.wait(lk, [&] {
      return closed_ || ready_.size() < cap_ || c->seq <= next_needed_;
    });
    if (closed_) return;
    ready_[c->seq] = std::move(c);
    cv_take_.notify_all();
  }

  // Blocks until chunk `seq` is available or all workers exited.
  std::unique_ptr<ChunkOut> take(int64_t seq, std::atomic<int>* live_workers) {
    std::unique_lock<std::mutex> lk(mu_);
    next_needed_ = seq;
    cv_put_.notify_all();
    cv_take_.wait(lk, [&] {
      return ready_.count(seq) > 0 || live_workers->load() == 0;
    });
    auto it = ready_.find(seq);
    if (it == ready_.end()) return nullptr;
    auto c = std::move(it->second);
    ready_.erase(it);
    next_needed_ = seq + 1;
    cv_put_.notify_all();
    return c;
  }

  void notify() { cv_take_.notify_all(); }

  void close() {  // abort: unblock blocked putters, drop parked chunks
    std::lock_guard<std::mutex> lk(mu_);
    closed_ = true;
    ready_.clear();
    cv_put_.notify_all();
    cv_take_.notify_all();
  }

 private:
  std::mutex mu_;
  std::condition_variable cv_put_, cv_take_;
  std::map<int64_t, std::unique_ptr<ChunkOut>> ready_;
  size_t cap_;
  int64_t next_needed_ = 0;
  bool closed_ = false;
};

// Reads one BGZF member header from `fp`; returns the total member size
// (BSIZE+1) and copies the 18+ header bytes already consumed into `hdr`.
// Returns 0 on clean EOF, -1 if the stream is not BGZF.
int64_t read_bgzf_member_header(FILE* fp, std::vector<uint8_t>* hdr) {
  uint8_t fixed[12];
  size_t n = fread(fixed, 1, sizeof(fixed), fp);
  if (n == 0) return 0;
  if (n < sizeof(fixed) || fixed[0] != 0x1f || fixed[1] != 0x8b ||
      fixed[2] != 0x08 || (fixed[3] & 0x04) == 0) {
    return -1;
  }
  uint16_t xlen = static_cast<uint16_t>(fixed[10] | (fixed[11] << 8));
  std::vector<uint8_t> extra(xlen);
  if (fread(extra.data(), 1, xlen, fp) != xlen) return -1;
  int64_t bsize = -1;
  for (size_t i = 0; i + 4 <= extra.size();) {
    uint8_t si1 = extra[i], si2 = extra[i + 1];
    uint16_t slen = static_cast<uint16_t>(extra[i + 2] | (extra[i + 3] << 8));
    if (si1 == 'B' && si2 == 'C' && slen == 2 && i + 6 <= extra.size()) {
      bsize = (extra[i + 4] | (extra[i + 5] << 8)) + 1;
      break;
    }
    i += 4 + slen;
  }
  // a member must at least hold its own header plus the 8-byte
  // CRC32/ISIZE trailer; a smaller BC value is corrupt and would
  // underflow the callers' size_t arithmetic into massive OOB writes
  if (bsize < static_cast<int64_t>(12u + xlen + 8u)) return -1;
  hdr->assign(fixed, fixed + sizeof(fixed));
  hdr->insert(hdr->end(), extra.begin(), extra.end());
  return bsize;
}

// Inflate one whole BGZF member (raw deflate payload) into `out`.
bool inflate_member(const uint8_t* member, size_t member_len, uint32_t isize,
                    size_t hdr_len, std::string* out) {
  if (member_len < hdr_len + 8) return false;
  // BGZF members decompress to <= 65,536 bytes by construction; a
  // larger ISIZE trailer is corrupt, and honoring it would pre-allocate
  // attacker-controlled gigabytes (bad_alloc escaping a worker thread
  // would terminate the process)
  if (isize > (1u << 16)) return false;
  size_t base = out->size();
  out->resize(base + isize);
  if (isize == 0) return true;
  z_stream zs;
  memset(&zs, 0, sizeof(zs));
  if (inflateInit2(&zs, -15) != Z_OK) return false;
  zs.next_in = const_cast<uint8_t*>(member + hdr_len);
  zs.avail_in = static_cast<uInt>(member_len - hdr_len - 8);
  zs.next_out = reinterpret_cast<uint8_t*>(&(*out)[base]);
  zs.avail_out = isize;
  int rc = inflate(&zs, Z_FINISH);
  inflateEnd(&zs);
  return rc == Z_STREAM_END && zs.avail_out == 0;
}

// Parse the complete lines of `text`, filling `out`.  Must only be
// called once the header is known.
void parse_chunk_text(const std::string& text, int64_t n_haplotypes,
                      int64_t row_bytes, ChunkOut* out) {
  const char* data = text.data();
  size_t len = text.size();
  const char* first_nl =
      static_cast<const char*>(memchr(data, '\n', len));
  if (first_nl == nullptr) {
    out->has_newline = false;
    out->tail.assign(data, len);
    return;
  }
  out->has_newline = true;
  out->head.assign(data, static_cast<size_t>(first_nl - data));
  const char* p = first_nl + 1;
  const char* end = data + len;
  Record rec;
  while (p < end) {
    const char* nl = static_cast<const char*>(
        memchr(p, '\n', static_cast<size_t>(end - p)));
    if (nl == nullptr) {
      out->tail.assign(p, static_cast<size_t>(end - p));
      return;
    }
    size_t llen = static_cast<size_t>(nl - p);
    if (llen > 0 && p[0] != '#') {
      switch (parse_data_line(p, llen, n_haplotypes, row_bytes, &rec,
                              &out->error)) {
        case LineVerdict::kKept:
          out->recs.append(rec);  // rec's buffers are reused next line
          break;
        case LineVerdict::kSkipped:
          break;
        case LineVerdict::kError:
          return;
      }
    }
    p = nl + 1;
  }
}

void scan_bgzf_parallel(const char* path, int n_threads, VpResult* r) {
  FILE* fp = fopen(path, "rb");
  if (fp == nullptr) {
    r->error = std::string("cannot open ") + path;
    return;
  }

  // --- Phase 0: sequentially inflate members until #CHROM is seen. ---
  // 1000G headers are a few KiB, so this covers at most a member or two.
  std::string head_text;
  bool have_header = false;
  size_t data_start_in_head = 0;
  std::atomic<bool> abort{false};
  while (!have_header) {
    std::vector<uint8_t> hdr;
    int64_t member_size = read_bgzf_member_header(fp, &hdr);
    if (member_size == 0) break;  // EOF before header
    if (member_size < 0) {
      fclose(fp);
      // Not BGZF: plain gzip or raw text -> single-threaded fallback.
      scan_single_threaded(path, r);
      return;
    }
    std::vector<uint8_t> member(hdr);
    member.resize(static_cast<size_t>(member_size));
    size_t rest = static_cast<size_t>(member_size) - hdr.size();
    if (fread(member.data() + hdr.size(), 1, rest, fp) != rest) {
      r->error = "truncated BGZF member";
      fclose(fp);
      return;
    }
    uint32_t isize;
    memcpy(&isize, member.data() + member.size() - 4, 4);
    if (!inflate_member(member.data(), member.size(), isize, hdr.size(),
                        &head_text)) {
      r->error = "BGZF inflate failed in header";
      fclose(fp);
      return;
    }
    // look for a completed #CHROM line
    size_t scan_from = 0;
    while (true) {
      const char* nl = static_cast<const char*>(
          memchr(head_text.data() + scan_from, '\n',
                 head_text.size() - scan_from));
      if (nl == nullptr) break;
      size_t line_start = scan_from;
      size_t llen = static_cast<size_t>(nl - (head_text.data() + scan_from));
      scan_from += llen + 1;
      if (llen >= 6 &&
          memcmp(head_text.data() + line_start, "#CHROM", 6) == 0) {
        size_t hl = llen;
        if (hl > 0 && head_text[line_start + hl - 1] == '\r') --hl;
        parse_chrom_header(head_text.data() + line_start, hl, r);
        have_header = true;
        data_start_in_head = scan_from;
        break;
      }
      if (head_text[line_start] != '#') {
        r->error = "no #CHROM header before data lines";
        fclose(fp);
        return;
      }
    }
  }
  if (!have_header) {
    if (!head_text.empty() && head_text[0] != '#') {
      r->error = "no #CHROM header before data lines";
    } else {
      // empty or metadata-only file: the contract parser raises
      r->error = "no #CHROM header line";
    }
    fclose(fp);
    return;
  }

  const int64_t n_hap = r->n_haplotypes;
  const int64_t row_bytes = r->row_bytes;

  // --- Phase 1: reader thread slices batches, workers inflate+parse. ---
  const size_t kBatchBytes = 512 << 10;  // compressed bytes per work item: small
  // enough that even a few-MB fixture fans out, coarse enough (~10 MB of
  // text at typical VCF ratios) that queue + seam overhead stays noise
  BoundedQueue in_queue(static_cast<size_t>(2 * n_threads + 2));
  ReorderBuffer reorder(static_cast<size_t>(2 * n_threads + 2));
  std::atomic<int> live_workers{n_threads};
  std::atomic<int64_t> n_batches{-1};

  std::thread reader([&] {
    int64_t seq = 1;  // seq 0 is the head_text remainder
    auto batch = std::make_unique<Batch>();
    batch->seq = seq;
    std::string reader_error;
    while (!abort.load(std::memory_order_relaxed)) {
      std::vector<uint8_t> hdr;
      int64_t member_size = read_bgzf_member_header(fp, &hdr);
      if (member_size == 0) break;
      if (member_size < 0) {
        reader_error = "non-BGZF member mid-stream";
        break;
      }
      size_t base = batch->raw.size();
      batch->offsets.push_back(base);
      batch->raw.resize(base + static_cast<size_t>(member_size));
      memcpy(batch->raw.data() + base, hdr.data(), hdr.size());
      size_t rest = static_cast<size_t>(member_size) - hdr.size();
      if (fread(batch->raw.data() + base + hdr.size(), 1, rest, fp) != rest) {
        // roll the partial member back out so a pushed batch never has
        // an offsets entry without a matching isizes entry (the worker
        // would index isizes[m] out of bounds)
        batch->raw.resize(base);
        batch->offsets.pop_back();
        reader_error = "truncated BGZF member";
        break;
      }
      uint32_t isize;
      memcpy(&isize, batch->raw.data() + base + member_size - 4, 4);
      batch->isizes.push_back(isize);
      if (batch->raw.size() >= kBatchBytes) {
        batch->offsets.push_back(batch->raw.size());
        in_queue.push(std::move(batch));
        batch = std::make_unique<Batch>();
        batch->seq = ++seq;
      }
    }
    if (!batch->isizes.empty()) {
      batch->offsets.push_back(batch->raw.size());
      in_queue.push(std::move(batch));
    } else {
      --seq;
    }
    if (!reader_error.empty()) {
      auto c = std::make_unique<ChunkOut>();
      c->seq = seq + 1;
      c->error = std::move(reader_error);
      reorder.put(std::move(c));
      n_batches.store(seq + 1);
    } else {
      n_batches.store(seq);
    }
    in_queue.set_done();
  });

  std::vector<std::thread> workers;
  for (int w = 0; w < n_threads; ++w) {
    workers.emplace_back([&] {
      while (true) {
        auto batch = in_queue.pop();
        if (batch == nullptr) break;
        auto out = std::make_unique<ChunkOut>();
        out->seq = batch->seq;
        std::string text;
        size_t total = 0;
        for (uint32_t is : batch->isizes) total += is;
        text.reserve(total);
        bool ok = true;
        for (size_t m = 0; m + 1 < batch->offsets.size(); ++m) {
          size_t off = batch->offsets[m];
          size_t mlen = batch->offsets[m + 1] - off;
          // header length = 12 fixed + XLEN
          uint16_t xlen = static_cast<uint16_t>(
              batch->raw[off + 10] | (batch->raw[off + 11] << 8));
          if (!inflate_member(batch->raw.data() + off, mlen,
                              batch->isizes[m], 12u + xlen, &text)) {
            out->error = "BGZF inflate failed";
            ok = false;
            break;
          }
        }
        if (ok && !abort.load(std::memory_order_relaxed)) {
          parse_chunk_text(text, n_hap, row_bytes, out.get());
        }
        if (!out->error.empty()) abort.store(true);
        reorder.put(std::move(out));
      }
      if (--live_workers == 0) reorder.notify();
    });
  }

  // --- Phase 2: in-order merge with seam-line parsing and dedup. ---
  DedupEmitter emitter(r);
  std::string carry;
  Record rec;

  // Chunk 0: remainder of the header text (complete + partial lines).
  {
    std::string rest = head_text.substr(data_start_in_head);
    ChunkOut c0;
    parse_chunk_text("\n" + rest, n_hap, row_bytes, &c0);
    if (!c0.error.empty()) {
      r->error = c0.error;
      abort.store(true);
    } else {
      for (size_t k = 0; k < c0.recs.n; ++k) {
        emitter.push(c0.recs.view(k, row_bytes));
      }
      emitter.own_pending();  // c0's arena dies here
      carry = std::move(c0.tail);
    }
  }

  int64_t next_seq = 1;
  while (r->error.empty()) {
    int64_t total = n_batches.load();
    if (total >= 0 && next_seq > total) break;
    auto c = reorder.take(next_seq, &live_workers);
    if (c == nullptr) {
      // workers all gone; check whether the stream simply ended
      total = n_batches.load();
      if (total >= 0 && next_seq > total) break;
      if (r->error.empty()) r->error = "BGZF scan aborted";
      break;
    }
    if (!c->error.empty()) {
      r->error = c->error;
      break;
    }
    if (!c->has_newline) {
      carry += c->tail;  // whole chunk was one partial line
    } else {
      std::string seam = carry + c->head;
      if (!seam.empty() && seam[0] != '#') {
        switch (parse_data_line(seam.data(), seam.size(), n_hap, row_bytes,
                                &rec, &r->error)) {
          case LineVerdict::kKept:
            emitter.push(view_of(rec));
            emitter.own_pending();  // rec is reused at the next seam
            break;
          case LineVerdict::kSkipped:
            break;
          case LineVerdict::kError:
            break;
        }
        if (!r->error.empty()) break;
      }
      for (size_t k = 0; k < c->recs.n; ++k) {
        emitter.push(c->recs.view(k, row_bytes));
      }
      emitter.own_pending();  // this chunk's arena is freed below
      carry = std::move(c->tail);
    }
    ++next_seq;
  }
  if (!r->error.empty()) abort.store(true);

  // final dangling line (file without trailing newline)
  if (r->error.empty() && !carry.empty() && carry[0] != '#') {
    switch (parse_data_line(carry.data(), carry.size(), n_hap, row_bytes,
                            &rec, &r->error)) {
      case LineVerdict::kKept:
        emitter.push(view_of(rec));
        break;
      default:
        break;
    }
  }
  if (r->error.empty()) emitter.finish();

  reorder.close();  // unblock any worker parked in a bounded put
  in_queue.close();
  reader.join();
  for (auto& w : workers) w.join();
  fclose(fp);

  if (!r->error.empty()) {
    // drop any partially-emitted rows so callers never see torn output
    r->n_variants = 0;
    r->packed.clear();
    r->positions.clear();
    r->rsids.clear();
    r->refs.clear();
    r->alts.clear();
    r->vts.clear();
    r->pgroups.clear();
  }
}

}  // namespace

extern "C" {

VpResult* vp_scan_mt(const char* path, int32_t n_threads) {
  VpResult* r = new VpResult();
  if (n_threads <= 1) {
    scan_single_threaded(path, r);
  } else {
    scan_bgzf_parallel(path, static_cast<int>(n_threads), r);
  }
  return r;
}

VpResult* vp_scan(const char* path) { return vp_scan_mt(path, 1); }

int64_t vp_n_variants(VpResult* r) { return r->n_variants; }
int64_t vp_n_haplotypes(VpResult* r) { return r->n_haplotypes; }
int64_t vp_row_bytes(VpResult* r) { return r->row_bytes; }
void vp_packed_copy(VpResult* r, uint8_t* dst) { r->packed.copy_to(dst); }
const int64_t* vp_positions(VpResult* r) { return r->positions.data(); }
const char* vp_rsids(VpResult* r) { return r->rsids.c_str(); }
const char* vp_refs(VpResult* r) { return r->refs.c_str(); }
const char* vp_alts(VpResult* r) { return r->alts.c_str(); }
const char* vp_vts(VpResult* r) { return r->vts.c_str(); }
const char* vp_samples(VpResult* r) { return r->samples.c_str(); }
const char* vp_error(VpResult* r) { return r->error.c_str(); }
int64_t vp_n_profiles(VpResult* r) { return r->n_profiles; }
const uint8_t* vp_profiles(VpResult* r) { return r->profiles.data(); }
const int16_t* vp_pgroups(VpResult* r) { return r->pgroups.data(); }
void vp_free(VpResult* r) { delete r; }

}  // extern "C"
