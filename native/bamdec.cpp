// Native BAM/BGZF decoder (htslib-equivalent ingest shim).
//
// The reference delegates BAM decoding to pysam/htslib
// (py/freddie_split.py:12,210-242); this is the same role for this
// framework: BGZF block inflation (zlib) + BAM record parsing + 4-bit
// sequence expansion, exposed as a batch API over flat arrays so the
// Python side materializes no per-record intermediate objects it doesn't
// need.
//
// Build: g++ -O2 -shared -fPIC -o libbamdec.so bamdec.cpp -lz
// Bindings: freddie_tpu/io/bam_native.py (ctypes).

#include <zlib.h>

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <string>
#include <vector>

namespace {

const char SEQ_NIBBLE[17] = "=ACMGRSVTWYHKDBN";

struct Ref {
  std::string name;
  int64_t len;
};

struct Handle {
  FILE* f = nullptr;
  std::vector<uint8_t> buf;   // decompressed bytes not yet consumed
  size_t pos = 0;             // read cursor in buf
  std::vector<Ref> refs;
  bool eof = false;
  std::string err;
};

// Read one BGZF member; append payload to h.buf. False at EOF or error.
bool read_block(Handle& h) {
  uint8_t hdr[12];
  size_t got = fread(hdr, 1, 12, h.f);
  if (got == 0) { h.eof = true; return false; }
  if (got < 12 || hdr[0] != 0x1f || hdr[1] != 0x8b || hdr[2] != 8) {
    h.err = "bad BGZF header"; return false;
  }
  uint16_t xlen; memcpy(&xlen, hdr + 10, 2);
  std::vector<uint8_t> extra(xlen);
  if (fread(extra.data(), 1, xlen, h.f) != xlen) { h.err = "truncated extra"; return false; }
  int bsize = -1;
  for (size_t off = 0; off + 4 <= extra.size();) {
    uint8_t si1 = extra[off], si2 = extra[off + 1];
    uint16_t slen; memcpy(&slen, extra.data() + off + 2, 2);
    if (si1 == 66 && si2 == 67 && slen == 2) {
      uint16_t v; memcpy(&v, extra.data() + off + 4, 2); bsize = v;
    }
    off += 4 + slen;
  }
  if (bsize < 0) { h.err = "missing BC subfield"; return false; }
  int cdata_len = bsize + 1 - 12 - xlen - 8;
  std::vector<uint8_t> cdata(cdata_len);
  if ((int)fread(cdata.data(), 1, cdata_len, h.f) != cdata_len) {
    h.err = "truncated block"; return false;
  }
  uint8_t tail[8];
  if (fread(tail, 1, 8, h.f) != 8) { h.err = "truncated footer"; return false; }
  uint32_t isize; memcpy(&isize, tail + 4, 4);
  size_t old = h.buf.size();
  h.buf.resize(old + isize);
  if (isize) {
    z_stream zs{};
    inflateInit2(&zs, -15);
    zs.next_in = cdata.data();
    zs.avail_in = cdata_len;
    zs.next_out = h.buf.data() + old;
    zs.avail_out = isize;
    int rc = inflate(&zs, Z_FINISH);
    inflateEnd(&zs);
    if (rc != Z_STREAM_END) { h.err = "inflate failed"; return false; }
  }
  return true;
}

// Ensure at least n bytes are available at h.pos; compact as needed.
bool ensure(Handle& h, size_t n) {
  while (h.buf.size() - h.pos < n) {
    if (h.pos > (1u << 20)) {  // compact
      h.buf.erase(h.buf.begin(), h.buf.begin() + h.pos);
      h.pos = 0;
    }
    if (!read_block(h)) return false;
  }
  return true;
}

template <typename T>
T rd(Handle& h) {
  T v;
  memcpy(&v, h.buf.data() + h.pos, sizeof(T));
  h.pos += sizeof(T);
  return v;
}

}  // namespace

extern "C" {

void* bamdec_open(const char* path, char* err, int errlen) {
  Handle* h = new Handle();
  h->f = fopen(path, "rb");
  auto fail = [&](const std::string& msg) -> void* {
    snprintf(err, errlen, "%s", msg.c_str());
    if (h->f) fclose(h->f);
    delete h;
    return nullptr;
  };
  if (!h->f) return fail("cannot open file");
  if (!ensure(*h, 8)) return fail("truncated BAM: " + h->err);
  if (memcmp(h->buf.data(), "BAM\x01", 4) != 0) return fail("not a BAM file");
  h->pos = 4;
  int32_t l_text = rd<int32_t>(*h);
  if (!ensure(*h, l_text + 4)) return fail("truncated header");
  h->pos += l_text;
  int32_t n_ref = rd<int32_t>(*h);
  for (int i = 0; i < n_ref; ++i) {
    if (!ensure(*h, 4)) return fail("truncated refs");
    int32_t l_name = rd<int32_t>(*h);
    if (!ensure(*h, l_name + 4)) return fail("truncated refs");
    std::string name((const char*)h->buf.data() + h->pos, l_name - 1);
    h->pos += l_name;
    int32_t l_ref = rd<int32_t>(*h);
    h->refs.push_back(Ref{name, l_ref});
  }
  return h;
}

int bamdec_n_refs(void* hp) { return (int)((Handle*)hp)->refs.size(); }

int bamdec_ref(void* hp, int i, char* name_out, int cap, long long* len_out) {
  Handle* h = (Handle*)hp;
  if (i < 0 || i >= (int)h->refs.size()) return -1;
  snprintf(name_out, cap, "%s", h->refs[i].name.c_str());
  *len_out = h->refs[i].len;
  return 0;
}

// Returns number of records decoded (0 at EOF, -1 on error / buffer full).
long long bamdec_next_batch(
    void* hp, long long max_records,
    int32_t* ref_id, int64_t* pos, uint16_t* flag, uint8_t* mapq,
    int64_t* name_off, int32_t* name_len, char* name_buf, long long name_cap,
    int64_t* cigar_off, int32_t* cigar_len, uint32_t* cigar_buf, long long cigar_cap,
    int64_t* seq_off, int64_t* seq_len, char* seq_buf, long long seq_cap) {
  Handle* h = (Handle*)hp;
  long long n = 0;
  long long nb = 0, cb = 0, sb = 0;
  while (n < max_records) {
    if (!ensure(*h, 4)) {
      if (h->eof) break;
      return -1;
    }
    int32_t block_size = rd<int32_t>(*h);
    if (!ensure(*h, block_size)) return -1;
    size_t rec_end = h->pos + block_size;
    ref_id[n] = rd<int32_t>(*h);
    pos[n] = rd<int32_t>(*h);
    uint8_t l_read_name = rd<uint8_t>(*h);
    mapq[n] = rd<uint8_t>(*h);
    h->pos += 2;  // bin
    uint16_t n_cigar = rd<uint16_t>(*h);
    flag[n] = rd<uint16_t>(*h);
    int32_t l_seq = rd<int32_t>(*h);
    h->pos += 12;  // next_refID, next_pos, tlen
    if (nb + l_read_name > name_cap || cb + n_cigar > cigar_cap ||
        sb + l_seq > seq_cap)
      return -2;  // caller buffers too small
    memcpy(name_buf + nb, h->buf.data() + h->pos, l_read_name - 1);
    name_off[n] = nb;
    name_len[n] = l_read_name - 1;
    nb += l_read_name - 1;
    h->pos += l_read_name;
    memcpy(cigar_buf + cb, h->buf.data() + h->pos, 4ull * n_cigar);
    cigar_off[n] = cb;
    cigar_len[n] = n_cigar;
    cb += n_cigar;
    h->pos += 4ull * n_cigar;
    const uint8_t* packed = h->buf.data() + h->pos;
    for (int32_t i = 0; i < l_seq; ++i) {
      uint8_t b = packed[i >> 1];
      seq_buf[sb + i] = SEQ_NIBBLE[(i & 1) ? (b & 0xF) : (b >> 4)];
    }
    seq_off[n] = sb;
    seq_len[n] = l_seq;
    sb += l_seq;
    h->pos = rec_end;  // skip qual + tags
    ++n;
  }
  return n;
}

// Array-native ingest for the split stage: decode records AND perform the
// per-alignment CIGAR walk (the reference's get_intervals,
// py/freddie_split.py:133-207) in one pass, returning flat interval
// arrays. Mirrors freddie_tpu/core/cigar.py exactly: deletions longer
// than max_del_size are reclassified as introns, each maximal run between
// introns becomes one exonic interval with its exon-consuming cigar ops
// rendered as text, and empty (target- or query-empty) intervals are
// dropped (the record_to_read filter). Sequences are NOT expanded: the
// split stage takes sequences from the FASTQ pass, so skipping the 4-bit
// expansion removes the largest per-record cost of the generic batch API.
//
// Records flagged unmapped/secondary/supplementary get iv_n = 0 and no
// walk (the caller filters them anyway, and their qlen may not match).
// Returns records decoded; 0 at EOF; stops early (returning the prefix)
// when an output buffer would overflow; -2 if even one record does not
// fit; -3 on a CIGAR/query length mismatch (the reference asserts).
long long bamdec_next_batch_iv(
    void* hp, long long max_records, int max_del_size,
    int32_t* ref_id, int64_t* pos, uint16_t* flag,
    int64_t* name_off, int32_t* name_len, char* name_buf, long long name_cap,
    int64_t* iv_off, int32_t* iv_n,
    int64_t* iv_ts, int64_t* iv_te, int64_t* iv_qs, int64_t* iv_qe,
    int64_t* cig_off, int32_t* cig_len, char* cig_buf, long long cig_cap,
    long long iv_cap) {
  Handle* h = (Handle*)hp;
  long long n = 0;
  long long nb = 0, ivb = 0, cb = 0;
  const char* OPS = "MIDNSHP=XB";
  while (n < max_records) {
    if (!ensure(*h, 4)) {
      if (h->eof) break;
      return -1;
    }
    size_t save_pos = h->pos;
    int32_t block_size = rd<int32_t>(*h);
    if (!ensure(*h, block_size)) return -1;
    size_t rec_end = h->pos + block_size;
    int32_t rid = rd<int32_t>(*h);
    int64_t rpos = rd<int32_t>(*h);
    uint8_t l_read_name = rd<uint8_t>(*h);
    h->pos += 1;  // mapq
    h->pos += 2;  // bin
    uint16_t n_cigar = rd<uint16_t>(*h);
    uint16_t fl = rd<uint16_t>(*h);
    int32_t l_seq = rd<int32_t>(*h);
    h->pos += 12;  // next_refID, next_pos, tlen
    // Worst case per record: every cigar op is its own interval with an
    // 11-char rendering ("4294967295M").
    if (nb + l_read_name - 1 > name_cap || ivb + n_cigar + 1 > iv_cap ||
        cb + 12ll * (n_cigar + 1) > cig_cap) {
      h->pos = save_pos;
      if (n == 0) return -2;
      break;
    }
    memcpy(name_buf + nb, h->buf.data() + h->pos, l_read_name - 1);
    name_off[n] = nb;
    name_len[n] = l_read_name - 1;
    nb += l_read_name - 1;
    h->pos += l_read_name;
    const uint8_t* cig = h->buf.data() + h->pos;
    ref_id[n] = rid;
    pos[n] = rpos;
    flag[n] = fl;
    iv_off[n] = ivb;
    iv_n[n] = 0;
    bool skip_walk = (fl & (4 | 256 | 2048)) != 0 || n_cigar == 0;
    if (!skip_walk) {
      // qstart/qlen/qend bookkeeping (core/cigar.py:50-56).
      int64_t qlen = 0;
      for (uint16_t i = 0; i < n_cigar; ++i) {
        uint32_t v;
        memcpy(&v, cig + 4ull * i, 4);
        uint32_t op = v & 0xF, c = v >> 4;
        if (op == 1 || op == 4 || op == 0 || op == 7 || op == 8) qlen += c;
      }
      if (qlen != l_seq) return -3;
      uint32_t v0, vlast;
      memcpy(&v0, cig, 4);
      memcpy(&vlast, cig + 4ull * (n_cigar - 1), 4);
      int64_t qstart = ((v0 & 0xF) == 4) ? (v0 >> 4) : 0;
      int64_t qend = qlen - (((vlast & 0xF) == 4) ? (int64_t)(vlast >> 4) : 0);
      if (qend <= qstart) return -3;  // the reference asserts this too
      int64_t q_lo = qstart, q_hi = qstart;
      int64_t t_lo = rpos, t_hi = rpos;
      int64_t cig_start = cb;
      long long first_iv = ivb;
      auto close_interval = [&]() {
        if (t_lo != t_hi && q_lo != q_hi) {
          iv_ts[ivb] = t_lo;
          iv_te[ivb] = t_hi;
          iv_qs[ivb] = q_lo;
          iv_qe[ivb] = q_hi;
          cig_off[ivb] = cig_start;
          cig_len[ivb] = (int32_t)(cb - cig_start);
          ++ivb;
        } else {
          cb = cig_start;  // drop the rendered ops of an empty interval
        }
        cig_start = cb;
      };
      for (uint16_t i = 0; i < n_cigar; ++i) {
        uint32_t v;
        memcpy(&v, cig + 4ull * i, 4);
        uint32_t op = v & 0xF;
        uint32_t c = v >> 4;
        if (op == 2 && (int)c > max_del_size) op = 3;  // D -> N rewrite
        if (op == 1 || op == 2 || op == 0 || op == 7 || op == 8) {
          cb += snprintf(cig_buf + cb, 13, "%u%c", c, OPS[op]);
        }
        if (op == 2) {
          t_hi += c;
        } else if (op == 1) {
          q_hi += c;
        } else if (op == 0 || op == 7 || op == 8) {
          t_hi += c;
          q_hi += c;
        }
        if (op == 3) {
          close_interval();
          t_hi += c;
          t_lo = t_hi;
          q_lo = q_hi;
        }
      }
      if (t_lo < t_hi) close_interval();
      iv_n[n] = (int32_t)(ivb - first_iv);
    }
    h->pos = rec_end;  // skip seq + qual + tags
    ++n;
  }
  return n;
}

void bamdec_close(void* hp) {
  Handle* h = (Handle*)hp;
  if (h->f) fclose(h->f);
  delete h;
}

}  // extern "C"
