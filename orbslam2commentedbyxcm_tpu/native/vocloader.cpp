// Fast DBoW2 text-vocabulary parser (ORBvoc.txt format).
//
// The reference loads its ~1M-node / ~145MB ORB vocabulary through
// std::stringstream per line (TemplatedVocabulary::loadFromTextFile,
// Thirdparty/DBoW2/DBoW2/TemplatedVocabulary.h:1338) — "seconds of load
// time" per SURVEY.md §3.1. This parser reads the whole file once and scans
// it with branch-light integer parsing: ~1s for ORBvoc-sized files vs
// minutes for the pure-Python fallback in utils/vocab_tools.py.
//
// Line format (after the "k L scoring weighting" header):
//   parent_id is_leaf d0 .. d31 weight
//
// API (ctypes): voc_parse -> opaque handle + header/count, voc_fill copies
// the parsed columns into caller-provided numpy buffers, voc_free releases.

#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <vector>

namespace {

struct VocData {
  int32_t k = 0, L = 0, scoring = 0, weighting = 0;
  std::vector<int32_t> parent;  // per node (excluding root)
  std::vector<uint8_t> leaf;
  std::vector<uint8_t> desc;    // 32 bytes per node
  std::vector<float> weight;
};

inline void skip_space(const char*& p, const char* end) {
  while (p < end && (*p == ' ' || *p == '\t' || *p == '\r' || *p == '\n')) ++p;
}

inline bool parse_long(const char*& p, const char* end, long& out) {
  skip_space(p, end);
  if (p >= end) return false;
  bool neg = false;
  if (*p == '-') { neg = true; ++p; }
  if (p >= end || *p < '0' || *p > '9') return false;
  long v = 0;
  while (p < end && *p >= '0' && *p <= '9') v = v * 10 + (*p++ - '0');
  out = neg ? -v : v;
  return true;
}

inline bool parse_float(const char*& p, const char* end, float& out) {
  skip_space(p, end);
  if (p >= end) return false;
  char* q = nullptr;
  out = strtof(p, &q);
  if (q == p) return false;
  p = q;
  return true;
}

}  // namespace

extern "C" {

// Parses `path`. On success returns a handle and writes
// header = {k, L, scoring, weighting, n_nodes}; returns nullptr on failure.
void* voc_parse(const char* path, int32_t* header) {
  FILE* f = fopen(path, "rb");
  if (!f) return nullptr;
  fseek(f, 0, SEEK_END);
  long size = ftell(f);
  fseek(f, 0, SEEK_SET);
  if (size <= 0) { fclose(f); return nullptr; }
  std::vector<char> buf(static_cast<size_t>(size));
  if (fread(buf.data(), 1, buf.size(), f) != buf.size()) { fclose(f); return nullptr; }
  fclose(f);

  const char* p = buf.data();
  const char* end = p + buf.size();

  auto* d = new VocData();
  long k, L, s, w;
  if (!parse_long(p, end, k) || !parse_long(p, end, L) ||
      !parse_long(p, end, s) || !parse_long(p, end, w) ||
      k < 0 || k > 20 || L < 1 || L > 10 || s < 0 || s > 5 || w < 0 || w > 3) {
    delete d;
    return nullptr;
  }
  d->k = (int32_t)k; d->L = (int32_t)L;
  d->scoring = (int32_t)s; d->weighting = (int32_t)w;

  // pow(k, L+1)/(k-1) node estimate, matching the reference's reserve
  size_t est = 1;
  for (int i = 0; i <= L && est < (1u << 24); ++i) est *= (size_t)(k > 1 ? k : 2);
  d->parent.reserve(est);
  d->leaf.reserve(est);
  d->desc.reserve(est * 32);
  d->weight.reserve(est);

  while (true) {
    long pid;
    if (!parse_long(p, end, pid)) break;  // EOF / trailing whitespace
    long is_leaf;
    if (!parse_long(p, end, is_leaf)) { delete d; return nullptr; }
    uint8_t bytes[32];
    for (int i = 0; i < 32; ++i) {
      long v;
      if (!parse_long(p, end, v) || v < 0 || v > 255) { delete d; return nullptr; }
      bytes[i] = (uint8_t)v;
    }
    float wt;
    if (!parse_float(p, end, wt)) { delete d; return nullptr; }
    d->parent.push_back((int32_t)pid);
    d->leaf.push_back(is_leaf > 0 ? 1 : 0);
    d->desc.insert(d->desc.end(), bytes, bytes + 32);
    d->weight.push_back(wt);
  }

  header[0] = d->k; header[1] = d->L;
  header[2] = d->scoring; header[3] = d->weighting;
  header[4] = (int32_t)d->parent.size();
  return d;
}

// Copies parsed columns into caller buffers sized for n_nodes
// (parent int32[n], leaf uint8[n], desc uint8[n*32], weight float32[n]).
void voc_fill(void* handle, int32_t* parent, uint8_t* leaf, uint8_t* desc,
              float* weight) {
  auto* d = static_cast<VocData*>(handle);
  size_t n = d->parent.size();
  memcpy(parent, d->parent.data(), n * sizeof(int32_t));
  memcpy(leaf, d->leaf.data(), n);
  memcpy(desc, d->desc.data(), n * 32);
  memcpy(weight, d->weight.data(), n * sizeof(float));
}

void voc_free(void* handle) { delete static_cast<VocData*>(handle); }

}  // extern "C"
