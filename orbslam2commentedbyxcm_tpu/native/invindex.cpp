// BoW inverted-file index: the native engine behind KeyFrameDatabase.
//
// Replaces the reference's DBoW2 inverted file (word id -> list<KeyFrame*>,
// include/KeyFrameDatabase.h:88) and the shared-word-counting /
// 0.8x-max-common / min-L1-score prefilters of DetectLoopCandidates and
// DetectRelocalizationCandidates (src/KeyFrameDatabase.cc:79-309). The
// covisibility-group accumulation stage stays in the Python host layer
// (it needs the live covisibility graph); this engine does the O(words x
// postings) inner loops.
//
// Scores are DBoW2 L1 (ScoringObject.h): for L1-normalized sparse vectors,
// s = sum over common words of min(v1, v2)  (== 1 - 0.5*|v1 - v2|_1).

#include <algorithm>
#include <cstdint>
#include <unordered_map>
#include <unordered_set>
#include <vector>

namespace {

struct SparseVec {
  std::vector<int32_t> words;  // sorted ascending
  std::vector<float> vals;
};

struct InvIndex {
  std::unordered_map<int32_t, std::vector<int64_t>> inverted;
  std::unordered_map<int64_t, SparseVec> vectors;
};

float l1_score(const SparseVec& a, const SparseVec& b) {
  float s = 0.f;
  size_t i = 0, j = 0;
  while (i < a.words.size() && j < b.words.size()) {
    if (a.words[i] == b.words[j]) {
      s += std::min(a.vals[i], b.vals[j]);
      ++i; ++j;
    } else if (a.words[i] < b.words[j]) {
      ++i;
    } else {
      ++j;
    }
  }
  return s;
}

SparseVec make_vec(const int32_t* words, const float* vals, int32_t n) {
  std::vector<int32_t> order(n);
  for (int32_t i = 0; i < n; ++i) order[i] = i;
  std::sort(order.begin(), order.end(),
            [&](int32_t x, int32_t y) { return words[x] < words[y]; });
  SparseVec v;
  v.words.reserve(n);
  v.vals.reserve(n);
  for (int32_t i = 0; i < n; ++i) {
    v.words.push_back(words[order[i]]);
    v.vals.push_back(vals[order[i]]);
  }
  return v;
}

}  // namespace

extern "C" {

void* ii_create() { return new InvIndex(); }
void ii_destroy(void* h) { delete static_cast<InvIndex*>(h); }
void ii_clear(void* h) {
  auto* x = static_cast<InvIndex*>(h);
  x->inverted.clear();
  x->vectors.clear();
}

void ii_add(void* h, int64_t kf, const int32_t* words, const float* vals,
            int32_t n) {
  auto* x = static_cast<InvIndex*>(h);
  x->vectors[kf] = make_vec(words, vals, n);
  for (int32_t i = 0; i < n; ++i) x->inverted[words[i]].push_back(kf);
}

void ii_erase(void* h, int64_t kf) {
  auto* x = static_cast<InvIndex*>(h);
  auto it = x->vectors.find(kf);
  if (it == x->vectors.end()) return;
  for (int32_t w : it->second.words) {
    auto lit = x->inverted.find(w);
    if (lit == x->inverted.end()) continue;
    auto& lst = lit->second;
    lst.erase(std::remove(lst.begin(), lst.end(), kf), lst.end());
    if (lst.empty()) x->inverted.erase(lit);
  }
  x->vectors.erase(it);
}

int32_t ii_size(void* h) {
  return (int32_t)static_cast<InvIndex*>(h)->vectors.size();
}

float ii_score(void* h, int64_t kf1, int64_t kf2) {
  auto* x = static_cast<InvIndex*>(h);
  auto a = x->vectors.find(kf1), b = x->vectors.find(kf2);
  if (a == x->vectors.end() || b == x->vectors.end()) return 0.f;
  return l1_score(a->second, b->second);
}

float ii_score_vec(void* h, const int32_t* words, const float* vals,
                   int32_t n, int64_t kf) {
  auto* x = static_cast<InvIndex*>(h);
  auto b = x->vectors.find(kf);
  if (b == x->vectors.end()) return 0.f;
  return l1_score(make_vec(words, vals, n), b->second);
}

// Shared-word counting + 0.8*max-common filter + L1 >= min_score filter
// (reference src/KeyFrameDatabase.cc:96-160 and the relocalization analogue
// :219-268). Writes up to cap (kf, score) pairs; returns the count, or -1
// if cap was too small.
int32_t ii_query(void* h, const int32_t* words, const float* vals, int32_t n,
                 const int64_t* exclude, int32_t n_excl, float min_score,
                 int64_t* out_kf, float* out_score, int32_t cap) {
  auto* x = static_cast<InvIndex*>(h);
  std::unordered_set<int64_t> excl(exclude, exclude + n_excl);
  std::unordered_map<int64_t, int32_t> counts;
  for (int32_t i = 0; i < n; ++i) {
    auto it = x->inverted.find(words[i]);
    if (it == x->inverted.end()) continue;
    for (int64_t kf : it->second) {
      if (!excl.count(kf)) ++counts[kf];
    }
  }
  if (counts.empty()) return 0;
  int32_t max_common = 0;
  for (auto& kv : counts) max_common = std::max(max_common, kv.second);
  const float min_common = 0.8f * (float)max_common;

  SparseVec q = make_vec(words, vals, n);
  int32_t m = 0;
  for (auto& kv : counts) {
    if ((float)kv.second <= min_common) continue;
    auto vit = x->vectors.find(kv.first);
    if (vit == x->vectors.end()) continue;
    float s = l1_score(q, vit->second);
    if (s < min_score) continue;
    if (m >= cap) return -1;
    out_kf[m] = kv.first;
    out_score[m] = s;
    ++m;
  }
  return m;
}

}  // extern "C"
