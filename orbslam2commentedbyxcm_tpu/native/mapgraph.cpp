// Native map-graph engine: observation index + covisibility graph.
//
// C++ replacement for the host-side bookkeeping the reference keeps in its
// C++ object graph (MapPoint::mObservations, include/MapPoint.h:183;
// KeyFrame::UpdateConnections covisibility counting, src/KeyFrame.cc:324;
// Map point/keyframe queries). The Python pipeline's dict-of-dicts index is
// the host bottleneck at scale (tens of thousands of points x per-keyframe
// recounts); this engine keeps the same data in flat hash containers and
// exposes a C ABI consumed via ctypes (orbslam2commentedbyxcm_tpu/native/__init__.py).
//
// Build: g++ -O3 -shared -fPIC -std=c++17 mapgraph.cpp -o libmapgraph.so

#include <cstdint>
#include <unordered_map>
#include <unordered_set>
#include <vector>
#include <algorithm>

namespace {

struct Obs {
  int64_t kf;
  int32_t feat;
};

struct MapGraph {
  // pid -> observations (kf, feat)
  std::unordered_map<int64_t, std::vector<Obs>> obs;
  // kf -> set of pids
  std::unordered_map<int64_t, std::unordered_set<int64_t>> kf_points;

  std::vector<Obs>* find(int64_t pid) {
    auto it = obs.find(pid);
    return it == obs.end() ? nullptr : &it->second;
  }
};

}  // namespace

extern "C" {

void* mg_create() { return new MapGraph(); }

void mg_destroy(void* h) { delete static_cast<MapGraph*>(h); }

void mg_clear(void* h) {
  auto* g = static_cast<MapGraph*>(h);
  g->obs.clear();
  g->kf_points.clear();
}

void mg_add_observation(void* h, int64_t pid, int64_t kf, int32_t feat) {
  auto* g = static_cast<MapGraph*>(h);
  auto& v = g->obs[pid];
  for (auto& o : v) {
    if (o.kf == kf) {
      o.feat = feat;
      return;
    }
  }
  v.push_back({kf, feat});
  g->kf_points[kf].insert(pid);
}

// Returns the feat index that was removed, or -1.
int32_t mg_erase_observation(void* h, int64_t pid, int64_t kf) {
  auto* g = static_cast<MapGraph*>(h);
  auto* v = g->find(pid);
  if (!v) return -1;
  for (size_t i = 0; i < v->size(); ++i) {
    if ((*v)[i].kf == kf) {
      int32_t feat = (*v)[i].feat;
      (*v)[i] = v->back();
      v->pop_back();
      auto it = g->kf_points.find(kf);
      if (it != g->kf_points.end()) it->second.erase(pid);
      return feat;
    }
  }
  return -1;
}

void mg_erase_point(void* h, int64_t pid) {
  auto* g = static_cast<MapGraph*>(h);
  auto* v = g->find(pid);
  if (!v) return;
  for (auto& o : *v) {
    auto it = g->kf_points.find(o.kf);
    if (it != g->kf_points.end()) it->second.erase(pid);
  }
  g->obs.erase(pid);
}

int32_t mg_n_observations(void* h, int64_t pid) {
  auto* v = static_cast<MapGraph*>(h)->find(pid);
  return v ? static_cast<int32_t>(v->size()) : 0;
}

// Write up to max_out (kf, feat) pairs for pid; returns count.
int32_t mg_observations(void* h, int64_t pid, int64_t* out_kf, int32_t* out_feat,
                        int32_t max_out) {
  auto* v = static_cast<MapGraph*>(h)->find(pid);
  if (!v) return 0;
  int32_t n = std::min<int32_t>(v->size(), max_out);
  for (int32_t i = 0; i < n; ++i) {
    out_kf[i] = (*v)[i].kf;
    out_feat[i] = (*v)[i].feat;
  }
  return n;
}

// Covisibility recount for one keyframe: weights[other_kf] = #shared points.
// Returns number of (other_kf, weight) pairs written (all pairs, unfiltered —
// the caller applies the >= min_weight rule and reciprocal updates).
int32_t mg_covisibility(void* h, int64_t kf, int64_t* out_kf, int32_t* out_w,
                        int32_t max_out) {
  auto* g = static_cast<MapGraph*>(h);
  auto it = g->kf_points.find(kf);
  if (it == g->kf_points.end()) return 0;
  std::unordered_map<int64_t, int32_t> counter;
  counter.reserve(256);
  for (int64_t pid : it->second) {
    auto* v = g->find(pid);
    if (!v) continue;
    for (auto& o : *v) {
      if (o.kf != kf) ++counter[o.kf];
    }
  }
  int32_t n = 0;
  for (auto& kv : counter) {
    if (n >= max_out) break;
    out_kf[n] = kv.first;
    out_w[n] = kv.second;
    ++n;
  }
  return n;
}

// Union of points observed by the given keyframes; returns count written.
int32_t mg_points_seen_by(void* h, const int64_t* kfs, int32_t n_kf,
                          int64_t* out, int32_t max_out) {
  auto* g = static_cast<MapGraph*>(h);
  std::unordered_set<int64_t> acc;
  for (int32_t i = 0; i < n_kf; ++i) {
    auto it = g->kf_points.find(kfs[i]);
    if (it == g->kf_points.end()) continue;
    acc.insert(it->second.begin(), it->second.end());
  }
  int32_t n = 0;
  for (int64_t pid : acc) {
    if (n >= max_out) break;
    out[n++] = pid;
  }
  return n;
}

// Points of one keyframe.
int32_t mg_kf_points(void* h, int64_t kf, int64_t* out, int32_t max_out) {
  auto* g = static_cast<MapGraph*>(h);
  auto it = g->kf_points.find(kf);
  if (it == g->kf_points.end()) return 0;
  int32_t n = 0;
  for (int64_t pid : it->second) {
    if (n >= max_out) break;
    out[n++] = pid;
  }
  return n;
}

// Observer-count histogram support for keyframe culling: for each of the
// kf's points, count observers (excluding kf) whose feature octave is
// "as good" — octave comparison happens in Python; here we just export the
// raw observer lists in one call to avoid per-point FFI round trips.
// out layout: for point i, segment [seg_off[i], seg_off[i+1]) of (kf, feat).
int32_t mg_export_point_observers(void* h, const int64_t* pids, int32_t n_pids,
                                  int64_t* out_kf, int32_t* out_feat,
                                  int32_t* seg_off, int32_t max_total) {
  auto* g = static_cast<MapGraph*>(h);
  int32_t total = 0;
  for (int32_t i = 0; i < n_pids; ++i) {
    seg_off[i] = total;
    auto* v = g->find(pids[i]);
    if (v) {
      for (auto& o : *v) {
        if (total >= max_total) break;
        out_kf[total] = o.kf;
        out_feat[total] = o.feat;
        ++total;
      }
    }
  }
  seg_off[n_pids] = total;
  return total;
}

}  // extern "C"
