// HNSW approximate-nearest-neighbor index over EXTERNAL vector storage.
//
// Role parity: Vespa's per-tensor-field in-memory HNSW (the reference
// delegates ANN to Vespa content nodes; schema knobs max-links-per-node (M)
// and neighbors-to-explore-at-insert (efConstruction),
// structured_vespa_schema.py:145-146). This is a fresh implementation of
// the standard HNSW algorithm (Malkov & Yashunin 2016).
//
// ABI v2 — single-copy vector storage. The index owns ONLY the graph
// (links, levels, tombstones, norm cache); the vectors live in the caller's
// contiguous buffer (the Python tensor store, engine/store.py) and every
// entry point takes the base pointer. Cell types: float32 and bfloat16
// (Vespa's tensor cell-type option — bfloat16 halves vector memory,
// structured_vespa_schema.py cell type / marqo vectorNumericType).
// Callers hold the shard lock for every call, so the base pointer is
// stable for the duration of each call even though the Python store
// reallocates on growth between calls.
//
// Features:
//   - metrics: prenormalized-angular (1-dot), euclidean (L2^2 internally),
//     dotproduct (-dot), angular (1-cos with a per-node norm cache — raw
//     vectors stay raw in the shared store)
//   - filtered search: optional caller-provided bitset evaluated during
//     graph traversal (post-filtering with ef widening happens in Python)
//   - tombstone deletes with live-count tracking
//   - save/load of the GRAPH ONLY to a flat binary blob (vectors are
//     snapshotted separately by the Python store)
// C ABI at the bottom; Python binds via ctypes (engine/native.py).

#include <algorithm>
#include <atomic>
#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <memory>
#include <mutex>
#include <queue>
#include <random>
#include <thread>
#include <unordered_set>
#include <vector>

namespace {

constexpr int32_t kAbiVersion = 2;
constexpr int32_t kBlobMagic = -2;  // v2 graph-only blob marker

enum Metric : int32_t {
  METRIC_PRENORM_ANGULAR = 0,  // distance = 1 - dot
  METRIC_EUCLIDEAN = 1,        // distance = squared L2 (monotone in L2)
  METRIC_DOTPRODUCT = 2,       // distance = -dot
  METRIC_ANGULAR = 3,          // distance = 1 - cos (norm cache)
};

enum CellType : int32_t {
  CELL_F32 = 0,
  CELL_BF16 = 1,  // uint16 = top half of the fp32 bit pattern
};

inline float bf16_to_f32(uint16_t x) {
  uint32_t u = uint32_t(x) << 16;
  float f;
  std::memcpy(&f, &u, 4);
  return f;
}

// fp32-query vs cell-row kernels; -O3 -march=native auto-vectorizes the
// decode+accumulate (AVX-512 on this fleet).
template <typename Cell>
inline float load_cell(Cell x);
template <>
inline float load_cell(float x) { return x; }
template <>
inline float load_cell(uint16_t x) { return bf16_to_f32(x); }

template <typename Cell>
float dot_q(const float* q, const Cell* v, int n) {
  float acc = 0.f;
  for (int i = 0; i < n; ++i) acc += q[i] * load_cell(v[i]);
  return acc;
}

template <typename Cell>
float l2sq_q(const float* q, const Cell* v, int n) {
  float acc = 0.f;
  for (int i = 0; i < n; ++i) {
    float d = q[i] - load_cell(v[i]);
    acc += d * d;
  }
  return acc;
}

struct SearchResult {
  int32_t id;
  float dist;
};

// Epoch-stamped visited tracker, pooled per thread (hnswlib's
// VisitedListPool idea): marking a node visited is one array store and one
// compare instead of an unordered_set hash+probe+possible rehash. The pool
// is shared across index instances — a fresh epoch per search_layer call
// makes earlier searches' stamps (same index or another) unreadable.
struct VisitedPool {
  std::vector<uint32_t> stamp;
  uint32_t epoch = 0;

  uint32_t begin_epoch(size_t capacity) {
    if (stamp.size() < capacity) stamp.resize(capacity, 0);
    if (++epoch == 0) {  // uint32 wrap: clear once every 4B searches
      std::fill(stamp.begin(), stamp.end(), 0);
      epoch = 1;
    }
    return epoch;
  }
};

inline VisitedPool& visited_pool() {
  thread_local VisitedPool pool;
  return pool;
}

class HnswIndex {
 public:
  HnswIndex(int dim, int M, int ef_construction, int metric, int cell_type,
            uint64_t seed)
      : dim_(dim),
        M_(std::max(2, M)),
        M0_(2 * std::max(2, M)),
        ef_construction_(std::max(ef_construction, M)),
        metric_(metric),
        cell_type_(cell_type),
        level_mult_(1.0 / std::log(double(std::max(2, M)))),
        rng_(seed) {}

  int dim() const { return dim_; }
  int32_t size() const { return int32_t(live_count_); }
  int32_t capacity() const { return int32_t(levels_.size()); }

  // --- external vector access (base_ set at the top of each public op) ---

  const float* row_f32(int32_t id) const {
    return static_cast<const float*>(base_) + size_t(id) * dim_;
  }
  const uint16_t* row_bf16(int32_t id) const {
    return static_cast<const uint16_t*>(base_) + size_t(id) * dim_;
  }

  // Decode one row into a caller-provided fp32 buffer (query-side decode:
  // node-as-query during build, and node-node distances).
  void decode_row(int32_t id, float* out) const {
    if (cell_type_ == CELL_F32) {
      std::memcpy(out, row_f32(id), size_t(dim_) * 4);
    } else {
      const uint16_t* v = row_bf16(id);
      for (int i = 0; i < dim_; ++i) out[i] = bf16_to_f32(v[i]);
    }
  }

  // Pull a row toward the cache ahead of its distance computation. At
  // dim=768 a row is 3 KiB fp32 / 1.5 KiB bf16 — DRAM latency on the
  // first lines dominates the graph walk at 1M+ vectors, and the access
  // pattern (graph neighbors) defeats the hardware prefetcher.
  void prefetch_row(int32_t id) const {
    const size_t row_bytes =
        size_t(dim_) * (cell_type_ == CELL_F32 ? 4 : 2);
    const char* p = static_cast<const char*>(base_) + size_t(id) * row_bytes;
    for (size_t off = 0; off < row_bytes; off += 64) {
      __builtin_prefetch(p + off, 0 /*read*/, 2);
    }
  }

  float row_norm(int32_t id) const {
    float acc = (cell_type_ == CELL_F32)
                    ? dot_q(row_f32(id), row_f32(id), dim_)
                    : [&] {
                        float a = 0.f;
                        const uint16_t* v = row_bf16(id);
                        for (int i = 0; i < dim_; ++i) {
                          float f = bf16_to_f32(v[i]);
                          a += f * f;
                        }
                        return a;
                      }();
    return std::sqrt(std::max(acc, 0.f));
  }

  // Distance from an fp32 query to a stored row. qnorm is only read for
  // the angular metric (callers pass 1.0 otherwise).
  float dist_q(const float* q, float qnorm, int32_t id) const {
    switch (metric_) {
      case METRIC_EUCLIDEAN:
        return cell_type_ == CELL_F32 ? l2sq_q(q, row_f32(id), dim_)
                                      : l2sq_q(q, row_bf16(id), dim_);
      case METRIC_DOTPRODUCT:
        return -(cell_type_ == CELL_F32 ? dot_q(q, row_f32(id), dim_)
                                        : dot_q(q, row_bf16(id), dim_));
      case METRIC_ANGULAR: {
        float dot = cell_type_ == CELL_F32 ? dot_q(q, row_f32(id), dim_)
                                           : dot_q(q, row_bf16(id), dim_);
        float denom = std::max(qnorm * norms_[id], 1e-12f);
        float cos = dot / denom;
        return 1.f - std::max(-1.f, std::min(1.f, cos));
      }
      default: {  // prenormalized-angular
        float dot = cell_type_ == CELL_F32 ? dot_q(q, row_f32(id), dim_)
                                           : dot_q(q, row_bf16(id), dim_);
        return 1.f - dot;
      }
    }
  }

  // Node-node distance (neighbor selection / shrink): decode `a` into a
  // thread-local scratch, then reuse the query kernel. These are O(M^2)
  // per insert vs O(ef·degree) query distances — the decode is off the
  // hot path.
  float dist_nn(int32_t a, int32_t b) const {
    if (cell_type_ == CELL_F32 && metric_ != METRIC_ANGULAR) {
      return dist_q(row_f32(a), 1.f, b);
    }
    thread_local std::vector<float> scratch;
    scratch.resize(dim_);
    decode_row(a, scratch.data());
    return dist_q(scratch.data(), metric_ == METRIC_ANGULAR ? norms_[a] : 1.f,
                  b);
  }

  // Link every un-linked node [capacity, n_total) into the graph, reading
  // vectors from `base`. Returns the first new id (ids are contiguous —
  // they ARE the caller's row indices). Parallel across n_threads with a
  // per-node lock pool (hnswlib-style; Vespa builds its HNSW on multiple
  // feed threads the same way). NOT safe against concurrent search on the
  // same index — callers (engine/store.py) hold the shard lock.
  int32_t link(const void* base, int32_t n_total, int n_threads) {
    base_ = base;
    int32_t first = capacity();
    int32_t n_new = n_total - first;
    if (n_new <= 0) return first;
    levels_.reserve(n_total);
    links_.reserve(n_total);
    deleted_.reserve(n_total);
    // phase 1: allocate node storage serially (stable during phase 2)
    for (int32_t i = first; i < n_total; ++i) alloc_node(i);

    int32_t start = first;
    if (entry_point_ < 0) {  // seed the graph serially so workers can route
      link_node(first, /*locked=*/false);
      start = first + 1;
    }
    n_threads = std::max(1, n_threads);
    if (n_threads == 1 || n_total - start < 2) {
      for (int32_t i = start; i < n_total; ++i) link_node(i, false);
      return first;
    }
    std::atomic<int32_t> next(start);
    auto worker = [&]() {
      for (int32_t i; (i = next.fetch_add(1)) < n_total;) {
        link_node(i, /*locked=*/true);
      }
    };
    std::vector<std::thread> threads;
    threads.reserve(n_threads);
    for (int t = 0; t < n_threads; ++t) threads.emplace_back(worker);
    for (auto& th : threads) th.join();
    return first;
  }

  void remove(int32_t id) {
    if (id < 0 || id >= capacity() || deleted_[id]) return;
    deleted_[id] = 1;
    live_count_--;
  }

  // k-NN search. filter: optional byte mask over internal ids (1 = allowed).
  int search(const void* base, const float* q, int k, int ef,
             const uint8_t* filter, int32_t* out_ids, float* out_dists) {
    base_ = base;
    if (entry_point_ < 0 || live_count_ == 0) return 0;
    float qnorm = 1.f;
    if (metric_ == METRIC_ANGULAR) {
      qnorm = std::max(std::sqrt(dot_q(q, q, dim_)), 1e-12f);
    }
    ef = std::max(ef, k);
    int32_t cur = entry_point_;
    for (int lc = max_level_; lc > 0; --lc) {
      cur = greedy_closest(q, qnorm, cur, lc);
    }
    auto candidates = search_layer(q, qnorm, cur, ef, 0, filter);
    int n = std::min<int>(k, candidates.size());
    for (int i = 0; i < n; ++i) {
      out_ids[i] = candidates[i].id;
      out_dists[i] = candidates[i].dist;
    }
    return n;
  }

  // --- serialization (flat graph-only blob, format v2) ---
  std::vector<uint8_t> save() const {
    std::vector<uint8_t> out;
    auto push = [&out](const void* p, size_t n) {
      const uint8_t* b = static_cast<const uint8_t*>(p);
      out.insert(out.end(), b, b + n);
    };
    int32_t n = capacity();
    push(&kBlobMagic, 4); push(&kAbiVersion, 4);
    push(&dim_, 4); push(&M_, 4); push(&ef_construction_, 4);
    push(&metric_, 4); push(&cell_type_, 4); push(&n, 4);
    push(&entry_point_, 4); push(&max_level_, 4);
    push(deleted_.data(), deleted_.size());
    push(levels_.data(), levels_.size() * 4);
    if (metric_ == METRIC_ANGULAR) push(norms_.data(), norms_.size() * 4);
    for (int32_t i = 0; i < n; ++i) {
      int32_t nl = int32_t(links_[i].size());
      push(&nl, 4);
      for (auto& lvl : links_[i]) {
        int32_t cnt = int32_t(lvl.size());
        push(&cnt, 4);
        push(lvl.data(), lvl.size() * 4);
      }
    }
    return out;
  }

  // Returns nullptr on malformed/truncated/legacy-format input: every read
  // is bounds-checked against len and header values are sanity-checked, so
  // a corrupt or pre-v2 snapshot blob degrades to a Python-side lazy
  // rebuild instead of an OOB read or a bogus multi-GB allocation.
  static HnswIndex* load(const uint8_t* data, size_t len) {
    size_t off = 0;
    bool ok = true;
    auto pull = [&](void* p, size_t n) {
      if (!ok || n > len - off) { ok = false; return; }
      std::memcpy(p, data + off, n);
      off += n;
    };
    int32_t magic, abi, dim, M, efc, metric, cell, n, ep, ml;
    pull(&magic, 4); pull(&abi, 4);
    if (!ok || magic != kBlobMagic || abi != kAbiVersion) return nullptr;
    pull(&dim, 4); pull(&M, 4); pull(&efc, 4); pull(&metric, 4);
    pull(&cell, 4); pull(&n, 4); pull(&ep, 4); pull(&ml, 4);
    if (!ok || dim <= 0 || dim > (1 << 20) || M <= 0 || M > (1 << 16) ||
        efc < 0 || metric < 0 || metric > 3 || cell < 0 || cell > 1 || n < 0)
      return nullptr;
    // deleted + levels alone need n*5 bytes — reject before allocating
    if (size_t(n) * 5 > len - off) return nullptr;
    if (n > 0 && (ep < 0 || ep >= n)) return nullptr;
    std::unique_ptr<HnswIndex> idx(
        new HnswIndex(dim, M, efc, metric, cell, 42));
    idx->deleted_.resize(n);
    pull(idx->deleted_.data(), n);
    idx->levels_.resize(n);
    pull(idx->levels_.data(), size_t(n) * 4);
    if (metric == METRIC_ANGULAR) {
      if (size_t(n) * 4 > len - off) return nullptr;
      idx->norms_.resize(n);
      pull(idx->norms_.data(), size_t(n) * 4);
    }
    if (!ok) return nullptr;
    idx->links_.resize(n);
    for (int32_t i = 0; i < n; ++i) {
      int32_t nl = 0;
      pull(&nl, 4);
      if (!ok || nl < 0 || size_t(nl) * 4 > len - off) return nullptr;
      idx->links_[i].resize(nl);
      for (int32_t l = 0; l < nl; ++l) {
        int32_t cnt = 0;
        pull(&cnt, 4);
        if (!ok || cnt < 0 || size_t(cnt) * 4 > len - off) return nullptr;
        idx->links_[i][l].resize(cnt);
        pull(idx->links_[i][l].data(), size_t(cnt) * 4);
        if (!ok) return nullptr;
        for (int32_t nb : idx->links_[i][l])
          if (nb < 0 || nb >= n) return nullptr;
      }
    }
    idx->entry_point_ = ep;
    idx->max_level_ = ml;
    idx->live_count_ = 0;
    for (int32_t i = 0; i < n; ++i)
      if (!idx->deleted_[i]) idx->live_count_++;
    return idx.release();
  }

 private:
  int random_level() {
    std::uniform_real_distribution<double> dist(0.0, 1.0);
    double r = dist(rng_);
    r = std::max(r, 1e-12);
    return int(-std::log(r) * level_mult_);
  }

  // Append a node's graph storage (level, empty link lists, norm cache).
  // Serial-only: runs before any parallel linking so readers never see
  // reallocation.
  void alloc_node(int32_t id) {
    deleted_.push_back(0);
    int level = random_level();
    levels_.push_back(level);
    links_.emplace_back();
    links_.back().resize(level + 1);
    if (metric_ == METRIC_ANGULAR) norms_.push_back(row_norm(id));
    live_count_++;
  }

  std::mutex& node_lock(int32_t id) const {
    return link_locks_[size_t(id) & (kLockPool - 1)];
  }

  // Neighbor list at one level. Locked mode (parallel build) snapshots it
  // under the node lock into ``buf``; unlocked mode returns a direct
  // pointer — no copy, no allocation (the serial path's perf depends on
  // this: copying per visited node measured a 2x build-rate regression).
  const std::vector<int32_t>* node_links(int32_t id, int level, bool locked,
                                         std::vector<int32_t>& buf) const {
    if (level >= int(links_[id].size())) return nullptr;
    if (!locked) return &links_[id][level];
    std::lock_guard<std::mutex> g(node_lock(id));
    buf = links_[id][level];
    return &buf;
  }

  // Wire a pre-allocated node into the graph. ``locked`` selects the
  // thread-safe path used by parallel link workers.
  void link_node(int32_t id, bool locked) {
    int level = levels_[id];
    int32_t cur;
    int top;
    {
      std::unique_lock<std::mutex> g(entry_mutex_, std::defer_lock);
      if (locked) g.lock();
      if (entry_point_ < 0) {
        entry_point_ = id;
        max_level_ = level;
        return;
      }
      cur = entry_point_;
      top = max_level_;
    }

    // decode this node once; all distances below are fp32-query vs row
    thread_local std::vector<float> qbuf;
    qbuf.resize(dim_);
    decode_row(id, qbuf.data());
    const float* q = qbuf.data();
    float qnorm = metric_ == METRIC_ANGULAR ? norms_[id] : 1.f;

    for (int lc = top; lc > level; --lc) {
      cur = greedy_closest(q, qnorm, cur, lc, locked);
    }
    for (int lc = std::min(level, top); lc >= 0; --lc) {
      auto candidates = search_layer(q, qnorm, cur, ef_construction_, lc,
                                     nullptr, locked, id);
      int max_links = (lc == 0) ? M0_ : M_;
      auto selected = select_neighbors(candidates, M_, /*backfill=*/true);
      {
        std::unique_lock<std::mutex> g(node_lock(id), std::defer_lock);
        if (locked) g.lock();
        auto& my_links = links_[id][lc];
        for (auto& sr : selected) my_links.push_back(sr.id);
      }
      for (auto& sr : selected) {
        std::unique_lock<std::mutex> g(node_lock(sr.id), std::defer_lock);
        if (locked) g.lock();
        if (lc >= int(links_[sr.id].size())) continue;  // defensive
        auto& their = links_[sr.id][lc];
        their.push_back(id);
        if (int(their.size()) > max_links) {
          shrink_links(sr.id, lc, max_links);
        }
      }
      if (!candidates.empty()) cur = candidates.front().id;
    }
    if (level > top) {
      std::unique_lock<std::mutex> g(entry_mutex_, std::defer_lock);
      if (locked) g.lock();
      if (level > max_level_) {
        max_level_ = level;
        entry_point_ = id;
      }
    }
  }

  int32_t greedy_closest(const float* q, float qnorm, int32_t start,
                         int level, bool locked = false) const {
    int32_t cur = start;
    float cur_dist = dist_q(q, qnorm, cur);
    bool improved = true;
    std::vector<int32_t> buf;
    while (improved) {
      improved = false;
      const std::vector<int32_t>* nbs = node_links(cur, level, locked, buf);
      if (nbs == nullptr) break;
      for (int32_t nb : *nbs) {
        float d = dist_q(q, qnorm, nb);
        if (d < cur_dist) {
          cur_dist = d;
          cur = nb;
          improved = true;
        }
      }
    }
    return cur;
  }

  // Best-first search at one level; returns up to ef results sorted by
  // ascending distance. ``filter`` constrains RESULTS only — traversal
  // still routes through filtered-out nodes to keep the graph connected.
  // ``locked`` snapshots link lists under node locks (parallel build);
  // ``exclude`` drops a node from the results (a batch node must not pick
  // itself as neighbor once a concurrent insert has linked to it).
  std::vector<SearchResult> search_layer(const float* q, float qnorm,
                                         int32_t entry, int ef, int level,
                                         const uint8_t* filter,
                                         bool locked = false,
                                         int32_t exclude = -1) const {
    // max-heap of results (worst on top), min-heap of candidates
    auto worse = [](const SearchResult& a, const SearchResult& b) {
      return a.dist < b.dist;
    };
    auto better = [](const SearchResult& a, const SearchResult& b) {
      return a.dist > b.dist;
    };
    std::priority_queue<SearchResult, std::vector<SearchResult>,
                        decltype(worse)> results(worse);
    std::priority_queue<SearchResult, std::vector<SearchResult>,
                        decltype(better)> candidates(better);
    VisitedPool& vp = visited_pool();
    const uint32_t ep = vp.begin_epoch(levels_.size());
    uint32_t* stamp = vp.stamp.data();

    float d0 = dist_q(q, qnorm, entry);
    candidates.push({entry, d0});
    stamp[entry] = ep;
    if (entry != exclude && allowed(entry, filter)) results.push({entry, d0});

    std::vector<int32_t> buf;
    std::vector<int32_t> fresh;  // unvisited neighbors of the current node
    while (!candidates.empty()) {
      SearchResult c = candidates.top();
      candidates.pop();
      if (int(results.size()) >= ef && !results.empty() &&
          c.dist > results.top().dist) {
        break;
      }
      const std::vector<int32_t>* nbs = node_links(c.id, level, locked, buf);
      if (nbs == nullptr) continue;
      // Stamp first, then compute with a one-ahead row prefetch: the next
      // neighbor's vector streams in from DRAM while this one's distance
      // runs on the vector units.
      fresh.clear();
      for (int32_t nb : *nbs) {
        if (stamp[nb] == ep) continue;
        stamp[nb] = ep;
        fresh.push_back(nb);
      }
      if (!fresh.empty()) prefetch_row(fresh[0]);
      for (size_t i = 0; i < fresh.size(); ++i) {
        if (i + 1 < fresh.size()) prefetch_row(fresh[i + 1]);
        int32_t nb = fresh[i];
        float d = dist_q(q, qnorm, nb);
        if (int(results.size()) < ef ||
            (!results.empty() && d < results.top().dist)) {
          candidates.push({nb, d});
          if (nb != exclude && allowed(nb, filter)) {
            results.push({nb, d});
            if (int(results.size()) > ef) results.pop();
          }
        }
      }
    }
    std::vector<SearchResult> out(results.size());
    for (int i = int(results.size()) - 1; i >= 0; --i) {
      out[i] = results.top();
      results.pop();
    }
    return out;
  }

  bool allowed(int32_t id, const uint8_t* filter) const {
    if (deleted_[id]) return false;
    return filter == nullptr || filter[id] != 0;
  }

  // Neighbor selection with the distance-diversity heuristic
  // (Malkov & Yashunin Alg. 4). ``backfill`` re-adds the closest pruned
  // candidates (keepPrunedConnections) — used for a new node's own links,
  // NOT when shrinking an existing node's list (backfilling there crowds
  // out the diverse long-range links and hurts recall at scale).
  std::vector<SearchResult> select_neighbors(
      const std::vector<SearchResult>& candidates, int M,
      bool backfill) const {
    std::vector<SearchResult> selected;
    for (const auto& c : candidates) {
      if (int(selected.size()) >= M) break;
      bool keep = true;
      for (const auto& s : selected) {
        if (dist_nn(c.id, s.id) < c.dist) {
          keep = false;
          break;
        }
      }
      if (keep) selected.push_back(c);
    }
    if (backfill && int(selected.size()) < M) {
      for (const auto& c : candidates) {
        if (int(selected.size()) >= M) break;
        bool present = false;
        for (const auto& s : selected)
          if (s.id == c.id) { present = true; break; }
        if (!present) selected.push_back(c);
      }
    }
    return selected;
  }

  void shrink_links(int32_t id, int level, int max_links) {
    auto& lst = links_[id][level];
    std::vector<SearchResult> cands;
    cands.reserve(lst.size());
    for (int32_t nb : lst) cands.push_back({nb, dist_nn(id, nb)});
    std::sort(cands.begin(), cands.end(),
              [](const SearchResult& a, const SearchResult& b) {
                return a.dist < b.dist;
              });
    auto selected = select_neighbors(cands, max_links, /*backfill=*/false);
    lst.clear();
    for (auto& s : selected) lst.push_back(s.id);
  }

  int dim_;
  int M_;
  int M0_;
  int ef_construction_;
  int32_t metric_;
  int32_t cell_type_;
  double level_mult_;
  std::mt19937_64 rng_;

  const void* base_ = nullptr;  // caller's vector buffer, set per call
  std::vector<uint8_t> deleted_;
  std::vector<int32_t> levels_;
  std::vector<float> norms_;  // angular metric only
  std::vector<std::vector<std::vector<int32_t>>> links_;
  int32_t entry_point_ = -1;
  int max_level_ = 0;
  size_t live_count_ = 0;

  static constexpr size_t kLockPool = 1024;  // per-node lock pool (by id)
  mutable std::unique_ptr<std::mutex[]> link_locks_{new std::mutex[kLockPool]};
  mutable std::mutex entry_mutex_;
};

}  // namespace

extern "C" {

int32_t engine_abi_version() { return kAbiVersion; }

void* hnsw_create(int dim, int M, int ef_construction, int metric,
                  int cell_type, uint64_t seed) {
  return new HnswIndex(dim, M, ef_construction, metric, cell_type, seed);
}

void hnsw_free(void* handle) { delete static_cast<HnswIndex*>(handle); }

int32_t hnsw_link(void* handle, const void* base, int32_t n_total,
                  int32_t n_threads) {
  return static_cast<HnswIndex*>(handle)->link(base, n_total, n_threads);
}

void hnsw_remove(void* handle, int32_t id) {
  static_cast<HnswIndex*>(handle)->remove(id);
}

int32_t hnsw_size(void* handle) {
  return static_cast<HnswIndex*>(handle)->size();
}

int32_t hnsw_capacity(void* handle) {
  return static_cast<HnswIndex*>(handle)->capacity();
}

int hnsw_search(void* handle, const void* base, const float* query, int k,
                int ef, const uint8_t* filter, int32_t* out_ids,
                float* out_dists) {
  return static_cast<HnswIndex*>(handle)->search(base, query, k, ef, filter,
                                                 out_ids, out_dists);
}

int64_t hnsw_save_size(void* handle) {
  return int64_t(static_cast<HnswIndex*>(handle)->save().size());
}

int64_t hnsw_save(void* handle, uint8_t* out, int64_t capacity) {
  auto blob = static_cast<HnswIndex*>(handle)->save();
  if (int64_t(blob.size()) > capacity) return -1;
  std::memcpy(out, blob.data(), blob.size());
  return int64_t(blob.size());
}

void* hnsw_load(const uint8_t* data, int64_t len) {
  return HnswIndex::load(data, size_t(len));
}

}  // extern "C"
