// HNSW graph index (inner-product similarity), from scratch.
//
// Fills the one reference index family with no TPU-native analogue
// (reference: src/lightretriever/retriever/faiss_search.py:385-476
// HNSWFaissSearch / HNSWSQFaissSearch over faiss.IndexHNSWFlat): a
// small-world graph walk is pointer-chasing — exactly the workload that
// belongs on the host CPU (Faiss runs it there too), while the MXU engines
// (knn.py flat/approx) cover the batched-throughput regime. This file is a
// clean-room implementation of the HNSW algorithm (Malkov & Yashunin 2016):
// geometric level assignment, greedy descent through upper layers, ef-bounded
// best-first search at the target layer, and the "keep closest unless
// dominated" neighbor-selection heuristic.
//
// Storage is fp32 ([n, dim]) or int8 scalar-quantized with per-dim affine
// dequantization (the HNSWSQ variant; codes decoded inside the comparator).
// Similarity is raw inner product (higher = better) — internally negated so
// the textbook min-heap formulation applies unchanged.
//
// C ABI only (ctypes-loaded; no pybind11 in this image).

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <new>
#include <stdexcept>
#include <queue>
#include <random>
#include <vector>

namespace {

struct HNSW {
  int32_t dim = 0;
  int32_t M = 16;        // upper-layer degree; layer 0 uses 2*M
  int32_t ef_construction = 200;
  int32_t n = 0;
  int32_t max_level = -1;
  int32_t entry = -1;
  bool sq = false;

  std::vector<float> data;       // fp32 storage (if !sq)
  std::vector<int8_t> codes;     // int8 storage (if sq)
  std::vector<float> scale, offset;  // per-dim dequant: x = code*scale+offset

  std::vector<int32_t> levels;       // level of each node
  // links[l] is a flat [n_at_build, width(l)] table, -1 padded. Upper layers
  // only allocate rows for nodes that reach them (row index = node id; nodes
  // below the layer keep no row — see row()).
  std::vector<std::vector<int32_t>> links;
  std::vector<std::vector<int32_t>> rows;  // node -> row in links[l], or -1

  std::mt19937_64 rng;
  double level_mult = 0.0;

  int width(int l) const { return l == 0 ? 2 * M : M; }

  int32_t* row(int l, int32_t node) {
    int32_t r = rows[l][node];
    return r < 0 ? nullptr : links[l].data() + size_t(r) * width(l);
  }

  float dot(const float* q, int32_t id) const {
    float s = 0.f;
    if (!sq) {
      const float* v = data.data() + size_t(id) * dim;
      for (int i = 0; i < dim; ++i) s += q[i] * v[i];
    } else {
      const int8_t* c = codes.data() + size_t(id) * dim;
      for (int i = 0; i < dim; ++i)
        s += q[i] * (float(c[i]) * scale[i] + offset[i]);
    }
    return s;
  }

  // distance = -ip so that smaller is better everywhere below
  float dist(const float* q, int32_t id) const { return -dot(q, id); }
};

using Cand = std::pair<float, int32_t>;  // (dist, id)

// Best-first search at one layer: returns up to ef closest candidates.
void search_layer(HNSW& h, const float* q, int32_t ep, float ep_d, int layer,
                  int ef, std::vector<Cand>& out,
                  std::vector<uint32_t>& visited, uint32_t stamp) {
  std::priority_queue<Cand, std::vector<Cand>, std::greater<Cand>> frontier;
  std::priority_queue<Cand> best;  // max-heap on dist: top = worst kept
  frontier.emplace(ep_d, ep);
  best.emplace(ep_d, ep);
  visited[ep] = stamp;
  while (!frontier.empty()) {
    auto [d, u] = frontier.top();
    if (d > best.top().first && int(best.size()) >= ef) break;
    frontier.pop();
    const int32_t* nb = h.row(layer, u);
    if (!nb) continue;
    int w = h.width(layer);
    for (int i = 0; i < w && nb[i] >= 0; ++i) {
      int32_t v = nb[i];
      if (visited[v] == stamp) continue;
      visited[v] = stamp;
      float dv = h.dist(q, v);
      if (int(best.size()) < ef || dv < best.top().first) {
        frontier.emplace(dv, v);
        best.emplace(dv, v);
        if (int(best.size()) > ef) best.pop();
      }
    }
  }
  out.clear();
  out.resize(best.size());
  for (size_t i = best.size(); i-- > 0;) {  // ascending distance
    out[i] = best.top();
    best.pop();
  }
}

// Neighbor-selection heuristic: keep a candidate only if it is closer to the
// query than to every already-kept neighbor (diversity rule; prevents
// clustered edges and keeps the graph navigable).
void select_neighbors(HNSW& h, const std::vector<Cand>& cands, int m,
                      std::vector<int32_t>& out) {
  out.clear();
  float tmp[4096];  // decoded candidate row (SQ case), once per candidate
  for (const auto& [d, c] : cands) {
    if (int(out.size()) >= m) break;
    const float* cv;
    if (!h.sq) {
      cv = h.data.data() + size_t(c) * h.dim;
    } else {
      const int8_t* cc = h.codes.data() + size_t(c) * h.dim;
      for (int i = 0; i < h.dim; ++i)
        tmp[i] = float(cc[i]) * h.scale[i] + h.offset[i];
      cv = tmp;
    }
    bool ok = true;
    for (int32_t kept : out) {
      if (-h.dot(cv, kept) < d) { ok = false; break; }  // closer to kept than to query
    }
    if (ok) out.push_back(c);
  }
  // fall back to plain closest if the heuristic was too aggressive
  for (const auto& [d, c] : cands) {
    if (int(out.size()) >= m) break;
    if (std::find(out.begin(), out.end(), c) == out.end()) out.push_back(c);
  }
}

void connect(HNSW& h, int layer, int32_t u, const std::vector<int32_t>& nbs,
             std::vector<Cand>& scratch) {
  int w = h.width(layer);
  int32_t* ru = h.row(layer, u);
  int i = 0;
  for (; i < int(nbs.size()) && i < w; ++i) ru[i] = nbs[i];
  for (; i < w; ++i) ru[i] = -1;
  // reverse edges, shrinking overflowing rows with the same heuristic
  for (int32_t v : nbs) {
    int32_t* rv = h.row(layer, v);
    int cnt = 0;
    while (cnt < w && rv[cnt] >= 0) ++cnt;
    if (cnt < w) {
      rv[cnt] = u;
      continue;
    }
    // overflow: re-select among current neighbors + u, keyed by dist to v
    scratch.clear();
    std::vector<float> vdec;
    const float* vv;
    if (!h.sq) {
      vv = h.data.data() + size_t(v) * h.dim;
    } else {
      vdec.resize(h.dim);
      const int8_t* vc = h.codes.data() + size_t(v) * h.dim;
      for (int d = 0; d < h.dim; ++d)
        vdec[d] = float(vc[d]) * h.scale[d] + h.offset[d];
      vv = vdec.data();
    }
    for (int j = 0; j < cnt; ++j) scratch.emplace_back(h.dist(vv, rv[j]), rv[j]);
    scratch.emplace_back(h.dist(vv, u), u);
    std::sort(scratch.begin(), scratch.end());
    std::vector<int32_t> kept;
    select_neighbors(h, scratch, w, kept);
    int j = 0;
    for (; j < int(kept.size()); ++j) rv[j] = kept[j];
    for (; j < w; ++j) rv[j] = -1;
  }
}

void insert(HNSW& h, int32_t u, std::vector<uint32_t>& visited,
            uint32_t& stamp) {
  std::uniform_real_distribution<double> uni(0.0, 1.0);
  double r = uni(h.rng);
  int level = int(-std::log(std::max(r, 1e-300)) * h.level_mult);

  h.levels[u] = level;
  for (int l = 0; l <= level; ++l) {
    if (l >= int(h.links.size())) {
      h.links.emplace_back();
      h.rows.emplace_back(h.levels.size(), -1);
    }
    h.rows[l][u] = int32_t(h.links[l].size() / h.width(l));
    h.links[l].insert(h.links[l].end(), h.width(l), -1);
  }

  if (h.entry < 0) {
    h.entry = u;
    h.max_level = level;
    return;
  }

  // query vector = u's own (decoded) row
  std::vector<float> qdec;
  const float* q;
  if (!h.sq) {
    q = h.data.data() + size_t(u) * h.dim;
  } else {
    qdec.resize(h.dim);
    const int8_t* uc = h.codes.data() + size_t(u) * h.dim;
    for (int d = 0; d < h.dim; ++d)
      qdec[d] = float(uc[d]) * h.scale[d] + h.offset[d];
    q = qdec.data();
  }

  int32_t ep = h.entry;
  float ep_d = h.dist(q, ep);
  // greedy descent through layers above the insertion level
  for (int l = h.max_level; l > level; --l) {
    bool moved = true;
    while (moved) {
      moved = false;
      const int32_t* nb = h.row(l, ep);
      if (!nb) break;
      int w = h.width(l);
      for (int i = 0; i < w && nb[i] >= 0; ++i) {
        float d = h.dist(q, nb[i]);
        if (d < ep_d) { ep_d = d; ep = nb[i]; moved = true; }
      }
    }
  }

  std::vector<Cand> cands;
  std::vector<int32_t> sel;
  std::vector<Cand> scratch;
  for (int l = std::min(level, h.max_level); l >= 0; --l) {
    ++stamp;
    search_layer(h, q, ep, ep_d, l, h.ef_construction, cands, visited, stamp);
    select_neighbors(h, cands, h.width(l) < h.M ? h.width(l) : h.M, sel);
    connect(h, l, u, sel, scratch);
    if (!cands.empty()) { ep = cands[0].second; ep_d = cands[0].first; }
  }
  if (level > h.max_level) {
    h.max_level = level;
    h.entry = u;
  }
}

}  // namespace

extern "C" {

// Build a full index in one call. data: [n, dim] fp32. If sq != 0, codes are
// produced internally with per-dim (min, max) affine quantization.
void* lr_hnsw_build(const float* data, int64_t n, int32_t dim, int32_t M,
                    int32_t ef_construction, int32_t sq, uint64_t seed) {
  if (n <= 0 || dim <= 0 || dim > 4096 || M < 2) return nullptr;
  // no exception may cross the C ABI into ctypes (UB/terminate): a build
  // that exhausts memory must surface as nullptr -> Python RuntimeError
  auto* h = new (std::nothrow) HNSW();
  if (!h) return nullptr;
  try {
  h->dim = dim;
  h->M = M;
  h->ef_construction = ef_construction;
  h->sq = sq != 0;
  h->rng.seed(seed);
  h->level_mult = 1.0 / std::log(double(M));
  h->n = int32_t(n);
  h->levels.assign(n, 0);
  if (!h->sq) {
    h->data.assign(data, data + size_t(n) * dim);
  } else {
    h->scale.assign(dim, 0.f);
    h->offset.assign(dim, 0.f);
    for (int d = 0; d < dim; ++d) {
      float lo = data[d], hi = data[d];
      for (int64_t i = 1; i < n; ++i) {
        float x = data[size_t(i) * dim + d];
        lo = std::min(lo, x);
        hi = std::max(hi, x);
      }
      float s = (hi - lo) / 255.f;
      if (s <= 0.f) s = 1e-12f;
      h->scale[d] = s;
      h->offset[d] = lo + 128.f * s;  // code in [-128, 127]
    }
    h->codes.resize(size_t(n) * dim);
    for (int64_t i = 0; i < n; ++i)
      for (int d = 0; d < dim; ++d) {
        float x = data[size_t(i) * dim + d];
        int c = int(std::lround((x - h->offset[d]) / h->scale[d]));
        h->codes[size_t(i) * dim + d] =
            int8_t(std::max(-128, std::min(127, c)));
      }
  }
  std::vector<uint32_t> visited(n, 0);
  uint32_t stamp = 0;
  for (int64_t i = 0; i < n; ++i) insert(*h, int32_t(i), visited, stamp);
  } catch (...) {
    delete h;
    return nullptr;
  }
  return h;
}

int64_t lr_hnsw_size(void* ptr) { return ptr ? ((HNSW*)ptr)->n : 0; }

int32_t lr_hnsw_dim(void* ptr) { return ptr ? ((HNSW*)ptr)->dim : 0; }

// Batch search: queries [nq, dim] fp32 -> out_scores/out_ids [nq, k]
// (inner-product scores, descending; -1 id padding).
void lr_hnsw_search(void* ptr, const float* queries, int64_t nq, int32_t k,
                    int32_t ef_search, float* out_scores, int64_t* out_ids) {
  auto* h = (HNSW*)ptr;
  int ef = std::max(ef_search, k);
  std::vector<uint32_t> visited(h->levels.size(), 0);
  uint32_t stamp = 0;
  std::vector<Cand> cands;
  for (int64_t qi = 0; qi < nq; ++qi) {
    const float* q = queries + size_t(qi) * h->dim;
    int32_t ep = h->entry;
    float ep_d = h->dist(q, ep);
    for (int l = h->max_level; l > 0; --l) {
      bool moved = true;
      while (moved) {
        moved = false;
        const int32_t* nb = h->row(l, ep);
        if (!nb) break;
        int w = h->width(l);
        for (int i = 0; i < w && nb[i] >= 0; ++i) {
          float d = h->dist(q, nb[i]);
          if (d < ep_d) { ep_d = d; ep = nb[i]; moved = true; }
        }
      }
    }
    ++stamp;
    search_layer(*h, q, ep, ep_d, 0, ef, cands, visited, stamp);
    for (int i = 0; i < k; ++i) {
      if (i < int(cands.size())) {
        out_scores[qi * k + i] = -cands[i].first;
        out_ids[qi * k + i] = cands[i].second;
      } else {
        out_scores[qi * k + i] = -INFINITY;
        out_ids[qi * k + i] = -1;
      }
    }
  }
}

void lr_hnsw_free(void* ptr) { delete (HNSW*)ptr; }

// ---- serialization (reference save/load parity: faiss_search.py:394-432) --
int32_t lr_hnsw_save(void* ptr, const char* path) {
  auto* h = (HNSW*)ptr;
  FILE* f = std::fopen(path, "wb");
  if (!f) return -1;
  // every fwrite is checked: a partial write (disk full) must return an
  // error, not leave a silently truncated index file
  bool ok = true;
  auto w = [&](const void* p, size_t sz, size_t cnt) {
    ok = ok && std::fwrite(p, sz, cnt, f) == cnt;
  };
  const char magic[8] = {'L', 'R', 'H', 'N', 'S', 'W', '0', '1'};
  w(magic, 1, 8);
  int32_t hdr[6] = {h->dim, h->M, h->ef_construction, h->n,
                    h->max_level, h->entry};
  w(hdr, 4, 6);
  int32_t flags = h->sq ? 1 : 0;
  w(&flags, 4, 1);
  if (h->sq) {
    w(h->scale.data(), 4, h->dim);
    w(h->offset.data(), 4, h->dim);
    w(h->codes.data(), 1, h->codes.size());
  } else {
    w(h->data.data(), 4, h->data.size());
  }
  w(h->levels.data(), 4, h->levels.size());
  int32_t n_layers = int32_t(h->links.size());
  w(&n_layers, 4, 1);
  for (int l = 0; l < n_layers; ++l) {
    int64_t sz = int64_t(h->links[l].size());
    w(&sz, 8, 1);
    w(h->links[l].data(), 4, sz);
    w(h->rows[l].data(), 4, h->rows[l].size());
  }
  if (std::fclose(f) != 0) ok = false;
  return ok ? 0 : -2;
}

void* lr_hnsw_load(const char* path) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return nullptr;
  char magic[8];
  if (std::fread(magic, 1, 8, f) != 8 ||
      std::memcmp(magic, "LRHNSW01", 8) != 0) {
    std::fclose(f);
    return nullptr;
  }
  auto* h = new (std::nothrow) HNSW();
  if (!h) { std::fclose(f); return nullptr; }
  int32_t hdr[6];
  int32_t flags, n_layers;
  bool ok = std::fread(hdr, 4, 6, f) == 6 && std::fread(&flags, 4, 1, f) == 1;
  // sanity-check header fields: a corrupt/truncated file must return
  // nullptr, not throw std::length_error across the C ABI into ctypes
  ok = ok && hdr[0] > 0 && hdr[0] <= (1 << 20)        // dim
          && hdr[1] > 1 && hdr[1] <= (1 << 16)        // M
          && hdr[3] > 0 && hdr[3] <= (1 << 30)        // n (save never writes 0)
          && hdr[4] >= 0 && hdr[4] <= 64              // max_level
          && hdr[5] >= 0 && hdr[5] < hdr[3];          // entry node
  try {
  if (ok) {
    h->dim = hdr[0]; h->M = hdr[1]; h->ef_construction = hdr[2];
    h->n = hdr[3]; h->max_level = hdr[4]; h->entry = hdr[5];
    h->sq = flags & 1;
    h->level_mult = 1.0 / std::log(double(h->M));
    if (h->sq) {
      h->scale.resize(h->dim);
      h->offset.resize(h->dim);
      h->codes.resize(size_t(h->n) * h->dim);
      ok = std::fread(h->scale.data(), 4, h->dim, f) == size_t(h->dim) &&
           std::fread(h->offset.data(), 4, h->dim, f) == size_t(h->dim) &&
           std::fread(h->codes.data(), 1, h->codes.size(), f) ==
               h->codes.size();
    } else {
      h->data.resize(size_t(h->n) * h->dim);
      ok = std::fread(h->data.data(), 4, h->data.size(), f) == h->data.size();
    }
    h->levels.resize(h->n);
    ok = ok && std::fread(h->levels.data(), 4, h->n, f) == size_t(h->n) &&
         std::fread(&n_layers, 4, 1, f) == 1;
    // search walks rows[h->max_level] down — every layer must exist
    ok = ok && n_layers > h->max_level && n_layers <= 64;
    for (int l = 0; ok && l < n_layers; ++l) {
      int64_t sz;
      ok = std::fread(&sz, 8, 1, f) == 1 && sz >= 0 &&
           sz % h->width(l) == 0 &&
           sz <= int64_t(h->n) * (2 * int64_t(h->M) + 1);
      if (!ok) break;
      h->links.emplace_back(sz);
      h->rows.emplace_back(h->n, -1);
      ok = std::fread(h->links[l].data(), 4, sz, f) == size_t(sz) &&
           std::fread(h->rows[l].data(), 4, h->n, f) == size_t(h->n);
      // validate graph contents: link ids index nodes, row offsets index
      // link rows — a header-valid but bit-flipped file must not produce
      // out-of-bounds reads/writes at search time
      if (ok) {
        for (int32_t id : h->links[l])
          if (id < -1 || id >= h->n) { ok = false; break; }
        int64_t n_rows = sz / h->width(l);
        for (int32_t r : h->rows[l])
          if (r < -1 || r >= n_rows) { ok = false; break; }
      }
    }
  }
  } catch (const std::exception&) {
    ok = false;
  }
  std::fclose(f);
  if (!ok) { delete h; return nullptr; }
  return h;
}

}  // extern "C"
