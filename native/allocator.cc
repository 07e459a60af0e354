// Native runtime core: KV page allocator + lane scheduler bookkeeping.
//
// Role parity: the C++/CUDA runtime layer the reference rents from vLLM
// (block manager + scheduler internals). The Python twins live in
// adaptive_sd_tpu/engine/{allocator,scheduler}.py; this library serves the
// hot path of continuous batching, where page-table assembly and lane scans
// run every decode step for every request.
//
// C ABI (ctypes-friendly): opaque handles + int64 returns (<0 = error).
// Thread safety: one mutex per allocator handle (the Python side calls from
// the scheduler thread and admission threads).

#include <cstdint>
#include <cstring>
#include <map>
#include <mutex>
#include <string>
#include <vector>

namespace {

struct Allocator {
  std::mutex mu;
  int64_t n_pages = 0;
  std::vector<int32_t> free_list;          // LIFO of free page ids
  std::map<std::string, std::vector<int32_t>> owned;
  int64_t peak_used = 0;
  int64_t failed_allocs = 0;

  explicit Allocator(int64_t n) : n_pages(n) {
    free_list.reserve(n);
    for (int64_t i = n - 1; i >= 0; --i) free_list.push_back(static_cast<int32_t>(i));
  }

  int64_t used() const { return n_pages - static_cast<int64_t>(free_list.size()); }
};

}  // namespace

extern "C" {

// ---------------------------------------------------------------- allocator

void* asd_alloc_create(int64_t n_pages) {
  if (n_pages <= 0) return nullptr;
  return new Allocator(n_pages);
}

void asd_alloc_destroy(void* h) { delete static_cast<Allocator*>(h); }

// Allocate `n` pages for request `rid`; writes page ids into out[0..n).
// Returns n on success, -1 on out-of-pages (no partial allocation).
int64_t asd_alloc_pages(void* h, const char* rid, int64_t n, int32_t* out) {
  auto* a = static_cast<Allocator*>(h);
  std::lock_guard<std::mutex> lock(a->mu);
  if (n < 0 || static_cast<size_t>(n) > a->free_list.size()) {
    a->failed_allocs++;
    return -1;
  }
  auto& owned = a->owned[rid];
  for (int64_t i = 0; i < n; ++i) {
    int32_t p = a->free_list.back();
    a->free_list.pop_back();
    owned.push_back(p);
    out[i] = p;
  }
  if (a->used() > a->peak_used) a->peak_used = a->used();
  return n;
}

// Grow request `rid` to at least `n_total` pages; writes the FULL page list
// into out (capacity `out_cap`). Returns the page count, -1 on OOM, -2 if
// out_cap too small.
int64_t asd_alloc_ensure(void* h, const char* rid, int64_t n_total, int32_t* out,
                         int64_t out_cap) {
  auto* a = static_cast<Allocator*>(h);
  std::lock_guard<std::mutex> lock(a->mu);
  auto& owned = a->owned[rid];
  int64_t need = n_total - static_cast<int64_t>(owned.size());
  if (need > 0) {
    if (static_cast<size_t>(need) > a->free_list.size()) {
      a->failed_allocs++;
      return -1;
    }
    for (int64_t i = 0; i < need; ++i) {
      owned.push_back(a->free_list.back());
      a->free_list.pop_back();
    }
    if (a->used() > a->peak_used) a->peak_used = a->used();
  }
  if (static_cast<int64_t>(owned.size()) > out_cap) return -2;
  std::memcpy(out, owned.data(), owned.size() * sizeof(int32_t));
  return static_cast<int64_t>(owned.size());
}

// Free pages beyond the first `keep`; returns number freed.
int64_t asd_alloc_free_from(void* h, const char* rid, int64_t keep) {
  auto* a = static_cast<Allocator*>(h);
  std::lock_guard<std::mutex> lock(a->mu);
  auto it = a->owned.find(rid);
  if (it == a->owned.end()) return 0;
  auto& owned = it->second;
  if (keep < 0) keep = 0;
  int64_t freed = 0;
  while (static_cast<int64_t>(owned.size()) > keep) {
    a->free_list.push_back(owned.back());
    owned.pop_back();
    ++freed;
  }
  return freed;
}

// Free everything owned by `rid`; returns number freed.
int64_t asd_alloc_free_request(void* h, const char* rid) {
  auto* a = static_cast<Allocator*>(h);
  std::lock_guard<std::mutex> lock(a->mu);
  auto it = a->owned.find(rid);
  if (it == a->owned.end()) return 0;
  int64_t freed = static_cast<int64_t>(it->second.size());
  for (int32_t p : it->second) a->free_list.push_back(p);
  a->owned.erase(it);
  return freed;
}

// stats out: [n_pages, free, active_requests, peak_used, failed_allocs]
void asd_alloc_stats(void* h, int64_t* out5) {
  auto* a = static_cast<Allocator*>(h);
  std::lock_guard<std::mutex> lock(a->mu);
  out5[0] = a->n_pages;
  out5[1] = static_cast<int64_t>(a->free_list.size());
  out5[2] = static_cast<int64_t>(a->owned.size());
  out5[3] = a->peak_used;
  out5[4] = a->failed_allocs;
}

// ------------------------------------------------------- lane bookkeeping
//
// Dense per-lane state for the continuous-batching scheduler: occupancy,
// positions, budgets. step_prepare() does the per-step scan that Python
// would otherwise do in a loop: collects active lanes, detects finished
// requests (budget/eos), and reports lanes needing a page-table refresh.

struct Lanes {
  std::mutex mu;
  int64_t n = 0;
  int64_t page = 0;
  std::vector<uint8_t> busy;
  std::vector<int32_t> position;     // next write position
  std::vector<int32_t> generated;    // tokens generated so far
  std::vector<int32_t> budget;       // max_new per lane
  std::vector<int32_t> next_token;
};

void* asd_lanes_create(int64_t n_lanes, int64_t page_size) {
  auto* l = new Lanes();
  l->n = n_lanes;
  l->page = page_size;
  l->busy.assign(n_lanes, 0);
  l->position.assign(n_lanes, 0);
  l->generated.assign(n_lanes, 0);
  l->budget.assign(n_lanes, 0);
  l->next_token.assign(n_lanes, 0);
  return l;
}

void asd_lanes_destroy(void* h) { delete static_cast<Lanes*>(h); }

// Claim a free lane; returns lane id or -1.
int64_t asd_lanes_admit(void* h, int32_t position, int32_t budget, int32_t next_token) {
  auto* l = static_cast<Lanes*>(h);
  std::lock_guard<std::mutex> lock(l->mu);
  for (int64_t i = 0; i < l->n; ++i) {
    if (!l->busy[i]) {
      l->busy[i] = 1;
      l->position[i] = position;
      l->generated[i] = 1;  // admission already sampled the first token
      l->budget[i] = budget;
      l->next_token[i] = next_token;
      return i;
    }
  }
  return -1;
}

void asd_lanes_release(void* h, int64_t lane) {
  auto* l = static_cast<Lanes*>(h);
  std::lock_guard<std::mutex> lock(l->mu);
  if (lane >= 0 && lane < l->n) l->busy[lane] = 0;
}

// Per-step scan. eos < 0 disables eos detection. Outputs (caller-allocated,
// capacity n_lanes): finished lane ids, active lane ids, and for active
// lanes the (token, position) to feed. needs_pages[i] = 1 if the lane
// crosses into a new page this step. Returns #active; n_finished via out.
int64_t asd_lanes_step_prepare(void* h, int64_t eos, int32_t* finished,
                               int64_t* n_finished, int32_t* active,
                               int32_t* tokens, int32_t* positions,
                               uint8_t* needs_pages) {
  auto* l = static_cast<Lanes*>(h);
  std::lock_guard<std::mutex> lock(l->mu);
  int64_t nf = 0, na = 0;
  for (int64_t i = 0; i < l->n; ++i) {
    if (!l->busy[i]) continue;
    bool done = l->generated[i] >= l->budget[i] ||
                (eos >= 0 && l->next_token[i] == static_cast<int32_t>(eos));
    if (done) {
      finished[nf++] = static_cast<int32_t>(i);
      continue;
    }
    active[na] = static_cast<int32_t>(i);
    tokens[na] = l->next_token[i];
    positions[na] = l->position[i];
    needs_pages[na] = ((l->position[i] + 1) % l->page) == 0 ? 1 : 0;
    ++na;
  }
  *n_finished = nf;
  return na;
}

// Record the sampled token for a lane after the decode step.
void asd_lanes_advance(void* h, int64_t lane, int32_t token) {
  auto* l = static_cast<Lanes*>(h);
  std::lock_guard<std::mutex> lock(l->mu);
  if (lane < 0 || lane >= l->n || !l->busy[lane]) return;
  l->next_token[lane] = token;
  l->position[lane] += 1;
  l->generated[lane] += 1;
}

}  // extern "C"
