// Consolidated per-round cluster solve: phase-1 branch-and-bound PLUS the
// union-closure escalation in ONE native call.
//
// Motivation (round-3 profile, 300k reads / 10.5k instances): the solver
// twins were already C++, but each rung paid its own Python packing --
// solve_exact_native re-sorted and re-packed bitsets per call (8.6 s of
// pure marshalling), the closure path packed AGAIN via _PerStructure and
// _pack_segenum (5 s), and the closure build/bounds ran in numpy (4 s).
// This entry takes the round's flat arrays once (uint8 matrices + gap
// column ranges straight out of stages/cluster.build_instance) and runs
//
//   phase 1: solve_bnb (bnb_solver.cpp) with the deterministic node
//            budget -- bit-equal twin of solver/exact.py;
//   on BUDGET: the union-closure enumeration -- closure build, optimistic
//            bounds, incumbent filter, canonical (optimistic, mask) sort,
//            then freddie_run_enum (segenum.cpp), the bit-equal twin of
//            solver/segenum.solve_segment_enum_closure.
//
// Dispatch gates are CONTENT-only and identical to the Python chain
// (solver/two_phase.py): Mi/cap limits decide escalation, never toolchain
// availability -- the Python twins remain the definition and transparent
// fallback, and results are bit-identical (tests/test_round_native.py).
//
// Replaces the hot path of the reference's Gurobi loop
// (py/freddie_cluster.py:347-636).

#include <algorithm>
#include <atomic>
#include <chrono>
#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <limits>
#include <unordered_set>
#include <vector>

extern "C" int solve_bnb(
    int n_reads, int n_segs,
    const uint64_t* exons, const uint64_t* corr, const double* garbage,
    const int64_t* seg_len,
    const int32_t* gap_counts, const uint64_t* gap_masks,
    const int64_t* gap_lens,
    int n_incomp, const int32_t* incomp_pairs,
    int64_t eps_scale, int64_t eps_scaled, int64_t offset,
    double deadline_s, int64_t node_budget,
    int32_t* out_assigned, int32_t* out_n_assigned,
    double* out_objective, uint64_t* out_E, int64_t* out_nodes);

int freddie_run_enum(
    int n_reads,
    const uint64_t* I_masks, const uint64_t* C_masks, const double* garbage,
    const int64_t* seg_len,
    const int32_t* gap_counts, const uint64_t* gap_masks,
    const int64_t* gap_lens,
    int n_incomp, const int32_t* incomp_pairs,
    int64_t sc, int64_t eps, int64_t off,
    const uint64_t* order, const double* order_opt, int64_t n_order,
    std::chrono::steady_clock::time_point t_end, double seed_gain,
    int32_t* out_assigned, int32_t* out_n_assigned,
    double* out_objective, uint64_t* out_E);

int freddie_run_enum_w2(
    int n_reads,
    const uint64_t* I_masks2, const uint64_t* C_masks2, const double* garbage,
    const int64_t* seg_len,
    const int32_t* gap_counts, const uint64_t* gap_masks2,
    const int64_t* gap_lens,
    int n_incomp, const int32_t* incomp_pairs,
    int64_t sc, int64_t eps, int64_t off,
    const uint64_t* order2, const double* order_opt, int64_t n_order,
    std::chrono::steady_clock::time_point t_end, double seed_gain,
    int32_t* out_assigned, int32_t* out_n_assigned,
    double* out_objective, uint64_t* out_E2);

namespace {

typedef unsigned __int128 u128;

/* Optional profiling (FREDDIE_BOUND_PROF=1): accumulated wall spent in
 * the closure build + optimistic-bound evaluation across all solves in
 * this process, dumped at exit. Used by the device-bounds crossover
 * analysis (tools/bound_device_experiment.py; VERDICT r3 item 3) to
 * bound what a batched device launch could possibly save. */
std::atomic<long long> g_bound_ns{0}, g_bound_calls{0}, g_bound_nk{0},
    g_build_ns{0}, g_sum_k{0}, g_cache_hits{0}, g_filter_ns{0},
    g_fresh_ns{0}, g_gens_same{0}, g_binc{0};
bool bound_prof_enabled() {
  static int on = [] {
    const char* e = getenv("FREDDIE_BOUND_PROF");
    if (e && e[0] == '1') {
      atexit([] {
        fprintf(stderr,
                "[bound-prof] closure build %.3f s + bounds %.3f s over "
                "%lld escalations (%lld cache hits), sum K = %lld, "
                "sum N*K = %lld\n",
                g_build_ns.load() / 1e9,
                (g_bound_ns.load() - g_build_ns.load()) / 1e9,
                g_bound_calls.load(), g_cache_hits.load(), g_sum_k.load(),
                g_bound_nk.load());
        fprintf(stderr,
                "[bound-prof] filter %.3f s, fresh build %.3f s, "
                "gens-same shortcuts %lld, incremental bounds %lld\n",
                g_filter_ns.load() / 1e9, g_fresh_ns.load() / 1e9,
                g_gens_same.load(), g_binc.load());
      });
      return 1;
    }
    return 0;
  }();
  return on != 0;
}

// Hash for the closure-build set (u64 and u128 masks). Only membership
// depends on it -- every downstream consumer re-sorts canonically -- so
// the hash function cannot affect results.
inline uint64_t mask_hash(uint64_t x) {
  x *= 0x9e3779b97f4a7c15ull;
  return x ^ (x >> 32);
}
inline uint64_t mask_hash(u128 x) {
  uint64_t folded = (uint64_t)x ^ ((uint64_t)(x >> 64) * 0x9e3779b97f4a7c15ull);
  return mask_hash(folded);
}

// Open-addressing flat set for the closure build: std::unordered_set
// pays a node allocation per insert, which dominated the closure phase
// (avg closure ~500 masks but ~10k escalations per 300k corpus). Same
// membership semantics; linear probing, pow-2 capacity, 0.5 load cap.
template <typename MASK>
struct FlatMaskSet {
  std::vector<MASK> keys;
  std::vector<uint8_t> used;
  size_t mask = 0, count = 0;

  explicit FlatMaskSet(size_t expect) {
    size_t cap = 64;
    while (cap < expect * 2) cap <<= 1;
    keys.assign(cap, MASK(0));
    used.assign(cap, 0);
    mask = cap - 1;
  }
  bool insert(MASK k) {
    if ((count + 1) * 2 > keys.size()) grow();
    size_t i = (size_t)mask_hash(k) & mask;
    while (used[i]) {
      if (keys[i] == k) return false;
      i = (i + 1) & mask;
    }
    used[i] = 1;
    keys[i] = k;
    ++count;
    return true;
  }
  bool contains(MASK k) const {
    size_t i = (size_t)mask_hash(k) & mask;
    while (used[i]) {
      if (keys[i] == k) return true;
      i = (i + 1) & mask;
    }
    return false;
  }
  void grow() {
    std::vector<MASK> ok;
    ok.reserve(count);
    for (size_t i = 0; i < keys.size(); ++i)
      if (used[i]) ok.push_back(keys[i]);
    size_t cap = keys.size() * 2;
    keys.assign(cap, MASK(0));
    used.assign(cap, 0);
    mask = cap - 1;
    count = 0;
    for (MASK k : ok) insert(k);
  }
};

// ---- per-partition closure cache -------------------------------------
//
// Rounds within a partition shrink monotonically: the remaining reads of
// round r+1 are a subset of round r's, and the informative columns shrink
// with them (constancy over a superset implies constancy over the subset,
// and the neighbour-value condition is read-set-independent on constant
// columns -- see clucore.cpp's informative_segs). So the union-closure of
// a later round's generators is a SUBSET of the first escalated round's
// closure, computable by a filter instead of a fresh hash build:
//
//   u is in closure(G') iff u == OR{ g in G' : g subset of u }
//
// (<=: any such u is a union of G'-elements; >=: u = OR(T), T subset G',
// implies the filter OR covers u and never exceeds it.) Projecting onto
// the later round's columns commutes with OR, so the projected+deduped
// survivors equal the fresh build's set exactly -- the cap decision, the
// bounds and the canonical enum order see identical inputs, and results
// stay bit-identical (tests/test_round_native.py fuzzes cached vs fresh).
//
// The cache stores the closure and per-read generator masks in the BUILD
// round's column space (u128: Mi <= 128); a later round whose columns or
// reads are not covered simply rebuilds and replaces the cache.
struct ClosureCacheImpl {
  bool valid = false;
  std::vector<int32_t> col_ids;   // build-round global column ids, ascending
  std::vector<int32_t> read_ids;  // build-round read ids, ascending
  std::vector<u128> gens;         // per read_ids[i]: its I mask (build space)
  std::vector<u128> closure;      // the full closure (build space), incl. 0
  std::vector<u128> last_gens;    // distinct gens of the last filter call

  // Incremental optimistic-bound cache. Every pos term is
  // max(0, garbage_i - popcount(C_i & E)) -- a multiple of 0.5 far
  // inside the double mantissa, so sums are EXACT and subtracting the
  // reads removed since the last escalation reproduces a fresh scan's
  // value bit for bit. Valid only while the informative columns still
  // equal the build set (a dropped column changes C&E popcounts and can
  // merge closure elements under projection); any non-identity
  // projection clears it for the rest of the partition.
  bool pos_valid = false;
  std::vector<int32_t> pos_read_ids;  // read set at last bounds pass, asc
  std::vector<u128> pos_closure;      // sorted masks aligned with pos_vals
  std::vector<double> pos_vals;       // per mask: its pos sum
  std::vector<double> read_garbage;   // aligned with read_ids
  std::vector<u128> read_C;           // aligned with read_ids (build space)
};

// Filter the cached closure down to the current round's generator set and
// project it onto the current columns. Returns false when the cache does
// not cover this round (caller rebuilds).
template <typename MASK>
bool filter_cached_closure(ClosureCacheImpl* cc, int N,
                           const int32_t* read_ids, const int32_t* col_ids,
                           int n_segs, std::vector<MASK>& out,
                           bool* identity_out) {
  *identity_out = false;
  if (!cc || !cc->valid || !read_ids || !col_ids) return false;
  // Current columns must be a subset of the cached columns; record each
  // one's bit position in the cached space.
  std::vector<int> ppos(n_segs);
  {
    size_t j = 0;
    for (int c = 0; c < n_segs; ++c) {
      while (j < cc->col_ids.size() && cc->col_ids[j] < col_ids[c]) ++j;
      if (j >= cc->col_ids.size() || cc->col_ids[j] != col_ids[c])
        return false;
      ppos[c] = (int)j;
    }
  }
  // Current reads must all be cached; gather their build-space masks.
  std::vector<u128> gens;
  gens.reserve(N);
  for (int i = 0; i < N; ++i) {
    auto it = std::lower_bound(cc->read_ids.begin(), cc->read_ids.end(),
                               read_ids[i]);
    if (it == cc->read_ids.end() || *it != read_ids[i]) return false;
    gens.push_back(cc->gens[it - cc->read_ids.begin()]);
  }
  std::sort(gens.begin(), gens.end());
  gens.erase(std::unique(gens.begin(), gens.end()), gens.end());
  const auto f_t0 = std::chrono::steady_clock::now();
  if (gens == cc->last_gens) ++g_gens_same;
  if (gens != cc->last_gens) {
    // Survivors: u == OR of the subset generators (early exit once
    // covered). gens ascend, and subset implies numerically <=, so the
    // scan stops at the first g > u.
    std::vector<u128> kept;
    kept.reserve(cc->closure.size());
    for (u128 u : cc->closure) {
      u128 v = 0;
      for (u128 g : gens) {
        if (g > u) break;
        if (g & ~u) continue;
        v |= g;
        if (v == u) break;
      }
      if (v == u) kept.push_back(u);
    }
    // Shrink the cache to the filtered set: closures are monotone under
    // the shrinking read sets, so closure(G'') of any LATER round is a
    // subset of closure(G') = kept -- the next filter scans kept, not
    // the first round's full closure. When the distinct generator set is
    // UNCHANGED from the previous filter (reads removed had duplicate
    // masks), the closure is unchanged and the scan is skipped entirely.
    cc->closure = std::move(kept);
    cc->last_gens = std::move(gens);
  }
  g_filter_ns += std::chrono::duration_cast<std::chrono::nanoseconds>(
                     std::chrono::steady_clock::now() - f_t0)
                     .count();
  // Project onto the current columns and dedup: iterate each mask's SET
  // bits (popcount work, not Mi work) through a cached-pos -> current-col
  // reverse map (-1 = dropped column).
  out.clear();
  out.reserve(cc->closure.size());
  if (n_segs == (int)cc->col_ids.size()) {
    // No column dropped since the build: projection is the identity.
    *identity_out = true;
    for (u128 u : cc->closure) out.push_back((MASK)u);
    std::sort(out.begin(), out.end());
    out.erase(std::unique(out.begin(), out.end()), out.end());
    return true;
  }
  cc->pos_valid = false;  // non-identity projection: bounds cache dies
  std::vector<int> rpos(cc->col_ids.size(), -1);
  for (int c = 0; c < n_segs; ++c) rpos[ppos[c]] = c;
  for (u128 u : cc->closure) {
    MASK m = 0;
    uint64_t lo = (uint64_t)u, hi = (uint64_t)(u >> 64);
    while (lo) {
      int b = __builtin_ctzll(lo);
      lo &= lo - 1;
      int c = rpos[b];
      if (c >= 0) m |= (MASK)1 << c;
    }
    while (hi) {
      int b = __builtin_ctzll(hi);
      hi &= hi - 1;
      int c = rpos[64 + b];
      if (c >= 0) m |= (MASK)1 << c;
    }
    out.push_back(m);
  }
  std::sort(out.begin(), out.end());
  out.erase(std::unique(out.begin(), out.end()), out.end());
  return true;
}

// Store a freshly built closure (build space = the current round).
template <typename MASK>
void store_closure_cache(ClosureCacheImpl* cc, int N, const int32_t* read_ids,
                         const int32_t* col_ids, int n_segs,
                         const std::vector<MASK>& I_masks_per_read,
                         const std::vector<MASK>& C_masks_per_read,
                         const double* garbage,
                         const std::vector<MASK>& closure) {
  if (!cc || !read_ids || !col_ids) return;
  cc->col_ids.assign(col_ids, col_ids + n_segs);
  std::vector<int> idx(N);
  for (int i = 0; i < N; ++i) idx[i] = i;
  std::sort(idx.begin(), idx.end(),
            [&](int a, int b) { return read_ids[a] < read_ids[b]; });
  cc->read_ids.resize(N);
  cc->gens.resize(N);
  cc->read_garbage.resize(N);
  cc->read_C.resize(N);
  for (int p = 0; p < N; ++p) {
    cc->read_ids[p] = read_ids[idx[p]];
    cc->gens[p] = (u128)I_masks_per_read[idx[p]];
    cc->read_garbage[p] = garbage[idx[p]];
    cc->read_C[p] = (u128)C_masks_per_read[idx[p]];
  }
  cc->closure.assign(closure.begin(), closure.end());
  cc->pos_valid = false;
  cc->last_gens.assign(cc->gens.begin(), cc->gens.end());
  std::sort(cc->last_gens.begin(), cc->last_gens.end());
  cc->last_gens.erase(
      std::unique(cc->last_gens.begin(), cc->last_gens.end()),
      cc->last_gens.end());
  cc->valid = true;
}

// Bits [lo, hi) of a multi-word mask (the gap windows from build_instance
// are contiguous informative-column ranges).
inline void range_mask(int lo, int hi, int words, uint64_t* out) {
  for (int w = 0; w < words; ++w) out[w] = 0;
  for (int b = lo; b < hi; ++b) out[b >> 6] |= 1ull << (b & 63);
}

inline int cl_popcnt(uint64_t x) { return __builtin_popcountll(x); }
inline int cl_popcnt(u128 x) {
  return __builtin_popcountll((uint64_t)x) +
         __builtin_popcountll((uint64_t)(x >> 64));
}

// Per-read mask from W little-endian words (W = 1 or 2).
inline uint64_t mask_from_words(const uint64_t* w, int W, uint64_t) {
  (void)W;
  return w[0];
}
inline u128 mask_from_words(const uint64_t* w, int W, u128) {
  u128 m = w[0];
  if (W > 1) m |= (u128)w[1] << 64;
  return m;
}

// Enum dispatch: the u64 order list replays through freddie_run_enum, the
// u128 list flattens to 2-word pairs for freddie_run_enum_w2. Both are
// instantiations of the same templated canonical loop (segenum.cpp), so
// the closure escalation's semantics do not depend on the word count.
inline int call_enum(
    int N, const std::vector<uint64_t>& I, const std::vector<uint64_t>& C,
    const double* garbage, const int64_t* seg_len, const int32_t* gap_counts,
    const std::vector<uint64_t>& gm, const int64_t* gap_lens, int n_incomp,
    const int32_t* incomp_pairs, int64_t sc, int64_t eps, int64_t off,
    const std::vector<uint64_t>& order, const std::vector<double>& order_opt,
    std::chrono::steady_clock::time_point t_end, double seed_gain,
    int32_t* out_assigned, int32_t* out_n, double* out_obj,
    uint64_t* out_E, int out_words) {
  uint64_t E = 0;
  int st = freddie_run_enum(
      N, I.data(), C.data(), garbage, seg_len, gap_counts, gm.data(),
      gap_lens, n_incomp, incomp_pairs, sc, eps, off, order.data(),
      order_opt.data(), (int64_t)order.size(), t_end, seed_gain,
      out_assigned, out_n, out_obj, &E);
  for (int w = 0; w < out_words; ++w) out_E[w] = 0;
  out_E[0] = E;
  return st;
}

inline int call_enum(
    int N, const std::vector<u128>& I, const std::vector<u128>& C,
    const double* garbage, const int64_t* seg_len, const int32_t* gap_counts,
    const std::vector<u128>& gm, const int64_t* gap_lens, int n_incomp,
    const int32_t* incomp_pairs, int64_t sc, int64_t eps, int64_t off,
    const std::vector<u128>& order, const std::vector<double>& order_opt,
    std::chrono::steady_clock::time_point t_end, double seed_gain,
    int32_t* out_assigned, int32_t* out_n, double* out_obj,
    uint64_t* out_E, int out_words) {
  auto flatten = [](const std::vector<u128>& v) {
    std::vector<uint64_t> f(2 * std::max<size_t>(v.size(), 1), 0);
    for (size_t i = 0; i < v.size(); ++i) {
      f[2 * i] = (uint64_t)v[i];
      f[2 * i + 1] = (uint64_t)(v[i] >> 64);
    }
    return f;
  };
  std::vector<uint64_t> If = flatten(I), Cf = flatten(C), gmf = flatten(gm),
                        of = flatten(order);
  uint64_t E2[2] = {0, 0};
  int st = freddie_run_enum_w2(
      N, If.data(), Cf.data(), garbage, seg_len, gap_counts, gmf.data(),
      gap_lens, n_incomp, incomp_pairs, sc, eps, off, of.data(),
      order_opt.data(), (int64_t)order.size(), t_end, seed_gain,
      out_assigned, out_n, out_obj, E2);
  for (int w = 0; w < out_words; ++w) out_E[w] = 0;
  out_E[0] = E2[0];
  if (out_words > 1) out_E[1] = E2[1];
  return st;
}

// The union-closure escalation, templated on the mask type (u64 for
// Mi <= 64 -- byte-identical to the original single-word path -- and
// u128 for Mi <= 128). Returns the solve_round status codes 2/3/4/5.
template <typename MASK>
int closure_escalate(
    int N, int n_segs, int W,
    const std::vector<uint64_t>& I_raw, const std::vector<uint64_t>& C_raw,
    const double* garbage, const int64_t* seg_len,
    const int32_t* gap_counts, const std::vector<uint64_t>& gmask_raw,
    int total_gaps, const int64_t* gap_lens,
    int n_incomp, const int32_t* incomp_pairs,
    int64_t sc, int64_t eps, int64_t off,
    double p1_obj, int64_t closure_cap, int64_t bounds_device_min,
    std::chrono::steady_clock::time_point t0, double deadline_s,
    ClosureCacheImpl* cc, const int32_t* read_ids, const int32_t* col_ids,
    int32_t* out_assigned, int32_t* out_n, double* out_obj,
    uint64_t* out_E, int out_words) {
  const bool prof = bound_prof_enabled();
  const auto prof_t0 = std::chrono::steady_clock::now();
  auto prof_record = [&](long long K) {
    if (!prof) return;
    g_bound_ns += std::chrono::duration_cast<std::chrono::nanoseconds>(
                      std::chrono::steady_clock::now() - prof_t0)
                      .count();
    ++g_bound_calls;
    g_sum_k += K;
    g_bound_nk += (long long)N * K;
  };
  auto prof_build_done = [&]() {
    if (!prof) return;
    g_build_ns += std::chrono::duration_cast<std::chrono::nanoseconds>(
                      std::chrono::steady_clock::now() - prof_t0)
                      .count();
  };
  std::vector<MASK> I_m(N), C_m(N);
  for (int i = 0; i < N; ++i) {
    I_m[i] = mask_from_words(I_raw.data() + (size_t)i * W, W, MASK(0));
    C_m[i] = mask_from_words(C_raw.data() + (size_t)i * W, W, MASK(0));
  }
  // Distinct raw I masks, ascending (np.unique); incremental OR-closure.
  // Built with a hash set instead of per-merge sort/unique passes: the
  // SET is identical (all unions of subsets of the distinct masks; a
  // new mask m only spawns unions e|m of elements e already present --
  // (e|m)|m = e|m, so unions-with-m of the new elements add nothing),
  // and nothing downstream depends on the build order: the cap check
  // sees the same sizes, the optimistic bounds are per-mask, and the
  // enum order is re-sorted canonically by (optimistic, mask). The old
  // build's per-merge sorts were ~85% of a closure solve at K ~ 15k.
  // Escalated rounds after the first in a partition skip the build
  // entirely: the cached-closure filter yields the identical set (proof
  // at ClosureCacheImpl).
  std::vector<MASK> distinct(N);
  for (int i = 0; i < N; ++i) distinct[i] = I_m[i];
  std::sort(distinct.begin(), distinct.end());
  distinct.erase(std::unique(distinct.begin(), distinct.end()),
                 distinct.end());
  std::vector<MASK> closure;
  bool identity = false;   // current space == cache build space
  bool fresh = false;      // built (not filtered) this round
  if (!filter_cached_closure<MASK>(cc, N, read_ids, col_ids, n_segs,
                                   closure, &identity)) {
    const auto fb_t0 = std::chrono::steady_clock::now();
    closure.assign(1, MASK(0));
    FlatMaskSet<MASK> seen(1024);
    seen.insert(MASK(0));
    for (MASK m : distinct) {
      if (seen.contains(m)) continue;
      const size_t cur = closure.size();  // snapshot: unions with m of the
      for (size_t i = 0; i < cur; ++i) {  // appended tail are idempotent
        MASK u = closure[i] | m;
        if (u == closure[i]) continue;  // m subset: union already present
        if (seen.insert(u)) closure.push_back(u);
      }
      if ((int64_t)closure.size() > closure_cap) {
        prof_record((long long)closure.size());
        return 2;
      }
    }
    store_closure_cache<MASK>(cc, N, read_ids, col_ids, n_segs, I_m, C_m,
                              garbage, closure);
    fresh = true;
    identity = true;  // the build round defines the cache space
    g_fresh_ns += std::chrono::duration_cast<std::chrono::nanoseconds>(
                      std::chrono::steady_clock::now() - fb_t0)
                      .count();
  } else {
    ++g_cache_hits;
  }
  if (bounds_device_min > 0 &&
      (int64_t)N * (int64_t)closure.size() >= bounds_device_min) {
    prof_record((long long)closure.size());
    return 5;
  }
  prof_build_done();

  // Optimistic bound per closure mask: all subset-compatible positive-
  // profit reads assigned, ignoring gaps/conflicts/coverage. Reads are
  // grouped by their (distinct, sorted) I mask so the subset test runs
  // once per group instead of once per read -- most groups fail it, and
  // the failing side is the bulk of the K*N scan. Regrouping only
  // reorders the pos summation, and every term is an exact double
  // (multiples of 0.5 well inside the mantissa), so addition here is
  // associative and the bounds are bit-equal to the read-order scan.
  double g_total = 0.0;
  for (int i = 0; i < N; ++i) g_total += garbage[i];
  const size_t D = distinct.size();
  std::vector<std::vector<int>> groups(D);
  for (int i = 0; i < N; ++i)
    groups[std::lower_bound(distinct.begin(), distinct.end(), I_m[i]) -
           distinct.begin()]
        .push_back(i);
  const size_t K = closure.size();
  std::vector<double> pos_arr(K);
  bool incremental = false;
  const bool cacheable = cc && read_ids && col_ids && identity;
  if (cacheable && !fresh && cc->pos_valid) {
    // Incremental pos: previous escalation's values minus the removed
    // reads' terms -- exact (every term a multiple of 0.5, all sums
    // exact), so bit-equal to the full scan. Requires the current reads
    // to be a subset of the last bounds pass's reads, the current
    // closure a subset of its closure, and an unchanged column space
    // (checked via `identity` + pos_valid).
    std::vector<int32_t> cur_ids(read_ids, read_ids + N);
    std::sort(cur_ids.begin(), cur_ids.end());
    std::vector<int32_t> removed;
    removed.reserve(cc->pos_read_ids.size());
    {
      size_t a = 0, b = 0;
      bool ok = true;
      while (a < cc->pos_read_ids.size() || b < cur_ids.size()) {
        if (b >= cur_ids.size() ||
            (a < cc->pos_read_ids.size() &&
             cc->pos_read_ids[a] < cur_ids[b])) {
          removed.push_back(cc->pos_read_ids[a]);
          ++a;
        } else if (a < cc->pos_read_ids.size() &&
                   cc->pos_read_ids[a] == cur_ids[b]) {
          ++a;
          ++b;
        } else {
          ok = false;  // a current read the last pass never saw
          break;
        }
      }
      if (ok) {
        // removed reads' garbage + I/C masks from the cache
        std::vector<double> rg;
        std::vector<u128> rC, rI;
        rg.reserve(removed.size());
        rC.reserve(removed.size());
        rI.reserve(removed.size());
        for (int32_t rid : removed) {
          auto it = std::lower_bound(cc->read_ids.begin(),
                                     cc->read_ids.end(), rid);
          if (it == cc->read_ids.end() || *it != rid) { ok = false; break; }
          size_t p = it - cc->read_ids.begin();
          rg.push_back(cc->read_garbage[p]);
          rC.push_back(cc->read_C[p]);
          rI.push_back(cc->gens[p]);
        }
        if (ok) {
          // closure (sorted) -> pos_closure (sorted) index map
          size_t j = 0;
          for (size_t k = 0; k < K && ok; ++k) {
            const u128 key = (u128)closure[k];
            while (j < cc->pos_closure.size() && cc->pos_closure[j] < key)
              ++j;
            if (j >= cc->pos_closure.size() || cc->pos_closure[j] != key) {
              ok = false;
              break;
            }
            double pos = cc->pos_vals[j];
            const u128 E = key;
            for (size_t r = 0; r < removed.size(); ++r) {
              if (rI[r] & ~E) continue;  // read's I not subset of E
              double d = rg[r] - (double)cl_popcnt(rC[r] & E);
              if (d > 0) pos -= d;
            }
            pos_arr[k] = pos;
          }
          incremental = ok;
        }
      }
    }
  }
  if (!incremental) {
    for (size_t k = 0; k < K; ++k) {
      const MASK E = closure[k];
      double pos = 0.0;
      for (size_t g = 0; g < D; ++g) {
        if (distinct[g] & ~E) continue;
        for (int i : groups[g]) {
          double d = garbage[i] - (double)cl_popcnt((MASK)(C_m[i] & E));
          if (d > 0) pos += d;
        }
      }
      pos_arr[k] = pos;
    }
  } else {
    ++g_binc;
  }
  if (cacheable) {
    // Save this pass for the next escalation (sorted by mask).
    std::vector<size_t> ord(K);
    for (size_t k = 0; k < K; ++k) ord[k] = k;
    std::sort(ord.begin(), ord.end(), [&](size_t a, size_t b) {
      return (u128)closure[a] < (u128)closure[b];
    });
    cc->pos_closure.resize(K);
    cc->pos_vals.resize(K);
    for (size_t k = 0; k < K; ++k) {
      cc->pos_closure[k] = (u128)closure[ord[k]];
      cc->pos_vals[k] = pos_arr[ord[k]];
    }
    cc->pos_read_ids.assign(read_ids, read_ids + N);
    std::sort(cc->pos_read_ids.begin(), cc->pos_read_ids.end());
    cc->pos_valid = true;
  }
  std::vector<double> optimistic(K);
  for (size_t k = 0; k < K; ++k) optimistic[k] = g_total - pos_arr[k];

  prof_record((long long)K);

  // Incumbent filter + canonical (optimistic, mask) order + DFS floor.
  bool integral = true;
  for (int i = 0; i < N; ++i)
    if (garbage[i] != std::floor(garbage[i])) { integral = false; break; }
  const double gran = integral ? 1.0 : 0.5;
  const double inc = p1_obj;
  std::vector<size_t> keep;
  keep.reserve(K);
  for (size_t k = 0; k < K; ++k)
    if (optimistic[k] <= inc + 1e-9) keep.push_back(k);
  std::stable_sort(keep.begin(), keep.end(), [&](size_t a, size_t b) {
    if (optimistic[a] != optimistic[b]) return optimistic[a] < optimistic[b];
    return closure[a] < closure[b];
  });
  std::vector<MASK> enum_order(keep.size());
  std::vector<double> enum_opt(keep.size());
  for (size_t k = 0; k < keep.size(); ++k) {
    enum_order[k] = closure[keep[k]];
    enum_opt[k] = optimistic[keep[k]];
  }
  const double seed_gain = g_total - inc - gran;

  // Remaining wall budget, like the Python chain's max(deadline-spent, 1).
  double spent = std::chrono::duration<double>(
                     std::chrono::steady_clock::now() - t0)
                     .count();
  double remaining = deadline_s - spent;
  if (remaining < 1.0) remaining = 1.0;
  auto t_end = std::chrono::steady_clock::now() +
               std::chrono::microseconds((int64_t)(remaining * 1e6));

  // Raw gap masks at the enum's word count.
  std::vector<MASK> gm(std::max(total_gaps, 1), 0);
  for (int g = 0; g < total_gaps; ++g)
    gm[g] = mask_from_words(gmask_raw.data() + (size_t)g * W, W, MASK(0));

  // Temporaries: on closure TIMEOUT the caller's phase-1 incumbent
  // outputs must stand untouched.
  std::vector<int32_t> cl_assigned(std::max(N, 1));
  int32_t cl_n = 0;
  double cl_obj = 0.0;
  std::vector<uint64_t> cl_E(std::max(out_words, 1), 0);
  int est = call_enum(N, I_m, C_m, garbage, seg_len, gap_counts, gm,
                      gap_lens, n_incomp, incomp_pairs, sc, eps, off,
                      enum_order, enum_opt, t_end, seed_gain,
                      cl_assigned.data(), &cl_n, &cl_obj, cl_E.data(),
                      out_words);
  if (est == 1) return 4;  // closure TIMEOUT; phase-1 incumbent stands
  *out_obj = cl_obj;
  *out_n = cl_n;
  for (int i = 0; i < cl_n; ++i) out_assigned[i] = cl_assigned[i];
  for (int w = 0; w < out_words; ++w) out_E[w] = cl_E[w];
  return 3;
}

}  // namespace

extern "C" {

// Returns:
//   0  phase-1 OPTIMAL (within the node budget)     -> result is final
//   1  phase-1 TIMEOUT (wall deadline)              -> result is final
//   2  phase-1 BUDGET and closure declined (Mi out of [1, closure_max]
//      or closure size > closure_cap)               -> caller escalates
//      with the returned phase-1 incumbent (same gates as the Python
//      two_phase chain: segenum / wide / LP / full)
//   3  closure OPTIMAL                              -> result is final
//   4  closure TIMEOUT                              -> caller runs the
//      LP proof / full search with the returned phase-1 incumbent
//   5  closure built but N*closure_size >= bounds_device_min: the bound
//      evaluation is big enough that a batched device matmul wins
//      (tools/bound_device_experiment.py crossover) -> caller re-runs
//      the closure escalation in Python with device bounds (bit-equal
//      values, so the canonical result is unchanged; the rebuild costs
//      milliseconds against the saved bound time)
// Opaque per-partition closure cache (see ClosureCacheImpl). Create one
// per partition, pass it to solve_round_cached for every round of that
// partition with the round's stable read ids and global column ids, and
// free it when the partition's rounds end. Passing NULLs (or using the
// plain solve_round wrapper) disables caching; results are bit-identical
// either way.
void* closure_cache_new() { return new ClosureCacheImpl(); }
void closure_cache_free(void* p) { delete (ClosureCacheImpl*)p; }

// All read indices are RAW (caller order); sorting for the DFS happens
// here (heaviest-garbage-first, then index -- solver/exact.py's order).
int solve_round_cached(
    int n_reads, int n_segs,
    const uint8_t* I_bytes, const uint8_t* C_bytes, const double* garbage,
    const int64_t* seg_len, const int32_t* gap_counts, const int32_t* gap_lo,
    const int32_t* gap_hi, const int64_t* gap_lens, int n_incomp,
    const int32_t* incomp_pairs, int64_t sc, int64_t eps, int64_t off,
    double deadline_s, int64_t node_budget, int64_t closure_max_segs,
    int64_t closure_cap, int64_t bounds_device_min,
    void* cache, const int32_t* read_ids, const int32_t* col_ids,
    int32_t* out_assigned, int32_t* out_n, double* out_obj, uint64_t* out_E,
    int64_t* out_nodes);

int solve_round_cached(
    int n_reads, int n_segs,
    const uint8_t* I_bytes,    // [n_reads][n_segs] 0/1
    const uint8_t* C_bytes,    // [n_reads][n_segs] 0/1
    const double* garbage,     // [n_reads]
    const int64_t* seg_len,    // [n_segs]
    const int32_t* gap_counts, // [n_reads] (raw order)
    const int32_t* gap_lo,     // [total_gaps] first informative col inside
    const int32_t* gap_hi,     // [total_gaps] end col (exclusive)
    const int64_t* gap_lens,   // [total_gaps]
    int n_incomp,
    const int32_t* incomp_pairs,  // [n_incomp][2] raw indices
    int64_t sc, int64_t eps, int64_t off,
    double deadline_s, int64_t node_budget,
    int64_t closure_max_segs, int64_t closure_cap,
    int64_t bounds_device_min,  // N*closure_size gate; <=0 disables
    void* cache,                // closure_cache_new() handle or NULL
    const int32_t* read_ids,    // [n_reads] stable ids or NULL
    const int32_t* col_ids,     // [n_segs] global column ids or NULL

    // outputs
    int32_t* out_assigned, int32_t* out_n, double* out_obj,
    uint64_t* out_E,  // [words]
    int64_t* out_nodes) {
  ClosureCacheImpl* cc = (ClosureCacheImpl*)cache;
  const auto t0 = std::chrono::steady_clock::now();
  int words = (n_segs + 63) / 64;
  if (words == 0) words = 1;
  const int W = words;
  const int N = n_reads;

  // Pack the 0/1 matrices once (raw order).
  std::vector<uint64_t> I_raw((size_t)N * W, 0), C_raw((size_t)N * W, 0);
  for (int i = 0; i < N; ++i) {
    const uint8_t* Ir = I_bytes + (size_t)i * n_segs;
    const uint8_t* Cr = C_bytes + (size_t)i * n_segs;
    for (int j = 0; j < n_segs; ++j) {
      if (Ir[j]) I_raw[(size_t)i * W + (j >> 6)] |= 1ull << (j & 63);
      if (Cr[j]) C_raw[(size_t)i * W + (j >> 6)] |= 1ull << (j & 63);
    }
  }
  // Raw-order gap offsets and masks.
  std::vector<int> goff(N + 1, 0);
  for (int i = 0; i < N; ++i) goff[i + 1] = goff[i] + gap_counts[i];
  const int total_gaps = goff[N];
  std::vector<uint64_t> gmask_raw((size_t)std::max(total_gaps, 1) * W, 0);
  for (int g = 0; g < total_gaps; ++g)
    range_mask(gap_lo[g], gap_hi[g], W, gmask_raw.data() + (size_t)g * W);

  // DFS order: heaviest garbage first, then raw index (stable).
  std::vector<int> order(N);
  for (int i = 0; i < N; ++i) order[i] = i;
  std::stable_sort(order.begin(), order.end(), [&](int a, int b) {
    if (garbage[a] != garbage[b]) return garbage[a] > garbage[b];
    return a < b;
  });
  std::vector<int> pos_of(N);
  for (int p = 0; p < N; ++p) pos_of[order[p]] = p;

  std::vector<uint64_t> exons_s((size_t)N * W), corr_s((size_t)N * W);
  std::vector<double> garbage_s(N);
  std::vector<int32_t> gcount_s(N);
  std::vector<uint64_t> gmask_s((size_t)std::max(total_gaps, 1) * W, 0);
  std::vector<int64_t> glen_s(std::max(total_gaps, 1), 0);
  size_t gpos = 0;
  for (int p = 0; p < N; ++p) {
    int i = order[p];
    std::memcpy(&exons_s[(size_t)p * W], &I_raw[(size_t)i * W],
                W * sizeof(uint64_t));
    std::memcpy(&corr_s[(size_t)p * W], &C_raw[(size_t)i * W],
                W * sizeof(uint64_t));
    garbage_s[p] = garbage[i];
    gcount_s[p] = gap_counts[i];
    for (int g = goff[i]; g < goff[i + 1]; ++g, ++gpos) {
      std::memcpy(&gmask_s[gpos * W], &gmask_raw[(size_t)g * W],
                  W * sizeof(uint64_t));
      glen_s[gpos] = gap_lens[g];
    }
  }
  std::vector<int32_t> incomp_s((size_t)std::max(n_incomp, 1) * 2, 0);
  for (int e = 0; e < n_incomp; ++e) {
    incomp_s[2 * e] = pos_of[incomp_pairs[2 * e]];
    incomp_s[2 * e + 1] = pos_of[incomp_pairs[2 * e + 1]];
  }

  // ---- phase 1: budgeted branch-and-bound (bit-equal solver/exact.py).
  std::vector<int32_t> p1_assigned(std::max(N, 1));
  int32_t p1_n = 0;
  double p1_obj = 0.0;
  std::vector<uint64_t> p1_E(W, 0);
  int64_t p1_nodes = 0;
  int st = solve_bnb(N, n_segs, exons_s.data(), corr_s.data(),
                     garbage_s.data(), seg_len, gcount_s.data(),
                     gmask_s.data(), glen_s.data(), n_incomp,
                     incomp_s.data(), sc, eps, off, deadline_s, node_budget,
                     p1_assigned.data(), &p1_n, &p1_obj, p1_E.data(),
                     &p1_nodes);
  *out_nodes = p1_nodes;
  *out_obj = p1_obj;
  // Map the incumbent back to raw ascending indices.
  std::vector<int32_t> raw_assigned(p1_assigned.begin(),
                                    p1_assigned.begin() + p1_n);
  for (auto& a : raw_assigned) a = order[a];
  std::sort(raw_assigned.begin(), raw_assigned.end());
  *out_n = (int32_t)raw_assigned.size();
  for (size_t i = 0; i < raw_assigned.size(); ++i)
    out_assigned[i] = raw_assigned[i];
  for (int w = 0; w < W; ++w) out_E[w] = p1_E[w];
  if (st == 1) { *out_n = 0; return 1; }  // TIMEOUT: no assignment reported
  if (st == 0) return 0;                  // phase-1 OPTIMAL

  // ---- escalation: union-closure enumeration (bit-equal twin of
  // solver/segenum.solve_segment_enum_closure). Content-only gates; the
  // word count (u64 vs u128) is chosen by Mi, never by environment, and
  // both instantiate the same templated canonical loop.
  if (n_segs < 1 || n_segs > (int)closure_max_segs || n_segs > 128) return 2;
  if (n_segs <= 64)
    return closure_escalate<uint64_t>(
        N, n_segs, W, I_raw, C_raw, garbage, seg_len, gap_counts, gmask_raw,
        total_gaps, gap_lens, n_incomp, incomp_pairs, sc, eps, off, p1_obj,
        closure_cap, bounds_device_min, t0, deadline_s, cc, read_ids,
        col_ids, out_assigned, out_n, out_obj, out_E, W);
  return closure_escalate<u128>(
      N, n_segs, W, I_raw, C_raw, garbage, seg_len, gap_counts, gmask_raw,
      total_gaps, gap_lens, n_incomp, incomp_pairs, sc, eps, off, p1_obj,
      closure_cap, bounds_device_min, t0, deadline_s, cc, read_ids, col_ids,
      out_assigned, out_n, out_obj, out_E, W);
}

// Legacy uncached entry (Python ctypes twins; bit-identical results).
int solve_round(
    int n_reads, int n_segs, const uint8_t* I_bytes, const uint8_t* C_bytes,
    const double* garbage, const int64_t* seg_len, const int32_t* gap_counts,
    const int32_t* gap_lo, const int32_t* gap_hi, const int64_t* gap_lens,
    int n_incomp, const int32_t* incomp_pairs, int64_t sc, int64_t eps,
    int64_t off, double deadline_s, int64_t node_budget,
    int64_t closure_max_segs, int64_t closure_cap, int64_t bounds_device_min,
    int32_t* out_assigned, int32_t* out_n, double* out_obj, uint64_t* out_E,
    int64_t* out_nodes) {
  return solve_round_cached(
      n_reads, n_segs, I_bytes, C_bytes, garbage, seg_len, gap_counts,
      gap_lo, gap_hi, gap_lens, n_incomp, incomp_pairs, sc, eps, off,
      deadline_s, node_budget, closure_max_segs, closure_cap,
      bounds_device_min, nullptr, nullptr, nullptr, out_assigned, out_n,
      out_obj, out_E, out_nodes);
}

}  // extern "C"
