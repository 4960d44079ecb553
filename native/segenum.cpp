// Structure-enumeration exact solver (C++ twin of solver/segenum.py).
//
// Enumerates isoform exon masks E over 2^Mi (Mi <= 16 informative
// segments), computing for each E the optimal conflict-free covering
// assignment by profit-ordered DFS with free-assignment of unconflicted
// non-negative-profit candidates. Visit order, tie-breaking and the
// returned canonical optimum are IDENTICAL to the Python implementation
// (all objective arithmetic is on multiples of 0.5, exact in double, so
// sums are order-insensitive); tests/test_segenum_native.py asserts
// bit-equality.
//
// Built into libbnb.so together with bnb_solver.cpp.

#include <algorithm>
#include <chrono>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <limits>
#include <vector>

namespace {

// Mask helpers shared by the u64 and u128 instantiations. The u128 form
// lifts the closure/replay escalations past 64 informative segments
// (Mi <= 128) with IDENTICAL semantics: popcounts, set-bit length sums
// and the numeric (ascending) mask order all generalize verbatim.
inline int mask_popcnt(uint64_t x) { return __builtin_popcountll(x); }
inline int mask_popcnt(unsigned __int128 x) {
  return __builtin_popcountll((uint64_t)x) +
         __builtin_popcountll((uint64_t)(x >> 64));
}

inline int64_t mask_seg_sum(uint64_t m, const int64_t* seg_len) {
  int64_t s = 0;
  while (m) {
    int b = __builtin_ctzll(m);
    s += seg_len[b];
    m &= m - 1;
  }
  return s;
}
inline int64_t mask_seg_sum(unsigned __int128 m, const int64_t* seg_len) {
  return mask_seg_sum((uint64_t)m, seg_len) +
         mask_seg_sum((uint64_t)(m >> 64), seg_len + 64);
}

template <typename MASK>
struct SubCtx {
  int n_sub;
  MASK E;
  const double* delta;        // [n_sub]
  const MASK* I;              // [n_sub]
  const uint64_t* conf;       // [n_sub][conf_words] bitset over sub positions
  int conf_words;
  double best_gain;
  std::vector<int> best_sub;
  std::vector<int> chosen;
  std::vector<uint64_t> chosen_bits;
  // excluded[q] = how many chosen positions conflict with q; dplus[q] =
  // max(delta[q], 0). The conflict-aware prune grants at most ONE
  // positive profit per conflict clique among the non-excluded remaining
  // positions (clique members mutually conflict, so any extension
  // assigns at most one of them) -- a valid upper bound, and pruning
  // with a valid bound under strict incumbent updates cannot cut the
  // first-in-DFS-order optimum before it is found, so the canonical
  // result is unchanged; only the node count shrinks (dense-conflict
  // instances previously blew up exponentially here). Twin of the
  // identical construction in solver/segenum.py (exact multiples of 0.5
  // in double keep the node paths bit-equal).
  std::vector<int32_t> excluded;
  // excluded_bits[w]: positions with excluded[] > 0, kept in lockstep by
  // the branch bookkeeping; oblig: rejected FREE positions with
  // delta > 0. Dominance invariant: each obligation must eventually
  // conflict with a chosen position -- otherwise every completion below
  // keeps it free and is strictly improvable by adding it (it is
  // subset-compatible and gap-feasible by candidacy, conflict-free by
  // excluded[q] == 0, and coverage only grows within E), so no optimum
  // lives in the subtree and pruning it cannot change the canonical
  // first-found optimum. Within a subtree excluded[] counts are
  // monotone non-decreasing (the chosen stack only grows before
  // shrinking back), which is what makes the viability check sound.
  std::vector<uint64_t> excluded_bits;
  std::vector<int> oblig;
  const double* dplus;
  const int32_t* clique_of;   // [n_sub] greedy first-fit cover, DFS order
  int n_cliques;
  std::vector<double> clique_max;
  std::vector<int64_t> clique_epoch;
  // Deadline plumbing: one mask's conflict DFS can blow up exponentially
  // (dense incompatibilities), so the wall check must live INSIDE the
  // recursion, not only in the outer mask loop.
  std::chrono::steady_clock::time_point t_end;
  int64_t nodes = 0;
  bool timed_out = false;
};

template <typename MASK>
void rec(SubCtx<MASK>& c, int p, double gain, MASK uni) {
  if (c.timed_out) return;
  if ((++c.nodes & 0xFFFF) == 0 &&
      std::chrono::steady_clock::now() > c.t_end) {
    c.timed_out = true;
    return;
  }
  // One pass over the remaining positions feeds both prunes: the
  // per-clique best remaining profit (bound) and the union of still-
  // assignable positions (coverage; tighter than a static suffix union,
  // which would count excluded positions as available).
  double total_max = 0.0;
  const int64_t epoch = c.nodes;
  MASK avail_uni = 0;
  for (int q = p; q < c.n_sub; ++q) {
    if (c.excluded[q]) continue;
    avail_uni |= c.I[q];
    int k = c.clique_of[q];
    double prev = (c.clique_epoch[k] == epoch) ? c.clique_max[k] : 0.0;
    if (c.dplus[q] > prev) {
      total_max += c.dplus[q] - prev;
      c.clique_max[k] = c.dplus[q];
      c.clique_epoch[k] = epoch;
    }
  }
  if (((uni | avail_uni) & c.E) != c.E) return;
  if (gain + total_max <= c.best_gain) return;
  // Dominance prune (see the oblig comment in SubCtx): an unsatisfied
  // obligation with no choosable remaining neighbor kills the subtree.
  for (int q : c.oblig) {
    if (c.excluded[q]) continue;  // satisfied: a chosen neighbor exists
    const uint64_t* row = c.conf + (size_t)q * c.conf_words;
    bool viable = false;
    for (int w = (p >> 6); w < c.conf_words && !viable; ++w) {
      uint64_t bits = row[w] & ~c.excluded_bits[w];
      if (w == (p >> 6)) bits &= ~((1ull << (p & 63)) - 1);
      if (bits) viable = true;
    }
    if (!viable) return;
  }
  if (p == c.n_sub) {
    if (uni == c.E && gain > c.best_gain) {
      c.best_gain = gain;
      c.best_sub = c.chosen;
    }
    return;
  }
  bool conflicted = c.excluded[p] != 0;
  if (!conflicted) {
    const uint64_t* crow = c.conf + (size_t)p * c.conf_words;
    c.chosen.push_back(p);
    c.chosen_bits[p >> 6] |= 1ull << (p & 63);
    for (int w = 0; w < c.conf_words; ++w) {
      uint64_t bits = crow[w];
      while (bits) {
        int b = __builtin_ctzll(bits);
        if (++c.excluded[(w << 6) + b] == 1)
          c.excluded_bits[w] |= 1ull << b;
        bits &= bits - 1;
      }
    }
    rec(c, p + 1, gain + c.delta[p], uni | c.I[p]);
    for (int w = 0; w < c.conf_words; ++w) {
      uint64_t bits = crow[w];
      while (bits) {
        int b = __builtin_ctzll(bits);
        if (--c.excluded[(w << 6) + b] == 0)
          c.excluded_bits[w] &= ~(1ull << b);
        bits &= bits - 1;
      }
    }
    c.chosen_bits[p >> 6] &= ~(1ull << (p & 63));
    c.chosen.pop_back();
    if (c.delta[p] > 0) {
      // Reject branch of a free positive-profit position: record the
      // obligation for the dominance prune above.
      c.oblig.push_back(p);
      rec(c, p + 1, gain, uni);
      c.oblig.pop_back();
      return;
    }
  }
  rec(c, p + 1, gain, uni);
}

// The canonical incumbent loop, templated on the mask word type (u64 for
// Mi <= 64, u128 for Mi <= 128); body identical -- see freddie_run_enum's
// contract comment below.
template <typename MASK>
int run_enum_t(
    int n_reads,
    const MASK* I_masks, const MASK* C_masks, const double* garbage,
    const int64_t* seg_len,
    const int32_t* gap_counts, const MASK* gap_masks,
    const int64_t* gap_lens,
    int n_incomp, const int32_t* incomp_pairs,
    int64_t sc, int64_t eps, int64_t off,
    const MASK* order, const double* order_opt, int64_t n_order,
    std::chrono::steady_clock::time_point t_end, double seed_gain,
    int32_t* out_assigned, int32_t* out_n_assigned,
    double* out_objective, MASK* out_E) {
  double g_total = 0;
  for (int i = 0; i < n_reads; ++i) g_total += garbage[i];

  // Per-read gap offsets.
  std::vector<int> gap_off(n_reads + 1, 0);
  for (int i = 0; i < n_reads; ++i) gap_off[i + 1] = gap_off[i] + gap_counts[i];

  const double NEG = -std::numeric_limits<double>::infinity();

  // Conflict matrix as bitsets over read indices.
  int rw = (n_reads + 63) / 64;
  if (rw == 0) rw = 1;
  std::vector<uint64_t> conflict((size_t)n_reads * rw, 0);
  for (int e = 0; e < n_incomp; ++e) {
    int a = incomp_pairs[2 * e], b = incomp_pairs[2 * e + 1];
    conflict[(size_t)a * rw + (b >> 6)] |= 1ull << (b & 63);
    conflict[(size_t)b * rw + (a >> 6)] |= 1ull << (a & 63);
  }

  double best_cost = g_total;
  MASK best_E = 0;
  std::vector<int> best_S;

  // Global greedy first-fit clique cover of the conflict graph (read
  // order): any clique's members mutually conflict, so at most one can
  // be assigned for ANY structure. Per mask, granting one positive
  // profit per clique (subset-compatible reads only, gaps ignored --
  // dropping constraints only loosens it) is a TIGHTER admissible bound
  // than the loose `order_opt`; masks it already rules out skip the
  // O(|cand|^2) conflict setup and the DFS entirely. Skipping such a
  // mask cannot change the canonical result: its true cost >= the
  // bound >= best_cost, and incumbent updates are strict. Built only
  // when conflicts exist (without them the bound equals order_opt).
  std::vector<int32_t> gclique(n_reads, 0);
  int n_gcliques = 0;
  if (n_incomp > 0) {
    std::vector<std::vector<uint64_t>> members;
    for (int i = 0; i < n_reads; ++i) {
      const uint64_t* crow = conflict.data() + (size_t)i * rw;
      int placed = -1;
      for (size_t k = 0; k < members.size(); ++k) {
        bool subset = true;
        for (int w = 0; w < rw; ++w)
          if (members[k][w] & ~crow[w]) { subset = false; break; }
        if (subset) { placed = (int)k; break; }
      }
      if (placed < 0) {
        placed = (int)members.size();
        members.emplace_back(rw, 0);
      }
      gclique[i] = placed;
      members[placed][i >> 6] |= 1ull << (i & 63);
    }
    n_gcliques = (int)members.size();
  }
  std::vector<double> gclique_max(std::max(n_gcliques, 1), 0.0);
  std::vector<int64_t> gclique_epoch(std::max(n_gcliques, 1), -1);
  int64_t g_epoch = 0;

  std::vector<int> cand;
  std::vector<double> cand_delta;
  std::vector<int> sub_all;   // candidate read indices, profit-ordered
  std::vector<int> rest_idx;  // positions (into sub_all) that go to DFS
  bool timed_out = false;

  for (int64_t oi = 0; oi < n_order; ++oi) {
    MASK E = order[oi];
    if (order_opt[oi] >= best_cost) break;
    if (std::chrono::steady_clock::now() > t_end) {
      timed_out = true;
      break;
    }
    cand.clear();
    cand_delta.assign(n_reads, NEG);
    for (int i = 0; i < n_reads; ++i) {
      if (I_masks[i] & ~E) continue;
      bool ok = true;
      for (int gidx = gap_off[i]; gidx < gap_off[i + 1]; ++gidx) {
        int64_t G = mask_seg_sum((MASK)(gap_masks[gidx] & E), seg_len);
        int64_t l = gap_lens[gidx];
        if (!((sc - eps) * G <= sc * (l + off) &&
              sc * (l - off) <= (sc + eps) * G)) {
          ok = false;
          break;
        }
      }
      if (!ok) continue;
      cand_delta[i] = garbage[i] - (double)mask_popcnt((MASK)(C_masks[i] & E));
      cand.push_back(i);
    }
    if (E != (MASK)0 && cand.empty()) continue;

    if (n_incomp > 0) {
      // Fused tight-bound early skip: the candidate deltas are already
      // in hand, so granting at most one positive profit per global
      // conflict clique (see the cover comment above) costs one O(|cand|)
      // pass and is admissible over the FILTERED candidates (assignable
      // reads are exactly these). When the bound cannot beat the floor
      // (the strict-update incumbent or the external seed), the
      // O(|cand|^2) conflict setup and the DFS are skipped -- the
      // canonical result is unchanged by the floor argument.
      ++g_epoch;
      double gain_bound = 0.0;
      for (int i : cand) {
        double d = cand_delta[i];
        if (d <= 0) continue;
        int k = gclique[i];
        double prev = (gclique_epoch[k] == g_epoch) ? gclique_max[k] : 0.0;
        if (d > prev) {
          gain_bound += d - prev;
          gclique_max[k] = d;
          gclique_epoch[k] = g_epoch;
        }
      }
      const double floor_gain = std::max(g_total - best_cost, seed_gain);
      if (gain_bound <= floor_gain) continue;
    }

    // Profit-descending, then index (stable on exact doubles).
    sub_all = cand;
    std::stable_sort(sub_all.begin(), sub_all.end(), [&](int a, int b) {
      double da = cand_delta[a];
      double db = cand_delta[b];
      if (da != db) return da > db;
      return a < b;
    });
    int n_all = (int)sub_all.size();

    // has_conf within the candidate set; free-assign unconflicted d>=0.
    double base_gain = 0.0;
    MASK base_union = 0;
    rest_idx.clear();
    std::vector<int> free_reads;
    for (int p = 0; p < n_all; ++p) {
      int i = sub_all[p];
      bool hc = false;
      const uint64_t* crow = conflict.data() + (size_t)i * rw;
      for (int q = 0; q < n_all && !hc; ++q) {
        int j = sub_all[q];
        if (crow[j >> 6] & (1ull << (j & 63))) hc = true;
      }
      double d = cand_delta[i];
      if (!hc && d >= 0) {
        base_gain += d;
        base_union |= I_masks[i];
        free_reads.push_back(i);
      } else {
        rest_idx.push_back(p);
      }
    }
    int n_sub = (int)rest_idx.size();
    std::vector<double> sub_delta(n_sub);
    std::vector<MASK> sub_I(n_sub);
    int cw = (n_sub + 63) / 64;
    if (cw == 0) cw = 1;
    std::vector<uint64_t> sub_conf((size_t)n_sub * cw, 0);
    for (int p = 0; p < n_sub; ++p) {
      int i = sub_all[rest_idx[p]];
      sub_delta[p] = cand_delta[i];
      sub_I[p] = I_masks[i];
      const uint64_t* crow = conflict.data() + (size_t)i * rw;
      for (int q = 0; q < n_sub; ++q) {
        int j = sub_all[rest_idx[q]];
        if (crow[j >> 6] & (1ull << (j & 63)))
          sub_conf[(size_t)p * cw + (q >> 6)] |= 1ull << (q & 63);
      }
    }
    std::vector<double> dplus(n_sub, 0.0);
    for (int p = n_sub - 1; p >= 0; --p) dplus[p] = std::max(sub_delta[p], 0.0);

    // Greedy first-fit clique cover of the sub-conflict graph in DFS
    // (profit) order -- twin of solver/segenum.py's construction.
    std::vector<int32_t> clique_of(n_sub, 0);
    std::vector<std::vector<uint64_t>> cl_members;
    for (int p = 0; p < n_sub; ++p) {
      const uint64_t* cb = sub_conf.data() + (size_t)p * cw;
      int placed = -1;
      for (size_t k = 0; k < cl_members.size(); ++k) {
        bool subset = true;
        for (int w = 0; w < cw; ++w)
          if (cl_members[k][w] & ~cb[w]) { subset = false; break; }
        if (subset) { placed = (int)k; break; }
      }
      if (placed < 0) {
        placed = (int)cl_members.size();
        cl_members.emplace_back(cw, 0);
      }
      clique_of[p] = placed;
      cl_members[placed][p >> 6] |= 1ull << (p & 63);
    }

    SubCtx<MASK> sctx;
    sctx.n_sub = n_sub;
    sctx.E = E;
    sctx.delta = sub_delta.data();
    sctx.I = sub_I.data();
    sctx.conf = sub_conf.data();
    sctx.conf_words = cw;
    sctx.clique_of = clique_of.data();
    sctx.n_cliques = (int)cl_members.size();
    sctx.clique_max.assign(cl_members.size(), 0.0);
    sctx.clique_epoch.assign(cl_members.size(), -1);
    // Seed the DFS floor with the gain matching the CURRENT incumbent:
    // only strictly better assignments can update the outer incumbent,
    // so pruning everything at-or-below the floor is a valid bound under
    // strict updates (same argument as the clique bound above) -- the
    // canonical first-attainer and result are unchanged, and structures
    // that cannot beat the incumbent no longer pay a full DFS.
    const double floor_gain = std::max(g_total - best_cost, seed_gain);
    sctx.best_gain = floor_gain;
    sctx.chosen_bits.assign(cw, 0);
    sctx.excluded.assign((size_t)cw * 64, 0);
    sctx.excluded_bits.assign(cw, 0);
    sctx.dplus = dplus.data();
    sctx.t_end = t_end;
    rec(sctx, 0, base_gain, base_union);
    if (sctx.timed_out) {
      timed_out = true;
      break;
    }
    if (!(sctx.best_gain > floor_gain)) continue;  /* nothing beat it */
    double cost = g_total - sctx.best_gain;
    if (cost < best_cost) {
      best_cost = cost;
      best_E = E;
      best_S.clear();
      for (int p : sctx.best_sub) best_S.push_back(sub_all[rest_idx[p]]);
      for (int i : free_reads) best_S.push_back(i);
      std::sort(best_S.begin(), best_S.end());
    }
  }

  *out_objective = best_cost;
  *out_E = best_E;
  *out_n_assigned = (int32_t)best_S.size();
  for (size_t i = 0; i < best_S.size(); ++i) out_assigned[i] = best_S[i];
  return timed_out ? 1 : 0;
}

}  // namespace

// The canonical incumbent loop over structures: visits `order` (already
// sorted ascending by (optimistic, mask)), solving the per-E optimal
// conflict-free covering assignment by DFS; identical semantics and
// tie-breaks to solver/segenum.py's _replay + _PerStructure.best_for.
// Shared by the full-enumeration entry (solve_segenum), the
// bound-filtered wide entry (solve_segenum_list) and the consolidated
// round solver (round_solver.cpp) -- hence external linkage.
// seed_gain: an external DFS floor (-inf to disable). The caller derives
// it from a FEASIBLE incumbent cost c as g_total - c - granularity, so
// "gain > seed_gain" admits exactly the assignments with cost <= c
// (objectives are multiples of the granularity); since the global
// optimum c* satisfies c* <= c, the first structure attaining c* is
// still found and the canonical result is unchanged -- intermediate
// incumbent updates with cost > c are skipped, which only weakens the
// (ascending-optimistic) early break, never the answer.
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
    double* out_objective, uint64_t* out_E) {
  return run_enum_t<uint64_t>(
      n_reads, I_masks, C_masks, garbage, seg_len, gap_counts, gap_masks,
      gap_lens, n_incomp, incomp_pairs, sc, eps, off, order, order_opt,
      n_order, t_end, seed_gain, out_assigned, out_n_assigned, out_objective,
      out_E);
}

// Two-word (Mi <= 128) canonical replay. Word arrays are little-endian
// [n][2] uint64 pairs (lo, hi); the enum runs on unsigned __int128 with
// semantics identical to the u64 form (same visit order -- numeric mask
// ascension -- same tie-breaks, same per-E scan).
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
    double* out_objective, uint64_t* out_E2) {
  typedef unsigned __int128 u128;
  auto widen = [](const uint64_t* w2, int64_t n) {
    std::vector<u128> v((size_t)std::max<int64_t>(n, 1), 0);
    for (int64_t i = 0; i < n; ++i)
      v[i] = (u128)w2[2 * i] | ((u128)w2[2 * i + 1] << 64);
    return v;
  };
  int total_gaps = 0;
  for (int i = 0; i < n_reads; ++i) total_gaps += gap_counts[i];
  std::vector<u128> I = widen(I_masks2, n_reads);
  std::vector<u128> C = widen(C_masks2, n_reads);
  std::vector<u128> gm = widen(gap_masks2, total_gaps);
  std::vector<u128> ord = widen(order2, n_order);
  u128 E = 0;
  int st = run_enum_t<u128>(
      n_reads, I.data(), C.data(), garbage, seg_len, gap_counts, gm.data(),
      gap_lens, n_incomp, incomp_pairs, sc, eps, off, ord.data(), order_opt,
      n_order, t_end, seed_gain, out_assigned, out_n_assigned, out_objective,
      &E);
  out_E2[0] = (uint64_t)E;
  out_E2[1] = (uint64_t)(E >> 64);
  return st;
}

extern "C" {

// Returns 0 = OPTIMAL, 1 = TIMEOUT, -1 = Mi too large.
// Mi up to 20 is supported (no O(N * 2^Mi) tables are materialized).
int solve_segenum(
    int n_reads, int n_segs,
    const uint32_t* I_masks,   // [n_reads]
    const uint32_t* C_masks,   // [n_reads]
    const double* garbage,     // [n_reads]
    const int64_t* seg_len,    // [n_segs]
    const int32_t* gap_counts, // [n_reads]
    const uint32_t* gap_masks, // [total_gaps]
    const int64_t* gap_lens,   // [total_gaps]
    int n_incomp,
    const int32_t* incomp_pairs,  // [n_incomp][2] (read indices)
    int64_t sc, int64_t eps, int64_t off,
    double deadline_s,
    // outputs
    int32_t* out_assigned, int32_t* out_n_assigned,
    double* out_objective, uint32_t* out_E) {
  if (n_segs > 20) return -1;
  const int Mi = n_segs;
  const uint32_t n_masks = 1u << Mi;
  auto t_end = std::chrono::steady_clock::now() +
               std::chrono::microseconds((int64_t)(deadline_s * 1e6));

  double g_total = 0;
  for (int i = 0; i < n_reads; ++i) g_total += garbage[i];

  // Widen the u32 ABI inputs once; run_enum works on u64 masks so the
  // same loop serves this full enumeration and the wide/closure replays.
  std::vector<uint64_t> I64(n_reads), C64(n_reads);
  for (int i = 0; i < n_reads; ++i) {
    I64[i] = I_masks[i];
    C64[i] = C_masks[i];
  }
  int total_gaps = 0;
  for (int i = 0; i < n_reads; ++i) total_gaps += gap_counts[i];
  std::vector<uint64_t> gm64(total_gaps ? total_gaps : 1, 0);
  for (int g = 0; g < total_gaps; ++g) gm64[g] = gap_masks[g];

  // Optimistic cost per structure: subset-compatible positive-profit
  // reads, ignoring gap windows (a valid lower bound; gap checks are
  // deferred to the per-E candidate scan so no (N x 2^Mi) table with gap
  // loops is materialized).
  std::vector<double> optimistic(n_masks, 0.0);
  for (uint32_t E = 0; E < n_masks; ++E) {
    double pos_gain = 0.0;
    for (int i = 0; i < n_reads; ++i) {
      if (I_masks[i] & ~E) continue;
      double d = garbage[i] - (double)__builtin_popcount(C_masks[i] & E);
      if (d > 0) pos_gain += d;
    }
    optimistic[E] = g_total - pos_gain;
  }

  // Visit order: ascending (optimistic, E).
  std::vector<uint64_t> order(n_masks);
  for (uint32_t e = 0; e < n_masks; ++e) order[e] = e;
  std::stable_sort(order.begin(), order.end(), [&](uint64_t a, uint64_t b) {
    if (optimistic[a] != optimistic[b]) return optimistic[a] < optimistic[b];
    return a < b;
  });
  std::vector<double> order_opt(n_masks);
  for (uint32_t e = 0; e < n_masks; ++e) order_opt[e] = optimistic[order[e]];

  uint64_t E64 = 0;
  int status = freddie_run_enum(n_reads, I64.data(), C64.data(), garbage, seg_len,
                        gap_counts, gm64.data(), gap_lens, n_incomp,
                        incomp_pairs, sc, eps, off, order.data(),
                        order_opt.data(), (int64_t)n_masks, t_end,
                        -std::numeric_limits<double>::infinity(),
                        out_assigned, out_n_assigned, out_objective, &E64);
  *out_E = (uint32_t)E64;
  return status;
}

// Canonical replay over an explicit pre-sorted (mask, optimistic) list.
// Serves two escalations (both computed by solver/segenum.py):
//   - wide (20 < Mi <= 26): the XLA kernel bounds every mask, masks that
//     could beat the incumbent survive;
//   - union-closure (20 < Mi <= 64 here; the two-word entry below takes
//     over to Mi <= 128): the closure of the reads' I-masks
//     under OR -- exactly the coverable structures -- with bounds from
//     the same formula.
// Per-E semantics are the established bit-equal twin of the Python
// best_for, so the result is identical to the Python _replay over the
// same list.
int solve_segenum_list(
    int n_reads, int n_segs,
    const uint64_t* I_masks, const uint64_t* C_masks, const double* garbage,
    const int64_t* seg_len,
    const int32_t* gap_counts, const uint64_t* gap_masks,
    const int64_t* gap_lens,
    int n_incomp, const int32_t* incomp_pairs,
    int64_t sc, int64_t eps, int64_t off,
    const uint64_t* order,      // [n_order] pre-sorted masks
    const double* order_opt,    // [n_order] their optimistic bounds
    int64_t n_order,
    double deadline_s,
    double seed_gain,           // external DFS floor; -inf disables
    int32_t* out_assigned, int32_t* out_n_assigned,
    double* out_objective, uint64_t* out_E) {
  if (n_segs > 64) return -1;
  auto t_end = std::chrono::steady_clock::now() +
               std::chrono::microseconds((int64_t)(deadline_s * 1e6));
  return freddie_run_enum(n_reads, I_masks, C_masks, garbage, seg_len, gap_counts,
                  gap_masks, gap_lens, n_incomp, incomp_pairs, sc, eps, off,
                  order, order_opt, n_order, t_end, seed_gain,
                  out_assigned, out_n_assigned, out_objective, out_E);
}

// Two-word form of solve_segenum_list (64 < Mi <= 128): all mask inputs
// are little-endian [n][2] uint64 pairs; out_E is [2]. Semantics are the
// u128 instantiation of the same canonical replay.
int solve_segenum_list_w2(
    int n_reads, int n_segs,
    const uint64_t* I_masks2, const uint64_t* C_masks2, const double* garbage,
    const int64_t* seg_len,
    const int32_t* gap_counts, const uint64_t* gap_masks2,
    const int64_t* gap_lens,
    int n_incomp, const int32_t* incomp_pairs,
    int64_t sc, int64_t eps, int64_t off,
    const uint64_t* order2,     // [n_order][2] pre-sorted masks
    const double* order_opt,    // [n_order] their optimistic bounds
    int64_t n_order,
    double deadline_s,
    double seed_gain,           // external DFS floor; -inf disables
    int32_t* out_assigned, int32_t* out_n_assigned,
    double* out_objective, uint64_t* out_E2) {
  if (n_segs > 128) return -1;
  auto t_end = std::chrono::steady_clock::now() +
               std::chrono::microseconds((int64_t)(deadline_s * 1e6));
  return freddie_run_enum_w2(
      n_reads, I_masks2, C_masks2, garbage, seg_len, gap_counts, gap_masks2,
      gap_lens, n_incomp, incomp_pairs, sc, eps, off, order2, order_opt,
      n_order, t_end, seed_gain, out_assigned, out_n_assigned, out_objective,
      out_E2);
}

}  // extern "C"
