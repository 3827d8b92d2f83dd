// Native WFST beam-Viterbi decoder: the TPU-era counterpart of the
// reference's external Kaldi decode stage (latgen-faster-mapped over an
// HCLG graph; /root/reference/recipes/timit/local_pyspeech/decode_dnn.sh:128-143).
//
// The graph is an OpenFst-style text-format WFST over the tropical
// semiring: lines "src dst ilabel olabel [cost]" plus final lines
// "state [cost]"; state 0 is the start state. Input labels are
// pdf-id + 1 (0 = epsilon), output labels are word ids (0 = epsilon) —
// the convention emitted by speech_recognition_tools_tpu/decode/graph.py,
// which statically expands HMM x lexicon x n-gram into this form.
//
// Decoding is the classic token-passing one-best search with per-frame
// beam pruning and a max-active cap (Kaldi faster-decoder semantics):
// acoustic cost = -acoustic_scale * loglike[t][pdf]; epsilon arcs are
// relaxed to closure after each emitting step. Backpointers live in a
// per-decode arena so the traceback is O(path length).

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <limits>
#include <string>
#include <unordered_map>
#include <vector>

namespace {

struct Arc {
  int32_t ilabel;
  int32_t olabel;
  int32_t dst;
  float w;
};

struct Fst {
  int32_t num_states = 0;
  std::vector<int32_t> offsets;  // num_states + 1
  std::vector<Arc> arcs;         // sorted by src
  std::vector<float> final_cost; // +inf if not final
};

constexpr float kInf = std::numeric_limits<float>::infinity();

struct BackPtr {
  int32_t prev;    // index into arena (-1 for root)
  int32_t olabel;  // 0 if none
};

struct Token {
  float cost;
  int32_t bp;  // arena index
};

// N-best token: tokens at a state are kept distinct by the hash of
// their word history (hist), so alternative word sequences survive the
// per-state recombination (the standard word-lattice N-best trick).
struct NToken {
  float cost;
  int32_t bp;
  uint64_t hist;
};

inline uint64_t hist_extend(uint64_t h, int32_t olabel) {
  if (olabel == 0) return h;
  return h * 1000003ULL + (uint64_t)olabel;
}

}  // namespace

extern "C" {

void* fst_load(const char* path) {
  FILE* f = std::fopen(path, "r");
  if (!f) return nullptr;
  struct Raw { int32_t s, d, il, ol; float w; };
  std::vector<Raw> raw;
  std::vector<std::pair<int32_t, float>> finals;
  int32_t max_state = -1;
  char line[512];
  while (std::fgets(line, sizeof(line), f)) {
    long long s, d, il, ol;
    double w;
    int n = std::sscanf(line, "%lld %lld %lld %lld %lf", &s, &d, &il, &ol, &w);
    if (n >= 4) {
      raw.push_back({(int32_t)s, (int32_t)d, (int32_t)il, (int32_t)ol,
                     n == 5 ? (float)w : 0.0f});
      max_state = std::max(max_state, std::max((int32_t)s, (int32_t)d));
    } else {
      n = std::sscanf(line, "%lld %lf", &s, &w);
      if (n >= 1) {
        finals.push_back({(int32_t)s, n == 2 ? (float)w : 0.0f});
        max_state = std::max(max_state, (int32_t)s);
      }
    }
  }
  std::fclose(f);
  if (max_state < 0) return nullptr;

  Fst* fst = new Fst();
  fst->num_states = max_state + 1;
  fst->final_cost.assign(fst->num_states, kInf);
  for (auto& p : finals) fst->final_cost[p.first] = p.second;
  std::vector<int32_t> counts(fst->num_states, 0);
  for (auto& a : raw) counts[a.s]++;
  fst->offsets.assign(fst->num_states + 1, 0);
  for (int32_t i = 0; i < fst->num_states; ++i)
    fst->offsets[i + 1] = fst->offsets[i] + counts[i];
  fst->arcs.resize(raw.size());
  std::vector<int32_t> fill(fst->offsets.begin(), fst->offsets.end() - 1);
  for (auto& a : raw)
    fst->arcs[fill[a.s]++] = {a.il, a.ol, a.d, a.w};
  return fst;
}

void fst_free(void* h) { delete static_cast<Fst*>(h); }

int32_t fst_num_states(void* h) { return static_cast<Fst*>(h)->num_states; }
int64_t fst_num_arcs(void* h) {
  return (int64_t)static_cast<Fst*>(h)->arcs.size();
}

// Decode T frames of P-dim log-likelihoods. Returns the number of output
// words written to out_words (<= out_cap), or -1 on error / no path.
// out_cost receives the best total cost (graph + acoustic + final).
int32_t fst_decode(void* h, const float* loglikes, int32_t T, int32_t P,
                   float acoustic_scale, float beam, int32_t max_active,
                   int32_t* out_words, int32_t out_cap, float* out_cost) {
  Fst* fst = static_cast<Fst*>(h);
  if (!fst || T < 0 || P <= 0) return -1;

  std::vector<BackPtr> arena;
  arena.reserve(1 << 16);

  // cur: state -> Token (hash map keeps it sparse on big graphs)
  std::unordered_map<int32_t, Token> cur, nxt;
  cur.reserve(1024);
  arena.push_back({-1, 0});
  cur[0] = {0.0f, 0};

  std::vector<int32_t> queue;

  auto eps_closure = [&](std::unordered_map<int32_t, Token>& toks) {
    queue.clear();
    for (auto& kv : toks) queue.push_back(kv.first);
    while (!queue.empty()) {
      int32_t s = queue.back();
      queue.pop_back();
      Token tok = toks[s];
      for (int32_t i = fst->offsets[s]; i < fst->offsets[s + 1]; ++i) {
        const Arc& a = fst->arcs[i];
        if (a.ilabel != 0) continue;
        float c = tok.cost + a.w;
        auto it = toks.find(a.dst);
        if (it == toks.end() || c < it->second.cost) {
          int32_t bp = (int32_t)arena.size();
          arena.push_back({tok.bp, a.olabel});
          toks[a.dst] = {c, bp};
          queue.push_back(a.dst);
        }
      }
    }
  };

  auto prune = [&](std::unordered_map<int32_t, Token>& toks) {
    if (toks.empty()) return;
    float best = kInf;
    for (auto& kv : toks) best = std::min(best, kv.second.cost);
    float thresh = best + beam;
    if (max_active > 0 && (int32_t)toks.size() > max_active) {
      std::vector<float> costs;
      costs.reserve(toks.size());
      for (auto& kv : toks) costs.push_back(kv.second.cost);
      std::nth_element(costs.begin(), costs.begin() + max_active - 1,
                       costs.end());
      thresh = std::min(thresh, costs[max_active - 1]);
    }
    for (auto it = toks.begin(); it != toks.end();)
      it = (it->second.cost > thresh) ? toks.erase(it) : std::next(it);
  };

  eps_closure(cur);
  prune(cur);

  for (int32_t t = 0; t < T; ++t) {
    const float* frame = loglikes + (int64_t)t * P;
    nxt.clear();
    for (auto& kv : cur) {
      int32_t s = kv.first;
      const Token& tok = kv.second;
      for (int32_t i = fst->offsets[s]; i < fst->offsets[s + 1]; ++i) {
        const Arc& a = fst->arcs[i];
        if (a.ilabel == 0) continue;
        int32_t pdf = a.ilabel - 1;
        if (pdf >= P) return -1;
        float c = tok.cost + a.w - acoustic_scale * frame[pdf];
        auto it = nxt.find(a.dst);
        if (it == nxt.end() || c < it->second.cost) {
          int32_t bp = (int32_t)arena.size();
          arena.push_back({tok.bp, a.olabel});
          nxt[a.dst] = {c, bp};
        }
      }
    }
    std::swap(cur, nxt);
    if (cur.empty()) return -1;  // fell off the beam everywhere
    eps_closure(cur);
    prune(cur);
  }

  // best final token
  float best = kInf;
  int32_t best_bp = -1;
  for (auto& kv : cur) {
    float fc = fst->final_cost[kv.first];
    if (fc == kInf) continue;
    float c = kv.second.cost + fc;
    if (c < best) {
      best = c;
      best_bp = kv.second.bp;
    }
  }
  if (best_bp < 0) {
    // no reachable final state: fall back to best token (Kaldi's
    // partial-result behaviour)
    for (auto& kv : cur) {
      if (kv.second.cost < best) {
        best = kv.second.cost;
        best_bp = kv.second.bp;
      }
    }
    if (best_bp < 0) return -1;
  }
  if (out_cost) *out_cost = best;

  std::vector<int32_t> words;
  for (int32_t bp = best_bp; bp >= 0; bp = arena[bp].prev)
    if (arena[bp].olabel != 0) words.push_back(arena[bp].olabel);
  std::reverse(words.begin(), words.end());
  int32_t n = (int32_t)std::min<size_t>(words.size(), out_cap);
  std::memcpy(out_words, words.data(), n * sizeof(int32_t));
  return (int32_t)words.size();
}

// N-best decode: like fst_decode but each state carries up to `nbest`
// tokens with distinct word histories. Returns the number of
// hypotheses written (<= nbest); hypothesis i's words are
// out_words[out_offsets[i] : out_offsets[i] + out_lens[i]] and its
// total cost is out_costs[i], best first.
int32_t fst_decode_nbest(void* h, const float* loglikes, int32_t T,
                         int32_t P, float acoustic_scale, float beam,
                         int32_t max_active, int32_t nbest,
                         int32_t* out_words, int32_t out_cap,
                         int32_t* out_lens, float* out_costs) {
  Fst* fst = static_cast<Fst*>(h);
  if (!fst || T < 0 || P <= 0 || nbest < 1) return -1;

  std::vector<BackPtr> arena;
  arena.reserve(1 << 16);
  using Toks = std::unordered_map<int32_t, std::vector<NToken>>;
  Toks cur, nxt;
  arena.push_back({-1, 0});
  cur[0] = {{0.0f, 0, 0ULL}};

  // returns true iff the token was accepted (inserted or strictly
  // improved a slot) — strict inequalities guarantee termination of the
  // epsilon relaxation, and a rejected token's arena entry is popped by
  // the caller (safe: nothing references it yet).
  auto insert_tok = [&](std::vector<NToken>& v, const NToken& t,
                        int32_t cap) {
    for (auto& e : v) {
      if (e.hist == t.hist) {
        if (t.cost < e.cost) {
          e = t;
          return true;
        }
        return false;
      }
    }
    if ((int32_t)v.size() < cap) {
      v.push_back(t);
      return true;
    }
    int wi = 0;
    for (int i = 1; i < (int)v.size(); ++i)
      if (v[i].cost > v[wi].cost) wi = i;
    if (t.cost < v[wi].cost) {
      v[wi] = t;
      return true;
    }
    return false;
  };

  std::vector<int32_t> queue;
  auto eps_closure = [&](Toks& toks) {
    queue.clear();
    for (auto& kv : toks) queue.push_back(kv.first);
    while (!queue.empty()) {
      int32_t s = queue.back();
      queue.pop_back();
      std::vector<NToken> snapshot = toks[s];
      for (int32_t i = fst->offsets[s]; i < fst->offsets[s + 1]; ++i) {
        const Arc& a = fst->arcs[i];
        if (a.ilabel != 0) continue;
        bool changed = false;
        for (const NToken& tok : snapshot) {
          int32_t bp = (int32_t)arena.size();
          arena.push_back({tok.bp, a.olabel});
          NToken t{tok.cost + a.w, bp, hist_extend(tok.hist, a.olabel)};
          if (insert_tok(toks[a.dst], t, nbest))
            changed = true;
          else
            arena.pop_back();
        }
        if (changed) queue.push_back(a.dst);
      }
    }
  };

  auto prune = [&](Toks& toks) {
    if (toks.empty()) return;
    float best = kInf;
    for (auto& kv : toks)
      for (auto& t : kv.second) best = std::min(best, t.cost);
    float thresh = best + beam;
    if (max_active > 0) {
      std::vector<float> costs;
      for (auto& kv : toks)
        for (auto& t : kv.second) costs.push_back(t.cost);
      if ((int32_t)costs.size() > max_active) {
        std::nth_element(costs.begin(), costs.begin() + max_active - 1,
                         costs.end());
        thresh = std::min(thresh, costs[max_active - 1]);
      }
    }
    for (auto it = toks.begin(); it != toks.end();) {
      auto& v = it->second;
      v.erase(std::remove_if(v.begin(), v.end(),
                             [&](const NToken& t) {
                               return t.cost > thresh;
                             }),
              v.end());
      it = v.empty() ? toks.erase(it) : std::next(it);
    }
  };

  eps_closure(cur);
  prune(cur);

  for (int32_t t = 0; t < T; ++t) {
    const float* frame = loglikes + (int64_t)t * P;
    nxt.clear();
    for (auto& kv : cur) {
      int32_t s = kv.first;
      for (int32_t i = fst->offsets[s]; i < fst->offsets[s + 1]; ++i) {
        const Arc& a = fst->arcs[i];
        if (a.ilabel == 0) continue;
        int32_t pdf = a.ilabel - 1;
        if (pdf >= P) return -1;
        float ac = a.w - acoustic_scale * frame[pdf];
        for (const NToken& tok : kv.second) {
          int32_t bp = (int32_t)arena.size();
          arena.push_back({tok.bp, a.olabel});
          NToken nt{tok.cost + ac, bp, hist_extend(tok.hist, a.olabel)};
          if (!insert_tok(nxt[a.dst], nt, nbest)) arena.pop_back();
        }
      }
    }
    std::swap(cur, nxt);
    if (cur.empty()) return -1;
    eps_closure(cur);
    prune(cur);
  }

  // collect final hypotheses across states, dedupe by history
  std::vector<NToken> finals;
  for (auto& kv : cur) {
    float fc = fst->final_cost[kv.first];
    if (fc == kInf) continue;
    for (auto& t : kv.second)
      finals.push_back({t.cost + fc, t.bp, t.hist});
  }
  if (finals.empty())
    for (auto& kv : cur)
      for (auto& t : kv.second) finals.push_back(t);
  std::sort(finals.begin(), finals.end(),
            [](const NToken& a, const NToken& b) { return a.cost < b.cost; });

  int32_t written = 0;
  int32_t word_pos = 0;
  std::vector<uint64_t> seen;
  for (const NToken& t : finals) {
    if (written >= nbest) break;
    bool dup = false;
    for (uint64_t hh : seen) dup |= (hh == t.hist);
    if (dup) continue;
    seen.push_back(t.hist);
    std::vector<int32_t> words;
    for (int32_t bp = t.bp; bp >= 0; bp = arena[bp].prev)
      if (arena[bp].olabel != 0) words.push_back(arena[bp].olabel);
    std::reverse(words.begin(), words.end());
    if (word_pos + (int32_t)words.size() > out_cap) break;
    std::memcpy(out_words + word_pos, words.data(),
                words.size() * sizeof(int32_t));
    out_lens[written] = (int32_t)words.size();
    out_costs[written] = t.cost;
    word_pos += (int32_t)words.size();
    ++written;
  }
  return written;
}

}  // extern "C"

// ---------------------------------------------------------------------------
// Lattice-generating decode: the native counterpart of Kaldi's
// latgen-faster-mapped lattice output (reference decode_dnn.sh:128-143
// writes lat.JOB.gz; lattice-combine fuses them). Token passing keeps,
// per frame, every surviving (state) token and records *all* arcs
// between surviving tokens (not just the Viterbi backpointer); a
// backward pass then prunes nodes/links to `lattice_beam` of the best
// path. The result is a state-level lattice (epsilon arcs preserved,
// acoustic and graph costs kept separate) that Python
// (decode/lattice.py) compresses to a word lattice and uses for
// rescoring / oracle WER / system combination.

namespace {

struct LatLink {
  int32_t from, to;
  int32_t olabel;
  float graph_w, ac_w;
};

struct RawLattice {
  std::vector<int32_t> frames;  // per node; node 0 = start
  std::vector<LatLink> links;
  std::vector<int32_t> final_nodes;
  std::vector<float> final_costs;
  float best_cost = kInf;
};

}  // namespace

extern "C" {

void* fst_decode_lattice(void* h, const float* loglikes, int32_t T,
                         int32_t P, float acoustic_scale, float beam,
                         int32_t max_active, float lattice_beam) {
  Fst* fst = static_cast<Fst*>(h);
  if (!fst || T < 0 || P <= 0) return nullptr;

  // global token store: tok -> (frame, state, forward cost)
  std::vector<int32_t> tok_frame, tok_state;
  std::vector<float> tok_fwd;
  std::vector<LatLink> links;
  auto new_tok = [&](int32_t frame, int32_t state, float fwd) {
    tok_frame.push_back(frame);
    tok_state.push_back(state);
    tok_fwd.push_back(fwd);
    return (int32_t)tok_frame.size() - 1;
  };

  // per-frame active set: state -> token id
  std::unordered_map<int32_t, int32_t> cur, prev;
  std::vector<int32_t> queue;

  // epsilon relaxation of forward costs within the current frame
  auto eps_relax = [&](int32_t frame) {
    queue.clear();
    for (auto& kv : cur) queue.push_back(kv.first);
    while (!queue.empty()) {
      int32_t s = queue.back();
      queue.pop_back();
      float c0 = tok_fwd[cur[s]];
      for (int32_t i = fst->offsets[s]; i < fst->offsets[s + 1]; ++i) {
        const Arc& a = fst->arcs[i];
        if (a.ilabel != 0) continue;
        float c = c0 + a.w;
        auto it = cur.find(a.dst);
        if (it == cur.end()) {
          cur[a.dst] = new_tok(frame, a.dst, c);
          queue.push_back(a.dst);
        } else if (c < tok_fwd[it->second]) {
          tok_fwd[it->second] = c;
          queue.push_back(a.dst);
        }
      }
    }
  };

  auto prune_cur = [&]() {
    if (cur.empty()) return;
    float best = kInf;
    for (auto& kv : cur) best = std::min(best, tok_fwd[kv.second]);
    float thresh = best + beam;
    if (max_active > 0 && (int32_t)cur.size() > max_active) {
      std::vector<float> costs;
      costs.reserve(cur.size());
      for (auto& kv : cur) costs.push_back(tok_fwd[kv.second]);
      std::nth_element(costs.begin(), costs.begin() + max_active - 1,
                       costs.end());
      thresh = std::min(thresh, costs[max_active - 1]);
    }
    for (auto it = cur.begin(); it != cur.end();)
      it = (tok_fwd[it->second] > thresh) ? cur.erase(it) : std::next(it);
  };

  // one link per (surviving src token, eps arc, surviving dst token).
  // An epsilon CYCLE among surviving same-frame tokens (a degenerate
  // lexicon/LM can carry zero-cost eps loops) would make the lattice
  // cyclic and the Python topo_order() reject the whole utterance; a
  // frame-local DFS (gray/black colouring) drops exactly the links that
  // would close a cycle — every acyclic eps link is kept.
  auto emit_eps_links = [&]() {
    struct Cand { int32_t src_tok, dst_tok, olabel; float w; };
    std::vector<Cand> cands;
    std::unordered_map<int32_t, std::vector<int32_t>> adj;  // tok -> cand ids
    for (auto& kv : cur) {
      int32_t s = kv.first, tid = kv.second;
      for (int32_t i = fst->offsets[s]; i < fst->offsets[s + 1]; ++i) {
        const Arc& a = fst->arcs[i];
        if (a.ilabel != 0) continue;
        auto it = cur.find(a.dst);
        if (it != cur.end() && it->second != tid) {
          adj[tid].push_back((int32_t)cands.size());
          cands.push_back({tid, it->second, a.olabel, a.w});
        }
      }
    }
    if (cands.empty()) return;
    // deterministic DFS roots: ascending forward cost, then token id,
    // so the (rare) dropped back-edge is the costliest way around the
    // cycle, not hash-map order
    std::vector<int32_t> roots;
    roots.reserve(cur.size());
    for (auto& kv : cur) roots.push_back(kv.second);
    std::sort(roots.begin(), roots.end(), [&](int32_t x, int32_t y) {
      if (tok_fwd[x] != tok_fwd[y]) return tok_fwd[x] < tok_fwd[y];
      return x < y;
    });
    std::unordered_map<int32_t, int8_t> color;  // absent=white 1=gray 2=black
    std::vector<std::pair<int32_t, size_t>> stack;  // (tok, next child)
    for (int32_t root : roots) {
      if (color.count(root)) continue;
      color[root] = 1;
      stack.push_back({root, 0});
      while (!stack.empty()) {
        auto& top = stack.back();
        auto ai = adj.find(top.first);
        if (ai == adj.end() || top.second >= ai->second.size()) {
          color[top.first] = 2;
          stack.pop_back();
          continue;
        }
        const Cand& c = cands[ai->second[top.second++]];
        auto ci = color.find(c.dst_tok);
        int8_t dc = (ci == color.end()) ? 0 : ci->second;
        if (dc == 1) continue;  // back-edge: would close an eps cycle
        links.push_back({c.src_tok, c.dst_tok, c.olabel, c.w, 0.0f});
        if (dc == 0) {
          color[c.dst_tok] = 1;
          stack.push_back({c.dst_tok, 0});
        }
      }
    }
  };

  cur[0] = new_tok(0, 0, 0.0f);
  eps_relax(0);
  prune_cur();
  emit_eps_links();

  for (int32_t t = 0; t < T; ++t) {
    const float* frame = loglikes + (int64_t)t * P;
    std::swap(prev, cur);
    cur.clear();
    // emitting step: forward costs
    for (auto& kv : prev) {
      int32_t s = kv.first;
      float c0 = tok_fwd[kv.second];
      for (int32_t i = fst->offsets[s]; i < fst->offsets[s + 1]; ++i) {
        const Arc& a = fst->arcs[i];
        if (a.ilabel == 0) continue;
        int32_t pdf = a.ilabel - 1;
        if (pdf >= P) return nullptr;
        float c = c0 + a.w - acoustic_scale * frame[pdf];
        auto it = cur.find(a.dst);
        if (it == cur.end())
          cur[a.dst] = new_tok(t + 1, a.dst, c);
        else if (c < tok_fwd[it->second])
          tok_fwd[it->second] = c;
      }
    }
    if (cur.empty()) return nullptr;
    eps_relax(t + 1);
    prune_cur();
    // links from surviving prev tokens into surviving cur tokens
    for (auto& kv : prev) {
      int32_t s = kv.first, tid = kv.second;
      for (int32_t i = fst->offsets[s]; i < fst->offsets[s + 1]; ++i) {
        const Arc& a = fst->arcs[i];
        if (a.ilabel == 0) continue;
        auto it = cur.find(a.dst);
        if (it == cur.end()) continue;
        int32_t pdf = a.ilabel - 1;
        links.push_back({tid, it->second, a.olabel, a.w,
                         -acoustic_scale * frame[pdf]});
      }
    }
    emit_eps_links();
  }

  int32_t n_tok = (int32_t)tok_frame.size();

  // final tokens (Kaldi partial-result fallback when no final reachable)
  std::vector<std::pair<int32_t, float>> finals;
  for (auto& kv : cur) {
    float fc = fst->final_cost[kv.first];
    if (fc != kInf) finals.push_back({kv.second, fc});
  }
  if (finals.empty())
    for (auto& kv : cur) finals.push_back({kv.second, 0.0f});

  // backward costs: bwd[tok] = best cost to a final; sweep links in
  // reverse creation order (near-topological: frames ascend, eps chains
  // were relaxed in creation order) until fixpoint.
  std::vector<float> bwd(n_tok, kInf);
  for (auto& p : finals) bwd[p.first] = p.second;
  bool converged = false;
  // near-topological order converges in a few sweeps; deep misordered
  // intra-frame epsilon chains (emit_eps_links iterates a hash map) can
  // need more. Failing OPEN on non-convergence (silently over-pruned
  // lattices) is worse than failing loudly, so bail to the caller's
  // warn-and-continue path instead.
  for (int sweep = 0; sweep < 1000; ++sweep) {
    bool changed = false;
    for (auto it = links.rbegin(); it != links.rend(); ++it) {
      if (bwd[it->to] == kInf) continue;
      float c = it->graph_w + it->ac_w + bwd[it->to];
      if (c < bwd[it->from] - 1e-6f) {
        bwd[it->from] = c;
        changed = true;
      }
    }
    if (!changed) { converged = true; break; }
  }
  if (!converged) return nullptr;

  float best = kInf;
  for (int32_t i = 0; i < n_tok; ++i)
    if (bwd[i] != kInf) best = std::min(best, tok_fwd[i] + bwd[i]);
  if (best == kInf) return nullptr;
  float thresh = best + lattice_beam;

  // keep + renumber (start token must survive: fwd=0, on the best path)
  std::vector<int32_t> remap(n_tok, -1);
  RawLattice* lat = new RawLattice();
  lat->best_cost = best;
  for (int32_t i = 0; i < n_tok; ++i) {
    if (bwd[i] == kInf || tok_fwd[i] + bwd[i] > thresh) continue;
    remap[i] = (int32_t)lat->frames.size();
    lat->frames.push_back(tok_frame[i]);
  }
  for (const LatLink& l : links) {
    if (remap[l.from] < 0 || remap[l.to] < 0) continue;
    if (tok_fwd[l.from] + l.graph_w + l.ac_w + bwd[l.to] > thresh) continue;
    lat->links.push_back(
        {remap[l.from], remap[l.to], l.olabel, l.graph_w, l.ac_w});
  }
  for (auto& p : finals) {
    if (remap[p.first] < 0) continue;
    lat->final_nodes.push_back(remap[p.first]);
    lat->final_costs.push_back(p.second);
  }
  if (lat->frames.empty() || lat->final_nodes.empty()) {
    delete lat;
    return nullptr;
  }
  return lat;
}

int32_t lat_num_nodes(void* h) {
  return (int32_t)static_cast<RawLattice*>(h)->frames.size();
}
int64_t lat_num_links(void* h) {
  return (int64_t)static_cast<RawLattice*>(h)->links.size();
}
int32_t lat_num_finals(void* h) {
  return (int32_t)static_cast<RawLattice*>(h)->final_nodes.size();
}
float lat_best_cost(void* h) {
  return static_cast<RawLattice*>(h)->best_cost;
}
void lat_get_node_frames(void* h, int32_t* out) {
  RawLattice* lat = static_cast<RawLattice*>(h);
  std::memcpy(out, lat->frames.data(), lat->frames.size() * sizeof(int32_t));
}
void lat_get_links(void* h, int32_t* from, int32_t* to, int32_t* olabel,
                   float* graph_w, float* ac_w) {
  RawLattice* lat = static_cast<RawLattice*>(h);
  for (size_t i = 0; i < lat->links.size(); ++i) {
    from[i] = lat->links[i].from;
    to[i] = lat->links[i].to;
    olabel[i] = lat->links[i].olabel;
    graph_w[i] = lat->links[i].graph_w;
    ac_w[i] = lat->links[i].ac_w;
  }
}
void lat_get_finals(void* h, int32_t* nodes, float* costs) {
  RawLattice* lat = static_cast<RawLattice*>(h);
  std::memcpy(nodes, lat->final_nodes.data(),
              lat->final_nodes.size() * sizeof(int32_t));
  std::memcpy(costs, lat->final_costs.data(),
              lat->final_costs.size() * sizeof(float));
}
void lat_free(void* h) { delete static_cast<RawLattice*>(h); }

}  // extern "C"
