// b2txt_tpu native runtime: word-synchronous CTC beam search with n-gram
// fusion, C++ host implementation.
//
// This is the native counterpart of the reference's C++ decode stack
// (runtime/core/decoder/* + kaldi token passing), rebuilt for the FST-free
// design: it loads an ARPA n-gram and a pronunciation lexicon directly,
// walks a phoneme trie, and scores words at SIL boundaries — the exact
// semantics of b2txt_tpu.decode.lmbeam (the Python host searcher), which is
// its correctness oracle. Used for low-latency host decoding when the TPU is
// busy with the RNN, and as the high-throughput offline decode path.
//
// Self-contained: C++17, no external dependencies. Exposed through a C API
// (see capi section) consumed via ctypes from b2txt_tpu.runtime.
//
// Reference semantics carried over (citations into the reference repo):
//   - acoustic_scale / nbest      lm_decoder.cc:30-35
//   - blank_penalty (log-domain)  lm_decoder.cc:14-37
//   - blank-skip + re-inserted blank frame  ctc_wfst_beam_search.cc:70-121
//   - ac/lm score split           brain_speech_decoder.h:100-108

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <fstream>
#include <iostream>
#include <limits>
#include <memory>
#include <sstream>
#include <string>
#include <unordered_map>
#include <vector>

namespace b2t {

constexpr int kMaxCtx = 8;
constexpr float kNegInf = -std::numeric_limits<float>::infinity();
constexpr double kLog10 = 2.302585092994046;
constexpr double kNoProb = -99.0 * kLog10;

static inline double LogAdd(double a, double b) {
  if (a == kNegInf) return b;
  if (b == kNegInf) return a;
  double m = std::max(a, b);
  return m + std::log1p(std::exp(std::min(a, b) - m));
}

// ---------------------------------------------------------------- n-gram LM

struct NGramLM {
  // key: packed word-id sequence hash; value: (logp, backoff) natural log
  struct Entry {
    float logp;
    float backoff;
  };
  int order = 0;
  std::vector<std::unordered_map<uint64_t, Entry>> tables;
  std::unordered_map<std::string, int> word_ids;  // includes <s>,</s>,<unk>
  std::vector<std::string> words;
  int bos = -1, eos = -1, unk = -1;

  static uint64_t HashIds(const int* ids, int n) {
    uint64_t h = 1469598103934665603ull;  // FNV offset
    for (int i = 0; i < n; ++i) {
      h ^= static_cast<uint64_t>(ids[i] + 1);
      h *= 1099511628211ull;  // FNV prime
    }
    return h;
  }

  int Intern(const std::string& w) {
    auto it = word_ids.find(w);
    if (it != word_ids.end()) return it->second;
    int id = static_cast<int>(words.size());
    word_ids.emplace(w, id);
    words.push_back(w);
    return id;
  }

  bool LoadArpa(const std::string& path) {
    std::ifstream f(path);
    if (!f) return false;
    std::string line;
    // find \data\ header
    while (std::getline(f, line) && line.find("\\data\\") == std::string::npos) {
    }
    std::vector<size_t> counts;
    while (std::getline(f, line)) {
      if (line.rfind("ngram ", 0) == 0) {
        counts.push_back(std::stoul(line.substr(line.find('=') + 1)));
      } else if (!line.empty() && line[0] == '\\') {
        break;
      }
    }
    order = static_cast<int>(counts.size());
    tables.assign(order, {});
    int cur = 0;
    // `line` holds "\1-grams:" at this point
    do {
      if (line.empty()) continue;
      if (line[0] == '\\') {
        if (line.find("-grams:") != std::string::npos) {
          cur = std::stoi(line.substr(1));
        } else if (line.find("\\end\\") != std::string::npos) {
          break;
        }
        continue;
      }
      if (cur == 0) continue;
      std::istringstream ss(line);
      double logp;
      if (!(ss >> logp)) continue;
      int ids[8];
      std::string w;
      bool ok = true;
      for (int i = 0; i < cur; ++i) {
        if (!(ss >> w)) {
          ok = false;
          break;
        }
        ids[i] = Intern(w);
      }
      if (!ok) continue;
      double bow = 0.0;
      ss >> bow;  // optional
      Entry e{static_cast<float>(logp * kLog10),
              static_cast<float>(bow * kLog10)};
      tables[cur - 1][HashIds(ids, cur)] = e;
    } while (std::getline(f, line));

    auto find = [&](const char* w) {
      auto it = word_ids.find(w);
      return it == word_ids.end() ? -1 : it->second;
    };
    bos = find("<s>");
    eos = find("</s>");
    unk = find("<unk>");
    return true;
  }

  // log P(word | context); context = last (order-1) ids, most recent last.
  float LogP(const int* ctx, int ctx_len, int word) const {
    if (word < 0) word = unk;
    if (word < 0) return static_cast<float>(kNoProb);
    int start = std::max(0, ctx_len - (order - 1));
    const int* c = ctx + start;
    int n = ctx_len - start;
    double bo_sum = 0.0;
    while (true) {
      int gram[8];
      for (int i = 0; i < n; ++i) gram[i] = c[i];
      gram[n] = word;
      if (n + 1 <= order) {
        auto it = tables[n].find(HashIds(gram, n + 1));
        if (it != tables[n].end() && it->second.logp > kNoProb + 1e-3) {
          return static_cast<float>(bo_sum + it->second.logp);
        }
      }
      if (n == 0) {
        auto it = tables[0].find(HashIds(&word, 1));
        double p = (it != tables[0].end()) ? it->second.logp : kNoProb;
        if (p <= kNoProb + 1e-3 && unk >= 0 && word != unk) {
          auto itu = tables[0].find(HashIds(&unk, 1));
          if (itu != tables[0].end()) p = itu->second.logp;
        }
        return static_cast<float>(bo_sum + p);
      }
      auto bo = tables[n - 1].find(HashIds(c, n));
      if (bo != tables[n - 1].end()) bo_sum += bo->second.backoff;
      ++c;
      --n;
    }
  }
};

// ----------------------------------------------------------------- lexicon

struct Lexicon {
  // trie over phoneme ids (model channel order, SIL excluded from arcs)
  int n_phones = 41;
  std::vector<std::vector<int>> next;       // [node][phone] -> node or -1
  std::vector<std::vector<int>> words_at;   // [node] -> lm word ids
  std::vector<std::string> out_words;       // decode-output word strings
  std::unordered_map<std::string, int> phone_ids;

  Lexicon() {
    static const char* kPhones[] = {
        "BLANK", "AA", "AE", "AH", "AO", "AW", "AY", "B",  "CH", "D",  "DH",
        "EH",    "ER", "EY", "F",  "G",  "HH", "IH", "IY", "JH", "K",  "L",
        "M",     "N",  "NG", "OW", "OY", "P",  "R",  "S",  "SH", "T",  "TH",
        "UH",    "UW", "V",  "W",  "Y",  "Z",  "ZH"};
    for (int i = 0; i < 40; ++i) phone_ids[kPhones[i]] = i;
    next.emplace_back(n_phones, -1);
    words_at.emplace_back();
  }

  // Load "WORD  P1 P2 ..." lines; words interned into `lm` for LM ids.
  bool Load(const std::string& path, NGramLM* lm) {
    std::ifstream f(path);
    if (!f) return false;
    std::string line;
    while (std::getline(f, line)) {
      if (line.empty() || line[0] == ';' || line[0] == '#') continue;
      std::istringstream ss(line);
      std::string word;
      ss >> word;
      // strip (N) alternate markers
      auto paren = word.find('(');
      if (paren != std::string::npos) word = word.substr(0, paren);
      std::string lower = word;
      for (auto& ch : lower) ch = static_cast<char>(std::tolower(ch));
      std::vector<int> pron;
      std::string p;
      bool ok = true;
      while (ss >> p) {
        // strip stress digits
        while (!p.empty() && std::isdigit(static_cast<unsigned char>(p.back())))
          p.pop_back();
        auto it = phone_ids.find(p);
        if (it == phone_ids.end()) {
          ok = false;
          break;
        }
        pron.push_back(it->second);
      }
      if (!ok || pron.empty()) continue;
      int lm_id = lm->Intern(lower);
      if (lm_id >= static_cast<int>(out_words.size()))
        out_words.resize(lm_id + 1);
      out_words[lm_id] = lower;
      int node = 0;
      for (int pid : pron) {
        int& child = next[node][pid];
        if (child < 0) {
          child = static_cast<int>(next.size());
          next.emplace_back(n_phones, -1);
          words_at.emplace_back();
        }
        node = child;
      }
      auto& ws = words_at[node];
      if (std::find(ws.begin(), ws.end(), lm_id) == ws.end())
        ws.push_back(lm_id);
    }
    return true;
  }
};

// ------------------------------------------------------------- beam search

struct Options {
  double acoustic_scale = 0.325;
  double blank_penalty = 90.0;
  double blank_skip_thresh = 1.0;
  double length_penalty = 0.0;
  double beam = 17.0;          // score-window prune relative to best
  int nbest = 100;
  int beam_width = 128;
  int max_homophones = 4;
  int first_beam = 0;          // restrict phone extensions to the frame's
                               // top-k phones (0 = all); SIL always kept
};

struct Decoder {
  const NGramLM* lm;
  const Lexicon* lex;
  Options opts;
  int blank = 0, sil = 40;

  // word-history arena: (word, parent index), deduped so that identical word
  // histories share one node and hypotheses merge correctly
  std::vector<std::pair<int, int>> arena;
  std::unordered_map<int64_t, int> arena_index;

  int ArenaNode(int word, int parent) {
    int64_t key = (static_cast<int64_t>(parent + 1) << 21) | word;
    auto it = arena_index.find(key);
    if (it != arena_index.end()) return it->second;
    arena.emplace_back(word, parent);
    int idx = static_cast<int>(arena.size()) - 1;
    arena_index.emplace(key, idx);
    return idx;
  }

  struct Hyp {
    int word_node = -1;  // arena index, -1 = empty history
    int node = 0;        // trie node
    int last = -1;       // last emitted phone
    double s = kNegInf, ns = kNegInf;      // ranking (scaled ac + lm)
    double ac_s = kNegInf, ac_ns = kNegInf;
    double lm_score = 0.0;
    double Score() const { return LogAdd(s, ns); }
    // blank/non-blank acoustic parts combine by log-sum (path marginal);
    // duplicates merge by max (viterbi) — mirrors lmbeam.py's ac tracking
    double Ac() const { return LogAdd(ac_s, ac_ns); }
  };

  std::vector<Hyp> hyps;
  int n_frames = 0;
  bool pending_blank = false;
  // per-utterance memo of n-gram lookups: beams revisit the same
  // (context, word) pairs on nearly every frame
  std::unordered_map<uint64_t, double> lm_cache;

  double CachedLogP(const int* ctx, int ctx_len, int w) {
    int key_ids[kMaxCtx + 1];
    int n = 0;
    for (int i = 0; i < ctx_len; ++i) key_ids[n++] = ctx[i];
    key_ids[n++] = w;
    uint64_t key = NGramLM::HashIds(key_ids, n);
    auto it = lm_cache.find(key);
    if (it != lm_cache.end()) return it->second;
    double v = lm->LogP(ctx, ctx_len, w);
    lm_cache.emplace(key, v);
    return v;
  }

  struct Key {
    int64_t a;
    int64_t b;
    bool operator==(const Key& o) const { return a == o.a && b == o.b; }
  };
  struct KeyHash {
    size_t operator()(const Key& k) const {
      return std::hash<int64_t>()(k.a * 1000003 + k.b);
    }
  };

  std::vector<double> la;  // per-node LM lookahead (best reachable unigram)

  explicit Decoder(const NGramLM* lm_, const Lexicon* lex_) : lm(lm_), lex(lex_) {
    // Bottom-up lookahead smearing (nodes are created parent-before-child).
    int n_nodes = static_cast<int>(lex->next.size());
    la.assign(n_nodes, kNegInf);
    for (int node = n_nodes - 1; node >= 0; --node) {
      double best = kNegInf;
      for (int w : lex->words_at[node])
        best = std::max(best, static_cast<double>(lm->LogP(nullptr, 0, w)));
      for (int child : lex->next[node])
        if (child >= 0) best = std::max(best, la[child]);
      la[node] = best;
    }
    Reset();
  }

  void Reset() {
    arena.clear();
    arena_index.clear();
    lm_cache.clear();
    hyps.clear();
    Hyp root;
    root.s = 0.0;
    root.ac_s = 0.0;
    hyps.push_back(root);
    n_frames = 0;
    pending_blank = false;
    finalized_.clear();
    has_final_ = false;
  }

  void Context(int word_node, int* ctx, int* ctx_len) const {
    int tmp[8];
    int n = 0;
    int cur = word_node;
    while (cur >= 0 && n < lm->order - 1) {
      tmp[n++] = arena[cur].first;
      cur = arena[cur].second;
    }
    int m = 0;
    ctx[m++] = lm->bos;  // sentence-start conditioning (G.fst start state)
    for (int i = n - 1; i >= 0; --i) ctx[m++] = tmp[i];
    *ctx_len = m;
  }

  void Step(const float* lp) {
    std::unordered_map<Key, Hyp, KeyHash> next_map;
    next_map.reserve(hyps.size() * 8);
    const double scale = opts.acoustic_scale;

    auto merge = [&](int word_node, int node, int last, double s, double ns,
                     double ac_s, double ac_ns, double lm_score) {
      Key k{(static_cast<int64_t>(word_node) << 20) ^ node,
            static_cast<int64_t>(last)};
      auto it = next_map.find(k);
      if (it == next_map.end()) {
        Hyp h;
        h.word_node = word_node;
        h.node = node;
        h.last = last;
        h.s = s;
        h.ns = ns;
        h.ac_s = ac_s;
        h.ac_ns = ac_ns;
        h.lm_score = lm_score;
        next_map.emplace(k, h);
      } else {
        Hyp& h = it->second;
        h.s = LogAdd(h.s, s);
        h.ns = LogAdd(h.ns, ns);
        h.ac_s = std::max(h.ac_s, ac_s);
        h.ac_ns = std::max(h.ac_ns, ac_ns);
      }
    };

    int ctx[8];
    int ctx_len;
    const int V = lex->n_phones;
    // first-beam prune: threshold at the k-th best phone log-prob this frame
    float fb_thresh = -std::numeric_limits<float>::infinity();
    if (opts.first_beam > 0 && opts.first_beam < V - 2) {
      std::vector<float> vals;
      vals.reserve(V - 2);
      for (int c = 1; c < V; ++c)
        if (c != sil) vals.push_back(lp[c]);
      std::nth_element(vals.begin(), vals.begin() + opts.first_beam - 1,
                       vals.end(), std::greater<float>());
      fb_thresh = vals[opts.first_beam - 1];
    }
    double window_cutoff = -std::numeric_limits<double>::infinity();
    if (!hyps.empty() && opts.beam > 0)
      window_cutoff = hyps.front().Score() - opts.beam;

    for (const Hyp& h : hyps) {
      double score = h.Score();
      if (score < window_cutoff) continue;
      double ac = h.Ac();
      // blank / absorbed repeat (stay)
      merge(h.word_node, h.node, h.last, score + scale * lp[blank], kNegInf,
            ac + lp[blank], kNegInf, h.lm_score);
      if (h.last >= 0 && h.ns != kNegInf) {
        merge(h.word_node, h.node, h.last, kNegInf, h.ns + scale * lp[h.last],
              kNegInf, h.ac_ns + lp[h.last], h.lm_score);
      }
      // extensions
      for (int c = 1; c < V; ++c) {
        if (c != sil && lp[c] < fb_thresh) continue;
        double base = (c == h.last) ? h.s : score;
        double ac_base = (c == h.last) ? h.ac_s : ac;
        if (base == kNegInf) continue;
        double lc = lp[c];
        if (c == sil) {
          if (h.node == 0) {
            merge(h.word_node, 0, sil, kNegInf, base + scale * lc, kNegInf,
                  ac_base + lc, h.lm_score);
          }
          const auto& ws = lex->words_at[h.node];
          if (!ws.empty()) {
            Context(h.word_node, ctx, &ctx_len);
            int limit = std::min<int>(ws.size(), opts.max_homophones);
            for (int j = 0; j < limit; ++j) {
              double wlp =
                  CachedLogP(ctx, ctx_len, ws[j]) + opts.length_penalty;
              int wn = ArenaNode(ws[j], h.word_node);
              // swap lookahead for the true LM score; re-enter root lookahead
              double la_adj = la[0] - la[h.node];
              merge(wn, 0, sil, kNegInf, base + scale * lc + wlp + la_adj,
                    kNegInf, ac_base + lc, h.lm_score + wlp);
            }
          }
        } else {
          int child = lex->next[h.node][c];
          if (child < 0) continue;
          merge(h.word_node, child, c, kNegInf,
                base + scale * lc + (la[child] - la[h.node]), kNegInf,
                ac_base + lc, h.lm_score);
        }
      }
    }

    std::vector<Hyp> ranked;
    ranked.reserve(next_map.size());
    for (auto& kv : next_map) ranked.push_back(kv.second);
    std::sort(ranked.begin(), ranked.end(),
              [](const Hyp& a, const Hyp& b) { return a.Score() > b.Score(); });
    if (static_cast<int>(ranked.size()) > opts.beam_width)
      ranked.resize(opts.beam_width);
    if (!ranked.empty() && opts.beam > 0) {
      double cutoff = ranked[0].Score() - opts.beam;
      while (!ranked.empty() && ranked.back().Score() < cutoff)
        ranked.pop_back();
    }
    hyps.swap(ranked);
  }

  void Decode(const float* logprobs, int T, int C) {
    std::vector<float> row(C);
    double log_bp = std::log(opts.blank_penalty);
    for (int t = 0; t < T; ++t) {
      const float* src = logprobs + static_cast<int64_t>(t) * C;
      if (opts.blank_skip_thresh < 1.0 &&
          std::exp(static_cast<double>(src[blank]) - log_bp) >
              opts.blank_skip_thresh) {
        pending_blank = true;
        ++n_frames;
        continue;
      }
      if (pending_blank) {
        std::fill(row.begin(), row.end(), -30.0f);
        row[blank] = 0.0f;
        Step(row.data());
        pending_blank = false;
      }
      std::copy(src, src + C, row.begin());
      row[blank] -= static_cast<float>(log_bp);
      Step(row.data());
      ++n_frames;
    }
    has_final_ = false;
  }

  struct Result {
    std::string sentence;
    double ac_score;
    double lm_score;
  };

  std::vector<Result> finalized_;
  bool has_final_ = false;

  std::string Sentence(int word_node, int extra_word) const {
    std::vector<int> ws;
    if (extra_word >= 0) ws.push_back(extra_word);
    int cur = word_node;
    while (cur >= 0) {
      ws.push_back(arena[cur].first);
      cur = arena[cur].second;
    }
    std::string out;
    for (int i = static_cast<int>(ws.size()) - 1; i >= 0; --i) {
      if (!out.empty()) out += ' ';
      out += lex->out_words[ws[i]];
    }
    return out;
  }

  const std::vector<Result>& Finalize() {
    struct Cand {
      double score;
      double ac;
      double lms;
      int word_node;
      int extra;
    };
    std::vector<Cand> cands;
    int ctx[8];
    int ctx_len;
    for (const Hyp& h : hyps) {
      double score = h.Score();
      if (score == kNegInf) continue;
      if (h.node == 0) {
        Context(h.word_node, ctx, &ctx_len);
        double e = CachedLogP(ctx, ctx_len, lm->eos);
        cands.push_back({score + e, h.Ac(), h.lm_score + e, h.word_node, -1});
      } else {
        const auto& ws = lex->words_at[h.node];
        Context(h.word_node, ctx, &ctx_len);
        int limit = std::min<int>(ws.size(), opts.max_homophones);
        for (int j = 0; j < limit; ++j) {
          double wlp = CachedLogP(ctx, ctx_len, ws[j]) + opts.length_penalty;
          // shift context for </s>
          int ctx2[8];
          int n2 = std::min(ctx_len + 1, lm->order - 1);
          int src_start = ctx_len + 1 - n2;
          for (int i = 0; i < n2; ++i) {
            int idx = src_start + i;
            ctx2[i] = (idx < ctx_len) ? ctx[idx] : ws[j];
          }
          double e = CachedLogP(ctx2, n2, lm->eos);
          // lookahead cancellation so all final candidates share la[0]
          double la_adj = la[0] - la[h.node];
          cands.push_back({score + wlp + la_adj + e, h.Ac(),
                           h.lm_score + wlp + e, h.word_node, ws[j]});
        }
      }
    }
    std::sort(cands.begin(), cands.end(),
              [](const Cand& a, const Cand& b) { return a.score > b.score; });
    finalized_.clear();
    std::unordered_map<std::string, bool> seen;
    for (const Cand& c : cands) {
      if (static_cast<int>(finalized_.size()) >= opts.nbest) break;
      std::string s = Sentence(c.word_node, c.extra);
      if (s.empty() || seen.count(s)) continue;
      seen[s] = true;
      finalized_.push_back({s, c.ac, c.lms});
    }
    has_final_ = true;
    return finalized_;
  }

  Result Partial() const {
    if (hyps.empty()) return {"", 0.0, 0.0};
    const Hyp* best = &hyps[0];
    for (const Hyp& h : hyps)
      if (h.Score() > best->Score()) best = &h;
    return {Sentence(best->word_node, -1), best->Ac(), best->lm_score};
  }
};

}  // namespace b2t

// ------------------------------------------------------------------- C API

struct B2TDecoder {
  b2t::NGramLM lm;
  b2t::Lexicon lex;
  std::unique_ptr<b2t::Decoder> dec;
};

extern "C" {

void* b2t_create(const char* arpa_path, const char* lexicon_path) {
  auto* d = new B2TDecoder();
  if (!d->lm.LoadArpa(arpa_path) || !d->lex.Load(lexicon_path, &d->lm)) {
    delete d;
    return nullptr;
  }
  d->dec = std::make_unique<b2t::Decoder>(&d->lm, &d->lex);
  return d;
}

void b2t_destroy(void* p) { delete static_cast<B2TDecoder*>(p); }

void b2t_reset(void* p) { static_cast<B2TDecoder*>(p)->dec->Reset(); }

void b2t_set_opt(void* p, double acoustic_scale, double blank_penalty,
                 double blank_skip_thresh, double length_penalty, int nbest,
                 int beam_width, double beam, int max_homophones,
                 int first_beam) {
  auto& o = static_cast<B2TDecoder*>(p)->dec->opts;
  o.acoustic_scale = acoustic_scale;
  o.blank_penalty = blank_penalty;
  o.blank_skip_thresh = blank_skip_thresh;
  o.length_penalty = length_penalty;
  o.nbest = nbest;
  o.beam_width = beam_width;
  o.beam = beam;
  o.max_homophones = max_homophones;
  o.first_beam = first_beam;
}

void b2t_decode(void* p, const float* logprobs, int T, int C) {
  static_cast<B2TDecoder*>(p)->dec->Decode(logprobs, T, C);
}

// Pack results as "sentence\tac\tlm\n" lines into out. Returns bytes written.
static int PackResults(const std::vector<b2t::Decoder::Result>& rs, char* out,
                       int cap) {
  std::string buf;
  for (const auto& r : rs) {
    buf += r.sentence;
    buf += '\t';
    buf += std::to_string(r.ac_score);
    buf += '\t';
    buf += std::to_string(r.lm_score);
    buf += '\n';
  }
  int n = std::min<int>(buf.size(), cap - 1);
  std::memcpy(out, buf.data(), n);
  out[n] = '\0';
  return n;
}

int b2t_finalize(void* p, char* out, int cap) {
  auto& rs = static_cast<B2TDecoder*>(p)->dec->Finalize();
  return PackResults(rs, out, cap);
}

int b2t_partial(void* p, char* out, int cap) {
  auto r = static_cast<B2TDecoder*>(p)->dec->Partial();
  return PackResults({r}, out, cap);
}

}  // extern "C"
