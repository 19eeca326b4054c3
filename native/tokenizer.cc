// Native SPM tokenizer: the bigram-merge loop in C++.
//
// The reference tokenizes in C++ (llm_tokenizer_spm,
// /root/reference/models/ggml/llama.cpp:3063-3211); the Python
// implementation (ctransformers_tpu/tokenizers/spm.py) is the semantic
// reference and fallback — this runtime must match it token-for-token.
// Python merge-loop throughput is ~0.25 MB/s, which puts seconds of host
// time in front of a long-context prefill; this loop runs ~2 orders of
// magnitude faster.
//
// Exact-parity notes (mirroring spm.py):
//   * max-heap on (score, -left, -insertion_counter): pop the highest
//     score, ties to the smallest left index, further ties in insertion
//     order (llm_bigram_spm::comparator + heapq counter).
//   * stale-entry checks: both symbols still alive AND their combined
//     byte length equals the queued entry's.
//   * rev_merge is keyed by CONTENT (std::string), like the reference —
//     a later try_add of the same content overwrites the earlier entry.
//   * GGUF mode resegments unmatched symbols through rev_merge and falls
//     back to <0xXX> byte tokens; legacy (pre-GGUF) mode does a direct
//     lookup then per-codepoint raw-piece fallback, no resegmentation.

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <limits>
#include <queue>
#include <string>
#include <unordered_map>
#include <vector>

namespace {

struct Vocab {
  std::unordered_map<std::string, int32_t> piece_to_id;
  std::vector<float> scores;
  bool legacy = false;
};

struct Bigram {
  float score;
  int32_t left;
  int64_t counter;
  int32_t right;
  int32_t size;  // combined byte length at insertion time
};

struct BigramLess {  // priority_queue pops the "largest"
  bool operator()(const Bigram& a, const Bigram& b) const {
    if (a.score != b.score) return a.score < b.score;
    if (a.left != b.left) return a.left > b.left;
    return a.counter > b.counter;
  }
};

// UTF-8 sequence length from the first byte (llama.cpp utf8_len)
static inline int utf8_len(uint8_t c) {
  static const int lut[16] = {1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 2, 2, 3, 4};
  return lut[c >> 4];
}

struct Sym {
  int32_t off;
  int32_t len;  // 0 = consumed by a merge
  int32_t prev;
  int32_t next;
};

}  // namespace

extern "C" {

// pieces: concatenated UTF-8 blob; offs[n+1] prefix offsets; scores[n].
void* ct_spm_new(const char* blob, const int64_t* offs, const float* scores,
                 int32_t n, int32_t legacy) {
  Vocab* v = new Vocab();
  v->legacy = legacy != 0;
  v->scores.assign(scores, scores + n);
  v->piece_to_id.reserve((size_t)n * 2);
  for (int32_t i = 0; i < n; i++) {
    std::string p(blob + offs[i], (size_t)(offs[i + 1] - offs[i]));
    // later duplicates overwrite — Python dict-assignment parity
    v->piece_to_id[std::move(p)] = i;
  }
  return v;
}

void ct_spm_free(void* h) { delete static_cast<Vocab*>(h); }

// Tokenize pre-escaped text; returns token count (<= cap) or -1 on error.
int64_t ct_spm_tokenize(void* h, const char* text, int64_t len, int32_t* out,
                        int64_t cap) {
  const Vocab& v = *static_cast<Vocab*>(h);
  int64_t n_out = 0;
  if (len <= 0) return 0;

  // initial symbols: one per UTF-8 codepoint
  std::vector<Sym> syms;
  syms.reserve((size_t)len);
  for (int64_t i = 0; i < len;) {
    int l = utf8_len((uint8_t)text[i]);
    if (i + l > len) l = (int)(len - i);
    Sym s;
    s.off = (int32_t)i;
    s.len = l;
    s.prev = (int32_t)syms.size() - 1;
    s.next = (i + l < len) ? (int32_t)syms.size() + 1 : -1;
    syms.push_back(s);
    i += l;
  }

  std::priority_queue<Bigram, std::vector<Bigram>, BigramLess> heap;
  std::unordered_map<std::string, std::pair<int32_t, int32_t>> rev_merge;
  int64_t counter = 0;

  auto try_add = [&](int32_t left, int32_t right) {
    if (left == -1 || right == -1) return;
    std::string t(text + syms[left].off,
                  (size_t)(syms[left].len + syms[right].len));
    auto it = v.piece_to_id.find(t);
    if (it == v.piece_to_id.end()) return;
    int32_t tid = it->second;
    if (tid >= (int32_t)v.scores.size()) return;
    heap.push(Bigram{v.scores[tid], left, counter++, right,
                     syms[left].len + syms[right].len});
    rev_merge[t] = {left, right};
  };

  for (size_t i = 1; i < syms.size(); i++)
    try_add((int32_t)i - 1, (int32_t)i);

  while (!heap.empty()) {
    Bigram bg = heap.top();
    heap.pop();
    Sym& l = syms[bg.left];
    Sym& r = syms[bg.right];
    if (l.len == 0 || r.len == 0) continue;
    if (l.len + r.len != bg.size) continue;  // stale
    l.len += r.len;
    r.len = 0;
    l.next = r.next;
    if (r.next >= 0) syms[r.next].prev = bg.left;
    try_add(l.prev, bg.left);
    try_add(bg.left, l.next);
  }

  auto emit = [&](int32_t id) -> bool {
    if (n_out >= cap) return false;
    out[n_out++] = id;
    return true;
  };

  char bytebuf[8];
  // iterative resegment (explicit stack; Python recursion equivalent)
  std::vector<std::pair<int32_t, int32_t>> stack;  // (off, len)
  for (int32_t i = 0; i != -1; i = syms[i].next) {
    stack.clear();
    stack.push_back({syms[i].off, syms[i].len});
    while (!stack.empty()) {
      auto [off, sl] = stack.back();
      stack.pop_back();
      std::string t(text + off, (size_t)sl);
      auto it = v.piece_to_id.find(t);
      if (it != v.piece_to_id.end()) {
        if (!emit(it->second)) return -1;
        continue;
      }
      if (v.legacy) {
        // raw per-codepoint fallback (llama-ggml.cpp:2030-2036)
        for (int32_t j = 0; j < sl;) {
          int cl = utf8_len((uint8_t)text[off + j]);
          if (j + cl > sl) cl = sl - j;
          std::string c(text + off + j, (size_t)cl);
          auto ci = v.piece_to_id.find(c);
          if (ci != v.piece_to_id.end() && !emit(ci->second)) return -1;
          j += cl;
        }
        continue;
      }
      auto mi = rev_merge.find(t);
      if (mi == rev_merge.end()) {
        // byte fallback (llama_byte_to_token, llama.cpp:3037-3042)
        for (int32_t j = 0; j < sl; j++) {
          std::snprintf(bytebuf, sizeof(bytebuf), "<0x%02X>",
                        (uint8_t)text[off + j]);
          auto bi = v.piece_to_id.find(bytebuf);
          if (bi != v.piece_to_id.end() && !emit(bi->second)) return -1;
        }
        continue;
      }
      // push right first so left pops (and emits) first; spans are the
      // symbols' CURRENT state, exactly like the Python/reference
      // resegment (which reads syms[p] at final-merge state)
      int32_t lc = mi->second.first, rc = mi->second.second;
      stack.push_back({syms[rc].off, syms[rc].len});
      stack.push_back({syms[lc].off, syms[lc].len});
    }
  }
  return n_out;
}

}  // extern "C"

// ---------------------------------------------------------------------------
// BPE (GGUF "gpt2" tokenizer model; falcon) — rank-ordered pair merges per
// pre-split word (llm_tokenizer_bpe, llama.cpp:3213-3388). The GPT-2 regex
// pre-split stays in Python (C-backed re module); this runs the merge loop
// over all words in one call. Python reference: tokenizers/bpe.py.
// ---------------------------------------------------------------------------

namespace {

struct BPEVocab {
  std::unordered_map<std::string, int32_t> piece_to_id;
  // key = left + '\0' + right (merge pieces are text-line tokens and can
  // never contain NUL, so the join is unambiguous)
  std::unordered_map<std::string, int32_t> ranks;
};

struct BPEEntry {
  int32_t rank;
  int32_t left;
  std::string text;  // pair content at insertion (staleness check)
  int32_t right;
};

// Python heap tuple order: (rank, left, text_pair, right) min-heap
struct BPELess {  // priority_queue pops "largest" => invert
  bool operator()(const BPEEntry& a, const BPEEntry& b) const {
    if (a.rank != b.rank) return a.rank > b.rank;
    if (a.left != b.left) return a.left > b.left;
    if (a.text != b.text) return a.text > b.text;
    return a.right > b.right;
  }
};

}  // namespace

extern "C" {

void* ct_bpe_new(const char* pieces_blob, const int64_t* p_offs,
                 int32_t n_pieces, const char* merge_blob,
                 const int64_t* m_offs, int32_t n_merges) {
  BPEVocab* v = new BPEVocab();
  v->piece_to_id.reserve((size_t)n_pieces * 2);
  for (int32_t i = 0; i < n_pieces; i++) {
    std::string p(pieces_blob + p_offs[i], (size_t)(p_offs[i + 1] - p_offs[i]));
    v->piece_to_id[std::move(p)] = i;  // later duplicates overwrite
  }
  v->ranks.reserve((size_t)n_merges * 2);
  for (int32_t r = 0; r < n_merges; r++) {
    std::string key(merge_blob + m_offs[2 * r],
                    (size_t)(m_offs[2 * r + 1] - m_offs[2 * r]));
    key.push_back('\0');
    key.append(merge_blob + m_offs[2 * r + 1],
               (size_t)(m_offs[2 * r + 2] - m_offs[2 * r + 1]));
    // duplicate pair lines: the later rank overwrites (dict parity)
    v->ranks[std::move(key)] = r;
  }
  return v;
}

void ct_bpe_free(void* h) { delete static_cast<BPEVocab*>(h); }

// words: concatenated pre-split word bytes; w_offs[n_words+1] prefixes.
int64_t ct_bpe_tokenize(void* h, const char* words, const int64_t* w_offs,
                        int32_t n_words, int32_t* out, int64_t cap) {
  const BPEVocab& v = *static_cast<BPEVocab*>(h);
  int64_t n_out = 0;
  std::vector<Sym> syms;
  std::priority_queue<BPEEntry, std::vector<BPEEntry>, BPELess> heap;

  for (int32_t w = 0; w < n_words; w++) {
    const char* base = words + w_offs[w];
    int64_t wlen = w_offs[w + 1] - w_offs[w];
    if (wlen <= 0) continue;
    syms.clear();
    for (int64_t i = 0; i < wlen;) {
      int l = utf8_len((uint8_t)base[i]);
      if (i + l > wlen) l = (int)(wlen - i);
      Sym s;
      s.off = (int32_t)i;
      s.len = l;
      s.prev = (int32_t)syms.size() - 1;
      s.next = (i + l < wlen) ? (int32_t)syms.size() + 1 : -1;
      syms.push_back(s);
      i += l;
    }
    while (!heap.empty()) heap.pop();

    auto try_add = [&](int32_t left, int32_t right) {
      if (left == -1 || right == -1) return;
      std::string key(base + syms[left].off, (size_t)syms[left].len);
      key.push_back('\0');
      key.append(base + syms[right].off, (size_t)syms[right].len);
      auto it = v.ranks.find(key);
      if (it == v.ranks.end()) return;
      std::string text(base + syms[left].off, (size_t)syms[left].len);
      text.append(base + syms[right].off, (size_t)syms[right].len);
      heap.push(BPEEntry{it->second, left, std::move(text), right});
    };

    for (size_t i = 1; i < syms.size(); i++)
      try_add((int32_t)i - 1, (int32_t)i);

    while (!heap.empty()) {
      BPEEntry e = heap.top();
      heap.pop();
      Sym& l = syms[e.left];
      Sym& r = syms[e.right];
      if (l.len == 0 || r.len == 0) continue;
      if ((size_t)(l.len + r.len) != e.text.size() ||
          std::memcmp(base + l.off, e.text.data(), l.len) != 0 ||
          std::memcmp(base + r.off, e.text.data() + l.len, r.len) != 0)
        continue;  // outdated entry
      l.len += r.len;
      r.len = 0;
      l.next = r.next;
      if (r.next >= 0) syms[r.next].prev = e.left;
      try_add(l.prev, e.left);
      try_add(e.left, l.next);
    }

    for (int32_t i = 0; i != -1; i = syms[i].next) {
      if (syms[i].len == 0) continue;
      std::string t(base + syms[i].off, (size_t)syms[i].len);
      auto it = v.piece_to_id.find(t);
      if (it != v.piece_to_id.end()) {
        if (n_out >= cap) return -1;
        out[n_out++] = it->second;
        continue;
      }
      // single-codepoint fallback (llama.cpp:3316-3326)
      for (int32_t j = 0; j < syms[i].len;) {
        int cl = utf8_len((uint8_t)base[syms[i].off + j]);
        if (j + cl > syms[i].len) cl = syms[i].len - j;
        std::string c(base + syms[i].off + j, (size_t)cl);
        auto ci = v.piece_to_id.find(c);
        if (ci != v.piece_to_id.end()) {
          if (n_out >= cap) return -1;
          out[n_out++] = ci->second;
        }
        j += cl;
      }
    }
  }
  return n_out;
}

}  // extern "C"

// ---------------------------------------------------------------------------
// Greedy longest-match tokenizer (the "GGML example" models; reference
// models/common.h:66-125). Byte-keyed vocab, per pre-split word: repeatedly
// take the longest vocabulary entry; unknown single bytes are skipped
// (the Python fallback additionally logs a warning — log-only difference).
// Python reference: tokenizers/greedy.py.
// ---------------------------------------------------------------------------

namespace {

struct GreedyVocab {
  std::unordered_map<std::string, int32_t> token_to_id;
  size_t max_len = 0;
};

}  // namespace

extern "C" {

void* ct_greedy_new(const char* blob, const int64_t* offs, int32_t n) {
  GreedyVocab* v = new GreedyVocab();
  v->token_to_id.reserve((size_t)n * 2);
  for (int32_t i = 0; i < n; i++) {
    std::string t(blob + offs[i], (size_t)(offs[i + 1] - offs[i]));
    if (t.size() > v->max_len) v->max_len = t.size();
    v->token_to_id[std::move(t)] = i;  // later duplicates overwrite
  }
  return v;
}

void ct_greedy_free(void* h) { delete static_cast<GreedyVocab*>(h); }

int64_t ct_greedy_tokenize(void* h, const char* words, const int64_t* w_offs,
                           int32_t n_words, int32_t* out, int64_t cap) {
  const GreedyVocab& v = *static_cast<GreedyVocab*>(h);
  int64_t n_out = 0;
  std::string key;
  for (int32_t w = 0; w < n_words; w++) {
    const char* base = words + w_offs[w];
    int64_t n = w_offs[w + 1] - w_offs[w];
    int64_t i = 0;
    while (i < n) {
      bool matched = false;
      int64_t jmax = n - 1;
      if ((size_t)(jmax - i + 1) > v.max_len) jmax = i + (int64_t)v.max_len - 1;
      for (int64_t j = jmax; j >= i; j--) {
        key.assign(base + i, (size_t)(j - i + 1));
        auto it = v.token_to_id.find(key);
        if (it != v.token_to_id.end()) {
          if (n_out >= cap) return -1;
          out[n_out++] = it->second;
          i = j + 1;
          matched = true;
          break;
        }
      }
      if (!matched) i++;  // unknown byte skipped (warning logged in Python)
    }
  }
  return n_out;
}

}  // extern "C"

// ---------------------------------------------------------------------------
// Unigram / Viterbi (replit; reference models/llms/replit.cc:57-127): one
// min-cost DP pass over codepoints, piece cost = -score, prefix seeded with
// 1.0 (reference quirk), unknown text -> [0]. Python reference:
// tokenizers/unigram.py. Costs accumulate in double (Python float parity).
// ---------------------------------------------------------------------------

namespace {

struct UniVocab {
  std::unordered_map<std::string, int32_t> ids;
  std::unordered_map<std::string, double> costs;
  int32_t max_cp_len = 1;  // longest piece in CODEPOINTS (Python max_len)
};

static int32_t count_codepoints(const char* s, size_t n) {
  int32_t c = 0;
  for (size_t i = 0; i < n;) {
    int l = utf8_len((uint8_t)s[i]);
    if (i + l > n) l = (int)(n - i);
    i += l;
    c++;
  }
  return c;
}

}  // namespace

extern "C" {

void* ct_uni_new(const char* blob, const int64_t* offs, const float* scores,
                 int32_t n) {
  UniVocab* v = new UniVocab();
  v->ids.reserve((size_t)n * 2);
  v->costs.reserve((size_t)n * 2);
  for (int32_t i = 0; i < n; i++) {
    std::string p(blob + offs[i], (size_t)(offs[i + 1] - offs[i]));
    int32_t cl = count_codepoints(p.data(), p.size());
    if (cl > v->max_cp_len) v->max_cp_len = cl;
    // later duplicates overwrite (dict parity)
    v->costs[p] = -(double)scores[i];
    v->ids[std::move(p)] = i;
  }
  return v;
}

void ct_uni_free(void* h) { delete static_cast<UniVocab*>(h); }

// text: pre-escaped (spaces -> U+2581) UTF-8. Returns count or -1.
int64_t ct_uni_tokenize(void* h, const char* text, int64_t len, int32_t* out,
                        int64_t cap) {
  const UniVocab& v = *static_cast<UniVocab*>(h);
  if (len <= 0) return 0;
  // codepoint boundaries
  std::vector<int32_t> bnd;
  bnd.push_back(0);
  for (int64_t i = 0; i < len;) {
    int l = utf8_len((uint8_t)text[i]);
    if (i + l > len) l = (int)(len - i);
    i += l;
    bnd.push_back((int32_t)i);
  }
  int32_t n = (int32_t)bnd.size() - 1;
  const double inf = std::numeric_limits<double>::infinity();
  std::vector<int32_t> best_start(n + 1, -1);
  std::vector<double> best_score(n + 1, inf);
  best_start[0] = 0;
  best_score[0] = 1.0;  // reference seed (replit.cc:64)
  std::string key;
  for (int32_t start = 0; start < n; start++) {
    double bs = best_score[start];
    if (bs == inf) continue;
    int32_t stop = start + v.max_cp_len;
    if (stop > n) stop = n;
    for (int32_t end = start + 1; end <= stop; end++) {
      key.assign(text + bnd[start], (size_t)(bnd[end] - bnd[start]));
      auto it = v.costs.find(key);
      if (it == v.costs.end()) continue;
      double score = it->second + bs;
      if (score < best_score[end]) {
        best_score[end] = score;
        best_start[end] = start;
      }
    }
  }
  if (best_score[n] == inf) {
    if (cap < 1) return -1;
    out[0] = 0;  // reference fallback (replit.cc:87-90)
    return 1;
  }
  std::vector<int32_t> rev;
  int32_t end = n, start = best_start[end];
  while (true) {
    key.assign(text + bnd[start], (size_t)(bnd[end] - bnd[start]));
    rev.push_back(v.ids.at(key));
    if (start == 0) break;
    end = start;
    start = best_start[start];
  }
  if ((int64_t)rev.size() > cap) return -1;
  int64_t n_out = 0;
  for (auto it = rev.rbegin(); it != rev.rend(); ++it) out[n_out++] = *it;
  return n_out;
}

}  // extern "C"
