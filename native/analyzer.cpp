// Native lexical analyzer for optimized_rag_tpu.
//
// The ingestion-side O(corpus) host work — lowercasing, word splitting,
// stopword filtering, FNV-1a vocabulary hashing, and per-document term
// counting — is the one hot loop that stays on the host CPU (everything
// numeric runs on TPU). The reference does this in Python per query
// (rag/retrieval.py:324-347 rebuilds BM25 per call); here it runs once at
// index time, and this C++ path makes large-corpus builds fast.
//
// Bit-compatibility contract (tested against the Python implementation in
// index/lexical.py / models/tokenizer.py):
//   token boundaries: maximal [a-z0-9] runs after ASCII lowercasing
//   stopwords: identical list
//   term id: FNV-1a(token bytes) % vocab_size   (lexical analyzer)
//            NUM_SPECIAL + FNV-1a % (vocab - NUM_SPECIAL)  (model tokenizer)
//
// Build: make -C native        (produces liborag_native.so)
// Loaded via ctypes in optimized_rag_tpu/native.py with Python fallback.

#include <cstdint>
#include <cstring>
#include <memory>
#include <mutex>
#include <string>
#include <unordered_map>
#include <unordered_set>
#include <vector>

namespace {

constexpr uint32_t kFnvOffset = 2166136261u;
constexpr uint32_t kFnvPrime = 16777619u;

inline uint32_t fnv1a(const char* data, size_t len) {
  uint32_t h = kFnvOffset;
  for (size_t i = 0; i < len; ++i) {
    h ^= static_cast<unsigned char>(data[i]);
    h *= kFnvPrime;
  }
  return h;
}

const std::unordered_set<std::string>& Stopwords() {
  // Must match _STOPWORDS in optimized_rag_tpu/index/lexical.py.
  static const std::unordered_set<std::string>* kSet =
      new std::unordered_set<std::string>{
          "a",     "an",   "and",  "are",  "as",   "at",   "be",
          "by",    "for",  "from", "has",  "he",   "in",   "is",
          "it",    "its",  "of",   "on",   "or",   "that", "the",
          "to",    "was",  "were", "will", "with", "this", "these",
          "those", "i",    "you",  "we",   "they", "what", "which",
          "who"};
  return *kSet;
}

inline bool is_word_byte(unsigned char c) {
  return (c >= 'a' && c <= 'z') || (c >= '0' && c <= '9');
}

// Python's \s over ASCII: \t \n \v \f \r, space, and \x1c-\x1f (file/
// group/record/unit separators are unicode whitespace in Python 3).
// The tokenizer regexes emit a single token for ANY other non-word
// char — including control bytes like \x01 or \x7f — so the native
// paths must too, or the same text yields different id sequences
// depending on .so availability (verified divergence on "a\x7fb").
inline bool is_py_space(unsigned char c) {
  return c == ' ' || (c >= '\t' && c <= '\r') ||
         (c >= 0x1c && c <= 0x1f);
}

// Must match _light_stem in optimized_rag_tpu/index/lexical.py:
// suffix strip + trailing-double-consonant collapse + trailing-e strip;
// digit-bearing tokens (bfloat16, v5e) pass through unchanged.
inline void light_stem(std::string& w) {
  for (char c : w) {
    if (c >= '0' && c <= '9') return;
  }
  static const char* kSufs[] = {"ings", "ing", "edly", "ed", "es", "s",
                                "ly"};
  for (const char* s : kSufs) {
    const size_t sl = std::strlen(s);
    if (w.size() >= sl + 3 &&
        w.compare(w.size() - sl, sl, s) == 0) {
      w.resize(w.size() - sl);
      break;
    }
  }
  auto vowel = [](char c) {
    return c == 'a' || c == 'e' || c == 'i' || c == 'o' || c == 'u';
  };
  if (w.size() > 3 && w[w.size() - 1] == w[w.size() - 2] &&
      !vowel(w[w.size() - 1])) {
    w.pop_back();
  }
  if (w.size() > 3 && w.back() == 'e') w.pop_back();
}

template <typename Fn>
void for_each_token(const char* text, int64_t len, Fn&& fn) {
  std::string tok;
  tok.reserve(32);
  for (int64_t i = 0; i <= len; ++i) {
    unsigned char c = i < len ? static_cast<unsigned char>(text[i]) : 0;
    if (c >= 'A' && c <= 'Z') c += 32;  // ASCII lowercase
    if (i < len && is_word_byte(c)) {
      tok.push_back(static_cast<char>(c));
    } else if (!tok.empty()) {
      if (!Stopwords().count(tok)) {
        light_stem(tok);
        fn(tok);
      }
      tok.clear();
    }
  }
}

}  // namespace

extern "C" {

// Tokenize into hashed term ids (stopwords removed).
// Returns number of ids written (capped at max_out).
int64_t orag_tokenize(const char* text, int64_t len, int64_t vocab_size,
                      int32_t* out_ids, int64_t max_out) {
  int64_t n = 0;
  for_each_token(text, len, [&](const std::string& tok) {
    if (n < max_out) {
      out_ids[n++] =
          static_cast<int32_t>(fnv1a(tok.data(), tok.size()) % vocab_size);
    }
  });
  return n;
}

// Per-document term counting: unique (term_id, tf) pairs + doc length.
// Returns number of unique terms written (capped at max_terms).
// *doc_len receives the total (post-stopword) token count.
int64_t orag_term_counts(const char* text, int64_t len, int64_t vocab_size,
                         int32_t* out_terms, int32_t* out_tf,
                         int64_t max_terms, int64_t* doc_len) {
  std::unordered_map<int32_t, int32_t> counts;
  int64_t total = 0;
  for_each_token(text, len, [&](const std::string& tok) {
    ++total;
    ++counts[static_cast<int32_t>(fnv1a(tok.data(), tok.size()) %
                                  vocab_size)];
  });
  *doc_len = total;
  int64_t n = 0;
  for (const auto& kv : counts) {
    if (n >= max_terms) break;
    out_terms[n] = kv.first;
    out_tf[n] = kv.second;
    ++n;
  }
  return n;
}

// Model-tokenizer hashing (models/tokenizer.py HashTokenizer._tid):
// id = NUM_SPECIAL + fnv1a(token) % (vocab_size - NUM_SPECIAL).
// Tokens here are [a-z0-9]+ runs OR single non-alnum printable ASCII chars
// (the tokenizer's `[^\sa-z0-9]` branch), with trigram sub-tokens for
// words longer than split_len.
int64_t orag_model_tokenize(const char* text, int64_t len,
                            int64_t vocab_size, int64_t num_special,
                            int64_t split_len, int32_t* out_ids,
                            int64_t max_out) {
  const int64_t space = vocab_size - num_special;
  int64_t n = 0;
  auto emit = [&](const char* data, size_t l) {
    if (n < max_out) {
      out_ids[n++] = static_cast<int32_t>(num_special +
                                          fnv1a(data, l) % space);
    }
  };
  std::string tok;
  tok.reserve(32);
  auto flush_word = [&]() {
    if (tok.empty()) return;
    emit(tok.data(), tok.size());
    if (static_cast<int64_t>(tok.size()) > split_len) {
      // Python: range(0, len(w) - 2, 3) -> i < len - 2 stepping 3.
      for (size_t i = 0; i + 2 < tok.size(); i += 3) {
        std::string tri = "##" + tok.substr(i, 3);
        emit(tri.data(), tri.size());
      }
    }
    tok.clear();
  };
  for (int64_t i = 0; i < len; ++i) {
    unsigned char c = static_cast<unsigned char>(text[i]);
    if (c >= 'A' && c <= 'Z') c += 32;
    if (is_word_byte(c)) {
      tok.push_back(static_cast<char>(c));
    } else {
      flush_word();
      // Single punctuation token for every non-space byte (parity with
      // the Python regex [^\sa-z0-9], which matches control bytes too).
      if (!is_py_space(c) && c < 128) {
        char single = static_cast<char>(c);
        emit(&single, 1);
      }
    }
  }
  flush_word();
  return n;
}

// ---------------------------------------------------------------------------
// Learned-vocabulary model tokenizer (models/tokenizer.py VocabTokenizer):
// vocab hit -> num_special + word_index (collision-free head vocabulary);
// miss -> hash_base + fnv1a % (vocab_size - hash_base), with trigram
// sub-tokens ONLY for out-of-vocabulary words longer than split_len.
// Handle-based: build once per tokenizer, tokenize from any thread
// (concurrent reads of an immutable map are safe).

namespace {

struct VocabState {
  std::unordered_map<std::string, int32_t> vocab;
  int64_t vocab_size = 0;
  int64_t num_special = 0;
  int64_t hash_base = 0;
  int64_t space = 0;
  int64_t split_len = 0;
};

std::mutex& VocabMutex() {
  static std::mutex* m = new std::mutex();
  return *m;
}

std::unordered_map<int64_t, std::unique_ptr<VocabState>>& VocabRegistry() {
  static auto* reg =
      new std::unordered_map<int64_t, std::unique_ptr<VocabState>>();
  return *reg;
}

}  // namespace

// words: newline-separated blob, id = num_special + line index.
// Returns a handle (>0) or 0 on error.
int64_t orag_vocab_build(const char* words, int64_t blob_len,
                         int64_t vocab_size, int64_t num_special,
                         int64_t split_len) {
  auto state = std::make_unique<VocabState>();
  state->vocab_size = vocab_size;
  state->num_special = num_special;
  state->split_len = split_len;
  int32_t next_id = static_cast<int32_t>(num_special);
  const char* p = words;
  const char* end = words + blob_len;
  while (p < end) {
    const char* nl = static_cast<const char*>(
        memchr(p, '\n', static_cast<size_t>(end - p)));
    size_t wl = nl ? static_cast<size_t>(nl - p)
                   : static_cast<size_t>(end - p);
    if (wl > 0) {
      state->vocab.emplace(std::string(p, wl), next_id++);
    }
    p = nl ? nl + 1 : end;
  }
  state->hash_base = next_id;
  state->space = vocab_size - state->hash_base;
  if (state->space <= 0) return 0;
  std::lock_guard<std::mutex> lock(VocabMutex());
  static int64_t next_handle = 1;
  int64_t h = next_handle++;
  VocabRegistry()[h] = std::move(state);
  return h;
}

void orag_vocab_free(int64_t handle) {
  std::lock_guard<std::mutex> lock(VocabMutex());
  VocabRegistry().erase(handle);
}

int64_t orag_vocab_tokenize(int64_t handle, const char* text, int64_t len,
                            int32_t* out_ids, int64_t max_out) {
  const VocabState* st;
  {
    std::lock_guard<std::mutex> lock(VocabMutex());
    auto it = VocabRegistry().find(handle);
    if (it == VocabRegistry().end()) return -1;
    st = it->second.get();
  }
  int64_t n = 0;
  auto hash_id = [&](const char* data, size_t l) {
    return static_cast<int32_t>(st->hash_base + fnv1a(data, l) % st->space);
  };
  auto emit = [&](int32_t id) {
    if (n < max_out) out_ids[n++] = id;
  };
  std::string tok;
  tok.reserve(32);
  auto flush_word = [&]() {
    if (tok.empty()) return;
    auto hit = st->vocab.find(tok);
    if (hit != st->vocab.end()) {
      emit(hit->second);
    } else {
      emit(hash_id(tok.data(), tok.size()));
      if (static_cast<int64_t>(tok.size()) > st->split_len) {
        for (size_t i = 0; i + 2 < tok.size(); i += 3) {
          std::string tri = "##" + tok.substr(i, 3);
          // trigram pieces contain '#', never in the word vocabulary
          emit(hash_id(tri.data(), tri.size()));
        }
      }
    }
    tok.clear();
  };
  for (int64_t i = 0; i < len; ++i) {
    unsigned char c = static_cast<unsigned char>(text[i]);
    if (c >= 'A' && c <= 'Z') c += 32;
    if (is_word_byte(c)) {
      tok.push_back(static_cast<char>(c));
    } else {
      flush_word();
      if (!is_py_space(c) && c < 128) {
        // single token for every non-space byte (Python-regex parity;
        // see is_py_space): vocab lookup first (single non-alnum chars
        // can be learned words), then hash.
        char single = static_cast<char>(c);
        std::string s1(1, single);
        auto hit = st->vocab.find(s1);
        emit(hit != st->vocab.end() ? hit->second
                                    : hash_id(&single, 1));
      }
    }
  }
  flush_word();
  return n;
}

}  // extern "C"
