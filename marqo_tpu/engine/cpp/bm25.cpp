// BM25 inverted index with positional postings.
//
// Role parity: Vespa's bm25 posting lists + weakAnd retrieval + positional
// phrase matching (the reference enables `indexing: index | bm25` on
// lexical fields and ranks with per-field bm25 aggregation,
// structured_vespa_schema.py:84-101, :245-308). Okapi BM25 with k1=1.2,
// b=0.75 (Vespa defaults). Tokens arrive pre-normalized (space-separated,
// lowercased) from the Python/engine tokenizer so native and Python paths
// score identically; positions enable TRUE adjacent-phrase matching (the
// Python fallback approximates phrases conjunctively).
//
// C ABI at the bottom; Python binds via ctypes (engine/native.py).

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <string>
#include <string_view>
#include <unordered_map>
#include <vector>

namespace {

constexpr float kK1 = 1.2f;
constexpr float kB = 0.75f;

struct Posting {
  int32_t doc;
  std::vector<int32_t> positions;  // token offsets for phrase matching
};

class Bm25Index {
 public:
  void add(int32_t doc, std::string_view tokens) {
    remove(doc);
    if (doc >= int32_t(doc_lengths_.size())) {
      doc_lengths_.resize(doc + 1, -1);
    }
    int32_t position = 0;
    size_t start = 0;
    while (start < tokens.size()) {
      size_t end = tokens.find(' ', start);
      if (end == std::string_view::npos) end = tokens.size();
      if (end > start) {
        std::string term(tokens.substr(start, end - start));
        auto& postings = postings_[term];
        if (postings.empty() || postings.back().doc != doc) {
          postings.push_back({doc, {}});
        }
        postings.back().positions.push_back(position);
        position++;
      }
      start = end + 1;
    }
    doc_lengths_[doc] = position;
    total_length_ += position;
    live_docs_++;
  }

  void remove(int32_t doc) {
    if (doc < 0 || doc >= int32_t(doc_lengths_.size()) ||
        doc_lengths_[doc] < 0) {
      return;
    }
    total_length_ -= doc_lengths_[doc];
    doc_lengths_[doc] = -1;
    live_docs_--;
    // postings are lazily skipped via doc_lengths_[doc] < 0; periodic
    // compaction keeps memory bounded
    tombstones_++;
    if (tombstones_ > 1024 && tombstones_ * 4 > live_docs_) {
      compact();
    }
  }

  void compact() {
    for (auto it = postings_.begin(); it != postings_.end();) {
      auto& list = it->second;
      list.erase(std::remove_if(list.begin(), list.end(),
                                [this](const Posting& p) {
                                  return !alive(p.doc);
                                }),
                 list.end());
      if (list.empty()) {
        it = postings_.erase(it);
      } else {
        ++it;
      }
    }
    tombstones_ = 0;
  }

  bool alive(int32_t doc) const {
    return doc >= 0 && doc < int32_t(doc_lengths_.size()) &&
           doc_lengths_[doc] >= 0;
  }

  int32_t num_docs() const { return int32_t(live_docs_); }

  float avg_length() const {
    return live_docs_ ? float(total_length_) / float(live_docs_) : 0.f;
  }

  static std::vector<std::string> split_terms(std::string_view terms) {
    std::vector<std::string> out;
    size_t start = 0;
    while (start < terms.size()) {
      size_t end = terms.find(' ', start);
      if (end == std::string_view::npos) end = terms.size();
      if (end > start) out.emplace_back(terms.substr(start, end - start));
      start = end + 1;
    }
    return out;
  }

  // live document frequency of one term
  int32_t df(const std::string& term) const {
    auto it = postings_.find(term);
    if (it == postings_.end()) return 0;
    int32_t n = 0;
    for (const auto& p : it->second)
      if (alive(p.doc)) n++;
    return n;
  }

  int64_t total_length() const { return total_length_; }

  // weakAnd scoring of space-separated query terms; returns number of
  // scored docs written to (out_docs, out_scores), capped at capacity,
  // sorted by descending score. allowed: optional byte mask by doc id.
  // idfs/avg_override: when provided (cluster global-IDF scoring), per-term
  // idf values aligned with the term order and a global average doc length
  // replace the locally-derived statistics.
  int score(std::string_view terms, const uint8_t* allowed,
            int32_t allowed_len, int32_t* out_docs, float* out_scores,
            int32_t capacity, const float* idfs = nullptr,
            float avg_override = -1.f) const {
    std::unordered_map<int32_t, float> scores;
    float avg = avg_override > 0.f ? avg_override : avg_length();
    if (avg <= 0.f) avg = 1.f;
    auto term_list = split_terms(terms);
    for (size_t t = 0; t < term_list.size(); ++t) {
      const std::string& term = term_list[t];
      auto it = postings_.find(term);
      if (it == postings_.end()) continue;
      float idf;
      if (idfs) {
        idf = idfs[t];
      } else {
        int32_t d = df(term);
        if (d == 0) continue;
        idf = std::log(1.f + (float(live_docs_) - d + 0.5f) / (d + 0.5f));
      }
      if (idf <= 0.f) continue;
      for (const auto& p : it->second) {
        if (!alive(p.doc)) continue;
        if (allowed && (p.doc >= allowed_len || !allowed[p.doc]))
          continue;
        float tf = float(p.positions.size());
        float dl = float(doc_lengths_[p.doc]);
        float denom = tf + kK1 * (1.f - kB + kB * dl / avg);
        scores[p.doc] += idf * tf * (kK1 + 1.f) / denom;
      }
    }
    std::vector<std::pair<int32_t, float>> ranked(scores.begin(),
                                                  scores.end());
    std::sort(ranked.begin(), ranked.end(),
              [](const auto& a, const auto& b) {
                if (a.second != b.second) return a.second > b.second;
                return a.first < b.first;
              });
    int n = std::min<int>(capacity, ranked.size());
    for (int i = 0; i < n; ++i) {
      out_docs[i] = ranked[i].first;
      out_scores[i] = ranked[i].second;
    }
    return n;
  }

  // Docs containing the tokens as an ADJACENT phrase (true positional
  // matching). Returns count written to out (up to capacity).
  int phrase_docs(std::string_view phrase, int32_t* out,
                  int32_t capacity) const {
    std::vector<std::string> tokens;
    size_t start = 0;
    while (start < phrase.size()) {
      size_t end = phrase.find(' ', start);
      if (end == std::string_view::npos) end = phrase.size();
      if (end > start) tokens.emplace_back(phrase.substr(start, end - start));
      start = end + 1;
    }
    if (tokens.empty()) return 0;
    std::vector<const std::vector<Posting>*> lists;
    for (const auto& tok : tokens) {
      auto it = postings_.find(tok);
      if (it == postings_.end()) return 0;
      lists.push_back(&it->second);
    }
    // iterate candidate docs from the rarest list
    size_t rarest = 0;
    for (size_t i = 1; i < lists.size(); ++i)
      if (lists[i]->size() < lists[rarest]->size()) rarest = i;

    auto find_doc = [](const std::vector<Posting>& list,
                       int32_t doc) -> const Posting* {
      auto it = std::lower_bound(
          list.begin(), list.end(), doc,
          [](const Posting& p, int32_t d) { return p.doc < d; });
      return (it != list.end() && it->doc == doc) ? &*it : nullptr;
    };

    int n = 0;
    for (const auto& cand : *lists[rarest]) {
      if (!alive(cand.doc) || n >= capacity) continue;
      std::vector<const Posting*> docPostings(tokens.size());
      bool all = true;
      for (size_t i = 0; i < lists.size() && all; ++i) {
        docPostings[i] = find_doc(*lists[i], cand.doc);
        all = docPostings[i] != nullptr;
      }
      if (!all) continue;
      // adjacency: a position p in token0 with p+i in each token i
      bool match = false;
      for (int32_t p : docPostings[0]->positions) {
        bool ok = true;
        for (size_t i = 1; i < docPostings.size(); ++i) {
          const auto& positions = docPostings[i]->positions;
          if (!std::binary_search(positions.begin(), positions.end(),
                                  p + int32_t(i))) {
            ok = false;
            break;
          }
        }
        if (ok) {
          match = true;
          break;
        }
      }
      if (match) out[n++] = cand.doc;
    }
    return n;
  }

  float idf(std::string_view term) const {
    auto it = postings_.find(std::string(term));
    if (it == postings_.end()) return 0.f;
    int32_t df = 0;
    for (const auto& p : it->second)
      if (alive(p.doc)) df++;
    if (df == 0) return 0.f;
    return std::log(1.f + (float(live_docs_) - df + 0.5f) / (df + 0.5f));
  }

 private:
  std::unordered_map<std::string, std::vector<Posting>> postings_;
  std::vector<int32_t> doc_lengths_;  // -1 = deleted / never added
  int64_t total_length_ = 0;
  int64_t live_docs_ = 0;
  int64_t tombstones_ = 0;
};

}  // namespace

extern "C" {

void* bm25_create() { return new Bm25Index(); }

void bm25_free(void* handle) { delete static_cast<Bm25Index*>(handle); }

void bm25_add(void* handle, int32_t doc, const char* tokens) {
  static_cast<Bm25Index*>(handle)->add(doc, tokens);
}

// Raw-text add: tokenizes in C++ exactly like the Python engine tokenizer
// (regex [a-z0-9_]+ over str.lower(): ASCII A-Z lowercased; any other
// byte — including every UTF-8 continuation byte, since non-ASCII letters
// are not in the character class — acts as a separator). Saves the
// per-document regex + join + encode on the ingest hot path.
void bm25_add_raw(void* handle, int32_t doc, const char* raw) {
  std::string tokens;
  tokens.reserve(256);
  bool in_token = false;
  for (const char* p = raw; *p; ++p) {
    unsigned char c = static_cast<unsigned char>(*p);
    char lowered;
    if (c >= 'A' && c <= 'Z') {
      lowered = static_cast<char>(c - 'A' + 'a');
    } else if ((c >= 'a' && c <= 'z') || (c >= '0' && c <= '9') ||
               c == '_') {
      lowered = static_cast<char>(c);
    } else {
      if (in_token) {
        tokens.push_back(' ');
        in_token = false;
      }
      continue;
    }
    tokens.push_back(lowered);
    in_token = true;
  }
  static_cast<Bm25Index*>(handle)->add(doc, tokens);
}

void bm25_remove(void* handle, int32_t doc) {
  static_cast<Bm25Index*>(handle)->remove(doc);
}

int32_t bm25_num_docs(void* handle) {
  return static_cast<Bm25Index*>(handle)->num_docs();
}

int bm25_score(void* handle, const char* terms, const uint8_t* allowed,
               int32_t allowed_len, int32_t* out_docs, float* out_scores,
               int32_t capacity) {
  return static_cast<Bm25Index*>(handle)->score(terms, allowed, allowed_len,
                                                out_docs, out_scores,
                                                capacity);
}

int bm25_phrase_docs(void* handle, const char* phrase, int32_t* out,
                     int32_t capacity) {
  return static_cast<Bm25Index*>(handle)->phrase_docs(phrase, out, capacity);
}

float bm25_idf(void* handle, const char* term) {
  return static_cast<Bm25Index*>(handle)->idf(term);
}

// Global-IDF scoring: per-term idf values (aligned with the space-separated
// term order) and a global average doc length replace local statistics —
// used by the cluster coordinator so per-shard BM25 matches single-node.
int bm25_score_global(void* handle, const char* terms, const uint8_t* allowed,
                      int32_t allowed_len, const float* idfs, float avgdl,
                      int32_t* out_docs, float* out_scores,
                      int32_t capacity) {
  return static_cast<Bm25Index*>(handle)->score(terms, allowed, allowed_len,
                                                out_docs, out_scores,
                                                capacity, idfs, avgdl);
}

// Corpus statistics for a term list: writes per-term live document
// frequency into out_df (aligned with term order) and returns live doc
// count; *out_total_length receives the summed live token count.
int64_t bm25_stats(void* handle, const char* terms, int64_t* out_df,
                   int32_t capacity, int64_t* out_total_length) {
  auto* index = static_cast<Bm25Index*>(handle);
  auto term_list = Bm25Index::split_terms(terms);
  for (int32_t i = 0; i < int32_t(term_list.size()) && i < capacity; ++i)
    out_df[i] = index->df(term_list[i]);
  *out_total_length = index->total_length();
  return index->num_docs();
}

}  // extern "C"
