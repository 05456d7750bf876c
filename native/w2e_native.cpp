// Native host-side runtime pieces for where2edit_tpu.
//
// The reference is pure Python; its host-side hot spots are the phase-1
// k-means fit (sklearn, single-threaded, over an (N·H·W, 576) matrix —
// attention/clustering_feature.py:389-394) and BPE text tokenization on the
// serving path. This library provides multithreaded C++ implementations,
// exposed through a C ABI consumed via ctypes (no pybind11 in this image).
//
// Build: make -C native   (produces libw2e_native.so)

#include <algorithm>
#include <atomic>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <limits>
#include <random>
#include <thread>
#include <vector>

namespace {

int hardware_threads() {
  unsigned n = std::thread::hardware_concurrency();
  return n == 0 ? 4 : static_cast<int>(n);
}

// Parallel-for over [0, n) in contiguous chunks.
template <typename F>
void parallel_for(int64_t n, F&& fn) {
  int nthreads = std::min<int64_t>(hardware_threads(), n);
  if (nthreads <= 1) {
    fn(0, n);
    return;
  }
  std::vector<std::thread> threads;
  int64_t chunk = (n + nthreads - 1) / nthreads;
  for (int t = 0; t < nthreads; ++t) {
    int64_t lo = t * chunk;
    int64_t hi = std::min<int64_t>(lo + chunk, n);
    if (lo >= hi) break;
    threads.emplace_back([lo, hi, &fn] { fn(lo, hi); });
  }
  for (auto& th : threads) th.join();
}

}  // namespace

extern "C" {

// Lloyd k-means with k-means++ seeding. data: (n, d) row-major float32.
// centers_out: (k, d). assignments_out (optional, may be null): (n,) int32.
// Returns the number of iterations actually run (early-stops when
// assignments stabilize).
int w2e_kmeans_fit(const float* data, int64_t n, int32_t d, int32_t k,
                   int32_t max_iters, uint64_t seed, float* centers_out,
                   int32_t* assignments_out) {
  if (n < k || k <= 0 || d <= 0) return -1;
  std::mt19937_64 rng(seed);

  std::vector<float> centers(static_cast<size_t>(k) * d);
  std::vector<float> min_dist(n, std::numeric_limits<float>::max());

  // k-means++ seeding
  {
    std::uniform_int_distribution<int64_t> uni(0, n - 1);
    int64_t first = uni(rng);
    std::memcpy(centers.data(), data + first * d, sizeof(float) * d);
    for (int c = 1; c < k; ++c) {
      const float* prev = centers.data() + static_cast<size_t>(c - 1) * d;
      parallel_for(n, [&](int64_t lo, int64_t hi) {
        for (int64_t i = lo; i < hi; ++i) {
          const float* row = data + i * d;
          float acc = 0.f;
          for (int j = 0; j < d; ++j) {
            float diff = row[j] - prev[j];
            acc += diff * diff;
          }
          min_dist[i] = std::min(min_dist[i], acc);
        }
      });
      double total = 0;
      for (int64_t i = 0; i < n; ++i) total += min_dist[i];
      std::uniform_real_distribution<double> ureal(0, total);
      double target = ureal(rng);
      int64_t chosen = n - 1;
      double acc = 0;
      for (int64_t i = 0; i < n; ++i) {
        acc += min_dist[i];
        if (acc >= target) { chosen = i; break; }
      }
      std::memcpy(centers.data() + static_cast<size_t>(c) * d,
                  data + chosen * d, sizeof(float) * d);
    }
  }

  std::vector<int32_t> assign(n, -1);
  int nthreads = hardware_threads();
  std::vector<double> sums(static_cast<size_t>(nthreads) * k * d);
  std::vector<int64_t> counts(static_cast<size_t>(nthreads) * k);

  int iter = 0;
  for (; iter < max_iters; ++iter) {
    std::fill(sums.begin(), sums.end(), 0.0);
    std::fill(counts.begin(), counts.end(), 0);
    std::atomic<int64_t> changed{0};

    // assignment + per-thread partial sums
    int64_t chunk = (n + nthreads - 1) / nthreads;
    std::vector<std::thread> threads;
    for (int t = 0; t < nthreads; ++t) {
      int64_t lo = t * chunk, hi = std::min<int64_t>(lo + chunk, n);
      if (lo >= hi) break;
      threads.emplace_back([&, t, lo, hi] {
        double* my_sums = sums.data() + static_cast<size_t>(t) * k * d;
        int64_t* my_counts = counts.data() + static_cast<size_t>(t) * k;
        int64_t my_changed = 0;
        for (int64_t i = lo; i < hi; ++i) {
          const float* row = data + i * d;
          float best = std::numeric_limits<float>::max();
          int32_t best_c = 0;
          for (int c = 0; c < k; ++c) {
            const float* cen = centers.data() + static_cast<size_t>(c) * d;
            float acc = 0.f;
            for (int j = 0; j < d; ++j) {
              float diff = row[j] - cen[j];
              acc += diff * diff;
            }
            if (acc < best) { best = acc; best_c = c; }
          }
          if (assign[i] != best_c) { assign[i] = best_c; ++my_changed; }
          double* s = my_sums + static_cast<size_t>(best_c) * d;
          for (int j = 0; j < d; ++j) s[j] += row[j];
          ++my_counts[best_c];
        }
        changed += my_changed;
      });
    }
    for (auto& th : threads) th.join();

    // reduce + update
    for (int c = 0; c < k; ++c) {
      int64_t count = 0;
      for (int t = 0; t < nthreads; ++t)
        count += counts[static_cast<size_t>(t) * k + c];
      if (count == 0) continue;  // keep empty-cluster center in place
      float* cen = centers.data() + static_cast<size_t>(c) * d;
      for (int j = 0; j < d; ++j) {
        double s = 0;
        for (int t = 0; t < nthreads; ++t)
          s += sums[(static_cast<size_t>(t) * k + c) * d + j];
        cen[j] = static_cast<float>(s / count);
      }
    }
    if (changed.load() == 0) { ++iter; break; }
  }

  std::memcpy(centers_out, centers.data(), sizeof(float) * k * d);
  if (assignments_out)
    std::memcpy(assignments_out, assign.data(), sizeof(int32_t) * n);
  return iter;
}

// Nearest-center assignment: ids_out (n,) int32.
void w2e_kmeans_assign(const float* data, int64_t n, int32_t d,
                       const float* centers, int32_t k, int32_t* ids_out) {
  parallel_for(n, [&](int64_t lo, int64_t hi) {
    for (int64_t i = lo; i < hi; ++i) {
      const float* row = data + i * d;
      float best = std::numeric_limits<float>::max();
      int32_t best_c = 0;
      for (int c = 0; c < k; ++c) {
        const float* cen = centers + static_cast<size_t>(c) * d;
        float acc = 0.f;
        for (int j = 0; j < d; ++j) {
          float diff = row[j] - cen[j];
          acc += diff * diff;
        }
        if (acc < best) { best = acc; best_c = c; }
      }
      ids_out[i] = best_c;
    }
  });
}

}  // extern "C"

// ---------------------------------------------------------------------------
// CLIP byte-level BPE tokenizer (openai SimpleTokenizer algorithm).
// The host passes the *decompressed* merges file contents; ids match the
// Python implementation in where2edit_tpu/models/clip_tokenizer.py.

#include <map>
#include <string>
#include <unordered_map>

namespace bpe {

// code point → UTF-8 string
std::string cp_to_utf8(int cp) {
  std::string out;
  if (cp < 0x80) {
    out.push_back(static_cast<char>(cp));
  } else if (cp < 0x800) {
    out.push_back(static_cast<char>(0xC0 | (cp >> 6)));
    out.push_back(static_cast<char>(0x80 | (cp & 0x3F)));
  } else {
    out.push_back(static_cast<char>(0xE0 | (cp >> 12)));
    out.push_back(static_cast<char>(0x80 | ((cp >> 6) & 0x3F)));
    out.push_back(static_cast<char>(0x80 | (cp & 0x3F)));
  }
  return out;
}

struct Tokenizer {
  std::unordered_map<int, std::string> byte_encoder;  // byte → unicode sym
  std::unordered_map<std::string, int> encoder;       // bpe symbol → id
  std::map<std::pair<std::string, std::string>, int> ranks;
  int sot = 0, eot = 0;

  void build_byte_encoder() {
    std::vector<int> bs;
    for (int b = int('!'); b <= int('~'); ++b) bs.push_back(b);
    for (int b = 0xA1; b <= 0xAC; ++b) bs.push_back(b);
    for (int b = 0xAE; b <= 0xFF; ++b) bs.push_back(b);
    std::vector<int> cs(bs.begin(), bs.end());
    int n = 0;
    for (int b = 0; b < 256; ++b) {
      if (std::find(bs.begin(), bs.end(), b) == bs.end()) {
        bs.push_back(b);
        cs.push_back(256 + n);
        ++n;
      }
    }
    for (size_t i = 0; i < bs.size(); ++i)
      byte_encoder[bs[i]] = cp_to_utf8(cs[i]);
  }

  void build(const std::string& merges_text) {
    build_byte_encoder();
    // parse merges: skip header line; keep lines 1..(49152-256-2)
    std::vector<std::pair<std::string, std::string>> merges;
    size_t pos = merges_text.find('\n');
    size_t line_no = 0;
    const size_t max_merges = 49152 - 256 - 2;
    while (pos != std::string::npos && merges.size() < max_merges) {
      size_t next = merges_text.find('\n', pos + 1);
      std::string line = merges_text.substr(
          pos + 1, next == std::string::npos ? std::string::npos
                                             : next - pos - 1);
      pos = next;
      ++line_no;
      if (line.empty()) continue;
      size_t sp = line.find(' ');
      if (sp == std::string::npos) continue;
      merges.emplace_back(line.substr(0, sp), line.substr(sp + 1));
    }
    // vocab: unicode syms, then +</w>, then merges, then specials
    std::vector<std::string> vocab;
    {
      std::vector<std::pair<int, std::string>> ordered;
      // order must match python bytes_to_unicode().values()
      std::vector<int> bs;
      for (int b = int('!'); b <= int('~'); ++b) bs.push_back(b);
      for (int b = 0xA1; b <= 0xAC; ++b) bs.push_back(b);
      for (int b = 0xAE; b <= 0xFF; ++b) bs.push_back(b);
      int n = 0;
      std::vector<int> cs(bs.begin(), bs.end());
      for (int b = 0; b < 256; ++b) {
        if (std::find(bs.begin(), bs.end(), b) == bs.end()) {
          bs.push_back(b);
          cs.push_back(256 + n);
          ++n;
        }
      }
      for (int cp : cs) vocab.push_back(cp_to_utf8(cp));
    }
    size_t base = vocab.size();
    for (size_t i = 0; i < base; ++i) vocab.push_back(vocab[i] + "</w>");
    for (auto& m : merges) vocab.push_back(m.first + m.second);
    vocab.push_back("<|startoftext|>");
    vocab.push_back("<|endoftext|>");
    for (size_t i = 0; i < vocab.size(); ++i) encoder[vocab[i]] = i;
    for (size_t i = 0; i < merges.size(); ++i) ranks[merges[i]] = i;
    sot = encoder["<|startoftext|>"];
    eot = encoder["<|endoftext|>"];
  }

  // split a UTF-8 string into unicode symbols (as produced by byte_encoder)
  static std::vector<std::string> utf8_split(const std::string& s) {
    std::vector<std::string> out;
    size_t i = 0;
    while (i < s.size()) {
      unsigned char c = s[i];
      int len = (c < 0x80) ? 1 : (c < 0xE0) ? 2 : (c < 0xF0) ? 3 : 4;
      out.push_back(s.substr(i, len));
      i += len;
    }
    return out;
  }

  std::vector<int> bpe_token(const std::string& token_bytes) {
    // map raw bytes through byte_encoder
    std::string mapped;
    for (unsigned char c : token_bytes) mapped += byte_encoder[c];
    std::vector<std::string> word = utf8_split(mapped);
    if (word.empty()) return {};
    word.back() += "</w>";
    while (word.size() > 1) {
      int best_rank = INT32_MAX;
      size_t best_i = 0;
      for (size_t i = 0; i + 1 < word.size(); ++i) {
        auto it = ranks.find({word[i], word[i + 1]});
        if (it != ranks.end() && it->second < best_rank) {
          best_rank = it->second;
          best_i = i;
        }
      }
      if (best_rank == INT32_MAX) break;
      // merge ALL occurrences of this bigram (left-to-right), like python
      std::vector<std::string> merged;
      const std::string& a = word[best_i];
      const std::string& b = word[best_i + 1];
      for (size_t i = 0; i < word.size();) {
        if (i + 1 < word.size() && word[i] == a && word[i + 1] == b) {
          merged.push_back(a + b);
          i += 2;
        } else {
          merged.push_back(word[i]);
          ++i;
        }
      }
      word = std::move(merged);
    }
    std::vector<int> ids;
    for (auto& w : word) {
      auto it = encoder.find(w);
      if (it != encoder.end()) ids.push_back(it->second);
    }
    return ids;
  }

  // CLIP token pattern over lowercased text (ASCII subset, matching the
  // python implementation's pattern)
  std::vector<int> encode(const std::string& raw) {
    // clean: collapse whitespace + lowercase (ASCII)
    std::string text;
    bool in_space = true;
    for (char ch : raw) {
      if (ch == ' ' || ch == '\t' || ch == '\n' || ch == '\r') {
        if (!in_space && !text.empty()) text += ' ';
        in_space = true;
      } else {
        text += static_cast<char>(std::tolower(
            static_cast<unsigned char>(ch)));
        in_space = false;
      }
    }
    while (!text.empty() && text.back() == ' ') text.pop_back();

    std::vector<int> ids;
    size_t i = 0;
    auto is_alpha = [](char c) { return c >= 'a' && c <= 'z'; };
    auto is_digit = [](char c) { return c >= '0' && c <= '9'; };
    while (i < text.size()) {
      char c = text[i];
      if (c == ' ') { ++i; continue; }
      std::string token;
      if (c == '\'') {
        // contractions 's 't 're 've 'm 'll 'd
        static const char* conts[] = {"'s", "'t", "'re", "'ve", "'m",
                                      "'ll", "'d"};
        bool matched = false;
        for (const char* s : conts) {
          size_t l = strlen(s);
          if (text.compare(i, l, s) == 0) {
            token = s;
            i += l;
            matched = true;
            break;
          }
        }
        if (!matched) {
          // run of "other" chars
          size_t j = i;
          while (j < text.size() && text[j] != ' '
                 && !is_alpha(text[j]) && !is_digit(text[j])) ++j;
          token = text.substr(i, j - i);
          i = j;
        }
      } else if (is_alpha(c)) {
        size_t j = i;
        while (j < text.size() && is_alpha(text[j])) ++j;
        token = text.substr(i, j - i);
        i = j;
      } else if (is_digit(c)) {
        token = text.substr(i, 1);
        ++i;
      } else {
        size_t j = i;
        while (j < text.size() && text[j] != ' '
               && !is_alpha(text[j]) && !is_digit(text[j])) ++j;
        token = text.substr(i, j - i);
        i = j;
      }
      auto t_ids = bpe_token(token);
      ids.insert(ids.end(), t_ids.begin(), t_ids.end());
    }
    return ids;
  }
};

}  // namespace bpe

extern "C" {

void* w2e_bpe_new(const char* merges_data, int64_t merges_len) {
  auto* tok = new bpe::Tokenizer();
  tok->build(std::string(merges_data, merges_len));
  return tok;
}

void w2e_bpe_free(void* h) { delete static_cast<bpe::Tokenizer*>(h); }

int32_t w2e_bpe_sot(void* h) { return static_cast<bpe::Tokenizer*>(h)->sot; }
int32_t w2e_bpe_eot(void* h) { return static_cast<bpe::Tokenizer*>(h)->eot; }

int32_t w2e_bpe_encode(void* h, const char* text, int32_t* out,
                       int32_t max_out) {
  auto ids = static_cast<bpe::Tokenizer*>(h)->encode(text);
  int32_t n = std::min<int32_t>(ids.size(), max_out);
  for (int32_t i = 0; i < n; ++i) out[i] = ids[i];
  return n;
}

}  // extern "C"
