// Native BPE merge engine for the whisper_at_tpu tokenizer.
//
// The reference tokenizer depends on tiktoken's Rust BPE
// (whisper_at/tokenizer.py:8, requirements.txt). This is the C++ equivalent
// of that native core: rank-table loading (base64 token + rank per line) and
// the greedy lowest-rank adjacent-pair merge. Pre-tokenization (the \p{L}
// regex split) stays in Python where the `regex` module already handles
// Unicode classes; this engine is the per-piece hot loop, exposed through a
// plain C ABI for ctypes.
//
// Build: make -C whisper_at_tpu/native  (produces libwhisper_at_bpe.so)

#include <cstdint>
#include <cstring>
#include <fstream>
#include <string>
#include <unordered_map>
#include <vector>

namespace {

int b64_value(unsigned char c) {
  if (c >= 'A' && c <= 'Z') return c - 'A';
  if (c >= 'a' && c <= 'z') return c - 'a' + 26;
  if (c >= '0' && c <= '9') return c - '0' + 52;
  if (c == '+') return 62;
  if (c == '/') return 63;
  return -1;
}

std::string b64_decode(const std::string& in) {
  std::string out;
  out.reserve(in.size() * 3 / 4);
  int buffer = 0;
  int bits = 0;
  for (unsigned char c : in) {
    if (c == '=') break;
    int v = b64_value(c);
    if (v < 0) continue;
    buffer = (buffer << 6) | v;
    bits += 6;
    if (bits >= 8) {
      bits -= 8;
      out.push_back(static_cast<char>((buffer >> bits) & 0xFF));
    }
  }
  return out;
}

struct Encoder {
  std::unordered_map<std::string, int32_t> ranks;
};

}  // namespace

extern "C" {

// Parse a tiktoken-format rank file. Returns an opaque handle or nullptr.
void* bpe_create(const char* ranks_path) {
  std::ifstream file(ranks_path);
  if (!file.is_open()) return nullptr;
  auto* enc = new Encoder();
  enc->ranks.reserve(60000);
  std::string line;
  while (std::getline(file, line)) {
    if (line.empty()) continue;
    size_t space = line.find(' ');
    if (space == std::string::npos) continue;
    std::string token = b64_decode(line.substr(0, space));
    int32_t rank = static_cast<int32_t>(std::stol(line.substr(space + 1)));
    enc->ranks.emplace(std::move(token), rank);
  }
  return enc;
}

void bpe_destroy(void* handle) { delete static_cast<Encoder*>(handle); }

int32_t bpe_num_ranks(void* handle) {
  return static_cast<int32_t>(static_cast<Encoder*>(handle)->ranks.size());
}

// Greedy lowest-rank merge of one pre-tokenized piece. Writes up to max_out
// ids; returns the id count, or -1 when a byte has no rank (invalid vocab)
// or the output does not fit.
int32_t bpe_encode_piece(void* handle, const uint8_t* piece, int32_t len,
                         int32_t* out_ids, int32_t max_out) {
  const auto& ranks = static_cast<Encoder*>(handle)->ranks;

  if (len <= 0) return 0;

  // whole-piece fast path
  {
    auto it = ranks.find(std::string(reinterpret_cast<const char*>(piece), len));
    if (it != ranks.end()) {
      if (max_out < 1) return -1;
      out_ids[0] = it->second;
      return 1;
    }
  }

  // boundaries[i] = byte offset of part i; parts are [b[i], b[i+1])
  std::vector<int32_t> bounds(len + 1);
  for (int32_t i = 0; i <= len; ++i) bounds[i] = i;

  auto pair_rank = [&](size_t i) -> int64_t {
    // rank of merging parts i and i+1; INT64_MAX when absent
    std::string key(reinterpret_cast<const char*>(piece) + bounds[i],
                    bounds[i + 2] - bounds[i]);
    auto it = ranks.find(key);
    return it == ranks.end() ? INT64_MAX : it->second;
  };

  while (bounds.size() > 2) {
    int64_t best_rank = INT64_MAX;
    size_t best_idx = 0;
    for (size_t i = 0; i + 2 < bounds.size(); ++i) {
      int64_t r = pair_rank(i);
      if (r < best_rank) {
        best_rank = r;
        best_idx = i;
      }
    }
    if (best_rank == INT64_MAX) break;
    bounds.erase(bounds.begin() + static_cast<long>(best_idx) + 1);
  }

  int32_t count = static_cast<int32_t>(bounds.size()) - 1;
  if (count > max_out) return -1;
  for (int32_t i = 0; i < count; ++i) {
    std::string key(reinterpret_cast<const char*>(piece) + bounds[i],
                    bounds[i + 1] - bounds[i]);
    auto it = ranks.find(key);
    if (it == ranks.end()) return -1;
    out_ids[i] = it->second;
  }
  return count;
}

}  // extern "C"
