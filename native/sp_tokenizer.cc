// Native unigram sentencepiece tokenizer (C++17, zero dependencies).
//
// TPU-native equivalent of the reference's sentencepiece C++ dependency
// (SURVEY.md §2.4: T5 tokenization of `spiece.model` reached through
// transformers/AutoTokenizer).  Parses the sentencepiece ModelProto wire
// format directly (pieces + scores) and runs Viterbi segmentation under the
// unigram LM, exposing a C ABI consumed via ctypes
// (s2v_tpu/utils/sp_native.py).
//
// Scope notes:
//  * normalization implements the T5 defaults that matter for prompts:
//    whitespace collapsing, U+2581 space marker, dummy-prefix; full NFKC
//    normalization is out of scope (ASCII/UTF-8 prompts pass through).
//  * unknown codepoints map to unk_id (T5: 2), matching sentencepiece's
//    behaviour with byte_fallback=false.

#include <cstdint>
#include <cstring>
#include <string>
#include <unordered_map>
#include <vector>
#include <fstream>
#include <limits>
#include <memory>

namespace {

// ---------------------------------------------------------------------------
// minimal protobuf wire-format reader (just what ModelProto needs)
// ---------------------------------------------------------------------------

struct Reader {
  const uint8_t* p;
  const uint8_t* end;
  bool ok = true;

  uint64_t varint() {
    uint64_t v = 0;
    int shift = 0;
    while (p < end) {
      uint8_t b = *p++;
      v |= uint64_t(b & 0x7f) << shift;
      if (!(b & 0x80)) return v;
      shift += 7;
      if (shift >= 64) break;
    }
    ok = false;
    return 0;
  }

  void skip(uint32_t wire_type) {
    switch (wire_type) {
      case 0: varint(); break;
      case 1: p += 8; break;
      case 2: { uint64_t n = varint(); p += n; break; }
      case 5: p += 4; break;
      default: ok = false;
    }
    if (p > end) ok = false;
  }
};

struct Piece {
  std::string text;
  float score = 0.f;
  int type = 1;  // NORMAL
};

// SentencePiece submessage: 1=piece(str), 2=score(float), 3=type(enum)
Piece parse_piece(const uint8_t* p, const uint8_t* end) {
  Piece out;
  Reader r{p, end};
  while (r.p < r.end && r.ok) {
    uint64_t tag = r.varint();
    uint32_t field = tag >> 3, wt = tag & 7;
    if (field == 1 && wt == 2) {
      uint64_t n = r.varint();
      out.text.assign(reinterpret_cast<const char*>(r.p), n);
      r.p += n;
    } else if (field == 2 && wt == 5) {
      std::memcpy(&out.score, r.p, 4);
      r.p += 4;
    } else if (field == 3 && wt == 0) {
      out.type = int(r.varint());
    } else {
      r.skip(wt);
    }
  }
  return out;
}

struct Model {
  std::vector<Piece> pieces;
  std::unordered_map<std::string, int> index;
  int unk_id = 2;
  size_t max_piece_len = 1;

  void build_index() {
    for (size_t i = 0; i < pieces.size(); ++i) {
      const Piece& pc = pieces[i];
      if (pc.type == 2) unk_id = int(i);  // UNKNOWN
      if (pc.type == 1 || pc.type == 4 || pc.type == 6) {  // NORMAL/USER/BYTE
        index.emplace(pc.text, int(i));
        if (pc.text.size() > max_piece_len) max_piece_len = pc.text.size();
      }
    }
  }
};

// ModelProto: 1=repeated SentencePiece
bool parse_model(const std::string& data, Model* model) {
  Reader r{reinterpret_cast<const uint8_t*>(data.data()),
           reinterpret_cast<const uint8_t*>(data.data()) + data.size()};
  while (r.p < r.end && r.ok) {
    uint64_t tag = r.varint();
    uint32_t field = tag >> 3, wt = tag & 7;
    if (field == 1 && wt == 2) {
      uint64_t n = r.varint();
      if (r.p + n > r.end) return false;
      model->pieces.push_back(parse_piece(r.p, r.p + n));
      r.p += n;
    } else {
      r.skip(wt);
    }
  }
  if (!r.ok || model->pieces.empty()) return false;
  model->build_index();
  return true;
}

// ---------------------------------------------------------------------------
// normalization + Viterbi segmentation (unigram LM)
// ---------------------------------------------------------------------------

constexpr const char* kSpace = "\xe2\x96\x81";  // U+2581

size_t utf8_len(uint8_t lead) {
  if (lead < 0x80) return 1;
  if ((lead >> 5) == 0x6) return 2;
  if ((lead >> 4) == 0xe) return 3;
  if ((lead >> 3) == 0x1e) return 4;
  return 1;  // invalid byte: treat as single
}

// collapse whitespace, map ' ' -> U+2581, add dummy prefix
std::string normalize(const std::string& in) {
  std::string out;
  out.reserve(in.size() + 4);
  bool pending_space = true;  // dummy prefix
  for (size_t i = 0; i < in.size(); ++i) {
    char c = in[i];
    if (c == ' ' || c == '\t' || c == '\n' || c == '\r') {
      pending_space = true;
      continue;
    }
    if (pending_space) {
      out += kSpace;
      pending_space = false;
    }
    out += c;
  }
  return out;
}

int encode(const Model& m, const std::string& text, int* out_ids, int max_out) {
  std::string s = normalize(text);
  const size_t n = s.size();
  if (n == 0) return 0;

  // char-boundary positions
  std::vector<size_t> starts;
  for (size_t i = 0; i < n;) {
    starts.push_back(i);
    i += utf8_len(uint8_t(s[i]));
  }
  starts.push_back(n);
  const size_t m_pos = starts.size();

  constexpr float kNegInf = -std::numeric_limits<float>::infinity();
  const float unk_penalty = -20.0f;  // sentencepiece: min_score - 10-ish
  std::vector<float> best(m_pos, kNegInf);
  std::vector<int> back(m_pos, -1), back_id(m_pos, -1);
  best[0] = 0.f;

  for (size_t i = 0; i + 1 < m_pos; ++i) {
    if (best[i] == kNegInf) continue;
    const size_t start = starts[i];
    // try all piece lengths ending at later char boundaries
    for (size_t j = i + 1; j < m_pos; ++j) {
      const size_t len = starts[j] - start;
      if (len > m.max_piece_len) break;
      auto it = m.index.find(s.substr(start, len));
      if (it == m.index.end()) continue;
      const float sc = best[i] + m.pieces[it->second].score;
      if (sc > best[j]) {
        best[j] = sc;
        back[j] = int(i);
        back_id[j] = it->second;
      }
    }
    // unknown single character fallback
    const size_t j = i + 1;
    const float sc = best[i] + unk_penalty;
    if (sc > best[j]) {
      best[j] = sc;
      back[j] = int(i);
      back_id[j] = m.unk_id;
    }
  }

  std::vector<int> rev;
  for (int j = int(m_pos) - 1; j > 0; j = back[j]) {
    rev.push_back(back_id[j]);
    if (back[j] < 0) break;
  }
  int count = 0;
  for (auto it = rev.rbegin(); it != rev.rend() && count < max_out; ++it) {
    out_ids[count++] = *it;
  }
  return count;
}

}  // namespace

extern "C" {

void* sp_load(const char* path) {
  std::ifstream f(path, std::ios::binary);
  if (!f) return nullptr;
  std::string data((std::istreambuf_iterator<char>(f)),
                   std::istreambuf_iterator<char>());
  auto model = std::make_unique<Model>();
  if (!parse_model(data, model.get())) return nullptr;
  return model.release();
}

int sp_vocab_size(void* handle) {
  return int(static_cast<Model*>(handle)->pieces.size());
}

int sp_piece_to_id(void* handle, const char* piece) {
  auto* m = static_cast<Model*>(handle);
  auto it = m->index.find(piece);
  return it == m->index.end() ? -1 : it->second;
}

// returns number of ids written to out_ids (<= max_out)
int sp_encode(void* handle, const char* text, int* out_ids, int max_out) {
  return encode(*static_cast<Model*>(handle), text, out_ids, max_out);
}

void sp_free(void* handle) { delete static_cast<Model*>(handle); }

}  // extern "C"
