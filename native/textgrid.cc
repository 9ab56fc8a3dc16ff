// Fast Praat TextGrid parser (long + short format) as a C ABI for ctypes.
//
// The reference parses TextGrids with the pure-Python `tgt` package
// (rank_model/audio_util.py:46-74); preprocessing over ~7k utterances makes
// this the hot host-side parse path, so the framework owns a native parser
// (SURVEY.md §2.2-E8).  Token-stream strategy mirrors emotts/audio/textgrid.py:
// strip bracketed indices, then read quoted strings and numbers in file order.

#include <cctype>
#include <cstdint>
#include <cstring>
#include <fstream>
#include <sstream>
#include <string>
#include <vector>

namespace {

struct Token {
  bool is_str;
  std::string s;
  double num;
};

bool tokenize(const std::string& text, std::vector<Token>& out) {
  size_t pos = 0;
  const size_t n = text.size();
  while (pos < n) {
    const char c = text[pos];
    if (c == '"') {
      std::string s;
      ++pos;
      while (pos < n) {
        if (text[pos] == '"') {
          if (pos + 1 < n && text[pos + 1] == '"') {  // escaped quote
            s.push_back('"');
            pos += 2;
          } else {
            ++pos;
            break;
          }
        } else {
          s.push_back(text[pos++]);
        }
      }
      out.push_back({true, s, 0.0});
    } else if (std::isdigit(static_cast<unsigned char>(c)) ||
               (c == '-' && pos + 1 < n &&
                std::isdigit(static_cast<unsigned char>(text[pos + 1])))) {
      size_t end = pos + 1;
      while (end < n && (std::isdigit(static_cast<unsigned char>(text[end])) ||
                         text[end] == '.' || text[end] == 'e' ||
                         text[end] == 'E' || text[end] == '-' ||
                         text[end] == '+'))
        ++end;
      out.push_back({false, "", std::stod(text.substr(pos, end - pos))});
      pos = end;
    } else {
      ++pos;
    }
  }
  return true;
}

// strip "[...digits...]" index markers (long-format structural lines)
std::string strip_brackets(const std::string& text) {
  std::string out;
  out.reserve(text.size());
  size_t i = 0;
  while (i < text.size()) {
    if (text[i] == '[') {
      size_t j = i + 1;
      while (j < text.size() &&
             (std::isdigit(static_cast<unsigned char>(text[j])) ||
              std::isspace(static_cast<unsigned char>(text[j]))))
        ++j;
      if (j < text.size() && text[j] == ']') {
        i = j + 1;
        continue;
      }
    }
    out.push_back(text[i++]);
  }
  return out;
}

}  // namespace

extern "C" {

// Parse the named interval tier.  Writes up to max_intervals interval
// bounds into starts/ends and '\n'-joined labels into labels_buf.
// Returns the interval count, or -1 on parse failure / missing tier /
// buffer overflow.
int64_t emotts_parse_textgrid(const char* path, const char* tier_name,
                              double* starts, double* ends, char* labels_buf,
                              int64_t labels_buf_size, int64_t max_intervals) {
  std::ifstream f(path, std::ios::binary);
  if (!f) return -1;
  std::stringstream ss;
  ss << f.rdbuf();
  const std::string text = strip_brackets(ss.str());

  std::vector<Token> toks;
  tokenize(text, toks);
  size_t i = 0;
  auto next_str = [&](std::string& out) -> bool {
    while (i < toks.size() && !toks[i].is_str) ++i;
    if (i >= toks.size()) return false;
    out = toks[i++].s;
    return true;
  };
  auto next_num = [&](double& out) -> bool {
    while (i < toks.size() && toks[i].is_str) ++i;
    if (i >= toks.size()) return false;
    out = toks[i++].num;
    return true;
  };

  std::string s;
  double d;
  if (!next_str(s) || !next_str(s)) return -1;  // header strings
  if (!next_num(d) || !next_num(d)) return -1;  // global xmin/xmax
  double ntiers_d;
  if (!next_num(ntiers_d)) return -1;
  const int ntiers = int(ntiers_d);

  for (int tier = 0; tier < ntiers; ++tier) {
    std::string tier_class, name;
    if (!next_str(tier_class) || !next_str(name)) return -1;
    double xmin, xmax, count_d;
    if (!next_num(xmin) || !next_num(xmax) || !next_num(count_d)) return -1;
    const int count = int(count_d);
    const bool is_interval = tier_class == "IntervalTier";
    const bool wanted = is_interval && name == tier_name;

    if (wanted) {
      if (count > max_intervals) return -1;
      int64_t label_pos = 0;
      for (int k = 0; k < count; ++k) {
        double a, b;
        std::string label;
        if (!next_num(a) || !next_num(b) || !next_str(label)) return -1;
        starts[k] = a;
        ends[k] = b;
        const int64_t need = int64_t(label.size()) + 1;
        if (label_pos + need > labels_buf_size) return -1;
        std::memcpy(labels_buf + label_pos, label.data(), label.size());
        label_pos += label.size();
        labels_buf[label_pos++] = '\n';
      }
      if (label_pos < labels_buf_size) labels_buf[label_pos] = '\0';
      return count;
    }
    // skip this tier's payload
    for (int k = 0; k < count; ++k) {
      if (is_interval) {
        if (!next_num(d) || !next_num(d) || !next_str(s)) return -1;
      } else {  // point tier: (time, mark)
        if (!next_num(d) || !next_str(s)) return -1;
      }
    }
  }
  return -1;  // tier not found
}

}  // extern "C"
