// Native text pipeline: tokenize -> stopword -> Porter2 (Snowball English)
// stem -> xxhash32 term ids -> BM25 term frequencies.
//
// The TPU-native equivalent of the reference's Rust text path
// (/root/reference/src/indexes/tf_idf/mod.rs:288-399): ingest-side text
// processing is the host CPU hot loop of BM25 indexing, so it is native
// here too. ASCII-only fast path; the Python layer falls back to
// nltk/regex for non-ASCII inputs (differential-tested in
// tests/test_native_text.py).
//
// Build: see csrc/Makefile (g++ -O2 -shared -fPIC).

#include <cstdint>
#include <cstring>
#include <string>
#include <unordered_map>
#include <unordered_set>
#include <vector>

// ---------------------------------------------------------------- xxhash32

static const uint32_t P1 = 2654435761u, P2 = 2246822519u, P3 = 3266489917u,
                      P4 = 668265263u, P5 = 374761393u;

static inline uint32_t rotl32(uint32_t x, int r) {
  return (x << r) | (x >> (32 - r));
}
static inline uint32_t read32(const uint8_t* p) {
  uint32_t v;
  std::memcpy(&v, p, 4);
  return v;  // little-endian hosts only (x86/ARM)
}

static uint32_t xxh32(const uint8_t* input, size_t len, uint32_t seed) {
  const uint8_t* p = input;
  const uint8_t* end = input + len;
  uint32_t h;
  if (len >= 16) {
    uint32_t v1 = seed + P1 + P2, v2 = seed + P2, v3 = seed, v4 = seed - P1;
    const uint8_t* limit = end - 16;
    do {
      v1 = rotl32(v1 + read32(p) * P2, 13) * P1; p += 4;
      v2 = rotl32(v2 + read32(p) * P2, 13) * P1; p += 4;
      v3 = rotl32(v3 + read32(p) * P2, 13) * P1; p += 4;
      v4 = rotl32(v4 + read32(p) * P2, 13) * P1; p += 4;
    } while (p <= limit);
    h = rotl32(v1, 1) + rotl32(v2, 7) + rotl32(v3, 12) + rotl32(v4, 18);
  } else {
    h = seed + P5;
  }
  h += (uint32_t)len;
  while (p + 4 <= end) {
    h = rotl32(h + read32(p) * P3, 17) * P4;
    p += 4;
  }
  while (p < end) {
    h = rotl32(h + (*p) * P5, 11) * P1;
    ++p;
  }
  h ^= h >> 15; h *= P2; h ^= h >> 13; h *= P3; h ^= h >> 16;
  return h;
}

// ------------------------------------------------------- Snowball English
// Exact mirror of NLTK's EnglishStemmer (itself the Snowball "english"
// algorithm, snowballstem.org): word/R1/R2 are tracked as suffix-aligned
// strings with identical update rules, so stems (and therefore xxhash32
// term ids) are bit-identical with the Python path.

namespace porter2 {

static inline bool is_v(char c) {
  return c == 'a' || c == 'e' || c == 'i' || c == 'o' || c == 'u' || c == 'y';
}

static bool ends_with(const std::string& s, const char* suf) {
  size_t n = std::strlen(suf);
  return s.size() >= n && s.compare(s.size() - n, n, suf) == 0;
}

static std::string suffix_replace(const std::string& s, size_t suf_len,
                                  const char* rep) {
  return s.substr(0, s.size() - suf_len) + rep;
}

static const std::unordered_map<std::string, std::string>& special_words() {
  static const std::unordered_map<std::string, std::string> m = {
      {"skis", "ski"},        {"skies", "sky"},       {"dying", "die"},
      {"lying", "lie"},       {"tying", "tie"},       {"idly", "idl"},
      {"gently", "gentl"},    {"ugly", "ugli"},       {"early", "earli"},
      {"only", "onli"},       {"singly", "singl"},    {"sky", "sky"},
      {"news", "news"},       {"howe", "howe"},       {"atlas", "atlas"},
      {"cosmos", "cosmos"},   {"bias", "bias"},       {"andes", "andes"},
      {"inning", "inning"},   {"innings", "inning"},  {"outing", "outing"},
      {"outings", "outing"},  {"canning", "canning"}, {"cannings", "canning"},
      {"herring", "herring"}, {"herrings", "herring"},{"earring", "earring"},
      {"earrings", "earring"},{"proceed", "proceed"}, {"proceeds", "proceed"},
      {"proceeded", "proceed"},{"proceeding", "proceed"},{"exceed", "exceed"},
      {"exceeds", "exceed"},  {"exceeded", "exceed"}, {"exceeding", "exceed"},
      {"succeed", "succeed"}, {"succeeds", "succeed"},{"succeeded", "succeed"},
      {"succeeding", "succeed"},
  };
  return m;
}

static inline bool vowel(char c) {
  return c == 'a' || c == 'e' || c == 'i' || c == 'o' || c == 'u' || c == 'y';
}

static bool is_double_cons_end(const std::string& w) {
  static const char* dc[] = {"bb","dd","ff","gg","mm","nn","pp","rr","tt"};
  for (auto* d : dc)
    if (ends_with(w, d)) return true;
  return false;
}

// trim n chars off the end (clamping at empty, like python s[:-n])
static void chop(std::string& s, size_t n) {
  s.erase(s.size() > n ? s.size() - n : 0);
}

// python-style: s = s[:-suf]+rep if len(s) >= suf else fallback
static void region_replace(std::string& r, size_t suf_len, const char* rep,
                           const char* fallback) {
  if (r.size() >= suf_len)
    r = suffix_replace(r, suf_len, rep);
  else
    r = fallback;
}

static std::string stem(std::string word) {
  if (word.size() <= 2) return word;

  auto sp = special_words().find(word);
  if (sp != special_words().end()) return sp->second;

  if (!word.empty() && word[0] == '\x27') word.erase(0, 1);
  if (!word.empty() && word[0] == 'y') word[0] = 'Y';
  for (size_t i = 1; i < word.size(); i++)
    if (vowel(word[i - 1]) && word[i] == 'y') word[i] = 'Y';
  // NB: 'Y' is not in __vowels

  auto in_vowels = [](char c) {
    return c == 'a' || c == 'e' || c == 'i' || c == 'o' || c == 'u' || c == 'y';
  };

  std::string r1, r2;
  if (word.rfind("gener", 0) == 0 || word.rfind("arsen", 0) == 0)
    r1 = word.substr(5);
  else if (word.rfind("commun", 0) == 0)
    r1 = word.substr(6);
  else {
    for (size_t i = 1; i < word.size(); i++)
      if (!in_vowels(word[i]) && in_vowels(word[i - 1])) {
        r1 = word.substr(i + 1);
        break;
      }
  }
  for (size_t i = 1; i < r1.size(); i++)
    if (!in_vowels(r1[i]) && in_vowels(r1[i - 1])) {
      r2 = r1.substr(i + 1);
      break;
    }

  // STEP 0
  for (const char* suf : {"'s'", "'s", "'"}) {
    if (ends_with(word, suf)) {
      size_t n = std::strlen(suf);
      chop(word, n); chop(r1, n); chop(r2, n);
      break;
    }
  }

  // STEP 1a
  for (const char* suf : {"sses", "ied", "ies", "us", "ss", "s"}) {
    if (!ends_with(word, suf)) continue;
    std::string s = suf;
    if (s == "sses") {
      chop(word, 2); chop(r1, 2); chop(r2, 2);
    } else if (s == "ied" || s == "ies") {
      if (word.size() - 3 > 1) {
        chop(word, 2); chop(r1, 2); chop(r2, 2);
      } else {
        chop(word, 1); chop(r1, 1); chop(r2, 1);
      }
    } else if (s == "s") {
      bool vowel_found = false;
      for (size_t i = 0; i + 2 < word.size(); i++)
        if (in_vowels(word[i])) { vowel_found = true; break; }
      if (vowel_found) {
        chop(word, 1); chop(r1, 1); chop(r2, 1);
      }
    }
    break;  // "us"/"ss": no action
  }

  // STEP 1b
  for (const char* suf : {"eedly", "ingly", "edly", "eed", "ing", "ed"}) {
    if (!ends_with(word, suf)) continue;
    std::string s = suf;
    size_t n = s.size();
    if (s == "eed" || s == "eedly") {
      if (ends_with(r1, suf)) {
        word = suffix_replace(word, n, "ee");
        region_replace(r1, n, "ee", "");
        region_replace(r2, n, "ee", "");
      }
    } else {
      bool vowel_found = false;
      for (size_t i = 0; i + n < word.size(); i++)
        if (in_vowels(word[i])) { vowel_found = true; break; }
      if (vowel_found) {
        chop(word, n); chop(r1, n); chop(r2, n);
        if (ends_with(word, "at") || ends_with(word, "bl") ||
            ends_with(word, "iz")) {
          word += 'e';
          r1 += 'e';
          if (word.size() > 5 || r1.size() >= 3) r2 += 'e';
        } else if (is_double_cons_end(word)) {
          chop(word, 1); chop(r1, 1); chop(r2, 1);
        } else if ((r1.empty() && word.size() >= 3 &&
                    !in_vowels(word[word.size() - 1]) &&
                    word[word.size() - 1] != 'w' &&
                    word[word.size() - 1] != 'x' &&
                    word[word.size() - 1] != 'Y' &&
                    in_vowels(word[word.size() - 2]) &&
                    !in_vowels(word[word.size() - 3])) ||
                   (r1.empty() && word.size() == 2 && in_vowels(word[0]) &&
                    !in_vowels(word[1]))) {
          word += 'e';
          if (!r1.empty()) r1 += 'e';
          if (!r2.empty()) r2 += 'e';
        }
      }
    }
    break;
  }

  // STEP 1c
  if (word.size() > 2 &&
      (word[word.size() - 1] == 'y' || word[word.size() - 1] == 'Y') &&
      !in_vowels(word[word.size() - 2])) {
    word[word.size() - 1] = 'i';
    if (!r1.empty()) r1 = r1.substr(0, r1.size() - 1) + "i";
    if (!r2.empty()) r2 = r2.substr(0, r2.size() - 1) + "i";
  }

  // STEP 2
  {
    static const char* sufs[] = {
        "ization", "ational", "fulness", "ousness", "iveness", "tional",
        "biliti",  "lessli",  "entli",   "ation",   "alism",   "aliti",
        "ousli",   "iviti",   "fulli",   "enci",    "anci",    "abli",
        "izer",    "ator",    "alli",    "bli",     "ogi",     "li",
    };
    for (const char* suf : sufs) {
      if (!ends_with(word, suf)) continue;
      if (ends_with(r1, suf)) {
        std::string s = suf;
        size_t n = s.size();
        if (s == "tional") {
          chop(word, 2); chop(r1, 2); chop(r2, 2);
        } else if (s == "enci" || s == "anci" || s == "abli") {
          word = word.substr(0, word.size() - 1) + "e";
          if (!r1.empty()) r1 = r1.substr(0, r1.size() - 1) + "e"; else r1 = "";
          if (!r2.empty()) r2 = r2.substr(0, r2.size() - 1) + "e"; else r2 = "";
        } else if (s == "entli") {
          chop(word, 2); chop(r1, 2); chop(r2, 2);
        } else if (s == "izer" || s == "ization") {
          word = suffix_replace(word, n, "ize");
          region_replace(r1, n, "ize", "");
          region_replace(r2, n, "ize", "");
        } else if (s == "ational" || s == "ation" || s == "ator") {
          word = suffix_replace(word, n, "ate");
          region_replace(r1, n, "ate", "");
          region_replace(r2, n, "ate", "e");
        } else if (s == "alism" || s == "aliti" || s == "alli") {
          word = suffix_replace(word, n, "al");
          region_replace(r1, n, "al", "");
          region_replace(r2, n, "al", "");
        } else if (s == "fulness") {
          chop(word, 4); chop(r1, 4); chop(r2, 4);
        } else if (s == "ousli" || s == "ousness") {
          word = suffix_replace(word, n, "ous");
          region_replace(r1, n, "ous", "");
          region_replace(r2, n, "ous", "");
        } else if (s == "iveness" || s == "iviti") {
          word = suffix_replace(word, n, "ive");
          region_replace(r1, n, "ive", "");
          region_replace(r2, n, "ive", "e");
        } else if (s == "biliti" || s == "bli") {
          word = suffix_replace(word, n, "ble");
          region_replace(r1, n, "ble", "");
          region_replace(r2, n, "ble", "");
        } else if (s == "ogi") {
          if (word.size() >= 4 && word[word.size() - 4] == 'l') {
            chop(word, 1); chop(r1, 1); chop(r2, 1);
          }
        } else if (s == "fulli" || s == "lessli") {
          chop(word, 2); chop(r1, 2); chop(r2, 2);
        } else if (s == "li") {
          if (word.size() >= 3) {
            char c = word[word.size() - 3];
            static const std::string li_ending = "cdeghkmnrt";
            if (li_ending.find(c) != std::string::npos) {
              chop(word, 2); chop(r1, 2); chop(r2, 2);
            }
          }
        }
      }
      break;
    }
  }

  // STEP 3
  {
    static const char* sufs[] = {"ational", "tional", "alize", "icate",
                                 "iciti",   "ative",  "ical",  "ness", "ful"};
    for (const char* suf : sufs) {
      if (!ends_with(word, suf)) continue;
      if (ends_with(r1, suf)) {
        std::string s = suf;
        size_t n = s.size();
        if (s == "tional") {
          chop(word, 2); chop(r1, 2); chop(r2, 2);
        } else if (s == "ational") {
          word = suffix_replace(word, n, "ate");
          region_replace(r1, n, "ate", "");
          region_replace(r2, n, "ate", "");
        } else if (s == "alize") {
          chop(word, 3); chop(r1, 3); chop(r2, 3);
        } else if (s == "icate" || s == "iciti" || s == "ical") {
          word = suffix_replace(word, n, "ic");
          region_replace(r1, n, "ic", "");
          region_replace(r2, n, "ic", "");
        } else if (s == "ful" || s == "ness") {
          chop(word, n); chop(r1, n); chop(r2, n);
        } else if (s == "ative") {
          if (ends_with(r2, suf)) {
            chop(word, 5); chop(r1, 5); chop(r2, 5);
          }
        }
      }
      break;
    }
  }

  // STEP 4
  {
    static const char* sufs[] = {"ement", "ance", "ence", "able", "ible",
                                 "ment",  "ant",  "ent",  "ism",  "ate",
                                 "iti",   "ous",  "ive",  "ize",  "ion",
                                 "al",    "er",   "ic"};
    for (const char* suf : sufs) {
      if (!ends_with(word, suf)) continue;
      if (ends_with(r2, suf)) {
        std::string s = suf;
        size_t n = s.size();
        if (s == "ion") {
          if (word.size() >= 4 &&
              (word[word.size() - 4] == 's' || word[word.size() - 4] == 't')) {
            chop(word, 3); chop(r1, 3); chop(r2, 3);
          }
        } else {
          chop(word, n); chop(r1, n); chop(r2, n);
        }
      }
      break;
    }
  }

  // STEP 5
  if (ends_with(r2, "l") && word.size() >= 2 && word[word.size() - 2] == 'l') {
    chop(word, 1);
  } else if (ends_with(r2, "e")) {
    chop(word, 1);
  } else if (ends_with(r1, "e")) {
    if (word.size() >= 4 &&
        (in_vowels(word[word.size() - 2]) || word[word.size() - 2] == 'w' ||
         word[word.size() - 2] == 'x' || word[word.size() - 2] == 'Y' ||
         !in_vowels(word[word.size() - 3]) ||
         in_vowels(word[word.size() - 4]))) {
      chop(word, 1);
    }
  }

  for (auto& c : word)
    if (c == 'Y') c = 'y';
  return word;
}

}  // namespace porter2

// ---------------------------------------------------------------- pipeline

static const std::unordered_set<std::string>& stopwords() {
  // tf_idf/mod.rs:282-286
  static const std::unordered_set<std::string> s = {
      "a",  "and",  "are",   "as",    "at",    "be",   "but", "by",  "for",
      "if", "in",   "into",  "is",    "it",    "no",   "not", "of",  "on",
      "or", "s",    "such",  "t",     "that",  "the",  "their","then",
      "there", "these", "they", "this", "to", "was", "will", "with", "www",
  };
  return s;
}

static inline bool is_word_char(char c) {
  return (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z') ||
         (c >= '0' && c <= '9') || c == '_';
}

extern "C" {

// Returns the number of (hash, tf) pairs written (<= cap), or -1 if the
// input is not pure ASCII (caller falls back to the Python path).
// doc_len_out receives the non-stopword valid-token count.
int tp_process_text(const char* text, int max_token_len, float avgdl,
                    float k1, float b, uint32_t* out_hashes, float* out_tfs,
                    int cap, int* doc_len_out) {
  size_t len = std::strlen(text);
  for (size_t i = 0; i < len; i++)
    if ((unsigned char)text[i] >= 0x80) return -1;

  std::unordered_map<uint32_t, int> freq;
  int doc_len = 0;
  size_t i = 0;
  std::string tok;
  while (i <= len) {
    char c = i < len ? text[i] : ' ';
    if (i < len && is_word_char(c)) {
      tok += (c >= 'A' && c <= 'Z') ? (char)(c - 'A' + 'a') : c;
    } else if (!tok.empty()) {
      if ((int)tok.size() <= max_token_len && !stopwords().count(tok)) {
        doc_len++;
        std::string stemmed = porter2::stem(tok);
        uint32_t h = xxh32((const uint8_t*)stemmed.data(), stemmed.size(), 0);
        freq[h]++;
      }
      tok.clear();
    }
    i++;
  }
  *doc_len_out = doc_len;
  int n = 0;
  for (auto& kv : freq) {
    if (n >= cap) break;
    out_hashes[n] = kv.first;
    // compute_bm25_term_frequency (tf_idf/mod.rs:362-371)
    float count = (float)kv.second;
    out_tfs[n] = count * (k1 + 1.0f) /
                 (count + k1 * (1.0f - b + b * ((float)doc_len / avgdl)));
    n++;
  }
  return n;
}

// Stems one lowercase ASCII token into out (cap bytes incl NUL). Returns
// the stem length, or -1 on non-ASCII.
int tp_stem(const char* token, char* out, int cap) {
  size_t len = std::strlen(token);
  for (size_t i = 0; i < len; i++)
    if ((unsigned char)token[i] >= 0x80) return -1;
  std::string s = porter2::stem(token);
  if ((int)s.size() + 1 > cap) return -1;
  std::memcpy(out, s.data(), s.size());
  out[s.size()] = 0;
  return (int)s.size();
}

uint32_t tp_xxh32(const char* data, int len, uint32_t seed) {
  return xxh32((const uint8_t*)data, (size_t)len, seed);
}

}  // extern "C"
