// ICU4C-backed word segmenter — native replacement of the reference's Rust
// `ICUWordPreTokenizer` (sparse_emb_util, used at reference
// utils/data_utils.py:283-298). ICU's word break iterator performs
// dictionary-based segmentation for scriptio-continua scripts (Thai, Lao,
// Khmer, Burmese) and CJK (frequency-dictionary Chinese/Japanese), which the
// pure-regex Python fallback cannot do.
//
// The system only ships the ICU *runtime* (libicuuc.so.NN, versioned symbols
// like ubrk_open_72) — no dev headers. So this file declares the minimal C
// API itself and resolves symbols via dlopen/dlsym, probing version suffixes.
// The resulting .so has no link-time ICU dependency; if ICU is absent at
// runtime, lr_icu_available() returns 0 and Python falls back to regex.
//
// Exposed C ABI (ctypes):
//   int   lr_icu_available();
//   void* lr_icu_open(const char* locale);        // "" = root locale
//   void  lr_icu_close(void* seg);
//   char* lr_icu_segment(void* seg, const char* utf8, int64_t nbytes);
//         // '\n'-joined word tokens (rule status >= UBRK_WORD_NUMBER,
//         //  i.e. whitespace/punctuation dropped); free with lr_icu_free
//   void  lr_icu_free(void* p);
#include <cstdint>
#include <cstdlib>
#include <cstring>
#include <string>
#include <vector>
#include <dlfcn.h>

typedef uint16_t UChar;
typedef int32_t UErrorCode_t;  // ICU UErrorCode is an enum; int32 ABI-compatible
typedef void UBreakIterator;

static const int UBRK_WORD = 1;
static const int UBRK_WORD_NONE_LIMIT = 100;  // statuses below: space/punct

typedef UChar* (*u_strFromUTF8_t)(UChar*, int32_t, int32_t*, const char*,
                                  int32_t, UErrorCode_t*);
typedef char* (*u_strToUTF8_t)(char*, int32_t, int32_t*, const UChar*,
                               int32_t, UErrorCode_t*);
typedef UBreakIterator* (*ubrk_open_t)(int, const char*, const UChar*, int32_t,
                                       UErrorCode_t*);
typedef void (*ubrk_setText_t)(UBreakIterator*, const UChar*, int32_t,
                               UErrorCode_t*);
typedef int32_t (*ubrk_first_t)(UBreakIterator*);
typedef int32_t (*ubrk_next_t)(UBreakIterator*);
typedef int32_t (*ubrk_getRuleStatus_t)(UBreakIterator*);
typedef void (*ubrk_close_t)(UBreakIterator*);

static struct IcuApi {
  bool loaded = false;
  u_strFromUTF8_t u_strFromUTF8 = nullptr;
  u_strToUTF8_t u_strToUTF8 = nullptr;
  ubrk_open_t ubrk_open = nullptr;
  ubrk_setText_t ubrk_setText = nullptr;
  ubrk_first_t ubrk_first = nullptr;
  ubrk_next_t ubrk_next = nullptr;
  ubrk_getRuleStatus_t ubrk_getRuleStatus = nullptr;
  ubrk_close_t ubrk_close = nullptr;
} g_icu;

static void* sym_with_suffix(void* lib, const char* name, const char* suffix) {
  std::string full = std::string(name) + suffix;
  return dlsym(lib, full.c_str());
}

static bool load_icu() {
  if (g_icu.loaded) return true;
  // Probe common sonames; Debian/Ubuntu ship libicuuc.so.NN only (no .so link)
  const char* candidates[] = {
      "libicuuc.so",   "libicuuc.so.76", "libicuuc.so.74", "libicuuc.so.72",
      "libicuuc.so.71", "libicuuc.so.70", "libicuuc.so.67", "libicuuc.so.66",
  };
  void* lib = nullptr;
  for (const char* c : candidates) {
    lib = dlopen(c, RTLD_NOW | RTLD_GLOBAL);
    if (lib) break;
  }
  if (!lib) return false;
  // Symbols carry the major-version suffix (default ICU renaming); probe it.
  std::string suffix;
  if (!sym_with_suffix(lib, "ubrk_open", "")) {
    for (int v = 60; v <= 90; v++) {
      std::string s = "_" + std::to_string(v);
      if (sym_with_suffix(lib, "ubrk_open", s.c_str())) { suffix = s; break; }
    }
    if (suffix.empty()) return false;
  }
  const char* sfx = suffix.c_str();
  g_icu.u_strFromUTF8 = (u_strFromUTF8_t)sym_with_suffix(lib, "u_strFromUTF8", sfx);
  g_icu.u_strToUTF8 = (u_strToUTF8_t)sym_with_suffix(lib, "u_strToUTF8", sfx);
  g_icu.ubrk_open = (ubrk_open_t)sym_with_suffix(lib, "ubrk_open", sfx);
  g_icu.ubrk_setText = (ubrk_setText_t)sym_with_suffix(lib, "ubrk_setText", sfx);
  g_icu.ubrk_first = (ubrk_first_t)sym_with_suffix(lib, "ubrk_first", sfx);
  g_icu.ubrk_next = (ubrk_next_t)sym_with_suffix(lib, "ubrk_next", sfx);
  g_icu.ubrk_getRuleStatus =
      (ubrk_getRuleStatus_t)sym_with_suffix(lib, "ubrk_getRuleStatus", sfx);
  g_icu.ubrk_close = (ubrk_close_t)sym_with_suffix(lib, "ubrk_close", sfx);
  g_icu.loaded = g_icu.u_strFromUTF8 && g_icu.u_strToUTF8 && g_icu.ubrk_open &&
                 g_icu.ubrk_setText && g_icu.ubrk_first && g_icu.ubrk_next &&
                 g_icu.ubrk_getRuleStatus && g_icu.ubrk_close;
  return g_icu.loaded;
}

struct Segmenter {
  UBreakIterator* it;
  std::vector<UChar> u16;   // reusable UTF-16 buffer
  std::vector<char> out;    // reusable output buffer
};

extern "C" {

int lr_icu_available() { return load_icu() ? 1 : 0; }

void* lr_icu_open(const char* locale) {
  if (!load_icu()) return nullptr;
  UErrorCode_t status = 0;
  UBreakIterator* it =
      g_icu.ubrk_open(UBRK_WORD, (locale && *locale) ? locale : nullptr,
                      nullptr, 0, &status);
  if (status > 0 || !it) return nullptr;
  Segmenter* seg = new Segmenter();
  seg->it = it;
  return seg;
}

void lr_icu_close(void* p) {
  if (!p) return;
  Segmenter* seg = (Segmenter*)p;
  g_icu.ubrk_close(seg->it);
  delete seg;
}

char* lr_icu_segment(void* p, const char* utf8, int64_t nbytes) {
  Segmenter* seg = (Segmenter*)p;
  if (!seg || !utf8) return nullptr;
  UErrorCode_t status = 0;
  // UTF-8 -> UTF-16 (worst case: 1 UTF-16 unit per UTF-8 byte)
  seg->u16.resize((size_t)nbytes + 1);
  int32_t u16len = 0;
  g_icu.u_strFromUTF8(seg->u16.data(), (int32_t)seg->u16.size(), &u16len, utf8,
                      (int32_t)nbytes, &status);
  if (status > 0) return nullptr;

  status = 0;
  g_icu.ubrk_setText(seg->it, seg->u16.data(), u16len, &status);
  if (status > 0) return nullptr;

  seg->out.clear();
  int32_t start = g_icu.ubrk_first(seg->it);
  for (int32_t end = g_icu.ubrk_next(seg->it); end != -1;
       start = end, end = g_icu.ubrk_next(seg->it)) {
    // Rule status of the *preceding* boundary run; >= 100 means a real word
    // (NUMBER/LETTER/KANA/IDEO); below that it is space/punctuation.
    if (g_icu.ubrk_getRuleStatus(seg->it) < UBRK_WORD_NONE_LIMIT) continue;
    // Convert this token back to UTF-8 (worst case 3 bytes per UTF-16 unit)
    int32_t tlen16 = end - start;
    size_t off = seg->out.size();
    seg->out.resize(off + (size_t)tlen16 * 3 + 1);
    int32_t t8len = 0;
    UErrorCode_t st2 = 0;
    g_icu.u_strToUTF8(seg->out.data() + off, (int32_t)(tlen16 * 3 + 1), &t8len,
                      seg->u16.data() + start, tlen16, &st2);
    if (st2 > 0) { seg->out.resize(off); continue; }
    seg->out.resize(off + (size_t)t8len);
    seg->out.push_back('\n');
  }
  if (!seg->out.empty() && seg->out.back() == '\n') seg->out.pop_back();
  char* res = (char*)malloc(seg->out.size() + 1);
  memcpy(res, seg->out.data(), seg->out.size());
  res[seg->out.size()] = '\0';
  return res;
}

void lr_icu_free(void* p) { free(p); }

}  // extern "C"
