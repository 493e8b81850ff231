// Fast sparse-representation converter — C++ replacement of the reference's
// Rust `sparse_emb_util.Converter` (reference: finetune/
// sparse_converter_mixin.py:19-101 drives it; quantize x factor, serialize as
// json impact vectors or impact-repeated pseudo-text).
//
// Exposed as a plain C ABI consumed via ctypes (no pybind11 in this image).
// The hot loop scans the dense [B, V] float array once, quantizes, and
// serializes straight into a single growable buffer ('\n'-separated records),
// so Python sees one bytes object per batch instead of B dict/str objects
// built in the interpreter.

#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <string>
#include <vector>

namespace {

inline void append_int(std::string& out, long long value) {
    char buf[24];
    int n = snprintf(buf, sizeof(buf), "%lld", value);
    out.append(buf, n);
}

}  // namespace

extern "C" {

// reps: [b, v] row-major float32. Returns a malloc'd NUL-terminated buffer of
// b '\n'-separated records. mode 0 = json {"tok": impact, ...};
// mode 1 = pseudo-text "tok tok tok ..." (token repeated impact times).
char* lr_sparse_convert(const float* reps, int64_t b, int64_t v,
                        int32_t quantization_factor, int32_t mode) {
    std::string out;
    out.reserve(static_cast<size_t>(b) * 64);
    for (int64_t i = 0; i < b; ++i) {
        const float* row = reps + i * v;
        if (mode == 0) {
            out.push_back('{');
            bool first = true;
            for (int64_t t = 0; t < v; ++t) {
                const long long q =
                    static_cast<long long>(row[t] * quantization_factor);  // floor for x>=0
                if (q <= 0) continue;
                if (!first) out.push_back(',');
                first = false;
                out.push_back('"');
                append_int(out, t);
                out.append("\":");
                append_int(out, q);
            }
            out.push_back('}');
        } else {
            bool first = true;
            for (int64_t t = 0; t < v; ++t) {
                const long long q =
                    static_cast<long long>(row[t] * quantization_factor);
                if (q <= 0) continue;
                for (long long r = 0; r < q; ++r) {
                    if (!first) out.push_back(' ');
                    first = false;
                    append_int(out, t);
                }
            }
        }
        out.push_back('\n');
    }
    char* buf = static_cast<char*>(malloc(out.size() + 1));
    memcpy(buf, out.data(), out.size());
    buf[out.size()] = '\0';
    return buf;
}

void lr_free(char* p) { free(p); }

// Count-vector builder for the parameter-free query encoder: token ids
// [n] -> appends "id:count" pairs per row given row offsets. Used by the
// BM25/token-count hot path.
char* lr_token_counts_json(const int32_t* ids, const int64_t* offsets,
                           int64_t n_rows) {
    std::string out;
    std::vector<std::pair<int32_t, int32_t>> items;
    for (int64_t r = 0; r < n_rows; ++r) {
        items.clear();
        for (int64_t j = offsets[r]; j < offsets[r + 1]; ++j) {
            const int32_t id = ids[j];
            bool found = false;
            for (auto& kv : items) {
                if (kv.first == id) { kv.second += 1; found = true; break; }
            }
            if (!found) items.emplace_back(id, 1);
        }
        out.push_back('{');
        for (size_t k = 0; k < items.size(); ++k) {
            if (k) out.push_back(',');
            out.push_back('"');
            append_int(out, items[k].first);
            out.append("\":");
            append_int(out, items[k].second);
        }
        out.push_back('}');
        out.push_back('\n');
    }
    char* buf = static_cast<char*>(malloc(out.size() + 1));
    memcpy(buf, out.data(), out.size());
    buf[out.size()] = '\0';
    return buf;
}

}  // extern "C"
