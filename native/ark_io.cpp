// Fast Kaldi binary-ark reader.
//
// Native-runtime replacement for the reference's subprocess-based ark
// handling (copy-feats pipes, SURVEY.md §2 L2): sequentially scans a binary
// ark of FM/DM matrices, exposing a cursor API over a C ABI for ctypes.
// The hot loop (training-data ingestion) reads with buffered stdio and
// writes straight into caller-provided float32 buffers.

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <string>
#include <vector>

namespace {

struct ArkCursor {
    FILE* f = nullptr;
    std::string key;
    int32_t rows = 0, cols = 0;
    char dtype = 0;  // 'F' or 'D'
};

bool read_token(FILE* f, std::string& out) {
    out.clear();
    int ch;
    while ((ch = std::fgetc(f)) != EOF) {
        if (ch == ' ') return true;
        out.push_back(char(ch));
    }
    return !out.empty();
}

}  // namespace

extern "C" {

void* ark_open(const char* path) {
    FILE* f = std::fopen(path, "rb");
    if (!f) return nullptr;
    auto* c = new ArkCursor();
    c->f = f;
    return c;
}

// Advance to the next entry. Returns 1 on success, 0 on EOF, -1 on format
// error. Fills key (NUL-terminated, truncated to key_cap), rows, cols.
int ark_next(void* handle, char* key, int64_t key_cap, int32_t* rows,
             int32_t* cols) {
    auto* c = static_cast<ArkCursor*>(handle);
    if (!c || !c->f) return -1;
    if (!read_token(c->f, c->key)) return 0;
    unsigned char hdr[2];
    if (std::fread(hdr, 1, 2, c->f) != 2) return -1;
    if (hdr[0] != 0 || hdr[1] != 'B') return -1;
    std::string tok;
    if (!read_token(c->f, tok)) return -1;
    if (tok != "FM" && tok != "DM") return -1;
    c->dtype = tok[0];
    unsigned char sz;
    if (std::fread(&sz, 1, 1, c->f) != 1 || sz != 4) return -1;
    if (std::fread(&c->rows, 4, 1, c->f) != 1) return -1;
    if (std::fread(&sz, 1, 1, c->f) != 1 || sz != 4) return -1;
    if (std::fread(&c->cols, 4, 1, c->f) != 1) return -1;
    std::snprintf(key, size_t(key_cap), "%s", c->key.c_str());
    *rows = c->rows;
    *cols = c->cols;
    return 1;
}

// Read the current entry's data as float32 into out (rows*cols floats).
int ark_read_f32(void* handle, float* out) {
    auto* c = static_cast<ArkCursor*>(handle);
    if (!c || !c->f) return -1;
    size_t n = size_t(c->rows) * size_t(c->cols);
    if (c->dtype == 'F') {
        if (std::fread(out, 4, n, c->f) != n) return -1;
    } else {
        std::vector<double> tmp(n);
        if (std::fread(tmp.data(), 8, n, c->f) != n) return -1;
        for (size_t i = 0; i < n; ++i) out[i] = float(tmp[i]);
    }
    return 0;
}

// Skip the current entry's data without reading.
int ark_skip(void* handle) {
    auto* c = static_cast<ArkCursor*>(handle);
    if (!c || !c->f) return -1;
    size_t bytes = size_t(c->rows) * size_t(c->cols) *
                   (c->dtype == 'F' ? 4 : 8);
    return std::fseek(c->f, long(bytes), SEEK_CUR) == 0 ? 0 : -1;
}

void ark_close(void* handle) {
    auto* c = static_cast<ArkCursor*>(handle);
    if (c) {
        if (c->f) std::fclose(c->f);
        delete c;
    }
}

}  // extern "C"
