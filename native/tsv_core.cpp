// Native TSV/lineidx core for the vil_tpu data loader.
//
// The reference's data path is pure Python (SURVEY §2.15): lineidx files are
// built with a per-line readline() loop (tsv_file.py:7-16), which is the
// bottleneck when indexing multi-GB ImageNet TSVs. This library provides:
//
//   * build_lineidx  — single-pass 1MB-chunk newline scan writing the same
//                      text offset format (byte-compatible sidecars);
//   * count_rows     — newline count without writing;
//   * read_row       — pread() a row by byte offset (thread-safe, no shared
//                      file-position state, so loader threads need no locks);
//   * b64_decode     — branchless-ish base64 for image payloads.
//
// Exposed via ctypes (see vil_tpu/data/native.py); the Python implementation
// remains the fallback when the shared library is unavailable.

#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>

#include <fcntl.h>
#include <unistd.h>

extern "C" {

// Scan `tsv_path`, write one decimal byte-offset per line to `idx_path`.
// Returns the number of rows, or -1 on error.
int64_t build_lineidx(const char* tsv_path, const char* idx_path) {
    FILE* in = fopen(tsv_path, "rb");
    if (!in) return -1;
    FILE* out = fopen(idx_path, "w");
    if (!out) { fclose(in); return -1; }

    const size_t CHUNK = 1 << 20;
    char* buf = static_cast<char*>(malloc(CHUNK));
    if (!buf) { fclose(in); fclose(out); return -1; }

    int64_t rows = 0;
    int64_t pos = 0;
    bool at_line_start = true;
    size_t got;
    while ((got = fread(buf, 1, CHUNK, in)) > 0) {
        for (size_t i = 0; i < got; ++i) {
            if (at_line_start) {
                fprintf(out, "%lld\n", static_cast<long long>(pos + i));
                ++rows;
                at_line_start = false;
            }
            if (buf[i] == '\n') at_line_start = true;
        }
        pos += static_cast<int64_t>(got);
    }
    free(buf);
    fclose(in);
    if (fclose(out) != 0) return -1;
    return rows;
}

int64_t count_rows(const char* tsv_path) {
    FILE* in = fopen(tsv_path, "rb");
    if (!in) return -1;
    const size_t CHUNK = 1 << 20;
    char* buf = static_cast<char*>(malloc(CHUNK));
    if (!buf) { fclose(in); return -1; }
    int64_t rows = 0;
    bool at_line_start = true;
    size_t got;
    while ((got = fread(buf, 1, CHUNK, in)) > 0) {
        for (size_t i = 0; i < got; ++i) {
            if (at_line_start) { ++rows; at_line_start = false; }
            if (buf[i] == '\n') at_line_start = true;
        }
    }
    free(buf);
    fclose(in);
    return rows;
}

// Open a file for pread-based row access; returns fd or -1.
int tsv_open(const char* path) { return open(path, O_RDONLY); }

void tsv_close(int fd) { close(fd); }

// Read the row starting at `offset` into `out` (at most `cap` bytes,
// excluding the trailing newline). Returns the row length, or -1 on error,
// or -2 if the row is longer than `cap` (caller should retry with a bigger
// buffer; the returned data is still the first `cap` bytes).
int64_t read_row(int fd, int64_t offset, char* out, int64_t cap) {
    int64_t total = 0;
    while (total < cap) {
        ssize_t got = pread(fd, out + total, static_cast<size_t>(cap - total),
                            offset + total);
        if (got < 0) return -1;
        if (got == 0) break;  // EOF
        char* nl = static_cast<char*>(
            memchr(out + total, '\n', static_cast<size_t>(got)));
        if (nl) return (nl - out);
        total += got;
    }
    return total == cap ? -2 : total;
}

// Standard base64 decode (ignores whitespace/padding). Returns decoded
// length or -1 on invalid input. `out` must hold at least 3*(n/4)+3 bytes.
int64_t b64_decode(const char* in, int64_t n, unsigned char* out) {
    static int8_t lut[256];
    static bool init = false;
    if (!init) {
        memset(lut, -1, sizeof(lut));
        const char* alphabet =
            "ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz0123456789+/";
        for (int i = 0; i < 64; ++i) lut[static_cast<unsigned char>(alphabet[i])] = static_cast<int8_t>(i);
        init = true;
    }
    int64_t out_len = 0;
    uint32_t acc = 0;
    int bits = 0;
    for (int64_t i = 0; i < n; ++i) {
        unsigned char c = static_cast<unsigned char>(in[i]);
        if (c == '=' || c == '\n' || c == '\r' || c == ' ') continue;
        int8_t v = lut[c];
        if (v < 0) return -1;
        acc = (acc << 6) | static_cast<uint32_t>(v);
        bits += 6;
        if (bits >= 8) {
            bits -= 8;
            out[out_len++] = static_cast<unsigned char>((acc >> bits) & 0xFF);
        }
    }
    return out_len;
}

}  // extern "C"
