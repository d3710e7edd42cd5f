// Native series-literal parser — the host data-loading hot path.
//
// The reference parses every CSV row's series/embedding column with
// ast.literal_eval (datafactory/dataset.py:76,85-94), which dominates load
// time on the 600K-row TSFragment corpora. This kernel parses a batch of
// bracketed float-list literals (e.g. "[0.1, -2.3e-1, ...]") or
// space-separated embedding dumps ("[0.1 0.2 ...]") in one pass.
//
// Contract: `buf` holds N newline-separated literals; `out` has room for
// n_rows * row_len doubles; returns the number of rows parsed, or -k on a
// length mismatch at row k-1.

#include <cstdlib>
#include <cstring>

extern "C" {

long t2ms_parse_float_lists(const char* buf, long n_rows, long row_len,
                            double* out) {
    const char* p = buf;
    for (long r = 0; r < n_rows; ++r) {
        long count = 0;
        // skip to content
        while (*p == '[' || *p == ' ' || *p == '\t') ++p;
        while (*p && *p != '\n') {
            if (*p == ']' ) { ++p; continue; }
            if (*p == ',' || *p == ' ' || *p == '\t') { ++p; continue; }
            char* end = nullptr;
            double v = strtod(p, &end);
            if (end == p) { ++p; continue; }  // stray char
            if (count >= row_len) return -(r + 1);
            out[r * row_len + count++] = v;
            p = end;
        }
        if (count != row_len) return -(r + 1);
        if (*p == '\n') ++p;
    }
    return n_rows;
}

// Variant for ragged rows: writes row lengths into `lens` (capacity
// n_rows) and values contiguously into `out` (capacity total_capacity).
// Returns total values written, or -k on overflow at row k-1.
long t2ms_parse_float_lists_ragged(const char* buf, long n_rows,
                                   long total_capacity, double* out,
                                   long* lens) {
    const char* p = buf;
    long written = 0;
    for (long r = 0; r < n_rows; ++r) {
        long count = 0;
        while (*p == '[' || *p == ' ' || *p == '\t') ++p;
        while (*p && *p != '\n') {
            if (*p == ']' || *p == ',' || *p == ' ' || *p == '\t') {
                ++p;
                continue;
            }
            char* end = nullptr;
            double v = strtod(p, &end);
            if (end == p) { ++p; continue; }
            if (written >= total_capacity) return -(r + 1);
            out[written++] = v;
            ++count;
            p = end;
        }
        lens[r] = count;
        if (*p == '\n') ++p;
    }
    return written;
}

}  // extern "C"
