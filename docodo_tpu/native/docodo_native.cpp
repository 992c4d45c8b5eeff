// Native host pipeline for docodo_tpu.
//
// The device side of the framework is JAX/XLA; this library covers the
// host hot loops that feed it (the reference engine runs these inside
// the .NET runtime: tokenizer ref Docodo.NET/Build.cs:526-531, word
// interning via SortedList ref Build.cs:302-316, varint codec ref
// IndexSequence.cs:63-136):
//
//   * tokenize+intern: one pass over UTF-16 code units — case-fold,
//     letter/digit classification, token segmentation (\p{L}+|\p{N}+,
//     length 3..32 like ref Index.cs:97,113) and term-id interning into
//     an open-addressing hash map with a string arena;
//   * 15-bit varint encode/decode of delta-coded posting coordinates.
//
// Exposed as a C ABI for ctypes; fold/class tables are built in Python
// (from Python's str.lower()/unicodedata) and passed in, so the native
// code has no Unicode tables of its own and matches the Python
// tokenizer bit-for-bit.

#include <cstdint>
#include <cstring>
#include <vector>

namespace {

struct Interner {
    // open addressing, power-of-two capacity
    std::vector<int64_t> slots;      // index into entries, -1 empty
    std::vector<uint64_t> hashes;
    // entries: flat arena of u16 strings
    std::vector<uint16_t> arena;
    std::vector<int64_t> offs;       // entry -> arena offset
    std::vector<int32_t> lens;       // entry -> length

    Interner() : slots(1 << 16, -1), hashes(1 << 16, 0) {}

    static uint64_t hash(const uint16_t* s, int32_t len) {
        uint64_t h = 1469598103934665603ull;
        for (int32_t i = 0; i < len; i++) {
            h ^= s[i];
            h *= 1099511628211ull;
        }
        return h | 1;  // nonzero
    }

    void grow() {
        size_t ncap = slots.size() * 2;
        std::vector<int64_t> ns(ncap, -1);
        std::vector<uint64_t> nh(ncap, 0);
        for (size_t i = 0; i < slots.size(); i++) {
            if (slots[i] < 0) continue;
            size_t j = hashes[i] & (ncap - 1);
            while (ns[j] >= 0) j = (j + 1) & (ncap - 1);
            ns[j] = slots[i];
            nh[j] = hashes[i];
        }
        slots.swap(ns);
        hashes.swap(nh);
    }

    int32_t intern(const uint16_t* s, int32_t len) {
        if (offs.size() * 10 >= slots.size() * 7) grow();
        uint64_t h = hash(s, len);
        size_t mask = slots.size() - 1;
        size_t j = h & mask;
        while (slots[j] >= 0) {
            if (hashes[j] == h) {
                int64_t e = slots[j];
                if (lens[e] == len &&
                    std::memcmp(&arena[offs[e]], s, len * 2) == 0)
                    return (int32_t)e;
            }
            j = (j + 1) & mask;
        }
        int32_t id = (int32_t)offs.size();
        offs.push_back((int64_t)arena.size());
        lens.push_back(len);
        arena.insert(arena.end(), s, s + len);
        slots[j] = id;
        hashes[j] = h;
        return id;
    }
};

}  // namespace

extern "C" {

void* docodo_interner_new() { return new Interner(); }

void docodo_interner_free(void* p) { delete (Interner*)p; }

int64_t docodo_interner_count(void* p) {
    return (int64_t)((Interner*)p)->offs.size();
}

// Copy term `i` (UTF-16 units) into out (cap units); returns length.
int32_t docodo_interner_get(void* p, int64_t i, uint16_t* out, int32_t cap) {
    Interner* in = (Interner*)p;
    if (i < 0 || (size_t)i >= in->offs.size()) return -1;
    int32_t len = in->lens[i];
    int32_t n = len < cap ? len : cap;
    std::memcpy(out, &in->arena[in->offs[i]], n * 2);
    return len;
}

// Bulk export: concatenated units + per-term lengths.
int64_t docodo_interner_arena_size(void* p) {
    return (int64_t)((Interner*)p)->arena.size();
}

void docodo_interner_export(void* p, uint16_t* units, int32_t* lens_out) {
    Interner* in = (Interner*)p;
    std::memcpy(units, in->arena.data(), in->arena.size() * 2);
    std::memcpy(lens_out, in->lens.data(), in->lens.size() * 4);
}

// One-pass tokenize + intern.
//   units      : UTF-16 code units of the RAW text, length n
//   fold       : 65536-entry case-fold table (unit -> lowercased unit;
//                units whose Python lower() is not a single same-length
//                unit must be pre-folded by the caller)
//   cls        : 65536-entry class table: 0 other, 1 letter, 2 digit
//   min/max len: token length filter (0 disables — emit all runs)
//   out_ids    : term id per kept token
//   out_starts : unit offset per kept token
// Returns number of kept tokens (bounded by max_tokens).
int64_t docodo_tokenize_intern(
    void* interner, const uint16_t* units, int64_t n,
    const uint16_t* fold, const uint8_t* cls,
    int32_t min_len, int32_t max_len,
    int32_t* out_ids, int32_t* out_starts, int64_t max_tokens) {
    Interner* in = (Interner*)interner;
    int64_t count = 0;
    uint16_t buf[64];
    int64_t i = 0;
    while (i < n && count < max_tokens) {
        uint8_t c = cls[units[i]];
        if (c == 0) {
            i++;
            continue;
        }
        int64_t start = i;
        int32_t len = 0;
        while (i < n && cls[units[i]] == c) {
            if (len < 64) buf[len] = fold[units[i]];
            len++;
            i++;
        }
        if (min_len && (len < min_len || len > max_len)) continue;
        if (len > 64) continue;
        out_ids[count] = in->intern(buf, len);
        out_starts[count] = (int32_t)start;
        count++;
    }
    return count;
}

// Tokenize only (no interning): emit (start, len) pairs.
int64_t docodo_tokenize(
    const uint16_t* units, int64_t n, const uint8_t* cls,
    int32_t min_len, int32_t max_len,
    int32_t* out_starts, int32_t* out_lens, int64_t max_tokens) {
    int64_t count = 0;
    int64_t i = 0;
    while (i < n && count < max_tokens) {
        uint8_t c = cls[units[i]];
        if (c == 0) {
            i++;
            continue;
        }
        int64_t start = i;
        while (i < n && cls[units[i]] == c) i++;
        int64_t len = i - start;
        if (min_len && (len < min_len || len > max_len)) continue;
        out_starts[count] = (int32_t)start;
        out_lens[count] = (int32_t)len;
        count++;
    }
    return count;
}

// 15-bit varint encode: deltas of ascending u64 coords into u16 words
// (MSB = continuation). Returns word count; pass out=null to size.
int64_t docodo_varint_encode(
    const uint64_t* coords, int64_t n, uint16_t* out) {
    int64_t w = 0;
    uint64_t prev = 0;
    for (int64_t i = 0; i < n; i++) {
        uint64_t d = coords[i] - prev;
        prev = coords[i];
        do {
            uint16_t chunk = (uint16_t)(d & 0x7FFF);
            d >>= 15;
            if (d) chunk |= 0x8000;
            if (out) out[w] = chunk;
            w++;
        } while (d);
    }
    return w;
}

// Decode u16 varint stream back into ascending u64 coords.
// Returns coordinate count; pass out=null to size.
int64_t docodo_varint_decode(
    const uint16_t* words, int64_t nwords, uint64_t* out) {
    int64_t c = 0;
    uint64_t acc = 0;
    uint64_t cur = 0;
    int shift = 0;
    for (int64_t i = 0; i < nwords; i++) {
        uint16_t w = words[i];
        cur |= (uint64_t)(w & 0x7FFF) << shift;
        if (w & 0x8000) {
            shift += 15;
        } else {
            acc += cur;
            if (out) out[c] = acc;
            c++;
            cur = 0;
            shift = 0;
        }
    }
    return c;
}

}  // extern "C"
