// Native host-runtime kernels for dot_tpu's static-plan construction.
//
// The assembly plans sort and deduplicate tens of millions of 64-bit
// destination keys (partition.py). The hot path packs (key, index) into
// one 64-bit word (key<<25 | index) and LSD-radix-sorts the packed array —
// sequential reads, no indirection — then emits the permutation, the
// stage-1 segment ids (inverse) and the unique keys in one fused pass.
//
// This plays the role of the reference's native runtime layer (its
// CSR-pattern builders and IJ2aI maps, LinSysSolver.hpp:37-135): the graph
// bookkeeping is native, the compute path is XLA.

#include <cstdint>
#include <cstring>
#include <vector>

namespace {

constexpr int IDX_BITS = 25;           // up to 33.5M entries
constexpr int64_t IDX_MASK = (1LL << IDX_BITS) - 1;

// radix sort packed (key<<IDX_BITS | idx) by the key bits only
void radix_sort_packed(std::vector<uint64_t>& a, uint64_t maxkey) {
    const int BITS = 11;
    const int BUCKETS = 1 << BITS;
    const int64_t n = (int64_t)a.size();
    std::vector<uint64_t> tmp(n);
    std::vector<int64_t> counts(BUCKETS);

    int passes = 1;
    while (passes * BITS < 64 - IDX_BITS && (maxkey >> (passes * BITS)) != 0)
        ++passes;

    uint64_t* src = a.data();
    uint64_t* dst = tmp.data();
    for (int p = 0; p < passes; ++p) {
        const int shift = IDX_BITS + p * BITS;
        std::memset(counts.data(), 0, BUCKETS * sizeof(int64_t));
        for (int64_t i = 0; i < n; ++i)
            ++counts[(src[i] >> shift) & (BUCKETS - 1)];
        int64_t sum = 0;
        for (int b = 0; b < BUCKETS; ++b) {
            int64_t c = counts[b];
            counts[b] = sum;
            sum += c;
        }
        for (int64_t i = 0; i < n; ++i)
            dst[counts[(src[i] >> shift) & (BUCKETS - 1)]++] = src[i];
        uint64_t* t = src; src = dst; dst = t;
    }
    if (src != a.data())
        std::memcpy(a.data(), src, n * sizeof(uint64_t));
}

}  // namespace

extern "C" {

// Sort+unique+inverse for int64 keys. Requirements: n < 2^25 and
// max(key) < 2^(64-25-1); returns -1 if violated (caller falls back).
// Outputs: perm (n, i32), inverse (n, i32, sorted order), unique (<=n, i64).
// Returns the number of uniques.
int64_t sort_unique_inverse_i64(const int64_t* keys, int64_t n,
                                int32_t* perm_out, int32_t* inverse_out,
                                int64_t* unique_out) {
    if (n <= 0) return 0;
    if (n > IDX_MASK) return -1;
    int64_t maxk = 0;
    for (int64_t i = 0; i < n; ++i)
        if (keys[i] > maxk) maxk = keys[i];
    if (maxk < 0 || (uint64_t)maxk >= (1ULL << (63 - IDX_BITS))) return -1;

    std::vector<uint64_t> packed(n);
    for (int64_t i = 0; i < n; ++i)
        packed[i] = ((uint64_t)keys[i] << IDX_BITS) | (uint64_t)i;
    radix_sort_packed(packed, (uint64_t)maxk);

    int64_t nu = 0;
    uint64_t prev_key = ~0ULL;
    for (int64_t i = 0; i < n; ++i) {
        const uint64_t k = packed[i] >> IDX_BITS;
        perm_out[i] = (int32_t)(packed[i] & IDX_MASK);
        if (k != prev_key) {
            unique_out[nu++] = (int64_t)k;
            prev_key = k;
        }
        inverse_out[i] = (int32_t)(nu - 1);
    }
    return nu;
}

// Fused 3x3-block scatter plan: from n_tuples (sbd,row,col) block
// coordinates with dense stride n3, build the 9n scalar destinations
// dest = sbd*n3^2 + (row*3+i)*n3 + col*3+j (i,j row-major), then
// sort+unique+inverse them. Outputs sized 9n. Returns uniques or -1.
int64_t build_block_plan(const int32_t* sbd, const int32_t* row,
                         const int32_t* col, int64_t n_tuples, int64_t n3,
                         int32_t* perm_out, int32_t* inverse_out,
                         int64_t* unique_out) {
    const int64_t n = n_tuples * 9;
    if (n <= 0) return 0;
    if (n > IDX_MASK) return -1;
    // bound check on keys
    const uint64_t maxdest =
        (uint64_t)n3 * n3 * 2048;  // conservative; verified below anyway

    std::vector<uint64_t> packed(n);
    uint64_t maxk = 0;
    for (int64_t t = 0; t < n_tuples; ++t) {
        const int64_t base = (int64_t)sbd[t] * n3 * n3;
        const int64_t r3 = (int64_t)row[t] * 3;
        const int64_t c3 = (int64_t)col[t] * 3;
        for (int i = 0; i < 3; ++i) {
            const int64_t rowoff = base + (r3 + i) * n3 + c3;
            for (int j = 0; j < 3; ++j) {
                const uint64_t key = (uint64_t)(rowoff + j);
                if (key > maxk) maxk = key;
                packed[t * 9 + i * 3 + j] =
                    (key << IDX_BITS) | (uint64_t)(t * 9 + i * 3 + j);
            }
        }
    }
    (void)maxdest;
    if (maxk >= (1ULL << (63 - IDX_BITS))) return -1;
    radix_sort_packed(packed, maxk);

    int64_t nu = 0;
    uint64_t prev_key = ~0ULL;
    for (int64_t i = 0; i < n; ++i) {
        const uint64_t k = packed[i] >> IDX_BITS;
        perm_out[i] = (int32_t)(packed[i] & IDX_MASK);
        if (k != prev_key) {
            unique_out[nu++] = (int64_t)k;
            prev_key = k;
        }
        inverse_out[i] = (int32_t)(nu - 1);
    }
    return nu;
}

}  // extern "C"
