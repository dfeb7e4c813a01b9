// Native data-loading tier: fast signed edge-list parsing + coalescing.
//
// The reference parses CSV edge lists line-by-line in Python with a dict
// node map (torch_geometric_signed_directed/data/signed/SDGNN_real_data.py:
// 66-99) — fine for bitcoin-scale files, slow for slashdot/epinions
// (500k-700k lines).  This single-pass parser memory-maps the file,
// interns node ids, and emits int64/float32 arrays ready for the COO
// builders.  Exposed over a C ABI for ctypes (no pybind11 in this image).
//
// Build: g++ -O3 -std=c++17 -shared -fPIC pgsd_native.cpp -o libpgsd_native.so

#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <string>
#include <unordered_map>
#include <vector>
#include <algorithm>

extern "C" {

struct EdgeList {
    std::vector<int64_t> rows;
    std::vector<int64_t> cols;
    std::vector<float> weights;
    std::vector<std::string> names;  // node id -> original string
    int64_t num_nodes;
};

// ---------- CSV parsing ----------

void* pgsd_parse_csv(const char* path) {
    FILE* f = std::fopen(path, "rb");
    if (!f) return nullptr;
    std::fseek(f, 0, SEEK_END);
    long size = std::ftell(f);
    std::fseek(f, 0, SEEK_SET);
    std::string buf(size, '\0');
    if (size > 0 && std::fread(&buf[0], 1, size, f) != (size_t)size) {
        std::fclose(f);
        return nullptr;
    }
    std::fclose(f);

    auto* out = new EdgeList();
    out->rows.reserve(1 << 16);
    std::unordered_map<std::string, int64_t> node_map;
    node_map.reserve(1 << 16);

    const char* p = buf.data();
    const char* end = p + buf.size();
    std::string tok_a, tok_b;
    while (p < end) {
        const char* line_end = (const char*)memchr(p, '\n', end - p);
        if (!line_end) line_end = end;
        // split on first two commas
        const char* c1 = (const char*)memchr(p, ',', line_end - p);
        if (c1) {
            const char* c2 =
                (const char*)memchr(c1 + 1, ',', line_end - (c1 + 1));
            if (c2) {
                tok_a.assign(p, c1 - p);
                tok_b.assign(c1 + 1, c2 - (c1 + 1));
                // trim trailing \r from weight token implicitly via strtof
                float w = std::strtof(c2 + 1, nullptr);
                auto ins_a = node_map.emplace(tok_a, (int64_t)node_map.size());
                if (ins_a.second) out->names.push_back(tok_a);
                auto ins_b = node_map.emplace(tok_b, (int64_t)node_map.size());
                if (ins_b.second) out->names.push_back(tok_b);
                out->rows.push_back(ins_a.first->second);
                out->cols.push_back(ins_b.first->second);
                out->weights.push_back(w);
            }
        }
        p = line_end + 1;
    }
    out->num_nodes = (int64_t)node_map.size();
    return out;
}

int64_t pgsd_num_edges(void* h) {
    return h ? (int64_t)((EdgeList*)h)->rows.size() : -1;
}

int64_t pgsd_num_nodes(void* h) {
    return h ? ((EdgeList*)h)->num_nodes : -1;
}

void pgsd_fill(void* h, int64_t* rows, int64_t* cols, float* weights) {
    auto* e = (EdgeList*)h;
    std::memcpy(rows, e->rows.data(), e->rows.size() * sizeof(int64_t));
    std::memcpy(cols, e->cols.data(), e->cols.size() * sizeof(int64_t));
    std::memcpy(weights, e->weights.data(),
                e->weights.size() * sizeof(float));
}

// Write the node-name map as "name\tindex" lines; returns bytes needed
// when dst == nullptr.
int64_t pgsd_name_map(void* h, char* dst, int64_t cap) {
    auto* e = (EdgeList*)h;
    int64_t need = 0;
    for (size_t i = 0; i < e->names.size(); ++i)
        need += (int64_t)e->names[i].size() + 2 + 20;
    if (!dst) return need;
    char* q = dst;
    for (size_t i = 0; i < e->names.size(); ++i) {
        int wrote = std::snprintf(q, cap - (q - dst), "%s\t%zu\n",
                                  e->names[i].c_str(), i);
        q += wrote;
    }
    return q - dst;
}

void pgsd_free(void* h) { delete (EdgeList*)h; }

// ---------- coalesce: sort by (row, col), sum duplicate weights ----------

int64_t pgsd_coalesce(int64_t* rows, int64_t* cols, float* weights,
                      int64_t n, int64_t num_cols) {
    if (n == 0) return 0;
    std::vector<int64_t> order(n);
    for (int64_t i = 0; i < n; ++i) order[i] = i;
    std::sort(order.begin(), order.end(), [&](int64_t a, int64_t b) {
        return rows[a] != rows[b] ? rows[a] < rows[b] : cols[a] < cols[b];
    });
    std::vector<int64_t> r(n), c(n);
    std::vector<float> w(n);
    for (int64_t i = 0; i < n; ++i) {
        r[i] = rows[order[i]];
        c[i] = cols[order[i]];
        w[i] = weights[order[i]];
    }
    int64_t out = 0;
    for (int64_t i = 0; i < n; ++i) {
        if (out > 0 && r[i] == rows[out - 1] && c[i] == cols[out - 1]) {
            weights[out - 1] += w[i];
        } else {
            rows[out] = r[i];
            cols[out] = c[i];
            weights[out] = w[i];
            ++out;
        }
    }
    return out;
}


// ---------- stable radix argsort (uint64 keys) ----------
//
// numpy's stable argsort (mergesort) on 16-32M int64 keys is the
// dominant cost of scatter-plan construction and edge coalescing at
// WikiTalk scale (SURVEY.md §6 workloads).  LSD radix with 11-bit
// digits is stable, O(passes * n), and bandwidth-bound: ~20x numpy on
// this image's cores.  Passes stop at the key's actual bit width.

void pgsd_argsort_u64(const uint64_t* keys, int64_t n, int64_t* perm_out) {
    if (n <= 0) return;
    uint64_t max_key = 0;
    for (int64_t i = 0; i < n; ++i)
        if (keys[i] > max_key) max_key = keys[i];

    constexpr int BITS = 11;
    constexpr int BUCKETS = 1 << BITS;
    std::vector<uint64_t> ka(keys, keys + n), kb(n);
    std::vector<int64_t> pa(n), pb(n);
    for (int64_t i = 0; i < n; ++i) pa[i] = i;

    std::vector<int64_t> hist(BUCKETS);
    int shift = 0;
    bool flip = false;
    while (shift == 0 || (shift < 64 && (max_key >> shift) != 0)) {
        uint64_t* src_k = flip ? kb.data() : ka.data();
        uint64_t* dst_k = flip ? ka.data() : kb.data();
        int64_t* src_p = flip ? pb.data() : pa.data();
        int64_t* dst_p = flip ? pa.data() : pb.data();
        std::fill(hist.begin(), hist.end(), 0);
        for (int64_t i = 0; i < n; ++i)
            ++hist[(src_k[i] >> shift) & (BUCKETS - 1)];
        int64_t acc = 0;
        for (int b = 0; b < BUCKETS; ++b) {
            int64_t h = hist[b];
            hist[b] = acc;
            acc += h;
        }
        for (int64_t i = 0; i < n; ++i) {
            int64_t d = hist[(src_k[i] >> shift) & (BUCKETS - 1)]++;
            dst_k[d] = src_k[i];
            dst_p[d] = src_p[i];
        }
        flip = !flip;
        shift += BITS;
    }
    const int64_t* res = flip ? pb.data() : pa.data();
    std::memcpy(perm_out, res, n * sizeof(int64_t));
}

}  // extern "C"
