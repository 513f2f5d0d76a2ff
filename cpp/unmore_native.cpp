// unmore_native: C++ host ops for the TPU framework.
//
// The reference pipeline leans on native code in its dependencies for
// every hot host-side path (SURVEY.md §2.2): pycocotools' C RLE codec,
// detectron2's C++ COCOeval, OpenCV's EDT, scipy's C connected
// components. This library provides the equivalents behind a plain C
// ABI (loaded via ctypes; no pybind11 in this image):
//
//   * COCO-compatible RLE: mask<->runs, counts string encode/decode
//   * mask IoU over run-length encodings (no decode to bitmaps)
//   * exact Euclidean distance transform (Felzenszwalb-Huttenlocher)
//   * 8-connected components (union-find, two-pass)
//
// All masks are row-major uint8 [h, w]; RLE runs are column-major
// (Fortran) order per the COCO spec.

#include <cstdint>
#include <cstring>
#include <cmath>
#include <vector>
#include <algorithm>
#include <limits>

extern "C" {

// ---------------------------------------------------------------- RLE codec

// mask [h*w] row-major -> runs (counts of alternating 0s/1s in F order,
// starting with 0s). Returns number of runs written (<= h*w+1).
int64_t rle_from_mask(const uint8_t* mask, int64_t h, int64_t w, int64_t* runs_out) {
    int64_t n = h * w;
    int64_t m = 0;
    int64_t count = 0;
    uint8_t cur = 0;
    for (int64_t x = 0; x < w; ++x) {
        for (int64_t y = 0; y < h; ++y) {
            uint8_t v = mask[y * w + x] ? 1 : 0;
            if (v != cur) {
                runs_out[m++] = count;
                count = 0;
                cur = v;
            }
            ++count;
        }
    }
    runs_out[m++] = count;
    (void)n;
    return m;
}

// runs -> mask [h*w] row-major
void rle_to_mask(const int64_t* runs, int64_t n_runs, int64_t h, int64_t w, uint8_t* mask_out) {
    std::memset(mask_out, 0, (size_t)(h * w));
    int64_t pos = 0;
    uint8_t val = 0;
    for (int64_t i = 0; i < n_runs; ++i) {
        if (val) {
            for (int64_t k = pos; k < pos + runs[i]; ++k) {
                int64_t x = k / h, y = k % h;
                mask_out[y * w + x] = 1;
            }
        }
        pos += runs[i];
        val ^= 1;
    }
}

// runs -> COCO counts string (signed 5-bit groups, offset 48, delta
// coding from the 3rd run). Returns string length; caller buffer must
// hold >= 7 chars per run.
int64_t rle_encode_counts(const int64_t* runs, int64_t n_runs, char* out) {
    int64_t p = 0;
    for (int64_t i = 0; i < n_runs; ++i) {
        int64_t x = runs[i];
        if (i > 2) x -= runs[i - 2];
        bool more = true;
        while (more) {
            int64_t c = x & 0x1f;
            x >>= 5;
            more = (c & 0x10) ? (x != -1) : (x != 0);
            if (more) c |= 0x20;
            out[p++] = (char)(c + 48);
        }
    }
    return p;
}

// counts string -> runs. Returns number of runs.
int64_t rle_decode_counts(const char* s, int64_t len, int64_t* runs_out) {
    int64_t m = 0;
    int64_t i = 0;
    while (i < len) {
        int64_t x = 0;
        int64_t k = 0;
        while (true) {
            int64_t c = (int64_t)s[i] - 48;
            x |= (c & 0x1f) << (5 * k);
            ++i;
            if (!(c & 0x20)) {
                if (c & 0x10) x |= ~((int64_t)0) << (5 * (k + 1));  // sign extend
                break;
            }
            ++k;
        }
        if (m > 2) x += runs_out[m - 2];
        runs_out[m++] = x;
    }
    return m;
}

int64_t rle_area(const int64_t* runs, int64_t n_runs) {
    int64_t a = 0;
    for (int64_t i = 1; i < n_runs; i += 2) a += runs[i];
    return a;
}

// IoU of two run-length masks without decoding (maskApi-style merge
// walk). If crowd != 0, denominator is area of a only.
double rle_iou_pair(const int64_t* ra, int64_t na, const int64_t* rb, int64_t nb, int crowd) {
    // walk both run lists in lockstep over the flat F-order axis
    int64_t ia = 0, ib = 0;
    int64_t ca = ra[0], cb = rb[0];
    uint8_t va = 0, vb = 0;
    int64_t inter = 0, area_a = 0, area_b = 0;
    while (ia < na && ib < nb) {
        int64_t step = std::min(ca, cb);
        if (va && vb) inter += step;
        if (va) area_a += step;
        if (vb) area_b += step;
        ca -= step;
        cb -= step;
        if (ca == 0) {
            ++ia;
            if (ia < na) { ca = ra[ia]; va ^= 1; }
        }
        if (cb == 0) {
            ++ib;
            if (ib < nb) { cb = rb[ib]; vb ^= 1; }
        }
    }
    // tail of the longer list
    while (ia < na) { if (va) area_a += ca; ++ia; if (ia < na) { ca = ra[ia]; va ^= 1; } }
    while (ib < nb) { if (vb) area_b += cb; ++ib; if (ib < nb) { cb = rb[ib]; vb ^= 1; } }
    double denom = crowd ? (double)area_a : (double)(area_a + area_b - inter);
    return denom > 0 ? (double)inter / denom : 0.0;
}

// ------------------------------------------------------- COCOeval matching

// Greedy detection<->GT matching for one (image, category) cell across
// all T IoU thresholds — the hot loop of COCOeval.evaluateImg, the part
// detectron2 moves to C++ (reference COCO_evaluator/fast_eval_api.py:
// 15-199, COCOevalEvaluateImages). Inputs are pre-sorted by the caller:
// detections by descending score (capped at maxDet), GTs with ignored
// ones last. ious is [D, G] row-major.
//   dtm_out   [T, D]: 1 if detection matched
//   dt_ig_out [T, D]: 1 if matched to an ignored GT
// gtm scratch is internal. Semantics mirror pycocotools exactly:
// crowd GTs can match multiple detections; once a real (non-ignored)
// candidate is held, ignored GTs cannot displace it.
void coco_match(const double* ious, int64_t D, int64_t G,
                const int32_t* gt_ig, const int32_t* iscrowd,
                const double* thrs, int64_t T,
                int64_t* dtm_out, double* dt_ig_out) {
    std::vector<int64_t> gtm((size_t)G);
    for (int64_t t = 0; t < T; ++t) {
        std::fill(gtm.begin(), gtm.end(), 0);
        for (int64_t i = 0; i < D; ++i) {
            double best = std::min(thrs[t], 1.0 - 1e-10);
            int64_t m = -1;
            for (int64_t j = 0; j < G; ++j) {
                if (gtm[j] > 0 && !iscrowd[j]) continue;
                if (m > -1 && gt_ig[m] == 0 && gt_ig[j] == 1) break;
                double v = ious[i * G + j];
                if (v < best) continue;
                best = v;
                m = j;
            }
            if (m == -1) continue;
            dt_ig_out[t * D + i] = (double)gt_ig[m];
            dtm_out[t * D + i] = 1;
            gtm[m] = 1;
        }
    }
}

// ------------------------------------------------ exact EDT (Felzenszwalb)

static void edt_1d(const double* f, double* d, int n, int* v, double* z) {
    int k = 0;
    v[0] = 0;
    z[0] = -std::numeric_limits<double>::infinity();
    z[1] = std::numeric_limits<double>::infinity();
    for (int q = 1; q < n; ++q) {
        double s;
        while (true) {
            s = ((f[q] + (double)q * q) - (f[v[k]] + (double)v[k] * v[k])) / (2.0 * q - 2.0 * v[k]);
            if (s <= z[k]) { --k; } else break;
        }
        ++k;
        v[k] = q;
        z[k] = s;
        z[k + 1] = std::numeric_limits<double>::infinity();
    }
    k = 0;
    for (int q = 0; q < n; ++q) {
        while (z[k + 1] < q) ++k;
        double dq = (double)q - v[k];
        d[q] = dq * dq + f[v[k]];
    }
}

// Exact L2 distance-to-background transform of a binary mask
// (distance of each foreground pixel to the nearest zero pixel).
void edt_l2(const uint8_t* mask, int64_t h, int64_t w, float* dist_out) {
    const double INF = 1e20;
    std::vector<double> g((size_t)(h * w));
    for (int64_t i = 0; i < h * w; ++i) g[i] = mask[i] ? INF : 0.0;

    std::vector<double> f((size_t)std::max(h, w)), d((size_t)std::max(h, w));
    std::vector<int> v((size_t)std::max(h, w));
    std::vector<double> z((size_t)std::max(h, w) + 1);

    for (int64_t x = 0; x < w; ++x) {  // columns
        for (int64_t y = 0; y < h; ++y) f[y] = g[y * w + x];
        edt_1d(f.data(), d.data(), (int)h, v.data(), z.data());
        for (int64_t y = 0; y < h; ++y) g[y * w + x] = d[y];
    }
    for (int64_t y = 0; y < h; ++y) {  // rows
        for (int64_t x = 0; x < w; ++x) f[x] = g[y * w + x];
        edt_1d(f.data(), d.data(), (int)w, v.data(), z.data());
        for (int64_t x = 0; x < w; ++x) dist_out[y * w + x] = (float)std::sqrt(d[x]);
    }
}

// ---------------------------------------------- connected components (8-c)

struct UF {
    std::vector<int32_t> parent;
    int32_t find(int32_t x) {
        while (parent[x] != x) { parent[x] = parent[parent[x]]; x = parent[x]; }
        return x;
    }
    void unite(int32_t a, int32_t b) {
        a = find(a); b = find(b);
        if (a != b) parent[std::max(a, b)] = std::min(a, b);
    }
};

// Two-pass 8-connected labeling. labels_out: 0 = background, 1..n
// components in scan order. Returns component count.
int32_t connected_components(const uint8_t* mask, int64_t h, int64_t w, int32_t* labels_out) {
    UF uf;
    uf.parent.reserve(1024);
    std::vector<int32_t> raw((size_t)(h * w), 0);
    int32_t next = 0;
    uf.parent.push_back(0);  // sentinel for background
    for (int64_t y = 0; y < h; ++y) {
        for (int64_t x = 0; x < w; ++x) {
            if (!mask[y * w + x]) continue;
            int32_t best = 0;
            int32_t neigh[4];
            int nn = 0;
            if (y > 0) {
                if (x > 0 && raw[(y - 1) * w + x - 1]) neigh[nn++] = raw[(y - 1) * w + x - 1];
                if (raw[(y - 1) * w + x]) neigh[nn++] = raw[(y - 1) * w + x];
                if (x + 1 < w && raw[(y - 1) * w + x + 1]) neigh[nn++] = raw[(y - 1) * w + x + 1];
            }
            if (x > 0 && raw[y * w + x - 1]) neigh[nn++] = raw[y * w + x - 1];
            if (nn == 0) {
                ++next;
                uf.parent.push_back(next);
                best = next;
            } else {
                best = neigh[0];
                for (int i = 1; i < nn; ++i) best = std::min(best, neigh[i]);
                for (int i = 0; i < nn; ++i) uf.unite(best, neigh[i]);
            }
            raw[y * w + x] = best;
        }
    }
    // relabel compactly in scan order
    std::vector<int32_t> remap((size_t)next + 1, 0);
    int32_t count = 0;
    for (int64_t i = 0; i < h * w; ++i) {
        if (!raw[i]) { labels_out[i] = 0; continue; }
        int32_t root = uf.find(raw[i]);
        if (!remap[root]) remap[root] = ++count;
        labels_out[i] = remap[root];
    }
    return count;
}

}  // extern "C"
