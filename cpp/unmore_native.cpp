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

// -------------------------------------------- mask paste-back (scoring)
//
// Support (positivity) of the bilinear paste of a crop-space mask into
// a full-image canvas at the integer box extent — exactly the support
// of unmore_tpu.ops.image.paste_mask_into_canvas (wy @ mask @ wx^T,
// half-pixel taps, then threshold > 0). All weights are nonnegative,
// so output (j, i) > 0 iff any tapped source pixel with positive
// weight is positive: the lo tap always participates (1 - frac > 0
// since frac in [0, 1)), the hi tap only when frac > 0. This lets the
// object-scoring hot loop (tight boxes, areas, RLE of the pasted
// union mask — reference object_scoring.py:195-235) run as pure
// integer work with no full-canvas materialization.

struct PasteAxis {
    std::vector<int32_t> lo, hi;
    std::vector<uint8_t> use_hi;
};

static void paste_axis(int64_t in, int64_t out, PasteAxis& ax) {
    ax.lo.resize((size_t)out);
    ax.hi.resize((size_t)out);
    ax.use_hi.resize((size_t)out);
    double scale = (double)in / (double)out;
    double lim = (double)(in - 1);
    for (int64_t j = 0; j < out; ++j) {
        double src = ((double)j + 0.5) * scale - 0.5;
        if (src < 0.0) src = 0.0;
        if (src > lim) src = lim;
        double lof = std::floor(src);
        int64_t lo = (int64_t)lof;
        ax.lo[j] = (int32_t)lo;
        ax.hi[j] = (int32_t)std::min(lo + 1, in - 1);
        ax.use_hi[j] = (src - lof) > 0.0 ? 1 : 0;
    }
}

static void paste_box_bounds(const float* box, int64_t H, int64_t W,
                             int64_t& x1, int64_t& y1, int64_t& x2, int64_t& y2) {
    x1 = std::max<int64_t>((int64_t)std::floor((double)box[0]), 0);
    y1 = std::max<int64_t>((int64_t)std::floor((double)box[1]), 0);
    x2 = std::min<int64_t>((int64_t)std::ceil((double)box[2]), W);
    y2 = std::min<int64_t>((int64_t)std::ceil((double)box[3]), H);
}

static inline bool paste_support_at(const uint8_t* m, int64_t sw,
                                    const PasteAxis& ay, const PasteAxis& ax,
                                    int64_t j, int64_t i) {
    const uint8_t* r0 = m + (int64_t)ay.lo[j] * sw;
    int32_t c0 = ax.lo[i], c1 = ax.hi[i];
    uint8_t ux = ax.use_hi[i];
    if (r0[c0] || (ux && r0[c1])) return true;
    if (!ay.use_hi[j]) return false;
    const uint8_t* r1 = m + (int64_t)ay.hi[j] * sw;
    return r1[c0] || (ux && r1[c1]);
}

// Batched tight boxes (xyxy, xmax+1/ymax+1 convention) + pasted areas
// for n crop-space masks [n, sh, sw] at boxes [n, 4] in an (H, W)
// canvas. Empty paste -> all-zero tight box, area 0.
void paste_support_stats(const uint8_t* masks, int64_t n, int64_t sh, int64_t sw,
                         const float* boxes, int64_t H, int64_t W,
                         float* tight_out, int64_t* area_out) {
    PasteAxis ay, ax;
    for (int64_t b = 0; b < n; ++b) {
        const uint8_t* m = masks + b * sh * sw;
        int64_t x1, y1, x2, y2;
        paste_box_bounds(boxes + b * 4, H, W, x1, y1, x2, y2);
        int64_t bh = y2 - y1, bw = x2 - x1;
        int64_t area = 0, xmin = 0, xmax = -1, ymin = 0, ymax = -1;
        if (bh > 0 && bw > 0) {
            paste_axis(sh, bh, ay);
            paste_axis(sw, bw, ax);
            xmin = W; ymin = H;
            for (int64_t j = 0; j < bh; ++j) {
                for (int64_t i = 0; i < bw; ++i) {
                    if (!paste_support_at(m, sw, ay, ax, j, i)) continue;
                    ++area;
                    int64_t yy = y1 + j, xx = x1 + i;
                    if (xx < xmin) xmin = xx;
                    if (xx > xmax) xmax = xx;
                    if (yy < ymin) ymin = yy;
                    if (yy > ymax) ymax = yy;
                }
            }
        }
        float* t = tight_out + b * 4;
        if (area == 0) {
            t[0] = t[1] = t[2] = t[3] = 0.0f;
        } else {
            t[0] = (float)xmin;
            t[1] = (float)ymin;
            t[2] = (float)(xmax + 1);
            t[3] = (float)(ymax + 1);
        }
        area_out[b] = area;
    }
}

// RLE runs (column-major COCO order, starting with 0s) of the pasted
// support mask in the full (H, W) canvas, emitted directly — the
// canvas is never materialized. Returns the number of runs.
int64_t paste_support_rle(const uint8_t* mask, int64_t sh, int64_t sw,
                          const float* box, int64_t H, int64_t W,
                          int64_t* runs_out) {
    int64_t x1, y1, x2, y2;
    paste_box_bounds(box, H, W, x1, y1, x2, y2);
    int64_t bh = y2 - y1, bw = x2 - x1;
    PasteAxis ay, ax;
    if (bh > 0 && bw > 0) {
        paste_axis(sh, bh, ay);
        paste_axis(sw, bw, ax);
    }
    int64_t m_runs = 0, count = 0;
    uint8_t cur = 0;
    auto push = [&](uint8_t v, int64_t k) {
        if (k <= 0) return;
        if (v == cur) {
            count += k;
        } else {
            runs_out[m_runs++] = count;
            cur = v;
            count = k;
        }
    };
    for (int64_t x = 0; x < W; ++x) {
        if (bh <= 0 || bw <= 0 || x < x1 || x >= x2) {
            push(0, H);
            continue;
        }
        int64_t i = x - x1;
        push(0, y1);
        for (int64_t j = 0; j < bh; ++j)
            push(paste_support_at(mask, sw, ay, ax, j, i) ? 1 : 0, 1);
        push(0, H - y2);
    }
    runs_out[m_runs++] = count;
    return m_runs;
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
