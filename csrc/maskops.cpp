// maskops — native components for the detection/eval path and LBP transforms.
//
// TPU-native replacement for the reference's native dependencies
// (SURVEY.md §2b): pycocotools' C extension (`pycocotools._mask`: RLE
// encode/decode/area/IoU, bbox IoU with iscrowd semantics — used by
// reference object/coco_eval.py:10-12) and scikit-image's C
// local_binary_pattern (reference utils_datasets.py:1083-1143).
//
// Exposed as a plain C ABI consumed via ctypes (vit_torch_tpu/detection/_mask.py
// and vit_torch_tpu/data/lbp.py), with numpy fallbacks when the .so is absent.
//
// RLE convention matches COCO: column-major (Fortran) scan of the H×W mask,
// counts alternate runs of 0s and 1s, starting with 0s.

#include <cstdint>
#include <cstring>
#include <cmath>
#include <algorithm>
#include <vector>

extern "C" {

// ---------------------------------------------------------------------------
// RLE encode: mask is H*W uint8 in column-major order. Writes run lengths to
// counts (capacity cap); returns number of runs, or -1 if capacity exceeded.
int rle_encode(const uint8_t* mask, int h, int w, uint32_t* counts, int cap) {
    int64_t n = (int64_t)h * w;
    int k = 0;
    uint8_t prev = 0;  // runs start with zeros
    uint32_t run = 0;
    for (int64_t i = 0; i < n; ++i) {
        uint8_t v = mask[i] ? 1 : 0;
        if (v != prev) {
            if (k >= cap) return -1;
            counts[k++] = run;
            run = 0;
            prev = v;
        }
        ++run;
    }
    if (k >= cap) return -1;
    counts[k++] = run;
    return k;
}

// RLE decode into mask (column-major, caller-allocated h*w bytes).
void rle_decode(const uint32_t* counts, int n_counts, int h, int w,
                uint8_t* mask) {
    int64_t pos = 0, total = (int64_t)h * w;
    uint8_t v = 0;
    for (int i = 0; i < n_counts && pos < total; ++i) {
        int64_t run = counts[i];
        if (run > total - pos) run = total - pos;
        memset(mask + pos, v, (size_t)run);
        pos += run;
        v = 1 - v;
    }
}

uint64_t rle_area(const uint32_t* counts, int n_counts) {
    uint64_t a = 0;
    for (int i = 1; i < n_counts; i += 2) a += counts[i];
    return a;
}

// Intersection of two RLEs (merged run walk, no decode).
static uint64_t rle_intersection(const uint32_t* a, int na,
                                 const uint32_t* b, int nb) {
    uint64_t inter = 0;
    int ia = 0, ib = 0;
    uint64_t ca = ia < na ? a[ia] : 0, cb = ib < nb ? b[ib] : 0;
    bool va = false, vb = false;  // value of current run (runs start at 0)
    while (ia < na && ib < nb) {
        uint64_t step = std::min(ca, cb);
        if (va && vb) inter += step;
        ca -= step; cb -= step;
        if (ca == 0) { ++ia; va = !va; if (ia < na) ca = a[ia]; }
        if (cb == 0) { ++ib; vb = !vb; if (ib < nb) cb = b[ib]; }
    }
    return inter;
}

// IoU between RLE-encoded masks. dt: n_dt RLEs (flattened counts +
// offsets/lengths), gt likewise; iscrowd per gt. out is n_dt*n_gt row-major.
void rle_iou(const uint32_t* dt_counts, const int* dt_off, const int* dt_len,
             int n_dt,
             const uint32_t* gt_counts, const int* gt_off, const int* gt_len,
             int n_gt, const uint8_t* iscrowd, double* out) {
    std::vector<uint64_t> dt_area(n_dt), gt_area(n_gt);
    for (int i = 0; i < n_dt; ++i)
        dt_area[i] = rle_area(dt_counts + dt_off[i], dt_len[i]);
    for (int j = 0; j < n_gt; ++j)
        gt_area[j] = rle_area(gt_counts + gt_off[j], gt_len[j]);
    for (int i = 0; i < n_dt; ++i) {
        for (int j = 0; j < n_gt; ++j) {
            uint64_t inter = rle_intersection(
                dt_counts + dt_off[i], dt_len[i],
                gt_counts + gt_off[j], gt_len[j]);
            double denom = iscrowd && iscrowd[j]
                ? (double)dt_area[i]
                : (double)(dt_area[i] + gt_area[j] - inter);
            out[(int64_t)i * n_gt + j] = denom > 0 ? inter / denom : 0.0;
        }
    }
}

// Original-resolution column-major RLE of a nearest-rescaled, cropped
// letterbox mask, computed directly in the RUN-LENGTH domain (no pixel
// rasterization — O(w · flips) instead of O(w · h)).  Replaces the host
// unpackbits → index-gather resize → rle_encode chain of the segm eval
// (the 1-core host is 95% of segm-eval wall, PERF.md eval-at-scale
// ledger); the flip arrays come from the device (`mask_col_runs`).
//
// Inputs:
//   runs:   S*R int32; runs[c*R + k] = k-th letterbox row (ascending)
//           where column c's value flips (value stream starts at 0);
//           entries beyond counts[c] are padding (>= S)
//   counts: S int32 TRUE flip count per column (> R = device truncation)
//   xs:     w int32, output column -> letterbox source column
//   rinv:   (S+1) int32, letterbox row f -> first output row whose
//           nearest-sampled source row >= f (== h when none); encodes the
//           crop + nearest resize (precomputed once per image)
//   h, w:   output (original-image) size
// Writes the COCO column-major counts to out (capacity cap).  Returns the
// run count, -1 when cap is exceeded, -2 when a used column's flip count
// exceeds R (device truncated — caller must fall back to the pixel path).
int rle_from_col_runs(const int32_t* runs, const int32_t* counts,
                      int S, int R, const int32_t* xs, const int32_t* rinv,
                      int h, int w, uint32_t* out, int cap) {
    std::vector<int> buf(R);
    int k = 0;
    uint32_t run = 0;                 // current run length
    uint8_t cur = 0;                  // current stream value (starts at 0)
    for (int c = 0; c < w; ++c) {
        int sc = xs[c];
        int cnt = counts[sc];
        if (cnt > R) return -2;
        const int32_t* fr = runs + (int64_t)sc * R;
        // map letterbox flip rows -> output flip rows; a pair of flips
        // landing between the same two sampled rows cancels (no output
        // pixel ever sees the intermediate value)
        int m = 0;
        for (int i = 0; i < cnt; ++i) {
            int f = fr[i];
            int r = (f <= 0) ? 0 : (f > S ? h : rinv[f]);
            if (m > 0 && buf[m - 1] == r) --m;
            else buf[m++] = r;
        }
        // the column's pixel value in [buf[j-1], buf[j]) is j's parity —
        // independent of the stream value entering the column, so a run
        // boundary also falls at the column border whenever the previous
        // column ended on the other value
        int pos = 0;
        uint8_t v = 0;
        for (int i = 0; i <= m; ++i) {
            int r = (i < m) ? std::min(buf[i], h) : h;
            int len = r - pos;
            if (len > 0) {
                if (v != cur) {
                    if (k >= cap) return -1;
                    out[k++] = run;
                    run = 0;
                    cur = v;
                }
                run += (uint32_t)len;
            }
            pos = r;
            v ^= 1;
            if (r >= h) break;
        }
    }
    if (k >= cap) return -1;
    out[k++] = run;
    return k;
}

// Original-resolution COCO RLE straight from a COLUMN-MAJOR bit-packed
// letterbox mask: per output column, extract the value-flip rows from the
// packed column bytes (skipping uniform 0x00/0xFF bytes — O(bytes+flips)
// for real masks) and stitch with the same crop/nearest/merge walk as
// rle_from_col_runs.  This keeps the cheap bit-packed D2H (the tunneled
// transfer runs ~25 MB/s, so the 2-bytes-per-possible-flip runs arrays
// measured SLOWER end-to-end than packed pixels) while still skipping all
// per-pixel host work.  No flip-count cap — overflow cannot happen.
//
//   pk:       S * rowbytes uint8, column-major bits: column c's rows are
//             pk[c*rowbytes ...], MSB-first within each byte
//   S:        letterbox resolution (rows per column; rowbytes = ceil(S/8))
//   xs, rinv, h, w, out, cap: exactly as rle_from_col_runs
int rle_from_packed_cols(const uint8_t* pk, int S, int rowbytes,
                         const int32_t* xs, const int32_t* rinv,
                         int h, int w, uint32_t* out, int cap) {
    std::vector<int> buf(S + 1);
    int k = 0;
    uint32_t run = 0;
    uint8_t cur = 0;
    for (int c = 0; c < w; ++c) {
        const uint8_t* col = pk + (int64_t)xs[c] * rowbytes;
        // extract flip rows (value stream starts at 0)
        int m0 = 0;
        uint8_t prev = 0;                   // previous bit value
        for (int i = 0; i < rowbytes; ++i) {
            uint8_t b = col[i];
            uint8_t uni = prev ? 0xFF : 0x00;
            if (b == uni) continue;         // uniform byte, no flips
            int base = i * 8;
            int lim = std::min(8, S - base);
            for (int j = 0; j < lim; ++j) {
                uint8_t bit = (b >> (7 - j)) & 1;
                if (bit != prev) {
                    buf[m0++] = base + j;
                    prev = bit;
                }
            }
        }
        // map to output rows (cancel pairs landing between samples), then
        // merge segments into the global column-major stream
        int m = 0;
        for (int i = 0; i < m0; ++i) {
            int f = buf[i];
            int r = (f <= 0) ? 0 : (f > S ? h : rinv[f]);
            if (m > 0 && buf[m - 1] == r) --m;
            else buf[m++] = r;
        }
        int pos = 0;
        uint8_t v = 0;
        for (int i = 0; i <= m; ++i) {
            int r = (i < m) ? std::min(buf[i], h) : h;
            int len = r - pos;
            if (len > 0) {
                if (v != cur) {
                    if (k >= cap) return -1;
                    out[k++] = run;
                    run = 0;
                    cur = v;
                }
                run += (uint32_t)len;
            }
            pos = r;
            v ^= 1;
            if (r >= h) break;
        }
    }
    if (k >= cap) return -1;
    out[k++] = run;
    return k;
}

// bbox IoU with COCO iscrowd semantics. Boxes are xywh.
void bbox_iou(const double* dt, int n_dt, const double* gt, int n_gt,
              const uint8_t* iscrowd, double* out) {
    for (int i = 0; i < n_dt; ++i) {
        double dx0 = dt[i * 4], dy0 = dt[i * 4 + 1];
        double dw = dt[i * 4 + 2], dh = dt[i * 4 + 3];
        double da = dw * dh;
        for (int j = 0; j < n_gt; ++j) {
            double gx0 = gt[j * 4], gy0 = gt[j * 4 + 1];
            double gw = gt[j * 4 + 2], gh = gt[j * 4 + 3];
            double ga = gw * gh;
            double ix = std::min(dx0 + dw, gx0 + gw) - std::max(dx0, gx0);
            double iy = std::min(dy0 + dh, gy0 + gh) - std::max(dy0, gy0);
            double inter = (ix > 0 && iy > 0) ? ix * iy : 0.0;
            double denom = iscrowd && iscrowd[j] ? da : da + ga - inter;
            out[(int64_t)i * n_gt + j] = denom > 0 ? inter / denom : 0.0;
        }
    }
}

// ---------------------------------------------------------------------------
// Local binary pattern (scikit-image semantics for methods:
// 0='default', 1='ror', 2='uniform', 3='var', 4='nri_uniform').
// image is H×W float64, out is H×W float64. P sample points on radius R,
// bilinear interpolation.
void local_binary_pattern(const double* img, int h, int w, int P, double R,
                          int method, double* out) {
    std::vector<double> sy(P), sx(P);
    for (int p = 0; p < P; ++p) {
        // skimage ring convention: sample p at (row - R*sin(a), col + R*cos(a))
        // with a = 2*pi*p/P — p=0 due east, counter-clockwise in image coords
        double angle = 2.0 * M_PI * p / P;
        sy[p] = -R * std::sin(angle);
        sx[p] = R * std::cos(angle);
    }
    std::vector<double> vals(P);
    for (int y = 0; y < h; ++y) {
        for (int x = 0; x < w; ++x) {
            double c = img[(int64_t)y * w + x];
            uint64_t code = 0;
            int transitions = 0, ones = 0;
            for (int p = 0; p < P; ++p) {
                double yy = y + sy[p], xx = x + sx[p];
                // bilinear with edge clamp
                int y0 = (int)std::floor(yy), x0 = (int)std::floor(xx);
                double fy = yy - y0, fx = xx - x0;
                auto at = [&](int yi, int xi) {
                    yi = std::max(0, std::min(h - 1, yi));
                    xi = std::max(0, std::min(w - 1, xi));
                    return img[(int64_t)yi * w + xi];
                };
                double v = (1 - fy) * (1 - fx) * at(y0, x0)
                         + (1 - fy) * fx * at(y0, x0 + 1)
                         + fy * (1 - fx) * at(y0 + 1, x0)
                         + fy * fx * at(y0 + 1, x0 + 1);
                vals[p] = v;
                // tolerance absorbs bilinear weight-sum rounding (flat
                // regions must read as >= center)
                if (v >= c - 1e-4) { code |= (1ULL << p); ++ones; }
            }
            for (int p = 0; p < P; ++p) {
                int q = (p + 1) % P;
                if (((code >> p) & 1) != ((code >> q) & 1)) ++transitions;
            }
            double result;
            if (method == 0) {            // default
                result = (double)code;
            } else if (method == 1) {     // ror: rotation-invariant min
                uint64_t best = code;
                for (int s = 1; s < P; ++s) {
                    uint64_t rot = ((code >> s) | (code << (P - s)))
                                   & ((P == 64) ? ~0ULL : ((1ULL << P) - 1));
                    best = std::min(best, rot);
                }
                result = (double)best;
            } else if (method == 2) {     // uniform
                result = transitions <= 2 ? (double)ones : (double)(P + 1);
            } else if (method == 4) {     // nri_uniform
                if (transitions > 2) {
                    result = (double)(P * (P - 1) + 2);
                } else if (ones == 0) {
                    result = 0.0;
                } else if (ones == P) {
                    result = (double)(P * (P - 1) + 1);
                } else {
                    // rotation = index of the first 1-bit whose predecessor
                    // (cyclically) is 0
                    int rot = 0;
                    for (int p = 0; p < P; ++p) {
                        int prev = (p + P - 1) % P;
                        if (((code >> p) & 1) && !((code >> prev) & 1)) {
                            rot = p;
                            break;
                        }
                    }
                    result = (double)(1 + (ones - 1) * P + rot);
                }
            } else {                      // var
                double mean = 0, var = 0;
                for (int p = 0; p < P; ++p) mean += vals[p];
                mean /= P;
                for (int p = 0; p < P; ++p)
                    var += (vals[p] - mean) * (vals[p] - mean);
                result = var / P;
            }
            out[(int64_t)y * w + x] = result;
        }
    }
}

}  // extern "C"
