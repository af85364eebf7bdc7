// evalcore: native host-side evaluation kernels.
//
// The open-set COCO evaluation's greedy matcher is the host-side hot loop
// (SURVEY.md §7.3 item 6: O(images x cats x iouThrs x dets x gts) pure-Python
// triple loops in the reference, evaluation/os_cocoeval.py:314-399). This
// C++ core implements the same matching semantics; Python binds it via
// ctypes (openset_rcnn_tpu/evaluation/evalcore_binding.py) and falls back to
// numpy when the shared object is absent.
//
// Build: make -C native   (produces libevalcore.so)

#include <cstdint>
#include <cstring>

extern "C" {

// COCO greedy matching for all IoU thresholds.
//
//   ious:      D x G row-major, detections pre-sorted by descending score
//   gt_ignore: G   (0/1), pre-sorted ignore-last
//   iscrowd:   G   (0/1)
//   iou_thrs:  T
//   out_matched: T x D (0/1)   whether det d matched a GT at threshold t
//   out_ignore:  T x D (0/1)   whether that GT was an ignore GT
//
// Semantics mirror pycocotools: each detection (score order) takes the best
// still-free GT with IoU >= max(threshold, running best); crowd GT may be
// matched repeatedly; once a real (non-ignore) match is held, ignored GTs
// (sorted last) cannot replace it.
void greedy_match(const double* ious, const int32_t* gt_ignore,
                  const int32_t* iscrowd, const double* iou_thrs,
                  int64_t D, int64_t G, int64_t T,
                  uint8_t* out_matched, uint8_t* out_ignore) {
  if (D == 0) return;
  // scratch: per-threshold GT-taken flags
  for (int64_t t = 0; t < T; ++t) {
    uint8_t* taken = new uint8_t[G];
    std::memset(taken, 0, G);
    const double thr = iou_thrs[t] < (1.0 - 1e-10) ? iou_thrs[t] : (1.0 - 1e-10);
    for (int64_t d = 0; d < D; ++d) {
      double best = thr;
      int64_t m = -1;
      const double* row = ious + d * G;
      for (int64_t g = 0; g < G; ++g) {
        if (taken[g] && !iscrowd[g]) continue;
        if (m > -1 && gt_ignore[m] == 0 && gt_ignore[g] == 1) break;
        if (row[g] < best) continue;
        best = row[g];
        m = g;
      }
      if (m == -1) continue;
      out_matched[t * D + d] = 1;
      out_ignore[t * D + d] = (uint8_t)gt_ignore[m];
      taken[m] = 1;
    }
    delete[] taken;
  }
}

// Batched per-category matching: the full (image x area) loop of the
// open-set evaluator in one call. For every image group and every area
// range it (a) derives GT ignore flags from crowd/area, (b) stable-sorts
// GT ignore-last (pycocotools semantics), (c) runs the greedy matcher for
// all thresholds, and (d) emits the final detection ignore flags
// (matched-to-ignored-GT OR unmatched-and-out-of-area).
//
// Flat layouts (group i = one image's detections of one category):
//   ious:   at ioff[i], row-major D[i] x G[i], ORIGINAL GT order
//   d_area: at doff[i], length D[i] (detections pre-sorted by score desc)
//   g_area, g_crowd: at goff[i], length G[i]
//   matched/ignore out: (A, T, sumD) at a*T*sumD + t*sumD + doff[i] + d
//   n_gt out: (A, n_img) non-ignored GT counts
void match_category(const double* ious, const double* d_area,
                    const double* g_area, const int32_t* g_crowd,
                    const double* area_lo, const double* area_hi, int64_t A,
                    const double* iou_thrs, int64_t T,
                    const int64_t* D, const int64_t* G,
                    const int64_t* ioff, const int64_t* goff,
                    const int64_t* doff, int64_t n_img, int64_t sum_d,
                    uint8_t* out_matched, uint8_t* out_ignore,
                    int32_t* out_ngt) {
  int64_t gmax = 0;
  for (int64_t i = 0; i < n_img; ++i)
    if (G[i] > gmax) gmax = G[i];
  int64_t* order = new int64_t[gmax > 0 ? gmax : 1];
  uint8_t* g_ig = new uint8_t[gmax > 0 ? gmax : 1];
  uint8_t* taken = new uint8_t[gmax > 0 ? gmax : 1];

  for (int64_t i = 0; i < n_img; ++i) {
    const int64_t Di = D[i], Gi = G[i];
    const double* iou_i = ious + ioff[i];
    const double* ga = g_area + goff[i];
    const int32_t* gc = g_crowd + goff[i];
    const double* da = d_area + doff[i];
    for (int64_t a = 0; a < A; ++a) {
      const double lo = area_lo[a], hi = area_hi[a];
      // ignore flags + stable ignore-last order (two passes = stable)
      int64_t n_keep = 0, pos = 0;
      for (int64_t g = 0; g < Gi; ++g) {
        g_ig[g] = (gc[g] > 0) || (ga[g] < lo) || (ga[g] > hi);
        if (!g_ig[g]) ++n_keep;
      }
      for (int64_t g = 0; g < Gi; ++g)
        if (!g_ig[g]) order[pos++] = g;
      for (int64_t g = 0; g < Gi; ++g)
        if (g_ig[g]) order[pos++] = g;
      out_ngt[a * n_img + i] = (int32_t)n_keep;

      uint8_t* m_base = out_matched + a * T * sum_d;
      uint8_t* i_base = out_ignore + a * T * sum_d;
      for (int64_t t = 0; t < T; ++t) {
        uint8_t* mrow = m_base + t * sum_d + doff[i];
        uint8_t* irow = i_base + t * sum_d + doff[i];
        const double thr =
            iou_thrs[t] < (1.0 - 1e-10) ? iou_thrs[t] : (1.0 - 1e-10);
        if (Gi > 0 && Di > 0) {
          std::memset(taken, 0, Gi);
          for (int64_t d = 0; d < Di; ++d) {
            double best = thr;
            int64_t m = -1;  // position in sorted order
            const double* row = iou_i + d * Gi;
            for (int64_t gg = 0; gg < Gi; ++gg) {
              const int64_t g = order[gg];
              const uint8_t ig = gg < n_keep ? 0 : 1;  // sorted ignore flag
              if (taken[gg] && !gc[g]) continue;
              if (m > -1 && (m < n_keep) && ig) break;
              if (row[g] < best) continue;
              best = row[g];
              m = gg;
            }
            if (m == -1) continue;
            mrow[d] = 1;
            irow[d] = m < n_keep ? 0 : 1;
            taken[m] = 1;
          }
        }
        // unmatched + out-of-area detections are ignored
        for (int64_t d = 0; d < Di; ++d)
          if (!mrow[d] && (da[d] < lo || da[d] > hi)) irow[d] = 1;
      }
    }
  }
  delete[] order;
  delete[] g_ig;
  delete[] taken;
}

// Pairwise IoU of xywh boxes (COCO convention, crowd GT uses det area as
// union). dt: D x 4, gt: G x 4, out: D x G.
void bbox_iou_xywh(const double* dt, const double* gt, const int32_t* iscrowd,
                   int64_t D, int64_t G, double* out) {
  for (int64_t d = 0; d < D; ++d) {
    const double dx1 = dt[d * 4 + 0], dy1 = dt[d * 4 + 1];
    const double dw = dt[d * 4 + 2], dh = dt[d * 4 + 3];
    const double dx2 = dx1 + dw, dy2 = dy1 + dh;
    const double da = dw * dh;
    for (int64_t g = 0; g < G; ++g) {
      const double gx1 = gt[g * 4 + 0], gy1 = gt[g * 4 + 1];
      const double gw = gt[g * 4 + 2], gh = gt[g * 4 + 3];
      const double gx2 = gx1 + gw, gy2 = gy1 + gh;
      double iw = (dx2 < gx2 ? dx2 : gx2) - (dx1 > gx1 ? dx1 : gx1);
      double ih = (dy2 < gy2 ? dy2 : gy2) - (dy1 > gy1 ? dy1 : gy1);
      if (iw < 0) iw = 0;
      if (ih < 0) ih = 0;
      const double inter = iw * ih;
      const double uni = iscrowd[g] ? da : da + gw * gh - inter;
      out[d * G + g] = uni > 0 ? inter / uni : 0.0;
    }
  }
}

// Greedy NMS over score-sorted xyxy boxes (strict '>' suppression,
// torchvision semantics). boxes: N x 4 sorted by descending score.
// out_keep: N (0/1). Returns number kept.
int64_t nms_sorted(const double* boxes, int64_t N, double thresh,
                   uint8_t* out_keep) {
  int64_t kept = 0;
  for (int64_t i = 0; i < N; ++i) out_keep[i] = 1;
  for (int64_t i = 0; i < N; ++i) {
    if (!out_keep[i]) continue;
    ++kept;
    const double ax1 = boxes[i * 4], ay1 = boxes[i * 4 + 1];
    const double ax2 = boxes[i * 4 + 2], ay2 = boxes[i * 4 + 3];
    const double aa = (ax2 - ax1) * (ay2 - ay1);
    for (int64_t j = i + 1; j < N; ++j) {
      if (!out_keep[j]) continue;
      const double bx1 = boxes[j * 4], by1 = boxes[j * 4 + 1];
      const double bx2 = boxes[j * 4 + 2], by2 = boxes[j * 4 + 3];
      double iw = (ax2 < bx2 ? ax2 : bx2) - (ax1 > bx1 ? ax1 : bx1);
      double ih = (ay2 < by2 ? ay2 : by2) - (ay1 > by1 ? ay1 : by1);
      if (iw < 0) iw = 0;
      if (ih < 0) ih = 0;
      const double inter = iw * ih;
      const double uni = aa + (bx2 - bx1) * (by2 - by1) - inter;
      const double iou = uni > 0 ? inter / uni : 0.0;
      if (iou > thresh) out_keep[j] = 0;
    }
  }
  return kept;
}

}  // extern "C"
