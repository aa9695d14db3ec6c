// COCOeval detection-matching core — native rebuild of the hot loop the
// reference gets from pycocotools' C extension (SURVEY.md §2b N5: the
// reference's evaluator C20 sits on the pycocotools Cython/C _mask module).
// Python-side DetEval handles bookkeeping; this does the O(T·D·G) greedy
// matching per (image, category, area-range) with semantics identical to
// COCOeval.evaluateImg (and to the numpy fallback in utils/cocoeval.py,
// which the tests pin it against).
//
// Build: g++ -O3 -march=native -shared -fPIC cocoeval_core.cpp -o libcocoeval.so

#include <cstdint>

extern "C" {

// ious: D*G row-major; g_ig sorted non-ignored-first by the caller.
// dtm, dt_ig: T*D outputs. gtm scratch is internal.
void match_dets(int T, const double* iou_thrs,
                int D, int G,
                const double* ious,
                const int64_t* g_ig,
                const int64_t* g_crowd,
                int64_t* dtm,
                int64_t* dt_ig) {
  // scratch: gt matched flags per threshold pass
  // (G can be 0; loops fall through naturally)
  int64_t* gtm = new int64_t[G > 0 ? G : 1];
  for (int t = 0; t < T; ++t) {
    double thr = iou_thrs[t];
    if (thr > 1.0 - 1e-10) thr = 1.0 - 1e-10;
    for (int g = 0; g < G; ++g) gtm[g] = -1;
    for (int d = 0; d < D; ++d) {
      double best = thr;
      int m = -1;
      const double* row = ious + (int64_t)d * G;
      for (int g = 0; g < G; ++g) {
        // gt already matched (and not crowd) — skip
        if (gtm[g] >= 0 && !g_crowd[g]) continue;
        // non-ignored match already found and we've reached ignored gts
        // (ignored sorted to the back) — stop
        if (m > -1 && g_ig[m] == 0 && g_ig[g] == 1) break;
        if (row[g] < best) continue;
        best = row[g];   // >= update: ties take the LAST gt (pycocotools)
        m = g;
      }
      int64_t* dtm_t = dtm + (int64_t)t * D;
      int64_t* dtig_t = dt_ig + (int64_t)t * D;
      if (m == -1) {
        dtm_t[d] = -1;
        dtig_t[d] = 0;
      } else {
        dtm_t[d] = m;
        dtig_t[d] = g_ig[m];
        gtm[m] = d;
      }
    }
  }
  delete[] gtm;
}

}  // extern "C"
