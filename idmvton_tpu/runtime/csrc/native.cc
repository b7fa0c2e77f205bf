// idmvton_tpu native runtime ops (CPU, C++).
//
// TPU-native equivalents of the reference's native kernel layer (SURVEY §2.4):
//  - roi_align_forward: detectron2 ROIAlign semantics (aligned=true), the
//    reference's hot native op (gradio_demo/detectron2/layers/csrc/ROIAlign*).
//    On TPU the serving path uses the XLA gather formulation
//    (idmvton_tpu/ops/roi_align.py); this C++ kernel is the host-side
//    oracle/fallback used by tests and CPU-only deployments.
//  - nms: greedy IoU suppression (csrc/nms_rotated + torchvision nms analog).
//  - coco_average_precision: compact COCO-style AP@[.5:.95] evaluator
//    (csrc/cocoeval/cocoeval.cpp analog for box detection).
//
// Exposed as a CPython extension (no pybind11 in this image); buffers are
// passed as contiguous float32/int32 arrays via the buffer protocol.

#define PY_SSIZE_T_CLEAN
#include <Python.h>

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <vector>

namespace {

struct Buf {
  Py_buffer view{};
  bool ok = false;
  ~Buf() {
    if (ok) PyBuffer_Release(&view);
  }
  bool acquire(PyObject* obj, int flags = PyBUF_C_CONTIGUOUS) {
    if (PyObject_GetBuffer(obj, &view, flags) != 0) return false;
    ok = true;
    return true;
  }
  const float* f32() const { return static_cast<const float*>(view.buf); }
  Py_ssize_t elems() const { return view.len / (Py_ssize_t)sizeof(float); }
};

// ---------------------------------------------------------------------------
// ROIAlign forward (NHWC features)
// ---------------------------------------------------------------------------

inline float bilinear(const float* feat, int h, int w, int c, float y, float x,
                      int ch) {
  if (y < -1.f || y > (float)h || x < -1.f || x > (float)w) return 0.f;
  y = std::min(std::max(y, 0.f), (float)(h - 1));
  x = std::min(std::max(x, 0.f), (float)(w - 1));
  int y0 = (int)y, x0 = (int)x;
  int y1 = std::min(y0 + 1, h - 1), x1 = std::min(x0 + 1, w - 1);
  float wy1 = y - y0, wx1 = x - x0;
  auto at = [&](int yy, int xx) { return feat[(yy * w + xx) * c + ch]; };
  return (1 - wy1) * (1 - wx1) * at(y0, x0) + (1 - wy1) * wx1 * at(y0, x1) +
         wy1 * (1 - wx1) * at(y1, x0) + wy1 * wx1 * at(y1, x1);
}

// features (B, H, W, C) f32; boxes (R, 4) f32; box_indices (R,) i32
// -> out (R, n, n, C) f32
PyObject* roi_align_forward(PyObject*, PyObject* args) {
  PyObject *feat_o, *boxes_o, *idx_o, *out_o;
  int b, h, w, c, r, n, sampling;
  float scale;
  int aligned;
  if (!PyArg_ParseTuple(args, "OOOOiiiiiiifi", &feat_o, &boxes_o, &idx_o,
                        &out_o, &b, &h, &w, &c, &r, &n, &sampling, &scale,
                        &aligned))
    return nullptr;
  Buf feat, boxes, idx, out;
  if (!feat.acquire(feat_o) || !boxes.acquire(boxes_o) ||
      !idx.acquire(idx_o) || !out.acquire(out_o, PyBUF_WRITABLE))
    return nullptr;
  const float* fp = feat.f32();
  const float* bx = boxes.f32();
  const int32_t* bi = static_cast<const int32_t*>(idx.view.buf);
  float* op = static_cast<float*>(out.view.buf);
  const float offset = aligned ? 0.5f : 0.0f;

  for (int ri = 0; ri < r; ri++) {
    float* dst = op + (size_t)ri * n * n * c;
    if (bi[ri] < 0 || bi[ri] >= b) {
      std::fill(dst, dst + (size_t)n * n * c, 0.f);
      continue;
    }
    const float* img = fp + (size_t)bi[ri] * h * w * c;
    float x1 = bx[ri * 4 + 0] * scale - offset;
    float y1 = bx[ri * 4 + 1] * scale - offset;
    float x2 = bx[ri * 4 + 2] * scale - offset;
    float y2 = bx[ri * 4 + 3] * scale - offset;
    float rw = std::max(x2 - x1, aligned ? 1e-6f : 1.f);
    float rh = std::max(y2 - y1, aligned ? 1e-6f : 1.f);
    float bw = rw / n, bh = rh / n;
    for (int oy = 0; oy < n; oy++) {
      for (int ox = 0; ox < n; ox++) {
        for (int ch = 0; ch < c; ch++) {
          float acc = 0.f;
          for (int sy = 0; sy < sampling; sy++) {
            for (int sx = 0; sx < sampling; sx++) {
              float y = y1 + (oy + (sy + .5f) / sampling) * bh;
              float x = x1 + (ox + (sx + .5f) / sampling) * bw;
              acc += bilinear(img, h, w, c, y, x, ch);
            }
          }
          dst[(oy * n + ox) * c + ch] = acc / (sampling * sampling);
        }
      }
    }
  }
  Py_RETURN_NONE;
}

// ---------------------------------------------------------------------------
// greedy NMS
// ---------------------------------------------------------------------------

inline float iou(const float* a, const float* b) {
  float ax = std::max(a[0], b[0]), ay = std::max(a[1], b[1]);
  float bx = std::min(a[2], b[2]), by = std::min(a[3], b[3]);
  float inter = std::max(bx - ax, 0.f) * std::max(by - ay, 0.f);
  float aa = std::max(a[2] - a[0], 0.f) * std::max(a[3] - a[1], 0.f);
  float ab = std::max(b[2] - b[0], 0.f) * std::max(b[3] - b[1], 0.f);
  float u = aa + ab - inter;
  return u > 1e-9f ? inter / u : 0.f;
}

// boxes (N, 4), scores (N,) -> keep mask written into out (N,) i32
PyObject* nms(PyObject*, PyObject* args) {
  PyObject *boxes_o, *scores_o, *out_o;
  int n;
  float thr;
  if (!PyArg_ParseTuple(args, "OOOif", &boxes_o, &scores_o, &out_o, &n, &thr))
    return nullptr;
  Buf boxes, scores, out;
  if (!boxes.acquire(boxes_o) || !scores.acquire(scores_o) ||
      !out.acquire(out_o, PyBUF_WRITABLE))
    return nullptr;
  const float* bx = boxes.f32();
  const float* sc = scores.f32();
  int32_t* keep = static_cast<int32_t*>(out.view.buf);
  std::vector<int> order(n);
  for (int i = 0; i < n; i++) order[i] = i;
  std::stable_sort(order.begin(), order.end(),
                   [&](int a, int b) { return sc[a] > sc[b]; });
  std::vector<char> suppressed(n, 0);
  std::fill(keep, keep + n, 0);
  for (int oi = 0; oi < n; oi++) {
    int i = order[oi];
    if (suppressed[i]) continue;
    keep[i] = 1;
    for (int oj = oi + 1; oj < n; oj++) {
      int j = order[oj];
      if (!suppressed[j] && iou(bx + i * 4, bx + j * 4) > thr)
        suppressed[j] = 1;
    }
  }
  Py_RETURN_NONE;
}

// ---------------------------------------------------------------------------
// COCO-style AP@[.5:.95] for box detections, single category
// ---------------------------------------------------------------------------

// dets (D, 6): image_id, score, x1, y1, x2, y2 (pre-sorted by score desc)
// gts  (G, 5): image_id, x1, y1, x2, y2
PyObject* coco_average_precision(PyObject*, PyObject* args) {
  PyObject *dets_o, *gts_o;
  int nd, ng;
  if (!PyArg_ParseTuple(args, "OOii", &dets_o, &gts_o, &nd, &ng))
    return nullptr;
  Buf dets, gts;
  if (!dets.acquire(dets_o) || !gts.acquire(gts_o)) return nullptr;
  const float* dp = dets.f32();
  const float* gp = gts.f32();

  double ap_sum = 0.0;
  int n_thr = 0;
  for (float thr = 0.5f; thr < 0.99f; thr += 0.05f, n_thr++) {
    std::vector<char> gt_used(ng, 0);
    std::vector<char> tp(nd, 0);
    for (int d = 0; d < nd; d++) {
      float best = thr;
      int best_g = -1;
      for (int g = 0; g < ng; g++) {
        if (gt_used[g] || gp[g * 5] != dp[d * 6]) continue;  // image match
        float v = iou(dp + d * 6 + 2, gp + g * 5 + 1);
        if (v >= best) {
          best = v;
          best_g = g;
        }
      }
      if (best_g >= 0) {
        gt_used[best_g] = 1;
        tp[d] = 1;
      }
    }
    // 101-point interpolated AP
    std::vector<double> prec, rec;
    int tps = 0;
    for (int d = 0; d < nd; d++) {
      tps += tp[d];
      prec.push_back((double)tps / (d + 1));
      rec.push_back(ng > 0 ? (double)tps / ng : 0.0);
    }
    for (int i = (int)prec.size() - 2; i >= 0; i--)
      prec[i] = std::max(prec[i], prec[i + 1]);
    double ap = 0.0;
    for (int ri = 0; ri <= 100; ri++) {
      double r = ri / 100.0;
      double p = 0.0;
      for (size_t i = 0; i < rec.size(); i++) {
        if (rec[i] >= r) {
          p = prec[i];
          break;
        }
      }
      ap += p / 101.0;
    }
    ap_sum += ap;
  }
  return PyFloat_FromDouble(ng == 0 ? 0.0 : ap_sum / n_thr);
}

PyMethodDef methods[] = {
    {"roi_align_forward", roi_align_forward, METH_VARARGS,
     "ROIAlign forward (NHWC, detectron2 aligned semantics)"},
    {"nms", nms, METH_VARARGS, "Greedy IoU NMS -> keep mask"},
    {"coco_average_precision", coco_average_precision, METH_VARARGS,
     "COCO-style AP@[.5:.95], single category"},
    {nullptr, nullptr, 0, nullptr},
};

PyModuleDef module = {PyModuleDef_HEAD_INIT, "_idmvton_native",
                      "idmvton_tpu native runtime ops", -1, methods};

}  // namespace

PyMODINIT_FUNC PyInit__idmvton_native(void) { return PyModule_Create(&module); }
