// C++ CPU oracle ops: greedy NMS and dense IoU.
//
// Host-side native counterparts of the reference's Cython/CUDA ops
// (/root/reference/lib/nms/cpu_nms.pyx:43-66 greedy loop with >= suppression
// and +1-width areas; /root/reference/lib/utils/bbox.pyx:33-55 IoU matrix).
// Re-implemented from the algorithm, parameterized so the same entry point
// also reproduces the CUDA kernel's and TF's strict-> suppression and
// standard (non +1) IoU. Used as the golden oracle for the Pallas/jnp kernels
// and for host-side eval paths (reval-style re-NMS on pickled detections).
//
// Built as a plain shared library, called through ctypes
// (tf_faster_rcnn_tpu/utils/native.py). No Python headers needed.

#include <algorithm>
#include <cstdint>
#include <numeric>
#include <vector>

extern "C" {

// Greedy NMS over dets = [n x 5] rows (x1, y1, x2, y2, score).
// Boxes are processed in descending score order (stable w.r.t. input order
// on ties, matching numpy argsort[::-1] semantics closely enough for tests
// that avoid exact ties). Writes kept row indices (in suppression order) to
// keep_out and returns the number kept.
//
// plus_one    : 1 -> legacy +1 widths/areas, 0 -> standard IoU
// suppress_eq : 1 -> suppress at iou >= thresh, 0 -> at iou > thresh
int nms_cpu(const float* dets, int n, float thresh, int plus_one,
            int suppress_eq, int* keep_out) {
  const float e = plus_one ? 1.0f : 0.0f;
  std::vector<int> order(n);
  std::iota(order.begin(), order.end(), 0);
  std::stable_sort(order.begin(), order.end(), [&](int a, int b) {
    return dets[a * 5 + 4] > dets[b * 5 + 4];
  });

  std::vector<float> areas(n);
  for (int i = 0; i < n; ++i) {
    const float* d = dets + i * 5;
    areas[i] = (d[2] - d[0] + e) * (d[3] - d[1] + e);
  }

  std::vector<char> suppressed(n, 0);
  int num_keep = 0;
  for (int oi = 0; oi < n; ++oi) {
    int i = order[oi];
    if (suppressed[i]) continue;
    keep_out[num_keep++] = i;
    const float* di = dets + i * 5;
    for (int oj = oi + 1; oj < n; ++oj) {
      int j = order[oj];
      if (suppressed[j]) continue;
      const float* dj = dets + j * 5;
      float iw = std::min(di[2], dj[2]) - std::max(di[0], dj[0]) + e;
      float ih = std::min(di[3], dj[3]) - std::max(di[1], dj[1]) + e;
      if (iw <= 0 || ih <= 0) continue;
      float inter = iw * ih;
      float ovr = inter / (areas[i] + areas[j] - inter);
      if (suppress_eq ? (ovr >= thresh) : (ovr > thresh)) suppressed[j] = 1;
    }
  }
  return num_keep;
}

// Dense IoU: boxes [n x 4] vs query_boxes [k x 4] -> out [n x k], row-major.
void bbox_overlaps_cpu(const float* boxes, int n, const float* query, int k,
                       int plus_one, float* out) {
  const float e = plus_one ? 1.0f : 0.0f;
  for (int j = 0; j < k; ++j) {
    const float* q = query + j * 4;
    float qarea = (q[2] - q[0] + e) * (q[3] - q[1] + e);
    for (int i = 0; i < n; ++i) {
      const float* b = boxes + i * 4;
      float iw = std::min(b[2], q[2]) - std::max(b[0], q[0]) + e;
      float out_v = 0.0f;
      if (iw > 0) {
        float ih = std::min(b[3], q[3]) - std::max(b[1], q[1]) + e;
        if (ih > 0) {
          float barea = (b[2] - b[0] + e) * (b[3] - b[1] + e);
          float ua = barea + qarea - iw * ih;
          out_v = iw * ih / ua;
        }
      }
      out[i * k + j] = out_v;
    }
  }
}

}  // extern "C"
