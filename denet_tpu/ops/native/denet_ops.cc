// Host-side search ops for the DeNet TPU framework (ctypes ABI).
//
// Implements the same algorithms as the reference CPython extensions
// (denet/layer/denet_sparse.cc, denet/layer/denet_detect.cc) re-written for a
// plain-C ABI over contiguous float32 buffers so the JAX host pipeline can
// call them without the Python C API in the hot path:
//
//   * build_samples: scan corner log-prob heatmaps for candidates above a
//     threshold (optional local-max suppression), pair TL x BR and TR x BL
//     corners (+4 center pairings when 5 corner types), dedup by bbox hash,
//     score sigma(|sum log pr_f - sum log pr_t|), optional greedy IoU
//     clustering with quota redistribution, and emit the top sample_num^2
//     bboxes per image.  One worker thread per image.
//
//   * build_detections_nms: per-image per-class thresholded collection with
//     greedy NMS or log-space gaussian Soft-NMS (arXiv:1704.04503).
//
// Compile: g++ -O3 -std=c++17 -shared -fPIC -pthread denet_ops.cc -o denet_ops.so

#include <algorithm>
#include <atomic>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <list>
#include <thread>
#include <unordered_set>
#include <vector>

namespace {

struct Sample {
  float pr, x0, y0, x1, y1;
  float width() const { return x1 - x0; }
  float height() const { return y1 - y0; }
  float area() const { return width() * height(); }
  bool operator<(const Sample& o) const { return pr > o.pr; }  // sort desc
};

float overlap(const Sample& a, const Sample& b) {
  float dx = std::max(0.0f, std::min(a.x1, b.x1) - std::max(a.x0, b.x0));
  float dy = std::max(0.0f, std::min(a.y1, b.y1) - std::max(a.y0, b.y0));
  return dx * dy;
}

float overlap_iou(const Sample& a, const Sample& b) {
  float ai = overlap(a, b);
  return ai / (a.area() + b.area() - ai);
}

struct Corner {
  int x, y;
  float log_pr;
};

inline uint64_t bbox_hash(int x0, int y0, int x1, int y1) {
  return (uint64_t(uint16_t(x0)) << 48) | (uint64_t(uint16_t(y0)) << 32) |
         (uint64_t(uint16_t(x1)) << 16) | uint64_t(uint16_t(y1));
}

// Accessor for corner_pr laid out (B, 2, corner_num, H, W) contiguous.
struct CornerPr {
  const float* data;
  int corner_num, height, width;
  inline float at(int b, int t, int ci, int y, int x) const {
    return data[((((int64_t)b * 2 + t) * corner_num + ci) * height + y) * width + x];
  }
};

void emit_sample(const CornerPr& cp, int b, int x0, int y0, int x1, int y1,
                 std::vector<Sample>* out) {
  float pr_f = cp.at(b, 0, 0, y0, x0) + cp.at(b, 0, 1, y0, x1) +
               cp.at(b, 0, 2, y1, x0) + cp.at(b, 0, 3, y1, x1);
  float pr_t = cp.at(b, 1, 0, y0, x0) + cp.at(b, 1, 1, y0, x1) +
               cp.at(b, 1, 2, y1, x0) + cp.at(b, 1, 3, y1, x1);
  if (cp.corner_num == 5) {
    int cx = (x0 + x1) / 2, cy = (y0 + y1) / 2;
    pr_f += cp.at(b, 0, 4, cy, cx);
    pr_t += cp.at(b, 1, 4, cy, cx);
  }
  float pr = 1.0f / (1.0f + std::exp(std::fabs(pr_f - pr_t)));
  out->push_back({pr, (float)x0 / cp.width, (float)y0 / cp.height,
                  (float)(x1 + 1) / cp.width, (float)(y1 + 1) / cp.height});
}

float local_max_pr(const CornerPr& cp, int b, int ci, int y, int x, int r) {
  int x0 = std::max(0, x - r), y0 = std::max(0, y - r);
  int x1 = std::min(cp.width - 1, x + r), y1 = std::min(cp.height - 1, y + r);
  float m = -1e30f;
  for (int yy = y0; yy < y1; yy++)
    for (int xx = x0; xx < x1; xx++)
      m = std::max(m, cp.at(b, 1, ci, yy, xx));
  return m;
}

// Greedy IoU clustering with quota redistribution (reference apply_cluster,
// denet_sparse.cc:165-242).
struct Cluster {
  Sample bounds;
  std::vector<Sample> members;
  void add(const Sample& s) {
    bounds.pr = std::max(bounds.pr, s.pr);
    bounds.x0 = std::min(bounds.x0, s.x0);
    bounds.y0 = std::min(bounds.y0, s.y0);
    bounds.x1 = std::max(bounds.x1, s.x1);
    bounds.y1 = std::max(bounds.y1, s.y1);
    members.push_back(s);
  }
  bool overlaps(const Sample& s, float threshold) const {
    if (overlap(s, bounds) == 0) return false;
    for (const Sample& m : members)
      if (overlap_iou(s, m) > threshold) return true;
    return false;
  }
};

void apply_cluster(std::vector<Sample>& samples, float threshold,
                   size_t input_num, size_t output_num) {
  if (samples.size() > input_num) {
    std::partial_sort(samples.begin(), samples.begin() + input_num, samples.end());
    samples.resize(input_num);
  }

  std::list<Cluster> clusters;
  for (const Sample& s : samples) {
    std::vector<std::list<Cluster>::iterator> hits;
    for (auto it = clusters.begin(); it != clusters.end(); ++it)
      if (it->overlaps(s, threshold)) hits.push_back(it);

    if (!hits.empty()) {
      Cluster& target = *hits.back();
      hits.pop_back();
      target.add(s);
      for (auto& it : hits) {
        for (const Sample& m : it->members) target.add(m);
        clusters.erase(it);
      }
    } else {
      Cluster c;
      c.bounds = s;
      c.members.push_back(s);
      clusters.push_back(std::move(c));
    }
  }

  if (clusters.size() > output_num) {
    clusters.sort([](const Cluster& a, const Cluster& b) {
      return a.members.size() > b.members.size();
    });
    clusters.resize(output_num);
  }

  double ratio = (double)(output_num - clusters.size()) /
                 std::max<double>(1.0, (double)samples.size() - clusters.size());
  samples.clear();
  for (Cluster& c : clusters) {
    size_t n = std::min(c.members.size(), (size_t)(1 + std::floor(c.members.size() * ratio)));
    std::partial_sort(c.members.begin(), c.members.begin() + n, c.members.end());
    samples.insert(samples.end(), c.members.begin(), c.members.begin() + n);
  }
}

void build_samples_one(const CornerPr& cp, int b, float corner_threshold,
                       int sample_num, int max_corners, int local_max,
                       float cluster_threshold, float* out_bbox, float* out_pr,
                       int* out_count) {
  const size_t sample_count = (size_t)sample_num * sample_num;
  const float threshold = std::log(corner_threshold);

  std::vector<std::vector<Corner>> corners(cp.corner_num);
  for (int ci = 0; ci < cp.corner_num; ci++) {
    for (int y = 0; y < cp.height; y++) {
      for (int x = 0; x < cp.width; x++) {
        float log_pr = cp.at(b, 1, ci, y, x);
        if (log_pr <= threshold) continue;
        if (local_max > 0 && log_pr < local_max_pr(cp, b, ci, y, x, local_max))
          continue;
        corners[ci].push_back({x, y, log_pr});
      }
    }
    if ((int)corners[ci].size() > max_corners) {
      std::partial_sort(corners[ci].begin(), corners[ci].begin() + max_corners,
                        corners[ci].end(), [](const Corner& a, const Corner& c) {
                          return a.log_pr > c.log_pr;
                        });
      corners[ci].resize(max_corners);
    }
  }

  std::vector<Sample> samples;
  std::unordered_set<uint64_t> seen;
  auto try_emit = [&](int x0, int y0, int x1, int y1) {
    uint64_t h = bbox_hash(x0, y0, x1, y1);
    if (seen.insert(h).second) emit_sample(cp, b, x0, y0, x1, y1, &samples);
  };

  // top-left x bottom-right
  for (const Corner& tl : corners[0])
    for (const Corner& br : corners[3])
      if (br.x > tl.x && br.y > tl.y) try_emit(tl.x, tl.y, br.x, br.y);

  // top-right x bottom-left
  for (const Corner& tr : corners[1])
    for (const Corner& bl : corners[2])
      if (tr.x > bl.x && bl.y > tr.y) try_emit(bl.x, tr.y, tr.x, bl.y);

  // center pairings (5-corner models): reflect each corner through the center
  if (cp.corner_num == 5) {
    auto in_bounds = [&](int x0, int y0, int x1, int y1) {
      return x0 >= 0 && y0 >= 0 && x1 < cp.width && y1 < cp.height &&
             x1 > x0 && y1 > y0;
    };
    for (const Corner& c : corners[4]) {
      for (const Corner& tl : corners[0]) {
        int x1 = tl.x + 2 * (c.x - tl.x), y1 = tl.y + 2 * (c.y - tl.y);
        if (in_bounds(tl.x, tl.y, x1, y1)) try_emit(tl.x, tl.y, x1, y1);
      }
      for (const Corner& tr : corners[1]) {
        int x0 = tr.x - 2 * (tr.x - c.x), y1 = tr.y + 2 * (c.y - tr.y);
        if (in_bounds(x0, tr.y, tr.x, y1)) try_emit(x0, tr.y, tr.x, y1);
      }
      for (const Corner& bl : corners[2]) {
        int x1 = bl.x + 2 * (c.x - bl.x), y0 = bl.y - 2 * (bl.y - c.y);
        if (in_bounds(bl.x, y0, x1, bl.y)) try_emit(bl.x, y0, x1, bl.y);
      }
      for (const Corner& br : corners[3]) {
        int x0 = br.x - 2 * (br.x - c.x), y0 = br.y - 2 * (br.y - c.y);
        if (in_bounds(x0, y0, br.x, br.y)) try_emit(x0, y0, br.x, br.y);
      }
    }
  }

  if (samples.size() > sample_count && cluster_threshold < 1.0f)
    apply_cluster(samples, cluster_threshold, 10 * sample_count, sample_count);

  size_t n = std::min(samples.size(), sample_count);
  std::partial_sort(samples.begin(), samples.begin() + n, samples.end());

  for (size_t i = 0; i < n; i++) {
    out_bbox[i * 4 + 0] = samples[i].x0;
    out_bbox[i * 4 + 1] = samples[i].y0;
    out_bbox[i * 4 + 2] = samples[i].x1;
    out_bbox[i * 4 + 3] = samples[i].y1;
    out_pr[i] = samples[i].pr;
  }
  *out_count = (int)n;
}

}  // namespace

extern "C" {

// corner_pr: (B, 2, corner_num, H, W) float32 log-probs.
// out_bbox: (B, sample_num^2, 4); out_pr: (B, sample_num^2); out_count: (B,)
void build_samples(const float* corner_pr, int batch, int corner_num, int height,
                   int width, float corner_threshold, int sample_num,
                   int max_corners, int local_max, float cluster_threshold,
                   int thread_num, float* out_bbox, float* out_pr,
                   int* out_count) {
  CornerPr cp{corner_pr, corner_num, height, width};
  const size_t sc = (size_t)sample_num * sample_num;

  std::atomic<int> next(0);
  auto worker = [&]() {
    int b;
    while ((b = next.fetch_add(1)) < batch) {
      build_samples_one(cp, b, corner_threshold, sample_num, max_corners,
                        local_max, cluster_threshold, out_bbox + (size_t)b * sc * 4,
                        out_pr + (size_t)b * sc, out_count + b);
    }
  };

  int nt = std::max(1, std::min(thread_num, batch));
  if (nt == 1) {
    worker();
  } else {
    std::vector<std::thread> threads;
    for (int i = 0; i < nt; i++) threads.emplace_back(worker);
    for (auto& t : threads) t.join();
  }
}

// Greedy NMS / log-space gaussian Soft-NMS over per-class thresholded samples.
// det_pr/fitness: (B, class_num+1, sn, sn); bbox: (B, sn, sn, 4);
// bbox_num: (B,) valid sample counts.  Outputs per image at most max_dets
// rows of [score(log), class, x0, y0, x1, y1] in out_dets (B, max_dets, 6).
void build_detections_nms(float pr_threshold, float nms_threshold,
                          int use_soft_nms, const float* det_pr,
                          const float* fitness, const float* bbox,
                          const int* bbox_num, int batch, int class_num_p1,
                          int sn, int max_dets, float* out_dets,
                          int* out_count) {
  const float log_pr_threshold = std::log(pr_threshold);
  const int class_num = class_num_p1 - 1;
  const float discard_threshold = -6.9f;

  struct Det {
    float score, x0, y0, x1, y1;
    int cls;
  };

  std::atomic<int> next(0);
  auto worker = [&]() {
    int b;
    while ((b = next.fetch_add(1)) < batch) {
      std::vector<Det> all;
      int nbbox = bbox_num[b];
      for (int cls = 0; cls < class_num; cls++) {
        std::vector<Det> dets;
        for (int j = 0; j < sn && j * sn < nbbox; j++) {
          for (int i = 0; i < sn && j * sn + i < nbbox; i++) {
            int64_t off = (((int64_t)b * class_num_p1 + cls) * sn + j) * sn + i;
            float log_pr = det_pr[off];
            if (log_pr < log_pr_threshold) continue;
            float fit = fitness[off];
            const float* bb = bbox + (((int64_t)b * sn + j) * sn + i) * 4;
            dets.push_back({fit, bb[0], bb[1], bb[2], bb[3], cls});
          }
        }

        if (nms_threshold <= 0.0f || nms_threshold >= 1.0f || dets.empty()) {
          all.insert(all.end(), dets.begin(), dets.end());
          continue;
        }

        auto iou = [](const Det& a, const Det& c) {
          Sample sa{0, a.x0, a.y0, a.x1, a.y1}, sc{0, c.x0, c.y0, c.x1, c.y1};
          return overlap_iou(sa, sc);
        };

        if (use_soft_nms) {
          std::list<Det> pool(dets.begin(), dets.end());
          while (!pool.empty()) {
            auto m_it = pool.begin();
            for (auto it = pool.begin(); it != pool.end(); ++it)
              if (it->score > m_it->score) m_it = it;
            Det m = *m_it;
            pool.erase(m_it);
            all.push_back(m);
            for (auto it = pool.begin(); it != pool.end();) {
              float v = iou(m, *it);
              it->score -= v * v / nms_threshold;
              it = (it->score < discard_threshold) ? pool.erase(it) : ++it;
            }
          }
        } else {
          for (const Det& a : dets) {
            bool keep = true;
            for (const Det& c : dets) {
              if (a.score < c.score && iou(a, c) > nms_threshold) {
                keep = false;
                break;
              }
            }
            if (keep) all.push_back(a);
          }
        }
      }

      int n = std::min((int)all.size(), max_dets);
      if ((int)all.size() > max_dets)
        std::partial_sort(all.begin(), all.begin() + n, all.end(),
                          [](const Det& a, const Det& c) { return a.score > c.score; });
      float* out = out_dets + (size_t)b * max_dets * 6;
      for (int i = 0; i < n; i++) {
        out[i * 6 + 0] = all[i].score;
        out[i * 6 + 1] = (float)all[i].cls;
        out[i * 6 + 2] = all[i].x0;
        out[i * 6 + 3] = all[i].y0;
        out[i * 6 + 4] = all[i].x1;
        out[i * 6 + 5] = all[i].y1;
      }
      out_count[b] = n;
    }
  };

  int nt = std::max(1, std::min((int)std::thread::hardware_concurrency(), batch));
  std::vector<std::thread> threads;
  for (int i = 0; i < nt; i++) threads.emplace_back(worker);
  for (auto& t : threads) t.join();
}

}  // extern "C"
