// Host-side search ops for the DeNet TPU framework (ctypes ABI).
//
// Implements the same algorithms as the reference CPython extensions
// (denet/layer/denet_sparse.cc, denet/layer/denet_detect.cc) re-designed for
// a single-CPU host feeding a remote TPU:
//
//   * build_samples consumes a per-position corner *diff* map
//     d = log pr_f - log pr_t  (computed on device, half the transfer of the
//     full two-channel heatmap).  A candidate bbox's score
//     sigma(|sum_f - sum_t|) = 1/(1+exp(|sum of corner diffs|)) is monotone
//     decreasing in |sum d|, so candidates carry the raw |sum d| and the exp
//     is deferred to the <= sample_num^2 selected outputs.  The TL x BR
//     enumeration is duplicate-free by construction so only the TR x BL and
//     center phases pay hash lookups (open-addressing table).
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
#include <vector>

namespace {

struct Sample {
  float key, x0, y0, x1, y1;  // key = |sum d| (lower is better)
  float width() const { return x1 - x0; }
  float height() const { return y1 - y0; }
  float area() const { return width() * height(); }
  bool operator<(const Sample& o) const { return key < o.key; }
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
  float d;  // log pr_f - log pr_t at this position
};

// open-addressing hash set for 64-bit bbox keys (power-of-two size)
class BboxSet {
 public:
  explicit BboxSet(size_t expected) {
    size_t cap = 64;
    while (cap < expected * 2) cap <<= 1;
    mask_ = cap - 1;
    slots_.assign(cap, kEmpty);
  }

  // returns true if newly inserted
  bool insert(uint64_t key) {
    key += 1;  // reserve 0 as empty
    size_t i = (key * 0x9E3779B97F4A7C15ull) & mask_;
    while (true) {
      uint64_t cur = slots_[i];
      if (cur == key) return false;
      if (cur == kEmpty) {
        slots_[i] = key;
        if (++count_ * 2 > slots_.size()) grow();
        return true;
      }
      i = (i + 1) & mask_;
    }
  }

 private:
  void grow() {
    std::vector<uint64_t> old;
    old.swap(slots_);
    mask_ = mask_ * 2 + 1;
    slots_.assign(mask_ + 1, kEmpty);
    count_ = 0;
    for (uint64_t k : old)
      if (k != kEmpty) {
        size_t i = (k * 0x9E3779B97F4A7C15ull) & mask_;
        while (slots_[i] != kEmpty) i = (i + 1) & mask_;
        slots_[i] = k;
        count_++;
      }
  }

  static constexpr uint64_t kEmpty = 0;
  std::vector<uint64_t> slots_;
  size_t mask_ = 0;
  size_t count_ = 0;
};

inline uint64_t bbox_key(int x0, int y0, int x1, int y1) {
  return (uint64_t(uint16_t(x0)) << 48) | (uint64_t(uint16_t(y0)) << 32) |
         (uint64_t(uint16_t(x1)) << 16) | uint64_t(uint16_t(y1));
}

// Per-image corner diff map (corner_num, H, W) contiguous.
struct DiffMap {
  const float* data;
  int corner_num, height, width;
  inline float at(int ci, int y, int x) const {
    return data[((int64_t)ci * height + y) * width + x];
  }
};

// Greedy IoU clustering with quota redistribution (reference semantics,
// denet_sparse.cc:165-242): cap input by best-key, greedily merge clusters
// whose members overlap a new sample above threshold, cap cluster count by
// membership, then take the top (1 + floor(len*ratio)) of each cluster.
struct Cluster {
  Sample bounds;
  std::vector<Sample> members;
  void add(const Sample& s) {
    bounds.key = std::min(bounds.key, s.key);
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
    std::partial_sort(samples.begin(), samples.begin() + input_num,
                      samples.end());
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
    // size-desc with best-member-key tiebreak: deterministic and matched by
    // the device clustering (ops/cluster_device.py).  The reference broke
    // ties by std::list insertion order (denet_sparse.cc:212), which is not
    // reproducible in a data-parallel formulation.
    clusters.sort([](const Cluster& a, const Cluster& b) {
      if (a.members.size() != b.members.size())
        return a.members.size() > b.members.size();
      return a.bounds.key < b.bounds.key;
    });
    clusters.resize(output_num);
  }

  // integer quota arithmetic (exact; the reference's double `ratio` could
  // round floor(size*ratio) off by one at exact boundaries) — matched by
  // the device clustering
  size_t quota_num = output_num - clusters.size();
  size_t quota_den = std::max<size_t>(1, samples.size() - clusters.size());
  samples.clear();
  for (Cluster& c : clusters) {
    size_t n = std::min(c.members.size(),
                        1 + c.members.size() * quota_num / quota_den);
    std::partial_sort(c.members.begin(), c.members.begin() + n,
                      c.members.end());
    samples.insert(samples.end(), c.members.begin(), c.members.begin() + n);
  }
}

void build_samples_one(const DiffMap& dm, float corner_threshold,
                       int sample_num, int max_corners, int local_max,
                       float cluster_threshold, float* out_bbox, float* out_pr,
                       int* out_count) {
  const size_t sample_count = (size_t)sample_num * sample_num;
  const int H = dm.height, W = dm.width;
  // pr_t > threshold  <=>  d < log((1-t)/t)
  const float bound = std::log((1.0f - corner_threshold) / corner_threshold);

  std::vector<std::vector<Corner>> corners(dm.corner_num);
  for (int ci = 0; ci < dm.corner_num; ci++) {
    auto& list = corners[ci];
    for (int y = 0; y < H; y++) {
      const float* row = dm.data + ((int64_t)ci * H + y) * W;
      for (int x = 0; x < W; x++) {
        float d = row[x];
        if (d >= bound) continue;
        if (local_max > 0) {
          // local-max NMS in pr_t == local-min in d (reference scans the
          // [y-r, y+r) x [x-r, x+r) window, denet_sparse.cc:474-487)
          int x0 = std::max(0, x - local_max), y0 = std::max(0, y - local_max);
          int x1 = std::min(W - 1, x + local_max);
          int y1 = std::min(H - 1, y + local_max);
          float dmin = 1e30f;
          for (int yy = y0; yy < y1; yy++)
            for (int xx = x0; xx < x1; xx++)
              dmin = std::min(dmin, dm.at(ci, yy, xx));
          if (d > dmin) continue;
        }
        list.push_back({x, y, d});
      }
    }
    if ((int)list.size() > max_corners) {
      std::partial_sort(list.begin(), list.begin() + max_corners, list.end(),
                        [](const Corner& a, const Corner& c) {
                          return a.d < c.d;
                        });
      list.resize(max_corners);
    }
  }

  const auto& tl_list = corners[0];
  const auto& tr_list = corners[1];
  const auto& bl_list = corners[2];
  const auto& br_list = corners[3];

  std::vector<Sample> samples;
  samples.reserve(tl_list.size() * br_list.size() / 2 + 16);

  auto center_d = [&](int x0, int y0, int x1, int y1) {
    if (dm.corner_num != 5) return 0.0f;
    return dm.at(4, (y0 + y1) / 2, (x0 + x1) / 2);
  };

  // phase 1: TL x BR — unique by construction, no hashing
  for (const Corner& tl : tl_list) {
    for (const Corner& br : br_list) {
      if (br.x <= tl.x || br.y <= tl.y) continue;
      float s = tl.d + dm.at(1, tl.y, br.x) + dm.at(2, br.y, tl.x) + br.d +
                center_d(tl.x, tl.y, br.x, br.y);
      samples.push_back({std::fabs(s), (float)tl.x / W, (float)tl.y / H,
                         (float)(br.x + 1) / W, (float)(br.y + 1) / H});
    }
  }

  // corner-presence bitmasks make cross-phase duplicate checks O(1):
  // a TR x BL bbox was already produced by TL x BR iff its TL and BR corner
  // positions are both detected corners (each phase is internally dup-free).
  std::vector<uint8_t> tl_mask(H * W, 0), tr_mask(H * W, 0),
      bl_mask(H * W, 0), br_mask(H * W, 0);
  for (const Corner& c : tl_list) tl_mask[c.y * W + c.x] = 1;
  for (const Corner& c : tr_list) tr_mask[c.y * W + c.x] = 1;
  for (const Corner& c : bl_list) bl_mask[c.y * W + c.x] = 1;
  for (const Corner& c : br_list) br_mask[c.y * W + c.x] = 1;

  // phase 2: TR x BL
  for (const Corner& tr : tr_list) {
    for (const Corner& bl : bl_list) {
      if (tr.x <= bl.x || bl.y <= tr.y) continue;
      int x0 = bl.x, y0 = tr.y, x1 = tr.x, y1 = bl.y;
      if (tl_mask[y0 * W + x0] && br_mask[y1 * W + x1]) continue;
      float s = dm.at(0, y0, x0) + tr.d + bl.d + dm.at(3, y1, x1) +
                center_d(x0, y0, x1, y1);
      samples.push_back({std::fabs(s), (float)x0 / W, (float)y0 / H,
                         (float)(x1 + 1) / W, (float)(y1 + 1) / H});
    }
  }

  // phase 3: center pairings (5-corner models) — reflect each corner type
  // through a detected center (reference denet_sparse.cc:377-468)
  if (dm.corner_num == 5) {
    BboxSet seen(4 * corners[4].size() * (tl_list.size() + 1) + 64);
    auto try_emit = [&](int x0, int y0, int x1, int y1) {
      if (x0 < 0 || y0 < 0 || x1 >= W || y1 >= H || x1 <= x0 || y1 <= y0)
        return;
      // already produced by a corner-pair phase?
      if (tl_mask[y0 * W + x0] && br_mask[y1 * W + x1]) return;
      if (tr_mask[y0 * W + x1] && bl_mask[y1 * W + x0]) return;
      if (!seen.insert(bbox_key(x0, y0, x1, y1))) return;
      float s = dm.at(0, y0, x0) + dm.at(1, y0, x1) + dm.at(2, y1, x0) +
                dm.at(3, y1, x1) + dm.at(4, (y0 + y1) / 2, (x0 + x1) / 2);
      samples.push_back({std::fabs(s), (float)x0 / W, (float)y0 / H,
                         (float)(x1 + 1) / W, (float)(y1 + 1) / H});
    };
    for (const Corner& c : corners[4]) {
      for (const Corner& tl : tl_list)
        try_emit(tl.x, tl.y, tl.x + 2 * (c.x - tl.x), tl.y + 2 * (c.y - tl.y));
      for (const Corner& tr : tr_list)
        try_emit(tr.x - 2 * (tr.x - c.x), tr.y, tr.x, tr.y + 2 * (c.y - tr.y));
      for (const Corner& bl : bl_list)
        try_emit(bl.x, bl.y - 2 * (bl.y - c.y), bl.x + 2 * (c.x - bl.x), bl.y);
      for (const Corner& br : br_list)
        try_emit(br.x - 2 * (br.x - c.x), br.y - 2 * (br.y - c.y), br.x, br.y);
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
    out_pr[i] = 1.0f / (1.0f + std::exp(samples[i].key));
  }
  *out_count = (int)n;
}

}  // namespace

extern "C" {

// corner_diff: (B, corner_num, H, W) float32 with d = log pr_f - log pr_t.
// out_bbox: (B, sample_num^2, 4); out_pr: (B, sample_num^2); out_count: (B,)
void build_samples(const float* corner_diff, int batch, int corner_num,
                   int height, int width, float corner_threshold,
                   int sample_num, int max_corners, int local_max,
                   float cluster_threshold, int thread_num, float* out_bbox,
                   float* out_pr, int* out_count) {
  const size_t sc = (size_t)sample_num * sample_num;
  const int64_t stride = (int64_t)corner_num * height * width;

  std::atomic<int> next(0);
  auto worker = [&]() {
    int b;
    while ((b = next.fetch_add(1)) < batch) {
      DiffMap dm{corner_diff + b * stride, corner_num, height, width};
      build_samples_one(dm, corner_threshold, sample_num, max_corners,
                        local_max, cluster_threshold,
                        out_bbox + (size_t)b * sc * 4, out_pr + (size_t)b * sc,
                        out_count + b);
    }
  };

  int hw = (int)std::thread::hardware_concurrency();
  int nt = std::max(1, std::min({thread_num, batch, hw}));
  if (nt == 1) {
    worker();
  } else {
    std::vector<std::thread> threads;
    for (int i = 0; i < nt; i++) threads.emplace_back(worker);
    for (auto& t : threads) t.join();
  }
}

// Standalone corner clustering over precomputed candidates (the device
// corner search produces the candidates; this runs the reference's greedy
// IoU clustering + quota redistribution on them).  pr: higher = better.
// in_bbox: (B, n, 4); in_pr: (B, n); in_count: (B,) valid candidates.
// out_bbox: (B, output_num, 4); out_pr; out_count.
void cluster_samples(const float* in_bbox, const float* in_pr,
                     const int* in_count, int batch, int n, float threshold,
                     int input_num, int output_num, float* out_bbox,
                     float* out_pr, int* out_count) {
  std::atomic<int> next(0);
  auto worker = [&]() {
    int b;
    while ((b = next.fetch_add(1)) < batch) {
      int count = std::min(in_count[b], n);
      std::vector<Sample> samples;
      samples.reserve(count);
      for (int i = 0; i < count; i++) {
        const float* bb = in_bbox + ((int64_t)b * n + i) * 4;
        // Sample.key: lower = better; candidates arrive sorted by pr desc
        samples.push_back({-in_pr[(int64_t)b * n + i],
                           bb[0], bb[1], bb[2], bb[3]});
      }
      if ((int)samples.size() > output_num && threshold < 1.0f)
        apply_cluster(samples, threshold, input_num, output_num);

      size_t m = std::min(samples.size(), (size_t)output_num);
      std::partial_sort(samples.begin(), samples.begin() + m, samples.end());
      for (size_t i = 0; i < m; i++) {
        float* ob = out_bbox + ((int64_t)b * output_num + i) * 4;
        ob[0] = samples[i].x0;
        ob[1] = samples[i].y0;
        ob[2] = samples[i].x1;
        ob[3] = samples[i].y1;
        out_pr[(int64_t)b * output_num + i] = -samples[i].key;
      }
      out_count[b] = (int)m;
    }
  };

  int hw = (int)std::thread::hardware_concurrency();
  int nt = std::max(1, std::min(hw, batch));
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

  auto iou = [](const Det& a, const Det& c) {
    Sample sa{0, a.x0, a.y0, a.x1, a.y1}, sc{0, c.x0, c.y0, c.x1, c.y1};
    return overlap_iou(sa, sc);
  };

  std::atomic<int> next(0);
  auto worker = [&]() {
    int b;
    while ((b = next.fetch_add(1)) < batch) {
      std::vector<Det> all;
      int nbbox = bbox_num[b];
      for (int cls = 0; cls < class_num; cls++) {
        std::vector<Det> dets;
        const float* pr_base = det_pr + ((int64_t)b * class_num_p1 + cls) * sn * sn;
        const float* fit_base = fitness + ((int64_t)b * class_num_p1 + cls) * sn * sn;
        int limit = std::min(nbbox, sn * sn);
        for (int i = 0; i < limit; i++) {
          if (pr_base[i] < log_pr_threshold) continue;
          const float* bb = bbox + ((int64_t)b * sn * sn + i) * 4;
          dets.push_back({fit_base[i], bb[0], bb[1], bb[2], bb[3], cls});
        }

        if (nms_threshold <= 0.0f || nms_threshold >= 1.0f || dets.empty()) {
          all.insert(all.end(), dets.begin(), dets.end());
          continue;
        }

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
                          [](const Det& a, const Det& c) {
                            return a.score > c.score;
                          });
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

  int hw = (int)std::thread::hardware_concurrency();
  int nt = std::max(1, std::min(hw, batch));
  if (nt == 1) {
    worker();
  } else {
    std::vector<std::thread> threads;
    for (int i = 0; i < nt; i++) threads.emplace_back(worker);
    for (auto& t : threads) t.join();
  }
}

}  // extern "C"
