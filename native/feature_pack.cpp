// Feature-pack batch sampler: the native data-loader of the training input
// pipeline.
//
// The reference feeds training through torch DataLoader workers that np.load
// a pickled dict per image and run python loops for keypoint->label mapping
// and inlier/outlier sampling (dataset/basicdataset.py:167-330). Here all
// per-image features live in one mmapped "feature pack" (built once by
// pram_tpu/data/feature_pack.py, with labels precomputed), and this library
// assembles fixed-shape training batches directly into caller-provided numpy
// buffers: token sampling, jittered-copy padding and shuffling run as
// multithreaded C++, so the host pipeline keeps a TPU step fed without a
// python worker pool.
//
// Sampling semantics mirror BasicDataset.get_item_train
// (dataset/basicdataset.py:197-262):
//   - if n_inliers <= min_inliers: keep all inliers + random outliers
//   - else: target uniform(min_inliers, max_inliers) inliers (clamped), rest
//     outliers
//   - shuffle; pad short samples with +-5px jittered copies of labeled
//     keypoints, random scores.
//
// Exposed as a C ABI for ctypes (no pybind11 in this image).

#include <algorithm>
#include <cstdint>
#include <cstring>
#include <random>
#include <thread>
#include <vector>

namespace {

struct PackView {
  // borrowed pointers into the python-owned mmapped pack
  const int64_t* offsets;   // [n_images + 1] keypoint row offsets
  const float* kpts;        // [total, 2]
  const float* scores;      // [total]
  const int32_t* seg;       // [total] precomputed labels (0 = background)
  const float* desc;        // [total, desc_dim] or nullptr
  int64_t n_images;
  int64_t desc_dim;
};

struct SampleArgs {
  int64_t nfeatures;
  int64_t min_inliers;
  int64_t max_inliers;
  uint64_t seed;
};

void sample_one(const PackView& pack, const SampleArgs& a, int64_t image_idx,
                uint64_t item_seed, float* out_kpts, float* out_scores,
                int32_t* out_seg, float* out_desc) {
  std::mt19937_64 rng(item_seed);
  const int64_t begin = pack.offsets[image_idx];
  const int64_t end = pack.offsets[image_idx + 1];
  const int64_t n = end - begin;
  const int64_t nf = a.nfeatures;

  std::vector<int64_t> inliers, outliers;
  inliers.reserve(n);
  outliers.reserve(n);
  for (int64_t i = begin; i < end; ++i) {
    (pack.seg[i] > 0 ? inliers : outliers).push_back(i);
  }
  std::shuffle(inliers.begin(), inliers.end(), rng);
  std::shuffle(outliers.begin(), outliers.end(), rng);

  std::vector<int64_t> sel;
  sel.reserve(nf);
  const int64_t n_in = static_cast<int64_t>(inliers.size());
  const int64_t n_out = static_cast<int64_t>(outliers.size());
  if (n_in <= a.min_inliers) {
    sel.assign(inliers.begin(), inliers.end());
    const int64_t take = std::min(n_out, nf - n_in);
    sel.insert(sel.end(), outliers.begin(), outliers.begin() + std::max<int64_t>(take, 0));
  } else {
    std::uniform_int_distribution<int64_t> dist(a.min_inliers,
                                                a.max_inliers - 1);
    int64_t sel_in = std::min(dist(rng), n_in);
    if (sel_in + n_out < nf) sel_in = std::min(nf - n_out, n_in);
    const int64_t sel_out = std::min(nf - sel_in, n_out);
    sel.assign(inliers.begin(), inliers.begin() + sel_in);
    sel.insert(sel.end(), outliers.begin(), outliers.begin() + sel_out);
  }
  if (static_cast<int64_t>(sel.size()) > nf) sel.resize(nf);
  std::shuffle(sel.begin(), sel.end(), rng);

  const int64_t n_sel = static_cast<int64_t>(sel.size());
  for (int64_t k = 0; k < n_sel; ++k) {
    const int64_t i = sel[k];
    out_kpts[2 * k] = pack.kpts[2 * i];
    out_kpts[2 * k + 1] = pack.kpts[2 * i + 1];
    out_scores[k] = pack.scores[i];
    out_seg[k] = pack.seg[i];
    if (out_desc && pack.desc) {
      std::memcpy(out_desc + k * pack.desc_dim, pack.desc + i * pack.desc_dim,
                  sizeof(float) * pack.desc_dim);
    }
  }

  // pad with jittered copies of labeled (fallback: any) selected keypoints
  if (n_sel < nf) {
    std::vector<int64_t> valid;
    for (int64_t k = 0; k < n_sel; ++k)
      if (out_seg[k] > 0) valid.push_back(k);
    if (valid.empty())
      for (int64_t k = 0; k < n_sel; ++k) valid.push_back(k);

    std::uniform_int_distribution<int> jitter(-5, 4);
    std::uniform_real_distribution<float> uscore(0.f, 1.f);
    std::uniform_int_distribution<int64_t> pick(0,
        static_cast<int64_t>(valid.size()) - 1);
    for (int64_t k = n_sel; k < nf; ++k) {
      const int64_t src_pos = static_cast<int64_t>(k - n_sel);
      const int64_t ref = (src_pos < static_cast<int64_t>(valid.size()))
                              ? valid[src_pos]
                              : valid[pick(rng)];
      out_kpts[2 * k] = out_kpts[2 * ref] + jitter(rng);
      out_kpts[2 * k + 1] = out_kpts[2 * ref + 1] + jitter(rng);
      out_scores[k] = uscore(rng);
      out_seg[k] = out_seg[ref];
      if (out_desc && pack.desc) {
        std::memcpy(out_desc + k * pack.desc_dim,
                    out_desc + ref * pack.desc_dim,
                    sizeof(float) * pack.desc_dim);
      }
    }
  }
}

}  // namespace

extern "C" {

// Assemble one fixed-shape batch. Buffers are caller-allocated:
//   out_kpts [B, nfeatures, 2] f32; out_scores [B, nfeatures] f32;
//   out_seg [B, nfeatures] i32; out_desc [B, nfeatures, desc_dim] f32 or null.
// Returns 0 on success.
int fp_sample_batch(const int64_t* offsets, const float* kpts,
                    const float* scores, const int32_t* seg, const float* desc,
                    int64_t n_images, int64_t desc_dim,
                    const int64_t* image_indices, int64_t batch,
                    int64_t nfeatures, int64_t min_inliers,
                    int64_t max_inliers, uint64_t seed, int64_t n_threads,
                    float* out_kpts, float* out_scores, int32_t* out_seg,
                    float* out_desc) {
  PackView pack{offsets, kpts, scores, seg, desc, n_images, desc_dim};
  SampleArgs args{nfeatures, min_inliers, std::min(max_inliers, nfeatures),
                  seed};

  auto work = [&](int64_t start, int64_t step) {
    for (int64_t b = start; b < batch; b += step) {
      const int64_t img = image_indices[b];
      if (img < 0 || img >= n_images) continue;
      sample_one(pack, args, img, seed * 0x9E3779B97F4A7C15ULL + b,
                 out_kpts + b * nfeatures * 2, out_scores + b * nfeatures,
                 out_seg + b * nfeatures,
                 out_desc ? out_desc + b * nfeatures * desc_dim : nullptr);
    }
  };

  const int64_t nt = std::max<int64_t>(1, std::min<int64_t>(n_threads, batch));
  if (nt == 1) {
    work(0, 1);
  } else {
    std::vector<std::thread> threads;
    threads.reserve(nt);
    for (int64_t t = 0; t < nt; ++t) threads.emplace_back(work, t, nt);
    for (auto& th : threads) th.join();
  }
  return 0;
}

}  // extern "C"
