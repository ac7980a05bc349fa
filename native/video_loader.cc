// Native video decode + augmentation core for the video_vae_tpu data pipeline.
//
// TPU-native replacement for the host-side hot loop of the reference pipeline
// (/root/reference/train/dataloader.py:148-240: per-worker Python OpenCV decode
// inside grain subprocesses). This library performs decode → random temporal
// window → shared random crop → resize → [0,1] normalize → zero-pad entirely
// in C++, released from the Python GIL, so a single-process thread pool can
// saturate host cores feeding the chips — no worker-process fleet, no IPC
// copies of decoded tensors.
//
// C API (ctypes-friendly). All buffers are caller-allocated.
//   vvt_load_video : one clip  -> out_video[max_frames*h*w*3] float32, out_mask[max_frames]
//   vvt_load_batch : n clips decoded on an internal thread pool
// Returns 0 on success; a negative error code on decode failure (the Python
// layer applies the configured zeros/skip/raise policy).

#include <atomic>
#include <cstdint>
#include <cstring>
#include <random>
#include <thread>
#include <vector>

#include <opencv2/core.hpp>
#include <opencv2/imgproc.hpp>
#include <opencv2/videoio.hpp>

namespace {

constexpr int kErrOpen = -1;
constexpr int kErrNoFrames = -2;
constexpr int kErrArgs = -3;

struct CropParams {
  int target_h, target_w;  // pre-crop resize target (upscale-if-small)
  int start_h, start_w;
};

// Mirrors get_random_crop_params semantics (shared crop across all frames,
// upscale first when the frame is smaller than the crop).
CropParams MakeCropParams(int h, int w, int crop, std::mt19937_64 &rng) {
  if (h < crop || w < crop) {
    double scale = std::max(static_cast<double>(crop) / h,
                            static_cast<double>(crop) / w);
    h = static_cast<int>(h * scale);
    w = static_cast<int>(w * scale);
  }
  std::uniform_int_distribution<int> dh(0, h - crop);
  std::uniform_int_distribution<int> dw(0, w - crop);
  return CropParams{h, w, dh(rng), dw(rng)};
}

int LoadVideoImpl(const char *path, int max_frames, int out_h, int out_w,
                  int crop, uint64_t seed, float *out_video, float *out_mask) {
  if (max_frames <= 0 || out_h <= 0 || out_w <= 0 || crop <= 0) return kErrArgs;
  cv::VideoCapture cap(path);
  if (!cap.isOpened()) return kErrOpen;

  std::mt19937_64 rng(seed);
  const auto total = static_cast<int>(cap.get(cv::CAP_PROP_FRAME_COUNT));
  if (total > max_frames) {
    std::uniform_int_distribution<int> dist(0, total - max_frames);
    cap.set(cv::CAP_PROP_POS_FRAMES, dist(rng));
  }

  const size_t frame_elems = static_cast<size_t>(out_h) * out_w * 3;
  bool have_crop = false;
  CropParams cp{};
  cv::Mat frame, resized, cropped, output;
  int count = 0;
  while (count < max_frames && cap.read(frame)) {
    if (frame.empty()) break;
    if (!have_crop) {
      cp = MakeCropParams(frame.rows, frame.cols, crop, rng);
      have_crop = true;
    }
    const cv::Mat *src = &frame;
    if (frame.rows != cp.target_h || frame.cols != cp.target_w) {
      cv::resize(frame, resized, cv::Size(cp.target_w, cp.target_h));
      src = &resized;
    }
    cropped = (*src)(cv::Rect(cp.start_w, cp.start_h, crop, crop));
    cv::resize(cropped, output, cv::Size(out_w, out_h));
    // BGR -> RGB + /255 normalize fused into one pass over the frame.
    float *dst = out_video + static_cast<size_t>(count) * frame_elems;
    const int rows = output.rows, cols = output.cols;
    for (int r = 0; r < rows; ++r) {
      const uint8_t *row = output.ptr<uint8_t>(r);
      float *drow = dst + static_cast<size_t>(r) * cols * 3;
      for (int c = 0; c < cols; ++c) {
        drow[c * 3 + 0] = row[c * 3 + 2] * (1.0f / 255.0f);
        drow[c * 3 + 1] = row[c * 3 + 1] * (1.0f / 255.0f);
        drow[c * 3 + 2] = row[c * 3 + 0] * (1.0f / 255.0f);
      }
    }
    ++count;
  }
  cap.release();
  if (count == 0) return kErrNoFrames;

  // Zero-pad the tail and write the validity mask.
  if (count < max_frames) {
    std::memset(out_video + static_cast<size_t>(count) * frame_elems, 0,
                (static_cast<size_t>(max_frames - count) * frame_elems) *
                    sizeof(float));
  }
  for (int t = 0; t < max_frames; ++t) out_mask[t] = t < count ? 1.0f : 0.0f;
  return 0;
}

}  // namespace

extern "C" {

int vvt_load_video(const char *path, int max_frames, int out_h, int out_w,
                   int crop, uint64_t seed, float *out_video, float *out_mask) {
  try {
    return LoadVideoImpl(path, max_frames, out_h, out_w, crop, seed, out_video,
                         out_mask);
  } catch (...) {
    return kErrOpen;
  }
}

// Decode n clips concurrently. errors[i] receives each clip's status; the
// return value is the count of failures.
int vvt_load_batch(const char **paths, int n, int max_frames, int out_h,
                   int out_w, int crop, const uint64_t *seeds,
                   float *out_videos, float *out_masks, int *errors,
                   int num_threads) {
  if (n <= 0) return 0;
  if (num_threads <= 0) num_threads = std::thread::hardware_concurrency();
  num_threads = std::max(1, std::min(num_threads, n));

  const size_t clip_elems =
      static_cast<size_t>(max_frames) * out_h * out_w * 3;
  std::atomic<int> next{0};
  std::atomic<int> failures{0};

  auto worker = [&]() {
    for (int i = next.fetch_add(1); i < n; i = next.fetch_add(1)) {
      int rc = vvt_load_video(paths[i], max_frames, out_h, out_w, crop,
                              seeds[i], out_videos + clip_elems * i,
                              out_masks + static_cast<size_t>(max_frames) * i);
      errors[i] = rc;
      if (rc != 0) failures.fetch_add(1);
    }
  };

  std::vector<std::thread> pool;
  pool.reserve(num_threads);
  for (int t = 0; t < num_threads; ++t) pool.emplace_back(worker);
  for (auto &th : pool) th.join();
  return failures.load();
}

}  // extern "C"
