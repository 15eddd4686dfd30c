// Native host data-loader: parallel image/mask decode + resize.
//
// The reference feeds Keras fit_generator from Python worker processes that
// imread + cv2.resize + run imgaug per item (SURVEY.md §3.5) — decode and
// resize are its host hot loop.  In the TPU-native design augmentation is
// on-device, so the ONLY host work left is decode+resize+stack; this module
// does that with a persistent C++ thread pool writing straight into the
// caller's batch buffer (no per-item Python objects, no pickling, no GIL in
// the hot path).
//
// Exposed as a tiny C ABI consumed via ctypes (no pybind11 in this image).

#include <opencv2/core.hpp>
#include <opencv2/imgcodecs.hpp>
#include <opencv2/imgproc.hpp>

#include <atomic>
#include <condition_variable>
#include <cstring>
#include <functional>
#include <mutex>
#include <queue>
#include <thread>
#include <vector>

namespace {

class ThreadPool {
 public:
  explicit ThreadPool(int n) : stop_(false) {
    for (int i = 0; i < n; ++i) {
      workers_.emplace_back([this] {
        for (;;) {
          std::function<void()> job;
          {
            std::unique_lock<std::mutex> lk(mu_);
            cv_.wait(lk, [this] { return stop_ || !jobs_.empty(); });
            if (stop_ && jobs_.empty()) return;
            job = std::move(jobs_.front());
            jobs_.pop();
          }
          job();
        }
      });
    }
  }

  ~ThreadPool() {
    {
      std::lock_guard<std::mutex> lk(mu_);
      stop_ = true;
    }
    cv_.notify_all();
    for (auto& w : workers_) w.join();
  }

  void submit(std::function<void()> job) {
    {
      std::lock_guard<std::mutex> lk(mu_);
      jobs_.push(std::move(job));
    }
    cv_.notify_one();
  }

 private:
  std::vector<std::thread> workers_;
  std::queue<std::function<void()>> jobs_;
  std::mutex mu_;
  std::condition_variable cv_;
  bool stop_;
};

struct Loader {
  explicit Loader(int n_threads)
      : pool(n_threads > 0 ? n_threads
                           : (int)std::thread::hardware_concurrency()) {}
  ThreadPool pool;
};

// Decode one image file into out (H*W*C u8, RGB or grayscale).
// Returns 0 on success.  Only C==1 and C==3 are supported (the Python
// binding enforces this; guard again here so a mismatch can never memcpy
// past the Mat's buffer).
int decode_image(const char* path, int H, int W, int C, unsigned char* out) {
  if (C != 1 && C != 3) return 1;
  cv::Mat img = cv::imread(path, cv::IMREAD_COLOR);
  if (img.empty()) return 1;
  if (img.rows != H || img.cols != W) {
    cv::resize(img, img, cv::Size(W, H), 0, 0, cv::INTER_LINEAR);
  }
  if (C == 1) {
    // match the Python path (prepare_image): UNWEIGHTED channel mean,
    // not ITU-R luma — training/inference must see identical pixels
    cv::Mat f;
    img.convertTo(f, CV_32FC3);
    cv::Mat chans[3];
    cv::split(f, chans);
    cv::Mat mean = (chans[0] + chans[1] + chans[2]) / 3.0f;
    mean.convertTo(img, CV_8UC1);
  } else {
    cv::cvtColor(img, img, cv::COLOR_BGR2RGB);
  }
  if (img.channels() != C) return 1;
  if (!img.isContinuous()) img = img.clone();
  std::memcpy(out, img.data, (size_t)H * W * C);
  return 0;
}

// Decode one mask file (grayscale, nearest resize) into out (H*W u8).
int decode_mask(const char* path, int H, int W, unsigned char* out) {
  cv::Mat m = cv::imread(path, cv::IMREAD_GRAYSCALE);
  if (m.empty()) return 1;
  if (m.rows != H || m.cols != W) {
    cv::resize(m, m, cv::Size(W, H), 0, 0, cv::INTER_NEAREST);
  }
  if (!m.isContinuous()) m = m.clone();
  std::memcpy(out, m.data, (size_t)H * W);
  return 0;
}

}  // namespace

extern "C" {

void* stp_loader_create(int n_threads) { return new Loader(n_threads); }

void stp_loader_destroy(void* loader) { delete (Loader*)loader; }

// Fill out_imgs (n,H,W,C u8) and out_masks (n,H,W u8; skipped when
// mask_paths null or entry null).  Returns the number of failed items.
int stp_load_batch(void* loader, const char** img_paths,
                   const char** mask_paths, int n, int H, int W, int C,
                   unsigned char* out_imgs, unsigned char* out_masks) {
  Loader* L = (Loader*)loader;
  std::atomic<int> failures{0};
  std::atomic<int> done{0};
  std::mutex mu;
  std::condition_variable cv;

  for (int i = 0; i < n; ++i) {
    L->pool.submit([&, i] {
      unsigned char* img_dst = out_imgs + (size_t)i * H * W * C;
      if (decode_image(img_paths[i], H, W, C, img_dst)) failures++;
      if (mask_paths && mask_paths[i] && out_masks) {
        unsigned char* m_dst = out_masks + (size_t)i * H * W;
        if (decode_mask(mask_paths[i], H, W, m_dst)) failures++;
      } else if (out_masks) {
        std::memset(out_masks + (size_t)i * H * W, 0, (size_t)H * W);
      }
      if (++done == n) {
        std::lock_guard<std::mutex> lk(mu);
        cv.notify_one();
      }
    });
  }
  std::unique_lock<std::mutex> lk(mu);
  cv.wait(lk, [&] { return done.load() == n; });
  return failures.load();
}

}  // extern "C"
