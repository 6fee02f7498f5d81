// canvas_loader: threaded JPEG -> RGB canvas batch decoder.
//
// Native replacement for the reference's DataLoader-worker cv2.imread path
// (datasets/coco.py:58-69): decodes a batch of JPEG files in a persistent
// thread pool (no GIL, no per-image Python allocation) and pastes each image
// at the origin of a fixed square uint8 canvas slot -- the exact layout the
// device-side affine warp consumes (simple_pose_tpu/data/pipeline.py).
//
// C API (ctypes-friendly):
//   void* cl_create(int num_threads);
//   void  cl_destroy(void* pool);
//   int   cl_load_batch(void* pool, const char** paths, int n, int canvas,
//                       unsigned char* out,   // [n, canvas, canvas, 3], zeroed by callee
//                       int* heights, int* widths);  // decoded dims (0 on failure)
//   Returns the number of successfully decoded images.
//
// Build: g++ -O2 -fPIC -shared canvas_loader.cc -o libcanvas_loader.so -ljpeg -lpthread

#include <cstddef>
#include <cstdio>

#include <jpeglib.h>

#include <atomic>
#include <condition_variable>
#include <csetjmp>
#include <cstdio>
#include <cstring>
#include <functional>
#include <mutex>
#include <queue>
#include <thread>
#include <vector>

namespace {

struct ErrorMgr {
  jpeg_error_mgr pub;
  jmp_buf setjmp_buffer;
};

void error_exit(j_common_ptr cinfo) {
  ErrorMgr* err = reinterpret_cast<ErrorMgr*>(cinfo->err);
  longjmp(err->setjmp_buffer, 1);
}

// Decode one JPEG file into canvas slot (RGB, pasted at origin, cropped to
// the canvas if larger).  Returns true on success and sets h/w.
bool decode_into_canvas(const char* path, int canvas, unsigned char* slot, int* h, int* w) {
  *h = *w = 0;
  FILE* f = std::fopen(path, "rb");
  if (!f) return false;

  jpeg_decompress_struct cinfo;
  ErrorMgr jerr;
  cinfo.err = jpeg_std_error(&jerr.pub);
  jerr.pub.error_exit = error_exit;
  if (setjmp(jerr.setjmp_buffer)) {
    jpeg_destroy_decompress(&cinfo);
    std::fclose(f);
    return false;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_stdio_src(&cinfo, f);
  jpeg_read_header(&cinfo, TRUE);
  cinfo.out_color_space = JCS_RGB;  // grayscale/CMYK promoted to RGB
  jpeg_start_decompress(&cinfo);

  const int width = static_cast<int>(cinfo.output_width);
  const int height = static_cast<int>(cinfo.output_height);
  const int copy_w = width < canvas ? width : canvas;
  const int copy_h = height < canvas ? height : canvas;

  std::vector<unsigned char> row(static_cast<size_t>(width) * 3);
  JSAMPROW rowp = row.data();
  int y = 0;
  while (cinfo.output_scanline < cinfo.output_height) {
    jpeg_read_scanlines(&cinfo, &rowp, 1);
    if (y < copy_h) {
      std::memcpy(slot + static_cast<size_t>(y) * canvas * 3, row.data(),
                  static_cast<size_t>(copy_w) * 3);
    }
    ++y;
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  std::fclose(f);
  *h = height;
  *w = width;
  return true;
}

class ThreadPool {
 public:
  explicit ThreadPool(int n) : stop_(false) {
    for (int i = 0; i < n; ++i) {
      workers_.emplace_back([this] {
        for (;;) {
          std::function<void()> task;
          {
            std::unique_lock<std::mutex> lock(mu_);
            cv_.wait(lock, [this] { return stop_ || !tasks_.empty(); });
            if (stop_ && tasks_.empty()) return;
            task = std::move(tasks_.front());
            tasks_.pop();
          }
          task();
        }
      });
    }
  }

  ~ThreadPool() {
    {
      std::lock_guard<std::mutex> lock(mu_);
      stop_ = true;
    }
    cv_.notify_all();
    for (auto& t : workers_) t.join();
  }

  void submit(std::function<void()> task) {
    {
      std::lock_guard<std::mutex> lock(mu_);
      tasks_.push(std::move(task));
    }
    cv_.notify_one();
  }

 private:
  std::vector<std::thread> workers_;
  std::queue<std::function<void()>> tasks_;
  std::mutex mu_;
  std::condition_variable cv_;
  bool stop_;
};

}  // namespace

extern "C" {

void* cl_create(int num_threads) {
  if (num_threads < 1) num_threads = 1;
  return new ThreadPool(num_threads);
}

void cl_destroy(void* pool) { delete static_cast<ThreadPool*>(pool); }

int cl_load_batch(void* pool_ptr, const char** paths, int n, int canvas,
                  unsigned char* out, int* heights, int* widths) {
  ThreadPool* pool = static_cast<ThreadPool*>(pool_ptr);
  const size_t slot_bytes = static_cast<size_t>(canvas) * canvas * 3;
  std::atomic<int> ok_count{0};
  std::atomic<int> done{0};
  std::mutex done_mu;
  std::condition_variable done_cv;

  for (int i = 0; i < n; ++i) {
    pool->submit([&, i] {
      int h = 0, w = 0;
      if (decode_into_canvas(paths[i], canvas, out + slot_bytes * i, &h, &w)) {
        ok_count.fetch_add(1);
      }
      heights[i] = h;
      widths[i] = w;
      if (done.fetch_add(1) + 1 == n) {
        std::lock_guard<std::mutex> lock(done_mu);
        done_cv.notify_all();
      }
    });
  }
  std::unique_lock<std::mutex> lock(done_mu);
  done_cv.wait(lock, [&] { return done.load() == n; });
  return ok_count.load();
}

}  // extern "C"
