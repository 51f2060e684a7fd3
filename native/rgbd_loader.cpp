// Native RGB-D dataset loader: threaded PNG decode + bounded prefetch ring.
//
// Capability parity: the reference's input path is native C++ (roscpp
// message_filters + cv_bridge image decoding feeding the SLAM thread,
// reference: src/openni_listener.cpp:139-217,743-860). This is the
// framework's equivalent: a C++ loader that decodes TUM rgb (8-bit RGB) and
// depth (16-bit grayscale) PNGs on worker threads and hands frames to Python
// through a lock-free-ish bounded ring, keeping the single host core free
// for dispatching TPU work.
//
// C API (ctypes): loader_create / loader_next / loader_destroy plus
// single-shot decode_rgb_png / decode_depth_png.
//
// Build: g++ -O3 -shared -fPIC rgbd_loader.cpp -o librgbd_loader.so -lpng -lpthread

#include <png.h>

#include <atomic>
#include <condition_variable>
#include <cstdint>
#include <cstring>
#include <mutex>
#include <queue>
#include <string>
#include <thread>
#include <vector>

namespace {

struct Frame {
  int index = -1;
  std::vector<uint8_t> rgb;     // H*W*3
  std::vector<uint16_t> depth;  // H*W
  bool ok = false;
};

bool decode_png(const char* path, int expect_w, int expect_h, bool want_rgb,
                std::vector<uint8_t>* rgb, std::vector<uint16_t>* depth) {
  FILE* fp = fopen(path, "rb");
  if (!fp) return false;
  png_structp png =
      png_create_read_struct(PNG_LIBPNG_VER_STRING, nullptr, nullptr, nullptr);
  if (!png) {
    fclose(fp);
    return false;
  }
  png_infop info = png_create_info_struct(png);
  if (!info || setjmp(png_jmpbuf(png))) {
    png_destroy_read_struct(&png, &info, nullptr);
    fclose(fp);
    return false;
  }
  png_init_io(png, fp);
  png_read_info(png, info);
  const int w = png_get_image_width(png, info);
  const int h = png_get_image_height(png, info);
  const int depth_bits = png_get_bit_depth(png, info);
  const int color = png_get_color_type(png, info);
  if ((expect_w && w != expect_w) || (expect_h && h != expect_h)) {
    png_destroy_read_struct(&png, &info, nullptr);
    fclose(fp);
    return false;
  }
  bool ok = true;
  if (want_rgb) {
    // normalize to 8-bit RGB
    if (color == PNG_COLOR_TYPE_PALETTE) png_set_palette_to_rgb(png);
    if (color == PNG_COLOR_TYPE_GRAY || color == PNG_COLOR_TYPE_GRAY_ALPHA)
      png_set_gray_to_rgb(png);
    if (depth_bits == 16) png_set_strip_16(png);
    png_set_strip_alpha(png);
    png_read_update_info(png, info);
    rgb->resize(static_cast<size_t>(w) * h * 3);
    std::vector<png_bytep> rows(h);
    for (int y = 0; y < h; ++y) rows[y] = rgb->data() + static_cast<size_t>(y) * w * 3;
    png_read_image(png, rows.data());
  } else {
    // 16-bit grayscale depth (TUM convention, big-endian in PNG)
    if (color != PNG_COLOR_TYPE_GRAY || depth_bits != 16) {
      ok = false;
    } else {
      png_set_swap(png);  // PNG is big-endian; host is little-endian
      png_read_update_info(png, info);
      depth->resize(static_cast<size_t>(w) * h);
      std::vector<png_bytep> rows(h);
      for (int y = 0; y < h; ++y)
        rows[y] = reinterpret_cast<png_bytep>(depth->data() + static_cast<size_t>(y) * w);
      png_read_image(png, rows.data());
    }
  }
  png_destroy_read_struct(&png, &info, nullptr);
  fclose(fp);
  return ok;
}

struct Loader {
  int width, height;
  std::vector<std::string> rgb_paths, depth_paths;
  size_t next_submit = 0;  // next frame index a worker may claim
  size_t next_emit = 0;    // next frame index Python expects
  size_t capacity;
  std::mutex mu;
  std::condition_variable cv_worker, cv_reader;
  std::vector<Frame> ready;  // out-of-order completion buffer
  std::atomic<bool> stop{false};
  std::vector<std::thread> workers;

  Loader(int w, int h, size_t cap) : width(w), height(h), capacity(cap) {}

  void worker() {
    while (true) {
      size_t idx;
      {
        std::unique_lock<std::mutex> lk(mu);
        cv_worker.wait(lk, [&] {
          return stop.load() ||
                 (next_submit < rgb_paths.size() &&
                  next_submit < next_emit + capacity);
        });
        if (stop.load()) return;
        idx = next_submit++;
      }
      Frame f;
      f.index = static_cast<int>(idx);
      f.ok = decode_png(rgb_paths[idx].c_str(), width, height, true, &f.rgb,
                        nullptr) &&
             decode_png(depth_paths[idx].c_str(), width, height, false,
                        nullptr, &f.depth);
      {
        std::unique_lock<std::mutex> lk(mu);
        ready.push_back(std::move(f));
        cv_reader.notify_all();
      }
    }
  }

  // Blocking: copy frame `next_emit` into the caller's buffers.
  int next(uint8_t* rgb_out, uint16_t* depth_out) {
    std::unique_lock<std::mutex> lk(mu);
    if (next_emit >= rgb_paths.size()) return -1;
    const size_t want = next_emit;
    cv_reader.wait(lk, [&] {
      for (auto& f : ready)
        if (static_cast<size_t>(f.index) == want) return true;
      return false;
    });
    for (size_t k = 0; k < ready.size(); ++k) {
      if (static_cast<size_t>(ready[k].index) == want) {
        Frame f = std::move(ready[k]);
        ready.erase(ready.begin() + k);
        ++next_emit;
        cv_worker.notify_all();
        if (!f.ok) return -2;
        std::memcpy(rgb_out, f.rgb.data(), f.rgb.size());
        std::memcpy(depth_out, f.depth.data(), f.depth.size() * 2);
        return f.index;
      }
    }
    return -3;  // unreachable
  }
};

}  // namespace

extern "C" {

void* loader_create(const char** rgb_paths, const char** depth_paths, int n,
                    int width, int height, int n_threads, int queue_depth) {
  auto* L = new Loader(width, height, static_cast<size_t>(queue_depth));
  L->rgb_paths.assign(rgb_paths, rgb_paths + n);
  L->depth_paths.assign(depth_paths, depth_paths + n);
  for (int t = 0; t < n_threads; ++t)
    L->workers.emplace_back([L] { L->worker(); });
  return L;
}

int loader_next(void* handle, uint8_t* rgb_out, uint16_t* depth_out) {
  return static_cast<Loader*>(handle)->next(rgb_out, depth_out);
}

void loader_destroy(void* handle) {
  auto* L = static_cast<Loader*>(handle);
  L->stop.store(true);
  L->cv_worker.notify_all();
  for (auto& t : L->workers) t.join();
  delete L;
}

int decode_rgb_png(const char* path, uint8_t* out, int width, int height) {
  std::vector<uint8_t> rgb;
  if (!decode_png(path, width, height, true, &rgb, nullptr)) return -1;
  std::memcpy(out, rgb.data(), rgb.size());
  return 0;
}

int decode_depth_png(const char* path, uint16_t* out, int width, int height) {
  std::vector<uint16_t> d;
  if (!decode_png(path, width, height, false, nullptr, &d)) return -1;
  std::memcpy(out, d.data(), d.size() * 2);
  return 0;
}

}  // extern "C"
