// splatloc_io — native IO runtime for splatloc_tpu.
//
// The reference delegates its host-side heavy lifting to native code
// (CUDA submodules, torch DataLoader C++ workers). This library is the
// TPU framework's equivalent for the host runtime: libpng image decode,
// bulk binary PLY IO, and a threaded read-ahead frame loader that keeps
// the accelerator fed during scene mapping. Exposed via a C ABI and
// consumed through ctypes (no pybind11 in this environment).
//
// Build: g++ -O3 -shared -fPIC splatloc_io.cpp -lpng -lz -lpthread
//        -o libsplatloc_io.so

#include <png.h>

#include <atomic>
#include <condition_variable>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <map>
#include <mutex>
#include <string>
#include <thread>
#include <vector>

namespace {

struct PngImage {
  int width = 0;
  int height = 0;
  int channels = 0;
  int bit_depth = 0;
  std::vector<uint8_t> data;  // row-major, native channel order
};

bool read_png(const char* path, PngImage* out) {
  FILE* fp = std::fopen(path, "rb");
  if (!fp) return false;
  png_structp png =
      png_create_read_struct(PNG_LIBPNG_VER_STRING, nullptr, nullptr, nullptr);
  if (!png) {
    std::fclose(fp);
    return false;
  }
  png_infop info = png_create_info_struct(png);
  if (!info || setjmp(png_jmpbuf(png))) {
    png_destroy_read_struct(&png, &info, nullptr);
    std::fclose(fp);
    return false;
  }
  png_init_io(png, fp);
  png_read_info(png, info);

  out->width = png_get_image_width(png, info);
  out->height = png_get_image_height(png, info);
  out->bit_depth = png_get_bit_depth(png, info);
  png_byte color = png_get_color_type(png, info);

  if (color == PNG_COLOR_TYPE_PALETTE) png_set_palette_to_rgb(png);
  if (color == PNG_COLOR_TYPE_GRAY && out->bit_depth < 8)
    png_set_expand_gray_1_2_4_to_8(png);
  if (png_get_valid(png, info, PNG_INFO_tRNS)) png_set_tRNS_to_alpha(png);
  // 16-bit stays 16-bit (depth maps); PNG is big-endian on disk
  if (out->bit_depth == 16) png_set_swap(png);
  png_read_update_info(png, info);

  out->channels = png_get_channels(png, info);
  out->bit_depth = png_get_bit_depth(png, info);
  size_t rowbytes = png_get_rowbytes(png, info);
  out->data.resize(rowbytes * out->height);
  std::vector<png_bytep> rows(out->height);
  for (int y = 0; y < out->height; ++y)
    rows[y] = out->data.data() + y * rowbytes;
  png_read_image(png, rows.data());
  png_read_end(png, nullptr);
  png_destroy_read_struct(&png, &info, nullptr);
  std::fclose(fp);
  return true;
}

}  // namespace

extern "C" {

// ---------------------------------------------------------------------------
// PNG
// ---------------------------------------------------------------------------

int sl_png_info(const char* path, int* w, int* h, int* channels,
                int* bit_depth) {
  PngImage img;
  if (!read_png(path, &img)) return -1;
  *w = img.width;
  *h = img.height;
  *channels = img.channels;
  *bit_depth = img.bit_depth;
  return 0;
}

// Decode an 8-bit PNG into out[h*w*3] RGB (alpha dropped, gray broadcast).
int sl_png_read_rgb8(const char* path, uint8_t* out, int w, int h) {
  PngImage img;
  if (!read_png(path, &img)) return -1;
  if (img.width != w || img.height != h || img.bit_depth != 8) return -2;
  const uint8_t* src = img.data.data();
  int c = img.channels;
  for (int i = 0; i < w * h; ++i) {
    if (c >= 3) {
      out[3 * i] = src[c * i];
      out[3 * i + 1] = src[c * i + 1];
      out[3 * i + 2] = src[c * i + 2];
    } else {
      out[3 * i] = out[3 * i + 1] = out[3 * i + 2] = src[c * i];
    }
  }
  return 0;
}

// Decode a 16-bit grayscale PNG (depth in mm) into out[h*w].
int sl_png_read_u16(const char* path, uint16_t* out, int w, int h) {
  PngImage img;
  if (!read_png(path, &img)) return -1;
  if (img.width != w || img.height != h || img.bit_depth != 16 ||
      img.channels != 1)
    return -2;
  std::memcpy(out, img.data.data(), sizeof(uint16_t) * w * h);
  return 0;
}

// ---------------------------------------------------------------------------
// PLY (binary_little_endian, all-float32 vertex properties)
// ---------------------------------------------------------------------------

// Parse header. Returns vertex count, property count; property names are
// packed '\n'-separated into names_buf.
long long sl_ply_read_header(const char* path, int* n_props, char* names_buf,
                             int names_cap, long long* data_offset) {
  FILE* fp = std::fopen(path, "rb");
  if (!fp) return -1;
  char line[512];
  long long n_verts = -1;
  int props = 0;
  std::string names;
  bool binary_le = false;
  while (std::fgets(line, sizeof(line), fp)) {
    std::string s(line);
    if (s.rfind("format binary_little_endian", 0) == 0) binary_le = true;
    if (s.rfind("element vertex", 0) == 0)
      n_verts = std::atoll(s.c_str() + 15);
    if (s.rfind("property float", 0) == 0 || s.rfind("property f4", 0) == 0) {
      size_t sp = s.rfind(' ');
      std::string name = s.substr(sp + 1);
      while (!name.empty() && (name.back() == '\n' || name.back() == '\r'))
        name.pop_back();
      names += name + "\n";
      props++;
    }
    if (s.rfind("end_header", 0) == 0) break;
  }
  *data_offset = std::ftell(fp);
  std::fclose(fp);
  if (!binary_le || n_verts < 0) return -2;
  if ((int)names.size() + 1 > names_cap) return -3;
  std::memcpy(names_buf, names.c_str(), names.size() + 1);
  *n_props = props;
  return n_verts;
}

// Bulk-read the vertex block: out must hold n_verts*n_props floats.
int sl_ply_read_f32(const char* path, long long data_offset, float* out,
                    long long count) {
  FILE* fp = std::fopen(path, "rb");
  if (!fp) return -1;
  std::fseek(fp, data_offset, SEEK_SET);
  size_t got = std::fread(out, sizeof(float), count, fp);
  std::fclose(fp);
  return got == (size_t)count ? 0 : -2;
}

int sl_ply_write_f32(const char* path, const char* names_nl, int n_props,
                     const float* data, long long n_verts) {
  FILE* fp = std::fopen(path, "wb");
  if (!fp) return -1;
  std::fprintf(fp, "ply\nformat binary_little_endian 1.0\n");
  std::fprintf(fp, "element vertex %lld\n", n_verts);
  std::string names(names_nl);
  size_t pos = 0;
  for (int i = 0; i < n_props; ++i) {
    size_t nl = names.find('\n', pos);
    std::fprintf(fp, "property float %s\n",
                 names.substr(pos, nl - pos).c_str());
    pos = nl + 1;
  }
  std::fprintf(fp, "end_header\n");
  size_t wrote = std::fwrite(data, sizeof(float), n_verts * n_props, fp);
  std::fclose(fp);
  return wrote == (size_t)(n_verts * n_props) ? 0 : -2;
}

// ---------------------------------------------------------------------------
// Threaded read-ahead RGB-D frame loader
// ---------------------------------------------------------------------------

struct Frame {
  std::vector<uint8_t> rgb;
  std::vector<uint16_t> depth;
  bool ok = false;
};

struct Loader {
  std::vector<std::string> rgb_paths, depth_paths;
  int w = 0, h = 0;
  int ahead = 0;
  std::map<int, Frame> ready;
  std::mutex mu;
  std::condition_variable cv;
  std::atomic<int> next_to_schedule{0};
  std::atomic<bool> stop{false};
  int consumed = 0;
  std::vector<std::thread> workers;

  void worker() {
    while (!stop.load()) {
      int idx = next_to_schedule.fetch_add(1);
      if (idx >= (int)rgb_paths.size()) return;
      // bounded read-ahead
      {
        std::unique_lock<std::mutex> lk(mu);
        cv.wait(lk, [&] { return stop.load() || idx < consumed + ahead; });
        if (stop.load()) return;
      }
      Frame f;
      f.rgb.resize((size_t)w * h * 3);
      f.depth.resize((size_t)w * h);
      f.ok = sl_png_read_rgb8(rgb_paths[idx].c_str(), f.rgb.data(), w, h) == 0
             && sl_png_read_u16(depth_paths[idx].c_str(), f.depth.data(), w,
                                h) == 0;
      {
        std::lock_guard<std::mutex> lk(mu);
        ready.emplace(idx, std::move(f));
      }
      cv.notify_all();
    }
  }
};

void* sl_loader_create(const char** rgb_paths, const char** depth_paths,
                       int n, int w, int h, int n_threads, int read_ahead) {
  auto* L = new Loader();
  for (int i = 0; i < n; ++i) {
    L->rgb_paths.emplace_back(rgb_paths[i]);
    L->depth_paths.emplace_back(depth_paths[i]);
  }
  L->w = w;
  L->h = h;
  L->ahead = read_ahead;
  for (int t = 0; t < n_threads; ++t)
    L->workers.emplace_back(&Loader::worker, L);
  return L;
}

// Blocking fetch of frame idx (frames must be consumed in order for the
// read-ahead window to advance; out-of-order gets still work).
int sl_loader_get(void* handle, int idx, uint8_t* rgb_out,
                  uint16_t* depth_out) {
  auto* L = static_cast<Loader*>(handle);
  std::unique_lock<std::mutex> lk(L->mu);
  // advance the read-ahead window far enough that idx can be produced even
  // when frames are fetched out of order
  if (idx - L->ahead + 1 > L->consumed) L->consumed = idx - L->ahead + 1;
  L->cv.notify_all();
  L->cv.wait(lk, [&] { return L->ready.count(idx) > 0; });
  Frame f = std::move(L->ready[idx]);
  L->ready.erase(idx);
  if (idx + 1 > L->consumed) L->consumed = idx + 1;
  lk.unlock();
  L->cv.notify_all();
  if (!f.ok) return -1;
  std::memcpy(rgb_out, f.rgb.data(), f.rgb.size());
  std::memcpy(depth_out, f.depth.data(),
              f.depth.size() * sizeof(uint16_t));
  return 0;
}

void sl_loader_destroy(void* handle) {
  auto* L = static_cast<Loader*>(handle);
  L->stop.store(true);
  L->cv.notify_all();
  for (auto& t : L->workers) t.join();
  delete L;
}

}  // extern "C"
