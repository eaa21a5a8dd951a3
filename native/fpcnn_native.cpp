// Native runtime components for fastposecnn_tpu.
//
// The reference's native layer is a CUDA extension (ransac_voting) plus
// CuPy-backed connected components; on TPU the compute path moved into
// XLA/Pallas, so the native layer here serves the *host runtime* instead:
//   - libpng-based image decode (color/mask/16-bit depth) for the data
//     loader, bypassing Python imaging overhead;
//   - union-find connected-component labeling (4-connectivity) used by the
//     offline data tools and as a CPU reference implementation
//     (semantics of scipy.ndimage.label: labels 1..n ordered by first
//     row-major pixel);
//   - fused decode+normalize producing ready-to-upload float32 NHWC
//     tensors (ImageNet mean/std).
//
// Exposed as a plain C ABI consumed via ctypes (no pybind11 in this image).

#include <png.h>

#include <atomic>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <thread>
#include <vector>

extern "C" {

// ---------------------------------------------------------------------------
// PNG decode

// Decodes any PNG into an 8- or 16-bit buffer. Returns 0 on success.
// The caller provides `out` sized w*h*channels*(bitdepth/8); call
// fpcnn_png_info first to size it.
int fpcnn_png_info(const char* path, int* w, int* h, int* channels,
                   int* bitdepth) {
  FILE* fp = fopen(path, "rb");
  if (!fp) return 1;
  png_structp png =
      png_create_read_struct(PNG_LIBPNG_VER_STRING, nullptr, nullptr, nullptr);
  png_infop info = png_create_info_struct(png);
  if (setjmp(png_jmpbuf(png))) {
    png_destroy_read_struct(&png, &info, nullptr);
    fclose(fp);
    return 2;
  }
  png_init_io(png, fp);
  png_read_info(png, info);
  *w = png_get_image_width(png, info);
  *h = png_get_image_height(png, info);
  *channels = png_get_channels(png, info);
  *bitdepth = png_get_bit_depth(png, info);
  png_destroy_read_struct(&png, &info, nullptr);
  fclose(fp);
  return 0;
}

int fpcnn_png_decode(const char* path, uint8_t* out, int expect_w,
                     int expect_h, int expect_channels, int expect_bitdepth) {
  FILE* fp = fopen(path, "rb");
  if (!fp) return 1;
  png_structp png =
      png_create_read_struct(PNG_LIBPNG_VER_STRING, nullptr, nullptr, nullptr);
  png_infop info = png_create_info_struct(png);
  if (setjmp(png_jmpbuf(png))) {
    png_destroy_read_struct(&png, &info, nullptr);
    fclose(fp);
    return 2;
  }
  png_init_io(png, fp);
  png_read_info(png, info);
  int w = png_get_image_width(png, info);
  int h = png_get_image_height(png, info);
  if (png_get_bit_depth(png, info) < 8) png_set_expand(png);
  if (png_get_color_type(png, info) == PNG_COLOR_TYPE_PALETTE)
    png_set_palette_to_rgb(png);
  png_read_update_info(png, info);
  int channels = png_get_channels(png, info);
  int bitdepth = png_get_bit_depth(png, info);
  if (w != expect_w || h != expect_h || channels != expect_channels ||
      bitdepth != expect_bitdepth) {
    png_destroy_read_struct(&png, &info, nullptr);
    fclose(fp);
    return 3;
  }
  size_t stride = (size_t)w * channels * (bitdepth / 8);
  std::vector<png_bytep> rows(h);
  for (int y = 0; y < h; ++y) rows[y] = out + y * stride;
  png_read_image(png, rows.data());
  png_destroy_read_struct(&png, &info, nullptr);
  fclose(fp);
  // libpng emits 16-bit samples big-endian; convert to host (little) order.
  if (bitdepth == 16) {
    size_t n = (size_t)w * h * channels;
    for (size_t i = 0; i < n; ++i) {
      uint8_t hi = out[2 * i];
      out[2 * i] = out[2 * i + 1];
      out[2 * i + 1] = hi;
    }
  }
  return 0;
}

// Decode an RGB(A) color PNG straight into ImageNet-normalized float32 NHWC.
int fpcnn_decode_normalize(const char* path, float* out, int expect_w,
                           int expect_h) {
  int w, h, c, bd;
  if (fpcnn_png_info(path, &w, &h, &c, &bd)) return 1;
  if (w != expect_w || h != expect_h || bd != 8 || (c != 3 && c != 4))
    return 3;
  std::vector<uint8_t> buf((size_t)w * h * c);
  int rc = fpcnn_png_decode(path, buf.data(), w, h, c, 8);
  if (rc) return rc;
  static const float kMean[3] = {0.485f, 0.456f, 0.406f};
  static const float kStd[3] = {0.229f, 0.224f, 0.225f};
  const size_t n = (size_t)w * h;
  for (size_t i = 0; i < n; ++i) {
    for (int ch = 0; ch < 3; ++ch) {
      float v = buf[i * c + ch] * (1.0f / 255.0f);
      out[i * 3 + ch] = (v - kMean[ch]) / kStd[ch];
    }
  }
  return 0;
}

// ---------------------------------------------------------------------------
// Connected components (union-find, 4-connectivity)

namespace {
struct UnionFind {
  std::vector<int32_t> parent;
  explicit UnionFind(size_t n) : parent(n) {
    for (size_t i = 0; i < n; ++i) parent[i] = (int32_t)i;
  }
  int32_t find(int32_t x) {
    while (parent[x] != x) {
      parent[x] = parent[parent[x]];  // path halving
      x = parent[x];
    }
    return x;
  }
  void unite(int32_t a, int32_t b) {
    a = find(a);
    b = find(b);
    if (a == b) return;
    if (a < b)
      parent[b] = a;  // keep the smaller (earlier row-major) root
    else
      parent[a] = b;
  }
};
}  // namespace

// fg: h*w uint8 (0/1). labels_out: h*w int32, 0 = background, components
// numbered 1..n in scipy.ndimage.label order. Returns n.
int fpcnn_cc_label(const uint8_t* fg, int h, int w, int32_t* labels_out) {
  UnionFind uf((size_t)h * w);
  for (int y = 0; y < h; ++y) {
    const uint8_t* row = fg + (size_t)y * w;
    for (int x = 0; x < w; ++x) {
      if (!row[x]) continue;
      int32_t idx = y * w + x;
      if (x > 0 && row[x - 1]) uf.unite(idx, idx - 1);
      if (y > 0 && fg[idx - w]) uf.unite(idx, idx - w);
    }
  }
  // Compact roots to 1..n by first-occurrence (row-major) order.
  int next = 0;
  std::vector<int32_t> remap((size_t)h * w, 0);
  for (int32_t i = 0; i < h * w; ++i) {
    if (!fg[i]) {
      labels_out[i] = 0;
      continue;
    }
    int32_t root = uf.find(i);
    if (remap[root] == 0) remap[root] = ++next;
    labels_out[i] = remap[root];
  }
  return next;
}

// Batched version with a worker-thread pool: fg [b, h, w], labels [b, h, w],
// counts [b].
void fpcnn_cc_label_batch(const uint8_t* fg, int b, int h, int w,
                          int32_t* labels_out, int32_t* counts_out,
                          int num_threads) {
  if (num_threads < 1) num_threads = 1;
  std::atomic<int> next(0);
  auto worker = [&]() {
    int i;
    while ((i = next.fetch_add(1)) < b) {
      counts_out[i] = fpcnn_cc_label(fg + (size_t)i * h * w, h, w,
                                     labels_out + (size_t)i * h * w);
    }
  };
  std::vector<std::thread> threads;
  for (int t = 0; t < num_threads; ++t) threads.emplace_back(worker);
  for (auto& t : threads) t.join();
}

}  // extern "C"
