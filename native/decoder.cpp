// Native frame decoder — the data-loader hot path in C++.
//
// The reference's loader spends its host time in Python/PIL decode across
// nThreads worker processes (SURVEY.md §2.3). Here the equivalent is a
// C++ thread-pooled PNG/JPEG decode + bilinear resize behind a C ABI,
// bound via ctypes (ir2rgb_tpu/data/native.py), feeding the on-device
// augmentation pipeline with ready uint8 batches.
//
// API (C ABI):
//   i2r_decode_resize(path, out_h, out_w, gray, out)       -> 0 | errno
//   i2r_decode_batch(paths, n, out_h, out_w, gray, threads, out) -> #fail
//
// Output layout: HWC uint8, RGB (C=3) or grayscale (C=1), row-major,
// bilinear-resized with half-pixel centers (matches PIL.BILINEAR closely;
// exact-match is not required — training augmentation follows on device).

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <csetjmp>
#include <string>
#include <thread>
#include <vector>
#include <atomic>

#include <jpeglib.h>
#include <png.h>

namespace {

struct Image {
  std::vector<uint8_t> data;  // HWC, C = channels
  int h = 0, w = 0, c = 0;
};

// ---------------------------------------------------------------- PNG ----

bool decode_png(FILE* f, Image* im) {
  png_structp png =
      png_create_read_struct(PNG_LIBPNG_VER_STRING, nullptr, nullptr, nullptr);
  if (!png) return false;
  png_infop info = png_create_info_struct(png);
  if (!info) {
    png_destroy_read_struct(&png, nullptr, nullptr);
    return false;
  }
  if (setjmp(png_jmpbuf(png))) {
    png_destroy_read_struct(&png, &info, nullptr);
    return false;
  }
  png_init_io(png, f);
  png_read_info(png, info);

  png_uint_32 w = png_get_image_width(png, info);
  png_uint_32 h = png_get_image_height(png, info);
  int bit_depth = png_get_bit_depth(png, info);
  int color_type = png_get_color_type(png, info);

  // normalize everything to 8-bit RGB
  if (bit_depth == 16) png_set_strip_16(png);
  if (color_type == PNG_COLOR_TYPE_PALETTE) png_set_palette_to_rgb(png);
  if (color_type == PNG_COLOR_TYPE_GRAY && bit_depth < 8)
    png_set_expand_gray_1_2_4_to_8(png);
  if (png_get_valid(png, info, PNG_INFO_tRNS)) png_set_tRNS_to_alpha(png);
  if (color_type == PNG_COLOR_TYPE_GRAY ||
      color_type == PNG_COLOR_TYPE_GRAY_ALPHA)
    png_set_gray_to_rgb(png);
  // tRNS_to_alpha (and PNG_EXPAND on palettes with a tRNS chunk) emits a
  // 4th channel even when the ORIGINAL color_type had no alpha mask — the
  // strip must cover that case too, or png_read_image writes w*4-byte
  // rows into the w*3-sized buffer below (heap overflow).
  if ((color_type & PNG_COLOR_MASK_ALPHA) ||
      png_get_valid(png, info, PNG_INFO_tRNS))
    png_set_strip_alpha(png);
  png_read_update_info(png, info);
  if (png_get_channels(png, info) != 3 ||
      png_get_rowbytes(png, info) != size_t(w) * 3) {
    // defensive: never read rows wider than the buffer we size
    png_destroy_read_struct(&png, &info, nullptr);
    return false;
  }

  im->h = static_cast<int>(h);
  im->w = static_cast<int>(w);
  im->c = 3;
  im->data.resize(size_t(h) * w * 3);
  std::vector<png_bytep> rows(h);
  for (png_uint_32 y = 0; y < h; ++y)
    rows[y] = im->data.data() + size_t(y) * w * 3;
  png_read_image(png, rows.data());
  png_destroy_read_struct(&png, &info, nullptr);
  return true;
}

// --------------------------------------------------------------- JPEG ----

struct JpegErr {
  jpeg_error_mgr mgr;
  jmp_buf jb;
};

void jpeg_err_exit(j_common_ptr cinfo) {
  JpegErr* err = reinterpret_cast<JpegErr*>(cinfo->err);
  longjmp(err->jb, 1);
}

bool decode_jpeg(FILE* f, Image* im) {
  jpeg_decompress_struct cinfo;
  JpegErr jerr;
  cinfo.err = jpeg_std_error(&jerr.mgr);
  jerr.mgr.error_exit = jpeg_err_exit;
  if (setjmp(jerr.jb)) {
    jpeg_destroy_decompress(&cinfo);
    return false;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_stdio_src(&cinfo, f);
  jpeg_read_header(&cinfo, TRUE);
  cinfo.out_color_space = JCS_RGB;
  jpeg_start_decompress(&cinfo);
  im->h = cinfo.output_height;
  im->w = cinfo.output_width;
  im->c = 3;
  im->data.resize(size_t(im->h) * im->w * 3);
  while (cinfo.output_scanline < cinfo.output_height) {
    JSAMPROW row =
        im->data.data() + size_t(cinfo.output_scanline) * im->w * 3;
    jpeg_read_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  return true;
}

// Decode a JPEG already in memory (an MJPEG/AVI frame payload — the
// data/video.py input path hands byte ranges out of the container).
bool decode_jpeg_mem(const uint8_t* buf, unsigned long nbytes, Image* im) {
  jpeg_decompress_struct cinfo;
  JpegErr jerr;
  cinfo.err = jpeg_std_error(&jerr.mgr);
  jerr.mgr.error_exit = jpeg_err_exit;
  if (setjmp(jerr.jb)) {
    jpeg_destroy_decompress(&cinfo);
    return false;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_mem_src(&cinfo, const_cast<unsigned char*>(buf), nbytes);
  jpeg_read_header(&cinfo, TRUE);
  cinfo.out_color_space = JCS_RGB;
  jpeg_start_decompress(&cinfo);
  im->h = cinfo.output_height;
  im->w = cinfo.output_width;
  im->c = 3;
  im->data.resize(size_t(im->h) * im->w * 3);
  while (cinfo.output_scanline < cinfo.output_height) {
    JSAMPROW row =
        im->data.data() + size_t(cinfo.output_scanline) * im->w * 3;
    jpeg_read_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  return true;
}

// ------------------------------------------------------------- resize ----

// bilinear, half-pixel centers, RGB in -> (gray ? 1 : 3) channels out
void resize_bilinear(const Image& src, int out_h, int out_w, int gray,
                     uint8_t* out) {
  const int oc = gray ? 1 : 3;
  const float sy = float(src.h) / out_h;
  const float sx = float(src.w) / out_w;
  for (int y = 0; y < out_h; ++y) {
    float fy = (y + 0.5f) * sy - 0.5f;
    int y0 = fy < 0 ? 0 : int(fy);
    if (y0 > src.h - 1) y0 = src.h - 1;
    int y1 = y0 + 1 < src.h ? y0 + 1 : src.h - 1;
    float ty = fy - y0;
    if (ty < 0) ty = 0;
    for (int x = 0; x < out_w; ++x) {
      float fx = (x + 0.5f) * sx - 0.5f;
      int x0 = fx < 0 ? 0 : int(fx);
      if (x0 > src.w - 1) x0 = src.w - 1;
      int x1 = x0 + 1 < src.w ? x0 + 1 : src.w - 1;
      float tx = fx - x0;
      if (tx < 0) tx = 0;
      float rgb[3];
      for (int ch = 0; ch < 3; ++ch) {
        float a = src.data[(size_t(y0) * src.w + x0) * 3 + ch];
        float b = src.data[(size_t(y0) * src.w + x1) * 3 + ch];
        float c = src.data[(size_t(y1) * src.w + x0) * 3 + ch];
        float d = src.data[(size_t(y1) * src.w + x1) * 3 + ch];
        float top = a + (b - a) * tx;
        float bot = c + (d - c) * tx;
        rgb[ch] = top + (bot - top) * ty;
      }
      uint8_t* dst = out + (size_t(y) * out_w + x) * oc;
      if (gray) {
        // ITU-R 601 luma, matching PIL convert("L")
        float l = 0.299f * rgb[0] + 0.587f * rgb[1] + 0.114f * rgb[2];
        dst[0] = uint8_t(l + 0.5f);
      } else {
        dst[0] = uint8_t(rgb[0] + 0.5f);
        dst[1] = uint8_t(rgb[1] + 0.5f);
        dst[2] = uint8_t(rgb[2] + 0.5f);
      }
    }
  }
}

// -------------------------------------------------------------- encode ----

// Write an HWC uint8 buffer (c = 1 or 3) as PNG. Compression level 1:
// these are serve-loop outputs and training galleries — encode speed
// beats file size on the hot path.
bool encode_png(const char* path, const uint8_t* data, int h, int w, int c) {
  if (c != 1 && c != 3) return false;
  FILE* f = std::fopen(path, "wb");
  if (!f) return false;
  png_structp png =
      png_create_write_struct(PNG_LIBPNG_VER_STRING, nullptr, nullptr,
                              nullptr);
  if (!png) {
    std::fclose(f);
    return false;
  }
  png_infop info = png_create_info_struct(png);
  if (!info) {
    png_destroy_write_struct(&png, nullptr);
    std::fclose(f);
    return false;
  }
  if (setjmp(png_jmpbuf(png))) {
    png_destroy_write_struct(&png, &info);
    std::fclose(f);
    return false;
  }
  png_init_io(png, f);
  png_set_compression_level(png, 1);
  png_set_IHDR(png, info, w, h, 8,
               c == 1 ? PNG_COLOR_TYPE_GRAY : PNG_COLOR_TYPE_RGB,
               PNG_INTERLACE_NONE, PNG_COMPRESSION_TYPE_DEFAULT,
               PNG_FILTER_TYPE_DEFAULT);
  png_write_info(png, info);
  std::vector<png_bytep> rows(h);
  for (int y = 0; y < h; ++y)
    rows[y] = const_cast<png_bytep>(data + size_t(y) * w * c);
  png_write_image(png, rows.data());
  png_write_end(png, nullptr);
  png_destroy_write_struct(&png, &info);
  std::fclose(f);
  return true;
}

// ---------------------------------------------------------- id maps ----
//
// Instance/semantic id maps (pix2pixHD --instance_feat / --label_nc) need
// the file's NATIVE id space — the RGB normalization above is wrong for
// them: a gray PNG's ids are its raw 8/16-bit values, a palette PNG's ids
// are the palette INDICES (PIL mode "P" semantics), and only true-RGB
// files fold r*65536 + g*256 + b. Resize is NEAREST — ids never blend.

bool decode_png_ids(FILE* f, std::vector<int32_t>* data, int* out_h,
                    int* out_w) {
  png_structp png =
      png_create_read_struct(PNG_LIBPNG_VER_STRING, nullptr, nullptr, nullptr);
  if (!png) return false;
  png_infop info = png_create_info_struct(png);
  if (!info) {
    png_destroy_read_struct(&png, nullptr, nullptr);
    return false;
  }
  if (setjmp(png_jmpbuf(png))) {
    png_destroy_read_struct(&png, &info, nullptr);
    return false;
  }
  png_init_io(png, f);
  png_read_info(png, info);

  png_uint_32 w = png_get_image_width(png, info);
  png_uint_32 h = png_get_image_height(png, info);
  int bit_depth = png_get_bit_depth(png, info);
  int color_type = png_get_color_type(png, info);

  // keep palette indices and 16-bit gray values intact; expand sub-byte
  // packing so every sample is at least one byte
  if (bit_depth < 8) png_set_packing(png);
  if (color_type & PNG_COLOR_MASK_ALPHA) png_set_strip_alpha(png);
  png_read_update_info(png, info);
  const int channels = png_get_channels(png, info);
  const int depth = png_get_bit_depth(png, info);
  const size_t rowbytes = png_get_rowbytes(png, info);

  std::vector<uint8_t> raw(size_t(h) * rowbytes);
  std::vector<png_bytep> rows(h);
  for (png_uint_32 y = 0; y < h; ++y)
    rows[y] = raw.data() + size_t(y) * rowbytes;
  png_read_image(png, rows.data());
  png_destroy_read_struct(&png, &info, nullptr);

  *out_h = static_cast<int>(h);
  *out_w = static_cast<int>(w);
  data->resize(size_t(h) * w);
  const bool rgb = (color_type == PNG_COLOR_TYPE_RGB ||
                    color_type == PNG_COLOR_TYPE_RGB_ALPHA);
  for (png_uint_32 y = 0; y < h; ++y) {
    const uint8_t* row = raw.data() + size_t(y) * rowbytes;
    int32_t* dst = data->data() + size_t(y) * w;
    for (png_uint_32 x = 0; x < w; ++x) {
      if (rgb) {  // fold 24-bit RGB ids (PIL ndim==3 path)
        const uint8_t* p = row + size_t(x) * channels;
        dst[x] = int32_t(p[0]) * 65536 + int32_t(p[1]) * 256 + p[2];
      } else if (depth == 16) {  // PNG 16-bit is big-endian
        const uint8_t* p = row + size_t(x) * 2 * channels;
        dst[x] = (int32_t(p[0]) << 8) | p[1];
      } else {  // 8-bit gray value or palette index
        dst[x] = row[size_t(x) * channels];
      }
    }
  }
  return true;
}

// PIL-NEAREST mapping: src = floor((dst + 0.5) * scale)
void resize_nearest_ids(const int32_t* src, int sh, int sw, int oh, int ow,
                        int32_t* out) {
  const double sy = double(sh) / oh;
  const double sx = double(sw) / ow;
  std::vector<int> xmap(ow);
  for (int x = 0; x < ow; ++x) {
    int v = int((x + 0.5) * sx);
    xmap[x] = v < sw ? v : sw - 1;
  }
  for (int y = 0; y < oh; ++y) {
    int yy = int((y + 0.5) * sy);
    if (yy >= sh) yy = sh - 1;
    const int32_t* srow = src + size_t(yy) * sw;
    int32_t* drow = out + size_t(y) * ow;
    for (int x = 0; x < ow; ++x) drow[x] = srow[xmap[x]];
  }
}

// Deliver a decoded RGB image at the target geometry/channels: memcpy /
// luma-convert when already sized (the pre-sized-dataset common case),
// bilinear otherwise. Shared by the file and in-memory decode entries.
void emit_resized(const Image& im, int out_h, int out_w, int gray,
                  uint8_t* out) {
  if (im.h == out_h && im.w == out_w) {
    if (!gray) {
      std::memcpy(out, im.data.data(), size_t(out_h) * out_w * 3);
    } else {
      const uint8_t* src = im.data.data();
      for (size_t i = 0, n = size_t(out_h) * out_w; i < n; ++i) {
        const uint8_t* p = src + i * 3;
        float l = 0.299f * p[0] + 0.587f * p[1] + 0.114f * p[2];
        out[i] = uint8_t(l + 0.5f);
      }
    }
    return;
  }
  resize_bilinear(im, out_h, out_w, gray, out);
}

bool decode_file(const char* path, Image* im) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return false;
  unsigned char magic[8] = {0};
  size_t got = std::fread(magic, 1, 8, f);
  std::rewind(f);
  bool ok = false;
  if (got >= 8 && !png_sig_cmp(magic, 0, 8)) {
    ok = decode_png(f, im);
  } else if (got >= 2 && magic[0] == 0xFF && magic[1] == 0xD8) {
    ok = decode_jpeg(f, im);
  }
  std::fclose(f);
  return ok;
}

}  // namespace

extern "C" {

// Decode one image and bilinear-resize into out (out_h*out_w*(gray?1:3)).
// Returns 0 on success, 1 on failure.
int i2r_decode_resize(const char* path, int out_h, int out_w, int gray,
                      uint8_t* out) {
  Image im;
  if (!decode_file(path, &im) || im.h == 0 || im.w == 0) return 1;
  emit_resized(im, out_h, out_w, gray, out);
  return 0;
}

// Decode one in-memory JPEG (MJPEG/AVI frame) and deliver at the target
// geometry. Returns 0 on success, 1 on failure.
int i2r_decode_jpeg_mem(const uint8_t* buf, long nbytes, int out_h,
                        int out_w, int gray, uint8_t* out) {
  Image im;
  if (nbytes <= 0 ||
      !decode_jpeg_mem(buf, (unsigned long)nbytes, &im) ||
      im.h == 0 || im.w == 0)
    return 1;
  emit_resized(im, out_h, out_w, gray, out);
  return 0;
}

// Thread-pooled batch decode of JPEG byte ranges inside one blob (the
// frames of an MJPEG AVI read in a single pass): blob + offsets[n] +
// sizes[n] -> out (n, out_h, out_w, C) uint8. Returns the number of
// failed decodes (their slots are zeroed).
int i2r_decode_jpeg_mem_batch(const uint8_t* blob, const long* offsets,
                              const long* sizes, int n, int out_h,
                              int out_w, int gray, int threads,
                              uint8_t* out) {
  const size_t stride = size_t(out_h) * out_w * (gray ? 1 : 3);
  std::atomic<int> next(0), failures(0);
  auto worker = [&]() {
    for (;;) {
      int i = next.fetch_add(1);
      if (i >= n) return;
      uint8_t* slot = out + size_t(i) * stride;
      if (i2r_decode_jpeg_mem(blob + offsets[i], sizes[i], out_h, out_w,
                              gray, slot) != 0) {
        std::memset(slot, 0, stride);
        failures.fetch_add(1);
      }
    }
  };
  int t = threads > 0 ? threads : int(std::thread::hardware_concurrency());
  if (t < 1) t = 1;
  if (t > n) t = n;
  std::vector<std::thread> pool;
  pool.reserve(t);
  for (int i = 0; i < t; ++i) pool.emplace_back(worker);
  for (auto& th : pool) th.join();
  return failures.load();
}

// Thread-pooled batch decode: paths[n] -> out (n, out_h, out_w, C) uint8.
// Returns the number of failed decodes (their slots are zeroed).
int i2r_decode_batch(const char** paths, int n, int out_h, int out_w,
                     int gray, int threads, uint8_t* out) {
  const size_t stride = size_t(out_h) * out_w * (gray ? 1 : 3);
  std::atomic<int> next(0), failures(0);
  auto worker = [&]() {
    for (;;) {
      int i = next.fetch_add(1);
      if (i >= n) return;
      uint8_t* slot = out + size_t(i) * stride;
      if (i2r_decode_resize(paths[i], out_h, out_w, gray, slot) != 0) {
        std::memset(slot, 0, stride);
        failures.fetch_add(1);
      }
    }
  };
  int t = threads > 0 ? threads : int(std::thread::hardware_concurrency());
  if (t < 1) t = 1;
  if (t > n) t = n;
  std::vector<std::thread> pool;
  pool.reserve(t);
  for (int i = 0; i < t; ++i) pool.emplace_back(worker);
  for (auto& th : pool) th.join();
  return failures.load();
}

// Decode one PNG id map and NEAREST-resize into out (out_h*out_w int32).
// Non-PNG files return 1 (caller falls back to PIL — id maps in lossy
// formats are degenerate anyway). 0 on success.
int i2r_decode_ids(const char* path, int out_h, int out_w, int32_t* out) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return 1;
  unsigned char magic[8] = {0};
  size_t got = std::fread(magic, 1, 8, f);
  std::rewind(f);
  if (got < 8 || png_sig_cmp(magic, 0, 8)) {
    std::fclose(f);
    return 1;
  }
  std::vector<int32_t> ids;
  int h = 0, w = 0;
  bool ok = decode_png_ids(f, &ids, &h, &w);
  std::fclose(f);
  if (!ok || h == 0 || w == 0) return 1;
  if (h == out_h && w == out_w) {
    std::memcpy(out, ids.data(), size_t(h) * w * sizeof(int32_t));
  } else {
    resize_nearest_ids(ids.data(), h, w, out_h, out_w, out);
  }
  return 0;
}

// Thread-pooled batch id decode: paths[n] -> out (n, out_h, out_w) int32.
// Returns the number of failures (their slots are zeroed).
int i2r_decode_ids_batch(const char** paths, int n, int out_h, int out_w,
                         int threads, int32_t* out) {
  const size_t stride = size_t(out_h) * out_w;
  std::atomic<int> next(0), failures(0);
  auto worker = [&]() {
    for (;;) {
      int i = next.fetch_add(1);
      if (i >= n) return;
      int32_t* slot = out + size_t(i) * stride;
      if (i2r_decode_ids(paths[i], out_h, out_w, slot) != 0) {
        std::memset(slot, 0, stride * sizeof(int32_t));
        failures.fetch_add(1);
      }
    }
  };
  int t = threads > 0 ? threads : int(std::thread::hardware_concurrency());
  if (t < 1) t = 1;
  if (t > n) t = n;
  std::vector<std::thread> pool;
  pool.reserve(t);
  for (int i = 0; i < t; ++i) pool.emplace_back(worker);
  for (auto& th : pool) th.join();
  return failures.load();
}

// Encode one HWC uint8 image (c = 1 or 3) to PNG. 0 on success.
int i2r_encode_png(const char* path, const uint8_t* data, int h, int w,
                   int c) {
  return encode_png(path, data, h, w, c) ? 0 : 1;
}

// Encode one HWC uint8 image (c = 1 or 3) as a JFIF JPEG into a
// caller-provided buffer (the MJPEG/AVI writer assembles the container
// in Python around these frames). Returns the byte count written, or
// -1 on error / buffer too small. Thread-safe (no shared state).
long i2r_encode_jpeg_mem(const uint8_t* data, int h, int w, int c,
                         int quality, uint8_t* out, long out_cap) {
  if (c != 1 && c != 3) return -1;
  jpeg_compress_struct cinfo;
  jpeg_error_mgr jerr;
  cinfo.err = jpeg_std_error(&jerr);
  jerr.error_exit = [](j_common_ptr ci) { longjmp(*(jmp_buf*)ci->client_data, 1); };
  jmp_buf env;
  cinfo.client_data = &env;
  jpeg_create_compress(&cinfo);
  unsigned char* mem = nullptr;
  unsigned long mem_size = 0;
  if (setjmp(env)) {
    jpeg_destroy_compress(&cinfo);
    if (mem) free(mem);
    return -1;
  }
  // jpeg_mem_dest allocates/grows its own buffer; copy out afterwards
  jpeg_mem_dest(&cinfo, &mem, &mem_size);
  cinfo.image_width = w;
  cinfo.image_height = h;
  cinfo.input_components = c;
  cinfo.in_color_space = (c == 3) ? JCS_RGB : JCS_GRAYSCALE;
  jpeg_set_defaults(&cinfo);
  jpeg_set_quality(&cinfo, quality, TRUE);
  jpeg_start_compress(&cinfo, TRUE);
  const size_t stride = size_t(w) * c;
  while (cinfo.next_scanline < cinfo.image_height) {
    JSAMPROW row = const_cast<uint8_t*>(data + cinfo.next_scanline * stride);
    jpeg_write_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_compress(&cinfo);
  jpeg_destroy_compress(&cinfo);
  long n = long(mem_size);
  if (n > out_cap) {
    free(mem);
    return -1;
  }
  memcpy(out, mem, size_t(n));
  free(mem);
  return n;
}

// Thread-pooled batch encode: data is (n, h, w, c) uint8 contiguous.
// Returns the number of failed writes.
int i2r_encode_png_batch(const char** paths, const uint8_t* data, int n,
                         int h, int w, int c, int threads) {
  const size_t stride = size_t(h) * w * c;
  std::atomic<int> next(0), failures(0);
  auto worker = [&]() {
    for (;;) {
      int i = next.fetch_add(1);
      if (i >= n) return;
      if (!encode_png(paths[i], data + size_t(i) * stride, h, w, c))
        failures.fetch_add(1);
    }
  };
  int t = threads > 0 ? threads : int(std::thread::hardware_concurrency());
  if (t < 1) t = 1;
  if (t > n) t = n;
  std::vector<std::thread> pool;
  pool.reserve(t);
  for (int i = 0; i < t; ++i) pool.emplace_back(worker);
  for (auto& th : pool) th.join();
  return failures.load();
}

}  // extern "C"
