// Native bundle I/O: minimal PNG codec + threaded batch ingest.
//
// The reference delegates image I/O to PIL's C internals per file
// (/root/reference/compositor.py:25-35); at fleet scale (64-bundle x
// 4-ratio sweeps) host-side PNG decode becomes the ingest bottleneck.
// This library provides:
//   - png_decode_rgba:  8-bit RGB/RGBA/gray(+alpha), non-interlaced PNGs
//                       -> tightly packed RGBA8
//   - png_encode_rgba:  RGBA8 -> PNG (filter 0, configurable zlib level)
//   - png_batch_decode_into_padded: decode N files directly into one
//       zero-padded uint8 [N, Hpad, Wpad, 4] tensor (the device-ready
//       BundleArrays layout) using a thread per file up to HW concurrency.
//
// Exposed with a C ABI for ctypes (no pybind11 in this image); Python
// wrapper: image_transformation_tpu/core/native_io.py (PIL fallback).
//
// Build: make -C native   (g++ -O2 -shared -fPIC png_io.cpp -lz)

#include <zlib.h>

#include <atomic>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <string>
#include <thread>
#include <vector>

namespace {

constexpr uint8_t kPngSig[8] = {0x89, 'P', 'N', 'G', '\r', '\n', 0x1A, '\n'};

uint32_t be32(const uint8_t* p) {
  return (uint32_t(p[0]) << 24) | (uint32_t(p[1]) << 16) |
         (uint32_t(p[2]) << 8) | uint32_t(p[3]);
}

void put_be32(uint8_t* p, uint32_t v) {
  p[0] = uint8_t(v >> 24);
  p[1] = uint8_t(v >> 16);
  p[2] = uint8_t(v >> 8);
  p[3] = uint8_t(v);
}

int paeth(int a, int b, int c) {
  int p = a + b - c;
  int pa = p > a ? p - a : a - p;
  int pb = p > b ? p - b : b - p;
  int pc = p > c ? p - c : c - p;
  if (pa <= pb && pa <= pc) return a;
  if (pb <= pc) return b;
  return c;
}

bool read_file(const char* path, std::vector<uint8_t>* out) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return false;
  std::fseek(f, 0, SEEK_END);
  long n = std::ftell(f);
  std::fseek(f, 0, SEEK_SET);
  if (n <= 0) {
    std::fclose(f);
    return false;
  }
  out->resize(size_t(n));
  size_t got = std::fread(out->data(), 1, size_t(n), f);
  std::fclose(f);
  return got == size_t(n);
}

struct PngImage {
  uint32_t width = 0;
  uint32_t height = 0;
  std::vector<uint8_t> rgba;  // H*W*4
};

// Decode an 8-bit non-interlaced PNG (color types 0, 2, 3, 4, 6;
// palette tRNS applied; gray/truecolor color-key tRNS falls back) to RGBA.
bool decode_png(const uint8_t* data, size_t size, PngImage* img) {
  if (size < 8 || std::memcmp(data, kPngSig, 8) != 0) return false;
  size_t pos = 8;
  uint32_t width = 0, height = 0;
  int bit_depth = 0, color_type = -1, interlace = -1;
  std::vector<uint8_t> idat;
  // Palette (color type 3) + optional tRNS.
  std::vector<uint8_t> palette;  // 3 bytes per entry
  std::vector<uint8_t> trns;

  while (pos + 8 <= size) {
    uint32_t len = be32(data + pos);
    const uint8_t* type = data + pos + 4;
    if (pos + 12 + len > size) return false;
    const uint8_t* body = data + pos + 8;
    if (!std::memcmp(type, "IHDR", 4)) {
      if (len < 13) return false;
      width = be32(body);
      height = be32(body + 4);
      bit_depth = body[8];
      color_type = body[9];
      interlace = body[12];
      if (bit_depth != 8 || interlace != 0) return false;
      if (color_type != 0 && color_type != 2 && color_type != 3 &&
          color_type != 4 && color_type != 6)
        return false;
    } else if (!std::memcmp(type, "PLTE", 4)) {
      palette.assign(body, body + len);
    } else if (!std::memcmp(type, "tRNS", 4)) {
      trns.assign(body, body + len);
    } else if (!std::memcmp(type, "IDAT", 4)) {
      idat.insert(idat.end(), body, body + len);
    } else if (!std::memcmp(type, "IEND", 4)) {
      break;
    }
    pos += 12 + len;
  }
  if (width == 0 || height == 0 || idat.empty()) return false;
  // Reject absurd declared dimensions before allocating: a corrupt or
  // malicious header must fail into the PIL fallback, not throw
  // bad_alloc across the C ABI (process abort) or OOM the host.
  if (uint64_t(width) * uint64_t(height) > (uint64_t(1) << 28)) return false;
  // Color-key transparency (tRNS on gray/truecolor) is not implemented:
  // decoding it as opaque would silently diverge from PIL's RGBA convert,
  // so those files take the bit-exact PIL fallback instead.
  if (!trns.empty() && (color_type == 0 || color_type == 2)) return false;

  int channels;
  switch (color_type) {
    case 0: channels = 1; break;
    case 2: channels = 3; break;
    case 3: channels = 1; break;
    case 4: channels = 2; break;
    case 6: channels = 4; break;
    default: return false;
  }
  const size_t stride = size_t(width) * channels;
  std::vector<uint8_t> raw((stride + 1) * height);
  uLongf raw_len = uLongf(raw.size());
  if (uncompress(raw.data(), &raw_len, idat.data(), uLong(idat.size())) != Z_OK ||
      raw_len != raw.size())
    return false;

  // Unfilter in place into a scanline buffer.
  std::vector<uint8_t> cur(stride, 0), prev(stride, 0);
  img->width = width;
  img->height = height;
  img->rgba.resize(size_t(width) * height * 4);
  const int bpp = channels;
  for (uint32_t y = 0; y < height; ++y) {
    const uint8_t* line = raw.data() + size_t(y) * (stride + 1);
    uint8_t filter = line[0];
    const uint8_t* src = line + 1;
    switch (filter) {
      case 0:
        std::memcpy(cur.data(), src, stride);
        break;
      case 1:
        for (size_t i = 0; i < stride; ++i)
          cur[i] = uint8_t(src[i] + (i >= size_t(bpp) ? cur[i - bpp] : 0));
        break;
      case 2:
        for (size_t i = 0; i < stride; ++i) cur[i] = uint8_t(src[i] + prev[i]);
        break;
      case 3:
        for (size_t i = 0; i < stride; ++i) {
          int left = i >= size_t(bpp) ? cur[i - bpp] : 0;
          cur[i] = uint8_t(src[i] + ((left + prev[i]) >> 1));
        }
        break;
      case 4:
        for (size_t i = 0; i < stride; ++i) {
          int left = i >= size_t(bpp) ? cur[i - bpp] : 0;
          int up_left = i >= size_t(bpp) ? prev[i - bpp] : 0;
          cur[i] = uint8_t(src[i] + paeth(left, prev[i], up_left));
        }
        break;
      default:
        return false;
    }
    // Expand scanline to RGBA.
    uint8_t* dst = img->rgba.data() + size_t(y) * width * 4;
    for (uint32_t x = 0; x < width; ++x) {
      const uint8_t* px = cur.data() + size_t(x) * channels;
      switch (color_type) {
        case 0:
          dst[0] = dst[1] = dst[2] = px[0];
          dst[3] = 255;
          break;
        case 2:
          dst[0] = px[0]; dst[1] = px[1]; dst[2] = px[2]; dst[3] = 255;
          break;
        case 3: {
          size_t idx = size_t(px[0]) * 3;
          if (idx + 2 >= palette.size()) return false;
          dst[0] = palette[idx];
          dst[1] = palette[idx + 1];
          dst[2] = palette[idx + 2];
          dst[3] = px[0] < trns.size() ? trns[px[0]] : 255;
          break;
        }
        case 4:
          dst[0] = dst[1] = dst[2] = px[0];
          dst[3] = px[1];
          break;
        case 6:
          dst[0] = px[0]; dst[1] = px[1]; dst[2] = px[2]; dst[3] = px[3];
          break;
      }
      dst += 4;
    }
    std::swap(cur, prev);
  }
  return true;
}

void append_chunk(std::vector<uint8_t>* out, const char* type,
                  const uint8_t* body, size_t len) {
  size_t at = out->size();
  out->resize(at + 12 + len);
  uint8_t* p = out->data() + at;
  put_be32(p, uint32_t(len));
  std::memcpy(p + 4, type, 4);
  if (len) std::memcpy(p + 8, body, len);
  uLong crc = crc32(0, p + 4, uInt(len + 4));
  put_be32(p + 8 + len, uint32_t(crc));
}

}  // namespace

extern "C" {

// Decode one PNG file into caller-provided buffer (cap bytes). Returns 0 on
// success and writes (*out_w, *out_h); buffer is tightly packed RGBA8.
int png_decode_rgba(const char* path, uint8_t* out, int64_t cap,
                    int32_t* out_w, int32_t* out_h) try {
  std::vector<uint8_t> file;
  if (!read_file(path, &file)) return -1;
  PngImage img;
  if (!decode_png(file.data(), file.size(), &img)) return -2;
  int64_t need = int64_t(img.width) * img.height * 4;
  if (need > cap) return -3;
  std::memcpy(out, img.rgba.data(), size_t(need));
  *out_w = int32_t(img.width);
  *out_h = int32_t(img.height);
  return 0;
} catch (...) {
  // never unwind across the C ABI (ctypes/libffi frames -> abort); a
  // bad_alloc on a hostile header is an error code like any other
  return -4;
}

// Probe just the header. Returns 0 and (w, h) on success.
int png_probe(const char* path, int32_t* out_w, int32_t* out_h) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return -1;
  uint8_t head[33];
  size_t got = std::fread(head, 1, sizeof(head), f);
  std::fclose(f);
  if (got < 33 || std::memcmp(head, kPngSig, 8) != 0) return -2;
  if (std::memcmp(head + 12, "IHDR", 4) != 0) return -2;
  *out_w = int32_t(be32(head + 16));
  *out_h = int32_t(be32(head + 20));
  return 0;
}

// Encode a tightly packed RGBA8 buffer as a PNG (filter 0 scanlines).
// level: zlib level (1 = fast artifacts, 6 = default). Returns bytes
// written, or negative on error. Call with out=null to get an upper bound.
int64_t png_encode_rgba(const uint8_t* rgba, int32_t w, int32_t h,
                        int32_t level, uint8_t* out, int64_t cap) try {
  if (w <= 0 || h <= 0) return -1;
  const size_t stride = size_t(w) * 4;
  const size_t raw_size = (stride + 1) * size_t(h);
  // Size probe (out == nullptr): the bound is pure arithmetic — do NOT
  // build and fill the filtered scanline buffer only to discard it (a
  // full-frame copy per probe, and every encode probes first).
  if (out == nullptr) return int64_t(compressBound(uLong(raw_size))) + 1024;
  std::vector<uint8_t> raw(raw_size);
  for (int32_t y = 0; y < h; ++y) {
    uint8_t* line = raw.data() + size_t(y) * (stride + 1);
    line[0] = 0;
    std::memcpy(line + 1, rgba + size_t(y) * stride, stride);
  }
  uLongf bound = compressBound(uLong(raw.size()));
  std::vector<uint8_t> comp(bound);
  uLongf comp_len = bound;
  if (compress2(comp.data(), &comp_len, raw.data(), uLong(raw.size()),
                level) != Z_OK)
    return -2;

  std::vector<uint8_t> png;
  png.reserve(comp_len + 256);
  png.insert(png.end(), kPngSig, kPngSig + 8);
  uint8_t ihdr[13];
  put_be32(ihdr, uint32_t(w));
  put_be32(ihdr + 4, uint32_t(h));
  ihdr[8] = 8;   // bit depth
  ihdr[9] = 6;   // RGBA
  ihdr[10] = ihdr[11] = ihdr[12] = 0;
  append_chunk(&png, "IHDR", ihdr, sizeof(ihdr));
  append_chunk(&png, "IDAT", comp.data(), comp_len);
  append_chunk(&png, "IEND", nullptr, 0);
  if (int64_t(png.size()) > cap) return -3;
  std::memcpy(out, png.data(), png.size());
  return int64_t(png.size());
} catch (...) {
  return -4;  // see png_decode_rgba: no unwinding across the C ABI
}

// Batch ingest: decode n PNGs into one zero-padded uint8 tensor
// [n, pad_h, pad_w, 4] (top-left anchored), filling out_hw [n, 2] with
// (h, w). Threaded up to hardware concurrency. paths: array of C strings.
// Returns 0 if every file decoded, else a negative count of failures.
int png_batch_decode_into_padded(const char** paths, int32_t n,
                                 uint8_t* tensor, int32_t pad_h,
                                 int32_t pad_w, int32_t* out_hw) {
  const size_t slot = size_t(pad_h) * pad_w * 4;
  std::memset(tensor, 0, slot * size_t(n));
  std::atomic<int> failures{0};
  unsigned workers = std::thread::hardware_concurrency();
  if (workers == 0) workers = 1;
  if (int32_t(workers) > n) workers = unsigned(n);
  std::atomic<int32_t> next{0};

  auto decode_one = [&](int32_t k, PngImage* img) -> bool {
    // exceptions must not escape the worker lambda (std::terminate on a
    // std::thread); treat them as per-file decode failures
    try {
      std::vector<uint8_t> file;
      return read_file(paths[k], &file) &&
             decode_png(file.data(), file.size(), img) &&
             int32_t(img->height) <= pad_h && int32_t(img->width) <= pad_w;
    } catch (...) {
      return false;
    }
  };

  auto worker = [&]() {
    for (;;) {
      int32_t k = next.fetch_add(1);
      if (k >= n) break;
      PngImage img;
      if (!decode_one(k, &img)) {
        failures.fetch_add(1);
        out_hw[k * 2] = 0;
        out_hw[k * 2 + 1] = 0;
        continue;
      }
      uint8_t* dst = tensor + slot * size_t(k);
      for (uint32_t y = 0; y < img.height; ++y) {
        std::memcpy(dst + size_t(y) * pad_w * 4,
                    img.rgba.data() + size_t(y) * img.width * 4,
                    size_t(img.width) * 4);
      }
      out_hw[k * 2] = int32_t(img.height);
      out_hw[k * 2 + 1] = int32_t(img.width);
    }
  };

  std::vector<std::thread> pool;
  try {
    pool.reserve(workers);
    for (unsigned i = 0; i < workers; ++i) pool.emplace_back(worker);
  } catch (...) {
    // std::system_error from thread creation (resource exhaustion) must
    // not unwind across the C ABI — and a partially-built pool of
    // joinable threads would std::terminate in its destructor. The
    // already-started workers drain the whole queue via the shared
    // counter; with zero started, run the queue inline (worker() is
    // nothrow by construction: decode_one catches everything).
    if (pool.empty()) worker();
    for (auto& t : pool) t.join();
    return failures.load() == 0 ? 0 : -failures.load();
  }
  for (auto& t : pool) t.join();
  return failures.load() == 0 ? 0 : -failures.load();
}

}  // extern "C"
