// Native threaded PNG decode + bilinear resize for the data loader.
//
// Capability rationale (SURVEY.md §2b "Parallel ray-batch producer"): the
// reference feeds training through pathos worker *processes* doing PIL
// decodes (signerf_datamanager.py:148-161, signerf_dataloader.py:172-184).
// Our TPU datamanager needs the whole dataset decoded once into a device
// uint8 stack; this codec does that with a std::thread pool and zero Python
// in the loop — GIL-free, one contiguous output buffer, optional fused
// bilinear downscale (the images_{k}/ convention's resize).
//
// Scope: 8-bit PNGs, color types 0 (gray), 2 (RGB), 3 (palette), 4 (gray+
// alpha), 6 (RGBA); interlace 0. Output is always RGB8. Returns 0 on
// success, negative error codes otherwise.
//
// Build: g++ -O2 -shared -fPIC image_codec.cpp -lz -lpthread -o libimage_codec.so

#include <atomic>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <thread>
#include <vector>

#include <zlib.h>

namespace {

struct Image {
  int w = 0, h = 0;
  std::vector<uint8_t> rgb;  // w*h*3
};

inline uint32_t be32(const uint8_t* p) {
  return (uint32_t(p[0]) << 24) | (uint32_t(p[1]) << 16) |
         (uint32_t(p[2]) << 8) | uint32_t(p[3]);
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

int inflate_all(const std::vector<uint8_t>& in, std::vector<uint8_t>& out) {
  z_stream zs;
  std::memset(&zs, 0, sizeof(zs));
  if (inflateInit(&zs) != Z_OK) return -10;
  zs.next_in = const_cast<Bytef*>(in.data());
  zs.avail_in = static_cast<uInt>(in.size());
  int ret;
  std::vector<uint8_t> buf(1 << 18);
  do {
    zs.next_out = buf.data();
    zs.avail_out = static_cast<uInt>(buf.size());
    ret = inflate(&zs, Z_NO_FLUSH);
    if (ret != Z_OK && ret != Z_STREAM_END) {
      inflateEnd(&zs);
      return -11;
    }
    out.insert(out.end(), buf.data(), buf.data() + (buf.size() - zs.avail_out));
  } while (ret != Z_STREAM_END && zs.avail_in > 0);
  inflateEnd(&zs);
  return ret == Z_STREAM_END ? 0 : -12;
}

// Decode one PNG file into RGB8.
int decode_png_file(const char* path, Image& img) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return -1;
  std::fseek(f, 0, SEEK_END);
  long size = std::ftell(f);
  std::fseek(f, 0, SEEK_SET);
  std::vector<uint8_t> data(size);
  if (std::fread(data.data(), 1, size, f) != static_cast<size_t>(size)) {
    std::fclose(f);
    return -2;
  }
  std::fclose(f);

  static const uint8_t sig[8] = {137, 80, 78, 71, 13, 10, 26, 10};
  if (size < 8 || std::memcmp(data.data(), sig, 8) != 0) return -3;

  int w = 0, h = 0, bit_depth = 0, color_type = 0, interlace = 0;
  std::vector<uint8_t> idat;
  std::vector<uint8_t> palette;  // rgb triples
  size_t pos = 8;
  while (pos + 8 <= data.size()) {
    uint32_t len = be32(&data[pos]);
    const uint8_t* type = &data[pos + 4];
    const uint8_t* chunk = &data[pos + 8];
    if (pos + 12 + len > data.size()) return -4;
    if (!std::memcmp(type, "IHDR", 4)) {
      w = be32(chunk);
      h = be32(chunk + 4);
      bit_depth = chunk[8];
      color_type = chunk[9];
      interlace = chunk[12];
      if (bit_depth != 8 || interlace != 0) return -5;
    } else if (!std::memcmp(type, "PLTE", 4)) {
      palette.assign(chunk, chunk + len);
    } else if (!std::memcmp(type, "IDAT", 4)) {
      idat.insert(idat.end(), chunk, chunk + len);
    } else if (!std::memcmp(type, "IEND", 4)) {
      break;
    }
    pos += 12 + len;
  }
  if (w <= 0 || h <= 0 || idat.empty()) return -6;

  int channels;
  switch (color_type) {
    case 0: channels = 1; break;
    case 2: channels = 3; break;
    case 3: channels = 1; break;  // palette indices
    case 4: channels = 2; break;
    case 6: channels = 4; break;
    default: return -7;
  }

  std::vector<uint8_t> raw;
  raw.reserve(static_cast<size_t>(h) * (static_cast<size_t>(w) * channels + 1));
  int err = inflate_all(idat, raw);
  if (err) return err;
  size_t stride = static_cast<size_t>(w) * channels;
  if (raw.size() < static_cast<size_t>(h) * (stride + 1)) return -8;

  // Unfilter in place into `pix`.
  std::vector<uint8_t> pix(static_cast<size_t>(h) * stride);
  for (int y = 0; y < h; ++y) {
    uint8_t filter = raw[y * (stride + 1)];
    const uint8_t* src = &raw[y * (stride + 1) + 1];
    uint8_t* dst = &pix[y * stride];
    const uint8_t* up = y > 0 ? &pix[(y - 1) * stride] : nullptr;
    for (size_t x = 0; x < stride; ++x) {
      int a = x >= static_cast<size_t>(channels) ? dst[x - channels] : 0;
      int b = up ? up[x] : 0;
      int c = (up && x >= static_cast<size_t>(channels)) ? up[x - channels] : 0;
      int v = src[x];
      switch (filter) {
        case 0: break;
        case 1: v += a; break;
        case 2: v += b; break;
        case 3: v += (a + b) / 2; break;
        case 4: v += paeth(a, b, c); break;
        default: return -9;
      }
      dst[x] = static_cast<uint8_t>(v);
    }
  }

  // Convert to RGB8.
  img.w = w;
  img.h = h;
  img.rgb.resize(static_cast<size_t>(w) * h * 3);
  for (size_t i = 0; i < static_cast<size_t>(w) * h; ++i) {
    const uint8_t* p = &pix[i * channels];
    uint8_t r, g, b;
    switch (color_type) {
      case 0: r = g = b = p[0]; break;
      case 2: r = p[0]; g = p[1]; b = p[2]; break;
      case 3: {
        size_t pi = static_cast<size_t>(p[0]) * 3;
        if (pi + 2 >= palette.size()) return -13;
        r = palette[pi]; g = palette[pi + 1]; b = palette[pi + 2];
        break;
      }
      case 4: r = g = b = p[0]; break;
      default: r = p[0]; g = p[1]; b = p[2]; break;  // 6
    }
    img.rgb[i * 3] = r;
    img.rgb[i * 3 + 1] = g;
    img.rgb[i * 3 + 2] = b;
  }
  return 0;
}

void resize_bilinear(const Image& src, uint8_t* dst, int dw, int dh) {
  if (src.w == dw && src.h == dh) {
    std::memcpy(dst, src.rgb.data(), static_cast<size_t>(dw) * dh * 3);
    return;
  }
  // half-pixel-center sampling (matches PIL/torch align_corners=False)
  float sx = static_cast<float>(src.w) / dw;
  float sy = static_cast<float>(src.h) / dh;
  for (int y = 0; y < dh; ++y) {
    float fy = (y + 0.5f) * sy - 0.5f;
    int y0 = fy < 0 ? 0 : static_cast<int>(fy);
    int y1 = y0 + 1 < src.h ? y0 + 1 : src.h - 1;
    float wy = fy - y0;
    if (wy < 0) wy = 0;
    for (int x = 0; x < dw; ++x) {
      float fx = (x + 0.5f) * sx - 0.5f;
      int x0 = fx < 0 ? 0 : static_cast<int>(fx);
      int x1 = x0 + 1 < src.w ? x0 + 1 : src.w - 1;
      float wx = fx - x0;
      if (wx < 0) wx = 0;
      for (int c = 0; c < 3; ++c) {
        float v00 = src.rgb[(y0 * src.w + x0) * 3 + c];
        float v01 = src.rgb[(y0 * src.w + x1) * 3 + c];
        float v10 = src.rgb[(y1 * src.w + x0) * 3 + c];
        float v11 = src.rgb[(y1 * src.w + x1) * 3 + c];
        float v = v00 * (1 - wy) * (1 - wx) + v01 * (1 - wy) * wx +
                  v10 * wy * (1 - wx) + v11 * wy * wx;
        dst[(static_cast<size_t>(y) * dw + x) * 3 + c] =
            static_cast<uint8_t>(v + 0.5f);
      }
    }
  }
}

}  // namespace

extern "C" {

// Decode `n` PNGs into one [n, th, tw, 3] uint8 buffer, resizing each to
// (tw, th) with bilinear. `errors[i]` receives per-file status (0 = ok).
// Returns the number of failures.
int decode_png_batch(const char** paths, int n, int tw, int th,
                     uint8_t* out, int* errors, int num_threads) {
  if (num_threads <= 0) num_threads = std::thread::hardware_concurrency();
  if (num_threads > n) num_threads = n > 0 ? n : 1;
  std::atomic<int> next{0};
  std::atomic<int> failures{0};
  auto work = [&]() {
    for (;;) {
      int i = next.fetch_add(1);
      if (i >= n) return;
      Image img;
      int err = decode_png_file(paths[i], img);
      errors[i] = err;
      if (err) {
        failures.fetch_add(1);
        std::memset(out + static_cast<size_t>(i) * tw * th * 3, 0,
                    static_cast<size_t>(tw) * th * 3);
        continue;
      }
      resize_bilinear(img, out + static_cast<size_t>(i) * tw * th * 3, tw, th);
    }
  };
  std::vector<std::thread> threads;
  for (int t = 0; t < num_threads; ++t) threads.emplace_back(work);
  for (auto& t : threads) t.join();
  return failures.load();
}

// Single decode at native resolution; caller passes a buffer of
// max_w*max_h*3. Actual dims written to *w / *h. Returns 0 on success.
int decode_png(const char* path, uint8_t* out, int max_w, int max_h,
               int* w, int* h) {
  Image img;
  int err = decode_png_file(path, img);
  if (err) return err;
  if (img.w > max_w || img.h > max_h) return -20;
  *w = img.w;
  *h = img.h;
  std::memcpy(out, img.rgb.data(), img.rgb.size());
  return 0;
}

// Encode an 8-bit gray (channels=1) or RGB (channels=3) buffer as a PNG
// file. Per-row filter chosen by the standard minimum-sum-of-absolute-
// differences heuristic over None/Sub/Up; IDAT deflated at
// `compress_level` (1 = fast, the writer-pool default — these are
// observability artifacts, not archives). Returns 0 on success.
// Called from Python writer threads via ctypes (GIL released), so N saves
// encode concurrently without process pools.
int encode_png(const char* path, const uint8_t* pix, int w, int h,
               int channels, int compress_level) {
  if (w <= 0 || h <= 0 || (channels != 1 && channels != 3)) return -30;
  size_t stride = static_cast<size_t>(w) * channels;

  // Filter scanlines.
  std::vector<uint8_t> raw(static_cast<size_t>(h) * (stride + 1));
  std::vector<uint8_t> cand(stride);
  for (int y = 0; y < h; ++y) {
    const uint8_t* row = pix + y * stride;
    const uint8_t* up = y > 0 ? pix + (y - 1) * stride : nullptr;
    long best_cost = -1;
    int best_filter = 0;
    uint8_t* dst = &raw[y * (stride + 1)];
    for (int filter = 0; filter <= 2; ++filter) {
      long cost = 0;
      for (size_t x = 0; x < stride; ++x) {
        int a = (filter == 1 && x >= static_cast<size_t>(channels))
                    ? row[x - channels] : 0;
        int b = (filter == 2 && up) ? up[x] : 0;
        uint8_t v = static_cast<uint8_t>(row[x] - a - b);
        cand[x] = v;
        // minimize sum of |signed byte| (PNG spec heuristic)
        cost += v < 128 ? v : 256 - v;
      }
      if (best_cost < 0 || cost < best_cost) {
        best_cost = cost;
        best_filter = filter;
        dst[0] = static_cast<uint8_t>(filter);
        std::memcpy(dst + 1, cand.data(), stride);
      }
    }
  }

  // Deflate.
  z_stream zs;
  std::memset(&zs, 0, sizeof(zs));
  if (deflateInit(&zs, compress_level) != Z_OK) return -31;
  std::vector<uint8_t> idat(deflateBound(&zs, raw.size()));
  zs.next_in = raw.data();
  zs.avail_in = static_cast<uInt>(raw.size());
  zs.next_out = idat.data();
  zs.avail_out = static_cast<uInt>(idat.size());
  int ret = deflate(&zs, Z_FINISH);
  deflateEnd(&zs);
  if (ret != Z_STREAM_END) return -32;
  idat.resize(idat.size() - zs.avail_out);

  FILE* f = std::fopen(path, "wb");
  if (!f) return -33;
  auto write_chunk = [&](const char type[4], const uint8_t* data,
                         uint32_t len) {
    uint8_t hdr[8] = {
        static_cast<uint8_t>(len >> 24), static_cast<uint8_t>(len >> 16),
        static_cast<uint8_t>(len >> 8),  static_cast<uint8_t>(len),
        static_cast<uint8_t>(type[0]),   static_cast<uint8_t>(type[1]),
        static_cast<uint8_t>(type[2]),   static_cast<uint8_t>(type[3])};
    std::fwrite(hdr, 1, 8, f);
    if (len) std::fwrite(data, 1, len, f);
    uint32_t crc = crc32(0, hdr + 4, 4);
    if (len) crc = crc32(crc, data, len);
    uint8_t tail[4] = {
        static_cast<uint8_t>(crc >> 24), static_cast<uint8_t>(crc >> 16),
        static_cast<uint8_t>(crc >> 8), static_cast<uint8_t>(crc)};
    std::fwrite(tail, 1, 4, f);
  };
  static const uint8_t sig[8] = {137, 80, 78, 71, 13, 10, 26, 10};
  std::fwrite(sig, 1, 8, f);
  uint8_t ihdr[13] = {
      static_cast<uint8_t>(w >> 24), static_cast<uint8_t>(w >> 16),
      static_cast<uint8_t>(w >> 8),  static_cast<uint8_t>(w),
      static_cast<uint8_t>(h >> 24), static_cast<uint8_t>(h >> 16),
      static_cast<uint8_t>(h >> 8),  static_cast<uint8_t>(h),
      8,  // bit depth
      static_cast<uint8_t>(channels == 1 ? 0 : 2),  // color type
      0, 0, 0};  // compression, filter, interlace
  write_chunk("IHDR", ihdr, 13);
  write_chunk("IDAT", idat.data(), static_cast<uint32_t>(idat.size()));
  write_chunk("IEND", nullptr, 0);
  int close_err = std::fclose(f);
  return close_err == 0 ? 0 : -34;
}

// Probe image dimensions without a full decode (IHDR only).
int png_dims(const char* path, int* w, int* h) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return -1;
  uint8_t head[33];
  size_t got = std::fread(head, 1, sizeof(head), f);
  std::fclose(f);
  if (got < 33) return -2;
  static const uint8_t sig[8] = {137, 80, 78, 71, 13, 10, 26, 10};
  if (std::memcmp(head, sig, 8) != 0) return -3;
  if (std::memcmp(head + 12, "IHDR", 4) != 0) return -4;
  *w = static_cast<int>(be32(head + 16));
  *h = static_cast<int>(be32(head + 20));
  return 0;
}

}  // extern "C"
