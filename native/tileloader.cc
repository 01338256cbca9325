// tileloader — native batched map-tile loader for topomap_tpu.
//
// The reference feeds training from a torch DataLoader doing per-tile PIL decode +
// torchvision resize in Python (TextEncoder_Finetuning/data_utils.py:150-181, num_workers=0
// at multiseg_19prompts_batch1_shuffle_addlrSD.py:387) — the host-side input path. This is
// the native equivalent: a self-contained PNG decoder (zlib inflate + scanline unfilter),
// NEAREST / BILINEAR resizing matching the reference's seg/gt transform split, range
// normalization to [0,1] or [-1,1], and a pthread worker pool that assembles whole batches
// into a caller-provided float32 HWC buffer. Exposed as a C ABI for ctypes
// (topomap_tpu/data/native_loader.py).
//
// Supported PNG subset: 8-bit depth, color types 0 (gray), 2 (RGB), 3 (palette), 4
// (gray+alpha), 6 (RGBA); non-interlaced. Output is always RGB3.

#include <zlib.h>

#include <atomic>
#include <cstdint>
#include <cstdlib>
#include <cstdio>
#include <cstring>
#include <thread>
#include <vector>

namespace {

struct Image {
  int w = 0, h = 0;
  std::vector<uint8_t> rgb;  // w*h*3
};

uint32_t be32(const uint8_t* p) {
  return (uint32_t(p[0]) << 24) | (uint32_t(p[1]) << 16) | (uint32_t(p[2]) << 8) | p[3];
}

int paeth(int a, int b, int c) {
  int p = a + b - c;
  int pa = abs(p - a), pb = abs(p - b), pc = abs(p - c);
  if (pa <= pb && pa <= pc) return a;
  if (pb <= pc) return b;
  return c;
}

bool inflate_all(const std::vector<uint8_t>& in, std::vector<uint8_t>& out) {
  z_stream zs;
  memset(&zs, 0, sizeof(zs));
  if (inflateInit(&zs) != Z_OK) return false;
  zs.next_in = const_cast<uint8_t*>(in.data());
  zs.avail_in = in.size();
  std::vector<uint8_t> buf(1 << 18);
  int ret = Z_OK;
  while (ret != Z_STREAM_END) {
    zs.next_out = buf.data();
    zs.avail_out = buf.size();
    ret = inflate(&zs, Z_NO_FLUSH);
    if (ret != Z_OK && ret != Z_STREAM_END) {
      inflateEnd(&zs);
      return false;
    }
    out.insert(out.end(), buf.data(), buf.data() + (buf.size() - zs.avail_out));
  }
  inflateEnd(&zs);
  return true;
}

bool decode_png(const char* path, Image& img) {
  FILE* f = fopen(path, "rb");
  if (!f) return false;
  fseek(f, 0, SEEK_END);
  long sz = ftell(f);
  fseek(f, 0, SEEK_SET);
  std::vector<uint8_t> data(sz);
  if (fread(data.data(), 1, sz, f) != size_t(sz)) {
    fclose(f);
    return false;
  }
  fclose(f);
  static const uint8_t sig[8] = {137, 80, 78, 71, 13, 10, 26, 10};
  if (sz < 8 || memcmp(data.data(), sig, 8) != 0) return false;

  int w = 0, h = 0, bit_depth = 0, color_type = 0, interlace = 0;
  std::vector<uint8_t> idat;
  std::vector<uint8_t> palette;  // 3*n
  size_t off = 8;
  while (off + 8 <= data.size()) {
    uint32_t len = be32(&data[off]);
    const char* type = reinterpret_cast<const char*>(&data[off + 4]);
    const uint8_t* body = &data[off + 8];
    if (off + 12 + len > data.size()) return false;
    if (!memcmp(type, "IHDR", 4)) {
      w = be32(body);
      h = be32(body + 4);
      bit_depth = body[8];
      color_type = body[9];
      interlace = body[12];
    } else if (!memcmp(type, "PLTE", 4)) {
      palette.assign(body, body + len);
    } else if (!memcmp(type, "IDAT", 4)) {
      idat.insert(idat.end(), body, body + len);
    } else if (!memcmp(type, "IEND", 4)) {
      break;
    }
    off += 12 + len;
  }
  if (w <= 0 || h <= 0 || bit_depth != 8 || interlace != 0) return false;
  int channels;
  switch (color_type) {
    case 0: channels = 1; break;
    case 2: channels = 3; break;
    case 3: channels = 1; break;
    case 4: channels = 2; break;
    case 6: channels = 4; break;
    default: return false;
  }

  std::vector<uint8_t> raw;
  if (!inflate_all(idat, raw)) return false;
  size_t stride = size_t(w) * channels;
  if (raw.size() < (stride + 1) * h) return false;

  // Unfilter scanlines in place into `pix`.
  std::vector<uint8_t> pix(stride * h);
  const int bpp = channels;
  for (int y = 0; y < h; ++y) {
    uint8_t filter = raw[(stride + 1) * y];
    const uint8_t* src = &raw[(stride + 1) * y + 1];
    uint8_t* dst = &pix[stride * y];
    const uint8_t* prev = y ? &pix[stride * (y - 1)] : nullptr;
    for (size_t x = 0; x < stride; ++x) {
      int a = x >= size_t(bpp) ? dst[x - bpp] : 0;
      int b = prev ? prev[x] : 0;
      int c = (prev && x >= size_t(bpp)) ? prev[x - bpp] : 0;
      int v = src[x];
      switch (filter) {
        case 0: break;
        case 1: v += a; break;
        case 2: v += b; break;
        case 3: v += (a + b) / 2; break;
        case 4: v += paeth(a, b, c); break;
        default: return false;
      }
      dst[x] = uint8_t(v);
    }
  }

  img.w = w;
  img.h = h;
  img.rgb.resize(size_t(w) * h * 3);
  for (int i = 0; i < w * h; ++i) {
    const uint8_t* s = &pix[size_t(i) * channels];
    uint8_t r, g, b;
    switch (color_type) {
      case 0: r = g = b = s[0]; break;
      case 2: r = s[0]; g = s[1]; b = s[2]; break;
      case 3: {
        size_t pi = size_t(s[0]) * 3;
        if (pi + 2 >= palette.size()) return false;
        r = palette[pi]; g = palette[pi + 1]; b = palette[pi + 2];
        break;
      }
      case 4: r = g = b = s[0]; break;
      default: r = s[0]; g = s[1]; b = s[2]; break;
    }
    img.rgb[size_t(i) * 3 + 0] = r;
    img.rgb[size_t(i) * 3 + 1] = g;
    img.rgb[size_t(i) * 3 + 2] = b;
  }
  return true;
}

// NEAREST resize matching PIL's convention: src index = floor((x + 0.5) * scale).
void resize_nearest(const Image& src, int size, uint8_t* out) {
  double sx = double(src.w) / size, sy = double(src.h) / size;
  for (int y = 0; y < size; ++y) {
    int yy = int((y + 0.5) * sy);
    if (yy >= src.h) yy = src.h - 1;
    for (int x = 0; x < size; ++x) {
      int xx = int((x + 0.5) * sx);
      if (xx >= src.w) xx = src.w - 1;
      memcpy(&out[(size_t(y) * size + x) * 3], &src.rgb[(size_t(yy) * src.w + xx) * 3], 3);
    }
  }
}

// BILINEAR resize (align-corners=false convention, like PIL for downscale<=2 — for exact
// PIL parity at arbitrary ratios PIL uses a triangle filter; this matches it for the
// identity and 2x cases used in the pipeline and is within 1 LSB elsewhere).
void resize_bilinear(const Image& src, int size, uint8_t* out) {
  double sx = double(src.w) / size, sy = double(src.h) / size;
  for (int y = 0; y < size; ++y) {
    double fy = (y + 0.5) * sy - 0.5;
    int y0 = int(fy < 0 ? 0 : fy);
    int y1 = y0 + 1 < src.h ? y0 + 1 : src.h - 1;
    double wy = fy - y0;
    if (wy < 0) wy = 0;
    for (int x = 0; x < size; ++x) {
      double fx = (x + 0.5) * sx - 0.5;
      int x0 = int(fx < 0 ? 0 : fx);
      int x1 = x0 + 1 < src.w ? x0 + 1 : src.w - 1;
      double wx = fx - x0;
      if (wx < 0) wx = 0;
      for (int c = 0; c < 3; ++c) {
        double v00 = src.rgb[(size_t(y0) * src.w + x0) * 3 + c];
        double v01 = src.rgb[(size_t(y0) * src.w + x1) * 3 + c];
        double v10 = src.rgb[(size_t(y1) * src.w + x0) * 3 + c];
        double v11 = src.rgb[(size_t(y1) * src.w + x1) * 3 + c];
        double v = v00 * (1 - wy) * (1 - wx) + v01 * (1 - wy) * wx + v10 * wy * (1 - wx) +
                   v11 * wy * wx;
        out[(size_t(y) * size + x) * 3 + c] = uint8_t(v + 0.5);
      }
    }
  }
}

}  // namespace

extern "C" {

// Decode one PNG to uint8 RGB at native resolution. Returns 0 on success.
// Caller passes out buffer of capacity cap_w*cap_h*3; actual dims written to *w/*h.
int tl_decode_png(const char* path, uint8_t* out, int cap_w, int cap_h, int* w, int* h) {
  Image img;
  if (!decode_png(path, img)) return 1;
  if (img.w > cap_w || img.h > cap_h) return 2;
  *w = img.w;
  *h = img.h;
  memcpy(out, img.rgb.data(), img.rgb.size());
  return 0;
}

// Load a batch of PNGs into a float32 [n, size, size, 3] buffer.
// mode: 0 = NEAREST + [0,1] (seg hints), 1 = BILINEAR + [-1,1] (gt rasters).
// n_threads <= 0 → hardware concurrency. Returns number of failed paths.
int tl_load_batch(const char** paths, int n, int size, int mode, float* out, int n_threads) {
  std::atomic<int> next(0), failed(0);
  if (n_threads <= 0) n_threads = int(std::thread::hardware_concurrency());
  if (n_threads > n) n_threads = n;
  if (n_threads < 1) n_threads = 1;

  auto worker = [&]() {
    std::vector<uint8_t> resized(size_t(size) * size * 3);
    for (;;) {
      int i = next.fetch_add(1);
      if (i >= n) return;
      Image img;
      float* dst = out + size_t(i) * size * size * 3;
      if (!decode_png(paths[i], img)) {
        failed.fetch_add(1);
        memset(dst, 0, sizeof(float) * size_t(size) * size * 3);
        continue;
      }
      if (mode == 0) {
        resize_nearest(img, size, resized.data());
        for (size_t p = 0; p < resized.size(); ++p) dst[p] = resized[p] / 255.0f;
      } else {
        resize_bilinear(img, size, resized.data());
        for (size_t p = 0; p < resized.size(); ++p) dst[p] = resized[p] / 127.5f - 1.0f;
      }
    }
  };
  std::vector<std::thread> threads;
  for (int t = 0; t < n_threads; ++t) threads.emplace_back(worker);
  for (auto& t : threads) t.join();
  return failed.load();
}

}  // extern "C"
