// Native frame loader: multithreaded image decode with prefetch.
//
// TPU-native counterpart of the reference's OpenCV C++ I/O substrate
// (/root/reference/src/main.rs:37-61 and the VideoCapture/imread plumbing in
// every example): the Python pipeline consumes whole uint8 frame chunks, so
// the loader's job is to keep decoded frames ahead of the accelerator.
//
// Capabilities:
//   * PGM (P5) and PNG (8-bit grayscale / RGB->gray, non-interlaced; zlib
//     inflate + all five row filters) decoding, no external image library;
//   * a pthread worker pool decoding `prefetch` frames ahead into a ring of
//     slots, delivered in order;
//   * optional nearest resize to a fixed output size.
//
// C ABI (driven from Python via ctypes — see slamtpu/io/native_loader.py):
//   loader_open(paths, n, out_h, out_w, threads, prefetch) -> handle
//   loader_frame_size(handle, &h, &w)
//   loader_next(handle, out, max_frames) -> frames written (0 = end)
//   loader_close(handle)

#include <zlib.h>

#include <atomic>
#include <condition_variable>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <mutex>
#include <string>
#include <thread>
#include <vector>

namespace {

struct Image {
  int h = 0, w = 0;
  std::vector<uint8_t> gray;
  bool ok = false;
};

// ---------------------------------------------------------------- PGM (P5)
Image decode_pgm(const std::vector<uint8_t>& buf) {
  Image img;
  size_t pos = 2;  // past "P5"
  auto skip_ws = [&]() {
    while (pos < buf.size()) {
      if (buf[pos] == '#') {
        while (pos < buf.size() && buf[pos] != '\n') pos++;
      } else if (isspace(buf[pos])) {
        pos++;
      } else {
        break;
      }
    }
  };
  auto read_int = [&]() {
    skip_ws();
    long v = 0;
    while (pos < buf.size() && isdigit(buf[pos])) v = v * 10 + (buf[pos++] - '0');
    return v;
  };
  long w = read_int(), h = read_int(), maxval = read_int();
  pos++;  // single whitespace after maxval
  if (w <= 0 || h <= 0 || maxval <= 0 || maxval > 255) return img;
  if (pos + (size_t)(w * h) > buf.size()) return img;
  img.w = (int)w;
  img.h = (int)h;
  img.gray.assign(buf.begin() + pos, buf.begin() + pos + w * h);
  img.ok = true;
  return img;
}

// ------------------------------------------------------------------- PNG
uint32_t be32(const uint8_t* p) {
  return ((uint32_t)p[0] << 24) | ((uint32_t)p[1] << 16) | ((uint32_t)p[2] << 8) | p[3];
}

int paeth(int a, int b, int c) {
  int p = a + b - c;
  int pa = abs(p - a), pb = abs(p - b), pc = abs(p - c);
  if (pa <= pb && pa <= pc) return a;
  if (pb <= pc) return b;
  return c;
}

Image decode_png(const std::vector<uint8_t>& buf) {
  Image img;
  static const uint8_t sig[8] = {137, 80, 78, 71, 13, 10, 26, 10};
  if (buf.size() < 8 || memcmp(buf.data(), sig, 8) != 0) return img;

  size_t pos = 8;
  uint32_t width = 0, height = 0;
  int bit_depth = 0, color_type = 0, interlace = 0;
  std::vector<uint8_t> idat;
  while (pos + 8 <= buf.size()) {
    uint32_t len = be32(&buf[pos]);
    if (pos + 12 + len > buf.size()) return img;
    const char* type = (const char*)&buf[pos + 4];
    const uint8_t* data = &buf[pos + 8];
    if (!memcmp(type, "IHDR", 4)) {
      if (len < 13) return img;  // truncated IHDR: fields below would read OOB
      width = be32(data);
      height = be32(data + 4);
      // Reject implausible dimensions before they size an allocation
      // (corrupt headers can otherwise request multi-GB buffers).
      if (width == 0 || height == 0 || width > 1u << 16 || height > 1u << 16 ||
          (uint64_t)width * height > (1u << 28))
        return img;
      bit_depth = data[8];
      color_type = data[9];
      interlace = data[12];
    } else if (!memcmp(type, "IDAT", 4)) {
      idat.insert(idat.end(), data, data + len);
    } else if (!memcmp(type, "IEND", 4)) {
      break;
    }
    pos += 12 + len;
  }
  // Supported: 8-bit gray (0), RGB (2), gray+alpha (4), RGBA (6).
  if (!width || !height || bit_depth != 8 || interlace != 0) return img;
  int ch;
  switch (color_type) {
    case 0: ch = 1; break;
    case 2: ch = 3; break;
    case 4: ch = 2; break;
    case 6: ch = 4; break;
    default: return img;
  }

  const size_t stride = (size_t)width * ch;
  std::vector<uint8_t> raw((stride + 1) * height);
  uLongf out_len = raw.size();
  if (uncompress(raw.data(), &out_len, idat.data(), idat.size()) != Z_OK ||
      out_len != raw.size())
    return img;

  // Undo per-row filters in place (rows laid out as filter byte + data).
  std::vector<uint8_t> pixels(stride * height);
  for (uint32_t y = 0; y < height; y++) {
    const uint8_t filter = raw[(stride + 1) * y];
    const uint8_t* src = &raw[(stride + 1) * y + 1];
    uint8_t* dst = &pixels[stride * y];
    const uint8_t* up = y ? &pixels[stride * (y - 1)] : nullptr;
    for (size_t x = 0; x < stride; x++) {
      int a = x >= (size_t)ch ? dst[x - ch] : 0;
      int b = up ? up[x] : 0;
      int c = (up && x >= (size_t)ch) ? up[x - ch] : 0;
      int v = src[x];
      switch (filter) {
        case 0: break;
        case 1: v += a; break;
        case 2: v += b; break;
        case 3: v += (a + b) / 2; break;
        case 4: v += paeth(a, b, c); break;
        default: return img;
      }
      dst[x] = (uint8_t)v;
    }
  }

  img.w = (int)width;
  img.h = (int)height;
  img.gray.resize((size_t)width * height);
  if (ch == 1) {
    img.gray = std::move(pixels);
  } else {
    for (size_t i = 0; i < (size_t)width * height; i++) {
      const uint8_t* p = &pixels[i * ch];
      if (ch == 2) {
        img.gray[i] = p[0];
      } else {
        // BT.601 integer luma, matching OpenCV's RGB->GRAY rounding.
        img.gray[i] = (uint8_t)((19595 * p[0] + 38470 * p[1] + 7471 * p[2] + 32768) >> 16);
      }
    }
  }
  img.ok = true;
  return img;
}

Image decode_file(const std::string& path) {
  FILE* f = fopen(path.c_str(), "rb");
  Image img;
  if (!f) return img;
  fseek(f, 0, SEEK_END);
  long n = ftell(f);
  fseek(f, 0, SEEK_SET);
  std::vector<uint8_t> buf(n > 0 ? n : 0);
  if (n > 0 && fread(buf.data(), 1, n, f) != (size_t)n) {
    fclose(f);
    return img;
  }
  fclose(f);
  if (buf.size() >= 2 && buf[0] == 'P' && buf[1] == '5') return decode_pgm(buf);
  return decode_png(buf);
}

void resize_nearest(const Image& src, int oh, int ow, uint8_t* dst) {
  for (int y = 0; y < oh; y++) {
    const int sy = (int)(((int64_t)y * src.h) / oh);
    const uint8_t* row = &src.gray[(size_t)sy * src.w];
    for (int x = 0; x < ow; x++) {
      dst[(size_t)y * ow + x] = row[((int64_t)x * src.w) / ow];
    }
  }
}

// ------------------------------------------------------------- the loader
struct Loader {
  std::vector<std::string> paths;
  int out_h = 0, out_w = 0;  // 0 = native size (first frame defines it)
  int prefetch = 16;

  std::vector<std::thread> workers;
  std::mutex mu;
  std::condition_variable cv_slot, cv_ready;
  std::vector<std::vector<uint8_t>> slots;  // ring, indexed by frame % prefetch
  std::vector<int> slot_state;              // 0 empty, 1 decoding, 2 ready
  std::atomic<size_t> next_to_decode{0};
  size_t next_to_emit = 0;
  bool stop = false;
  int frame_h = 0, frame_w = 0;

  void worker() {
    for (;;) {
      size_t idx = next_to_decode.fetch_add(1);
      if (idx >= paths.size()) return;
      Image img = decode_file(paths[idx]);

      // Claim the ring slot (wait until the consumer drained it).
      {
        std::unique_lock<std::mutex> lk(mu);
        cv_slot.wait(lk, [&] { return stop || (idx < next_to_emit + prefetch); });
        if (stop) return;
      }
      std::vector<uint8_t> frame;
      int fh = out_h, fw = out_w;
      if (!img.ok) {
        // Decode failure -> zero frame of the output size (consumer keeps
        // shape stability; mirrors the pipelines' masked-failure handling).
        // frame_h/frame_w are shared with concurrent workers: read under mu.
        if (fh == 0 || fw == 0) {
          std::lock_guard<std::mutex> lk(mu);
          if (fh == 0) fh = frame_h ? frame_h : 1;
          if (fw == 0) fw = frame_w ? frame_w : 1;
        }
        frame.assign((size_t)fh * fw, 0);
      } else if (out_h && out_w && (img.h != out_h || img.w != out_w)) {
        frame.resize((size_t)out_h * out_w);
        resize_nearest(img, out_h, out_w, frame.data());
      } else {
        fh = img.h;
        fw = img.w;
        frame = std::move(img.gray);
      }
      {
        std::lock_guard<std::mutex> lk(mu);
        if (!frame_h) {
          frame_h = fh;
          frame_w = fw;
        }
        slots[idx % prefetch] = std::move(frame);
        slot_state[idx % prefetch] = 2;
      }
      cv_ready.notify_all();
    }
  }
};

}  // namespace

extern "C" {

void* loader_open(const char** paths, int n, int out_h, int out_w, int threads,
                  int prefetch) {
  auto* ld = new Loader();
  ld->paths.assign(paths, paths + n);
  ld->out_h = out_h;
  ld->out_w = out_w;
  ld->prefetch = prefetch > 0 ? prefetch : 16;
  ld->slots.resize(ld->prefetch);
  ld->slot_state.assign(ld->prefetch, 0);
  if (threads <= 0) threads = 4;
  // Decode the first frame synchronously so frame_size is known immediately.
  if (n > 0) {
    Image img = decode_file(ld->paths[0]);
    if (img.ok) {
      ld->frame_h = (out_h && out_w) ? out_h : img.h;
      ld->frame_w = (out_h && out_w) ? out_w : img.w;
    }
  }
  for (int i = 0; i < threads; i++) ld->workers.emplace_back(&Loader::worker, ld);
  return ld;
}

void loader_frame_size(void* handle, int* h, int* w) {
  auto* ld = (Loader*)handle;
  *h = ld->frame_h;
  *w = ld->frame_w;
}

int loader_next(void* handle, uint8_t* out, int max_frames) {
  auto* ld = (Loader*)handle;
  int written = 0;
  const size_t frame_bytes = (size_t)ld->frame_h * ld->frame_w;
  while (written < max_frames && ld->next_to_emit < ld->paths.size()) {
    size_t idx = ld->next_to_emit;
    std::vector<uint8_t> frame;
    {
      std::unique_lock<std::mutex> lk(ld->mu);
      ld->cv_ready.wait(lk, [&] { return ld->slot_state[idx % ld->prefetch] == 2; });
      frame = std::move(ld->slots[idx % ld->prefetch]);
      ld->slot_state[idx % ld->prefetch] = 0;
      ld->next_to_emit++;
    }
    ld->cv_slot.notify_all();
    if (frame.size() != frame_bytes) frame.resize(frame_bytes, 0);
    memcpy(out + (size_t)written * frame_bytes, frame.data(), frame_bytes);
    written++;
  }
  return written;
}

void loader_close(void* handle) {
  auto* ld = (Loader*)handle;
  {
    std::lock_guard<std::mutex> lk(ld->mu);
    ld->stop = true;
  }
  ld->cv_slot.notify_all();
  for (auto& t : ld->workers) t.join();
  delete ld;
}

}  // extern "C"
