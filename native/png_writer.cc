// Native PNG writer: multithreaded batch encoder for the eval fan-out.
//
// The reference saves each generated image through PIL one at a time
// (evalscripts/generate-images-sd.py:45-46) — at COCO-30k scale that is
// 30k+ serial encodes on the Python thread. This writer encodes and writes
// a whole batch in parallel worker threads; Python binds it via ctypes
// (uce_tpu/utils/native_png.py) with a PIL fallback when the shared
// library is absent.
//
// PNG format: 8-bit RGB, one IDAT chunk, zlib deflate.

#include <zlib.h>

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <string>
#include <thread>
#include <vector>

namespace {

void put_be32(std::string* out, uint32_t v) {
  char b[4] = {char(v >> 24), char(v >> 16), char(v >> 8), char(v)};
  out->append(b, 4);
}

void chunk(std::string* out, const char tag[4], const std::string& data) {
  put_be32(out, static_cast<uint32_t>(data.size()));
  std::string body(tag, 4);
  body += data;
  out->append(body);
  put_be32(out, crc32(0, reinterpret_cast<const Bytef*>(body.data()),
                      static_cast<uInt>(body.size())));
}

// Encode one HxWx3 uint8 image to an in-memory PNG.
std::string encode_png(const uint8_t* rgb, int h, int w, int level) {
  // filter byte 0 per scanline
  std::string raw;
  raw.reserve(static_cast<size_t>(h) * (static_cast<size_t>(w) * 3 + 1));
  for (int y = 0; y < h; ++y) {
    raw.push_back('\0');
    raw.append(reinterpret_cast<const char*>(rgb + static_cast<size_t>(y) * w * 3),
               static_cast<size_t>(w) * 3);
  }
  uLongf bound = compressBound(raw.size());
  std::string deflated(bound, '\0');
  compress2(reinterpret_cast<Bytef*>(deflated.data()), &bound,
            reinterpret_cast<const Bytef*>(raw.data()), raw.size(), level);
  deflated.resize(bound);

  std::string png("\x89PNG\r\n\x1a\n", 8);
  std::string ihdr;
  put_be32(&ihdr, static_cast<uint32_t>(w));
  put_be32(&ihdr, static_cast<uint32_t>(h));
  const char tail[5] = {8 /*depth*/, 2 /*RGB*/, 0, 0, 0};
  ihdr.append(tail, 5);
  chunk(&png, "IHDR", ihdr);
  chunk(&png, "IDAT", deflated);
  chunk(&png, "IEND", "");
  return png;
}

}  // namespace

extern "C" {

// Encode + write `n` images (contiguous [n, h, w, 3] uint8) to the given
// NUL-separated path list. Returns the number written successfully.
int write_png_batch(const uint8_t* images, int n, int h, int w,
                    const char* paths_joined, int level, int n_threads) {
  std::vector<const char*> paths;
  const char* p = paths_joined;
  for (int i = 0; i < n; ++i) {
    paths.push_back(p);
    p += std::strlen(p) + 1;
  }
  if (n_threads < 1) n_threads = 1;
  std::vector<int> ok(n, 0);
  size_t stride = static_cast<size_t>(h) * w * 3;

  auto worker = [&](int start) {
    for (int i = start; i < n; i += n_threads) {
      std::string png = encode_png(images + stride * i, h, w, level);
      FILE* f = std::fopen(paths[i], "wb");
      if (!f) continue;
      size_t written = std::fwrite(png.data(), 1, png.size(), f);
      std::fclose(f);
      ok[i] = written == png.size();
    }
  };
  std::vector<std::thread> threads;
  for (int t = 0; t < n_threads; ++t) threads.emplace_back(worker, t);
  for (auto& t : threads) t.join();
  int total = 0;
  for (int v : ok) total += v;
  return total;
}

}  // extern "C"
