// dmlt_io: native data-path runtime for the WSI bag loader.
//
// The reference delegates IO to torch DataLoader worker processes
// (reference main.py:118-125, workers=8); here the hot path — reading
// per-WSI .npy feature bags ([n_patches, 1024] float) and assembling the
// fixed-shape [B, fixdim, feat_dim] batch (zero-padded / truncated) — is a
// small C++ library driven from Python via ctypes.  A Python/numpy fallback
// with identical semantics lives in data/native_io.py.
//
// Supported .npy payloads: v1.0/v2.0 headers, C-order, little-endian
// float32 ('<f4') and float64 ('<f8', converted to f32).

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <string>
#include <thread>
#include <vector>

namespace {

struct NpyInfo {
  int64_t rows = 0;
  int64_t cols = 0;
  bool f64 = false;
  size_t data_offset = 0;
};

// Minimal .npy header parser. Returns false on malformed/unsupported input.
bool parse_npy_header(FILE* f, NpyInfo* info) {
  unsigned char magic[8];
  if (fread(magic, 1, 8, f) != 8) return false;
  if (memcmp(magic, "\x93NUMPY", 6) != 0) return false;
  const int major = magic[6];
  uint32_t header_len = 0;
  if (major == 1) {
    unsigned char b[2];
    if (fread(b, 1, 2, f) != 2) return false;
    header_len = b[0] | (b[1] << 8);
    info->data_offset = 10 + header_len;
  } else {
    unsigned char b[4];
    if (fread(b, 1, 4, f) != 4) return false;
    header_len = b[0] | (b[1] << 8) | (b[2] << 16) | (uint32_t(b[3]) << 24);
    info->data_offset = 12 + header_len;
  }
  std::string header(header_len, '\0');
  if (fread(&header[0], 1, header_len, f) != header_len) return false;

  if (header.find("'fortran_order': True") != std::string::npos) return false;
  if (header.find("'<f4'") != std::string::npos) {
    info->f64 = false;
  } else if (header.find("'<f8'") != std::string::npos) {
    info->f64 = true;
  } else {
    return false;
  }
  const size_t sp = header.find("'shape':");
  if (sp == std::string::npos) return false;
  const size_t open = header.find('(', sp);
  const size_t close = header.find(')', open);
  if (open == std::string::npos || close == std::string::npos) return false;
  std::string shape = header.substr(open + 1, close - open - 1);
  long long r = 0, c = 1;
  if (sscanf(shape.c_str(), "%lld , %lld", &r, &c) < 1) {
    if (sscanf(shape.c_str(), "%lld", &r) < 1) return false;
  }
  info->rows = r;
  info->cols = c;
  return true;
}

// Load one bag into out[fixdim * feat_dim] (zero-padded / row-truncated).
int load_bag(const char* path, float* out, int64_t fixdim, int64_t feat_dim) {
  FILE* f = fopen(path, "rb");
  if (!f) return -1;
  NpyInfo info;
  if (!parse_npy_header(f, &info)) {
    fclose(f);
    return -2;
  }
  if (info.cols != feat_dim) {
    fclose(f);
    return -3;
  }
  memset(out, 0, sizeof(float) * fixdim * feat_dim);
  const int64_t rows = info.rows < fixdim ? info.rows : fixdim;
  if (fseek(f, (long)info.data_offset, SEEK_SET) != 0) {
    fclose(f);
    return -4;
  }
  if (!info.f64) {
    const size_t want = size_t(rows) * feat_dim;
    if (fread(out, sizeof(float), want, f) != want) {
      fclose(f);
      return -5;
    }
  } else {
    std::vector<double> buf(size_t(rows) * feat_dim);
    if (fread(buf.data(), sizeof(double), buf.size(), f) != buf.size()) {
      fclose(f);
      return -5;
    }
    for (size_t i = 0; i < buf.size(); ++i) out[i] = float(buf[i]);
  }
  fclose(f);
  return 0;
}

}  // namespace

extern "C" {

// Single bag: returns 0 on success, negative error code otherwise.
int dmlt_load_bag(const char* path, float* out, int64_t fixdim,
                  int64_t feat_dim) {
  return load_bag(path, out, fixdim, feat_dim);
}

// Batch: n paths -> out [n, fixdim, feat_dim], loaded on n_threads threads.
// Returns 0 on success or the first nonzero per-file error code.
int dmlt_load_batch(const char** paths, int64_t n, float* out, int64_t fixdim,
                    int64_t feat_dim, int n_threads) {
  if (n_threads < 1) n_threads = 1;
  if (n_threads > n) n_threads = (int)n;
  std::vector<int> codes(n, 0);
  const int64_t stride = fixdim * feat_dim;

  auto worker = [&](int tid) {
    for (int64_t i = tid; i < n; i += n_threads) {
      codes[i] = load_bag(paths[i], out + i * stride, fixdim, feat_dim);
    }
  };
  std::vector<std::thread> threads;
  threads.reserve(n_threads);
  for (int t = 0; t < n_threads; ++t) threads.emplace_back(worker, t);
  for (auto& th : threads) th.join();
  for (int64_t i = 0; i < n; ++i)
    if (codes[i] != 0) return codes[i];
  return 0;
}

}  // extern "C"
