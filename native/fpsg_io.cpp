// fpsg_io — native data-loading kernels for the host-side corpus preload.
//
// The reference preloads every class's files through Python readers at
// dataset construction (minutes for ModelNet — SURVEY.md §1 data flow,
// reference src/datasets/modelnet.py:130-153). This library provides the
// same primitives as fpsg_tpu/data/readers.py + mesh.py with a C ABI for
// ctypes, multithreaded over files:
//
//   - ASCII PLY vertex parsing (capped vertex count, reference semantics)
//   - OFF parsing + area-weighted mesh surface sampling (PCL replacement)
//   - pad-by-resample + unit-ball normalization
//   - batch loader: many PLY files -> one packed (n_files, n_pts, 3) buffer
//
// Build: `make -C native` -> native/build/libfpsg_io.so
// Python binding: fpsg_tpu/io/native.py (pure-Python fallback kept).

#include <algorithm>
#include <atomic>
#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <fstream>
#include <random>
#include <sstream>
#include <string>
#include <thread>
#include <vector>

extern "C" {

// Parse an ASCII PLY, reading min(vertex_count, max_pts) vertices.
// Returns number of points written to out (out has room for max_pts * 3),
// or -1 on error.
int fpsg_read_ply(const char* path, float* out, int max_pts) {
  std::ifstream f(path);
  if (!f.is_open()) return -1;
  std::string line;
  long n_verts = max_pts;
  while (std::getline(f, line)) {
    // strip trailing whitespace/CR
    while (!line.empty() && (line.back() == '\r' || line.back() == ' '))
      line.pop_back();
    if (line == "end_header") break;
    if (line.rfind("element vertex", 0) == 0) {
      long v = std::strtol(line.c_str() + 14, nullptr, 10);
      n_verts = std::min<long>(v, max_pts);
    }
    if (f.eof()) return -1;
  }
  long count = 0;
  for (; count < n_verts; ++count) {
    if (!std::getline(f, line)) break;
    const char* p = line.c_str();
    char* end;
    for (int k = 0; k < 3; ++k) {
      float v = std::strtof(p, &end);
      if (end == p) return -1;
      out[count * 3 + k] = v;
      p = end;
    }
  }
  return static_cast<int>(count);
}

// Pad (by uniform resampling of existing rows, seeded) to n_pts, center,
// scale to the unit ball. In/out buffer sized n_pts*3, `n` valid rows.
void fpsg_pad_normalize(float* pts, int n, int n_pts, uint64_t seed) {
  std::mt19937_64 rng(seed);
  if (n <= 0) return;
  for (int i = n; i < n_pts; ++i) {
    int j = static_cast<int>(rng() % static_cast<uint64_t>(n));
    std::memcpy(pts + i * 3, pts + j * 3, 3 * sizeof(float));
  }
  double cx = 0, cy = 0, cz = 0;
  for (int i = 0; i < n_pts; ++i) {
    cx += pts[i * 3]; cy += pts[i * 3 + 1]; cz += pts[i * 3 + 2];
  }
  cx /= n_pts; cy /= n_pts; cz /= n_pts;
  double max_d = 0;
  for (int i = 0; i < n_pts; ++i) {
    pts[i * 3] -= static_cast<float>(cx);
    pts[i * 3 + 1] -= static_cast<float>(cy);
    pts[i * 3 + 2] -= static_cast<float>(cz);
    double d = std::sqrt(
        double(pts[i * 3]) * pts[i * 3] +
        double(pts[i * 3 + 1]) * pts[i * 3 + 1] +
        double(pts[i * 3 + 2]) * pts[i * 3 + 2]);
    max_d = std::max(max_d, d);
  }
  if (max_d < 1e-12) max_d = 1e-12;
  float inv = static_cast<float>(1.0 / max_d);
  for (int i = 0; i < n_pts * 3; ++i) pts[i] *= inv;
}

// Batch load: paths is a \n-joined list; out is (n_files, n_pts, 3).
// normalize!=0 applies pad+unit-ball per cloud. Threaded over files.
// Returns number of successfully parsed files (failed slots zero-filled,
// status[i] = points read or -1).
int fpsg_load_ply_batch(const char* joined_paths, int n_files, float* out,
                        int n_pts, int normalize, uint64_t seed,
                        int n_threads, int* status) {
  std::vector<std::string> paths;
  paths.reserve(n_files);
  {
    std::stringstream ss(joined_paths);
    std::string item;
    while (std::getline(ss, item, '\n')) paths.push_back(item);
  }
  if (static_cast<int>(paths.size()) != n_files) return -1;

  std::atomic<int> next(0), ok(0);
  auto worker = [&]() {
    for (;;) {
      int i = next.fetch_add(1);
      if (i >= n_files) return;
      float* slot = out + static_cast<size_t>(i) * n_pts * 3;
      std::memset(slot, 0, sizeof(float) * n_pts * 3);
      int n = fpsg_read_ply(paths[i].c_str(), slot, n_pts);
      status[i] = n;
      if (n > 0) {
        if (normalize) fpsg_pad_normalize(slot, n, n_pts, seed + i);
        ok.fetch_add(1);
      }
    }
  };
  int t = n_threads > 0 ? n_threads
                        : std::max(1u, std::thread::hardware_concurrency());
  std::vector<std::thread> pool;
  for (int i = 0; i < t; ++i) pool.emplace_back(worker);
  for (auto& th : pool) th.join();
  return ok.load();
}

// OFF parsing: fills verts (cap_v*3) and triangulated faces (cap_f*3).
// Returns 0 on success; writes actual counts.
int fpsg_read_off(const char* path, float* verts, int cap_v, int* faces,
                  int cap_f, int* n_verts_out, int* n_faces_out) {
  std::ifstream f(path);
  if (!f.is_open()) return -1;
  std::string header;
  if (!std::getline(f, header)) return -1;
  while (!header.empty() && (header.back() == '\r' || header.back() == ' '))
    header.pop_back();
  long nv, nf, ne;
  if (header == "OFF") {
    if (!(f >> nv >> nf >> ne)) return -1;
  } else if (header.rfind("OFF", 0) == 0) {
    std::stringstream ss(header.substr(3));
    if (!(ss >> nv >> nf >> ne)) return -1;
  } else {
    return -1;
  }
  if (nv > cap_v) return -2;
  for (long i = 0; i < nv; ++i)
    if (!(f >> verts[i * 3] >> verts[i * 3 + 1] >> verts[i * 3 + 2]))
      return -1;
  long out_f = 0;
  for (long i = 0; i < nf; ++i) {
    int k;
    if (!(f >> k)) return -1;
    std::vector<int> poly(k);
    for (int j = 0; j < k; ++j) {
      if (!(f >> poly[j])) return -1;
      if (poly[j] < 0 || poly[j] >= nv) return -1;  // malformed face index
    }
    for (int j = 1; j < k - 1; ++j) {
      if (out_f >= cap_f) return -2;
      faces[out_f * 3] = poly[0];
      faces[out_f * 3 + 1] = poly[j];
      faces[out_f * 3 + 2] = poly[j + 1];
      ++out_f;
    }
  }
  *n_verts_out = static_cast<int>(nv);
  *n_faces_out = static_cast<int>(out_f);
  return 0;
}

// Area-weighted surface sampling (PCL pcl_mesh_sampling replacement).
void fpsg_sample_mesh(const float* verts, int n_verts, const int* faces,
                      int n_faces, float* out, int n_points, uint64_t seed) {
  (void)n_verts;
  if (n_faces <= 0) {  // empty mesh: no faces to sample from
    std::fill(out, out + static_cast<size_t>(n_points) * 3, 0.0f);
    return;
  }
  std::vector<double> cum(n_faces);
  double total = 0;
  for (int i = 0; i < n_faces; ++i) {
    const float* a = verts + faces[i * 3] * 3;
    const float* b = verts + faces[i * 3 + 1] * 3;
    const float* c = verts + faces[i * 3 + 2] * 3;
    double ux = b[0] - a[0], uy = b[1] - a[1], uz = b[2] - a[2];
    double vx = c[0] - a[0], vy = c[1] - a[1], vz = c[2] - a[2];
    double cxp = uy * vz - uz * vy, cyp = uz * vx - ux * vz,
           czp = ux * vy - uy * vx;
    total += 0.5 * std::sqrt(cxp * cxp + cyp * cyp + czp * czp);
    cum[i] = total;
  }
  std::mt19937_64 rng(seed);
  std::uniform_real_distribution<double> uni(0.0, 1.0);
  for (int i = 0; i < n_points; ++i) {
    int tri = 0;
    if (total > 0) {
      double r = uni(rng) * total;
      tri = static_cast<int>(
          std::lower_bound(cum.begin(), cum.end(), r) - cum.begin());
      tri = std::min(tri, n_faces - 1);
    } else {
      tri = static_cast<int>(rng() % static_cast<uint64_t>(n_faces));
    }
    const float* a = verts + faces[tri * 3] * 3;
    const float* b = verts + faces[tri * 3 + 1] * 3;
    const float* c = verts + faces[tri * 3 + 2] * 3;
    double u = uni(rng), v = uni(rng);
    if (u + v > 1) { u = 1 - u; v = 1 - v; }
    for (int k = 0; k < 3; ++k)
      out[i * 3 + k] = static_cast<float>(
          a[k] + u * (b[k] - a[k]) + v * (c[k] - a[k]));
  }
}

}  // extern "C"
