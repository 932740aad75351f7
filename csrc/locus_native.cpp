// locus_native: host-side native runtime for locus_tpu.
//
// The reference's runtime is a C++ ROS graph (nodelets, TCPROS,
// AsyncSpinner queues). The TPU build's host runtime needs: fast PCD
// parsing, fixed-shape scan packing, and a threaded prefetch pipeline
// that keeps the device fed without per-scan Python work (SURVEY §7.3
// "host-side streaming"). Exposed as a C ABI consumed via ctypes
// (pybind11 is not available in this image).
//
// Build: g++ -O3 -march=native -shared -fPIC -o liblocus_native.so \
//            locus_native.cpp -lpthread
#include <array>
#include <atomic>
#include <cctype>
#include <cmath>
#include <condition_variable>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <deque>
#include <mutex>
#include <string>
#include <thread>
#include <unordered_map>
#include <vector>

extern "C" {

// ---------------------------------------------------------------------------
// PCD parsing
// ---------------------------------------------------------------------------

struct PcdCloud {
  std::vector<float> xyz;        // 3*n
  std::vector<float> normals;    // 3*n or empty
  std::vector<float> intensity;  // n or empty
  int64_t n = 0;
  bool has_normals = false;
  bool has_intensity = false;
};

static bool parse_pcd_impl(const char* path, PcdCloud* out) {
  FILE* f = fopen(path, "rb");
  if (!f) return false;
  char line[4096];
  std::vector<std::string> fields;
  std::vector<int> sizes, counts;
  std::vector<char> types;
  int64_t n = 0;
  std::string mode;
  while (fgets(line, sizeof line, f)) {
    std::string s(line);
    while (!s.empty() && (s.back() == '\n' || s.back() == '\r')) s.pop_back();
    if (s.empty() || s[0] == '#') continue;
    auto sp = s.find(' ');
    std::string key = s.substr(0, sp);
    std::string val = sp == std::string::npos ? "" : s.substr(sp + 1);
    auto split = [](const std::string& v) {
      std::vector<std::string> r;
      size_t i = 0;
      while (i < v.size()) {
        while (i < v.size() && isspace((unsigned char)v[i])) i++;
        size_t j = i;
        while (j < v.size() && !isspace((unsigned char)v[j])) j++;
        if (j > i) r.push_back(v.substr(i, j - i));
        i = j;
      }
      return r;
    };
    if (key == "FIELDS") fields = split(val);
    else if (key == "SIZE") { for (auto& t : split(val)) sizes.push_back(atoi(t.c_str())); }
    else if (key == "TYPE") { for (auto& t : split(val)) types.push_back(t[0]); }
    else if (key == "COUNT") { for (auto& t : split(val)) counts.push_back(atoi(t.c_str())); }
    else if (key == "POINTS") n = atoll(val.c_str());
    else if (key == "DATA") { mode = val; break; }
  }
  if (counts.empty()) counts.assign(fields.size(), 1);
  if (n <= 0 || fields.empty() || mode.empty()) { fclose(f); return false; }

  int fx = -1, fy = -1, fz = -1, fi = -1, fnx = -1, fny = -1, fnz = -1;
  std::vector<int> offsets(fields.size(), 0);
  int stride = 0;
  for (size_t k = 0; k < fields.size(); k++) {
    offsets[k] = stride;
    stride += sizes[k] * counts[k];
    if (fields[k] == "x") fx = (int)k;
    else if (fields[k] == "y") fy = (int)k;
    else if (fields[k] == "z") fz = (int)k;
    else if (fields[k] == "intensity") fi = (int)k;
    else if (fields[k] == "normal_x") fnx = (int)k;
    else if (fields[k] == "normal_y") fny = (int)k;
    else if (fields[k] == "normal_z") fnz = (int)k;
  }
  if (fx < 0 || fy < 0 || fz < 0) { fclose(f); return false; }

  out->n = n;
  out->xyz.resize(3 * n);
  out->has_normals = fnx >= 0 && fny >= 0 && fnz >= 0;
  out->has_intensity = fi >= 0;
  if (out->has_normals) out->normals.resize(3 * n);
  if (out->has_intensity) out->intensity.resize(n);

  auto fetch_f32 = [&](const char* rec, int fld) -> float {
    float v;
    memcpy(&v, rec + offsets[fld], 4);
    return v;
  };

  if (mode == "binary") {
    std::vector<char> buf((size_t)stride * n);
    if (fread(buf.data(), 1, buf.size(), f) != buf.size()) { fclose(f); return false; }
    for (int64_t i = 0; i < n; i++) {
      const char* rec = buf.data() + (size_t)i * stride;
      out->xyz[3 * i + 0] = fetch_f32(rec, fx);
      out->xyz[3 * i + 1] = fetch_f32(rec, fy);
      out->xyz[3 * i + 2] = fetch_f32(rec, fz);
      if (out->has_normals) {
        out->normals[3 * i + 0] = fetch_f32(rec, fnx);
        out->normals[3 * i + 1] = fetch_f32(rec, fny);
        out->normals[3 * i + 2] = fetch_f32(rec, fnz);
      }
      if (out->has_intensity) out->intensity[i] = fetch_f32(rec, fi);
    }
  } else if (mode == "ascii") {
    int total_cols = 0;
    for (size_t k = 0; k < fields.size(); k++) total_cols += counts[k];
    std::vector<int> colof(fields.size());
    { int c = 0; for (size_t k = 0; k < fields.size(); k++) { colof[k] = c; c += counts[k]; } }
    std::vector<double> row(total_cols);
    for (int64_t i = 0; i < n; i++) {
      for (int c = 0; c < total_cols; c++)
        if (fscanf(f, "%lf", &row[c]) != 1) { fclose(f); return false; }
      out->xyz[3 * i + 0] = (float)row[colof[fx]];
      out->xyz[3 * i + 1] = (float)row[colof[fy]];
      out->xyz[3 * i + 2] = (float)row[colof[fz]];
      if (out->has_normals) {
        out->normals[3 * i + 0] = (float)row[colof[fnx]];
        out->normals[3 * i + 1] = (float)row[colof[fny]];
        out->normals[3 * i + 2] = (float)row[colof[fnz]];
      }
      if (out->has_intensity) out->intensity[i] = (float)row[colof[fi]];
    }
  } else {
    fclose(f);
    return false;
  }
  fclose(f);
  return true;
}

void* pcd_open(const char* path) {
  auto* c = new PcdCloud();
  if (!parse_pcd_impl(path, c)) { delete c; return nullptr; }
  return c;
}
int64_t pcd_size(void* h) { return ((PcdCloud*)h)->n; }
int pcd_has_normals(void* h) { return ((PcdCloud*)h)->has_normals ? 1 : 0; }
int pcd_has_intensity(void* h) { return ((PcdCloud*)h)->has_intensity ? 1 : 0; }
void pcd_read(void* h, float* xyz, float* normals, float* intensity) {
  auto* c = (PcdCloud*)h;
  memcpy(xyz, c->xyz.data(), c->xyz.size() * 4);
  if (normals && c->has_normals) memcpy(normals, c->normals.data(), c->normals.size() * 4);
  if (intensity && c->has_intensity) memcpy(intensity, c->intensity.data(), c->intensity.size() * 4);
}
void pcd_close(void* h) { delete (PcdCloud*)h; }

// ---------------------------------------------------------------------------
// Fixed-shape scan packing (pad/truncate + sentinel) — the hot host op.
// ---------------------------------------------------------------------------

void pack_scan(const float* xyz_in, const uint8_t* valid, int64_t n,
               int64_t capacity, float pad_coord, float* xyz_out,
               uint8_t* mask_out) {
  int64_t w = 0;
  for (int64_t i = 0; i < n && w < capacity; i++) {
    if (valid && !valid[i]) continue;
    xyz_out[3 * w + 0] = xyz_in[3 * i + 0];
    xyz_out[3 * w + 1] = xyz_in[3 * i + 1];
    xyz_out[3 * w + 2] = xyz_in[3 * i + 2];
    mask_out[w] = 1;
    w++;
  }
  for (int64_t i = w; i < capacity; i++) {
    xyz_out[3 * i + 0] = pad_coord;
    xyz_out[3 * i + 1] = pad_coord;
    xyz_out[3 * i + 2] = pad_coord;
    mask_out[i] = 0;
  }
}

// ---------------------------------------------------------------------------
// Host voxel downsample (unordered_map reference; GT-map preprocessing)
// ---------------------------------------------------------------------------

int64_t voxel_downsample_host(const float* xyz, int64_t n, float leaf,
                              float* out_xyz, int64_t capacity) {
  std::unordered_map<uint64_t, std::pair<int64_t, std::array<double, 3>>> cells;
  cells.reserve((size_t)n);
  const double inv = 1.0 / leaf;
  for (int64_t i = 0; i < n; i++) {
    int64_t ix = (int64_t)std::floor(xyz[3 * i + 0] * inv) + (1 << 20);
    int64_t iy = (int64_t)std::floor(xyz[3 * i + 1] * inv) + (1 << 20);
    int64_t iz = (int64_t)std::floor(xyz[3 * i + 2] * inv) + (1 << 20);
    uint64_t key = ((uint64_t)ix << 42) | ((uint64_t)iy << 21) | (uint64_t)iz;
    auto& cell = cells[key];
    cell.first++;
    cell.second[0] += xyz[3 * i + 0];
    cell.second[1] += xyz[3 * i + 1];
    cell.second[2] += xyz[3 * i + 2];
  }
  int64_t w = 0;
  for (auto& kv : cells) {
    if (w >= capacity) break;
    out_xyz[3 * w + 0] = (float)(kv.second.second[0] / kv.second.first);
    out_xyz[3 * w + 1] = (float)(kv.second.second[1] / kv.second.first);
    out_xyz[3 * w + 2] = (float)(kv.second.second[2] / kv.second.first);
    w++;
  }
  return w;
}

// ---------------------------------------------------------------------------
// Threaded scan prefetcher: npz-free raw float dumps or PCDs on disk ->
// packed fixed-shape buffers served FIFO. (The AsyncSpinner analog.)
// ---------------------------------------------------------------------------

struct Prefetcher {
  int64_t capacity;
  float pad_coord;
  size_t max_queue;
  std::deque<std::string> files;
  std::deque<std::pair<std::vector<float>, std::vector<uint8_t>>> ready;
  std::mutex mu;
  std::condition_variable cv_ready, cv_space;
  std::thread worker;
  std::atomic<bool> stop{false};
  std::atomic<bool> done{false};

  void run() {
    for (;;) {
      std::string path;
      {
        std::unique_lock<std::mutex> lk(mu);
        if (stop) break;
        if (files.empty()) { done = true; cv_ready.notify_all(); break; }
        path = files.front();
        files.pop_front();
      }
      PcdCloud c;
      std::vector<float> xyz(3 * capacity);
      std::vector<uint8_t> mask(capacity);
      if (parse_pcd_impl(path.c_str(), &c)) {
        pack_scan(c.xyz.data(), nullptr, c.n, capacity, pad_coord, xyz.data(),
                  mask.data());
      } else {
        pack_scan(nullptr, nullptr, 0, capacity, pad_coord, xyz.data(), mask.data());
      }
      {
        std::unique_lock<std::mutex> lk(mu);
        cv_space.wait(lk, [&] { return ready.size() < max_queue || stop; });
        if (stop) break;
        ready.emplace_back(std::move(xyz), std::move(mask));
        cv_ready.notify_one();
      }
    }
  }
};

void* prefetcher_create(int64_t capacity, int64_t max_queue, float pad_coord) {
  auto* p = new Prefetcher();
  p->capacity = capacity;
  p->max_queue = (size_t)max_queue;
  p->pad_coord = pad_coord;
  return p;
}

void prefetcher_add_files(void* h, const char** paths, int64_t count) {
  auto* p = (Prefetcher*)h;
  std::unique_lock<std::mutex> lk(p->mu);
  for (int64_t i = 0; i < count; i++) p->files.emplace_back(paths[i]);
}

void prefetcher_start(void* h) {
  auto* p = (Prefetcher*)h;
  p->worker = std::thread([p] { p->run(); });
}

// Returns 1 on success, 0 when drained.
int prefetcher_next(void* h, float* xyz_out, uint8_t* mask_out) {
  auto* p = (Prefetcher*)h;
  std::unique_lock<std::mutex> lk(p->mu);
  p->cv_ready.wait(lk, [&] { return !p->ready.empty() || p->done || p->stop; });
  if (p->ready.empty()) return 0;
  auto& item = p->ready.front();
  memcpy(xyz_out, item.first.data(), item.first.size() * 4);
  memcpy(mask_out, item.second.data(), item.second.size());
  p->ready.pop_front();
  p->cv_space.notify_one();
  return 1;
}

void prefetcher_destroy(void* h) {
  auto* p = (Prefetcher*)h;
  {
    std::unique_lock<std::mutex> lk(p->mu);
    p->stop = true;
    p->cv_ready.notify_all();
    p->cv_space.notify_all();
  }
  if (p->worker.joinable()) p->worker.join();
  delete p;
}

}  // extern "C"
