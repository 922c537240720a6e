// Host-side native runtime for multiview_motion_capture_tpu.
//
// The TPU owns the compute path (JAX/XLA); this library owns the host-side
// hot paths that the reference delegated to external native code
// (SURVEY.md §2.2): the OpenPose-JSON data loader (reference: Python json
// module per frame, ref:src/motion_capture.py:974-984), the Hungarian
// assignment used by the greedy association fallback (reference: scipy
// linear_sum_assignment, ref:src/motion_capture.py:206,867), and the
// transitive-closure group extraction used when association results are
// post-processed on host (reference: numpy triple loop,
// ref:src/mv_association.py:99-121).
//
// Exposed as a C ABI for ctypes (no pybind11 in the image).
//
// Build: make -C native   (produces libmvmc_native.so)

#include <algorithm>
#include <cctype>
#include <functional>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <limits>
#include <string>
#include <vector>

extern "C" {

// ---------------------------------------------------------------------------
// 1. OpenPose BODY_25 JSON keypoint parser
// ---------------------------------------------------------------------------
// A minimal special-purpose scanner: finds every "pose_keypoints_2d" array in
// the document and parses its 75 floats. Orders of magnitude faster than a
// generic JSON parse for the ingest loop, and robust to the irrelevant
// fields OpenPose emits.
//
// Returns the number of people parsed (capped at max_people); writes
// max_people*25*3 floats into `out` (row-major person x joint x (x,y,score)).

static const char* find_key(const char* p, const char* end, const char* key) {
  const size_t klen = std::strlen(key);
  while (p + klen < end) {
    p = static_cast<const char*>(memchr(p, '"', end - p));
    if (!p) return nullptr;
    ++p;
    if (p + klen <= end && std::memcmp(p, key, klen) == 0 && p[klen] == '"') {
      return p + klen + 1;  // past closing quote
    }
  }
  return nullptr;
}

int mvmc_parse_openpose_json(const char* text, int64_t len, int max_people,
                             float* out /* max_people*25*3 */) {
  const char* p = text;
  const char* end = text + len;
  int person = 0;
  while (person < max_people) {
    p = find_key(p, end, "pose_keypoints_2d");
    if (!p) break;
    // skip to '['
    while (p < end && *p != '[') ++p;
    if (p >= end) break;
    ++p;
    float* dst = out + static_cast<int64_t>(person) * 75;
    int n = 0;
    while (p < end && n < 75) {
      char* next = nullptr;
      float v = std::strtof(p, &next);
      if (next == p) {
        if (*p == ']') break;
        ++p;
        continue;
      }
      dst[n++] = v;
      p = next;
    }
    if (n == 75) ++person;
    // else: malformed entry; skip it
  }
  return person;
}

// Parse a whole file from disk (avoids shipping bytes through Python).
int mvmc_parse_openpose_file(const char* path, int max_people, float* out) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return -1;
  std::fseek(f, 0, SEEK_END);
  long size = std::ftell(f);
  std::fseek(f, 0, SEEK_SET);
  std::string buf(static_cast<size_t>(size), '\0');
  size_t got = std::fread(buf.data(), 1, static_cast<size_t>(size), f);
  std::fclose(f);
  if (got != static_cast<size_t>(size)) return -1;
  return mvmc_parse_openpose_json(buf.data(), size, max_people, out);
}

// ---------------------------------------------------------------------------
// 2. Hungarian assignment (Jonker-Volgenant style shortest augmenting path)
// ---------------------------------------------------------------------------
// Minimizes sum cost[i, assign[i]] over an n x m cost matrix (n <= m).
// assign[i] = column of row i, or -1 when n > m rows stay unassigned.
// O(n^2 m); exact.

void mvmc_hungarian(const double* cost, int n, int m, int* row_assign) {
  const double INF = std::numeric_limits<double>::infinity();
  // pad conceptually: we require n <= m; if not, caller transposes.
  std::vector<double> u(n + 1, 0.0), v(m + 1, 0.0);
  std::vector<int> p(m + 1, 0), way(m + 1, 0);  // p[j]: row matched to col j (1-based)
  for (int i = 1; i <= n; ++i) {
    p[0] = i;
    int j0 = 0;
    std::vector<double> minv(m + 1, INF);
    std::vector<char> used(m + 1, false);
    do {
      used[j0] = true;
      int i0 = p[j0], j1 = -1;
      double delta = INF;
      for (int j = 1; j <= m; ++j) {
        if (used[j]) continue;
        double cur = cost[(i0 - 1) * m + (j - 1)] - u[i0] - v[j];
        if (cur < minv[j]) {
          minv[j] = cur;
          way[j] = j0;
        }
        if (minv[j] < delta) {
          delta = minv[j];
          j1 = j;
        }
      }
      for (int j = 0; j <= m; ++j) {
        if (used[j]) {
          u[p[j]] += delta;
          v[j] -= delta;
        } else {
          minv[j] -= delta;
        }
      }
      j0 = j1;
    } while (p[j0] != 0);
    do {
      int j1 = way[j0];
      p[j0] = p[j1];
      j0 = j1;
    } while (j0);
  }
  for (int i = 0; i < n; ++i) row_assign[i] = -1;
  for (int j = 1; j <= m; ++j) {
    if (p[j] > 0) row_assign[p[j] - 1] = j - 1;
  }
}

// ---------------------------------------------------------------------------
// 3. Transitive closure + group extraction
// ---------------------------------------------------------------------------
// Union-find over the binarized match relation; writes for each element the
// lowest-index member of its connected component (`rep`) and the component
// size — the same contract as ops/association.extract_groups.

void mvmc_extract_groups(const uint8_t* x_bin, const uint8_t* valid, int n,
                         int32_t* rep, int32_t* group_size) {
  std::vector<int> parent(n);
  for (int i = 0; i < n; ++i) parent[i] = i;
  std::function<int(int)> find = [&](int a) {
    while (parent[a] != a) {
      parent[a] = parent[parent[a]];
      a = parent[a];
    }
    return a;
  };
  for (int i = 0; i < n; ++i) {
    if (!valid[i]) continue;
    for (int j = i + 1; j < n; ++j) {
      if (!valid[j]) continue;
      if (x_bin[i * n + j] || x_bin[j * n + i]) {
        int ra = find(i), rb = find(j);
        if (ra != rb) parent[std::max(ra, rb)] = std::min(ra, rb);
      }
    }
  }
  std::vector<int32_t> size(n, 0);
  for (int i = 0; i < n; ++i) {
    if (!valid[i]) {
      rep[i] = n;
      continue;
    }
    rep[i] = find(i);
    size[rep[i]]++;
  }
  for (int i = 0; i < n; ++i) {
    group_size[i] = valid[i] ? size[rep[i]] : 0;
  }
}

}  // extern "C"
