// Native runtime kernels for mcrt_tpu (host side).
//
// TPU-native equivalents of the reference's performance-critical native
// components:
//   - obj_*:  fast Wavefront OBJ geometry parser — the role of assimp in the
//     reference's import path (AssetImporter over assimp,
//     source/engine/resource/AssetImporter.h:16-46).  San-Miguel-scale OBJ
//     files are tens of MB; Python line parsing is ~50x slower.
//   - sah_build_blocks: top-down binned-SAH partitioner — the role of the
//     reference's CPU SAH builders (RadeonRays Bvh::Build / FindSahSplit,
//     third_party/RadeonRays/RadeonRays/src/accelerator/bvh.h:39-110) —
//     emitting the *block decomposition* consumed by the Pallas blocked
//     intersector: leaves of <= block_size triangles, DFS order (so
//     consecutive blocks share ancestry and super-block unions stay tight).
//
// Exposed as a plain C ABI for ctypes (no pybind11 in the image).
// Build: make -C native   ->  native/libmcrt_native.so

#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <cmath>
#include <string>
#include <vector>

extern "C" {

// ---------------------------------------------------------------------------
// OBJ parser
// ---------------------------------------------------------------------------

struct ObjData {
  std::vector<float> v;      // (nv, 3)
  std::vector<float> vn;     // (nvn, 3)
  std::vector<float> vt;     // (nvt, 2)
  std::vector<int32_t> f_v;  // (ntri, 3) vertex ids (0-based)
  std::vector<int32_t> f_vt; // (ntri, 3) texcoord ids (-1 = none)
  std::vector<int32_t> f_vn; // (ntri, 3) normal ids (-1 = none)
  std::vector<int32_t> f_m;  // (ntri,) material slot
  std::vector<std::string> mat_names;
  std::vector<std::string> mtl_libs;
};

static const char* skip_ws(const char* p, const char* end) {
  while (p < end && (*p == ' ' || *p == '\t' || *p == '\r')) ++p;
  return p;
}

static const char* next_line(const char* p, const char* end) {
  while (p < end && *p != '\n') ++p;
  return p < end ? p + 1 : end;
}

static const char* parse_float(const char* p, const char* end, float* out) {
  char* q = nullptr;
  *out = strtof(p, &q);
  return q && q <= end ? q : p;
}

// parse one face corner "v", "v/vt", "v//vn", "v/vt/vn"; ids 1-based or
// negative (relative); returns pointer past the corner
static const char* parse_corner(const char* p, const char* end, int32_t nv,
                                int32_t nvt, int32_t nvn, int32_t* vi,
                                int32_t* ti, int32_t* ni) {
  char* q = nullptr;
  long a = strtol(p, &q, 10);
  *vi = a > 0 ? (int32_t)(a - 1) : (int32_t)(nv + a);
  *ti = -1;
  *ni = -1;
  p = q;
  if (p < end && *p == '/') {
    ++p;
    if (p < end && *p != '/') {
      long b = strtol(p, &q, 10);
      *ti = b > 0 ? (int32_t)(b - 1) : (int32_t)(nvt + b);
      p = q;
    }
    if (p < end && *p == '/') {
      ++p;
      long c = strtol(p, &q, 10);
      *ni = c > 0 ? (int32_t)(c - 1) : (int32_t)(nvn + c);
      p = q;
    }
  }
  return p;
}

void* obj_parse(const char* path) {
  FILE* f = fopen(path, "rb");
  if (!f) return nullptr;
  fseek(f, 0, SEEK_END);
  long size = ftell(f);
  fseek(f, 0, SEEK_SET);
  std::string buf;
  buf.resize((size_t)size);
  if (size > 0 && fread(&buf[0], 1, (size_t)size, f) != (size_t)size) {
    fclose(f);
    return nullptr;
  }
  fclose(f);

  ObjData* d = new ObjData();
  const char* p = buf.data();
  const char* end = p + buf.size();
  int32_t cur_mat = -1;
  std::vector<int32_t> cvi, cti, cni;  // polygon corner scratch

  while (p < end) {
    p = skip_ws(p, end);
    const char* eol = p;
    while (eol < end && *eol != '\n') ++eol;
    if (p >= end) break;
    if (p[0] == 'v' && p + 1 < end && p[1] == ' ') {
      float x = 0, y = 0, z = 0;
      const char* q = p + 2;
      q = parse_float(q, eol, &x);
      q = parse_float(q, eol, &y);
      q = parse_float(q, eol, &z);
      d->v.push_back(x);
      d->v.push_back(y);
      d->v.push_back(z);
    } else if (p[0] == 'v' && p + 1 < end && p[1] == 'n' && p + 2 < end &&
               p[2] == ' ') {
      float x = 0, y = 0, z = 0;
      const char* q = p + 3;
      q = parse_float(q, eol, &x);
      q = parse_float(q, eol, &y);
      q = parse_float(q, eol, &z);
      d->vn.push_back(x);
      d->vn.push_back(y);
      d->vn.push_back(z);
    } else if (p[0] == 'v' && p + 1 < end && p[1] == 't' && p + 2 < end &&
               p[2] == ' ') {
      float x = 0, y = 0;
      const char* q = p + 3;
      q = parse_float(q, eol, &x);
      q = parse_float(q, eol, &y);
      d->vt.push_back(x);
      d->vt.push_back(y);
    } else if (p[0] == 'f' && p + 1 < end && p[1] == ' ') {
      cvi.clear();
      cti.clear();
      cni.clear();
      const char* q = p + 1;
      int32_t nv = (int32_t)(d->v.size() / 3);
      int32_t nvt = (int32_t)(d->vt.size() / 2);
      int32_t nvn = (int32_t)(d->vn.size() / 3);
      while (true) {
        q = skip_ws(q, eol);
        if (q >= eol || *q == '\n' || *q == '#') break;
        int32_t vi, ti, ni;
        const char* q2 = parse_corner(q, eol, nv, nvt, nvn, &vi, &ti, &ni);
        if (q2 == q) break;
        q = q2;
        cvi.push_back(vi);
        cti.push_back(ti);
        cni.push_back(ni);
      }
      // polygon fan triangulation (matches the python loader)
      for (size_t k = 2; k < cvi.size(); ++k) {
        d->f_v.push_back(cvi[0]);
        d->f_v.push_back(cvi[k - 1]);
        d->f_v.push_back(cvi[k]);
        d->f_vt.push_back(cti[0]);
        d->f_vt.push_back(cti[k - 1]);
        d->f_vt.push_back(cti[k]);
        d->f_vn.push_back(cni[0]);
        d->f_vn.push_back(cni[k - 1]);
        d->f_vn.push_back(cni[k]);
        d->f_m.push_back(cur_mat);
      }
    } else if (!strncmp(p, "usemtl", 6)) {
      const char* q = skip_ws(p + 6, eol);
      std::string name(q, eol - q);
      while (!name.empty() &&
             (name.back() == '\r' || name.back() == ' ')) name.pop_back();
      cur_mat = -1;
      for (size_t i = 0; i < d->mat_names.size(); ++i)
        if (d->mat_names[i] == name) { cur_mat = (int32_t)i; break; }
      if (cur_mat < 0) {
        cur_mat = (int32_t)d->mat_names.size();
        d->mat_names.push_back(name);
      }
    } else if (!strncmp(p, "mtllib", 6)) {
      const char* q = skip_ws(p + 6, eol);
      std::string name(q, eol - q);
      while (!name.empty() &&
             (name.back() == '\r' || name.back() == ' ')) name.pop_back();
      d->mtl_libs.push_back(name);
    }
    p = next_line(eol, end);
  }
  return d;
}

void obj_counts(void* h, int64_t* nv, int64_t* nvn, int64_t* nvt,
                int64_t* ntri, int64_t* nmat, int64_t* nlib) {
  ObjData* d = (ObjData*)h;
  *nv = (int64_t)(d->v.size() / 3);
  *nvn = (int64_t)(d->vn.size() / 3);
  *nvt = (int64_t)(d->vt.size() / 2);
  *ntri = (int64_t)(d->f_v.size() / 3);
  *nmat = (int64_t)d->mat_names.size();
  *nlib = (int64_t)d->mtl_libs.size();
}

void obj_fill(void* h, float* v, float* vn, float* vt, int32_t* f_v,
              int32_t* f_vt, int32_t* f_vn, int32_t* f_m) {
  ObjData* d = (ObjData*)h;
  memcpy(v, d->v.data(), d->v.size() * sizeof(float));
  memcpy(vn, d->vn.data(), d->vn.size() * sizeof(float));
  memcpy(vt, d->vt.data(), d->vt.size() * sizeof(float));
  memcpy(f_v, d->f_v.data(), d->f_v.size() * sizeof(int32_t));
  memcpy(f_vt, d->f_vt.data(), d->f_vt.size() * sizeof(int32_t));
  memcpy(f_vn, d->f_vn.data(), d->f_vn.size() * sizeof(int32_t));
  memcpy(f_m, d->f_m.data(), d->f_m.size() * sizeof(int32_t));
}

const char* obj_mat_name(void* h, int64_t i) {
  ObjData* d = (ObjData*)h;
  return d->mat_names[(size_t)i].c_str();
}

const char* obj_mtl_lib(void* h, int64_t i) {
  ObjData* d = (ObjData*)h;
  return d->mtl_libs[(size_t)i].c_str();
}

void obj_free(void* h) { delete (ObjData*)h; }

// ---------------------------------------------------------------------------
// Binned-SAH block partitioner
// ---------------------------------------------------------------------------

struct Box {
  float lo[3], hi[3];
  void reset() {
    lo[0] = lo[1] = lo[2] = 3.0e38f;
    hi[0] = hi[1] = hi[2] = -3.0e38f;
  }
  void grow(const float* p) {
    for (int a = 0; a < 3; ++a) {
      if (p[a] < lo[a]) lo[a] = p[a];
      if (p[a] > hi[a]) hi[a] = p[a];
    }
  }
  void grow(const Box& b) {
    for (int a = 0; a < 3; ++a) {
      if (b.lo[a] < lo[a]) lo[a] = b.lo[a];
      if (b.hi[a] > hi[a]) hi[a] = b.hi[a];
    }
  }
  float area() const {
    float dx = hi[0] - lo[0], dy = hi[1] - lo[1], dz = hi[2] - lo[2];
    if (dx < 0 || dy < 0 || dz < 0) return 0.f;
    return 2.f * (dx * dy + dy * dz + dz * dx);
  }
};

// Top-down binned SAH over triangle centroids; recursion splits until a node
// holds <= block_size triangles, then emits the node as a block in DFS order.
// Mirrors Bvh::FindSahSplit's binned cost sweep (bvh.h:39-110) but stops at
// block granularity — the traversal hierarchy itself (block + super AABBs) is
// rebuilt by the Pallas accel packer on top of this ordering.
struct SahCtx {
  const float* cent;   // (n, 3)
  const Box* boxes;    // (n,)
  int32_t* order;      // (n,) permutation being built
  int32_t* block_start;  // capacity n+1
  int32_t n_blocks = 0;
  int32_t emitted = 0;
  int32_t block_size;
  int32_t bins;
};

static void sah_recurse(SahCtx& c, int32_t* ids, int32_t count) {
  if (count <= c.block_size) {
    c.block_start[c.n_blocks++] = c.emitted;
    memcpy(c.order + c.emitted, ids, count * sizeof(int32_t));
    c.emitted += count;
    return;
  }
  // centroid bounds
  Box cb;
  cb.reset();
  for (int32_t i = 0; i < count; ++i) cb.grow(c.cent + 3 * ids[i]);
  int axis = 0;
  float ext[3] = {cb.hi[0] - cb.lo[0], cb.hi[1] - cb.lo[1],
                  cb.hi[2] - cb.lo[2]};
  if (ext[1] > ext[axis]) axis = 1;
  if (ext[2] > ext[axis]) axis = 2;

  int32_t mid = count / 2;
  if (ext[axis] < 1e-12f) {
    // degenerate: median split by index
  } else {
    const int B = c.bins;
    std::vector<Box> bin_box(B);
    std::vector<int32_t> bin_cnt(B, 0);
    for (int b = 0; b < B; ++b) bin_box[b].reset();
    float scale = (float)B / ext[axis];
    for (int32_t i = 0; i < count; ++i) {
      int b = (int)((c.cent[3 * ids[i] + axis] - cb.lo[axis]) * scale);
      if (b >= B) b = B - 1;
      if (b < 0) b = 0;
      bin_cnt[b]++;
      bin_box[b].grow(c.boxes[ids[i]]);
    }
    // suffix sweep
    std::vector<float> right_area(B);
    std::vector<int32_t> right_cnt(B);
    Box acc;
    acc.reset();
    int32_t cnt = 0;
    for (int b = B - 1; b >= 1; --b) {
      acc.grow(bin_box[b]);
      cnt += bin_cnt[b];
      right_area[b] = acc.area();
      right_cnt[b] = cnt;
    }
    // prefix sweep: pick min SAH cost split
    float best_cost = 3.0e38f;
    int best_b = -1;
    acc.reset();
    cnt = 0;
    for (int b = 0; b < B - 1; ++b) {
      acc.grow(bin_box[b]);
      cnt += bin_cnt[b];
      if (cnt == 0 || cnt == count) continue;
      float cost = acc.area() * (float)cnt +
                   right_area[b + 1] * (float)right_cnt[b + 1];
      if (cost < best_cost) {
        best_cost = cost;
        best_b = b;
      }
    }
    if (best_b >= 0) {
      // in-place partition by bin id
      float split = cb.lo[axis] + (best_b + 1) * ext[axis] / (float)c.bins;
      int32_t i = 0, j = count - 1;
      while (i <= j) {
        if (c.cent[3 * ids[i] + axis] <= split) {
          ++i;
        } else {
          int32_t t = ids[i];
          ids[i] = ids[j];
          ids[j] = t;
          --j;
        }
      }
      if (i > 0 && i < count) mid = i;
    }
  }
  sah_recurse(c, ids, mid);
  sah_recurse(c, ids + mid, count - mid);
}

// positions: (nv, 3) f32; indices: (ntri, 3) i32.
// out_order: (ntri,) permutation; out_block_start: (ntri + 1,) block offsets
// (n_blocks + 1 entries used).  Returns n_blocks.
int32_t sah_build_blocks(const float* positions, const int32_t* indices,
                         int32_t ntri, int32_t block_size, int32_t bins,
                         int32_t* out_order, int32_t* out_block_start) {
  std::vector<float> cent((size_t)ntri * 3);
  std::vector<Box> boxes((size_t)ntri);
  for (int32_t i = 0; i < ntri; ++i) {
    Box& b = boxes[i];
    b.reset();
    for (int k = 0; k < 3; ++k) b.grow(positions + 3 * indices[3 * i + k]);
    for (int a = 0; a < 3; ++a) cent[3 * i + a] = 0.5f * (b.lo[a] + b.hi[a]);
  }
  std::vector<int32_t> ids((size_t)ntri);
  for (int32_t i = 0; i < ntri; ++i) ids[i] = i;

  SahCtx c;
  c.cent = cent.data();
  c.boxes = boxes.data();
  c.order = out_order;
  c.block_start = out_block_start;
  c.block_size = block_size;
  c.bins = bins < 2 ? 2 : bins;
  sah_recurse(c, ids.data(), ntri);
  c.block_start[c.n_blocks] = c.emitted;
  return c.n_blocks;
}

}  // extern "C"
