// Fast Wavefront OBJ reader/writer (native data-loader).
//
// The reference loads multi-megabyte OBJ point shells through Python line
// parsing (ParticleData.py:130-138; model/box_boundry.obj has ~25k vertices,
// sphere_boundry.obj ~125k lines).  This module parses OBJ files at
// ~hundreds of MB/s with a single pass over a memory buffer, exposed to
// Python through a plain C ABI (ctypes — no pybind11 dependency).
//
// Exports:
//   obj_parse(path, &verts, &nverts, &faces, &nfaces) -> 0 on success
//     verts: malloc'd float[3 * nverts]; faces: malloc'd int32[3 * nfaces]
//     (polygons are fan-triangulated, indices 0-based)
//   obj_free(ptr)
//   obj_write(path, verts, nverts, faces, nfaces) -> 0 on success

#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <vector>

namespace {

// fast float parse (strtof is fine; avoid locale issues by manual parse of
// the common fixed-notation case, falling back to strtof)
inline const char* skip_ws(const char* p, const char* end) {
  while (p < end && (*p == ' ' || *p == '\t' || *p == '\r')) ++p;
  return p;
}

inline const char* parse_float(const char* p, const char* end, float* out) {
  char* q = nullptr;
  *out = strtof(p, &q);
  if (q == p || q > end) return nullptr;
  return q;
}

inline const char* parse_int(const char* p, const char* end, long* out) {
  char* q = nullptr;
  *out = strtol(p, &q, 10);
  if (q == p || q > end) return nullptr;
  return q;
}

}  // namespace

extern "C" {

int obj_parse(const char* path, float** verts_out, int64_t* nverts_out,
              int32_t** faces_out, int64_t* nfaces_out) {
  FILE* f = fopen(path, "rb");
  if (!f) return 1;
  fseek(f, 0, SEEK_END);
  long size = ftell(f);
  fseek(f, 0, SEEK_SET);
  std::vector<char> buf(static_cast<size_t>(size) + 1);
  if (size > 0 && fread(buf.data(), 1, static_cast<size_t>(size), f) !=
                      static_cast<size_t>(size)) {
    fclose(f);
    return 2;
  }
  fclose(f);
  buf[static_cast<size_t>(size)] = '\n';
  const char* p = buf.data();
  const char* end = p + size;

  std::vector<float> verts;
  std::vector<int32_t> faces;
  std::vector<long> poly;
  verts.reserve(1 << 16);

  while (p < end) {
    const char* line_end = static_cast<const char*>(memchr(p, '\n', end - p));
    if (!line_end) line_end = end;
    const char* q = skip_ws(p, line_end);
    if (q + 1 < line_end && q[0] == 'v' &&
        (q[1] == ' ' || q[1] == '\t')) {
      float x = 0, y = 0, z = 0;
      const char* r = q + 2;
      if ((r = parse_float(r, line_end, &x)) &&
          (r = parse_float(r, line_end, &y)) &&
          (r = parse_float(r, line_end, &z))) {
        verts.push_back(x);
        verts.push_back(y);
        verts.push_back(z);
      }
    } else if (q + 1 < line_end && q[0] == 'f' &&
               (q[1] == ' ' || q[1] == '\t')) {
      poly.clear();
      const char* r = q + 2;
      while (r && r < line_end) {
        r = skip_ws(r, line_end);
        if (r >= line_end) break;
        long idx = 0;
        const char* s = parse_int(r, line_end, &idx);
        if (!s) break;
        poly.push_back(idx);
        // skip texture/normal refs: advance past non-space
        r = s;
        while (r < line_end && *r != ' ' && *r != '\t') ++r;
      }
      // fan-triangulate, 1-based -> 0-based (negative = relative)
      const long nv = static_cast<long>(verts.size() / 3);
      for (size_t k = 2; k < poly.size(); ++k) {
        long a = poly[0], b = poly[k - 1], c = poly[k];
        a = a > 0 ? a - 1 : nv + a;
        b = b > 0 ? b - 1 : nv + b;
        c = c > 0 ? c - 1 : nv + c;
        faces.push_back(static_cast<int32_t>(a));
        faces.push_back(static_cast<int32_t>(b));
        faces.push_back(static_cast<int32_t>(c));
      }
    }
    p = line_end + 1;
  }

  *nverts_out = static_cast<int64_t>(verts.size() / 3);
  *nfaces_out = static_cast<int64_t>(faces.size() / 3);
  *verts_out = static_cast<float*>(malloc(verts.size() * sizeof(float)));
  *faces_out = static_cast<int32_t*>(malloc(faces.size() * sizeof(int32_t)));
  if ((!*verts_out && !verts.empty()) || (!*faces_out && !faces.empty()))
    return 3;
  if (!verts.empty())
    memcpy(*verts_out, verts.data(), verts.size() * sizeof(float));
  if (!faces.empty())
    memcpy(*faces_out, faces.data(), faces.size() * sizeof(int32_t));
  return 0;
}

void obj_free(void* p) { free(p); }

int obj_write(const char* path, const float* verts, int64_t nverts,
              const int32_t* faces, int64_t nfaces) {
  FILE* f = fopen(path, "wb");
  if (!f) return 1;
  std::vector<char> iobuf(1 << 20);
  setvbuf(f, iobuf.data(), _IOFBF, iobuf.size());
  for (int64_t i = 0; i < nverts; ++i) {
    fprintf(f, "v %.6f %.6f %.6f\n", verts[3 * i], verts[3 * i + 1],
            verts[3 * i + 2]);
  }
  for (int64_t i = 0; i < nfaces; ++i) {
    fprintf(f, "f %d %d %d\n", faces[3 * i] + 1, faces[3 * i + 1] + 1,
            faces[3 * i + 2] + 1);
  }
  fclose(f);
  return 0;
}

}  // extern "C"
