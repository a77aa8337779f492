// Native Wavefront OBJ loader — the data-loader role (reference
// README.md:113-117 allows third-party OBJ code in C++; this is ours).
// Handles v positions and f faces (fan triangulation, negative and
// v/vt/vn indices).  Output is a flat (T, 3, 3) float buffer matching
// pathtrace_tpu.scene.obj.load_obj exactly (tests assert equality).

#include <cstdint>
#include <cstdlib>
#include <cstring>
#include <fstream>
#include <sstream>
#include <string>
#include <vector>

namespace {

struct ObjData {
  std::vector<float> tris;  // T*9 floats
  std::string error;
};

}  // namespace

extern "C" {

void* pt_load_obj(const char* path) {
  auto* out = new ObjData();
  std::ifstream f(path);
  if (!f.is_open()) {
    out->error = std::string("cannot open OBJ file: ") + path;
    return out;
  }
  std::vector<float> verts;  // 3 per vertex
  std::string line;
  while (std::getline(f, line)) {
    if (!line.empty() && line.back() == '\r') line.pop_back();
    if (line.empty() || line[0] == '#') continue;
    std::istringstream ss(line);
    std::string tag;
    ss >> tag;
    if (tag == "v") {
      float x, y, z;
      if (ss >> x >> y >> z) {
        verts.push_back(x);
        verts.push_back(y);
        verts.push_back(z);
      }
    } else if (tag == "f") {
      std::vector<int64_t> idx;
      std::string tok;
      int64_t n_verts = (int64_t)verts.size() / 3;
      while (ss >> tok) {
        // index before the first '/'
        int64_t i = std::strtoll(tok.c_str(), nullptr, 10);
        idx.push_back(i > 0 ? i - 1 : n_verts + i);
      }
      for (size_t k = 1; k + 1 < idx.size(); ++k) {  // fan
        const int64_t tri[3] = {idx[0], idx[k], idx[k + 1]};
        for (int v = 0; v < 3; ++v) {
          int64_t vi = tri[v];
          if (vi < 0 || vi >= n_verts) {
            out->error = "OBJ face index out of range";
            return out;
          }
          out->tris.push_back(verts[3 * vi + 0]);
          out->tris.push_back(verts[3 * vi + 1]);
          out->tris.push_back(verts[3 * vi + 2]);
        }
      }
    }
  }
  return out;
}

const char* pt_obj_error(void* h) {
  auto* o = static_cast<ObjData*>(h);
  return o->error.empty() ? nullptr : o->error.c_str();
}

int64_t pt_obj_tri_count(void* h) {
  return (int64_t)static_cast<ObjData*>(h)->tris.size() / 9;
}

void pt_obj_fill(void* h, float* out) {
  auto* o = static_cast<ObjData*>(h);
  std::memcpy(out, o->tris.data(), o->tris.size() * sizeof(float));
}

void pt_obj_free(void* h) { delete static_cast<ObjData*>(h); }

}  // extern "C"
