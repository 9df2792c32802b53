// Fast g2o dataset parser (native data-loader path).
//
// The reference's IO layer is C++ (src/DPGO_utils.cpp:113-257, iostream-based);
// this is its native counterpart for dpgo_tpu, exposed as a plain C ABI and
// loaded from Python via ctypes (dpgo_tpu/io/g2o.py). Semantics match the
// reference parser:
//   * EDGE_SE2 i j dx dy dtheta I11 I12 I13 I22 I23 I33
//       tau = 2 / trace(TranCov^-1), kappa = I33
//   * EDGE_SE3:QUAT i j dx dy dz qx qy qz qw I11..I66 (upper triangle)
//       tau = 3 / trace(TranCov^-1), kappa = 3 / (2 trace(RotCov^-1))
//   * odometry edges (j == i+1) are flagged fixed_weight
//   * VERTEX_* records are skipped
//
// Two-call protocol: dpgo_g2o_count() sizes the output, dpgo_g2o_parse()
// fills caller-allocated buffers. Build: `make -C csrc` -> libdpgo_io.so.

#include <cctype>
#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>

namespace {

// 3x3 symmetric inverse trace: trace(M^-1) for symmetric positive definite M.
double sym3_inv_trace(const double M[6]) {
  // M packed as [m00, m01, m02, m11, m12, m22]
  const double a = M[0], b = M[1], c = M[2], d = M[3], e = M[4], f = M[5];
  const double A = d * f - e * e;  // cofactor 00
  const double D = a * f - c * c;  // cofactor 11
  const double F = a * d - b * b;  // cofactor 22
  const double det = a * A - b * (b * f - e * c) + c * (b * e - d * c);
  return (A + D + F) / det;
}

// 2x2 symmetric inverse trace.
double sym2_inv_trace(double a, double b, double d) {
  const double det = a * d - b * b;
  return (a + d) / det;
}

struct Cursor {
  const char* p;
  const char* end;
};

inline void skip_ws(Cursor& c) {
  while (c.p < c.end && (*c.p == ' ' || *c.p == '\t' || *c.p == '\r')) ++c.p;
}

inline bool read_double(Cursor& c, double* out) {
  skip_ws(c);
  char* next = nullptr;
  *out = strtod(c.p, &next);
  if (next == c.p) return false;
  c.p = next;
  return true;
}

inline bool read_long(Cursor& c, long* out) {
  skip_ws(c);
  char* next = nullptr;
  *out = strtol(c.p, &next, 10);
  if (next == c.p) return false;
  c.p = next;
  return true;
}

constexpr int kErrOpen = -1;
constexpr int kErrFormat = -2;
constexpr int kErrMixed = -3;
constexpr int kErrSize = -4;

// Read whole file into a malloc'd buffer. Returns nullptr on failure.
char* slurp(const char* path, size_t* size_out) {
  FILE* f = fopen(path, "rb");
  if (!f) return nullptr;
  fseek(f, 0, SEEK_END);
  long size = ftell(f);
  fseek(f, 0, SEEK_SET);
  if (size < 0) {
    fclose(f);
    return nullptr;
  }
  char* buf = static_cast<char*>(malloc(static_cast<size_t>(size) + 1));
  if (!buf) {
    fclose(f);
    return nullptr;
  }
  size_t got = fread(buf, 1, static_cast<size_t>(size), f);
  fclose(f);
  buf[got] = '\0';
  *size_out = got;
  return buf;
}

}  // namespace

extern "C" {

// Count edges and detect dimension. Returns edge count (>= 0) or a negative
// error code. *dim_out is set to 2 or 3.
long dpgo_g2o_count(const char* path, int* dim_out) {
  size_t size = 0;
  char* buf = slurp(path, &size);
  if (!buf) return kErrOpen;
  long m2 = 0, m3 = 0;
  const char* p = buf;
  const char* end = buf + size;
  while (p < end) {
    const char* nl = static_cast<const char*>(memchr(p, '\n', end - p));
    if (!nl) nl = end;
    if (strncmp(p, "EDGE_SE2 ", 9) == 0) {
      ++m2;
    } else if (strncmp(p, "EDGE_SE3:QUAT ", 14) == 0) {
      ++m3;
    }
    p = nl + 1;
  }
  free(buf);
  if (m2 > 0 && m3 > 0) return kErrMixed;
  if (m2 == 0 && m3 == 0) return kErrFormat;
  *dim_out = (m3 > 0) ? 3 : 2;
  return (m3 > 0) ? m3 : m2;
}

// Parse into caller-allocated arrays:
//   p1, p2       : int32[m]
//   R            : double[m * d * d]   (row-major per edge)
//   t            : double[m * d]
//   kappa, tau   : double[m]
//   fixed_weight : uint8[m]
// Returns num_poses (> 0) or a negative error code.
long dpgo_g2o_parse(const char* path, int d, long m, int32_t* p1, int32_t* p2,
                    double* R, double* t, double* kappa, double* tau,
                    uint8_t* fixed_weight) {
  size_t size = 0;
  char* buf = slurp(path, &size);
  if (!buf) return kErrOpen;
  long k = 0;
  long max_pose = -1;
  const char* p = buf;
  const char* end = buf + size;
  const bool se3 = (d == 3);
  while (p < end) {
    const char* nl = static_cast<const char*>(memchr(p, '\n', end - p));
    if (!nl) nl = end;
    bool is_edge = se3 ? (strncmp(p, "EDGE_SE3:QUAT ", 14) == 0)
                       : (strncmp(p, "EDGE_SE2 ", 9) == 0);
    if (is_edge) {
      if (k >= m) {
        free(buf);
        return kErrSize;
      }
      Cursor c{p + (se3 ? 14 : 9), nl};
      long i = 0, j = 0;
      if (!read_long(c, &i) || !read_long(c, &j)) {
        free(buf);
        return kErrFormat;
      }
      if (se3) {
        double v[7];  // dx dy dz qx qy qz qw
        for (double& x : v) {
          if (!read_double(c, &x)) {
            free(buf);
            return kErrFormat;
          }
        }
        double info[21];
        for (double& x : info) {
          if (!read_double(c, &x)) {
            free(buf);
            return kErrFormat;
          }
        }
        // quaternion (x, y, z, w) -> rotation matrix, normalized
        double qx = v[3], qy = v[4], qz = v[5], qw = v[6];
        const double qn = sqrt(qx * qx + qy * qy + qz * qz + qw * qw);
        qx /= qn;
        qy /= qn;
        qz /= qn;
        qw /= qn;
        double* Rk = R + k * 9;
        Rk[0] = 1 - 2 * (qy * qy + qz * qz);
        Rk[1] = 2 * (qx * qy - qw * qz);
        Rk[2] = 2 * (qx * qz + qw * qy);
        Rk[3] = 2 * (qx * qy + qw * qz);
        Rk[4] = 1 - 2 * (qx * qx + qz * qz);
        Rk[5] = 2 * (qy * qz - qw * qx);
        Rk[6] = 2 * (qx * qz - qw * qy);
        Rk[7] = 2 * (qy * qz + qw * qx);
        Rk[8] = 1 - 2 * (qx * qx + qy * qy);
        t[k * 3 + 0] = v[0];
        t[k * 3 + 1] = v[1];
        t[k * 3 + 2] = v[2];
        // info upper triangle, row-major: I11 I12 I13 I14 I15 I16 I22 ...
        // translation block = rows/cols 0..2; rotation block = rows/cols 3..5
        const double Tc[6] = {info[0], info[1], info[2], info[6], info[7], info[11]};
        const double Rc[6] = {info[15], info[16], info[17], info[18], info[19], info[20]};
        tau[k] = 3.0 / sym3_inv_trace(Tc);
        kappa[k] = 3.0 / (2.0 * sym3_inv_trace(Rc));
      } else {
        double v[3];  // dx dy dtheta
        for (double& x : v) {
          if (!read_double(c, &x)) {
            free(buf);
            return kErrFormat;
          }
        }
        double I11, I12, I13, I22, I23, I33;
        if (!read_double(c, &I11) || !read_double(c, &I12) ||
            !read_double(c, &I13) || !read_double(c, &I22) ||
            !read_double(c, &I23) || !read_double(c, &I33)) {
          free(buf);
          return kErrFormat;
        }
        const double ct = cos(v[2]), st = sin(v[2]);
        double* Rk = R + k * 4;
        Rk[0] = ct;
        Rk[1] = -st;
        Rk[2] = st;
        Rk[3] = ct;
        t[k * 2 + 0] = v[0];
        t[k * 2 + 1] = v[1];
        tau[k] = 2.0 / sym2_inv_trace(I11, I12, I22);
        kappa[k] = I33;
      }
      p1[k] = static_cast<int32_t>(i);
      p2[k] = static_cast<int32_t>(j);
      fixed_weight[k] = (i + 1 == j) ? 1 : 0;
      if (i > max_pose) max_pose = i;
      if (j > max_pose) max_pose = j;
      ++k;
    }
    p = nl + 1;
  }
  free(buf);
  if (k != m) return kErrSize;
  return max_pose + 1;
}

}  // extern "C"
