// Native dynamics oracle: an INDEPENDENT implementation of the floating-base
// mass matrix and Coriolis bias used to cross-validate the JAX engine.
//
// The JAX engine (quadrupedwholebodycontroller_tpu/ops/dynamics.py) computes
// M via CoM-Jacobian Gram sums and the bias via virtual work + autodiff
// velocity-product accelerations.  This oracle uses the classical
// Featherstone spatial-algebra route instead — CRBA and RNEA in body
// coordinates ([omega; v] ordering), then an exact change of basis to the
// mixed representation ([v_world; omega_world; qdot]) — so agreement to
// ~1e-10 validates both against implementation error.  It plays the role
// iDynTree plays for the reference controller
// (/root/reference/src/whole_body_controller.cpp:256-294) as a trusted
// CPU-side dynamics library, but is first-party C++ with no dependencies.
//
// Model layout (passed as flat arrays, same data as the qrm-v1 JSON spec):
//   nb bodies, body 0 = floating base, body i>0 attached by revolute joint
//   i-1 to parent[i] with joint frame (R, p) in the parent body frame and a
//   rotation axis in the joint frame.
#include <cmath>
#include <cstring>

namespace {

constexpr int kMaxBodies = 32;

struct Mat3 {
  double a[9];
  static Mat3 identity() {
    Mat3 m{};
    m.a[0] = m.a[4] = m.a[8] = 1.0;
    return m;
  }
};

struct Vec3 {
  double v[3];
};

inline Vec3 vec3(double x, double y, double z) { return Vec3{{x, y, z}}; }

inline Mat3 mul(const Mat3& A, const Mat3& B) {
  Mat3 C{};
  for (int i = 0; i < 3; ++i)
    for (int j = 0; j < 3; ++j) {
      double s = 0;
      for (int k = 0; k < 3; ++k) s += A.a[3 * i + k] * B.a[3 * k + j];
      C.a[3 * i + j] = s;
    }
  return C;
}

inline Vec3 mul(const Mat3& A, const Vec3& x) {
  Vec3 y{};
  for (int i = 0; i < 3; ++i)
    y.v[i] = A.a[3 * i] * x.v[0] + A.a[3 * i + 1] * x.v[1] + A.a[3 * i + 2] * x.v[2];
  return y;
}

inline Mat3 transpose(const Mat3& A) {
  Mat3 T{};
  for (int i = 0; i < 3; ++i)
    for (int j = 0; j < 3; ++j) T.a[3 * i + j] = A.a[3 * j + i];
  return T;
}

inline Vec3 cross(const Vec3& a, const Vec3& b) {
  return vec3(a.v[1] * b.v[2] - a.v[2] * b.v[1],
              a.v[2] * b.v[0] - a.v[0] * b.v[2],
              a.v[0] * b.v[1] - a.v[1] * b.v[0]);
}

inline Mat3 skew(const Vec3& v) {
  Mat3 S{};
  S.a[1] = -v.v[2]; S.a[2] = v.v[1];
  S.a[3] = v.v[2];  S.a[5] = -v.v[0];
  S.a[6] = -v.v[1]; S.a[7] = v.v[0];
  return S;
}

inline Mat3 axis_angle(const Vec3& axis, double q) {
  // Rodrigues for unit axis
  Mat3 K = skew(axis);
  Mat3 K2 = mul(K, K);
  double c = std::cos(q), s = std::sin(q);
  Mat3 R = Mat3::identity();
  for (int i = 0; i < 9; ++i) R.a[i] += s * K.a[i] + (1.0 - c) * K2.a[i];
  return R;
}

// 6D spatial vectors, Featherstone ordering [angular(3); linear(3)].
struct SVec {
  double v[6];
};

// Plucker motion transform child <- parent, stored as (E = R_pc^T, p = p_pc).
//   v_child = [E, 0; -E*skew(p), E] v_parent
struct XForm {
  Mat3 E;
  Vec3 p;
};

inline SVec apply(const XForm& X, const SVec& m) {
  Vec3 w{{m.v[0], m.v[1], m.v[2]}};
  Vec3 l{{m.v[3], m.v[4], m.v[5]}};
  Vec3 wc = mul(X.E, w);
  Vec3 tmp = cross(X.p, w);
  Vec3 lc = mul(X.E, vec3(l.v[0] - tmp.v[0], l.v[1] - tmp.v[1], l.v[2] - tmp.v[2]));
  // note: -E*skew(p)*w = E*(l - p x w) handled above
  SVec out{};
  for (int i = 0; i < 3; ++i) { out.v[i] = wc.v[i]; out.v[3 + i] = lc.v[i]; }
  return out;
}

// Force transform parent <- child: f_p = X^T f_c (X the motion transform).
inline SVec apply_T(const XForm& X, const SVec& f) {
  Vec3 n{{f.v[0], f.v[1], f.v[2]}};
  Vec3 fl{{f.v[3], f.v[4], f.v[5]}};
  Mat3 Et = transpose(X.E);
  Vec3 np = mul(Et, n);
  Vec3 fp = mul(Et, fl);
  Vec3 pc = cross(X.p, fp);
  SVec out{};
  for (int i = 0; i < 3; ++i) {
    out.v[i] = np.v[i] + pc.v[i];
    out.v[3 + i] = fp.v[i];
  }
  return out;
}

// motion cross product: (v x) m
inline SVec crm(const SVec& v, const SVec& m) {
  Vec3 w{{v.v[0], v.v[1], v.v[2]}}, l{{v.v[3], v.v[4], v.v[5]}};
  Vec3 mw{{m.v[0], m.v[1], m.v[2]}}, ml{{m.v[3], m.v[4], m.v[5]}};
  Vec3 ow = cross(w, mw);
  Vec3 c1 = cross(l, mw);
  Vec3 c2 = cross(w, ml);
  SVec out{};
  for (int i = 0; i < 3; ++i) {
    out.v[i] = ow.v[i];
    out.v[3 + i] = c1.v[i] + c2.v[i];
  }
  return out;
}

// force cross product: (v x*) f
inline SVec crf(const SVec& v, const SVec& f) {
  Vec3 w{{v.v[0], v.v[1], v.v[2]}}, l{{v.v[3], v.v[4], v.v[5]}};
  Vec3 fn{{f.v[0], f.v[1], f.v[2]}}, fl{{f.v[3], f.v[4], f.v[5]}};
  Vec3 n = cross(w, fn);
  Vec3 n2 = cross(l, fl);
  Vec3 ff = cross(w, fl);
  SVec out{};
  for (int i = 0; i < 3; ++i) {
    out.v[i] = n.v[i] + n2.v[i];
    out.v[3 + i] = ff.v[i];
  }
  return out;
}

// 6x6 spatial inertia in body coords: I = [[Ic - m cx cx, m cx], [-m cx, m 1]]
struct SInertia {
  double m;
  Vec3 c;     // CoM offset in body frame
  Mat3 Ic;    // inertia about CoM, body frame
};

inline SVec apply(const SInertia& I, const SVec& v) {
  Vec3 w{{v.v[0], v.v[1], v.v[2]}}, l{{v.v[3], v.v[4], v.v[5]}};
  // h_ang = Ic w + c x (m (l + w x c))?? derive: momentum about origin:
  //   lin = m (l - c x w)... careful: v_com = l + w x c
  Vec3 vcom = vec3(l.v[0] + w.v[1] * I.c.v[2] - w.v[2] * I.c.v[1],
                   l.v[1] + w.v[2] * I.c.v[0] - w.v[0] * I.c.v[2],
                   l.v[2] + w.v[0] * I.c.v[1] - w.v[1] * I.c.v[0]);
  Vec3 plin = vec3(I.m * vcom.v[0], I.m * vcom.v[1], I.m * vcom.v[2]);
  Vec3 hcom = mul(I.Ic, w);
  Vec3 cxp = cross(I.c, plin);
  SVec out{};
  for (int i = 0; i < 3; ++i) {
    out.v[i] = hcom.v[i] + cxp.v[i];
    out.v[3 + i] = plin.v[i];
  }
  return out;
}

// dense 6x6 of the spatial inertia (for CRBA composites)
inline void to_matrix(const SInertia& I, double M[36]) {
  Mat3 cx = skew(I.c);
  Mat3 cxcx = mul(cx, cx);
  for (int i = 0; i < 3; ++i)
    for (int j = 0; j < 3; ++j) {
      M[6 * i + j] = I.Ic.a[3 * i + j] - I.m * cxcx.a[3 * i + j];
      M[6 * i + (j + 3)] = I.m * cx.a[3 * i + j];
      M[6 * (i + 3) + j] = -I.m * cx.a[3 * i + j];
      M[6 * (i + 3) + (j + 3)] = (i == j) ? I.m : 0.0;
    }
}

// C = X^T A X for 6x6 A (force-motion congruence used by CRBA composites)
inline void congruence(const XForm& X, const double A[36], double C[36]) {
  // Build dense 6x6 motion transform
  double Xd[36];
  Mat3 EpS = mul(X.E, skew(X.p));
  for (int i = 0; i < 3; ++i)
    for (int j = 0; j < 3; ++j) {
      Xd[6 * i + j] = X.E.a[3 * i + j];
      Xd[6 * i + (j + 3)] = 0.0;
      Xd[6 * (i + 3) + j] = -EpS.a[3 * i + j];
      Xd[6 * (i + 3) + (j + 3)] = X.E.a[3 * i + j];
    }
  double T[36];
  for (int i = 0; i < 6; ++i)
    for (int j = 0; j < 6; ++j) {
      double s = 0;
      for (int k = 0; k < 6; ++k) s += A[6 * i + k] * Xd[6 * k + j];
      T[6 * i + j] = s;
    }
  for (int i = 0; i < 6; ++i)
    for (int j = 0; j < 6; ++j) {
      double s = 0;
      for (int k = 0; k < 6; ++k) s += Xd[6 * k + i] * T[6 * k + j];
      C[6 * i + j] = s;
    }
}

struct Model {
  int nb;
  int parent[kMaxBodies];
  Mat3 jR[kMaxBodies];   // joint frame rotation in parent frame (joint i-1)
  Vec3 jp[kMaxBodies];
  Vec3 axis[kMaxBodies];
  SInertia I[kMaxBodies];
};

void build_model(int nb, const int* parent, const double* joint_R,
                 const double* joint_p, const double* joint_axis,
                 const double* mass, const double* com, const double* inertia,
                 Model* mdl) {
  mdl->nb = nb;
  for (int b = 0; b < nb; ++b) {
    mdl->parent[b] = parent[b];
    mdl->I[b].m = mass[b];
    std::memcpy(mdl->I[b].c.v, com + 3 * b, 3 * sizeof(double));
    std::memcpy(mdl->I[b].Ic.a, inertia + 9 * b, 9 * sizeof(double));
    if (b > 0) {
      std::memcpy(mdl->jR[b].a, joint_R + 9 * (b - 1), 9 * sizeof(double));
      std::memcpy(mdl->jp[b].v, joint_p + 3 * (b - 1), 3 * sizeof(double));
      std::memcpy(mdl->axis[b].v, joint_axis + 3 * (b - 1), 3 * sizeof(double));
    }
  }
}

}  // namespace

extern "C" {

// Mixed-representation mass matrix (nv x nv, row-major) and Coriolis-only
// bias (nv), nv = 6 + (nb-1).  Inputs:
//   base_R: 3x3 row-major world rotation of the base
//   q:      (nb-1) joint positions
//   u:      (nv) mixed velocity [v_base_world; omega_world; qdot]
void qwbc_mass_and_bias(
    int nb, const int* parent, const double* joint_R, const double* joint_p,
    const double* joint_axis, const double* mass, const double* com,
    const double* inertia, const double* base_R, const double* q,
    const double* u, double* M_out, double* h_out) {
  Model mdl;
  build_model(nb, parent, joint_R, joint_p, joint_axis, mass, com, inertia, &mdl);
  const int nj = nb - 1;
  const int nv = 6 + nj;

  Mat3 Rw;  // base orientation
  std::memcpy(Rw.a, base_R, 9 * sizeof(double));
  Mat3 RwT = transpose(Rw);

  // --- base velocity in Featherstone base coords [omega_b; v_b] ---
  Vec3 v_w = vec3(u[0], u[1], u[2]);
  Vec3 w_w = vec3(u[3], u[4], u[5]);
  SVec v0{};
  {
    Vec3 wb = mul(RwT, w_w);
    Vec3 vb = mul(RwT, v_w);
    for (int i = 0; i < 3; ++i) { v0.v[i] = wb.v[i]; v0.v[3 + i] = vb.v[i]; }
  }

  // --- joint transforms and velocity propagation ---
  XForm X[kMaxBodies];       // child <- parent
  SVec vbod[kMaxBodies];     // body spatial velocity, body coords
  SVec Sj[kMaxBodies];       // joint motion subspace in child coords
  vbod[0] = v0;
  for (int b = 1; b < nb; ++b) {
    Mat3 R_pc = mul(mdl.jR[b], axis_angle(mdl.axis[b], q[b - 1]));
    X[b].E = transpose(R_pc);
    X[b].p = mdl.jp[b];
    SVec vp = apply(X[b], vbod[mdl.parent[b]]);
    SVec S{};
    for (int i = 0; i < 3; ++i) S.v[i] = mdl.axis[b].v[i];
    Sj[b] = S;
    for (int i = 0; i < 6; ++i) vbod[b].v[i] = vp.v[i] + S.v[i] * u[6 + (b - 1)];
  }

  // ================= RNEA bias (udot = 0, no gravity) =================
  SVec abod[kMaxBodies];
  SVec fbod[kMaxBodies];
  abod[0] = SVec{};  // base acceleration zero (bias computation)
  for (int b = 1; b < nb; ++b) {
    SVec ap = apply(X[b], abod[mdl.parent[b]]);
    SVec Sqd{};
    for (int i = 0; i < 6; ++i) Sqd.v[i] = Sj[b].v[i] * u[6 + (b - 1)];
    SVec vx = crm(vbod[b], Sqd);
    for (int i = 0; i < 6; ++i) abod[b].v[i] = ap.v[i] + vx.v[i];
  }
  for (int b = 0; b < nb; ++b) {
    SVec Ia = apply(mdl.I[b], abod[b]);
    SVec Iv = apply(mdl.I[b], vbod[b]);
    SVec vf = crf(vbod[b], Iv);
    for (int i = 0; i < 6; ++i) fbod[b].v[i] = Ia.v[i] + vf.v[i];
  }
  double hB[6 + kMaxBodies];  // Featherstone-ordered bias [base6; joints]
  for (int b = nb - 1; b >= 1; --b) {
    double dot = 0;
    for (int i = 0; i < 6; ++i) dot += Sj[b].v[i] * fbod[b].v[i];
    hB[6 + (b - 1)] = dot;
    SVec fp = apply_T(X[b], fbod[b]);
    for (int i = 0; i < 6; ++i) fbod[mdl.parent[b]].v[i] += fp.v[i];
  }
  for (int i = 0; i < 6; ++i) hB[i] = fbod[0].v[i];

  // ================= CRBA mass matrix =================
  double Ic[kMaxBodies][36];
  for (int b = 0; b < nb; ++b) to_matrix(mdl.I[b], Ic[b]);
  for (int b = nb - 1; b >= 1; --b) {
    double C[36];
    congruence(X[b], Ic[b], C);
    for (int i = 0; i < 36; ++i) Ic[mdl.parent[b]][i] += C[i];
  }
  // Featherstone-ordered MB: [base 6; joints], base block = composite
  double MB[(6 + kMaxBodies) * (6 + kMaxBodies)];
  std::memset(MB, 0, sizeof(MB));
  const int nB = nv;
  for (int i = 0; i < 6; ++i)
    for (int j = 0; j < 6; ++j) MB[nB * i + j] = Ic[0][6 * i + j];
  for (int b = 1; b < nb; ++b) {
    // F = Ic_b S_b, propagate to ancestors
    SVec F{};
    for (int i = 0; i < 6; ++i) {
      double s = 0;
      for (int k = 0; k < 6; ++k) s += Ic[b][6 * i + k] * Sj[b].v[k];
      F.v[i] = s;
    }
    {
      double dot = 0;
      for (int i = 0; i < 6; ++i) dot += Sj[b].v[i] * F.v[i];
      MB[nB * (6 + b - 1) + (6 + b - 1)] = dot;
    }
    int j = b;
    SVec Fc = F;
    while (mdl.parent[j] != 0) {
      Fc = apply_T(X[j], Fc);
      j = mdl.parent[j];
      double dot = 0;
      for (int i = 0; i < 6; ++i) dot += Sj[j].v[i] * Fc.v[i];
      MB[nB * (6 + b - 1) + (6 + j - 1)] = dot;
      MB[nB * (6 + j - 1) + (6 + b - 1)] = dot;
    }
    Fc = apply_T(X[j], Fc);  // into base coords
    for (int i = 0; i < 6; ++i) {
      MB[nB * i + (6 + b - 1)] = Fc.v[i];
      MB[nB * (6 + b - 1) + i] = Fc.v[i];
    }
  }

  // ================= change of basis to mixed =================
  // u_B = P u_m,  P = [[0, R^T, 0], [R^T, 0, 0], [0, 0, I]]
  // M_m = P^T M_B P ;  h_m = P^T (h_B + M_B Pdot u_m)
  double P[(6 + kMaxBodies) * (6 + kMaxBodies)];
  double Pd[(6 + kMaxBodies) * (6 + kMaxBodies)];
  std::memset(P, 0, sizeof(P));
  std::memset(Pd, 0, sizeof(Pd));
  Mat3 wx = skew(w_w);
  Mat3 Rdot = mul(wx, Rw);
  Mat3 RdT = transpose(Rdot);
  for (int i = 0; i < 3; ++i)
    for (int j = 0; j < 3; ++j) {
      P[nB * i + (3 + j)] = RwT.a[3 * i + j];
      P[nB * (3 + i) + j] = RwT.a[3 * i + j];
      Pd[nB * i + (3 + j)] = RdT.a[3 * i + j];
      Pd[nB * (3 + i) + j] = RdT.a[3 * i + j];
    }
  for (int k = 6; k < nv; ++k) P[nB * k + k] = 1.0;

  // h_m
  double Pdu[6 + kMaxBodies];
  for (int i = 0; i < nv; ++i) {
    double s = 0;
    for (int k = 0; k < nv; ++k) s += Pd[nB * i + k] * u[k];
    Pdu[i] = s;
  }
  double MPdu[6 + kMaxBodies];
  for (int i = 0; i < nv; ++i) {
    double s = 0;
    for (int k = 0; k < nv; ++k) s += MB[nB * i + k] * Pdu[k];
    MPdu[i] = s;
  }
  for (int i = 0; i < nv; ++i) {
    double s = 0;
    for (int k = 0; k < nv; ++k) s += P[nB * k + i] * (hB[k] + MPdu[k]);
    h_out[i] = s;
  }
  // M_m
  double T[(6 + kMaxBodies) * (6 + kMaxBodies)];
  for (int i = 0; i < nv; ++i)
    for (int j = 0; j < nv; ++j) {
      double s = 0;
      for (int k = 0; k < nv; ++k) s += MB[nB * i + k] * P[nB * k + j];
      T[nB * i + j] = s;
    }
  for (int i = 0; i < nv; ++i)
    for (int j = 0; j < nv; ++j) {
      double s = 0;
      for (int k = 0; k < nv; ++k) s += P[nB * k + i] * T[nB * k + j];
      M_out[nv * i + j] = s;
    }
}

}  // extern "C"
