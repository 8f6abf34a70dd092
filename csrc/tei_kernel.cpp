// Native in-element two-electron-integral builder (host setup hot spot).
//
// Computes, for all L = 0..Lmax and one element, the double-quadrature
// tensor I[L,i,j,k,l] = int int B_i B_j(r) r_<^L / r_>^{L+1} B_k B_l(r') dr dr'
// using the segment-wise cumulative inner integral with ratio rescaling
// (algorithm of helfem_tpu.ops.radial.RadialBasis.twoe_integral; reference:
// libhelfem/src/quadrature.cpp:60-126).
//
// Exposed with a plain C ABI for ctypes; OpenMP over (L, outer-point) work.
//
// Build: make -C csrc   (produces libhelfem_tei.so)

#include <cmath>
#include <cstring>
#include <vector>

extern "C" {

// Inputs:
//   nq     quadrature points per segment / outer points
//   nprim  basis functions
//   NL     number of L channels (L = 0..NL-1)
//   rq     [nq]     outer radii (ascending)
//   rin    [nq*nq]  inner radii (segment-major)
//   win    [nq*nq]  inner weights incl. segment half-length (wq * hlen_p)
//   wout   [nq]     outer weights (wq * rlen)
//   Bout   [nq*nprim]     basis values at outer points
//   Bin    [nq*nq*nprim]  basis values at inner points
// Output:
//   out    [NL*nprim^4]   I[L,i,j,k,l] (symmetrized)
void tei_inelement(int nq, int nprim, int NL, const double* rq,
                    const double* rin, const double* win, const double* wout,
                    const double* Bout, const double* Bin, double* out) {
  const int np2 = nprim * nprim;
  const size_t np4 = (size_t)np2 * np2;

#ifdef _OPENMP
#pragma omp parallel for schedule(dynamic)
#endif
  for (int L = 0; L < NL; L++) {
    // segment integrals seg[p, kl] = sum_q win * (r'/r_p)^L / r_p * Bk Bl
    std::vector<double> seg((size_t)nq * np2, 0.0);
    for (int p = 0; p < nq; p++) {
      const double inv_rp = 1.0 / rq[p];
      double* sp = &seg[(size_t)p * np2];
      for (int q = 0; q < nq; q++) {
        const double ratio = rin[p * nq + q] * inv_rp;
        double wl = win[p * nq + q] * inv_rp;
        // ratio^L
        double rl = 1.0;
        for (int t = 0; t < L; t++) rl *= ratio;
        wl *= rl;
        const double* b = &Bin[((size_t)p * nq + q) * nprim];
        for (int k = 0; k < nprim; k++) {
          const double wbk = wl * b[k];
          if (wbk == 0.0) continue;
          double* row = sp + k * nprim;
          for (int l = 0; l < nprim; l++) row[l] += wbk * b[l];
        }
      }
    }
    // cumulative inner integral with ratio rescaling
    for (int p = 1; p < nq; p++) {
      double fac = rq[p - 1] / rq[p];
      double f = 1.0;
      for (int t = 0; t < L + 1; t++) f *= fac;
      const double* prev = &seg[(size_t)(p - 1) * np2];
      double* cur = &seg[(size_t)p * np2];
      for (int m = 0; m < np2; m++) cur[m] += f * prev[m];
    }
    // outer contraction: I[ij,kl] = sum_p wout_p B_i B_j seg[p,kl]
    double* O = &out[L * np4];
    std::memset(O, 0, np4 * sizeof(double));
    for (int p = 0; p < nq; p++) {
      const double* b = &Bout[(size_t)p * nprim];
      const double* sp = &seg[(size_t)p * np2];
      for (int i = 0; i < nprim; i++) {
        const double wbi = wout[p] * b[i];
        if (wbi == 0.0) continue;
        for (int j = 0; j < nprim; j++) {
          const double wbij = wbi * b[j];
          if (wbij == 0.0) continue;
          double* row = O + ((size_t)i * nprim + j) * np2;
          for (int m = 0; m < np2; m++) row[m] += wbij * sp[m];
        }
      }
    }
    // symmetrize: I += I^T in (ij)<->(kl)
    for (size_t a = 0; a < (size_t)np2; a++)
      for (size_t c = a; c < (size_t)np2; c++) {
        double v = O[a * np2 + c] + O[c * np2 + a];
        O[a * np2 + c] = v;
        O[c * np2 + a] = v;
      }
  }
}

}  // extern "C"
