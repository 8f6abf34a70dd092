"""DIIS convergence acceleration (L7).

C2-DIIS (Sorensen-Osterby) with an SVD-based solve, as in the reference
(src/general/diis.cpp), for restricted and unrestricted SCF. The error vector
is the orthonormal-basis commutator Sinvh^T (F P S - S P F) Sinvh
(reference: diis.cpp error metric). ADIIS energy-model weighting is planned;
plain damped Roothaan steps are used until the DIIS error drops below
`diis_eps`.

Host-side numpy: the stacks are tiny (history <= ~10 matrices).
"""

import numpy as np

__all__ = ["DIIS"]


class DIIS:
    def __init__(self, S, Sinvh, max_hist: int = 10, diis_eps: float = 0.1, damp: float = 0.5):
        self.S = np.asarray(S)
        self.Sinvh = np.asarray(Sinvh)
        self.max_hist = max_hist
        self.diis_eps = diis_eps
        self.damp = damp
        self.Fs: list[list[np.ndarray]] = []
        self.errs: list[np.ndarray] = []

    def _error(self, F, P):
        FPS = F @ P @ self.S
        comm = FPS - FPS.T
        return self.Sinvh.T @ comm @ self.Sinvh

    def update(self, Fs, Ps):
        """Push Fock/density matrices (list per spin channel). Returns the
        DIIS error (max norm over channels)."""
        errv = np.concatenate([self._error(F, P).ravel() for F, P in zip(Fs, Ps)])
        return self.update_with_error(Fs, errv)

    def update_with_error(self, Fs, errv):
        """Push Fock matrices with a precomputed error vector (for drivers
        that evaluate the commutator on device)."""
        errv = np.asarray(errv).ravel()
        self.Fs.append([np.asarray(F).copy() for F in Fs])
        self.errs.append(errv)
        if len(self.Fs) > self.max_hist:
            self.Fs.pop(0)
            self.errs.pop(0)
        return float(np.max(np.abs(errv)))

    def solve(self):
        """Extrapolated Fock matrices (C2-DIIS: eigenvector of the error-overlap
        matrix with smallest error norm and acceptable weights)."""
        n = len(self.Fs)
        if n == 1:
            return self.Fs[-1]
        err = float(np.max(np.abs(self.errs[-1])))
        if err > self.diis_eps:
            # not in the DIIS basin yet: damped Roothaan step
            if n >= 2:
                return [
                    (1 - self.damp) * Fn + self.damp * Fo
                    for Fn, Fo in zip(self.Fs[-1], self.Fs[-2])
                ]
            return self.Fs[-1]
        B = np.empty((n, n))
        for i in range(n):
            for j in range(n):
                B[i, j] = np.dot(self.errs[i], self.errs[j])
        # C2-DIIS: solve B c = lambda c with sum(c)=1 normalization per
        # eigenvector, pick the solution with smallest extrapolated error
        w, V = np.linalg.eigh(B)
        best, best_err = None, np.inf
        for k in range(n):
            c = V[:, k]
            s = c.sum()
            if abs(s) < 1e-10:
                continue
            c = c / s
            if np.max(np.abs(c)) > 20.0:
                continue
            e = c @ B @ c
            if e < best_err:
                best_err, best = e, c
        if best is None:
            best = np.zeros(n)
            best[-1] = 1.0
        return [
            sum(best[i] * self.Fs[i][ch] for i in range(n))
            for ch in range(len(self.Fs[0]))
        ]
