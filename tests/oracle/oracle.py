"""Pure NumPy/SciPy oracle solver (SURVEY.md C22, §6).

The reference binary is unavailable (empty mount — SURVEY.md §0), so this
mirror plays the role of "the reference CPU solver" in the 1e-8 parity
contract (BASELINE.json:5). It implements the SAME mathematical spec
(SURVEY.md §5) but deliberately shares NO code or vectorization strategy
with the TPU path: per-element Python loops, per-quad-point loops, explicit
rank-4 tangent tensors, scipy.sparse direct solves, and free-DOF *reduction*
(not masking) for Dirichlet BCs. Independent bugs cannot cancel.
"""

from __future__ import annotations

import numpy as np
import scipy.sparse as sp
import scipy.sparse.linalg as spla

# --- quadrature (independent tables) ---------------------------------------


def quad_rule(name: str, n_quad: int):
    if n_quad == 1:
        return np.array([[0.25, 0.25, 0.25]]), np.array([1.0 / 6.0])
    if n_quad == 4:
        a = (5.0 + 3.0 * np.sqrt(5.0)) / 20.0
        b = (5.0 - np.sqrt(5.0)) / 20.0
        pts = []
        for i in range(4):
            bary = [b] * 4
            bary[i] = a
            pts.append(bary[1:])
        return np.array(pts), np.full(4, 1.0 / 24.0)
    if n_quad == 5:
        pts = [[0.25, 0.25, 0.25]]
        for i in range(4):
            bary = [1.0 / 6.0] * 4
            bary[i] = 0.5
            pts.append(bary[1:])
        w = np.array([-4.0 / 5.0] + [9.0 / 20.0] * 4) / 6.0
        return np.array(pts), w
    raise ValueError(n_quad)


# --- shape functions --------------------------------------------------------


def shape_grad(elem: str, xi):
    """dN/dxi [npe, 3] at one natural point."""
    x, y, z = xi
    if elem == "tet4":
        return np.array([[-1, -1, -1], [1, 0, 0], [0, 1, 0], [0, 0, 1]], float)
    if elem == "tet10":
        L = np.array([1 - x - y - z, x, y, z])
        dL = np.array([[-1, -1, -1], [1, 0, 0], [0, 1, 0], [0, 0, 1]], float)
        out = np.zeros((10, 3))
        for a in range(4):
            out[a] = (4 * L[a] - 1) * dL[a]
        edges = [(0, 1), (1, 2), (2, 0), (0, 3), (1, 3), (2, 3)]
        for e, (i, j) in enumerate(edges):
            out[4 + e] = 4 * (L[i] * dL[j] + L[j] * dL[i])
        return out
    raise ValueError(elem)


# --- materials: S(C) and full rank-4 CC = 2 dS/dC ---------------------------


def material_SC(name: str, lam: float, mu: float, C: np.ndarray):
    I = np.eye(3)
    if name == "svk":
        E = 0.5 * (C - I)
        S = lam * np.trace(E) * I + 2 * mu * E
        CC = np.zeros((3, 3, 3, 3))
        for i in range(3):
            for j in range(3):
                for k in range(3):
                    for L_ in range(3):
                        CC[i, j, k, L_] = lam * I[i, j] * I[k, L_] + mu * (
                            I[i, k] * I[j, L_] + I[i, L_] * I[j, k]
                        )
        return S, CC
    if name in ("neo_hookean", "neohookean", "nh"):
        Cinv = np.linalg.inv(C)
        lnJ = 0.5 * np.log(np.linalg.det(C))
        S = mu * (I - Cinv) + lam * lnJ * Cinv
        CC = np.zeros((3, 3, 3, 3))
        coef = mu - lam * lnJ
        for i in range(3):
            for j in range(3):
                for k in range(3):
                    for L_ in range(3):
                        CC[i, j, k, L_] = lam * Cinv[i, j] * Cinv[k, L_] + coef * (
                            Cinv[i, k] * Cinv[j, L_] + Cinv[i, L_] * Cinv[j, k]
                        )
        return S, CC
    raise ValueError(name)


# --- element integrals (loop-style, SURVEY.md §5.5) -------------------------


def element_force_stiffness(Xe, ue, elem, n_quad, mat, lam, mu):
    npe = Xe.shape[0]
    pts, wts = quad_rule(elem, n_quad)
    fe = np.zeros((npe, 3))
    Ke = np.zeros((npe, 3, npe, 3))
    for q in range(pts.shape[0]):
        dN = shape_grad(elem, pts[q])  # [npe, 3]
        Jiso = Xe.T @ dN  # J[i,j] = sum_a X[a,i] dN[a,j]
        detJ = np.linalg.det(Jiso)
        g = dN @ np.linalg.inv(Jiso)  # gradN [npe, 3] wrt material coords
        V = detJ * wts[q]
        F = np.eye(3) + ue.T @ g  # F_iJ = d_iJ + sum_a u[a,i] g[a,J]
        C = F.T @ F
        S, CC = material_SC(mat, lam, mu, C)
        P = F @ S
        fe += V * g @ P.T  # fe[a,i] = V P_iJ g[a,J]
        # material part: Ke[a,i,b,k] = V g[a,J] F_iI CC[I,J,K,L] F_kK g[b,L]
        B = np.einsum("iI,aJ->aiIJ", F, g)  # [npe,3,3,3]
        Ke += V * np.einsum("aiIJ,IJKL,bkKL->aibk", B, CC, B)
        # geometric part: V g[a,I] S[I,J] g[b,J] delta_ik
        G = V * g @ S @ g.T
        for i in range(3):
            Ke[:, i, :, i] += G
    return fe, Ke


# --- global assembly + Newton (free-DOF reduction) --------------------------


def assemble(coords, conn, u, elem, n_quad, mat, lam, mu):
    N = coords.shape[0]
    rows, cols, vals = [], [], []
    f_int = np.zeros((N, 3))
    for e in range(conn.shape[0]):
        nodes = conn[e]
        fe, Ke = element_force_stiffness(
            coords[nodes], u[nodes], elem, n_quad, mat, lam, mu
        )
        f_int[nodes] += fe
        dofs = (3 * nodes[:, None] + np.arange(3)[None, :]).reshape(-1)
        Kf = Ke.reshape(len(nodes) * 3, len(nodes) * 3)
        rows.append(np.repeat(dofs, dofs.size))
        cols.append(np.tile(dofs, dofs.size))
        vals.append(Kf.reshape(-1))
    K = sp.coo_matrix(
        (np.concatenate(vals), (np.concatenate(rows), np.concatenate(cols))),
        shape=(3 * N, 3 * N),
    ).tocsr()
    return K, f_int


def solve(
    coords,
    conn,
    elem,
    mat,
    lam,
    mu,
    fixed_mask,
    fixed_vals,
    f_ext=None,
    n_steps=1,
    n_quad=None,
    rtol=1e-10,
    atol=1e-12,
    max_newton=30,
):
    """Incremental-loading Newton solve; returns (u [N,3], history).

    fixed_mask bool[N,3] True where prescribed; fixed_vals f64[N,3] total
    prescribed displacement; f_ext total external nodal forces.
    """
    coords = np.asarray(coords, float)
    conn = np.asarray(conn)
    if n_quad is None:
        n_quad = 1 if elem == "tet4" else 4
    N = coords.shape[0]
    f_ext = np.zeros((N, 3)) if f_ext is None else np.asarray(f_ext, float)
    free = ~np.asarray(fixed_mask).reshape(-1)
    u = np.zeros((N, 3))
    history = []
    for s in range(1, n_steps + 1):
        scale = s / n_steps
        u.reshape(-1)[~free] = scale * np.asarray(fixed_vals).reshape(-1)[~free]
        norms = []
        norm0 = None
        for it in range(max_newton):
            K, f_int = assemble(coords, conn, u, elem, n_quad, mat, lam, mu)
            r = (scale * f_ext - f_int).reshape(-1)[free]
            norm = np.linalg.norm(r)
            norms.append(norm)
            if norm0 is None:
                norm0 = max(norm, 1e-300)
            if norm <= max(rtol * norm0, atol):
                break
            Kff = K[free][:, free]
            du = spla.spsolve(Kff.tocsc(), r)
            uf = u.reshape(-1)
            uf[free] += du
        else:
            raise RuntimeError(f"oracle Newton failed at step {s}: {norms}")
        history.append(norms)
    return u, history
