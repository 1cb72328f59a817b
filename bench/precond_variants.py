"""Two-level preconditioner variants: iteration-count experiment
(round-1 VERDICT weak item 1c — "try one multiplicative/Chebyshev
variant").

Counts PCG iterations to a fixed relative tolerance for the frozen
tangent at the headline bench state, under four SPD preconditioners:

  additive    — z = D^-1 r + P Ac^-1 P^T r           (production default)
  mult_sym    — symmetric multiplicative two-level:
                z1 = P Ac^-1 P^T r; r1 = r - A z1;
                z2 = z1 + D^-1 r1;  r2 = r - A z2;
                z  = z2 + P Ac^-1 P^T r2
                (2 coarse solves + 2 tangent matvecs + 1 Jacobi per apply)
  cheb2/cheb3 — additive with the Jacobi fine smoother replaced by a
                degree-2/3 Chebyshev polynomial in (D^-1 A) (1/2 extra
                tangent matvecs per apply; eigenvalue bounds from 10
                power-method steps)

The decision metric is implied wall-clock on the TPU: tangent matvec
~34 ms at 1M DOF is ~75% of the additive iteration (BENCH_NOTES.md), so
a variant with m extra matvecs per apply must cut iterations by more
than (1 + 0.75*m)x to win. Iteration counts are size- and
platform-stable; run this on CPU at a medium size.

Run: FEA_PLATFORM=cpu python bench/precond_variants.py [n]  (TET10 box,
default 16 = 95k DOF; prints one JSON line)
"""

import json
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import numpy as np
import jax
import jax.numpy as jnp

from fea_large_tpu import NeoHookean
from fea_large_tpu.bc import DirichletBuilder
from fea_large_tpu.mesh.generators import box_mesh
from fea_large_tpu.ops.soa import SoAProblem, soa_apply_tangent, soa_diag_blocks, soa_freeze
from fea_large_tpu.solvers.linear import apply_block_jacobi, jacobi_inverse_blocks
from fea_large_tpu.solvers.multilevel import build_coarse_space
from fea_large_tpu.solvers.newton import SolverOptions  # noqa: F401 (schema ref)


def pcg_count(matvec, b, precond, tol=1e-6, maxiter=2000):
    """Plain PCG on host control (iteration counts only)."""
    x = jnp.zeros_like(b)
    r = b
    z = precond(r)
    p = z
    rz = jnp.vdot(r.reshape(-1), z.reshape(-1))
    stop = tol * float(jnp.linalg.norm(b))
    for k in range(maxiter):
        if float(jnp.linalg.norm(r)) <= stop:
            return k
        q = matvec(p)
        alpha = rz / jnp.vdot(p.reshape(-1), q.reshape(-1))
        x = x + alpha * p
        r = r - alpha * q
        z = precond(r)
        rz_new = jnp.vdot(r.reshape(-1), z.reshape(-1))
        p = z + (rz_new / rz) * p
        rz = rz_new
    return maxiter


def main(n=16):
    mesh = box_mesh(n, n, n, element_type="tet10")
    mat32 = NeoHookean(jnp.asarray(1.0, jnp.float32), jnp.asarray(0.6, jnp.float32))
    mat64 = NeoHookean(jnp.asarray(1.0), jnp.asarray(0.6))
    bc = DirichletBuilder(mesh).fix("zmin").prescribe("zmax", "z", -0.05).build()
    soa = SoAProblem.build(mesh, jnp.float32)
    u = jnp.zeros((mesh.n_nodes, 3)).at[:, 2].set(-0.05 * mesh.coords[:, 2])
    u = bc.impose(u, 1.0)
    state = soa_freeze(soa, mat32, u.astype(jnp.float32).T)
    free32 = bc.free_mask.astype(jnp.float32)
    diag = jnp.transpose(soa_diag_blocks(soa, state), (2, 0, 1))
    inv_blocks = jacobi_inverse_blocks(diag, free32)
    coarse = build_coarse_space(mesh, mat64, bc, modes=6, soa=soa)

    @jax.jit
    def A(v):
        vm_T = v.T * free32.T
        y_T = soa_apply_tangent(soa, state, vm_T) * free32.T
        return y_T.T + (v - vm_T.T)

    @jax.jit
    def MJ(r):
        return apply_block_jacobi(inv_blocks, free32, r)

    @jax.jit
    def MC(r):
        return free32 * coarse.apply(r)

    # Chebyshev bounds for D^-1 A on the free subspace: lambda_max by
    # power iteration; lambda_min taken as lambda_max/30 (standard
    # smoother convention — target the upper part of the spectrum)
    rng = np.random.default_rng(0)
    v = jnp.asarray(rng.standard_normal((mesh.n_nodes, 3)), jnp.float32) * free32
    for _ in range(10):
        w = MJ(A(v))
        v = w / jnp.linalg.norm(w)
    lmax = float(jnp.vdot(v.reshape(-1), MJ(A(v)).reshape(-1)))
    lmax *= 1.05

    def cheb(degree):
        lmin = lmax / 30.0
        theta = 0.5 * (lmax + lmin)
        delta = 0.5 * (lmax - lmin)

        @jax.jit
        def apply(r):
            # standard Chebyshev smoother iteration for z ~ (D^-1A)^-1 D^-1 r
            z = MJ(r) / theta
            if degree == 1:
                return z + MC(r)
            rho_old = delta / theta
            d = z
            for _ in range(degree - 1):
                resid = MJ(r - A(z))
                rho = 1.0 / (2.0 * theta / delta - rho_old)
                d = rho * rho_old * d + (2.0 * rho / delta) * resid
                z = z + d
                rho_old = rho
            return z + MC(r)

        return apply

    @jax.jit
    def additive(r):
        return MJ(r) + MC(r)

    @jax.jit
    def mult_sym(r):
        z1 = MC(r)
        z2 = z1 + MJ(r - A(z1))
        return z2 + MC(r - A(z2))

    b = jnp.asarray(rng.standard_normal((mesh.n_nodes, 3)), jnp.float32) * free32
    variants = {
        "additive": (additive, 0),
        "mult_sym": (mult_sym, 2),
        "cheb2": (cheb(2), 1),
        "cheb3": (cheb(3), 2),
    }
    out = {}
    for name, (M, extra_mv) in variants.items():
        iters = pcg_count(A, b, M, tol=1e-6)
        # implied 1M-DOF wall: matvec 34 ms; Jacobi+coarse+axpys ~12 ms
        implied = iters * (34.0 * (1 + extra_mv) + 12.0) / 1e3
        out[name] = {"iters": iters, "implied_1m_seconds": round(implied, 2)}
        print(f"{name}: {iters} iters, implied {implied:.2f}s at 1M",
              file=sys.stderr, flush=True)
    print(json.dumps({"n_dof": mesh.n_dof, "tol": 1e-6, "variants": out}))


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 16)
