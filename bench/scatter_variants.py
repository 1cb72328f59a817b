"""Microbenchmark: gather/scatter layout variants at 1M-DOF TET10 scale.

The per-PCG-iteration cost of the matrix-free path is dominated by the
nodal gather + scatter-add (BENCH_NOTES.md: ~75 of ~92 ms at 1M DOF).
This experiment measures the indexed-op variants head-to-head ON DEVICE,
inside a fori_loop (dispatch-free), to decide the production layout:

  gathers                        scatters
  G1  x[3,N] -> x[:, conn_T]     S1  3 x segment_sum([A*E] f32, ids, N)
  G2  x[N,3] -> x[conn_flat]     S2  1 x segment_sum([A*E, 3] rows, ids, N)
  G3  x[3N]  -> x[ids3]          S3  1 x segment_sum([3*A*E] interleaved, 3N)
                                 S2w 1 x segment_sum([A*E, 8] rows, ids, N)
                                 S1r S1 with randomly relabeled node ids
                                     (does index locality matter at all?)
                                 S4  valence-bucketed padded per-node GATHER
                                     (TPU gathers ~4x cheaper per scalar than
                                     scatter-adds; buckets kill the padding
                                     waste that sank the naive dmax variant)

Usage: python bench/scatter_variants.py [n]   (box n, default 36 = 1M DOF)
"""

import sys
import time
import pathlib

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax


def timed(fn, *args, iters, label):
    out = jax.block_until_ready(fn(*args))  # compile + warm
    t0 = time.perf_counter()
    out = jax.block_until_ready(fn(*args))
    dt = (time.perf_counter() - t0) / iters * 1e3
    print(f"{label:34s} {dt:8.2f} ms/iter", flush=True)
    return dt


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 36
    from fea_large_tpu.mesh.generators import box_mesh

    mesh = box_mesh(n, n, n, element_type="tet10")
    conn = mesh.conn_host.astype(np.int32)  # [E, npe]
    N, (E, npe) = mesh.n_nodes, conn.shape
    print(f"backend={jax.default_backend()} N={N} E={E} npe={npe}", flush=True)

    conn_T = np.ascontiguousarray(conn.T)  # [npe, E]
    flat = conn_T.reshape(-1)  # [npe*E] a-major
    rng = np.random.default_rng(0)
    relabel = rng.permutation(N).astype(np.int32)
    ids_dev = jnp.asarray(flat)
    ids_r_dev = jnp.asarray(relabel[flat])
    conn_T_dev = jnp.asarray(conn_T)
    # interleaved (node, comp) -> 3*node+comp ids for all 3 comps, comp-major
    ids3 = (3 * flat[None, :] + np.arange(3)[:, None]).reshape(-1)
    ids3_dev = jnp.asarray(ids3.astype(np.int32))

    A = npe * E
    ITERS = 50
    x_T = jnp.asarray(rng.standard_normal((3, N)), jnp.float32)
    x_nm = x_T.T.copy()
    x_f = x_T.reshape(-1)
    d3 = jnp.asarray(rng.standard_normal((3, A)), jnp.float32)
    d_rows = d3.T.copy()
    d_rows8 = jnp.concatenate(
        [d_rows, jnp.zeros((A, 5), jnp.float32)], axis=1
    )
    d_flat = d3.reshape(-1)

    # ---- gathers: carry the nodal vector, consume the gathered values by a
    # full (cheap, vectorized) reduction so nothing is hoisted or DCE'd
    @jax.jit
    def g1(x):  # x [3, N]
        def body(i, x):
            d = x[:, conn_T_dev]  # [3, npe, E]
            return x * (1.0 + 1e-30 * jnp.sum(d))
        return lax.fori_loop(0, ITERS, body, x)

    @jax.jit
    def g2(x):  # x [N, 3]
        def body(i, x):
            d = x[ids_dev]  # [A, 3] row windows
            return x * (1.0 + 1e-30 * jnp.sum(d))
        return lax.fori_loop(0, ITERS, body, x)

    @jax.jit
    def g3(x):  # x [3N]
        def body(i, x):
            d = x[ids3_dev]  # [3A]
            return x * (1.0 + 1e-30 * jnp.sum(d))
        return lax.fori_loop(0, ITERS, body, x)

    # ---- scatters: carry the flat element-side data; consume the scattered
    # nodal vector by a full reduction
    @jax.jit
    def s1(d):  # d [3, A]
        def body(i, d):
            y = jnp.stack(
                [jax.ops.segment_sum(d[c], ids_dev, num_segments=N) for c in range(3)]
            )
            return d * (1.0 + 1e-30 * jnp.sum(y))
        return lax.fori_loop(0, ITERS, body, d)

    @jax.jit
    def s1r(d):  # random node relabeling
        def body(i, d):
            y = jnp.stack(
                [jax.ops.segment_sum(d[c], ids_r_dev, num_segments=N) for c in range(3)]
            )
            return d * (1.0 + 1e-30 * jnp.sum(y))
        return lax.fori_loop(0, ITERS, body, d)

    @jax.jit
    def s2(d):  # d [A, 3] row windows
        def body(i, d):
            y = jax.ops.segment_sum(d, ids_dev, num_segments=N)
            return d * (1.0 + 1e-30 * jnp.sum(y))
        return lax.fori_loop(0, ITERS, body, d)

    @jax.jit
    def s2w(d):  # d [A, 8]
        def body(i, d):
            y = jax.ops.segment_sum(d, ids_dev, num_segments=N)
            return d * (1.0 + 1e-30 * jnp.sum(y))
        return lax.fori_loop(0, ITERS, body, d)

    @jax.jit
    def s3(d):  # d [3A] interleaved
        def body(i, d):
            y = jax.ops.segment_sum(d, ids3_dev, num_segments=3 * N)
            return d * (1.0 + 1e-30 * jnp.sum(y))
        return lax.fori_loop(0, ITERS, body, d)

    # ---- S4: scatter-as-gather. Host-side: per node, the list of flat slot
    # positions that hit it, padded within valence buckets.
    counts = np.bincount(flat, minlength=N)
    order = np.argsort(flat, kind="stable")
    starts = np.zeros(N + 1, np.int64)
    np.cumsum(counts, out=starts[1:])
    caps = []
    cap = 1
    while cap < counts.max():
        cap *= 2
        caps.append(cap)
    buckets = []  # (node_ids, idx [nb, v], mask [nb, v])
    total_pad = 0
    lo = 0
    for cap in caps:
        sel = np.nonzero((counts > lo) & (counts <= cap))[0]
        lo = cap
        if len(sel) == 0:
            continue
        nb = len(sel)
        idx = np.zeros((nb, cap), np.int32)
        msk = np.zeros((nb, cap), np.float32)
        for j, node in enumerate(sel):  # slow loop ok: microbench setup
            c = counts[node]
            idx[j, :c] = order[starts[node] : starts[node] + c]
            msk[j, :c] = 1.0
        total_pad += nb * cap
        buckets.append((jnp.asarray(sel.astype(np.int32)), jnp.asarray(idx),
                        jnp.asarray(msk)))
    inv = np.empty(N, np.int64)
    inv[np.concatenate([np.asarray(b[0]) for b in buckets])] = np.arange(N)
    inv_dev = jnp.asarray(inv.astype(np.int32))
    print(f"S4 buckets: {[tuple(b[1].shape) for b in buckets]} "
          f"pad_factor={total_pad / A:.2f}", flush=True)

    @jax.jit
    def s4(d):  # d [3, A]
        def body(i, d):
            parts = [
                jnp.sum(d[:, idx] * msk[None], axis=2)
                for (_, idx, msk) in buckets
            ]
            y = jnp.concatenate(parts, axis=1)[:, inv_dev]  # back to node order
            return d * (1.0 + 1e-30 * jnp.sum(y))
        return lax.fori_loop(0, ITERS, body, d)

    print("warming up device transfer...", flush=True)
    jax.block_until_ready(jnp.sum(x_T))
    float(jnp.sum(x_T))  # D2H warmup (~52 s first time per process)
    print("-- gathers (npe*E*3 = %.1fM scalars)" % (3 * A / 1e6), flush=True)
    timed(g1, x_T, iters=ITERS, label="G1 x[3,N] component gathers")
    timed(g2, x_nm, iters=ITERS, label="G2 x[N,3] row-window gather")
    timed(g3, x_f, iters=ITERS, label="G3 x[3N] interleaved gather")
    print("-- scatters", flush=True)
    timed(s1, d3, iters=ITERS, label="S1 3x segment_sum (current)")
    timed(s2, d_rows, iters=ITERS, label="S2 row-window segment_sum")
    timed(s2w, d_rows8, iters=ITERS, label="S2w 8-wide row segment_sum")
    timed(s3, d_flat, iters=ITERS, label="S3 interleaved segment_sum")
    timed(s1r, d3, iters=ITERS, label="S1r random-relabel (locality?)")
    timed(s4, d3, iters=ITERS, label="S4 bucketed gather-sum scatter")


if __name__ == "__main__":
    main()
