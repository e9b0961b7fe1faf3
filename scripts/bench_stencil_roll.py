"""Microbenchmark: stencil-roll + one-hot compaction vs per-atom gather.

Design under test (round-2 layout): atoms binned into a cell grid with
cell side >= cutoff+skin, sorted cell-major, each cell padded to capacity
C.  The 27 neighbor cells of every cell sit at STATIC offsets in the grid,
so candidate features arrive via `jnp.roll` (contiguous copies — no gather,
and `roll` wraps = periodic boundary for free).  Each atom's K true
neighbors are then compacted out of the 27*C candidates with a one-hot
batched matmul (MXU).  The backward is automatically scatter-free: the
transpose of roll is roll, of matmul is matmul.

IMPORTANT (axon): the one-hot array must be passed as a jit ARGUMENT —
closed-over big constants are baked into the HLO and blow the remote
compiler's HTTP limit.
"""
from __future__ import annotations

import time

import numpy as np


def fcc_box(n_target: int, a: float = 5.26):
    n_cells = int(round((n_target / 4) ** (1 / 3)))
    base = np.array([[0, 0, 0], [0.5, 0.5, 0], [0.5, 0, 0.5], [0, 0.5, 0.5]])
    pos = []
    for i in range(n_cells):
        for j in range(n_cells):
            for k in range(n_cells):
                pos.append((base + [i, j, k]) * a)
    return np.concatenate(pos), np.eye(3) * (a * n_cells)


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax

    from schnetpack_tpu.transform.neighborlist import cell_list_neighbor_list

    pos, cell = fcc_box(10_000)
    A = len(pos)
    L = cell[0, 0]
    # grid aligned to the FCC lattice: side == a -> exactly 4 atoms/cell
    nc = 14
    side = L / nc
    rbuild = 5.2  # cutoff 5.0 + 0.2 skin; side 5.26 >= rbuild
    ci = np.clip(np.floor(pos / side).astype(np.int64), 0, nc - 1)
    cid = (ci[:, 0] * nc + ci[:, 1]) * nc + ci[:, 2]
    perm = np.argsort(cid, kind="stable")
    pos = pos[perm]
    cid_sorted = cid[perm]
    counts = np.bincount(cid_sorted, minlength=nc**3)
    C = int(counts.max())
    NC = nc**3
    print(f"A={A} grid={nc}^3={NC} side={side:.3f} C={C} padded={NC*C}", flush=True)

    start = np.zeros(NC + 1, np.int64)
    np.cumsum(counts, out=start[1:])
    slot = np.arange(A) - start[cid_sorted]
    tbl_of_atom = cid_sorted * C + slot

    ii, jj, S = cell_list_neighbor_list(pos, rbuild, cell, np.ones(3, bool))
    order = np.argsort(ii, kind="stable")
    ii, jj, S = ii[order], jj[order], S[order]
    ncnt = np.bincount(ii, minlength=A)
    K = int(ncnt.max())
    print(f"K={K} pairs={len(ii)}", flush=True)

    ci3 = np.stack([cid_sorted // (nc * nc), (cid_sorted // nc) % nc, cid_sorted % nc], 1)
    cstart = np.zeros(A + 1, np.int64)
    np.cumsum(ncnt, out=cstart[1:])
    eslot = np.arange(len(ii)) - cstart[ii]
    d3 = ci3[jj] - ci3[ii] + S * nc
    assert np.abs(d3).max() <= 1, f"stencil overflow: {np.abs(d3).max()}"
    delta_idx = (d3[:, 0] + 1) * 9 + (d3[:, 1] + 1) * 3 + (d3[:, 2] + 1)
    lidx_e = delta_idx * C + slot[jj]

    KP = -(-K // 4) * 4
    AP = NC * C
    local_idx = np.zeros((AP, KP), np.int32)
    lmask = np.zeros((AP, KP), np.float32)
    local_idx[tbl_of_atom[ii], eslot] = lidx_e
    lmask[tbl_of_atom[ii], eslot] = 1.0
    lidx_g = local_idx.reshape(NC, C * KP)

    deltas = [(dx, dy, dz) for dx in (-1, 0, 1) for dy in (-1, 0, 1) for dz in (-1, 0, 1)]
    oh16 = jnp.asarray(
        jax.nn.one_hot(lidx_g, 27 * C, dtype=np.float32).astype(jnp.bfloat16))
    oh32 = oh16.astype(jnp.float32)
    print(f"onehot {oh16.shape} bf16 {oh16.nbytes/1e6:.0f} MB; KP={KP}", flush=True)

    nbh = np.zeros((AP, KP), np.int32)
    nbh[tbl_of_atom[ii], eslot] = tbl_of_atom[jj]
    nbh_j = jnp.asarray(nbh)
    pmask = jnp.asarray(lmask)

    results = {}

    def time_chain(name, fn, shape, extra=(), n_iter=32, n_rep=3):
        def chained(x, *e):
            def body(c, _):
                return fn(c, *e), None
            return lax.scan(body, x, None, length=n_iter)[0]

        run = jax.jit(chained)
        seed = int(time.time_ns()) % 2**31
        xw = jax.random.normal(jax.random.PRNGKey(seed), shape, jnp.float32)
        # NOTE: under axon, block_until_ready does NOT wait for remote
        # completion — a host transfer (float(sum)) is the only honest fence
        float(jnp.sum(run(xw, *extra)))
        times = []
        for r in range(n_rep):
            xt = jax.random.normal(jax.random.PRNGKey(seed + 101 + r), shape,
                                   jnp.float32)
            float(jnp.sum(xt))
            t0 = time.perf_counter()
            float(jnp.sum(run(xt, *extra)))
            times.append((time.perf_counter() - t0) / n_iter * 1e3)
        ms = float(np.median(times))
        results[name] = round(ms, 3)
        print(f"{name:48s} {ms:8.3f} ms   (reps: {[round(t,3) for t in times]})",
              flush=True)

    def rolled_cand(x, W):
        xc = x.reshape(nc, nc, nc, C, W)
        return jnp.concatenate(
            [jnp.roll(xc, (-d[0], -d[1], -d[2]), axis=(0, 1, 2)).reshape(NC, C, W)
             for d in deltas], axis=1)  # [NC, 27C, W]

    for W in (128, 384):
        def per_atom(x, nbh_j, pmask):
            xj = jnp.take(x, nbh_j, axis=0)
            return x + 1e-6 * jnp.sum(xj * pmask[..., None], axis=1)
        time_chain(f"A_per_atom_fwd_W{W}", per_atom, (AP, W), (nbh_j, pmask))

        def per_atom_grad(x, nbh_j, pmask):
            def loss(y):
                xj = jnp.take(y, nbh_j, axis=0)
                return jnp.sum(jnp.sin(xj * pmask[..., None]))
            return x + 1e-6 * jax.grad(loss)(x)
        time_chain(f"A_per_atom_fwdbwd_W{W}", per_atom_grad, (AP, W), (nbh_j, pmask))

        def stencil(x, oh, pmask):
            cand = rolled_cand(x, W)
            xj = jnp.einsum("gpl,glf->gpf", oh, cand.astype(oh.dtype),
                            preferred_element_type=jnp.float32)
            xj = xj.reshape(AP, KP, W)
            return x + 1e-6 * jnp.sum(xj * pmask[..., None], axis=1)
        time_chain(f"S_stencil_bf16_fwd_W{W}", stencil, (AP, W), (oh16, pmask))
        time_chain(f"S_stencil_f32_fwd_W{W}", stencil, (AP, W), (oh32, pmask))

        def stencil_grad(x, oh, pmask):
            def loss(y):
                cand = rolled_cand(y, W)
                xj = jnp.einsum("gpl,glf->gpf", oh, cand.astype(oh.dtype),
                                preferred_element_type=jnp.float32)
                xj = xj.reshape(AP, KP, W)
                return jnp.sum(jnp.sin(xj * pmask[..., None]))
            return x + 1e-6 * jax.grad(loss)(x)
        time_chain(f"S_stencil_bf16_fwdbwd_W{W}", stencil_grad, (AP, W), (oh16, pmask))
        time_chain(f"S_stencil_f32_fwdbwd_W{W}", stencil_grad, (AP, W), (oh32, pmask))

        if W == 128:
            def stencil_hilo(x, oh, pmask):
                cand = rolled_cand(x, W)
                hi = cand.astype(jnp.bfloat16)
                lo = (cand - hi.astype(jnp.float32)).astype(jnp.bfloat16)
                xj = (jnp.einsum("gpl,glf->gpf", oh, hi, preferred_element_type=jnp.float32)
                      + jnp.einsum("gpl,glf->gpf", oh, lo, preferred_element_type=jnp.float32))
                xj = xj.reshape(AP, KP, W)
                return x + 1e-6 * jnp.sum(xj * pmask[..., None], axis=1)
            time_chain(f"S_stencil_hilo_fwd_W{W}", stencil_hilo, (AP, W), (oh16, pmask))

    # numeric check
    x = jax.random.normal(jax.random.PRNGKey(3), (AP, 128), jnp.float32)
    ref = jnp.take(x, nbh_j, axis=0) * pmask[..., None]
    cand = rolled_cand(x, 128)
    got = jnp.einsum("gpl,glf->gpf", oh16, cand.astype(jnp.bfloat16),
                     preferred_element_type=jnp.float32).reshape(AP, KP, 128)
    err = jnp.max(jnp.abs(got * pmask[..., None] - ref))
    got32 = jnp.einsum("gpl,glf->gpf", oh32, cand).reshape(AP, KP, 128)
    err32 = jnp.max(jnp.abs(got32 * pmask[..., None] - ref))
    hi = cand.astype(jnp.bfloat16)
    lo = (cand - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    got2 = (jnp.einsum("gpl,glf->gpf", oh16, hi, preferred_element_type=jnp.float32)
            + jnp.einsum("gpl,glf->gpf", oh16, lo, preferred_element_type=jnp.float32))
    err2 = jnp.max(jnp.abs(got2.reshape(AP, KP, 128) * pmask[..., None] - ref))
    print(f"max_abs_err bf16={float(err):.2e} f32mm={float(err32):.2e} hilo={float(err2):.2e}")
    print(results)


if __name__ == "__main__":
    main()
