"""Microbenchmark: neighbor-gather strategies on TPU (round-2 perf work).

Candidate replacement for the per-atom dense [A, K] row gather (the round-1
bottleneck: ~14 ns/row latency-bound, 12 gathers x 132k rows = most of the
47 ms PaiNN force eval):

  block layout -- atoms Morton-sorted and grouped into blocks of B
  consecutive atoms; features viewed as [n_blocks, B*F]. Per block (group)
  we gather its M candidate neighbor *blocks* as wide contiguous rows
  (amortizing the per-row latency over B atoms), then compact the
  [M*B] local candidate table down to each atom's K neighbor slots either
  with a one-hot batched matmul (MXU) or a batched take_along_axis.

Timing follows PERF.md rules: iterations chained with a data dependency
inside ONE lax.scan dispatch; warmup uses different input data than the
timed run (the axon remote-execution layer caches identical executions).
"""
from __future__ import annotations

import json
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


def morton_order(pos: np.ndarray, cell_size: float) -> np.ndarray:
    """Sort order interleaving cell-coordinate bits (Z-order curve)."""
    c = np.floor((pos - pos.min(0)) / cell_size).astype(np.int64)
    code = np.zeros(len(pos), np.int64)
    for bit in range(10):
        for d in range(3):
            code |= ((c[:, d] >> bit) & 1) << (3 * bit + d)
    return np.argsort(code, kind="stable")


def build_dense(pos, cell, cutoff):
    """Dense [A, K] neighbor matrix via the repo's C++ cell list."""
    from schnetpack_tpu.transform.neighborlist import cell_list_neighbor_list

    ii, jj, S = cell_list_neighbor_list(pos, cutoff, cell, np.ones(3, bool))
    off = S.astype(np.float64) @ cell
    A = len(pos)
    order = np.argsort(ii, kind="stable")
    ii, jj, off = ii[order], jj[order], off[order]
    counts = np.bincount(ii, minlength=A)
    K = int(counts.max())
    starts = np.zeros(A + 1, np.int64)
    np.cumsum(counts, out=starts[1:])
    slots = np.arange(len(ii)) - starts[ii]
    nbh = np.full((A, K), A - 1, np.int32)
    mask = np.zeros((A, K), np.float32)
    nbh[ii, slots] = jj
    mask[ii, slots] = 1.0
    return nbh, mask, K


def build_block_structure(nbh, mask, B):
    """Per-group candidate block lists + local compaction indices.

    Atoms assumed already sorted (nbh indices refer to sorted order).
    Returns (cand_idx [ng, M] int32, local_idx [A, K] int32, M).
    Padded neighbor slots map to local candidate 0 (mask kills them later).
    """
    A, K = nbh.shape
    ng = A // B
    assert ng * B == A
    nbr_block = nbh // B  # [A, K]
    cand_lists = []
    for g in range(ng):
        blocks = np.unique(nbr_block[g * B:(g + 1) * B][mask[g * B:(g + 1) * B] > 0])
        cand_lists.append(blocks)
    M = max(len(c) for c in cand_lists)
    M = -(-M // 4) * 4
    cand_idx = np.zeros((ng, M), np.int32)
    local_idx = np.zeros((A, K), np.int32)
    for g, blocks in enumerate(cand_lists):
        cand_idx[g, : len(blocks)] = blocks
        lookup = {b: m for m, b in enumerate(blocks)}
        rows = slice(g * B, (g + 1) * B)
        nb = nbr_block[rows]
        loc = np.zeros((B, K), np.int32)
        for a in range(B):
            for k in range(K):
                if mask[g * B + a, k] > 0:
                    loc[a, k] = lookup[nb[a, k]] * B + (nbh[g * B + a, k] % B)
        local_idx[rows] = loc
    return cand_idx, local_idx, M


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax

    pos, cell = fcc_box(10_000)
    A = len(pos)
    order = morton_order(pos, 5.3)
    pos = pos[order]
    results = {"device": str(jax.devices()[0]), "n_atoms": A}

    def time_chain(name, fn, x0_shape, dtype=jnp.float32, n_iter=24):
        key_w = jax.random.PRNGKey(int(time.time_ns()) % 2**31)
        key_t = jax.random.PRNGKey(int(time.time_ns()) % 2**31 + 7)
        xw = jax.random.normal(key_w, x0_shape, dtype)
        xt = jax.random.normal(key_t, x0_shape, dtype)

        def chained(x):
            def body(c, _):
                return fn(c), None
            return lax.scan(body, x, None, length=n_iter)[0]

        run = jax.jit(chained)
        jax.block_until_ready(run(xw))
        t0 = time.perf_counter()
        jax.block_until_ready(run(xt))
        ms = (time.perf_counter() - t0) / n_iter * 1e3
        results[name] = round(ms, 3)
        print(f"{name:55s} {ms:8.3f} ms", flush=True)

    for cutoff, tag in [(5.3, "K18")]:
        nbh, mask, K = build_dense(pos, cell, cutoff)
        print(f"--- cutoff {cutoff} K={K} ---", flush=True)
        nbh_j = jnp.asarray(nbh)
        mask_j = jnp.asarray(mask)

        for W in (128, 384):
            w = f"{tag}_F{W}"
            # A) per-atom row gather (round-1 production path)
            def per_atom(x, nbh_j=nbh_j, mask_j=mask_j):
                xj = jnp.take(x, nbh_j, axis=0)           # [A, K, W]
                return x + 1e-6 * jnp.sum(xj * mask_j[..., None], axis=1)
            time_chain(f"A_per_atom_gather_{w}", per_atom, (A, W))

            # A-bf16) same, features in bf16
            def per_atom16(x, nbh_j=nbh_j, mask_j=mask_j):
                xj = jnp.take(x.astype(jnp.bfloat16), nbh_j, axis=0)
                return x + 1e-6 * jnp.sum(
                    xj.astype(jnp.float32) * mask_j[..., None], axis=1)
            time_chain(f"Abf16_per_atom_gather_{w}", per_atom16, (A, W))

            for B in (8, 16):
                cand_idx, local_idx, M = build_block_structure(nbh, mask, B)
                ng = A // B
                ci = jnp.asarray(cand_idx)
                li = jnp.asarray(local_idx.reshape(ng, B * K))
                oh = jax.nn.one_hot(local_idx.reshape(ng, B * K), M * B,
                                    dtype=jnp.float32)
                oh16 = oh.astype(jnp.bfloat16)
                print(f"  [B={B}: n_groups={ng} M={M} cand/atom={M*B} "
                      f"row_bytes={B*W*4}]", flush=True)

                # B1) block-row gather only
                def block_gather(x, ci=ci, B=B, M=M, W=W):
                    xb = x.reshape(ng, B * W)
                    cand = jnp.take(xb, ci, axis=0)       # [ng, M, B*W]
                    return x + 1e-6 * jnp.sum(cand, axis=1).reshape(A, W)
                time_chain(f"B1_block_gather_only_B{B}_{w}", block_gather, (A, W))

                # B2) block gather + take_along_axis compaction
                def block_taa(x, ci=ci, li=li, B=B, M=M, W=W):
                    xb = x.reshape(ng, B * W)
                    cand = jnp.take(xb, ci, axis=0).reshape(ng, M * B, W)
                    xj = jnp.take_along_axis(cand, li[..., None], axis=1)
                    xj = xj.reshape(A, K, W)
                    return x + 1e-6 * jnp.sum(xj * mask_j[..., None], axis=1)
                time_chain(f"B2_block_taa_B{B}_{w}", block_taa, (A, W))

                # B3) block gather + one-hot bmm compaction (f32)
                def block_oh(x, ci=ci, oh=oh, B=B, M=M, W=W):
                    xb = x.reshape(ng, B * W)
                    cand = jnp.take(xb, ci, axis=0).reshape(ng, M * B, W)
                    xj = jnp.einsum("gpl,glf->gpf", oh, cand).reshape(A, K, W)
                    return x + 1e-6 * jnp.sum(xj * mask_j[..., None], axis=1)
                time_chain(f"B3_block_onehot_f32_B{B}_{w}", block_oh, (A, W))

                # B4) one-hot bmm, bf16 one-hot + bf16 candidates (f32 accum)
                def block_oh16(x, ci=ci, oh16=oh16, B=B, M=M, W=W):
                    xb = x.astype(jnp.bfloat16).reshape(ng, B * W)
                    cand = jnp.take(xb, ci, axis=0).reshape(ng, M * B, W)
                    xj = jnp.einsum("gpl,glf->gpf", oh16, cand,
                                    preferred_element_type=jnp.float32)
                    xj = xj.reshape(A, K, W)
                    return x + 1e-6 * jnp.sum(xj * mask_j[..., None], axis=1)
                time_chain(f"B4_block_onehot_bf16_B{B}_{w}", block_oh16, (A, W))

                # B5) one-hot bmm HIGHEST precision (exact f32 selection)
                def block_ohh(x, ci=ci, oh=oh, B=B, M=M, W=W):
                    xb = x.reshape(ng, B * W)
                    cand = jnp.take(xb, ci, axis=0).reshape(ng, M * B, W)
                    xj = jnp.einsum("gpl,glf->gpf", oh, cand,
                                    precision=lax.Precision.HIGHEST)
                    xj = xj.reshape(A, K, W)
                    return x + 1e-6 * jnp.sum(xj * mask_j[..., None], axis=1)
                time_chain(f"B5_block_onehot_hi_B{B}_{w}", block_ohh, (A, W))

    print(json.dumps(results))


if __name__ == "__main__":
    main()
