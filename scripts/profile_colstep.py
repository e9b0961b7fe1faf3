"""Decompose the column-path force-eval cost on the 10,976-atom bench system.

Parts measured (chained scan, honest host-fenced timing per PERF.md):
  - full energy+forces eval (the MD step compute)
  - geometry chain alone: R -> col_rij -> (d, dir, rbf, fcut) -> geo, fwd+bwd
  - message kernels alone: 3x fused painn message fwd+bwd on frozen geo
  - per-atom rest (ctx/mixing/atomwise) inferred by subtraction
Run with PIECES=1 and PIECES=2 to see the bf16 lever.
"""
from __future__ import annotations

import sys
import time

import numpy as np

sys.path.insert(0, ".")


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

    from schnetpack_tpu import properties as P
    from schnetpack_tpu.atomistic import Atomwise, Forces, PairwiseDistances
    from schnetpack_tpu.model import NeuralNetworkPotential
    from schnetpack_tpu.ops import cellblock as cb
    from schnetpack_tpu.ops.cellblock import build_column_layout
    from schnetpack_tpu.ops.colblock import ColRefs
    from schnetpack_tpu.representation import PaiNN

    if len(sys.argv) > 1:
        cb.PIECES = int(sys.argv[1])
    print(f"PIECES={cb.PIECES}", flush=True)

    cutoff = 5.0
    skin = 0.3
    pos, cell = fcc_box(10_000)
    n_atoms = len(pos)
    lay = build_column_layout(pos, cutoff + skin, cell, np.ones(3, bool))
    nx, ny, Pcap, ksizes = lay.dims
    Ap = nx * ny * Pcap
    Ktot = int(sum(ksizes))
    n_edges = int(lay.emask.sum())
    print(f"grid {nx}x{ny} P={Pcap} ksizes={ksizes} Ktot={Ktot} "
          f"A'={Ap} real_edges={n_edges} "
          f"slot_fill={n_edges/(nx*ny*Ktot):.2f}", flush=True)

    dtype = jnp.float32
    Rs = jnp.asarray(pos[lay.order], dtype) * jnp.asarray(
        lay.slot_mask, dtype)[:, None]
    refs = ColRefs(jnp.asarray(lay.qcol), jnp.asarray(lay.dcol), Pcap,
                   tuple(ksizes))
    coff = jnp.asarray(lay.offcol, dtype)
    emask = jnp.asarray(lay.emask, dtype)
    Z = jnp.asarray((np.full(n_atoms, 18)[lay.order] *
                     (lay.slot_mask > 0)).astype(np.int32))

    inputs = {
        P.Z: Z,
        P.R: Rs,
        P.idx_m: jnp.zeros(Ap, jnp.int32),
        P.atom_mask: jnp.asarray(lay.slot_mask, dtype),
        P.n_atoms: jnp.asarray([n_atoms]),
        P.cell: jnp.asarray(cell, dtype)[None],
        P.pbc: jnp.ones((1, 3), bool),
        P.cell_qcol: refs.qcol,
        P.cell_dcol: refs.dcol,
        P.cell_coff: coff,
        P.cell_emask: emask,
        P.cell_ksz: tuple(jnp.zeros((k,), jnp.int8) for k in ksizes),
        P.idx_i: jnp.zeros(1, jnp.int32),
        P.idx_j: jnp.zeros(1, jnp.int32),
        P.offsets: jnp.full((1, 3), 1e3, dtype),
        P.pair_mask: jnp.zeros(1, dtype),
        P.mol_mask: jnp.ones(1, dtype),
    }

    pot = NeuralNetworkPotential(
        representation=PaiNN(n_atom_basis=128, n_interactions=3, n_rbf=20,
                             cutoff=cutoff),
        input_modules=[PairwiseDistances()],
        output_modules=[Atomwise(output_key=P.energy), Forces()],
    )
    params = pot.init(jax.random.PRNGKey(0), dict(inputs))

    results = {}

    def timed(name, fn, x0, iters=20):
        def chained(x):
            def body(c, _):
                r = fn(c)
                if isinstance(r, tuple):
                    r = r[0]
                return c + jnp.float32(1e-30) * r.ravel()[0], None
            c, _ = jax.lax.scan(body, x, None, length=iters)
            return jnp.sum(c.ravel()[:1])

        run = jax.jit(chained)
        trivial = jax.jit(lambda x: jnp.sum(x.ravel()[:1]))
        float(jax.device_get(run(x0 + jnp.float32(1e-5))))
        float(jax.device_get(trivial(x0 + jnp.float32(2e-5))))
        t0 = time.time()
        float(jax.device_get(trivial(x0 + jnp.float32(3e-5))))
        rtt = time.time() - t0
        t0 = time.time()
        float(jax.device_get(run(x0)))
        ms = (time.time() - t0 - rtt) / iters * 1e3
        results[name] = round(ms, 3)
        print(f"{name:40s} {ms:8.3f} ms", flush=True)
        return ms

    # ---- full energy+forces ------------------------------------------
    def full_eval(R):
        b = dict(inputs)
        b[P.R] = R
        out = pot.apply(params, b)
        return out[P.forces]

    timed("full energy+forces", full_eval, Rs)

    # ---- full energy+forces with the fused geometry kernel -----------
    coff_fm = jnp.asarray(np.moveaxis(lay.offcol, -1, 2), dtype)

    def full_eval_fused(R):
        b = dict(inputs)
        b[P.R] = R
        b[P.cell_coff_fm] = coff_fm
        out = pot.apply(params, b)
        return out[P.forces]

    timed("full energy+forces (fused geo)", full_eval_fused, Rs)

    # ---- fused geometry kernel alone ---------------------------------
    from schnetpack_tpu.ops.colblock_geo import column_geometry
    from schnetpack_tpu.ops.radial import gaussian_rbf_params as _grp

    c0, w0 = _grp(20, cutoff, 0.0)

    def geo_fused(R):
        return column_geometry(R, coff_fm, refs, c0, w0, cutoff)

    timed("fused geo kernel fwd", geo_fused, Rs)

    def geo_fused_vjp(R):
        out, pull = jax.vjp(geo_fused, R)
        return pull(jax.tree.map(lambda x: x * 1e-6, out))[0]

    timed("fused geo kernel fwd+bwd", geo_fused_vjp, Rs)

    # ---- forward only -------------------------------------------------
    pot_fwd = NeuralNetworkPotential(
        representation=PaiNN(n_atom_basis=128, n_interactions=3, n_rbf=20,
                             cutoff=cutoff),
        input_modules=[PairwiseDistances()],
        output_modules=[Atomwise(output_key=P.energy)],
    )

    def fwd_eval(R):
        b = dict(inputs)
        b[P.R] = R
        return pot_fwd.apply(params, b)[P.energy]

    timed("forward only (energy)", fwd_eval, Rs)

    # ---- geometry chain alone (fwd + bwd) ----------------------------
    from schnetpack_tpu.nn.cutoff import CosineCutoff
    from schnetpack_tpu.ops.colblock import column_expand, column_gather
    from schnetpack_tpu.ops.math import safe_norm
    from schnetpack_tpu.ops.radial import gaussian_rbf, gaussian_rbf_params

    centers, widths = gaussian_rbf_params(20, cutoff, 0.0)
    centers = jnp.asarray(centers, dtype)
    widths = jnp.asarray(widths, dtype)
    cfn = CosineCutoff(cutoff=cutoff)

    def geo_chain(R):
        Rj = column_gather(R, refs)
        Ri = column_expand(R, refs)
        rij = Rj + coff * emask[..., None] - Ri
        d = safe_norm(rij, axis=-1)
        dirs = rij / d[..., None]
        fcut = 0.5 * (jnp.cos(jnp.pi * d / cutoff) + 1.0) * (d < cutoff) * emask
        phi = gaussian_rbf(d, centers, widths)
        rbf_aug = jnp.concatenate([phi * fcut[..., None], fcut[..., None]],
                                  axis=-1)
        from schnetpack_tpu.ops.colblock_geo import split_geo

        geo = jnp.concatenate([jnp.moveaxis(rbf_aug, -1, -2),
                               jnp.moveaxis(dirs, -1, -2)], axis=2)
        return split_geo(geo, refs.ksizes)

    timed("geometry chain fwd", geo_chain, Rs)

    def geo_vjp(R):
        out, pull = jax.vjp(geo_chain, R)
        return pull(jax.tree.map(lambda x: x * 1e-6, out))[0]

    timed("geometry chain fwd+bwd", geo_vjp, Rs)

    # ---- message kernels on frozen geo -------------------------------
    from schnetpack_tpu.ops.colblock import painn_message_columns_fm

    geo0 = jax.jit(geo_chain)(Rs)
    FW_aug = jnp.asarray(np.random.RandomState(0).randn(21, 384) * 0.02, dtype)
    xmu0 = jnp.asarray(np.random.RandomState(1).randn(Ap, 768) * 0.1, dtype)

    def msg3(xmu):
        q = xmu[:, :128]
        for _ in range(3):
            dq, dmu = painn_message_columns_fm(xmu[:, :384], xmu[:, 384:], geo0, FW_aug, refs)
            q = q + dq
            xmu = xmu + jnp.concatenate([dmu, dmu], axis=-1) * 1e-3
        return q

    timed("3x message fwd (frozen geo)", msg3, xmu0)

    def msg3_vjp(xmu):
        out, pull = jax.vjp(msg3, xmu)
        return pull(out * 1e-6)[0]

    timed("3x message fwd+bwd (frozen geo)", msg3_vjp, xmu0)

    # ---- message incl. geo cotangent ---------------------------------
    def msg3_geo(R):
        geo = geo_chain(R)
        q = None
        xmu = xmu0
        for _ in range(3):
            dq, dmu = painn_message_columns_fm(xmu[:, :384], xmu[:, 384:], geo, FW_aug, refs)
            q = dq if q is None else q + dq
            xmu = xmu + jnp.concatenate([dmu, dmu], axis=-1) * 1e-3
        return q

    def msg3_geo_vjp(R):
        out, pull = jax.vjp(msg3_geo, R)
        return pull(out * 1e-6)[0]

    timed("3x message + geo, fwd+bwd", msg3_geo_vjp, Rs)

    print({k: v for k, v in results.items()}, flush=True)


if __name__ == "__main__":
    main()
