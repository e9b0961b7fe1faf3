"""A/B the PaiNN column fusion modes (full vs hybrid geo-resident bwd).

Checks force agreement between the modes, then times the full
energy+forces evaluation for each on the 10,976-atom bench box
(chained-scan timing per PERF.md methodology).
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


def main(n_atoms=10_000, pieces=1):
    import jax
    import jax.numpy as jnp

    from schnetpack_tpu import properties as P
    from schnetpack_tpu.atomistic import Atomwise, Forces, PairwiseDistances
    from schnetpack_tpu.model import NeuralNetworkPotential
    from schnetpack_tpu.ops import cellblock as cb
    from schnetpack_tpu.ops.cellblock import build_column_layout
    from schnetpack_tpu.ops.colblock import ColRefs
    from schnetpack_tpu.representation import PaiNN

    cb.PIECES = pieces
    print(f"PIECES={pieces}", flush=True)

    cutoff = 5.0
    skin = 0.3
    pos, cell = fcc_box(n_atoms)
    n = len(pos)
    rng = np.random.RandomState(0)
    pos = pos + rng.uniform(-0.15, 0.15, pos.shape)
    lay = build_column_layout(pos, cutoff + skin, cell, np.ones(3, bool))
    nx, ny, Pcap, ksizes = lay.dims
    Ap = nx * ny * Pcap
    print(f"grid {nx}x{ny} P={Pcap} Ktot={sum(ksizes)} "
          f"fill={lay.emask.sum()/(nx*ny*sum(ksizes)):.2f}", flush=True)

    dtype = jnp.float32
    Rs = jnp.asarray(pos[lay.order], dtype) * jnp.asarray(
        lay.slot_mask, dtype)[:, None]
    refs = ColRefs(jnp.asarray(lay.qcol), jnp.asarray(lay.dcol), Pcap,
                   tuple(ksizes))
    inputs = {
        P.Z: jnp.asarray((np.full(n, 18)[lay.order] *
                          (lay.slot_mask > 0)).astype(np.int32)),
        P.R: Rs,
        P.idx_m: jnp.zeros(Ap, jnp.int32),
        P.atom_mask: jnp.asarray(lay.slot_mask, dtype),
        P.n_atoms: jnp.asarray([n]),
        P.cell: jnp.asarray(cell, dtype)[None],
        P.pbc: jnp.ones((1, 3), bool),
        P.cell_qcol: refs.qcol,
        P.cell_dcol: refs.dcol,
        P.cell_coff: jnp.asarray(lay.offcol, dtype),
        P.cell_coff_fm: jnp.asarray(np.moveaxis(lay.offcol, -1, 2), dtype),
        P.cell_emask: jnp.asarray(lay.emask, dtype),
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

    def forces(R):
        b = dict(inputs)
        b[P.R] = R
        return pot.apply(params, b)[P.forces]

    # ---- numerics check ------------------------------------------------
    outs = {}
    for mode in ("full", "hybrid"):
        cb.FUSE = mode
        outs[mode] = np.asarray(jax.jit(forces)(Rs))
    ref = outs["full"]
    dev = np.abs(outs["hybrid"] - ref)
    scale = np.abs(ref).max()
    print(f"force |hybrid-full|: max {dev.max():.3e} "
          f"rel {dev.max()/scale:.3e}  (scale {scale:.3f})", flush=True)

    # ---- timing --------------------------------------------------------
    def timed(mode, iters=20):
        cb.FUSE = mode

        def chained(R):
            def body(c, _):
                return c + jnp.float32(1e-7) * forces(c), None
            c, _ = jax.lax.scan(body, R, None, length=iters)
            return jnp.sum(c.ravel()[:1])

        run = jax.jit(chained)
        trivial = jax.jit(lambda x: jnp.sum(x.ravel()[:1]))
        float(jax.device_get(run(Rs + jnp.float32(1e-5))))
        float(jax.device_get(trivial(Rs + jnp.float32(2e-5))))
        best = 1e9
        for rep in range(4):
            t0 = time.time()
            float(jax.device_get(trivial(Rs + jnp.float32(3e-5 + rep * 1e-6))))
            rtt = time.time() - t0
            t0 = time.time()
            float(jax.device_get(run(Rs + jnp.float32(rep * 1e-6))))
            ms = (time.time() - t0 - rtt) / iters * 1e3
            best = min(best, ms)
        print(f"{mode:8s} energy+forces: {best:8.3f} ms (best of 4)",
              flush=True)
        return best

    t_full = timed("full")
    t_hyb = timed("hybrid")
    print(f"speedup hybrid vs full: {t_full / t_hyb:.3f}x", flush=True)

    # ---- per-kernel device trace for both modes -------------------------
    import glob
    import gzip
    import json
    from collections import defaultdict

    for mode in ("full", "hybrid"):
        cb.FUSE = mode

        def chained(R, iters=20):
            def body(c, _):
                return c + jnp.float32(1e-7) * forces(c), None
            c, _ = jax.lax.scan(body, R, None, length=iters)
            return jnp.sum(c.ravel()[:1])

        run = jax.jit(chained)
        float(jax.device_get(run(Rs + jnp.float32(1e-5))))
        out = f"/tmp/ab_trace_{mode}"
        with jax.profiler.trace(out):
            float(jax.device_get(run(Rs)))
        files = sorted(glob.glob(out + "/**/*.trace.json.gz", recursive=True))
        with gzip.open(files[-1], "rt") as f:
            trace = json.load(f)
        pids = {ev["pid"]: ev["args"].get("name", "")
                for ev in trace["traceEvents"]
                if ev.get("ph") == "M" and ev.get("name") == "process_name"}
        dev = {p for p, nm in pids.items() if "TPU" in nm}
        agg = defaultdict(float)
        for ev in trace["traceEvents"]:
            if ev.get("ph") == "X" and ev.get("pid") in dev:
                agg[ev.get("name", "?")] += ev.get("dur", 0) / 1e3
        top = sorted(agg.items(), key=lambda kv: -kv[1])
        print(f"--- {mode} (per step, 20 steps) ---", flush=True)
        for name, ms in top[:14]:
            print(f"  {ms/20:8.3f} ms  {name[:90]}", flush=True)
        rest = sum(m for n, m in top[14:]
                   if not n.startswith(("jit_", "while", "0")))
        print(f"  {rest/20:8.3f} ms  (tail)", flush=True)


if __name__ == "__main__":
    main(*(int(a) for a in sys.argv[1:]))
