"""Benchmark: PaiNN energy+forces evaluation throughput at 10k atoms.

This is the MD inner-loop compute (BASELINE.json metric: "MD atom-steps/sec
per chip at 10k atoms").  A 10,976-atom periodic FCC argon box with a 5 A
cutoff is evaluated with the flagship PaiNN model (128 features, 3
interactions) using the dense neighbor-matrix layout (scatter-free
aggregation — the TPU-fast path).

Timing methodology: N sequential force evaluations chained inside ONE
``lax.scan`` dispatch (each step's positions depend on the previous step's
forces), exactly like the MD engine runs.  This defeats both dispatch
pipelining and the remote-execution result cache, giving honest
steady-state per-step numbers.

``vs_baseline`` is measured against the north-star target of 5e6
atom-steps/s (5x an assumed 1e6 atom-steps/s for PaiNN/10k-atoms on A100,
cf. BASELINE.md).
"""
import json
import os
import time

import numpy as np

BASELINE_ATOM_STEPS = 5.0e6


def fcc_box(n_target: int, a: float = 5.26):
    """FCC argon supercell with ~n_target atoms."""
    n_cells = int(round((n_target / 4) ** (1 / 3)))
    base = np.array([[0, 0, 0], [0.5, 0.5, 0], [0.5, 0, 0.5], [0, 0.5, 0.5]])
    pos = []
    for i in range(n_cells):
        for j in range(n_cells):
            for k in range(n_cells):
                pos.append((base + [i, j, k]) * a)
    pos = np.concatenate(pos)
    cell = np.eye(3) * (a * n_cells)
    return pos, cell


def _acquire_device(timeout_s: float = 600.0):
    """Touch the backend with a bounded wait: the tunneled TPU plugin
    blocks indefinitely when the remote side is down (observed multi-hour
    outages), which would hang the whole benchmark run."""
    import threading

    import jax

    out = {}

    def probe():
        try:
            out["devices"] = jax.devices()
        except Exception as e:  # noqa: BLE001 - report any backend failure
            out["error"] = repr(e)

    t = threading.Thread(target=probe, daemon=True)
    t.start()
    t.join(timeout_s)
    if "devices" in out:
        return out["devices"]
    import sys

    print(
        f"bench: device acquisition failed within {timeout_s:.0f}s "
        f"({out.get('error', 'backend unresponsive — tunnel down?')})",
        file=sys.stderr,
    )
    raise SystemExit(3)


def train_bench(chunk: int = 20, n_chunks: int = 4):
    """TPU training-step benchmark (VERDICT r4 #2): PaiNN-128x3
    energy+forces on an MD17-aspirin-class batch (100 molecules x 21
    atoms), measured on BOTH training batch layouts — the flat padded
    pair list (gather/segment-sum) and the dense [A, K] neighbor matrix
    (scatter-free K-axis aggregation, ``AtomsDataModule(dense_layout=
    True)``).  Chained ``lax.scan`` over the pure train step (parameter
    updates give the sequential dependency); min-over-chunks + profiler
    cross-check, the same methodology as the MD loop.  Reference hot
    loop: schnetpack training_step -> SchNet/PaiNN message passing +
    Forces backward (reference task.py:166-185,
    representation/painn.py:14-67).
    """
    import time

    import jax
    import jax.numpy as jnp

    from schnetpack_tpu import properties as P
    from schnetpack_tpu.atomistic import Atomwise, Forces, PairwiseDistances
    from schnetpack_tpu.data.loader import PaddingSpec, collate, padding_for
    from schnetpack_tpu.model import NeuralNetworkPotential
    from schnetpack_tpu.representation import PaiNN
    from schnetpack_tpu.train import AtomisticTask, ModelOutput
    from schnetpack_tpu.transform.neighborlist import NeighborListTransform

    cutoff = 5.0
    rng = np.random.RandomState(0)
    n_mol, n_at = 100, 21
    Z = np.array([6] * 9 + [1] * 8 + [8] * 4)
    samples = []
    for _ in range(n_mol):
        # aspirin-sized blob: ~4.5 A diameter, near-fully connected at 5 A
        R = rng.randn(n_at, 3) * 1.5
        s = {P.Z: Z, P.R: R, P.cell: np.zeros((3, 3)),
             P.pbc: np.zeros(3, bool),
             P.energy: np.array([float((R ** 2).sum())]),
             P.forces: (-2.0 * R)}
        samples.append(NeighborListTransform(cutoff)(s))
    pot = NeuralNetworkPotential(
        representation=PaiNN(n_atom_basis=128, n_interactions=3, n_rbf=20,
                             cutoff=cutoff),
        input_modules=[PairwiseDistances()],
        output_modules=[Atomwise(output_key=P.energy), Forces()],
    )
    task = AtomisticTask(
        pot,
        outputs=[
            ModelOutput(P.energy, loss_fn="mse", loss_weight=0.01),
            ModelOutput(P.forces, loss_fn="mse", loss_weight=0.99),
        ],
        learning_rate=1e-4,
    )

    def measure(spec):
        batch = collate(samples, spec)
        batch = {k: jnp.asarray(v) for k, v in batch.items()}
        state = task.create_state(jax.random.PRNGKey(0), batch)

        def chained(state):
            def body(s, _):
                s2, _m = task._train_step_impl(s, batch)
                return s2, None

            return jax.lax.scan(body, state, None, length=chunk)[0]

        run = jax.jit(chained, donate_argnums=0)
        state = jax.block_until_ready(run(state))  # compile + warm
        dts = []
        for _ in range(n_chunks):
            t0 = time.time()
            state = jax.block_until_ready(run(state))
            dts.append((time.time() - t0) / chunk)
        dts.sort()

        device_ms = None
        try:
            import glob
            import gzip
            import tempfile

            tdir = tempfile.mkdtemp(prefix="bench_train_trace_")
            with jax.profiler.trace(tdir):
                state = jax.block_until_ready(run(state))
            files = sorted(
                glob.glob(tdir + "/**/*.trace.json.gz", recursive=True))
            if files:
                with gzip.open(files[-1], "rt") as f:
                    trace = json.load(f)
                pids = {
                    ev["pid"]: ev["args"].get("name", "")
                    for ev in trace["traceEvents"]
                    if ev.get("ph") == "M" and ev.get("name") == "process_name"
                }
                dev_pids = {p for p, nm in pids.items() if "TPU" in nm}
                totals = {}
                for ev in trace["traceEvents"]:
                    if (ev.get("ph") == "X" and ev.get("pid") in dev_pids
                            and ev.get("name", "").startswith("while")):
                        totals[ev["name"]] = (
                            totals.get(ev["name"], 0.0) + ev.get("dur", 0)
                        )
                if totals:
                    device_ms = max(totals.values()) / 1e3 / chunk
        except Exception:
            pass

        dt = dts[0]
        return {
            "batch_atoms": int(batch[P.Z].shape[0]),
            "batch_pairs": int(batch[P.idx_i].shape[0]),
            "ms_per_step": round(dt * 1e3, 3),
            "ms_per_step_all_chunks": [round(d * 1e3, 2) for d in dts],
            "ms_per_step_device_profiler": (
                round(device_ms, 3) if device_ms else None),
            "samples_per_sec": round(n_mol / dt, 1),
            "atom_steps_per_sec": round(n_mol * n_at / dt, 1),
        }

    spec = padding_for(samples)
    flat = measure(spec)
    max_nbrs = max(int(np.bincount(np.asarray(s[P.idx_i])).max())
                   for s in samples)
    from schnetpack_tpu.data.loader import round_up

    dense_spec = PaddingSpec(spec.n_atoms, spec.n_pairs, spec.n_molecules,
                             n_neighbors=round_up(max_nbrs + 1, 4))
    dense = measure(dense_spec)
    best = dense if dense["ms_per_step"] <= flat["ms_per_step"] else flat
    return {
        "what": "PaiNN-128x3 energy+forces train step, batch=100 aspirin-"
                "class molecules (2100 atoms); flat pair-list vs dense "
                "[A, K] neighbor-matrix training layouts",
        "batch_molecules": n_mol,
        "layout": "dense" if best is dense else "flat",
        **best,
        "flat": flat,
        "dense": dense,
    }


def main():
    import jax

    _acquire_device()

    from schnetpack_tpu import properties as P
    from schnetpack_tpu.atomistic import Atomwise, Forces, PairwiseDistances
    from schnetpack_tpu.data.loader import PaddingSpec, collate
    from schnetpack_tpu.md import MaxwellBoltzmannInit, Simulator, VelocityVerlet, load_molecules
    from schnetpack_tpu.md.calculators import SchNetPackCalculator
    from schnetpack_tpu.model import NeuralNetworkPotential
    from schnetpack_tpu.representation import PaiNN
    from schnetpack_tpu.transform.neighborlist import NeighborListTransform

    cutoff = 5.0
    pos, cell = fcc_box(10_000)
    n_atoms = len(pos)
    mol = {
        P.Z: np.full(n_atoms, 18, dtype=np.int64),
        P.R: pos,
        P.cell: cell,
        P.pbc: np.ones(3, bool),
    }

    pot = NeuralNetworkPotential(
        representation=PaiNN(n_atom_basis=128, n_interactions=3, n_rbf=20, cutoff=cutoff),
        input_modules=[PairwiseDistances()],
        output_modules=[Atomwise(output_key=P.energy), Forces()],
    )
    # init params on a tiny probe batch (cheap)
    probe = NeighborListTransform(cutoff)(
        {P.Z: mol[P.Z][:32], P.R: mol[P.R][:32], P.cell: np.zeros((3, 3)),
         P.pbc: np.zeros(3, bool)}
    )
    # The timed trajectory must be PHYSICALLY VALID: random weights
    # either collapse the box (large unbalanced forces, no short-range
    # repulsion -> NaN positions ~step 1500, and TPUs don't slow down on
    # NaNs) or, scaled down, leave the crystal unbound so it
    # free-streams into a gas whose Poisson occupancy fluctuations
    # overflow the neighbor buckets.  The benchmark therefore runs a
    # PaiNN TRAINED on LJ-argon labels (scripts/train_bench_potential.py
    # — same arch, same kernel shapes and FLOPs as any PaiNN-128x3):
    # a bound FCC crystal, stable in NVE at 30 K.  Validity is asserted
    # after the timed region (finite positions, physical temperature).
    asset = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         "scripts", "assets", "bench_painn_argon.msgpack")
    if os.path.exists(asset):
        from schnetpack_tpu.train.callbacks import load_pytree

        params = load_pytree(asset)
        trained = True
    else:  # fallback: random init, output head scaled to near-zero forces
        params = pot.init(jax.random.PRNGKey(0),
                          collate([probe], PaddingSpec(48, 1024, 2)))
        import flax.traverse_util as _tu

        flat = _tu.flatten_dict(params)
        flat = {k: (v * 1e-3 if "outnet" in "/".join(map(str, k)) else v)
                for k, v in flat.items()}
        params = _tu.unflatten_dict(flat)
        trained = False

    system = load_molecules([mol])
    system = MaxwellBoltzmannInit(30.0).initialize_system(system, jax.random.PRNGKey(1))
    # production-MD precision: bf16 features in the selection kernels
    # (PIECES=1), geometry exact f32.  Acceptance evidence
    # (scripts/precision_study.py, PERF.md): force error 0.75% rms / 1.1%
    # max vs exact-f32, NVE drift statistically identical to f32
    # (-0.0021 vs -0.0018 MD-energy/atom/ps over 3k steps).
    from schnetpack_tpu.md.neighborlist_md import CellBlockNeighborListMD
    from schnetpack_tpu.units import _parse_unit, md_units

    # cold ordered FCC box: the tight capacity probe (jitter 0.25*skin)
    # trims ~10-15% of bucket padding; the grow-on-overflow path keeps
    # correctness if occupancies ever exceed it
    conv = _parse_unit("Ang") * md_units().length
    nbl = CellBlockNeighborListMD(cutoff * conv, skin=0.6 * conv,
                                  layout="column", jitter_fraction=0.25,
                                  bucket_headroom=1.0 / 12.0)
    calc = SchNetPackCalculator(
        pot, params, cutoff=cutoff, cutoff_shell=0.6, neighbor_list=nbl,
        precision="bf16",
    )
    sim = Simulator(system, VelocityVerlet(0.5), calc, progress=False,
                    log_keys=("energy", "temperature"))

    # warmup chunk (compile) — same chunk size as the timed region, since
    # the scan length is a static argument.  Long chunks amortise the
    # remote-tunnel round trip (~28 ms) to <0.1 ms/step; the device-side
    # rebuild probe keeps chunk boundaries to one scalar fetch.
    chunk = 300
    sim.simulate(chunk, chunk_size=chunk)
    # the warmup chunk equilibrated the box — retighten the edge-bucket
    # capacities to the MEASURED occupancy (+headroom).  The first-build
    # jitter probe pads ~20-25% of edge slots for the cold->thermal
    # occupancy shift; every message kernel scales with the slot count.
    # Costs one recompile (shapes shrink); grow-on-overflow keeps
    # correctness if occupancies later exceed the tightened capacities.
    import sys

    def _caps(tag):
        print(f"bench: {tag}: C={nbl._C} Ktot={sum(nbl._K)} "
              f"dims={nbl._dims}", file=sys.stderr)

    _caps("initial capacities")
    nbl.retighten(sim.state.system, jitter_fraction=0.05,
                  bucket_headroom=1.0 / 24.0)
    _caps("after retighten")
    sim.simulate(chunk, chunk_size=chunk)  # compile the tightened shapes
    # compile the on-device rebuild path outside the timed region (it
    # fires at most once per few hundred steps inside it)
    calc.dense_nbl._rebuild_on_device(sim.state.system)
    # The tunneled TPU is TIME-SHARED: identical chunk dispatches swing
    # 3-20x with other tenants' load (measured 12.6 -> 233 ms/step on
    # back-to-back chunks).  Per-chunk timing + min-over-chunks reports
    # the steady-state device throughput; the median is recorded in the
    # detail so the contention level stays visible.
    # overflow-free guarantee (round-4 verdict Weak #2): a chunk whose
    # neighbor-list buckets overflowed ran partly on a stale NBL — its
    # timing AND physics are invalid.  Discard such chunks, let the
    # boundary logic grow the capacities, re-warm the new shapes, retry.
    import warnings

    n_chunks = 6
    chunk_dts = []
    overflow_redos = 0
    while len(chunk_dts) < n_chunks and overflow_redos < 4:
        with warnings.catch_warnings(record=True) as wlist:
            warnings.simplefilter("always")
            t0 = time.time()
            sim.simulate(chunk, chunk_size=chunk)
            dt_c = (time.time() - t0) / chunk
        if any("overflow" in str(w.message).lower() for w in wlist):
            overflow_redos += 1
            _caps(f"after overflow grow #{overflow_redos}")
            # capacities grew at the boundary: compile + warm new shapes
            sim.simulate(chunk, chunk_size=chunk)
            continue
        chunk_dts.append(dt_c)
    chunk_dts.sort()
    dt = chunk_dts[0]
    dt_median = chunk_dts[len(chunk_dts) // 2]
    dt_mean = sum(chunk_dts) / len(chunk_dts)

    # profiler cross-check: per-op device-lane durations are unaffected
    # by the tunnel's time-sharing, so the trace total is the ground
    # truth that separates contention from regression (PERF.md).
    device_ms = None
    try:
        import glob
        import gzip
        import tempfile

        tdir = tempfile.mkdtemp(prefix="bench_trace_")
        with jax.profiler.trace(tdir):
            sim.simulate(chunk, chunk_size=chunk)
        files = sorted(glob.glob(tdir + "/**/*.trace.json.gz", recursive=True))
        if files:
            with gzip.open(files[-1], "rt") as f:
                trace = json.load(f)
            pids = {
                ev["pid"]: ev["args"].get("name", "")
                for ev in trace["traceEvents"]
                if ev.get("ph") == "M" and ev.get("name") == "process_name"
            }
            dev_pids = {p for p, nm in pids.items() if "TPU" in nm}
            # the outermost scan ("while.N" = the MD chunk loop) spans
            # the whole on-device execution incl. op gaps; its events
            # carry the largest per-name total
            totals = {}
            for ev in trace["traceEvents"]:
                if (ev.get("ph") == "X" and ev.get("pid") in dev_pids
                        and ev.get("name", "").startswith("while")):
                    totals[ev["name"]] = (
                        totals.get(ev["name"], 0.0) + ev.get("dur", 0)
                    )
            if totals:
                device_ms = max(totals.values()) / 1e3 / chunk
    except Exception:
        pass

    # PRIMARY metric (round-4 verdict Weak #10): the profiler device time
    # — per-op device-lane durations are unaffected by the tunnel's
    # time-sharing; min-over-chunks wall clock is the fallback + cross-check
    dt_primary = device_ms * 1e-3 if device_ms else dt
    atom_steps = n_atoms / dt_primary

    # physics validity of the timed trajectory: finite positions and
    # bounded temperature after every timed chunk ran (a collapsing or
    # NaN trajectory would keep producing plausible timings — TPUs don't
    # slow down on NaNs)
    R_end = np.asarray(jax.device_get(sim.state.system.positions))
    assert np.isfinite(R_end).all(), "bench trajectory went non-finite"
    temp_end = float(np.asarray(jax.device_get(
        sim.state.system.temperature)).mean())
    assert 0.0 < temp_end < 300.0, f"bench temperature unphysical: {temp_end}"

    # TPU training-step benchmark (second metric in the detail record)
    try:
        train_detail = train_bench()
    except Exception as exc:  # noqa: BLE001 - never break the MD headline
        train_detail = {"error": repr(exc)}

    # secondary: bare force-evaluation throughput (chained scan, K without
    # the MD skin) for the detail record
    import jax.numpy as jnp

    from schnetpack_tpu.data.loader import padding_for, round_up

    sample2 = dict(mol)
    sample2 = NeighborListTransform(cutoff)(sample2)
    base = padding_for([sample2])
    max_nbrs = int(np.bincount(sample2[P.idx_i]).max())
    spec2 = PaddingSpec(base.n_atoms, base.n_pairs, base.n_molecules,
                        n_neighbors=round_up(max_nbrs, 4))
    batch2 = {k: jnp.asarray(v) for k, v in collate([sample2], spec2).items()}

    def chained(R0):
        def body(R, _):
            b = dict(batch2)
            b[P.R] = R
            return R + 1e-7 * pot.apply(params, b)[P.forces], None

        return jax.lax.scan(body, R0, None, length=20)[0]

    run = jax.jit(chained)
    trivial = jax.jit(lambda x: jnp.sum(x.ravel()[:1]))
    jax.block_until_ready(run(batch2[P.R] + 1e-5))
    jax.block_until_ready(trivial(batch2[P.R] + 2e-5))
    # RTT-correct: subtract a trivial dispatch's round trip so the
    # figure reports device work, not the tunnel latency (~28-40 ms)
    t0 = time.time()
    jax.block_until_ready(trivial(batch2[P.R] + 3e-5))
    rtt = time.time() - t0
    t0 = time.time()
    jax.block_until_ready(run(batch2[P.R]))
    force_eval_ms = max(1e-3, (time.time() - t0 - rtt) / 20 * 1e3)

    # FLOP accounting via the compiled executable (per force evaluation);
    # MFU is relative to the chip's f32-equivalent MXU peak
    try:
        cost = jax.jit(chained).lower(batch2[P.R]).compile().cost_analysis()
        flops_per_eval = float(cost.get("flops", 0.0)) / 20
    except Exception:
        flops_per_eval = float("nan")
    tflops = flops_per_eval / (force_eval_ms * 1e-3) / 1e12

    print(
        json.dumps(
            {
                "metric": "painn_md_atom_steps_per_sec_10k_atoms",
                "value": round(atom_steps, 1),
                "unit": "atom-steps/s",
                "vs_baseline": round(atom_steps / BASELINE_ATOM_STEPS, 4),
                "detail": {
                    "n_atoms": int(n_atoms),
                    "primary": ("profiler_device" if device_ms
                                else "min_chunk_wall"),
                    "overflow_discarded_chunks": overflow_redos,
                    "ms_per_step": round(dt * 1e3, 3),
                    "ms_per_step_median_chunk": round(dt_median * 1e3, 3),
                    "ms_per_step_mean_chunk": round(dt_mean * 1e3, 3),
                    "ms_per_step_device_profiler": (
                        round(device_ms, 3) if device_ms else None
                    ),
                    "ms_per_step_all_chunks": [round(d * 1e3, 2) for d in chunk_dts],
                    "atom_steps_per_sec_v5e8_weak_scaling_projection": round(
                        atom_steps * 8, 1),
                    "v5e8_projection_basis": (
                        "the north-star target (BASELINE.json) is defined on "
                        "v5e-8; only one chip is reachable through this "
                        "tunnel.  Projection = 8x the single-chip device "
                        "throughput at constant per-device atom count (weak "
                        "scaling): the sharded column MD path exchanges only "
                        "two boundary planes per block direction per step "
                        "(~2.4 MB, PERF.md 'Multi-chip') and its 8-device "
                        "trajectory parity incl. rebuild crossings is "
                        "validated in MULTICHIP dryruns"),
                    "force_eval_ms_rtt_corrected": round(force_eval_ms, 3),
                    "force_eval_atom_steps_per_sec": round(n_atoms / force_eval_ms * 1e3, 1),
                    "force_eval_gflops": round(flops_per_eval / 1e9, 2),
                    "achieved_tflops_per_sec": round(tflops, 2),
                    "train": train_detail,
                    "physics": {
                        "final_temperature_K": round(temp_end, 2),
                        "positions_finite": True,
                        "potential": (
                            "PaiNN-128x3 trained on LJ-argon labels "
                            "(scripts/train_bench_potential.py): bound FCC "
                            "crystal, NVE-stable at 30 K" if trained else
                            "random init, head scaled 1e-3 (asset missing)"),
                    },
                    "what": "full NVE MD loop (PaiNN-128x3, column-kernel NBL + skin)",
                    "precision": "bf16 features (PIECES=1, production MD mode); "
                                 "geometry exact f32; 0.75% rms force err, "
                                 "NVE drift == f32 (PERF.md precision study)",
                    "timing": "PRIMARY = jax.profiler device-lane total of "
                              "one 300-step scan chunk (immune to the "
                              "tunnel's time-sharing); wall-clock "
                              "min-over-chunks as cross-check; chunks with "
                              "an NBL bucket overflow are discarded and "
                              "re-run on the grown capacities",
                    "device": str(jax.devices()[0]),
                },
            }
        )
    )


if __name__ == "__main__":
    main()
