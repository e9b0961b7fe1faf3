"""Model server for the LAMMPS pair style (Unix-domain-socket protocol).

The reference embeds a TorchScript runtime inside LAMMPS
(``interfaces/lammps/pair_schnetpack.cpp``).  A JAX/TPU model cannot be
linked into LAMMPS, so the TPU-native design runs the model in a
persistent server process that owns the TPU; the LAMMPS pair style
connects over a Unix socket and exchanges one request per force call.

Requests carry the full periodic structure the pair style assembled from
the LAMMPS neighbor list: atomic numbers (mapped from LAMMPS types by the
``pair_coeff`` type map), positions, the triclinic cell, and the explicit
edge list with per-edge Cartesian image offsets (the reference pair
style's convention, pair_schnetpack.cpp:238-276).  The server evaluates
the potential on that edge list and returns the total energy, per-atom
energies, forces, and the virial tensor

    W_ab = -dE/d(strain)_ab = sum_i F_i (x) R_i - sum_e g_e (x) off_e

(g_e = dE/d offset_e), so LAMMPS NPT barostats see the exact many-body
stress.

Wire format (little-endian):
  request:  int64 n_atoms, int64 n_edges,
            int32 Z[n], float64 R[n*3], float64 cell[9],
            int64 idx_i[e], int64 idx_j[e], float64 offsets[e*3]
  response: int64 n_atoms, float64 energy,
            float64 e_atom[n], float64 F[n*3], float64 W[9]
  shutdown: n_atoms == -1

Multi-rank (MPI domain decomposition — replaces the reference's per-rank
TorchScript evaluation, pair_schnetpack.cpp:346-352): each LAMMPS rank
sends a PARTIAL request carrying its local atoms (with global 0-based
tags) and its local edge list (destination local to the rank; source as a
global tag plus the ghost's absolute image position).  The server gathers
all nprocs parts of a step, assembles the global structure (the union of
per-rank edge lists is exactly the full directed edge list: every
destination atom is local to one rank), evaluates the model ONCE — so the
result is exact, with no message-passing locality error at domain
boundaries — and replies to each rank with its local forces, per-atom
energies, its energy share, and a 1/nprocs virial share (LAMMPS sums
energy/virial over ranks).

  partial request: int64 -2, int64 rank, int64 nprocs, int64 n_global,
            int64 n_local, int64 n_edges,
            int64 tags[n_local], int32 Z[n_local], float64 R[n_local*3],
            float64 cell[9], int64 idx_i[e], int64 idx_j[e]  (global tags),
            float64 xj_abs[e*3]   (neighbor image's absolute position)
  partial response: int64 n_local, float64 energy_share,
            float64 e_atom[n_local], float64 F[n_local*3], float64 W[9]
"""
from __future__ import annotations

import os
import socket
import struct
import threading
from typing import Dict, Optional

import numpy as np

from ... import properties as P
from ...data.loader import round_up


class _StepAssembly:
    """Rendezvous for one simulation step's nprocs partial requests."""

    def __init__(self, nprocs: int):
        self.nprocs = nprocs
        self.parts: Dict[int, dict] = {}
        self.result = None
        self.cond = threading.Condition()

    def add_and_wait(self, rank: int, part: dict, evaluate):
        with self.cond:
            self.parts[rank] = part
            if len(self.parts) == self.nprocs:
                self.result = evaluate(self.parts)
                self.cond.notify_all()
            else:
                self.cond.wait_for(lambda: self.result is not None,
                                   timeout=600.0)
            return self.result


class LammpsModelServer:
    def __init__(
        self,
        model,
        params,
        cutoff: float,
        socket_path: str,
        energy_key: str = "energy",
        per_atom_energy_key: Optional[str] = None,
        atom_bucket: int = 256,
        pair_bucket: int = 4096,
    ):
        import jax

        self.model = model
        self.params = params
        self.cutoff = cutoff
        self.socket_path = socket_path
        self.energy_key = energy_key
        self.per_atom_energy_key = per_atom_energy_key
        self.atom_bucket = atom_bucket
        self.pair_bucket = pair_bucket

        def run(params, batch):
            import jax.numpy as jnp

            def efn(R, off):
                b = dict(batch)
                b[P.R] = R
                b[P.offsets] = off
                out = self.model.apply(params, b)
                return jnp.sum(out[self.energy_key][:1]), out

            (gR, gOff), out = jax.grad(efn, (0, 1), has_aux=True)(
                batch[P.R], batch[P.offsets])
            F = -gR * batch[P.atom_mask][:, None]
            gOff = gOff * batch[P.pair_mask][:, None]
            W = -(jnp.einsum("ia,ib->ab", gR, batch[P.R])
                  + jnp.einsum("ea,eb->ab", gOff, batch[P.offsets]))
            if self.per_atom_energy_key:
                e_atom = out[self.per_atom_energy_key][:, 0] \
                    if out[self.per_atom_energy_key].ndim == 2 \
                    else out[self.per_atom_energy_key]
            else:
                e_atom = jnp.zeros_like(batch[P.atom_mask])
            return out[self.energy_key][:1], e_atom, F, W

        self._run = jax.jit(run)

    def evaluate(self, Z, R, cell, idx_i, idx_j, offsets):
        import jax.numpy as jnp

        n = len(Z)
        e = len(idx_i)
        nA = round_up(n + 1, self.atom_bucket)
        nE = round_up(max(e, 1), self.pair_bucket)
        dt = np.float32
        batch = {
            P.Z: np.zeros(nA, np.int32),
            P.R: np.zeros((nA, 3), dt),
            P.cell: np.zeros((2, 3, 3), dt),
            P.pbc: np.zeros((2, 3), bool),
            P.idx_m: np.concatenate([np.zeros(n, np.int32),
                                     np.ones(nA - n, np.int32)]),
            P.idx_i: np.zeros(nE, np.int32),
            P.idx_j: np.zeros(nE, np.int32),
            P.offsets: np.zeros((nE, 3), dt),
            P.pair_mask: np.zeros(nE, dt),
            P.atom_mask: np.concatenate([np.ones(n, dt), np.zeros(nA - n, dt)]),
            P.n_atoms: np.array([n, nA - n]),
            P.mol_mask: np.array([1.0, 0.0], dt),
        }
        batch[P.Z][:n] = Z
        batch[P.R][:n] = R
        batch[P.cell][0] = cell
        batch[P.pbc][0] = True
        batch[P.idx_i][:e] = idx_i
        batch[P.idx_j][:e] = idx_j
        # padded pairs point at the padding atom far from everything
        batch[P.idx_i][e:] = nA - 1
        batch[P.idx_j][e:] = nA - 1
        batch[P.offsets][:e] = offsets
        batch[P.offsets][e:] = 1e3
        batch[P.pair_mask][:e] = 1.0
        batch[P.R][n:] = 5e4

        E, e_atom, F, W = self._run(
            self.params, {k: jnp.asarray(v) for k, v in batch.items()})
        E = float(np.asarray(E)[0])
        e_atom = np.asarray(e_atom, np.float64)[:n]
        if not self.per_atom_energy_key:
            e_atom = np.full(n, E / n, np.float64)
        return (E, e_atom, np.asarray(F, np.float64)[:n],
                np.asarray(W, np.float64))

    # ------------------------------------------------------------------
    def _evaluate_global(self, parts: Dict[int, dict]):
        """Assemble the nprocs partial structures, evaluate once, split
        the reply per rank."""
        any_part = next(iter(parts.values()))
        n_global = any_part["n_global"]
        Z = np.zeros(n_global, np.int32)
        R = np.zeros((n_global, 3), np.float64)
        for p in parts.values():
            Z[p["tags"]] = p["Z"]
            R[p["tags"]] = p["R"]
        ii = np.concatenate([p["idx_i"] for p in parts.values()])
        jj = np.concatenate([p["idx_j"] for p in parts.values()])
        # per-edge image offset from the neighbor's ABSOLUTE ghost
        # position (only the server knows the owning rank's wrapped
        # position of a remote neighbor)
        xj = np.concatenate([p["xj_abs"] for p in parts.values()])
        off = xj.reshape(-1, 3) - R[jj]
        E, e_atom, F, W = self.evaluate(Z, R, any_part["cell"], ii, jj, off)
        out = {}
        for rank, p in parts.items():
            t = p["tags"]
            e_loc = e_atom[t]
            out[rank] = (float(e_loc.sum()), e_loc, F[t], W / len(parts))
        return out

    def _get_assembly(self, nprocs: int) -> _StepAssembly:
        with self._alock:
            if self._assembly is None or self._assembly.result is not None:
                self._assembly = _StepAssembly(nprocs)
            return self._assembly

    # ------------------------------------------------------------------
    def serve_forever(self, max_requests: Optional[int] = None):
        if os.path.exists(self.socket_path):
            os.unlink(self.socket_path)
        srv = socket.socket(socket.AF_UNIX, socket.SOCK_STREAM)
        srv.bind(self.socket_path)
        srv.listen(16)
        srv.settimeout(0.25)
        self._alock = threading.Lock()
        self._assembly = None
        self._served = 0
        self._stop = threading.Event()
        threads = []
        try:
            while not self._stop.is_set() and (
                max_requests is None or self._served < max_requests
            ):
                try:
                    conn, _ = srv.accept()
                except socket.timeout:
                    continue
                t = threading.Thread(
                    target=self._handle_conn, args=(conn, max_requests),
                    daemon=True,
                )
                t.start()
                threads.append(t)
            for t in threads:
                t.join(timeout=60.0)
        finally:
            srv.close()
            if os.path.exists(self.socket_path):
                os.unlink(self.socket_path)

    def _handle_conn(self, conn: socket.socket, max_requests: Optional[int]):
        try:
            while not self._stop.is_set():
                header = _recv_exact(conn, 16)
                if header is None:
                    break
                n, e = struct.unpack("<qq", header)
                if n == -1:
                    self._stop.set()
                    break
                if n == -2:
                    # partial (multi-rank) request; header's second field
                    # is the rank, the rest follows
                    self._handle_partial(conn, rank=e)
                else:
                    self._handle_single(conn, n, e)
                self._served += 1
                if max_requests is not None and self._served >= max_requests:
                    self._stop.set()
                    break
        finally:
            conn.close()

    def _handle_single(self, conn, n, e):
        Z = np.frombuffer(_recv_exact(conn, 4 * n), "<i4")
        R = np.frombuffer(_recv_exact(conn, 24 * n), "<f8").reshape(n, 3)
        cell = np.frombuffer(_recv_exact(conn, 72), "<f8").reshape(3, 3)
        ii = np.frombuffer(_recv_exact(conn, 8 * e), "<i8")
        jj = np.frombuffer(_recv_exact(conn, 8 * e), "<i8")
        off = np.frombuffer(_recv_exact(conn, 24 * e), "<f8").reshape(e, 3)
        E, e_atom, F, W = self.evaluate(Z, R, cell, ii, jj, off)
        conn.sendall(struct.pack("<q", n))
        conn.sendall(struct.pack("<d", E))
        conn.sendall(e_atom.astype("<f8").tobytes())
        conn.sendall(F.astype("<f8").tobytes())
        conn.sendall(W.astype("<f8").tobytes())

    def _handle_partial(self, conn, rank: int):
        nprocs, n_global, n, e = struct.unpack("<qqqq", _recv_exact(conn, 32))
        part = {
            "n_global": n_global,
            "tags": np.frombuffer(_recv_exact(conn, 8 * n), "<i8"),
            "Z": np.frombuffer(_recv_exact(conn, 4 * n), "<i4"),
            "R": np.frombuffer(_recv_exact(conn, 24 * n), "<f8").reshape(n, 3),
            "cell": np.frombuffer(_recv_exact(conn, 72), "<f8").reshape(3, 3),
            "idx_i": np.frombuffer(_recv_exact(conn, 8 * e), "<i8"),
            "idx_j": np.frombuffer(_recv_exact(conn, 8 * e), "<i8"),
            "xj_abs": np.frombuffer(_recv_exact(conn, 24 * e), "<f8"),
        }
        result = self._get_assembly(nprocs).add_and_wait(
            rank, part, self._evaluate_global)
        if result is None:
            raise RuntimeError("partial-step assembly timed out")
        e_share, e_atom, F, W = result[rank]
        conn.sendall(struct.pack("<q", n))
        conn.sendall(struct.pack("<d", e_share))
        conn.sendall(e_atom.astype("<f8").tobytes())
        conn.sendall(F.astype("<f8").tobytes())
        conn.sendall(W.astype("<f8").tobytes())


def _recv_exact(conn: socket.socket, n: int) -> Optional[bytes]:
    buf = b""
    while len(buf) < n:
        chunk = conn.recv(n - len(buf))
        if not chunk:
            return None
        buf += chunk
    return buf


def main():
    """CLI: python -m schnetpack_tpu.interfaces.lammps.server \\
    model_dir=<dir> socket=/tmp/spk.sock cutoff=5.0"""
    import sys

    kv = dict(a.split("=", 1) for a in sys.argv[1:])
    from ...cli import load_model

    model, params = load_model(kv["model_dir"])
    server = LammpsModelServer(
        model, params,
        cutoff=float(kv.get("cutoff", 5.0)),
        socket_path=kv.get("socket", "/tmp/schnetpack_tpu.sock"),
        per_atom_energy_key=kv.get("per_atom_energy_key"),
    )
    print(f"serving on {server.socket_path}", flush=True)
    server.serve_forever()


if __name__ == "__main__":
    main()
