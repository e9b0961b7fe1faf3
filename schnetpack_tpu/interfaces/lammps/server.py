"""Model server for the LAMMPS pair style (Unix-domain-socket protocol).

The reference embeds a TorchScript runtime inside LAMMPS
(``interfaces/lammps/pair_schnetpack.cpp``).  A JAX/TPU model cannot be
linked into LAMMPS, so the TPU-native design runs the model in a
persistent server process that owns the TPU; each LAMMPS MPI rank's pair
style connects over a Unix socket and exchanges one request per force
call.  Requests carry the rank's local+ghost cluster; the server builds
the neighbor list with the native C++ cell list, evaluates the potential,
and returns per-atom energies and forces (newton-off semantics: the
client applies only its local rows — parity with pair_schnetpack.cpp:62-74,
330-352).

Wire format (little-endian):
  request:  int64 n_total, int64 n_local,
            int32 Z[n_total], float64 R[n_total*3]
  response: int64 n_total, float64 e_atom[n_total], float64 F[n_total*3]
  shutdown: n_total == -1
"""
from __future__ import annotations

import os
import socket
import struct
from typing import Optional

import numpy as np

from ... import properties as P
from ...data.loader import PaddingSpec, collate, round_up
from ...transform.neighborlist import NeighborListTransform


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
        self.nbl = NeighborListTransform(cutoff)
        self.atom_bucket = atom_bucket
        self.pair_bucket = pair_bucket
        self._apply = jax.jit(lambda p, b: model.apply(p, b))

    def evaluate(self, Z: np.ndarray, R: np.ndarray, n_local: int):
        import jax.numpy as jnp

        n = len(Z)
        sample = {
            P.Z: Z.astype(np.int64),
            P.R: R.astype(np.float64),
            P.cell: np.zeros((3, 3)),
            P.pbc: np.zeros(3, bool),
        }
        sample = self.nbl(sample)
        spec = PaddingSpec(
            n_atoms=round_up(n + 1, self.atom_bucket),
            n_pairs=round_up(max(len(sample[P.idx_i]), 1), self.pair_bucket),
            n_molecules=2,
        )
        batch = collate([sample], spec)
        out = self._apply(self.params, {k: jnp.asarray(v) for k, v in batch.items()})
        forces = np.asarray(out[P.forces][:n], np.float64)
        if self.per_atom_energy_key and self.per_atom_energy_key in out:
            e_atom = np.asarray(out[self.per_atom_energy_key][:n], np.float64)
        else:
            # uniform attribution fallback
            e_tot = float(out[self.energy_key][0])
            e_atom = np.full(n, e_tot / n, np.float64)
        return e_atom, forces

    # ------------------------------------------------------------------
    def serve_forever(self, max_requests: Optional[int] = None):
        if os.path.exists(self.socket_path):
            os.unlink(self.socket_path)
        srv = socket.socket(socket.AF_UNIX, socket.SOCK_STREAM)
        srv.bind(self.socket_path)
        srv.listen(8)
        served = 0
        try:
            while max_requests is None or served < max_requests:
                conn, _ = srv.accept()
                try:
                    while True:
                        header = _recv_exact(conn, 16)
                        if header is None:
                            break
                        n_total, n_local = struct.unpack("<qq", header)
                        if n_total < 0:
                            return
                        z_buf = _recv_exact(conn, 4 * n_total)
                        r_buf = _recv_exact(conn, 8 * 3 * n_total)
                        Z = np.frombuffer(z_buf, "<i4")
                        R = np.frombuffer(r_buf, "<f8").reshape(n_total, 3)
                        e_atom, forces = self.evaluate(Z, R, n_local)
                        conn.sendall(struct.pack("<q", n_total))
                        conn.sendall(e_atom.astype("<f8").tobytes())
                        conn.sendall(forces.astype("<f8").tobytes())
                        served += 1
                        if max_requests is not None and served >= max_requests:
                            break
                finally:
                    conn.close()
        finally:
            srv.close()
            if os.path.exists(self.socket_path):
                os.unlink(self.socket_path)


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
