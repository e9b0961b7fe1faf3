"""LAMMPS interface: C++ client <-> Python model server over a Unix socket.

Builds the standalone C++ test client with g++ and validates the wire
protocol + force values against direct model evaluation.
"""
import os
import subprocess
import threading

import jax
import numpy as np
import pytest

from schnetpack_tpu import properties as P
from schnetpack_tpu.atomistic import Atomwise, Forces, PairwiseDistances
from schnetpack_tpu.data.loader import PaddingSpec, collate
from schnetpack_tpu.interfaces.lammps.server import LammpsModelServer
from schnetpack_tpu.model import NeuralNetworkPotential
from schnetpack_tpu.representation import SchNet
from schnetpack_tpu.transform.neighborlist import NeighborListTransform
from tests.conftest import random_molecule

LAMMPS_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "schnetpack_tpu", "interfaces", "lammps",
)


@pytest.fixture(scope="module")
def client_binary(tmp_path_factory):
    out = str(tmp_path_factory.mktemp("bin") / "test_client")
    try:
        subprocess.run(
            ["g++", "-O2", "-std=c++17",
             os.path.join(LAMMPS_DIR, "test_client.cpp"),
             os.path.join(LAMMPS_DIR, "spk_client.cpp"),
             "-I", LAMMPS_DIR, "-o", out],
            check=True, capture_output=True, timeout=120,
        )
    except (subprocess.CalledProcessError, FileNotFoundError) as e:
        pytest.skip(f"g++ unavailable/failed: {e}")
    return out


def test_server_client_roundtrip(client_binary, tmp_path, rng):
    pot = NeuralNetworkPotential(
        representation=SchNet(n_atom_basis=16, n_interactions=2, n_rbf=8, cutoff=5.0),
        input_modules=[PairwiseDistances()],
        output_modules=[
            Atomwise(output_key="energy", per_atom_output_key="energy_per_atom"),
            Forces(),
        ],
    )
    mol = random_molecule(rng, 6)
    params = pot.init(jax.random.PRNGKey(0), collate([mol], PaddingSpec(16, 128, 2)))

    sock = str(tmp_path / "spk.sock")
    server = LammpsModelServer(
        pot, params, cutoff=5.0, socket_path=sock,
        per_atom_energy_key="energy_per_atom",
        atom_bucket=16, pair_bucket=128,
    )
    t = threading.Thread(target=server.serve_forever, kwargs={"max_requests": 1}, daemon=True)
    t.start()
    import time

    for _ in range(100):
        if os.path.exists(sock):
            break
        time.sleep(0.05)

    Z = mol[P.Z]
    R = mol[P.R]
    stdin = "\n".join(
        f"{int(z)} {r[0]:.17g} {r[1]:.17g} {r[2]:.17g}" for z, r in zip(Z, R)
    )
    proc = subprocess.run(
        [client_binary, sock, str(len(Z))],
        input=stdin, text=True, capture_output=True, timeout=300,
    )
    assert proc.returncode == 0, proc.stderr
    lines = proc.stdout.strip().splitlines()
    e_line = [l for l in lines if l.startswith("energy_local")][0]
    e_client = float(e_line.split()[1])

    # direct evaluation reference
    e_ref_atom, f_ref = server.evaluate(Z.astype(np.int32), R, len(Z))
    assert e_client == pytest.approx(e_ref_atom.sum(), rel=1e-8)
    f_client = np.array(
        [[float(x) for x in l.split()[2:5]] for l in lines if l.startswith("force")]
    )
    np.testing.assert_allclose(f_client, f_ref, rtol=1e-7, atol=1e-10)
    t.join(timeout=10)


def test_pair_style_sources_present():
    """The LAMMPS plugin sources + build script ship with the package."""
    for f in ("pair_schnetpack_tpu.cpp", "spk_client.h", "spk_client.cpp",
              "patch_lammps.sh"):
        assert os.path.exists(os.path.join(LAMMPS_DIR, f))
