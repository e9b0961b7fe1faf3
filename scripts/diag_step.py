import sys, time
sys.path.insert(0, "/root/repo")
import numpy as np
import jax, jax.numpy as jnp
from bench import fcc_box
from schnetpack_tpu import properties as P
from schnetpack_tpu.atomistic import Atomwise, Forces, PairwiseDistances
from schnetpack_tpu.data.loader import PaddingSpec, collate
from schnetpack_tpu.md import MaxwellBoltzmannInit, Simulator, VelocityVerlet, load_molecules
from schnetpack_tpu.md.calculators import SchNetPackCalculator
from schnetpack_tpu.model import NeuralNetworkPotential
from schnetpack_tpu.representation import PaiNN
from schnetpack_tpu.transform.neighborlist import NeighborListTransform
from schnetpack_tpu.ops import cellblock as cb

cb.PIECES = int(sys.argv[1]) if len(sys.argv) > 1 else 2
print("PIECES", cb.PIECES, flush=True)
cutoff = 5.0
pos, cell = fcc_box(10_000)
n_atoms = len(pos)
mol = {P.Z: np.full(n_atoms, 18, dtype=np.int64), P.R: pos, P.cell: cell, P.pbc: np.ones(3, bool)}
pot = NeuralNetworkPotential(
    representation=PaiNN(n_atom_basis=128, n_interactions=3, n_rbf=20, cutoff=cutoff),
    input_modules=[PairwiseDistances()],
    output_modules=[Atomwise(output_key=P.energy), Forces()],
)
probe = NeighborListTransform(cutoff)(
    {P.Z: mol[P.Z][:32], P.R: mol[P.R][:32], P.cell: np.zeros((3, 3)), P.pbc: np.zeros(3, bool)})
params = pot.init(jax.random.PRNGKey(0), collate([probe], PaddingSpec(48, 1024, 2)))
system = load_molecules([mol])
system = MaxwellBoltzmannInit(30.0).initialize_system(system, jax.random.PRNGKey(1))
calc = SchNetPackCalculator(pot, params, cutoff=cutoff, cutoff_shell=0.6, neighbor_list="cellblock")
cs = calc.init_state(system)
nbl = calc.dense_nbl
print("ks", nbl._K, "sum", sum(nbl._K), "P", nbl._C, flush=True)

def timed(name, body, init, iters=50):
    def chained(st):
        return jax.lax.scan(body, st, None, length=iters)[0]
    run = jax.jit(chained)
    out = run(init)
    jax.tree.map(lambda x: x.block_until_ready() if hasattr(x, "block_until_ready") else x, out)
    # different data warm
    t0 = time.time()
    out2 = jax.device_get(jax.tree.map(lambda x: x.ravel()[0] if hasattr(x, "ravel") else x, run(init)))
    dt = (time.time() - t0) / iters * 1e3
    print(f"{name:30s} {dt:8.2f} ms/iter", flush=True)

# (a) calculate only
def body_calc(sys_st, _):
    s2 = calc.calculate(sys_st, cs)
    return s2.replace(positions=s2.positions + 1e-7 * s2.forces), None
timed("calculate only", body_calc, system)

# (b) full simulator step
sim = Simulator(system, VelocityVerlet(0.5), calc, progress=False, log_keys=("energy", "temperature"))
st = sim.state
step = sim._build_step() if hasattr(sim, "_build_step") else None
def body_full(s, _):
    return step(s, None)
timed("full sim step", body_full, st)

# (c) model.apply only — inputs built once, only R swapped per step
# (excludes the canonical<->column permutation takes, unit conversions,
# and System update of the calculate path)
inputs0 = calc._model_inputs(system, cs)
amask = inputs0[P.atom_mask][:, None]
def body_apply(R, _):
    b = dict(inputs0)
    b[P.R] = R
    out = pot.apply(calc.params, b, do_postprocessing=False)
    f = out[P.forces] * amask
    return R + 1e-7 * f, None
timed("model.apply only", body_apply, inputs0[P.R])

# (d) integrator + log only (no force eval): how much the VV update,
# log record, and PRNG split cost per step
class _NullCalc:
    required_properties = ()
    def calculate(self, system, calc_state=None):
        return system
sim2 = Simulator(system.replace(forces=jnp.zeros_like(system.positions)),
                 VelocityVerlet(0.5), _NullCalc(), progress=False,
                 log_keys=("temperature",))
step2 = sim2._build_step()
def body_int(s, _):
    return step2(s, None)
timed("integrator+log only", body_int, sim2.state)
