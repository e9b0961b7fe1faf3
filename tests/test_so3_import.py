"""SO3net convention audit + trained-weight import parity.

The reference's SO(3) machinery (nn/so3.py, nn/ops/so3.py) is loaded
dynamically (read-only) and compared numerically against our independent
implementation:

* real spherical harmonics agree elementwise;
* the parity-invariant real Clebsch-Gordan tensors agree elementwise;
* a reference-format SO3net state dict imported via ``import_so3net``
  matches the reference layers' forward (and autograd forces) elementwise.
"""
import importlib.util
import os
import sys
import types

import numpy as np
import pytest

REF_SO3_OPS = "/root/reference/src/schnetpack/nn/ops/so3.py"
REF_SO3 = "/root/reference/src/schnetpack/nn/so3.py"

pytestmark = pytest.mark.skipif(
    not (os.path.exists(REF_SO3_OPS) and os.path.exists(REF_SO3)),
    reason="reference source not available",
)

try:
    import torch
    import torch.nn as _tnn

    class _PickleableRoot(_tnn.Module):
        pass

    class SO3net(_tnn.Module):  # class name drives the import dispatch
        pass

except ImportError:  # pragma: no cover
    pass


def _load_ref_so3():
    """Load the reference so3 modules standalone (stubbed package chain)."""
    import torch
    import torch.nn as tnn

    def load(name, path):
        spec = importlib.util.spec_from_file_location(name, path)
        mod = importlib.util.module_from_spec(spec)
        sys.modules[name] = mod
        spec.loader.exec_module(mod)
        return mod

    # force-replace any stub package left behind by the torch-import
    # tests' unpickling StubFinder (import a.b resolves via the parent's
    # attribute, so a stale parent would shadow these stubs)
    pkg = types.ModuleType("schnetpack")
    pkg.__path__ = []
    sys.modules["schnetpack"] = pkg

    class _Dense(tnn.Linear):
        def __init__(self, in_f, out_f, bias=True, activation=None):
            super().__init__(in_f, out_f, bias=bias)
            self.activation = activation

        def forward(self, x):
            y = super().forward(x)
            return self.activation(y) if self.activation else y

    def _scatter_add(x, idx, dim_size, dim=0):
        shape = list(x.shape)
        shape[dim] = dim_size
        return torch.zeros(shape, dtype=x.dtype).index_add_(dim, idx, x)

    nnpkg = types.ModuleType("schnetpack.nn")
    nnpkg.__path__ = []
    nnpkg.Dense = _Dense
    nnpkg.scatter_add = _scatter_add
    sys.modules["schnetpack.nn"] = nnpkg
    pkg.nn = nnpkg
    opspkg = types.ModuleType("schnetpack.nn.ops")
    opspkg.__path__ = []
    sys.modules["schnetpack.nn.ops"] = opspkg
    nnpkg.ops = opspkg
    for stale in ("schnetpack.nn.ops.so3", "schnetpack.nn.ops.math",
                  "schnetpack.nn.so3"):
        sys.modules.pop(stale, None)
    mops = load("schnetpack.nn.ops.so3", REF_SO3_OPS)
    mmath = load("schnetpack.nn.ops.math",
                 "/root/reference/src/schnetpack/nn/ops/math.py")
    opspkg.so3 = mops
    opspkg.math = mmath
    utils = types.ModuleType("schnetpack.utils")
    utils.as_dtype = lambda s: {"float32": torch.float32,
                                "float64": torch.float64}[s]
    sys.modules["schnetpack.utils"] = utils
    pkg.utils = utils
    m2 = load("schnetpack.nn.so3", REF_SO3)
    return mops, m2


class TestConventions:
    def test_real_ylm_matches_reference(self):
        import jax
        import jax.numpy as jnp

        from schnetpack_tpu.ops.so3 import real_spherical_harmonics

        mops, m2 = _load_ref_so3()
        rng = np.random.RandomState(0)
        d = rng.randn(16, 3)
        d /= np.linalg.norm(d, axis=1, keepdims=True)
        for lmax in (1, 2, 3):
            rsh = m2.RealSphericalHarmonics(lmax=lmax, dtype_str="float64")
            Y_ref = rsh(torch.tensor(d, dtype=torch.float64)).detach().numpy()
            with jax.enable_x64():
                Y_ours = np.asarray(
                    real_spherical_harmonics(jnp.asarray(d), lmax))
            np.testing.assert_allclose(Y_ours, Y_ref, rtol=1e-7, atol=1e-7)

    def test_parity_invariant_cg_matches_reference(self):
        from schnetpack_tpu.ops.so3 import _cg_dense_np

        mops, _ = _load_ref_so3()
        for lmax in (1, 2):
            cg_ref = mops.generate_clebsch_gordan_rsh(lmax).numpy().real
            cg_ours = _cg_dense_np(lmax)
            np.testing.assert_allclose(cg_ours, cg_ref, rtol=1e-6, atol=1e-7)


class TestSO3netImport:
    LMAX, F, NRBF, NINT = 2, 16, 8, 2

    def _synthetic_sd(self, seed=0):
        rng = np.random.RandomState(seed)
        F, B, L1 = self.F, self.NRBF, self.LMAX + 1
        sd = {
            "representation.embedding.weight": rng.randn(100, F) * 0.3,
            # match the GaussianRBF defaults the importer reconstructs
            "representation.radial_basis.offsets": np.linspace(0, 5.0, B),
            "representation.radial_basis.widths": np.full(B, 5.0 / (B - 1)),
            "representation.cutoff_fn.cutoff": np.array([5.0]),
        }
        for t in range(self.NINT):
            sd[f"representation.so3convs.{t}.filternet.weight"] = (
                rng.randn(F * L1, B) * 0.3)
            sd[f"representation.so3convs.{t}.filternet.bias"] = (
                rng.randn(F * L1) * 0.1)
            for role in ("mixings1", "mixings2", "mixings3"):
                sd[f"representation.{role}.{t}.weight"] = (
                    rng.randn(F, F) * 0.3)
            sd[f"representation.gatings.{t}.scaling.weight"] = (
                rng.randn(F * L1, F) * 0.3)
            sd[f"representation.gatings.{t}.scaling.bias"] = (
                rng.randn(F * L1) * 0.1)
        sd["output_modules.0.outnet.0.weight"] = rng.randn(F // 2, F) * 0.3
        sd["output_modules.0.outnet.0.bias"] = rng.randn(F // 2) * 0.1
        sd["output_modules.0.outnet.1.weight"] = rng.randn(1, F // 2) * 0.3
        sd["output_modules.0.outnet.1.bias"] = rng.randn(1) * 0.1
        return sd

    def _torch_energy(self, sd, Z, R, idx_i, idx_j):
        """Forward composed from the DYNAMICALLY LOADED reference layers."""
        import torch
        import torch.nn.functional as tF

        mops, m2 = _load_ref_so3()
        lmax, F, B = self.LMAX, self.F, self.NRBF
        Z = torch.as_tensor(Z, dtype=torch.long)
        idx_i = torch.as_tensor(idx_i, dtype=torch.long)
        idx_j = torch.as_tensor(idx_j, dtype=torch.long)

        rij = R[idx_j] - R[idx_i]
        d = torch.norm(rij, dim=1, keepdim=True)
        dir_ij = rij / d
        rsh = m2.RealSphericalHarmonics(lmax=lmax, dtype_str="float64")
        Yij = rsh(dir_ij)
        offs = torch.as_tensor(sd["representation.radial_basis.offsets"])
        widths = torch.as_tensor(sd["representation.radial_basis.widths"])
        phi = torch.exp(-0.5 / widths**2 * (d - offs) ** 2)
        rc = float(sd["representation.cutoff_fn.cutoff"][0])
        fcut = (0.5 * (torch.cos(d * np.pi / rc) + 1.0) * (d < rc))

        emb = torch.as_tensor(sd["representation.embedding.weight"])
        x0 = emb[Z][:, None, :]
        n_lm = (lmax + 1) ** 2
        x = torch.cat(
            [x0, torch.zeros(x0.shape[0], n_lm - 1, self.F,
                             dtype=torch.float64)], dim=1)

        tp = m2.SO3TensorProduct(lmax).double()
        for t in range(self.NINT):
            conv = m2.SO3Convolution(lmax, F, B).double()
            conv.filternet.weight.data = torch.as_tensor(
                sd[f"representation.so3convs.{t}.filternet.weight"])
            conv.filternet.bias.data = torch.as_tensor(
                sd[f"representation.so3convs.{t}.filternet.bias"])
            gate = m2.SO3ParametricGatedNonlinearity(F, lmax).double()
            gate.scaling.weight.data = torch.as_tensor(
                sd[f"representation.gatings.{t}.scaling.weight"])
            gate.scaling.bias.data = torch.as_tensor(
                sd[f"representation.gatings.{t}.scaling.bias"])
            w1 = torch.as_tensor(sd[f"representation.mixings1.{t}.weight"])
            w2 = torch.as_tensor(sd[f"representation.mixings2.{t}.weight"])
            w3 = torch.as_tensor(sd[f"representation.mixings3.{t}.weight"])

            dx = conv(x, phi, Yij, fcut, idx_i, idx_j)
            ddx = dx @ w1.T
            dx = dx + tp(dx, ddx)
            dx = dx @ w2.T
            dx = gate(dx)
            dx = dx @ w3.T
            x = x + dx

        s = x[:, 0, :]
        h = tF.silu(s @ torch.as_tensor(
            sd["output_modules.0.outnet.0.weight"]).T
            + torch.as_tensor(sd["output_modules.0.outnet.0.bias"]))
        y = (h @ torch.as_tensor(sd["output_modules.0.outnet.1.weight"]).T
             + torch.as_tensor(sd["output_modules.0.outnet.1.bias"]))
        return y.sum()

    def test_import_matches_reference_layers(self, tmp_path):
        import jax
        import torch
        import torch.nn as nn

        from schnetpack_tpu import properties as P
        from schnetpack_tpu.data.loader import PaddingSpec, collate
        from schnetpack_tpu.interfaces.torch_import import import_so3net
        from schnetpack_tpu.transform.neighborlist import NeighborListTransform

        sd = self._synthetic_sd()
        root = _PickleableRoot()
        root.representation = SO3net()
        for k, v in sd.items():
            parts = k.split(".")
            mod = root
            for p in parts[:-1]:
                if not hasattr(mod, p) or not isinstance(getattr(mod, p),
                                                         nn.Module):
                    setattr(mod, p, nn.Module())
                mod = getattr(mod, p)
            mod.register_buffer(parts[-1], torch.as_tensor(v))
        assert set(root.state_dict().keys()) == set(sd.keys())
        path = str(tmp_path / "synthetic_so3net.model")
        torch.save(root, path)

        with jax.enable_x64():
            pot, params, info = import_so3net(path)
            assert info["representation"] == "SO3net"
            params = jax.tree.map(
                lambda a: a.astype(np.float64)
                if a.dtype == np.float32 else a, params)

            rng = np.random.RandomState(1)
            Z = np.array([6, 1, 1, 8, 1])
            for i in range(3):
                R = rng.rand(5, 3) * 3.0
                mol = {P.Z: Z, P.R: R, P.cell: np.zeros((3, 3)),
                       P.pbc: np.zeros(3, bool)}
                probe = NeighborListTransform(info["cutoff"])(dict(mol))
                batch = collate([probe], PaddingSpec(8, len(probe[P.idx_i]) + 4, 2))
                batch = {k: np.asarray(v) for k, v in batch.items()}
                out = pot.apply(params, dict(batch), do_postprocessing=False)
                e_jax = float(np.asarray(out["energy"]).sum())
                f_jax = np.asarray(out["forces"])[:5]

                Rt = torch.tensor(R, requires_grad=True, dtype=torch.float64)
                e_t = self._torch_energy(sd, Z, Rt, probe[P.idx_i],
                                         probe[P.idx_j])
                f_t = -torch.autograd.grad(e_t, Rt)[0].numpy()
                # the reference registers its CG buffer in float32, so the
                # comparison floor is f32 resolution even in an f64 run
                assert abs(e_jax - float(e_t)) < 1e-6 * max(1.0,
                                                            abs(float(e_t)))
                np.testing.assert_allclose(f_jax, f_t, rtol=1e-5, atol=1e-7)
