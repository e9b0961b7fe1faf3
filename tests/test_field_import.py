"""FieldSchNet trained-weight import: elementwise parity vs a pure-torch
reconstruction of the reference forward (field_schnet.py:19-247,355-438),
on a synthetic reference-format state dict (random weights)."""
import pytest

pytestmark = pytest.mark.slow  # heavy: excluded from the smoke tier

import os
import pickle
import tempfile

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402

F, NRBF, NINT, CUTOFF, MAXZ = 16, 8, 2, 4.0, 20
FIELDS = ["electric_field"]


class FieldSchNet(tnn.Module):
    """Pickleable stand-in whose class name drives the import dispatch."""


class _Root(tnn.Module):
    pass


def _make_torch_model(seed=0):
    g = torch.Generator().manual_seed(seed)

    def lin(a, b, bias=True):
        m = tnn.Linear(a, b, bias=bias)
        with torch.no_grad():
            m.weight.copy_(torch.randn(b, a, generator=g) * 0.3)
            if bias:
                m.bias.copy_(torch.randn(b, generator=g) * 0.1)
        return m

    rep = FieldSchNet()
    rep.embedding = tnn.Embedding(MAXZ, F)
    with torch.no_grad():
        rep.embedding.weight.copy_(torch.randn(MAXZ, F, generator=g) * 0.4)
    rep.cutoff_fn = tnn.Module()
    rep.cutoff_fn.register_buffer("cutoff", torch.tensor([CUTOFF]))
    rep.radial_basis = tnn.Module()
    rep.radial_basis.register_buffer(
        "offsets", torch.linspace(0.0, CUTOFF, NRBF))

    idu = tnn.Module()
    idu.transform = tnn.ModuleDict(
        {f: lin(F, F, bias=False) for f in FIELDS})
    rep.initial_dipole_update = idu

    rep.interactions = tnn.ModuleList()
    rep.field_interaction = tnn.ModuleList()
    rep.dipole_interaction = tnn.ModuleList()
    rep.dipole_update = tnn.ModuleList()
    for _ in range(NINT):
        it = tnn.Module()
        it.in2f = lin(F, F, bias=False)
        it.f2out = tnn.Sequential(lin(F, F), lin(F, F))
        it.filter_network = tnn.Sequential(lin(NRBF, F), lin(F, F))
        rep.interactions.append(it)
        fi = tnn.Module()
        fi.f2out = tnn.ModuleDict({f: lin(F, F) for f in FIELDS})
        rep.field_interaction.append(fi)
        di = tnn.Module()
        di.transform = tnn.ModuleDict({f: lin(F, F) for f in FIELDS})
        di.filter_network = tnn.ModuleDict(
            {f: tnn.Sequential(lin(NRBF, F), lin(F, F)) for f in FIELDS})
        rep.dipole_interaction.append(di)
        du = tnn.Module()
        du.transform = tnn.ModuleDict(
            {f: lin(F, F, bias=False) for f in FIELDS})
        rep.dipole_update.append(du)

    root = _Root()
    root.representation = rep
    head = tnn.Module()
    head.outnet = tnn.Sequential(lin(F, F // 2), lin(F // 2, 1))
    root.output_modules = tnn.ModuleList([head])
    return root


def _ssp(x):
    return torch.nn.functional.softplus(x) - np.log(2.0)


def _torch_forward(model, Z, R, E):
    """Reference FieldSchNet forward in float64 torch (flat full pair list)."""
    sd = {k: v.double() for k, v in model.state_dict().items()}
    A = len(Z)
    idx_i, idx_j = np.nonzero(~np.eye(A, dtype=bool))
    ii = torch.as_tensor(idx_i)
    jj = torch.as_tensor(idx_j)
    R = torch.as_tensor(R, dtype=torch.float64).requires_grad_(True)
    v_ij = R[jj] - R[ii]
    d = torch.norm(v_ij, dim=1)
    off = torch.linspace(0.0, CUTOFF, NRBF, dtype=torch.float64)
    w = (off[1] - off[0])
    f_ij = torch.exp(-0.5 * ((d[:, None] - off) / w) ** 2)
    rcut = torch.where(d < CUTOFF,
                       0.5 * (torch.cos(d * np.pi / CUTOFF) + 1.0),
                       torch.zeros_like(d))

    def dense(prefix, x, act=False, bias=True):
        y = x @ sd[f"{prefix}.weight"].T
        if bias:
            y = y + sd[f"{prefix}.bias"]
        return _ssp(y) if act else y

    def scat(src, n):
        out = torch.zeros((n,) + src.shape[1:], dtype=src.dtype)
        return out.index_add(0, ii, src)

    q = sd["representation.embedding.weight"][torch.as_tensor(Z)]
    fields = {FIELDS[0]: torch.as_tensor(E, dtype=torch.float64)
              .expand(A, 3)}
    mu = {f: torch.zeros(A, 3, F, dtype=torch.float64) for f in FIELDS}
    for f in FIELDS:
        qi = dense(f"representation.initial_dipole_update.transform.{f}",
                   q, bias=False)
        dmu = (qi[jj] * rcut[:, None])[:, None, :] * v_ij[:, :, None]
        mu[f] = mu[f] + scat(dmu, A)

    for t in range(NINT):
        b = f"representation.interactions.{t}"
        x = dense(f"{b}.in2f", q, bias=False)
        W = dense(f"{b}.filter_network.1",
                  dense(f"{b}.filter_network.0", f_ij, act=True))
        W = W * rcut[:, None]
        agg = scat(x[jj] * W, A)
        dq = dense(f"{b}.f2out.1", dense(f"{b}.f2out.0", agg, act=True))
        for f in FIELDS:
            v = torch.sum(mu[f] * fields[f][:, :, None], dim=1)
            dq = dq + dense(
                f"representation.field_interaction.{t}.f2out.{f}", v,
                act=True)
            db = f"representation.dipole_interaction.{t}"
            Wij = dense(f"{db}.filter_network.{f}.1",
                        dense(f"{db}.filter_network.{f}.0", f_ij, act=True))
            Wij = Wij * rcut[:, None]
            mu_j = mu[f][jj]
            proj = torch.sum(v_ij[:, :, None] * mu_j, dim=1, keepdim=True)
            tensor = mu_j * (d ** 2)[:, None, None] - \
                3.0 * v_ij[:, :, None] * proj
            tensor = tensor * Wij[:, None, :] / (d ** 5)[:, None, None]
            ti = scat(tensor, A)
            dq = dq + dense(f"{db}.transform.{f}",
                            torch.sum(mu[f] * ti, dim=1), act=True)
        q = q + dq
        for f in FIELDS:
            qi = dense(f"representation.dipole_update.{t}.transform.{f}",
                       dq, bias=False)
            dmu = (qi[jj] * rcut[:, None])[:, None, :] * v_ij[:, :, None]
            mu[f] = mu[f] + scat(dmu, A)

    h = torch.nn.functional.silu(
        q @ sd["output_modules.0.outnet.0.weight"].T
        + sd["output_modules.0.outnet.0.bias"])
    e_atom = h @ sd["output_modules.0.outnet.1.weight"].T + \
        sd["output_modules.0.outnet.1.bias"]
    Etot = e_atom.sum()
    forces = -torch.autograd.grad(Etot, R)[0]
    return float(Etot), forces.detach().numpy()


def test_field_schnet_import_elementwise():
    import jax
    import jax.numpy as jnp

    from schnetpack_tpu import properties as P
    from schnetpack_tpu.data.loader import PaddingSpec, collate
    from schnetpack_tpu.interfaces.torch_import import import_torch_model
    from schnetpack_tpu.transform.neighborlist import NeighborListTransform

    model = _make_torch_model()
    with tempfile.TemporaryDirectory() as td:
        path = os.path.join(td, "fs.model")
        torch.save(model, path)
        pot, params, info = import_torch_model(path)
    assert info["external_fields"] == FIELDS

    rng = np.random.RandomState(3)
    A = 7
    Z = rng.randint(1, 9, A)
    R = rng.rand(A, 3) * 3.0
    Efield = np.array([0.01, -0.02, 0.015])

    e_ref, f_ref = _torch_forward(model, Z, R, Efield)

    sample = {P.Z: Z, P.R: R, P.cell: np.zeros((3, 3)),
              P.pbc: np.zeros(3, bool)}
    sample = NeighborListTransform(CUTOFF)(sample)
    batch = collate([sample], PaddingSpec(A + 2, 64, 2))
    batch = {k: jnp.asarray(v) for k, v in batch.items()}
    batch["electric_field"] = jnp.asarray(Efield, jnp.float32)[None, :]
    out = pot.apply(params, batch)
    e = float(out["energy"][0])
    f = np.asarray(out["forces"])[:A]
    assert abs(e - e_ref) < 1e-3 * max(1.0, abs(e_ref)), (e, e_ref)
    scale = np.abs(f_ref).max()
    np.testing.assert_allclose(f / scale, f_ref / scale, rtol=2e-4,
                               atol=2e-4)
