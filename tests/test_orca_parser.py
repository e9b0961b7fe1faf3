"""ORCA output parsing on synthetic files."""
import numpy as np

from schnetpack_tpu.md.parsers import OrcaHessianFileParser, OrcaMainFileParser

MAIN_OUTPUT = """
some header
---------------------------------
CARTESIAN COORDINATES (ANGSTROEM)
---------------------------------
  O      0.000000    0.000000    0.000000
  H      0.757000    0.586000    0.000000
  H     -0.757000    0.586000    0.000000

FINAL SINGLE POINT ENERGY       -76.323456789012

------------------
CARTESIAN GRADIENT
------------------

   1   O   :    0.000100000   -0.020000000    0.000000000
   2   H   :   -0.010000000    0.010000000    0.000000000
   3   H   :    0.009900000    0.010000000    0.000000000

-----------------------
MULLIKEN ATOMIC CHARGES
-----------------------
   0 O :   -0.640000
   1 H :    0.320000
   2 H :    0.320000

Total Dipole Moment    :      0.000000       0.804000       0.000000
"""

HESS_FILE = """
$orca_hessian_file

$hessian
3
                  0          1          2
    0       1.000000   0.100000   0.000000
    1       0.100000   2.000000   0.000000
    2       0.000000   0.000000   3.000000

$dipole_derivatives
3
     0.1 0.0 0.0
     0.0 0.2 0.0
     0.0 0.0 0.3

$end
"""


def test_main_parser(tmp_path):
    f = tmp_path / "water.out"
    f.write_text(MAIN_OUTPUT)
    out = OrcaMainFileParser().parse_file(str(f))
    assert float(out["energy"]) == -76.323456789012
    assert out["positions"].shape == (3, 3)
    np.testing.assert_array_equal(out["atomic_numbers"], [8, 1, 1])
    np.testing.assert_allclose(out["forces"][0], [-0.0001, 0.02, 0.0])
    np.testing.assert_allclose(out["dipole_moment"], [0.0, 0.804, 0.0])
    np.testing.assert_allclose(out["charges"], [-0.64, 0.32, 0.32])


def test_hessian_parser(tmp_path):
    f = tmp_path / "water.hess"
    f.write_text(HESS_FILE)
    out = OrcaHessianFileParser().parse_file(str(f))
    H = out["hessian"]
    assert H.shape == (3, 3)
    np.testing.assert_allclose(np.diag(H), [1.0, 2.0, 3.0])
    np.testing.assert_allclose(out["dipole_derivatives"],
                               [[0.1, 0, 0], [0, 0.2, 0], [0, 0, 0.3]])


def _matrix_block(tag, M, cols_per_block=5):
    """Render a square matrix in ORCA's column-block .hess format."""
    dim = M.shape[0]
    lines = [tag, f"{dim} {dim}" if tag == "$normal_modes" else str(dim)]
    for c0 in range(0, dim, cols_per_block):
        cols = list(range(c0, min(c0 + cols_per_block, dim)))
        lines.append("  " + "   ".join(str(c) for c in cols))
        for r in range(dim):
            lines.append(
                f"  {r} " + " ".join(f"{M[r, c]: .6f}" for c in cols))
    return "\n".join(lines) + "\n"


def test_hessian_multiblock_and_normal_modes(tmp_path):
    """Column-blocked matrices (dim > block width), $normal_modes and
    $vibrational_frequencies round-trip."""
    rng = np.random.RandomState(0)
    dim = 9
    H = rng.randn(dim, dim)
    H = 0.5 * (H + H.T)
    modes = rng.randn(dim, dim)
    freqs = np.concatenate([np.zeros(6), [1600.0, 3650.0, 3750.0]])
    text = "$orca_hessian_file\n\n"
    text += _matrix_block("$hessian", H) + "\n"
    text += "$vibrational_frequencies\n%d\n" % dim
    text += "".join(f"   {i}     {v:.6f}\n" for i, v in enumerate(freqs))
    text += "\n" + _matrix_block("$normal_modes", modes) + "\n$end\n"
    f = tmp_path / "big.hess"
    f.write_text(text)
    out = OrcaHessianFileParser().parse_file(str(f))
    np.testing.assert_allclose(out["hessian"], H, atol=1e-6)
    np.testing.assert_allclose(out["normal_modes"], modes, atol=1e-6)
    np.testing.assert_allclose(out["vibrational_frequencies"], freqs)


MAIN_WITH_RESPONSE = MAIN_OUTPUT.replace(
    "\nFINAL SINGLE POINT ENERGY",
    # real ORCA output always follows the Angstroem block with the a.u.
    # block and ends the gradient with the invariance line — the block
    # engine relies on those stop flags
    "---------------------------------\nCARTESIAN COORDINATES (A.U.)\n"
    "---------------------------------\n  0 O 8.0 0.0 0.0 0.0\n"
    "\nFINAL SINGLE POINT ENERGY",
).replace(
    "\n-----------------------\nMULLIKEN ATOMIC CHARGES",
    "\nDifference to translation invariance:\n"
    ": 0.0 0.0 0.0\n"
    "\n-----------------------\nMULLIKEN ATOMIC CHARGES",
) + """
The raw cartesian tensor (atomic units):
    9.100000    0.000000    0.000000
    0.000000    8.200000    0.000000
    0.000000    0.000000    7.300000
diagonalized tensor:
    7.3 8.2 9.1

CHEMICAL SHIFTS
 Nucleus   0 O
Total shielding tensor (ppm):
   330.0   0.1   0.0
   0.1   320.0   0.0
   0.0   0.0   310.0
Diagonalized sT*s matrix:
 blah
 Nucleus   1 H
Total shielding tensor (ppm):
   30.0   0.0   0.0
   0.0   31.0   0.0
   0.0   0.0   32.0
Diagonalized sT*s matrix:
 blah
CHEMICAL SHIELDING SUMMARY (ppm)
 done
"""


def test_block_engine_full_breadth(tmp_path):
    """The generic OrcaPropertyParser engine: atoms, energy, forces,
    dipole, polarizability tensor and shielding tensors (reference
    OrcaMainFileParser property set)."""
    from schnetpack_tpu.md.parsers.orca_parser import (
        make_main_block_parser, ppm2au,
    )

    f = tmp_path / "resp.out"
    f.write_text(MAIN_WITH_RESPONSE)
    p = make_main_block_parser()
    p.parse_file(str(f))
    out = p.get_parsed()
    syms, R_bohr = out["atoms"]
    assert list(syms) == ["O", "H", "H"]
    np.testing.assert_allclose(R_bohr[1, 0] * 0.5291772105638411, 0.757,
                               atol=1e-6)
    assert float(out["energy"]) == -76.323456789012
    np.testing.assert_allclose(out["forces"][0], [-0.0001, 0.02, 0.0])
    np.testing.assert_allclose(out["dipole_moment"], [0.0, 0.804, 0.0])
    np.testing.assert_allclose(np.diag(out["polarizability"]),
                               [9.1, 8.2, 7.3])
    sh = out["shielding"]
    assert sh.shape == (2, 3, 3)
    np.testing.assert_allclose(sh[0, 0, 0], 330.0 * ppm2au)
    np.testing.assert_allclose(sh[1, 2, 2], 32.0 * ppm2au)


def test_derivative_reshapes():
    from schnetpack_tpu.md.parsers.orca_parser import (
        format_dipole_derivatives, format_polarizability_derivatives,
    )

    dd = np.arange(9 * 3, dtype=float).reshape(9, 3)
    out = format_dipole_derivatives(dd)
    assert out.shape == (3, 3, 3)
    np.testing.assert_allclose(out[1, 0], dd[3])

    pd = np.arange(9 * 6, dtype=float).reshape(9, 6)
    out = format_polarizability_derivatives(pd)
    assert out.shape == (3, 3, 3, 3)
    # symmetric in the last two dims
    np.testing.assert_allclose(out, np.swapaxes(out, -1, -2))
    # upper triangle round-trips
    iu = np.triu_indices(3)
    np.testing.assert_allclose(out[2, 1][iu], pd.reshape(3, 3, 6)[2, 1])
