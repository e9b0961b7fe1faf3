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
