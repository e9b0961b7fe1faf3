"""Create a dataset from your own structures/labels (ASE-DB-compatible)."""
import numpy as np

from schnetpack_tpu.data import ASEAtomsData


def main(out_db: str = "my_dataset.db"):
    ds = ASEAtomsData.create(
        out_db,
        distance_unit="Ang",
        property_unit_dict={"energy": "eV", "forces": "eV/Ang"},
        atomrefs={"energy": np.zeros(101)},
    )
    # replace with your own structures + labels:
    systems = []
    for _ in range(10):
        n = np.random.randint(3, 9)
        systems.append(
            dict(
                numbers=np.random.randint(1, 9, n),
                positions=np.random.rand(n, 3) * 5,
                energy=np.array([np.random.randn()]),
                forces=np.random.randn(n, 3),
                # periodic systems: cell=..., pbc=np.ones(3, bool)
            )
        )
    ds.add_systems(systems)
    print(f"wrote {len(ASEAtomsData(out_db))} systems to {out_db}")


if __name__ == "__main__":
    main()
