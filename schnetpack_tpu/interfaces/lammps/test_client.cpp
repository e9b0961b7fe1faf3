// Standalone test client: reads a tiny cluster spec from argv, queries the
// model server, prints energy and forces (used by the offline test suite
// to validate the wire protocol without a LAMMPS build).
//
// Usage: ./test_client <socket> <n_local> < xyz-lines on stdin:
//        "<Z> <x> <y> <z>" per atom
#include "spk_client.h"

#include <cstdio>
#include <cstdlib>
#include <vector>

int main(int argc, char **argv) {
  if (argc != 3) {
    std::fprintf(stderr, "usage: %s <socket> <n_local>\n", argv[0]);
    return 2;
  }
  spk_tpu::ModelClient client(argv[1]);
  int64_t n_local = std::atoll(argv[2]);

  std::vector<int32_t> numbers;
  std::vector<double> positions;
  int z;
  double px, py, pz;
  while (std::scanf("%d %lf %lf %lf", &z, &px, &py, &pz) == 4) {
    numbers.push_back(z);
    positions.push_back(px);
    positions.push_back(py);
    positions.push_back(pz);
  }
  int64_t n_total = static_cast<int64_t>(numbers.size());

  std::vector<double> e_atom, forces;
  if (!client.evaluate(n_total, n_local, numbers.data(), positions.data(),
                       &e_atom, &forces)) {
    std::fprintf(stderr, "evaluation failed\n");
    return 1;
  }
  double e_local = 0.0;
  for (int64_t i = 0; i < n_local; i++) e_local += e_atom[i];
  std::printf("energy_local %.10f\n", e_local);
  for (int64_t i = 0; i < n_total; i++)
    std::printf("force %lld %.10f %.10f %.10f\n", (long long)i, forces[3 * i],
                forces[3 * i + 1], forces[3 * i + 2]);
  return 0;
}
