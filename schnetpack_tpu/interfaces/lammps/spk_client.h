// Unix-socket client for the schnetpack_tpu model server.
// Shared by the LAMMPS pair style and the standalone test client.
#ifndef SPK_CLIENT_H
#define SPK_CLIENT_H

#include <cstdint>
#include <string>
#include <vector>

namespace spk_tpu {

class ModelClient {
 public:
  explicit ModelClient(const std::string &socket_path);
  ~ModelClient();

  bool connect_server();
  void close_connection();
  bool connected() const { return fd_ >= 0; }

  // Evaluate the potential for a local+ghost cluster.  positions is
  // [n_total*3]; per-atom energies and forces come back for all n_total
  // atoms (caller applies the first n_local — newton-off semantics).
  bool evaluate(int64_t n_total, int64_t n_local, const int32_t *numbers,
                const double *positions, std::vector<double> *e_atom,
                std::vector<double> *forces);

 private:
  bool send_all(const void *buf, size_t n);
  bool recv_all(void *buf, size_t n);

  std::string socket_path_;
  int fd_ = -1;
};

}  // namespace spk_tpu

#endif  // SPK_CLIENT_H
