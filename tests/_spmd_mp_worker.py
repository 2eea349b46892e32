"""Worker for the multi-process SPMD test (run via subprocess).

Each process owns 4 virtual CPU devices; the 8-device global mesh spans
two processes, so every ppermute/psum in the SPMD sweep crosses a real
process boundary through the distributed runtime (gloo) — the multi-host
analog of the reference's ``mpiexec -n 2`` CI pattern
(``/root/reference/.github/workflows/unittest.yml:26-45``).

Usage: python _spmd_mp_worker.py <process_id> <num_processes> <port>
Prints "WORKER_OK <pid>" on success.
"""

import os
import sys


def main() -> None:
    pid, nproc, port = int(sys.argv[1]), int(sys.argv[2]), int(sys.argv[3])
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + " --xla_force_host_platform_device_count=4"
    )
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
    jax.config.update("jax_cpu_collectives_implementation", "gloo")
    jax.distributed.initialize(
        coordinator_address=f"localhost:{port}",
        num_processes=nproc,
        process_id=pid,
    )
    assert len(jax.devices()) == 4 * nproc
    assert len(jax.local_devices()) == 4

    import numpy as np

    from pytdscf_tpu.basis import Boson
    from pytdscf_tpu.config import Config
    from pytdscf_tpu.mps.lattice import alloc_hartree_product
    from pytdscf_tpu.mps.tdvp import TDVPEngine
    from pytdscf_tpu.operators.hamiltonian import TensorHamiltonian
    from pytdscf_tpu.operators.tensor_op import TensorOperator
    from pytdscf_tpu.parallel.mesh import make_mesh
    from pytdscf_tpu.parallel.spmd_pitdvp import SPMDPITDVP

    nsite, nlev, bond, dt, nsteps = 16, 3, 4, 0.05, 2
    basis = [Boson(nlev) for _ in range(nsite)]
    n_mat = basis[0].get_number_matrix()
    q_mat = basis[0].get_q_matrix()
    pot = {}
    for s in range(nsite):
        pot[(s, s)] = TensorOperator(
            mpo=[(0.05 * (1 + 0.1 * s) * n_mat)[None, :, :, None]],
            legs=(s, s),
        )
    for s in range(nsite - 1):
        key = (s, s, s + 1, s + 1)
        pot[key] = TensorOperator(
            mpo=[(0.02 * q_mat)[None, :, :, None], q_mat[None, :, :, None]],
            legs=key,
        )
    ham = TensorHamiltonian(nsite, [[pot]], kinetic=None)
    vecs = []
    for s in range(nsite):
        v = np.zeros(nlev, complex)
        v[1 if s in (5, 10) else 0] = 1.0
        vecs.append(v)
    cores = alloc_hartree_product([nlev] * nsite, bond, vecs)

    # serial reference, computed identically in every process
    serial = TDVPEngine(
        [list(cores)], ham, Config(jobname=f"mp_ser{pid}", thresh_exp=1e-10)
    )
    e0 = serial.expectation().real
    for _ in range(nsteps):
        serial.propagate(dt)
    e_serial = serial.expectation().real

    mesh = make_mesh({"chain": 4 * nproc})
    par = SPMDPITDVP(
        list(cores), ham,
        Config(jobname=f"mp_par{pid}", thresh_exp=1e-10,
               conserve_norm=False),
        mesh,
    )
    assert abs(par.expectation() - e0) < 1e-9
    for _ in range(nsteps):
        par.propagate(dt)
    e_par = par.expectation()
    n_par = par.norm()
    assert abs(n_par - 1.0) < 5e-4, n_par
    assert abs(e_par - e_serial) < 5e-4, (e_par, e_serial)
    print(f"WORKER_OK {pid} e={e_par:.12f}", flush=True)


if __name__ == "__main__":
    main()
