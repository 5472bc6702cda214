"""Benchmark: effective-Hamiltonian matvec throughput on the current backend.

The reference publishes no performance numbers (BASELINE.md); the north star
is chi=2048-class sweep throughput on one TPU chip.  This benchmark times the
hot kernel of every VUMPS/DMRG sweep — the packed H_AC matvec (all FSM
channels of the one-band Hubbard MPO contracted against block-sparse
environments) — at a ~1k total bond dimension, and prints one JSON line.

vs_baseline is reported as 1.0: the reference has no published number to
normalize against (BASELINE.json "published": {}).
"""

import json
import time

import jax
import jax.numpy as jnp


def build_kernel(sector_dim: int = 32, dtype=jnp.float32):
    from hubbardtn_tpu.algorithms.vumps import apply_H_AC
    from hubbardtn_tpu.models.hubbard import OBSim, hamiltonian
    from hubbardtn_tpu.mps.imps import virtual_spaces
    from hubbardtn_tpu.solvers.krylov import Packer
    from hubbardtn_tpu.tensor.symtensor import IN, OUT, SymTensor

    sim = OBSim(t=(1.0,), u=(2.0,), P=1, Q=1)
    H = hamiltonian(sim)
    g = H.site.group
    Vs = virtual_spaces(g, H.site.space, sim.T, sector_dim, cells=2)
    Vl, Vr = Vs[0], Vs[1]

    GL = {a: SymTensor.random(g, (Vl, Vl), (IN, OUT), charge=qa,
                              dtype=dtype, seed=a)
          for a, qa in enumerate(H.charges[0])}
    # GR legs are (ket IN, bra OUT) with the dual channel charge
    GR = {b: SymTensor.random(g, (Vr, Vr), (IN, OUT), charge=g.dual(qb),
                              dtype=dtype, seed=100 + b)
          for b, qb in enumerate(H.charges[1])}
    AC = SymTensor.random(g, (Vl, H.site.space, Vr), (IN, OUT, OUT),
                          dtype=dtype, seed=7)
    pk = Packer(AC)
    W = H.Ws[0]

    @jax.jit
    def mv(vec, GL, GR):
        return pk.pack(apply_H_AC(GL, W, GR, pk.unpack(vec)))

    return mv, pk.pack(AC), GL, GR, pk.total, Vl.total_dim, Vr.total_dim


def main():
    import sys
    last_err = None
    for sector_dim in (48, 32, 16):
        try:
            t0 = time.perf_counter()
            mv, v0, GL, GR, nvec, dl, dr = build_kernel(sector_dim)
            print(f"# build {time.perf_counter()-t0:.1f}s bonds {dl}x{dr} "
                  f"vec {nvec}", file=sys.stderr)
            t0 = time.perf_counter()
            v = mv(v0, GL, GR)  # compile + warmup
            jax.block_until_ready(v)
            print(f"# compile {time.perf_counter()-t0:.1f}s", file=sys.stderr)
            for _ in range(3):
                v = mv(v, GL, GR)
            jax.block_until_ready(v)
            reps = 30
            t0 = time.perf_counter()
            for _ in range(reps):
                v = mv(v, GL, GR)
            jax.block_until_ready(v)
            ms = (time.perf_counter() - t0) / reps * 1e3
            print(json.dumps({
                "metric": f"h_ac_matvec_ms_bond{dl}x{dr}",
                "value": round(ms, 3),
                "unit": "ms",
                "vs_baseline": 1.0,
            }))
            return
        except Exception as e:  # TPU tunnel flakiness: retry smaller
            last_err = e
            print(f"# sector_dim {sector_dim} failed: {e}", file=sys.stderr)
    raise last_err


if __name__ == "__main__":
    main()
