"""Benchmark: effective-Hamiltonian matvec throughput on the current backend.

The reference publishes no performance numbers (BASELINE.md); the north star
is chi=2048-class sweep throughput on one TPU chip.  This benchmark times the
hot kernel of every VUMPS/DMRG sweep — the H_AC matvec (all FSM channels of
the one-band Hubbard MPO contracted against block-sparse environments) — in
its shape-bucketed batched form (algorithms/batched_hac.py: channels packed
onto block-sparse channel legs, sectors padded to pow2 buckets, the whole
matvec lowered to a few dozen batched einsums), and prints one JSON line.

vs_baseline is reported as 1.0: the reference has no published number to
normalize against (BASELINE.json "published": {}).
"""

import json
import time

import jax
import jax.numpy as jnp


def _random_host(cls, group, spaces, arrows, charge=None,
                 dtype=jnp.float32, seed=0):
    """SymTensor with numpy-backed blocks: keeps the whole build on the host
    (one device transfer per packed stack instead of one per block — the
    remote-TPU tunnel makes per-block transfers the dominant build cost)."""
    import numpy as np
    t = cls(group, spaces, arrows, {}, charge, dtype)
    rng = np.random.default_rng(seed)
    for key in t.allowed_keys():
        t.blocks[key] = rng.standard_normal(
            t.key_shape(key)).astype(jnp.dtype(dtype).name)
    return t


def build_kernel(sector_dim: int = 48, dtype=jnp.float32):
    from hubbardtn_tpu.algorithms.batched_hac import build_padded_hac
    from hubbardtn_tpu.models.hubbard import OBSim, hamiltonian
    from hubbardtn_tpu.mps.imps import virtual_spaces
    from hubbardtn_tpu.tensor.symtensor import IN, OUT, SymTensor

    sim = OBSim(t=(1.0,), u=(2.0,), P=1, Q=1)
    H = hamiltonian(sim)
    g = H.site.group
    Vs = virtual_spaces(g, H.site.space, sim.T, sector_dim, cells=2)
    Vl, Vr = Vs[0], Vs[1]

    GL = {a: _random_host(SymTensor, g, (Vl, Vl), (IN, OUT), charge=qa,
                          dtype=dtype, seed=a)
          for a, qa in enumerate(H.charges[0])}
    # GR legs are (ket IN, bra OUT) with the dual channel charge
    GR = {b: _random_host(SymTensor, g, (Vr, Vr), (IN, OUT),
                          charge=g.dual(qb), dtype=dtype, seed=100 + b)
          for b, qb in enumerate(H.charges[1])}
    AC = _random_host(SymTensor, g, (Vl, H.site.space, Vr), (IN, OUT, OUT),
                      dtype=dtype, seed=7)
    plan, vec, GLp, GRp = build_padded_hac(H, GL, GR, AC, 0)
    mv = jax.jit(plan.matvec)
    return mv, vec, GLp, GRp, vec.shape[0], Vl.total_dim, Vr.total_dim


def main():
    import sys
    last_err = None
    for sector_dim in (48, 32, 16):
        try:
            t0 = time.perf_counter()
            # build entirely on the host CPU device: every eager op on the
            # remote-TPU tunnel costs an RPC round trip, which would turn
            # the MPO compile + packing into minutes of latency
            cpu = jax.devices("cpu")[0]
            with jax.default_device(cpu):
                mv, v0, GLp, GRp, nvec, dl, dr = build_kernel(sector_dim)
            tpu = jax.devices()[0]
            v0 = jax.device_put(v0, tpu)
            GLp = jax.device_put(GLp, tpu)
            GRp = jax.device_put(GRp, tpu)
            print(f"# build {time.perf_counter()-t0:.1f}s bonds {dl}x{dr} "
                  f"vec {nvec}", file=sys.stderr)
            t0 = time.perf_counter()
            v = mv(v0, GLp, GRp)  # compile + warmup
            jax.block_until_ready(v)
            print(f"# compile {time.perf_counter()-t0:.1f}s", file=sys.stderr)
            for _ in range(3):
                v = mv(v, GLp, GRp)
            jax.block_until_ready(v)
            reps = 30
            t0 = time.perf_counter()
            for _ in range(reps):
                v = mv(v, GLp, GRp)
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
