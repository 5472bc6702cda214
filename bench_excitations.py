"""TPU benchmark: quasiparticle H_eff pipeline at a chi~2048-class bond.

Times the three jitted stages of one packed H_eff application
(algorithms/excitations.QuasiparticleProblem._programs) on the TPU chip:

* pre:      unpack X -> within-cell sweeps -> both GMRES right-hand sides
* restart:  one fully-on-device 30-step GMRES restart of a geometric sum
* post:     boundary solutions -> interior fills -> gradient assembly

and reports a composite ms per H_eff application assuming the typical two
restarts per side.  The state is a random-but-isometric (polar-gauged) MPS
with the bench's chi~2752 block structure; convergence is irrelevant for
stage timing, every stage is a fixed-shape program.

Excitations run in complex64 on the chip (x64 is disabled there); the
library's CPU path is complex128.

Run:  python bench_excitations.py     (~4-6 min, mostly compiles)
"""

import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


def heff_bench(b, cpu, dev, K: int = 8) -> dict:
    """Time the packed H_eff pipeline (serial + K-lane momentum-batched)
    on an existing :class:`bench.SweepBench` structure; returns the stat
    fields merged into the driver-captured bench JSON
    (/root/reference/src/HubbardFunctions.jl:1206-1208 is the matching
    HOT path: the per-momentum Arnoldi excitation solve)."""
    from bench import _time_stage
    from hubbardtn_tpu.algorithms.environments import Environments
    from hubbardtn_tpu.algorithms.excitations import QuasiparticleProblem
    from hubbardtn_tpu.mps.imps import UniformMPS
    from hubbardtn_tpu.tensor import linalg as tla

    t0 = time.perf_counter()
    with jax.default_device(cpu):
        # isometric gauge: polar factors of the random AC matricizations, so
        # the mixed transfer operators have spectral radius ~1 (the timing
        # needs realistic, well-conditioned programs, not physics)
        ALs, ARs, Cs = [], [], []
        for x in range(b.T):
            ALs.append(tla.polar(b.ACs[x], 2))
            ARs.append(tla.polar(b.ACs[x], 1))
            C = b.Cs[x]
            Cs.append(C * (1.0 / C.norm()))
        psi = UniformMPS(ALs, ARs, Cs)
        print(f"# exc build+gauge {time.perf_counter()-t0:.1f}s chi {b.chi}",
              file=sys.stderr)
        t0 = time.perf_counter()
        envs = Environments(psi, b.H, tol=1e-8)
        prob = QuasiparticleProblem(psi, b.H, envs, _hole_sector(b.H))
        print(f"# exc problem {time.perf_counter()-t0:.1f}s "
              f"n_params {prob.n_params}", file=sys.stderr)
    phase = jnp.asarray(np.exp(0.7j), dtype=jnp.complex128)
    pre, restartL, restartR, post = prob._programs(False)
    rng = np.random.default_rng(0)
    with jax.default_device(cpu):
        v_host = (rng.standard_normal(prob.packer.total)
                  + 1j * rng.standard_normal(prob.packer.total))
    v = jax.device_put(jnp.asarray(v_host), dev)

    t0 = time.perf_counter()
    rhs, rhs_r = pre(v, phase)
    jax.block_until_ready((rhs, rhs_r))
    print(f"# pre compile {time.perf_counter()-t0:.0f}s", file=sys.stderr)
    x0 = jnp.zeros_like(rhs)
    x0r = jnp.zeros_like(rhs_r)
    t0 = time.perf_counter()
    lb, _ = restartL(x0, rhs, phase)
    rb, _ = restartR(x0r, rhs_r, phase)
    jax.block_until_ready((lb, rb))
    print(f"# restarts compile {time.perf_counter()-t0:.0f}s",
          file=sys.stderr)
    t0 = time.perf_counter()
    out = post(v, lb, rb)
    jax.block_until_ready(out)
    print(f"# post compile {time.perf_counter()-t0:.0f}s", file=sys.stderr)

    ms_pre = _time_stage(lambda: pre(v, phase))
    ms_rl = _time_stage(lambda: restartL(x0, rhs, phase))
    ms_rr = _time_stage(lambda: restartR(x0r, rhs_r, phase))
    ms_post = _time_stage(lambda: post(v, lb, rb))
    composite = ms_pre + 2 * (ms_rl + ms_rr) + ms_post

    # Momentum-batched pipeline: K dispersion lanes per dispatch (the
    # default path of a K-momentum excitations() scan).  Per-momentum cost
    # should drop well below the serial composite — the serial programs
    # underutilize the MXU and pay the tunnel dispatch per stage.
    ks = np.linspace(0.1, np.pi, K)
    ph_b = jnp.asarray(np.exp(1j * ks), dtype=jnp.complex128)
    with jax.default_device(cpu):
        V_host = (rng.standard_normal((K, prob.packer.total))
                  + 1j * rng.standard_normal((K, prob.packer.total)))
    Vb = jax.device_put(jnp.asarray(V_host), dev)
    pre_b, restartL_b, restartR_b, post_b = prob._programs_batched(False)
    t0 = time.perf_counter()
    rhs_b, rhs_rb = pre_b(Vb, ph_b)
    X0b = jnp.zeros_like(rhs_b)
    lb_b, _ = restartL_b(X0b, rhs_b, ph_b)
    rb_b, _ = restartR_b(X0b, rhs_rb, ph_b)
    out_b = post_b(Vb, lb_b, rb_b)
    jax.block_until_ready(out_b)
    print(f"# batched (K={K}) compile {time.perf_counter()-t0:.0f}s",
          file=sys.stderr)
    ms_pre_b = _time_stage(lambda: pre_b(Vb, ph_b))
    ms_rl_b = _time_stage(lambda: restartL_b(X0b, rhs_b, ph_b))
    ms_rr_b = _time_stage(lambda: restartR_b(X0b, rhs_rb, ph_b))
    ms_post_b = _time_stage(lambda: post_b(Vb, lb_b, rb_b))
    comp_b = (ms_pre_b + 2 * (ms_rl_b + ms_rr_b) + ms_post_b) / K

    return {
        "exc_heff_ms": round(composite, 2),
        "exc_heff_breakdown_ms": {"pre": round(ms_pre, 2),
                                  "gmres_restart_L": round(ms_rl, 2),
                                  "gmres_restart_R": round(ms_rr, 2),
                                  "post": round(ms_post, 2)},
        "exc_batched_per_momentum_ms": round(comp_b, 2),
        "exc_batched_lanes": K,
        # dispersion throughput of the production momentum-batched path
        "exc_lanes_per_s": round(1e3 / comp_b, 1) if comp_b else 0.0,
    }


def main():
    from bench import SweepBench

    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        b = SweepBench(64)
    dev = jax.devices()[0]
    stats = heff_bench(b, cpu, dev)
    print(json.dumps({
        "metric": f"exc_heff_ms_chi{b.chi}",
        "value": stats["exc_heff_ms"],
        "unit": "ms",
        "vs_baseline": round(stats["exc_heff_ms"]
                             / max(stats["exc_batched_per_momentum_ms"],
                                   1e-9), 1),
        **stats,
        "note": "composite = pre + 2*(restartL+restartR) + post; c64 on "
                "TPU; vs_baseline = serial / batched-per-momentum",
    }))


def _hole_sector(H):
    """charges=[1, 1/2, -1] analog in the abelian group's tuple encoding
    (fparity, 2*Sz, charge): one hole with spin up."""
    return (1, 1, -1)


if __name__ == "__main__":
    main()
