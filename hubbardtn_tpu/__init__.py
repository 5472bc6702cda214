"""hubbardtn_tpu: TPU-native multi-band Hubbard iMPS framework.

A from-scratch JAX/XLA implementation with the capabilities of
DaanVrancken/HubbardTN (reference mounted at /root/reference): abelian
symmetric block tensors, FSM MPO compilation with Jordan-Wigner fermion
handling, VUMPS/bond-expansion ground states, quasiparticle excitations,
grand-canonical mu search, observables, caching, and serialization.

Public API mirrors the reference's exports
(/root/reference/src/HubbardFunctions.jl:11-13).
"""

import os as _os

# Strict-f32 matmul passes by default (HTN_MATMUL_PRECISION overrides,
# e.g. "default" restores the platform default).  TPU XLA's default
# matmul precision runs f32 contractions through bfloat16 passes; that
# is fine for inference-style workloads but NOT for this solver: the
# polar-express gauge amplifies small singular directions by ~3.4x per
# step and bf16-level contraction error destabilizes it — the fused f32
# VUMPS driver NaN'd within 40 iterations from a random start on the
# chip, while the identical program at "highest" matches the CPU-f32
# trajectory.  The workload is latency-bound, not MXU-bound, so the
# extra matmul passes are nearly free at production sizes.
import jax as _jax

_jax.config.update("jax_default_matmul_precision",
                   _os.environ.get("HTN_MATMUL_PRECISION", "highest"))

if _os.environ.get("HTN_COMPILE_CACHE"):
    # Persistent XLA compilation cache (opt-in): the fused whole-iteration
    # programs cost 1-3 min of XLA compile each on TPU, and the driver
    # recompiles at every bond-structure change — caching across processes
    # turns repeat runs (reruns, scans over model parameters at the same
    # bond schedule) from minutes of compile into milliseconds of cache
    # reads.  Set HTN_COMPILE_CACHE to a writable directory.
    import jax as _jax

    _jax.config.update("jax_compilation_cache_dir",
                       _os.environ["HTN_COMPILE_CACHE"])
    # threshold 0.1 s: a production solve issues THOUSANDS of sub-second
    # structure-dependent compiles (per-bond-structure helper jits)
    # whose sum rivals the big fused programs' compile time; cache reads
    # cost ~ms each, far below any of them (HTN_CACHE_MIN_S overrides)
    _jax.config.update("jax_persistent_cache_min_compile_time_secs",
                       float(_os.environ.get("HTN_CACHE_MIN_S", "0.1")))

from .models.hubbard import MBCSim, MBSim, OBCSim, OBSim, hamiltonian
from .algorithms.groundstate import compute_groundstate, find_groundstate
from .algorithms.vumps import vumps
from .algorithms.idmrg import idmrg2
from .algorithms.grassmann import grassmann_polish
from .algorithms.excitations import excitations
from .mps.imps import circshift_mps, initialize_mps
from .observables import (calc_ms, density_spin, density_state, dim_state,
                          filling_check)
from .workflows import (produce_bandgap, produce_domainwalls,
                        produce_excitations, produce_groundstate,
                        produce_TruncState)
from .io.serialize import load_state, save_state
from .io.extract_params import extract_params
from .plotting import plot_excitations, plot_spin

__all__ = [
    "OBSim", "MBSim", "OBCSim", "MBCSim", "hamiltonian",
    "compute_groundstate", "find_groundstate", "vumps", "idmrg2",
    "grassmann_polish", "excitations", "initialize_mps", "circshift_mps",
    "produce_groundstate", "produce_excitations", "produce_bandgap",
    "produce_TruncState", "produce_domainwalls",
    "dim_state", "density_state", "density_spin", "calc_ms", "filling_check",
    "save_state", "load_state", "extract_params",
    "plot_excitations", "plot_spin",
]

__version__ = "0.1.0"
