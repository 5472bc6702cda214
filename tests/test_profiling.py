"""Per-sweep stage timing + opt-in XLA profiler hook (SURVEY §5 aux)."""

import glob
import os

import pytest

from hubbardtn_tpu.algorithms.vumps import vumps
from hubbardtn_tpu.models.hubbard import OBSim, hamiltonian
from hubbardtn_tpu.mps.imps import initialize_mps
from hubbardtn_tpu.utils.profiling import StageTimer, fmt_stage_ms


def test_stage_timer_marks():
    t = StageTimer()
    t.mark("a")
    t.mark("b")
    t.mark(None)
    ms = t.ms()
    assert set(ms) == {"a", "b"} and all(v >= 0 for v in ms.values())
    assert "a=" in fmt_stage_ms(ms)
    t.reset()
    assert t.ms() == {}


@pytest.mark.slow
def test_vumps_history_carries_stage_ms(tmp_path, monkeypatch):
    sim = OBSim(t=(1.0,), u=(2.0,), P=1, Q=1)
    H = hamiltonian(sim)
    psi = initialize_mps(H.site.group, H.site.space, sim.T, bond_dim=3,
                         seed=3)
    monkeypatch.setenv("HTN_PROFILE_DIR", str(tmp_path))
    res = vumps(psi, H, tol=1e-6, maxiter=2)
    for rec in res.history:
        keys = set(rec["stage_ms"])
        # staged loop: per-stage breakdown; fused whole-iteration loop
        # (algorithms/fused_vumps.py): one program, one timing
        assert {"eigs", "gauge", "envs"} <= keys or "fused" in keys
    traces = glob.glob(os.path.join(str(tmp_path), "vumps", "**", "*"),
                       recursive=True)
    assert traces, "profiler trace directory is empty"
