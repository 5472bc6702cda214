"""Scan relative-cell-offset contributions M(d): finite-window vs the
env-recipe (explicit transfer powers), d = 1..12, at the u=5 state."""
import os
os.environ['JAX_PLATFORMS'] = 'cpu'
import jax
jax.config.update('jax_platforms', 'cpu')
jax.config.update('jax_enable_x64', True)
import jax.numpy as jnp
import numpy as np

from hubbardtn_tpu.models.hubbard import OBSim, hamiltonian
from hubbardtn_tpu.mps.imps import initialize_mps, bond_identity, absorb_bond_right
from hubbardtn_tpu.algorithms.vumps import vumps, apply_H_AC
from hubbardtn_tpu.algorithms.excitations import (QuasiparticleProblem,
    _canon_env, _add_env, SymTensorFull)
from hubbardtn_tpu.algorithms.environments import mpo_transfer_left, mpo_transfer_right
from hubbardtn_tpu.solvers.krylov import lanczos_ground
from hubbardtn_tpu.tensor.symtensor import tensordot

sim = OBSim(t=(1.0,), u=(5.0,), P=1, Q=1)
H = hamiltonian(sim)
psi = initialize_mps(H.site.group, H.site.space, sim.T, bond_dim=3, seed=1)
res = vumps(psi, H, tol=1e-10, maxiter=250)
prob = QuasiparticleProblem(res.psi, H, res.envs, (1, 1, -1))
pk = prob.packer
T, Ws, ALs, ARs = prob.T, prob.Ws, prob.ALs, prob.ARs
GLs, GRs = prob.GLs, prob.GRs
g = prob.group

# use the OPTIMAL eigenvector at k=pi (where the discrepancy lives)
from hubbardtn_tpu.algorithms.excitations import apply_heff
mv = lambda v: pk.pack(apply_heff(prob, pk.unpack(v), complex(-1.0)))
rng = np.random.default_rng(0)
v0 = jnp.asarray(rng.standard_normal(pk.total) + 1j * rng.standard_normal(pk.total))
w, vopt, _ = lanczos_ground(mv, v0, krylov_dim=30, tol=1e-8, max_restarts=40)
print('H_eff lowest at k=pi:', w, flush=True)
Xs = pk.unpack(vopt)
Bs = prob.Bs_from_X(Xs)

# ---- env-recipe M(d) for d >= 1 (ket-B d cells to the RIGHT of bra) -------
def env_M_right(dmax):
    cur = {a: t * 0.0 for a, t in prob.RB_ts[T - 1].items()}
    for y in reversed(range(T)):
        tmpl = prob.RB_ts[(y - 1) % T]
        cur = _canon_env(tmpl, mpo_transfer_right(cur, Ws[y], ALs[y], ARs[y]))
        ins = mpo_transfer_right(GRs[y], Ws[y], Bs[y], ARs[y])
        cur = _canon_env(tmpl, _add_env(cur, ins))
    out = {}
    for d in range(1, dmax + 1):
        RB = cur
        # gradient with RB at each bra site
        tot = 0.0
        RBx = [None] * T
        RBx[T - 1] = RB
        for x in reversed(range(1, T)):
            RBx[x - 1] = _canon_env(prob.RB_ts[x - 1],
                mpo_transfer_right(RBx[x], Ws[x], ALs[x], ARs[x]))
        for x in range(T):
            G = apply_H_AC(GLs[x], Ws[x], RBx[x], ALs[x])
            Xp = tensordot(prob.NLs[x].conj(), G, axes=([0, 1], [0, 1]))
            tot += complex(Xs[x].inner(SymTensorFull(prob.Xt[x]) + Xp))
        out[d] = tot
        # push one more cell for the next d
        nxt = cur
        for y in reversed(range(T)):
            nxt = mpo_transfer_right(nxt, Ws[y], ALs[y], ARs[y])
        cur = _canon_env(prob.RB_ts[T - 1], nxt)
    return out

# ---- window M(d) ----------------------------------------------------------
L_cells = 40
L = L_cells * T
ACs = [absorb_bond_right(ALs[x], prob.Cs[x]) for x in range(T)]

def site_tensor(gl, gB):
    x = gl % T
    if gB is None:
        if gl == L // 2:
            return ACs[x]
        return ALs[x] if gl < L // 2 else ARs[x]
    return Bs[x] if gl == gB else (ALs[x] if gl < gB else ARs[x])

Ident0 = bond_identity(g, ALs[0].spaces[0], dtype=jnp.complex128)

def mpo_window(gb, gk):
    env = {0: Ident0}
    for gl in range(L):
        env = mpo_transfer_left(env, Ws[gl % T], site_tensor(gl, gk),
                                site_tensor(gl, gb))
    fin = H.n_channels[0] - 1
    t = env.get(fin)
    if t is None or not t.blocks:
        return 0.0
    out = 0.0
    for (qa, qb), b in t.blocks.items():
        if qa == qb:
            out = out + jnp.trace(b)
    return complex(out)

env_right = env_M_right(12)
mid = 10
for d in (1, 2, 3, 4, 6, 8, 10, 12):
    wv = 0.0
    for x in range(T):
        for y in range(T):
            wv += mpo_window(mid * T + x, (mid + d) * T + y)
    ev = env_right[d]
    print(f'd=+{d}: window={wv:.8f}  env={ev:.8f}  diff={abs(wv-ev):.3e}',
          flush=True)
