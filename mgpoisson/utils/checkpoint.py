"""Checkpoint / resume.

The reference has none; its state is just psi and `step()` is
restartable from any iterate (`cpu.lua:196-206` — SURVEY.md section 5).
That property makes checkpointing trivial: persist (psi, f, iteration,
error history) as an npz and resume by passing psi back as psi0.
Supports long sharded solves where preemption matters.
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np


def save_state(path: str, psi, f=None, iteration: int = 0,
               errs=None, meta: Optional[dict] = None) -> None:
    payload = {
        "psi": np.asarray(psi),
        "iteration": np.asarray(iteration),
    }
    if f is not None:
        payload["f"] = np.asarray(f)
    if errs is not None:
        payload["errs"] = np.asarray(errs)
    if meta:
        for k, v in meta.items():
            payload[f"meta_{k}"] = np.asarray(v)
    np.savez(path, **payload)


def load_state(path: str) -> dict:
    with np.load(path) as z:
        out = {k: z[k] for k in z.files}
    out["iteration"] = int(out.get("iteration", 0))
    return out


def resume_solve(solver, path: str, **solve_kw):
    """Continue a checkpointed solve: load psi (and f if saved) and run
    solver.solve from that iterate."""
    state = load_state(path)
    f = state.get("f")
    if f is not None:
        import jax.numpy as jnp
        f = jnp.asarray(f)
    return solver.solve(f, psi0=state["psi"], **solve_kw)
