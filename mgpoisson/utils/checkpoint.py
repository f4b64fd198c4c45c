"""Checkpoint / resume.

The reference has none; its state is just psi and `step()` is
restartable from any iterate (`cpu.lua:196-206` — SURVEY.md section 5).
That property makes checkpointing trivial in principle: persist
(psi, f, iteration, error history) and resume by passing psi back as
psi0.

Two layouts:

- single-file npz (default when the array is fully addressable — any
  single-process run, including one sharded over local devices): the
  global array is materialized on host and saved whole.
- per-process shard npz (multi-host global arrays, or `sharded=True`):
  each process saves only its ADDRESSABLE shards plus their global
  index offsets to `<path>.proc<K>.npz`; `load_state` stitches the
  local block back and (given the mesh) reassembles the global
  jax.Array with `jax.make_array_from_process_local_data` — no process
  ever holds the full grid, which is the point for solves where the
  grid only exists sharded.
"""

from __future__ import annotations

import glob
import os
from typing import Optional

import numpy as np


def _is_jax_array(x) -> bool:
    return hasattr(x, "addressable_shards") and hasattr(x, "sharding")


def _proc_path(path: str, proc: int) -> str:
    return f"{path}.proc{proc}.npz"


def _save_sharded(path: str, arrays: dict, scalars: dict) -> None:
    import jax
    proc = jax.process_index()
    payload = dict(scalars)
    for name, arr in arrays.items():
        payload[f"{name}_global_shape"] = np.asarray(arr.shape)
        for k, shard in enumerate(arr.addressable_shards):
            starts = [0 if s.start is None else int(s.start)
                      for s in shard.index]
            payload[f"{name}_shard{k}"] = np.asarray(shard.data)
            payload[f"{name}_shard{k}_start"] = np.asarray(starts)
    np.savez(_proc_path(path, proc), **payload)


def save_state(path: str, psi, f=None, iteration: int = 0,
               errs=None, meta: Optional[dict] = None,
               sharded: Optional[bool] = None) -> None:
    """Persist solver state.

    sharded: None (auto — per-process shard files iff psi is not fully
    addressable, i.e. a true multi-host global array), or force with
    True/False.  Forcing True on a single host exercises the exact
    multi-host layout, which is how the round trip is tested without a
    cluster.
    """
    if sharded is None:
        sharded = _is_jax_array(psi) and not psi.is_fully_addressable
    if sharded and not _is_jax_array(psi):
        raise TypeError("sharded=True needs a jax.Array with shards; "
                        f"got {type(psi).__name__}")
    scalars = {"iteration": np.asarray(iteration)}
    if errs is not None:
        scalars["errs"] = np.asarray(errs)
    if meta:
        for k, v in meta.items():
            scalars[f"meta_{k}"] = np.asarray(v)
    if sharded:
        arrays = {"psi": psi}
        if f is not None:
            arrays["f"] = f
        _save_sharded(path, arrays, scalars)
        return
    payload = dict(scalars)
    payload["psi"] = np.asarray(psi)
    if f is not None:
        payload["f"] = np.asarray(f)
    np.savez(path, **payload)


def _stitch_local(z, name: str):
    """Reassemble this process's contiguous local block from its saved
    shards (offsets are rebased to the process-local origin)."""
    gshape = tuple(int(s) for s in z[f"{name}_global_shape"])
    ks = sorted(
        int(k.split("shard")[-1].split("_")[0])
        for k in z.files
        if k.startswith(f"{name}_shard") and not k.endswith("_start"))
    shards = [(z[f"{name}_shard{k}_start"], z[f"{name}_shard{k}"])
              for k in ks]
    ndim = len(gshape)
    lo = [min(int(s[0][d]) for s in shards) for d in range(ndim)]
    hi = [max(int(s[0][d]) + s[1].shape[d] for s in shards)
          for d in range(ndim)]
    block = np.zeros([h - l for l, h in zip(lo, hi)], shards[0][1].dtype)
    for starts, data in shards:
        idx = tuple(slice(int(starts[d]) - lo[d],
                          int(starts[d]) - lo[d] + data.shape[d])
                    for d in range(ndim))
        block[idx] = data
    # the shards must tile the bounding box exactly — a process whose
    # addressable shards are non-adjacent would otherwise get silent
    # zero-filled gaps in its "local block"
    n_filled = sum(d.size for _, d in shards)
    if n_filled != block.size:
        raise ValueError(
            f"checkpoint shards for '{name}' do not tile this process's "
            f"bounding box ({n_filled} elements over a {block.shape} "
            f"block): the saving mesh gave this process non-contiguous "
            f"shards, which this loader does not support")
    return block, gshape


def load_state(path: str, mesh=None) -> dict:
    """Load solver state.

    Single-file checkpoints load as plain numpy arrays.  Per-process
    shard checkpoints load this process's local block; pass the mesh to
    get global jax.Arrays back (sharded exactly like the solver's
    layout, via mgpoisson.shard.multihost.make_global_array), else the
    local numpy blocks are returned.
    """
    if os.path.exists(path):
        with np.load(path) as z:
            out = {k: z[k] for k in z.files}
        out["iteration"] = int(out.get("iteration", 0))
        return out

    import jax
    proc_file = _proc_path(path, jax.process_index())
    if not os.path.exists(proc_file):
        raise FileNotFoundError(
            f"no checkpoint at {path} (or {proc_file}); found: "
            f"{glob.glob(path + '.proc*.npz')}")
    with np.load(proc_file) as z:
        out = {k: z[k] for k in z.files
               if "_shard" not in k and not k.endswith("_global_shape")}
        names = {k.split("_global_shape")[0] for k in z.files
                 if k.endswith("_global_shape")}
        for name in sorted(names):
            block, gshape = _stitch_local(z, name)
            if mesh is not None:
                from mgpoisson.shard.multihost import make_global_array
                out[name] = make_global_array(block, mesh)
                assert out[name].shape == gshape
            else:
                out[name] = block
                out[f"{name}_global_shape"] = gshape
    out["iteration"] = int(out.get("iteration", 0))
    return out


def resume_solve(solver, path: str, **solve_kw):
    """Continue a checkpointed solve: load psi (and f if saved) and run
    solver.solve from that iterate.  Sharded checkpoints reassemble on
    the solver's mesh."""
    state = load_state(path, mesh=getattr(solver, "mesh", None))
    f = state.get("f")
    if f is not None and not _is_jax_array(f):
        import jax.numpy as jnp
        f = jnp.asarray(f)
    return solver.solve(f, psi0=state["psi"], **solve_kw)
