#!/usr/bin/env python
"""On-device probe of the packed-persistent kernels at large n.

Times _packed_rr_fused / _packed_pc_fused per geometry (the default
packed_plan bm plus forced alternatives) and compares against the DMA
floor, to decide where the large-n packed overhead goes (ADVICE r4:
get one on-device run of the 8192/16384 packed kernels; VERDICT r4
item 3: the 16384^2 fast gate).  Run AFTER any other TPU process has
finished (one compile-relay user at a time).

  python tools/probe_packed_large.py [n ...]
"""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    ".jax_cache"))
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from mgpoisson.bench.timing import chain_time
from mgpoisson.kernels import pallas as pk


def probe(n, geoms, nu=1):
    h = 1.0 / n
    up = jnp.zeros((n, n), jnp.float32).at[n // 2, n // 4].set(1.0)
    fp = jnp.zeros((n, n), jnp.float32).at[n // 2, n // 4].set(-1e6)
    V = jnp.zeros((n // 2, n // 2), jnp.float32)
    arr_gb = n * n * 4 / 1e9
    floor_ms = 3.25 * arr_gb / 819.0 * 1e3
    out = {"n": n, "dma_floor_ms_per_halflevel": round(floor_ms, 3)}
    for halo, bm in geoms:
        tag = f"bm{bm}"
        try:
            t_rr = chain_time(
                lambda u, ff: pk._packed_rr_fused(
                    u, ff, h=h, nu=nu, interpret=False, halo=halo,
                    bm=bm)[0], up, k1=4, k2=24, tries=3, consts=(fp,))
            t_pc = chain_time(
                lambda u, ff, VV: pk._packed_pc_fused(
                    u, ff, VV, h=h, nu=nu, kind="inject",
                    interpret=False, halo=halo, bm=bm), up,
                k1=4, k2=24, tries=3, consts=(fp, V))
            out[tag] = {"rr_ms": round(t_rr * 1e3, 3),
                        "pc_ms": round(t_pc * 1e3, 3),
                        "rr_x_floor": round(t_rr * 1e3 / floor_ms, 3),
                        "pc_x_floor": round(t_pc * 1e3 / floor_ms, 3)}
        except Exception as e:
            out[tag] = f"{type(e).__name__}: {str(e)[:160]}"
        print(json.dumps({tag: out[tag]}), file=sys.stderr, flush=True)
    return out


def main():
    ns = [int(a) for a in sys.argv[1:]] or [4096, 8192, 16384]
    res = []
    for n in ns:
        default = pk.packed_plan(n, 1, 4)
        geoms = []
        if default:
            geoms.append(default)
        halo = default[0] if default else 8
        for bm in (default[1] * 2,) if default else ():
            if n % bm == 0 and bm <= n // 2:
                geoms.append((halo, bm))
        res.append(probe(n, geoms))
    print(json.dumps(res, indent=1))


if __name__ == "__main__":
    main()
