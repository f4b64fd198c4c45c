"""Solver API — the L3 layer of the reference (SURVEY.md section 1).

Reference surface reproduced:
- construct with size / tol / maxiter / errorCallback (`cpu.lua:173-194`)
- `step()` = one V-cycle + RMS-of-update error (`cpu.lua:196-206`)
- `solve()` = iterate to maxiter with errorCallback early exit and
  stop on err < tol or non-finite err (`cpu.lua:208-216`)

TPU-first differences:
- the whole solve loop can run on-device as one jitted
  `lax.while_loop` with a fused on-device error reduction (the
  reference blocks on a device->host readback every cycle,
  `gpu.lua:362`); the callback path keeps per-cycle host sync for
  API parity.
- structured observability: per-cycle error history returned in
  SolveResult rather than printed (`cpu-raw.lua:244,255`).
- optional stop='residual': relative true-residual stopping
  (||r||/||r0||), the BASELINE.json metric, alongside the reference's
  update-RMS criterion.
"""

from __future__ import annotations

import dataclasses
import inspect
import math
from typing import Callable, Optional

import jax
import jax.numpy as jnp

from mgpoisson.core.rhs import initial_guess, point_charge_rhs
from mgpoisson.core.spec import Spec
from mgpoisson.cycle.vcycle import make_cycle
from mgpoisson.kernels import xla as xla_ops


@dataclasses.dataclass
class SolveResult:
    psi: jax.Array
    iterations: int
    errs: jax.Array          # stopping-metric history, length `iterations`
    converged: bool
    final_err: float
    # exact-metric evaluations performed: == iterations unless
    # stop_check='adaptive' skipped some (then errs holds the
    # contraction model's estimate at skipped entries)
    n_metric_evals: Optional[int] = None

    def __iter__(self):
        yield self.psi
        yield self.errs


class MultigridPoisson:
    """Geometric multigrid Poisson solver (TPU-native MultigridCPU/GPU,
    `cpu.lua:15`, `gpu.lua:18`)."""

    def __init__(self, spec: Spec, mesh=None):
        """mesh: optional jax.sharding.Mesh (or set spec.mesh_shape) for
        2D-block domain-decomposed execution with level-dependent
        replication (see mgpoisson.shard)."""
        if mesh is not None and spec.mesh_shape is None:
            # normalize: downstream backend selection keys off
            # spec.mesh_shape (get_ops fences Pallas under a mesh)
            spec = spec.with_(mesh_shape=tuple(mesh.devices.shape))
        self.spec = spec
        self._dtype = jnp.dtype(spec.dtype)
        self.mesh = mesh
        constrain = None
        if mesh is None and spec.mesh_shape is not None:
            from mgpoisson.shard.mesh import build_mesh
            self.mesh = build_mesh(spec.mesh_shape)
        if self.mesh is not None:
            from mgpoisson.shard.gspmd import make_constrain
            constrain = make_constrain(self.mesh, spec)
        self._constrain = constrain
        h = spec.fine_h

        sweep_dt = (None if spec.sweep_dtype is None
                    else jnp.dtype(spec.sweep_dtype))
        if sweep_dt == self._dtype:
            sweep_dt = None
        self._cycle_plain = None      # set only by adaptive stop_check
        self._packed = False          # packed-persistent fine level
        self._loop_step = None        # packed-carry step for the loop
        self._pack_fns = None         # jitted (pack, unpack), lazy
        self._loop_residual_norm = xla_ops.residual_norm
        if spec.stop_check == "adaptive" and sweep_dt is not None:
            raise ValueError("stop_check='adaptive' buys nothing under "
                             "mixed-precision refinement: the "
                             "refinement step computes the "
                             "full-precision residual every cycle "
                             "anyway; use stop_check='every'")
        # partition='auto' (the default): prefer the explicit shard_map
        # partition — it is the only path that runs the fused Pallas
        # strip kernels per shard (the gspmd fence in kernels.get_ops
        # forces the ~7x-slower unfused XLA sweeps at the fine level) —
        # falling back to gspmd when the mesh lacks the ('x','y') axes
        # the spmd collectives address.
        partition = spec.partition
        if partition == "auto":
            partition = ("spmd" if self.mesh is not None
                         and {"x", "y"} <= set(self.mesh.axis_names)
                         else "gspmd")
        self.partition = partition
        if self.mesh is not None and partition == "spmd":
            # explicit shard_map + ppermute path (mgpoisson.shard.spmd)
            from mgpoisson.shard.spmd import build_spmd_step
            spmd_step = build_spmd_step(spec, self.mesh,
                                        mixed=sweep_dt is not None)

            def step(psi, f, r0):
                psi_new, err_upd, rn = spmd_step(psi, f)
                err = err_upd if spec.stop == "update" else rn / r0
                return psi_new, err

            # Packed-persistent fine level under the partition
            # (row-sharded meshes; mgpoisson.cycle.packed +
            # kernels/pallas.py packed sharded section): the jitted
            # no-callback solve loop carries globally-packed state —
            # valid because pack_grid is row-preserving, so global
            # packing == per-shard packing when columns are unsharded.
            if sweep_dt is None:
                from mgpoisson.cycle import packed as packed_mod
                self._packed = packed_mod.supported_spmd(spec, self.mesh)
            if self._packed:
                from mgpoisson.shard.spmd import build_spmd_step_packed
                spmd_pstep = build_spmd_step_packed(spec, self.mesh)

                def loop_step(pp, fp, r0):
                    ppn, err_upd, rn = spmd_pstep(pp, fp)
                    err = err_upd if spec.stop == "update" else rn / r0
                    return ppn, err

                self._loop_step = loop_step

            if spec.stop_check == "adaptive":
                # the adaptive solve loop drives the bare shard_map'd
                # cycles directly (see _build_adaptive_loop); psi/f at
                # the loop level are global arrays, so the loop body is
                # unchanged from the gspmd form
                if self._packed:
                    from mgpoisson.cycle import packed as packed_mod
                    from mgpoisson.shard.spmd import \
                        build_spmd_cycles_packed
                    plain, rnorm = build_spmd_cycles_packed(spec,
                                                            self.mesh)
                    self._loop_residual_norm = \
                        packed_mod.residual_norm_packed
                else:
                    from mgpoisson.shard.spmd import build_spmd_cycles
                    plain, rnorm = build_spmd_cycles(spec, self.mesh)
                self._cycle_plain = lambda u, f, h: plain(u, f)
                self._cycle_rnorm = lambda u, f, h: rnorm(u, f)
        elif sweep_dt is not None:
            # mixed-precision iterative refinement: the V-cycle runs
            # entirely in sweep_dtype on the error equation A e = r,
            # while the residual, correction, and stopping metric stay
            # in dtype.  bf16 sweeps halve the HBM bytes (they are
            # bandwidth-bound) and the outer loop restores full dtype
            # accuracy — the TPU-native role for bf16 here (a pure-bf16
            # solve stalls: r = f - A psi is all cancellation below
            # bf16 precision once psi is a few digits converged).
            inner_cycle = make_cycle(spec.with_(dtype=spec.sweep_dtype),
                                     constrain=constrain, rnorm=False)
            acc = (jnp.float32 if self._dtype == jnp.dtype("bfloat16")
                   else self._dtype)

            def step(psi, f, r0):
                """One refinement step.  With stop='residual' the
                reported err is ||r|| of the INCOMING iterate (the
                residual is in hand before the correction; recomputing
                it after would cost a second full-grid pass), so the
                stop fires one cycle late and the returned iterate is
                one correction better than tol."""
                if constrain is not None:
                    psi, f = constrain(psi), constrain(f)
                r = xla_ops.residual(psi, f, h, "ghost0")
                # e0 = 0, NOT the reference's psi0=-f convention: for
                # the error equation one V-cycle from zero contracts
                # ||e_true|| by the MG factor, while -r starts ~4/h^2
                # too large and the outer loop would amplify it
                e = inner_cycle(jnp.zeros_like(r, sweep_dt),
                                r.astype(sweep_dt), h)
                psi_new = psi + e.astype(psi.dtype)
                if spec.stop == "residual":
                    ra = r.astype(acc)
                    rn = jnp.sqrt(jnp.sum(ra * ra))
                    err = rn.astype(r0.dtype) / r0
                else:
                    err = xla_ops.rms_update(psi_new, psi)
                return psi_new, err
        else:
            want_rnorm = spec.stop == "residual"
            # Packed-persistent fine level (mgpoisson.cycle.packed):
            # psi/f stay checkerboard-packed in HBM across the whole
            # solve loop, so the rbgs sweep runs its 2.5x-cheaper
            # packed form with NO per-call pack/unpack.  The jitted
            # no-callback solve loop packs at entry and unpacks at
            # exit (solve()); the public step()/callback/batched
            # surfaces keep the unpacked step below.
            from mgpoisson.cycle import packed as packed_mod
            self._packed = packed_mod.supported(spec)
            if self._packed:
                pcycle = packed_mod.make_packed_cycle(spec,
                                                      rnorm=want_rnorm)
                if want_rnorm and spec.stop_check == "adaptive":
                    self._cycle_plain = packed_mod.make_packed_cycle(
                        spec, rnorm=False)
                    self._cycle_rnorm = pcycle
                    self._loop_residual_norm = \
                        packed_mod.residual_norm_packed

                def loop_step(psi, f, r0):
                    if want_rnorm:
                        psi_new, r2 = pcycle(psi, f, h)
                        err = jnp.sqrt(r2).astype(r0.dtype) / r0
                    else:
                        psi_new = pcycle(psi, f, h)
                        # update-RMS is permutation-invariant, so the
                        # packed difference gives the exact metric
                        err = xla_ops.rms_update(psi_new, psi)
                    return psi_new, err

                self._loop_step = loop_step
            cycle = make_cycle(spec, constrain=constrain, rnorm=want_rnorm)
            if (want_rnorm and spec.stop_check == "adaptive"
                    and not self._packed):
                # adaptive stopping needs the metric-free cycle too:
                # far from tol the loop runs this one and predicts
                # ||r|| instead of measuring it (see _adaptive_loop)
                self._cycle_plain = make_cycle(spec, constrain=constrain,
                                               rnorm=False)
                self._cycle_rnorm = cycle

            def step(psi, f, r0):
                """One V-cycle; err per spec.stop ('update': RMS of the
                iterate update, `cpu.lua:203`; 'residual': ||r||/||r0||,
                with ||r|| fused into the cycle's fine up-leg kernel —
                no separate full-grid residual pass (free residual
                stopping)."""
                if constrain is not None:
                    psi, f = constrain(psi), constrain(f)
                if want_rnorm:
                    psi_new, r2 = cycle(psi, f, h)
                    err = jnp.sqrt(r2).astype(r0.dtype) / r0
                else:
                    psi_new = cycle(psi, f, h)
                    err = xla_ops.rms_update(psi_new, psi)
                return psi_new, err

        # err history dtype: match solve precision (f32 floor otherwise)
        self._err_dtype = (jnp.float32 if self._dtype == jnp.dtype("bfloat16")
                           else self._dtype)
        self._step_fn = step  # unjitted, for embedding in larger programs
        self._step = jax.jit(step)
        self._solve_loop = jax.jit(
            self._build_solve_loop(self._loop_step or step),
            donate_argnums=(0,))
        self._solve_batched_loops = {}  # built lazily by solve_batched
        self._fmg = None            # built lazily by init_state

    # ------------------------------------------------------------ state

    def rhs(self) -> jax.Array:
        """Default point-charge RHS (`cpu.lua:182-190`)."""
        return point_charge_rhs(self.spec.size, self.spec.ndim, self._dtype)

    def init_state(self, f: Optional[jax.Array] = None) -> jax.Array:
        """psi0 = -f (`cpu.lua:193`); with spec.cycle='fmg', a full
        multigrid pass supplies the initial iterate instead (reaches
        discretization accuracy in one O(N) sweep, then the V-cycle
        loop polishes)."""
        f = self.rhs() if f is None else f
        if self.spec.cycle == "fmg":
            if self._fmg is None:
                if self.mesh is not None and self.partition == "spmd":
                    from mgpoisson.shard.spmd import build_spmd_fmg
                    self._fmg = jax.jit(build_spmd_fmg(self.spec, self.mesh))
                else:
                    from mgpoisson.cycle.vcycle import fmg
                    self._fmg = jax.jit(
                        lambda f: fmg(f, self.spec.fine_h, self.spec,
                                      constrain=self._constrain))
            return self._fmg(f)
        return initial_guess(f)

    # ------------------------------------------------------------- step

    def step(self, psi, f):
        """One V-cycle + error (`cpu.lua:196-206`). Returns (psi_new, err)."""
        r0 = self._r0(psi, f)
        return self._step(psi, f, r0)

    def _r0(self, psi, f):
        if self.spec.stop == "residual":
            return xla_ops.residual_norm(psi, f, self.spec.fine_h)
        return jnp.asarray(1.0, self._dtype)

    def residual_norm(self, psi, f):
        return xla_ops.residual_norm(psi, f, self.spec.fine_h)

    def rel_err(self, psi, psi_old):
        """The reference's secondary masked relative-change metric
        (calcRelErr, `gpu.lua:173-187`)."""
        return xla_ops.rel_err(psi, psi_old)

    # ------------------------------------------------------------ solve

    # Adaptive stop_check tuning: measure the exact residual once the
    # predicted relres is within SAFETY of tol (2 cycles early at the
    # tuned scheme's rho~0.08), and at least every MAX_SKIP cycles
    # (bounds both a mis-learned rho and NaN-detection latency).
    ADAPTIVE_SAFETY = 100.0
    ADAPTIVE_MAX_SKIP = 4

    def _build_adaptive_loop(self):
        """Solve loop for stop_check='adaptive': most cycles run the
        metric-free kernel; the exact fused-||r|| cycle runs only when
        a learned per-cycle contraction model predicts the residual is
        near tol (or every ADAPTIVE_MAX_SKIP cycles).  Stopping uses
        only measured values — identical converged answers, ~2-3x less
        amortized metric overhead than stop_check='every'.

        The reference re-reads the whole error buffer to the host every
        cycle (`gpu.lua:361-369`); this is the opposite end point: not
        only is the metric on-device and fused, far from convergence it
        is not computed at all."""
        spec = self.spec
        h = spec.fine_h
        constrain = self._constrain
        cycle_plain, cycle_rnorm = self._cycle_plain, self._cycle_rnorm
        rdt = self._err_dtype
        safety = jnp.asarray(self.ADAPTIVE_SAFETY * spec.tol, rdt)
        max_skip = jnp.int32(self.ADAPTIVE_MAX_SKIP)

        def solve_loop(psi, f, r0):
            maxiter = spec.maxiter
            errs0 = jnp.full((maxiter,), jnp.nan, dtype=rdt)

            def cond(carry):
                psi, it, meas_err, meas_it, rho, errs, nmeas = carry
                return (it < maxiter) & (
                    (it == 0) | ((meas_err >= spec.tol)
                                 & jnp.isfinite(meas_err)))

            def body(carry):
                psi, it, meas_err, meas_it, rho, errs, nmeas = carry
                gap = it + 1 - meas_it            # cycles since measure
                pred = meas_err * rho ** gap.astype(rdt)
                # it==0: always measure — seeds the contraction model
                # with real data, and an FMG-initialized iterate may
                # already be at tol after one polish cycle
                check = (pred < safety) | (gap >= max_skip) | (it == 0)
                psi_c = psi if constrain is None else constrain(psi)
                f_c = f if constrain is None else constrain(f)

                def measured(psi_c):
                    psi_new, r2 = cycle_rnorm(psi_c, f_c, h)
                    return psi_new, (jnp.sqrt(r2) / r0).astype(rdt)

                def skipped(psi_c):
                    return cycle_plain(psi_c, f_c, h), pred

                psi, err = jax.lax.cond(check, measured, skipped, psi_c)
                errs = errs.at[it].set(err)
                # on measure: learn rho from the observed contraction
                # over the gap (clamped: never trust an estimate enough
                # to skip forever or to predict below fp noise)
                rho_obs = jnp.power(
                    jnp.maximum(err / jnp.maximum(meas_err, 1e-300), 1e-30),
                    1.0 / gap.astype(rdt))
                rho = jnp.where(check,
                                jnp.clip(rho_obs, 0.02, 0.95), rho)
                meas_err = jnp.where(check, err, meas_err)
                meas_it = jnp.where(check, it + 1, meas_it)
                nmeas = nmeas + check.astype(jnp.int32)
                return psi, it + 1, meas_err, meas_it, rho, errs, nmeas

            # relres of the initial guess is 1 by normalization, so the
            # model starts from (meas_err=1 at meas_it=0) with an
            # optimistic rho: optimism costs early measurements (cheap),
            # pessimism would cost overshoot cycles
            init = (psi, jnp.int32(0), jnp.asarray(1.0, rdt),
                    jnp.int32(0), jnp.asarray(0.05, rdt), errs0,
                    jnp.int32(0))
            psi, it, meas_err, meas_it, _, errs, nmeas = jax.lax.while_loop(
                cond, body, init)

            # if the loop exited at maxiter on a SKIPPED cycle, the last
            # measurement is up to ADAPTIVE_MAX_SKIP-1 cycles stale —
            # converged/final_err would then describe an older iterate
            # than the returned psi.  Measure the final iterate exactly
            # (metric only, no extra cycle).
            def _remeasure(_):
                psi_c = psi if constrain is None else constrain(psi)
                f_c = f if constrain is None else constrain(f)
                return (self._loop_residual_norm(psi_c, f_c, h)
                        / r0).astype(rdt)

            stale = meas_it != it
            err_fin = jax.lax.cond(stale, _remeasure,
                                   lambda _: meas_err, 0)
            errs = errs.at[it - 1].set(err_fin)
            nmeas = nmeas + stale.astype(jnp.int32)
            return psi, it, err_fin.astype(self._dtype), errs, nmeas

        return solve_loop

    def _build_solve_loop(self, step):
        if self._cycle_plain is not None:
            return self._build_adaptive_loop()
        spec = self.spec

        def solve_loop(psi, f, r0):
            maxiter = spec.maxiter
            errs0 = jnp.full((maxiter,), jnp.nan, dtype=self._err_dtype)

            def cond(carry):
                psi, it, err, errs = carry
                return (it < maxiter) & (
                    (it == 0) | ((err >= spec.tol) & jnp.isfinite(err))
                )

            def body(carry):
                psi, it, err, errs = carry
                psi, err = step(psi, f, r0)
                errs = errs.at[it].set(err.astype(self._err_dtype))
                return psi, it + 1, err, errs

            init = (psi, jnp.int32(0), jnp.asarray(jnp.inf, self._dtype),
                    errs0)
            psi, it, err, errs = jax.lax.while_loop(cond, body, init)
            return psi, it, err, errs, it   # every cycle measures

        return solve_loop

    def solve(self, f: Optional[jax.Array] = None, *,
              psi0: Optional[jax.Array] = None,
              error_callback: Optional[Callable[[int, float], Optional[bool]]]
              = None) -> SolveResult:
        """Iterate V-cycles until the stopping metric drops below tol,
        goes non-finite, or maxiter cycles run (`cpu.lua:208-216`).

        error_callback(iter, err) is invoked after every cycle (1-based
        iter, like the reference, `cpu.lua:213`); returning a truthy
        value stops the solve — the observability hook both reference
        harnesses consume (`test/converge-multigrid-vs-krylov.lua:23-27`).
        A 3-parameter callback additionally receives the live iterate:
        error_callback(iter, err, psi) — the reference's hook closes
        over the solver and reads `mg.psi` per iteration to record
        its L-inf norm (`converge-multigrid-vs-krylov.lua:23-27`); here
        the iterate is passed explicitly (functional style, no
        aliasing), still synced to host once per cycle.
        """
        f = self.rhs() if f is None else jnp.asarray(f, self._dtype)
        if psi0 is None:
            psi = self.init_state(f)
            # relative-residual baseline: the REFERENCE initial guess
            # (psi = -f, `cpu.lua:193`), not the FMG-initialized
            # iterate — FMG is part of the solve, and its output's
            # residual is already so small that normalizing by it
            # would make tol*r0 unreachable (the solve would spin to
            # maxiter without converging).  For cycle='v' psi IS that
            # guess already; only FMG needs the separate baseline
            r0 = self._r0(psi if self.spec.cycle != "fmg"
                          else initial_guess(f), f)
        else:
            # copy: the jitted solve loop donates its psi argument, and
            # donating a caller-owned array would silently delete it
            # (breaking a second solve() with the same psi0)
            psi = jnp.array(psi0, self._dtype, copy=True)
            r0 = self._r0(psi, f)

        if error_callback is None:
            if self._packed:
                # pack once per solve (exact MXU selection matmuls);
                # the loop carries packed state end to end
                from mgpoisson.cycle import packed as packed_mod
                if self._pack_fns is None:
                    self._pack_fns = (jax.jit(packed_mod.pack),
                                      jax.jit(packed_mod.unpack))
                _pack, _unpack = self._pack_fns
                psi, f = _pack(psi), _pack(f)
            psi, it, err, errs, nmeas = self._solve_loop(psi, f, r0)
            if self._packed:
                psi = _unpack(psi)
            it = int(it)
            err_f = float(err)
            converged = err_f < self.spec.tol and math.isfinite(err_f)
            return SolveResult(psi=psi, iterations=it, errs=errs[:it],
                               converged=converged, final_err=err_f,
                               n_metric_evals=int(nmeas))

        # Host-loop path: per-cycle device->host sync, exactly the
        # reference's control flow (`cpu.lua:211-215`).
        return self._solve_host_loop(psi, f, r0, error_callback)

    def solve_batched(self, fs, *, cycles: Optional[int] = None):
        """Solve a batch of right-hand sides with one compiled program
        (a serving-style API the reference's imperative buffers could
        not express): vmapped V-cycles on the XLA path; on the Pallas
        path the per-element cycles run inside one fori/while loop
        with a TUPLE carry (see _batched_loop for why).

        fs: (batch, *spec.shape).  cycles: V-cycles to run (default:
        iterate until the worst per-element stopping metric is below
        spec.tol, up to spec.maxiter).  Returns (psis, errs) with errs
        of shape (batch,) holding each element's final metric.
        """
        fs = jnp.asarray(fs, self._dtype)
        psis = initial_guess(fs)
        if self.spec.stop == "residual":
            r0s = jax.vmap(lambda p, f: xla_ops.residual_norm(
                p, f, self.spec.fine_h))(psis, fs)
        else:
            r0s = jnp.ones((fs.shape[0],), self._dtype)
        key = cycles
        if key not in self._solve_batched_loops:
            self._solve_batched_loops[key] = jax.jit(
                self._batched_loop(cycles), donate_argnums=(0,))
        psis, errs = self._solve_batched_loops[key](psis, fs, r0s)
        return psis, errs

    def _batched_loop(self, cycles: Optional[int]):
        """Build the device-side batched loop: a fixed-trip fori_loop
        (`cycles` given) or a lax.while_loop on the worst per-element
        metric (until-converged, up to spec.maxiter) — either way no
        per-cycle device->host readback (the sync the reference pays
        every cycle, `gpu.lua:362`).

        Batch rule: jax.vmap of the step where legal (the XLA ops).
        The manual-DMA (ANY-memory-space) pallas_calls have no vmap
        batching rule (Mosaic rejects the batched grid's index_map),
        and every formulation that slices a stacked batch near the
        custom calls — lax.map, a trace-unrolled loop over psis[i],
        with or without optimization_barrier — crashes XLA's TPU
        fusion pass at batch >= ~4 ('Check failed:
        fused_root->IsFusible()' on a slice_bitcast_fusion feeding the
        custom-call chain).  What compiles and runs: carry a TUPLE of
        per-element arrays, so the only batch slices sit at the jit
        boundary feeding the loop init, never adjacent to a kernel.
        At Pallas sizes each element already saturates HBM, so the
        sequential per-element execution inside the loop body costs no
        throughput; vmap exists to amortize per-launch overhead on
        SMALL grids, which resolve to the XLA ops and keep it."""
        from mgpoisson.kernels import get_ops
        spec = self.spec
        step = self._step_fn
        use_vmap = get_ops(spec, spec.size) is xla_ops
        # until-converged mode: freeze elements whose metric is already
        # below tol, so a mixed-difficulty batch does not keep smoothing
        # (and perturbing) its easy elements for the hardest one's
        # cycles.  Fixed-`cycles` mode runs every element the requested
        # count (the caller asked for exactly that trajectory).
        freeze = cycles is None

        def cond(carry):
            *_, it, errs = carry
            worst = jnp.max(errs)
            return (it < spec.maxiter) & (
                (it == 0) | ((worst >= spec.tol) & jnp.isfinite(worst)))

        def run(body, init):
            if cycles is not None:
                return jax.lax.fori_loop(
                    0, cycles, lambda _, c: body(c), init)
            return jax.lax.while_loop(cond, body, init)

        if use_vmap:
            vstep = jax.vmap(step)

            def batched_loop(psis, fs, r0s):
                errs0 = jnp.full((psis.shape[0],), jnp.inf, psis.dtype)

                def body(carry):
                    psis, it, errs = carry
                    new_psis, new_errs = vstep(psis, fs, r0s)
                    if freeze:
                        done = (it > 0) & (errs < spec.tol)
                        keep = done.reshape(
                            done.shape + (1,) * (psis.ndim - 1))
                        new_psis = jnp.where(keep, psis, new_psis)
                        new_errs = jnp.where(done, errs, new_errs)
                    return new_psis, it + 1, new_errs

                psis, _, errs = run(body, (psis, jnp.int32(0), errs0))
                return psis, errs

            return batched_loop

        def batched_loop(psis, fs, r0s):
            B = psis.shape[0]
            errs0 = jnp.full((B,), jnp.inf, psis.dtype)
            fs_t = tuple(fs[i] for i in range(B))
            r0_t = tuple(r0s[i] for i in range(B))

            def body(carry):
                psis_t, it, errs = carry
                outs = []
                for k, (p, f, r) in enumerate(zip(psis_t, fs_t, r0_t)):
                    if freeze:
                        # lax.cond actually SKIPS the V-cycle for a
                        # converged element at runtime (per-element
                        # arrays, not a vmapped select) — the compute
                        # saving, not just bit-stability
                        outs.append(jax.lax.cond(
                            (it > 0) & (errs[k] < spec.tol),
                            lambda p, f, r, _e=errs[k]: (p, _e),
                            step, p, f, r))
                    else:
                        outs.append(step(p, f, r))
                return (tuple(o[0] for o in outs), it + 1,
                        jnp.stack([o[1] for o in outs]))

            psis_t, _, errs = run(
                body, (tuple(psis[i] for i in range(B)), jnp.int32(0),
                       errs0))
            return jnp.stack(psis_t), errs

        return batched_loop

    def _solve_host_loop(self, psi, f, r0, error_callback):
        # a 3-parameter callback also receives the live iterate (the
        # reference hook reads mg.psi, `converge-…lua:23-27`).  Only
        # parameters WITHOUT defaults count toward the arity: a 2-arg
        # callback with an extra keyword default (cb(it, err,
        # verbose=False)) must not be handed the full psi array.  The
        # corollary: to receive psi, declare it REQUIRED —
        # cb(it, err, psi), not cb(it, err, psi=None)
        try:
            params = inspect.signature(error_callback).parameters.values()
            n_params = sum(
                1 for p in params
                if p.default is inspect.Parameter.empty
                and p.kind in (inspect.Parameter.POSITIONAL_ONLY,
                               inspect.Parameter.POSITIONAL_OR_KEYWORD))
        except (TypeError, ValueError):
            n_params = 2
        wants_psi = n_params >= 3
        errs_list = []
        converged = False
        it = 0
        for it in range(1, self.spec.maxiter + 1):
            psi, err = self._step(psi, f, r0)
            err_f = float(err)
            errs_list.append(err_f)
            stop = (error_callback(it, err_f, psi) if wants_psi
                    else error_callback(it, err_f))
            if stop:
                break
            if err_f < self.spec.tol or not math.isfinite(err_f):
                converged = err_f < self.spec.tol
                break
        return SolveResult(psi=psi, iterations=it,
                           errs=jnp.asarray(errs_list, self._err_dtype),
                           converged=converged,
                           final_err=errs_list[-1] if errs_list else float("inf"))
