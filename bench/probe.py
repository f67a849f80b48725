"""Artifact-proof device timing: K-chained-program slope with a value fetch.

Round-1 postmortem: through this image's axon relay `block_until_ready` can
return before the program has actually executed, which inflated recorded
throughput by 3-4 orders of magnitude.  The only trustworthy clock is one
that observes a VALUE the device must have computed:

    t(K) = wall time to dispatch K data-dependent programs and then fetch
           (np.asarray) a scalar output of the LAST one.
    per-program time = (min t(K_hi) - min t(K_lo)) / (K_hi - K_lo)

The slope cancels the fixed fetch/round-trip cost; chaining program i's
input to program i-1's output forbids skipping work.  One jitted executable
per process (the relay degrades ~1000x once a second executable loads), so
the orchestrator runs every phase in its own subprocess, sequentially.

Usage:
    python bench/probe.py suite            # run the standard phase set
    python bench/probe.py suite --ablate   # + full-step ablation matrix
    python bench/probe.py worker '<json>'  # internal: one phase, one process
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_POINTS = 1 << 20
LENGTH = 1000


def slope_time(run, k_lo=2, k_hi=12, trials=3, breakdown=None):
    """run(K) -> elapsed seconds for K chained programs + value fetch."""
    t0 = time.perf_counter()
    run(1)          # compile
    if breakdown is not None:
        breakdown["compile_s"] = round(time.perf_counter() - t0, 1)
    run(1)          # warm
    t_lo = min(run(k_lo) for _ in range(trials))
    t_hi = min(run(k_hi) for _ in range(trials))
    return (t_hi - t_lo) / (k_hi - k_lo), t_lo, t_hi


def _fetch(x):
    import numpy as np

    return float(np.asarray(x))


# --------------------------------------------------------------------------
# phase implementations (each builds ONE jitted program)


def phase_nop(spec):
    import jax
    import jax.numpy as jnp

    f = jax.jit(lambda c: (c + 1.0, c * 0.5))
    c0 = jax.device_put(jnp.float32(0.0))

    def run(K):
        c = c0
        t0 = time.perf_counter()
        for _ in range(K):
            c, s = f(c)
        _fetch(s)
        return time.perf_counter() - t0

    ms, lo, hi = slope_time(run, k_lo=4, k_hi=64, trials=3)
    return {"per_program_ms": ms * 1e3}


def phase_matmul(spec):
    """Control: known-FLOPs matmul; verifies chip + relay health."""
    import jax
    import jax.numpy as jnp

    d = spec.get("dim", 8192)
    reps = 4  # matmuls per program

    def f(y, w):
        for _ in range(reps):
            y = y @ w
            y = y * jax.lax.rsqrt(jnp.mean(y * y) + 1e-9)
        return y, jnp.sum(y[0])

    f = jax.jit(f)
    key = jax.random.PRNGKey(0)
    y0 = jax.device_put(jax.random.normal(key, (d, d), jnp.float32))
    w = jax.device_put(jax.random.normal(jax.random.PRNGKey(1), (d, d),
                                         jnp.float32) / (d ** 0.5))

    def run(K):
        y = y0
        t0 = time.perf_counter()
        for _ in range(K):
            y, s = f(y, w)
        _fetch(s)
        return time.perf_counter() - t0

    ms, lo, hi = slope_time(run, k_lo=2, k_hi=10)
    flops = 2.0 * d * d * d * reps
    return {"per_program_ms": ms * 1e3,
            "tflops": flops / (ms * 1e12) if ms > 0 else float("inf")}


def _lcg_ids(nseg):
    import jax.numpy as jnp

    def nxt(ids):
        raw = ids * 1664525 + 1013904223          # i32 wraparound LCG
        return jnp.mod(jnp.abs(raw), nseg)
    return nxt


def phase_scatter(spec):
    """One XLA segment op (sum/min/max), 1M updates -> 1M segments."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    n = spec.get("n", N_POINTS)
    nseg = spec.get("nseg", LENGTH * LENGTH)
    kind = spec.get("kind", "sum")
    cols = spec.get("cols", 1)

    op = {"sum": jax.ops.segment_sum, "min": jax.ops.segment_min,
          "max": jax.ops.segment_max}[kind]

    def f(vals, ids):
        v = vals if cols == 1 else jnp.broadcast_to(vals[:, None],
                                                    (n, cols))
        out = op(v, ids, nseg)
        out0 = out if cols == 1 else out[:, 0]
        vals2 = vals + out0[0] * 1e-20      # data dependency, negligible work
        return vals2, jnp.sum(out0[:8])

    f = jax.jit(f)
    rng = np.random.default_rng(0)
    ids = jax.device_put(jnp.asarray(rng.integers(0, nseg, n), jnp.int32))
    v0 = jax.device_put(jnp.asarray(rng.random(n), jnp.float32))

    def run(K):
        v = v0
        t0 = time.perf_counter()
        for _ in range(K):
            v, s = f(v, ids)
        _fetch(s)
        return time.perf_counter() - t0

    ms, lo, hi = slope_time(run)
    return {"per_program_ms": ms * 1e3}


def phase_gather(spec):
    """1M gathers from a 1M table (the fuse per-point cidx lookups)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    n = spec.get("n", N_POINTS)
    nseg = spec.get("nseg", LENGTH * LENGTH)

    def f(table, ids):
        g = table[ids]
        table2 = table + jnp.sum(g[:4]) * 1e-20
        return table2, jnp.sum(g[:8])

    f = jax.jit(f)
    rng = np.random.default_rng(0)
    ids = jax.device_put(jnp.asarray(rng.integers(0, nseg, n), jnp.int32))
    t0_ = jax.device_put(jnp.asarray(rng.random(nseg), jnp.float32))

    def run(K):
        t = t0_
        t0 = time.perf_counter()
        for _ in range(K):
            t, s = f(t, ids)
        _fetch(s)
        return time.perf_counter() - t0

    ms, lo, hi = slope_time(run)
    return {"per_program_ms": ms * 1e3}


def phase_sort(spec):
    """XLA sort of n keys (+ optional payload columns via argsort+gather)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    n = spec.get("n", N_POINTS)
    nseg = spec.get("nseg", LENGTH * LENGTH)
    cols = spec.get("cols", 0)
    nxt = _lcg_ids(nseg)

    if cols == 0:
        def f(ids):
            s = jnp.sort(ids)
            return nxt(ids + s[0] * 0), jnp.sum(s[:4]).astype(jnp.float32)
    else:
        def f(ids):
            vals = jnp.broadcast_to(
                ids.astype(jnp.float32)[None, :], (cols, n))
            order = jnp.argsort(ids)
            ids_s = ids[order]
            vals_s = vals[:, order]
            return (nxt(ids + ids_s[0] * 0),
                    jnp.sum(vals_s[:, 0]) + ids_s[0])

    f = jax.jit(f)
    rng = np.random.default_rng(0)
    ids0 = jax.device_put(jnp.asarray(rng.integers(0, nseg, n), jnp.int32))

    def run(K):
        ids = ids0
        t0 = time.perf_counter()
        for _ in range(K):
            ids, s = f(ids)
        _fetch(s)
        return time.perf_counter() - t0

    ms, lo, hi = slope_time(run)
    return {"per_program_ms": ms * 1e3}


def phase_sort_lax(spec):
    """lax.sort with k co-sorted operands (and optional multi-key)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    n = spec.get("n", N_POINTS)
    nseg = spec.get("nseg", LENGTH * LENGTH)
    cols = spec.get("cols", 5)
    num_keys = spec.get("num_keys", 1)
    nxt = _lcg_ids(nseg)

    def f(ids, vals):
        ops = jax.lax.sort([ids] + [vals + float(i) for i in range(cols)],
                           num_keys=num_keys)
        return (nxt(ids + ops[0][0] * 0), vals + ops[1][0] * 1e-20,
                jnp.sum(ops[1][:4]))

    f = jax.jit(f)
    rng = np.random.default_rng(0)
    ids0 = jax.device_put(jnp.asarray(rng.integers(0, nseg, n), jnp.int32))
    v0 = jax.device_put(jnp.asarray(rng.random(n), jnp.float32))

    def run(K):
        ids, v = ids0, v0
        t0 = time.perf_counter()
        for _ in range(K):
            ids, v, s = f(ids, v)
        _fetch(s)
        return time.perf_counter() - t0

    ms, lo, hi = slope_time(run)
    return {"per_program_ms": ms * 1e3}


def phase_gather_sorted(spec):
    """Gather with monotone non-decreasing indices (indices_are_sorted)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    n = spec.get("n", N_POINTS)
    nseg = spec.get("nseg", LENGTH * LENGTH)
    static = spec.get("static", False)
    rng = np.random.default_rng(0)
    idx_np = np.sort(rng.integers(0, nseg, n)).astype(np.int32)

    if static:
        idx_const = jnp.asarray(idx_np)          # baked into the program

        def f(table):
            g = table.at[idx_const].get(indices_are_sorted=True)
            return table + jnp.sum(g[:4]) * 1e-20, jnp.sum(g[:8])
    else:
        def f(table, idx):
            g = table.at[idx].get(indices_are_sorted=True)
            return table + jnp.sum(g[:4]) * 1e-20, jnp.sum(g[:8])

    f = jax.jit(f)
    t0_ = jax.device_put(jnp.asarray(rng.random(nseg), jnp.float32))
    idx_dev = jax.device_put(jnp.asarray(idx_np))

    def run(K):
        t = t0_
        t0 = time.perf_counter()
        for _ in range(K):
            if static:
                t, s = f(t)
            else:
                t, s = f(t, idx_dev)
        _fetch(s)
        return time.perf_counter() - t0

    ms, lo, hi = slope_time(run)
    return {"per_program_ms": ms * 1e3}


def phase_scatter_sorted(spec):
    """Scatter-set with sorted UNIQUE indices (the run-end -> dense write)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    n = spec.get("n", N_POINTS)
    nseg = spec.get("nseg", LENGTH * LENGTH)
    rng = np.random.default_rng(0)
    # ~n/2 unique sorted targets padded with an out-of-range drop lane
    uniq = np.unique(rng.integers(0, nseg, n)).astype(np.int32)
    idx_np = np.full(n, nseg + 1, np.int32)
    idx_np[:len(uniq)] = uniq

    def f(out, vals, idx):
        out2 = out.at[idx].set(vals, mode="drop", unique_indices=True,
                               indices_are_sorted=True)
        return out2, vals + out2[0] * 1e-20, jnp.sum(out2[:8])

    f = jax.jit(f)
    out0 = jax.device_put(jnp.zeros(nseg, jnp.float32))
    v0 = jax.device_put(jnp.asarray(rng.random(n), jnp.float32))
    idx_dev = jax.device_put(jnp.asarray(idx_np))

    def run(K):
        out, v = out0, v0
        t0 = time.perf_counter()
        for _ in range(K):
            out, v, s = f(out, v, idx_dev)
        _fetch(s)
        return time.perf_counter() - t0

    ms, lo, hi = slope_time(run)
    return {"per_program_ms": ms * 1e3}


def phase_scan_seg(spec):
    """Segmented cumulative max via associative_scan (carry trick)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    n = spec.get("n", N_POINTS)

    def f(v, flags):
        def op(a, b):
            av, am = a
            bv, bm = b
            return jnp.where(bm, bv, jnp.maximum(av, bv)), am | bm
        out, _ = jax.lax.associative_scan(op, (v, flags))
        return v + out[0] * 1e-20, jnp.sum(out[:8])

    f = jax.jit(f)
    rng = np.random.default_rng(0)
    v0 = jax.device_put(jnp.asarray(rng.random(n), jnp.float32))
    flags = jax.device_put(jnp.asarray(rng.random(n) < 0.5))

    def run(K):
        v = v0
        t0 = time.perf_counter()
        for _ in range(K):
            v, s = f(v, flags)
        _fetch(s)
        return time.perf_counter() - t0

    ms, lo, hi = slope_time(run)
    return {"per_program_ms": ms * 1e3}


def phase_cumsum(spec):
    import jax
    import jax.numpy as jnp
    import numpy as np

    n = spec.get("n", N_POINTS)

    def f(v):
        c = jnp.cumsum(v)
        return v + c[0] * 1e-20, c[-1]

    f = jax.jit(f)
    v0 = jax.device_put(jnp.asarray(
        np.random.default_rng(0).random(n), jnp.float32))

    def run(K):
        v = v0
        t0 = time.perf_counter()
        for _ in range(K):
            v, s = f(v)
        _fetch(s)
        return time.perf_counter() - t0

    ms, lo, hi = slope_time(run)
    return {"per_program_ms": ms * 1e3}


def phase_raytrace(spec):
    """raytrace_cleanup alone, K-chained through the elevation plane."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from gem_tpu.config import MapConfig
    from gem_tpu.core.state import init_map_state
    from gem_tpu.kernels.raytrace import raytrace_cleanup

    L = spec.get("length", LENGTH)
    cfg = MapConfig(length=L, resolution=0.1,
                    raytrace_far_pool=spec.get("far_pool", 0))
    rng = np.random.default_rng(0)
    st = init_map_state(cfg)
    st = st.replace(
        elevation=jnp.asarray(rng.normal(0, 0.5, (L, L)), jnp.float32),
        variance=jnp.full((L, L), 1e-3),
        lowest=jnp.asarray(rng.normal(0, 0.5, (L, L)), jnp.float32),
        sensor_z=jnp.float32(1.0))
    traver = jax.device_put(jnp.asarray(
        rng.uniform(0, 1, (L, L)), jnp.float32))
    low0 = st.lowest

    def f(elev, low):
        s = st.replace(elevation=elev, lowest=low)
        out = raytrace_cleanup(s, cfg, traver)
        # keep each iteration's work real: restore a lowest plane that
        # depends on the previous output
        return out.elevation, low0 + out.elevation[:1, :1] * 1e-20

    f = jax.jit(f)
    e0 = jax.device_put(st.elevation)

    def run(K):
        e, lw = e0, low0
        t0 = time.perf_counter()
        for _ in range(K):
            e, lw = f(e, lw)
        _fetch(e[0, 0])
        return time.perf_counter() - t0

    ms, lo, hi = slope_time(run, k_lo=4, k_hi=24)
    return {"per_program_ms": ms * 1e3}


def phase_fusekernel(spec):
    """fuse_stream alone (sort + pack + pallas + posterior), K-chained
    through the elevation plane.  A pallas_call's interior lowers the same
    in isolation as inside the step (it is opaque to XLA fusion), so this
    is a trustworthy fast probe for kernel-internal work — full-step
    ablation differences remain the ground truth for XLA-glue phases."""
    import functools

    import jax
    import jax.numpy as jnp

    from gem_tpu.kernels.fuse_stream import fuse_stream
    from gem_tpu.kernels.pointproc import process_points
    from gem_tpu.mapping.pipeline import step as _  # noqa: F401 (imports)
    from gem_tpu.sensors.models import jacobian_ingredients

    cfg, state, frames = _make_step_inputs(spec)
    frame = frames[0]
    sensor_jac, c_sb_t, p_bm_t, b_skew = jacobian_ingredients(
        frame.r_map_base, frame.r_base_sensor, frame.t_base_sensor)

    @jax.jit
    def f(map_state):
        batch, _ = process_points(
            map_state, cfg, frame.points, frame.intensity, frame.valid,
            frame.transform, frame.t_map_base[2], sensor_jac,
            frame.pose_cov[3:, 3:], c_sb_t, p_bm_t, b_skew,
            colors=frame.colors, compute_lowest=False)
        out = fuse_stream(map_state, cfg, batch,
                          with_lowest=spec.get("lowest", True),
                          with_color=spec.get("color", True),
                          interpret=bool(spec.get("interpret")))
        return out

    ms0 = state.map

    def run(K):
        s = ms0
        t0 = time.perf_counter()
        for _ in range(K):
            s = f(s)
        _fetch(s.elevation[0, 0])
        return time.perf_counter() - t0

    ms, lo, hi = slope_time(run, k_lo=spec.get("k_lo", 2),
                            k_hi=spec.get("k_hi", 12),
                            trials=spec.get("trials", 3))
    return {"per_program_ms": ms * 1e3, "t_lo_s": lo, "t_hi_s": hi}


def _make_step_inputs(spec):
    import jax

    from gem_tpu.config import benchmark_config
    from gem_tpu.io.replay import synthetic_frames
    from gem_tpu.mapping.pipeline import init_pipeline_state

    length = spec.get("length", LENGTH)
    n_points = spec.get("points", N_POINTS)
    cfg = benchmark_config(length=length, max_points=n_points)
    if spec.get("far_pool") or spec.get("max_shift"):
        import dataclasses as _dc

        mkw = {}
        if spec.get("far_pool"):
            mkw["raytrace_far_pool"] = spec["far_pool"]
        if spec.get("max_shift"):
            mkw["max_shift_cells"] = spec["max_shift"]
        cfg = cfg.replace(map=_dc.replace(cfg.map, **mkw))
    if spec.get("staging") is not None:
        import dataclasses as _dc

        cfg = cfg.replace(submap=_dc.replace(
            cfg.submap, staging_frames=spec["staging"]))
    cfg = cfg.replace(
        enable_features=spec.get("features", True),
        enable_raytrace=spec.get("raytrace", True),
        enable_submaps=spec.get("submaps", True),
        enable_lowest=spec.get("lowest", True),
        enable_color=spec.get("color", True),
        raytrace_every=spec.get("raytrace_every", 1),
    )
    frames = []
    rng = None
    for frame, _, _ in synthetic_frames(cfg, spec.get("n_frames", 8),
                                        n_points=n_points, speed=0.4, seed=0,
                                        max_range=length * 0.05):
        if spec.get("colored"):
            # synthetic_frames yields colors=0, which makes "camera path
            # on" rows exercise only the color MACHINERY (the kernels'
            # colorless-chunk skips fire on every chunk).  A real camera
            # stream colors most points; fill valid lanes with nonzero
            # rgb so colored-path phases measure the actual work.
            import dataclasses as _dc

            import numpy as _np

            rng = rng or _np.random.default_rng(7)
            packed = (rng.integers(1, 256, n_points) * 65536
                      + rng.integers(1, 256, n_points) * 256
                      + rng.integers(1, 256, n_points)).astype(_np.int32)
            col = _np.zeros(frame.colors.shape, _np.int32)
            col[:n_points] = packed
            frame = _dc.replace(frame, colors=col)
        frames.append(jax.device_put(frame))
    state = jax.device_put(init_pipeline_state(cfg))
    return cfg, state, frames


def phase_step(spec):
    """Full per-frame pipeline step with ablation knobs."""
    import functools

    import jax

    from gem_tpu.mapping.pipeline import step

    t_setup0 = time.perf_counter()
    cfg, state, frames = _make_step_inputs(spec)
    setup_s = round(time.perf_counter() - t_setup0, 1)
    # "donate": measure with state buffers donated (production deployments
    # on a normal TPU host donate; this image's relay hangs when FETCHING
    # scalars aliased into donated buffers — metrics are fresh outputs, so
    # the fetch below stays safe.  See CLAUDE.md).
    kw = {"donate_argnums": 0} if spec.get("donate") else {}
    f = jax.jit(functools.partial(
        step, cfg=cfg, fuse_backend=spec.get("fuse", "segment"),
        feature_backend=spec.get("feature_backend", "xla")), **kw)

    def run(K):
        if spec.get("donate"):
            # donation consumes the buffers: give each trial its own copy
            # (untimed device-side clone)
            import jax.numpy as jnp
            s = jax.block_until_ready(jax.tree.map(jnp.array, state))
        else:
            s = state
        t0 = time.perf_counter()
        for i in range(K):
            s, out = f(s, frames[i % len(frames)])
        _fetch(out.metrics["points_valid"])
        return time.perf_counter() - t0

    bd = {"setup_s": setup_s}
    ms, lo, hi = slope_time(run, k_lo=spec.get("k_lo", 2),
                            k_hi=spec.get("k_hi", 12),
                            trials=spec.get("trials", 3), breakdown=bd)
    return {"per_program_ms": ms * 1e3, "t_lo_s": lo, "t_hi_s": hi, **bd}


def phase_scan(spec):
    """T frames per program via lax.scan."""
    import functools

    import jax
    import jax.numpy as jnp

    from gem_tpu.mapping.pipeline import scan_steps

    cfg, state, frames = _make_step_inputs(spec)
    T = len(frames)
    stacked = jax.device_put(jax.tree.map(lambda *xs: jnp.stack(xs), *frames))
    f = jax.jit(functools.partial(
        scan_steps, cfg=cfg, fuse_backend=spec.get("fuse", "segment"),
        feature_backend=spec.get("feature_backend", "xla")))

    def run(K):
        s = state
        t0 = time.perf_counter()
        for _ in range(K):
            s, m = f(s, stacked)
        _fetch(m["points_valid"][-1])
        return time.perf_counter() - t0

    ms, lo, hi = slope_time(run, k_lo=1, k_hi=3, trials=3)
    return {"per_program_ms": ms * 1e3, "per_frame_ms": ms * 1e3 / T,
            "frames_per_program": T}


PHASES = {
    "nop": phase_nop,
    "matmul": phase_matmul,
    "scatter": phase_scatter,
    "gather": phase_gather,
    "sort": phase_sort,
    "sort_lax": phase_sort_lax,
    "gather_sorted": phase_gather_sorted,
    "scatter_sorted": phase_scatter_sorted,
    "scan_seg": phase_scan_seg,
    "cumsum": phase_cumsum,
    "raytrace": phase_raytrace,
    "step": phase_step,
    "fusekernel": phase_fusekernel,
    "scan": phase_scan,
}


def worker(spec):
    t_imp0 = time.perf_counter()
    if spec.get("cpu"):
        import jax

        jax.config.update("jax_platforms", "cpu")
    import jax

    # Persistent compilation cache: step programs cost 100-1000 s to
    # compile through the relay; the cache makes repeat bench runs skip
    # them entirely (round-2 postmortem — bench.py must fit a ~8 min wall
    # budget).  MUST be configured via jax.config.update, NOT env vars:
    # this image's sitecustomize imports jax at interpreter startup, so
    # JAX_* env vars set by the process itself are read too late and
    # silently ignored (round-4 root cause of "entries are never
    # written"; the axon backend itself reports platform "tpu" and
    # serializes executables fine — cache hits load in <0.1 s).  Cache
    # keys include platform/topology, so sharing one dir with the tests'
    # CPU cache is safe.  GEM_AXON_CACHE=0 reverts.
    if os.environ.get("GEM_AXON_CACHE", "1") != "0":
        jax.config.update(
            "jax_compilation_cache_dir",
            os.environ.get("JAX_COMPILATION_CACHE_DIR",
                           "/tmp/gem_tpu_jax_cache"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

    spec.setdefault("device", str(jax.devices()[0]))
    import_s = round(time.perf_counter() - t_imp0, 1)
    out = PHASES[spec["phase"]](spec)
    out.setdefault("import_s", import_s)
    out.update({k: v for k, v in spec.items() if k != "device"})
    print("PROBE_RESULT " + json.dumps(out))


def suite(args):
    specs = [
        {"name": "nop", "phase": "nop"},
        {"name": "matmul_ctl", "phase": "matmul"},
        {"name": "scatter_sum", "phase": "scatter", "kind": "sum"},
        {"name": "scatter_min", "phase": "scatter", "kind": "min"},
        {"name": "scatter_sum_x2", "phase": "scatter", "kind": "sum",
         "cols": 2},
        {"name": "gather_1m", "phase": "gather"},
        {"name": "sort_1m", "phase": "sort"},
        {"name": "argsort6_1m", "phase": "sort", "cols": 6},
        {"name": "sort_lax6", "phase": "sort_lax", "cols": 5},
        {"name": "sort_lax6_2key", "phase": "sort_lax", "cols": 5,
         "num_keys": 2},
        {"name": "gather_sorted_1m", "phase": "gather_sorted"},
        {"name": "gather_static_1m", "phase": "gather_sorted",
         "static": True},
        {"name": "scatter_sorted_1m", "phase": "scatter_sorted"},
        {"name": "scan_seg_1m", "phase": "scan_seg"},
        {"name": "cumsum_1m", "phase": "cumsum"},
        {"name": "step_stream", "phase": "step", "fuse": "stream",
         "feature_backend": "pallas"},
        {"name": "step_segment", "phase": "step", "fuse": "segment"},
        {"name": "scan_stream", "phase": "scan", "fuse": "stream",
         "feature_backend": "pallas"},
    ]
    if args.ablate:
        specs += [
            {"name": "scan_segment", "phase": "scan", "fuse": "segment"},
            {"name": "step_pallas", "phase": "step", "fuse": "pallas"},
            {"name": "step_sort", "phase": "step", "fuse": "sort"},
            {"name": "step_nofuse", "phase": "step", "fuse": "none"},
            {"name": "step_nofeat", "phase": "step", "features": False},
            {"name": "step_noray", "phase": "step", "raytrace": False},
            {"name": "step_nosub", "phase": "step", "submaps": False},
            {"name": "step_nolow", "phase": "step", "lowest": False},
            {"name": "step_noscatter", "phase": "step", "fuse": "none",
             "lowest": False},
            {"name": "step_minimal", "phase": "step", "fuse": "none",
             "features": False, "raytrace": False, "submaps": False,
             "lowest": False},
        ]
    if args.only:
        names = set(args.only.split(","))
        specs = [s for s in specs if s["name"] in names]
    results = {}
    for spec in specs:
        if args.cpu:
            spec["cpu"] = True
        t0 = time.time()
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "worker",
             json.dumps(spec)],
            capture_output=True, text=True, timeout=1800,
            cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
        line = [ln for ln in proc.stdout.splitlines()
                if ln.startswith("PROBE_RESULT ")]
        if line:
            results[spec["name"]] = json.loads(line[-1][len("PROBE_RESULT "):])
        else:
            results[spec["name"]] = {"error": proc.stderr[-2000:]}
        results[spec["name"]]["wall_s"] = round(time.time() - t0, 1)
        print(f"{spec['name']}: "
              f"{results[spec['name']].get('per_program_ms', 'ERR')} ms "
              f"(wall {results[spec['name']]['wall_s']}s)", flush=True)
    with open(args.out, "w") as f:
        json.dump(results, f, indent=2)
    print(f"wrote {args.out}")


def main():
    ap = argparse.ArgumentParser()
    sub = ap.add_subparsers(dest="cmd", required=True)
    w = sub.add_parser("worker")
    w.add_argument("spec")
    s = sub.add_parser("suite")
    s.add_argument("--ablate", action="store_true")
    s.add_argument("--cpu", action="store_true")
    s.add_argument("--only", default="")
    s.add_argument("--out", default="PROBE.json")
    args = ap.parse_args()
    if args.cmd == "worker":
        worker(json.loads(args.spec))
    else:
        suite(args)


if __name__ == "__main__":
    main()
