"""One-off CPU validation: pooled-vs-exact raytrace deletion agreement at
the flagship L=1000 operating point (results: bench/results/FARPOOL_L1000.txt,
summarized in bench/results/PROFILE_r3.md).  Uses the SAME scene generator
as tests/test_raytrace.py::test_far_pool_deep_agrees_with_exact so the
committed evidence measures exactly what the test bounds."""
import jax

jax.config.update("jax_platforms", "cpu")

import json
import os
import sys
import time

import jax.numpy as jnp
import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))

from gem_tpu.config import MapConfig
from gem_tpu.kernels.raytrace import raytrace_cleanup
from test_raytrace import _mkstate, farpool_scene

L = 1000
base = dict(length=L, resolution=0.1, raytrace_num_rays=720)
elev, lowest, traver = farpool_scene(L)

cfg_exact = MapConfig(**base, raytrace_far_pool=1)
state = _mkstate(cfg_exact, elev, lowest, sensor_z=1.2, start=(23, 9))
t0 = time.time()
out_e = raytrace_cleanup(state, cfg_exact, jnp.asarray(traver))
del_e = np.asarray(out_e.elevation) == cfg_exact.invalid_elevation
print(f"exact: {del_e.sum()} deletions in {time.time()-t0:.1f}s", flush=True)

res = {"L": L, "exact_deletions": int(del_e.sum())}
for p in (2, 3, 4):
    cfg_pool = MapConfig(**base, raytrace_far_pool=p)
    t0 = time.time()
    out_p = raytrace_cleanup(state, cfg_pool, jnp.asarray(traver))
    del_p = np.asarray(out_p.elevation) == cfg_pool.invalid_elevation
    extra = int((del_p & ~del_e).sum())
    missed = int((del_e & ~del_p).sum())
    agree = 1.0 - missed / max(1, int(del_e.sum()))
    res[f"p{p}"] = {"extra": extra, "missed": missed,
                    "agreement": round(agree, 4)}
    print(f"p={p}: extra={extra} missed={missed} agree={agree:.4f} "
          f"({time.time()-t0:.1f}s)", flush=True)
print("JSON:" + json.dumps(res))
