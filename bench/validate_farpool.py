import jax
jax.config.update("jax_platforms", "cpu")
import numpy as np, jax.numpy as jnp, time, json, sys
sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tests")
from gem_tpu.config import MapConfig
from gem_tpu.kernels.raytrace import raytrace_cleanup
from test_raytrace import _mkstate

L = 1000
base = dict(length=L, resolution=0.1, raytrace_num_rays=720)
rng = np.random.default_rng(7)
elev = rng.normal(0.0, 0.2, (L, L)).astype(np.float32)
lowest = rng.normal(-0.2, 0.3, (L, L)).astype(np.float32)
lowest[rng.random((L, L)) < 0.3] = 10.0
obs = rng.random((L, L)) < 0.06
elev[obs] += rng.uniform(1.5, 3.0, obs.sum())
traver = np.where(obs, 0.1, 1.0).astype(np.float32)

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
    extra = int((del_p & ~del_e).sum()); missed = int((del_e & ~del_p).sum())
    agree = 1.0 - missed / max(1, int(del_e.sum()))
    res[f"p{p}"] = {"extra": extra, "missed": missed, "agreement": round(agree, 4)}
    print(f"p={p}: extra={extra} missed={missed} agree={agree:.4f} ({time.time()-t0:.1f}s)", flush=True)
print("JSON:" + json.dumps(res))
