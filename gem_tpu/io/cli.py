"""Command line interface: `python -m gem_tpu <cmd>`.

Replaces the reference's process entry + roslaunch + signal topics
(elevation_mapping_node.cpp:30-58, kitti_demo.launch, the
map_saving/dense_mapping/new_keyframe Bool topics): one binary, explicit
flags, dataset replay instead of bags.

  gem_tpu run     replay a dataset (synthetic | npz dir) through the pipeline
  gem_tpu bench   thin wrapper over bench.py
  gem_tpu info    environment + config dump
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import sys
import time


def _build_config(args):
    from gem_tpu import config as C

    if args.config:
        cfg = C.config_from_yaml(args.config)
    elif args.preset == "kitti":
        cfg = C.kitti_config()
    elif args.preset == "yq":
        cfg = C.yq_config()
    elif args.preset == "benchmark":
        cfg = C.benchmark_config()
    else:
        cfg = C.PipelineConfig()
    if args.max_points:
        cfg = cfg.replace(max_points=args.max_points)
    return cfg


def _frames(cfg, args):
    from gem_tpu.io.replay import load_npz_frame, synthetic_frames

    if args.dataset == "synthetic":
        for frame, _, _ in synthetic_frames(cfg, args.frames,
                                            speed=args.speed,
                                            seed=args.seed):
            yield frame
    else:
        from gem_tpu.native import FramePrefetcher

        paths = sorted(glob.glob(os.path.join(args.dataset, "*.npz")))
        if not paths:
            sys.exit(f"no .npz frames under {args.dataset}")
        paths = paths[: args.frames or None]
        # native background loader overlaps file IO with device compute
        pf = FramePrefetcher(paths, ring=4)
        try:
            for i in range(len(pf)):
                yield load_npz_frame(cfg, pf[i])
        finally:
            pf.close()


def cmd_run(args):
    import numpy as np
    import jax

    from gem_tpu.io.checkpoint import load_checkpoint, save_checkpoint
    from gem_tpu.io.pcd import save_pcd
    from gem_tpu.mapping.pipeline import ElevationPipeline
    from gem_tpu.render import grid_point_cloud

    cfg = _build_config(args)
    pipe = ElevationPipeline(cfg, fuse_backend=args.fuse_backend)
    if args.resume:
        pipe.state, _ = load_checkpoint(args.resume, cfg)
        print(f"resumed from {args.resume} "
              f"(frame {int(pipe.state.frame_idx)})")

    t0 = time.time()
    n = 0
    for frame in _frames(cfg, args):
        out = pipe.process(frame)
        n += 1
        if args.log_every and n % args.log_every == 0:
            m = jax.tree.map(lambda x: np.asarray(x).tolist(), out.metrics)
            print(f"[{n}] {json.dumps(m)}", flush=True)
    jax.block_until_ready(pipe.state.map.elevation)
    dt = time.time() - t0
    print(f"processed {n} frames in {dt:.2f}s ({n / max(dt, 1e-9):.1f} Hz), "
          f"submaps={int(pipe.state.submaps.num_submaps)}")

    if args.checkpoint:
        save_checkpoint(args.checkpoint, pipe.state)
        print(f"checkpoint -> {args.checkpoint}")

    if args.save_map:
        # global cloud = all finalized submaps + accumulator + live grid
        # (savingMap, src/ElevationMapping.cpp:430-455)
        s = pipe.state.submaps
        parts = []
        k = int(s.num_submaps)
        K = s.counts.shape[0]
        for i in range(min(k, K)):
            parts.append({f: np.asarray(getattr(s.slots, f)[i])
                          for f in ("x", "y", "z", "color", "intensity",
                                    "variance", "traver", "valid")})
        parts.append({f: np.asarray(getattr(s.accum, f))
                      for f in ("x", "y", "z", "color", "intensity",
                                "variance", "traver", "valid")})
        pc = grid_point_cloud(pipe.state.map, cfg.map,
                              pipe.last_outputs.features.traver
                              if pipe.last_outputs else None)
        parts.append({"x": np.asarray(pc["x"]), "y": np.asarray(pc["y"]),
                      "z": np.asarray(pc["z"]),
                      "color": np.asarray(pipe.state.map.color).reshape(-1),
                      "intensity": np.asarray(pc["intensity"]),
                      "variance": np.asarray(pc["variance"]),
                      "traver": np.asarray(pc["traver"]),
                      "valid": np.asarray(pc["valid"])})
        cat = {f: np.concatenate([p[f] for p in parts]) for f in parts[0]}
        npts = save_pcd(args.save_map, cat["x"], cat["y"], cat["z"],
                        cat["color"], cat["intensity"], cat["variance"],
                        cat["traver"], valid=cat["valid"])
        print(f"global map ({npts} points) -> {args.save_map}")

    if args.save_submaps:
        # savingSubMap (src/ElevationMapping.cpp:461-476)
        os.makedirs(args.save_submaps, exist_ok=True)
        s = pipe.state.submaps
        for i in range(min(int(s.num_submaps), s.counts.shape[0])):
            path = os.path.join(args.save_submaps, f"{i}.pcd")
            save_pcd(path, np.asarray(s.slots.x[i]), np.asarray(s.slots.y[i]),
                     np.asarray(s.slots.z[i]), np.asarray(s.slots.color[i]),
                     np.asarray(s.slots.intensity[i]),
                     np.asarray(s.slots.variance[i]),
                     np.asarray(s.slots.traver[i]),
                     valid=np.asarray(s.slots.valid[i]))
        print(f"{int(s.num_submaps)} submaps -> {args.save_submaps}/")
    return 0


def cmd_info(args):
    import jax

    print("gem_tpu info")
    print("  devices:", jax.devices())
    print("  backend:", jax.default_backend())
    cfg = _build_config(args)
    print("  config:", cfg)
    return 0


def main(argv=None):
    ap = argparse.ArgumentParser(prog="gem_tpu")
    sub = ap.add_subparsers(dest="cmd", required=True)

    def common(p):
        p.add_argument("--config", help="yaml config file")
        p.add_argument("--preset", default="kitti",
                       choices=["kitti", "yq", "benchmark", "default"])
        p.add_argument("--max-points", type=int, default=0)

    rp = sub.add_parser("run", help="replay a dataset through the pipeline")
    common(rp)
    rp.add_argument("--dataset", default="synthetic",
                    help="'synthetic' or a directory of per-frame .npz files")
    rp.add_argument("--frames", type=int, default=100)
    rp.add_argument("--speed", type=float, default=0.5)
    rp.add_argument("--seed", type=int, default=0)
    rp.add_argument("--fuse-backend", default="segment",
                    choices=["segment", "sort"])
    rp.add_argument("--log-every", type=int, default=0,
                    help="print metrics every N frames (each print fetches "
                         "device state — expensive over a remote TPU relay)")
    rp.add_argument("--checkpoint", help="write final state npz")
    rp.add_argument("--resume", help="resume from a state npz")
    rp.add_argument("--save-map", help="write global cloud PCD")
    rp.add_argument("--save-submaps", help="write per-submap PCDs to dir")
    rp.set_defaults(fn=cmd_run)

    ip = sub.add_parser("info", help="environment + config dump")
    common(ip)
    ip.set_defaults(fn=cmd_info)

    args = ap.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    raise SystemExit(main())
