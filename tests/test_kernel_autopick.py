"""Pin the size-adaptive kernel-geometry defaults to their measured ladder.

Round-3 shipped decision tables (bench/results/PROFILE_r3.md, on-chip
slope-timed A/Bs): these functions ARE the shipped defaults, so a refactor
that shifts a threshold silently changes every headline row.  Update these
pins only together with a new measured decision table.
"""

import dataclasses

from gem_tpu.config import MapConfig
from gem_tpu.kernels import fuse_stream as fs
from gem_tpu.kernels import raytrace as rt


def test_pick_chunk_ladder_fact(monkeypatch):
    # fact (round-5 DEFAULT): 2048 from 1M points up (8.97 vs 9.46 ms at
    # t2048; c4096 regresses on tile-boundary pad waste — PROFILE_r5.md)
    monkeypatch.setattr(fs, "_PASSA", "fact")
    assert fs._pick_chunk(2048) == 512
    assert fs._pick_chunk((1 << 16) - 1) == 512
    assert fs._pick_chunk(131072) == 1024
    assert fs._pick_chunk((1 << 20) - 1) == 1024
    assert fs._pick_chunk(1 << 20) == 2048
    assert fs._pick_chunk(1 << 22) == 4096


def test_pick_chunk_ladder_dot(monkeypatch):
    # dot: 512 for typical frames; 1024 from 1M points up (17.1 vs 18.1 ms)
    monkeypatch.setattr(fs, "_PASSA", "dot")
    assert fs._pick_chunk(2048) == 512
    assert fs._pick_chunk(131072) == 512
    assert fs._pick_chunk((1 << 20) - 1) == 512
    assert fs._pick_chunk(1 << 20) == 1024
    assert fs._pick_chunk(1 << 22) == 1024


def test_pick_chunk_env_override(monkeypatch):
    monkeypatch.setattr(fs, "_CHUNK_ENV", 256)
    assert fs._pick_chunk(1 << 22) == 256


def test_pick_tile_ladder_fact(monkeypatch):
    # fact (round-5 DEFAULT): build cost stops scaling with TILE; the 1M
    # ladder has t4096 < t2048 < t8192 (8.83/8.97/9.57 ms) but 4M flips to
    # t2048 (28.0 vs 31.1 — N*W mask work takes over; PROFILE_r5.md)
    monkeypatch.setattr(fs, "_PASSA", "fact")
    assert fs._pick_tile(131072, 1000 * 1000) == 4096
    assert fs._pick_tile(1 << 20, 1000 * 1000) == 4096
    assert fs._pick_tile(1 << 22, 1000 * 1000) == 2048
    # tiny maps: density over 2 pts/cell -> mask-bound tile
    assert fs._pick_tile(16384, 75 * 75) == 2048
    assert fs._pick_tile(8192, 75 * 75) == 4096


def test_pick_tile_ladder_dot(monkeypatch):
    # dot: 2048 iff tile-count-bound (2N <= ncell): strict row 7.93 vs
    # 8.73 ms, 1M row 16.74 vs 15.38 ms (round3b)
    monkeypatch.setattr(fs, "_PASSA", "dot")
    assert fs._pick_tile(131072, 1000 * 1000) == 2048
    assert fs._pick_tile(500 * 1000, 1000 * 1000) == 2048
    assert fs._pick_tile(500 * 1000 + 1, 1000 * 1000) == 1024
    assert fs._pick_tile(1 << 20, 1000 * 1000) == 1024
    # tiny maps are point-bound at any realistic frame size
    assert fs._pick_tile(8192, 75 * 75) == 1024


def test_pick_tile_env_override(monkeypatch):
    monkeypatch.setattr(fs, "_TILE_ENV", 2048)
    assert fs._pick_tile(1 << 22, 1000 * 1000) == 2048


def _map_cfg(length, pool=0):
    return dataclasses.replace(
        MapConfig(length=length, resolution=0.1), raytrace_far_pool=pool)


def test_far_pool_auto_ladder():
    # exact below 512; p=2 at 512..767; p=3 at >=768 (isolated raytrace
    # 8.2/2.5/1.8 ms for p=1/2/3 at L=1000; agreement 99.7/99.4%)
    assert rt._far_pool(_map_cfg(256)) == 1
    assert rt._far_pool(_map_cfg(511)) == 1
    assert rt._far_pool(_map_cfg(512)) == 2
    assert rt._far_pool(_map_cfg(767)) == 2
    assert rt._far_pool(_map_cfg(768)) == 3
    assert rt._far_pool(_map_cfg(1000)) == 3


def test_far_pool_explicit_override():
    assert rt._far_pool(_map_cfg(1000, pool=2)) == 2
    assert rt._far_pool(_map_cfg(256, pool=4)) == 4
