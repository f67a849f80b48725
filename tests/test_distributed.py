"""Multi-host fleet: 2-process CPU-backend collective test.

SURVEY.md §5 names jax.distributed multi-host bring-up as the reference's
ROS-networking analogue (elevation_mapping_node.cpp:39-44); this spawns two
real OS processes that join one coordination service, shard the fleet's
robot axis over the 4-device global mesh, run the SPMD fleet step, and
push a ppermute ring payload across the process boundary (Gloo)."""

import os
import socket
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                      "_distributed_worker.py")


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _run_pair(argv_for, timeout=600):
    """Spawn the two worker processes and collect (rc, out, err) per rank."""
    procs = [subprocess.Popen(
        argv_for(i), stdout=subprocess.PIPE, stderr=subprocess.PIPE,
        text=True, env=_worker_env()) for i in range(2)]
    outs = []
    try:
        for p in procs:
            out, err = p.communicate(timeout=timeout)
            outs.append((p.returncode, out, err))
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    return outs


def _worker_env():
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)          # workers set their own device count
    return env


def _retry_pair(make_argv_for, check):
    """Run the 2-process pair, retrying ONCE with a fresh port on failure:
    the coordinator port is grabbed-then-released (another process can win
    the race), and a cold jit cache can push two concurrent fleet-step
    compiles past the deadline on this 1-core box (observed flake)."""
    last = None
    for _ in range(2):
        outs = _run_pair(make_argv_for(_free_port()))
        try:
            check(outs)
            return
        except AssertionError as e:
            last = e
    raise last


def test_two_process_fleet_collectives():
    def check(outs):
        for i, (rc, out, err) in enumerate(outs):
            assert rc == 0, \
                f"worker {i} rc={rc}\nstdout:{out}\nstderr:{err[-3000:]}"
            assert f"DIST_OK p{i}" in out, (out, err[-3000:])

    _retry_pair(
        lambda port: lambda i: [sys.executable, WORKER, str(i), "2",
                                str(port)],
        check)


def test_fleet_cli_coordinator_two_processes(tmp_path):
    """CLI-level regression of `fleet --coordinator`: the full command every
    host runs, with robots split across 2 processes x 2 CPU devices."""
    def make_argv_for(port):
        code = (
            "import sys; sys.path.insert(0, {repo!r})\n"
            "import os; os.environ['XLA_FLAGS'] = "
            "'--xla_force_host_platform_device_count=2'\n"
            "import jax; jax.config.update('jax_platforms', 'cpu')\n"
            "from gem_tpu.io.cli import main\n"
            "main(['fleet', '--robots', '4', '--frames', '2',\n"
            "      '--max-points', '128', '--coordinator',"
            " '127.0.0.1:{port}',\n"
            "      '--num-processes', '2', '--process-id', sys.argv[1]])\n"
        ).format(repo=REPO, port=port)
        script = tmp_path / f"fleet_worker_{port}.py"
        script.write_text(code)
        return lambda i: [sys.executable, str(script), str(i)]

    def check(outs):
        for i, (rc, out, err) in enumerate(outs):
            assert rc == 0, f"proc {i} rc={rc}\n{out}\n{err[-3000:]}"
            assert "fleet of 4 robots" in out and "distributed" in out, out

    _retry_pair(make_argv_for, check)
