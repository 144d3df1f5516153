"""Multi-host data path: 2 processes x 4 virtual CPU devices each, via
jax.distributed (parallel/multihost.py).

Each process aligns ITS OWN spliced read shard in batch rounds against
a frozen site table, exchanging novel junctions between rounds
(sync_splice_sites — the P5 cross-host merge). Asserts:
  * the global mesh spans both processes and the fused SE step's psum
    counts reads from BOTH hosts;
  * after the sync rounds both processes hold the identical site table
    (including each other's discoveries);
  * short-anchor junction reads in round 2 align spliced using sites
    DISCOVERED BY THE OTHER PROCESS in round 1;
  * output is deterministic across reruns (byte-identical SAM shards).

Runs the worker twice as subprocesses; skipped if the coordinator port
is unavailable."""

import os
import subprocess
import sys

import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                      "_multihost_worker.py")


def _run_pair(port):
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    env["PYTHONPATH"] = ROOT
    env.pop("PYTEST_CURRENT_TEST", None)
    procs = [subprocess.Popen(
        [sys.executable, WORKER, str(pid), f"localhost:{port}"],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env,
        text=True) for pid in range(2)]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=600)
        except subprocess.TimeoutExpired:
            p.kill()
            out, _ = p.communicate()
        outs.append(out)
    rcs = [p.returncode for p in procs]
    return rcs, outs


def test_two_process_spliced_rounds():
    rcs, outs = _run_pair(19741)
    assert rcs == [0, 0], "\n".join(outs)
    # workers print RESULT lines with a digest of their SAM + site table
    res = {}
    for out in outs:
        for ln in out.splitlines():
            if ln.startswith("RESULT "):
                _tag, pid, key, val = ln.split(" ", 3)
                res.setdefault(key, {})[int(pid)] = val
    assert res["sites"][0] == res["sites"][1], "site tables diverged"
    assert int(res["adopted"][0]) >= 1, "p0 adopted no foreign sites"
    assert int(res["adopted"][1]) >= 1, "p1 adopted no foreign sites"
    assert int(res["cross_spliced"][0]) >= 1
    assert int(res["cross_spliced"][1]) >= 1
    assert int(res["global_aligned"][0]) == int(res["global_aligned"][1])

    # determinism: a second run produces identical SAM digests
    rcs2, outs2 = _run_pair(19743)
    assert rcs2 == [0, 0], "\n".join(outs2)
    res2 = {}
    for out in outs2:
        for ln in out.splitlines():
            if ln.startswith("RESULT "):
                _tag, pid, key, val = ln.split(" ", 3)
                res2.setdefault(key, {})[int(pid)] = val
    assert res["sam"] == res2["sam"], "output not deterministic"
