"""Multi-PROCESS distributed BA: 2 OS processes, a localhost coordinator,
one CPU device each, gloo collectives — the actual multi-host code path
(`init_distributed`'s >1-process branch), which previously had never
executed (round-2 VERDICT missing item 2).  Asserts the 2-process result
matches the single-process solver."""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

WORKER = os.path.join(os.path.dirname(__file__), "..", "scripts",
                      "distributed_ba_worker.py")


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.fixture(scope="module")
def two_process_result():
    port = _free_port()
    env = dict(os.environ)
    env["PYTHONPATH"] = (os.path.dirname(WORKER) + "/.." + os.pathsep
                         + env.get("PYTHONPATH", ""))
    procs = [
        subprocess.Popen(
            [sys.executable, WORKER, f"127.0.0.1:{port}", "2", str(pid)],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
            env=env)
        for pid in (0, 1)
    ]
    outs = []
    for p in procs:
        out, err = p.communicate(timeout=600)
        assert p.returncode == 0, err[-2000:]
        outs.append(json.loads(out.strip().splitlines()[-1]))
    return outs


def test_two_processes_form_a_cluster(two_process_result):
    for out in two_process_result:
        assert out["process_count"] == 2


def test_processes_agree_bitwise(two_process_result):
    a, b = two_process_result
    assert a["poses_t"] == b["poses_t"]
    assert a["cost_final"] == b["cost_final"]


def test_matches_single_process_solver(two_process_result):
    from jetracer_orbslam2_tpu.config import BAConfig
    from jetracer_orbslam2_tpu.models.backend.ba import bundle_adjust
    from jetracer_orbslam2_tpu.parallel.bench_ba import make_synthetic_ba

    prob, intr = make_synthetic_ba(n_poses=4, n_landmarks=64, obs_per_lm=4)
    poses_1, _, stats = bundle_adjust(prob, intr, BAConfig(iters=8))
    t1 = np.asarray(poses_1)[:, :3, 3]
    t2 = np.asarray(two_process_result[0]["poses_t"])
    np.testing.assert_allclose(t2, t1, atol=2e-3)
    # and the distributed run actually optimized
    out = two_process_result[0]
    assert out["cost_final"] < 0.1 * out["cost0"]
