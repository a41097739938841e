"""Multi-host readiness (VERDICT r2 #2).

The reference runs multi-process via torch.distributed.launch + NCCL with
rank-0-only writes and per-rank data scatter (idr_train.py:28-40,94,695;
scene_dataset.py:260-279). The TPU-native equivalent is
jax.distributed.initialize + ONE global mesh + global-batch placement
(parallel/dist.py). These tests check:

  * degenerate single-process semantics: is_main() is True, global batch
    placement equals plain device_put, to_host round-trips;
  * a REAL 2-process CPU cluster (jax.distributed local coordinator, 2
    virtual devices per process) computes the identical loss and gradient
    norm to the single-process 4-device run — DDP-equals-serial, extended
    to multi-host.
"""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

pytestmark = pytest.mark.slow

HERE = os.path.dirname(os.path.abspath(__file__))


def test_single_process_degenerate():
    import jax

    from nefii_tpu.parallel import dist, spmd
    from nefii_tpu.parallel.mesh import make_mesh

    assert dist.is_main()
    assert dist.process_count() == 1

    mesh = make_mesh(4)
    batch = {"uv": np.arange(24, dtype=np.float32).reshape(1, 12, 2)}
    placed = dist.make_global_batch(mesh, batch, spmd.batch_pspec(batch))
    np.testing.assert_array_equal(dist.to_host(placed["uv"]), batch["uv"])
    # sharded as requested
    assert placed["uv"].sharding.spec == spmd.P(None, "ray")


def _free_port() -> int:
    # a hardcoded port collides when two suite runs share the machine
    import socket

    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def _run_cluster(nproc=2, devs=2, port=None):
    port = port or _free_port()
    procs = []
    for pid in range(nproc):
        env = dict(os.environ)
        env.pop("JAX_PLATFORMS", None)
        procs.append(
            subprocess.Popen(
                [sys.executable, os.path.join(HERE, "multihost_driver.py"),
                 str(pid), str(nproc), str(port), str(devs)],
                stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
                text=True, env=env, cwd=HERE,
            )
        )
    outs = []
    for p in procs:
        # this box can be a SINGLE core: two cluster processes + the
        # oracle timeshare it, and each XLA compile takes minutes when
        # contended -- budget generously rather than flake
        out, _ = p.communicate(timeout=1800)
        outs.append(out)
        assert p.returncode == 0, f"driver failed:\n{out[-3000:]}"
    results = []
    for out in outs:
        lines = [l for l in out.splitlines() if l.startswith("RESULT ")]
        assert lines, f"no RESULT line:\n{out[-3000:]}"
        results.append(json.loads(lines[-1][len("RESULT "):]))
    return results


def _launch_trainer_driver(pid, nproc, port, devs, scene_dir, out_root):
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    return subprocess.Popen(
        [sys.executable, os.path.join(HERE, "multihost_trainer_driver.py"),
         str(pid), str(nproc), str(port), str(devs), scene_dir, out_root],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        env=env, cwd=HERE,
    )


def _parse_result(proc, timeout=3000):
    out, _ = proc.communicate(timeout=timeout)
    assert proc.returncode == 0, f"driver failed:\n{out[-4000:]}"
    lines = [l for l in out.splitlines() if l.startswith("RESULT ")]
    assert lines, f"no RESULT line:\n{out[-4000:]}"
    return json.loads(lines[-1][len("RESULT "):])


def test_real_trainer_two_process_cluster_matches_single_process(tmp_path):
    """VERDICT r3 #1: the REAL IDRTrainRunner (flagship MC render path,
    secondary distillation, a forced budget auto-escalation recompile, one
    vis, checkpoint writes) runs under a 2-process cluster and ends with
    EXACTLY the single-process oracle's parameters; only rank 0 touches the
    filesystem. Reference semantics: idr_train.py:28-40,94,695;
    scene_dataset.py:260-279."""
    from scene_factory import make_sphere_scene

    scene = make_sphere_scene(tmp_path / "scene")
    out_root = str(tmp_path / "out")
    os.makedirs(out_root, exist_ok=True)
    port = _free_port()

    # oracle (1 process x 4 devices) launched concurrently with the
    # 2-process x 2-device cluster: identical global mesh size, so the
    # shard-mapped numerics must agree exactly
    oracle_p = _launch_trainer_driver(-1, 1, 0, 4, scene, out_root)
    cluster_ps = [
        _launch_trainer_driver(pid, 2, port, 2, scene, out_root)
        for pid in range(2)
    ]

    results = [_parse_result(p) for p in cluster_ps]
    oracle = _parse_result(oracle_p)

    # the forced escalation fired and converged to the trivially-exact cap
    # (64 pixels / 4 devices = 16) in the oracle AND in both processes
    for r in results + [oracle]:
        assert r["sampler_budget_initial"] == 8
        assert r["sampler_budget_final"] == 16, r
        assert r["secondary_steps"] >= 1, r
        assert r["cur_iter"] >= 15, r

    # rank-0-only filesystem surface: the non-main process never created its
    # exps dir; the main process wrote checkpoints, plots and tensorboard
    assert sum(r["is_main"] for r in results) == 1
    for r in results:
        assert r["process_count"] == 2
        if r["is_main"]:
            files = r["files_written"]
            assert any("checkpoints" in f and f.endswith(".npz") for f in files), files
            assert any(f.endswith("train_0.png") for f in files), files
            assert any("tensorboard" in f for f in files), files
        else:
            assert not r["exps_dir_exists"], r
            assert r["files_written"] == [], r

    # DDP-equals-serial on the REAL loop: final params match the oracle
    ps = {
        tag: np.load(os.path.join(out_root, f"params_{tag}.npz"))
        for tag in ("oracle", "p0", "p1")
    }
    keys = set(ps["oracle"].files)
    assert keys == set(ps["p0"].files) == set(ps["p1"].files)
    for k in sorted(keys):
        ref = ps["oracle"][k]
        for tag in ("p0", "p1"):
            np.testing.assert_allclose(
                ps[tag][k], ref, rtol=1e-6, atol=1e-6,
                err_msg=f"{tag}:{k}",
            )


def test_two_process_cluster_matches_single_process():
    # single-process oracle on a 4-device mesh, in a subprocess so the
    # device-count flag doesn't fight the session's jax config; launched
    # CONCURRENTLY with the 2-process cluster to halve compile wall time
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    oracle_proc = subprocess.Popen(
        [sys.executable, "-c", (
            "import os, sys, json;"
            "os.environ['XLA_FLAGS']='--xla_force_host_platform_device_count=4';"
            "import jax; jax.config.update('jax_platforms','cpu');"
            f"sys.path.insert(0,{HERE!r});"
            f"sys.path.insert(0,{os.path.dirname(HERE)!r});"
            "import multihost_driver as d;"
            "from nefii_tpu.parallel.mesh import make_mesh;"
            "print('RESULT ' + json.dumps(d.evaluate(make_mesh())))"
        )],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        env=env, cwd=HERE,
    )

    results = _run_cluster(nproc=2, devs=2)

    oracle_txt, _ = oracle_proc.communicate(timeout=1800)
    assert oracle_proc.returncode == 0, oracle_txt[-3000:]
    oracle = json.loads(
        [l for l in oracle_txt.splitlines() if l.startswith("RESULT ")][-1][7:]
    )
    assert sum(r["is_main"] for r in results) == 1
    for r in results:
        assert r["process_count"] == 2
        np.testing.assert_allclose(r["loss"], oracle["loss"], rtol=1e-6)
        np.testing.assert_allclose(r["gnorm"], oracle["gnorm"], rtol=1e-5)
        # rank-0-only host logic (vis/checkpoints) on globally-placed params
        assert r["rank0_host_paths_ok"]
