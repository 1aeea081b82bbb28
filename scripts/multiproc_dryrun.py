"""REAL multi-process distributed dry run (VERDICT round-2 #5).

Launches 2 OS processes x 4 virtual CPU devices each, wires them with
`jax.distributed.initialize` (TCP coordinator + gloo-style CPU
collectives), builds the 8-device global mesh, and runs ONE full
training step with the SAME tiny dataset/seed as
`__graft_entry__.dryrun_multichip`. This executes the
`make_array_from_callback` multi-host placement branch in
`parallel/mesh.py::_put` with a genuine `process_count() == 2` — the
branch round 2 could only exercise with a mocked process count — and
asserts loss parity against the single-process 8-device run.

Usage:
    python scripts/multiproc_dryrun.py            # orchestrates everything
    python scripts/multiproc_dryrun.py --worker PID NPROCS PORT  # internal
Prints one JSON line:
    {"ok": true, "loss_2proc": ..., "loss_1proc": ..., "abs_diff": ...}
"""

import json
import os
import socket
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def _worker(process_id: int, num_processes: int, port: int):
    """Body executed in each spawned process (sanitized CPU env with 4
    virtual devices set by the parent)."""
    import jax

    if num_processes > 1:
        from i2sdf_tpu.parallel import initialize_multihost

        n = initialize_multihost(
            coordinator_address=f"127.0.0.1:{port}",
            num_processes=num_processes,
            process_id=process_id)
        assert n == num_processes, (n, num_processes)
        assert jax.process_count() == num_processes

    import numpy as np
    import jax.numpy as jnp

    from __graft_entry__ import _tiny_setup
    from i2sdf_tpu.data.recon import DeviceArrays
    from i2sdf_tpu.models.losses import LossConfig
    from i2sdf_tpu.parallel import make_mesh, replicate_params
    from i2sdf_tpu.train import create_train_state, make_train_step

    n_devices = len(jax.devices())
    assert n_devices == 8, (n_devices, jax.devices())
    batch_size = 8 * n_devices
    cfg, params, _ = _tiny_setup(batch_size)
    mesh = make_mesh(n_devices)

    # identical tiny dataset to __graft_entry__._dryrun_body (same rng)
    n_img, hw = 2, 64
    rng = np.random.default_rng(0)
    K = np.eye(4, dtype=np.float32)
    K[0, 0] = K[1, 1] = 10.0
    K[0, 2] = K[1, 2] = 4.0
    pose = np.eye(4, dtype=np.float32)
    pose[:3, 3] = [0.0, 0.0, -2.0]
    jj, ii = np.meshgrid(np.arange(8), np.arange(8))
    uv = np.stack([jj, ii], -1).reshape(-1, 2).astype(np.float32)
    host = {
        "uv": uv,
        "intrinsics": np.broadcast_to(K, (n_img, 4, 4)),
        "pose": np.broadcast_to(pose, (n_img, 4, 4)),
        "rgb": rng.uniform(0, 1, (n_img, hw, 3)).astype(np.float32),
        "depth": rng.uniform(1, 3, (n_img, hw)).astype(np.float32),
        "depth_mask": np.ones((n_img, hw), bool),
        "normal": np.tile([0.0, 0.0, 1.0],
                          (n_img, hw, 1)).astype(np.float32),
        "normal_mask": np.ones((n_img, hw), bool),
    }
    # dataset arrays ride the SAME multi-host-safe placement as params
    # (replicated: every ray shard gathers its own pixels in-jit)
    placed = replicate_params(mesh, host)
    data = DeviceArrays(
        uv=placed["uv"], intrinsics=placed["intrinsics"],
        pose=placed["pose"], rgb=placed["rgb"], mask=None,
        light_mask=None, depth=placed["depth"],
        depth_mask=placed["depth_mask"], normal=placed["normal"],
        normal_mask=placed["normal_mask"], pointcloud=None,
        pointlinks=None, pixlinks=None)

    params = replicate_params(mesh, params)
    state, tx = create_train_state(params, learning_rate=5e-4,
                                   decay_steps=1000)
    loss_cfg = LossConfig(eikonal_weight=0.1, depth_weight=0.1,
                          normal_weight=0.05)
    step = make_train_step(cfg, tx, batch_size=batch_size, mesh=mesh)
    w = loss_cfg.dynamic_weights(0)
    # numpy key: identical on every process, auto-replicated by jit
    key = np.asarray(jax.random.PRNGKey(0))
    state, metrics = step(state, data, key, w)
    loss = float(metrics["loss"])
    assert np.isfinite(loss), f"non-finite loss: {loss}"
    print(f"LOSS {process_id} {loss:.10f}", flush=True)


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def _spawn(process_id, num_processes, port, devices_per_proc):
    from __graft_entry__ import _sanitized_cpu_env

    env = _sanitized_cpu_env(devices_per_proc)
    return subprocess.Popen(
        [sys.executable, os.path.abspath(__file__), "--worker",
         str(process_id), str(num_processes), str(port)],
        env=env, cwd=REPO, stdout=subprocess.PIPE,
        stderr=subprocess.PIPE, text=True)


def _parse_loss(stdout: str, pid: int) -> float:
    for line in stdout.splitlines():
        if line.startswith(f"LOSS {pid} "):
            return float(line.split()[2])
    raise RuntimeError(f"no LOSS line from process {pid}:\n{stdout}")


def main():
    if len(sys.argv) >= 5 and sys.argv[1] == "--worker":
        _worker(int(sys.argv[2]), int(sys.argv[3]), int(sys.argv[4]))
        return

    port = _free_port()
    procs = [_spawn(i, 2, port, 4) for i in range(2)]
    outs = []
    for i, p in enumerate(procs):
        out, err = p.communicate(timeout=1500)
        if p.returncode != 0:
            tail = "\n".join((out + err).splitlines()[-25:])
            raise RuntimeError(f"worker {i} rc={p.returncode}:\n{tail}")
        outs.append(out)
    losses_2p = [_parse_loss(outs[i], i) for i in range(2)]
    assert abs(losses_2p[0] - losses_2p[1]) < 1e-9, losses_2p

    ref = _spawn(0, 1, port, 8)
    out, err = ref.communicate(timeout=1500)
    if ref.returncode != 0:
        tail = "\n".join((out + err).splitlines()[-25:])
        raise RuntimeError(f"single-proc reference rc={ref.returncode}:"
                           f"\n{tail}")
    loss_1p = _parse_loss(out, 0)

    diff = abs(losses_2p[0] - loss_1p)
    scale = max(abs(loss_1p), 1e-9)
    ok = diff / scale < 1e-5
    try:
        commit = subprocess.check_output(
            ["git", "rev-parse", "--short", "HEAD"], cwd=REPO,
            text=True).strip()
    except Exception:
        commit = "unknown"
    result = {
        "ok": ok,
        "commit": commit,
        "timestamp": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
        "topology": "2 processes x 4 virtual CPU devices "
                    "(jax.distributed, TCP coordinator) vs 1 process x 8",
        "rel_tolerance": 1e-5,
        "loss_2proc": losses_2p[0],
        "loss_1proc": loss_1p,
        "abs_diff": diff,
    }
    with open(os.path.join(REPO, "docs", "evidence",
                           "multiproc_dryrun.json"), "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps(result))
    if not ok:
        sys.exit(1)


if __name__ == "__main__":
    main()
