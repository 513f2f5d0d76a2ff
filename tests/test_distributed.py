"""Multi-process distribution tests: spawns two real OS processes that
form one 8-device CPU mesh via jax.distributed (the multi-host story —
SURVEY §2.3/§5; reference equivalent is DDP ``launch()``,
cad/train_net.py:168-181). Also covers the single-process degenerate
paths of the helpers in-process.
"""

import os
import socket
import subprocess
import sys

import numpy as np

WORKER = os.path.join(os.path.dirname(__file__), "multiproc_worker.py")


def _free_port() -> int:
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_mesh_trains_and_writes_once(tmp_path):
    port = _free_port()
    env = {k: v for k, v in os.environ.items() if k not in ("JAX_PLATFORMS", "XLA_FLAGS")}
    procs = [
        subprocess.Popen(
            [sys.executable, WORKER, str(port), str(pid), str(tmp_path)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env, text=True,
        )
        for pid in range(2)
    ]
    outs = [p.communicate(timeout=480)[0] for p in procs]
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {pid} failed:\n{out}"
        assert f"WORKER_OK pid={pid}" in out, out
    # both processes converged to the identical global-mesh loss
    losses = [line.split("loss=")[1].strip() for out in outs for line in out.splitlines() if "WORKER_OK" in line]
    assert losses[0] == losses[1], losses
    # exactly one (process 0) wrote the checkpoint
    ckpt = tmp_path / "ckpt.txt"
    assert ckpt.is_file()
    assert ckpt.read_text() == losses[0]
    # the scoring-CLI composition wrote ONE merged contract JSON
    import json

    merged = json.loads((tmp_path / "object_discovery_with_scores.json").read_text())
    assert sorted(a["image_id"] for a in merged) == list(range(10))


def test_single_process_degenerate_paths():
    from unmore_tpu.parallel import distributed as dist

    assert dist.process_count() >= 1
    assert dist.is_main() in (True, False)
    start, end = dist.host_shard_range(11)
    if dist.process_count() == 1:
        assert (start, end) == (0, 11)
        assert dist.host_shard_indices(5).tolist() == [0, 1, 2, 3, 4]
        assert dist.all_gather_objects({"a": 1}) == [{"a": 1}]
        assert dist.local_batch_size(16) == 16
    dist.barrier("noop")


def test_global_batch_places_sharded_arrays():
    import jax
    from unmore_tpu.parallel import distributed as dist

    mesh = dist.global_mesh()
    n = jax.device_count()
    batch = dist.global_batch(mesh, {"x": np.arange(n * 3, dtype=np.float32).reshape(n, 3)})
    assert batch["x"].shape == (n, 3)
    np.testing.assert_array_equal(
        np.asarray(batch["x"]), np.arange(n * 3, dtype=np.float32).reshape(n, 3)
    )
