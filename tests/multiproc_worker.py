"""Worker for the 2-process distributed CPU test (test_aux.py spawns
two of these). Each process owns 4 virtual CPU devices; together they
form one 8-device data-parallel mesh. Exercises: distributed
initialize, per-host batch assembly into globally-sharded arrays, a
real gradient step under GSPMD (psum across hosts), deterministic host
data sharding, object allgather, and main-process-only writes.
"""

import os
import sys

port = sys.argv[1]
pid = int(sys.argv[2])
out_dir = sys.argv[3]

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"

import jax

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from unmore_tpu.parallel import distributed as dist

dist.initialize(f"localhost:{port}", num_processes=2, process_id=pid)
assert jax.process_count() == 2, jax.process_count()
assert jax.device_count() == 8, jax.device_count()
assert jax.local_device_count() == 4

import jax.numpy as jnp
import numpy as np
import optax

mesh = dist.global_mesh()

# tiny linear-regression "model": loss must be identical on both hosts
# because the gradient psum runs over the global 8-device mesh
w0 = jnp.zeros((16, 1))
tx = optax.sgd(0.1)
opt0 = tx.init(w0)

from jax.sharding import NamedSharding, PartitionSpec as P

rep = NamedSharding(mesh, P())
w = jax.device_put(w0, rep)
opt = jax.device_put(opt0, rep)

rng = np.random.RandomState(42)  # identical data on both hosts...
x_all = rng.randn(8, 16).astype(np.float32)
y_all = x_all.sum(1, keepdims=True).astype(np.float32)
# ...but each host feeds ONLY its local slice
lo, hi = 4 * pid, 4 * (pid + 1)
batch = dist.global_batch(mesh, {"x": x_all[lo:hi], "y": y_all[lo:hi]})
assert batch["x"].shape == (8, 16), batch["x"].shape  # global shape

@jax.jit
def step(w, opt, batch):
    def loss_fn(w):
        pred = batch["x"] @ w
        return jnp.mean((pred - batch["y"]) ** 2)

    loss, grads = jax.value_and_grad(loss_fn)(w)
    updates, opt = tx.update(grads, opt)
    return optax.apply_updates(w, updates), opt, loss

losses = []
for _ in range(5):
    w, opt, loss = step(w, opt, batch)
    losses.append(float(loss))
assert losses[-1] < losses[0], losses

# deterministic host sharding
r0, r1 = dist.host_shard_range(10)
expected = (0, 5) if pid == 0 else (5, 10)
assert (r0, r1) == expected, (r0, r1)
idx = dist.host_shard_indices(7)
assert idx.tolist() == list(range(pid, 7, 2))

# object allgather across hosts
gathered = dist.all_gather_objects({"pid": pid, "loss": losses[-1]})
assert [g["pid"] for g in gathered] == [0, 1]
assert abs(gathered[0]["loss"] - gathered[1]["loss"]) < 1e-9

# main-process-only write
if dist.is_main():
    with open(os.path.join(out_dir, "ckpt.txt"), "w") as f:
        f.write(f"{losses[-1]:.8f}")
dist.barrier("ckpt")

# the scoring-CLI composition (object_scoring.py): each host scores its
# strided shard of the work list, annotations are gathered, process 0
# writes ONE merged contract JSON covering every item exactly once
import json

todo = list(range(10))
my_items = dist.host_shard_indices(len(todo))
my_anns = [{"image_id": todo[int(i)], "score": 0.5, "by": pid} for i in my_items]
merged = [a for part in dist.all_gather_objects(my_anns) for a in part]
if dist.is_main():
    with open(os.path.join(out_dir, "object_discovery_with_scores.json"), "w") as f:
        json.dump(merged, f)
dist.barrier("scores")
assert sorted(a["image_id"] for a in merged) == todo
assert {a["by"] for a in merged} == {0, 1}

print(f"WORKER_OK pid={pid} loss={losses[-1]:.8f}")
