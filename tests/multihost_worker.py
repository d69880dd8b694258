"""Worker for tests/test_multihost.py: one process of a 2-process CPU
"pod" (4 virtual devices each) training one sharded step.

Usage: python multihost_worker.py <pid> <nproc> <port> <outdir>
"""

import json
import os
import sys

pid, nproc, port, outdir = (
    int(sys.argv[1]), int(sys.argv[2]), int(sys.argv[3]), sys.argv[4]
)

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=4"
).strip()

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

from qlora_tpu.parallel import distributed  # noqa: E402

distributed.initialize(
    coordinator_address=f"localhost:{port}", num_processes=nproc, process_id=pid
)
assert jax.process_count() == nproc, jax.process_count()
assert jax.device_count() == 4 * nproc

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from qlora_tpu.lora import LoraConfig  # noqa: E402
from qlora_tpu.models import init_lora_params, init_params  # noqa: E402
from qlora_tpu.models.config import ModelConfig  # noqa: E402
from qlora_tpu.parallel.mesh import MeshAxes  # noqa: E402
from qlora_tpu.parallel.sharded_step import (  # noqa: E402
    init_sharded_train_state,
    make_sharded_train_step,
    sharded_param_shardings,
)
from qlora_tpu.train import make_optimizer  # noqa: E402

CFG = ModelConfig(
    arch="llama", vocab_size=512, hidden_size=256, intermediate_size=512,
    num_layers=2, num_heads=4, num_kv_heads=4,
)
LCFG = LoraConfig(r=4, alpha=8)

mesh = distributed.make_global_mesh(MeshAxes(dp=nproc, fsdp=2, tp=2))

params = init_params(jax.random.PRNGKey(0), CFG, quantized=True)
params = jax.tree_util.tree_map(
    jax.device_put, params, sharded_param_shardings(params, mesh)
)
lora = init_lora_params(jax.random.PRNGKey(1), CFG, LCFG)
opt = make_optimizer("paged_adamw_32bit", 1e-3, total_steps=10)
state = init_sharded_train_state(lora, opt, mesh)
step = make_sharded_train_step(CFG, LCFG, opt, mesh, params, state,
                               donate=False)

# deterministic global batch; each process contributes its dp-block rows
B_global, S = 8, 16
ids_global = np.asarray(
    jax.random.randint(jax.random.PRNGKey(2), (B_global, S), 0, CFG.vocab_size)
)
rows_per_proc = B_global // nproc
lo = pid * rows_per_proc
local = {
    "input_ids": ids_global[lo:lo + rows_per_proc],
    "attention_mask": np.ones((rows_per_proc, S), np.int32),
    "labels": ids_global[lo:lo + rows_per_proc],
}
batch = distributed.global_batch_from_local(mesh, local)

losses, gnorms = [], []
for i in range(2):
    state, m = step(state, params, batch, jax.random.PRNGKey(50 + i))
    losses.append(float(m["loss"]))
    gnorms.append(float(m["grad_norm"]))

with open(os.path.join(outdir, f"result_{pid}.json"), "w") as f:
    json.dump({"losses": losses, "grad_norms": gnorms,
               "process_count": jax.process_count()}, f)
print(f"worker {pid} done: losses={losses}")
