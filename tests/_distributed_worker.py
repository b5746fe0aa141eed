"""Worker process for the two-process distributed smoke test
(tests/test_distributed.py::test_two_process_execution).

Launched with JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID
set by the parent; joins the distributed runtime through the framework's own
entry point (parallel/distributed.py), then proves the multi-process path
end-to-end on the CPU backend:

  1. global device view: 2 processes x 2 local devices -> 4 global;
  2. a process-local-data global array over a 1-D "data" mesh;
  3. a jitted loss+grad whose backward all-reduces over BOTH processes
     (gloo CPU collectives) — the same collective pattern the data-parallel
     GAN step emits on a pod;
  4. numerical agreement with the unsharded single-host computation.
"""

import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))  # repo root
os.environ.setdefault("JAX_PLATFORMS", "cpu")

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_cpu_collectives_implementation", "gloo")

import numpy as np

from wordgesture_gan_tpu.parallel import maybe_init_distributed


def main():
    assert maybe_init_distributed(verbose=False), "distributed init did not trigger"
    assert jax.process_count() == 2, jax.process_count()
    pid = jax.process_index()

    import jax.numpy as jnp
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    devs = jax.devices()
    assert len(devs) == 4, f"expected 4 global devices, got {len(devs)}"
    assert jax.local_device_count() == 2

    mesh = Mesh(np.asarray(devs), ("data",))
    data_sh = NamedSharding(mesh, P("data"))
    repl_sh = NamedSharding(mesh, P())

    # Global batch (16, 8), contiguous block per process (rows 0-7 / 8-15).
    rng = np.random.default_rng(0)
    x_global = rng.normal(size=(16, 8)).astype(np.float32)
    y_global = rng.normal(size=(16, 1)).astype(np.float32)
    w = jnp.asarray(rng.normal(size=(8, 1)).astype(np.float32))

    rows = slice(pid * 8, (pid + 1) * 8)
    x = jax.make_array_from_process_local_data(data_sh, x_global[rows], x_global.shape)
    y = jax.make_array_from_process_local_data(data_sh, y_global[rows], y_global.shape)

    def loss_fn(w, x, y):
        return jnp.mean((x @ w - y) ** 2)

    step = jax.jit(
        jax.value_and_grad(loss_fn),
        in_shardings=(repl_sh, data_sh, data_sh),
        out_shardings=(repl_sh, repl_sh),
    )
    loss, grad = step(w, x, y)

    # Single-host reference on the full batch.
    ref_loss, ref_grad = jax.value_and_grad(loss_fn)(w, jnp.asarray(x_global), jnp.asarray(y_global))
    np.testing.assert_allclose(jax.device_get(loss), float(ref_loss), rtol=1e-6)
    np.testing.assert_allclose(jax.device_get(grad), np.asarray(ref_grad), rtol=1e-5)

    print(f"worker {pid} OK", flush=True)


if __name__ == "__main__":
    sys.exit(main())
