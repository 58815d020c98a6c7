import os

# Tests run on a virtual 8-device CPU mesh: sharding tests need multiple
# devices, and CPU keeps the suite runnable anywhere. The real-TPU path is
# exercised by bench.py / __graft_entry__.py.
os.environ.setdefault("JAX_PLATFORM_NAME", "cpu")
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# Float64 is required by the *_ref oracles (the reference runs its refs in
# double precision too: drtk/render.py:70-74).
jax.config.update("jax_enable_x64", True)
