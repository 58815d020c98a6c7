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

# Persistent compilation cache: the suite is compile-dominated on one CPU
# core (hundreds of jit graphs), and the cache cuts repeat full-suite runs
# by reusing every unchanged executable. Keyed by jaxlib version + HLO, so
# stale hits are impossible; safe to delete any time.
jax.config.update(
    "jax_compilation_cache_dir",
    os.environ.get("DRTK_TPU_TEST_CACHE", "/tmp/drtk_tpu_jit_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)


# ---------------------------------------------------------------------------
# Suite parts: `pytest tests/ --suite-part N` (N in 1..3) runs one of three
# documented, time-balanced thirds (CLAUDE.md budget: each part <= 10 min
# cold on one CPU core). Files not named below land in part 3 so new test
# files are never silently skipped; test_parts_cover_all_files guards the
# mapping.
# ---------------------------------------------------------------------------

SUITE_PARTS = {
    # part 1: the two slowest op suites (scatter + mipmap) + torch parity
    1: [
        "test_grid_scatter.py",
        "test_mipmap_grid_sample.py",
        "test_grid_sample.py",
        "test_reference_parity.py",
    ],
    # part 2: rasterizer kernels + edge gradients + convergence fits
    2: [
        "test_rasterize_pallas.py",
        "test_edge_grad.py",
        "test_two_triangles.py",
    ],
    # part 3: everything else (interpolate, render, msi, filter2d, sharding,
    # utils, docs/typing gates, ...)
    3: [],
}


def pytest_addoption(parser):
    parser.addoption(
        "--suite-part", type=int, default=None, choices=[1, 2, 3],
        help="run one of the three documented time-balanced suite thirds",
    )


def pytest_collection_modifyitems(config, items):
    part = config.getoption("--suite-part")
    if part is None:
        return
    named = {f for files in SUITE_PARTS.values() for f in files}
    keep = []
    for item in items:
        fname = os.path.basename(str(item.fspath))
        in_part = (
            fname in SUITE_PARTS[part]
            if part != 3
            else fname not in named
        )
        if in_part:
            keep.append(item)
    items[:] = keep
