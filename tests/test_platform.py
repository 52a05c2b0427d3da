"""Backend-selection regressions.

The container's sitecustomize pre-imports jax pinned to the tunneled TPU; a
later `jax.config.update("jax_platforms", "cpu")` only works while the
backends are still uninitialized. Round 2 found module-level jnp.array
constants in models/hashgrid.py silently initializing the backends during
`import spnerf_tpu.models` — which made every "CPU" CLI run execute on the
TPU. These tests pin the fix."""

import pytest
import subprocess
import sys


def _run(code):
    return subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True,
        timeout=240,
    )


def test_importing_the_package_does_not_initialize_backends():
    code = (
        "import spnerf_tpu.cli.train, spnerf_tpu.cli.evaluate\n"
        "import spnerf_tpu.models, spnerf_tpu.ops, spnerf_tpu.train.loop\n"
        "from jax._src import xla_bridge as xb\n"
        "assert not getattr(xb, '_backends', {}), "
        "f'backends initialized at import: {list(xb._backends)}'\n"
        "print('clean')\n"
    )
    r = _run(code)
    assert r.returncode == 0, r.stdout + r.stderr
    assert "clean" in r.stdout


@pytest.mark.slow
def test_entry_points_pin_platform_before_package_imports():
    """main.py / eval.py must apply the platform env before importing the CLI
    module tree, so JAX_PLATFORMS=cpu wins over the sitecustomize TPU pin."""
    code = (
        "import runpy, os, sys\n"
        "os.environ['JAX_PLATFORMS'] = 'cpu'\n"
        "sys.argv = ['main.py', '--help']\n"
        "try:\n"
        "    runpy.run_path('main.py', run_name='not_main')\n"
        "except SystemExit:\n"
        "    pass\n"
        "import jax\n"
        "assert jax.default_backend() == 'cpu', jax.default_backend()\n"
        "print('pinned')\n"
    )
    r = _run(code)
    assert r.returncode == 0, r.stdout + r.stderr
    assert "pinned" in r.stdout
