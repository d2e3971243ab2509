"""Test configuration.

Tests run on the JAX CPU backend with 8 virtual devices — the standard JAX
way to exercise mesh/collective code without a TPU slice (SURVEY §4). This
must happen before jax is imported anywhere.
"""

import os

# Force-set (not setdefault): the machine environment pins JAX_PLATFORMS to
# the tunneled TPU platform, which would silently route every unit test
# through a per-dispatch RPC. Tests always run on host CPU.
os.environ["JAX_PLATFORMS"] = "cpu"
# The machine's sitecustomize additionally calls
# jax.config.update("jax_platforms", "axon,cpu") at interpreter start,
# overriding the env var — undo it before any backend initializes. For the
# same reason (jax is already imported when conftest runs) the cache env
# vars above are set too late, so mirror them through jax.config.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.1)
# Persistent compilation cache: model-zoo tests are compile-bound, repeat
# runs hit the cache.
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "-1")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.1")
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import numpy as np  # noqa: E402
import pytest  # noqa: E402
from PIL import Image  # noqa: E402

SCENE_SHAPE = (96, 128)  # tiny stand-in for GID15's 6800x7200
NUM_SCENES = 4
PATCH = 32


def _make_scene(rng: np.random.Generator, shape):
    h, w = shape
    image = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
    # blocky label structure so classes are spatially coherent
    mask = rng.integers(0, 16, size=(h // 8, w // 8), dtype=np.uint8)
    mask = np.kron(mask, np.ones((8, 8), dtype=np.uint8))
    return image, mask


@pytest.fixture(scope="session")
def gid15_root(tmp_path_factory):
    """Synthetic GID15-style dataset root with 4 tiny scenes."""
    from cvcs_tpu.data.palette import PALETTE

    root = tmp_path_factory.mktemp("gid15")
    (root / "Image__8bit_NirRGB").mkdir()
    (root / "Annotation__index").mkdir()
    (root / "Annotation__color").mkdir()
    rng = np.random.default_rng(0)
    for i in range(NUM_SCENES):
        image, mask = _make_scene(rng, SCENE_SHAPE)
        stem = f"scene_{i:02d}"
        Image.fromarray(image).save(root / "Image__8bit_NirRGB" / f"{stem}.png")
        Image.fromarray(mask).save(
            root / "Annotation__index" / f"{stem}_15label.png")
        Image.fromarray(PALETTE[mask]).save(
            root / "Annotation__color" / f"{stem}_15label.tif")
    return root
