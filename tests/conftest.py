"""Test environment: 8 simulated CPU devices + persistent compilation cache.

Mirrors the reference's workhorse pattern of CPU-simulated multi-device tests
(/root/reference/claude_distributed/test_rl_model.py:11-13: JAX_PLATFORMS=cpu,
JAX_NUM_CPU_DEVICES=4 before importing jax), upgraded to 8 devices so the
(data, fsdp, tensor) = (2, 2, 2) mesh is exercisable.

This box has ONE physical core — compiles dominate test time, so the persistent
compilation cache is load-bearing: a cold run pays every compile once, reruns
are seconds.
"""

import os

_TPU_TESTS = os.environ.get("VVT_TPU_TESTS") == "1"

# NOTE: this environment pre-sets JAX_PLATFORMS=axon (a remote-TPU tunnel
# platform) and a sitecustomize rewrites it — plain env vars are NOT enough to
# select the CPU backend; the jax.config.update below is what actually wins.
# VVT_TPU_TESTS=1 skips the CPU forcing so the tier-3 on-chip tests
# (test_tpu_integration.py) can see the real device:
#     VVT_TPU_TESTS=1 python -m pytest tests/test_tpu_integration.py -q
if not _TPU_TESTS:
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

if not _TPU_TESTS:
    jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", os.path.join(os.path.dirname(__file__), "..", ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp  # noqa: E402
import pytest  # noqa: E402
from flax import nnx  # noqa: E402

from video_vae_tpu.core.config import tiny_config  # noqa: E402
from video_vae_tpu.models.vae import VideoVAE  # noqa: E402


@pytest.fixture(scope="session")
def cfg():
    return tiny_config()


@pytest.fixture(scope="session")
def tiny_model(cfg):
    return nnx.jit(lambda: VideoVAE(cfg.model, nnx.Rngs(0, sampling=1)))()


@pytest.fixture(scope="session")
def tiny_ste_model(cfg):
    model_cfg = cfg.model.replace(selection_mode="ste")
    return nnx.jit(lambda: VideoVAE(model_cfg, nnx.Rngs(0, sampling=1)))()


@pytest.fixture()
def batch(cfg):
    b, t = 2, cfg.data.max_frames
    video = jax.random.uniform(
        jax.random.key(0), (b, t, cfg.model.height, cfg.model.width, cfg.model.channels)
    )
    mask = jnp.ones((b, t)).at[1, t - 3 :].set(0)
    return video, mask
