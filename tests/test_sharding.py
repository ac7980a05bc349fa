"""Mesh/sharding policy tests on 8 simulated CPU devices.

Parity ideas: /root/reference/claude_distributed/test_distributed.py (shard
placement, gradient sync) executed on the CPU-simulated mesh (tier-1 pattern).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from video_vae_tpu.parallel.mesh import build_mesh
from video_vae_tpu.parallel.sharding import (
    activate_mesh,
    batch_sharding,
    constrain,
    param_shardings,
    shard_process_local_batch,
)


@pytest.fixture(scope="module")
def mesh222():
    assert len(jax.devices()) >= 8, "conftest must provide 8 CPU devices"
    return build_mesh(2, 2, 2)


def test_build_mesh_shapes(mesh222):
    assert mesh222.shape == {"data": 2, "fsdp": 2, "tensor": 2}
    with pytest.raises(ValueError):
        build_mesh(3, 3, 1)


def test_param_rules_tp_and_fsdp(mesh222):
    fake_state = {
        "encoder": {
            "layers": {
                "0": {
                    "TemporalAttention": {
                        "qkv_projection": {"kernel": jnp.zeros((48, 96)), "bias": jnp.zeros((96,))},
                        "out_projection": {"kernel": jnp.zeros((32, 48))},
                    },
                    "TemporalMLP": {
                        "linear1": {"kernel": jnp.zeros((48, 64))},
                        "linear2": {"kernel": jnp.zeros((64, 48))},
                    },
                }
            }
        },
        "unet": {"bottleneck1": {"conv": {"kernel": jnp.zeros((3, 3, 3, 16, 32))}}},
        "fill_token": jnp.zeros((1, 1, 1, 12)),
    }
    sh = param_shardings(fake_state, mesh222)
    att = sh["encoder"]["layers"]["0"]["TemporalAttention"]
    # column-parallel qkv: output dim on tensor, input dim on fsdp
    assert att["qkv_projection"]["kernel"].spec == P("fsdp", "tensor")
    assert att["qkv_projection"]["bias"].spec == P("tensor")
    # row-parallel out projection
    assert att["out_projection"]["kernel"].spec == P("tensor", "fsdp")
    mlp = sh["encoder"]["layers"]["0"]["TemporalMLP"]
    assert mlp["linear1"]["kernel"].spec == P("fsdp", "tensor")
    assert mlp["linear2"]["kernel"].spec == P("tensor", "fsdp")
    # conv kernel: output channels on fsdp
    assert sh["unet"]["bottleneck1"]["conv"]["kernel"].spec == P(None, None, None, None, "fsdp")
    # tiny irregular param: axes that don't divide evenly stay replicated
    assert sh["fill_token"].spec == P(None, None, None, "fsdp")


def test_indivisible_dims_stay_replicated(mesh222):
    sh = param_shardings({"odd": {"qkv_projection": {"kernel": jnp.zeros((7, 9))}}}, mesh222)
    assert sh["odd"]["qkv_projection"]["kernel"].spec == P(None, None)


def test_batch_sharding_and_ingest(mesh222):
    batch = {
        "video": np.zeros((8, 4, 16, 16, 3), np.float32),
        "mask": np.ones((8, 4), np.float32),
    }
    sharded = shard_process_local_batch(batch, mesh222)
    # compare only the batch entry (PartitionSpec equality counts trailing Nones)
    assert sharded["video"].sharding.spec[0] == ("data", "fsdp")
    # 8 samples over data×fsdp=4 → 2 per shard
    shard_shapes = {s.data.shape for s in sharded["video"].addressable_shards}
    assert shard_shapes == {(2, 4, 16, 16, 3)}


def test_constrain_noop_without_mesh():
    x = jnp.zeros((4, 4))
    assert constrain(x, "data") is x


def test_constrain_applies_spec(mesh222):
    @jax.jit
    def f(x):
        with activate_mesh(mesh222):
            return constrain(x * 2, ("data", "fsdp"))

    x = jax.device_put(jnp.zeros((8, 4)), batch_sharding(mesh222, 2))
    y = f(x)
    assert y.sharding.spec[0] == ("data", "fsdp")


def test_gradient_sync_replicated_params(mesh222):
    """DP gradient all-reduce: grads of replicated params are identical across
    devices (reference: test_distributed.py:159-163)."""
    w = jax.device_put(jnp.ones((4, 4)), jax.NamedSharding(mesh222, P()))
    x = jax.device_put(
        jnp.arange(8 * 4, dtype=jnp.float32).reshape(8, 4),
        batch_sharding(mesh222, 2),
    )

    @jax.jit
    def grad_w(w, x):
        return jax.grad(lambda w: jnp.sum((x @ w) ** 2))(w)

    g = grad_w(w, x)
    # replicated output: every shard identical
    shards = [np.asarray(s.data) for s in g.addressable_shards]
    for s in shards[1:]:
        np.testing.assert_allclose(s, shards[0], rtol=1e-6)
