"""shard_params_tp placement rules on the 2D (data, model) mesh."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from reid_tpu.parallel import make_mesh_2d, shard_params_tp

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices")


def test_tp_placement_rules():
    mesh = make_mesh_2d(4, 2)
    params = {
        "classifier": {"kernel": jnp.zeros((512, 752))},   # out dim % 2 == 0
        "small": {"kernel": jnp.zeros((8, 8))},            # too small
        "centers": jnp.zeros((752, 512)),                  # first dim shards
        "scalar": jnp.zeros((7,)),
    }
    placed = shard_params_tp(mesh, params, min_size=1024)
    spec = placed["classifier"]["kernel"].sharding.spec
    assert tuple(spec) == (None, "model")
    assert placed["small"]["kernel"].sharding.is_fully_replicated
    spec_c = placed["centers"].sharding.spec
    assert tuple(spec_c) == (None, "model") or tuple(spec_c) == ("model", None)
    assert placed["scalar"].sharding.is_fully_replicated


def test_tp_matmul_runs_sharded():
    mesh = make_mesh_2d(4, 2)
    w = shard_params_tp(mesh, {"k": jnp.ones((256, 512))},
                        min_size=1024)["k"]
    x = jnp.ones((8, 256))

    @jax.jit
    def f(x, w):
        return jnp.dot(x, w)

    out = f(x, w)
    np.testing.assert_allclose(np.asarray(out), 256.0)
    assert out.shape == (8, 512)
