"""Mesh/sharding helper tests on the virtual 8-device mesh."""
import jax
import jax.numpy as jnp
import numpy as np

from simpb_tpu.parallel.mesh import (
    batch_sharding,
    make_mesh,
    replicated,
    shard_batch,
)


def test_mesh_1d():
    mesh = make_mesh()
    assert mesh.axis_names == ("data",)
    assert mesh.devices.size == 8


def test_mesh_2d_and_shard_batch():
    mesh = make_mesh(num_cam_shards=2)
    assert mesh.axis_names == ("data", "cam")
    batch = {
        "img": jnp.zeros((4, 6, 8, 8, 3)),
        "scalar_per_sample": jnp.zeros((4,)),
        "gt_depth": [jnp.zeros((4, 6, 4, 4))],
    }
    out = shard_batch(batch, mesh)
    assert "cam" in str(out["img"].sharding.spec)
    assert out["scalar_per_sample"].sharding.spec == ("data",)


def test_replicated_matmul_runs():
    mesh = make_mesh()
    x = jax.device_put(jnp.ones((8, 16)), batch_sharding(mesh))
    w = jax.device_put(jnp.ones((16, 4)), replicated(mesh))
    with mesh:
        y = jax.jit(lambda a, b: a @ b)(x, w)
    np.testing.assert_allclose(np.asarray(y), 16.0)
