"""Conv+BN folding preserves backbone outputs exactly."""
import jax
import jax.numpy as jnp
import numpy as np

from simpb_tpu.models.backbone import ResNet
from simpb_tpu.utils.fuse_bn import fuse_backbone_bn


def test_fused_backbone_matches():
    model = ResNet(depth=50)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(2, 64, 64, 3)).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    # randomise the BN stats so the fold actually does something
    stats = jax.tree.map(
        lambda a: jnp.asarray(
            rng.uniform(0.5, 1.5, a.shape).astype(np.float32)
        ),
        variables["batch_stats"],
    )
    variables = {"params": variables["params"], "batch_stats": stats}
    ref = model.apply(variables, x, train=False)

    fp, fs = fuse_backbone_bn(
        {"img_backbone": jax.tree.map(np.asarray, variables["params"])},
        {"img_backbone": jax.tree.map(np.asarray, variables["batch_stats"])},
    )
    fused = model.apply(
        {
            "params": fp["img_backbone"],
            "batch_stats": fs["img_backbone"],
        },
        x,
        train=False,
    )
    for a, b in zip(ref, fused):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=2e-4, rtol=1e-4
        )
