#!/usr/bin/env python
"""Export an AOT serving artifact (weights-baked StableHLO program).

The artifact runs WITHOUT model code via `jax.export.deserialize`
(`simpb_tpu/utils/export.py::ServingModel`): one call = one streaming
frame -> decoded detections + the threaded temporal-state tuple. The
TPU-native analogue of the reference's torch->deploy path (the
reference ships no exporter; downstream users ONNX it by hand).

Usage:
  python tools/export.py --config r50-fast --out simpb_r50_fast.jaxexport
      [--checkpoint DIR | --torch-checkpoint F.pth]
      [--platforms tpu cpu] [--batch-size 1] [--smoke] [--cpu]
"""
import argparse
import dataclasses
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument("--config", default="r50-fast",
                   choices=["r50", "r50-fast", "r101", "r101-fast",
                            "tiny"])
    p.add_argument("--out", required=True)
    p.add_argument("--checkpoint", default=None,
                   help="orbax checkpoint dir (params + batch_stats)")
    p.add_argument("--torch-checkpoint", default=None,
                   help="reference .pth to convert and embed")
    p.add_argument("--platforms", nargs="*", default=None,
                   help="export platforms (default: current backend)")
    p.add_argument("--batch-size", type=int, default=1)
    p.add_argument("--fp32", action="store_true",
                   help="keep fp32 compute (default bfloat16)")
    p.add_argument("--smoke", action="store_true",
                   help="deserialize and run 2 frames as a self-check")
    p.add_argument("--cpu", action="store_true")
    p.add_argument("--fused-trunk", action="store_true",
                   help="embed the fused Pallas serving trunk "
                        "(BN-folded numerics; TPU-platform artifacts)")
    return p.parse_args()


def main():
    args = parse_args()
    if args.cpu:
        os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    from simpb_tpu.configs.base import (
        simpb_r50_704x256, simpb_r50_704x256_fast,
        simpb_r101_1408x512, simpb_r101_1408x512_fast, simpb_tiny,
    )
    from simpb_tpu.models.detector import SimPB
    from simpb_tpu.utils.export import ServingModel, export_serving
    from simpb_tpu.utils.synthetic import synthetic_rig

    cfg = {
        "r50": simpb_r50_704x256,
        "r50-fast": simpb_r50_704x256_fast,
        "r101": simpb_r101_1408x512,
        "r101-fast": simpb_r101_1408x512_fast,
        "tiny": simpb_tiny,
    }[args.config]()
    if not args.fp32 and args.config != "tiny":
        cfg = dataclasses.replace(
            cfg, compute_dtype="bfloat16", head_dtype="bfloat16"
        )
    if args.fused_trunk:
        plats = [p.lower() for p in (args.platforms or [jax.default_backend()])]
        if len(set(plats)) > 1:
            raise SystemExit(
                "--fused-trunk artifacts are single-platform: the Pallas "
                "kernels embed either compiled Mosaic custom calls (tpu) "
                "or their interpreted form (cpu), not both"
            )
        cfg = dataclasses.replace(
            cfg,
            backbone_fused_infer=True,
            # pin interpret by TARGET platform, not the tracing host: a
            # TPU artifact exported from a CPU host must embed compiled
            # Mosaic kernels
            backbone_fused_interpret=plats[0] == "cpu",
        )

    model = SimPB(cfg)
    bs, cams = args.batch_size, cfg.head.num_cams
    w, h = cfg.input_size
    img0 = jnp.zeros((bs, cams, h, w, 3), jnp.float32)
    proj0 = jnp.asarray(synthetic_rig(bs, image_wh=(w, h)))
    variables = jax.jit(
        lambda: model.init(
            {"params": jax.random.PRNGKey(0),
             "aug": jax.random.PRNGKey(1),
             "dropout": jax.random.PRNGKey(2),
             "sampling": jax.random.PRNGKey(3)},
            img0, proj0, train=False,
        )
    )()
    variables = jax.tree.map(np.asarray, variables)

    if args.torch_checkpoint:
        from simpb_tpu.utils.torch_convert import (
            load_torch_checkpoint, merge_params)

        p_, s_ = load_torch_checkpoint(args.torch_checkpoint, cfg)
        variables["params"] = merge_params(variables["params"], p_)
        variables["batch_stats"] = merge_params(
            variables.get("batch_stats", {}), s_
        )
    elif args.checkpoint:
        import orbax.checkpoint as ocp

        loaded = ocp.PyTreeCheckpointer().restore(
            os.path.abspath(args.checkpoint)
        )
        variables["params"] = loaded["params"]
        variables["batch_stats"] = loaded["batch_stats"]
    else:
        print("WARNING: exporting RANDOM weights (no checkpoint given)",
              flush=True)

    data = export_serving(
        cfg, variables, batch_size=bs,
        platforms=tuple(args.platforms) if args.platforms else None,
    )
    with open(args.out, "wb") as f:
        f.write(data)
    print(f"wrote {args.out}: {len(data) / 1e6:.1f} MB "
          f"(platforms={args.platforms or 'native'})", flush=True)

    if args.smoke:
        served = ServingModel.load(data)
        hc = cfg.head
        temporal = served.init_temporal(
            bs, hc.num_temp_instances, hc.num_anchor, hc.embed_dims
        )
        rng = np.random.default_rng(0)
        img = jnp.asarray(
            rng.normal(size=(bs, cams, h, w, 3)).astype(np.float32)
        )
        t2c = jnp.tile(jnp.eye(4)[None], (bs, 1, 1))
        out = served(img, proj0, jnp.full((bs,), 5.0), t2c, temporal)
        out = served(img, proj0, jnp.full((bs,), 0.5), t2c,
                     out["temporal"])
        scores = np.asarray(out["scores"], np.float32)
        assert np.isfinite(scores).all()
        print(f"smoke OK: top score {float(scores.max()):.4f}, "
              f"{int(np.asarray(out['valid']).sum())} above threshold",
              flush=True)


if __name__ == "__main__":
    main()
