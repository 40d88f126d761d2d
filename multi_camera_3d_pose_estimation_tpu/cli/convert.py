"""`convert` CLI: import / verify MMPose torch checkpoints.

The reference points `model_paths.yaml` at MMPose zoo `.pth` files
(/root/reference/examples/model_paths.yaml:8-18); this command brings
such a file into this framework:

    mc3d-pose-tpu convert ckpt.pth --model coco_hrnet_w32 --out ckpt.npz
    mc3d-pose-tpu convert ckpt.pth --model coco_swin-b --verify

``--verify`` runs the one-shot import drill
(`models.checkpoint_verify`): strict conversion (missing keys, leftover
keys and shape mismatches abort), then the same state dict is loaded
into the independent torch mirror and both forwards are compared PER
STAGE — a per-layer max-divergence report, exit status 0 only on a full
pass.  torch runs CPU-only; no mmpose needed.
"""

from __future__ import annotations

import argparse
import sys


def main(argv=None):
    p = argparse.ArgumentParser(prog="convert", description=__doc__)
    p.add_argument("checkpoint", help="torch .pth checkpoint path")
    p.add_argument("--model", default="coco_hrnet_w32",
                   help="registry model name the checkpoint targets "
                        "(sets family/cfg/input size)")
    p.add_argument("--num_joints", type=int, default=17)
    p.add_argument("--out", default=None,
                   help="write the converted pytree as an .npz checkpoint "
                        "loadable by build_estimator(checkpoint=...)")
    p.add_argument("--verify", action="store_true",
                   help="run the per-stage torch-mirror agreement drill "
                        "and print the divergence report")
    args = p.parse_args(argv)

    from ..models.registry import MODEL_REGISTRY, resolve_model_name

    spec = MODEL_REGISTRY[resolve_model_name(args.model)]
    family = spec["family"]
    cfg = spec["cfg"]
    input_size = spec["input_size"]

    if args.verify:
        from ..models.checkpoint_verify import format_report, verify_checkpoint

        report = verify_checkpoint(
            args.checkpoint, family, cfg=cfg, num_joints=args.num_joints,
            input_size=input_size,
        )
        print(format_report(report))
        if not report["ok"]:
            raise SystemExit(1)
        if not args.out:
            return

    import jax
    import jax.numpy as jnp

    from ..models import convert as cv
    from ..models.registry import save_checkpoint_npz

    loaders = {"hrnet": cv.load_torch_hrnet, "rtmpose": cv.load_torch_rtmpose,
               "swin": cv.load_torch_swin}
    if family not in loaders:
        print(f"no converter for family '{family}'", file=sys.stderr)
        raise SystemExit(2)
    if family == "hrnet":
        from ..models.hrnet import HRNet

        model = HRNet(num_joints=args.num_joints, cfg=cfg, dtype=jnp.float32)
    elif family == "swin":
        from ..models.swin import SwinPose

        model = SwinPose(num_joints=args.num_joints, cfg=cfg,
                         dtype=jnp.float32)
    else:
        from ..models.rtmpose import RTMPose

        model = RTMPose(num_joints=args.num_joints, input_size=input_size,
                        cfg=cfg, dtype=jnp.float32)
    in_w, in_h = input_size
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, in_h, in_w, 3)))
    variables = loaders[family](variables, args.checkpoint, cfg)
    if args.out:
        save_checkpoint_npz(variables, args.out)
        print(f"converted checkpoint written to {args.out}")
    else:
        n = sum(int(v.size) for v in jax.tree.leaves(variables))
        print(f"conversion OK ({n} values); pass --out to save")


if __name__ == "__main__":
    main()
