"""Training CLI: COCO-format keypoints → trained 2D model checkpoint.

The capability the reference outsources to MMPose's tooling: train the
from-scratch HRNet/RTMPose models on local data (no downloads).

    python -m multi_camera_3d_pose_estimation_tpu train \\
        --annotations ann.json --images imgs/ --model coco_hrnet_w32 \\
        --steps 20000 --out hrnet_w32.npz
"""

from __future__ import annotations

import argparse
import time

import jax
import jax.numpy as jnp

from ..models import HRNet, RTMPose
from ..models.registry import MODEL_REGISTRY, resolve_model_name, save_checkpoint_npz
from ..training import (
    KeypointBatcher,
    TrainState,
    heatmap_mse_loss,
    make_train_step,
    parse_coco_keypoints,
    simcc_kl_loss,
)

__all__ = ["main", "train_model"]


def build_parser():
    p = argparse.ArgumentParser(description="Train a 2D pose model")
    p.add_argument("--annotations", required=True, help="COCO person_keypoints JSON")
    p.add_argument("--images", required=True, help="image directory")
    p.add_argument("--model", default="coco_hrnet_w32")
    p.add_argument("--steps", type=int, default=10000)
    p.add_argument("--batch_size", type=int, default=32)
    p.add_argument("--learning_rate", type=float, default=5e-4)
    p.add_argument("--out", default="model_checkpoint.npz")
    p.add_argument("--resume", default=None, help="TrainState npz to resume from")
    p.add_argument("--checkpoint_every", type=int, default=1000)
    p.add_argument("--log_every", type=int, default=50)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--no_augment", action="store_true")
    p.add_argument("--image_size", type=int, nargs=2, default=(512, 512),
                   metavar=("W", "H"),
                   help="common decode size for source images (static batch "
                        "shapes); match the dataset resolution to avoid "
                        "host-side resampling")
    p.add_argument("--dtype", choices=("bfloat16", "float32"),
                   default="bfloat16",
                   help="activation dtype: bfloat16 on TPU (MXU-native); "
                        "float32 on CPU where bf16 is emulated")
    return p


def train_model(args) -> TrainState:
    spec = MODEL_REGISTRY[resolve_model_name(args.model)]
    in_w, in_h = spec["input_size"]
    dtype = jnp.dtype(getattr(args, "dtype", "bfloat16"))
    if spec["family"] in ("hrnet", "swin"):
        if spec["family"] == "swin":
            from ..models import SwinPose

            model = SwinPose(num_joints=17, cfg=spec["cfg"], dtype=dtype)
        else:
            model = HRNet(num_joints=17, cfg=spec["cfg"], dtype=dtype)

        def loss_fn(outputs, batch):
            return heatmap_mse_loss(
                jnp.moveaxis(outputs, -1, 1), batch["targets"], batch["weights"]
            )

        target = "heatmap"
    else:
        model = RTMPose(num_joints=17, input_size=spec["input_size"],
                        cfg=spec["cfg"], dtype=dtype)

        def loss_fn(outputs, batch):
            px, py = outputs
            return simcc_kl_loss(px, py, batch["lx"], batch["ly"], batch["w"])

        target = "simcc"

    records = parse_coco_keypoints(args.annotations, args.images)
    print(f"{len(records)} training instances")
    batcher = KeypointBatcher(
        records,
        batch_size=args.batch_size,
        input_size=spec["input_size"],
        image_size=tuple(args.image_size),
        target=target,
        seed=args.seed,
        augment=not args.no_augment,
    )

    init_fn, step_fn = make_train_step(model, loss_fn, learning_rate=args.learning_rate)
    state = init_fn(jax.random.PRNGKey(args.seed), jnp.zeros((1, in_h, in_w, 3)))
    if args.resume:
        state = TrainState.load(args.resume, state)
        print(f"resumed at step {state.step}")

    state_path = args.out + ".train_state.npz"
    t0 = time.perf_counter()
    it = iter(batcher)
    try:
        while state.step < args.steps:
            state, loss = step_fn(state, next(it))
            if state.step % args.log_every == 0:
                rate = state.step / max(time.perf_counter() - t0, 1e-9)
                print(f"step {state.step}: loss {float(loss):.5f} ({rate:.1f} it/s)")
            if args.checkpoint_every and state.step % args.checkpoint_every == 0:
                state.save(state_path)
    finally:
        batcher.close()

    state.save(state_path)
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    save_checkpoint_npz(variables, args.out)
    print(f"saved inference checkpoint to {args.out} (train state: {state_path})")
    return state


def main(argv=None):
    train_model(build_parser().parse_args(argv))


if __name__ == "__main__":
    main()
