"""Export a trained model as a serialized XLA executable
(the torch2onnx + onnx2trt replacement: one step, no intermediate format).

  # export (shapes fixed at export time, like a TRT profile)
  python deploy/export_model.py --config configs/det/det_r18_db.yml \
      --model_path output/det/det_r18_db/best_accuracy \
      --shape 1,736,1280,3 --out det_r18_db.xla

  # run
  python deploy/export_model.py --run det_r18_db.xla --shape 1,736,1280,3
"""

import argparse
import os
import sys

__dir__ = os.path.dirname(os.path.abspath(__file__))
sys.path.append(__dir__)
sys.path.append(os.path.abspath(os.path.join(__dir__, "..")))

import numpy as np

from utils import load_config


def parse_args():
    parser = argparse.ArgumentParser(description="pytorchocr_tpu model export")
    parser.add_argument("--config", type=str)
    parser.add_argument("--model_path", type=str)
    parser.add_argument("--shape", type=str, default="1,736,1280,3",
                        help="NHWC input shape, comma separated")
    parser.add_argument("--out", type=str, default="model.xla")
    parser.add_argument("--run", type=str, default=None,
                        help="load a serialized executable and time one call")
    return parser.parse_args()


def export(config_path, model_path, shape, out_path):
    import jax.numpy as jnp

    from common import build_infer_model, export_serialized, load_variables
    from pytorchocr_tpu.postprocess import build_post_process

    config = load_config(config_path)
    config["Global"]["distributed"] = False
    post = build_post_process(config["PostProcess"], config["Global"])
    if hasattr(post, "character"):
        config["Architecture"]["Head"]["out_channels"] = len(post.character)
    model = build_infer_model(config)
    variables = load_variables(model_path)

    def forward(images):
        out = model.apply(variables, images.astype(jnp.float32), train=False)
        return out["maps"] if isinstance(out, dict) else out

    example = jnp.zeros(shape, jnp.float32)
    blob = export_serialized(forward, example)
    with open(out_path, "wb") as f:
        f.write(blob)
    print("exported %s (%.2f MB) for input %s" % (out_path, len(blob) / 1e6, shape))


def run(path, shape):
    import time

    import jax
    import jax.numpy as jnp

    from common import load_serialized

    with open(path, "rb") as f:
        fn = load_serialized(f.read())
    x = jnp.zeros(shape, jnp.float32)
    out = fn(x)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    out = fn(x)
    jax.block_until_ready(out)
    dt = time.perf_counter() - t0
    leaf = jax.tree.leaves(out)[0]
    print("ran %s: output %s in %.2f ms" % (path, leaf.shape, dt * 1e3))


if __name__ == "__main__":
    args = parse_args()
    shape = tuple(int(v) for v in args.shape.split(","))
    if args.run:
        run(args.run, shape)
    else:
        assert args.config and args.model_path, "--config and --model_path required"
        export(args.config, args.model_path, shape, args.out)
