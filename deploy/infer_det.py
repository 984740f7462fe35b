"""Detection inference CLI (reference deploy/pytorch/infer_det.py).

Usage:
  python deploy/infer_det.py --config configs/det/det_r18_db.yml \
      --model_path output/det/det_r18_db/best_accuracy \
      --img_path imgs/ --out_dir output/
"""

import argparse
import os
import sys
from pathlib import Path

__dir__ = os.path.dirname(os.path.abspath(__file__))
sys.path.append(__dir__)
sys.path.append(os.path.abspath(os.path.join(__dir__, "..")))

import cv2
import numpy as np

from pytorchocr_tpu.data import create_operators, transform
from pytorchocr_tpu.postprocess import build_post_process
from pytorchocr_tpu.utils.utility import sort_boxes
from common import JitRunner, build_infer_model, load_variables, padded_pow2_batch
from utils import draw_det_res, load_config, show_image


def parse_args():
    parser = argparse.ArgumentParser(description="pytorchocr_tpu det_model infer")
    parser.add_argument("--config", type=str, help="configuration file to use")
    parser.add_argument("--model_path", type=str, help="checkpoint dir to use")
    parser.add_argument("--img_path", type=str, help="test img-path or img-dir")
    parser.add_argument("--show", action="store_true", help="show results")
    parser.add_argument("--out_dir", type=str, help="output directory")
    parser.add_argument(
        "--quant",
        action="store_true",
        help="int8 PTQ inference (~2x MXU rate on v5e — TPU-native analogue "
        "of a TensorRT-int8 engine); calibrates activation scales over the "
        "first --calib_n input images before inference",
    )
    parser.add_argument(
        "--calib_n",
        type=int,
        default=8,
        help="number of input images used for int8 calibration (TRT-int8 "
        "calibrators likewise use a representative sample, not one image)",
    )
    return parser.parse_args()


class Deter:
    def __init__(self, det_cfg, det_ckpt, quant=False):
        det_cfg = load_config(det_cfg)
        det_cfg["Global"]["distributed"] = False
        model = build_infer_model(det_cfg)
        variables = load_variables(det_ckpt)
        self._want_quant = quant
        self.det_post_process_class = build_post_process(
            det_cfg["PostProcess"], det_cfg["Global"]
        )
        # rebuild Eval ops minus label ops, KeepKeys -> [image, shape].
        # ToTensor + Normalize are FOLDED INTO THE DEVICE GRAPH (JitRunner
        # mean/std — the reference needs a custom CUDA kernel for this,
        # trt_utils.py:33-60): the host ships the resized uint8 image, 4x
        # fewer wire bytes than a host-normalized f32 tensor.
        det_transforms = []
        self.det_img_mode = "RGB"
        mean = std = None
        saw_totensor = False
        for op in det_cfg["Eval"]["dataset"]["transforms"]:
            op_name = list(op)[0]
            if "DecodeImage" in op_name:
                self.det_img_mode = op[op_name]["img_mode"]
                continue
            if "Label" in op_name:
                continue
            if op_name == "ToTensor":
                saw_totensor = True  # /255 happens on device (JitRunner scale)
                continue
            if op_name == "Normalize":
                mean = op[op_name]["mean"]
                std = op[op_name]["std"]
                continue
            if op_name == "KeepKeys":
                op[op_name]["keep_keys"] = ["image", "shape"]
            det_transforms.append(op)
        if saw_totensor and mean is None:
            mean, std = [0.0, 0.0, 0.0], [1.0, 1.0, 1.0]  # bare /255
        self.det_ops = create_operators(det_transforms, det_cfg["Global"])
        self.runner = JitRunner(model, variables, mean=mean, std=std)

    def _preprocess(self, img_path):
        # accepts a path OR an already-decoded BGR array (run_ocr.py decodes
        # each page exactly once and shares it across det/crop stages)
        if isinstance(img_path, np.ndarray):
            img = img_path
        else:
            img = cv2.imdecode(
                np.fromfile(str(img_path), dtype=np.uint8), cv2.IMREAD_COLOR
            )
        if self.det_img_mode == "RGB":
            det_img = cv2.cvtColor(img, cv2.COLOR_BGR2RGB)
        else:
            det_img = img.copy()
        det_batch = transform({"image": det_img}, self.det_ops)
        return det_batch[0][None], np.expand_dims(det_batch[1], axis=0)

    def calibrate_on(self, img_paths):
        """int8 calibration over a representative image sample: running
        absmax across all of them, so later images with larger activation
        ranges are not clipped at a single image's stale scale."""
        batches = [self._preprocess(p)[0] for p in img_paths]
        if batches:
            self.runner.calibrate(batches)

    def run(self, img_path):
        det_img, det_shape_list = self._preprocess(img_path)
        if self._want_quant and not self.runner.quant:
            self.runner.calibrate([det_img])  # fallback: single-image calib
        det_preds = self.runner(det_img)
        det_post_result = self.det_post_process_class(det_preds, det_shape_list)
        return sort_boxes(det_post_result[0]["points"])

    def run_batch(self, imgs):
        """Batched detection over decoded BGR arrays: one device forward per
        distinct post-resize shape instead of one per image (the postprocess
        is batch-aware end to end, incl. the on-device CC path).  Returns a
        list of sorted box arrays, one per input image, in input order.
        """
        if not imgs:
            return []
        pre = [self._preprocess(im) for im in imgs]
        if self._want_quant and not self.runner.quant:
            self.runner.calibrate([p[0] for p in pre[: max(1, len(pre) // 2)]])
        groups = {}  # post-resize shape -> indices (DetResizeForTest is
        for i, (det_img, _) in enumerate(pre):  # input-size dependent)
            groups.setdefault(det_img.shape, []).append(i)
        results = [None] * len(imgs)
        MAX_BS = 16
        for idxs in groups.values():
            for c in range(0, len(idxs), MAX_BS):
                chunk = idxs[c : c + MAX_BS]
                # pad to the next power of two: <=5 traced batch sizes per
                # shape instead of one compile per distinct page count
                det_imgs, _ = padded_pow2_batch(
                    [pre[i][0] for i in chunk], combine=np.concatenate
                )
                shape_list, _ = padded_pow2_batch(
                    [pre[i][1] for i in chunk], combine=np.concatenate
                )
                det_preds = self.runner(det_imgs)
                post = self.det_post_process_class(det_preds, shape_list)
                for j, i in enumerate(chunk):
                    results[i] = sort_boxes(post[j]["points"])
        return results


def main():
    args = parse_args()
    deter = Deter(args.config, args.model_path, quant=args.quant)

    assert os.path.exists(args.img_path), "img_path not exists"
    img_paths = []
    if os.path.isfile(args.img_path):
        img_paths.append(Path(args.img_path))
    else:
        for img_path in Path(args.img_path).glob("*.[jp][pn]g"):
            img_paths.append(img_path)

    out_dir = Path(args.out_dir or "./output")
    out_dir.mkdir(exist_ok=True, parents=True)

    if args.quant:
        deter.calibrate_on(img_paths[: max(args.calib_n, 1)])

    for img_path in img_paths:
        boxes = deter.run(str(img_path))
        save_txt_path = out_dir.joinpath("res_" + str(img_path.stem) + ".txt")
        with open(str(save_txt_path), "w", encoding="UTF-8") as fp:
            for box in boxes:
                box = [str(coor) for coor in np.asarray(box).reshape(-1).tolist()]
                fp.write(",".join(box) + "\n")
        save_img_path = out_dir.joinpath("res_" + str(img_path.stem) + ".jpg")
        res_img = draw_det_res(boxes, str(img_path), str(save_img_path))
        if args.show:
            show_image("det_res", res_img)


if __name__ == "__main__":
    main()
