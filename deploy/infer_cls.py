"""Direction-classifier inference CLI (reference deploy/pytorch/infer_cls.py)."""

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
from common import JitRunner, build_infer_model, load_variables, padded_pow2_batch
from utils import draw_cls_res, load_config, show_image


def parse_args():
    parser = argparse.ArgumentParser(description="pytorchocr_tpu cls_model infer")
    parser.add_argument("--config", type=str, help="configuration file to use")
    parser.add_argument("--model_path", type=str, help="checkpoint dir to use")
    parser.add_argument("--img_path", type=str, help="test img-path or img-dir")
    parser.add_argument("--show", action="store_true", help="show results")
    parser.add_argument("--out_dir", type=str, help="output directory")
    return parser.parse_args()


class Clser:
    def __init__(self, cls_cfg, cls_ckpt):
        cls_cfg = load_config(cls_cfg)
        cls_cfg["Global"]["distributed"] = False
        model = build_infer_model(cls_cfg)
        variables = load_variables(cls_ckpt)
        self.runner = JitRunner(model, variables)
        self.cls_post_process_class = build_post_process(
            cls_cfg["PostProcess"], cls_cfg["Global"]
        )
        cls_transforms = []
        self.cls_img_mode = "RGB"
        for op in cls_cfg["Eval"]["dataset"]["transforms"]:
            op_name = list(op)[0]
            if "DecodeImage" in op_name:
                self.cls_img_mode = op[op_name]["img_mode"]
                continue
            if "Label" in op_name:
                continue
            if op_name == "KeepKeys":
                op[op_name]["keep_keys"] = ["image"]
            cls_transforms.append(op)
        self.cls_ops = create_operators(cls_transforms, cls_cfg["Global"])

    def _prep(self, bgr_img):
        if self.cls_img_mode == "GRAY":
            cls_img = cv2.cvtColor(bgr_img, cv2.COLOR_BGR2GRAY)
        elif self.cls_img_mode == "RGB":
            cls_img = cv2.cvtColor(bgr_img, cv2.COLOR_BGR2RGB)
        else:
            cls_img = bgr_img.copy()
        return transform({"image": cls_img}, self.cls_ops)[0]

    def run(self, img_path):
        img = cv2.imdecode(np.fromfile(str(img_path), dtype=np.uint8), cv2.IMREAD_COLOR)
        cls_img = self._prep(img)[None]
        cls_preds = self.runner(cls_img)
        pred_cls, prob = self.cls_post_process_class(cls_preds)[0]
        return pred_cls, round(float(prob), 2)

    def run_batch(self, bgr_imgs):
        """Padded-batch classification over many crops (TPU fast path).
        Batch padded to the next power of two (<=512) so arbitrary crop
        counts reuse a handful of compiled graphs (see Recer.run_batch)."""
        if not bgr_imgs:
            return []
        out = []
        MAX_BS = 512
        for c in range(0, len(bgr_imgs), MAX_BS):
            chunk = [self._prep(im) for im in bgr_imgs[c : c + MAX_BS]]
            batch, _ = padded_pow2_batch(chunk)
            cls_preds = self.runner(batch)
            res = self.cls_post_process_class(cls_preds)
            out.extend((cl, round(float(p), 2)) for cl, p in res[: len(chunk)])
        return out


def main():
    args = parse_args()
    clser = Clser(args.config, args.model_path)

    assert os.path.exists(args.img_path), "img_path not exists"
    img_paths = []
    if os.path.isfile(args.img_path):
        img_paths.append(Path(args.img_path))
    else:
        for img_path in Path(args.img_path).glob("*.[jp][pn]g"):
            img_paths.append(img_path)

    out_dir = Path(args.out_dir or "./output")
    out_dir.mkdir(exist_ok=True, parents=True)

    for img_path in img_paths:
        pred_cls, prob = clser.run(str(img_path))
        save_txt_path = out_dir.joinpath("res_" + str(img_path.stem) + ".txt")
        with open(str(save_txt_path), "w", encoding="UTF-8") as fp:
            fp.write(pred_cls + "," + str(prob) + "\n")
        save_img_path = out_dir.joinpath("res_" + str(img_path.stem) + ".jpg")
        res_img = draw_cls_res(pred_cls, prob, str(img_path), str(save_img_path))
        if args.show:
            show_image("cls_res", res_img)


if __name__ == "__main__":
    main()
