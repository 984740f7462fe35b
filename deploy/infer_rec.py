"""Recognition inference CLI (reference deploy/pytorch/infer_rec.py).

Usage:
  python deploy/infer_rec.py --config configs/rec/rec_vgg_bilstm_ctc.yml \
      --model_path output/rec/.../best_accuracy --img_path line.png
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
from common import JitRunner, build_infer_model, load_variables, padded_pow2_batch
from utils import draw_rec_res, load_config, show_image


def parse_args():
    parser = argparse.ArgumentParser(description="pytorchocr_tpu rec_model infer")
    parser.add_argument("--config", type=str, help="configuration file to use")
    parser.add_argument("--model_path", type=str, help="checkpoint dir to use")
    parser.add_argument("--img_path", type=str, help="test img-path or img-dir")
    parser.add_argument("--character_dict_path", type=str, default=None)
    parser.add_argument("--show", action="store_true", help="show results")
    parser.add_argument("--out_dir", type=str, help="output directory")
    return parser.parse_args()


class Recer:
    def __init__(self, rec_cfg, rec_ckpt, character_dict_path=None):
        rec_cfg = load_config(rec_cfg)
        rec_cfg["Global"]["distributed"] = False
        if character_dict_path is not None:
            rec_cfg["Global"]["character_dict_path"] = character_dict_path
        self.rec_post_process_class = build_post_process(
            rec_cfg["PostProcess"], rec_cfg["Global"]
        )
        char_num = len(getattr(self.rec_post_process_class, "character"))
        rec_cfg["Architecture"]["Head"]["out_channels"] = char_num
        model = build_infer_model(rec_cfg)
        variables = load_variables(rec_ckpt)
        self.runner = JitRunner(model, variables)

        rec_transforms = []
        self.rec_img_mode = "GRAY"
        for op in rec_cfg["Eval"]["dataset"]["transforms"]:
            op_name = list(op)[0]
            if "DecodeImage" in op_name:
                self.rec_img_mode = op[op_name]["img_mode"]
                continue
            if "Label" in op_name:
                continue
            if op_name == "KeepKeys":
                op[op_name]["keep_keys"] = ["image"]
            rec_transforms.append(op)
        self.rec_ops = create_operators(rec_transforms, rec_cfg["Global"])

    def _prep(self, bgr_img):
        if self.rec_img_mode == "GRAY":
            rec_img = cv2.cvtColor(bgr_img, cv2.COLOR_BGR2GRAY)
        elif self.rec_img_mode == "RGB":
            rec_img = cv2.cvtColor(bgr_img, cv2.COLOR_BGR2RGB)
        else:
            rec_img = bgr_img.copy()
        return transform({"image": rec_img}, self.rec_ops)[0]

    def run(self, img_path):
        img = cv2.imdecode(np.fromfile(str(img_path), dtype=np.uint8), cv2.IMREAD_COLOR)
        rec_img = self._prep(img)[None]
        rec_preds = self.runner(rec_img)
        text, prob_rec = self.rec_post_process_class(rec_preds)[0]
        return text, round(float(prob_rec), 2)

    def run_batch(self, bgr_imgs):
        """Padded-batch recognition over many line crops (TPU fast path —
        the reference runs one line at a time).  The batch axis is padded
        to the next power of two (<=512) so arbitrary line counts reuse a
        handful of compiled graphs instead of tracing one per count
        (measured: a fresh-count compile through the tunnel cost ~6s,
        ~200 ms/page of a 32-page run)."""
        if not bgr_imgs:
            return []
        out = []
        MAX_BS = 512
        for c in range(0, len(bgr_imgs), MAX_BS):
            chunk = [self._prep(im) for im in bgr_imgs[c : c + MAX_BS]]
            batch, _ = padded_pow2_batch(chunk)
            rec_preds = self.runner(batch)
            res = self.rec_post_process_class(rec_preds)
            out.extend(
                (text, round(float(p), 2)) for text, p in res[: len(chunk)]
            )
        return out


def main():
    args = parse_args()
    recer = Recer(args.config, args.model_path, args.character_dict_path)

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
        text, prob = recer.run(str(img_path))
        save_txt_path = out_dir.joinpath("res_" + str(img_path.stem) + ".txt")
        with open(str(save_txt_path), "w", encoding="UTF-8") as fp:
            fp.write(text + "," + str(prob) + "\n")
        save_img_path = out_dir.joinpath("res_" + str(img_path.stem) + ".jpg")
        res_img = draw_rec_res(text, prob, str(img_path), str(save_img_path))
        if args.show:
            show_image("rec_res", res_img)


if __name__ == "__main__":
    main()
