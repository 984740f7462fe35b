"""End-to-end OCR CLI: det -> sorted boxes -> perspective crops ->
optional cls -> rec (reference deploy/pytorch/run_ocr.py:51-282).

TPU divergence (the main legal speedup, SURVEY.md §3.3): all text-line
crops of an image are classified and recognized in PADDED BATCHES — the
reference crosses the device boundary twice per line.
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

from pytorchocr_tpu.utils.utility import get_part_img
from infer_cls import Clser
from infer_det import Deter
from infer_rec import Recer
from utils import draw_ocr_res, show_image


def parse_args():
    parser = argparse.ArgumentParser(description="pytorchocr_tpu end-to-end OCR")
    parser.add_argument("--det_config", type=str, required=True)
    parser.add_argument("--det_model_path", type=str, required=True)
    parser.add_argument("--rec_config", type=str, required=True)
    parser.add_argument("--rec_model_path", type=str, required=True)
    parser.add_argument("--cls_config", type=str, default=None)
    parser.add_argument("--cls_model_path", type=str, default=None)
    parser.add_argument("--character_dict_path", type=str, default=None)
    parser.add_argument("--img_path", type=str, required=True)
    parser.add_argument("--show", action="store_true")
    parser.add_argument("--out_dir", type=str)
    parser.add_argument("--font_path", type=str, default=None)
    parser.add_argument(
        "--det_quant",
        action="store_true",
        help="int8-PTQ detection forward (calibrates on the input pages; "
        "accuracy delta vs bf16 measured in QUALITY.md: -0.0005 hmean)",
    )
    return parser.parse_args()


class OCRer:
    def __init__(
        self,
        det_config,
        det_model_path,
        rec_config,
        rec_model_path,
        cls_config=None,
        cls_model_path=None,
        character_dict_path=None,
        det_quant=False,
    ):
        self.deter = Deter(det_config, det_model_path, quant=det_quant)
        self.recer = Recer(rec_config, rec_model_path, character_dict_path)
        self.clser = (
            Clser(cls_config, cls_model_path)
            if cls_config and cls_model_path
            else None
        )

    def run(self, img_path):
        # decode once; det reuses the array (it used to re-decode the file)
        img = cv2.imdecode(np.fromfile(str(img_path), dtype=np.uint8), cv2.IMREAD_COLOR)
        boxes = self.deter.run(img)

        # crop all lines first (host), then batch the device work
        part_imgs = []
        for box in boxes:
            part_img = get_part_img(img, np.asarray(box, dtype=np.float32))
            h, w = part_img.shape[:2]
            if h >= 1.5 * w:
                part_img = np.rot90(part_img, 1)
            part_imgs.append(part_img)

        if self.clser is not None and part_imgs:
            cls_results = self.clser.run_batch(part_imgs)
            part_imgs = [
                cv2.rotate(im, cv2.ROTATE_180) if cls_res[0] == "180" else im
                for im, cls_res in zip(part_imgs, cls_results)
            ]

        rec_results = self.recer.run_batch(part_imgs)
        return [
            [np.asarray(box), text, prob]
            for box, (text, prob) in zip(boxes, rec_results)
        ]

    def run_many(self, img_paths):
        """Fully batched multi-page OCR: ONE padded det forward per page
        shape/size bucket, then ONE cls and ONE rec padded batch over the
        text lines of ALL pages.  This is the throughput entry point — the
        per-stage device dispatches are amortized over the whole page set
        instead of paid per page (and the reference pays them per LINE,
        reference deploy/pytorch/run_ocr.py:187-227).  Returns one result
        list per page, same format as run().
        """
        imgs = [
            cv2.imdecode(np.fromfile(str(p), dtype=np.uint8), cv2.IMREAD_COLOR)
            for p in img_paths
        ]
        boxes_per_page = self.deter.run_batch(imgs)

        part_imgs = []
        for img, boxes in zip(imgs, boxes_per_page):
            for box in boxes:
                part_img = get_part_img(img, np.asarray(box, dtype=np.float32))
                h, w = part_img.shape[:2]
                if h >= 1.5 * w:
                    part_img = np.rot90(part_img, 1)
                part_imgs.append(part_img)

        if self.clser is not None and part_imgs:
            cls_results = self.clser.run_batch(part_imgs)
            part_imgs = [
                cv2.rotate(im, cv2.ROTATE_180) if cls_res[0] == "180" else im
                for im, cls_res in zip(part_imgs, cls_results)
            ]

        rec_results = self.recer.run_batch(part_imgs) if part_imgs else []
        out = [[] for _ in img_paths]
        line = 0
        for pi, boxes in enumerate(boxes_per_page):
            for box in boxes:
                text, prob = rec_results[line]
                out[pi].append([np.asarray(box), text, prob])
                line += 1
        return out


def main():
    args = parse_args()
    ocrer = OCRer(
        args.det_config,
        args.det_model_path,
        args.rec_config,
        args.rec_model_path,
        args.cls_config,
        args.cls_model_path,
        args.character_dict_path,
        det_quant=args.det_quant,
    )

    assert os.path.exists(args.img_path), "img_path not exists"
    img_paths = []
    if os.path.isfile(args.img_path):
        img_paths.append(Path(args.img_path))
    else:
        for img_path in Path(args.img_path).glob("*.[jp][pn]g"):
            img_paths.append(img_path)

    out_dir = Path(args.out_dir or "./output")
    out_dir.mkdir(exist_ok=True, parents=True)

    all_res = ocrer.run_many([str(p) for p in img_paths])
    for img_path, ocr_res in zip(img_paths, all_res):
        save_txt_path = out_dir.joinpath("res_" + str(img_path.stem) + ".txt")
        with open(str(save_txt_path), "w", encoding="UTF-8") as fp:
            for box, text, prob in ocr_res:
                tmp = [str(coor) for coor in box.reshape(-1).tolist()]
                tmp.append(text)
                tmp.append(str(prob))
                fp.write(",".join(tmp) + "\n")
        save_img_path = out_dir.joinpath("res_" + str(img_path.stem) + ".jpg")
        res_img = draw_ocr_res(ocr_res, str(img_path), str(save_img_path), args.font_path)
        if not ocr_res:
            print("[info] 0 text boxes detected in {}".format(img_path))
        if args.show:
            show_image("ocr_res", res_img)


if __name__ == "__main__":
    main()
