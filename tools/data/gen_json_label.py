"""Dataset preparation CLI (reference tools/data/gen_json_label.py):
det: per-image txt of 8 coords(+text) -> JSON-line label file, optional
clockwise sort via minAreaRect, train/val split; rec: text-file labels.
"""

import argparse
import json
import random
from pathlib import Path

import cv2
import numpy as np
from PIL import Image

from pytorchocr_tpu.utils.geometry import order_points_clockwise

random.seed(2022)


def get_boxes(img_path, label_path, sort_pts=False):
    boxes, txts = [], []
    if sort_pts:
        img_h, img_w = cv2.imdecode(
            np.fromfile(img_path, dtype=np.uint8), cv2.IMREAD_COLOR
        ).shape[:2]
    with open(label_path, "r", encoding="UTF-8") as fid:
        for line in fid.readlines():
            line = line.replace("﻿", "").replace("\xef\xbb\xbf", "").strip("\n")
            label = line.split(",")
            box = [int(round(float(pt), 0)) for pt in label[:8]]
            if len(box) == 8 and sort_pts:
                rect = cv2.minAreaRect(np.array(box, dtype=np.int32).reshape(-1, 2))
                box = cv2.boxPoints(rect)
                box = order_points_clockwise(np.array(box, dtype=np.float32))
                box[:, 0] = np.clip(box[:, 0], 0, img_w - 1)
                box[:, 1] = np.clip(box[:, 1], 0, img_h - 1)
                box = box.astype(np.int32).tolist()
            else:
                box = np.array(box, dtype=np.int32).reshape(-1, 2).tolist()
            txts.append("".join(label[8:]))
            boxes.append(box)
    return boxes, txts


def check_img(img_path):
    img = cv2.imdecode(np.fromfile(img_path, dtype=np.uint8), cv2.IMREAD_COLOR)
    if img is None:
        try:
            img = Image.open(img_path).convert("RGB")
            img.save(img_path)
        except Exception:
            print(img_path + " is a bad image")
            return False
    return True


def _label_path_for(img_path, label_dir):
    if "dir_name:" not in str(label_dir):
        return Path(str(label_dir)).joinpath(str(img_path.stem) + ".txt")
    return Path(
        str(
            img_path.parent.parent.joinpath(
                str(label_dir).split(":")[-1].strip()
            )
        )
    ).joinpath(str(img_path.stem) + ".txt")


def write_to_file_det(img_paths, label_dir, out_path, delimiter="\t", sort_pts=False):
    with open(str(out_path), "w", encoding="UTF-8") as fp:
        for img_path in img_paths:
            label_path = _label_path_for(img_path, label_dir)
            if not check_img(str(img_path)) or not label_path.is_file():
                print("can not find " + str(label_path))
                continue
            boxes, txts = get_boxes(str(img_path), str(label_path), sort_pts)
            label = [
                {"transcription": txt, "points": box}
                for box, txt in zip(boxes, txts)
            ]
            fp.write(
                str(img_path) + delimiter + json.dumps(label, ensure_ascii=False) + "\n"
            )


def write_to_file_rec(img_paths, label_dir, out_path, delimiter="\t"):
    with open(str(out_path), "w", encoding="UTF-8") as fp:
        for img_path in img_paths:
            label_path = _label_path_for(img_path, label_dir)
            if not check_img(str(img_path)) or not label_path.is_file():
                print("can not find " + str(label_path))
                continue
            with open(str(label_path), "r", encoding="UTF-8") as f:
                label = f.readline().strip("\n").replace(" ", "")
            fp.write(str(img_path) + delimiter + label + "\n")


def _split_and_write(img_paths, writer, label_dir, out_path, delimiter,
                     split_train_val, ratio, extra_out_path, **kwargs):
    if not split_train_val:
        writer(img_paths, label_dir, out_path, delimiter, **kwargs)
        return
    random.shuffle(img_paths)
    n = len(img_paths)
    cut = int(n * ratio)
    writer(img_paths[:cut], label_dir, out_path, delimiter, **kwargs)
    writer(img_paths[cut:], label_dir, extra_out_path, delimiter, **kwargs)
    print("num of train samples: ", cut)
    print("num of valid samples: ", n - cut)


def gen_det_label(img_dir, label_dir, out_path, delimiter="\t",
                  split_train_val=False, ratio=0.9, extra_out_path=None,
                  sort_pts=False):
    img_paths = list(Path(str(img_dir)).rglob("*.[jp][pn]g"))
    _split_and_write(
        img_paths, write_to_file_det, label_dir, out_path, delimiter,
        split_train_val, ratio, extra_out_path, sort_pts=sort_pts,
    )


def gen_rec_label(img_dir, label_dir, out_path, delimiter="\t",
                  split_train_val=False, ratio=0.9, extra_out_path=None):
    img_paths = list(Path(str(img_dir)).rglob("*.[jp][pn]g"))
    _split_and_write(
        img_paths, write_to_file_rec, label_dir, out_path, delimiter,
        split_train_val, ratio, extra_out_path,
    )


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--mode", type=str, default="det", help="rec or det")
    parser.add_argument("--img_dir", type=str, default=".")
    parser.add_argument("--label_dir", type=str, default="dir_name:gt")
    parser.add_argument("--out_path", type=str, default="out_label.txt")
    parser.add_argument("--delimiter", type=str, default="\t")
    parser.add_argument("--sort_pts", type=bool, default=False)
    parser.add_argument("--split_train_val", type=bool, default=False)
    parser.add_argument("--ratio", type=float, default=0.9)
    parser.add_argument("--extra_out_path", type=str, default="val_label.txt")
    args = parser.parse_args()

    if args.mode == "det":
        print("Generate det label")
        gen_det_label(args.img_dir, args.label_dir, args.out_path, args.delimiter,
                      args.split_train_val, args.ratio, args.extra_out_path,
                      args.sort_pts)
    elif args.mode == "rec":
        print("Generate rec label")
        gen_rec_label(args.img_dir, args.label_dir, args.out_path, args.delimiter,
                      args.split_train_val, args.ratio, args.extra_out_path)
