"""PubTabNet label prep CLI (reference tools/data/gen_pubtab_label.py):
PubTabNet jsonl -> absolute-path jsonl, optional train/val split."""

import argparse
import json
import random
from pathlib import Path


def write_to_file(img_dir, samples, out_path):
    with open(str(out_path), "w", encoding="UTF-8") as fp:
        for sample in samples:
            info = json.loads(sample.strip("\n"))
            filename = info["filename"]
            info["img_path"] = str(Path(str(img_dir)).joinpath(filename))
            info.pop("filename")
            fp.write(json.dumps(info, ensure_ascii=False) + "\n")


def gen_pubtab_label(img_dir, label_path, out_path, split_train_val=False,
                     ratio=0.9, extra_out_path=None):
    with open(str(label_path), "r", encoding="UTF-8") as f:
        samples = f.readlines()
    if not split_train_val:
        write_to_file(img_dir, samples, out_path)
        return
    random.shuffle(samples)
    cut = int(len(samples) * ratio)
    write_to_file(img_dir, samples[:cut], out_path)
    write_to_file(img_dir, samples[cut:], extra_out_path)
    print("num of train samples: ", cut)
    print("num of valid samples: ", len(samples) - cut)


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--img_dir", type=str, default=".")
    parser.add_argument("--label_path", type=str, default="table_samples.txt")
    parser.add_argument("--out_path", type=str, default="out_label.txt")
    parser.add_argument("--split_train_val", type=bool, default=False)
    parser.add_argument("--ratio", type=float, default=0.9)
    parser.add_argument("--extra_out_path", type=str, default="val_label.txt")
    args = parser.parse_args()

    print("Generate pubtab label")
    gen_pubtab_label(args.img_dir, args.label_path, args.out_path,
                     args.split_train_val, args.ratio, args.extra_out_path)
