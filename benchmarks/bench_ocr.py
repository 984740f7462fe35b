"""End-to-end OCR throughput: pages/s through det -> boxes -> crops -> rec.

The reference's end-to-end path crosses the device boundary TWICE PER TEXT
LINE (reference deploy/pytorch/run_ocr.py:187-227 — per-line H2D input and
D2H logits, no batching); deploy/run_ocr.py here batches all lines of a
page. This bench puts a wall-clock number on that design: synthetic
736x1280 pages with ~20 rendered text lines each, full pipeline timed
end-to-end (device forwards + on-device DB postprocess front-half + host
box extraction + perspective crops + padded-batch CTC rec + decode).

A detector with random weights finds no boxes, so the bench first
quick-trains the det model on dark-rectangle synthetic data (~1 min on
TPU) — enough for DB to localize the rendered lines; rec runs with random
weights (identical compute, garbage strings — throughput is unaffected).

Usage: python benchmarks/bench_ocr.py [--pages 16] [--det r18]
Prints one JSON line: {"metric": "ocr_e2e_pages_per_sec", ...}
"""

import argparse
import json
import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..")))
sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..", "deploy")))

H, W = 736, 1280


def render_pages(rng, n_pages, lines_per_page=20):
    """PIL-rendered text lines (dark on light) at page resolution."""
    from PIL import Image, ImageDraw

    pages = []
    for _ in range(n_pages):
        img = Image.new("RGB", (W, H), (232, 232, 228))
        draw = ImageDraw.Draw(img)
        for _ in range(lines_per_page):
            x = int(rng.randint(10, W - 260))
            y = int(rng.randint(10, H - 42))
            w = int(rng.randint(100, 240))
            h = int(rng.randint(22, 34))
            # word-block: filled dark rect + lighter gaps = glyph-ish texture
            draw.rectangle([x, y, x + w, y + h], fill=(25, 22, 28))
            for gx in range(x + 8, x + w - 4, 14):
                draw.line([gx, y + 2, gx, y + h - 2], fill=(70, 70, 80), width=2)
        pages.append(np.asarray(img)[:, :, ::-1].copy())  # BGR like cv2
    return pages


def quick_train_det(arch_cfg, steps=150):
    """Train the det model to localize dark word-blocks (synthetic).

    The training images go through the SAME value pipeline the deploy
    preprocessing applies (uint8 RGB -> /255 -> ImageNet mean/std) and the
    same word-block texture render_pages() draws, so the quick-trained
    model sees the bench pages in-distribution at inference time (round-2
    postmortem: unnormalized 0.9/0.1 training images made the deployed
    detector miss ~95% of lines)."""
    import jax
    import jax.numpy as jnp

    from pytorchocr_tpu.losses import build_loss
    from pytorchocr_tpu.modeling import build_model
    from pytorchocr_tpu.optimizer import build_optimizer
    from pytorchocr_tpu.parallel.mesh import create_mesh, shard_batch
    from pytorchocr_tpu.trainer import create_train_state, make_train_step

    rng = np.random.RandomState(0)
    n, hw = 8, 320
    raw = np.full((n, hw, hw, 3), (232, 232, 228), np.float32)  # page bg
    shrink_map = np.zeros((n, hw, hw), np.float32)
    thresh_map = np.full((n, hw, hw), 0.3, np.float32)
    thresh_mask = np.zeros((n, hw, hw), np.float32)
    for i in range(n):
        for _ in range(8):
            x, y = rng.randint(4, hw - 120), rng.randint(4, hw - 40)
            w, h = rng.randint(60, 110), rng.randint(20, 34)
            raw[i, y : y + h, x : x + w, :] = (25, 22, 28)  # word block
            for gx in range(x + 8, x + w - 4, 14):  # glyph-ish gaps
                raw[i, y + 2 : y + h - 2, gx : gx + 2, :] = (70, 70, 80)
            sx, sy = int(w * 0.2), int(h * 0.2)
            shrink_map[i, y + sy : y + h - sy, x + sx : x + w - sx] = 1.0
    mean = np.array([0.485, 0.456, 0.406], np.float32)
    std = np.array([0.229, 0.224, 0.225], np.float32)
    images = (raw / 255.0 - mean) / std
    shrink_mask = np.ones((n, hw, hw), np.float32)

    model = build_model(arch_cfg)
    loss_fn = build_loss({"name": "DBLoss", "balance_loss": True,
                          "main_loss_type": "BCELoss", "alpha": 1, "beta": 10,
                          "ohem_ratio": 3})
    tx, _ = build_optimizer(
        {"base_lr": 2e-3, "optim": {"name": "Adam"}}, epochs=1, step_each_epoch=1
    )
    mesh = create_mesh(devices=jax.devices()[:1])
    batch = (images, thresh_map, thresh_mask, shrink_map, shrink_mask)
    state = create_train_state(model, tx, jax.random.PRNGKey(0), batch)
    step = make_train_step(model, loss_fn, tx, mesh)
    dbatch = tuple(shard_batch(jnp.asarray(x), mesh) for x in batch)
    for i in range(steps):
        state, losses = step(state, dbatch)
        if i % 25 == 0:
            print("  det quick-train step %d loss %.3f" % (i, float(losses["loss"])),
                  flush=True)
    return state


def save_ckpt(tree, path):
    import orbax.checkpoint as ocp

    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(os.path.abspath(path), tree)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--pages", type=int, default=16)
    ap.add_argument("--lines", type=int, default=20)
    ap.add_argument("--det_config", default="configs/det/det_r18_db.yml")
    ap.add_argument("--rec_config", default="configs/rec/rec_vgg_bilstm_ctc.yml")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp  # noqa: F401

    from pytorchocr_tpu.utils.config import load_config
    from run_ocr import OCRer  # deploy/

    repo = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))
    det_cfg_path = os.path.join(repo, args.det_config)
    rec_cfg_path = os.path.join(repo, args.rec_config)
    det_cfg = load_config(det_cfg_path)

    print("quick-training det model...", flush=True)
    t0 = time.time()
    state = quick_train_det(det_cfg["Architecture"])
    print("  done in %.1fs" % (time.time() - t0), flush=True)

    with tempfile.TemporaryDirectory() as tmp:
        det_ckpt = os.path.join(tmp, "det")
        save_ckpt({"params": state.params, "batch_stats": state.batch_stats},
                  det_ckpt)

        # rec: random weights (same compute cost as trained ones)
        from pytorchocr_tpu.modeling import build_model as _bm
        from pytorchocr_tpu.postprocess import build_post_process as _bpp

        rec_cfg = load_config(rec_cfg_path)
        rec_post = _bpp(rec_cfg["PostProcess"], rec_cfg["Global"])
        if hasattr(rec_post, "character"):
            rec_cfg["Architecture"]["Head"]["out_channels"] = len(rec_post.character)
        rec_model = _bm(rec_cfg["Architecture"])
        shape = (1, 32, 320, rec_cfg["Architecture"].get("in_channels", 3))
        rec_vars = jax.jit(lambda k, x: rec_model.init(k, x, train=False))(
            jax.random.PRNGKey(0), np.zeros(shape, np.float32))
        rec_ckpt = os.path.join(tmp, "rec")
        save_ckpt({"params": rec_vars["params"],
                   "batch_stats": rec_vars.get("batch_stats", {})}, rec_ckpt)

        # int8-PTQ det (the deploy configuration; QUALITY.md: -0.0005 hmean)
        ocr = OCRer(det_cfg_path, det_ckpt, rec_cfg_path, rec_ckpt,
                    det_quant=True)

        rng = np.random.RandomState(7)
        pages = render_pages(rng, args.pages, args.lines)
        page_paths = []
        import cv2

        for i, p in enumerate(pages):
            path = os.path.join(tmp, "page_%03d.png" % i)
            cv2.imwrite(path, p)
            page_paths.append(path)

        # warmup: compile det batch buckets + rec width buckets (run_many is
        # the throughput entry point — batched det over pages, one rec batch
        # over every line of every page)
        print("warmup...", flush=True)
        warm = ocr.run_many(page_paths)
        print("  warm: %d lines over %d pages"
              % (sum(len(r) for r in warm), len(warm)), flush=True)

        t0 = time.time()
        all_res = ocr.run_many(page_paths)
        elapsed = time.time() - t0
        total_lines = sum(len(r) for r in all_res)

    pages_per_sec = args.pages / elapsed
    lines_per_sec = total_lines / elapsed
    print(
        json.dumps(
            {
                "metric": "ocr_e2e_pages_per_sec",
                "value": round(pages_per_sec, 2),
                "unit": "pages/s",
                "pages": args.pages,
                "avg_lines_per_page": round(total_lines / args.pages, 1),
                "lines_per_sec": round(lines_per_sec, 1),
            }
        ),
        flush=True,
    )


if __name__ == "__main__":
    main()
