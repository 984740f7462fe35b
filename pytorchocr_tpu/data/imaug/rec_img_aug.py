"""Text-line augmentation + resize ops (reference pytocr/data/imaug/rec_img_aug.py).

TPU divergence: `resize_norm_img` produces **HWC** float32 (the collate stacks
to NHWC); the normalization (/255, -0.5, /0.5) and right-padding to a fixed
width are identical to the reference (rec_img_aug.py:107-134).
"""

import math
import random

import cv2
import numpy as np

from .text_image_aug import tia_distort, tia_perspective, tia_stretch


class RecAug:
    """Text-line augmentation: TIA warps, crop, blur, HSV jitter, pixel
    jitter, gaussian noise, invert — each w.p. `aug_prob`
    (reference rec_img_aug.py:11-26, warp at :506-548)."""

    def __init__(self, use_tia=True, aug_prob=0.4, **kwargs):
        self.use_tia = use_tia
        self.aug_prob = aug_prob

    def __call__(self, data):
        img = data["image"]
        gray_mode = False
        if img.ndim == 2:
            img = cv2.cvtColor(img, cv2.COLOR_GRAY2RGB)
            gray_mode = True
        img = warp(img, 10, self.use_tia, self.aug_prob)
        if gray_mode:
            img = cv2.cvtColor(img, cv2.COLOR_RGB2GRAY)
        data["image"] = img
        return data


class ClsResizeImg:
    def __init__(self, image_shape, **kwargs):
        self.image_shape = image_shape

    def __call__(self, data):
        data["image"] = resize_norm_img(data["image"], self.image_shape)
        return data


class RecResizeImg:
    def __init__(self, image_shape, padding=True, **kwargs):
        self.image_shape = image_shape
        self.padding = padding

    def __call__(self, data):
        data["image"] = resize_norm_img(
            data["image"], self.image_shape, resized_w=None, padding=self.padding
        )
        return data


class RecResizeImgForTest:
    """Inference-time batching resize: groups text-line crops into batches
    padded to the per-batch max width, capped at `max_w`
    (reference rec_img_aug.py:55-106).

    TPU divergence: widths are additionally rounded UP to a multiple of
    `width_bucket` (default 32) so repeated inference hits a small set of
    compiled shapes instead of recompiling per batch.
    """

    def __init__(
        self,
        imgC=1,
        imgH=32,
        max_w=1200,
        batch_size=16,
        padding=True,
        width_bucket=32,
        **kwargs
    ):
        self.imgC = imgC
        self.imgH = imgH
        self.max_w = max_w
        self.batch_size = batch_size
        self.padding = padding
        self.width_bucket = width_bucket

    def _bucket(self, w):
        b = self.width_bucket
        return min(int(math.ceil(w / b) * b), self.max_w)

    def __call__(self, imgs):
        if isinstance(imgs, list):
            w_list = []
            for img in imgs:
                h, w = img.shape[:2]
                ratio = self.imgH / float(h)
                w = int(math.ceil(w * ratio))
                w_list.append(min(w, self.max_w))
            num_img = len(imgs)
            batch_num = int(math.ceil(float(num_img) / self.batch_size))
            batches = []
            for i in range(batch_num):
                batch_imgs = imgs[i * self.batch_size : (i + 1) * self.batch_size]
                batch_ws = w_list[i * self.batch_size : (i + 1) * self.batch_size]
                batch_max_w = self._bucket(max(batch_ws))
                norm = [
                    resize_norm_img(
                        img,
                        [self.imgC, self.imgH, batch_max_w],
                        resized_w=resized_w,
                        padding=self.padding,
                    )
                    for img, resized_w in zip(batch_imgs, batch_ws)
                ]
                batches.append(np.stack(norm, axis=0))
            return batches
        img = imgs
        h, w = img.shape[:2]
        ratio = self.imgH / float(h)
        resized_w = min(int(math.ceil(w * ratio)), self.max_w)
        norm_img = resize_norm_img(
            img,
            [self.imgC, self.imgH, self._bucket(resized_w)],
            resized_w=resized_w,
            padding=self.padding,
        )
        return norm_img[None]


def resize_norm_img(img, image_shape, resized_w=None, padding=True):
    """Aspect-preserving height resize + right-pad, /255-0.5/0.5 normalize.
    Returns HWC float32 (reference returns CHW torch; rec_img_aug.py:107-134)."""
    imgC, imgH, imgW = image_shape
    h, w = img.shape[:2]
    if not padding:
        resized_image = cv2.resize(img, (imgW, imgH))
        resized_w = imgW
    elif resized_w is not None:
        resized_image = cv2.resize(img, (resized_w, imgH))
    else:
        ratio = w / float(h)
        if math.ceil(imgH * ratio) > imgW:
            resized_w = imgW
        else:
            resized_w = int(math.ceil(imgH * ratio))
        resized_image = cv2.resize(img, (resized_w, imgH))
    resized_image = resized_image.astype("float32")
    if resized_image.ndim == 2:  # gray input -> H W 1
        resized_image = resized_image[:, :, np.newaxis]
    resized_image = resized_image / 255.0
    resized_image -= 0.5
    resized_image /= 0.5
    padding_im = np.zeros((imgH, imgW, imgC), dtype=np.float32)
    padding_im[:, 0:resized_w, :] = resized_image[:, :, :imgC]
    return padding_im


# ---------------------------------------------------------------------------
# warp() — the per-sample augmentation driver (reference rec_img_aug.py:506-548)
# ---------------------------------------------------------------------------


def flag():
    return 1 if random.random() > 0.5000001 else -1


def cvt_color(img):
    hsv = cv2.cvtColor(img, cv2.COLOR_RGB2HSV)
    delta = 0.001 * random.random() * flag()
    hsv[:, :, 2] = hsv[:, :, 2] * (1 + delta)
    return cv2.cvtColor(hsv, cv2.COLOR_HSV2RGB)


def blur(img):
    h, w = img.shape[:2]
    if h > 10 and w > 10:
        return cv2.GaussianBlur(img, (5, 5), 1)
    return img


def jitter(img):
    w, h = img.shape[:2]
    if h > 10 and w > 10:
        thres = min(w, h)
        s = int(random.random() * thres * 0.01)
        src_img = img.copy()
        for i in range(s):
            img[i:, i:, :] = src_img[: w - i, : h - i, :]
        return img
    return img


def add_gasuss_noise(image, mean=0, var=0.1):
    noise = np.random.normal(mean, var ** 0.5, image.shape)
    out = np.clip(image + 0.5 * noise, 0, 255)
    return np.uint8(out)


def get_crop(image):
    h = image.shape[0]
    top_crop = min(int(random.randint(1, 8)), h - 1)
    crop_img = image.copy()
    if random.randint(0, 1):
        crop_img = crop_img[top_crop:h, :, :]
    else:
        crop_img = crop_img[0 : h - top_crop, :, :]
    return crop_img


def warp(img, ang, use_tia=True, prob=0.4):
    h, w = img.shape[:2]
    new_img = img

    if use_tia:
        if random.random() <= prob and h >= 20 and w >= 20:
            new_img = tia_distort(new_img, random.randint(3, 6))
        if random.random() <= prob and h >= 20 and w >= 20:
            new_img = tia_stretch(new_img, random.randint(3, 6))
        if random.random() <= prob:
            new_img = tia_perspective(new_img)

    if random.random() <= prob and h >= 20 and w >= 20:
        new_img = get_crop(new_img)
    if random.random() <= prob:
        new_img = blur(new_img)
    if img.ndim == 3 and img.shape[2] == 3 and random.random() <= prob:
        new_img = cvt_color(new_img)
    new_img = jitter(new_img)
    if random.random() <= prob:
        new_img = add_gasuss_noise(new_img)
    if random.random() <= prob:
        new_img = 255 - new_img
    return new_img
