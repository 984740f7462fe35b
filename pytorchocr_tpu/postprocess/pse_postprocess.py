"""PSE postprocess (reference pytocr/postprocess/pse_postprocess.py:10-105).

Maps are NHWC (N, H/4, W/4, 7).  The sigmoid/threshold/mask front-half runs
on device (jnp); the scale expansion uses the propagation op
(pytorchocr_tpu/ops/propagate.py) which replaces the Cython BFS.
"""

import cv2
import jax
import numpy as np

from pytorchocr_tpu.ops.propagate import pse_np
from pytorchocr_tpu.utils.geometry import order_points_clockwise


class PSEPostProcess:
    def __init__(
        self,
        thresh=0.5,
        box_thresh=0.85,
        min_area=16,
        scale=4,
        out_polygon=False,
        use_device_expand=True,
        **kwargs
    ):
        self.thresh = thresh
        self.box_thresh = box_thresh
        self.min_area = min_area
        self.out_polygon = out_polygon
        self.scale = scale
        # on-device scale expansion (Pallas/XLA fixpoint) instead of the
        # host numpy propagation; host fallback kept for parity checks
        self.use_device_expand = use_device_expand

    def __call__(self, outs_dict, shape_list):
        import jax.numpy as jnp

        pred = outs_dict["maps"]  # (N, H/4, W/4, 7)
        pred = jnp.asarray(pred)
        self.img_h = pred.shape[1] * 4
        self.img_w = pred.shape[2] * 4
        if self.scale != 4:
            r = 4 // self.scale
            from pytorchocr_tpu.modeling.common import resize_nearest
            pred = resize_nearest(pred, r)

        score = jax.nn.sigmoid(pred[..., 0])
        kernels = (pred > self.thresh).astype(jnp.float32)
        text_mask = kernels[..., 0:1]
        kernels = kernels * text_mask

        labels_dev = None
        if self.use_device_expand:
            from pytorchocr_tpu.ops.cc_label import pse_expand_device

            kb = jnp.transpose(kernels > 0, (0, 3, 1, 2))  # (N, K, H, W)
            labels_dev = [
                np.asarray(
                    pse_expand_device(
                        kb[i], jnp.float32(self.min_area / (self.scale ** 2))
                    )
                )
                for i in range(kb.shape[0])
            ]

        score = np.asarray(score, dtype=np.float32)
        kernels = np.asarray(kernels, dtype=np.uint8)

        res_batch = []
        for batch_index in range(pred.shape[0]):
            boxes, scores = self.boxes_from_bitmap(
                score[batch_index],
                kernels[batch_index].transpose(2, 0, 1),  # (7, H, W)
                shape_list[batch_index],
                label=None if labels_dev is None else labels_dev[batch_index],
            )
            res_batch.append({"points": boxes, "scores": scores})
        return res_batch

    def boxes_from_bitmap(self, score, kernels, shape, label=None):
        if label is None:
            label = pse_np(kernels, self.min_area / (self.scale ** 2))
        if self.scale != 1:
            label = cv2.resize(
                label, (self.img_w, self.img_h), interpolation=cv2.INTER_NEAREST
            )
            score = cv2.resize(
                score, (self.img_w, self.img_h), interpolation=cv2.INTER_NEAREST
            )
        return self.generate_box(score, label, shape)

    def generate_box(self, score, label, shape):
        src_h, src_w, ratio_h, ratio_w = shape
        if not label.flags.writeable:
            # the device path hands a zero-copy (read-only) view of the JAX
            # label map; the filter loop below zeroes rejected components in
            # place, so take a writable copy
            label = label.copy()
        label_num = np.max(label) + 1

        boxes = []
        scores = []
        for i in range(1, label_num):
            ind = label == i
            points = np.array(np.where(ind)).transpose((1, 0))[:, ::-1]

            if points.shape[0] < self.min_area:
                label[ind] = 0
                continue
            score_i = np.mean(score[ind])
            if score_i < self.box_thresh:
                label[ind] = 0
                continue

            if not self.out_polygon:
                rect = cv2.minAreaRect(points)
                bbox = cv2.boxPoints(rect)
                bbox = order_points_clockwise(bbox)
            else:
                box_height = np.max(points[:, 1]) + 10
                box_width = np.max(points[:, 0]) + 10
                mask = np.zeros((box_height, box_width), dtype=np.uint8)
                mask[points[:, 1], points[:, 0]] = 255
                contours, _ = cv2.findContours(
                    mask, cv2.RETR_EXTERNAL, cv2.CHAIN_APPROX_SIMPLE
                )
                bbox = np.squeeze(contours[0], 1)

            bbox[:, 0] = np.clip(np.round(bbox[:, 0] / ratio_w), 0, src_w)
            bbox[:, 1] = np.clip(np.round(bbox[:, 1] / ratio_h), 0, src_h)
            boxes.append(bbox.astype(np.int16))
            scores.append(score_i)
        boxes = np.array(boxes, dtype=np.int16)
        return boxes, scores
