"""DB postprocess (reference pytocr/postprocess/db_postprocess.py:10-194).

Pipeline: threshold prob map -> (optional dilate) -> contours ->
minAreaRect/approxPolyDP -> box score -> unclip -> minAreaRect -> rescale.

TPU-native split: the thresholding/binarization happens on device inside
the jitted eval fn when possible (the caller may pass `bitmaps` computed on
device); the irregular geometry (contours, rects, unclip) runs on host via
pytorchocr_tpu.utils.geometry — which replaces the reference's C++
pybind11/clipper module (db_postprocess_fast/) with closed-form math:
the clipper round-join unclip of a convex contour is exactly a disk
dilation, handled by disk-sampled hull points feeding minAreaRect.

Maps are NHWC: preds["maps"] has shape (N, H, W, C>=1).
"""

import cv2
import numpy as np

from pytorchocr_tpu.utils import geometry
from pytorchocr_tpu.utils.utility import transform_preds


class DBPostProcess:
    def __init__(
        self,
        thresh=0.3,
        box_thresh=0.5,
        max_candidates=1000,
        unclip_ratio=1.5,
        use_dilation=False,
        score_mode="poly",
        cpp_speedup=False,  # accepted for config parity; native path is built in
        out_polygon=False,
        **kwargs
    ):
        self.thresh = thresh
        self.box_thresh = box_thresh
        self.max_candidates = max_candidates
        self.unclip_ratio = unclip_ratio
        self.min_size = 3
        self.out_polygon = out_polygon
        self.score_mode = score_mode
        assert score_mode in ["box", "poly"], (
            "Score mode must be in [box, poly] but got: {}".format(score_mode)
        )
        self.dilation_kernel = None if not use_dilation else np.array(
            [[1, 1], [1, 1]], dtype=np.uint8
        )

    def __call__(self, outs_dict, shape_list, use_padding_resize=False):
        pred = outs_dict["maps"]
        if (
            not self.out_polygon
            and not use_padding_resize
            and self.score_mode == "poly"  # device score == region-mean score
            and hasattr(pred, "device")  # jax array: take the on-device path
        ):
            return self._call_device(pred, shape_list)
        pred = np.asarray(pred)  # device -> host (prob map only)
        pred = pred[:, :, :, 0] if pred.ndim == 4 else pred
        segmentation = pred > self.thresh

        res_batch = []
        for batch_index in range(pred.shape[0]):
            src_h, src_w, ratio_h, ratio_w = shape_list[batch_index]
            src_h, src_w = int(src_h), int(src_w)
            if self.dilation_kernel is not None:
                mask = cv2.dilate(
                    segmentation[batch_index].astype(np.uint8), self.dilation_kernel
                )
            else:
                mask = segmentation[batch_index]
            boxes, scores = self.boxes_from_bitmap(
                pred[batch_index], mask, src_w, src_h, use_padding_resize
            )
            res_batch.append({"points": boxes, "scores": scores})
        return res_batch

    def _call_device(self, pred, shape_list):
        """TPU fast path: threshold + connected components + per-component
        score/bbox run ON DEVICE (pytorchocr_tpu/ops/cc_label.py); host work
        is minAreaRect + unclip over the surviving components only."""
        import jax.numpy as jnp

        from pytorchocr_tpu.ops.cc_label import db_front_half

        pred = jnp.asarray(pred)
        prob = pred[..., 0] if pred.ndim == 4 else pred
        if self.dilation_kernel is not None:
            import jax

            binary = (prob > self.thresh).astype(jnp.float32)
            dil = jax.lax.reduce_window(
                binary, -jnp.inf, jax.lax.max,
                window_dimensions=(1, 2, 2), window_strides=(1, 1, 1),
                padding=((0, 0), (0, 1), (0, 1)),
            )
            # feed a map whose thresholding reproduces the dilated mask but
            # whose values keep the original probabilities for scoring
            prob_for_cc = jnp.maximum(prob, jnp.where(dil > 0, self.thresh + 1e-6, 0.0))
        else:
            prob_for_cc = prob

        res_batch = []
        height, width = prob.shape[1], prob.shape[2]
        # dispatch every image's front-half first so device compute and
        # host transfers overlap across the batch
        all_stats = [
            db_front_half(
                prob_for_cc[i], self.thresh, max_labels=self.max_candidates
            )
            for i in range(prob.shape[0])
        ]
        # ONE device_get over the whole batch: jax issues async host copies
        # for every leaf before blocking, so the transfers overlap.  Fetching
        # per-image per-field serialized 4 x batch round trips (~30 ms RTT
        # each through the tunnel — it dominated batched-det wall time).
        import jax

        all_stats = jax.device_get(all_stats)
        for batch_index in range(prob.shape[0]):
            stats = all_stats[batch_index]
            labels = np.asarray(stats["labels"])
            count = np.asarray(stats["count"])
            score_arr = np.asarray(stats["score"])
            bbox = np.asarray(stats["bbox"])

            src_h, src_w, ratio_h, ratio_w = shape_list[batch_index]
            src_h, src_w = int(src_h), int(src_w)
            boxes, scores = [], []
            for lbl in range(1, len(count)):
                if count[lbl] <= 0:
                    continue
                score = float(score_arr[lbl])
                if self.box_thresh > score:
                    continue
                x0, y0, x1, y1 = bbox[lbl]
                pts = np.argwhere(labels[y0 : y1 + 1, x0 : x1 + 1] == lbl)[:, ::-1]
                pts = pts + np.array([[x0, y0]])
                points, sside = geometry.min_area_rect_points(pts.astype(np.float32))
                if sside < self.min_size:
                    continue
                distance = geometry.unclip_distance(points, self.unclip_ratio)
                cloud = geometry.unclip_points(points, distance)
                box, sside = geometry.min_area_rect_points(cloud)
                if sside < self.min_size + 2:
                    continue
                box = np.array(box).reshape(-1, 2)
                box[:, 0] = np.clip(
                    np.round(box[:, 0] / width * src_w), 0, src_w
                )
                box[:, 1] = np.clip(
                    np.round(box[:, 1] / height * src_h), 0, src_h
                )
                boxes.append(box.astype(np.int16))
                scores.append(score)
            res_batch.append(
                {"points": np.array(boxes, dtype=np.int16), "scores": scores}
            )
        return res_batch

    def boxes_from_bitmap(self, pred, _bitmap, dest_width, dest_height,
                          use_padding_resize=False):
        bitmap = _bitmap
        height, width = bitmap.shape

        outs = cv2.findContours(
            (bitmap * 255).astype(np.uint8), cv2.RETR_LIST, cv2.CHAIN_APPROX_SIMPLE
        )
        contours = outs[0] if len(outs) == 2 else outs[1]

        num_contours = min(len(contours), self.max_candidates)

        boxes = []
        scores = []
        for index in range(num_contours):
            contour = contours[index]
            if self.out_polygon:
                epsilon = 0.005 * cv2.arcLength(contour, True)
                approx = cv2.approxPolyDP(contour, epsilon, True)
                points = approx.reshape((-1, 2))
                if points.shape[0] < 4:
                    continue
            else:
                points, sside = geometry.min_area_rect_points(contour)
                if sside < self.min_size:
                    continue
            if self.score_mode == "box":
                score = self.box_score(pred, points)
            else:
                score = self.box_score(pred, contour.reshape(-1, 2))
            if self.box_thresh > score:
                continue

            distance = geometry.unclip_distance(points, self.unclip_ratio)
            if self.out_polygon:
                expanded = geometry.unclip_polygon(points, distance)
                if expanded is None:
                    continue
                box = expanded
                _, sside = geometry.min_area_rect_points(box)
            else:
                cloud = geometry.unclip_points(points, distance)
                box, sside = geometry.min_area_rect_points(cloud)
            if sside < self.min_size + 2:
                continue
            box = np.array(box).reshape(-1, 2)
            if use_padding_resize:
                center = np.array(
                    [dest_width / 2.0, dest_height / 2.0], dtype=np.float32
                )
                src_maxsize = max(dest_width, dest_height) * 1.0
                target_size = height
                box = transform_preds(box, center, src_maxsize, target_size)
                box[:, 0] = np.clip(np.round(box[:, 0]), 0, dest_width)
                box[:, 1] = np.clip(np.round(box[:, 1]), 0, dest_height)
            else:
                box[:, 0] = np.clip(
                    np.round(box[:, 0] / width * dest_width), 0, dest_width
                )
                box[:, 1] = np.clip(
                    np.round(box[:, 1] / height * dest_height), 0, dest_height
                )
            boxes.append(box.astype(np.int16))
            scores.append(score)
        boxes = np.array(boxes, dtype=np.int16)
        return boxes, scores

    @staticmethod
    def box_score(bitmap, _pts):
        """Mean prob inside the box/contour (reference box_score,
        db_postprocess.py:178-194)."""
        h, w = bitmap.shape[:2]
        pts = _pts.copy().astype(np.float32)
        xmin = np.clip(np.floor(pts[:, 0].min()).astype(np.int32), 0, w - 1)
        xmax = np.clip(np.ceil(pts[:, 0].max()).astype(np.int32), 0, w - 1)
        ymin = np.clip(np.floor(pts[:, 1].min()).astype(np.int32), 0, h - 1)
        ymax = np.clip(np.ceil(pts[:, 1].max()).astype(np.int32), 0, h - 1)

        mask = np.zeros((ymax - ymin + 1, xmax - xmin + 1), dtype=np.uint8)
        pts[:, 0] = pts[:, 0] - xmin
        pts[:, 1] = pts[:, 1] - ymin
        cv2.fillPoly(mask, pts.reshape(1, -1, 2).astype(np.int32), 1)
        return cv2.mean(bitmap[ymin : ymax + 1, xmin : xmax + 1], mask)[0]


class DistillationDBPostProcess:
    """Runs DBPostProcess per named sub-model
    (reference db_postprocess.py:197-226)."""

    def __init__(
        self,
        model_name=("student",),
        key=None,
        thresh=0.3,
        box_thresh=0.5,
        max_candidates=1000,
        unclip_ratio=1.5,
        use_dilation=False,
        score_mode="poly",
        cpp_speedup=False,
        out_polygon=False,
        **kwargs
    ):
        if not isinstance(model_name, (list, tuple)):
            model_name = [model_name]
        self.model_name = list(model_name)
        self.key = key
        self.post_process = DBPostProcess(
            thresh=thresh,
            box_thresh=box_thresh,
            max_candidates=max_candidates,
            unclip_ratio=unclip_ratio,
            use_dilation=use_dilation,
            score_mode=score_mode,
            out_polygon=out_polygon,
        )

    def __call__(self, predicts, shape_list, **kwargs):
        results = {}
        for k in self.model_name:
            results[k] = self.post_process(predicts[k], shape_list=shape_list)
        return results
