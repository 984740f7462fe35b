"""Distillation losses (reference pytocr/losses/distillation_loss.py:24-282).

All five variants: per-student CTC, model-pair DML (with optional DB map
slicing), per-student GT DBLoss, teacher-soft-label DBLoss (with optional
on-device binarize+dilate — the reference round-trips through cv2 on host;
here dilation is a 2x2 max-window, fully jittable), and feature distance.

Map slicing is channel-last: preds["maps"][..., i].
"""

import jax
import jax.numpy as jnp

from .basic import balance_loss, dice_loss
from .basic_loss import DistanceLoss, DMLLoss
from .det_db_loss import DBLoss
from .rec_ctc_loss import CTCLoss


def _sum_loss(loss_dict):
    if "loss" in loss_dict:
        return loss_dict
    total = 0.0
    for k, v in loss_dict.items():
        total = total + v
    loss_dict["loss"] = total
    return loss_dict


def _check_model_name_pairs(model_name_pairs):
    if not isinstance(model_name_pairs, list):
        return []
    if isinstance(model_name_pairs[0], list) and isinstance(
        model_name_pairs[0][0], str
    ):
        return model_name_pairs
    return [model_name_pairs]


class DistillationDMLLoss(DMLLoss):
    """Deep mutual learning over model pairs."""

    def __init__(
        self,
        model_name_pairs=None,
        act=None,
        use_log=False,
        key=None,
        maps_name=None,
        name="dml",
        **kwargs
    ):
        super().__init__(act=act, use_log=use_log)
        self.key = key
        self.model_name_pairs = _check_model_name_pairs(model_name_pairs or [])
        self.name = name
        if maps_name is None:
            self.maps_name = None
        elif isinstance(maps_name, str):
            self.maps_name = [maps_name]
        else:
            self.maps_name = list(maps_name)

    def _slice_out(self, outs):
        idx_map = {"shrink_maps": 0, "threshold_maps": 1, "binary_maps": 2}
        return {
            k: outs[..., idx_map[k]] for k in self.maps_name if k in idx_map
        }

    def __call__(self, predicts, batch):
        loss_dict = {}
        for idx, pair in enumerate(self.model_name_pairs):
            out1 = predicts[pair[0]]
            out2 = predicts[pair[1]]
            if self.key is not None:
                out1 = out1[self.key]
                out2 = out2[self.key]
            if self.maps_name is None:
                loss = super().__call__(out1, out2)
                loss_dict["{}_{}".format(self.name, idx)] = loss
            else:
                outs1 = self._slice_out(out1)
                outs2 = self._slice_out(out2)
                for _c, k in enumerate(outs1.keys()):
                    loss = super().__call__(outs1[k], outs2[k])
                    loss_dict[
                        "{}_{}_{}".format(self.name, self.maps_name[_c], idx)
                    ] = loss
        return _sum_loss(loss_dict)


class DistillationCTCLoss(CTCLoss):
    def __init__(self, model_name_list=None, key=None, name="loss_ctc", **kwargs):
        super().__init__()
        self.model_name_list = model_name_list or []
        self.key = key
        self.name = name

    def __call__(self, predicts, batch):
        loss_dict = {}
        for idx, model_name in enumerate(self.model_name_list):
            out = predicts[model_name]
            if self.key is not None:
                out = out[self.key]
            loss = super().__call__(out, batch)
            for key in loss:
                loss_dict["{}_{}_{}".format(self.name, model_name, idx)] = loss[key]
        return _sum_loss(loss_dict)


class DistillationDBLoss(DBLoss):
    """GT supervision per student model."""

    def __init__(
        self,
        model_name_list=None,
        balance_loss=True,
        main_loss_type="BCELoss",
        alpha=1,
        beta=10,
        ohem_ratio=3,
        eps=1e-6,
        name="db",
        **kwargs
    ):
        # the reference forwards only defaults to DBLoss (distillation_loss.py:138)
        super().__init__()
        self.model_name_list = model_name_list or []
        self.name = name

    def __call__(self, predicts, batch):
        loss_dict = {}
        for idx, model_name in enumerate(self.model_name_list):
            out = predicts[model_name]
            loss = super().__call__(out, batch)
            for key in loss:
                if key == "loss":
                    continue
                loss_dict["{}_{}_{}".format(self.name, model_name, key)] = loss[key]
        return _sum_loss(loss_dict)


class DistillationTeachDBLoss(DBLoss):
    """Teacher soft shrink-map supervision (reference CML teach loss,
    distillation_loss.py:167-231).  Matches the reference's *effective*
    behavior: BalanceLoss(BCE, OHEM 3) on the soft teacher map + dice on the
    binarized teacher map; `dilate` binarizes at 0.3 then applies a 2x2
    dilation (max window)."""

    def __init__(
        self,
        model_name_pairs=None,
        key=None,
        balance_loss=True,
        main_loss_type="DiceLoss",
        dilate=False,
        alpha=1,
        beta=10,
        ohem_ratio=3,
        eps=1e-6,
        name="teach_dbloss",
        **kwargs
    ):
        super().__init__()
        self.model_name_pairs = _check_model_name_pairs(model_name_pairs or [])
        self.name = name
        self.key = key
        self.dilate = dilate

    def __call__(self, predicts, batch):
        loss_dict = {}
        for idx, pair in enumerate(self.model_name_pairs):
            stu_outs = predicts[pair[0]]
            tch_outs = predicts[pair[1]]
            stu_preds = stu_outs[self.key] if self.key is not None else stu_outs["maps"]
            tch_preds = tch_outs[self.key] if self.key is not None else tch_outs["maps"]

            stu_shrink_maps = stu_preds[..., 0]
            stu_binary_maps = stu_preds[..., 2]
            th_shrink_maps = jax.lax.stop_gradient(tch_preds[..., 0])
            if self.dilate:
                binarized = (th_shrink_maps > 0.3).astype(jnp.float32)
                th_shrink_maps = jax.lax.reduce_window(
                    binarized,
                    -jnp.inf,
                    jax.lax.max,
                    window_dimensions=(1, 2, 2),
                    window_strides=(1, 1, 1),
                    padding=((0, 0), (0, 1), (0, 1)),
                )

            _, _, _, label_shrink_mask = batch[1:5]
            bce = self.alpha * balance_loss(
                stu_shrink_maps,
                th_shrink_maps,
                label_shrink_mask,
                main_loss_type=self.main_loss_type,
                negative_ratio=self.ohem_ratio,
                balance=self.balance,
            )
            loss_binary = dice_loss(
                stu_binary_maps,
                (th_shrink_maps > 0.3).astype(jnp.float32),
                label_shrink_mask,
            )
            loss_dict["{}_{}_{}".format(self.name, pair[0], pair[1])] = (
                bce + loss_binary
            )
        return _sum_loss(loss_dict)


class DistillationDistanceLoss(DistanceLoss):
    def __init__(
        self, mode="l2", model_name_pairs=None, key=None, name="loss_distance", **kwargs
    ):
        super().__init__(mode=mode)
        self.key = key
        self.model_name_pairs = _check_model_name_pairs(model_name_pairs or [])
        self.name = name + "_" + mode

    def __call__(self, predicts, batch):
        loss_dict = {}
        for idx, pair in enumerate(self.model_name_pairs):
            out1 = predicts[pair[0]]
            out2 = predicts[pair[1]]
            if self.key is not None:
                out1 = out1[self.key]
                out2 = out2[self.key]
            loss = super().__call__(out1, out2)
            loss_dict["{}_{}_{}_{}".format(self.name, pair[0], pair[1], idx)] = loss
        return _sum_loss(loss_dict)
