"""FPN neck (reference pytocr/modeling/necks/fpn.py:8-134).

1x1 laterals + top-down nearest-upsample-add + 3x3 smoothing; mode="DB"
concatenates four out_channels/4 maps back to out_channels; otherwise four
out_channels maps concat to 4*out_channels.  Optional ASF attention (DB++).
"""

from typing import Any, Sequence

import jax.numpy as jnp
from flax import linen as nn

from ...ops import quant as quant_ops
from ..common import ConvBNAct, resize_nearest
from .asf import ScaleFeatureSelection

__all__ = ["FPN"]


class FPN(nn.Module):
    in_channels: Sequence[int]
    out_channels: int = 256
    mode: str = None
    use_asf: bool = False
    attention_type: str = "scale_spatial"
    dtype: Any = jnp.float32

    @property
    def fused_channels(self):
        return self.out_channels if self.mode == "DB" else self.out_channels * 4

    def _topdown_add(self, name, up, lateral, qmode, train):
        """out = nearest-upsample(up) x2 + lateral, int8-flow-aware: under
        int8 PTQ both operands arrive as QTensors, the upsample runs on the
        int8 payload (pure duplication), and the fused dequant-add-requant
        writes the result back as int8 with a calibrated absmax."""
        quantized = (
            qmode is not None and not train
            and self.mode == "DB" and not self.use_asf
            and quant_ops.flag("q8_fpn_topdown")
        )
        if quantized:
            absmax = self.variable(
                "quant", name + "_absmax", lambda: jnp.zeros((), jnp.float32)
            )
            if qmode == "int8":
                up_r = quant_ops.QTensor(
                    quant_ops.repeat_nearest(up.q, 2), up.scale
                )
                return quant_ops.qadd_act(up_r, lateral, absmax.value)
        y = resize_nearest(quant_ops.dequant(up, self.dtype), 2) + quant_ops.dequant(
            lateral, self.dtype
        )
        if quantized and qmode == "calibrate" and self.is_mutable_collection("quant"):
            absmax.value = jnp.maximum(
                absmax.value, jnp.max(jnp.abs(y)).astype(jnp.float32)
            )
        return y

    @nn.compact
    def __call__(self, x, train: bool = False):
        c2, c3, c4, c5 = x
        oc = self.out_channels
        # laterals emit int8 on the DB path (consumers: the int8 top-down
        # adds and the int8 smooth convs); plain arrays otherwise
        lat_q = self.mode == "DB" and not self.use_asf
        qmode = quant_ops.mode()

        in5 = ConvBNAct(oc, 1, 1, act="relu", dtype=self.dtype, emit_q=lat_q,
                        q_region="q8_fpn_topdown", name="in5")(c5, train)
        in4 = ConvBNAct(oc, 1, 1, act="relu", dtype=self.dtype, emit_q=lat_q,
                        q_region="q8_fpn_topdown", name="in4")(c4, train)
        in3 = ConvBNAct(oc, 1, 1, act="relu", dtype=self.dtype, emit_q=lat_q,
                        q_region="q8_fpn_topdown", name="in3")(c3, train)
        in2 = ConvBNAct(oc, 1, 1, act="relu", dtype=self.dtype, emit_q=lat_q,
                        q_region="q8_fpn_topdown", name="in2")(c2, train)

        out4 = self._topdown_add("td4", in5, in4, qmode, train)
        out3 = self._topdown_add("td3", out4, in3, qmode, train)
        out2 = self._topdown_add("td2", out3, in2, qmode, train)

        sc = oc // 4 if self.mode == "DB" else oc
        p5 = ConvBNAct(sc, 3, 1, act="relu", dtype=self.dtype, name="out5")(in5, train)
        p4 = ConvBNAct(sc, 3, 1, act="relu", dtype=self.dtype, name="out4")(out4, train)
        p3 = ConvBNAct(sc, 3, 1, act="relu", dtype=self.dtype, name="out3")(out3, train)
        p2 = ConvBNAct(sc, 3, 1, act="relu", dtype=self.dtype, name="out2")(out2, train)

        # int8 activation flow for the fused map (the single biggest
        # activation in the det path: 4*sc channels at 1/4 resolution, plus
        # the x8/x4/x2 nearest-upsampled operands feeding it). Under int8
        # PTQ all four levels are quantized with ONE shared calibrated
        # absmax (a shared scale is what lets the concatenated tensor stay
        # a single QTensor for the head conv), upsampled as int8 payloads,
        # and handed to the head as int8 — halving HBM traffic of the
        # upsamples, the concat write, and the head-conv read.
        qmode = quant_ops.mode()
        if (
            qmode is not None and not train
            and self.mode == "DB" and not self.use_asf
            and quant_ops.flag("q8_fpn_fuse")
        ):
            fuse_absmax = self.variable(
                "quant", "fuse_absmax", lambda: jnp.zeros((), jnp.float32)
            )
            if qmode == "calibrate":
                if self.is_mutable_collection("quant"):
                    m = jnp.maximum(
                        jnp.maximum(jnp.max(jnp.abs(p5)), jnp.max(jnp.abs(p4))),
                        jnp.maximum(jnp.max(jnp.abs(p3)), jnp.max(jnp.abs(p2))),
                    )
                    fuse_absmax.value = jnp.maximum(
                        fuse_absmax.value, m.astype(jnp.float32)
                    )
            else:  # int8
                q5 = quant_ops.qtensor_from(p5, fuse_absmax.value)
                q4 = quant_ops.qtensor_from(p4, fuse_absmax.value)
                q3 = quant_ops.qtensor_from(p3, fuse_absmax.value)
                q2 = quant_ops.qtensor_from(p2, fuse_absmax.value)
                payload = jnp.concatenate(
                    [
                        quant_ops.repeat_nearest(q5.q, 8),
                        quant_ops.repeat_nearest(q4.q, 4),
                        quant_ops.repeat_nearest(q3.q, 2),
                        q2.q,
                    ],
                    axis=-1,
                )
                return quant_ops.QTensor(payload, q2.scale)

        p5 = resize_nearest(p5, 8)
        p4 = resize_nearest(p4, 4)
        p3 = resize_nearest(p3, 2)

        if self.mode == "DB":
            feats = [p5, p4, p3, p2]
        else:
            feats = [p2, p3, p4, p5]
        fuse = jnp.concatenate(feats, axis=-1)
        if self.use_asf:
            fuse = ScaleFeatureSelection(
                self.fused_channels,
                sc,
                attention_type=self.attention_type,
                dtype=self.dtype,
                name="concat_attention",
            )(fuse, feats, train)
        return fuse
