"""Recognition decoders (reference pytocr/postprocess/rec_postprocess.py).

Batch-major: preds are (N, T, C).  The argmax/max reduction runs on device
(jnp) when given a jax array — only (N, T) indices + probs cross to host,
not the (N, T, 6624) probability tensor.
"""

import numpy as np

from pytorchocr_tpu.utils.assets import resolve_dict_path


class BaseRecLabelDecode:
    """text-index -> text-label conversion base."""

    def __init__(self, character_dict_path=None, use_space_char=False):
        self.beg_str = "sos"
        self.end_str = "eos"

        self.character_str = []
        if character_dict_path is None:
            self.character_str = "0123456789abcdefghijklmnopqrstuvwxyz"
            dict_character = list(self.character_str)
        else:
            with open(resolve_dict_path(character_dict_path), "rb") as fin:
                for line in fin.readlines():
                    line = line.decode("UTF-8").strip("\n").strip("\r\n")
                    self.character_str.append(line)
            if use_space_char:
                self.character_str.append(" ")
            dict_character = list(self.character_str)

        dict_character = self.add_special_char(dict_character)
        self.dict = {char: i for i, char in enumerate(dict_character)}
        self.character = dict_character

    def add_special_char(self, dict_character):
        return dict_character

    def decode(self, text_index, text_prob=None, is_remove_duplicate=False):
        result_list = []
        ignored_tokens = self.get_ignored_tokens()
        batch_size = len(text_index)
        for batch_idx in range(batch_size):
            char_list = []
            conf_list = []
            for idx in range(len(text_index[batch_idx])):
                if text_index[batch_idx][idx] in ignored_tokens:
                    continue
                if is_remove_duplicate:
                    if (
                        idx > 0
                        and text_index[batch_idx][idx - 1] == text_index[batch_idx][idx]
                    ):
                        continue
                char_list.append(self.character[int(text_index[batch_idx][idx])])
                if text_prob is not None:
                    conf_list.append(text_prob[batch_idx][idx])
                else:
                    conf_list.append(1)
            text = "".join(char_list)
            result_list.append((text, np.mean(conf_list) if conf_list else 0.0))
        return result_list

    def get_ignored_tokens(self):
        return [0]  # ctc blank


def _to_idx_prob(preds):
    """(N, T, C) probs -> ((N,T) argmax, (N,T) max), reducing on device if
    preds is a jax array."""
    if isinstance(preds, tuple) and len(preds) == 2:
        idx, prob = preds
        return np.asarray(idx), np.asarray(prob)
    try:
        import jax.numpy as jnp

        if hasattr(preds, "device"):  # jax array: reduce before host transfer
            idx = jnp.argmax(preds, axis=2)
            prob = jnp.max(preds, axis=2)
            return np.asarray(idx), np.asarray(prob)
    except Exception:
        pass
    preds = np.asarray(preds)
    return preds.argmax(axis=2), preds.max(axis=2)


class CTCLabelDecode(BaseRecLabelDecode):
    """CTC greedy decode: dedup-collapse + blank removal
    (reference rec_postprocess.py:65-96)."""

    def __init__(self, character_dict_path=None, use_space_char=False, **kwargs):
        super().__init__(character_dict_path, use_space_char)

    def __call__(self, preds, label=None, *args, **kwargs):
        if isinstance(preds, (list,)) or (
            isinstance(preds, tuple) and len(preds) != 2
        ):
            preds = preds[-1]
        if hasattr(preds, "device") and getattr(preds, "ndim", 0) == 3:
            # device fast path: dedup-collapse + blank removal ON DEVICE;
            # only (codes, lengths, conf) cross to host (the reference loops
            # over every timestep in Python, rec_postprocess.py:35-59)
            from pytorchocr_tpu.ops.ctc_decode import ctc_greedy_collapse

            max_len = min(int(preds.shape[1]), 128)
            codes, lengths, conf = ctc_greedy_collapse(preds, max_len=max_len)
            codes = np.asarray(codes)
            lengths = np.asarray(lengths)
            conf = np.asarray(conf)
            text = [
                (
                    "".join(self.character[c] for c in codes[i, : lengths[i]]),
                    float(conf[i]),
                )
                for i in range(codes.shape[0])
            ]
        else:
            preds_idx, preds_prob = _to_idx_prob(preds)
            text = self.decode(preds_idx, preds_prob, is_remove_duplicate=True)
        if label is None:
            return text
        label = self.decode(np.asarray(label))
        return text, label

    def add_special_char(self, dict_character):
        return ["blank"] + dict_character


class DistillationCTCLabelDecode(CTCLabelDecode):
    """Per-submodel CTC decode (reference rec_postprocess.py:99-125)."""

    def __init__(
        self,
        character_dict_path=None,
        use_space_char=False,
        model_name=("student",),
        key=None,
        **kwargs
    ):
        super().__init__(character_dict_path, use_space_char)
        if not isinstance(model_name, (list, tuple)):
            model_name = [model_name]
        self.model_name = list(model_name)
        self.key = key

    def __call__(self, preds, label=None, *args, **kwargs):
        output = {}
        for name in self.model_name:
            pred = preds[name]
            if self.key is not None:
                pred = pred[self.key]
            output[name] = super().__call__(pred, label=label, *args, **kwargs)
        return output


class AttnLabelDecode(BaseRecLabelDecode):
    """sos/eos decode (reference rec_postprocess.py:128-198)."""

    def __init__(self, character_dict_path=None, use_space_char=False, **kwargs):
        super().__init__(character_dict_path, use_space_char)

    def add_special_char(self, dict_character):
        self.beg_str = "sos"
        self.end_str = "eos"
        return [self.beg_str] + dict_character + [self.end_str]

    def __call__(self, preds, label=None, *args, **kwargs):
        preds_idx, preds_prob = _to_idx_prob(preds)
        text = self.decode(preds_idx, preds_prob, is_remove_duplicate=False)
        if label is None:
            return text
        label = self.decode(np.asarray(label), is_remove_duplicate=False)
        return text, label

    def decode(self, text_index, text_prob=None, is_remove_duplicate=False):
        result_list = []
        ignored_tokens = self.get_ignored_tokens()
        end_idx = ignored_tokens[1]
        batch_size = len(text_index)
        for batch_idx in range(batch_size):
            char_list = []
            conf_list = []
            for idx in range(len(text_index[batch_idx])):
                # NOTE: the reference `continue`s on sos/eos before its eos
                # `break` can trigger (rec_postprocess.py:163-168), so decoding
                # runs past eos; we stop at eos (the intended semantics).
                if int(text_index[batch_idx][idx]) == int(end_idx):
                    break
                if text_index[batch_idx][idx] in ignored_tokens:
                    continue
                if is_remove_duplicate:
                    if (
                        idx > 0
                        and text_index[batch_idx][idx - 1] == text_index[batch_idx][idx]
                    ):
                        continue
                char_list.append(self.character[int(text_index[batch_idx][idx])])
                if text_prob is not None:
                    conf_list.append(text_prob[batch_idx][idx])
                else:
                    conf_list.append(1)
            text = "".join(char_list)
            result_list.append((text, float(np.mean(conf_list)) if conf_list else 0.0))
        return result_list

    def get_ignored_tokens(self):
        beg_idx = np.array(self.dict[self.beg_str])
        end_idx = np.array(self.dict[self.end_str])
        return [beg_idx, end_idx]
