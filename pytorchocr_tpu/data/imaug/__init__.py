"""Data augmentation / preprocessing op registry.

Mirrors the reference contract (pytocr/data/imaug/__init__.py:19-48): ops are
classes instantiated from a config list; `transform` runs a data dict through
the chain, aborting with None on any op returning None; `create_operators`
injects the `Global` section into every op's kwargs (this is how
character_dict_path / max_text_length reach the encoders).
"""

from .operators import (  # noqa: F401
    DecodeImage,
    KeepKeys,
    Normalize,
    NormalizeImage,
    Resize,
    DetResizeForTest,
    ToCHWImage,
    ToTensor,
)
from .label_ops import (  # noqa: F401
    AttnLabelEncode,
    ClsLabelEncode,
    CTCLabelEncode,
    DetLabelEncode,
    TableBoxEncode,
    TableLabelEncode,
)
from .rec_img_aug import (  # noqa: F401
    ClsResizeImg,
    RecAug,
    RecResizeImg,
    RecResizeImgForTest,
)
from .randaugment import RandAugment  # noqa: F401
from .iaa_augment import IaaAugment  # noqa: F401
from .fused_aug_crop import FusedDetAugCrop  # noqa: F401
from .random_crop_data import EastRandomCropData, RandomCropImgMask  # noqa: F401
from .make_shrink_map import MakeShrinkMap  # noqa: F401
from .make_border_map import MakeBorderMap  # noqa: F401
from .make_pse_gt import MakePseGt  # noqa: F401
from .make_pan_gt import MakePanGt  # noqa: F401
from .copy_paste import CopyPaste  # noqa: F401
from .color_jitter import ColorJitter  # noqa: F401
from .table_ops import ResizeTableImage, PaddingTableImage  # noqa: F401


def transform(data, ops=None):
    """Run the op chain over a data dict; None aborts the sample."""
    if ops is None:
        ops = []
    for op in ops:
        data = op(data)
        if data is None:
            return None
    return data


def create_operators(op_param_list, global_config=None):
    """Build operators from the config list of {OpName: {params}} dicts."""
    assert isinstance(op_param_list, list), "operator config should be a list"
    ops = []
    for operator in op_param_list:
        assert isinstance(operator, dict) and len(operator) == 1, (
            "yaml format error in transforms: %s" % operator
        )
        op_name = list(operator)[0]
        param = {} if operator[op_name] is None else dict(operator[op_name])
        if global_config is not None:
            param.update(global_config)
        op = eval(op_name)(**param)
        ops.append(op)
    return ops
