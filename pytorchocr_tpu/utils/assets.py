"""Packaged data-asset resolution.

The reference's configs point `character_dict_path` at its own package
layout (e.g. `./pytocr/utils/char_dict_6623.txt` —
reference configs/rec/rec_vgg_bilstm_ctc.yml), which only resolves when
the CWD is the reference checkout.  So that those configs run UNCHANGED
against this framework, a dict path that does not exist on disk falls
back to the packaged asset of the same basename in
`pytorchocr_tpu/utils/` (the charsets are byte-identical copies; see
PARITY.md).  Existing paths are always used as-is, so user-supplied
custom dictionaries take precedence.
"""

import os

_ASSET_DIR = os.path.dirname(os.path.abspath(__file__))


def resolve_dict_path(path):
    """Return `path` if it exists, else the packaged asset with the same
    basename (if any), else `path` unchanged (the caller's open() will
    raise the natural FileNotFoundError)."""
    if path is None or os.path.exists(path):
        return path
    candidate = os.path.join(_ASSET_DIR, os.path.basename(str(path)))
    if os.path.exists(candidate):
        return candidate
    return path
