"""The real CLI path: tools/train.py on a synthetic rec dataset for two
epochs with eval + checkpointing, then resume from the checkpoint."""

import json
import os
import subprocess
import sys

import pytest

from synth import make_rec_dataset

REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))

CFG = """
Global:
  use_gpu: False
  distributed: False
  use_amp: False
  seed: 7
  epoch_num: 2
  log_smooth_window: 5
  print_batch_step: 1
  save_model_dir: {save_dir}
  ckpt_save_type: HighestAcc
  save_epoch_step: 100
  eval_epoch_step: [0, 1]
  cal_metric_during_train: False
  pretrained_model:
  checkpoints:
  use_tensorboard: False
  character_dict_path:
  max_text_length: 25
  use_space_char: False
Architecture:
  model_type: rec
  algorithm: CRNN
  in_channels: 1
  Transform:
  Backbone: {{name: VGG, model_name: v1, scale: 0.5}}
  Neck: {{name: SequenceEncoder, encoder_type: rnn, hidden_size: 32}}
  Head: {{name: CTCHead}}
Loss:
  name: CTCLoss
Optimizer:
  base_lr: 0.001
  optim: {{name: Adam, amsgrad: True}}
  lr_decay: {{name: WarmupPolyLR, warmup_epoch: 1, power: 0.9}}
PostProcess:
  name: CTCLabelDecode
Metric:
  name: RecMetric
  main_indicator: acc
Train:
  dataset:
    name: SimpleDataSet
    label_file_list: [{label_file}]
    transforms:
      - DecodeImage: {{img_mode: GRAY}}
      - CTCLabelEncode:
      - RecResizeImg: {{image_shape: [1, 32, 96]}}
      - KeepKeys: {{keep_keys: [image, label, length]}}
  loader: {{shuffle: True, batch_size_per_card: 8, drop_last: True, num_workers: 2}}
Eval:
  dataset:
    name: SimpleDataSet
    label_file_list: [{label_file}]
    transforms:
      - DecodeImage: {{img_mode: GRAY}}
      - CTCLabelEncode:
      - RecResizeImg: {{image_shape: [1, 32, 96]}}
      - KeepKeys: {{keep_keys: [image, label, length]}}
  loader: {{shuffle: False, drop_last: False, batch_size_per_card: 8, num_workers: 2}}
"""


def _run_train(cfg_path, extra_opts=()):
    env = dict(os.environ)
    env["OCR_TPU_PLATFORM"] = "cpu"
    env.pop("JAX_PLATFORMS", None)
    cmd = [sys.executable, os.path.join(REPO, "tools", "train.py"), "-c", cfg_path]
    if extra_opts:
        cmd += ["-o"] + list(extra_opts)
    return subprocess.run(
        cmd, cwd=REPO, env=env, capture_output=True, text=True, timeout=900
    )


@pytest.mark.slow
def test_train_cli_end_to_end(tmp_path):
    label_file = make_rec_dataset(str(tmp_path / "data"), n=16)
    save_dir = str(tmp_path / "out")
    cfg_path = str(tmp_path / "cfg.yml")
    with open(cfg_path, "w") as f:
        f.write(CFG.format(save_dir=save_dir, label_file=label_file))

    result = _run_train(cfg_path)
    assert result.returncode == 0, result.stdout[-3000:] + result.stderr[-3000:]
    # checkpoints + resolved config written
    assert os.path.isdir(os.path.join(save_dir, "latest"))
    assert os.path.isdir(os.path.join(save_dir, "best_accuracy"))
    assert os.path.exists(os.path.join(save_dir, "config.yml"))
    with open(os.path.join(save_dir, "latest", "global_state.json")) as f:
        gs = json.load(f)
    # start_epoch is the NEXT epoch to run: resume continues after the
    # last finished epoch instead of repeating it
    assert gs["start_epoch"] == 2 and gs["global_step"] == 4  # 2 epochs x 2 iters
    assert "best metric" in result.stdout

    # resume for one more epoch from latest
    result2 = _run_train(
        cfg_path,
        [
            "Global.checkpoints={}".format(os.path.join(save_dir, "latest")),
            "Global.epoch_num=3",
        ],
    )
    assert result2.returncode == 0, result2.stdout[-3000:] + result2.stderr[-3000:]
    assert "resume from" in result2.stdout
    with open(os.path.join(save_dir, "latest", "global_state.json")) as f:
        gs2 = json.load(f)
    # exactly one more epoch (epoch index 2) = +2 iters
    assert gs2["global_step"] == 6


@pytest.mark.slow
def test_train_cli_host_rss_watchdog_reexec(tmp_path):
    """Global.max_host_rss_gb: when host RSS crosses the limit at an epoch
    boundary, the trainer saves `latest` and re-execs itself with resume
    (mitigation for the tunneled-PJRT per-transfer host leak, see
    tools/program.py).  A tiny limit forces a re-exec after every epoch;
    the run must still complete all epochs with the right global_step."""
    label_file = make_rec_dataset(str(tmp_path / "data"), n=16)
    save_dir = str(tmp_path / "out_wd")
    cfg_path = str(tmp_path / "cfg.yml")
    with open(cfg_path, "w") as f:
        f.write(CFG.format(save_dir=save_dir, label_file=label_file))

    result = _run_train(cfg_path, ["Global.max_host_rss_gb=0.05"])
    assert result.returncode == 0, result.stdout[-3000:] + result.stderr[-3000:]
    assert "re-exec'ing with resume" in result.stdout + result.stderr
    assert "resume from" in result.stdout
    with open(os.path.join(save_dir, "latest", "global_state.json")) as f:
        gs = json.load(f)
    assert gs["start_epoch"] == 2 and gs["global_step"] == 4


@pytest.mark.slow
def test_train_cli_multi_step_dispatch(tmp_path):
    """steps_per_dispatch>1 path: 2 epochs x 2 iters grouped 2-per-call."""
    label_file = make_rec_dataset(str(tmp_path / "data"), n=16)
    save_dir = str(tmp_path / "out_multi")
    cfg_path = str(tmp_path / "cfg.yml")
    with open(cfg_path, "w") as f:
        f.write(CFG.format(save_dir=save_dir, label_file=label_file))

    result = _run_train(cfg_path, ["Global.steps_per_dispatch=2"])
    assert result.returncode == 0, result.stdout[-3000:] + result.stderr[-3000:]
    with open(os.path.join(save_dir, "latest", "global_state.json")) as f:
        gs = json.load(f)
    assert gs["global_step"] == 4


DET_CFG = """
Global:
  use_gpu: False
  distributed: False
  use_amp: False
  seed: 3
  epoch_num: 2
  log_smooth_window: 5
  print_batch_step: 1
  save_model_dir: {save_dir}
  ckpt_save_type: HighestAcc
  save_epoch_step: 100
  eval_epoch_step: [0, 2]
  cal_metric_during_train: False
  pretrained_model:
  checkpoints:
  use_tensorboard: False
  device_normalize: True   # uint8 wire + fused on-device ToTensor/Normalize
Architecture:
  model_type: det
  algorithm: DB
  Transform:
  Backbone: {{name: MobileNetV3, model_name: small, width_mult: 0.5, use_se: False}}
  Neck: {{name: FPN, out_channels: 48, mode: DB}}
  Head: {{name: DBHead, k: 50}}
Loss:
  name: DBLoss
  balance_loss: True
  main_loss_type: BCELoss
  alpha: 1
  beta: 10
  ohem_ratio: 3
Optimizer:
  base_lr: 0.001
  optim: {{name: Adam, amsgrad: True}}
  lr_decay: {{name: WarmupPolyLR, warmup_epoch: 1, power: 0.9}}
PostProcess:
  name: DBPostProcess
  thresh: 0.3
  box_thresh: 0.3
  unclip_ratio: 1.5
  score_mode: poly
Metric:
  name: DetMetric
  main_indicator: hmean
Train:
  dataset:
    name: SimpleDataSet
    label_file_list: [{label_file}]
    transforms:
      - DecodeImage: {{img_mode: RGB}}
      - DetLabelEncode:
      - EastRandomCropData: {{size: [128, 128], max_tries: 10, keep_ratio: True}}
      - MakeBorderMap: {{shrink_ratio: 0.4, thresh_min: 0.3, thresh_max: 0.7}}
      - MakeShrinkMap: {{shrink_ratio: 0.4, min_text_size: 4}}
      - ToTensor:
      - Normalize: {{mean: [0.485, 0.456, 0.406], std: [0.229, 0.224, 0.225]}}
      - KeepKeys: {{keep_keys: [image, threshold_map, threshold_mask, shrink_map, shrink_mask]}}
  loader: {{shuffle: True, batch_size_per_card: 8, drop_last: True, num_workers: 2}}
Eval:
  dataset:
    name: SimpleDataSet
    label_file_list: [{label_file}]
    transforms:
      - DecodeImage: {{img_mode: RGB}}
      - DetLabelEncode:
      - DetResizeForTest: {{image_shape: [128, 128]}}
      - ToTensor:
      - Normalize: {{mean: [0.485, 0.456, 0.406], std: [0.229, 0.224, 0.225]}}
      - KeepKeys: {{keep_keys: [image, shape, polys, ignore_tags]}}
  loader: {{shuffle: False, batch_size_per_card: 1, drop_last: False, num_workers: 1}}
"""


@pytest.mark.slow
def test_det_train_cli_with_hmean_eval(tmp_path):
    """Detection CLI path end to end: train -> eval (DetMetric hmean through
    the device postprocess) -> checkpoints."""
    from synth import make_det_dataset

    label_file = make_det_dataset(str(tmp_path / "data"), n=8, size=160)
    save_dir = str(tmp_path / "det_out")
    cfg_path = str(tmp_path / "det_cfg.yml")
    with open(cfg_path, "w") as f:
        f.write(DET_CFG.format(save_dir=save_dir, label_file=label_file))

    result = _run_train(cfg_path)
    assert result.returncode == 0, result.stdout[-3000:] + result.stderr[-3000:]
    assert "hmean" in result.stdout
    assert "cur metric" in result.stdout
    assert os.path.isdir(os.path.join(save_dir, "latest"))
