"""OCRDataLoader worker modes: thread (default) vs process (fork workers).

Process mode is the torch-DataLoader-num_workers>0 equivalent (reference
pytocr/data/__init__.py:20-31 passes num_workers to torch's process-based
DataLoader) for GT-maker-heavy det pipelines whose Python cost serializes
on the GIL.  These tests pin the contract: same batching/sharding/epoch
semantics as thread mode, diverse-but-reproducible augmentation RNG, and
worker exceptions surfaced to the consumer.
"""

import numpy as np
import pytest

from pytorchocr_tpu.data.loader import OCRDataLoader


class _SquareDataset:
    """dataset[i] -> (i, i**2) as arrays; deterministic, no RNG."""

    def __len__(self):
        return 23

    def __getitem__(self, i):
        return (np.full((2, 3), i, np.float32), np.array([i * i], np.int64))


class _RandDataset:
    """dataset[i] -> a draw from the *global* np.random stream — the same
    channel the imaug ops use (random_crop_data.py, color_jitter.py)."""

    def __len__(self):
        return 16

    def __getitem__(self, i):
        return (np.random.rand(4).astype(np.float32),)


class _BoomDataset:
    def __len__(self):
        return 8

    def __getitem__(self, i):
        if i == 5:
            raise ValueError("boom at 5")
        return (np.zeros(2, np.float32),)


def _collect(loader):
    return [tuple(np.asarray(f) for f in b) for b in loader]


@pytest.mark.parametrize("mode", ["thread", "process"])
def test_batching_semantics_identical(mode):
    loader = OCRDataLoader(
        _SquareDataset(), batch_size=4, shuffle=True, drop_last=False,
        num_workers=2, seed=3, worker_mode=mode,
    )
    loader.set_epoch(1)
    batches = _collect(loader)
    assert len(batches) == 6  # ceil(23/4)
    seen = sorted(int(b[0][j, 0, 0]) for b in batches for j in range(b[0].shape[0]))
    assert seen == list(range(23))  # every sample exactly once
    for b in batches:
        np.testing.assert_array_equal(b[1][:, 0], (b[0][:, 0, 0] ** 2).astype(np.int64))


def test_process_mode_order_matches_thread_mode():
    def order(mode):
        loader = OCRDataLoader(
            _SquareDataset(), batch_size=5, shuffle=True, num_workers=2,
            seed=11, worker_mode=mode,
        )
        loader.set_epoch(2)
        return [int(v) for b in _collect(loader) for v in b[0][:, 0, 0]]

    assert order("thread") == order("process")


def test_process_mode_rng_diverse_and_reproducible():
    def draws(epoch):
        loader = OCRDataLoader(
            _RandDataset(), batch_size=4, shuffle=False, num_workers=2,
            seed=5, worker_mode="process",
        )
        loader.set_epoch(epoch)
        return np.concatenate([b[0] for b in _collect(loader)], axis=0)

    a, b, c = draws(0), draws(0), draws(1)
    # reproducible: same (seed, epoch) -> same augmentation stream
    np.testing.assert_array_equal(a, b)
    # diverse: across batches (different task seeds) and across epochs
    assert len({x.tobytes() for x in a}) == len(a)
    assert not np.array_equal(a, c)


def test_worker_exception_surfaces():
    for mode in ("thread", "process"):
        loader = OCRDataLoader(
            _BoomDataset(), batch_size=4, shuffle=False, num_workers=2,
            worker_mode=mode,
        )
        with pytest.raises(Exception, match="boom at 5"):
            _collect(loader)


def test_early_consumer_exit_does_not_hang():
    loader = OCRDataLoader(
        _SquareDataset(), batch_size=2, shuffle=False, num_workers=2,
        worker_mode="process",
    )
    it = iter(loader)
    next(it)
    del it  # abandon mid-epoch; pool must be cancelled, not drained


def test_cache_decoded_identical_outputs_and_hit(tmp_path):
    """dataset.cache_decoded must be a pure memoization of DecodeImage:
    identical outputs on repeat access, decode paid once per path."""
    import numpy as np
    import cv2
    from pytorchocr_tpu.data.simple_dataset import SimpleDataSet
    from pytorchocr_tpu.utils.logging import get_logger

    img = np.random.RandomState(0).randint(0, 255, (32, 48, 3), np.uint8)
    p = str(tmp_path / "a.png")
    cv2.imwrite(p, img)
    label_file = str(tmp_path / "labels.txt")
    with open(label_file, "w") as f:
        f.write(f"{p}\tx\n")

    def make(cache):
        cfg = {
            "Global": {},
            "Eval": {
                "dataset": {
                    "name": "SimpleDataSet",
                    "label_file_list": [label_file],
                    "cache_decoded": cache,
                    "transforms": [
                        {"DecodeImage": {"img_mode": "RGB"}},
                        {"KeepKeys": {"keep_keys": ["image"]}},
                    ],
                },
                "loader": {"shuffle": False, "batch_size_per_card": 1},
            },
        }
        return SimpleDataSet(cfg, "Eval", get_logger())

    ds_plain, ds_cached = make(False), make(True)
    a = ds_plain[0][0]
    b1 = ds_cached[0][0]
    assert len(ds_cached._decode_cache) == 1  # populated on first access
    b2 = ds_cached[0][0]  # served from cache
    np.testing.assert_array_equal(a, b1)
    np.testing.assert_array_equal(b1, b2)

    # cap 0: nothing cached, output still correct
    ds_cap = make(True)
    ds_cap._decode_cache_cap = 0
    c = ds_cap[0][0]
    np.testing.assert_array_equal(a, c)
    assert len(ds_cap._decode_cache) == 0


def test_broken_pool_surfaces_instead_of_hanging(monkeypatch):
    """If submit() itself raises (BrokenProcessPool after an OOM-killed
    worker), the error must reach the consumer — not die with the producer
    thread and leave the consumer blocked on the queue forever."""
    import concurrent.futures as cf

    from pytorchocr_tpu.data import loader as loader_mod

    class _BrokenPool:
        def __init__(self, *a, **k):
            pass

        def submit(self, *a, **k):
            raise cf.process.BrokenProcessPool("worker died")

        def shutdown(self, *a, **k):
            pass

    monkeypatch.setattr(loader_mod, "ThreadPoolExecutor", _BrokenPool)
    loader = OCRDataLoader(
        _SquareDataset(), batch_size=4, shuffle=False, num_workers=2,
        worker_mode="thread",
    )
    with pytest.raises(cf.process.BrokenProcessPool, match="worker died"):
        _collect(loader)


def test_bgjobs_reap_kills_registered_subtree(tmp_path):
    """bgjobs.reap must kill the whole registered process subtree by exact
    pid and clear the registry; unregistered processes are untouched."""
    import subprocess, time, os
    from pytorchocr_tpu.utils import bgjobs

    pids_file = str(tmp_path / "bg.pids")
    # a shell that spawns a child sleep: two-level subtree
    victim = subprocess.Popen(["bash", "-c", "sleep 60 & wait"])
    bystander = subprocess.Popen(["sleep", "60"])
    try:
        # wait until bash has actually forked the sleep child (under CPU
        # contention a fixed 0.3s was not always enough)
        deadline = time.time() + 20
        subtree = bgjobs._subtree(victim.pid)
        while len(subtree) < 2 and time.time() < deadline:
            time.sleep(0.1)
            subtree = bgjobs._subtree(victim.pid)
        assert len(subtree) >= 2, subtree  # [sleep_pid, bash_pid]

        bgjobs.register(victim.pid, pids_file)
        killed = bgjobs.reap(pids_file, grace_s=2.0)
        assert victim.pid in killed
        # the victim must DIE promptly; its exit status is irrelevant (bash
        # reports -15/143, or 0 when it reaped the killed job before its
        # `wait` builtin recorded a status — observed under heavy load)
        victim.wait(timeout=10)
        # the grandchild must be gone too (possibly after init reaps the
        # reparented zombie)
        sleep_pids = [p for p in subtree if p != victim.pid]
        deadline = time.time() + 10
        while any(bgjobs._alive(p) for p in sleep_pids) and time.time() < deadline:
            time.sleep(0.1)
        assert not any(bgjobs._alive(p) for p in sleep_pids)
        assert bystander.poll() is None  # untouched
        assert not os.path.exists(pids_file)
        assert bgjobs.reap(pids_file) == []  # idempotent
    finally:
        bystander.kill()
        if victim.poll() is None:
            victim.kill()


def test_cache_transformed_eval_only_memoization(tmp_path):
    """dataset.cache_transformed: eval-only full-pipeline memoization —
    identical outputs, served-from-cache on repeat, disabled for train."""
    import numpy as np
    import cv2
    from pytorchocr_tpu.data.simple_dataset import SimpleDataSet
    from pytorchocr_tpu.utils.logging import get_logger

    img = np.random.RandomState(1).randint(0, 255, (32, 48, 3), np.uint8)
    p = str(tmp_path / "a.png")
    cv2.imwrite(p, img)
    label_file = str(tmp_path / "labels.txt")
    with open(label_file, "w") as f:
        f.write(f"{p}\tx\n")

    def make(mode, cache):
        cfg = {
            "Global": {},
            mode: {
                "dataset": {
                    "name": "SimpleDataSet",
                    "label_file_list": [label_file],
                    "cache_transformed": cache,
                    "transforms": [
                        {"DecodeImage": {"img_mode": "RGB"}},
                        {"KeepKeys": {"keep_keys": ["image"]}},
                    ],
                },
                "loader": {"shuffle": False, "batch_size_per_card": 1},
            },
        }
        return SimpleDataSet(cfg, mode, get_logger())

    ds_plain = make("Eval", False)
    ds_cached = make("Eval", True)
    a = ds_plain[0][0]
    b1 = ds_cached[0][0]
    assert len(ds_cached._out_cache) == 1
    out2 = ds_cached[0]
    assert out2 is ds_cached._out_cache[0]  # served from cache
    np.testing.assert_array_equal(a, b1)
    np.testing.assert_array_equal(b1, out2[0])

    # train mode: flag is refused (stochastic augs would be frozen)
    ds_train = make("Train", True)
    assert not ds_train.cache_transformed

    # cap 0: nothing cached, output still correct
    ds_cap = make("Eval", True)
    ds_cap._out_cache_cap = 0
    np.testing.assert_array_equal(a, ds_cap[0][0])
    assert len(ds_cap._out_cache) == 0
