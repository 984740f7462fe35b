"""Benchmark-isolation registry (utils/bgjobs.py): reap() must actually
kill a registered process SUBTREE — round-2 postmortem found the registry
honor-system (register had zero call sites) while a background training
wedged the shared chip client under the driver's bench.  Registration is
now wired into tools/quality_queue.sh and tools/train.py / tools/eval.py
(OCR_TPU_REGISTER_BG=1); these tests pin the kill mechanics.
"""

import os
import subprocess
import time

from pytorchocr_tpu.utils import bgjobs


def _alive(pid):
    try:
        os.kill(pid, 0)
        return True
    except OSError:
        return False


def test_reap_kills_registered_subtree(tmp_path):
    pids_file = str(tmp_path / "bg.pids")
    # a shell root with a backgrounded child: the subtree walk must find
    # and kill BOTH (children before parents)
    proc = subprocess.Popen(
        ["sh", "-c", "sleep 300 & echo $! ; wait"],
        stdout=subprocess.PIPE, text=True,
    )
    child_pid = int(proc.stdout.readline())
    assert _alive(proc.pid) and _alive(child_pid)

    bgjobs.register(proc.pid, pids_file=pids_file)
    victims = bgjobs.reap(pids_file=pids_file, grace_s=3.0)

    assert proc.pid in victims and child_pid in victims
    proc.wait(timeout=10)  # reparented zombie cleanup for the root
    deadline = time.monotonic() + 5
    while time.monotonic() < deadline and _alive(child_pid):
        time.sleep(0.1)
    assert not _alive(child_pid)
    assert not os.path.exists(pids_file), "registry must be cleared"


def test_reap_skips_recycled_pid(tmp_path):
    """A registry entry whose starttime no longer matches (pid recycled to
    an unrelated process) must never be killed."""
    pids_file = str(tmp_path / "bg.pids")
    proc = subprocess.Popen(["sleep", "300"])
    try:
        with open(pids_file, "w") as f:
            f.write("%d 1\n" % proc.pid)  # starttime 1 == boot: wrong
        victims = bgjobs.reap(pids_file=pids_file, grace_s=0.1)
        assert proc.pid not in victims
        assert _alive(proc.pid)
    finally:
        proc.kill()
        proc.wait()


def test_reap_honours_keep_env(tmp_path, monkeypatch):
    pids_file = str(tmp_path / "bg.pids")
    proc = subprocess.Popen(["sleep", "300"])
    try:
        bgjobs.register(proc.pid, pids_file=pids_file)
        monkeypatch.setenv("OCR_TPU_BG_KEEP", "1")
        assert bgjobs.reap(pids_file=pids_file) == []
        assert _alive(proc.pid)
    finally:
        proc.kill()
        proc.wait()


def test_queue_and_train_cli_register():
    """The isolation is only real if the long-running chip jobs register:
    pin the wiring textually (cheap canary against future unwiring)."""
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(repo, "tools", "quality_queue.sh")) as f:
        queue_src = f.read()
    assert "bgjobs.register($$)" in queue_src
    assert "OCR_TPU_REGISTER_BG=1" in queue_src
    for cli in ("train.py", "eval.py"):
        with open(os.path.join(repo, "tools", cli)) as f:
            src = f.read()
        assert "bgjobs.register(os.getpid())" in src, cli
