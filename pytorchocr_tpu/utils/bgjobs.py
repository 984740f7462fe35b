"""Background-job registry for benchmark isolation.

Long quality trainings run as detached background queues on the same
single TPU chip the driver benchmarks.  A concurrent tunneled client both
skews on-device timing and has (twice, observed) wedged the shared device
client mid-step — so the benchmark entry points reap the registered
queues before measuring.

Registration is explicit (a pid file the queue runner writes); reaping
kills each registered process SUBTREE by exact pid, walking
/proc/<pid>/task/*/children — never by name pattern, which could match
unrelated processes.
"""

import os
import signal
import time

PIDS_FILE = "/tmp/ocr_tpu_bg.pids"


def register(pid, pids_file=PIDS_FILE):
    """Append a root pid to the registry (one per line).

    The line records ``pid starttime`` (starttime = field 22 of
    /proc/pid/stat, clock ticks since boot) so reap() can detect pid
    recycling: a stale registry entry whose pid the kernel has since
    reassigned to an unrelated process must never be killed.
    """
    pid = int(pid)
    with open(pids_file, "a") as f:
        f.write("%d %s\n" % (pid, _starttime(pid) or ""))


def _starttime(pid):
    """Process start time in clock ticks, or None if unreadable."""
    try:
        with open("/proc/%d/stat" % pid) as f:
            stat = f.read()
        # comm (field 2) may contain spaces/parens — split after last ')'
        return stat[stat.rindex(")") + 2:].split()[19]  # field 22
    except (OSError, ValueError, IndexError):
        return None


def _children(pid):
    kids = []
    task_dir = "/proc/%d/task" % pid
    try:
        tids = os.listdir(task_dir)
    except OSError:
        return kids
    for tid in tids:
        try:
            with open(os.path.join(task_dir, tid, "children")) as f:
                kids.extend(int(c) for c in f.read().split())
        except (OSError, ValueError):
            continue
    return kids


def _subtree(pid):
    """Depth-first subtree, children before parents (kill order)."""
    out = []
    for kid in _children(pid):
        out.extend(_subtree(kid))
    out.append(pid)
    return out


def reap(pids_file=PIDS_FILE, grace_s=5.0, log=None):
    """Kill every registered process subtree.  Returns killed pids.

    Set OCR_TPU_BG_KEEP=1 to skip (e.g. a manual entry()/bench smoke test
    while the quality queues are intentionally running)."""
    if os.environ.get("OCR_TPU_BG_KEEP"):
        return []
    if not os.path.exists(pids_file):
        return []
    try:
        roots = []
        with open(pids_file) as f:
            for line in f:
                parts = line.split()
                if not parts:
                    continue
                try:
                    pid = int(parts[0])
                except ValueError:
                    # torn concurrent append (the file is appended by the
                    # queue shell AND every self-registering train/eval
                    # child): skip the bad line, keep reaping the rest —
                    # a single malformed line must not defeat benchmark
                    # isolation.
                    continue
                if len(parts) > 1:
                    # starttime mismatch => the pid has been recycled to an
                    # unrelated process since registration: skip it.
                    if _starttime(pid) != parts[1]:
                        continue
                roots.append(pid)
    except OSError:
        return []
    victims = []
    for root in roots:
        for pid in _subtree(root):
            if pid == os.getpid():
                continue
            try:
                os.kill(pid, signal.SIGTERM)
                victims.append(pid)
            except ProcessLookupError:
                continue
            except PermissionError:
                continue
    if victims:
        if log:
            log("reaping %d background job pids before benchmark: %s"
                % (len(victims), victims))
        deadline = time.monotonic() + grace_s
        while time.monotonic() < deadline:
            if not any(_alive(p) for p in victims):
                break
            time.sleep(0.2)
        for pid in victims:
            if _alive(pid):
                try:
                    os.kill(pid, signal.SIGKILL)
                except OSError:
                    continue
    try:
        os.remove(pids_file)
    except OSError:
        pass
    return victims


def _alive(pid):
    try:
        os.kill(pid, 0)
        return True
    except OSError:
        return False
