"""Multi-host data-parallel evidence: a real 2-process jax.distributed CPU
cluster (4 virtual devices each), exercising the exact code paths the
multi-host trainer uses — jax.distributed.initialize, per-host loader
sharding, jax.make_array_from_process_local_data global batches, a
cross-process train step, and process_index()==0 gating.

Replaces what the reference only ever tested manually with
torch.distributed.launch (SURVEY.md §4: "the distributed path is exercised
only manually"); rank semantics per reference tools/program.py:122-135.
"""

import json
import os
import socket
import subprocess
import sys

import pytest


def _free_port():
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.mark.slow
def test_two_process_data_parallel(tmp_path):
    here = os.path.dirname(os.path.abspath(__file__))
    repo = os.path.abspath(os.path.join(here, ".."))

    # shared synthetic dataset (16 rec lines, absolute paths in label file)
    sys.path.insert(0, here)
    import synth

    datadir = str(tmp_path / "rec_data")
    synth.make_rec_dataset(datadir, n=16)

    port = _free_port()
    outdir = str(tmp_path)
    env = {k: v for k, v in os.environ.items() if k != "XLA_FLAGS"}
    procs = [
        subprocess.Popen(
            [sys.executable, os.path.join(here, "multihost_worker.py"),
             str(pid), str(port), outdir, datadir],
            env=env, cwd=repo,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        )
        for pid in range(2)
    ]
    outs = [p.communicate(timeout=900)[0] for p in procs]
    for p, out in zip(procs, outs):
        assert p.returncode == 0, out[-3000:]

    results = []
    for pid in range(2):
        with open(os.path.join(outdir, "result_%d.json" % pid)) as f:
            results.append(json.load(f))

    # process indices assigned as requested
    assert sorted(r["process_index"] for r in results) == [0, 1]

    # loader sharding: disjoint halves covering the full dataset
    s0 = set(results[0]["shard_paths"])
    s1 = set(results[1]["shard_paths"])
    assert len(s0) == 8 and len(s1) == 8
    assert not (s0 & s1), "per-host shards overlap"
    assert len(s0 | s1) == 16, "shards do not cover the dataset"

    # the cross-process all-reduce produced identical replicated state:
    # same loss and same post-update param checksum on both processes
    assert results[0]["loss"] == pytest.approx(results[1]["loss"], rel=1e-6)
    assert results[0]["param_checksum"] == pytest.approx(
        results[1]["param_checksum"], rel=1e-6
    )

    # rank-0 gating: exactly one process wrote the artifact
    assert os.path.exists(os.path.join(outdir, "rank0_artifact"))
