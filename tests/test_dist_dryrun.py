"""Two-process jax.distributed dryrun QA (VERDICT r03 missing #3): one
shard_map program whose ppermute/psum collectives span an OS process
boundary — the TPU-native replacement for the reference's gr-zeromq
multi-host seam (gr-zeromq/lib/base_impl.cc:38-80)."""
import json
import subprocess
import sys


def test_dist_two_process_wfm():
    r = subprocess.run(
        [sys.executable, "/root/repo/benchmarks/dist_dryrun.py"],
        capture_output=True, timeout=580)
    assert r.returncode == 0, r.stdout[-2000:]
    res = json.load(open("/root/repo/DIST_r04.json"))
    assert res["ok"], res
    assert res["process0"]["process_count"] == 2
    assert res["cross_process_sums_agree"]
    assert res["process0"]["max_rel_err_sum"] < 1e-4
