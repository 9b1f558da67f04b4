"""bench.py must always run end-to-end — the driver measures the round with
it.  Smoke the full protocol (stage, calibrate, fused pipeline, stacked
drain, dets_to_lists) at tiny size on CPU via the env overrides."""
import json
import subprocess
import sys
import os


def test_bench_smoke():
    env = dict(os.environ, JAX_PLATFORMS="cpu", DENET_BENCH_BATCH="2",
               DENET_BENCH_SIZE="64", DENET_BENCH_ITERS="4")
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out = subprocess.run([sys.executable, os.path.join(root, "bench.py")],
                         env=env, capture_output=True, text=True,
                         timeout=400, cwd=root)
    assert out.returncode == 0, out.stderr[-2000:]
    # the CPU smoke must not arbitrate for the chip: taking the real
    # /tmp bench lock pauses a live trainer, and waiting on its queue-busy
    # marker can pin this test for the whole block (seen round 5: a wedged
    # trainer's keepalive kept the marker fresh and the smoke timed out)
    assert "skipping chip arbitration" in out.stdout
    line = out.stdout.strip().splitlines()[-1]
    r = json.loads(line)
    assert set(r) == {"metric", "value", "unit", "vs_baseline"}
    assert r["unit"] == "images/sec" and r["value"] > 0
