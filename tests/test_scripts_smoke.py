"""CPU smoke tests for the evidence-generating scripts.

These scripts produced every training/eval artifact in PERF.md, and two of
them silently broke during round 4 (the update_bn one-pass inconsistency
zeroed x768_eval's mAP; an edited-while-running queue skipped re-runs).
Each test drives the real ``main(argv)`` entry with a tiny model on the
forced-CPU test mesh so a code-level regression in any script surfaces in
the suite instead of after hours of chip time.

Scripts covered: train_flagship_synth (incl. --desc override + final eval),
occlusion_study (3 serving arms), x768_eval (surgery + BN recal + eval +
bench), profile_wide (fused-prefix timing decomposition).
"""
import os
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SCRIPTS = os.path.join(REPO, "scripts")
for p in (REPO, SCRIPTS):
    if p not in sys.path:
        sys.path.insert(0, p)

# Tiny v2 (clustering) detection model: the occlusion study requires
# nms_threshold < 1 and x768_eval exercises the same fused paths.
TINY_V2_DESC = ("C[8,3] BN A DNC[16] DNS[2,8,0.01,0.1,2,0.7] "
                "C[16,1] BN A DND.JB[0.5,1.0,1.0]")
SIZE = 48
CLASS_NUM = 5


@pytest.fixture(scope="module", autouse=True)
def _no_chiplock():
    """The scripts yield to a /tmp bench lock; under pytest a concurrent
    real-chip bench (the background queue) must not stall the CPU suite."""
    import contextlib

    from denet_tpu.utils import chiplock
    orig_yield, orig_busy = chiplock.yield_to_bench, chiplock.queue_busy
    chiplock.yield_to_bench = lambda *a, **k: 0.0
    chiplock.queue_busy = lambda *a, **k: contextlib.nullcontext()
    yield
    chiplock.yield_to_bench, chiplock.queue_busy = orig_yield, orig_busy


@pytest.fixture(scope="module")
def tiny_ckpt(tmp_path_factory):
    out = str(tmp_path_factory.mktemp("smoke") / "tiny_v2.mdl.gz")
    import train_flagship_synth
    rc = train_flagship_synth.main([
        "--desc", TINY_V2_DESC, "--steps", "6", "--batch", "2",
        "--size", str(SIZE), "--class-num", str(CLASS_NUM),
        "--dist", "hard", "--eval-batches", "1", "--eval-soft-nms",
        "--lr", "0.001", "--out", out])
    assert rc == 0
    assert os.path.exists(out)
    return out


def test_train_script_tiny(tiny_ckpt):
    """Training + save + same-process eval ran end-to-end (fixture)."""
    from denet_tpu.core.model import load_from_file
    model = load_from_file(tiny_ckpt, batch_size=2)
    assert model.class_num == CLASS_NUM
    sparse = [l for l in model.layers if l.type_name == "denet-sparse"][0]
    assert sparse.nms_threshold == 0.7     # --desc override reached build


def test_occlusion_study_tiny(tiny_ckpt, capsys):
    import occlusion_study
    rc = occlusion_study.main([
        "--model", tiny_ckpt, "--batches", "1", "--batch", "2",
        "--size", str(SIZE), "--dist", "hard"])
    out = capsys.readouterr().out
    assert rc in (0, None)
    for tag in ("=== clustered ===", "=== no-clustering ===",
                "=== distinct-second ===", "vs clustered:"):
        assert tag in out, out[-2000:]


def test_x768_eval_tiny(tiny_ckpt, tmp_path, capsys):
    import x768_eval
    out_model = str(tmp_path / "tiny_x96.mdl.gz")
    rc = x768_eval.main([
        "--model", tiny_ckpt, "--out", out_model, "--size", "96",
        "--sample-num", "8", "--bn-batches", "1", "--eval-batches", "1",
        "--bench-iters", "2", "--dist", "hard", "--tag", "smoke_x96",
        "--baseline-hz", "1.0"])
    out = capsys.readouterr().out
    assert rc == 0
    assert os.path.exists(out_model)
    assert "recalibrated" in out
    assert '"metric": "smoke_x96"' in out
    from denet_tpu.core.model import load_from_file
    m = load_from_file(out_model, batch_size=2)
    assert m.data_shape[1] == 96           # surgery really resized


def test_finetune_surgery_model_tiny(tiny_ckpt, tmp_path, capsys):
    """The queue_r17 768-native fine-tune path: scale-surgery output fed
    back into training via --init-model at the NEW size (--size follows
    the surgery), with mid-run checkpointing — the reference's best
    published row trains at 768 natively (README.md:128) rather than
    relying on surgery + BN recalibration alone."""
    import train_flagship_synth
    import x768_eval

    surg = str(tmp_path / "tiny_x96s.mdl.gz")
    rc = x768_eval.main([
        "--model", tiny_ckpt, "--out", surg, "--size", "96",
        "--sample-num", "8", "--bn-batches", "1", "--eval-batches", "0",
        "--bench-iters", "2", "--dist", "hard", "--tag", "smoke_ft",
        "--baseline-hz", "1.0"])
    capsys.readouterr()
    assert rc == 0

    ft = str(tmp_path / "tiny_x96_ft.mdl.gz")
    rc = train_flagship_synth.main([
        "--dist", "hard", "--eval-batches", "1", "--eval-soft-nms",
        "--size", "96", "--batch", "2", "--class-num", str(CLASS_NUM),
        "--steps", "4", "--lr", "0.002", "--save-every", "2",
        "--init-model", surg, "--out", ft])
    assert rc == 0
    assert os.path.exists(ft)
    from denet_tpu.core.model import load_from_file
    m = load_from_file(ft, batch_size=2)
    assert m.data_shape[1] == 96           # fine-tune kept the new size


def test_profile_wide_tiny(tiny_ckpt, capsys):
    import profile_wide
    rc = profile_wide.main([
        "--model", tiny_ckpt, "--iters", "2", "--size", str(SIZE)])
    out = capsys.readouterr().out
    assert rc in (0, None)
    assert "full pipeline" in out
    assert "trunk" in out


def _train_leaves(path):
    import jax

    from denet_tpu.core.model import load_from_file
    m = load_from_file(path, batch_size=2)
    import numpy
    return [numpy.asarray(x)
            for x in jax.tree_util.tree_leaves((m.params, m.state))]


@pytest.mark.parametrize("scan", [0, 2], ids=["plain", "scan"])
def test_train_resume_bit_identical(tmp_path, scan):
    """--save-every + simulated crash + --resume reproduces the
    uninterrupted run BIT-identically (VERDICT r4 item 5): params, BN
    state, solver slots, the device rng chain and the host data-rng
    stream are all restored, in both the pipelined and the scan-K loop."""
    import numpy

    import train_flagship_synth

    common = ["--desc", TINY_V2_DESC, "--batch", "2",
              "--size", str(SIZE), "--class-num", str(CLASS_NUM),
              "--dist", "hard", "--lr", "0.001", "--steps", "6",
              "--scan", str(scan)]
    a = str(tmp_path / "straight.mdl.gz")
    assert train_flagship_synth.main(common + ["--out", a]) == 0

    b = str(tmp_path / "resumed.mdl.gz")
    # "crash" right after the step-3 (plain) / step-2 (scan) checkpoint
    stop = "2" if scan else "3"
    assert train_flagship_synth.main(
        common + ["--out", b, "--save-every", stop,
                  "--stop-after", stop]) == 0
    assert os.path.exists(b + ".resume.npz")
    assert train_flagship_synth.main(
        common + ["--out", b, "--save-every", stop, "--resume"]) == 0

    la, lb = _train_leaves(a), _train_leaves(b)
    assert len(la) == len(lb)
    for x, y in zip(la, lb):
        numpy.testing.assert_array_equal(x, y)


def test_stall_watchdog_fires_and_beats():
    """The watchdog converts a relay wedge (main thread blocked forever in
    a remote call) into exit 42 so queue retry loops restart from the
    newest sidecar; beats from progress points must keep it quiet."""
    import subprocess
    import textwrap

    prog = textwrap.dedent("""
        import sys, time
        sys.path.insert(0, %r)
        from train_flagship_synth import _StallWatchdog
        wd = _StallWatchdog(%s).start()
        for _ in range(%d):
            time.sleep(0.2)
            %s
        print("SURVIVED", flush=True)
    """)
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    # no beats: fires within ~stall_s + one 5s poll
    out = subprocess.run(
        [sys.executable, "-c", prog % (SCRIPTS, "0.3", 40, "pass")],
        capture_output=True, text=True, timeout=60, env=env)
    assert out.returncode == 42, (out.returncode, out.stdout, out.stderr)
    assert "STALL WATCHDOG" in out.stdout
    # beating faster than stall_s: survives to a clean exit
    out = subprocess.run(
        [sys.executable, "-c", prog % (SCRIPTS, "3.0", 30, "wd.beat()")],
        capture_output=True, text=True, timeout=60, env=env)
    assert out.returncode == 0, (out.returncode, out.stdout, out.stderr)
    assert "SURVIVED" in out.stdout
