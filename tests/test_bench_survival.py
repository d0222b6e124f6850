"""bench.py survivability contract (round 5): the driver must get a
parseable cumulative JSON line even when a leg hangs/SIGALRMs or the
whole process is killed mid-run.

The round-4 driver capture died with rc=124 and parsed=null because the
single JSON line printed only after the last leg; these tests pin the
fix — per-leg incremental emission + global-deadline scheduling."""

import json
import os
import signal
import subprocess
import sys
import time

BENCH = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "bench.py")


def _tiny_env(tmp_path, **over):
    env = dict(os.environ)
    env.update({
        "REGENIE_TPU_PLATFORM": "cpu",  # no probe, no fallback dance
        "JAX_PLATFORMS": "cpu",
        "BENCH_N": "1200", "BENCH_P": "3", "BENCH_B": "64",
        "BENCH_BLOCKS": "2", "BENCH_K": "4", "BENCH_ROUNDS": "1",
        "BENCH_TIMEOUT": "240",
        "BENCH_PARTIAL": str(tmp_path / "partial.jsonl"),
    })
    env.pop("BENCH_T0", None)
    env.pop("BENCH_ACCUM", None)
    env.update(over)
    return env


def _last_json(text):
    doc = None
    for line in text.splitlines():
        line = line.strip()
        if line.startswith("{"):
            try:
                doc = json.loads(line)
            except ValueError:
                continue
    return doc


def test_faulted_leg_does_not_lose_the_run(tmp_path):
    """A mock leg that hangs until its SIGALRM budget expires must not
    prevent the final cumulative JSON from being emitted."""
    env = _tiny_env(
        tmp_path,
        BENCH_FAULT="bt_firth", BENCH_FAULT_S="2",
        BENCH_SKIP="bgen,step1,pipeline,genebased,e2e",
    )
    r = subprocess.run([sys.executable, BENCH], capture_output=True,
                       text=True, env=env, timeout=220)
    assert r.returncode == 0, r.stderr[-800:]
    doc = _last_json(r.stdout)
    assert doc is not None, r.stdout[-500:]
    assert doc["partial"] is False
    # the faulted leg is absent; everything else survived
    assert "step2_bt_firth" not in doc["extra"]
    assert doc["extra"].get("cpu_baseline_host")
    assert doc["extra"].get("step2_qt_resident")
    assert doc["value"] == doc["extra"]["step2_qt_resident"]
    # the aborted mock leg is visible in stderr provenance
    assert "aborted" in r.stderr


def test_kill_mid_run_leaves_parseable_cumulative_line(tmp_path):
    """SIGKILL while a later leg hangs: stdout already holds the
    cumulative JSON from the completed legs (incremental emission)."""
    out_path = tmp_path / "stdout.txt"
    partial = tmp_path / "partial.jsonl"
    env = _tiny_env(
        tmp_path,
        # the bgen leg hangs for far longer than the test waits
        BENCH_FAULT="bgen", BENCH_FAULT_S="600", BENCH_TIMEOUT="900",
        BENCH_SKIP="bt_firth,step1,host,pipeline,genebased,e2e",
    )
    with open(out_path, "wb") as out_fh:
        proc = subprocess.Popen([sys.executable, BENCH], stdout=out_fh,
                                stderr=subprocess.DEVNULL, env=env)
        try:
            deadline = time.time() + 200
            seen = False
            while time.time() < deadline:
                if partial.exists():
                    txt = partial.read_text()
                    if "step2_qt_resident" in txt:
                        seen = True
                        break
                time.sleep(1.0)
            assert seen, "qt leg never emitted a partial line"
            # now the bench is inside the hanging bgen mock — kill hard
            proc.send_signal(signal.SIGKILL)
            proc.wait(timeout=30)
        finally:
            if proc.poll() is None:
                proc.kill()
    doc = _last_json(out_path.read_text())
    assert doc is not None, "no cumulative JSON on stdout before the kill"
    assert doc["partial"] is True
    assert doc["extra"].get("step2_qt_resident")
    assert doc["value"] == doc["extra"]["step2_qt_resident"]
