"""Benchmark: UKB-shaped throughput metrics on one chip.

Workload shape matches BASELINE.md's north star (UK Biobank step 2:
N≈400K samples, P=50 traits with an incomplete-trait mix, K=20
covariates; reference hardware class: 16 vCPU AMD EPYC 7571,
docs/docs/performance.md:81-82). Scales down automatically on the CPU
fallback backend so the driver always records a number.

Survivability design (round 5 — the round-4 driver capture died with
rc=124 and ZERO output because the one JSON line printed only at the
very end):
  * the cumulative one-line JSON is (re)printed to stdout after EVERY
    completed leg and appended to BENCH_PARTIAL (bench_partial.jsonl),
    so a kill at any point leaves the last cumulative line parseable;
  * legs are scheduled against the REMAINING global budget
    (BENCH_TIMEOUT, measured from the first exec): per-leg SIGALRM =
    min(420, remaining/legs_left), headline legs first, subprocess
    legs last;
  * the watchdog and the CPU-fallback re-exec both EMIT the
    accumulated JSON before exec/exit, and completed results ride the
    re-exec via the BENCH_ACCUM env var so a fallback never re-runs
    (or loses) finished legs;
  * probe retries are capped (attempts and wall-clock) against the
    same global clock.

TPU-probe hardening (round 3): the remote-TPU tunnel on this rig dies
intermittently for ~1h windows, so the chip is probed in a SUBPROCESS
(a hung PJRT call can't be interrupted by SIGALRM from inside the
process); the CPU fallback keeps re-probing after its (fast) metrics
finish and RE-EXECS back onto the TPU if the tunnel wakes up.

Metrics (all SNPs/s on this chip):
  step2_qt_resident — the flagship fused packed-bytes scorer
      (ops/fused_score.py) on device-resident packed blocks.  THE
      HEADLINE "value".
  step2_bgen_resident — imputed-dosage (BGEN probability-plane) path.
  step2_qt_e2e_cli — real CLI run incl. startup/compile (WAN-bound on
      this rig's tunneled chip: a floor, not the rig-local figure).
  pipeline_efficiency_cpu — e2e/resident measured on the SAME (cpu)
      backend, where H2D is local: proves the overlap machinery
      (mmap ingest -> prefetch upload -> fused score -> native render)
      composes without the tunnel poisoning the ratio (the reference
      analog is readChunk-while-OpenMP-computes, Data.cpp:2944).
  step2_bt_firth — fused BT products + batched approx-Firth refits on
      the corrected fraction (1% of SNPs).
  step1_level0 — level-0 LOOCV ridge SNPs/s at J=5 ridge params.
  genebased_sets_per_s — gene-based (burden+SKATO/ACATV) sets/s via
      the real CLI on a synthetic exome.
  host_* — host-side pipeline legs (ingest / decode / render).

vs_baseline: the same QT math in MULTITHREADED numpy float64 on this
host, normalized to the reference's 16-vCPU class by core count.

Prints ONE JSON line (cumulatively re-printed after each leg):
{"metric", "value", "unit", "vs_baseline", "backend",
 "extra": {<submetric>: SNPs/s}, "backends": {...}, "legs": {...}}.
"""

import json
import os
import signal
import subprocess
import sys
import time

import numpy as np


class _Timeout(Exception):
    pass


def _alarm(_sig, _frm):
    raise _Timeout


def _timed(budget, fn, *args):
    """Run fn under a SIGALRM budget; returns result or None."""
    try:
        signal.alarm(int(budget))
        return fn(*args)
    except (_Timeout, Exception) as e:  # noqa: BLE001 — bench must survive
        print(f"[bench] {fn.__name__} aborted: {type(e).__name__} {e}",
              file=sys.stderr)
        return None
    finally:
        signal.alarm(0)


# ---------------------------------------------------------------------
# cumulative state: survives watchdog kills (incremental emission) and
# CPU-fallback/rejoin re-execs (BENCH_ACCUM env var)
# ---------------------------------------------------------------------

def _load_state():
    s = os.environ.get("BENCH_ACCUM")
    if s:
        try:
            st = json.loads(s)
            if isinstance(st, dict) and "extra" in st:
                st.setdefault("backends", {})
                st.setdefault("legs", {})
                st.setdefault("shape", {})
                return st
        except (ValueError, TypeError):
            pass
    return {"extra": {}, "backends": {}, "legs": {}, "shape": {}}


STATE = _load_state()


def _headline():
    ex = STATE["extra"]
    # prefer a TPU-captured resident figure over a CPU one over e2e
    for k in ("step2_qt_resident", "step2_qt_e2e_cli"):
        v = ex.get(k)
        if v:
            return k, v, STATE["backends"].get(k, "?")
    return "step2_qt_resident", 0.0, "?"


def emit(final=False):
    """(Re)print the cumulative one-line JSON and append it to the
    partial file.  Called after every completed leg AND from the
    watchdog/fallback paths — the driver's tail always holds the most
    recent cumulative line even if we are killed mid-leg."""
    _src, val, hl_backend = _headline()
    cpu16 = STATE["extra"].get("cpu_baseline_16core_est")
    sh = STATE.get("shape", {})
    fallback = "_CPU_FALLBACK" if hl_backend == "cpu" else ""
    doc = {
        "metric": "step2_qt_score_snps_per_s_per_chip" + fallback,
        "value": round(val, 1),
        "unit": (f"SNPs/s (UKB shape: N={sh.get('N')}, P={sh.get('P')}, "
                 f"K={sh.get('K')}, {sh.get('n_inc')} incomplete traits, "
                 "device-resident packed 2-bit genotypes; extra: BGEN "
                 "dosage, e2e CLI, cpu-backend pipeline efficiency, "
                 "BT+1%-Firth, step-1 level-0 LOOCV, gene-based sets/s, "
                 "host ingest/decode/render legs; baseline = "
                 f"multithreaded numpy f64 on {os.cpu_count()} cores "
                 "scaled to the 16-vCPU reference class)"),
        "vs_baseline": round(val / cpu16, 2) if cpu16 else None,
        "backend": hl_backend,
        "schema": "bench-v5",  # v4 legs + pipeline_efficiency + partial emission
        "partial": not final,
        "compile_cache":
            os.environ.get("REGENIE_TPU_COMPILE_CACHE", "1") != "0",
        "extra": STATE["extra"],
        "backends": STATE["backends"],
        "legs": STATE["legs"],
    }
    line = json.dumps(doc)
    print(line, flush=True)
    try:
        pf = os.environ.get(
            "BENCH_PARTIAL",
            os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         "bench_partial.jsonl"))
        with open(pf, "a") as fh:
            fh.write(line + "\n")
    except OSError:
        pass


def record(name, value, backend, nd=1, **meta):
    if value:
        STATE["extra"][name] = round(value, nd)
        STATE["backends"][name] = backend
        if meta:
            STATE["legs"][name] = meta


def _accum_env(env):
    env["BENCH_ACCUM"] = json.dumps(STATE)
    return env


# ---------------------------------------------------------------------
# probe / fallback / rejoin machinery
# ---------------------------------------------------------------------

def _t0() -> float:
    """Epoch seconds at the FIRST bench invocation (carried across
    execve so probe windows and the watchdog are measured against the
    driver's single budget, not per-exec)."""
    if "BENCH_T0" not in os.environ:
        os.environ["BENCH_T0"] = repr(time.time())
    return float(os.environ["BENCH_T0"])


def _elapsed() -> float:
    return time.time() - _t0()


def _total_budget() -> float:
    return float(os.environ.get("BENCH_TIMEOUT", 2400))


def _remaining(reserve: float = 75.0) -> float:
    """Global budget left, minus a reserve for the final emit +
    subprocess teardown."""
    return _total_budget() - _elapsed() - reserve


def _subprocess_probe(timeout_s: float) -> bool:
    """True iff a fresh interpreter can run a matmul on a non-cpu
    backend within timeout_s.  Subprocess, because a dead tunnel hangs
    inside uninterruptible PJRT C calls."""
    env = {k: v for k, v in os.environ.items()
           if k not in ("REGENIE_TPU_PLATFORM", "JAX_PLATFORMS")}
    code = ("import jax, jax.numpy as jnp\n"
            "x = jnp.ones((256, 256))\n"
            "assert float((x @ x).sum()) == 256.0 * 256 * 256\n"
            "print('PROBE_OK', jax.default_backend())\n")
    try:
        r = subprocess.run([sys.executable, "-c", code],
                           capture_output=True, text=True,
                           timeout=timeout_s, env=env)
    except subprocess.TimeoutExpired:
        print("[bench] probe subprocess timed out", file=sys.stderr)
        return False
    for line in r.stdout.splitlines():
        if line.startswith("PROBE_OK"):
            backend = line.split()[-1]
            print(f"[bench] probe ok, backend={backend}", file=sys.stderr)
            return backend != "cpu"
    print("[bench] probe failed:", (r.stdout + r.stderr)[-400:],
          file=sys.stderr)
    return False


def _probe_with_retries(window_s: float, attempt_s: float) -> bool:
    """Probe the chip with bounded retries/backoff until it answers or
    the window (measured from BENCH_T0) closes.  Both the attempt count
    and the wall-clock are capped against the GLOBAL budget so dead-
    tunnel probes can't eat the leg budgets (round-4 failure mode)."""
    deadline = min(_elapsed() + window_s, _total_budget() * 0.30)
    max_attempts = int(os.environ.get("BENCH_PROBE_MAX", 3))
    sleep = 15.0
    attempt = 0
    while True:
        attempt += 1
        if _subprocess_probe(attempt_s):
            return True
        remaining = deadline - _elapsed()
        if remaining <= 5 or attempt >= max_attempts:
            print(f"[bench] probe window closed after {attempt} attempts",
                  file=sys.stderr)
            return False
        time.sleep(min(sleep, remaining))
        sleep = min(sleep * 2, 120.0)


def _exec_cpu_fallback(no_rejoin: bool = False):
    emit()  # never lose completed legs across the exec boundary
    env = _accum_env(dict(os.environ))
    env["REGENIE_TPU_PLATFORM"] = "cpu"
    env["BENCH_CPU_FALLBACK"] = "1"
    if no_rejoin:
        env["BENCH_NO_REJOIN"] = "1"
    os.execve(sys.executable, [sys.executable, __file__], env)


def _exec_tpu_rejoin():
    emit()
    env = _accum_env({k: v for k, v in os.environ.items()
                      if k not in ("REGENIE_TPU_PLATFORM",
                                   "BENCH_CPU_FALLBACK")})
    env["BENCH_REJOINS"] = str(int(os.environ.get("BENCH_REJOINS", 0)) + 1)
    os.execve(sys.executable, [sys.executable, __file__], env)


def _maybe_rejoin_tpu():
    """From the CPU fallback: keep probing the chip until the rejoin
    deadline; re-exec onto the TPU if the tunnel wakes up.  At most
    BENCH_MAX_REJOINS round-trips (a rejoin whose probe lied falls back
    to CPU with rejoin disabled, so this terminates).  CPU results ride
    BENCH_ACCUM, so the rejoin only re-runs the device legs."""
    if not os.environ.get("BENCH_CPU_FALLBACK"):
        return  # the user forced CPU explicitly — honor it
    if os.environ.get("BENCH_NO_REJOIN"):
        return
    if int(os.environ.get("BENCH_REJOINS", 0)) >= \
            int(os.environ.get("BENCH_MAX_REJOINS", 1)):
        return
    # leave enough budget for a device-leg pass after the re-exec
    deadline = _total_budget() * float(
        os.environ.get("BENCH_REJOIN_FRAC", 0.5))
    probe_s = float(os.environ.get("BENCH_PROBE_S", 60))
    while _elapsed() < deadline:
        print(f"[bench] CPU fallback: re-probing TPU "
              f"(elapsed {_elapsed():.0f}s / rejoin deadline "
              f"{deadline:.0f}s)", file=sys.stderr)
        if _subprocess_probe(probe_s):
            print("[bench] TPU tunnel is back; re-executing on TPU",
                  file=sys.stderr)
            _exec_tpu_rejoin()
        time.sleep(min(60.0, max(5.0, deadline - _elapsed())))


# ---------------------------------------------------------------------
# pipeline-efficiency child: e2e vs resident on the SAME cpu backend
# ---------------------------------------------------------------------

def _pipe_child():
    """Runs in a subprocess with JAX_PLATFORMS=cpu.  Measures (a) the
    device-resident fused-scorer rate and (b) the real CLI block-loop
    rate (mmap ingest -> prefetch upload -> fused score -> fetch ->
    native render) on the SAME backend, where H2D is local — the ratio
    is the pipeline efficiency the WAN tunnel can't poison.  Prints one
    JSON line {"resident": SNPs/s, "e2e": SNPs/s}."""
    import tempfile

    import jax
    import jax.numpy as jnp

    from regenie_tpu.ops import fused_score as fsc
    from regenie_tpu.utils.dtypes import (enable_compile_cache,
                                          enable_x64_if_cpu)

    enable_compile_cache()
    enable_x64_if_cpu()  # resident leg must run the same f64 math as the CLI
    rng = np.random.default_rng(7)
    Ne = int(os.environ.get("BENCH_PIPE_N", 20_000))
    # enough blocks to amortize the first-block one-time costs (fused
    # consts build + compile-cache lookups) that a short run counts
    # against the steady-state loop
    Me = int(os.environ.get("BENCH_PIPE_M", 16384))
    Pe = int(os.environ.get("BENCH_PIPE_P", 10))
    Bs = 2048
    d = tempfile.mkdtemp(prefix="bench_pipe_")
    nbe = (Ne + 3) // 4
    bed_body = rng.integers(0, 256, size=(Me, nbe), dtype=np.uint8)
    with open(f"{d}/g.bed", "wb") as fh:
        fh.write(b"\x6c\x1b\x01")
        fh.write(bed_body.tobytes())
    with open(f"{d}/g.bim", "w") as fh:
        for i in range(Me):
            fh.write(f"1\tsnp{i}\t0\t{i + 1}\tA\tC\n")
    ids = [f"F{i} I{i}" for i in range(Ne)]
    with open(f"{d}/g.fam", "w") as fh:
        for s in ids:
            fh.write(f"{s} 0 0 1 -9\n")
    ph_mat = rng.normal(size=(Ne, Pe))
    with open(f"{d}/ph.txt", "w") as fh:
        fh.write("FID IID " + " ".join(f"Y{j+1}" for j in range(Pe)) + "\n")
        for i, s in enumerate(ids):
            fh.write(s + " " + " ".join("%.4f" % v for v in ph_mat[i])
                     + "\n")

    # --- resident: the same kernel shape the CLI uses internally ---
    # (intercept-only covariate basis, f64 full-precision path on cpu)
    cov = np.full((Ne, 1), 1.0 / np.sqrt(Ne))
    res = ph_mat - ph_mat.mean(0)
    res /= res.std(0, ddof=1)
    maskf = np.ones((Ne, Pe))
    ind = np.ones(Ne, dtype=bool)
    consts = fsc.build_consts(cov, res, maskf, ind, float(Ne - 1),
                              split=False, dtype=np.float64)
    nbp = fsc.op_nbp(consts.Wp)
    run_qt = fsc.make_qt_block_fn(consts, use_pallas=False)
    blocks = [fsc.pad_raw(bed_body[i:i + Bs], nbp)
              for i in range(0, Me, Bs)]
    stacked = jnp.asarray(np.stack(blocks))
    out = run_qt.stack(stacked)
    jax.block_until_ready(jax.tree_util.tree_leaves(out))
    best = 0.0
    for _ in range(3):
        t0 = time.perf_counter()
        out = run_qt.stack(stacked)
        jax.block_until_ready(jax.tree_util.tree_leaves(out))
        best = max(best, Me / (time.perf_counter() - t0))

    # per-block dispatch+fetch — the CLI's exact compute pattern with
    # ZERO host glue.  e2e/this isolates the OVERLAP quality of the
    # pipeline; resident(stacked)/this isolates the dispatch-granularity
    # cost, which is not an overlap property at all
    blocks_j = [jnp.asarray(b) for b in blocks]
    for b in blocks_j:
        jax.block_until_ready(b)
    run_qt(blocks_j[0])
    best_pb = 0.0
    for _ in range(3):
        t0 = time.perf_counter()
        for b in blocks_j:
            outs = run_qt(b)
            jax.block_until_ready(jax.tree_util.tree_leaves(outs))
        best_pb = max(best_pb, Me / (time.perf_counter() - t0))

    # --- e2e: the real CLI; 2nd run rides the warm compile cache ---
    env = dict(os.environ)
    env["REGENIE_TPU_FUSED"] = "1"
    cli_to = float(os.environ.get("BENCH_PIPE_TIMEOUT", 240))
    loop = None
    for ri in range(2):
        r = subprocess.run(
            [sys.executable, "-m", "regenie_tpu", "--step", "2",
             "--bed", f"{d}/g", "--phenoFile", f"{d}/ph.txt",
             "--ignore-pred", "--bsize", str(Bs), "--out", f"{d}/o{ri}"],
            capture_output=True, text=True, env=env, timeout=cli_to)
        if r.returncode != 0:
            print("[pipe-child] CLI failed:", (r.stdout + r.stderr)[-800:],
                  file=sys.stderr)
            return
        # reset per run: a warm run missing the marker must NOT
        # silently inherit the cold run's loop time
        loop = None
        for line in r.stdout.splitlines():
            if "* done (" in line:
                loop = float(line.split("(")[1].split("s")[0])
    e2e = Me / loop if loop else None
    print(json.dumps({"resident": round(best, 1),
                      "resident_perblock": round(best_pb, 1),
                      "e2e": round(e2e, 1) if e2e else None}), flush=True)


def main():
    _t0()
    import jax

    plat = os.environ.get("REGENIE_TPU_PLATFORM")
    want_tpu = plat not in ("cpu",)
    if want_tpu:
        # probe the (remote) chip BEFORE the in-process backend init:
        # a dead tunnel hangs in uninterruptible C, so probe out of
        # process with bounded retries
        window = float(os.environ.get("BENCH_PROBE_WINDOW", 300))
        attempt = float(os.environ.get("BENCH_PROBE_S", 60))
        if int(os.environ.get("BENCH_REJOINS", 0)) > 0:
            window = min(window, 90.0)  # a rejoin already probed ok
        if not _probe_with_retries(window, attempt):
            print("bench: TPU probe failed; re-running on the cpu backend",
                  file=sys.stderr)
            _exec_cpu_fallback(
                no_rejoin=int(os.environ.get("BENCH_REJOINS", 0)) > 0)
    if plat:
        # config-level override (the env-var path can hang when a remote
        # PJRT plugin registered at interpreter start is unreachable)
        jax.config.update("jax_platforms", plat)
    import jax.numpy as jnp

    from regenie_tpu.utils.dtypes import enable_compile_cache

    enable_compile_cache()  # persistent XLA cache (deployment posture);
    # legs still compile cold on first-ever run of a shape — stamped below

    on_tpu = jax.default_backend() not in ("cpu",)
    dev_backend = "tpu" if on_tpu else "cpu"

    def _sync(outs):
        """Force device completion and return after the work is DONE.

        jax.block_until_ready is a NO-OP on some remote-tunneled PJRT
        backends (observed on this rig's axon tunnel: dispatch returns
        in ~0.1ms for multi-TFLOP programs and nothing materializes
        until a fetch).  Reduce one element of every output to a single
        scalar ON DEVICE and fetch those 4 bytes — the fetch forces the
        producing executables to run; on well-behaved backends this
        adds one tiny kernel + RTT.
        """
        leaves = [x for x in jax.tree_util.tree_leaves(outs)
                  if hasattr(x, "dtype")]
        jax.block_until_ready(leaves)
        if not leaves:
            return 0.0
        acc = jnp.zeros((), jnp.float32)
        for x in leaves:
            acc = acc + x.ravel()[:1].astype(jnp.float32).sum()
        return float(acc)

    # ---- UKB shape (BASELINE.md); scaled down on the CPU fallback ----
    if on_tpu:
        N = int(os.environ.get("BENCH_N", 400_000))
        P = int(os.environ.get("BENCH_P", 50))
        B = int(os.environ.get("BENCH_B", 2048))
        n_blocks = int(os.environ.get("BENCH_BLOCKS", 4))
    else:
        N = int(os.environ.get("BENCH_N", 20_000))
        P = int(os.environ.get("BENCH_P", 10))
        B = int(os.environ.get("BENCH_B", 512))
        n_blocks = int(os.environ.get("BENCH_BLOCKS", 2))
    K = int(os.environ.get("BENCH_K", 20))
    n_rounds = int(os.environ.get("BENCH_ROUNDS", 3))
    leg_cap = int(os.environ.get("BENCH_TIMEOUT_S", 420))

    rng = np.random.default_rng(0)
    nb = (N + 3) // 4
    raw_blocks = [
        rng.integers(0, 256, size=(B, nb), dtype=np.uint8)
        for _ in range(n_blocks)
    ]
    ind = np.ones(N, dtype=bool)
    res = rng.normal(size=(N, P))
    # incomplete-trait mix: 20% of traits carry 5% missingness — these
    # drive the CM interaction-column cost of the fused operand
    maskf = np.ones((N, P))
    n_inc = max(1, P // 5)
    for p in range(n_inc):
        missing = rng.random(N) < 0.05
        maskf[missing, p] = 0.0
        res[missing, p] = 0.0
    cov = np.linalg.qr(rng.normal(size=(N, K)))[0]
    Neff = maskf.sum(axis=0)

    STATE["shape"] = {"N": N, "P": P, "K": K, "n_inc": n_inc, "B": B}

    try:
        signal.signal(signal.SIGALRM, _alarm)
    except (ValueError, OSError):
        pass

    from regenie_tpu.ops import fused_score as fsc

    inner = int(os.environ.get("BENCH_INNER", 4))  # dispatches per sync.
    # Two layers of WAN-RTT amortization on this tunneled rig: each
    # dispatch runs ALL n_blocks via one jitted lax.map (4x fewer
    # execute round-trips), and each timed round syncs once after
    # `inner` dispatches (one scalar-fetch RTT per round).

    # =================== leg bodies ===================

    def bench_cpu_baseline():
        from regenie_tpu.io.bed import decode_bed_bytes

        # cap the baseline sample count: a [512, 400K] f64 dense block
        # (1.6 GB + BLAS temporaries) thrashes small hosts and burns the
        # leg budget.  Per-SNP cost is linear in N, so the measured rate
        # rescales exactly to the headline shape's N.
        Nb = min(N, 50_000)
        Bc = min(B, 512)
        nbb = (Nb + 3) // 4
        t0 = time.perf_counter()
        Gb = decode_bed_bytes(raw_blocks[0][:Bc, :nbb], Nb).astype(np.float64)
        np.copyto(Gb, 0.0, where=Gb == -3)
        covb, resb, maskb = cov[:Nb], res[:Nb], maskf[:Nb]
        beta = Gb @ covb
        Gr = Gb - beta @ covb.T
        sf = np.linalg.norm(Gr, axis=1) / np.sqrt(Nb - K)
        Gr /= sf[:, None]
        num = Gr @ resb
        denum = (Gr**2) @ maskb
        _stats = num / np.sqrt(denum)
        rate = Bc / (time.perf_counter() - t0)
        return rate * (Nb / N)  # rescale to the headline N

    def leg_cpu_baseline(budget):
        cpu_sps = _timed(budget, bench_cpu_baseline)
        if cpu_sps:
            host_cores = os.cpu_count() or 1
            # normalize this host's multithreaded baseline to the
            # 16-vCPU reference class (docs/docs/performance.md:81)
            record("cpu_baseline_host", cpu_sps, "host-cpu", nd=2,
                   n_capped=min(N, 50_000), rescaled_to_N=N)
            record("cpu_baseline_16core_est",
                   cpu_sps * (16.0 / host_cores), "host-cpu", nd=2)

    # --- step2 QT: fused scorer (both kernel variants stamped) ---
    def bench_qt_resident(split, label):
        consts = fsc.build_consts(
            cov, res, maskf, ind, float(N - K), split=split,
            dtype=np.float32 if on_tpu else np.float64,
        )
        nbp = fsc.op_nbp(consts.Wp)
        fused_blocks = [fsc.pad_raw(rb, nbp) for rb in raw_blocks]
        run_qt = fsc.make_qt_block_fn(consts, use_pallas=on_tpu)
        run_many = run_qt.stack  # one dispatch per block stack
        stacked = jnp.asarray(np.stack(fused_blocks))
        _sync(run_many(stacked))
        best = 0.0
        for _ in range(n_rounds):
            t0 = time.perf_counter()
            outs = [run_many(stacked) for _ in range(inner)]
            _sync(outs)
            best = max(best, inner * n_blocks * B / (time.perf_counter() - t0))
        print(f"[bench] qt_resident[{label}]: {best:.0f} SNPs/s "
              f"({inner * n_blocks} blocks x {B} per round, "
              f"{inner} dispatches)", file=sys.stderr)
        return best

    def leg_qt(budget):
        if on_tpu:
            # the i8 leg needs ~240s on the tunneled rig even with a
            # warm compile cache (consts build + ~800MB of packed-block
            # uploads) — give it the lion's share; a retry may overrun
            # the leg's nominal budget, which the global scheduler then
            # deducts from later (lower-priority) legs
            qt_i8 = _timed(budget * 0.7, bench_qt_resident, "i8", "i8")
            if not qt_i8:
                print("[bench] retrying step2_qt_resident[i8] once",
                      file=sys.stderr)
                qt_i8 = _timed(budget * 0.5, bench_qt_resident, "i8", "i8")
            record("step2_qt_resident_i8", qt_i8, dev_backend,
                   variant="i8", sync="device-scalar-fetch", inner=inner)
            if qt_i8:  # emit the headline ASAP, before the bf16 twin
                record("step2_qt_resident", qt_i8, dev_backend,
                       variant="i8", sync="device-scalar-fetch",
                       inner=inner)
                emit()
            qt_bf16 = _timed(budget * 0.4, bench_qt_resident, True, "bf16")
            record("step2_qt_resident_bf16", qt_bf16, dev_backend,
                   variant="bf16", sync="device-scalar-fetch", inner=inner)
            qt_res = max(qt_i8 or 0.0, qt_bf16 or 0.0) or None
            variant = ("i8" if (qt_i8 or 0.0) >= (qt_bf16 or 0.0)
                       else "bf16")
        else:
            qt_res = _timed(budget, bench_qt_resident, False, "f64")
            variant = "full"
        record("step2_qt_resident", qt_res, dev_backend, variant=variant,
               sync="device-scalar-fetch", inner=inner)

    # --- BGEN dosage path: sample-packed probability-plane kernel ---
    def bench_bgen_resident():
        split = fsc.split_mode(on_tpu, sample_layout=True)
        consts = fsc.build_consts(
            cov, res, maskf, ind, float(N - K), split=split,
            pack="sample", dtype=np.float32 if on_tpu else np.float64,
        )
        tailz = np.concatenate(
            [maskf * ind.astype(np.float64)[:, None],
             ind.astype(np.float64)[:, None]], axis=1)
        Wq, _ = fsc.sample_pack(
            tailz, split=split, dtype=np.float32 if on_tpu else np.float64)
        run_bgen = fsc.make_qt_bgen_fn(
            consts, use_pallas=on_tpu, Wq=Wq if on_tpu else None,
            qs=consts.layout_C() - (P + 1))
        Np = fsc.op_nbp(consts.Wp)
        Bg = min(B, 1024)
        # 2 stacked blocks per dispatch: nbg=4 was tried (same
        # amortization as the qt legs) but its 3.2GB one-shot plane
        # upload hangs past the leg's SIGALRM when the tunnel degrades
        # mid-transfer — the reliable 2-block capture (29-30K, ~75% of
        # the 39-40K kernel rate) beats a lost leg
        nbg = 2
        blocks_g = []
        for bi in range(nbg):
            k0 = rng.integers(0, 200, size=(Bg, N)).astype(np.uint8)
            k1 = np.minimum(rng.integers(0, 200, size=(Bg, N)),
                            255 - k0.astype(np.int64)).astype(np.uint8)
            miss = rng.random(size=(Bg, N)) < 0.02
            pl = np.zeros((Bg, 2, Np), np.uint8)
            pl[:, 0, :N] = np.where(miss, 255, k0)
            pl[:, 1, :N] = np.where(miss, 255, k1)
            blocks_g.append(pl)
        run_many = run_bgen.stack  # one dispatch per block stack
        stacked = jnp.asarray(np.stack(blocks_g))
        _sync(run_many(stacked))
        best = 0.0
        for _ in range(n_rounds):
            t0 = time.perf_counter()
            outs = [run_many(stacked) for _ in range(inner)]
            _sync(outs)
            best = max(best, inner * nbg * Bg / (time.perf_counter() - t0))
        return best, ("i8" if split == "i8" else
                      "bf16" if split else "full")

    def leg_bgen(budget):
        bg_out = _timed(budget, bench_bgen_resident)
        bg_res, bg_var = bg_out if bg_out else (None, None)
        record("step2_bgen_resident", bg_res, dev_backend, variant=bg_var,
               sync="device-scalar-fetch", inner=inner)

    # --- step2 BT + approx Firth ---
    def bench_bt_firth():
        from regenie_tpu.models import firth as firth_mod

        # PRODUCTION BT path: the fused packed-bytes scorer with the BT
        # operand layout (run_step2._fused_bt: [Wcat | gsm2 | mask |
        # case | ind]) — not a hand-rolled dense-G stand-in.  Same
        # two-layer RTT amortization as the QT legs (run.stack +
        # `inner` dispatches per sync).
        y = (rng.random(N) < 0.1).astype(np.float64)
        pi = np.clip(y.mean(), 1e-3, 1 - 1e-3) * np.ones(N)
        gs = np.sqrt(pi * (1 - pi))
        Pn = min(P, 10)  # BT trait batch
        Kp1 = K + 1
        ncat = Pn * Kp1
        Wcat = rng.normal(size=(N, ncat))
        xwt = rng.normal(size=(Pn, K))
        gsm2 = (gs**2)[:, None] * np.ones((1, Pn))
        maskc = np.ones((N, Pn))
        case = (y[:, None] * maskc)
        Wext = np.concatenate(
            [Wcat, gsm2, maskc, case, ind.astype(np.float64)[:, None]],
            axis=1)
        icol = ncat + Pn + Pn + Pn
        C_used = icol + 1
        dt_ = np.float32 if on_tpu else np.float64
        Wp, usum = fsc.plane_pack(
            Wext, nb, split=fsc.split_mode(on_tpu), dtype=dt_)
        run_bt = fsc.make_bt_block_fn(
            Wp, usum, xwt.astype(dt_), C_used, icol, float(ind.sum()),
            ncat, Pn, Kp1, use_pallas=on_tpu)
        nbp = fsc.op_nbp(Wp)
        stacked = jnp.asarray(np.stack(
            [fsc.pad_raw(rb, nbp) for rb in raw_blocks]))
        _sync(run_bt.stack(stacked))

        # corrected fraction: 1% of each round's SNPs get a batched
        # approx-Firth refit, all blocks' rows in ONE device call
        round_snps = inner * n_blocks * B
        n_corr = max(8, round_snps // 100)
        from regenie_tpu.io.bed import decode_bed_bytes

        rows = np.concatenate([rb for rb in raw_blocks])[:n_corr]
        Gc = decode_bed_bytes(rows, N).astype(np.float64)
        np.copyto(Gc, 0.0, where=Gc == -3)
        offset = np.zeros(N)
        # device-resident Firth (corrections_device): rows + [N] consts
        # uploaded once; the call's np.asarray return forces completion
        from regenie_tpu.models import corrections_device as cdev

        firth_dev = cdev.enabled()
        if firth_dev:
            Gc_in = jax.device_put(Gc.astype(np.float32))
            y_in = jax.device_put(y.astype(np.float32))
            off_in = jax.device_put(offset.astype(np.float32))
            ind_in = jax.device_put(ind.astype(np.float32))
        else:
            Gc_in, y_in, off_in, ind_in = Gc, y, offset, ind

        def run_firth():
            return firth_mod.firth_snp_batch_auto(
                y_in, Gc_in, off_in, ind_in, maxstep=5, niter=50,
                tol=2.5e-4)

        run_firth()  # warm-up/compile outside the timed region
        best = 0.0
        for _ in range(max(1, n_rounds - 1)):
            t0 = time.perf_counter()
            outs = [run_bt.stack(stacked) for _ in range(inner)]
            run_firth()  # blocks on its own fetch (device sync)
            _sync(outs)
            best = max(best, round_snps / (time.perf_counter() - t0))
        print(f"[bench] bt_firth: {best:.0f} SNPs/s ({inner * n_blocks} "
              f"blocks x {B}, {n_corr} firth rows/round)", file=sys.stderr)
        return best, ("fused+firth-device" if firth_dev
                      else "fused+firth-host")

    def leg_bt_firth(budget):
        bt_out = _timed(budget, bench_bt_firth)
        bt_fs, bt_var = bt_out if bt_out else (None, None)
        record("step2_bt_firth", bt_fs, dev_backend, variant=bt_var,
               corrected_frac="1pct", firth_niter=50)

    # --- step1 level-0 LOOCV ---
    def bench_step1_l0():
        from regenie_tpu.models import step1 as m1
        from regenie_tpu.ops.geno_ops import (decode_bed_packed,
                                              prepare_block_step1)

        J = 5
        lam = jnp.asarray(np.full(J, float(N)) * np.linspace(0.5, 4.0, J))
        B1 = min(B, 1000)
        dt = np.float32 if on_tpu else np.float64
        # big per-sample operands are ARGUMENTS (device handles), not
        # closures: closed-over constants inflate the remote-compile
        # payload (HTTP 413 class) — same rule as the fused QT legs
        Y_j = jax.device_put(res.astype(dt))
        m_j = jax.device_put(maskf.astype(dt))
        cov_j = jax.device_put(cov.astype(dt))
        Neff_j = jnp.asarray(Neff.astype(dt))
        ind_j = jnp.asarray(ind)

        def l0_block(raw, covm, Ym, maskm):
            Gi = decode_bed_packed(raw, N)
            G = prepare_block_step1(Gi, ind_j)
            G, _sc = m1.residualize_geno_block(G, covm, float(N - K))
            return m1.level0_loocv_block(G, Ym, maskm, lam, Neff_j)

        # ONE dispatch per block stack (vmap: decode/resid/solve all
        # batched — the r5 production path; the serialized per-block
        # eigh was 37% of block time) + `inner` dispatches per sync
        # (the same two-layer WAN-RTT amortization as the QT legs)
        _stack = jax.jit(lambda st, covm, Ym, maskm: jax.vmap(
            lambda r: l0_block(r, covm, Ym, maskm))(st))
        # 2 stacked blocks: each W output is [N,J,P] (~400MB at UKB
        # shape); inner in-flight dispatches hold inner*nb1 of them
        nb1 = min(n_blocks, 2)
        stacked = jnp.asarray(np.stack([rb[:B1] for rb in raw_blocks[:nb1]]))

        def run():
            return _stack(stacked, cov_j, Y_j, m_j)

        # deeper in-flight pipeline than the QT legs: at 7.0K SNPs/s
        # the round was ~25% sync/execute RTT share (5 RTTs per 1.1 s).
        # In-flight W memory is inner_s1 * nb1 * [N,J,P] f32; 8
        # dispatches OOMed this chip (RESOURCE_EXHAUSTED at ~6.4GB of
        # live W), 6 fits
        inner_s1 = max(inner, 6) if on_tpu else inner
        _sync(run())
        best = 0.0
        for _ in range(max(1, n_rounds - 1)):
            t0 = time.perf_counter()
            outs = [run() for _ in range(inner_s1)]
            _sync(outs)
            best = max(best, inner_s1 * nb1 * B1 / (time.perf_counter() - t0))
        return best

    def leg_step1(budget):
        s1 = _timed(budget, bench_step1_l0)
        record("step1_level0", s1, dev_backend,
               sync="device-scalar-fetch",
               inner=(max(inner, 6) if on_tpu else inner),
               stacked_blocks=min(n_blocks, 2))

    # --- host-side pipeline legs ---
    def _ingest_file():
        import tempfile

        d = tempfile.mkdtemp(prefix="bench_ing_",
                             dir="/dev/shm" if os.path.isdir("/dev/shm")
                             else None)
        path = os.path.join(d, "packed.bin")
        with open(path, "wb") as fh:
            for rb in raw_blocks:
                fh.write(rb.tobytes())
        return d, path

    def _ingest_cleanup(d):
        for f in os.listdir(d):
            os.unlink(os.path.join(d, f))
        os.rmdir(d)

    def bench_host_ingest():
        """Copy-class ingest (non-mmap fallback / PGEN repack): THREADED
        single-copy readinto reusable flat buffers.  Byte-tile padding
        moved on-device in r4, so the host pays exactly one pass."""
        from concurrent.futures import ThreadPoolExecutor

        d, path = _ingest_file()
        blk_bytes = B * nb
        bufs = [bytearray(blk_bytes) for _ in range(n_blocks)]

        def read_one(bi):
            with open(path, "rb") as fh:
                fh.seek(bi * blk_bytes)
                fh.readinto(bufs[bi])
                return np.frombuffer(bufs[bi], np.uint8).reshape(B, nb)

        best = 0.0
        with ThreadPoolExecutor(max_workers=min(4, os.cpu_count() or 1)) as ex:
            for _ in range(n_rounds):
                t0 = time.perf_counter()
                list(ex.map(read_one, range(n_blocks)))
                best = max(best,
                           n_blocks * B / (time.perf_counter() - t0))
        _ingest_cleanup(d)
        return best

    def bench_host_ingest_mmap():
        """Production BED fused path: mmap view -> device transfer, zero
        host copies.  Measured as view + one full page-cache traversal
        (np sum forces the reads the DMA engine would do)."""
        import mmap as _mmap

        d, path = _ingest_file()
        blk_bytes = B * nb
        best = 0.0
        with open(path, "rb") as fh:
            mm = _mmap.mmap(fh.fileno(), 0, access=_mmap.ACCESS_READ)
            acc = 0
            for _ in range(n_rounds):
                t0 = time.perf_counter()
                for bi in range(n_blocks):
                    v = np.frombuffer(mm, np.uint8, count=blk_bytes,
                                      offset=bi * blk_bytes).reshape(B, nb)
                    acc += int(v[:, ::4096].sum())  # touch every page
                best = max(best,
                           n_blocks * B / (time.perf_counter() - t0))
            del v
            try:
                mm.close()
            except BufferError:
                pass
        _ingest_cleanup(d)
        return best

    def bench_host_decode_dense():
        from regenie_tpu.io.bed import decode_bed_bytes

        best = 0.0
        for _ in range(n_rounds):
            t0 = time.perf_counter()
            for rb in raw_blocks:
                _ = decode_bed_bytes(rb, N)
            best = max(best, n_blocks * B / (time.perf_counter() - t0))
        return best

    def bench_host_render():
        import types

        from regenie_tpu.io import output as out_mod

        params = types.SimpleNamespace(af_cc=False, dosage_mode=False)
        snps = [types.SimpleNamespace(chrom="1", physpos=i + 1,
                                      ID=f"snp{i}", allele1="A",
                                      allele2="C")
                for i in range(B)]
        skip = np.zeros(B, np.uint8)
        fail = np.zeros(B, np.uint8)
        af = rng.random(B)
        nvec = np.full(B, N, np.int32)
        beta, se = rng.normal(size=(B,)), rng.random(B) + 0.1
        chisq = rng.random(B) * 30
        logp = rng.random(B) * 8
        # production: one block_prefixes per block + P per-trait calls
        pb, po = out_mod.block_prefixes(snps)
        txt = out_mod.format_block_single(
            params, pb, po, "ADD", skip, af, None, nvec, beta, se,
            chisq, logp, fail)
        if txt is None:
            return None  # native lib unavailable
        best = 0.0
        for _ in range(n_rounds):
            t0 = time.perf_counter()
            pb, po = out_mod.block_prefixes(snps)
            for _p in range(P):
                out_mod.format_block_single(
                    params, pb, po, "ADD", skip, af, None, nvec, beta,
                    se, chisq, logp, fail)
            best = max(best, B * P / (time.perf_counter() - t0))
        return best

    def leg_host(budget):
        record("host_ingest_snps_per_s",
               _timed(budget, bench_host_ingest), "host-cpu",
               variant="threaded-readinto-1copy")
        record("host_ingest_mmap_snps_per_s",
               _timed(budget, bench_host_ingest_mmap), "host-cpu",
               variant="mmap-view-0copy")
        record("host_decode_dense_snps_per_s",
               _timed(budget, bench_host_decode_dense), "host-cpu")
        hr = _timed(budget, bench_host_render)
        record("host_render_rows_per_s", hr, "host-cpu")
        if hr:
            # split mode writes P rows per SNP
            record("host_render_snps_per_s", hr / P, "host-cpu")

    # --- pipeline efficiency: e2e vs resident on the cpu backend ---
    def bench_pipeline_efficiency(budget):
        env = _accum_env(dict(os.environ))
        env["REGENIE_TPU_PLATFORM"] = "cpu"
        env["JAX_PLATFORMS"] = "cpu"
        env["BENCH_PIPE_CHILD"] = "1"
        env["BENCH_PIPE_TIMEOUT"] = str(max(60, int(budget / 2.2)))
        try:
            r = subprocess.run([sys.executable, __file__],
                               capture_output=True, text=True, env=env,
                               timeout=budget)
        except subprocess.TimeoutExpired:
            print("[bench] pipeline child timed out", file=sys.stderr)
            return None
        doc = None
        for line in r.stdout.splitlines():
            try:
                doc = json.loads(line)
            except ValueError:
                continue
        if not doc or not doc.get("e2e") or not doc.get("resident"):
            print("[bench] pipeline child failed:",
                  (r.stdout + r.stderr)[-500:], file=sys.stderr)
            return None
        return doc

    def leg_pipeline(budget):
        doc = bench_pipeline_efficiency(budget)
        if doc:
            # backend "host-cpu": this leg is DEFINED on the cpu backend
            # (same-backend ratio), so a TPU rejoin must not re-run it
            pb = doc.get("resident_perblock") or doc["resident"]
            record("pipeline_efficiency_cpu",
                   doc["e2e"] / doc["resident"], "host-cpu", nd=3,
                   resident_cpu_snps_per_s=doc["resident"],
                   resident_perblock_snps_per_s=pb,
                   e2e_cpu_snps_per_s=doc["e2e"],
                   overlap_efficiency=round(doc["e2e"] / pb, 3),
                   note=("same-backend ratio; H2D local, tunnel-free. "
                         "overlap_efficiency = e2e / per-block-dispatch "
                         "resident (the CLI's compute pattern, zero "
                         "host glue) isolates pipeline overlap from "
                         "the batched-vs-per-block dispatch cost; the "
                         "headline ratio divides by the fully-stacked "
                         "resident.  On the cpu backend device compute "
                         "and host glue SHARE the cores, capping both "
                         "below 1.0"))

    # --- gene-based: sets/s (real CLI) ---
    def bench_genebased(budget):
        import tempfile

        sys.path.insert(0, os.path.join(os.path.dirname(
            os.path.abspath(__file__)), "scripts"))
        from bench_scaling import args_for, build_exome

        d = tempfile.mkdtemp(prefix="bench_gb_")
        n_sets = int(os.environ.get("BENCH_GB_SETS", 60))
        build_exome(d, n_sets, 40, min(N, 20_000), np.random.default_rng(4))
        env = dict(os.environ)
        # two runs: the first populates the persistent XLA compile cache
        # (a production exome has ~20K genes, so per-shape compiles are a
        # one-off, not a per-set cost; this 60-set fixture would otherwise
        # measure ~70% compile time); the SECOND run is the steady-state
        # number.  Cold-start is recorded alongside for honesty.
        cold = None
        loop = None
        for ri in range(2):
            t0 = time.perf_counter()
            # the cold run (per-shape compiles + tunnel uploads) gets
            # the bigger share; a warm run is much faster
            run_to = max(60, budget * (0.62 if ri == 0 else 0.38))
            r = subprocess.run(
                [sys.executable, "-m", "regenie_tpu"]
                + args_for(d, f"{d}/o{ri}"),
                capture_output=True, text=True, env=env,
                timeout=run_to)
            if r.returncode != 0:
                print("[bench] gene-based CLI failed:",
                      (r.stdout + r.stderr)[-500:], file=sys.stderr)
                return None
            # the set-loop elapsed (burden + SKATO/ACATV per gene)
            loop = None
            for line in r.stdout.splitlines():
                if "* done (" in line:
                    loop = float(line.split("(")[1].split("s")[0])
            loop = loop or (time.perf_counter() - t0)
            if ri == 0:
                cold = loop
        print(f"[bench] genebased: cold {n_sets / cold:.2f} -> warm "
              f"{n_sets / loop:.2f} sets/s", file=sys.stderr)
        return n_sets / loop, n_sets / cold

    def leg_genebased(budget):
        gb_out = bench_genebased(budget)
        gb, gb_cold = gb_out if gb_out else (None, None)
        record("genebased_sets_per_s", gb, dev_backend, nd=2,
               timed="steady-state (2nd run, compile cache warm)",
               cold_start_sets_per_s=round(gb_cold, 2) if gb_cold else None)

    # --- e2e: a REAL CLI step-2 run on a synthetic on-disk BED ---
    def bench_qt_e2e(budget):
        import tempfile

        # over the remote-TPU WAN tunnel the e2e leg is transfer-bound;
        # keep the file small enough to finish inside the budget
        Ne = min(N, 20_000 if on_tpu else 50_000)
        Me = int(os.environ.get("BENCH_E2E_M", 8192))
        Pe = min(P, 10)
        d = tempfile.mkdtemp(prefix="bench_e2e_")
        nbe = (Ne + 3) // 4
        with open(f"{d}/g.bed", "wb") as fh:
            fh.write(b"\x6c\x1b\x01")
            fh.write(rng.integers(0, 256, size=(Me, nbe), dtype=np.uint8)
                     .tobytes())
        with open(f"{d}/g.bim", "w") as fh:
            for i in range(Me):
                fh.write(f"1\tsnp{i}\t0\t{i + 1}\tA\tC\n")
        ids = [f"F{i} I{i}" for i in range(Ne)]
        with open(f"{d}/g.fam", "w") as fh:
            for s in ids:
                fh.write(f"{s} 0 0 1 -9\n")
        ph_mat = rng.normal(size=(Ne, Pe))
        with open(f"{d}/ph.txt", "w") as fh:
            fh.write("FID IID "
                     + " ".join(f"Y{j+1}" for j in range(Pe)) + "\n")
            for i, s in enumerate(ids):
                fh.write(s + " "
                         + " ".join("%.4f" % v for v in ph_mat[i]) + "\n")
        env = dict(os.environ)
        env["REGENIE_TPU_FUSED"] = "1"
        t0 = time.perf_counter()
        try:
            r = subprocess.run(
                [sys.executable, "-m", "regenie_tpu", "--step", "2",
                 "--bed", f"{d}/g", "--phenoFile", f"{d}/ph.txt",
                 "--ignore-pred", "--bsize", "2048", "--out", f"{d}/o"],
                capture_output=True, text=True, env=env, timeout=budget,
            )
        except subprocess.TimeoutExpired:
            print("[bench] e2e CLI timed out", file=sys.stderr)
            return None
        dt = time.perf_counter() - t0
        if r.returncode != 0:
            print("[bench] e2e CLI failed:", (r.stdout + r.stderr)[-800:],
                  file=sys.stderr)
            return None
        return Me / dt

    def leg_e2e(budget):
        record("step2_qt_e2e_cli", bench_qt_e2e(budget), dev_backend)

    # =================== leg scheduler ===================
    # Ordered by value: baseline first (vs_baseline available from the
    # first emit), then the headline + device legs, then the fast host
    # legs, then the slow subprocess legs.  Per-leg budgets divide the
    # REMAINING global budget so a sick tunnel degrades coverage
    # gracefully instead of losing everything.
    all_legs = [
        ("cpu_baseline", leg_cpu_baseline, ("cpu_baseline_host",)),
        ("qt", leg_qt, ("step2_qt_resident",)),
        ("bgen", leg_bgen, ("step2_bgen_resident",)),
        ("bt_firth", leg_bt_firth, ("step2_bt_firth",)),
        ("step1", leg_step1, ("step1_level0",)),
        ("host", leg_host, ("host_ingest_snps_per_s",
                            "host_decode_dense_snps_per_s")),
        ("pipeline", leg_pipeline, ("pipeline_efficiency_cpu",)),
        ("genebased", leg_genebased, ("genebased_sets_per_s",)),
        ("e2e", leg_e2e, ("step2_qt_e2e_cli",)),
    ]
    skip_set = {s for s in os.environ.get("BENCH_SKIP", "").split(",") if s}
    fault = os.environ.get("BENCH_FAULT")

    def _done_already(names):
        """Skip a leg if its results were carried in via BENCH_ACCUM and
        were captured on a backend at least as good as this run's (host
        legs are backend-independent; a cpu-captured device leg re-runs
        when we rejoin the chip)."""
        for n in names:
            if n not in STATE["extra"]:
                return False
            b = STATE["backends"].get(n)
            if b not in ("host-cpu",) and b != dev_backend and on_tpu:
                return False
        return True

    todo = [(nm, fn, names) for nm, fn, names in all_legs
            if nm not in skip_set and not _done_already(names)]
    for i, (nm, fn, _names) in enumerate(todo):
        rem = _remaining()
        legs_left = len(todo) - i
        budget = max(30, min(leg_cap, int(rem / max(1, legs_left))))
        if nm == "qt":
            # the headline leg gets up to the full cap (its i8 pass
            # alone needs ~240s through the tunnel); later legs absorb
            # the difference via the remaining-budget recomputation
            budget = max(30, min(leg_cap, int(rem * 0.35)))
        if rem <= 10:
            print(f"[bench] global budget exhausted before leg {nm}",
                  file=sys.stderr)
            break
        print(f"[bench] leg {nm}: budget {budget}s "
              f"(remaining {rem:.0f}s, {legs_left} legs left)",
              file=sys.stderr)
        if fault == nm:
            # fault injection (tests/test_bench_survival.py): a mock
            # leg that hangs until its SIGALRM budget expires
            _timed(min(budget, int(os.environ.get("BENCH_FAULT_S", 3))),
                   time.sleep, 10_000)
        else:
            try:
                fn(budget)
            except Exception as e:  # noqa: BLE001 — bench must survive
                print(f"[bench] leg {nm} failed: {type(e).__name__} {e}",
                      file=sys.stderr)
        emit()  # cumulative line after EVERY leg

    if not on_tpu:
        # last chance: the fast CPU pass is done — if the tunnel woke up
        # meanwhile, re-run the device legs on the chip (this execs away;
        # completed results ride BENCH_ACCUM)
        _maybe_rejoin_tpu()
    emit(final=True)


if __name__ == "__main__":
    if os.environ.get("BENCH_PIPE_CHILD"):
        _pipe_child()
        sys.exit(0)
    # watchdog: a dead remote-TPU tunnel hangs inside backend init with
    # no exception to catch — fail loudly instead of hanging the caller.
    # The deadline is measured from the FIRST exec (BENCH_T0) so the
    # probe/fallback/rejoin dance shares one budget.  The watchdog EMITS
    # the accumulated results before exec/exit (round-5 survivability).
    import threading

    _t0()

    def _abort():
        sys.stderr.write("bench: watchdog expired (TPU backend unresponsive?)\n")
        sys.stderr.flush()
        try:
            emit(final=True)
            sys.stdout.flush()
        except Exception:  # noqa: BLE001 — last-gasp emit must not block exit
            pass
        if os.environ.get("REGENIE_TPU_PLATFORM") != "cpu" \
                and not STATE["extra"]:
            sys.stderr.write("bench: retrying on the cpu backend\n")
            sys.stderr.flush()
            _exec_cpu_fallback(no_rejoin=True)
        # results were captured and emitted — a clean exit lets the
        # driver parse them even though the run was cut short
        os._exit(0 if _headline()[1] else 3)

    wd_s = max(120.0, _total_budget() - _elapsed())
    wd = threading.Timer(wd_s, _abort)
    wd.daemon = True
    wd.start()
    main()
    sys.stdout.flush()  # os._exit skips interpreter cleanup/flush
    sys.stderr.flush()
    os._exit(0)  # don't wait on stray non-daemon threads
