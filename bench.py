"""Benchmark: canonical 31-mer spectrum-build throughput per chip.

Measures the full device counting path — canonical window extraction,
log-space quality weighting, and the sort/scan spectrum count
(parallel/device_spectrum.py) — on synthetic reads sampled from a synthetic
genome at ~20x coverage.  The timed loop is ONE dispatch (lax.fori_loop,
each step counting a distinct dynamic slice of a rolled batch), so the
clock sees the chip, not the relay's per-dispatch latency; the single
readback of the accumulated count forces completion before it stops.

Baseline: a multithreaded C++ open-addressing counter
(native/baseline_count.cpp) standing in for the reference's single-node hot
path, run on the same host over the same workload shape.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "kmers/s", "vs_baseline": N,
   "chip_golden_ok": bool, "e2e_metric": ..., "e2e_value": N,
   "e2e_vs_baseline": N}
The e2e_* fields track BASELINE.json's second metric (reads filtered/sec
at 1 host): a timed streaming FilterReads run over a generated FASTQ
(default 256 MB; KMTPU_E2E_MB overrides, e.g. 1024 for the 1 GiB point)
vs the C++ baseline_filter stand-in (see e2e_reads_per_sec below).

HARD WALL: the whole bench is budgeted to KMTPU_BENCH_BUDGET_S seconds
(default 420).  Every stage gets a timeout derived from the remaining
budget, partial results are kept in REC as stages complete, and SIGTERM /
SIGALRM flush the record before exit — the driver always captures a JSON
line even if a stage hangs (round 2 lost its record to an unbounded run).
"""
import json
import os
import signal
import subprocess
import sys
import time

import numpy as np

K = 31
L = 100
GENOME = 2_000_000
COVERAGE = 20
# reads per device batch.  Two effects picked this (single-dispatch
# fori_loop sweep on the real chip, 2026-08-19): (1) XLA's sort is
# O(N log^2 N), so smaller batches count faster per window; (2) the sort
# pads the window axis to the next power of two, so B*(L-K+1) should sit
# JUST under one — B=468 -> 32760 windows vs 2^15 (99.9% lane
# utilization) measured 780-793 Mk/s vs 640 at B=2048 (55% util) and
# 483 at the old B=8192.  The streaming pipeline keeps its larger batch
# default: through the dev tunnel per-batch RTT dominates, the opposite
# regime (directly-attached DMA) is what this measures.
B = 468
STEPS = 5600      # ~same total windows as the round-1 10x131072 regime

BUDGET_S = float(os.environ.get("KMTPU_BENCH_BUDGET_S", "420"))
_T0 = time.time()
_DEADLINE = _T0 + BUDGET_S

REC = {
    "metric": "canonical 31-mers counted/sec/chip",
    "value": None,
    "unit": "kmers/s",
    "vs_baseline": None,
    "chip_golden_ok": None,
}

_FLUSHED = False
_CHILD = None  # current Popen, killed by the watchdog


def _remaining() -> float:
    return _DEADLINE - time.time()


def _checkpoint():
    """Print the record-so-far after each completed stage.  The driver
    parses the LAST JSON line of the output tail, so if it hard-kills
    the bench (rc 124 with an empty tail lost round 2's entire story)
    the newest checkpoint still lands; _flush_and_exit prints the final
    line."""
    rec = dict(REC)
    rec["elapsed_s"] = round(time.time() - _T0, 1)
    rec["partial"] = True
    print(json.dumps(rec), flush=True)


def _flush_and_exit(signum=None, frame=None):
    global _FLUSHED
    if not _FLUSHED:
        _FLUSHED = True
        REC["elapsed_s"] = round(time.time() - _T0, 1)
        print(json.dumps(REC), flush=True)
    if _CHILD is not None and _CHILD.poll() is None:
        try:
            _CHILD.kill()
        except OSError:
            pass
    if signum is not None:
        os._exit(0)


def _run(cmd, timeout, **kw):
    """subprocess.run with the child tracked so the watchdog can kill it."""
    global _CHILD
    timeout = max(1.0, min(timeout, _remaining() - 5))
    with subprocess.Popen(cmd, stdout=subprocess.PIPE,
                          stderr=subprocess.PIPE, **kw) as p:
        _CHILD = p
        try:
            out, err = p.communicate(timeout=timeout)
        except subprocess.TimeoutExpired:
            p.kill()
            p.communicate()
            raise
        finally:
            _CHILD = None
    if p.returncode != 0:
        raise subprocess.CalledProcessError(p.returncode, cmd, out, err)
    return out.decode(errors="replace")


def _build_native(name: str) -> str:
    here = os.path.dirname(os.path.abspath(__file__))
    src = os.path.join(here, "native", name + ".cpp")
    exe = os.path.join(here, "native", name)
    if not os.path.exists(exe) or os.path.getmtime(exe) < os.path.getmtime(src):
        subprocess.run(["g++", "-O3", "-march=native", "-o", exe, src,
                        "-lpthread"], check=True)
    return exe


def baseline_kmers_per_sec() -> float:
    exe = _build_native("baseline_count")
    n_reads = GENOME * COVERAGE // L
    best = 0.0
    runs = 3 if _remaining() > 120 else 1
    for _ in range(runs):  # take the baseline's best run (conservative ratio)
        out = _run([exe, str(n_reads), str(L), str(K), "4", str(GENOME)],
                   timeout=60)
        for line in out.splitlines():
            if line.startswith("kmers_per_sec="):
                best = max(best, float(line.split("=")[1]))
    if not best:
        raise RuntimeError("baseline produced no rate: %r" % out)
    return best


def _bench_batch():
    rng = np.random.default_rng(7)
    genome = rng.integers(0, 4, GENOME, dtype=np.uint8)
    starts = rng.integers(0, GENOME - L, B)
    codes = genome[starts[:, None] + np.arange(L)[None, :]]
    logp = np.full((B, L), np.float32(-0.00144), dtype=np.float32)
    lengths = np.full(B, L, dtype=np.int32)
    return codes, logp, lengths


def _host_oracle(codes: np.ndarray):
    """Unique canonical k-mer (u64 key, count) table via the host path
    (ops/kmer.extract_kmers_flat), the same oracle the unit tests trust."""
    from kmernator_tpu.ops.kmer import extract_kmers_flat
    from kmernator_tpu.parallel.spectrum import pack_u64
    flat = codes.reshape(-1).astype(np.uint8)
    offsets = (np.arange(B + 1, dtype=np.int64) * L)
    canon, _, _, _ = extract_kmers_flat(flat, offsets, K)
    keys = pack_u64(canon)
    uk, uc = np.unique(keys, return_counts=True)
    return uk, uc.astype(np.int64)


# Seeds for the two independent 32-bit table digests (see _digest_np).
_DIGEST_SEEDS = (0x9e3779b9, 0x85ebca6b)


def _mix32_np(x):
    """splitmix-style 32-bit finalizer (numpy u32, overflow wraps)."""
    x = x.astype(np.uint32, copy=True)
    with np.errstate(over="ignore"):
        x ^= x >> np.uint32(16)
        x *= np.uint32(0x7FEB352D)
        x ^= x >> np.uint32(15)
        x *= np.uint32(0x846CA68B)
        x ^= x >> np.uint32(16)
    return x


def _digest_np(hi, lo, counts, seed):
    """Order-sensitive table digest: mix(hi, lo, count, rank) summed mod
    2^32.  rank is the row's position in ascending-key order, so ANY
    difference in keys, counts, multiplicity, or order moves the digest.
    Two seeds give an effective 64-bit comparison — the chip-golden check
    reads back ONE scalar per digest instead of the whole table (a 262 KB
    device->host pull measured 43-206 s through the relay, which starved
    the RATE phase out of every capped attempt)."""
    rank = np.arange(len(hi), dtype=np.uint32)
    h = _mix32_np(rank ^ np.uint32(seed))
    h = _mix32_np(h ^ counts.astype(np.uint32))
    h = _mix32_np(h ^ lo.astype(np.uint32))
    h = _mix32_np(h ^ hi.astype(np.uint32))
    with np.errstate(over="ignore"):
        return int(h.sum(dtype=np.uint32))


def tpu_child(platform=None, steps=STEPS):
    """Runs inside the guarded subprocess: golden check + timed rate.
    Prints GOLDEN=ok|mismatch and RATE=<kmers/s>.

    The timed loop is ONE dispatch (lax.fori_loop over the step count,
    each step counting a different dynamic slice of a rolled batch so
    nothing hoists out of the loop): per-dispatch relay latency was
    ~7 ms, which made a 160-dispatch loop measure the tunnel, not the
    chip (80 Mk/s dispatch-bound vs the compute-bound rate).

    platform="cpu" is the host fallback used only when the TPU relay is
    unreachable — same code, same shapes, clearly labeled in the record.
    """
    from kmernator_tpu.utils.jaxconfig import enable_compilation_cache
    enable_compilation_cache()
    import jax
    if platform:
        jax.config.update("jax_platforms", platform)
    import jax.numpy as jnp
    from jax import lax
    from kmernator_tpu.parallel.device_spectrum import (count_batch,
                                                       extract_canonical_cols,
                                                       window_good)

    def build_count(codes, logp, lengths):
        cols, is_fwd, valid = extract_canonical_cols(codes, lengths, K)
        wsum, good = window_good(logp, lengths, K, -3.3219281)
        g = (good & valid).reshape(-1)
        keys, counts, n_unique = count_batch(
            [c.reshape(-1) for c in cols], g, 1)
        return keys, counts, n_unique

    @jax.jit
    def build_full(codes, logp, lengths):
        return build_count(codes, logp, lengths)

    @jax.jit
    def run_steps(big_codes, logp, lengths):
        def body(i, acc):
            c = lax.dynamic_slice_in_dim(big_codes, i, B, 0)
            return acc + build_count(c, logp, lengths)[2]
        return lax.fori_loop(0, steps, body, jnp.int32(0))

    codes_h, logp_h, lengths_h = _bench_batch()
    codes = jnp.asarray(codes_h)
    logp = jnp.asarray(logp_h)
    lengths = jnp.asarray(lengths_h)
    # steps extra rows so step i counts rows [i, i+B) — real, distinct
    # work every iteration, immune to loop-invariant hoisting
    reps = -(-(B + steps) // B)  # tile: steps can exceed B
    big_codes = jnp.concatenate([codes] * reps, axis=0)[:B + steps]

    # ---- chip golden: device table == host-oracle table, byte for byte ----
    dk, dc, dn = build_full(codes, logp, lengths)
    dk = np.asarray(dk)            # [N, 2] u32, SENTINEL rows where count==0
    dc = np.asarray(dc)
    keep = dc > 0
    dev_keys = (dk[keep, 0].astype(np.uint64) << np.uint64(32)) \
        | dk[keep, 1].astype(np.uint64)
    order = np.argsort(dev_keys, kind="stable")
    dev_keys, dev_counts = dev_keys[order], dc[keep][order].astype(np.int64)
    want_keys, want_counts = _host_oracle(codes_h)
    ok = (len(dev_keys) == len(want_keys)
          and np.array_equal(dev_keys, want_keys)
          and np.array_equal(dev_counts, want_counts))
    print("GOLDEN=%s" % ("ok" if ok else "mismatch"), flush=True)

    # ---- timed rate: warm once (compile), then one timed dispatch ----
    n_windows = B * (L - K + 1)
    total = int(run_steps(big_codes, logp, lengths))  # compile + warm
    assert 0 < total <= steps * n_windows, total
    t0 = time.perf_counter()
    total2 = int(run_steps(big_codes, logp, lengths))
    dt = time.perf_counter() - t0
    assert total2 == total, (total2, total)
    print("RATE=%.1f" % (n_windows * steps / dt), flush=True)


# ---- secondary metric: end-to-end FilterReads throughput (1 host) ----
#
# BASELINE.json's second metric ("reads filtered/sec at 1/N hosts").
# Input: a generated Illumina-like FASTQ (default 1024 MB — BASELINE.md's
# reference-scale point; KMTPU_E2E_MB overrides, e.g. 256 for a quick
# run).  Ours: the streaming host engine (bounded memory, fork worker
# pool) at MEDIAN/min-depth-2 — the 1000.fastq golden config.  Baseline:
# native/baseline_filter.cpp, a multithreaded C++ parse -> count ->
# median-score -> write pipeline that deliberately does LESS work per
# read (no artifact filter, no pairing) — a generous stand-in, since the
# reference itself does not build here (Boost/MPI absent).  The ratio is
# size-dependent in the baseline's favor at small inputs (its in-memory
# hash is cheap until it outgrows cache); the 1 GiB point is the one
# BASELINE.md records.

E2E_MB = int(os.environ.get("KMTPU_E2E_MB", "1024"))
E2E_L = 100


def e2e_input_path(mb: int = 0) -> str:
    mb = mb or E2E_MB
    path = "/tmp/kmtpu-bench-e2e-%dmb.fastq" % mb
    if os.path.exists(path) and os.path.getsize(path) > mb * 990000:
        return path
    rng = np.random.default_rng(11)
    genome = rng.integers(0, 4, 5_000_000, dtype=np.uint8)
    acgt = np.frombuffer(b"ACGT", dtype=np.uint8)
    n_reads = int(mb * 1e6 / 215)
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        done = 0
        while done < n_reads:
            b = min(100000, n_reads - done)
            starts = rng.integers(0, len(genome) - E2E_L, b)
            codes = genome[starts[:, None] + np.arange(E2E_L)[None, :]].copy()
            err = rng.random((b, E2E_L)) < 0.003
            codes[err] = (codes[err] + rng.integers(1, 4, err.sum())) % 4
            q = np.clip(rng.normal(37, 3, (b, E2E_L)), 2, 40).astype(np.uint8)
            low = rng.random((b, E2E_L)) < 0.01
            q[low] = rng.integers(2, 15, low.sum())
            q += 33
            f.write(b"".join(
                b"@r%d\n%s\n+\n%s\n" % (done + i, s, qq) for i, (s, qq) in
                enumerate(zip(acgt[codes], q))))
            done += b
    os.replace(tmp, path)
    return path


_E2E_NREADS = {}


def _e2e_n_reads(path: str) -> int:
    """Exact record count of the (possibly cached-from-a-prior-round)
    input file — the 215 B/read estimate undercounted a cached file by
    ~4%, silently shaving our reads/s while the baseline binary counts
    its own records."""
    n = _E2E_NREADS.get(path)
    if n is None:
        lines = 0
        with open(path, "rb", buffering=1 << 22) as f:
            while True:
                blk = f.read(1 << 24)
                if not blk:
                    break
                lines += blk.count(b"\n")
        n = _E2E_NREADS[path] = lines // 4
    return n


def _e2e_one_run(mb: int) -> float:
    """One timed streaming-FilterReads run -> reads/sec."""
    here = os.path.dirname(os.path.abspath(__file__))
    path = e2e_input_path(mb)
    n_reads = _e2e_n_reads(path)
    out = "/tmp/kmtpu-bench-e2e-out"
    env = dict(os.environ, PYTHONPATH=here)
    t0 = time.perf_counter()
    _run([sys.executable, "-m", "kmernator_tpu.apps.filter_reads",
          "--jax-platform", "cpu", "--streaming",
          "--kmer-scoring-type", "MEDIAN", "--mask-simple-repeats", "0",
          "--artifact-edit-distance", "1", "--min-read-length", "25",
          "--out", out, "31", path],
         env=env, timeout=1200)
    dt = time.perf_counter() - t0
    for f in os.listdir("/tmp"):
        if f.startswith("kmtpu-bench-e2e-out"):
            os.unlink("/tmp/" + f)
    return n_reads / dt


def _e2e_baseline_one_run(mb: int) -> float:
    exe = _build_native("baseline_filter")
    out = _run([exe, e2e_input_path(mb), "31", "4", "2",
                "/tmp/kmtpu-bench-bf-out"], timeout=600)
    for line in out.splitlines():
        if line.startswith("reads_per_sec="):
            os.unlink("/tmp/kmtpu-bench-bf-out")
            return float(line.split("=")[1])
    raise RuntimeError("baseline_filter produced no rate")


def e2e_pair(mb: int = 0, reserve_s: float = 60.0, max_pairs: int = 3):
    """(ours reads/s, baseline reads/s) measured INTERLEAVED —
    ours, base, ours, base, ... — taking each side's best over up to
    `max_pairs` pairs.  The VM's throughput is bimodal (measured 13 s vs
    150 s for the identical run under neighbor load), so back-to-back
    pairs keep a slow phase from landing on only one side of the ratio,
    and both sides always get the SAME number of runs.  Stops early when
    a pair improves neither side by >5% (both phases already sampled) or
    the budget runs short."""
    mb = mb or E2E_MB
    ours = _e2e_one_run(mb)
    base = _e2e_baseline_one_run(mb)
    est_pair = 10 + mb * 0.08  # fast-phase pair ~45 s at 1 GiB
    for _ in range(max_pairs - 1):
        if _remaining() < est_pair + reserve_s:
            break
        o2 = _e2e_one_run(mb)
        b2 = _e2e_baseline_one_run(mb)
        grew = o2 > ours * 1.05 or b2 > base * 1.05
        ours = max(ours, o2)
        base = max(base, b2)
        if not grew:
            break
    return ours, base


def e2e_reads_per_sec(mb: int = 0):
    return e2e_pair(mb)[0]


def _bench_env():
    here = os.path.dirname(os.path.abspath(__file__))
    env = dict(os.environ)
    env["PYTHONPATH"] = here + os.pathsep + env.get("PYTHONPATH", "")
    return env


def relay_probe(timeout: float = 30.0) -> bool:
    """Cheap TPU-relay liveness check (a jax.devices() in a subprocess) so
    a down relay costs ~2 s, not a full attempt cap.  Every probe is
    recorded in the bench record with its offset into the budget — if the
    relay is down for the whole window, the record shows how many probes
    were made and when (VERDICT r3 #1)."""
    timeout = min(timeout, max(_remaining() - 10, 1.0))
    t = round(time.time() - _T0, 1)
    try:
        _run([sys.executable, "-c",
              "import jax; d = jax.devices()[0]; "
              "assert d.platform in ('tpu', 'axon'), d.platform"],
             env=_bench_env(), timeout=timeout)
        ok = True
    except Exception:
        ok = False
    REC.setdefault("tpu_probes", []).append({"t": t, "ok": ok})
    return ok


def tpu_attempt(cap: float) -> bool:
    """One guarded tpu_child run.  The shared dev relay occasionally
    stalls mid-run (or runs 3-5x slow while still answering probes), and
    a hung in-process jax call cannot be interrupted; a stalled attempt
    must not eat the whole bench.  On timeout, whatever the child already
    printed (GOLDEN lands before the timed loop) is salvaged.  While no
    value has landed, every attempt leaves the labeled host fallback its
    ~150 s window — a slow-but-alive relay must never burn the budget
    down to a value=null record."""
    cap = min(cap, _remaining() - 60)
    if REC.get("value") is None:
        cap = min(cap, _remaining() - 195)
    if cap < 45:
        return False
    timeout = max(1.0, min(cap, _remaining() - 5))
    out = ""
    global _CHILD
    with subprocess.Popen([sys.executable, "-c",
                           "import bench; bench.tpu_child()"],
                          env=_bench_env(), stdout=subprocess.PIPE,
                          stderr=subprocess.DEVNULL) as p:
        _CHILD = p
        try:
            out = p.communicate(timeout=timeout)[0].decode(
                "utf-8", "replace")
        except subprocess.TimeoutExpired:
            p.kill()
            try:
                out = p.communicate(timeout=5)[0].decode("utf-8", "replace")
            except Exception:
                out = ""
        except Exception:
            pass
        finally:
            _CHILD = None
    for line in out.splitlines():
        if line.startswith("GOLDEN="):
            REC["chip_golden_ok"] = line.strip() == "GOLDEN=ok"
        elif line.startswith("RATE="):
            REC["value"] = round(float(line.split("=")[1]))
            REC["platform"] = "tpu"
    return REC["value"] is not None


def tpu_stage(cap: float = 180.0):
    """Probe-then-attempt; attempts are SPREAD across the bench (called
    again between host stages and at the end) instead of front-loaded, so
    a relay that recovers mid-bench still gets measured."""
    if REC.get("value") is not None and REC.get("platform") == "tpu":
        return
    if not relay_probe():
        return
    tpu_attempt(cap)


TPU_E2E_MB = int(os.environ.get("KMTPU_TPU_E2E_MB", "16"))


def tpu_e2e_stage():
    """Driver-captured TPU end-to-end (VERDICT r3 #6): stream a small
    FASTQ through `--streaming --mesh 1` ON THE CHIP, byte-compare every
    output file against the host streaming run of the same config, and
    record reads/s plus the (estimated) bytes shipped over the host<->chip
    link.  Bounded: only runs when the chip rate stage already succeeded
    and enough budget remains."""
    if REC.get("platform") != "tpu":
        return
    cap = min(420.0, _remaining() - 75)
    # measured on the dev relay: 16 MB warm = 86 s mesh + 4 s host ref,
    # cold compile +60 s (the persistent cache keeps later rounds warm)
    if cap < 100:
        REC["tpu_e2e"] = "skipped (budget: %.0f s left)" % _remaining()
        return
    mb = TPU_E2E_MB
    path = e2e_input_path(mb)
    n_reads = _e2e_n_reads(path)
    flags = ["--streaming", "--kmer-scoring-type", "MEDIAN",
             "--mask-simple-repeats", "0", "--artifact-edit-distance", "1",
             "--min-read-length", "25"]
    env = _bench_env()
    try:
        # host reference run first (fast; its outputs are the oracle)
        _run([sys.executable, "-m", "kmernator_tpu.apps.filter_reads",
              "--jax-platform", "cpu"] + flags +
             ["--out", "/tmp/kmtpu-te2e-host", "31", path],
             env=env, timeout=min(120.0, cap / 2))
        t0 = time.perf_counter()
        _run([sys.executable, "-m", "kmernator_tpu.apps.filter_reads",
              "--mesh", "1"] + flags +
             ["--out", "/tmp/kmtpu-te2e-tpu", "31", path],
             env=env, timeout=cap)
        dt = time.perf_counter() - t0
    except Exception as e:
        REC["tpu_e2e"] = "failed: %s" % type(e).__name__
        return
    host_files = sorted(f for f in os.listdir("/tmp")
                        if f.startswith("kmtpu-te2e-host"))
    equal = bool(host_files)
    for hf in host_files:
        tf = "/tmp/" + hf.replace("kmtpu-te2e-host", "kmtpu-te2e-tpu")
        try:
            with open("/tmp/" + hf, "rb") as a, open(tf, "rb") as b:
                equal = equal and a.read() == b.read()
        except OSError:
            equal = False
    for f in os.listdir("/tmp"):
        if f.startswith("kmtpu-te2e-"):
            os.unlink("/tmp/" + f)
    # link traffic estimate: packed 2-bit codes + good bitmask + lengths,
    # shipped once for the build pass and once for the lookup pass
    L, NW = E2E_L, E2E_L - K + 1
    link_bytes = n_reads * ((L + 3) // 4 + (NW + 7) // 8 + 4) * 2
    REC["tpu_e2e_metric"] = ("reads filtered/sec, --streaming --mesh 1 "
                             "on-chip (%d MB)" % mb)
    REC["tpu_e2e_value"] = round(n_reads / dt)
    REC["tpu_e2e_equal_host"] = equal
    REC["tpu_e2e_link_mb_est"] = round(link_bytes / 1e6, 1)


def host_fallback_stage():
    """When the TPU relay is unreachable, measure the identical counting
    path on host CPU so the record never lands with value=null.  The
    metric string is rewritten so the number cannot be mistaken for a
    chip rate."""
    here = os.path.dirname(os.path.abspath(__file__))
    env = dict(os.environ)
    env["PYTHONPATH"] = here + os.pathsep + env.get("PYTHONPATH", "")
    cap = min(120.0, _remaining() - 90)
    if cap < 30:
        return
    try:
        out = _run([sys.executable, "-c",
                    "import bench; bench.tpu_child(platform='cpu', steps=20)"],
                   env=env, timeout=cap)
    except Exception:
        return
    for line in out.splitlines():
        if line.startswith("RATE="):
            REC["value"] = round(float(line.split("=")[1]))
            REC["metric"] = ("canonical 31-mers counted/sec "
                             "(HOST-CPU FALLBACK - no TPU attempt "
                             "completed; see tpu_probes)")
            REC["platform"] = "cpu-fallback"


def main():
    signal.signal(signal.SIGTERM, _flush_and_exit)
    signal.signal(signal.SIGALRM, _flush_and_exit)
    signal.alarm(max(10, int(BUDGET_S)))

    # stage A: native baselines compile fast; do it first so later stages
    # never wait on the compiler
    try:
        _build_native("baseline_count")
        _build_native("baseline_filter")
    except Exception:
        pass

    # stage B: e2e input (cached across runs in /tmp)
    try:
        e2e_input_path()
    except Exception:
        pass

    # stage C: TPU rate + chip golden, attempt 1 (guarded, probe-gated).
    # Attempts are spread across the WHOLE bench — again after each host
    # stage and once more at the end — so a relay that recovers mid-bench
    # still gets measured (round 3 front-loaded all three attempts in the
    # first ~330 s and a later recovery went unnoticed).
    try:
        tpu_stage(240.0)  # the relay RTT fluctuates wildly (the same
        # warm child measured 36 s, 80 s, and >178 s within an hour);
        # attempt 1 gets the biggest cap since it is the most likely to
        # land and everything downstream is cheaper
    except Exception:
        pass
    _checkpoint()

    # stage D: C++ kmer-count baseline
    try:
        base = baseline_kmers_per_sec()
    except Exception:
        base = 0.0
    try:
        tpu_stage(90.0)  # attempt 2 (no-op if attempt 1 landed)
    except Exception:
        pass
    if REC["value"] and base:
        REC["vs_baseline"] = round(REC["value"] / base, 2)
    _checkpoint()

    # stage E/F: ONE interleaved e2e pair at the primary size first — the
    # later stages (tpu_e2e, the second size point) must not be starved
    # by extra pairs; stage I tops both sizes up with leftover budget
    o_best = {E2E_MB: 0.0, 256: 0.0, 1024: 0.0}
    b_best = {E2E_MB: 0.0, 256: 0.0, 1024: 0.0}

    def _rec_e2e(mb):
        if not (o_best[mb] and b_best[mb]):
            return
        if mb == E2E_MB:
            REC["e2e_metric"] = ("reads filtered/sec (1 host, %d MB)"
                                 % E2E_MB)
            REC["e2e_value"] = round(o_best[mb])
            REC["e2e_vs_baseline"] = round(o_best[mb] / b_best[mb], 2)
        else:
            tag = "1g" if mb == 1024 else str(mb)
            REC["e2e_%s_value" % tag] = round(o_best[mb])
            REC["e2e_%s_vs_baseline" % tag] = \
                round(o_best[mb] / b_best[mb], 2)

    def _one_pair(mb):
        o, b = e2e_pair(mb, max_pairs=1)
        o_best[mb] = max(o_best[mb], o)
        b_best[mb] = max(b_best[mb], b)
        _rec_e2e(mb)

    try:
        _one_pair(E2E_MB)
    except Exception:
        REC.setdefault("e2e_value", None)
    try:
        tpu_stage(90.0)  # attempt 3
        if REC["value"] and base and REC.get("vs_baseline") is None:
            REC["vs_baseline"] = round(REC["value"] / base, 2)
    except Exception:
        pass
    _checkpoint()

    # stage G: the TPU end-to-end record (VERDICT r3 #6) — only runs when
    # a chip rate landed; budget-bounded
    try:
        tpu_e2e_stage()
    except Exception:
        pass
    _checkpoint()

    # the labeled host fallback outranks the second size point: when the
    # chip value is still missing and the remaining budget can only fund
    # one of them, fund the fallback first (a null value is the worst
    # possible record)
    if REC["value"] is None and _remaining() < 330:
        try:
            host_fallback_stage()
            if REC["value"] and base:
                REC["vs_baseline"] = round(REC["value"] / base, 2)
        except Exception:
            pass
        _checkpoint()

    # stage H: one pair at the second size point (the ratio is
    # size-dependent; recording both sizes keeps the story honest)
    mb2 = 1024 if E2E_MB != 1024 else 256
    try:
        cached = os.path.exists("/tmp/kmtpu-bench-e2e-%dmb.fastq" % mb2)
        if _remaining() > (0.2 * mb2 + (20 if cached else 120)):
            _one_pair(mb2)
    except Exception:
        pass
    _checkpoint()

    # stage I: leftover budget tops up BOTH sizes with more interleaved
    # pairs, biggest-first — best-of across pairs is the bimodal-VM
    # mitigation, now applied without starving any stage
    try:
        for mb in (E2E_MB, mb2, E2E_MB):
            if _remaining() > 0.17 * mb + 100:
                _one_pair(mb)
    except Exception:
        pass

    # final TPU attempt with whatever budget is left MINUS a reserved
    # window for the labeled host fallback — a relay that is up but slow
    # (probes pass, the child stalls) must not burn the fallback's slot
    # and leave value=null (it did exactly that in a 420 s validation
    # run: two full-cap attempts timed out, then remaining-90 < 30)
    FALLBACK_RESERVE = 140.0
    try:
        need_chip = (REC["value"] is None
                     or REC.get("platform") == "cpu-fallback")
        # when the labeled fallback already landed, the reserve is no
        # longer needed — a late healthy-relay retry only needs its own
        # runtime plus the flush margin
        reserve = FALLBACK_RESERVE if REC["value"] is None else 0.0
        if need_chip and _remaining() > reserve + 110:
            tpu_stage(_remaining() - reserve - 50)
        if REC["value"] and base and (REC.get("vs_baseline") is None
                                      or REC.get("platform") == "tpu"):
            REC["vs_baseline"] = round(REC["value"] / base, 2)
    except Exception:
        pass
    if REC["value"] is None:
        try:
            host_fallback_stage()
            if REC["value"] and base:
                REC["vs_baseline"] = round(REC["value"] / base, 2)
        except Exception:
            pass

    _flush_and_exit()


if __name__ == "__main__":
    main()
