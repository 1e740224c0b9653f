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
(default 1 GiB; KMTPU_E2E_MB overrides) vs the C++ baseline_filter
stand-in (see e2e_pair below).

ROUND-5 RESTRUCTURE (three consecutive rounds lost the chip number to a
slow-but-alive relay): the chip attempt is now a BACKGROUND child that
prints a salvageable milestone line after every phase —

  GOLDEN=ok|mismatch    count-table digest vs host oracle (tiny batch,
                        compiles in seconds even cold; 8 bytes cross the
                        link per digest instead of the 262 KB table pull
                        that starved every capped attempt in rounds 2-4)
  GOLDEN2=ok|mismatch   extension-code digest (the mergraph device path)
  RATE_PARTIAL=<k/s>    timed short loop (PARTIAL_STEPS dispatch)
  RATE=<k/s>            timed full loop, printed up to 3x (best-of:
                        the shared chip is time-sliced under neighbor
                        load, so each sample is fair-share-now and the
                        max approaches the chip's actual rate; a
                        contended first landing also triggers a
                        temporally-spaced resample child later in the
                        budget)

— and a reader thread harvests each line into REC the moment it appears,
so killing the child at any point loses nothing already printed.  The
child runs CONCURRENTLY with the host stages (C++ baselines, e2e timing):
it blocks on the relay while the host stages burn local cores, so the two
no longer fight over one serial budget.

HARD WALL: the whole bench is budgeted to KMTPU_BENCH_BUDGET_S seconds
(default 420).  Partial results are kept in REC as stages complete, and
SIGTERM / SIGALRM flush the record before exit — the driver always
captures a JSON line even if a stage hangs.
"""
import json
import os
import signal
import subprocess
import sys
import threading
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
PARTIAL_STEPS = 700   # the salvageable short loop (RATE_PARTIAL)
GOLDEN_B = 64     # tiny golden batch: 64*70=4480 windows, pads to 8192

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

_REC_LOCK = threading.Lock()  # reader thread vs main-thread json.dumps
_FLUSHED = False
_CHILD = None  # current foreground Popen, killed by the watchdog
_CHIP = None   # background _ChipChild, killed on flush


def _remaining() -> float:
    return _DEADLINE - time.time()


def _checkpoint():
    """Print the record-so-far after each completed stage.  The driver
    parses the LAST JSON line of the output tail, so if it hard-kills
    the bench (rc 124 with an empty tail lost round 2's entire story)
    the newest checkpoint still lands; _flush_and_exit prints the final
    line."""
    with _REC_LOCK:
        rec = dict(REC)
    rec["elapsed_s"] = round(time.time() - _T0, 1)
    rec["partial"] = True
    print(json.dumps(rec), flush=True)


def _flush_and_exit(signum=None, frame=None):
    global _FLUSHED
    if not _FLUSHED:
        _FLUSHED = True
        _promote_partial()
        _set_ratio()
        with _REC_LOCK:
            # a best-of that never caught a quiet chip is labeled so the
            # number reads as fair-share-under-contention, not capability
            if (REC.get("platform") == "tpu" and REC.get("value")
                    and REC["value"] < CONTENDED_RATE
                    and "PARTIAL" not in REC.get("metric", "")):
                REC["metric"] += (" (chip time-sliced by neighbor load "
                                  "across all samples - lower bound; see "
                                  "chip_rate_samples)")
        with _REC_LOCK:
            REC["elapsed_s"] = round(time.time() - _T0, 1)
            rec = dict(REC)
        print(json.dumps(rec), flush=True)
    if _CHIP is not None:
        _CHIP.kill()
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


def _capture_child(code: str, timeout: float) -> str:
    """Run a python -c child and return its stdout SO FAR even when the
    timeout kills it mid-run (the labeled host fallback salvages partial
    milestone lines the same way the chip reader does)."""
    global _CHILD
    timeout = max(1.0, min(timeout, _remaining() - 5))
    out = ""
    with subprocess.Popen([sys.executable, "-c", code], env=_bench_env(),
                          stdout=subprocess.PIPE,
                          stderr=subprocess.DEVNULL) as p:
        _CHILD = p
        try:
            out = p.communicate(timeout=timeout)[0].decode("utf-8", "replace")
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
    return out


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


def _golden_batch(b: int = GOLDEN_B):
    """Small distinct batch for the chip-golden digests: random reads plus
    sprinkled hard-bad bases so the good-window mask is exercised.  The
    margins are huge (-9 per bad base vs the -3.32 window threshold), so
    float-accumulation-order differences between numpy and XLA cumsum
    cannot flip a window."""
    rng = np.random.default_rng(23)
    genome = rng.integers(0, 4, 200_000, dtype=np.uint8)
    starts = rng.integers(0, 200_000 - L, b)
    codes = genome[starts[:, None] + np.arange(L)[None, :]].copy()
    bad = rng.random((b, L)) < 0.01
    lengths = np.full(b, L, dtype=np.int32)
    return codes, bad, lengths


LOG2_MIN_WEIGHT = -3.3219281   # log2(0.1): the MEDIAN-config good threshold
LOGP_GOOD = np.float32(-0.00144)   # ~phred-35 per-base log2 prob
LOGP_BAD = np.float32(-9.0)        # forces any containing window bad


def _np_good_windows(logp: np.ndarray, lengths: np.ndarray, k: int):
    """numpy twin of device_spectrum.window_good (sliding log2-sum test)."""
    b, l = logp.shape
    cs = np.concatenate([np.zeros((b, 1), np.float32),
                         np.cumsum(logp.astype(np.float32), axis=1)], axis=1)
    wsum = cs[:, k:] - cs[:, :-k]
    pos = np.arange(l - k + 1)[None, :]
    valid = pos <= (lengths[:, None] - k)
    return (wsum > np.float32(LOG2_MIN_WEIGHT)) & valid


# Seeds for the two independent 32-bit table digests (see _digest_np).
_DIGEST_SEEDS = (0x9E3779B9, 0x85EBCA6B)


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


def _digest_np(hi, lo, val, seed):
    """Order-insensitive multiset digest over (hi, lo, val) u32 rows:
    mix(mix(mix(val ^ seed) ^ lo) ^ hi) summed mod 2^32.  Insensitive to
    row ORDER (the device table is unsorted with interleaved sentinel
    rows — callers pass only live rows here, the device sums a masked
    version of the same expression) but sensitive to every key bit, the
    value, and multiplicity: a split count (2+3 vs one 5) moves the sum
    because mix is nonlinear.  Two seeds give an effective 64-bit
    comparison, so the chip-golden check reads back ONE u32 per seed
    instead of the whole table — the 262 KB device->host pull measured
    43-206 s through the relay and starved the RATE phase out of every
    capped attempt in rounds 2-4."""
    with np.errstate(over="ignore"):
        h = _mix32_np(np.asarray(val).astype(np.uint32) ^ np.uint32(seed))
        h = _mix32_np(h ^ np.asarray(lo).astype(np.uint32))
        h = _mix32_np(h ^ np.asarray(hi).astype(np.uint32))
        return int(h.sum(dtype=np.uint32))


def _host_count_digests(codes, logp, lengths):
    """Digests of the unique (canonical key, good-count) table via the
    host path (ops/kmer.extract_kmers_flat), the oracle the unit tests
    trust (ref semantics: src/Kmer.h:2161-2299 spectrum counting)."""
    from kmernator_tpu.ops.kmer import extract_kmers_flat
    from kmernator_tpu.parallel.spectrum import pack_u64
    b, l = codes.shape
    flat = codes.reshape(-1).astype(np.uint8)
    offsets = np.arange(b + 1, dtype=np.int64) * l
    canon, _, _, _ = extract_kmers_flat(flat, offsets, K)
    good = _np_good_windows(logp, lengths, K).reshape(-1)
    keys = pack_u64(canon[good])
    uk, uc = np.unique(keys, return_counts=True)
    hi = (uk >> np.uint64(32)).astype(np.uint32)
    lo = (uk & np.uint64(0xFFFFFFFF)).astype(np.uint32)
    return [_digest_np(hi, lo, uc, s) for s in _DIGEST_SEEDS]


def _host_ext_digests(codes, logp, lengths):
    """Digests of the multiset of (canonical key, left-ext, right-ext)
    over good windows via the host extension path (ops/extensions.py;
    ref semantics: src/KmerTrackingData.h:153-230 ExtensionTracking)."""
    from kmernator_tpu.ops.extensions import window_extensions
    from kmernator_tpu.ops.kmer import extract_kmers_flat
    b, l = codes.shape
    flat = codes.reshape(-1).astype(np.uint8)
    offsets = np.arange(b + 1, dtype=np.int64) * l
    canon, is_fwd, _, _ = extract_kmers_flat(flat, offsets, K)
    el, er = window_extensions(flat, np.ones(len(flat), bool), offsets, K,
                               is_fwd)
    good = _np_good_windows(logp, lengths, K).reshape(-1)
    val = el.astype(np.int32) * 8 + er.astype(np.int32)
    return [_digest_np(canon[good, 0], canon[good, 1], val[good], s)
            for s in _DIGEST_SEEDS]


def golden_logp(bad: np.ndarray) -> np.ndarray:
    return np.where(bad, LOGP_BAD, LOGP_GOOD).astype(np.float32)


def tpu_child(platform=None, steps=STEPS):
    """Runs inside the background subprocess.  Prints a salvageable
    milestone line after every phase — the parent's reader thread
    harvests each the moment it appears, so a child killed mid-run
    still contributes everything it reached:

      GOLDEN=ok|mismatch    count-table digests on a tiny batch (small
                            shapes compile in seconds even cold, and
                            only 2 u32 scalars cross the link)
      GOLDEN2=ok|mismatch   extension-code digests (the mergraph device
                            path, parallel/mesh._window_extensions_device)
      RATE_PARTIAL=<k/s>    timed PARTIAL_STEPS-step loop (through a slow
                            relay this is dispatch-latency-bound: a
                            LOWER bound on the chip rate)
      RATE=<k/s>            timed full-steps loop (the headline number)

    The rate program takes the trip count as a TRACED argument (fori_loop
    lowers to while_loop), so ONE compilation serves the warm-up, the
    partial loop, and the full loop — under the old structure the second
    compile cost more than the loop itself through a slow relay.  Host->
    device traffic is ~60 KB total (u8 codes only; logp/lengths are
    constructed on-device), vs ~900 KB before.

    platform="cpu" is the labeled host fallback used only when the TPU
    relay never produced a rate; same code, same shapes.
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
    from kmernator_tpu.parallel.mesh import _window_extensions_device

    def _mix32(x):
        x = x.astype(jnp.uint32)
        x = x ^ (x >> jnp.uint32(16))
        x = x * jnp.uint32(0x7FEB352D)
        x = x ^ (x >> jnp.uint32(15))
        x = x * jnp.uint32(0x846CA68B)
        return x ^ (x >> jnp.uint32(16))

    def _digest_dev(hi, lo, val, live, seed):
        h = _mix32(val.astype(jnp.uint32) ^ jnp.uint32(seed))
        h = _mix32(h ^ lo.astype(jnp.uint32))
        h = _mix32(h ^ hi.astype(jnp.uint32))
        return jnp.sum(jnp.where(live, h, jnp.uint32(0)), dtype=jnp.uint32)

    def build_count(codes, logp, lengths):
        cols, is_fwd, valid = extract_canonical_cols(codes, lengths, K)
        wsum, good = window_good(logp, lengths, K, LOG2_MIN_WEIGHT)
        g = (good & valid).reshape(-1)
        return count_batch([c.reshape(-1) for c in cols], g, 1)

    @jax.jit
    def golden_digests(codes, bad, lengths):
        logp = jnp.where(bad, LOGP_BAD, LOGP_GOOD).astype(jnp.float32)
        keys, counts, _ = build_count(codes, logp, lengths)
        live = counts > 0
        return jnp.stack([_digest_dev(keys[:, 0], keys[:, 1], counts, live, s)
                          for s in _DIGEST_SEEDS])

    @jax.jit
    def ext_digests(codes, bad, lengths):
        logp = jnp.where(bad, LOGP_BAD, LOGP_GOOD).astype(jnp.float32)
        cols, is_fwd, valid = extract_canonical_cols(codes, lengths, K)
        _, good = window_good(logp, lengths, K, LOG2_MIN_WEIGHT)
        g = good & valid
        ext_ok = jnp.ones(codes.shape, dtype=jnp.bool_)
        el, er = _window_extensions_device(codes.astype(jnp.int32), lengths,
                                           is_fwd, ext_ok, K)
        return jnp.stack([_digest_dev(cols[0], cols[1], el * 8 + er, g, s)
                          for s in _DIGEST_SEEDS])

    # ---- phase 1+2: tiny-batch goldens, scalar digests only ----
    gcodes, gbad, glens = _golden_batch()
    gc = jnp.asarray(gcodes)
    gb = jnp.asarray(gbad)
    gn = jnp.asarray(glens)
    dev = [int(x) for x in np.asarray(golden_digests(gc, gb, gn))]
    want = _host_count_digests(gcodes, golden_logp(gbad), glens)
    print("GOLDEN=%s" % ("ok" if dev == want else "mismatch"), flush=True)

    dev2 = [int(x) for x in np.asarray(ext_digests(gc, gb, gn))]
    want2 = _host_ext_digests(gcodes, golden_logp(gbad), glens)
    print("GOLDEN2=%s" % ("ok" if dev2 == want2 else "mismatch"), flush=True)

    # ---- phase 3+4: timed rate, partial then full, one compilation ----
    @jax.jit
    def run_steps(big_codes, logp, lengths, n):
        def body(i, acc):
            c = lax.dynamic_slice_in_dim(big_codes, i, B, 0)
            return acc + build_count(c, logp, lengths)[2]
        return lax.fori_loop(0, n, body, jnp.int32(0))

    codes_h, _, _ = _bench_batch()
    codes = jnp.asarray(codes_h)                      # the only bulk transfer
    logp = jnp.full((B, L), LOGP_GOOD, dtype=jnp.float32)
    lengths = jnp.full((B,), L, dtype=jnp.int32)
    # steps extra rows so step i counts rows [i, i+B) — real, distinct
    # work every iteration, immune to loop-invariant hoisting; tiled
    # ON-DEVICE so the link sees B*L bytes, not (B+steps)*L
    reps = -(-(B + steps) // B)
    big_codes = jnp.concatenate([codes] * reps, axis=0)[:B + steps]

    n_windows = B * (L - K + 1)
    total_warm = int(run_steps(big_codes, logp, lengths, np.int32(2)))
    assert 0 < total_warm <= 2 * n_windows, total_warm

    p_steps = min(PARTIAL_STEPS, steps)
    t0 = time.perf_counter()
    tp = int(run_steps(big_codes, logp, lengths, np.int32(p_steps)))
    dtp = time.perf_counter() - t0
    assert 0 < tp <= p_steps * n_windows, tp
    print("RATE_PARTIAL=%.1f" % (n_windows * p_steps / dtp), flush=True)

    # best-of-3 full loops: the shared dev chip is time-sliced under
    # neighbor load (one validation run measured BOTH loops stretched a
    # uniform ~24x — 33 vs 806 Mk/s across phases), so each timing is a
    # fair-share-now sample; the parent's reader keeps the max.  Stop
    # early once a sample shows an uncontended chip (within ~25% of the
    # measured 806 Mk/s capability) — reruns then add nothing.
    for _ in range(3):
        t0 = time.perf_counter()
        total = int(run_steps(big_codes, logp, lengths, np.int32(steps)))
        dt = time.perf_counter() - t0
        assert 0 < total <= steps * n_windows, total
        rate = n_windows * steps / dt
        print("RATE=%.1f" % rate, flush=True)
        if rate > 600e6:
            break


class _ChipChild:
    """Background tpu_child whose stdout is harvested LIVE by a reader
    thread: each milestone line lands in REC the moment the child prints
    it, so a later kill loses nothing already achieved.  The chip child
    and the host stages use disjoint resources (the child blocks on the
    relay; the host stages burn local cores), so main() runs them
    concurrently instead of serializing one budget across both."""

    CODE = "import bench; bench.tpu_child()"

    def __init__(self, code: str = None):
        self.proc = subprocess.Popen(
            [sys.executable, "-c", code or self.CODE],
            env=_bench_env(), stdout=subprocess.PIPE,
            stderr=subprocess.DEVNULL, text=True, bufsize=1)
        self.thread = threading.Thread(target=self._reader, daemon=True)
        self.thread.start()

    def _reader(self):
        for raw in self.proc.stdout:
            line = raw.strip()
            if not line:
                continue
            t = round(time.time() - _T0, 1)
            with _REC_LOCK:
                REC.setdefault("chip_milestones", []).append(
                    {"t": t, "line": line})
                if line.startswith("GOLDEN="):
                    REC["chip_golden_ok"] = line == "GOLDEN=ok"
                elif line.startswith("GOLDEN2="):
                    REC["chip_golden_ext_ok"] = line == "GOLDEN2=ok"
                elif line.startswith("RATE_PARTIAL="):
                    REC["chip_rate_partial"] = round(float(line.split("=")[1]))
                elif line.startswith("RATE="):
                    # best-of across samples: the shared dev chip is
                    # time-sliced under neighbor load (measured a uniform
                    # ~24x stretch on BOTH the 700- and 5600-step loops in
                    # one phase, 33 vs 806 Mk/s across phases), so each
                    # sample is fair-share-now, and max approaches the
                    # chip's actual rate
                    rate = round(float(line.split("=")[1]))
                    REC.setdefault("chip_rate_samples", []).append(rate)
                    REC["value"] = max(REC.get("value") or 0, rate)
                    REC["platform"] = "tpu"
                    REC["metric"] = "canonical 31-mers counted/sec/chip"

    def running(self) -> bool:
        return self.proc.poll() is None

    def wait(self, timeout: float) -> bool:
        try:
            self.proc.wait(timeout=max(0.0, timeout))
        except subprocess.TimeoutExpired:
            pass
        return not self.running()

    def kill(self):
        if self.running():
            try:
                self.proc.kill()
            except OSError:
                pass
        self.thread.join(timeout=5)


def _promote_partial():
    """A harvested RATE_PARTIAL becomes the headline value only when the
    full RATE never landed — labeled so the number cannot be mistaken
    for the steady-state rate (the short loop is dispatch-latency-bound
    through a slow relay: a lower bound on the chip)."""
    with _REC_LOCK:
        if REC.get("value") is None and REC.get("chip_rate_partial"):
            REC["value"] = REC["chip_rate_partial"]
            REC["platform"] = "tpu"
            REC["metric"] = ("canonical 31-mers counted/sec/chip "
                             "(PARTIAL %d-step loop salvaged from a "
                             "timed-out attempt - lower bound)"
                             % PARTIAL_STEPS)


_BASE = 0.0


def _set_ratio():
    with _REC_LOCK:
        if REC.get("value") and _BASE:
            REC["vs_baseline"] = round(REC["value"] / _BASE, 2)


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
    were made and when."""
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
    with _REC_LOCK:
        REC.setdefault("tpu_probes", []).append({"t": t, "ok": ok})
    return ok


_CHIP_STARTS = 0
_MAX_CHIP_STARTS = 2


def _ensure_chip():
    """(Re)start the background chip attempt when none is alive and no
    full rate has landed: probes are cheap, a relay that comes back
    mid-bench still gets measured, and a child that CRASHED (exited
    without printing RATE) gets one retry with a warm compilation
    cache."""
    global _CHIP, _CHIP_STARTS
    with _REC_LOCK:
        done = REC.get("platform") == "tpu" and REC.get("value") is not None
    if done or (_CHIP is not None and _CHIP.running()):
        return
    if _CHIP_STARTS >= _MAX_CHIP_STARTS or _remaining() < 200:
        return
    if not relay_probe():
        return
    _CHIP_STARTS += 1
    _CHIP = _ChipChild()


# value below which a landed rate reads as "the shared chip was being
# time-sliced when we sampled" (capability measured 780-810 Mk/s; the
# worst contended sample seen was 33 Mk/s — a uniform ~24x stretch)
CONTENDED_RATE = 150e6


def _resample_chip():
    """A landed-but-contended rate gets another TEMPORALLY-SPACED child
    when leftover budget allows: contention phases last minutes, so a
    later sample can catch a quiet chip, and the reader's best-of keeps
    the max.  Only after the on-chip e2e question is settled (the chip
    is exclusive), and never more than 2 extra starts."""
    global _CHIP, _CHIP_STARTS
    with _REC_LOCK:
        val = REC.get("value")
        is_tpu = REC.get("platform") == "tpu"
        e2e_settled = ("tpu_e2e_value" in REC or "tpu_e2e" in REC
                       or not is_tpu)
    if not (is_tpu and val and val < CONTENDED_RATE and e2e_settled):
        return
    if _CHIP is not None and _CHIP.running():
        return
    if _CHIP_STARTS >= _MAX_CHIP_STARTS + 2 or _remaining() < 130:
        return
    if not relay_probe():
        return
    _CHIP_STARTS += 1
    _CHIP = _ChipChild()


TPU_E2E_MB = int(os.environ.get("KMTPU_TPU_E2E_MB", "8"))


def tpu_e2e_stage(max_cap: float = 420.0):
    """Driver-captured TPU end-to-end: stream a small FASTQ through
    `--streaming --mesh 1` ON THE CHIP, byte-compare every output file
    against the host streaming run of the same config, and record
    reads/s plus the (estimated) bytes shipped over the host<->chip
    link.  Runs once the chip attempt is fully resolved (the chip is
    exclusive: the child must be dead first) and enough budget remains;
    a salvaged RATE_PARTIAL qualifies, not just the full rate.

    max_cap bounds one attempt: the EARLY fast-path slot passes ~150 s
    so a relay that stalls on heavy RPCs (probes and the tiny-batch
    child still fast — observed live) fails this stage quickly instead
    of eating the host stages' budget; the endgame slot retries
    uncapped-within-budget."""
    # a prior "failed:"/"skipped" marker does NOT block a later call:
    # the early fast-path slot can lose to a cold compile or a loaded
    # host, and the endgame slot then retries with the leftover budget
    if REC.get("platform") != "tpu" or "tpu_e2e_value" in REC:
        return
    cap = min(max_cap, _remaining() - 75)

    def _mark(what):
        with _REC_LOCK:
            REC["tpu_e2e"] = what
            REC.setdefault("tpu_e2e_attempts", []).append(
                {"t": round(time.time() - _T0, 1), "cap": round(cap),
                 "result": what})

    # measured on the dev relay: 8 MB warm = 26-31 s mesh + 5 s host ref,
    # cold compile ~200 s (the persistent cache keeps later rounds warm)
    if cap < 100:
        _mark("skipped (budget: %.0f s left)" % _remaining())
        return
    mb = TPU_E2E_MB
    path = e2e_input_path(mb)
    n_reads = _e2e_n_reads(path)
    flags = ["--streaming", "--kmer-scoring-type", "MEDIAN",
             "--mask-simple-repeats", "0", "--artifact-edit-distance", "1",
             "--min-read-length", "25"]
    env = _bench_env()

    def _clean():
        # stale outputs from a timed-out earlier attempt poison the
        # byte-comparison (a partial tpu file vs a fresh host file read
        # as equal_host=false in a validation run) — scrub before AND
        # after, success or not
        for f in os.listdir("/tmp"):
            if f.startswith("kmtpu-te2e-"):
                try:
                    os.unlink("/tmp/" + f)
                except OSError:
                    pass

    _clean()
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
        _mark("failed: %s" % type(e).__name__)
        _clean()
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
    _clean()
    # link traffic estimate: packed 2-bit codes + good bitmask + lengths,
    # shipped once for the build pass and once for the lookup pass
    L, NW = E2E_L, E2E_L - K + 1
    link_bytes = n_reads * ((L + 3) // 4 + (NW + 7) // 8 + 4) * 2
    with _REC_LOCK:
        REC["tpu_e2e_metric"] = ("reads filtered/sec, --streaming --mesh 1 "
                                 "on-chip (%d MB)" % mb)
        REC["tpu_e2e_value"] = round(n_reads / dt)
        REC["tpu_e2e_equal_host"] = equal
        REC["tpu_e2e_link_mb_est"] = round(link_bytes / 1e6, 1)


def host_fallback_stage():
    """When no chip attempt produced a rate, measure the identical
    counting path on host CPU so the record never lands with value=null.
    The metric string is rewritten so the number cannot be mistaken for
    a chip rate.  Salvages partial lines on timeout, and never touches
    the chip_golden fields — those belong to the chip."""
    cap = min(120.0, _remaining() - 25)
    if cap < 30:
        return
    out = _capture_child(
        "import bench; bench.tpu_child(platform='cpu', steps=20)", cap)
    rate = None
    for line in out.splitlines():
        if line.startswith("RATE="):
            rate = float(line.split("=")[1])
        elif line.startswith("RATE_PARTIAL=") and rate is None:
            rate = float(line.split("=")[1])
    if rate is None:
        return
    with _REC_LOCK:
        REC["value"] = round(rate)
        REC["metric"] = ("canonical 31-mers counted/sec "
                         "(HOST-CPU FALLBACK - no TPU attempt "
                         "completed; see tpu_probes/chip_milestones)")
        REC["platform"] = "cpu-fallback"


def main():
    global _BASE
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

    # the chip attempt launches in the BACKGROUND the moment the relay
    # answers a probe, and streams milestones into REC while every host
    # stage below runs — the serial budget war of rounds 2-4 (attempt
    # caps vs fallback reserves vs the second e2e size) is gone because
    # the chip child is not ON the host's critical path
    try:
        _ensure_chip()
    except Exception:
        pass

    # stage B: e2e input (cached across runs in /tmp)
    try:
        e2e_input_path()
    except Exception:
        pass

    # stage C: C++ kmer-count baseline
    try:
        _BASE = baseline_kmers_per_sec()
    except Exception:
        _BASE = 0.0
    _set_ratio()
    _checkpoint()

    def _try_tpu_e2e(grace: float = 0.0):
        """Healthy-relay fast path: a warm child finishes in ~60-100 s,
        so once RATE lands (its final line) run the on-chip e2e RIGHT
        AWAY while the budget is plentiful — the late-endgame slot was
        too small for the mesh run when the host stages ran long.  With
        `grace`, waits briefly for an almost-done child (milestones
        prove the relay is fast) before giving up the slot."""
        chip = _CHIP
        if chip is None:
            return
        with _REC_LOCK:
            started = bool(REC.get("chip_milestones"))
        if grace and started and chip.running():
            chip.wait(grace)
        with _REC_LOCK:
            done = (REC.get("platform") == "tpu"
                    and REC.get("value") is not None)
        if done and not chip.running():
            try:
                tpu_e2e_stage(max_cap=150.0)
            except Exception:
                pass

    _try_tpu_e2e(grace=60.0)

    # stage D/E: e2e pairs — primary size, then the second size point
    # (the ratio is size-dependent; recording both keeps the story
    # honest).  The chip child keeps running underneath.
    o_best = {}
    b_best = {}

    def _rec_e2e(mb):
        if not (o_best.get(mb) and b_best.get(mb)):
            return
        with _REC_LOCK:
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

    pair_cost = {}  # mb -> last measured wall seconds for one pair

    def _one_pair(mb):
        t0 = time.time()
        o, b = e2e_pair(mb, max_pairs=1)
        pair_cost[mb] = time.time() - t0
        o_best[mb] = max(o_best.get(mb, 0.0), o)
        b_best[mb] = max(b_best.get(mb, 0.0), b)
        _rec_e2e(mb)

    try:
        _one_pair(E2E_MB)
    except Exception:
        REC.setdefault("e2e_value", None)
    _ensure_chip()
    _try_tpu_e2e()
    _checkpoint()

    mb2 = 1024 if E2E_MB != 1024 else 256
    try:
        cached = os.path.exists("/tmp/kmtpu-bench-e2e-%dmb.fastq" % mb2)
        if _remaining() > (0.2 * mb2 + (20 if cached else 120)):
            _one_pair(mb2)
    except Exception:
        pass
    _ensure_chip()
    _checkpoint()

    # stage F: leftover budget tops up BOTH sizes with more interleaved
    # pairs, biggest-first — best-of across pairs is the bimodal-VM
    # mitigation.  A reserve keeps the chip endgame funded: enough to
    # wait out a slow child AND run either tpu_e2e or the fallback.
    try:
        for mb in (E2E_MB, mb2, E2E_MB):
            if _remaining() > 0.17 * mb + 240:
                _one_pair(mb)
    except Exception:
        pass
    _checkpoint()

    # ---- chip endgame ----
    # The child has had the whole bench so far.  Give it the rest of the
    # budget minus a reserve: 150 s for the labeled host fallback when
    # NOTHING landed, 120 s when at least a golden landed (the fallback
    # still fits, smaller), and stop immediately once RATE arrives.
    chip = _CHIP
    while chip is not None and chip.running():
        with _REC_LOCK:
            have_rate = (REC.get("platform") == "tpu"
                         and REC.get("value") is not None)
            have_any = bool(REC.get("chip_milestones"))
        if have_rate:
            # up to 2 more best-of RATE lines follow the first (5-6 s
            # each when contended); let them land before the kill
            chip.wait(20)
            break
        if _remaining() <= (120 if have_any else 170):
            break
        time.sleep(2)
    if chip is not None:
        chip.kill()
    _promote_partial()
    _set_ratio()
    _checkpoint()

    # stage G: the on-chip end-to-end record — runs on a full OR partial
    # chip rate (the chip is free now; the child is dead)
    try:
        tpu_e2e_stage()
    except Exception:
        pass

    with _REC_LOCK:
        need_fallback = REC.get("value") is None
    if need_fallback:
        try:
            host_fallback_stage()
            _set_ratio()
        except Exception:
            pass

    # a contended first rate gets a temporally-spaced second sample
    # (runs in the background under stage H; the reader keeps the max)
    try:
        _resample_chip()
    except Exception:
        pass

    # stage H: when the chip resolved early the endgame was cheap and
    # stage F's protective reserve went unspent — pour the leftover into
    # more interleaved e2e pairs at both sizes (best-of across pairs is
    # the bimodal-VM mitigation; the 223 s-of-420 validation run left
    # ~200 s on the table and a 1.97x ratio one fast-phase pair short)
    # the guard uses MEASURED pair costs (x1.5 phase margin), not the
    # worst-case 0.17 s/MB estimate — under that estimate this stage
    # never fired in a fast phase (needed 244 s, had 198)
    def _cost(mb):
        return pair_cost.get(mb, 0.17 * mb) * 1.5 + 40
    try:
        for _ in range(4):
            if _remaining() < _cost(E2E_MB):
                break
            _one_pair(E2E_MB)
            try:
                _resample_chip()
            except Exception:
                pass
            if _remaining() > _cost(mb2):
                _one_pair(mb2)
            _checkpoint()
    except Exception:
        pass

    # let a still-running resample child finish within the leftover
    # budget — its RATE lines fold into REC as they print
    chip = _CHIP
    while chip is not None and chip.running() and _remaining() > 25:
        time.sleep(2)
    if chip is not None:
        chip.kill()
    _set_ratio()

    _flush_and_exit()


if __name__ == "__main__":
    main()
