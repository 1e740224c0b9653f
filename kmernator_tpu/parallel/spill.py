"""Out-of-core hash-partitioned k-mer counting (spill + merge).

The reference's buildKmerSpectrumInParts + MmapTempFile pattern
(ref: src/KmerSpectrum.h:1818-1902, src/MmapTempFile.h): observations are
routed by hash into P on-disk spill buckets as they stream past, then each
bucket is counted independently — peak memory is O(chunk + windows/P)
instead of O(total windows), and counts are EXACT (no purge-under-pressure
undercounts).

Spill record: key (u64 or big-endian wide bytes) + f32 weight.
"""
from __future__ import annotations

import os
import tempfile
from typing import List, Optional

import numpy as np

from kmernator_tpu.ops.kmer import nwords
from kmernator_tpu.utils.cleanup import register_path, unregister_path


def key_range_splitters(sample: np.ndarray, num_parts: int) -> np.ndarray:
    """[num_parts-1] key-space splitters from a sorted-or-not key sample.

    Range partition (not hash): because canonical key order is preserved
    across parts, the per-part sorted outputs concatenate into the final
    globally-sorted table with NO final merge sort — the same reason the
    reference's buildKmerSpectrumInParts partitions by the hash's HIGH bits
    (ref: src/KmerSpectrum.h:1840-1861, partitionIdx from msb) so part maps
    append in order."""
    s = np.sort(sample)
    if len(s) == 0:
        return s[:0].copy()
    qi = (np.arange(1, num_parts) * len(s)) // num_parts
    return s[qi]


def _part_of(keys: np.ndarray, splitters: np.ndarray) -> np.ndarray:
    """Range part id per key (equal keys always share a part)."""
    return np.searchsorted(splitters, keys, side="right")


class SpillCounter:
    """Streamed exact counting through P disk spill buckets."""

    def __init__(self, k: int, num_parts: int, tmpdir: Optional[str] = None,
                 track_weights: bool = True):
        self.k = k
        self.W = nwords(k)
        self.num_parts = num_parts
        self.track_weights = track_weights
        self.tmpdir = tmpdir or tempfile.mkdtemp(prefix="kmtpu-spill-")
        register_path(self.tmpdir)
        self._files = [open(os.path.join(self.tmpdir, "part%d.bin" % p), "wb")
                       for p in range(num_parts)]
        self.raw_kmers = 0
        self.raw_good_kmers = 0
        self.key_dtype = None
        self.splitters: Optional[np.ndarray] = None

    def add(self, keys: np.ndarray, good: np.ndarray,
            weights: Optional[np.ndarray] = None):
        """keys: scalar canonical keys (u64 or 'S' wide) for ALL windows;
        good: bool mask of countable observations."""
        self.raw_kmers += int(len(keys))
        gk = keys[good]
        self.raw_good_kmers += int(len(gk))
        if not len(gk):
            return
        self.key_dtype = gk.dtype
        if self.splitters is None:
            # first batch's keys approximate the global key distribution;
            # skew only shifts per-part memory, never correctness
            step = max(1, len(gk) // 65536)
            self.splitters = key_range_splitters(gk[::step], self.num_parts)
        part = _part_of(gk, self.splitters)
        order = np.argsort(part, kind="stable")
        sp = part[order]
        sk = gk[order]
        if weights is not None and self.track_weights:
            # interleaved (key, weight) records so buckets parse back as a
            # flat record stream
            rec = np.empty(len(sk), dtype=np.dtype([("k", sk.dtype),
                                                    ("w", np.float32)]))
            rec["k"] = sk
            rec["w"] = weights[good].astype(np.float32)[order]
        else:
            rec = sk
        bounds = np.searchsorted(sp, np.arange(self.num_parts + 1))
        for p in range(self.num_parts):
            s, e = bounds[p], bounds[p + 1]
            if s != e:
                self._files[p].write(rec[s:e].tobytes())

    def finalize(self, min_depth: int = 1):
        """Merge the spill buckets into one sorted host KmerSpectrum."""
        from kmernator_tpu.parallel.spectrum import KmerSpectrum
        for f in self._files:
            f.close()
        key_item = (8 if self.key_dtype is None
                    or self.key_dtype == np.uint64
                    else self.key_dtype.itemsize)
        keys_out: List[np.ndarray] = []
        counts_out: List[np.ndarray] = []
        weights_out: List[np.ndarray] = []
        key_dt = (np.dtype(np.uint64) if self.key_dtype is None
                  else self.key_dtype)
        for p in range(self.num_parts):
            path = os.path.join(self.tmpdir, "part%d.bin" % p)
            if self.track_weights:
                rec_dt = np.dtype([("k", key_dt), ("w", np.float32)])
                arr = np.fromfile(path, rec_dt)
                k_arr, w = arr["k"], arr["w"]
            else:
                k_arr = np.fromfile(path, key_dt)
                w = None
            os.unlink(path)
            if not len(k_arr):
                continue
            order = np.argsort(k_arr, kind="stable")
            sk = k_arr[order]
            if w is not None:
                w = w[order]
            del k_arr, order
            boundary = np.concatenate([[True], sk[1:] != sk[:-1]])
            seg = (np.cumsum(boundary, dtype=np.int64) - 1)
            M = int(seg[-1]) + 1
            cnt = np.bincount(seg, minlength=M)
            keep = cnt >= min_depth
            keys_out.append(sk[boundary][keep])
            counts_out.append(cnt[keep].astype(np.int32))
            if w is not None:
                ws = np.bincount(seg, weights=w.astype(np.float64),
                                 minlength=M)
                weights_out.append(ws[keep])
        sp = KmerSpectrum(k=self.k)
        if keys_out:
            # range partition => parts in splitter order concatenate into
            # the globally key-sorted table; no final merge sort needed
            sp.keys = np.concatenate(keys_out)
            sp.counts = np.concatenate(counts_out)  # int32: counts fit
            if weights_out:
                sp.weighted = np.concatenate(weights_out)
        sp.raw_kmers = self.raw_kmers
        sp.raw_good_kmers = self.raw_good_kmers
        try:
            os.rmdir(self.tmpdir)
            unregister_path(self.tmpdir)
        except OSError:
            pass
        return sp

    # spill-record bytes per observation (for sizing diagnostics)
    @property
    def record_bytes(self) -> int:
        key_item = (8 if self.key_dtype is None
                    or self.key_dtype == np.uint64
                    else self.key_dtype.itemsize)
        return key_item + (4 if self.track_weights else 0)


def auto_parts(est_windows: int, budget_bytes: int = 48 << 20,
               rec_bytes: int = 12) -> int:
    """Part count so one bucket's observations fit the merge budget."""
    return max(4, int(np.ceil(est_windows * rec_bytes / budget_bytes)))
