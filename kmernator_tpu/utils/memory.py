"""Process memory introspection (ref: src/MemoryUtils.h — RSS/vmem logging
used at ~80 call sites in the reference)."""
from __future__ import annotations

import os


def get_memory_usage() -> str:
    try:
        with open("/proc/self/status") as f:
            fields = {}
            for line in f:
                if line.startswith(("VmRSS", "VmSize", "VmPeak", "VmHWM")):
                    k, v = line.split(":", 1)
                    fields[k] = v.strip()
        return " ".join("%s: %s" % kv for kv in sorted(fields.items()))
    except OSError:
        return "mem: unavailable"


def rss_mb() -> float:
    try:
        with open("/proc/self/statm") as f:
            pages = int(f.read().split()[1])
        return pages * os.sysconf("SC_PAGE_SIZE") / 1e6
    except OSError:
        return 0.0
